package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextStats

/** END-TO-END continuous curation: the composition a crawler-fed training
  * pipeline actually runs, wired from the engine's own operators and driven
  * through foreachBatch across micro-batches AND a query restart —
  *
  *   quality gate → cross-batch EXACT dedup (persistent fingerprint store)
  *   → cross-batch NEAR-dup rejection (persistent MinHash signature store)
  *   → accepted docs merged into a persistent corpus table.
  *
  * Each stage is individually spec'd elsewhere; this suite pins that they
  * COMPOSE: the stores accumulate across batches, a re-started query resumes
  * the same dedup horizon, and the corpus table ends up with exactly the
  * curated set. */
class CurateStreamSpec extends SparkSpec {

  // genuinely DIFFERENT sentences per document family (disjoint content
  // vocabulary — a one-word variant of a shared base would itself be a
  // near-dup and be curated away, correctly); long enough that a one-word
  // rephrase keeps Jaccard ≈ 0.8-0.9, well above the 1/2 verify threshold
  // and high enough that the 32-hash signature estimate cannot dip below it
  private val docA =
    "the quick brown fox jumps over the lazy dog and then runs far away to " +
      "the green hills where a quiet river bends through the old stone bridge"
  private val docB =
    "a small wooden boat drifts across the calm grey harbour while seagulls " +
      "circle above the pier and fishermen mend their heavy nets of rope"
  private val docC =
    "bright copper kettles whistle softly inside the warm kitchen as fresh " +
      "bread cools on the window ledge and winter rain taps the glass"
  private val docD =
    "deep beneath the ancient forest floor a network of pale roots carries " +
      "water to the tall cedars that lean together against the north wind"
  private val junk = "0123 4567 89 !!! ??? 000 111 222 333 444 555 666 777"

  test("quality -> exact dedup -> near-dup -> corpus store compose across batches and restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = Files.createTempDirectory("curate_stream").toString
    val fpStore = s"$root/fp"
    val lshStore = s"$root/lsh"
    val corpus = s"$root/corpus"
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    def curateBatch(batch: DataFrame, bid: Long): Unit = {
      val passed = TextStats.quality(batch, col("text"))
        .filter(col("quality_score") >= 0.4)
        .select(col("id"), col("text"))
      val unique = IncrementalDedup.dedupBatch(passed, fpStore,
        TextStats.fingerprint(col("text")), col("id"), bid)
      val accepted = IncrementalLsh.dedupBatch(unique, lshStore,
        col("id"), col("text"), bid)
      if (!accepted.isEmpty)
        KeyedStore.merge(accepted.withColumn("batch_id", lit(bid)),
          corpus, keys = Seq("doc_id"), seqCols = Seq("batch_id"))
      accepted.select(col("doc_id")).collect().foreach(r => sink.add(r.getLong(0)))
    }

    def run(batches: Seq[Seq[(Long, String)]]): Unit = {
      val mem = MemoryStream[(Long, String)]
      val q = mem.toDF().toDF("id", "text").writeStream
        .foreachBatch { (b: DataFrame, bid: Long) => curateBatch(b, bid) }
        .start()
      try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }

    // first query: two micro-batches
    run(Seq(
      // b0: exact dup within the batch (1 wins), junk fails quality
      Seq((1L, docA), (2L, docA), (3L, junk), (4L, docB)),
      // b1: 5 = cross-batch EXACT re-arrival of 1; 6 = one-word rephrase of
      // 4 (cross-batch NEAR-dup, caught by the signature store); 7 is new
      Seq((5L, docA), (6L, docB.replace("harbour", "inlet")), (7L, docC))))
    assert(sink.iterator().hasNext)
    assert(sink.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet ==
      Set(1L, 4L, 7L), s"first query accepted ${sink.toArray.toSeq}")

    // RESTART: a fresh query over the same stores must keep the horizon
    sink.clear()
    run(Seq(
      // 8 = rephrase of 7 accepted by the PREVIOUS query; 9 is new
      Seq((8L, docC.replace("kitchen", "pantry")), (9L, docD))))
    assert(sink.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet ==
      Set(9L), s"restarted query accepted ${sink.toArray.toSeq}")

    // the corpus table holds exactly the curated set, inspectable as data
    val kept = KeyedStore.read(s, corpus).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 7L, 9L))
  }
}
