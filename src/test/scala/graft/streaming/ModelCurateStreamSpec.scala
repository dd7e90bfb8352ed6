package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.{Curation, Dedup, TextStats}

/** END-TO-END continuous MODEL-BASED curation — the model-first counterpart
  * of [[CurateStreamSpec]]'s rule-based chain, and the streaming form of the
  * `q_pipeline_model` flagship:
  *
  *   hashed-linear classifier gate (broadcast weight table)
  *   → cross-batch DSIR importance screen (target model fixed up front, raw
  *     model ACCUMULATING batch by batch in a persistent delta-log store)
  *   → cross-batch exact dedup (persistent fingerprint store)
  *   → cross-batch near-dup rejection (persistent MinHash signature store)
  *   → accepted docs merged into a persistent corpus table.
  *
  * Driven through foreachBatch across micro-batches, a QUERY RESTART (a
  * fresh query resuming via [[IncrementalDsir.nextBatchId]]), and a
  * MID-STREAM [[IncrementalDsir.foldModel]] maintenance fold. Every stage is
  * spec'd alone elsewhere; this suite pins the COMPOSITION, and that the
  * final corpus equals the batch pipeline (the same four model-driven
  * stages run once over the whole input with the batch operators).
  *
  * The corpus is built so every DSIR verdict is HORIZON-INVARIANT — kept
  * docs clear the threshold and dropped docs miss it under the empty model,
  * every intermediate horizon, and the full batch-twin model alike (margins
  * ≥ 2× each way; see the token-budget arithmetic inline) — which is what
  * makes stream-vs-batch parity well-defined despite the two paths scoring
  * against different raw-model horizons. */
class ModelCurateStreamSpec extends SparkSpec {

  private val B = 4096

  // 12-word target vocabulary; good docs are permutations chosen so no two
  // share a single ordered 3-gram (disjoint adjacencies), so the near-dup
  // stage sees them as unrelated
  private val T = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu")
  private val p1 = T.mkString(" ")
  private val p2 = T.reverse.mkString(" ")
  private val p3 = (T.indices.collect { case i if i % 2 == 1 => T(i) } ++
    T.indices.collect { case i if i % 2 == 0 => T(i) }).mkString(" ")
  private val p4 = (T.indices.reverse.collect { case i if i % 2 == 0 => T(i) } ++
    T.indices.reverse.collect { case i if i % 2 == 1 => T(i) }).mkString(" ")
  // one-word tail rephrase of p3: 9 of 10 shingles shared, Jaccard 9/11 ≥ 1/2
  private val p3near = p3.split(" ").dropRight(1).mkString(" ") + " alpha"
  // classifier-junk: mostly target vocab, but the poisoned tokens dominate
  private val junkDoc = "alpha beta zzjunk1 zzjunk2 gamma delta"
  // alien vocab, disjoint from T and from each other
  private val alien1 = "xenon yttrium zirconium niobium molybdenum technetium " +
    "ruthenium rhodium palladium argon cadmium indium"
  private val alien2 = "neon helium krypton radon francium cesium rubidium " +
    "barium strontium radium polonium astatine"

  // weight table: +1 per target-vocab token, -1000 per junk token; alien
  // tokens are absent (weight 0), so aliens PASS the classifier and must be
  // caught by the DSIR screen — each model stage earns its keep
  private def weights: DataFrame = {
    val s = spark
    import s.implicits._
    (T.map((_, 1L)) ++ Seq("zzjunk1" -> -1000L, "zzjunk2" -> -1000L))
      .toDF("tok", "w")
      .select((conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % B)
        .as("bucket"), col("w"))
  }

  // target exemplars: 40 rotations of the vocabulary → every T-token counts
  // 40 in the target model (tgt_mass per good token = 41 vs raw ≤ ~7), so at
  // threshold num/den = 2/1 a good doc keeps with ≥ 2× margin under EVERY
  // horizon while an alien doc (tgt_mass = smoothing only) would need the
  // raw model to hold ≥ `buckets` tokens to flip — two orders of magnitude
  // above the whole stream
  private def target: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 40).map { i =>
      (1000L + i, (T.drop(i % 12) ++ T.take(i % 12)).mkString(" "))
    }.toDF("id", "text")
  }

  test("classifier -> DSIR -> exact -> near-dup -> corpus compose across batches, restart, and fold; final corpus equals the batch pipeline") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = Files.createTempDirectory("model_curate").toString
    val tgtStore = s"$root/tgt"; val rawStore = s"$root/raw"
    val fpStore = s"$root/fp"; val lshStore = s"$root/lsh"
    val corpus = s"$root/corpus"
    val w = weights.localCheckpoint(true)

    // the target model is loaded once, before any stream batch
    IncrementalDsir.updateModel(target, tgtStore, col("id"), col("text"), B, 0L)

    def curateBatch(batch: DataFrame, dsirBid: Long): Unit = {
      val gatedIds = TextStats.hashedLinearScore(batch, col("id"), col("text"), w, B)
        .filter(col("keep")).select(col("doc_id").as("id"))
      val gated = batch.join(gatedIds, Seq("id"), "left_semi")
      val screenedIds = IncrementalDsir.screenBatch(gated, tgtStore, rawStore,
          col("id"), col("text"), B, dsirBid, num = 2, den = 1)
        .filter(col("keep")).select(col("id"))
      val screened = gated.join(screenedIds, Seq("id"), "left_semi")
      val unique = IncrementalDedup.dedupBatch(screened, fpStore,
        TextStats.fingerprint(col("text")), col("id"), dsirBid)
      val accepted = IncrementalLsh.dedupBatch(unique, lshStore,
        col("id"), col("text"), dsirBid)
      if (!accepted.isEmpty)
        KeyedStore.merge(accepted.withColumn("batch_id", lit(dsirBid)),
          corpus, keys = Seq("doc_id"), seqCols = Seq("batch_id"))
    }

    def run(batches: Seq[Seq[(Long, String)]]): Unit = {
      // restart-safe batch-id mapping: capture the persisted mark ONCE at
      // query start; spark's per-query bid is an offset from it
      val off = IncrementalDsir.nextBatchId(s, rawStore)
      val mem = MemoryStream[(Long, String)]
      val q = mem.toDF().toDF("id", "text").writeStream
        .foreachBatch { (b: DataFrame, bid: Long) => curateBatch(b, off + bid) }
        .start()
      try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }

    // first query: two micro-batches
    run(Seq(
      // b0: 2 = in-batch exact dup of 1; 3 fails the classifier gate;
      //     4 is alien vocabulary — passes the classifier, DSIR drops it
      Seq((1L, p1), (2L, p1), (3L, junkDoc), (4L, alien1)),
      // b1: 6 = cross-batch exact re-arrival of 1's text; 5 and 7 are new
      Seq((5L, p2), (6L, p1), (7L, p3))))

    // MID-STREAM MAINTENANCE: fold everything screened so far into the base
    // row. Folding AT the mark requires asserting the last batch's sink
    // committed — true here: run() stopped the query after both batches
    // drained, so batch 1 can never be replayed.
    val hwm = IncrementalDsir.nextBatchId(s, rawStore)
    assert(hwm == 2L, s"two batches screened, mark = $hwm")
    IncrementalDsir.foldModel(s, rawStore, below = hwm, lastBatchCommitted = true)

    // RESTART: a fresh query over the same stores resumes past the mark
    run(Seq(
      // b2: 8 = one-word rephrase of 7 (cross-batch near-dup, caught by the
      //     signature store); 9 is alien (DSIR, against the FOLDED model);
      //     10 is a new good permutation
      Seq((8L, p3near), (9L, alien2), (10L, p4))))

    val streamed = KeyedStore.read(s, corpus).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == Set(1L, 5L, 7L, 10L), s"streamed corpus: $streamed")

    // BATCH TWIN: the same four model-driven stages over the whole input at
    // once with the batch operators — classifier gate, dsirScreen (raw model
    // = ALL gated docs), exact keepers, LSH cluster keepers
    val all = Seq(1L -> p1, 2L -> p1, 3L -> junkDoc, 4L -> alien1, 5L -> p2,
      6L -> p1, 7L -> p3, 8L -> p3near, 9L -> alien2, 10L -> p4)
      .toDF("id", "text")
    val gatedIds = TextStats.hashedLinearScore(all, col("id"), col("text"), w, B)
      .filter(col("keep")).select(col("doc_id").as("id"))
    val gated = all.join(gatedIds, Seq("id"), "left_semi")
    val dsirIds = Curation.dsirScreen(gated, target, col("id"), col("text"),
        buckets = B, num = 2, den = 1)
      .filter(col("keep")).select(col("doc_id").as("id"))
    val screened = gated.join(dsirIds, Seq("id"), "left_semi")
    val keepers = Dedup.exact(screened, col("id"), col("text"))
      .select(col("keeper_id").as("id"))
    val deduped = screened.join(keepers, Seq("id"), "left_semi")
    val sh = Dedup.shingles(deduped, col("id"), col("text"))
    val pairs = Dedup.minhashLshPairs(sh, 1, 2)
    val losers =
      if (pairs.isEmpty) deduped.select(col("id")).limit(0)
      else Dedup.connectedComponents(pairs)
        .filter(col("doc_id") =!= col("keeper_id")).select(col("doc_id").as("id"))
    val batchSet = deduped.join(losers, Seq("id"), "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(batchSet == streamed,
      s"stream/batch divergence: batch=$batchSet stream=$streamed")
  }
}
