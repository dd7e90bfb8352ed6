package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Stateful

/** Cross-batch SCD2: the seeded fold equals the batch operator over the
  * concatenated changelog at EVERY horizon — boundaries, absorption,
  * delete gaps, and re-inserts crossing batch seams — with closed-version
  * immutability, minimal writes, replay safety, and restart. */
class IncrementalScd2Spec extends SparkSpec {

  // (key, seq, ts, typ, attr) — seq is the per-key CDC offset order
  private val changelog = Seq(
    // A: versions crossing every seam; the batch-2 update is a cross-batch
    // no-op (same attr as the open version folded in batch 1)
    ("A", 1L, 1L, "insert", "x"), ("A", 2L, 2L, "update", "x"),
    ("A", 3L, 4L, "update", "y"), ("A", 4L, 6L, "update", "y"),
    ("A", 5L, 7L, "delete", "y"), ("A", 6L, 9L, "insert", "y"),
    // B: whole lifecycle inside one batch, then a cross-batch re-insert
    ("B", 1L, 1L, "insert", "p"), ("B", 2L, 2L, "delete", "p"),
    ("B", 3L, 5L, "insert", "q"),
    // C: appears only in the last batch
    ("C", 1L, 8L, "insert", "z"))

  private def batchOf(seqs: Range) = {
    val s = spark
    import s.implicits._
    changelog.filter(r => seqs.contains(r._2.toInt))
      .toDF("k", "seq", "ts", "typ", "attr")
  }

  private def batchHistory(upTo: Int) = {
    val s = spark
    import s.implicits._
    val df = changelog.filter(_._2 <= upTo).toDF("k", "seq", "ts", "typ", "attr")
    Stateful.scd2History(df, Seq(col("k")), Seq(col("seq")), col("ts"),
      Seq(col("attr")), Seq("attr"), col("typ"))
  }

  private def snap(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select(col("k"), col("attr"), col("effective_from"),
      col("effective_to"), col("is_current"), col("ver").cast("long"))
      .collect().map(_.toSeq).toSet

  test("fold equals batch scd2History over concatenated changelog at every horizon") {
    val store = Files.createTempDirectory("inc_scd2").toString + "/store"
    // horizons chosen so seams land mid-version, on a delete, and on a
    // re-insert (per-key seqs <=2, <=4, rest)
    val horizons = Seq(2, 4, 99)
    for ((h, bid) <- horizons.zipWithIndex) {
      val lo = if (bid == 0) 1 else horizons(bid - 1) + 1
      val got = IncrementalScd2.mergeBatch(batchOf(lo to h), store,
        keys = Seq("k"), ordCols = Seq("seq"), attrNames = Seq("attr"),
        batchId = bid.toLong)
      val want = batchHistory(math.min(h, 6))
      assert(snap(got) == snap(want), s"horizon $h diverged")
    }
  }

  test("replayed fold returns current history without touching the store") {
    val store = Files.createTempDirectory("inc_scd2_rp").toString + "/store"
    IncrementalScd2.mergeBatch(batchOf(1 to 2), store,
      Seq("k"), Seq("seq"), Seq("attr"), batchId = 0L)
    val before = snap(IncrementalScd2.mergeBatch(batchOf(3 to 4), store,
      Seq("k"), Seq("seq"), Seq("attr"), batchId = 1L))
    // replay batch 1 with DIFFERENT rows: state must not move
    val replayed = snap(IncrementalScd2.mergeBatch(batchOf(5 to 6), store,
      Seq("k"), Seq("seq"), Seq("attr"), batchId = 1L))
    assert(replayed == before)
  }

  test("all-absorbed fold writes only the meta row; closed versions immutable") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_scd2_ab").toString + "/store"
    IncrementalScd2.mergeBatch(
      Seq(("A", 1L, 1L, "insert", "x"), ("A", 2L, 3L, "update", "y"))
        .toDF("k", "seq", "ts", "typ", "attr"),
      store, Seq("k"), Seq("seq"), Seq("attr"), batchId = 0L)
    val rows0 = KeyedStore.read(s, store).get
      .filter(col("op_type") =!= "delete" && col("kind") === "v")
      .select(col("k"), col("ver"), col("bver")).collect()
      .map(_.toSeq).toSet
    // batch of pure no-ops against the open version
    val after = snap(IncrementalScd2.mergeBatch(
      Seq(("A", 3L, 5L, "update", "y")).toDF("k", "seq", "ts", "typ", "attr"),
      store, Seq("k"), Seq("seq"), Seq("attr"), batchId = 1L))
    val rows1 = KeyedStore.read(s, store).get
      .filter(col("op_type") =!= "delete" && col("kind") === "v")
      .select(col("k"), col("ver"), col("bver")).collect()
      .map(_.toSeq).toSet
    assert(rows1 == rows0, "absorbed fold must write no version rows")
    assert(after == Set(Seq("A", "x", 1L, 3L, false, 1L),
      Seq("A", "y", 3L, null, true, 2L)))
  }

  test("drives a foreachBatch stream end-to-end, surviving query restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val store = Files.createTempDirectory("inc_scd2_st").toString + "/store"
    def start(offset: Long) = {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long, Long, String, String)]
      val q = mem.toDF().toDF("k", "seq", "ts", "typ", "attr").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          IncrementalScd2.mergeBatch(batch, store, Seq("k"), Seq("seq"),
            Seq("attr"), batchId = offset + bid)
          ()
        }
        .start()
      (mem, q)
    }
    val (m1, q1) = start(0L)
    try {
      m1.addData(changelog.filter(_._2 <= 3)); q1.processAllAvailable()
    } finally q1.stop()
    // restart: a NEW query (fresh batch ids) continues the same store
    val (m2, q2) = start(100L)
    try {
      m2.addData(changelog.filter(r => r._2 > 3 && r._2 <= 4))
      q2.processAllAvailable()
      m2.addData(changelog.filter(_._2 > 4)); q2.processAllAvailable()
    } finally q2.stop()
    val hist = IncrementalScd2.readHistory(s, store, batchOf(1 to 1),
      Seq("k"), Seq("attr"))
    assert(snap(hist) == snap(batchHistory(6)))
  }

  test("restart: a fresh reader sees the folded history; lookup composes") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_scd2_rs").toString + "/store"
    IncrementalScd2.mergeBatch(batchOf(1 to 4), store,
      Seq("k"), Seq("seq"), Seq("attr"), batchId = 0L)
    IncrementalScd2.mergeBatch(batchOf(5 to 6), store,
      Seq("k"), Seq("seq"), Seq("attr"), batchId = 1L)
    val hist = IncrementalScd2.readHistory(s, store, batchOf(1 to 1),
      Seq("k"), Seq("attr"))
    assert(snap(hist) == snap(batchHistory(6)))
    val facts = Seq(("A", 10L, 3L), ("A", 11L, 8L), ("B", 12L, 6L))
      .toDF("k", "fact_id", "fts")
    val got = Stateful.scd2Lookup(facts, hist, Seq("k"), col("fts"))
      .select(col("fact_id"), col("attr")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(10L -> Some("x"), 11L -> None, 12L -> Some("q")))
  }
}
