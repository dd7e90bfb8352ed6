package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{IncrementalDsir, KeyedStore}

/** foldModel scaling probe (dev tool): the cross-batch DSIR delta log grows
  * by ≤ `buckets` rows per screened batch, and [[IncrementalDsir.readModel]]
  * scans the WHOLE live log on every screen — so per-batch screening cost
  * creeps up with stream age until a maintenance fold collapses the history
  * into per-bucket base rows. This probe drives a long stream (default 150
  * micro-batches) through the real screen/update path and prints:
  *
  *   - per-batch screen wall early vs late (the creep the fold exists for),
  *   - live delta rows + readModel wall before the fold,
  *   - fold wall, then rows + readModel wall after (rows must collapse to
  *     ≤ touched-bucket count; model SUMS must be bit-identical),
  *   - screen wall for the next batch after the fold (back at early-stream
  *     level — screening cost is flat across the fold).
  *
  * Token text is synthesized (`t<j>` over a bounded vocabulary) — the model
  * machinery never looks inside a token, so the engineered stream measures
  * the same code paths as corpus text at a batch count the testdata cannot
  * reach.
  *
  * Usage: runMain graft.tools.DsirFoldProbe [batches] [docsPerBatch] [outDir]
  */
object DsirFoldProbe {

  private val B = 4096

  /** Batch i: `docs` docs of 20 tokens each over a 500-token vocabulary,
    * rotated per batch so every batch touches an overlapping-but-shifting
    * bucket set (the crawler-stream shape). */
  private def genBatch(spark: SparkSession, i: Long, docs: Long) =
    spark.range(docs).select(
      (lit(i * 1000000L) + col("id")).as("id"),
      concat_ws(" ", (0 until 20).map(j =>
        concat(lit("t"), pmod(col("id") * 20 + j + i * 37, lit(500)))): _*)
        .as("text"))

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(150)
    val docs = args.lift(1).map(_.toLong).getOrElse(200L)
    val outDir = args.lift(2).getOrElse("/tmp/graft_dsir_fold_probe")
    graft.util.Tmp.deleteRecursively(outDir)
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tgt = s"$outDir/tgt"; val raw = s"$outDir/raw"
    IncrementalDsir.updateModel(genBatch(spark, -1, docs), tgt,
      col("id"), col("text"), B, 0L)

    def screenOne(i: Long): Double = {
      val t0 = System.nanoTime()
      IncrementalDsir.screenBatch(genBatch(spark, i, docs), tgt, raw,
        col("id"), col("text"), B, batchId = i).count()
      (System.nanoTime() - t0) / 1e9
    }
    val walls = (0 until batches).map(i => screenOne(i.toLong))
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    println(f"DSIRFOLD screen wall: first5=${avg(walls.take(5))}%.2f s " +
      f"last5=${avg(walls.takeRight(5))}%.2f s over $batches batches " +
      f"(docs/batch=$docs, buckets=$B)")

    def modelStats(label: String): Map[Long, Long] = {
      val liveRows = KeyedStore.read(spark, raw).get
        .filter(col("op_type") =!= "delete").count()
      val t0 = System.nanoTime()
      val sums = IncrementalDsir.readModel(spark, raw).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"DSIRFOLD $label: liveDeltaRows=$liveRows " +
        f"readModelWall=$wall%.2f s modelBuckets=${sums.size}")
      sums
    }
    val before = modelStats("pre-fold")

    val hwm = IncrementalDsir.nextBatchId(spark, raw)
    val tf = System.nanoTime()
    // the probe's drive is synchronous — every screened batch's output was
    // consumed before this line, so the mark itself is a safe horizon
    IncrementalDsir.foldModel(spark, raw, below = hwm, lastBatchCommitted = true)
    println(f"DSIRFOLD fold(below=$hwm): ${(System.nanoTime() - tf) / 1e9}%.2f s")
    val after = modelStats("post-fold")
    assert(after == before, "model sums must be bit-identical across the fold")

    // tombstones retained by the fold; the dropping compaction is the
    // smallest-store end state (safe here: no batch below hwm replays)
    KeyedStore.compact(spark, raw, dropTombstones = true)
    modelStats("post-compact")

    val postWall = screenOne(batches.toLong)
    println(f"DSIRFOLD screen wall after fold: $postWall%.2f s " +
      "(flat vs early-stream = the fold restored O(buckets) model reads)")
    spark.stop()
  }
}
