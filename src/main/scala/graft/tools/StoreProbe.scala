package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.KeyedStore

/** Cross-batch store scaling probe (dev tool): does the incremental-dedup
  * screen's probe cost track BATCH size rather than INDEX size?
  *
  * The mechanism under test is [[KeyedStore.readPruned]] — the bucket-pruned
  * read both [[graft.streaming.IncrementalDedup]] (fingerprint screen) and
  * [[graft.streaming.IncrementalLsh]] (band-bucket probe) ride. The probe
  * builds two fingerprint stores:
  *
  *   - 1×:  `rows` fps over `buckets` buckets
  *   - 10×: 10·`rows` fps over 10·`buckets` buckets (constant bucket SIZE —
  *     how a growing store is provisioned; the bucket count is a create-time
  *     knob exactly like table bucketing)
  *
  * and runs the same screen (pruned read + left-anti join) with the same
  * probe batch against both, plus the full-scan screen for contrast. The
  * claim holds if pruned wall is ~flat from 1× to 10× while the full-scan
  * screen grows with the index. The probe batch mixes seen and novel keys so
  * the anti-join exercises both outcomes.
  *
  * Keys are synthesized (`md5(id)` over a range) — the store machinery never
  * looks inside the key, so an engineered fixture measures the same code
  * paths as corpus fingerprints, at an index size the testdata cannot reach.
  *
  * Usage: runMain graft.tools.StoreProbe [rows] [buckets] [outDir]
  */
/** Verify-stage DF-cap probe (dev tool): does the cross-batch near-dup
  * screen's candidate count stay bounded as a HOT band bucket ages?
  *
  * Uncapped, a (band, bkey) bucket holding w stored signatures contributes
  * `w × probes_in_bucket` verify candidates — w grows with index AGE (every
  * accepted boilerplate-ish doc adds rows), so probe cost degrades
  * quadratically over a stream's lifetime. [[graft.streaming.IncrementalLsh
  * .cappedStored]] drops buckets wider than maxBandDf from the verify join.
  * This probe synthesizes one hot bucket at growing widths and prints the
  * candidate count with and without the cap: uncapped must grow linearly
  * with width, capped must stay flat.
  *
  * Usage: runMain graft.tools.LshCapProbe [probes] [maxBandDf]
  */
object LshCapProbe {
  def main(args: Array[String]): Unit = {
    val probes = args.headOption.map(_.toInt).getOrElse(100)
    val cap = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{array, col, lit}
    // one hot (band, bkey) bucket plus a healthy one-entry bucket per probe
    val probe = spark.range(probes).select(
      (col("id") % 2).cast("int").as("band"),
      when(col("id") % 2 === 0, lit(777L)).otherwise(col("id")).as("bkey"))
    for (w <- Seq(100L, 1000L, 10000L)) {
      val stored = spark.range(w).select(lit(0).as("band"), lit(777L).as("bkey"),
          array((0 until 32).map(i => lit(i.toLong)): _*).as("__ssig"))
        .union(spark.range(probes).select(lit(1).as("band"), col("id").as("bkey"),
          array((0 until 32).map(i => lit(i.toLong)): _*).as("__ssig")))
      val un = probe.join(stored, Seq("band", "bkey")).count()
      val cp = probe.join(graft.streaming.IncrementalLsh.cappedStored(stored, cap),
        Seq("band", "bkey")).count()
      println(s"LSHCAP width=$w probes=$probes cap=$cap uncapped=$un capped=$cp")
    }
    spark.stop()
  }
}

object StoreProbe {

  private def fps(spark: SparkSession, from: Long, n: Long) =
    spark.range(from, from + n).select(md5(col("id").cast("string")).as("fp"))

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(256)
    val outDir = args.lift(2).getOrElse("/tmp/graft_store_probe")
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def build(path: String, n: Long, nBuckets: Int): Unit =
      if (!new java.io.File(path).exists()) {
        val t0 = System.nanoTime()
        KeyedStore.merge(fps(spark, 0, n).withColumn("batch_id", lit(0L)),
          path, keys = Seq("fp"), seqCols = Seq("batch_id"),
          numBuckets = nBuckets, bucketCols = Seq("fp"))
        println(f"STORE build $path: $n keys / $nBuckets buckets " +
          f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }

    val store1 = s"$outDir/ix1"
    val store10 = s"$outDir/ix10"
    build(store1, rows, buckets)
    build(store10, rows * 10, buckets * 10)

    // two probe regimes: a SMALL batch (keys << bucket count — the steady
    // micro-batch case the O(batch) claim is about) and a LARGE one that
    // touches most buckets (worst case: pruning degrades gracefully toward
    // the full scan, never below it)
    for (half <- Seq(50L, 1000L)) {
      val probe = fps(spark, 0, half)
        .union(fps(spark, -1000000000L, half))
        .localCheckpoint(true)

      def screen(path: String, label: String, pruned: Boolean): Unit = {
        val t0 = System.nanoTime()
        val seen = (if (pruned) KeyedStore.readPruned(spark, path, probe)
                    else KeyedStore.read(spark, path)).get
        val fresh = probe.join(seen.select(col("fp")), Seq("fp"), "left_anti").count()
        val wall = (System.nanoTime() - t0) / 1e9
        assert(fresh == half, s"screen must pass exactly the novel keys, got $fresh")
        println(f"STORE batch=${2 * half} screen $label " +
          f"${if (pruned) "pruned" else "full"}: $wall%.2f s")
      }

      // order interleaved so JIT/IO warm-up cannot flatter the pruned path
      screen(store1, "1x", pruned = false)
      screen(store1, "1x", pruned = true)
      screen(store10, "10x", pruned = false)
      screen(store10, "10x", pruned = true)
      // second pass, warmed
      screen(store1, "1x(warm)", pruned = true)
      screen(store10, "10x(warm)", pruned = true)
      for ((n, lbl) <- Seq((buckets, "1x"), (buckets * 10, "10x"))) {
        val touched = probe.select(pmod(hash(col("fp")), lit(n)).as("b"))
          .distinct().count()
        println(s"STORE batch=${2 * half}: touches $touched of $n buckets at $lbl " +
          "(pruned IO = bucket-size x touched-buckets, independent of index rows)")
      }
    }
    spark.stop()
  }
}
