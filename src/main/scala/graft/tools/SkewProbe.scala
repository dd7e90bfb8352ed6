package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Scale

/** Skew demonstration (dev tool, not part of the driver protocol): an
  * engineered hot-key fixture — 90% of rows on one key, the rest spread over
  * 1M rare keys — measured through BOTH aggregation regimes, because the two
  * behave oppositely and the honest 100 TB guidance depends on knowing which
  * one you are in (SURVEY §7.4 note):
  *
  *  1. ALGEBRAIC aggregate (`groupBy(k).agg(sum)`): Spark's map-side partial
  *     aggregation collapses the hot key to one partial per map task before
  *     the shuffle, so the hot reducer receives ≤ #maps rows — salting adds
  *     a second shuffle for nothing. Expected result: parity or a salted
  *     LOSS. `Scale.saltedAggregate` earns its keep only when partial-agg
  *     hash maps degrade (cardinality ≫ memory), never from a hot key alone.
  *
  *  2. TYPED per-group processing (`groupByKey(k).mapGroups`): no partial
  *     aggregation exists — every raw hot-key row ships to ONE task. This is
  *     the real skew cliff, and `Scale.saltedFoldGroups` is the fix: the
  *     fold runs per (key, salt) in parallel, then `buckets` partials merge.
  *     Expected result: a multiple-× salted win, growing with core count.
  *
  * Usage: runMain graft.tools.SkewProbe [rows] [buckets]
  * Prints one PROBE line per measurement; paste the numbers into SCALING.md.
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(24L * 1000 * 1000)
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 90% of rows on key 0; the remainder spread over 1M rare keys. The
    // value column keeps rows distinct so nothing upstream dedups.
    val fixture = spark.range(rows).select(
        when(pmod(col("id"), lit(10)) < 9, 0L)
          .otherwise(pmod(col("id"), lit(1000000L)) + 1L).as("k"),
        col("id").as("v"))
      .localCheckpoint(true) // pin the input so every variant reads identical blocks

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-24s $sec%8.2f s  (result rows: $n)")
      sec
    }

    // Regime 1: algebraic aggregate. Warm both plans once (codegen), then time.
    def naiveSum() = fixture.groupBy("k").agg(sum("v").as("s")).count()
    def saltedSum() = Scale.saltedAggregate(fixture, Seq(col("k")),
      Seq(("s", "sum", col("v"))), buckets).count()
    naiveSum(); saltedSum()
    val t1n = time("sum-naive")(naiveSum())
    val t1s = time("sum-salted")(saltedSum())

    // Regime 2: typed mapGroups fold (per-group count — the simplest
    // associative fold; any sessionization/top-k fold skews identically).
    val typed = fixture.as[(Long, Long)]
    def naiveFold() = typed.groupByKey(_._1)
      .mapGroups((k, it) => (k, it.size.toLong)).count()
    def saltedFold() = Scale.saltedFoldGroups(typed, (r: (Long, Long)) => r._1,
      buckets)((_, it) => it.size.toLong)(_ + _).count()
    naiveFold(); saltedFold()
    val t2n = time("mapGroups-naive")(naiveFold())
    val t2s = time("mapGroups-salted")(saltedFold())

    println(f"PROBE sum speedup       ${t1n / t1s}%6.2fx (expected ~1x: partial agg already absorbs the hot key)")
    println(f"PROBE mapGroups speedup ${t2n / t2s}%6.2fx (the regime saltedFoldGroups exists for)")
    spark.stop()
  }
}
