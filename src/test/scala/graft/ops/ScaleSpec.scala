package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** Salted aggregation equals the direct single-shuffle aggregation. */
class ScaleSpec extends SparkSpec {

  test("salted two-stage aggregation matches direct groupBy") {
    val li = Envelopes.table(spark, sfDir(), "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"),
        count(lit(1)).as("n"), max(col("l_partkey")).as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getDecimal(1), r.getLong(2), r.getLong(3)))).toMap
    val salted = Scale.saltedAggregate(li, Seq(col("l_returnflag")), Seq(
        ("q", "sum", col("l_quantity").cast("decimal(18,2)")),
        ("n", "count", lit(1)),
        ("mx", "max", col("l_partkey"))), buckets = 8)
      .collect().map(r => r.getString(0) -> ((r.getDecimal(1), r.getLong(2), r.getLong(3)))).toMap
    assert(salted == direct)
  }

  test("salted aggregation accepts expression keys, not just column refs") {
    val li = Envelopes.table(spark, sfDir(), "lineitem")
    val key = col("l_linenumber") % 3
    val direct = li.groupBy(key).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedAggregate(li, Seq(key),
        Seq(("n", "count", lit(1))), buckets = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salting a frame carrying a map column works (CDC envelope shape)") {
    // hash() rejects MapType — the salt must route map columns through a
    // deterministic string rendering instead of throwing
    val env = Envelopes.maxwell(spark, sfDir()) // data: map<string,string>
    val direct = env.groupBy(col("table")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedAggregate(env, Seq(col("table")),
        Seq(("n", "count", lit(1))), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("keys resolving to duplicate names are rejected, not silently merged") {
    val li = Envelopes.table(spark, sfDir(), "lineitem")
    intercept[IllegalArgumentException] {
      Scale.saltedAggregate(li,
        Seq(col("l_linenumber").as("k"), col("l_returnflag").as("k")),
        Seq(("n", "count", lit(1))))
    }
  }

  test("saltedFoldGroups equals the unsalted mapGroups fold on a skewed key") {
    import spark.implicits._
    // 80% of rows on key 0 — the shape the operator exists for.
    val ds = spark.range(20000).select(
        when(pmod(col("id"), lit(5)) < 4, 0L).otherwise(pmod(col("id"), lit(97L)) + 1L).as("k"),
        col("id").as("v")).as[(Long, Long)]
    val naive = ds.groupByKey(_._1)
      .mapGroups((k, it) => (k, it.map(_._2).foldLeft((0L, Long.MinValue)) {
        case ((n, mx), v) => (n + 1, math.max(mx, v)) }))
      .collect().toMap
    val salted = Scale.saltedFoldGroups(ds, (r: (Long, Long)) => r._1, buckets = 8) {
        (_, it) => it.map(_._2).foldLeft((0L, Long.MinValue)) {
          case ((n, mx), v) => (n + 1, math.max(mx, v)) }
      } { case ((n1, m1), (n2, m2)) => (n1 + n2, math.max(m1, m2)) }
      .collect().toMap
    assert(salted == naive)
    assert(naive(0L)._1 == 16000L) // the hot key really is hot
  }

  test("saltedFoldGroups bucketing is deterministic per value") {
    import spark.implicits._
    val ds = spark.range(5000).select(lit(7L).as("k"), pmod(col("id"), lit(100L)).as("v"))
      .as[(Long, Long)]
    // identical input → identical partials regardless of physical layout
    val a = Scale.saltedFoldGroups(ds, (r: (Long, Long)) => r._1, buckets = 16)(
      (_, it) => it.size.toLong)(_ + _).collect().toMap
    val b = Scale.saltedFoldGroups(ds.repartition(13), (r: (Long, Long)) => r._1,
      buckets = 16)((_, it) => it.size.toLong)(_ + _).collect().toMap
    assert(a == b && a(7L) == 5000L)
  }

  test("colocate pre-partitions so the downstream aggregation adds no exchange") {
    val li = Envelopes.table(spark, sfDir(), "lineitem")
    val plan = Scale.colocate(li, Seq(col("l_returnflag")), 8)
      .groupBy(col("l_returnflag")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    // exactly one exchange: the explicit repartition; the groupBy reuses it
    assert(plan.split("Exchange").length - 1 == 1, plan.take(800))
  }

  test("zorder: locality beats single-column sort; layout yields disjoint z-ranges") {
    import spark.implicits._
    val li = Envelopes.table(spark, sfDir(), "lineitem")
      .select(pmod(col("l_partkey"), lit(1024)).as("x"),
        pmod(col("l_suppkey"), lit(1024)).as("y"))
    // interleave round-trips: de-interleaving the z-value recovers (x, y)
    val z = Scale.zorderValue(col("x"), col("y"), bits = 10)
    def unshuffle(zc: org.apache.spark.sql.Column, off: Int) =
      (0 until 10).map(i => shiftright(zc, 2 * i + off).bitwiseAND(lit(1L)) * lit(1L << i))
        .reduce(_ + _)
    assert(li.withColumn("z", z)
      .filter(unshuffle(col("z"), 0) =!= col("x") ||
        unshuffle(col("z"), 1) =!= col("y")).count() == 0)
    // layout over a full 256×256 grid: per-partition z-ranges are disjoint
    // (what min/max skipping needs), and a box predicate on BOTH dims prunes
    val grid = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val zg = Scale.zorderValue(col("x"), col("y"), bits = 8)
    // materialize the layout (as a table write would): without pinning,
    // Catalyst pushes the box filter BELOW the range exchange and the
    // boundaries get re-sampled from the filtered rows — not a layout test
    val laid = Scale.zorderLayout(grid, col("x"), col("y"), partitions = 16, bits = 8)
      .persist()
    laid.count()
    val ranges = laid
      .select(spark_partition_id().as("p"), zg.as("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $hi1 > $lo2")
      case _ =>
    }
    // the payoff: a 32×32 box is 1/64 of the grid but one compact z-range —
    // it must NOT touch most of the 16 partitions (an x-sorted layout would
    // touch every partition: y<32 filters nothing per x-range)
    val boxed = laid.filter(col("x") < 32 && col("y") < 32)
      .select(spark_partition_id()).distinct().count()
    assert(boxed <= 2, s"box query touched $boxed of 16 partitions")
    laid.unpersist()
  }

  test("normalizeDim maps the domain onto [0, 2^bits) with clamping") {
    import spark.implicits._
    val df = Seq(-50L, 0L, 100L, 500L, 1000L, 4000L).toDF("v")
      .withColumn("n", Scale.normalizeDim(col("v"), 0L, 1000L, bits = 8))
    val out = df.orderBy("v").select("n").as[Long].collect().toSeq
    // below-lo clamps to 0, above-hi clamps to top; endpoints hit 0 and 255;
    // interior is the linear map, monotone
    assert(out == Seq(0L, 0L, 25L, 127L, 255L, 255L), s"got $out")
    // the probe-measured property: equal-width domains → both dimensions
    // prune (the unnormalized 20-vs-14-bit mix let price dominate the curve)
    val two = spark.range(4096).select(
      (col("id") % 64).as("small"), (col("id") * 137 % 1048576).as("wide"))
    val zn = Scale.zorderValue(
      Scale.normalizeDim(col("small"), 0, 63, 10),
      Scale.normalizeDim(col("wide"), 0, 1048575, 10), bits = 10)
    // structural check: the two highest z bits are one bit from EACH dim —
    // bit 19 is the wide dim's (normalized) top bit, bit 18 the small dim's.
    // Unnormalized, the small dim contributes nothing above bit 11 and the
    // curve's coarse order is wide-only.
    val bad = two.withColumn("z", zn).filter(
      shiftright(col("z"), 19).bitwiseAND(lit(1L)) =!=
        shiftright(Scale.normalizeDim(col("wide"), 0, 1048575, 10), 9)
          .bitwiseAND(lit(1L)) ||
      shiftright(col("z"), 18).bitwiseAND(lit(1L)) =!=
        shiftright(Scale.normalizeDim(col("small"), 0, 63, 10), 9)
          .bitwiseAND(lit(1L))).count()
    assert(bad == 0, s"$bad rows whose z high bits don't come from both dims")
  }

  test("zorderLayoutAuto profiles bounds in one pass and restores two-sided pruning on skewed domains") {
    import spark.implicits._
    // the 256×256 grid of the layout test, but with SHIFTED and UNEQUAL raw
    // domains — x in [1000, 1255], y in [0, 255000] (1000× wider): laid out
    // raw, y would own every interleaved high bit and x-pruning would die
    // (the probe-measured caveat normalizeDim exists for)
    val grid = spark.range(65536).select(
      ((col("id") % 256) + 1000).as("x"),
      ((col("id") / 256).cast("long") * 1000).as("y"))
    // the stats pass reads the exact data min/max
    val ((xlo, xhi), (ylo, yhi)) = Scale.dimBounds(grid, col("x"), col("y"))
    assert((xlo, xhi) == ((1000L, 1255L)) && (ylo, yhi) == ((0L, 255000L)),
      s"[$xlo,$xhi] [$ylo,$yhi]")
    // auto layout: per-partition ranges of the NORMALIZED z are disjoint,
    // and a 32×32 box in raw coordinates touches ≤2 of 16 partitions —
    // the same payoff the hand-normalized grid test pins, with the bounds
    // discovered instead of supplied (both linear maps are exact here:
    // x−1000 and y/1000, so the normalized grid is the full 256×256 square)
    val laid = Scale.zorderLayoutAuto(grid, col("x"), col("y"),
      partitions = 16, bits = 8).persist()
    laid.count()
    val zn = Scale.zorderValue(
      Scale.normalizeDim(col("x"), xlo, xhi, 8),
      Scale.normalizeDim(col("y"), ylo, yhi, 8), bits = 8)
    val ranges = laid.select(spark_partition_id().as("p"), zn.as("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $hi1 > $lo2")
      case _ =>
    }
    val boxed = laid.filter(col("x") < 1032 && col("y") < 32000)
      .select(spark_partition_id()).distinct().count()
    assert(boxed <= 2, s"box query touched $boxed of 16 partitions")
    laid.unpersist()
    // a constant dimension degrades to a sort on the live one, not a refusal
    val const = spark.range(256).select(lit(5L).as("x"), col("id").as("y"))
    val laidC = Scale.zorderLayoutAuto(const, col("x"), col("y"),
      partitions = 4, bits = 8).persist()
    laidC.count()
    val perPart = laidC.select(spark_partition_id().as("p"), col("y"))
      .groupBy("p").agg(min("y").as("lo"), max("y").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).sortBy(_._1)
    perPart.sliding(2).foreach {
      case Array((_, h1), (l2, _)) => assert(h1 <= l2, s"overlap $h1 > $l2")
      case _ =>
    }
    laidC.unpersist()
    // empty input fails loudly instead of laying out a corrupt curve
    intercept[IllegalArgumentException] {
      Scale.dimBounds(grid.filter(lit(false)), col("x"), col("y"))
    }
  }

  test("denseIds: dense 0..n-1 in ord order, equal to the global row_number") {
    val s = spark
    import s.implicits._
    // sparse, shuffled ids with gaps; buckets of width 10
    val ids = scala.util.Random.shuffle((0L until 100L).map(_ * 7 + 3).toList)
    val df = ids.toDF("id")
    val got = Scale.denseIds(df, expr("id div 10"), Seq(col("id")))
      .select(col("id"), col("dense_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ids.sorted.zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got == want)
  }

  test("denseIds: assignment is independent of the bucket width") {
    val s = spark
    import s.implicits._
    val df = (0L until 500L).map(_ * 3).toDF("id")
    val a = Scale.denseIds(df, expr("id div 7"), Seq(col("id")))
      .select(col("id"), col("dense_id")).collect().map(_.toSeq).toSet
    val b = Scale.denseIds(df, expr("id div 1000"), Seq(col("id")))
      .select(col("id"), col("dense_id")).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("denseIds: no global sort — the corpus-scale exchange is the bucket hash") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).toDF("id")
    val plan = Scale.denseIds(df, expr("id div 64"), Seq(col("id")))
      .queryExecution.executedPlan.toString
    // the data-side window must partition by bucket, not sort the world:
    // a global row_number would show an Exchange SinglePartition feeding
    // a corpus Window; here SinglePartition appears only under the
    // metadata-sized offsets aggregate (which then broadcasts)
    val rnWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(rnWindows.nonEmpty &&
      rnWindows.forall(l => l.contains("windowspecdefinition(__bkt")),
      s"data window must be bucket-partitioned:\n$plan")
  }
}
