package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DataFrame-native count-min and HLL sketches: estimate guarantees,
  * register invariants, and partitioning stability. */
class ProfileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def freqDf = {
    // key k appears k times, k = 1..60 — known exact frequencies
    val rows = for (k <- 1 to 60; _ <- 1 to k) yield ("g", k.toString)
    rows.toDF("g", "key")
  }

  test("cmsEstimate never undercounts and is exact without collisions") {
    val df = freqDf
    val cells = Profile.cmsCells(df, Seq("g"), col("key"))
    val probes = (1 to 60).map(k => ("g", k.toString)).toDF("g", "key")
    val est = Profile.cmsEstimate(cells, probes, Seq("g"), col("key"))
      .collect().map(r => r.getString(1).toInt -> r.getLong(2)).toMap
    for (k <- 1 to 60) assert(est(k) >= k, s"undercount at $k: ${est(k)}")
    // 60 keys x 4 rows in 4096 cells: collisions essentially impossible
    assert((1 to 60).count(k => est(k) == k) == 60)
    // an absent key reads 0 from untouched cells
    val absent = Profile.cmsEstimate(cells,
      Seq(("g", "never-seen")).toDF("g", "key"), Seq("g"), col("key"))
      .head().getLong(2)
    assert(absent == 0L)
  }

  test("cmsCells is repartition-stable and adds bin-wise across splits") {
    val df = freqDf
    val whole = Profile.cmsCells(df, Seq("g"), col("key"))
    val re = Profile.cmsCells(df.repartition(13), Seq("g"), col("key"))
    assert(whole.exceptAll(re).isEmpty && re.exceptAll(whole).isEmpty)
    // count-min's merge property: cells(A ∪ B) = cells(A) + cells(B)
    val a = Profile.cmsCells(df.filter(col("key").cast("int") % 2 === 0),
      Seq("g"), col("key"))
    val b = Profile.cmsCells(df.filter(col("key").cast("int") % 2 === 1),
      Seq("g"), col("key"))
    val summed = a.unionByName(b).groupBy("g", "cell")
      .agg(sum(col("ct")).as("ct"))
    assert(whole.exceptAll(summed).isEmpty && summed.exceptAll(whole).isEmpty)
  }

  test("skewReport flags the hot key with exact integer measures") {
    // 1000 rows on one key + 100 singleton keys
    val rows = (1 to 1000).map(_ => "hot") ++ (1 to 100).map(i => s"k$i")
    val df = rows.toDF("k")
    val r = Profile.skewReport(df, col("k")).head()
    assert(r.getLong(0) == 1100L && r.getLong(1) == 101L &&
      r.getLong(2) == 1000L)
    assert(r.getAs[Long]("p50_ct") == 1L)
    // exact branch (no overflow risk here): 1000·1000·101 / 1100 ≈ 91.8×
    assert(r.getAs[Long]("hot_x1000") == 1000L * 1000 * 101 / 1100)
    // uniform data reads ~1000 (exactly, when sizes are equal)
    val uni = (1 to 100).flatMap(i => Seq.fill(7)(s"k$i")).toDF("k")
    assert(Profile.skewReport(uni, col("k")).head()
      .getAs[Long]("hot_x1000") == 1000L)
  }

  test("hllRegisters invariants and estimate accuracy on real keys") {
    val o = graft.model.Envelopes.table(spark, sfDir(), "orders")
    val regs = Profile.hllRegisters(o, Seq("o_orderstatus"), col("o_custkey"))
    // register index in [0, 2048), rank in [1, 22]
    assert(regs.filter(col("idx") < 0 || col("idx") >= 2048 ||
      col("rank") < 1 || col("rank") > 22).count() == 0)
    val exact = o.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Profile.hllSummary(regs, Seq("o_orderstatus")).collect().foreach { r =>
      val est = Profile.hllEstimate(r.getLong(1), r.getLong(2))
      val n = exact(r.getString(0))
      // 2048 registers → ~2.3 % std error; allow 4 sigma
      assert(math.abs(est - n).toDouble / n < 0.10,
        s"${r.getString(0)}: est $est vs exact $n")
    }
  }

  test("fkAudit counts nulls, orphans, and fan-out dups on a hand fixture") {
    val s = spark
    import s.implicits._
    // child: 2 rows → parent 10; 2 rows (1 key) → orphan 99; 1 null FK;
    // 1 row → dup parent 20 (fan-out)
    val child = Seq(Some(10L), Some(10L), Some(99L), Some(99L), None,
      Some(20L)).toDF("fk")
    val parent = Seq(10L, 20L, 20L, 30L).toDF("pk")
    val r = Profile.fkAudit(child, col("fk"), parent, col("pk")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((6L, 1L, 2L, 1L, 4L, 1L)))
  }

  test("fkAudit on a clean relationship reports all zeros") {
    val s = spark
    import s.implicits._
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profile.fkAudit(child, col("fk"), parent, col("pk")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)) ==
      ((0L, 0L, 0L, 0L)))
  }

  test("fkAudit on an EMPTY child reports integer zeros, never null") {
    // regression: sum(when(...)) over zero rows is NULL unless coalesced —
    // a `null_fk_rows == 0` gate on an honest empty partition must pass
    val s = spark
    import s.implicits._
    val child = Seq.empty[Long].toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Profile.fkAudit(child, col("fk"), parent, col("pk")).head()
    assert(!r.anyNull, "audit columns must be integers, never null")
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((0L, 0L, 0L, 0L, 2L, 0L)))
  }

  test("dqCheck: one-pass violation counts; null predicates violate; empty table is zeros") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(1L), Some("a")), (None, Some("b")), (Some(3L), None),
      (Some(-2L), Some("zz"))).toDF("x", "y")
    val got = Profile.dqCheck(df, Seq(
        "x_present" -> col("x").isNull,
        "x_positive" -> (col("x") <= 0), // null x -> null predicate -> violation
        "y_allowed" -> !col("y").isin("a", "b"))) // null y -> violation
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("x_present" -> ((4L, 1L)), "x_positive" -> ((4L, 2L)),
      "y_allowed" -> ((4L, 2L))), got)
    // empty table: all counts integer zero, never null
    val empty = Profile.dqCheck(Seq.empty[(Long, String)].toDF("x", "y"),
      Seq("x_present" -> col("x").isNull)).head()
    assert(!empty.anyNull && empty.getLong(1) == 0L && empty.getLong(2) == 0L)
    // duplicate names fail fast
    val ex = intercept[IllegalArgumentException] {
      Profile.dqCheck(df, Seq("a" -> col("x").isNull, "a" -> col("y").isNull))
    }
    assert(ex.getMessage.contains("unique"))
  }

  test("decayedCounts: hand fold with gaps; exact decay-out; negative periods fail") {
    val s = spark
    import s.implicits._
    // unit 2, pmax 2: a touched at 0 and 2 -> (2 >> 2) + 2 = 2;
    // b counted twice at 0 -> 4 >> 2 = 1; d once at 0 -> 2 >> 2 = 0, dropped
    val df = Seq(("a", 0L), ("a", 2L), ("b", 0L), ("b", 0L), ("d", 0L))
      .toDF("k", "p")
    val got = Profile.decayedCounts(df, col("k"), col("p"), unit = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L), got)
    val ex = intercept[IllegalArgumentException] {
      Profile.decayedCounts(Seq(("a", -1L)).toDF("k", "p"), col("k"), col("p"))
    }
    assert(ex.getMessage.contains("non-negative"))
    assert(Profile.decayedCounts(df.limit(0), col("k"), col("p")).isEmpty)
  }

  test("decayedCounts equals IncrementalDecay folded one batch per period") {
    val s = spark
    import s.implicits._
    val rows = (0L until 200L).map(i => (s"k${i % 13}", (i * 7 + i % 5) % 9))
    val df = rows.toDF("k", "p")
    val batch = Profile.decayedCounts(df, col("k"), col("p"), unit = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val store = java.nio.file.Files.createTempDirectory("dec_par").toString + "/st"
    var streamed: Map[String, Long] = Map.empty
    for (p <- 0L to rows.map(_._2).max) {
      val b = rows.filter(_._2 == p).map(_._1).toDF("k") // may be empty
      streamed = graft.streaming.IncrementalDecay
        .mergeBatch(b, store, col("k"), batchId = p, unit = 100L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(batch == streamed, s"batch $batch != stream $streamed")
  }

  test("dqCheckBy: per-cohort counts; null cohorts get their own row; dotted names resolve") {
    val s = spark
    import s.implicits._
    val df = Seq((Some("a"), Some(1L)), (Some("a"), None), (None, Some(-3L)))
      .toDF("src", "x")
    val got = Profile.dqCheckBy(df, col("src"), Seq(
        "x.present" -> col("x").isNull, // dotted name: alias must still resolve
        "x_pos" -> (col("x") <= 0)))
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      (Some("a"), "x.present") -> ((2L, 1L)),
      (Some("a"), "x_pos") -> ((2L, 1L)), // null x -> null predicate -> violation
      (None, "x.present") -> ((1L, 0L)),
      (None, "x_pos") -> ((1L, 1L))), got)
  }

  test("covComponents: exact sums on a hand fixture; derived r matches direct computation") {
    val s = spark
    import s.implicits._
    // y = 2x exactly, z anti-correlated with x; one row with a null y
    val df = Seq((1.0, Some(2.0), 3.0), (2.0, Some(4.0), 2.0),
      (3.0, Some(6.0), 1.0), (4.0, None, 0.0)).toDF("x", "y", "z")
    val got = Profile.covComponents(df, Seq("x", "y", "z"), scale = 0)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDecimal(8).longValueExact()))).toMap
    // (x,y): n=3 (null y row excluded), cov_num = 3*28 - 6*12 = 12
    assert(got(("x", "y")) == ((3L, 12L)), got(("x", "y")))
    // (x,z): n=4, cov_num = 4*(3+4+3+0) - 10*6 = -20 (perfect anti)
    assert(got(("x", "z")) == ((4L, -20L)))
    // NaN/Inf are excluded like nulls, never floored into the sums
    val dirty = Seq((1.0, 2.0), (2.0, 4.0), (Double.NaN, 9.0),
      (Double.PositiveInfinity, 9.0)).toDF("x", "y")
    val dgot = Profile.covComponents(dirty, Seq("x", "y"), scale = 0)
      .filter(col("x") === "x" && col("y") === "y").head()
    assert(dgot.getLong(2) == 2L, "non-finite rows must not count toward n")
    assert(BigDecimal(dgot.getDecimal(3)) == BigDecimal(3), "sx skips non-finite")

    // r derived from the components = direct Pearson (up to float)
    val r = Profile.covComponents(df.filter(col("y").isNotNull),
        Seq("x", "z"), scale = 6)
      .filter(col("x") === "x" && col("y") === "z").head()
    val (n, sx, sy, sxy, sxx, syy) = (r.getLong(2),
      BigDecimal(r.getDecimal(3)), BigDecimal(r.getDecimal(4)),
      BigDecimal(r.getDecimal(5)), BigDecimal(r.getDecimal(6)),
      BigDecimal(r.getDecimal(7)))
    val pearson = ((n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
    assert(math.abs(pearson - (-1.0)) < 1e-9, s"r = $pearson")
  }

  test("joinPreflight prices the join without running it; totals exact") {
    val s = spark
    import s.implicits._
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k") // key 1 x3
    val right = Seq(1L, 1L, 2L, 9L).toDF("k")    // key 1 x2; 9 unmatched
    val got = Profile.joinPreflight(left, col("k"), right, col("k"), topK = 1)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getDecimal(3).longValueExact())).toSet
    // top key 1: 3*2 = 6; totals over MATCHED keys: l=4, r=3, out=7
    assert(got == Set((Some("1"), 3L, 2L, 6L), (None, 4L, 3L, 7L)), got)
    // parity with actually running the join
    val real = left.join(right, "k").count()
    assert(real == 7L)
  }

  test("hllRegisters union by max equals registers of the union") {
    val o = graft.model.Envelopes.table(spark, sfDir(), "orders")
    val whole = Profile.hllRegisters(o, Seq("o_orderstatus"), col("o_custkey"))
    val a = Profile.hllRegisters(o.filter(col("o_orderkey") % 2 === 0),
      Seq("o_orderstatus"), col("o_custkey"))
    val b = Profile.hllRegisters(o.filter(col("o_orderkey") % 2 === 1),
      Seq("o_orderstatus"), col("o_custkey"))
    val merged = a.unionByName(b).groupBy("o_orderstatus", "idx")
      .agg(max(col("rank")).as("rank"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }
}
