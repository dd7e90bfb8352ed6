package graft

import org.apache.spark.sql.functions._
import graft.model.Envelopes

/** Sketch aggregates for 100 TB cardinality work: HyperLogLog++ distinct
  * counting runs in fixed memory per group (vs the exact distinct's full
  * shuffle of the key set) and its register-max merge is commutative, so
  * the estimate is independent of partitioning and merge order — safe to
  * use in deterministic pipelines. No DuckDB oracle (different sketch
  * algorithms give different estimates by design); the contract pinned here
  * is relative error and partition-independence against the exact count. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct: bounded error, partition- and order-independent") {
    val li = Envelopes.table(spark, sfDir("sf0.01"), "lineitem")
    val exact = li.select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.select(approx_count_distinct(col("l_orderkey"), 0.02)).collect()(0).getLong(0)
    val e1 = est(li)
    assert(math.abs(e1 - exact).toDouble / exact < 0.05,
      s"estimate $e1 vs exact $exact drifted past 5%")
    // register-max merge is commutative: any partitioning, same estimate
    assert(est(li.repartition(17, col("l_shipdate"))) == e1)
    assert(est(li.orderBy(col("l_quantity"))) == e1)
  }

  test("grouped HLL matches grouped exact within tolerance for every group") {
    val li = Envelopes.table(spark, sfDir("sf0.01"), "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"group ${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("approx_percentile: rank error within accuracy bound, deterministic") {
    val li = Envelopes.table(spark, sfDir("sf0.01"), "lineitem")
    val n = li.count()
    // accuracy 1000 → rank error ≤ n/1000; verify via the exact rank of the
    // returned value (the guarantee is on RANK, not on the value distance)
    val qs = Seq(0.25, 0.5, 0.9)
    val est = li.select(approx_percentile(col("l_extendedprice"),
        array(qs.map(lit): _*), lit(1000))).collect()(0).getSeq[Double](0)
    qs.zip(est).foreach { case (q, v) =>
      val rank = li.filter(col("l_extendedprice") <= v).count()
      assert(math.abs(rank - q * n) <= n / 1000.0 + 1,
        s"p$q: value $v has rank $rank, want ${q * n} ± ${n / 1000.0}")
    }
    // the GK-style sketch is deterministic for a fixed partitioning; and any
    // partitioning stays within the rank bound
    val est2 = li.repartition(17, col("l_orderkey"))
      .select(approx_percentile(col("l_extendedprice"),
        array(qs.map(lit): _*), lit(1000))).collect()(0).getSeq[Double](0)
    qs.zip(est2).foreach { case (q, v) =>
      val rank = li.filter(col("l_extendedprice") <= v).count()
      assert(math.abs(rank - q * n) <= n / 1000.0 + 1)
    }
  }

  test("count-min sketch: never undercounts, εN overcount bound, exact merge determinism") {
    val s = spark
    import s.implicits._
    import graft.functions.CountMin
    val toks = Envelopes.table(spark, sfDir(), "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok")).as[String]
    val total = toks.count()
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = toks.select(CountMin.stringFreq.toColumn).collect()(0)
    // counter additions are exact integer ops: ANY partitioning yields the
    // bitwise-identical sketch, not just a close one
    val sketch2 = toks.repartition(17).select(CountMin.stringFreq.toColumn).collect()(0)
    assert(java.util.Arrays.equals(sketch, sketch2))
    val eps = math.E / CountMin.W
    exact.foreach { case (tok, ct) =>
      val est = CountMin.estimate(sketch, tok)
      assert(est >= ct, s"$tok: undercount $est < $ct")
      assert(est <= ct + math.max(1L, math.ceil(2 * eps * total).toLong),
        s"$tok: overcount $est vs $ct (N=$total)")
    }
    // element-wise union of two half-corpus sketches == whole-corpus sketch
    val half1 = toks.filter(length(col("tok")) % 2 === 0)
      .select(CountMin.stringFreq.toColumn).collect()(0)
    val half2 = toks.filter(length(col("tok")) % 2 === 1)
      .select(CountMin.stringFreq.toColumn).collect()(0)
    assert(java.util.Arrays.equals(CountMin.add(half1, half2), sketch))
  }

  test("Misra-Gries: every heavy key present, undercount bounded, any partitioning") {
    val s = spark
    import s.implicits._
    import graft.functions.MisraGries
    val toks = Envelopes.table(spark, sfDir(), "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok")).as[String]
    val n = toks.count()
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n / (MisraGries.K + 1) // deterministic εn, no probability
    for (df <- Seq(toks, toks.repartition(17), toks.repartition(3))) {
      val mg = df.select(MisraGries.stringHeavyHitters.toColumn).collect()(0)
      assert(mg.size <= MisraGries.K)
      exact.foreach { case (tok, ct) =>
        if (ct > bound)
          assert(mg.contains(tok), s"heavy key $tok ($ct > $bound) missing")
        mg.get(tok).foreach { est =>
          assert(est <= ct && est >= ct - bound,
            s"$tok: reported $est outside [${ct - bound}, $ct]")
        }
      }
    }
  }
}
