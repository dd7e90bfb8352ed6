package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextStats
import graft.model.{Envelopes, Views}

/** The SQL function surface (`GraftExtensions`) equals the DataFrame surface
  * bit-for-bit: both are built from the same shared Column definitions, and
  * this spec proves a `spark.sql` user gets identical values through the
  * registered views. */
class SqlSurfaceSpec extends SparkSpec {

  test("graft_cosine / graft_dot over views equal the DataFrame formulation") {
    Views.register(spark, sfDir())
    val sqlSide = spark.sql(
      """SELECT a.vec_id qa, b.vec_id qb,
        |       graft_cosine(a.embedding, b.embedding) sim,
        |       graft_dot(a.embedding, b.embedding) dot
        |FROM graft_embeddings a JOIN graft_embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 5 AND b.vec_id < 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val e = Envelopes.table(spark, sfDir(), "embeddings").filter(col("vec_id") < 5)
    val dfSide = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        (DotProduct(col("a.embedding"), col("b.embedding")) /
          (sqrt(DotProduct(col("a.embedding"), col("a.embedding"))) *
            sqrt(DotProduct(col("b.embedding"), col("b.embedding"))))).as("sim"),
        DotProduct(col("a.embedding"), col("b.embedding")).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(sqlSide == dfSide && sqlSide.nonEmpty) // identical doubles, not approx
  }

  test("graft_quality / graft_token_count / graft_fingerprint equal their DataFrame twins") {
    Views.register(spark, sfDir())
    val sqlSide = spark.sql(
      """SELECT doc_id, graft_quality(text) q, graft_token_count(text) n,
        |       graft_fingerprint(text) fp
        |FROM graft_documents""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getString(3)))).toMap
    val dfSide = Envelopes.table(spark, sfDir(), "documents")
      .select(col("doc_id"), TextStats.qualityScore(col("text")).as("q"),
        size(TextStats.toks(col("text"))).cast("long").as("n"),
        TextStats.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getString(3)))).toMap
    assert(sqlSide == dfSide && sqlSide.nonEmpty)
  }

  test("sketch aggregators are callable from SQL and equal their typed twins") {
    Views.register(spark, sfDir())
    // HLL distinct + Misra-Gries heavy hitters + a count-min point estimate,
    // all grouped by language over the documents view — the group-by makes
    // partial aggregation (map-side combine) part of what's exercised
    val sql = spark.sql(
      """SELECT lang, graft_hll(text) AS dist,
        |       graft_heavy_hitters(substring(text, 1, 8)) AS hh,
        |       graft_cm_est(graft_cm_sketch(substring(text, 1, 8)),
        |                    'the quic') AS est
        |FROM graft_documents GROUP BY lang""".stripMargin)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Map[String, Long]](2), r.getLong(3)))).toMap
    assert(sql.nonEmpty)
    // typed twins over the same grouping
    val docs = Envelopes.table(spark, sfDir(), "documents")
    import spark.implicits._
    val typedHll = docs.select(col("lang"), col("text")).as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.Hll.stringDistinct.toColumn)
      .collect().toMap
    val typedHh = docs.selectExpr("lang", "substring(text, 1, 8) AS p")
      .as[(String, String)].groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.MisraGries.stringHeavyHitters.toColumn)
      .collect().toMap
    sql.foreach { case (lang, (dist, hh, est)) =>
      assert(dist == typedHll(lang), s"HLL mismatch for $lang")
      assert(hh == typedHh(lang), s"MG mismatch for $lang")
      assert(est >= 0L) // count-min never undercounts; 0 only if absent
    }
  }

  test("wrong arity fails at analysis with the function's own message") {
    val e = intercept[Exception](spark.sql("SELECT graft_cosine(1)").collect())
    assert(e.getMessage.contains("graft_cosine"))
  }
}
