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

  test("wrong arity fails at analysis with the function's own message") {
    val e = intercept[Exception](spark.sql("SELECT graft_cosine(1)").collect())
    assert(e.getMessage.contains("graft_cosine"))
  }
}
