package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** Native codegen dot product: equals the interpreted higher-order-function
  * formulation bit-for-bit, handles nulls, survives both codegen paths. */
class DotProductSpec extends SparkSpec {

  test("matches the aggregate/zip_with formulation exactly") {
    val e = Envelopes.table(spark, sfDir(), "embeddings").limit(100)
    val hof = expr(
      "aggregate(zip_with(embedding, embedding, (x, y) -> double(x) * double(y)), 0D, (acc, v) -> acc + v)")
    val diff = e.select((DotProduct(col("embedding"), col("embedding")) - hof).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0) // identical left-fold order → identical doubles
  }

  test("null inputs yield null; interpreted path agrees with codegen") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(1.0f)), None)
    ).toDF("a", "b")
    val got = df.select(DotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) == 11.0 && got(1) == null && got(2) == null)
    // interpreted (no-codegen) path
    val one = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f, 4.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(one.eval(null) == 11.0)
  }

  test("mismatched lengths yield null (matches zip_with null-pad semantics)") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    // codegen path
    assert(df.select(DotProduct(col("a"), col("b"))).head().isNullAt(0))
    // the HOF twin agrees: zip_with pads with null, so the sum is null
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0D, (acc, v) -> acc + v)")
    assert(df.select(hof).head().isNullAt(0))
    // interpreted path
    val mism = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(mism.eval(null) == null)
  }
}
