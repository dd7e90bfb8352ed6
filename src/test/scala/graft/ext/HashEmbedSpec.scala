package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Feature-hashing doc vectors: exact signed-count components, the
  * near-dup collision property without any embedding model, and schema
  * compatibility with the Similarity family. */
class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("components are exact signed token counts; dup texts hash identically") {
    val df = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha beta alpha"),     // exact dup of 1
      (3L, "gamma delta epsilon zeta")).toDF("doc_id", "text")
    val v = TextStats.hashEmbed(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(v(1L) == v(2L), "identical text must produce identical vectors")
    // alpha appears twice: its component carries ±2; total L1 mass = 3
    assert(v(1L).map(math.abs).sum == 3.0f)
    assert(v(3L).map(math.abs).sum == 4.0f)
    assert(v.values.forall(_.length == 64))
  }

  test("near-dup corpus docs collide in hashed space; unrelated docs do not") {
    val docs = graft.model.Envelopes.table(spark, sfDir(), "documents")
    val v = TextStats.hashEmbed(docs, col("doc_id"), col("text"))
      .withColumn("n2", Similarity.dot(col("embedding"), col("embedding")))
    val a = v.select(col("doc_id").as("a_id"), col("embedding").as("ae"),
      col("n2").as("an"))
    val b = v.select(col("doc_id").as("b_id"), col("embedding").as("be"),
      col("n2").as("bn"))
    val pairs = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("d", Similarity.dot(col("ae"), col("be")))
      .filter(col("d") > 0 &&
        col("d") * col("d") * 400 >= col("an") * col("bn") * 361)
      .select(col("a_id"), col("b_id"))
    // the fixture's planted near-dups surface with NO embedding model:
    // the hashed pairs must substantially overlap the text-level
    // Jaccard >= 1/2 pair set
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"))
    val jac = Dedup.ngramJaccardPairs(sh, 1, 2)
      .select(col("a_id"), col("b_id"))
    val nJac = jac.count()
    val hit = jac.join(pairs, Seq("a_id", "b_id"), "left_semi").count()
    assert(nJac > 0 && hit.toDouble / nJac > 0.5,
      s"hashed space should recover most text near-dups: $hit of $nJac")

    // repartition-stable
    val v2 = TextStats.hashEmbed(docs.repartition(7), col("doc_id"),
      col("text")).select(col("doc_id"), col("embedding"))
    val v1 = TextStats.hashEmbed(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("embedding"))
    assert(v1.exceptAll(v2).isEmpty && v2.exceptAll(v1).isEmpty)
  }

  test("the bridge: hashed vectors drive k-means with no embedding model") {
    val docs = graft.model.Envelopes.table(spark, sfDir(), "documents")
    val v = TextStats.hashEmbed(docs, col("doc_id"), col("text"))
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val labels = Similarity.kmeansLabels(v, k = 4, iters = 1)
    assert(labels.count() == v.count())
    assert(labels.select("label").distinct().count() > 1,
      "clustering over hashed vectors must separate the corpus")
    graft.util.Blocks.freeCheckpoint(labels)
  }
}
