package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (crossJoin + window rank). Scale path:
  * IVF-style probing — restrict the search to the query's nearest coarse
  * clusters so the crossJoin touches a fraction of the corpus; the cluster id
  * doubles as the shuffle/partition key at 100 TB.
  */
object Similarity {

  /** Double-precision dot product in list order (deterministic — `aggregate`
    * folds left-to-right, matching DuckDB's list accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Brute-force cosine top-k: for each query vector, rank all corpus vectors
    * (excluding itself) by (cosine desc, id asc) and keep `k`. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val joined = queries.as("q").crossJoin(corpus.as("c"))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("n_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("sim"))
    joined.withColumn("rank",
        row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** Embedding near-dup pairs: all (a, b), a < b, with cosine ≥ threshold. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame =
    emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .filter(cosine(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))

  /** IVF-style approximate top-k: coarse clusters come from the `label`
    * column (stand-in for k-means cells); centroids are per-cluster means;
    * each query probes its `nProbe` nearest centroids and ranks only those
    * clusters' vectors. Float centroid averaging is order-sensitive, so this
    * operator is verified by a recall unit test against [[bruteForceTopK]]
    * rather than a SQL oracle. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    val dims = corpus.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
    val centroids = dims.groupBy("label", "pos").agg(avg(col("v")).as("cv"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
      .select(col("label").as("c_label"), transform(col("ps"), p => p.getField("cv")).as("centroid"))
    val probes = queries.as("q").crossJoin(centroids)
      .select(col("q.vec_id").as("q_id"), col("q.embedding").as("q_emb"), col("c_label"),
        cosine(col("q.embedding"), col("centroid")).as("c_sim"))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("c_sim").desc, col("c_label"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("c_label"))
    val scored = probes.join(corpus.as("c"), col("c_label") === col("c.label"))
      .filter(col("q_id") =!= col("c.vec_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        cosine(col("q_emb"), col("c.embedding")).as("sim"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }
}
