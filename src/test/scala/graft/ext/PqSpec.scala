package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Product quantization: code-table structure, determinism under
  * partitioning, empty-cluster shrink, and ADC retrieval quality against
  * brute-force Euclidean ranks. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.model.Envelopes.table(spark, sfDir(), "embeddings")

  test("codes: every vector gets exactly m codes in [0, k); repartition-stable") {
    val e = emb
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val codes = Similarity.pqEncode(e, books, m = 4)
    val n = e.count()
    assert(codes.count() == n * 4)
    assert(codes.select("vec_id", "sub").distinct().count() == n * 4)
    assert(codes.filter(col("code") < 0 || col("code") >= 16).count() == 0)
    // the codebook itself: <= m*k entries, subvector-width centroids
    assert(books.count() <= 4L * 16)
    assert(books.filter(size(col("centroid")) =!=
      lit(64 / 4)).count() == 0)

    val books2 = Similarity.pqCodebooks(e.repartition(11), m = 4, k = 16,
      iters = 2)
    val codes2 = Similarity.pqEncode(e.repartition(5), books2, m = 4)
    assert(codes.exceptAll(codes2).isEmpty && codes2.exceptAll(codes).isEmpty)
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(books2)
  }

  test("identical vectors always share codes; empty clusters shrink the book") {
    // 40 vectors in two exact groups -> after training, each group's codes
    // agree per sub, and k=8 books keep at most the surviving clusters
    val rows = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Array.fill(8)(1.0f) else Array.fill(8)(-1.0f)
      (i, base)
    }
    val e = rows.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(e, m = 2, k = 8, iters = 2)
    val codes = Similarity.pqEncode(e, books, m = 2)
    val distinctPerGroup = codes
      .withColumn("grp", col("vec_id") % 2)
      .select("grp", "sub", "code").distinct()
    // 2 groups x 2 subs = 4 (grp, sub) cells, each with ONE code
    assert(distinctPerGroup.count() == 4)
    graft.util.Blocks.freeCheckpoint(books)
  }

  test("ivfPqTopK ranks exactly the probed cells' vectors, ADC-consistently") {
    val e = emb
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val codes = Similarity.pqEncode(e, books, m = 4)
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = Similarity.ivfPqTopK(qs, e, books, codes, m = 4, topK = 5,
      nProbe = 2)
    // consistency identity: the full ADC ranking restricted to each
    // query's probed cells, re-ranked, must reproduce the composition
    val full = Similarity.pqTopK(qs, books, codes, m = 4,
      topK = e.count().toInt)
    val cells = Similarity.ivfPqTopK(qs, e, books, codes, m = 4,
      topK = e.count().toInt, nProbe = 2)
      .select(col("query_id"), col("vec_id"))
    val want = full.join(cells, Seq("query_id", "vec_id"))
      .withColumn("rk2", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("rk"))))
      .filter(col("rk2") <= 5)
      .select(col("query_id"), col("vec_id"), col("rk2").as("rk"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "composition must equal the full ADC ranking restricted to probed cells")
    // and every result sits in one of the query's 2 probed cells: implied
    // by the identity above (cells came from the composition itself), so
    // pin the cell restriction directly too
    val labels = e.select(col("vec_id"), col("label"))
    val nCells = got.join(labels, "vec_id")
      .select(col("query_id"), col("label")).distinct()
      .groupBy("query_id").count()
    assert(nCells.filter(col("count") > 2).count() == 0,
      "results must come from at most nProbe cells per query")
    graft.util.Blocks.freeCheckpoint(books)
  }

  test("ivfPqRerank equals exact cosine ranking over the ADC shortlist") {
    val e = emb
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val codes = Similarity.pqEncode(e, books, m = 4)
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = Similarity.ivfPqRerank(qs, e, books, codes, m = 4,
      shortlist = 40, topK = 5, nProbe = 2)
    val sl = Similarity.ivfPqTopK(qs, e, books, codes, m = 4, topK = 40,
      nProbe = 2).select(col("query_id"), col("vec_id"))
    val qn = qs.select(col("query_id"), col("embedding").as("qe"))
    val cn = e.select(col("vec_id"), col("embedding").as("ce"))
    val want = sl.join(qn, "query_id").join(cn, "vec_id")
      .withColumn("sim",
        Similarity.dot(col("qe"), col("ce")) /
          (sqrt(Similarity.dot(col("qe"), col("qe"))) *
            sqrt(Similarity.dot(col("ce"), col("ce")))))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id"), col("rk").cast("long").as("rk"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    graft.util.Blocks.freeCheckpoint(books)
  }

  test("ADC top-10 reaches the true Euclidean head of the corpus") {
    val e = emb
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val codes = Similarity.pqEncode(e, books, m = 4)
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = Similarity.pqTopK(qs, books, codes, m = 4, topK = 10)
    // brute-force squared-Euclidean rank (d^2 = |q|^2 - 2q.c + |c|^2;
    // constant |q|^2 dropped, same ranking)
    val scored = qs.select(col("query_id"), col("embedding").as("qe"))
      .crossJoin(e.select(col("vec_id"), col("embedding").as("ce")))
      .select(col("query_id"), col("vec_id"),
        (Similarity.dot(col("ce"), col("ce")) -
          lit(2.0) * Similarity.dot(col("qe"), col("ce"))).as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d"), col("vec_id"))
    val trueRk = scored.withColumn("trk", row_number().over(w))
    val best = top.join(trueRk, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(min(col("trk")).as("best_trk"))
    val n = e.count()
    val meanBest = best.agg(avg(col("best_trk"))).head().getDouble(0)
    assert(meanBest < n / 4.0,
      s"ADC top-10 should land deep in the true head: mean best true rank " +
        s"$meanBest of $n")
    graft.util.Blocks.freeCheckpoint(books)
  }
}
