package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.{Ranking, Similarity}

/** The two RETRIEVAL INDEX stores driven by real Structured Streaming
  * queries (MemoryStream → foreachBatch → store fold), across a query
  * RESTART: Spark's per-query batch ids restart at 0, and the caller-held
  * offset keeps fold ids unique across queries (the
  * [[ModelCurateStreamSpec]] discipline). After the streams drain,
  * store-backed retrieval equals the batch operators over everything ever
  * streamed — the unit specs pin per-fold parity; this suite pins the
  * STREAMING DELIVERY path end to end. */
class RetrievalIndexStreamSpec extends SparkSpec {

  test("streamed IVFADC index: store search == batch ivfPqTopK across a restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val e = graft.model.Envelopes.table(s, sfDir(), "embeddings")
      .localCheckpoint(true)
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val store = Files.createTempDirectory("ivf_stream").toString + "/ix"
    def run(idBatches: Seq[Seq[Long]], off: Long): Unit = {
      val mem = MemoryStream[Long]
      val q = mem.toDF().toDF("vec_id").writeStream
        .foreachBatch { (b: DataFrame, bid: Long) =>
          IncrementalIvf.mergeBatch(
            e.join(b.select(col("vec_id")), "vec_id"), store, books,
            batchId = off + bid)
          ()
        }.start()
      try idBatches.foreach { ids => mem.addData(ids: _*); q.processAllAvailable() }
      finally q.stop()
    }
    val ids = e.select("vec_id").collect().map(_.getLong(0)).toSeq
    // first query: two micro-batches; restart query: the remainder
    run(Seq(ids.filter(_ % 3 == 0), ids.filter(_ % 3 == 1)), off = 0L)
    run(Seq(ids.filter(_ % 3 == 2)), off = 2L)
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = IncrementalIvf.search(s, store, qs, books, m = 4, topK = 5,
      nProbe = 2)
    val want = Similarity.ivfPqTopK(qs, e, books,
      Similarity.pqEncode(e, books, m = 4), m = 4, topK = 5, nProbe = 2)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(e)
  }

  test("streamed document-frequency index: bm25Store == batch bm25 across a restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val d = graft.model.Envelopes.table(s, sfDir(), "documents")
      .localCheckpoint(true)
    val store = Files.createTempDirectory("df_stream").toString + "/df"
    def run(idBatches: Seq[Seq[Long]], off: Long): Unit = {
      val mem = MemoryStream[Long]
      val q = mem.toDF().toDF("doc_id").writeStream
        .foreachBatch { (b: DataFrame, bid: Long) =>
          IncrementalDf.mergeBatch(
            d.join(b.select(col("doc_id")), "doc_id"), store,
            col("doc_id"), col("text"), batchId = off + bid)
          ()
        }.start()
      try idBatches.foreach { ids => mem.addData(ids: _*); q.processAllAvailable() }
      finally q.stop()
    }
    val ids = d.select("doc_id").collect().map(_.getLong(0)).toSeq
    run(Seq(ids.filter(_ % 3 == 0), ids.filter(_ % 3 == 1)), off = 0L)
    run(Seq(ids.filter(_ % 3 == 2)), off = 2L)
    val terms = Seq("spark", "window")
    val got = IncrementalDf.bm25Store(s, store, d, col("doc_id"),
      col("text"), terms, topK = 20)
    val want = Ranking.bm25(d, col("doc_id"), col("text"), terms, topK = 20)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    graft.util.Blocks.freeCheckpoint(d)
  }
}
