package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes
import graft.streaming.CepStream.CepEvent

/** Streaming CEP parity: the flatMapGroupsWithState automaton equals the
  * batch fold on a complete replay, wherever the micro-batch boundaries
  * fall — including a partial match that spans batches — and in-batch
  * disorder is repaired by the group sort. */
class CepStreamSpec extends SparkSpec {

  private val vcp = Seq("view", "click", "purchase")

  private def run(batches: Seq[Seq[CepEvent]], pattern: Seq[String] = vcp,
      w: Long = 604800000L): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[CepEvent]
    val q = CepStream.attach(mem.toDS(), pattern, w).writeStream
      .format("memory").queryName("cep_out").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("cep_out").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
          r.getAs[Long]("match_end")))
        .sortBy(identity).toSeq
    } finally q.stop()
  }

  private def batch(events: Seq[CepEvent], pattern: Seq[String] = vcp,
      w: Long = 604800000L): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    graft.ops.Cep.patternMatches(events.toDF(), col("k"), col("tms"),
        col("oid"), col("ty"), pattern, w)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
  }

  test("a partial match spanning micro-batches completes from stored state") {
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"))
    val b2 = Seq(CepEvent(1, 30, 3, "purchase"), CepEvent(1, 40, 4, "view"))
    val b3 = Seq(CepEvent(1, 50, 5, "click"), CepEvent(1, 60, 6, "purchase"))
    val all = b1 ++ b2 ++ b3
    val got = run(Seq(b1, b2, b3), w = 1000)
    assert(got == Seq((1L, 10L, 30L), (1L, 40L, 60L)))
    assert(got == batch(all, w = 1000))
  }

  test("timeout state carried across batches: stale partial abandoned") {
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"))
    val b2 = Seq(CepEvent(1, 5000, 3, "purchase"))
    assert(run(Seq(b1, b2), w = 100).isEmpty)
    assert(batch(b1 ++ b2, w = 100).isEmpty)
  }

  test("in-batch disorder is repaired by the group sort") {
    val shuffled = Seq(CepEvent(1, 30, 3, "purchase"),
      CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"))
    assert(run(Seq(shuffled), w = 1000) == Seq((1L, 10L, 30L)))
  }

  test("fixture replay: any batch split equals the batch operator") {
    val s = spark
    import s.implicits._
    val events = Envelopes.events(s, sfDir())
      .filter(col("event_type").isin(vcp: _*))
      .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
        col("event_id").as("oid"), col("event_type").as("ty"))
      .as[CepEvent].collect().toSeq.sortBy(e => (e.tms, e.oid))
    val expected = batch(events)
    assert(expected.nonEmpty)
    // per-key time order holds across ANY consecutive split of the
    // time-sorted log — try two different boundaries
    for (parts <- Seq(3, 7)) {
      val size = math.max(1, (events.length + parts - 1) / parts)
      assert(run(events.grouped(size).toSeq) == expected)
    }
  }
}
