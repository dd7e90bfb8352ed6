package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes
import graft.queries.DwdComposite

/** Incremental materialized view of the flagship 4-way DWD join: after EVERY
  * micro-batch — arbitrary interleavings and splits of the four CDC inputs —
  * the maintained view equals the batch join over all rows seen so far, and
  * a CDC delete retracts its row from the view. */
class ViewMaintainerSpec extends SparkSpec {

  private def put(df: DataFrame): DataFrame = df.withColumn("op", lit("put"))

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select("id", "order_id", "user_id", "activity_id", "coupon_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("per-batch view equals the batch composite; deletes retract") {
    val s = spark
    val dir = sfDir()
    val root = Files.createTempDirectory("odview").toString + "/v"
    val view = new OrderDetailView(root)

    val od = put(Envelopes.orderDetail(s, dir))
    val oi = put(Envelopes.orderInfo(s, dir))
    val oda = put(Envelopes.orderDetailActivity(s, dir))
    val odc = put(Envelopes.orderDetailCoupon(s, dir))

    // retract-stream fold-back state: apply each batch's changelog to a
    // driver-side table; after every batch it must equal current() — the
    // constructive Flink retract-stream parity
    val folded = scala.collection.mutable.Map[Long, (Long, Long, Long, Long)]()
    def chg(cl: DataFrame): Seq[(Long, String, Long)] = {
      val got = cl.select("id", "op", "order_id", "user_id", "activity_id",
          "coupon_id").collect()
        .map(r => (r.getLong(0), r.getString(1),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      got.foreach {
        case (id, "-D", _) => folded.remove(id)
        case (id, "-U", _) => () // superseded by the paired +U
        case (id, _, v) => folded(id) = v
      }
      got.map(t => (t._1, t._2, t._3._3)).toIndexedSeq
    }
    def assertFoldParity(): Unit = {
      val v = view.current(s).select("id", "order_id", "user_id",
          "activity_id", "coupon_id").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toMap
      assert(folded.toMap == v,
        s"changelog fold diverged from the view: ${folded.size} vs ${v.size}")
    }

    // batch 1: half of od (odd order ids), NO order_info yet, all activity
    val cl1 = chg(view.applyBatch(1L,
      od.filter(col("order_id") % 2 === 1), oi.limit(0), oda, odc.limit(0)))
    assert(view.current(s).isEmpty,
      "without order_info the inner join must keep the view empty")
    assert(cl1.isEmpty, "an empty view transition must emit no changelog")

    // batch 2: all order_info arrives + the coupons — the oi fan-out must
    // pull batch-1's od rows into the view
    val cl2 = chg(view.applyBatch(2L, od.limit(0), oi, oda.limit(0), odc))
    val afterB2 = rows(view.current(s))
    val expectB2 = rows(DwdComposite.queries("q_dwd_order_detail")(s, dir)
      .filter(col("order_id") % 2 === 1))
    assert(afterB2 == expectB2, s"batch-2 view diverged: ${afterB2.size} vs ${expectB2.size}")
    // first appearance of every key: pure +I, one per view row
    assert(cl2.forall(_._2 == "+I") && cl2.map(_._1).toSet == afterB2.map(_._1),
      s"batch-2 changelog must be all +I: ${cl2.filterNot(_._2 == "+I").take(3)}")
    assertFoldParity()

    // batch 3: the remaining od rows
    val cl3 = chg(view.applyBatch(3L, od.filter(col("order_id") % 2 === 0),
      oi.limit(0), oda.limit(0), odc.limit(0)))
    val afterB3 = rows(view.current(s))
    val expectAll = rows(DwdComposite.queries("q_dwd_order_detail")(s, dir))
    assert(afterB3 == expectAll, s"batch-3 view diverged: ${afterB3.size} vs ${expectAll.size}")
    assert(cl3.forall(_._2 == "+I"), "new keys only — no updates in batch 3")
    assertFoldParity()

    // batch 4: CDC delete of one detail id — the delete carries the SAME
    // payload as the put it retracts (standard Maxwell/Debezium); winning is
    // by arrival batch, no fabricated version columns
    val victim = afterB3.head._1
    val del = od.filter(col("id") === victim).limit(1).withColumn("op", lit("delete"))
    val cl4 = chg(view.applyBatch(4L, del, oi.limit(0), oda.limit(0), odc.limit(0)))
    val afterB4 = rows(view.current(s))
    assert(!afterB4.exists(_._1 == victim), "deleted id must leave the view")
    assert(afterB4 == expectAll.filterNot(_._1 == victim),
      "delete must retract exactly the victim's row")
    assert(cl4 == Seq((victim, "-D", afterB3.find(_._1 == victim).get._4)),
      s"the delete must emit exactly one -D carrying the retracted row: $cl4")
    assertFoldParity()

    // batch 5/6: delete an ACTIVITY association (same-payload tombstone) —
    // the view row reverts to activity_id = -1 — then re-insert it and the
    // association must come back (a tombstone must not block later puts)
    val actVictim = afterB4.find(_._4 >= 0).get._1
    val actDel = oda.filter(col("id") === actVictim).limit(1)
      .withColumn("op", lit("delete"))
    val cl5 = chg(view.applyBatch(5L, od.limit(0), oi.limit(0), actDel, odc.limit(0)))
    val afterB5 = rows(view.current(s))
    assert(afterB5.find(_._1 == actVictim).get._4 == -1L,
      "deleted activity association must revert its view row to -1")
    assert(afterB5.map(_._1) == afterB4.map(_._1), "only the association changes")
    // the visible change is ONE update pair: UPDATE_BEFORE with the old
    // activity, UPDATE_AFTER with -1 — Flink's retract encoding exactly
    val oldAct = afterB4.find(_._1 == actVictim).get._4
    assert(cl5.sortBy(_._2) == Seq((actVictim, "+U", -1L), (actVictim, "-U", oldAct)),
      s"activity retraction must emit one -U/+U pair: $cl5")
    assertFoldParity()
    val cl6 = chg(view.applyBatch(6L, od.limit(0), oi.limit(0),
      put(Envelopes.orderDetailActivity(s, dir)).filter(col("id") === actVictim).limit(1),
      odc.limit(0)))
    val afterB6 = rows(view.current(s))
    assert(afterB6 == afterB4, "re-inserted association must restore the view")
    assert(cl6.sortBy(_._2) == Seq((actVictim, "+U", oldAct), (actVictim, "-U", -1L)))
    assertFoldParity()

    // batch 7: re-put an EXISTING od row unchanged — the key is affected
    // (recomputed) but the view row is identical, so NOTHING may be
    // emitted (Flink's no-op update suppression on a keyed upsert sink)
    val stable = afterB6.find(_._1 != actVictim).get._1
    val cl7 = chg(view.applyBatch(7L, od.filter(col("id") === stable).limit(1),
      oi.limit(0), oda.limit(0), odc.limit(0)))
    assert(cl7.isEmpty,
      s"an affected-but-unchanged key must emit nothing: $cl7")
    assert(rows(view.current(s)) == afterB6)
    assertFoldParity()
  }

  test("current() is total before the first batch: real schema, zero rows") {
    val s = spark
    val view = new OrderDetailView(
      Files.createTempDirectory("odview_empty").toString + "/v")
    val c = view.current(s)
    assert(c.isEmpty)
    // column selection must not flip shape on timing
    assert(c.select("id", "order_id", "activity_id").isEmpty)
  }
}
