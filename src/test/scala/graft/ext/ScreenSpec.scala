package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** Properties of the two model-bounded screens the SQL oracle checks only
  * pointwise: the Bloom screen's no-false-negative guarantee against the
  * exact contamination join, and the LM surprise ordering contract. */
class ScreenSpec extends SparkSpec {

  test("bloom screen never misses a doc the exact contamination join flags") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"))
    val isEval = col("doc_id") % 97 === 0
    val (train, eval) = (sh.filter(!isEval), sh.filter(isEval))
    // exact: train docs sharing >= 3 distinct shingles with SOME eval doc.
    // bloom hit_ct counts distinct shingles, aggregated across eval docs, so
    // per-doc exact overlap must be counted the same way (distinct shingles
    // in the eval set, not per eval doc).
    val exact = train.join(eval.select(col("s")).distinct(), Seq("s"))
      .groupBy("doc_id").agg(countDistinct(col("s")).as("ov"))
      .filter(col("ov") >= 3)
      .select(col("doc_id"), col("ov"))
    val bloom = Dedup.bloomScreen(train, eval, m = 1 << 14, k = 3, minHits = 3)
    val joined = exact.join(bloom, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("ov"), col("hit_ct"), col("flagged"))
      .collect()
    assert(joined.nonEmpty, "fixture should contain contaminated docs")
    joined.foreach { r =>
      assert(!r.isNullAt(2) && r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: bloom hit_ct ${r.get(2)} < exact overlap ${r.getLong(1)}")
      assert(r.getBoolean(3), s"doc ${r.getLong(0)} exact-flagged but not bloom-flagged")
    }
  }

  test("bloom false-positive rate stays near the (1-e^{-kn/m})^k price") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"))
    val isEval = col("doc_id") % 97 === 0
    val (train, eval) = (sh.filter(!isEval), sh.filter(isEval))
    val evalSet = eval.select("s").distinct().collect().map(_.getString(0)).toSet
    val bloom = Dedup.bloomScreen(train, eval, m = 1 << 14, k = 3, minHits = 1)
    // exact per-doc count of shingles truly in the eval set
    val exactCt = train.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.count(r => evalSet.contains(r.getString(1)))).toMap
    val got = bloom.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (fp, probes) = got.foldLeft((0L, 0L)) { case ((f, p), (id, n, hits)) =>
      (f + (hits - exactCt(id)), p + (n - exactCt(id)))
    }
    assert(fp >= 0, "bloom can never undercount true members")
    // n eval shingles << m here, so the theoretical rate is well under 1%;
    // allow 2% to keep the bound fixture-stable.
    assert(fp.toDouble / probes <= 0.02,
      s"false-positive rate ${fp.toDouble / probes} out of band")
  }

  test("lm surprise orders in-domain below out-of-domain and keeps the spine") {
    val s = spark
    import s.implicits._
    val target = Seq((100L, "a b a b a b a b")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "a b a b"), // every bigram in-model
      (2L, "x y z w"), // every bigram OOV
      (3L, "solo"),    // < 2 tokens: degenerate spine row
      (4L, null.asInstanceOf[String])) // null text: degenerate spine row
      .toDF("doc_id", "text")
    val got = TextStats.hashedLmSurprise(raw, target, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(got.length == 4, "one row per raw doc, degenerate included")
    val byId = got.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact(), r.getBoolean(4))).toMap
    assert(byId(1L)._2 == 0, "in-domain doc has no OOV bigrams")
    assert(byId(2L)._2 == byId(2L)._1, "all bigrams OOV for out-of-domain doc")
    // mean surprise strictly lower in-domain
    assert(byId(1L)._3 * byId(2L)._1 < byId(2L)._3 * byId(1L)._1,
      s"in-domain ${byId(1L)} should out-score OOV ${byId(2L)}")
    Seq(3L, 4L).foreach { id =>
      assert(byId(id) == ((0L, 0L, 0L, true)), s"degenerate verdict for $id: ${byId(id)}")
    }
  }
}
