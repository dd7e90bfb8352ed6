package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD Type-2 history + point-in-time lookup (Stateful.scd2History /
  * scd2Lookup): version boundaries, delete gaps, re-inserts, no-op
  * absorption, empty [t, t) intervals, and the lookup's honest nulls. */
class Scd2Spec extends SparkSpec {

  private def hist(rows: Seq[(String, Long, Long, String, String)]) = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("k", "seq", "ts", "typ", "attr")
    Stateful.scd2History(df, Seq(col("k")), Seq(col("seq")), col("ts"),
      Seq(col("attr")), Seq("attr"), col("typ"))
  }

  test("scd2History: boundaries, absorption, delete gap, re-insert") {
    // A: insert x@1, no-op update x@2 (absorbed), update y@3, delete@5,
    //    re-insert y@8 (same attr — still a new version: prev was delete).
    val got = hist(Seq(
      ("A", 1L, 1L, "insert", "x"), ("A", 2L, 2L, "update", "x"),
      ("A", 3L, 3L, "update", "y"), ("A", 4L, 5L, "delete", "y"),
      ("A", 5L, 8L, "insert", "y")))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4), r.getInt(5))).toSet
    assert(got == Set(
      ("A", "x", 1L, Some(3L), false, 1),
      ("A", "y", 3L, Some(5L), false, 2),
      ("A", "y", 8L, None, true, 3)))
  }

  test("scd2History: leading delete closes nothing; consecutive deletes safe") {
    val got = hist(Seq(
      ("B", 1L, 1L, "delete", "z"), ("B", 2L, 4L, "insert", "z"),
      ("B", 3L, 6L, "delete", "z"), ("B", 4L, 7L, "delete", "z")))
      .collect().map(r => (r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(5))).toSet
    assert(got == Set(("z", 4L, Some(6L), 1)))
  }

  test("scd2History: same-ts versions yield an empty interval, kept in order") {
    val got = hist(Seq(
      ("C", 1L, 5L, "insert", "a"), ("C", 2L, 5L, "update", "b")))
      .collect().map(r => (r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(5))).toSet
    assert(got == Set(("a", 5L, Some(5L), 1), ("b", 5L, None, 2)))
  }

  test("scd2Lookup: picks the valid version, nulls in gaps and pre-history") {
    val s = spark
    import s.implicits._
    val h = hist(Seq(
      ("A", 1L, 1L, "insert", "x"), ("A", 2L, 2L, "update", "x"),
      ("A", 3L, 3L, "update", "y"), ("A", 4L, 5L, "delete", "y"),
      ("A", 5L, 8L, "insert", "y")))
    val facts = Seq(("A", 10L, 0L), ("A", 11L, 2L), ("A", 12L, 4L),
      ("A", 13L, 6L), ("A", 14L, 9L), ("D", 15L, 2L))
      .toDF("k", "fact_id", "fts")
    val got = Stateful.scd2Lookup(facts, h, Seq("k"), col("fts"))
      .select(col("fact_id"), col("attr"), col("ver"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.get(2)).map(_.asInstanceOf[Int]))))
      .toMap
    assert(got == Map(
      10L -> ((None, None)),          // before first version
      11L -> ((Some("x"), Some(1))),  // inside v1
      12L -> ((Some("y"), Some(2))),  // inside v2
      13L -> ((None, None)),          // delete gap
      14L -> ((Some("y"), Some(3))),  // current open version
      15L -> ((None, None))))         // unknown key
  }

  test("scd2Lookup: empty [t,t) interval is unmatchable at t") {
    val s = spark
    import s.implicits._
    val h = hist(Seq(("C", 1L, 5L, "insert", "a"), ("C", 2L, 5L, "update", "b")))
    val facts = Seq(("C", 20L, 5L)).toDF("k", "fact_id", "fts")
    val got = Stateful.scd2Lookup(facts, h, Seq("k"), col("fts"))
      .select(col("attr")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("b"))
  }
}
