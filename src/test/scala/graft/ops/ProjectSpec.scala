package graft.ops

import org.apache.spark.sql.functions._
import scala.util.Random
import graft.SparkSpec

/** P1/P6/P7 edge cases (SURVEY.md §5.2: randomized cast-path checks, seeded
  * for determinism). */
class ProjectSpec extends SparkSpec {

  test("P6/P7 cart-add delta and increase-only filter match reference semantics") {
    val s = spark
    import s.implicits._
    val rnd = new Random(42)
    val cases = Seq.tabulate(300) { i =>
      val typ = if (i % 3 == 0) "insert" else "update"
      val n = rnd.nextLong() % 1000
      val o = rnd.nextLong() % 1000
      val hasOld = typ == "update" && i % 7 != 0
      (i.toLong, typ, n, if (hasOld) Some(o) else None)
    }
    val df = cases.toDF("case_id", "type", "num", "old_num")
      .select(col("case_id"), col("type"),
        map(lit("sku_num"), col("num").cast("string")).as("data"),
        when(col("old_num").isNotNull, map(lit("sku_num"), col("old_num").cast("string")))
          .otherwise(lit(null).cast("map<string,string>")).as("old"))
    val got = Project.cartIncreaseOnly(df)
      .select(col("case_id"), Project.cartAddDelta.as("delta"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, typ, n, oOpt) =>
      val expected = (typ, oOpt) match {
        case ("insert", _)            => Some(n.toString)          // P6 insert branch
        case ("update", Some(o)) if n > o => Some((n - o).toString) // P6 diff, P7 keeps
        case _                        => None                       // P7 drops
      }
      assert(got.get(id) == expected, s"case $id ($typ, $n, $oOpt)")
    }
  }

  test("P1 ETL filter drops other-db, bootstrap-start/complete and empty data") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("gmall", "insert", Map("id" -> "1")),           // keep
      ("gmall", "bootstrap-insert", Map("id" -> "2")), // keep (carries data)
      ("other", "insert", Map("id" -> "3")),           // drop: db
      ("gmall", "bootstrap-start", null),              // drop: null data
      ("gmall", "bootstrap-complete", Map("id" -> "4")), // drop: type
      ("gmall", "insert", Map.empty[String, String])   // drop: empty data
    ).toDF("database", "type", "data")
    val kept = Project.etlFilter(rows).select("type").as[String].collect().sorted
    assert(kept.toSeq == Seq("bootstrap-insert", "insert"))
  }
}
