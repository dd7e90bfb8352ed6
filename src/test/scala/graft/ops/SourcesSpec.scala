package graft.ops

import graft.SparkSpec

/** S5 — JDBC row→case-class mapping helpers (`util/JdbcUtil.java:65-67`). */
class SourcesSpec extends SparkSpec {

  test("snake_case column names map to the reference's camelCase POJO fields") {
    assert(Sources.snakeToCamel("source_table") == "sourceTable")
    assert(Sources.snakeToCamel("sink_row_key") == "sinkRowKey")
    assert(Sources.snakeToCamel("plain") == "plain")
    val s = spark
    import s.implicits._
    val df = Seq(("a", "b")).toDF("source_table", "sink_row_key")
    assert(Sources.renameSnakeToCamel(df).columns.toSeq == Seq("sourceTable", "sinkRowKey"))
  }
}
