package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.Sources

/** Verify queries for the source surface (SURVEY.md §2.1): S2 Debezium config
  * envelope decode round-trip. */
object SourceQueries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // S2 — build deterministic Debezium envelope JSON from `region`, decode it
    // through the shared from_json path, surface the config fields. op='d'
    // must read the `before` image (old sink_columns), others read `after`.
    "q_config_decode" -> { (s, dir) =>
      val op = when(col("r_regionkey") % 3 === 0, "c")
        .when(col("r_regionkey") % 3 === 1, "u")
        .otherwise("d")
      val mkImg = (cols: Column) => map(
        lit("source_table"), concat(lit("tbl_"), lower(col("r_name"))),
        lit("sink_table"), concat(lit("dim_"), lower(col("r_name"))),
        lit("sink_columns"), cols,
        lit("sink_family"), lit("info"),
        lit("sink_row_key"), lit("id"))
      val raw = Envelopes.table(s, dir, "region").select(
        to_json(struct(
          op.as("op"),
          when(op =!= "c", mkImg(lit("id"))).as("before"),
          when(op =!= "d", mkImg(lit("id,name"))).as("after"))).as("value"))
      Sources.debeziumToConfig(raw).toDF()
        .select(col("sourceTable").as("source_table"),
          col("sinkTable").as("sink_table"),
          col("sinkColumns").as("sink_columns"), col("op"))
        .orderBy(col("source_table"), col("op"))
    })

  private type Column = org.apache.spark.sql.Column

  val oracles: Map[String, String] = Map(
    "q_config_decode" ->
      """SELECT 'tbl_' || lower(r_name) AS source_table,
        |       'dim_' || lower(r_name) AS sink_table,
        |       CASE WHEN r_regionkey % 3 = 2 THEN 'id' ELSE 'id,name' END AS sink_columns,
        |       CASE r_regionkey % 3 WHEN 0 THEN 'c' WHEN 1 THEN 'u' ELSE 'd' END AS op
        |FROM region ORDER BY source_table, op""".stripMargin)
}
