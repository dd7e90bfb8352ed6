package graft.ops

import java.util.Properties
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.TableProcessDim
import graft.streaming.Streams

/** Batch-side sources/sinks (SURVEY.md §2.1 S2/S5, §2.2 K6).
  *
  * S2 (MySQL CDC) has no native Spark equivalent: the reference's
  * snapshot-then-binlog Debezium source (`util/FlinkSourceUtil.java:63-80`,
  * `StartupOptions.initial()`) is modeled as a batch JDBC snapshot unioned
  * ahead of a stream of Debezium-envelope JSON records; [[debeziumToConfig]]
  * is the envelope decode both halves share.
  */
object Sources {

  /** S2 — Debezium/Flink-CDC envelope decode (`dim/app/DimAPP.java:140-156`):
    * `op='d'` reads the `before` image, everything else reads `after`;
    * payload fields land in [[TableProcessDim]]. */
  def debeziumToConfig(raw: DataFrame): Dataset[TableProcessDim] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(from_json(col("value"), Streams.debeziumSchema).as("e"))
      .select(col("e.op").as("op"),
        when(col("e.op") === "d", col("e.before")).otherwise(col("e.after")).as("img"))
      .select(
        element_at(col("img"), "source_table").as("sourceTable"),
        element_at(col("img"), "sink_table").as("sinkTable"),
        element_at(col("img"), "sink_columns").as("sinkColumns"),
        element_at(col("img"), "sink_family").as("sinkFamily"),
        element_at(col("img"), "sink_row_key").as("sinkRowKey"),
        col("op"))
      .as[TableProcessDim]
  }

  /** S5 — JDBC batch query (`util/JdbcUtil.java:38-75`). The reference's
    * reflection-based row→POJO mapping with guava `CaseFormat` snake→camel
    * renames (`JdbcUtil.java:65-67`) becomes `spark.read.jdbc` +
    * [[renameSnakeToCamel]] + `.as[T]`. */
  def jdbcTable(spark: SparkSession, url: String, table: String,
      user: String, password: String): DataFrame = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    spark.read.jdbc(url, table, props)
  }

  def snakeToCamel(s: String): String = {
    val parts = s.split("_")
    (parts.head +: parts.tail.map(p =>
      if (p.isEmpty) p else p.head.toUpper +: p.tail)).mkString
  }

  def renameSnakeToCamel(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, snakeToCamel(c)))

  /** K6 — OLAP sink (Doris stand-in, `pom.xml:190-194`, `Constant.java:34-37`):
    * JDBC append of a DWS result. */
  def jdbcSink(df: DataFrame, url: String, table: String,
      user: String, password: String): Unit = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    df.write.mode("append").jdbc(url, table, props)
  }
}
