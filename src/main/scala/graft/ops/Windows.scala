package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed aggregation toolbox for the DWS layer (SURVEY.md §2.9).
  *
  * The reference declares 8 DWS summary tables (`Constant.java:40-47`) but
  * ships no code; these are the operator classes they imply: tumbling
  * event-time windows, hash aggregation (count/sum), exact + approximate
  * distinct, dim enrichment after aggregation.
  *
  * Scale posture: aggregations are partial (map-side combine) by construction;
  * windows are derived with the built-in `window()` TimeWindow expression so
  * the same code runs under Structured Streaming with a watermark; dims join
  * AFTER aggregation (group first, enrich the few output rows, broadcast the
  * dim) — never enrich the raw stream.
  */
object Windows {

  /** Tumbling event-time window from an epoch-ms column; adds `ws` = window
    * start in epoch seconds (bigint — engine-portable, sorts/joins cheap). */
  def withTumbleWs(df: DataFrame, tsMs: Column, duration: String): DataFrame =
    df.withColumn("__w", window(timestamp_millis(tsMs), duration))
      .withColumn("ws", expr("unix_millis(__w.start) div 1000"))
      .drop("__w")

  /** Tokenizer (ikanalyzer stand-in for
    * `dws_traffic_source_keyword_page_view_window`, `pom.xml:205`): lowercase,
    * split on single spaces (matching every other text operator and the
    * DuckDB `string_split(lower(x), ' ')` oracles), drop empties. Pure column
    * expression (codegen'd), not a UDF. */
  def tokenize(text: Column): Column =
    filter(split(lower(text), " ", -1), t => length(t) > 0)
}
