package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelopes

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` has one entry per implemented operator from SURVEY.md §2 (+ the
  * LLM-pipeline extensions); `oracleSql` carries a DuckDB-equivalent statement
  * with IDENTICAL output column names for every hash-checkable entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.JoinQueries.queries ++
      graft.queries.StateQueries.queries ++
      graft.queries.SplitQueries.queries ++
      graft.queries.DwsQueries.queries ++
      graft.queries.ExtQueries.queries ++
      graft.queries.SourceQueries.queries ++
      graft.queries.AggQueries.queries ++
      graft.queries.DwdComposite.queries ++
      graft.queries.RelQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.JoinQueries.oracles ++
      graft.queries.StateQueries.oracles ++
      graft.queries.SplitQueries.oracles ++
      graft.queries.DwsQueries.oracles ++
      graft.queries.ExtQueries.oracles ++
      graft.queries.SourceQueries.oracles ++
      graft.queries.AggQueries.oracles ++
      graft.queries.DwdComposite.oracles ++
      graft.queries.RelQueries.oracles
}
