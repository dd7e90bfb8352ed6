package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / filter / scalar operators (SURVEY.md §2.3, P1–P11).
  *
  * Every operator is a pure `DataFrame => DataFrame` usable unchanged in batch
  * and Structured Streaming; all logic is built-in `functions._` column
  * expressions (whole-stage-codegen'd, pushdown-friendly) — no UDFs.
  */
object Project {

  /** P1 — Maxwell ETL filter (`dim/app/DimAPP.java:190-213`, predicate :201-205):
    * keep `database='gmall'`, drop bootstrap-start/complete, require non-empty
    * `data`. Unparseable rows are nulls after PERMISSIVE `from_json` and fall out
    * via the null checks. */
  def etlFilter(mx: DataFrame): DataFrame =
    mx.filter(
      col("database") === "gmall" &&
        !col("type").isin("bootstrap-start", "bootstrap-complete") &&
        col("data").isNotNull && size(col("data")) > 0)

  /** P2 validity predicate — ONE definition so the valid and dirty branches
    * can never drift: every row is in exactly one of them. */
  private def validLog: Column =
    (col("page").isNotNull || col("start").isNotNull) &&
      col("common.mid").isNotNull && col("ts").isNotNull

  /** P2 — log ETL (`DwdBaseLog.etl:212-233`): valid rows carry `page` or `start`,
    * a non-null `common.mid` and a non-null `ts`. */
  def logEtl(lg: DataFrame): DataFrame = lg.filter(validLog)

  /** P2 side branch — the dirty rows the reference counts/prints
    * (`DwdBaseLog.java:229`). */
  def logEtlDirty(lg: DataFrame): DataFrame = lg.filter(!validLog)

  /** P4 — per-DWD-table CDC routing predicate
    * (`DwdInteractionCommentInfo.java:97-99`, `DwdTradeOrderDetail.java:188-191`). */
  def routeFilter(mx: DataFrame, tableName: String, types: Seq[String]): DataFrame =
    mx.filter(col("database") === "gmall" && col("table") === tableName &&
      col("type").isin(types: _*))

  /** P3 — Maxwell map-element projection: `` `data`['k'] AS k `` × N
    * (`DwdInteractionCommentInfo.filterCommentInfo:82-103` et al). */
  def mapProject(mx: DataFrame, keys: Seq[String], extra: Seq[Column] = Nil): DataFrame =
    mx.select(keys.map(k => element_at(col("data"), k).as(k)) ++ extra: _*)

  /** P5 — CDC update-transition predicate: old value present AND new value hits
    * the target (payment success `DwdTradeOrderPaySucDetail.java:192-194`). */
  def cdcTransition(mx: DataFrame, field: String, target: String): DataFrame =
    mx.filter(col("type") === "update" &&
      element_at(col("old"), field).isNotNull &&
      element_at(col("data"), field) === target)

  /** P7 — increase-only cart predicate (`DwdTradeCartAdd.java:84-86`). */
  def cartIncreaseOnly(mx: DataFrame): DataFrame =
    mx.filter(col("type") === "insert" || (col("type") === "update" &&
      element_at(col("old"), "sku_num").isNotNull &&
      element_at(col("data"), "sku_num").cast("long") >
        element_at(col("old"), "sku_num").cast("long")))

  /** P6 — incremental cart-add quantity (`DwdTradeCartAdd.java:68`):
    * `IF(type='insert', sku_num, CAST(new AS BIGINT) - CAST(old AS BIGINT))`,
    * re-cast to STRING like the reference. */
  def cartAddDelta: Column =
    when(col("type") === "insert", element_at(col("data"), "sku_num"))
      .otherwise((element_at(col("data"), "sku_num").cast("long") -
        element_at(col("old"), "sku_num").cast("long")).cast("string"))

  /** P8 — data-driven column pruning (`DimAPP.filterColumn:82-95`): keep only the
    * `data` keys listed in the joined config row's csv `sinkColumns`. Runtime
    * (per-row) pruning, exactly like the reference — not a plan rewrite. */
  def pruneColumns(joined: DataFrame, sinkColumnsCol: Column): DataFrame =
    joined.withColumn("data",
      map_filter(col("data"), (k, _) => array_contains(split(sinkColumnsCol, ","), k)))
}
