package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE TABLE`-style statistics pass a pipeline
  * runs before planning a large ingest (row counts, per-column null rates,
  * cardinalities, value ranges feed partition sizing, skew prediction, and
  * data-quality gates).
  *
  * Scale posture: ONE pass over the table computes every column's stats in a
  * single aggregation; the per-column stacking happens on the one resulting
  * row, not on the data. Exact distinct counts make this a multi-distinct
  * aggregate, which Spark plans with an `Expand` of (k+1)× the input rows —
  * the standard exact plan; swap `count_distinct` for
  * `approx_count_distinct` when 2 % error is acceptable at 100 TB and the
  * Expand multiplier matters. Min/max compare the STRING rendering (cast
  * before compare) so the contract is identical for every column type and
  * engine-portable.
  */
object Profile {

  /** Per-column profile of `cols`: non-null count, distinct count (exact by
    * default), and lexicographic min/max of the string rendering.
    *
    * @param approx estimate distinct counts with HLL++
    *               (`approx_count_distinct`, `rsd` relative error) instead of
    *               exactly. The exact plan Expands the input ×(k+1) for k
    *               distinct columns (measured ~7× wall at 10× rows —
    *               SCALING.md); the approx plan keeps the scan single-width
    *               (one fixed-size sketch per column, map-side combined), the
    *               right trade at 100 TB when ~2 % error is acceptable.
    * @param rsd    maximum estimation error of HLL++ (default 0.02); only
    *               read when `approx` is set
    * @return one row per column: (col_name, n_nonnull, n_distinct, min_s, max_s) */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false,
      rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val nd = if (approx) approx_count_distinct(col(c), rsd)
               else countDistinct(col(c))
      Seq(count(col(c)).as(s"__nn_$c"),
        nd.as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(s"__nn_$c").as("n_nonnull"),
          col(s"__nd_$c").as("n_distinct"), col(s"__mn_$c").as("min_s"),
          col(s"__mx_$c").as("max_s"))
      }: _*)).as("__p"))
      .select(col("__p.*"))
  }
}
