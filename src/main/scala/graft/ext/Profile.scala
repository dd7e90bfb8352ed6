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

  /** Per-column profile of `cols`: non-null count, exact distinct count, and
    * lexicographic min/max of the string rendering.
    *
    * @return one row per column: (col_name, n_nonnull, n_distinct, min_s, max_s) */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
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
