package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-way stream split + explode (SURVEY.md §2.6, X1/X2).
  *
  * The reference routes one log stream into 5 side outputs
  * (`DwdBaseLog.splitLog:76-133`). Spark has no side outputs: the split is N
  * filtered projections of one DataFrame — in batch over a (cheap, reused)
  * scan, in streaming via one `foreachBatch` fanning out to N sinks (see
  * graft.streaming.LogFanout). Explode (X2) is the built-in `explode`
  * Generator — no custom UDTF needed.
  */
object Split {

  /** X1 — err branch: any valid row carrying an `err` object
    * (`DwdBaseLog.java:81-89`). */
  def errBranch(valid: DataFrame): DataFrame =
    valid.filter(col("err").isNotNull)

  /** X1 — start branch (`DwdBaseLog.java:90-96`). */
  def startBranch(valid: DataFrame): DataFrame =
    valid.filter(col("start").isNotNull)

  /** X1 — page branch: the main output, with `err`/`displays`/`actions`
    * removed (`DwdBaseLog.java:123-129`). */
  def pageBranch(valid: DataFrame): DataFrame =
    valid.filter(col("page").isNotNull)
      .drop("err", "displays", "actions", "start")

  /** X2 — array explode with parent enrichment (`DwdBaseLog.java:98-121`):
    * each element of `arr` becomes a record carrying the parent columns. */
  def explodeWithParent(df: DataFrame, arr: Column, parents: Seq[Column],
      elemName: String = "elem"): DataFrame =
    df.filter(arr.isNotNull)
      .select(parents :+ explode(arr).as(elemName): _*)
}
