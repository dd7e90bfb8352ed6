package graft

import org.apache.spark.sql.SparkSession

/** One-stop session builder for library users: every setting the engine's
  * operators assume (UTC semantics, AQE, the `graft_dot` SQL function, the
  * nanos-timestamp workaround for this corpus, sane local shuffle widths).
  * Mirrors the reference's `BaseAPP.start` env setup (`base/BaseAPP.java:
  * 26-73`) as configuration instead of a base class.
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      math.max(Runtime.getRuntime.availableProcessors(), 4))
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  }
}
