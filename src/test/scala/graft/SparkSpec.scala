package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (tests fork one JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sfDir(sf: String = "sf0.001"): String = s"/root/testdata/$sf"

  /** Poll a memory-sink streaming query until `table` holds at least
    * `atLeast` rows or the deadline passes: watermark-driven emission lands
    * in the batch AFTER the watermark advances, so a single
    * processAllAvailable is not enough. */
  def drainSink(q: org.apache.spark.sql.streaming.StreamingQuery,
      table: String, atLeast: Int,
      timeoutMs: Long = 30000): Array[org.apache.spark.sql.Row] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var got = spark.table(table).collect()
    while (got.length < atLeast && System.currentTimeMillis() < deadline) {
      q.processAllAvailable()
      got = spark.table(table).collect()
      if (got.length < atLeast) Thread.sleep(100)
    }
    got
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // match the production sessions (Bench/Verify/GraftSession): plans the
    // suite asserts on must be the plans the engine ships with
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.codegen.cache.maxEntries", "10000")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()
}
