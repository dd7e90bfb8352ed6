package graft.model

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Scale guard for [[Envelopes.widen]] — the `Dedup.spread` discipline
  * (ADVICE r15): file-backed inputs must decide on metadata alone; the
  * `.rdd` physical-planning probe is reserved for non-file inputs and can
  * be conf'd off even there. At 100 TB every corpus read is file-backed,
  * so the guarantee under test is "an envelope construction can never
  * trigger driver-side physical planning of the full lineage". */
class WidenSpec extends SparkSpec {

  private def writeParquet(n: Int, parts: Int): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("widen_in").toString
    (1 to n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(parts).write.mode("overwrite").parquet(dir)
    dir
  }

  test("multi-file input passes through on metadata alone - no .rdd probe") {
    val want = spark.sparkContext.defaultParallelism
    val df = spark.read.parquet(writeParquet(64, parts = want + 2))
    val before = graft.util.SpreadProbe.hits.get()
    val out = Envelopes.widen(spark, df, Seq("doc_id"))
    assert(graft.util.SpreadProbe.hits.get() == before,
      "file-backed input must not physically plan")
    assert(out.queryExecution.analyzed eq df.queryExecution.analyzed)
  }

  test("single-file input widens on metadata alone - no .rdd probe") {
    val want = spark.sparkContext.defaultParallelism
    val df = spark.read.parquet(writeParquet(64, parts = 1))
    val before = graft.util.SpreadProbe.hits.get()
    val out = Envelopes.widen(spark, df, Seq("doc_id"))
    assert(graft.util.SpreadProbe.hits.get() == before,
      "file-backed input must not physically plan")
    assert(out.rdd.getNumPartitions == want)
    // hash distribution keeps rows intact
    assert(out.count() == 64)
  }

  test("non-file input pays the probe by default but not with the conf off") {
    val s = spark
    import s.implicits._
    val mem = (1 to 16).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val before = graft.util.SpreadProbe.hits.get()
    Envelopes.widen(spark, mem, Seq("doc_id"))
    assert(graft.util.SpreadProbe.hits.get() == before + 1,
      "non-file input should take the accurate-width probe")
    spark.conf.set("spark.graft.spread.probe", "false")
    try {
      val out = Envelopes.widen(spark, mem, Seq("doc_id"))
      assert(graft.util.SpreadProbe.hits.get() == before + 1,
        "probe conf off: non-file input must pass through unplanned")
      assert(out.queryExecution.analyzed eq mem.queryExecution.analyzed)
    } finally spark.conf.unset("spark.graft.spread.probe")
  }

  test("widened envelope keys spread across the session width") {
    // maxwell / logRecords read single-row-group fixtures: the widen must
    // fire (metadata path) and spread rows over every core
    val dir = writeParquet(256, parts = 1)
    val df = spark.read.parquet(dir)
    val out = Envelopes.widen(spark, df, Seq("doc_id"))
    val counts = out.groupBy(org.apache.spark.sql.functions
        .spark_partition_id()).count().collect()
    assert(counts.length > 1, "widen must produce a multi-partition layout")
    assert(out.select(col("doc_id")).distinct().count() == 256)
  }
}
