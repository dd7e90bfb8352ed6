package graft.ext

import java.nio.file.Files
import graft.SparkSpec

/** Scale guard for [[Dedup.spread]]: file-backed inputs must decide on
  * metadata alone — the `.rdd` physical-planning probe (driver-side, outside
  * AQE) is reserved for non-file inputs, and even there a conf can turn it
  * off. At 100 TB the input is always file-backed, so the guarantee under
  * test is "a production caller can never trigger driver-side physical
  * planning of the full lineage". */
class SpreadSpec extends SparkSpec {

  private def writeParquet(n: Int, parts: Int): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("spread_in").toString
    (1 to n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(parts).write.mode("overwrite").parquet(dir)
    dir
  }

  test("multi-file input passes through on metadata alone - no .rdd probe") {
    val want = spark.sparkContext.defaultParallelism
    val df = spark.read.parquet(writeParquet(64, parts = want + 2))
    val before = Dedup.SpreadProbe.hits.get()
    val out = Dedup.spread(df)
    assert(Dedup.SpreadProbe.hits.get() == before,
      "file-backed input must not physically plan")
    // >= parallelism files: identity pass-through, no exchange added
    assert(out.queryExecution.analyzed eq df.queryExecution.analyzed)
  }

  test("single-file input repartitions on metadata alone - no .rdd probe") {
    val want = spark.sparkContext.defaultParallelism
    val df = spark.read.parquet(writeParquet(64, parts = 1))
    val before = Dedup.SpreadProbe.hits.get()
    val out = Dedup.spread(df)
    assert(Dedup.SpreadProbe.hits.get() == before,
      "file-backed input must not physically plan")
    assert(out.rdd.getNumPartitions == want)
    assert(out.count() == 64)
  }

  test("non-file input pays the probe by default but not with the conf off") {
    val s = spark
    import s.implicits._
    val mem = (1 to 16).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val before = Dedup.SpreadProbe.hits.get()
    Dedup.spread(mem)
    assert(Dedup.SpreadProbe.hits.get() == before + 1,
      "non-file input should take the accurate-width probe")
    spark.conf.set("spark.graft.spread.probe", "false")
    try {
      val out = Dedup.spread(mem)
      assert(Dedup.SpreadProbe.hits.get() == before + 1,
        "probe conf off: non-file input must pass through unplanned")
      assert(out.queryExecution.analyzed eq mem.queryExecution.analyzed)
    } finally spark.conf.unset("spark.graft.spread.probe")
  }
}
