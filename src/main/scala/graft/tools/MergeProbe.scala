package graft.tools

import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.streaming.{DimCache, KeyedStore}

/** Temporary diagnostic: phase-time the q_join_lookup_big pass-1 path. */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, site) = Option(jobStarts.get(j.jobId)).getOrElse((0L, "?"))
        println(f"  JOB ${j.jobId}: ${(System.nanoTime() - t0) / 1e9}%.3f s  [$site]")
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        println(f"    STAGE ${i.stageId} (${i.numTasks}t ${ms.getOrElse(-1L)}ms): ${i.name.take(110)}")
      }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm like Bench does
    t("warm") {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$dir/lineitem.parquet").limit(1).collect()
      val d = new java.io.File("/tmp/graft_probe_warm_pq")
      spark.range(1000).selectExpr("id", "cast(id as string) as s")
        .repartition(4).write.mode("overwrite").parquet(d.toString)
      spark.read.parquet(d.toString).count()
    }
    // two full rounds into fresh stores: round 1 pays first-use codegen/JIT
    // for the merge+lookup plan shapes, round 2 is the true per-build cost
    for (round <- 1 to 2) {
      val path = s"/tmp/graft_mergeprobe_customer_$round"
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val batch = t(s"r$round-read-customer")(
        Envelopes.table(spark, dir, "customer").withColumn("op_type", lit("put")))
      t(s"r$round-merge")(KeyedStore.merge(batch, path,
        keys = Seq("c_custkey"), seqCols = Seq("c_custkey"), numBuckets = 8))
      val cache = new DimCache(path, Seq("c_custkey"))
      val o = Envelopes.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      t(s"r$round-lookup-1")(cache.lookupJoin(o, Seq(col("o_custkey")))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("o_orderkey")).count())
      t(s"r$round-lookup-2")(cache.lookupJoin(o, Seq(col("o_custkey")))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("o_orderkey")).count())
    }
    spark.stop()
  }
}
