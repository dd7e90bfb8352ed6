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
    val path = "/tmp/graft_mergeprobe_customer"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val batch = t("read-customer")(
      Envelopes.table(spark, dir, "customer").withColumn("op_type", lit("put")))
    t("merge")(KeyedStore.merge(batch, path,
      keys = Seq("c_custkey"), seqCols = Seq("c_custkey"), numBuckets = 8))
    val cache = new DimCache(path, Seq("c_custkey"))
    val o = Envelopes.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    t("lookup-1")(cache.lookupJoin(o, Seq(col("o_custkey")))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("o_orderkey")).count())
    t("lookup-2")(cache.lookupJoin(o, Seq(col("o_custkey")))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("o_orderkey")).count())
    spark.stop()
  }
}
