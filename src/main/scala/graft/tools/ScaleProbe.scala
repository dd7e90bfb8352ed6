package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Scaling probe (dev tool, not part of the driver protocol): synthesizes an
  * N× copy of the sf0.1 testdata under /tmp with shifted keys, properly
  * partitioned parquet (the driver files are single row groups), and times a
  * representative query per family — evidence for "does the plan survive a
  * scale-up", not a benchmark.
  *
  * Usage: runMain graft.tools.ScaleProbe [copies] [outDir]
  */
object ScaleProbe {

  private val KeyShift = 100000000L

  def replicate(spark: SparkSession, srcDir: String, outDir: String, copies: Int): Unit = {
    def li(c: Int) = spark.read.parquet(s"$srcDir/lineitem.parquet")
      .withColumn("l_orderkey", col("l_orderkey") + lit(c * KeyShift))
    def ord(c: Int) = spark.read.parquet(s"$srcDir/orders.parquet")
      .withColumn("o_orderkey", col("o_orderkey") + lit(c * KeyShift))
    def ev(c: Int) = spark.read.parquet(s"$srcDir/events.parquet")
      .withColumn("event_id", col("event_id") + lit(c * KeyShift))
      .withColumn("user_id", col("user_id") + lit(c * 10000L))
    def doc(c: Int) = spark.read.parquet(s"$srcDir/documents.parquet")
      .withColumn("doc_id", col("doc_id") + lit(c * KeyShift))
      .withColumn("text", concat(col("text"), lit(s" copytoken$c a$c b$c")))
    def emb(c: Int) = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .withColumn("vec_id", col("vec_id") + lit(c * KeyShift))

    def unionN(f: Int => DataFrame, n: Int) = (0 until n).map(f).reduce(_ union _)
    val parts = spark.sparkContext.defaultParallelism
    unionN(li, copies).repartition(parts).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    unionN(ord, copies).repartition(parts).write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    unionN(ev, copies).repartition(parts).write.mode("overwrite").parquet(s"$outDir/events.parquet")
    unionN(doc, math.max(2, copies / 2)).repartition(parts).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    unionN(emb, math.max(2, copies / 2)).repartition(parts).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$srcDir/$t.parquet").write.mode("overwrite").parquet(s"$outDir/$t.parquet")
  }

  /** 100× probe for the two flagship composites only: does the plan keep its
    * shape when the data outgrows every broadcast threshold? Captures the
    * FINAL (AQE-decided) physical plan at 1× and N× and summarizes the join
    * strategy mix — the broadcast→shuffle flip is the property under test:
    * it must happen (no OOM-prone forced broadcast) and nothing may degrade
    * to a nested loop. Full plans land in `<outDir>/plans/` for the record.
    *
    * Usage: runMain graft.tools.ScaleProbe flagship [copies] [outDir] */
  def flagship(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq("q_dwd_order_detail", "q_pipeline_curate")
    def run(name: String, dir: String): (Double, Long, String) = {
      val df = SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n, df.queryExecution.executedPlan.toString)
    }
    def mix(plan: String): String = Seq(
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct")
      .map(k => s"$k=${plan.sliding(k.length).count(_ == k)}").mkString(", ")
    val base = qs.map(q => q -> run(q, "/root/testdata/sf0.1")).toMap
    replicate(spark, "/root/testdata/sf0.1", outDir, copies)
    val scaled = qs.map(q => q -> run(q, outDir)).toMap
    val planDir = new java.io.File(s"$outDir/plans"); planDir.mkdirs()
    qs.foreach { q =>
      val (t1, n1, p1) = base(q)
      val (t2, n2, p2) = scaled(q)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$planDir/${q}_1x.txt"), p1)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$planDir/${q}_${copies}x.txt"), p2)
      println(f"FLAGSHIP $q 1x: $t1%.1f s ($n1 rows) [${mix(p1)}]")
      println(f"FLAGSHIP $q ${copies}x: $t2%.1f s ($n2 rows) [${mix(p2)}]")
      println(f"FLAGSHIP $q growth ${t2 / t1}%.1fx wall at ${copies}x data")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("flagship")) {
      flagship(args.lift(1).map(_.toInt).getOrElse(100),
        args.lift(2).getOrElse("/tmp/graft_scale100"))
      return
    }
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = args.lift(1).getOrElse("/tmp/graft_scale_probe")
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    replicate(spark, "/root/testdata/sf0.1", outDir, copies)

    val probes = Seq("q1_agg", "q_join_inner", "q_upsert_dedup", "q_dws_vc_ch_ar",
      "q_dedup_ngram", "q_dedup_minhash", "q_dedup_simhash", "q_embed_dup_lsh",
      "q_dwd_order_detail", "q_topk_sku",
      "q_dedup_clusters", "q_dedup_clusters_lsh", "q_dwd_pay_suc",
      "q_dwd_base_log", "q_ann_ivf", "q_ann_ivf_kmeans",
      "q_span_dup", "q_contamination", "q_pii_scrub", "q_dws_keyword_cjk",
      "q_token_budget", "q_temp_mix", "q_shard_shuffle", "q_embed_quant",
      "q_strip_spans", "q_tfidf_top", "q_bm25", "q_neg_pairs", "q_journey",
      "q_resample", "q_corpus_diff", "q_zorder", "q_dedup_best", "q_profile")
    val times = probes.map { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, outDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCALE $name $sec%.2f s ($n rows)")
      name -> sec
    }
    println("{" + times.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}")
    spark.stop()
  }
}
