package graft.model

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: temp views over the envelope shapers so a
  * `spark.sql(...)` user gets the same tables the reference's Flink SQL apps
  * see (`topic_db`, the log stream, the DWD order family, the dic dim) plus
  * the raw corpus tables. Views are lazy plans — registering costs nothing
  * until queried, and every view inherits the shapers' scan-embedded,
  * pushdown-friendly projections. */
object Views {

  /** Register the typed sketch aggregators under SQL names, so a `spark.sql`
    * user gets the mergeable-summary suite the same way the scalar surface
    * (`GraftExtensions`) exposes the text/similarity kernels:
    *
    *  - `graft_hll(s)`            — HyperLogLog distinct estimate (BIGINT)
    *  - `graft_cm_sketch(s)`      — count-min sketch (ARRAY<BIGINT>, d×w flat)
    *  - `graft_cm_est(sk, key)`   — point estimate from a finished sketch
    *  - `graft_heavy_hitters(s)`  — Misra-Gries summary (MAP<STRING, BIGINT>)
    *
    * The aggregators are `Aggregator[String, _, _]` values shared with the
    * Dataset surface, bridged with `functions.udaf` — partial aggregation
    * (map-side combine) applies exactly as in the typed form, which is the
    * whole point of a mergeable sketch at scale. `graft_cm_est` is a scalar
    * over an already-finished sketch — it runs on summary rows (one per
    * group), never on the corpus scan. Registration is idempotent
    * (re-register replaces). */
  def registerFunctions(spark: SparkSession): Unit = {
    import org.apache.spark.sql.{Encoders, functions => F}
    spark.udf.register("graft_hll",
      F.udaf(graft.functions.Hll.stringDistinct, Encoders.STRING))
    spark.udf.register("graft_cm_sketch",
      F.udaf(graft.functions.CountMin.stringFreq, Encoders.STRING))
    spark.udf.register("graft_cm_est",
      (sketch: Array[Long], key: String) => graft.functions.CountMin.estimate(sketch, key))
    spark.udf.register("graft_heavy_hitters",
      F.udaf(graft.functions.MisraGries.stringHeavyHitters, Encoders.STRING))
  }

  /** Register every envelope + raw table as `graft_<name>` temp views, plus
    * the sketch-aggregator SQL functions ([[registerFunctions]]). A
    * table missing from `sfDir` (e.g. a deployment without the extension
    * corpus) skips just that view instead of aborting the whole surface.
    * @return the registered view names */
  def register(spark: SparkSession, sfDir: String): Seq[String] = {
    registerFunctions(spark)
    val views = Map[String, () => org.apache.spark.sql.DataFrame](
      // reference SQL surface
      "graft_topic_db" -> (() => Envelopes.maxwell(spark, sfDir)), // SQLUtil.getKafkaTopicDb
      "graft_log" -> (() => Envelopes.logRecords(spark, sfDir)),   // DwdBaseLog source
      "graft_base_dic" -> (() => Envelopes.dimBaseDic(spark, sfDir)), // BaseSQLAPP.createBaseDic
      "graft_order_detail" -> (() => Envelopes.orderDetail(spark, sfDir)),
      "graft_order_info" -> (() => Envelopes.orderInfo(spark, sfDir)),
      "graft_order_detail_activity" -> (() => Envelopes.orderDetailActivity(spark, sfDir)),
      "graft_order_detail_coupon" -> (() => Envelopes.orderDetailCoupon(spark, sfDir)),
      "graft_config_dim" -> (() => Envelopes.configDim(spark)),
      // corpus tables for the LLM-pipeline extensions
      "graft_documents" -> (() => Envelopes.table(spark, sfDir, "documents")),
      "graft_embeddings" -> (() => Envelopes.table(spark, sfDir, "embeddings")))
    views.toSeq.sortBy(_._1).flatMap { case (name, mk) =>
      // Only a missing table skips its view; any OTHER failure (schema
      // mismatch, corrupt parquet) propagates — swallowing it would silently
      // shrink the SQL surface.
      try { mk().createOrReplaceTempView(name); Some(name) }
      catch {
        // Match the structured error condition, not the rendered message —
        // wording changes across Spark versions; the condition name is the
        // stable contract.
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(_.startsWith("PATH_NOT_FOUND")) => None
      }
    }
  }
}
