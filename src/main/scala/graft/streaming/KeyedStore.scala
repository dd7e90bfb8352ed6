package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Stateful

/** Engine-local keyed upsert store: the batch-side half of the reference's
  * keyed sinks — HBase point put/delete (K4, `DimHBaseSinkFunction.invoke:
  * 39-75`) and upsert-Kafka compaction (K3, `SQLUtil.getUpsertKafkaSQL:55-63`).
  *
  * Each `merge` applies one micro-batch: union with current state,
  * last-write-wins per key, drop keys whose winning op is a delete, atomically
  * swap the parquet directory. The same call works as a `foreachBatch` body.
  * (On a real deployment this is a Delta/Iceberg MERGE or an HBase client —
  * the dedup logic is identical; only the swap differs.)
  */
object KeyedStore {

  def read(spark: org.apache.spark.sql.SparkSession, path: String): Option[DataFrame] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path))) Some(spark.read.parquet(path)) else None
  }

  /** Merge one batch of versioned rows into the store at `path`.
    *
    * @param seqCols version order (newest wins); extend with payload columns
    *                when the version key alone is not a total order
    * @param opCol   optional op-type column; rows whose winning op equals
    *                `deleteOp` are tombstones that remove the key */
  def merge(batch: DataFrame, path: String, keys: Seq[String], seqCols: Seq[String],
      opCol: Option[String] = None, deleteOp: String = "delete"): Unit = {
    val spark = batch.sparkSession
    val all = read(spark, path).map(_.unionByName(batch)).getOrElse(batch)
    val won = Stateful.lastWriteWins(all, keys.map(col), seqCols.map(col))
    val fin = opCol.map(c => won.filter(col(c) =!= deleteOp)).getOrElse(won)
    val tmp = new Path(path + "__tmp")
    val dst = new Path(path)
    fin.write.mode("overwrite").parquet(tmp.toString)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
  }
}
