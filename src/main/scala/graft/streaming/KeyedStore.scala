package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Stateful

/** Engine-local keyed upsert store: the batch-side half of the reference's
  * keyed sinks — HBase point put/delete (K4, `DimHBaseSinkFunction.invoke:
  * 39-75`) and upsert-Kafka compaction (K3, `SQLUtil.getUpsertKafkaSQL:55-63`).
  *
  * Each `merge` applies one micro-batch: union with current state,
  * last-write-wins per key, swap the parquet directory. Delete tombstones are
  * RETAINED in the stored state (hidden by [[readActive]]): physically
  * dropping them would let a late-arriving lower-seq put resurrect a deleted
  * key in one micro-batch split but not another — final state must be a pure
  * function of the row multiset, independent of batch boundaries.
  *
  * The swap is rename-based with a backup generation: crash between renames
  * leaves either the old or the new directory recoverable (see [[read]]).
  * (On a real deployment this is a Delta/Iceberg MERGE or an HBase client —
  * the dedup logic is identical; only the swap differs.)
  */
object KeyedStore {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Full stored state, tombstones included. Recovers from an interrupted
    * swap by falling back to the backup generation. */
  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val f = fs(spark, path)
    if (f.exists(new Path(path))) Some(spark.read.parquet(path))
    else if (f.exists(new Path(path + "__bak")))
      Some(spark.read.parquet(path + "__bak"))
    else None
  }

  /** Live state: winning non-delete rows only. */
  def readActive(spark: SparkSession, path: String,
      opCol: String = "op_type", deleteOp: String = "delete"): Option[DataFrame] =
    read(spark, path).map(_.filter(col(opCol) =!= deleteOp))

  /** Merge one batch of versioned rows into the store at `path`.
    *
    * @param seqCols version order (newest wins); must be a TOTAL order over
    *                duplicate keys (extend with payload columns otherwise).
    *                Rows whose winning op is a delete stay stored as
    *                tombstones and are hidden by readActive. */
  def merge(batch: DataFrame, path: String, keys: Seq[String],
      seqCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val all = read(spark, path).map(_.unionByName(batch)).getOrElse(batch)
    val won = Stateful.lastWriteWins(all, keys.map(col), seqCols.map(col))
    val tmp = new Path(path + "__tmp")
    val bak = new Path(path + "__bak")
    val dst = new Path(path)
    won.write.mode("overwrite").parquet(tmp.toString)
    val f = fs(spark, path)
    f.delete(bak, true)
    if (f.exists(dst) && !f.rename(dst, bak))
      throw new java.io.IOException(s"backup rename $dst -> $bak failed")
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
    f.delete(bak, true)
  }
}
