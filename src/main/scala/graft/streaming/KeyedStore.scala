package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Stateful

/** Engine-local keyed upsert store: the batch-side half of the reference's
  * keyed sinks — HBase point put/delete (K4, `DimHBaseSinkFunction.invoke:
  * 39-75`) and upsert-Kafka compaction (K3, `SQLUtil.getUpsertKafkaSQL:55-63`).
  *
  * State is hash-partitioned into `__b=<i>` bucket directories under the store
  * root. Each `merge` applies one micro-batch: derive the batch's touched
  * buckets, read ONLY those buckets' state, last-write-wins per key, rewrite
  * ONLY those buckets — merge cost is proportional to the batch plus the state
  * it collides with, not to total store size (the reference's HBase point
  * writes have the same asymptotics). Delete tombstones are RETAINED in the
  * stored state (hidden by [[readActive]]): physically dropping them would let
  * a late-arriving lower-seq put resurrect a deleted key in one micro-batch
  * split but not another — final state must be a pure function of the row
  * multiset, independent of batch boundaries.
  *
  * Each bucket swap is rename-based with a backup generation, so a crash
  * leaves every bucket with either its old or its new committed directory
  * (see [[read]]); [[merge]] first promotes any bak-only bucket back to
  * committed before touching anything, so a committed copy exists at all
  * times. Cross-bucket atomicity (all buckets flip together) is the one gap
  * vs a transactional table format — on a real deployment this is a
  * Delta/Iceberg MERGE or an HBase client; the dedup logic is identical.
  */
object KeyedStore {

  private val BucketPrefix = "__b="
  private val BakSuffix = "__bak"
  private val MetaFile = "_graft_buckets"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketOf(keys: Seq[String], n: Int): Column =
    pmod(hash(keys.map(col): _*), lit(n))

  /** Bucket count the store was created with; later merges reuse it so the
    * key→bucket mapping never drifts (a param change would strand state).
    * A present-but-unparseable meta file (a crash inside a pre-atomic
    * writer) is recoverable only if no buckets exist yet — with state on
    * disk the key→bucket mapping is unknown, so fail loudly rather than
    * re-bucket silently. */
  private def readBucketCount(f: FileSystem, root: Path): Option[Int] = {
    val p = new Path(root, MetaFile)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      txt.toIntOption match {
        case some @ Some(_) => some
        case None if bucketDirs(f, root).isEmpty => None // fresh store, rewrite
        case None => throw new java.io.IOException(
          s"corrupt $p ('$txt') with existing buckets — bucket count unrecoverable")
      }
    }
  }

  /** Crash-atomic: write to a temp name, then one rename. */
  private def writeBucketCount(f: FileSystem, root: Path, n: Int): Unit = {
    val tmp = new Path(root, MetaFile + "__tmp")
    val out = f.create(tmp, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    val dst = new Path(root, MetaFile)
    f.delete(dst, false)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"meta rename $tmp -> $dst failed")
  }

  /** Roll forward from any crash point so every bucket has exactly one
    * committed directory: a bak-ONLY bucket (crashed between the two renames)
    * is promoted back to committed; a bak beside a committed dir (crashed
    * before the final cleanup) is stale and dropped. Never deletes the last
    * copy of a bucket. */
  private def repair(f: FileSystem, root: Path): Unit =
    if (f.exists(root))
      f.listStatus(root).map(_.getPath)
        .filter(p => p.getName.startsWith(BucketPrefix) && p.getName.endsWith(BakSuffix))
        .foreach { bak =>
          val dst = new Path(root, bak.getName.stripSuffix(BakSuffix))
          if (f.exists(dst)) f.delete(bak, true)
          else if (!f.rename(bak, dst))
            throw new java.io.IOException(s"recovery rename $bak -> $dst failed")
        }

  /** Committed bucket directories (after logically applying [[repair]]'s
    * bak-only fallback, without mutating the store). Refuses a root holding
    * non-bucket data files (e.g. a store written by a flat-layout version):
    * silently reading none of it — or starting a fresh bucketed store beside
    * it — would be invisible state loss. */
  private def bucketDirs(f: FileSystem, root: Path): Seq[Path] = {
    if (!f.exists(root)) return Nil
    val children = f.listStatus(root).map(_.getPath)
    val stray = children.filter { p =>
      val n = p.getName
      !n.startsWith(BucketPrefix) && !n.startsWith(MetaFile) && !n.startsWith("_")
    }
    if (stray.nonEmpty)
      throw new IllegalStateException(
        s"$root holds non-bucket entries (${stray.take(3).mkString(", ")}) — " +
          "not a bucketed KeyedStore layout; migrate or point at a fresh root")
    val bucketChildren = children.filter(_.getName.startsWith(BucketPrefix))
    val (baks, dsts) = bucketChildren.partition(_.getName.endsWith(BakSuffix))
    val committed = dsts.toSeq
    val recovered = baks.toSeq.filter(b =>
      !dsts.exists(_.getName == b.getName.stripSuffix(BakSuffix)))
    committed ++ recovered
  }

  /** Full stored state, tombstones included. Recovers from an interrupted
    * bucket swap by falling back to that bucket's backup generation. */
  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val dirs = bucketDirs(fs(spark, path), new Path(path))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.toString): _*))
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
    *                tombstones and are hidden by readActive.
    * @param numBuckets bucket count used when CREATING the store; an existing
    *                store keeps the count it was created with. */
  def merge(batch: DataFrame, path: String, keys: Seq[String],
      seqCols: Seq[String], numBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val f = fs(spark, path)
    val root = new Path(path)
    f.mkdirs(root)
    bucketDirs(f, root) // layout guard: refuse a non-bucketed (legacy) root
    repair(f, root)
    val n = readBucketCount(f, root).getOrElse {
      writeBucketCount(f, root, numBuckets); numBuckets
    }
    // Pin the batch for the merge's TWO actions (touched-bucket collect +
    // the write): without it a non-deterministic or source-shifting batch
    // plan could hash rows into buckets absent from the first-pass touched
    // set — those rows would reach tmpRoot but never be renamed in, a silent
    // drop. Caching makes both actions see one materialization.
    val wb = batch.withColumn("__b", bucketOf(keys, n)).persist()
    try {
      // Touched-bucket ids: bounded by n (metadata-sized, like the
      // reference's config cardinality) — NOT a data-sized collect.
      val touched = wb.select("__b").distinct().collect().map(_.getInt(0)).sorted
      val existing = touched.map(i => new Path(root, BucketPrefix + i)).filter(f.exists)
      // Bucket files don't store __b (it's derivable); re-derive on read.
      val state = existing.headOption.map(_ =>
        spark.read.parquet(existing.map(_.toString).toIndexedSeq: _*)
          .withColumn("__b", bucketOf(keys, n)))
      val all = state.map(wb.unionByName(_)).getOrElse(wb)
      // repartition by __b: each bucket hashes wholly into one task → one
      // file per touched bucket per merge (no small-file creep); AQE
      // coalesces the empty partitions.
      val won = Stateful.lastWriteWins(all, keys.map(col), seqCols.map(col))
        .repartition(col("__b"))
      val tmpRoot = new Path(path + "__tmp")
      f.delete(tmpRoot, true)
      won.write.mode("overwrite").partitionBy("__b").parquet(tmpRoot.toString)
      touched.foreach { i =>
        val tmp = new Path(tmpRoot, BucketPrefix + i)
        val dst = new Path(root, BucketPrefix + i)
        val bak = new Path(root, BucketPrefix + i + BakSuffix)
        // repair() ran above, so if dst exists it is committed and bak is
        // disposable; if dst is absent no bak exists either.
        f.delete(bak, true)
        if (f.exists(dst) && !f.rename(dst, bak))
          throw new java.io.IOException(s"backup rename $dst -> $bak failed")
        if (!f.rename(tmp, dst))
          throw new java.io.IOException(s"rename $tmp -> $dst failed")
        f.delete(bak, true)
      }
      f.delete(tmpRoot, true)
    } finally wb.unpersist()
  }
}
