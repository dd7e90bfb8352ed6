package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.ops.Stateful

/** Engine-local keyed upsert store: the batch-side half of the reference's
  * keyed sinks — HBase point put/delete (K4, `DimHBaseSinkFunction.invoke:
  * 39-75`) and upsert-Kafka compaction (K3, `SQLUtil.getUpsertKafkaSQL:55-63`).
  *
  * State is hash-partitioned into immutable `__b=<i>__g<gen>` bucket
  * directories under the store root; the committed view is a single manifest
  * file `_graft_commit_g<gen>` listing every bucket's current directory. Each
  * `merge` applies one micro-batch: derive the batch's touched buckets, read
  * ONLY those buckets' state, last-write-wins per key, stage new directories
  * for ONLY those buckets, then publish ONE new manifest — merge cost is
  * proportional to the batch plus the state it collides with, not to total
  * store size (the reference's HBase point writes have the same asymptotics).
  * Delete tombstones are RETAINED in the stored state (hidden by
  * [[readActive]]): physically dropping them would let a late-arriving
  * lower-seq put resurrect a deleted key in one micro-batch split but not
  * another — final state must be a pure function of the row multiset,
  * independent of batch boundaries.
  *
  * Commit protocol (the Delta/Iceberg-style manifest swap, minus the formats'
  * metadata layers): staged directories are invisible until the manifest that
  * references them appears, and a manifest file only ever appears complete —
  * it is written to a temp name and renamed into place, and a rename to a
  * fresh name is atomic on HDFS-like filesystems. A crash at ANY point
  * therefore leaves readers on the previous manifest — per-merge visibility
  * is all-or-nothing across buckets (the cross-bucket tearing the earlier
  * per-bucket rename scheme allowed is closed). Leftover staged directories
  * and superseded manifests are garbage-collected by the next merge.
  * Single writer assumed (one streaming query owns a store path); concurrent
  * readers may transiently race GC of a superseded generation and should
  * retry, exactly as with any snapshot store without a lock service.
  */
object KeyedStore {

  private val BucketPrefix = "__b="
  private val MetaFile = "_graft_buckets"
  private val CommitPrefix = "_graft_commit_g"
  private val BucketDirRe = """^__b=(\d+)__g(\d+)$""".r

  private[streaming] def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Bucket id of a row. Spark's `hash()` is TYPE-sensitive (an INT 3 and a
    * BIGINT 3 hash differently), so when the store persisted its bucket
    * columns' types every derivation — batch, stored-state re-read, probe —
    * casts to those types first; otherwise a probe frame whose column type
    * drifted from the stored rows' would silently miss its buckets. */
  private[streaming] def bucketOf(keys: Seq[String], n: Int,
      types: Option[Seq[DataType]] = None): Column = {
    val cs = types match {
      case Some(ts) => keys.zip(ts).map { case (k, t) => col(k).cast(t) }
      case None => keys.map(col)
    }
    pmod(hash(cs: _*), lit(n))
  }

  private def readTextFile(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Write `content` crash-atomically to `dst` (which must not exist):
    * temp file + rename. The temp name never matches a reader pattern. */
  private def writeAtomic(f: FileSystem, root: Path, dst: Path, content: String): Unit = {
    val tmp = new Path(root, dst.getName + "__tmp")
    f.delete(tmp, false) // a crashed previous attempt
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    f.delete(dst, true) // same-generation leftover from a crashed attempt
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
  }

  /** Refuse roots holding foreign data (a flat-layout parquet dir) or
    * pre-manifest bucket directories (`__b=<i>` without a generation): both
    * would otherwise be silently invisible — i.e. silent state loss. */
  private def layoutGuard(f: FileSystem, root: Path): Unit = {
    if (!f.exists(root)) return
    val names = f.listStatus(root).map(_.getPath.getName)
    val stray = names.filter(n => !n.startsWith(BucketPrefix) && !n.startsWith("_"))
    if (stray.nonEmpty)
      throw new IllegalStateException(
        s"$root holds non-bucket entries (${stray.take(3).mkString(", ")}) — " +
          "not a bucketed KeyedStore layout; migrate or point at a fresh root")
    val legacy = names.filter(n =>
      n.startsWith(BucketPrefix) && !BucketDirRe.matches(n))
    if (legacy.nonEmpty)
      throw new IllegalStateException(
        s"$root holds pre-manifest bucket directories (${legacy.take(3).mkString(", ")}) — " +
          "rewrite the store (read old layout, merge into a fresh root)")
  }

  /** All committed manifest files as (generation, path), unsorted. */
  private def commitFiles(f: FileSystem, root: Path): Seq[(Long, Path)] = {
    if (!f.exists(root)) return Nil
    f.listStatus(root).map(_.getPath).toSeq
      .filter { p =>
        val n = p.getName
        n.startsWith(CommitPrefix) && n.drop(CommitPrefix.length).forall(_.isDigit) &&
          n.length > CommitPrefix.length
      }
      .map(p => p.getName.drop(CommitPrefix.length).toLong -> p)
  }

  /** Parse one manifest. A manifest can only exist complete (rename
    * protocol), so a parse failure is corruption and fails loudly. */
  private def parseManifest(f: FileSystem, p: Path): Map[Int, String] =
    readTextFile(f, p).split("\n").filter(_.nonEmpty).map { line =>
      line.split(" ", 2) match {
        case Array(i, dir) if i.forall(_.isDigit) && dir.startsWith(BucketPrefix) =>
          i.toInt -> dir
        case _ => throw new java.io.IOException(
          s"corrupt manifest $p: unparseable line '$line'")
      }
    }.toMap

  /** Highest committed manifest: (generation, bucket → directory name).
    * Superseded manifests may coexist (retained snapshots, or a crash before
    * GC) — the highest generation wins. */
  private[streaming] def readCommit(f: FileSystem, root: Path): Option[(Long, Map[Int, String])] = {
    val commits = commitFiles(f, root)
    if (commits.isEmpty) None
    else {
      val (gen, latest) = commits.maxBy(_._1)
      Some((gen, parseManifest(f, latest)))
    }
  }

  /** Bucket count the store was created with; later merges reuse it so the
    * key→bucket mapping never drifts (a param change would strand state).
    * Missing or unparseable meta beside existing state fails loudly: with
    * state on disk the key→bucket mapping is unknown, and silently adopting
    * the caller's numBuckets would re-bucket new rows away from old winners. */
  private[streaming] def readBucketCount(f: FileSystem, root: Path): Option[Int] = {
    val p = new Path(root, MetaFile)
    def hasState = readCommit(f, root).isDefined ||
      f.exists(root) && f.listStatus(root).exists(_.getPath.getName.startsWith(BucketPrefix))
    if (!f.exists(p)) {
      if (hasState)
        throw new java.io.IOException(
          s"$p is missing but $root holds state — bucket count unrecoverable " +
            "(out-of-band deletion?); restore the meta file or rewrite the store")
      None
    } else readTextFile(f, p).trim.linesIterator.next().trim.toIntOption match {
      case some @ Some(_) => some
      case None if !hasState => None // fresh store, rewrite
      case None => throw new java.io.IOException(
        s"corrupt $p with existing state — bucket count unrecoverable")
    }
  }

  /** Bucket-derivation columns persisted at creation (line 2 of the meta,
    * `cols:a,b`) — present only for stores created with an explicit
    * `bucketCols`; absent means buckets derive from the full key list. */
  private[streaming] def readBucketColsMeta(f: FileSystem, root: Path): Option[Seq[String]] = {
    val p = new Path(root, MetaFile)
    if (!f.exists(p)) None
    else readTextFile(f, p).trim.linesIterator.toSeq.drop(1)
      .find(_.startsWith("cols:"))
      .map(_.stripPrefix("cols:").split(",").toSeq.map(_.trim).filter(_.nonEmpty))
  }

  /** Bucket columns' data types persisted at creation (`types:` meta line,
    * `;`-separated catalog strings — `,` would split array/map types).
    * Absent on stores written before types were recorded: those keep the
    * uncast derivation they were created with. */
  private[streaming] def readBucketTypesMeta(f: FileSystem, root: Path): Option[Seq[DataType]] = {
    val p = new Path(root, MetaFile)
    if (!f.exists(p)) None
    else readTextFile(f, p).trim.linesIterator.toSeq.drop(1)
      .find(_.startsWith("types:"))
      .map(_.stripPrefix("types:").split(";").toSeq.map(s => DataType.fromDDL(s.trim)))
  }

  private def colsMetaContent(n: Int, bucketCols: Seq[String],
      types: Seq[DataType]): String =
    n.toString + "\ncols:" + bucketCols.mkString(",") +
      "\ntypes:" + types.map(_.catalogString).mkString(";")

  /** Read ONLY the buckets that `probe`'s bucket-column values hash into —
    * O(probe-touched buckets) file reads regardless of store size, the scale
    * path for probing a corpus-sized index with a batch-sized key set. The
    * store must have been created with an explicit `bucketCols` (persisted
    * in the meta) whose columns all exist in `probe`. None = no committed
    * state. A probe key that hashes to a bucket with no state reads
    * nothing — correct for a probe (it matches no stored row). */
  def readPruned(spark: SparkSession, path: String, probe: DataFrame): Option[DataFrame] = {
    val f = fs(spark, path)
    val root = new Path(path)
    layoutGuard(f, root)
    readCommit(f, root).filter(_._2.nonEmpty).map { case (_, dirs) =>
      val n = readBucketCount(f, root).getOrElse(
        throw new IllegalStateException(s"$path: committed state but no bucket count"))
      val bcols = readBucketColsMeta(f, root).getOrElse(
        throw new IllegalArgumentException(
          s"$path was not created with explicit bucketCols — pruned reads " +
            "need the persisted derivation; use read() or recreate the store"))
      val needed = probe.select(bucketOf(bcols, n, readBucketTypesMeta(f, root)).as("__b")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted.filter(dirs.contains)
      if (needed.isEmpty)
        spark.read.parquet(dirs.values.map(d => new Path(root, d).toString).toSeq: _*)
          .filter(lit(false))
      else
        spark.read.parquet(needed.map(b => new Path(root, dirs(b)).toString): _*)
    }
  }

  /** GC: keep the newest `keepGenerations` manifests and every directory
    * ANY retained manifest references; drop the rest (older generations +
    * staged leftovers). A crash mid-GC just leaves garbage for the next
    * writer's GC — never state. */
  private def gc(f: FileSystem, root: Path, keepGenerations: Int): Unit = {
    val retained = commitFiles(f, root).sortBy(-_._1).take(keepGenerations)
    val keepCommits = retained.map(_._2.getName).toSet
    val live = retained.flatMap { case (_, p) => parseManifest(f, p).values }.toSet
    f.listStatus(root).map(_.getPath).foreach { p =>
      val name = p.getName
      val oldCommit = name.startsWith(CommitPrefix) && !keepCommits.contains(name) &&
        name.drop(CommitPrefix.length).forall(_.isDigit)
      val deadDir = name.startsWith(BucketPrefix) && !live.contains(name)
      // a writeAtomic crashed between create and rename leaves a __tmp
      // file whose generation is never retried — collect it here so crash
      // garbage really is bounded by one writer pass
      val deadTmp = name.startsWith("_") && name.endsWith("__tmp") &&
        name != MetaFile + "__tmp"
      if (oldCommit || deadDir || deadTmp) f.delete(p, true)
    }
  }

  /** Compaction — the OPTIMIZE-style maintenance pass (single writer, like
    * merge): rewrite every committed bucket at one fresh generation, folding
    * accumulated per-merge files into one file per bucket, and optionally
    * dropping delete tombstones. Tombstones are RETAINED by default — the
    * store keeps them so a late lower-seq put cannot resurrect a deleted key
    * (see the class doc); pass `dropTombstones = true` only when the caller
    * can assert no straggler below the stored versions can still arrive
    * (e.g. the upstream's watermark has passed). A bucket left empty by the
    * drop leaves the new manifest entirely — readers treat an absent bucket
    * as empty. Same crash protocol as merge: staged directories are
    * invisible until the single manifest rename publishes all of them.
    *
    * No-op (and no new generation) on a store with no committed state. */
  def compact(spark: SparkSession, path: String, dropTombstones: Boolean = false,
      opCol: String = "op_type", deleteOp: String = "delete",
      keepGenerations: Int = 1): Unit = {
    val f = fs(spark, path)
    val root = new Path(path)
    layoutGuard(f, root)
    readCommit(f, root).foreach { case (gen, dirs) =>
      val newGen = gen + 1
      val staged = dirs.toSeq.sortBy(_._1).flatMap { case (b, dirName) =>
        val df0 = spark.read.parquet(new Path(root, dirName).toString)
        val df = if (dropTombstones && df0.columns.contains(opCol))
          df0.filter(col(opCol) =!= deleteOp) else df0
        if (df.isEmpty) None // tombstone-only bucket: absent = empty to readers
        else {
          // buckets are rewritten in place-by-name — no re-hash: a committed
          // row's bucket is already correct under the persisted derivation.
          // The tmp name starts with "_" (layoutGuard-invisible) and ends
          // with "__tmp" (collected by gc if a crash strands it).
          val dst = new Path(root, s"$BucketPrefix${b}__g$newGen")
          f.delete(dst, true) // crashed same-generation leftover
          val tmp = new Path(root, s"_compact_b${b}__tmp")
          f.delete(tmp, true)
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          if (!f.rename(tmp, dst))
            throw new java.io.IOException(s"compact rename -> $dst failed")
          Some(b -> dst.getName)
        }
      }
      val manifest = staged.sortBy(_._1)
        .map { case (i, d) => s"$i $d" }.mkString("\n")
      writeAtomic(f, root, new Path(root, CommitPrefix + newGen), manifest)
      gc(f, root, keepGenerations)
    }
  }

  /** Full stored state, tombstones included — the latest committed manifest's
    * view. Staged-but-uncommitted directories are invisible by construction. */
  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val f = fs(spark, path)
    val root = new Path(path)
    layoutGuard(f, root)
    // a store compacted down to nothing (every bucket tombstone-only,
    // dropTombstones) has a committed-but-empty manifest: no state to read
    readCommit(f, root).filter(_._2.nonEmpty).map { case (_, dirs) =>
      spark.read.parquet(dirs.values.map(d => new Path(root, d).toString).toSeq: _*)
    }
  }

  /** Live state: winning non-delete rows only. */
  def readActive(spark: SparkSession, path: String,
      opCol: String = "op_type", deleteOp: String = "delete"): Option[DataFrame] =
    read(spark, path).map(_.filter(col(opCol) =!= deleteOp))

  /** Committed generations still on disk, ascending. With
    * `merge(keepGenerations = k)` the last k stay readable — each retained
    * generation is a full consistent snapshot (its manifest pins every
    * bucket's directory), giving time-travel reads and a GC grace window for
    * concurrent readers. */
  def generations(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val root = new Path(path)
    layoutGuard(f, root) // a foreign/legacy root must not read as "no store"
    commitFiles(f, root).map(_._1).sorted
  }

  /** Snapshot read at a specific retained generation; None if that
    * generation was never committed or has been GC'd. */
  def readSnapshot(spark: SparkSession, path: String, generation: Long): Option[DataFrame] = {
    val f = fs(spark, path)
    val root = new Path(path)
    layoutGuard(f, root)
    commitFiles(f, root).find(_._1 == generation).map { case (_, p) =>
      val dirs = parseManifest(f, p)
      spark.read.parquet(dirs.values.map(d => new Path(root, d).toString).toSeq: _*)
    }
  }

  /** Merge one batch of versioned rows into the store at `path`.
    *
    * @param seqCols version order (newest wins); must be a TOTAL order over
    *                duplicate keys (extend with payload columns otherwise).
    *                Rows whose winning op is a delete stay stored as
    *                tombstones and are hidden by readActive.
    * @param numBuckets bucket count used when CREATING the store; an existing
    *                store keeps the count it was created with.
    * @param keepGenerations how many committed generations survive GC (≥ 1).
    *                Each retained generation is a full consistent snapshot
    *                readable via [[readSnapshot]]; values > 1 also give
    *                concurrent readers a grace window against GC. */
  def merge(batch: DataFrame, path: String, keys: Seq[String],
      seqCols: Seq[String], numBuckets: Int = 16, keepGenerations: Int = 1,
      bucketCols: Seq[String] = Seq.empty): Unit = {
    require(keepGenerations >= 1, s"keepGenerations must be >= 1, got $keepGenerations")
    require(bucketCols.forall(keys.contains),
      // bucket cols outside the key would let two versions of one key land
      // in different buckets — last-write-wins would then be per bucket
      s"bucketCols must be a subset of keys, got ${bucketCols.mkString(",")}")
    val spark = batch.sparkSession
    val f = fs(spark, path)
    val root = new Path(path)
    f.mkdirs(root)
    layoutGuard(f, root)
    val storedCols = readBucketColsMeta(f, root)
    val batchTypes = (cs: Seq[String]) => cs.map(c => batch.schema(c).dataType)
    val n = readBucketCount(f, root).getOrElse {
      val meta =
        if (bucketCols.nonEmpty) colsMetaContent(numBuckets, bucketCols, batchTypes(bucketCols))
        else numBuckets.toString
      writeAtomic(f, root, new Path(root, MetaFile), meta); numBuckets
    }
    // the persisted derivation wins; a caller-supplied derivation on an
    // existing store must MATCH it (anything else re-buckets new rows away
    // from committed winners)
    storedCols match {
      case Some(cs) => require(bucketCols.isEmpty || bucketCols == cs,
        s"bucketCols ${bucketCols.mkString(",")} != store's ${cs.mkString(",")}")
      case None if bucketCols.nonEmpty =>
        require(readCommit(f, root).isEmpty,
          "cannot add bucketCols to a store that already has keys-bucketed state")
        // Heal the crash window where a prior merge persisted the bucket
        // count but died before its first commit: with no committed state
        // the derivation is still ours to set — rewrite the meta so the
        // `cols:`/`types:` lines exist BEFORE any rows are bucketed by them
        // (otherwise later merges would derive buckets from the full keys,
        // mis-bucketing relative to this merge's committed rows).
        writeAtomic(f, root, new Path(root, MetaFile),
          colsMetaContent(n, bucketCols, batchTypes(bucketCols)))
      case None => ()
    }
    val bcols = storedCols.getOrElse(if (bucketCols.nonEmpty) bucketCols else keys)
    val btypes = readBucketTypesMeta(f, root)
    val (gen, committed) = readCommit(f, root).getOrElse((0L, Map.empty[Int, String]))
    val newGen = gen + 1
    // Pin the batch for the merge's TWO actions (touched-bucket collect +
    // the write): without it a non-deterministic or source-shifting batch
    // plan could hash rows into buckets absent from the first-pass touched
    // set — those rows would reach the staging dir but never be published, a
    // silent drop. Caching makes both actions see one materialization.
    val wb = batch.withColumn("__b", bucketOf(bcols, n, btypes)).persist()
    try {
      // Touched-bucket ids: bounded by n (metadata-sized, like the
      // reference's config cardinality) — NOT a data-sized collect.
      val touched = wb.select("__b").distinct().collect().map(_.getInt(0)).sorted
      val existing = touched.flatMap(committed.get).map(new Path(root, _))
      // Bucket files don't store __b (it's derivable); re-derive on read.
      val state = existing.headOption.map(_ =>
        spark.read.parquet(existing.map(_.toString).toIndexedSeq: _*)
          .withColumn("__b", bucketOf(bcols, n, btypes)))
      val all = state.map(wb.unionByName(_)).getOrElse(wb)
      // repartition by __b: each bucket hashes wholly into one task → one
      // file per touched bucket per merge (no small-file creep); AQE
      // coalesces the empty partitions.
      val won = Stateful.lastWriteWins(all, keys.map(col), seqCols.map(col))
        .repartition(col("__b"))
      val tmpRoot = new Path(path + "__tmp")
      f.delete(tmpRoot, true)
      won.write.mode("overwrite").partitionBy("__b").parquet(tmpRoot.toString)
      // Stage this generation's directories. Invisible until the manifest
      // lands; a same-generation leftover from a crashed attempt is
      // uncommitted garbage, safe to replace.
      touched.foreach { i =>
        val dst = new Path(root, s"$BucketPrefix${i}__g$newGen")
        f.delete(dst, true)
        if (!f.rename(new Path(tmpRoot, BucketPrefix + i), dst))
          throw new java.io.IOException(s"stage rename -> $dst failed")
      }
      f.delete(tmpRoot, true)
      // Publish: ONE atomic manifest rename flips every touched bucket
      // together. Crash before this line → readers stay on generation `gen`
      // for ALL buckets; crash after → they see generation `newGen` for all.
      val newMap = committed ++
        touched.map(i => i -> s"$BucketPrefix${i}__g$newGen").toMap
      val manifest = newMap.toSeq.sortBy(_._1)
        .map { case (i, d) => s"$i $d" }.mkString("\n")
      writeAtomic(f, root, new Path(root, CommitPrefix + newGen), manifest)
      gc(f, root, keepGenerations)
    } finally wb.unpersist()
  }
}
