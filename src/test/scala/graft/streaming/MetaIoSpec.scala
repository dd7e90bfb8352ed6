package graft.streaming

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable
import graft.SparkSpec

/** Local filesystem that counts operations on the KeyedStore META file —
  * the observable contract for merge latency on object stores, where every
  * metadata round-trip is a network call. Registered under the `cfs` scheme
  * so the SAME KeyedStore code runs through it unmodified. */
class CountingFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("cfs:///")

  private def isMeta(p: Path): Boolean = p.getName.startsWith("_graft_buckets")

  override def open(p: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    if (isMeta(p)) CountingFs.metaOpens.incrementAndGet()
    super.open(p, bufferSize)
  }

  override def create(p: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (isMeta(p)) CountingFs.metaCreates.incrementAndGet()
    super.create(p, overwrite, bufferSize, replication, blockSize, progress)
  }
}

object CountingFs {
  val metaOpens = new AtomicInteger(0)
  val metaCreates = new AtomicInteger(0)
  def reset(): Unit = { metaOpens.set(0); metaCreates.set(0) }
}

/** Pins the per-merge meta I/O budget: ONE meta read and AT MOST one meta
  * write (zero once the store exists — the meta is immutable outside heal
  * paths). Guards against the class of regression where meta hardening
  * quietly multiplies filesystem round-trips per micro-batch. */
class MetaIoSpec extends SparkSpec {

  private def withCountingFs[A](f: String => A): A = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.cfs.impl", classOf[CountingFs].getName)
    // fresh root per test run, addressed through the counting scheme
    val dir = java.nio.file.Files.createTempDirectory("graft_metaio").toString
    f(s"cfs:$dir/store")
  }

  test("merge performs one meta read and at most one meta write") {
    val s = spark
    import s.implicits._
    withCountingFs { path =>
      CountingFs.reset()
      // CREATE: no meta to read (existence probe only); exactly one meta
      // write (the initial cols+types file)
      KeyedStore.merge(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "seq"),
        path, keys = Seq("k"), seqCols = Seq("seq"), numBuckets = 4)
      assert(CountingFs.metaCreates.get() == 1,
        s"store creation must write the meta exactly once, got ${CountingFs.metaCreates.get()}")
      assert(CountingFs.metaOpens.get() == 0,
        s"store creation must not read a meta that does not exist, got ${CountingFs.metaOpens.get()}")

      // STEADY-STATE merge: one meta read, zero meta writes
      CountingFs.reset()
      KeyedStore.merge(Seq((2L, "b2", 2L), (3L, "c", 1L)).toDF("k", "v", "seq"),
        path, keys = Seq("k"), seqCols = Seq("seq"), numBuckets = 4)
      assert(CountingFs.metaOpens.get() == 1,
        s"steady-state merge must read the meta exactly once, got ${CountingFs.metaOpens.get()}")
      assert(CountingFs.metaCreates.get() == 0,
        s"steady-state merge must not rewrite the meta, got ${CountingFs.metaCreates.get()}")

      // the counted merges really merged
      val rows = KeyedStore.read(s, path).get
        .select("k", "v").as[(Long, String)].collect().toMap
      assert(rows == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    }
  }

  test("compact job count is constant in the bucket count") {
    val s = spark
    import s.implicits._
    // the pre-round-6 shape looped buckets on the driver (one coalesce(1)
    // job per bucket); the one-job rewrite must not regress back
    val jobs = new AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def compactJobs(buckets: Int): Int = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_cjob$buckets")
        .toString + "/t"
      KeyedStore.merge((0L until 256L).map(i => (i, s"v$i", 1L)).toDF("k", "v", "seq"),
        dir, keys = Seq("k"), seqCols = Seq("seq"), numBuckets = buckets)
      s.sparkContext.addSparkListener(listener)
      jobs.set(0)
      try {
        KeyedStore.compact(s, dir)
        Thread.sleep(500) // listener-bus drain (waitUntilEmpty is private[spark])
      } finally s.sparkContext.removeSparkListener(listener)
      assert(KeyedStore.read(s, dir).get.count() == 256)
      jobs.get()
    }
    val at4 = compactJobs(4)
    val at32 = compactJobs(32)
    assert(at32 == at4, s"compact ran $at32 jobs at 32 buckets vs $at4 at 4")
    assert(at4 <= 3, s"compact should be ~one job, ran $at4")
  }

  test("pruned read performs one meta read and no meta writes") {
    val s = spark
    import s.implicits._
    withCountingFs { path =>
      KeyedStore.merge(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "seq"),
        path, keys = Seq("k"), seqCols = Seq("seq"), numBuckets = 4)
      CountingFs.reset()
      val probe = Seq(1L).toDF("k")
      val got = KeyedStore.readPruned(s, path, probe).get.count()
      assert(got >= 1)
      assert(CountingFs.metaOpens.get() == 1,
        s"readPruned must read the meta exactly once, got ${CountingFs.metaOpens.get()}")
      assert(CountingFs.metaCreates.get() == 0,
        s"readPruned must never write (read-only path), got ${CountingFs.metaCreates.get()}")
    }
  }
}
