package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.ext.Dedup

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

  /** Guard for probes that cache a replicated corpus on disk: the corpus is
    * reusable only if it was generated with the SAME copy count — a bare
    * `documents.parquet exists` check silently reuses a stale corpus under
    * a wrong label (e.g. `screens 20` after `screens 10`, or after a
    * `dsir 10` run into the same default dir). */
  private def corpusReady(outDir: String, copies: Int,
      probeFile: String = "documents.parquet"): Boolean = {
    val m = java.nio.file.Paths.get(s"$outDir/_copies")
    new java.io.File(s"$outDir/$probeFile").exists() &&
      java.nio.file.Files.exists(m) &&
      java.nio.file.Files.readString(m).trim == copies.toString
  }

  private def markCorpus(outDir: String, copies: Int): Unit = {
    new java.io.File(outDir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/_copies"), copies.toString)
  }

  /** The vocabulary-growing document replicator every doc-corpus probe
    * shares (ONE copy — the SCALING.md Heaps-law claims rest on this exact
    * rewrite, and a probe-local fork would silently diverge): copy 0 is the
    * base corpus; each later copy shifts doc ids and suffixes CONTENT
    * tokens with a copy-specific letters-only tag, keeping stopwords
    * verbatim — within-copy structure is a bijection of the base, while
    * cross-copy 3-gram collisions need 3 consecutive stopwords. */
  private def replicatedDocs(spark: SparkSession, srcDir: String,
      c: Int): org.apache.spark.sql.DataFrame = {
    val base = spark.read.parquet(s"$srcDir/documents.parquet")
      .withColumn("doc_id", col("doc_id") + lit(c * KeyShift))
    if (c == 0) base
    else {
      val tag = s"${('a' + c % 26).toChar}${('a' + (c / 26) % 26).toChar}"
      base.withColumn("text",
        array_join(transform(split(col("text"), " "),
          t => when(t.isin("the", "a", "of", "to", "and"), t)
            .otherwise(concat(t, lit(tag)))), " "))
    }
  }

  /** Build (or reuse, via the `_copies` marker) a doc-only N× corpus. */
  private def ensureDocCorpus(spark: SparkSession, outDir: String,
      copies: Int): Unit =
    if (!corpusReady(outDir, copies)) {
      val srcDir = "/root/testdata/sf0.1"
      val parts = spark.sparkContext.defaultParallelism
      (0 until copies).map(replicatedDocs(spark, srcDir, _))
        .reduce(_ union _)
        .repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/documents.parquet")
      markCorpus(outDir, copies)
    }

  def replicate(spark: SparkSession, srcDir: String, outDir: String, copies: Int): Unit = {
    def li(c: Int) = spark.read.parquet(s"$srcDir/lineitem.parquet")
      .withColumn("l_orderkey", col("l_orderkey") + lit(c * KeyShift))
    def ord(c: Int) = spark.read.parquet(s"$srcDir/orders.parquet")
      .withColumn("o_orderkey", col("o_orderkey") + lit(c * KeyShift))
    def ev(c: Int) = spark.read.parquet(s"$srcDir/events.parquet")
      .withColumn("event_id", col("event_id") + lit(c * KeyShift))
      .withColumn("user_id", col("user_id") + lit(c * 10000L))
    // A real corpus's vocabulary grows with its size; naive text replication
    // instead multiplies cross-doc shingle collisions until the C4-style
    // span screen drops everything (round-4 fixture note in SCALING.md). So
    // each copy rewrites CONTENT tokens with a copy-specific letters-only
    // suffix: within-copy token structure is a bijection of the base (every
    // shingle/Jaccard/cluster relation is preserved per copy — true dup
    // pairs grow linearly with copies, the realistic shape), while
    // cross-copy 3-gram collisions need 3 consecutive stopwords. Stopwords
    // stay verbatim (stop_ratio unchanged) and tags are lowercase letters
    // (alpha_ratio undamaged), so the quality screen keeps its 1× behavior.
    def doc(c: Int) = replicatedDocs(spark, srcDir, c)
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

  /** Exact-vs-approx profile probe: times `Profile.profile` in both modes on
    * the N×-replicated orders table and reports the per-column distinct-count
    * error — the measured side of the Expand-×(k+1) vs HLL-sketch trade.
    *
    * Usage: runMain graft.tools.ScaleProbe profile [copies] [outDir] */
  def profileProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$outDir/orders.parquet").exists())
      replicate(spark, "/root/testdata/sf0.1", outDir, copies)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val df = spark.read.parquet(s"$outDir/orders.parquet")
    df.count() // footer/JIT warm
    def time(approx: Boolean): (Double, Map[String, Long]) = {
      val t0 = System.nanoTime()
      val rows = graft.ext.Profile.profile(df, cols, approx = approx).collect()
      ((System.nanoTime() - t0) / 1e9,
        rows.map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap)
    }
    val (tExact, ndExact) = time(approx = false)
    val (tApprox, ndApprox) = time(approx = true)
    println(f"PROFILE exact  ${copies}x: $tExact%.2f s")
    println(f"PROFILE approx ${copies}x: $tApprox%.2f s (${tExact / tApprox}%.1fx faster)")
    cols.foreach { c =>
      val (e, a) = (ndExact(c), ndApprox(c))
      val err = if (e == 0) 0.0 else math.abs(a - e).toDouble / e
      println(f"PROFILE $c exact=$e approx=$a err=${err * 100}%.2f%%")
    }
    spark.stop()
  }

  /** 100×-class probe for the LSH dedup family — the most scale-critical
    * LLM operator. Measures, at 1× (sf0.1) and N× replicated documents:
    * the LSH CANDIDATE count (band-bucket collisions before verify), the
    * verified true-pair count, their ratio (the candidates-∝-true-pairs
    * property — a fixed-vocabulary replicator degrades it quadratically;
    * the vocabulary-growing replicator keeps both linear in copies), and
    * the full `q_dedup_clusters_lsh` wall + final AQE plan (dumped under
    * `<outDir>/plans/`).
    *
    * Usage: runMain graft.tools.ScaleProbe dedup [copies] [outDir] */
  def dedup(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // documents at EXACTLY `copies`× (the full replicate() halves document
    // copies because the flagship probes' pathological growth mode is pair
    // formation): replicate only what this probe reads
    ensureDocCorpus(spark, outDir, copies)
    def mix(plan: String): String = Seq(
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct")
      .map(k => s"$k=${plan.sliding(k.length).count(_ == k)}").mkString(", ")
    val planDir = new java.io.File(s"$outDir/plans"); planDir.mkdirs()
    for ((dir, label) <- Seq(("/root/testdata/sf0.1", "1x"),
        (outDir, s"${copies}x"))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val sh = Dedup.shingles(docs, col("doc_id"), col("text")).persist()
      val sig = Dedup.minhashSignatures(sh)
      val buckets = Dedup.bandBuckets(sig)
      val t0 = System.nanoTime()
      val candDf = buckets.as("x").join(buckets.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct()
      val candidates = candDf.count()
      val tCand = (System.nanoTime() - t0) / 1e9
      // the band-bucket self-join IS the scale-critical plan (the cluster
      // query's own executedPlan is a post-checkpoint scan — useless here)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$planDir/lsh_band_join_$label.txt"),
        candDf.queryExecution.executedPlan.toString)
      println(s"DEDUP $label band-join plan: " +
        mix(candDf.queryExecution.executedPlan.toString))
      val t1 = System.nanoTime()
      val truePairs = Dedup.minhashLshPairs(sh, 1, 2).count()
      val tPairs = (System.nanoTime() - t1) / 1e9
      sh.unpersist()
      val t2 = System.nanoTime()
      val q = SparkEntry.queries("q_dedup_clusters_lsh")(spark, dir)
      val nClustered = q.count()
      val tFull = (System.nanoTime() - t2) / 1e9
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$planDir/q_dedup_clusters_lsh_$label.txt"),
        q.queryExecution.executedPlan.toString)
      println(f"DEDUP $label: docs=$nDocs candidates=$candidates " +
        f"truePairs=$truePairs ratio=${candidates.toDouble / math.max(1, truePairs)}%.2f " +
        f"candWall=$tCand%.1f s pairsWall=$tPairs%.1f s clustersWall=$tFull%.1f s " +
        f"(${nClustered} clustered docs) [${mix(q.queryExecution.executedPlan.toString)}]")
    }
    spark.stop()
  }

  /** Containment-pairs scale probe: containment shares the inverted-index
    * posting-list exposure (`Dedup.containmentPairs` scaladoc), so the
    * guard is the same DF cap — this measures whether the composition holds
    * candidate growth linear in corpus size. The uncapped join volume is
    * priced EXACTLY from the shingle-DF histogram (a shingle in d docs
    * contributes d·(d−1)/2 join rows) without running the quadratic join;
    * the capped path then runs end-to-end: kept-shingle fraction, capped
    * join volume, verified containment pairs, wall.
    *
    * Usage: runMain graft.tools.ScaleProbe contain [copies] [outDir] [maxDf] */
  def containProbe(copies: Int, outDir: String, maxDf: Int): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureDocCorpus(spark, outDir, copies)
    for ((dir, label) <- Seq(("/root/testdata/sf0.1", "1x"), (outDir, s"${copies}x"))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val sh = Dedup.shingles(docs, col("doc_id"), col("text")).persist()
      // exact join-volume pricing from the DF histogram — no quadratic join
      val hist = sh.groupBy("s").agg(count(lit(1)).as("d"))
      val Array(nShingles, uncappedRows, cappedRows, keptShingles) =
        hist.agg(
          count(lit(1)),
          sum(col("d") * (col("d") - 1) / 2),
          sum(when(col("d") <= maxDf, col("d") * (col("d") - 1) / 2).otherwise(0L)),
          sum(when(col("d") <= maxDf, col("d")).otherwise(0L)))
        .collect().head.toSeq.map(v => BigDecimal(v.toString).toLong).toArray
      // the capped containment path, end-to-end
      val kept = sh.join(hist.filter(col("d") <= maxDf).select("s"),
        Seq("s"), "left_semi")
      val t0 = System.nanoTime()
      val pairs = Dedup.containmentPairs(kept, 9, 10).count()
      val wall = (System.nanoTime() - t0) / 1e9
      sh.unpersist()
      println(f"CONTAIN $label: docs=$nDocs distinctShingles=$nShingles " +
        f"uncappedJoinRows=$uncappedRows cappedJoinRows=$cappedRows " +
        f"keptPostings=$keptShingles pairs>=0.9=$pairs cappedWall=$wall%.1f s")
    }
    spark.stop()
  }

  /** Z-order WRITE-path probe: `q_zorder`/`ScaleSpec` pin the layout key's
    * algebra and partition-range disjointness; this measures the payoff on
    * disk — writes the (replicated) orders table at three physical layouts:
    *
    *   unrelated — range/sorted by o_orderkey (no correlation with the box)
    *   single    — range/sorted by o_custkey only (the classic sort layout)
    *   zorder    — `Scale.zorderLayout` on (o_custkey, int(o_totalprice))
    *
    * then runs the same ~2%×~40% box query against each and reports rows and
    * bytes DECODED (task inputMetrics — what parquet row-group min/max
    * skipping actually let through) and the distinct files holding matches
    * (how well the layout clusters the box). Expectation: `single` prunes
    * the custkey half only; `zorder` prunes on both dimensions and
    * concentrates matches in few files; `unrelated` reads everything.
    *
    * Usage: runMain graft.tools.ScaleProbe zorder [copies] [outDir] */
  def zorderProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false")
      // one row group per ~1 MiB so min/max skipping has sub-file granularity
      .config("parquet.block.size", (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rowsRead = new java.util.concurrent.atomic.AtomicLong
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          rowsRead.addAndGet(m.inputMetrics.recordsRead)
          bytesRead.addAndGet(m.inputMetrics.bytesRead)
        }
    })
    val src = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val orders = (0 until copies).map(c => src.withColumn("o_orderkey",
        col("o_orderkey") + lit(c * KeyShift))).reduce(_ union _)
      .withColumn("__price", col("o_totalprice").cast("int"))
    val files = 64
    val layouts = Map(
      "unrelated" -> orders.repartitionByRange(files, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey")),
      "single" -> orders.repartitionByRange(files, col("o_custkey"))
        .sortWithinPartitions(col("o_custkey")),
      // both dims normalized onto 14 bits (custkey 1..15000, price ~850..560k
      // from the table profile) — see the zorderValue range caveat
      "zorder" -> graft.ops.Scale.zorderLayout(orders,
        graft.ops.Scale.normalizeDim(col("o_custkey"), 1, 15000, 14),
        graft.ops.Scale.normalizeDim(col("__price"), 850, 560000, 14),
        files, bits = 14),
      // the auto-stats form: domains profiled from the data in one min/max
      // pass (Scale.dimBounds) instead of the hand-supplied table profile —
      // pruning must match the hand-bounded layout
      "zorder_auto" -> graft.ops.Scale.zorderLayoutAuto(orders,
        col("o_custkey"), col("__price"), files, bits = 14))
    layouts.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
    // ~10% on each dimension: selective enough that pruning matters on both,
    // so the single-column sort's blind spot (the price-only predicate, and
    // the price half of the box) is visible next to z-order's two-sided skip
    val preds = Seq(
      "custkey-only" -> col("o_custkey").between(1000, 2500),
      "price-only" -> col("__price").between(50000, 105000),
      "box-both" -> (col("o_custkey").between(1000, 2500) &&
        col("__price").between(50000, 105000)))
    val total = orders.count()
    for ((name, _) <- layouts.toSeq.sortBy(_._1); (pname, pred) <- preds) {
      val df = spark.read.parquet(s"$outDir/$name")
      df.count() // footer warm so the measured pass is data IO
      rowsRead.set(0); bytesRead.set(0)
      val t0 = System.nanoTime()
      val matches = df.filter(pred).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener-bus drain (waitUntilEmpty is private[spark])
      val decoded = rowsRead.get; val mb = bytesRead.get / 1e6
      // match-file clustering is measured AFTER the counters are snapshotted
      // (this query decodes data too and must not pollute the IO numbers)
      val matchFiles = df.filter(pred).select(input_file_name()).distinct().count()
      println(f"ZORDER $name%-9s $pname%-12s: decodedRows=$decoded " +
        f"(${decoded * 100.0 / total}%.1f%% of $total) " +
        f"decodedMB=$mb%.1f matches=$matches " +
        f"matchFiles=$matchFiles/$files wall=$wall%.2f s")
    }
    spark.stop()
  }

  /** Model-size / linearity probe for the DSIR screen and the hashed linear
    * classifier: both keep their model tables bucket-bounded (broadcast) at
    * any corpus size, so wall time must track the corpus linearly and the
    * model row counts must NOT grow past `buckets` — the property that makes
    * the 100 TB shape scan + broadcast-join + one rollup shuffle. Uses the
    * vocabulary-growing document replicator (same as the dedup probes) so
    * the bucket fill actually grows with corpus size the way a real crawl's
    * vocabulary does. */
  def dsirProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureDocCorpus(spark, outDir, copies)
    val B = 4096
    for ((dir, label) <- Seq(("/root/testdata/sf0.1", "1x"),
        (outDir, s"${copies}x"))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val isTgt = col("doc_id") % 97 === 0
      def run(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"DSIRPROBE $label%-5s $tag%-12s wall=${(System.nanoTime - t0) / 1e9}%6.2f s rows=$n ($nDocs docs)")
      }
      // model fill: distinct buckets touched must stay <= B at any scale
      val tgtBuckets = graft.ext.Curation
        .dsirScreen(docs.filter(!isTgt), docs.filter(isTgt),
          col("doc_id"), col("text"), buckets = B)
      run("screen")(tgtBuckets.filter(col("keep")).count())
      val modelFill = docs
        .select(explode(graft.ext.TextStats.toks(col("text"))).as("tok"))
        .select((conv(substring(md5(col("tok")), 1, 8), 16, 10)
          .cast("long") % B).as("b")).distinct().count()
      println(s"DSIRPROBE $label model fill: $modelFill of $B buckets")
      val weights = spark.range(512L).select(col("id").as("bucket"),
        (conv(substring(md5(concat(lit("w:"), col("id").cast("string"))), 1, 8),
          16, 10).cast("long") % 2001 - 1000).as("w"))
      run("classifier")(graft.ext.TextStats.hashedLinearScore(docs,
        col("doc_id"), col("text"), weights, buckets = 512)
        .filter(col("keep")).count())
    }
    spark.stop()
  }

  /** Round-7 screens probe: wordpiece / Bloom-decon / LM-surprise at 1× vs
    * N× on the VOCABULARY-GROWING replicated corpus (the dsirProbe
    * mangling appends a per-copy tag to most words, so distinct words —
    * the wordpiece fold's work set — grow ~×N: the adversarial case). The
    * claims under test: the wordpiece fold's row count IS the distinct-word
    * count (corpus pays only explode+join+rollup); the Bloom bit table
    * saturates at ≤ m positions no matter how the eval suite grows; the LM
    * models stay ≤ buckets rows each. */
  def screensProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureDocCorpus(spark, outDir, copies)
    val m = 1 << 14
    for ((dir, label) <- Seq(("/root/testdata/sf0.1", "1x"),
        (outDir, s"${copies}x"))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      def run(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"SCREENPROBE $label%-5s $tag%-10s wall=${(System.nanoTime - t0) / 1e9}%6.2f s out=$n ($nDocs docs)")
      }
      val distinctWords = docs
        .select(explode(graft.ext.TextStats.toks(col("text"))).as("w"))
        .distinct().count()
      println(s"SCREENPROBE $label wordpiece fold rows (distinct words): $distinctWords")
      run("wordpiece")(graft.ext.TextStats.wordpieceCounts(docs,
          col("doc_id"), col("text"), graft.queries.ExtQueries.WordpieceVocab)
        .agg(sum(col("n_pieces"))).collect()(0).getLong(0))
      val sh = graft.ext.Dedup.shingles(docs, col("doc_id"), col("text"))
      val isEval = col("doc_id") % 97 === 0
      val evalSh = sh.filter(isEval)
      def posOf(i: Int) = conv(substring(md5(col("s")), 1 + 8 * i, 8), 16, 10)
        .cast("long") % m
      val bitFill = evalSh
        .select(explode(array((0 until 3).map(posOf): _*)).as("pos"))
        .distinct().count()
      println(s"SCREENPROBE $label bloom bit-table fill: $bitFill of $m positions")
      run("bloom")(graft.ext.Dedup.bloomScreen(sh.filter(!isEval), evalSh)
        .filter(col("flagged")).count())
      val isTgt = col("doc_id") % 7 === 0
      run("lm")(graft.ext.TextStats.hashedLmSurprise(docs.filter(!isTgt),
          docs.filter(isTgt), col("doc_id"), col("text"), num = 820L)
        .filter(col("keep")).count())
    }
    spark.stop()
  }

  /** Prefix-filter (AllPairs/PPJoin) candidate-statistics probe. For each
    * corpus it reports, with per-stage wall: shingle count, FULL inverted-
    * index distinct candidate pairs (what [[graft.ext.Dedup.ngramJaccardPairs]]
    * verifies), prefix-index size and its distinct candidates WITHOUT the
    * positional filter, candidates WITH it (what the operator verifies
    * since round 8), and true pairs at τ = 1/2 — i.e. the candidate:pair
    * ratio of every path, the number the 100 TB claim rests on.
    *
    * Two fixtures: the sf0.1 corpus itself (31-word vocabulary — the
    * documented WORST case: every shingle common, rarity ordering nearly
    * uninformative) and, with `copies > 1`, the vocabulary-GROWING
    * replicated corpus (the Heaps-law-shaped fixture: content tokens get a
    * per-copy suffix so vocabulary grows with corpus size while stopwords
    * stay shared — the realistic shape where common-shingle posting lists
    * drive the full index quadratic but stay OUT of rarity-ordered
    * prefixes).
    *
    * Usage: runMain graft.tools.ScaleProbe prefix [copies] [outDir] */
  def prefixProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (copies > 1) ensureDocCorpus(spark, outDir, copies)
    val dirs = Seq(("/root/testdata/sf0.1", "1x")) ++
      (if (copies > 1) Seq((outDir, s"${copies}x")) else Nil)
    for ((dir, label) <- dirs) {
      val docs = graft.model.Envelopes.table(spark, dir, "documents")
      val sh = graft.ext.Dedup.shingles(docs, col("doc_id"), col("text"))
        .localCheckpoint(true)
      println(s"PFXPROBE $label shingles=${sh.count()}")
      def timed[T](what: String)(body: => T): T = {
        val t0 = System.nanoTime
        val r = body
        println(f"PFXPROBE $label $what wall=${(System.nanoTime - t0) / 1e9}%.2f s")
        r
      }
      val fullCand = timed("fullIndexCand") {
        sh.as("a").join(sh.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      }
      val (candNoPos, pfx1) =
        graft.ext.Dedup.prefixCandidates(sh, 1, 2, positional = false)
      println(s"PFXPROBE $label prefixIndex=${pfx1.count()}")
      val nNoPos = timed("prefixCand")(candNoPos.count())
      graft.util.Blocks.freeCheckpoint(pfx1)
      val (candPos, pfx2) = graft.ext.Dedup.prefixCandidates(sh, 1, 2)
      val nPos = timed("prefix+positionalCand")(candPos.count())
      graft.util.Blocks.freeCheckpoint(pfx2)
      val pairs = timed("truePairs")(
        graft.ext.Dedup.ngramJaccardPairsPrefix(sh, 1, 2).count())
      def ratio(c: Long) = if (pairs == 0) Double.NaN else c.toDouble / pairs
      println(f"PFXPROBE $label fullCand=$fullCand (${ratio(fullCand)}%.1f:1) " +
        f"prefixCand=$nNoPos (${ratio(nNoPos)}%.1f:1) " +
        f"posCand=$nPos (${ratio(nPos)}%.1f:1) pairs=$pairs")
      graft.util.Blocks.freeCheckpoint(sh)
    }
    spark.stop()
  }

  /** PageRank scale probe: the symmetrized trade graph at 1× vs N×
    * (key-shifted copies = N disjoint subgraphs — node and edge counts both
    * scale ×N, the shape that matters for the per-iteration join+agg).
    * Reports graph-build wall, per-iteration wall, and total — the claim
    * under test is that iterations are flat in N (one edge-linear join +
    * one node-linear agg each, rank table checkpointed per iteration). */
  def pagerankProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the corpusReady stale-reuse guard, probing the table this probe
    // actually reads: a bare exists-check would silently benchmark a 10x
    // corpus under a 20x label after back-to-back runs into one dir
    if (!corpusReady(outDir, copies, probeFile = "lineitem.parquet")) {
      replicate(spark, "/root/testdata/sf0.1", outDir, copies)
      markCorpus(outDir, copies)
    }
    for ((dir, label) <- Seq(("/root/testdata/sf0.1", "1x"), (outDir, s"${copies}x"))) {
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
      val tb = System.nanoTime()
      // replicate() shifts ORDER keys per copy but not the cust/supp entity
      // keys — recover the copy index from the shifted orderkey and shift
      // the entities too, so the graph really is N disjoint subgraphs (N×
      // nodes AND N× edges), not N re-assertions of the same pairs
      val copyIx = expr(s"o_orderkey div $KeyShift")
      val e0 = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") + copyIx * lit(1000000L)).as("c"),
          // keep supplier ids disjoint from the customer space
          (col("l_suppkey") + copyIx * lit(1000000L) + lit(KeyShift * 1000)).as("sk"))
        .distinct()
      val edges = e0.select(col("c").as("src"), col("sk").as("dst"))
        .unionByName(e0.select(col("sk").as("src"), col("c").as("dst")))
        .localCheckpoint(true)
      val nEdges = edges.count()
      println(f"PRPROBE $label%-5s graph build wall=${(System.nanoTime - tb) / 1e9}%6.2f s edges=$nEdges")
      var prev = 0.0
      for (it <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.ops.Graph.pageRankInt(edges, iters = it).count()
        val w = (System.nanoTime - t0) / 1e9
        println(f"PRPROBE $label%-5s iters=$it total=$w%6.2f s marginal=${w - prev}%6.2f s")
        prev = w
      }
    }
    spark.stop()
  }

  /** linkPredict wedge-bound probe: the pagerankProbe graph (disjoint
    * copies, so edges AND nodes scale together) at 1x and Nx, walls and
    * output sizes at the production cap beside an uncapped-ish high cap —
    * the measured evidence for the Σ min(deg, cap)² ≤ cap·m claim. */
  def linkpredProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!corpusReady(outDir, copies, probeFile = "lineitem.parquet")) {
      replicate(spark, "/root/testdata/sf0.1", outDir, copies)
      markCorpus(outDir, copies)
    }
    for ((dir, label) <- Seq(("/root/testdata/sf0.1", "1x"), (outDir, s"${copies}x"))) {
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
      val copyIx = expr(s"o_orderkey div $KeyShift")
      val e0 = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") + copyIx * lit(1000000L)).as("a"),
          (col("l_suppkey") + copyIx * lit(1000000L) + lit(KeyShift * 1000)).as("b"))
        .distinct()
        .localCheckpoint(true)
      val m = e0.count()
      for (cap <- Seq(8, 64)) {
        val t0 = System.nanoTime()
        val out = graft.ops.Graph.linkPredict(e0, maxDeg = cap)
        val pairs = out.count()
        val w = (System.nanoTime - t0) / 1e9
        graft.util.Blocks.freeCheckpoint(out)
        println(f"LPPROBE $label%-5s cap=$cap%3d edges=$m%9d wall=$w%6.2f s openPairs=$pairs%9d")
      }
      graft.util.Blocks.freeCheckpoint(e0)
    }
    spark.stop()
  }

  /** Warm-start incremental PageRank probe on the sf0.1 trade graph:
    * folds 99% of the edges cold, then the remaining 1% warm, and compares
    * iteration counts (and wall) against a cold batch run on the FULL
    * graph at the same tolerance — the measured saving the
    * IncrementalRank warm-start claim rests on.
    *
    * Usage: runMain graft.tools.ScaleProbe warmrank [tolExp] [storeRoot] */
  def warmrankProbe(tolExp: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    val dir = "/root/testdata/sf0.1"
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val e0 = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + lit(1000000L)).as("sk"))
      .distinct()
    val edges = e0.select(col("c").as("src"), col("sk").as("dst"))
      .unionByName(e0.select(col("sk").as("src"), col("c").as("dst")))
      .localCheckpoint(true)
    val tol = math.pow(10, tolExp).toLong
    val isDelta = abs(hash(col("src"), col("dst"))) % 100 === 0
    val base = edges.filter(!isDelta)
    val delta = edges.filter(isDelta)
    println(s"WARMRANK edges=${edges.count()} delta=${delta.count()} tol=$tol")
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime - t0) / 1e9)
    }
    val ((_, itCold), wCold) = timed(graft.streaming.IncrementalRank
      .updateAndRank(base, storeRoot, tol, 200))
    println(f"WARMRANK cold 99%% fold: iters=$itCold wall=$wCold%.1f s")
    val ((_, itWarm), wWarm) = timed(graft.streaming.IncrementalRank
      .updateAndRank(delta, storeRoot, tol, 200))
    println(f"WARMRANK warm 1%% delta fold: iters=$itWarm wall=$wWarm%.1f s")
    val ((_, itFull), wFull) = timed(graft.ops.Graph
      .pageRankIntConverge(edges, None, tol, 200))
    println(f"WARMRANK cold FULL batch: iters=$itFull wall=$wFull%.1f s")
    println(f"WARMRANK saving: warm $itWarm vs cold $itFull iterations " +
      f"(${100.0 * (itFull - itWarm) / itFull}%.0f%%)")
    spark.stop()
  }

  /** IncrementalCc long-run probe: the sf0.1 customer↔supplier pair set
    * (~600 k undirected pairs, one giant component plus satellites) split
    * into `batches` folds against the persistent label store, vs a batch
    * recompute over the concatenated history at each horizon. The claims
    * under test: per-fold wall stays bounded by O(current nodes) star
    * edges + the batch (NOT by the growing pair history), and the
    * recompute alternative's wall grows with the history it re-reads.
    *
    * Usage: runMain graft.tools.ScaleProbe ccfold [batches] [storeRoot] */
  def ccfoldProbe(batches: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    val dir = "/root/testdata/sf0.1"
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("a_id"),
        (col("l_suppkey") + lit(1000000L)).as("b_id"))
      .distinct().localCheckpoint(true)
    println(s"CCFOLD pairs=${pairs.count()} batches=$batches")
    var hist = Seq.empty[org.apache.spark.sql.DataFrame]
    for (i <- 0 until batches) {
      val b = pairs.filter(abs(hash(col("a_id"), col("b_id"))) % batches === i)
        .localCheckpoint(true)
      hist = hist :+ b
      val t0 = System.nanoTime()
      val n = graft.streaming.IncrementalCc.mergePairs(b, s"$storeRoot/cc").count()
      val foldW = (System.nanoTime - t0) / 1e9
      val t1 = System.nanoTime()
      val nb = graft.ext.Dedup.connectedComponents(
        hist.reduce(_ unionByName _)).count()
      val batchW = (System.nanoTime - t1) / 1e9
      println(f"CCFOLD fold=$i%2d labels=$n fold=$foldW%5.1f s " +
        f"recompute($nb labels)=$batchW%5.1f s")
    }
    // sparse-delta phase: single-pair folds against the full store — the
    // affected-cluster pruning means each fold's components input is one
    // cluster + one pair, not the node table; cost must not track corpus
    import spark.implicits._
    for (i <- 0 until 5) {
      val p = Seq((9000000L + i, 9000000L + i + 1)).toDF("a_id", "b_id")
      val t0 = System.nanoTime()
      graft.streaming.IncrementalCc.mergePairs(p, s"$storeRoot/cc").count()
      println(f"CCFOLD sparse=$i wall=${(System.nanoTime - t0) / 1e9}%5.2f s (single new pair)")
    }
    // GROWN-store flatness: the same single-pair folds against a label
    // store 125× larger (2 M nodes, 64 buckets — the grain a real corpus
    // would run at). Store access is bucket-pruned, so the wall must NOT
    // track the store; the fold is timed without materializing the full
    // label table (that count is the caller's choice, not fold cost).
    val big = spark.range(1000000L)
      .select((col("id") * 2 + 10000000L).as("a_id"),
        (col("id") * 2 + 10000001L).as("b_id"))
    graft.streaming.IncrementalCc.mergePairs(
      big, s"$storeRoot/ccbig", numBuckets = 64)
      .count() // bootstrap fold (also forces the store build)
    for (i <- 0 until 5) {
      // odd i touches a stored cluster (star-edge read path), even i is
      // all-new (the no-touch fast path) — both must stay flat
      val p = if (i % 2 == 1)
        Seq((20000000L + i, 10000000L + 4 * i)).toDF("a_id", "b_id")
      else Seq((21000000L + i, 21000001L + i)).toDF("a_id", "b_id")
      val t0 = System.nanoTime()
      graft.streaming.IncrementalCc.mergePairs(p, s"$storeRoot/ccbig",
        numBuckets = 64)
      println(f"CCFOLD big-sparse=$i wall=${(System.nanoTime - t0) / 1e9}%5.2f s " +
        "(single pair vs 2M-node store)")
    }
    spark.stop()
  }

  /** IncrementalScd2 long-run probe: the sf0.1 Maxwell changelog (~600 k
    * typed CDC rows) split into `batches` contiguous ts ranges (the
    * per-key cross-batch order the CDC contract requires), folded into
    * the persistent versioned-interval store vs a batch scd2History
    * recompute over the concatenated prefix at each horizon. Claims under
    * test: the fold's wall is bounded by O(batch + touched open versions)
    * — NOT by the growing changelog — while the recompute's wall tracks
    * the history it re-reads; and live store rows track total versions
    * (closed versions are immutable, written once).
    *
    * Usage: runMain graft.tools.ScaleProbe scd2fold [batches] [storeRoot] */
  def scd2foldProbe(batches: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    val dir = "/root/testdata/sf0.1"
    val src = graft.ops.Project.etlFilter(
        graft.model.Envelopes.maxwell(spark, dir))
      .select(element_at(col("data"), "order_id").cast("long").as("order_id"),
        element_at(col("data"), "id").cast("long").as("id"),
        col("type").as("typ"),
        element_at(col("data"), "sku_num").as("sku_num"),
        element_at(col("data"), "payment_status").as("pay_st"),
        col("ts"))
      .localCheckpoint(true)
    val tss = src.select(col("ts")).distinct().orderBy(col("ts"))
      .collect().map(_.getLong(0))
    val cuts = (1 until batches).map(i => tss((i.toLong * tss.length / batches).toInt))
    println(s"SCD2FOLD rows=${src.count()} distinctTs=${tss.length} batches=$batches")
    val ord = Seq("ts", "id", "sku_num", "pay_st", "typ")
    for (i <- 0 until batches) {
      val lo = if (i == 0) Long.MinValue else cuts(i - 1)
      val hi = if (i == batches - 1) Long.MaxValue else cuts(i)
      val b = src.filter(col("ts") >= lo && col("ts") < hi)
      val t0 = System.nanoTime()
      val n = graft.streaming.IncrementalScd2.mergeBatch(b, s"$storeRoot/h",
        Seq("order_id"), ord, Seq("sku_num", "pay_st"), i.toLong).count()
      val foldW = (System.nanoTime - t0) / 1e9
      val t1 = System.nanoTime()
      val nb = graft.ops.Stateful.scd2History(src.filter(col("ts") < hi),
        Seq(col("order_id")), ord.map(col), col("ts"),
        Seq(col("sku_num"), col("pay_st")), Seq("sku_num", "pay_st"),
        col("typ")).count()
      val batchW = (System.nanoTime - t1) / 1e9
      println(f"SCD2FOLD fold=$i%2d versions=$n fold=$foldW%5.1f s " +
        f"recompute($nb versions)=$batchW%5.1f s")
    }
    // sparse-delta phase: a single-key update against the full store —
    // the touched-key seed pruning means the fold's scd2 input is one
    // seed + one row, not the key table; cost must not track the corpus
    import spark.implicits._
    for (i <- 0 until 5) {
      val p = Seq((1L, 999000L + i, "update", s"sparse$i", "1601",
          4102444800L + i))
        .toDF("order_id", "id", "typ", "sku_num", "pay_st", "ts")
      val t0 = System.nanoTime()
      graft.streaming.IncrementalScd2.mergeBatch(p, s"$storeRoot/h",
        Seq("order_id"), ord, Seq("sku_num", "pay_st"), (batches + i).toLong)
        .count()
      println(f"SCD2FOLD sparse=$i wall=${(System.nanoTime - t0) / 1e9}%5.2f s (single-key update)")
    }
    spark.stop()
  }

  /** IncrementalTopK long-run probe: fold `batches` micro-batches of the
    * sf0.1 token stream into one persistent MG summary and report the
    * per-fold wall over time plus the store's live row count — the claims
    * under test are O(k) state at any history length and flat fold cost. */
  def topkProbe(batches: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = s"$storeRoot/mg"
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .localCheckpoint(true)
    val k = 16
    for (i <- 0 until batches) {
      val batch = docs.filter(col("doc_id") % batches === i)
        .select(explode(graft.ext.TextStats.toks(col("text"))).as("item"))
      val t0 = System.nanoTime()
      val out = graft.streaming.IncrementalTopK.mergeBatch(batch, store,
        col("item"), k, i.toLong)
      val rows = out.count()
      if (i < 3 || (i + 1) % 5 == 0 || i == batches - 1)
        println(f"TOPKPROBE fold=$i%3d wall=${(System.nanoTime - t0) / 1e9}%6.2f s " +
          f"summaryRows=$rows")
    }
    val live = graft.streaming.KeyedStore.read(spark, store).get
    println(s"TOPKPROBE store live rows=${live.filter(col("op_type") =!= "delete").count()} " +
      s"(all rows=${live.count()}) after $batches folds, k=$k")
    spark.stop()
  }

  /** PQ/ADC probe: index-build (train + encode) wall, then ADC top-10 vs
    * brute-force float top-10 over the sf0.1 embeddings replicated in
    * memory to `copies`× — the claims under test are (a) the ADC scan
    * reads 16 B/vector codes where brute force reads 256 B float vectors
    * (width, the 100 TB lever) and (b) both scans scale linearly while the
    * one-time index build amortizes across queries.
    *
    * Usage: runMain graft.tools.ScaleProbe pq [copies] */
  def pqProbe(copies: Int): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def corpus(n: Int) = (0 until n).map(c => base.withColumn("vec_id",
        col("vec_id") + lit(c.toLong * KeyShift)))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val queries = base.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .localCheckpoint(true)
    for (n <- Seq(1, copies)) {
      val e = corpus(n)
      val nv = e.count()
      val t0 = System.nanoTime()
      val books = graft.ext.Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
      val codes = graft.ext.Similarity.pqEncode(e, books, m = 4)
        .localCheckpoint(true)
      val buildW = (System.nanoTime - t0) / 1e9
      val t1 = System.nanoTime()
      graft.ext.Similarity.pqTopK(queries, books, codes, m = 4, topK = 10)
        .count()
      val adcW = (System.nanoTime - t1) / 1e9
      val t2 = System.nanoTime()
      graft.ext.Similarity.bruteForceTopK(
        queries.select(col("query_id").as("vec_id"), col("embedding")),
        e, 10).count()
      val bfW = (System.nanoTime - t2) / 1e9
      println(f"PQPROBE ${n}x vectors=$nv build=$buildW%6.2f s " +
        f"adcTop10=$adcW%6.2f s bruteForceTop10=$bfW%6.2f s " +
        f"codeBytes=${nv * 16} floatBytes=${nv * 256}")
      graft.util.Blocks.freeCheckpoint(books)
      graft.util.Blocks.freeCheckpoint(codes)
      graft.util.Blocks.freeCheckpoint(e)
    }
    spark.stop()
  }

  /** Triangle probe: wedge fan-out of the oriented plan vs the naive
    * apex-unconstrained wedge join, on (a) the document near-dup pair
    * graph replicated `copies`× and (b) an adversarial star — the oriented
    * bound Σ outdeg² is the operator's skew claim. Wedge counts are exact
    * aggregates (no join executed for the naive number); the oriented
    * count is also timed end to end through triangleCounts.
    *
    * Usage: runMain graft.tools.ScaleProbe triangles [copies] [outDir] */
  def triangleProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!corpusReady(outDir, copies, probeFile = "documents.parquet")) {
      replicate(spark, "/root/testdata/sf0.1", outDir, copies)
      markCorpus(outDir, copies)
    }
    for ((dir, label) <- Seq(("/root/testdata/sf0.1", "1x"),
        (outDir, s"${math.max(2, copies / 2)}x"))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sh = graft.ext.Dedup.shingles(docs, col("doc_id"), col("text"))
        .localCheckpoint(true)
      val pairs = graft.ext.Dedup.ngramJaccardPairs(sh, 1, 2)
        .select(col("a_id").as("a"), col("b_id").as("b"))
        .localCheckpoint(true)
      val und = pairs.select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
      val deg = und.select(col("u").as("node"))
        .union(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val naive = deg.agg(sum(expr("d * (d - 1) div 2"))).head().getLong(0)
      // oriented out-degrees: per edge, the lower-(deg, node) endpoint
      val j = und
        .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      val apex = j.select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("node"))
        .groupBy("node").agg(count(lit(1)).as("od"))
      val oriented = apex.agg(sum(expr("od * (od - 1) div 2")))
        .head().getLong(0)
      val t0 = System.nanoTime()
      val tri = graft.ops.Graph.triangleCounts(pairs)
      val total = tri.agg(sum(col("tri_ct"))).head().getLong(0) / 3
      val w = (System.nanoTime - t0) / 1e9
      println(f"TRIPROBE $label%-4s edges=${und.count()} " +
        f"naiveWedges=$naive orientedWedges=$oriented triangles=$total " +
        f"wall=$w%6.2f s")
      Seq(sh, pairs, und, tri).foreach(graft.util.Blocks.freeCheckpoint)
    }
    // adversarial skew: one 100k-degree hub + a sparse ring of triangles.
    // The naive apex-unconstrained wedge join materializes the hub's
    // C(100k, 2) ≈ 5·10⁹ wedges (unrunnable here — reported as the exact
    // aggregate, not executed); the oriented plan gives the hub out-degree
    // ~0 and still counts every ring triangle, timed end to end.
    {
      val hub = spark.range(1, 100001).select(lit(0L).as("a"), col("id").as("b"))
      val ring = spark.range(0, 30000).selectExpr(
        "200000 + id * 3 as a", "200000 + id * 3 + 1 as b")
        .union(spark.range(0, 30000).selectExpr(
          "200000 + id * 3 + 1 as a", "200000 + id * 3 + 2 as b"))
        .union(spark.range(0, 30000).selectExpr(
          "200000 + id * 3 as a", "200000 + id * 3 + 2 as b"))
      val edges = hub.union(ring)
      val deg = edges.select(col("a").as("node"))
        .union(edges.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val naive = deg.agg(sum(expr("d * (d - 1) div 2"))).head().getLong(0)
      val t0 = System.nanoTime()
      val tri = graft.ops.Graph.triangleCounts(edges)
      val total = tri.agg(sum(col("tri_ct"))).head().getLong(0) / 3
      println(f"TRIPROBE skew edges=${100000 + 90000} naiveWedges=$naive " +
        f"triangles=$total orientedWall=${(System.nanoTime - t0) / 1e9}%6.2f s")
      graft.util.Blocks.freeCheckpoint(tri)
    }
    spark.stop()
  }

  /** IncrementalSimhash long-run probe: fold `batches` document batches
    * into one fingerprint store and report per-fold wall, stored rows,
    * and the WIDEST (band, bval) bucket — the metric behind the
    * scaladoc's saturation note (32-bit fp at 4 bands = 256 values per
    * band; bucket width, and with it verify-join cost, grows with the
    * accepted corpus — watch it, then widen the fingerprint).
    *
    * Usage: runMain graft.tools.ScaleProbe simhash [batches] [storeRoot] */
  def simhashProbe(batches: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    val store = s"$storeRoot/sh"
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    for (i <- 0 until batches) {
      val b = docs.filter(col("doc_id") % batches === i)
      val t0 = System.nanoTime()
      val acc = graft.streaming.IncrementalSimhash.dedupBatch(
        b, store, col("doc_id"), col("text"), i.toLong)
      val nAcc = acc.count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.util.Blocks.freeCheckpoint(acc)
      if (i < 3 || i == batches - 1) {
        val live = graft.streaming.KeyedStore.read(spark, store).get
        val widest = live.groupBy("band", "bval").count()
          .agg(max(col("count"))).head().getLong(0)
        println(f"SHPROBE fold=$i%2d accepted=$nAcc wall=$wall%5.2f s " +
          f"storeRows=${live.count()} widestBucket=$widest")
      } else println(f"SHPROBE fold=$i%2d accepted=$nAcc wall=$wall%5.2f s")
    }
    spark.stop()
  }

  /** Long-run fold probe for the three newest persistent sketches —
    * IncrementalCms (bin-wise add), IncrementalHll (register max), and
    * IncrementalCentroid (integer sums) — `batches` folds each over the
    * sf0.1 sources, reporting per-fold wall and live state rows. The
    * claims under test: flat fold cost at any history length, and state
    * bounded by (d·w)/2^p/labels·dim rather than rows ever folded.
    *
    * Usage: runMain graft.tools.ScaleProbe sketchfold [batches] [root] */
  def sketchFoldProbe(batches: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    val l = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .localCheckpoint(true)
    val o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .localCheckpoint(true)
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .localCheckpoint(true)
    def report(tag: String, i: Int, wall: Double, path: String): Unit =
      if (i < 2 || (i + 1) % 10 == 0 || i == batches - 1) {
        val rows = graft.streaming.KeyedStore.read(spark, path).get
          .filter(col("op_type") =!= "delete").count()
        println(f"SKFOLD $tag%-8s fold=$i%3d wall=$wall%5.2f s liveRows=$rows")
      }
    for (i <- 0 until batches) {
      val t0 = System.nanoTime()
      val c = graft.streaming.IncrementalCms.mergeBatch(
        l.filter(col("l_orderkey") % batches === i), s"$storeRoot/cms",
        col("l_returnflag"), col("l_partkey"), i.toLong)
      c.count(); graft.util.Blocks.freeCheckpoint(c)
      report("cms", i, (System.nanoTime - t0) / 1e9, s"$storeRoot/cms")
      val t1 = System.nanoTime()
      val h = graft.streaming.IncrementalHll.mergeBatch(
        o.filter(col("o_orderkey") % batches === i), s"$storeRoot/hll",
        col("o_orderstatus"), col("o_custkey"), batchId = i.toLong)
      h.count(); graft.util.Blocks.freeCheckpoint(h)
      report("hll", i, (System.nanoTime - t1) / 1e9, s"$storeRoot/hll")
      val t2 = System.nanoTime()
      val ce = graft.streaming.IncrementalCentroid.mergeBatch(
        emb.filter(col("vec_id") % batches === i), s"$storeRoot/cent",
        col("label"), col("embedding"), i.toLong)
      ce.count(); graft.util.Blocks.freeCheckpoint(ce)
      report("centroid", i, (System.nanoTime - t2) / 1e9, s"$storeRoot/cent")
    }
    spark.stop()
  }

  /** Long-run fold walls for the two RETRIEVAL INDEX stores: the IVFADC
    * code/stats pair (fold must stay O(batch) while the code store grows
    * linearly) and the document-frequency index (fold wall rides the
    * BATCH vocabulary; state rides the Heaps-law corpus vocabulary).
    * Search/scoring walls at the end price the read path at full size. */
  /** Recluster-rebuild scaling probe (round 14, VERDICT r13 item 5): an
    * N× embedding corpus, one-fold index build, an 80 % CDC delete, then
    * the [[graft.streaming.IncrementalIvf.reclusterRebuild]] maintenance
    * pass. The rebuild is one deterministic Lloyd run (3 iterations, each
    * a posexplode centroid sum + a broadcast-centroid argmax — linear
    * scans, no pairwise work) plus one index fold, so wall must track N
    * linearly with zero spill; the drift gauge read is one ids-store scan.
    *
    * Usage: runMain graft.tools.ScaleProbe recluster [copies] [outDir] */
  def reclusterProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(outDir))
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val emb = (0 until copies)
      .map(c => base.withColumn("vec_id", col("vec_id") + lit(c * KeyShift)))
      .reduce(_ unionByName _).repartition(32).localCheckpoint(true)
    val n = emb.count()
    // frozen books: trained once on the base corpus (the production
    // posture — a recluster never retrains the PQ layer)
    val books = graft.ext.Similarity.pqCodebooks(base, m = 4, k = 16,
      iters = 2)
    var t = System.nanoTime()
    graft.streaming.IncrementalIvf.mergeBatch(emb, s"$outDir/ix", books,
      batchId = 0L).count()
    val build = (System.nanoTime - t) / 1e9
    t = System.nanoTime()
    graft.streaming.IncrementalIvf.deleteBatch(
      emb.filter(col("vec_id") % 5 =!= 0), s"$outDir/ix", books,
      batchId = 1L).count()
    val del = (System.nanoTime - t) / 1e9
    t = System.nanoTime()
    val needs = graft.streaming.IncrementalIvf.needsRecluster(
      spark, s"$outDir/ix")
    val gauge = (System.nanoTime - t) / 1e9
    val surv = emb.filter(col("vec_id") % 5 === 0)
    t = System.nanoTime()
    val dir = graft.streaming.IncrementalIvf.reclusterRebuild(
      surv, s"$outDir/ix2", books, k = 8, iters = 3)
    val cnt = dir.agg(sum(col("n_vecs"))).head().getLong(0)
    val rw = (System.nanoTime - t) / 1e9
    println(f"RECLUSTER copies=$copies%d vecs=$n%d build=$build%.2f s " +
      f"delete=$del%.2f s gauge=$gauge%.2f s (needs=$needs) " +
      f"rebuild=$rw%.2f s survivors=$cnt%d")
    graft.util.Blocks.freeCheckpoint(emb)
    spark.stop()
  }

  def indexFoldProbe(batches: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .localCheckpoint(true)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .localCheckpoint(true)
    val books = graft.ext.Similarity.pqCodebooks(emb, m = 4, k = 16, iters = 2)
    def live(path: String): Long =
      graft.streaming.KeyedStore.read(spark, path)
        .map(_.filter(col("op_type") =!= "delete").count()).getOrElse(0L)
    for (i <- 0 until batches) {
      val t0 = System.nanoTime()
      val d = graft.streaming.IncrementalIvf.mergeBatch(
        emb.filter(col("vec_id") % batches === i), s"$storeRoot/ivf", books,
        batchId = i.toLong)
      d.count(); graft.util.Blocks.freeCheckpoint(d)
      val w0 = (System.nanoTime - t0) / 1e9
      val t1 = System.nanoTime()
      val st = graft.streaming.IncrementalDf.mergeBatch(
        docs.filter(col("doc_id") % batches === i), s"$storeRoot/df",
        col("doc_id"), col("text"), batchId = i.toLong)
      st.count(); graft.util.Blocks.freeCheckpoint(st)
      val w1 = (System.nanoTime - t1) / 1e9
      if (i < 2 || (i + 1) % 5 == 0 || i == batches - 1)
        println(f"IXFOLD fold=$i%3d ivf=$w0%5.2f s df=$w1%5.2f s " +
          f"codeRows=${live(s"$storeRoot/ivf/codes")}%d " +
          f"statRows=${live(s"$storeRoot/ivf/stats")}%d " +
          f"dfRows=${live(s"$storeRoot/df")}%d")
    }
    val qs = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val t2 = System.nanoTime()
    val hits = graft.streaming.IncrementalIvf.search(spark, s"$storeRoot/ivf",
      qs, books, m = 4, topK = 5, nProbe = 2).count()
    println(f"IXFOLD search wall=${(System.nanoTime - t2) / 1e9}%5.2f s rows=$hits%d")
    val t3 = System.nanoTime()
    val top = graft.streaming.IncrementalDf.bm25Store(spark, s"$storeRoot/df",
      docs, col("doc_id"), col("text"), Seq("spark", "window"), topK = 20).count()
    println(f"IXFOLD bm25 wall=${(System.nanoTime - t3) / 1e9}%5.2f s rows=$top%d")
    spark.stop()
  }

  /** Chunk-store fold/erase flatness probe (round 15): fold N vocabulary-
    * grown corpus copies into the refcounted chunk store — each fold is
    * batch-sized (one copy of the sf0.1 doc table) while the store grows
    * ~N× — then erase a %7 slice of copy 0 at FULL store size. The fold
    * wall must stay FLAT as the store grows (the bucket-pruned probe is
    * O(batch) file IO, and the reference upsert touches only the batch's
    * buckets), and the erase at max size must read delta-class, not
    * scan-class.
    *
    * Usage: runMain graft.tools.ScaleProbe chunkfold [copies] [storeRoot] */
  def chunkfoldProbe(copies: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    val srcDir = "/root/testdata/sf0.1"
    def live(): Long = graft.streaming.KeyedStore.read(spark, s"$storeRoot/ch")
      .map(_.filter(col("op_type") =!= "delete").count()).getOrElse(0L)
    for (c <- 0 until copies) {
      val batch = replicatedDocs(spark, srcDir, c).localCheckpoint(true)
      val t0 = System.nanoTime()
      val out = graft.streaming.IncrementalChunkDedup.dedupBatch(
        batch, s"$storeRoot/ch", col("doc_id"), col("text"), c.toLong)
      val stored = out.filter(col("stored") === 1).count()
      val w = (System.nanoTime - t0) / 1e9
      graft.util.Blocks.freeCheckpoint(out)
      if (c < 3 || (c + 1) % 5 == 0 || c == copies - 1)
        println(f"CHUNKFOLD fold=$c%3d wall=$w%5.2f s stored=$stored%d " +
          f"live=${live()}%d")
      graft.util.Blocks.freeCheckpoint(batch)
    }
    val del = replicatedDocs(spark, srcDir, 0)
      .filter(col("doc_id") % 7 === 0).localCheckpoint(true)
    val t1 = System.nanoTime()
    val dropped = graft.streaming.IncrementalChunkDedup.deleteBatch(
      del, s"$storeRoot/ch", col("doc_id"), col("text"), copies.toLong)
    println(f"CHUNKFOLD erase wall=${(System.nanoTime - t1) / 1e9}%5.2f s " +
      f"reclaimed=$dropped%d live=${live()}%d")
    graft.util.Blocks.freeCheckpoint(del)
    spark.stop()
  }

  /** IncrementalTriangles sparse-fold flatness probe: single-edge add and
    * delete folds against a SMALL (30 k-edge) and a LARGE (1 M-edge, 64
    * buckets) adjacency store. The round-9 endpoint-bucketed layout reads
    * only the batch endpoints' buckets, so the sparse wall must NOT track
    * the graph — the previous layout re-scanned the whole edge table per
    * fold. Folds are timed to the merge commit (the returned count table
    * is a lazy read — the caller's cost, not the fold's).
    *
    * Usage: runMain graft.tools.ScaleProbe trifold [storeRoot] */
  def trifoldProbe(storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    import spark.implicits._
    def ring(n: Long, base: Long) = spark.range(n)
      .select((col("id") + base).as("a"),
        (((col("id") + 1) % n) + base).as("b"))
    for ((n, label, root) <- Seq(
        (30000L, "30k", s"$storeRoot/small"),
        (1000000L, "1M", s"$storeRoot/big"))) {
      val t0 = System.nanoTime()
      graft.streaming.IncrementalTriangles.mergeEdges(
        ring(n, 0L), root, 0L, numBuckets = 64)
      println(f"TRIFOLD $label bootstrap(${n} edges)=${(System.nanoTime - t0) / 1e9}%5.1f s")
      for (i <- 1 to 3) {
        // close one triangle per fold: edge (3i, 3i+2) over ring edges;
        // batch ids stay monotone across the add/delete interleave
        val t1 = System.nanoTime()
        graft.streaming.IncrementalTriangles.mergeEdges(
          Seq((3L * i, 3L * i + 2)).toDF("a", "b"), root, 2L * i - 1,
          numBuckets = 64)
        val wAdd = (System.nanoTime - t1) / 1e9
        val t2 = System.nanoTime()
        graft.streaming.IncrementalTriangles.deleteEdges(
          Seq((3L * i, 3L * i + 2)).toDF("a", "b"), root, 2L * i,
          numBuckets = 64)
        val wDel = (System.nanoTime - t2) / 1e9
        println(f"TRIFOLD $label sparse=$i add=$wAdd%5.2f s del=$wDel%5.2f s (1 edge)")
      }
    }
    spark.stop()
  }

  /** CEP automaton scale probe: the keyed fold at 1× vs N× events, users
    * REPLICATED (the way an event corpus actually grows — more keys, the
    * same per-key history). The claims under test: wall scales with the
    * DATA (one scan + one key shuffle + row-local folds — no cross-key
    * anything), per-key state stays busiest-key-bounded at any corpus
    * size, and the relaxed form's pushed type pre-filter pays (the strict
    * form must scan every event — its wall carries the full corpus).
    *
    * Usage: runMain graft.tools.ScaleProbe cep [copies] */
  /** IncrementalCep grown-store probe — the house standard every
    * corpus-growing KeyedStore meets (ccfold/trifold/ivf precedents): a
    * FIXED-SIZE batch's fold wall must track the BATCH, not the stored
    * key population, because state reads are bucket-pruned by the batch's
    * keys. Grows the stored population in doubling steps (one open
    * partial per key) and times the same 2 k-key completing fold at each
    * size. */
  def cepfoldProbe(steps: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(outDir))
    val store = s"$outDir/cep"
    val pat = Seq(("view", 1, 1), ("click", 1, 1), ("purchase", 1, 1))
    val w = 1000000000L // no timeouts — growth is the only variable
    var batchId = 0L
    var clock = 0L
    def fold(df: org.apache.spark.sql.DataFrame): Double = {
      batchId += 1
      val t0 = System.nanoTime()
      val m = graft.streaming.IncrementalCep.foldBatch(df, store, pat, w,
        batchId)
      m.count()
      graft.util.Blocks.freeCheckpoint(m)
      (System.nanoTime - t0) / 1e9
    }
    // probe keys 0..1999 live forever; population keys start at 100k
    var pop = 16000L
    var nextKey = 100000L
    // seed: probe keys + first population slab, one open view each
    def views(from: Long, until: Long): org.apache.spark.sql.DataFrame = {
      clock += 1
      spark.range(from, until).select(col("id").as("k"),
        (lit(clock * 1000000L) + col("id") % 997).as("tms"),
        col("id").as("oid"), lit("view").as("ty"))
    }
    fold(views(0L, 2000L).unionByName(views(nextKey, nextKey + pop)))
    nextKey += pop
    for (s <- 0 until steps) {
      // the measured fold: the SAME 2k keys complete (click+purchase)
      // and re-open — batch-sized work against an ever-larger store
      clock += 1
      val c = spark.range(0L, 2000L).select(col("id").as("k"),
        (lit(clock * 1000000L) + col("id") % 997).as("tms"),
        col("id").as("oid"), lit("click").as("ty"))
      clock += 1
      val p = spark.range(0L, 2000L).select(col("id").as("k"),
        (lit(clock * 1000000L) + col("id") % 997).as("tms"),
        (col("id") + 2000L).as("oid"), lit("purchase").as("ty"))
      clock += 1
      val v = spark.range(0L, 2000L).select(col("id").as("k"),
        (lit(clock * 1000000L) + col("id") % 997).as("tms"),
        (col("id") + 4000L).as("oid"), lit("view").as("ty"))
      val wall = fold(c.unionByName(p).unionByName(v))
      val stored = graft.streaming.KeyedStore.read(spark, store).get.count()
      println(f"CEPFOLD step=$s storedRows=$stored%9d probeFoldWall=$wall%5.2f s")
      // grow: double the population with fresh open partials
      fold(views(nextKey, nextKey + pop))
      nextKey += pop
      pop *= 2
    }
    // EXPIRY IN THE LOOP (round 11): under a watermark past every open
    // partial's deadline the whole accumulated population is dead —
    // maintainExpire prunes it physically and the probe fold returns to
    // the empty-store wall. The watermark contract (no future event may
    // precede it) is honored by jumping the clock past it afterwards.
    val wmark = clock * 1000000L + 2L * w
    val t0 = System.nanoTime()
    val before = graft.streaming.KeyedStore.read(spark, store).get.count()
    val fired = graft.streaming.IncrementalCep.maintainExpire(spark, store,
      wmark, w, checkEvery = 1)
    val we = (System.nanoTime - t0) / 1e9
    val after = graft.streaming.KeyedStore.read(spark, store).get.count()
    println(f"CEPFOLD expire fired=$fired wall=$we%5.2f s " +
      f"storedRows $before%9d -> $after%9d")
    clock = wmark / 1000000L + 1
    // post-expiry fold: the probe keys run one full v→c→p cycle — the
    // wall to compare against the steady-state line above
    val cyc = Seq("view", "click", "purchase").zipWithIndex.map { case (t, i) =>
      clock += 1
      spark.range(0L, 2000L).select(col("id").as("k"),
        (lit(clock * 1000000L) + col("id") % 997).as("tms"),
        (col("id") + i * 2000L).as("oid"), lit(t).as("ty"))
    }.reduce(_ unionByName _)
    val wPost = fold(cyc)
    println(f"CEPFOLD postExpireFoldWall=$wPost%5.2f s " +
      f"storedRows=${graft.streaming.KeyedStore.read(spark, store).get.count()}%9d")
    spark.stop()
  }

  /** HOT-KEY probe (round-11 item 2): one CELEBRITY key carrying the
    * corpus's pattern events, against a fixed 64-events/key background.
    *
    * The collect_list+aggregate fold (reached via a string key) is not
    * just a memory pin on such a key — it is QUADRATIC IN COPY WORK:
    * Catalyst's ArrayAggregate copies the accumulator struct per element,
    * and the accumulator CONTAINS the grown `ms` match array, so a hot
    * key costs O(events × matches) GenericArrayData copies (observed
    * live: one task, 11 CPU-minutes into a 2 M-event fold and climbing —
    * the probe therefore measures the fold only at 100 k/400 k, where the
    * quadratic slope is already unambiguous). The SORTED-ITERATOR plan
    * (the routed path for long keys) streams the same automaton over the
    * sorted group — flat per-row cost, measured through 10 M events on
    * the one key. Equal match counts at the shared sizes pin the routing
    * as semantics-free. */
  def cephotProbe(keys: Int): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vcp = Seq("view", "click", "purchase")
    def mix(idCol: org.apache.spark.sql.Column) =
      element_at(array(vcp.map(lit): _*),
        (pmod(hash(idCol), lit(3)) + 1).cast("int"))
    val w = 1000000000L
    def corpus(hot: Long) = {
      val hotDf = spark.range(hot).select(lit(0L).as("k"),
        col("id").as("tms"), col("id").as("oid"), mix(col("id")).as("ty"))
      val bg = spark.range(keys * 64L).select(
        (pmod(col("id"), lit(keys)) + 1).cast("long").as("k"),
        (col("id") / keys).cast("long").as("tms"),
        (col("id") + hot).as("oid"), mix(col("id") + hot).as("ty"))
      hotDf.unionByName(bg).localCheckpoint(true)
    }
    def sorted(df: DataFrame) = graft.ops.Cep.patternMatches(df, col("k"),
      col("tms"), col("oid"), col("ty"), vcp, w).count()
    // double key → the aggregate-fold plan (same automaton, array state;
    // string keys route to the typed plan since round 12)
    def folded(df: DataFrame) = graft.ops.Cep.patternMatches(df,
      col("k").cast("double"), col("tms"), col("oid"), col("ty"), vcp,
      w).count()
    for (hot <- Seq(100000L, 400000L)) {
      val df = corpus(hot)
      for (rep <- 0 until 2) {
        val t0 = System.nanoTime()
        val mS = sorted(df)
        val wS = (System.nanoTime - t0) / 1e9
        val t1 = System.nanoTime()
        val mF = folded(df)
        val wF = (System.nanoTime - t1) / 1e9
        assert(mS == mF, s"routing changed semantics: $mS vs $mF")
        println(f"CEPHOT hot=$hot%9d rep=$rep sorted=$wS%7.2f s " +
          f"fold=$wF%7.2f s matches=$mS")
      }
      graft.util.Blocks.freeCheckpoint(df)
    }
    // the sorted plan alone through 2 M and 10 M — the fold is already
    // out of the running (quadratic above); flat per-row wall is the claim
    for (hot <- Seq(2000000L, 10000000L)) {
      val df = corpus(hot)
      for (rep <- 0 until 2) {
        val t0 = System.nanoTime()
        val mS = sorted(df)
        val wS = (System.nanoTime - t0) / 1e9
        println(f"CEPHOT hot=$hot%9d rep=$rep sorted=$wS%7.2f s " +
          f"(fold not run — quadratic) matches=$mS")
      }
      graft.util.Blocks.freeCheckpoint(df)
    }
    spark.stop()
  }

  /** SKIP-TO-NEXT hot-key probe (round-12 VERDICT item 1): the routed
    * run-set stepper vs the static-unroll fold while ONE key's event
    * count grows. The unroll is O(starts × stages × events) over a
    * collect_list array — the celebrity-key class — so it is only run at
    * small hot sizes; the stepper is O(events × live runs) with the run
    * set bounded by the WINDOW (tms advances 1/event, window 3000 → ≤
    * ~1000 in-window stage-0 events), the realistic overlap shape. The
    * claim under test: the routed plan's per-row wall stays FLAT to 10 M
    * one-key events. */
  def skipnexthotProbe(keys: Int): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vcp = Seq("view", "click", "purchase")
    def mix(idCol: org.apache.spark.sql.Column) =
      element_at(array(vcp.map(lit): _*),
        (pmod(hash(idCol), lit(3)) + 1).cast("int"))
    val w = 3000L
    def corpus(hot: Long) = {
      val hotDf = spark.range(hot).select(lit(0L).as("k"),
        col("id").as("tms"), col("id").as("oid"), mix(col("id")).as("ty"))
      val bg = spark.range(keys * 64L).select(
        (pmod(col("id"), lit(keys)) + 1).cast("long").as("k"),
        (col("id") / keys).cast("long").as("tms"),
        (col("id") + hot).as("oid"), mix(col("id") + hot).as("ty"))
      hotDf.unionByName(bg).localCheckpoint(true)
    }
    def stepped(df: DataFrame) = graft.ops.Cep.patternMatchesSkipNext(df,
      col("k"), col("tms"), col("oid"), col("ty"), vcp, w).count()
    // double key → the static-unroll fold (no typed route)
    def unrolled(df: DataFrame) = graft.ops.Cep.patternMatchesSkipNext(df,
      col("k").cast("double"), col("tms"), col("oid"), col("ty"), vcp,
      w).count()
    for (hot <- Seq(20000L, 40000L)) {
      val df = corpus(hot)
      // the unroll's quadratic term makes reps expensive — one warm-up
      // rep at the smallest size only, then single timed readings
      for (rep <- 0 until 2 if rep == 1 || hot == 20000L) {
        val t0 = System.nanoTime()
        val mS = stepped(df)
        val wS = (System.nanoTime - t0) / 1e9
        val t1 = System.nanoTime()
        val mF = unrolled(df)
        val wF = (System.nanoTime - t1) / 1e9
        assert(mS == mF, s"routing changed semantics: $mS vs $mF")
        println(f"SKIPNEXTHOT hot=$hot%9d rep=$rep stepper=$wS%7.2f s " +
          f"unroll=$wF%7.2f s matches=$mS")
      }
      graft.util.Blocks.freeCheckpoint(df)
    }
    // the stepper alone through 2 M and 10 M — the unroll is out of the
    // running (quadratic); flat per-row wall is the claim
    for (hot <- Seq(2000000L, 10000000L)) {
      val df = corpus(hot)
      for (rep <- 0 until 2) {
        val t0 = System.nanoTime()
        val mS = stepped(df)
        val wS = (System.nanoTime - t0) / 1e9
        println(f"SKIPNEXTHOT hot=$hot%9d rep=$rep stepper=$wS%7.2f s " +
          f"(unroll not run — quadratic) matches=$mS")
      }
      graft.util.Blocks.freeCheckpoint(df)
    }
    spark.stop()
  }

  /** Post-compact fold-wall probe (round-10 VERDICT item 4): what does a
    * fold cost immediately after `KeyedStore.maintain` fires on the CC
    * member index? Builds a merge-heavy chain (every fold relabels the
    * whole growing cluster — the tombstone-heaviest shape), times the
    * steady fold wall, runs maintain(checkEvery = 1) explicitly, and
    * times the same-shape fold again. */
  def maintfoldProbe(chain: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val store = s"$outDir/cc"
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(outDir))
    def fold(p: (Long, Long)): Double = {
      val t0 = System.nanoTime()
      // autoMaintain OFF: this probe owns the compaction points
      graft.streaming.IncrementalCc.mergePairs(
        Seq(p).toDF("a_id", "b_id"), store, autoMaintain = false).count()
      (System.nanoTime - t0) / 1e9
    }
    val walls = (0 until chain).map { i => fold((1000000L - i - 1, 1000000L - i)) }
    val mp = store + "__members"
    def tombs() = graft.streaming.KeyedStore.read(spark, mp).get
      .groupBy(col("op_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = tombs()
    println(f"MAINTFOLD chain=$chain last-3 fold walls " +
      f"pre=${walls.takeRight(3).map(w => f"$w%.2f").mkString("/")} s " +
      s"member rows pre-compact: $before")
    val t0 = System.nanoTime()
    val fired = graft.streaming.KeyedStore.maintain(spark, mp, checkEvery = 1)
    val wM = (System.nanoTime - t0) / 1e9
    val after = tombs()
    // the fold RIGHT AFTER compaction (fresh generation, pin re-read) and
    // two more for the steady reading
    val post = (0 until 3).map { i =>
      fold((1000000L - chain - i - 1, 1000000L - chain - i)) }
    println(f"MAINTFOLD maintain fired=$fired wall=$wM%.2f s rows post: $after; " +
      f"post-compact fold walls=${post.map(w => f"$w%.2f").mkString("/")} s")
    spark.stop()
  }

  /** ONE-TENANCY probe (round-10 VERDICT item 3): the flagship pipelines
    * CHAINED in one session over one replicated corpus — curate →
    * cross-batch dedup stores → cluster labels → retrieval index → ANN
    * index — at the 50–100× replicator scale, with peak shuffle/spill
    * measured per stage via a SparkListener. The composites are probed
    * individually elsewhere; this answers "do they fit as one tenancy":
    * does a stage's spill/shuffle footprint leak into the next, and what
    * does the whole chain cost end to end. */
  def tenancyProbe(copies: Int, outDir: String): Unit = {
    import java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleW = new AtomicLong; val spillMem = new AtomicLong
    val spillDisk = new AtomicLong; val peakStage = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        val w = m.shuffleWriteMetrics.bytesWritten
        shuffleW.addAndGet(w)
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
        peakStage.getAndUpdate(p => math.max(p, w))
      }
    })
    // corpus: documents AND embeddings at exactly copies× (shifted keys)
    if (!corpusReady(outDir, copies)) {
      val src = "/root/testdata/sf0.1"
      val parts = spark.sparkContext.defaultParallelism
      (0 until copies).map(replicatedDocs(spark, src, _))
        .reduce(_ union _).repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      val e = spark.read.parquet(s"$src/embeddings.parquet")
      (0 until copies).map(c => e.withColumn("vec_id",
          col("vec_id") + lit(c * KeyShift)))
        .reduce(_ union _).repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      markCorpus(outDir, copies)
    }
    val work = s"$outDir/tenancy_stores"
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(work))
    def gb(b: Long) = b / 1e9
    def stage[T](name: String)(f: => T): T = {
      val (s0, m0, d0, t0) =
        (shuffleW.get, spillMem.get, spillDisk.get, System.nanoTime())
      val r = f
      println(f"TENANCY $name%-16s wall=${(System.nanoTime - t0) / 1e9}%7.1f s " +
        f"shuffle=${gb(shuffleW.get - s0)}%7.2f GB spillMem=${gb(spillMem.get - m0)}%7.2f GB " +
        f"spillDisk=${gb(spillDisk.get - d0)}%6.2f GB")
      r
    }
    println(s"TENANCY copies=$copies outDir=$outDir (one session, chained)")
    val docs50 = spark.read.parquet(s"$outDir/documents.parquet")
    // A. CURATE: gopher quality screen; survivors carry their text forward
    val curated = stage("curate") {
      val g = graft.ext.TextStats.gopherFilter(docs50, col("doc_id"), col("text"))
      val kept = docs50.join(g.filter(col("pass")).select("doc_id"), "doc_id")
        .select(col("doc_id"), col("text")).localCheckpoint(true)
      println(s"  curated=${kept.count()} of ${docs50.count()}")
      kept
    }
    // B. DEDUP STORE: three IncrementalLsh ingest folds (cross-batch
    // near-dup rejection against the persistent band index)
    val accepted = stage("dedup-lsh") {
      val outs = (0 until 3).map { i =>
        graft.streaming.IncrementalLsh.dedupBatch(
          curated.filter(col("doc_id") % 3 === i), s"$work/lsh",
          col("doc_id"), col("text"), batchId = i.toLong)
      }
      // dedupBatch already returns (doc_id, text); pin the union, then
      // free the per-fold frames' internal checkpoints
      val acc = outs.reduce(_ unionByName _).localCheckpoint(true)
      outs.foreach(graft.util.Blocks.freeCheckpoint)
      println(s"  accepted=${acc.count()}")
      acc
    }
    // C. CLUSTER LABELS: the OTHER dedup composition over the same curate
    // output — keeper assignment via the persistent label store ((a+b) % 3
    // pair folds, the q_cc_stream composition). Runs on CURATED, not
    // accepted: stage B's ingest dedup leaves the accepted corpus pair-free
    // by construction (asserted below), so the label path reads the
    // pre-dedup corpus the way a batch clustering pass would.
    stage("cc-labels") {
      val shAcc = Dedup.shingles(accepted, col("doc_id"), col("text"))
      val residual = Dedup.minhashLshPairs(shAcc, 1, 2).count()
      assert(residual == 0,
        s"ingest dedup left $residual near-dup pairs in the accepted corpus")
      val sh = Dedup.shingles(curated, col("doc_id"), col("text"))
      val pairs = Dedup.minhashLshPairs(sh, 1, 2)
        .select(col("a_id"), col("b_id")).localCheckpoint(true)
      var labels: DataFrame = null
      for (i <- 0 until 3)
        labels = graft.streaming.IncrementalCc.mergePairs(
          pairs.filter((col("a_id") + col("b_id")) % 3 === i), s"$work/cc")
      println(s"  clustered=${labels.count()} (pairs=${pairs.count()})")
      graft.util.Blocks.freeCheckpoint(pairs)
    }
    // D. RETRIEVAL INDEX: three document-frequency folds + store-backed
    // BM25 scoring over the accepted corpus
    stage("bm25-index") {
      for (i <- 0 until 3)
        graft.streaming.IncrementalDf.mergeBatch(
          accepted.filter(col("doc_id") % 3 === i), s"$work/df",
          col("doc_id"), col("text"), batchId = i.toLong)
      val hits = graft.streaming.IncrementalDf.bm25Store(spark, s"$work/df",
        accepted, col("doc_id"), col("text"),
        terms = Seq("spark", "window"), topK = 20)
      println(s"  bm25 hits=${hits.count()}")
    }
    // E. ANN INDEX: frozen books from the 1× sample (production posture),
    // three IVFADC folds over the copies× embeddings, then a search pass
    stage("ivf-index") {
      val e1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val books = graft.ext.Similarity.pqCodebooks(e1, m = 4, k = 16,
        iters = 2).localCheckpoint(true)
      val eN = spark.read.parquet(s"$outDir/embeddings.parquet")
      for (i <- 0 until 3)
        graft.streaming.IncrementalIvf.mergeBatch(
          eN.filter(col("vec_id") % 3 === i), s"$work/ivf", books,
          batchId = i.toLong)
      val qs = e1.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val got = graft.streaming.IncrementalIvf.search(spark, s"$work/ivf",
        qs, books, m = 4, topK = 5, nProbe = 2)
      println(s"  ann results=${got.count()}")
      graft.util.Blocks.freeCheckpoint(books)
    }
    // the text corpus is out of scope for the warehouse stages below
    graft.util.Blocks.freeCheckpoint(accepted)
    graft.util.Blocks.freeCheckpoint(curated)
    // F. SCD2 HISTORY (round 11 — the warehouse-dimension stage): a
    // versioned dimension at copies×10k keys × 4 versions, folded in
    // three ts-cut batches through the persistent history store
    stage("scd2-history") {
      val nKeys = copies * 10000L
      val rows = spark.range(nKeys * 4).select(
          (col("id") % nKeys).as("order_id"), col("id").as("id"),
          when(col("id") < nKeys, "insert").otherwise("update").as("typ"),
          concat(lit("sku"), (col("id") / nKeys)).as("sku_num"),
          pmod(col("id") / nKeys, lit(3)).cast("string").as("pay_st"),
          ((col("id") / nKeys) * 1000L + 1L).as("ts"))
      val ord = Seq("ts", "id", "sku_num", "pay_st", "typ")
      var n = 0L
      for ((cond, i) <- Seq(col("ts") < 2000L,
          col("ts") >= 2000L && col("ts") < 3000L,
          col("ts") >= 3000L).zipWithIndex)
        n = graft.streaming.IncrementalScd2.mergeBatch(rows.filter(cond),
          s"$work/scd2", Seq("order_id"), ord, Seq("sku_num", "pay_st"),
          i.toLong).count()
      println(s"  scd2 versions=$n keys=$nKeys")
    }
    // G. CEP FOLDS (round 11 — the funnel stage): copies×4k keys × 12
    // pattern events per fold, three store-backed automaton folds with a
    // self-scheduled expiry tick on the last (cadence 1 here so the probe
    // exercises the prune; production uses the default 16)
    stage("cep-folds") {
      val nEvKeys = copies * 4000L
      val perFold = nEvKeys * 12
      val pat = Seq(("view", 1, 1), ("click", 1, 1), ("purchase", 1, 1))
      val tyc = array(lit("view"), lit("click"), lit("purchase"), lit("view"))
      var matches = 0L
      for (i <- 0 until 3) {
        val ev = spark.range(perFold).select(
          (col("id") % nEvKeys).as("k"),
          (lit(i * 1000000L) + (col("id") / nEvKeys) * 1000L).as("tms"),
          (col("id") + i * perFold).as("oid"),
          element_at(tyc, (pmod(col("id") / nEvKeys, lit(4)) + 1).cast("int"))
            .as("ty"))
        val m = graft.streaming.IncrementalCep.foldBatch(ev, s"$work/cep",
          pat, withinMs = 1000000000L, batchId = i + 1L)
        matches += m.count()
        graft.util.Blocks.freeCheckpoint(m)
      }
      val pruned = graft.streaming.IncrementalCep.maintainExpire(spark,
        s"$work/cep", watermarkMs = 3L * 1000000000L,
        withinMs = 1000000000L, checkEvery = 1)
      println(s"  cep matches=$matches keys=$nEvKeys expireFired=$pruned")
    }
    // H. CEP SKIP-TO-NEXT (round 12 — the overlap form): the one CEP
    // operator whose per-key cost model is the family's outlier (active
    // RUN SET, not a constant-size state row) over copies×4k keys × 36
    // events; window = 12 ticks so the run set is window-bounded — the
    // realistic overlap shape the routed stepper is built for
    stage("cep-skipnext") {
      val nEvKeys = copies * 4000L
      val rows = nEvKeys * 36
      val tyc = array(lit("view"), lit("click"), lit("purchase"), lit("view"))
      val ev = spark.range(rows).select(
        (col("id") % nEvKeys).as("k"),
        ((col("id") / nEvKeys) * 1000L).as("tms"),
        col("id").as("oid"),
        element_at(tyc, (pmod(col("id") / nEvKeys, lit(4)) + 1).cast("int"))
          .as("ty"))
      val m = graft.ops.Cep.patternMatchesSkipNext(ev, col("k"), col("tms"),
        col("oid"), col("ty"), Seq("view", "click", "purchase"),
        withinMs = 12000L).count()
      println(s"  skipnext matches=$m keys=$nEvKeys")
    }
    // I. CEP SKIP-TO + CONSECUTIVE STORE FOLDS (round 12 — the two new
    // primitives' store drives, the rewind-buffer / closed-flag state
    // shapes the other folds don't have): three time-cut folds each over
    // copies×4k keys × 12 events (consec's stream UNFILTERED — one
    // noise type in the rotation exercises the break rule)
    stage("cep-skipto-fold") {
      val nEvKeys = copies * 4000L
      val perFold = nEvKeys * 12
      val tyc = array(lit("view"), lit("click"), lit("purchase"), lit("view"))
      var matches = 0L
      for (i <- 0 until 3) {
        val ev = spark.range(perFold).select(
          (col("id") % nEvKeys).as("k"),
          (lit(i * 1000000L) + (col("id") / nEvKeys) * 1000L).as("tms"),
          (col("id") + i * perFold).as("oid"),
          element_at(tyc, (pmod(col("id") / nEvKeys, lit(4)) + 1).cast("int"))
            .as("ty"))
        val m = graft.streaming.IncrementalCep.foldBatchSkipTo(ev,
          s"$work/cepskipto", Seq("view", "click", "purchase"),
          withinMs = 1000000000L, batchId = i + 1L, skipToStage = 1)
        matches += m.count()
        graft.util.Blocks.freeCheckpoint(m)
      }
      println(s"  skipto-fold matches=$matches keys=$nEvKeys")
    }
    stage("cep-consec-fold") {
      val nEvKeys = copies * 4000L
      val perFold = nEvKeys * 12
      val tyc = array(lit("view"), lit("view"), lit("noise"),
        lit("view"), lit("view"), lit("purchase"))
      var matches = 0L
      for (i <- 0 until 3) {
        val ev = spark.range(perFold).select(
          (col("id") % nEvKeys).as("k"),
          (lit(i * 1000000L) + (col("id") / nEvKeys) * 1000L).as("tms"),
          (col("id") + i * perFold).as("oid"),
          element_at(tyc, (pmod(col("id") / nEvKeys, lit(6)) + 1).cast("int"))
            .as("ty"))
        val m = graft.streaming.IncrementalCep.foldBatchConsec(ev,
          s"$work/cepconsec",
          Seq(("view", 2, graft.ops.Cep.Unbounded), ("purchase", 1, 1)),
          withinMs = 1000000000L, batchId = i + 1L, consecutive = Set(0))
        matches += m.count()
        graft.util.Blocks.freeCheckpoint(m)
      }
      println(s"  consec-fold matches=$matches keys=$nEvKeys")
    }
    println(f"TENANCY total: shuffle=${gb(shuffleW.get)}%7.2f GB " +
      f"spillMem=${gb(spillMem.get)}%7.2f GB spillDisk=${gb(spillDisk.get)}%6.2f GB " +
      f"peakStageShuffle=${gb(peakStage.get)}%6.2f GB")
    spark.stop()
  }

  /** Strict-contiguity crossover probe (round-10 VERDICT item 6): gives
    * the docs' "use relaxed wherever possible" a NUMBER. Strict `next`
    * cannot pre-filter the scan — every event reaches the per-key fold —
    * and the documented alternative a user might reach for is a two-pass
    * shape: pass 1 computes each event's successor (one full-corpus
    * window sort), pass 2 filters to pattern-typed rows carrying their
    * adjacency and counts matches. This measures both over a synthetic
    * corpus whose PATTERN-EVENT FRACTION f is controlled, at several f,
    * so the crossover (if any) is read off directly. Counts are asserted
    * equal — the two shapes compute the same matches for a 2-stage
    * strict pattern (adjacent view→click pairs can never overlap). */
  def cepnextProbe(rows: Long, keys: Int): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"CEPNEXT rows=$rows keys=$keys (per-key time = id div keys, " +
      "gap 1; window 10 — no timeout term)")
    for (fPct <- Seq(5, 20, 50, 90)) {
      // ty: f% pattern events (view/click split by a second hash), rest
      // noise; tms strictly increasing per key by construction
      val df = spark.range(rows).select(
          (col("id") % keys).as("k"),
          (col("id") / keys).cast("long").as("tms"),
          col("id").as("oid"),
          when(pmod(hash(col("id")), lit(100)) < fPct,
            when(pmod(hash(col("id"), lit(7)), lit(2)) === 0, "view")
              .otherwise("click"))
            .otherwise(concat(lit("noise"),
              pmod(hash(col("id"), lit(13)), lit(3)).cast("string")))
            .as("ty"))
        .localCheckpoint(true)
      for (rep <- 0 until 2) {
        val t0 = System.nanoTime()
        // double key → the TRUE aggregate fold (long/string keys route to
        // the typed sorted plan since round 12)
        val m1 = graft.ops.Cep.patternMatchesNextFold(df,
          col("k").cast("double"), col("tms"), col("oid"), col("ty"),
          Seq("view", "click"), 10L, Set(1)).count()
        val w1 = (System.nanoTime - t0) / 1e9
        val t1 = System.nanoTime()
        // the PUBLIC operator routes this shape to the window-lead plan
        val m2 = graft.ops.Cep.patternMatchesNext(df, col("k"), col("tms"),
          col("oid"), col("ty"), Seq("view", "click"), 10L, Set(1)).count()
        val w2 = (System.nanoTime - t1) / 1e9
        assert(m1 == m2, s"shape mismatch at f=$fPct%: $m1 vs $m2")
        println(f"CEPNEXT f=$fPct%3d%% rep=$rep fold=$w1%5.2f s " +
          f"lead=$w2%5.2f s matches=$m1")
      }
      graft.util.Blocks.freeCheckpoint(df)
    }
    spark.stop()
  }

  /** SKIP TO NEXT ROW price probe: the overlap strategy's per-key cost is
    * O(starts × stages × events) against SKIP PAST LAST ROW's single
    * pass — this measures both on the same corpus while PER-KEY DEPTH
    * doubles (keys fixed, rows double), the axis the quadratic term
    * grows on, at two pattern-event densities. */
  def skipnextProbe(keys: Int): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vcp = Seq("view", "click", "purchase")
    for (fPct <- Seq(10, 50); depth <- Seq(40, 80, 160)) {
      val rows = keys.toLong * depth
      val df = spark.range(rows).select(
          (col("id") % keys).as("k"),
          (col("id") / keys).cast("long").as("tms"),
          col("id").as("oid"),
          when(pmod(hash(col("id")), lit(100)) < fPct,
            element_at(array(vcp.map(lit): _*),
              (pmod(hash(col("id"), lit(7)), lit(3)) + 1).cast("int")))
            .otherwise("noise").as("ty"))
        .localCheckpoint(true)
      for (rep <- 0 until 2 if rep == 1 || (fPct == 10 && depth == 40)) {
        val t0 = System.nanoTime()
        val m1 = graft.ops.Cep.patternMatches(df, col("k"), col("tms"),
          col("oid"), col("ty"), vcp, 1000000L).count()
        val w1 = (System.nanoTime - t0) / 1e9
        val t1 = System.nanoTime()
        val m2 = graft.ops.Cep.patternMatchesSkipNext(df, col("k"),
          col("tms"), col("oid"), col("ty"), vcp, 1000000L).count()
        val w2 = (System.nanoTime - t1) / 1e9
        if (rep == 1)
          println(f"SKIPNEXT f=$fPct%3d%% depth=$depth%4d rows=$rows%9d " +
            f"pastLast=$w1%6.2f s ($m1%8d) skipToNext=$w2%6.2f s ($m2%8d)")
      }
      graft.util.Blocks.freeCheckpoint(df)
    }
    spark.stop()
  }

  def cepProbe(copies: Int): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.model.Envelopes.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), expr("unix_millis(ts)").as("tms"),
        col("event_id").as("oid"), col("event_type").as("ty"))
      .localCheckpoint(true)
    def grown(n: Int) = (0 until n).map { i =>
      base.select((col("user_id") + lit(i * 100000000L)).as("user_id"),
        col("tms"), col("oid"), col("ty"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val big = grown(copies)
    println(s"CEP base=${base.count()} grown=${big.count()} (${copies}x users)")
    for ((df, label) <- Seq((base, "1x"), (big, s"${copies}x")); rep <- 0 until 2) {
      val t0 = System.nanoTime()
      val m = graft.ops.Cep.patternMatches(df, col("user_id"), col("tms"),
        col("oid"), col("ty"), Seq("view", "click", "purchase"),
        604800000L).count()
      val w0 = (System.nanoTime - t0) / 1e9
      val t1 = System.nanoTime()
      val mn = graft.ops.Cep.patternMatchesNeg(df, col("user_id"),
        col("tms"), col("oid"), col("ty"), Seq("view", "purchase"),
        259200000L, Map(1 -> Seq("error")), Seq("click")).count()
      val w1 = (System.nanoTime - t1) / 1e9
      val t2 = System.nanoTime()
      val mx = graft.ops.Cep.patternMatchesNext(df, col("user_id"),
        col("tms"), col("oid"), col("ty"), Seq("view", "click"),
        86400000L, Set(1)).count()
      val w2 = (System.nanoTime - t2) / 1e9
      println(f"CEP $label%4s rep=$rep relaxed=$w0%5.2f s ($m matches) " +
        f"neg=$w1%5.2f s ($mn) strict=$w2%5.2f s ($mx)")
    }
    graft.util.Blocks.freeCheckpoint(big)
    graft.util.Blocks.freeCheckpoint(base)
    spark.stop()
  }

  /** denseIds two-level-ranking probe: the corpus-preparation id mint at 1×
    * vs N× documents against the global `row_number() OVER (ORDER BY …)`
    * it replaces. The claim under test: the bucketed plan's wall scales
    * with the DATA (hash exchange + per-bucket sorts + a metadata window),
    * while the global window funnels every row through ONE task's sort —
    * the single-task wall is the 100 TB disqualifier, visible already at
    * 10× here. Both plans are counted through an identical downstream
    * aggregate so neither gets a lazy discount. */
  def denseidsProbe(copies: Int, outDir: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // lineitem, not documents: the single-task disqualifier needs row
    // counts where one task's sort is a visible wall (600 k -> 6 M here;
    // the documents table is 5 k rows and EVERYTHING is overhead there)
    if (!corpusReady(outDir, copies, probeFile = "lineitem.parquet")) {
      replicate(spark, "/root/testdata/sf0.1", outDir, copies)
      markCorpus(outDir, copies)
    }
    for ((dir, label) <- Seq(("/root/testdata/sf0.1", "1x"), (outDir, s"${copies}x"))) {
      val rows = spark.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
          col("l_partkey"))
        .localCheckpoint(true)
      val n = rows.count()
      for (rep <- 1 to 2) { // rep 2 = post-JIT reading
        val t0 = System.nanoTime()
        val two = graft.ops.Scale.denseIds(rows, expr("rid div 65536"),
          Seq(col("rid")))
        val s2 = two.agg(sum(col("dense_id"))).head().getLong(0)
        val w2 = (System.nanoTime - t0) / 1e9
        val t1 = System.nanoTime()
        val glob = rows.withColumn("dense_id",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("rid"))).cast("long") - 1L)
        val sg = glob.agg(sum(col("dense_id"))).head().getLong(0)
        val wg = (System.nanoTime - t1) / 1e9
        require(s2 == sg, s"id sums diverged: $s2 vs $sg")
        println(f"DIDPROBE $label%-5s rep=$rep rows=$n%9d twoLevel=$w2%6.2f s globalWindow=$wg%6.2f s")
      }
      graft.util.Blocks.freeCheckpoint(rows)
    }
    spark.stop()
  }

  /** IncrementalIds fold probe: mint ids for 50 k FRESH keys per fold
    * (lineitem row keys sliced — the fixture documents' 31-word vocabulary
    * saturates at fold 0 and shows only the protocol floor) while the
    * minted store grows `batches`×, then refold the last batch (0 new
    * keys). The claim under test: per-fold work rides the fold's NEW keys,
    * not the stored-vocabulary size — flat walls over a growing store, and
    * the all-seen refold pays only the read floor. */
  def idmintProbe(batches: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = s"$storeRoot/ids"
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    val rows = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("rid"))
      .localCheckpoint(true)
    var prevVocab = 0L
    def fold(i: Int, tag: String): Unit = {
      val batch = rows.filter(col("rid") % batches === i)
        .select(concat(lit("k"), col("rid")).as("key"))
      val t0 = System.nanoTime()
      val out = graft.streaming.IncrementalIds.mergeBatch(batch, store,
        col("key"))
      val vocab = out.count()
      val neu = vocab - prevVocab
      prevVocab = vocab
      if (i < 3 || (i + 1) % 5 == 0 || i == batches - 1 || tag.nonEmpty)
        println(f"IDMINT fold=$i%3d$tag wall=${(System.nanoTime - t0) / 1e9}%6.2f s " +
          f"minted=$vocab%8d newKeys=$neu%7d")
    }
    for (i <- 0 until batches) fold(i, "")
    fold(batches - 1, " (refold)")
    graft.util.Blocks.freeCheckpoint(rows)
    spark.stop()
  }

  /** IncrementalDecay churn probe: fold batches whose key sets CHURN (each
    * batch uses a fresh key range) and report live store rows per fold —
    * the claim under test is that decay-out tombstoning bounds live state
    * to the recently-active key set while total distinct keys ever seen
    * grows linearly. */
  def decayfoldProbe(batches: Int, storeRoot: String): Unit = {
    val spark = graft.GraftSession.builder(Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = s"$storeRoot/dec"
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(storeRoot))
    import spark.implicits._
    val keysPerBatch = 20000
    for (i <- 0 until batches) {
      // churning keys: window of 2 batch-ranges stays hot, older ranges go
      // silent and must decay out (unit 8 -> zero after 3 silent folds)
      val batch = spark.range(keysPerBatch)
        .select(concat(lit(s"k${i}_"), col("id")).as("k"))
        .unionByName(spark.range(keysPerBatch)
          .select(concat(lit(s"k${math.max(0, i - 1)}_"), col("id")).as("k")))
      val t0 = System.nanoTime()
      graft.streaming.IncrementalDecay.mergeBatch(batch, store, col("k"),
        batchId = i.toLong, unit = 8L)
      val live = graft.streaming.KeyedStore.read(spark, store).get
        .filter(col("op_type") =!= "delete" && col("kind") === "v").count()
      if (i < 3 || (i + 1) % 5 == 0 || i == batches - 1)
        println(f"DECAYFOLD fold=$i%3d wall=${(System.nanoTime - t0) / 1e9}%6.2f s " +
          f"liveKeys=$live%8d everSeen=${(i + 1).toLong * keysPerBatch}%8d")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("idmint")) {
      idmintProbe(args.lift(1).map(_.toInt).getOrElse(12),
        args.lift(2).getOrElse("/tmp/graft_scale_idmint"))
      return
    }
    if (args.headOption.contains("cep")) {
      cepProbe(args.lift(1).map(_.toInt).getOrElse(5))
      return
    }
    if (args.headOption.contains("skipnext")) {
      skipnextProbe(args.lift(1).map(_.toInt).getOrElse(100000))
      return
    }
    if (args.headOption.contains("cepfold")) {
      cepfoldProbe(args.lift(1).map(_.toInt).getOrElse(6),
        args.lift(2).getOrElse("/tmp/graft_scale_cepfold"))
      return
    }
    if (args.headOption.contains("maintfold")) {
      maintfoldProbe(args.lift(1).map(_.toInt).getOrElse(24),
        args.lift(2).getOrElse("/tmp/graft_scale_maintfold"))
      return
    }
    if (args.headOption.contains("tenancy")) {
      tenancyProbe(args.lift(1).map(_.toInt).getOrElse(50),
        args.lift(2).getOrElse("/tmp/graft_scale_tenancy"))
      return
    }
    if (args.headOption.contains("skipnexthot")) {
      skipnexthotProbe(args.lift(1).map(_.toInt).getOrElse(100000))
      return
    }
    if (args.headOption.contains("cephot")) {
      cephotProbe(args.lift(1).map(_.toInt).getOrElse(100000))
      return
    }
    if (args.headOption.contains("cepnext")) {
      cepnextProbe(args.lift(1).map(_.toLong).getOrElse(16000000L),
        args.lift(2).map(_.toInt).getOrElse(200000))
      return
    }
    if (args.headOption.contains("chunkfold")) {
      chunkfoldProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_chunkfold"))
      return
    }
    if (args.headOption.contains("trifold")) {
      trifoldProbe(args.lift(1).getOrElse("/tmp/graft_scale_trifold"))
      return
    }
    if (args.headOption.contains("decayfold")) {
      decayfoldProbe(args.lift(1).map(_.toInt).getOrElse(15),
        args.lift(2).getOrElse("/tmp/graft_scale_decf"))
      return
    }
    if (args.headOption.contains("denseids")) {
      denseidsProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_did"))
      return
    }
    if (args.headOption.contains("linkpred")) {
      linkpredProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_lp"))
      return
    }
    if (args.headOption.contains("recluster")) {
      reclusterProbe(args.lift(1).map(_.toInt).getOrElse(1),
        args.lift(2).getOrElse("/tmp/graft_scale_recluster"))
      return
    }
    if (args.headOption.contains("indexfold")) {
      indexFoldProbe(args.lift(1).map(_.toInt).getOrElse(20),
        args.lift(2).getOrElse("/tmp/graft_scale_ixf"))
      return
    }
    if (args.headOption.contains("sketchfold")) {
      sketchFoldProbe(args.lift(1).map(_.toInt).getOrElse(20),
        args.lift(2).getOrElse("/tmp/graft_scale_skf"))
      return
    }
    if (args.headOption.contains("simhash")) {
      simhashProbe(args.lift(1).map(_.toInt).getOrElse(8),
        args.lift(2).getOrElse("/tmp/graft_scale_simhash"))
      return
    }
    if (args.headOption.contains("pq")) {
      pqProbe(args.lift(1).map(_.toInt).getOrElse(50))
      return
    }
    if (args.headOption.contains("triangles")) {
      triangleProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_tri"))
      return
    }
    if (args.headOption.contains("pagerank")) {
      pagerankProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_pr"))
      return
    }
    if (args.headOption.contains("ccfold")) {
      ccfoldProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_ccfold"))
      return
    }
    if (args.headOption.contains("scd2fold")) {
      scd2foldProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_scd2"))
      return
    }
    if (args.headOption.contains("warmrank")) {
      warmrankProbe(args.lift(1).map(_.toInt).getOrElse(6),
        args.lift(2).getOrElse("/tmp/graft_scale_warmrank"))
      return
    }
    if (args.headOption.contains("topk")) {
      topkProbe(args.lift(1).map(_.toInt).getOrElse(30),
        args.lift(2).getOrElse("/tmp/graft_scale_topk"))
      return
    }
    if (args.headOption.contains("prefix")) {
      prefixProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_prefix"))
      return
    }
    if (args.headOption.contains("screens")) {
      screensProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_dsir"))
      return
    }
    if (args.headOption.contains("dsir")) {
      dsirProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_dsir"))
      return
    }
    if (args.headOption.contains("zorder")) {
      zorderProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_zorder"))
      return
    }
    if (args.headOption.contains("contain")) {
      containProbe(args.lift(1).map(_.toInt).getOrElse(50),
        args.lift(2).getOrElse("/tmp/graft_scale_contain"),
        args.lift(3).map(_.toInt).getOrElse(64))
      return
    }
    if (args.headOption.contains("dedup")) {
      dedup(args.lift(1).map(_.toInt).getOrElse(100),
        args.lift(2).getOrElse("/tmp/graft_scale100"))
      return
    }
    if (args.headOption.contains("profile")) {
      profileProbe(args.lift(1).map(_.toInt).getOrElse(10),
        args.lift(2).getOrElse("/tmp/graft_scale_probe"))
      return
    }
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
