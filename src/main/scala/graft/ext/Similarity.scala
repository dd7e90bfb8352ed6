package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (crossJoin + window rank). Scale path:
  * IVF-style probing — restrict the search to the query's nearest coarse
  * clusters so the crossJoin touches a fraction of the corpus; the cluster id
  * doubles as the shuffle/partition key at 100 TB.
  *
  * The dot-product kernel is a native codegen Catalyst expression
  * ([[graft.functions.DotProduct]]): Catalyst's `aggregate`/`zip_with`
  * higher-order functions are CodegenFallback (interpreted per element, ~20×
  * slower on the 64-dim pair sweep) and a Scala UDF pays an array
  * serialization copy per row. Norms are precomputed once per side so each
  * candidate pair costs exactly one O(d) loop inside whole-stage codegen.
  */
object Similarity {

  /** Double-precision left-fold dot product (same summation order as a
    * sequential list accumulation, so results are reproducible) — the native
    * codegen expression [[graft.functions.DotProduct]]. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  private def dotF(a: Column, b: Column): Column = dot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Attach the L2 norm once per row — candidate pairs then cost one dot. */
  private def withNorm(df: DataFrame, prefix: String): DataFrame =
    df.select(col("vec_id").as(s"${prefix}_id"), col("embedding").as(s"${prefix}_emb"),
      sqrt(dotF(col("embedding"), col("embedding"))).as(s"${prefix}_nrm"))

  /** Brute-force cosine top-k: for each query vector, rank all corpus vectors
    * (excluding itself) by (cosine desc, id asc) and keep `k`. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries, "q")
    val c = withNorm(corpus, "c")
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id").as("n_id"),
        (dotF(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm"))).as("sim"))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** Embedding near-dup pairs: all (a, b), a < b, with cosine ≥ threshold. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = withNorm(emb, "a")
    val b = withNorm(emb, "b")
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .filter(dotF(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")) >= threshold)
      .select(col("a_id"), col("b_id"))
  }

  /** SRP parameters (bits, bands) derived from the collision algebra instead
    * of hand-tuning: for signed random projections the per-bit agreement
    * probability of a pair at cosine θ is p = 1 − acos(θ)/π, a g-bit band
    * matches with p^g, and b bands recall 1 − (1 − p^g)^b. Pruning power
    * rises with the band width g (candidate selectivity per band ~ p_bg^g for
    * background pairs), so this picks the LARGEST g whose minimal
    * recall-meeting band count still fits the packed-long bit budget
    * (g·b ≤ maxBits ≤ 63), then that minimal b. Monotone in both dials:
    * a higher threshold (larger p) affords wider bands; a higher recall
    * floor forces more bands and narrower ones.
    *
    * If even 1-bit bands cannot reach the floor within the budget (pathology:
    * threshold ≈ −1 or floor ≈ 1), falls back loudly to (maxBits, maxBits) —
    * callers wanting guaranteed recall there should use [[cosinePairs]].
    *
    * @return (bits, bands) ready to pass to [[srpPairs]] */
  def srpParams(threshold: Double, recallFloor: Double = 0.99,
      maxBits: Int = 63): (Int, Int) = {
    require(threshold > -1.0 && threshold < 1.0,
      s"threshold must be in (-1, 1), got $threshold")
    require(recallFloor > 0.0 && recallFloor < 1.0,
      s"recallFloor must be in (0, 1), got $recallFloor")
    require(maxBits >= 1 && maxBits <= 63, s"maxBits must be in [1, 63], got $maxBits")
    val p = 1.0 - math.acos(threshold) / math.Pi
    val feasible = (1 to math.min(31, maxBits)).reverse.iterator.map { g =>
      val pg = math.pow(p, g)
      // minimal b with (1 - p^g)^b <= 1 - recallFloor
      val b = math.ceil(math.log1p(-recallFloor) / math.log1p(-pg)).toLong
      (g, b)
    }.collectFirst { case (g, b) if b >= 1 && g.toLong * b <= maxBits =>
      (g * b.toInt, b.toInt)
    }
    feasible.getOrElse((maxBits, maxBits))
  }

  /** Algebraic recall of (bits, bands) at `threshold` — the 1−(1−p^g)^b
    * curve [[srpParams]] inverts; exposed so specs and capacity planning can
    * read the achieved floor rather than re-deriving it. */
  def srpRecall(threshold: Double, bits: Int, bands: Int): Double = {
    require(bands >= 1 && bits % bands == 0, s"bad ($bits, $bands)")
    val p = 1.0 - math.acos(threshold) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, bits / bands), bands)
  }

  /** [[srpPairs]] with (bits, bands) derived by [[srpParams]] from the
    * threshold and a target recall floor. */
  def srpPairsAuto(emb: DataFrame, threshold: Double, dim: Int,
      recallFloor: Double = 0.99, seed: Long = 42L): DataFrame = {
    val (bits, bands) = srpParams(threshold, recallFloor)
    srpPairs(emb, threshold, dim, bits, bands, seed)
  }

  /** Signed-random-projection LSH near-dup pairs — the scale path for
    * [[cosinePairs]]: sketch each vector with `bits` Rademacher hyperplane
    * signs (deterministic from `seed`, materialized as literal arrays so the
    * sketch is one native dot per bit inside codegen), band the sketch, and
    * equi-join on (band, bandValue) instead of crossing the corpus. Bucket
    * collisions are deduped, then exact-verified at `threshold`, so precision
    * is 1; recall
    * at the threshold is 1−(1−p^g)^bands with p = 1−θ/π (≈0.98 for the
    * default 36 bits × 12 bands at cosine 0.45). Pruning power is the other
    * side of that dial: at a WEAK threshold like 0.45 (p≈0.65, vs ≈0.86 at
    * cosine 0.9) the defaults favor recall and admit a large candidate
    * fraction — raise g/lower bands when the threshold is high and you want
    * candidates ∝ true pairs. The band key is the shuffle key at 100 TB.
    *
    * @param dim embedding dimensionality (hyperplanes are built driver-side) */
  def srpPairs(emb: DataFrame, threshold: Double, dim: Int,
      bits: Int = 36, bands: Int = 12, seed: Long = 42L): DataFrame = {
    require(bits % bands == 0, "bits must be divisible by bands")
    require(bits <= 63, s"bits=$bits overflows the packed long sketch " +
      "(1L << i wraps mod 64 — high bits would silently alias onto low bands)")
    val g = bits / bands
    require(g <= 31, s"band width $g would overflow the Int band value")
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f))
    // A dim mismatch makes every plane dot NULL (DotProduct's length
    // contract); silently mapping that to bit 0 would collapse ALL vectors
    // into one bucket and degrade the join to n²/2 with correct-looking
    // output. Fail loudly instead — checked once on plane 0 (all planes
    // share the length condition).
    val d0 = dot(col("embedding"), typedLit(planes(0).toSeq))
    val bit0 = when(d0.isNull,
        raise_error(concat(lit(s"srpPairs dim=$dim does not match embedding length "),
          size(col("embedding")).cast("string"))))
      .otherwise(when(d0 > 0, 1).otherwise(0))
    val bitCols = bit0 +: planes.tail.map(p =>
      when(dot(col("embedding"), typedLit(p.toSeq)) > 0, 1).otherwise(0))
    // The whole sketch packs into one long; per-band values are bit slices.
    val sketch = (0 until bits).map(i => bitCols(i).cast("long") * (1L << i))
      .reduce(_ + _)
    val mask = (1L << g) - 1
    def bval(sk: Column, b: Int): Column =
      shiftright(sk, b * g).bitwiseAND(lit(mask))
    val bandStructs = (0 until bands).map(b =>
      struct(lit(b).as("band"), bval(col("sk"), b).as("bval")))
    // Buckets carry ONLY (vec_id, sketch, band, bval): the band explode must
    // not duplicate the vector payload `bands`× through the bucket-join
    // shuffle (at 100 TB that is bands× the embedding table's bytes). A pair
    // colliding in k bands is kept ONLY in its first matching band — a pure
    // bit-op residual on the two sketches — so the candidate set is unique by
    // construction: no distinct() shuffle over the collision volume. The
    // exact verify then joins the vectors back on vec_id, each side's
    // embeddings crossing the wire exactly once, one O(d) dot per pair.
    val buckets = emb.select(col("vec_id"), sketch.as("sk"))
      .select(col("vec_id"), col("sk"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("vec_id"), col("sk"), col("bk.band").as("band"), col("bk.bval").as("bval"))
    val diff = col("x.sk").bitwiseXOR(col("y.sk"))
    val firstMatchBand = (1 until bands).foldLeft(
      when(bval(diff, 0) === 0, 0)) { (w, b) => w.when(bval(diff, b) === 0, b) }
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.vec_id") < col("y.vec_id") &&
          col("x.band") === firstMatchBand)
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
    val v = emb.select(col("vec_id"), col("embedding"),
      sqrt(dotF(col("embedding"), col("embedding"))).as("nrm"))
    cand.join(v.as("va"), col("a_id") === col("va.vec_id"))
      .join(v.as("vb"), col("b_id") === col("vb.vec_id"))
      .filter(dotF(col("va.embedding"), col("vb.embedding")) /
        (col("va.nrm") * col("vb.nrm")) >= threshold)
      .select(col("a_id"), col("b_id"))
  }

  /** Spherical k-means cluster labels — builds the coarse cells [[ivfTopK]]
    * probes when no `label` column ships with the data (the index-build half
    * of an IVF ANN system). Lloyd iterations with cosine assignment:
    * centroids are per-dimension exact DECIMAL SUMS of the assigned vectors
    * (cosine is scale-invariant, so the un-divided sum assigns identically to
    * the mean and is independent of partition/row order — every run produces
    * the SAME labels, which is what makes the composed IVF query testable).
    * Init is the deterministic `vec_id % k` partition.
    *
    * Scale shape per iteration: one shuffle to build k·dim centroid cells
    * (partial sums map-side), then assignment as a broadcast of the k-row
    * centroid table against the corpus scan with a map-side partial argmax —
    * the corpus never shuffles on the assignment path. Iterations are
    * driver-sequenced like any Lloyd loop; `iters` is fixed (no convergence
    * read) so the job count is known up front. */
  def kmeansLabels(emb: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // Pin the normed vectors for the loop: every iteration reads v twice
    // (centroid build + assignment), so an unpersisted lineage would rescan
    // the embedding source and re-derive 2·iters norms — the standard
    // cache-the-input practice of any Lloyd loop (MLlib does the same).
    // Released before return; labels are checkpointed, so nothing in the
    // returned plan references the cache.
    val v = emb.select(col("vec_id"), col("embedding"),
        sqrt(dotF(col("embedding"), col("embedding"))).as("nrm"))
      .persist()
    var labels = v.select(col("vec_id"), (col("vec_id") % k).cast("int").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val cent = v.join(labels, "vec_id")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(sum(col("x").cast("decimal(27,10)")).as("cv"))
        .groupBy("label")
        .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
        .select(col("label").as("c_label"),
          transform(col("ps"), p => p.getField("cv").cast("float")).as("centroid"))
      val centN = cent.withColumn("cent_nrm",
        sqrt(dotF(col("centroid"), col("centroid"))))
      // argmax by (sim desc, label asc) via a partial-aggregating max over a
      // (sim, -label) struct — no n×k window shuffle. A degenerate all-zero
      // centroid yields NULL sim → coalesce to below cosine's floor so a
      // real centroid always wins.
      val next = v.crossJoin(broadcast(centN))
        .select(col("vec_id"), struct(
          coalesce(dotF(col("embedding"), col("centroid")) /
            (col("nrm") * col("cent_nrm")), lit(-2.0)).as("sim"),
          (-col("c_label")).as("nl")).as("sc"))
        .groupBy("vec_id").agg(max(col("sc")).as("m"))
        .select(col("vec_id"), (-col("m.nl")).as("label"))
        .localCheckpoint(true)
      graft.util.Blocks.freeCheckpoint(labels) // checkpointed: plain unpersist no-ops
      labels = next
    }
    v.unpersist()
    labels
  }

  /** IVF-style approximate top-k: coarse clusters come from the `label`
    * column (stand-in for k-means cells); each query probes its `nProbe`
    * nearest centroids and ranks only those clusters' vectors.
    *
    * Centroids are per-dimension exact DECIMAL SUMS, not float means: cosine
    * is scale-invariant, so the un-divided sum ranks identically to the mean,
    * and an exact decimal sum is independent of partition/row order — the
    * same value on every run and in every engine, which is what lets this
    * operator carry a full SQL hash oracle (`q_ann_ivf`) instead of the
    * rows-only check a float-averaged centroid would force. */
  /** The coarse-quantizer centroid table (c_label, centroid) from a labeled
    * corpus — per-dimension exact DECIMAL sums cast to float (see
    * [[ivfTopK]]'s determinism note). Shared by the probe path and the
    * [[ivfProbeCdf]] calibration so the two can never rank against
    * different centroids. */
  private def coarseCentroids(corpus: DataFrame): DataFrame =
    centroidsOf(coarseCentroidSums(corpus))

  /** The ADDITIVE half of [[coarseCentroids]]: per-(label, pos) exact
    * DECIMAL component sums. Decimal addition at a fixed scale is exact and
    * order-free, so partial sums over ANY batch split fold to the same
    * value the one-pass aggregate produces — the property that lets
    * [[graft.streaming.IncrementalIvf]] persist these rows across
    * micro-batches and still hand [[centroidsOf]] bit-identical centroids.
    * Emitted at decimal(38,10) so a stored sum plus a batch sum never
    * re-widens the store schema (38 is Spark's precision ceiling). */
  private[graft] def coarseCentroidSums(corpus: DataFrame): DataFrame =
    corpus.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum(col("v").cast("decimal(27,10)")).cast("decimal(38,10)").as("cv"))

  /** The READ half: (label, pos, cv) sums → (c_label, centroid FLOAT[]),
    * shared by the batch quantizer and the store-backed index so the two
    * can never round differently. */
  private[graft] def centroidsOf(sums: DataFrame): DataFrame =
    sums.groupBy("label").agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
      .select(col("label").as("c_label"),
        transform(col("ps"), p => p.getField("cv").cast("float")).as("centroid"))

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    val centroids = coarseCentroids(corpus)
    // Precompute each side's norm ONCE (cosine() inline would re-derive
    // sqrt(dot(q,q)) for every candidate pair — |q|·cluster_size redundant
    // O(d) loops at scale). Same doubles, same ranks: the norm value is
    // identical whether computed once or per pair. Applies to BOTH stages:
    // probe selection divides by q_nrm × a centroid norm attached once to
    // the (tiny) centroid table.
    val q = withNorm(queries, "q")
    val cent = centroids.withColumn("cent_nrm",
      sqrt(dotF(col("centroid"), col("centroid"))))
    val probes = q.crossJoin(cent)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_label"),
        (dotF(col("q_emb"), col("centroid")) / (col("q_nrm") * col("cent_nrm")))
          .as("c_sim"))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("c_sim").desc, col("c_label"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_label"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      sqrt(dotF(col("embedding"), col("embedding"))).as("c_nrm"), col("label"))
    val scored = probes.join(c, col("c_label") === col("label"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id").as("n_id"),
        (dotF(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm"))).as("sim"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** Empirical probe-count calibration curve for [[ivfTopK]] — nProbe is a
    * recall dial exactly like SRP's (bits, bands), but unlike SRP there is
    * no closed-form collision algebra: recall-vs-probes depends on how the
    * quantizer's cells tile the data, so it is MEASURED, the way IVF indexes
    * are tuned in practice. For each vector of a (small, caller-fixed)
    * calibration sample, find its true top-1 neighbor by brute force and
    * record the rank of the neighbor's cluster in the query's
    * centroid-similarity order — the same (c_sim desc, c_label) order
    * [[ivfTopK]] probes in — then aggregate:
    *
    *   - `recall`    at p = fraction of sample whose true neighbor lives in
    *     its p nearest clusters = the top-1 recall ivfTopK(nProbe = p) gets
    *     on the sample (both stages rank with the identical expressions);
    *   - `scan_frac` at p = mean cumulative corpus mass of the p nearest
    *     clusters (from the cluster-size histogram) = the fraction of the
    *     corpus the fine stage scans per query — the price of the dial.
    *
    * Calibration cost is |sample| × |corpus| exact dots in ONE pass plus an
    * m×k centroid ranking — paid once per index build, the deliberate
    * analog of srpParams' algebra; size the sample, not the corpus.
    * Deterministic for a deterministic sample (exact-decimal centroids,
    * IEEE dots, total tie-break orders), so specs can pin the derived
    * params byte-for-byte.
    *
    * @param corpus (vec_id, embedding, label) — the labeled IVF corpus
    * @param sample (vec_id, embedding) calibration queries (fix it
    *   deterministically, e.g. `vec_id % s === 0`)
    * @return one row per probe count p = 1..k: (p, recall, scan_frac) */
  def ivfProbeCdf(corpus: DataFrame, sample: DataFrame): DataFrame = {
    val cent = coarseCentroids(corpus).withColumn("cent_nrm",
      sqrt(dotF(col("centroid"), col("centroid"))))
    val q = withNorm(sample, "q")
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      sqrt(dotF(col("embedding"), col("embedding"))).as("c_nrm"),
      col("label").as("c_lab"))
    // true top-1 neighbor per sample query — argmax by (sim desc, id asc)
    // via one partial-aggregating max over a (sim, -id, label) struct; the
    // label rides in a trailing field that never decides the order (ids are
    // unique, so (sim, -id) ties cannot occur)
    val nn = q.crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), struct(
        (dotF(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm"))).as("sim"),
        (-col("c_id")).as("ni"), col("c_lab").as("lab")).as("sc"))
      .groupBy("q_id").agg(max(col("sc")).as("m"))
      .select(col("q_id").as("n_qid"), col("m.lab").as("nn_label"))
    // every (query, cluster) pair ranked in ivfTopK's probe order, with the
    // cluster's corpus mass attached for the scan-cost readout
    val mass = corpus.groupBy(col("label").as("c_label"))
      .agg(count(lit(1)).as("n"))
    val ranked = q.crossJoin(broadcast(cent))
      .select(col("q_id"),
        (dotF(col("q_emb"), col("centroid")) / (col("q_nrm") * col("cent_nrm")))
          .as("c_sim"), col("c_label"))
      .withColumn("p", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("c_sim").desc, col("c_label"))))
      .join(broadcast(mass), Seq("c_label"))
      .withColumn("cum_n", sum(col("n")).over(
        Window.partitionBy(col("q_id")).orderBy(col("p"))))
    val total = corpus.agg(count(lit(1)).as("corpus_n"))
    val sampleN = sample.count().toDouble
    val hits = ranked.join(nn,
        col("q_id") === col("n_qid") && col("c_label") === col("nn_label"))
      .groupBy(col("p").as("hp")).agg(count(lit(1)).as("hit_ct"))
    ranked.crossJoin(broadcast(total))
      .groupBy("p").agg(
        (sum(col("cum_n").cast("double") / col("corpus_n")) / sampleN).as("scan_frac"))
      .join(hits, col("p") === col("hp"), "left_outer")
      .withColumn("recall",
        (sum(coalesce(col("hit_ct"), lit(0L))).over(Window.orderBy(col("p")))
          / sampleN))
      .select(col("p"), col("recall"), col("scan_frac"))
  }

  /** The probe count for [[ivfTopK]] derived from a target recall floor —
    * the minimal p whose measured sample recall ([[ivfProbeCdf]]) reaches
    * the floor. Recall at p = k (probe everything) is 1.0 by construction,
    * so the derivation always terminates with a feasible dial. */
  def ivfParams(corpus: DataFrame, sample: DataFrame,
      recallFloor: Double = 0.95): Int = {
    require(recallFloor > 0.0 && recallFloor <= 1.0,
      s"recallFloor must be in (0, 1], got $recallFloor")
    val rows = ivfProbeCdf(corpus, sample).orderBy(col("p")).collect()
    // an empty calibration sample yields an empty CDF, and rows.length
    // would then hand back nProbe = 0 — an invalid dial that makes every
    // downstream ivfTopK return no neighbors with no error. Fail fast.
    require(rows.nonEmpty,
      "ivfParams: calibration sample is empty (or corpus is empty) — the " +
        "probe CDF has no rows, so no probe count can be derived")
    rows.collectFirst {
      case r if r.getAs[Double]("recall") >= recallFloor => r.getAs[Int]("p")
    }.getOrElse(rows.length)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * cluster the corpus with [[kmeansLabels]], then WITHIN each cluster drop
    * every vector that has a cosine-≥-threshold neighbor of higher
    * keep-priority. Keep-priority follows the paper: the copy LEAST similar
    * to its cluster centroid survives (pruning prototypical duplicates
    * preserves diversity at the cluster edge), ties broken toward the lower
    * vec_id.
    *
    * This is the scale design of the paper itself: the k-way cluster
    * partition bounds the pair space at k·(n/k)² — the within-cluster join
    * is an equi-join on `label` (hash-shuffle co-location, no crossJoin),
    * centroids broadcast, and each candidate pair costs one codegen dot.
    * Exact-decimal centroid sums + argmax tie-breaks keep the whole
    * pipeline deterministic, so the result carries a full SQL hash oracle
    * (`q_semdedup`) with the Lloyd iteration unrolled as CTEs.
    *
    * @return (vec_id, label, kept) — kept = 0 marks semantic duplicates */
  def semDedup(emb: DataFrame, k: Int, threshold: Double,
      iters: Int = 1): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    // project to the operator's contract columns — a pre-existing `label`
    // (e.g. a supervised tag) must not collide with the cluster label
    val base = emb.select(col("vec_id"), col("embedding"))
    val labeled = base.join(kmeansLabels(base, k, iters), "vec_id")
    // final centroids from the final labels — the same exact-decimal build
    // the Lloyd loop uses, so the oracle's unrolled CTEs reproduce it
    val cent = labeled
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(sum(col("x").cast("decimal(27,10)")).as("cv"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
      .select(col("label").as("c_label"),
        transform(col("ps"), p => p.getField("cv").cast("float")).as("centroid"))
      .withColumn("cent_nrm", sqrt(dotF(col("centroid"), col("centroid"))))
    val scored = labeled.join(broadcast(cent), col("label") === col("c_label"))
      .select(col("vec_id"), col("label"), col("embedding"),
        sqrt(dotF(col("embedding"), col("embedding"))).as("nrm"),
        (dotF(col("embedding"), col("centroid")) /
          (sqrt(dotF(col("embedding"), col("embedding"))) * col("cent_nrm")))
          .as("c_sim"))
    def side(p: String) = scored.select(col("label"),
      col("vec_id").as(s"${p}_id"), col("embedding").as(s"${p}_emb"),
      col("nrm").as(s"${p}_nrm"), col("c_sim").as(s"${p}_sim"))
    val dominated = side("a").join(side("b"), Seq("label"))
      .filter(col("a_sim") < col("b_sim") ||
        (col("a_sim") === col("b_sim") && col("a_id") < col("b_id")))
      .filter(dotF(col("a_emb"), col("b_emb")) /
        (col("a_nrm") * col("b_nrm")) >= threshold)
      .select(col("b_id").as("vec_id")).distinct()
    scored.join(dominated.withColumn("__dup", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        when(col("__dup").isNull, 1).otherwise(0).as("kept"))
  }

  /** Matryoshka truncation: keep the first `k` dimensions and L2-renormalize
    * — the MRL-style (Kusupati et al., "Matryoshka Representation Learning")
    * index-shrink step of an embedding pipeline: a 4× dim cut is a 4× cut in
    * ANN index bytes and dot-product cost at a small recall trade, provided
    * the prefix is re-normalized so cosine stays a dot product.
    *
    * Row-local (no shuffle) and bit-deterministic: the prefix norm is the
    * same double left-fold [[dot]] runs (native codegen), each element is
    * divided in double and cast back to float — float→double promotion,
    * divide, sqrt and the float cast are all IEEE correctly-rounded, so an
    * oracle reproduces every component exactly. Zero-prefix vectors (all
    * first-k components 0) yield an all-zero prefix rather than NaNs.
    *
    * @return (vec_id, emb_k : array<float>) */
  def matryoshka(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pre = slice(col("embedding"), 1, k)
    val nrm = sqrt(dotF(col("__pre"), col("__pre")))
    emb.select(col("vec_id"), pre.as("__pre"))
      .select(col("vec_id"),
        when(nrm === lit(0.0), transform(col("__pre"), _ => lit(0.0f)))
          .otherwise(transform(col("__pre"),
            x => (x.cast("double") / nrm).cast("float")))
          .as("emb_k"))
  }

  /** Symmetric int8 quantization of an embedding column — the 4× storage /
    * bandwidth compression step of a 100 TB ANN index build: per vector,
    * `scale = 127 / max|x|` and each element becomes
    * `floor(x · scale + 0.5)` in [−127, 127] (round-half-up written as an
    * explicit floor so every engine agrees on ties; `round()` half-away vs
    * half-even varies). Zero vectors quantize to scale 0 / all-zero codes.
    *
    * Row-local (no shuffle), whole-stage-codegen array expressions, and
    * bit-deterministic: float→double promotion, the division, multiply and
    * floor are all IEEE-exact operations, so an oracle reproduces codes AND
    * scales exactly.
    *
    * @return (vec_id, dim, scale, q) with q : array<int> */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val mx = array_max(transform(col("embedding"), x => abs(x)))
    emb
      .withColumn("scale",
        when(mx === lit(0.0f), lit(0.0)).otherwise(lit(127.0) / mx))
      .select(col("vec_id"), size(col("embedding")).as("dim"), col("scale"),
        transform(col("embedding"),
          x => floor(x * col("scale") + lit(0.5)).cast("int")).as("q"))
  }

  /** The per-subspace row layout product quantization trains and probes on:
    * each embedding sliced into `m` contiguous equal subvectors —
    * (id, sub, svec) with sub ∈ [0, m). The slice bounds are column
    * arithmetic on `size(embedding)`, so the layout needs no driver-side
    * dimension probe; dimensions not divisible by `m` are the caller's
    * contract (PQSpec guards the fixture). */
  private def pqSubRows(df: DataFrame, idCol: String, m: Int): DataFrame =
    df.select(col(idCol), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("embedding"))
      .select(col(idCol), col("sub"),
        expr(s"slice(embedding, sub * (size(embedding) div $m) + 1, " +
          s"size(embedding) div $m)").as("svec"))

  /** The PQ assignment distance: `‖c‖² − 2·x·c`, which ranks identically to
    * the Euclidean `‖x − c‖²` (the `‖x‖²` term is constant per row) while
    * staying two deterministic left-fold dot kernels plus two arithmetic
    * ops — bit-reproducible on any engine, no sqrt to collapse near-ties
    * differently per engine. */
  private def pqDist(svec: Column, cent: Column): Column =
    dotF(cent, cent) - lit(2.0) * dotF(svec, cent)

  /** Product-quantization codebooks — the memory-bound ANN scale path
    * (Jégou et al. 2011): each embedding splits into `m` subvectors and
    * each subspace learns `k` centroids by Lloyd iterations, so a vector
    * compresses to `m` small codes (m·log₂k bits — 16 bytes/vector at
    * m=4,k=16 vs 256 for the float vector) and query distance becomes `m`
    * table lookups ([[pqTopK]]). At 100 TB of embeddings this is the
    * difference between scanning floats and scanning bytes.
    *
    * Determinism (the property that lets `q_pq_train` carry a full hash
    * oracle, unlike any float-mean k-means): `id % k` init, per-dimension
    * exact DECIMAL centroid sums cast to float (the [[ivfTopK]] idiom),
    * assignment by [[pqDist]] with ties to the smaller code — every step a
    * pure function of the vector set. Codes that lose all members simply
    * drop out of the next centroid build (standard empty-cluster shrink).
    *
    * Shape at scale: per iteration, one map-side-combined (sub, code, pos)
    * decimal-sum aggregate over the corpus and one broadcast join of the
    * ≤ m·k-row codebook onto the corpus scan with a partial-aggregating
    * struct-min argmin — the corpus never shuffles on the assignment path;
    * per-iteration codes are localCheckpointed (the Lloyd-loop lineage
    * discipline of [[kmeansLabels]]).
    *
    * @return (sub, code, centroid float array) — the trained codebooks */
  def pqCodebooks(emb: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 2): DataFrame = {
    require(m >= 1 && k >= 1 && iters >= 1,
      s"need m, k, iters >= 1, got ($m, $k, $iters)")
    val rows = pqSubRows(emb, "vec_id", m).persist()
    var codes = rows.select(col("vec_id"), col("sub"),
        (col("vec_id") % k).cast("int").as("code"))
      .localCheckpoint(true)
    var books: DataFrame = null
    for (it <- 1 to iters) {
      val prevBooks = books
      books = rows.join(codes, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("svec")).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos")
        .agg(sum(col("x").cast("decimal(27,10)")).as("cv"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
        .select(col("sub"), col("code"),
          transform(col("ps"), p => p.getField("cv").cast("float")).as("centroid"))
        .localCheckpoint(true)
      if (prevBooks != null) graft.util.Blocks.freeCheckpoint(prevBooks)
      // the LAST round's assignment is never read (callers re-derive it
      // via pqEncode against the final books) — computing it here would
      // waste one full-corpus argmin pass per training call
      if (it < iters) {
        val next = rows
          .join(broadcast(books.withColumnRenamed("code", "c_code")), Seq("sub"))
          .select(col("vec_id"), col("sub"), struct(
            pqDist(col("svec"), col("centroid")).as("d"),
            col("c_code").as("code")).as("sc"))
          .groupBy("vec_id", "sub").agg(min(col("sc")).as("m"))
          .select(col("vec_id"), col("sub"), col("m.code").as("code"))
          .localCheckpoint(true)
        graft.util.Blocks.freeCheckpoint(codes)
        codes = next
      }
    }
    graft.util.Blocks.freeCheckpoint(codes)
    rows.unpersist()
    books
  }

  /** Encode a corpus against trained [[pqCodebooks]]: each vector's `m`
    * nearest-centroid codes ([[pqDist]] argmin, ties to the smaller code) —
    * the byte-sized representation the ADC scan reads. One broadcast join
    * of the ≤ m·k-row codebook onto the corpus scan; the corpus never
    * shuffles beyond the argmin's partial aggregation.
    * @return (vec_id, sub, code) */
  def pqEncode(emb: DataFrame, books: DataFrame, m: Int = 4): DataFrame =
    pqSubRows(emb, "vec_id", m)
      .join(broadcast(books.withColumnRenamed("code", "c_code")), Seq("sub"))
      .select(col("vec_id"), col("sub"), struct(
        pqDist(col("svec"), col("centroid")).as("d"),
        col("c_code").as("code")).as("sc"))
      .groupBy("vec_id", "sub").agg(min(col("sc")).as("m"))
      .select(col("vec_id"), col("sub"), col("m.code").as("code"))

  /** Asymmetric-distance top-k over PQ codes: the query builds its m·k
    * distance TABLE (one [[pqDist]] per (sub, code) — m·k kernel calls
    * total, independent of corpus size), and every corpus vector's
    * approximate distance is the sum of `m` table lookups — the scan reads
    * CODES, never floats. The per-sub lookups join as `m` successive
    * broadcast hash joins and the sum is the explicitly-parenthesized
    * left-to-right chain `((d0 + d1) + d2) + …` — fixed association, so
    * the float result (and therefore the ranking) is engine-reproducible.
    * Ties rank by vec_id; the rank filter is a per-query window.
    * @return (query_id, vec_id, rk) — the k approximate nearest per query */
  def pqTopK(queries: DataFrame, books: DataFrame, codes: DataFrame,
      m: Int = 4, topK: Int = 10): DataFrame = {
    require(m >= 1 && topK >= 1, s"need m, topK >= 1, got ($m, $topK)")
    val dt = pqSubRows(queries, "query_id", m)
      .join(broadcast(books), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        pqDist(col("svec"), col("centroid")).as("d"))
    val wide = codes.groupBy("vec_id")
      .pivot("sub", 0 until m).agg(first(col("code")))
    val scored = (0 until m).foldLeft(wide) { (acc, s) =>
      val dtS = dt.filter(col("sub") === s)
        .select(col("query_id").as(s"__q$s"), col("code").as(s"__c$s"),
          col("d").as(s"__d$s"))
      val cond =
        if (s == 0) acc(s.toString) === col(s"__c$s")
        else acc(s.toString) === col(s"__c$s") && col("__q0") === col(s"__q$s")
      acc.join(broadcast(dtS), cond)
    }
    val dist = (1 until m).foldLeft(col("__d0")) { (acc, s) => acc + col(s"__d$s") }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    scored.select(col("__q0").as("query_id"), col("vec_id"), dist.as("dist"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("vec_id"), col("rk").cast("long").as("rk"))
  }

  /** IVF × PQ — the composed webscale ANN architecture (an IVFADC index):
    * the coarse quantizer's cells prune the candidate set to the query's
    * `nProbe` nearest clusters (the [[ivfTopK]] probe stage, exact-decimal
    * centroids + cosine ranking), and the fine stage ranks ONLY those
    * cells' vectors by asymmetric distance over PQ codes ([[pqTopK]]'s
    * lookup-sum). Per query the scan touches `scan_frac · n` CODE rows
    * (16 B each) instead of `n` float vectors — the two levers multiply,
    * which is why this is the shape every billion-vector index ships.
    *
    * Both stages are engine-deterministic (the reason `q_ann_ivf_pq` can
    * compose the two proven oracle chains): probe ties break by label,
    * ADC ties by vec_id, and the ADC sum keeps its fixed association.
    *
    * @param corpus (vec_id, embedding, label) — `label` is the coarse cell
    * @return (query_id, vec_id, rk) — ADC-ranked within probed cells */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, books: DataFrame,
      codes: DataFrame, m: Int = 4, topK: Int = 10,
      nProbe: Int = 2): DataFrame =
    ivfPqCore(queries, coarseCentroids(corpus),
      corpus.select(col("vec_id"), col("label")), books, codes, m, topK,
      nProbe)

  /** The IVFADC probe + ADC scoring core over PRE-BUILT parts — shared by
    * [[ivfPqTopK]] (parts derived from the corpus in one pass) and
    * [[graft.streaming.IncrementalIvf.search]] (parts read from the
    * persistent index), so the two paths cannot drift by construction.
    * @param cent0 (c_label, centroid)   @param labels (vec_id, label) */
  /** The probe stage alone: each query's `nProbe` nearest coarse cells by
    * centroid cosine (ties by label) as (__pq = query_id, c_label) pairs.
    * Split out so a store-backed caller can derive the probed CELL SET
    * before reading any code rows — the readPruned key — from the exact
    * expressions the scoring core uses (pass the result back via
    * `probes`; recomputing would be identical anyway, same plan over the
    * same data, but sharing the frame makes the no-drift argument
    * structural). */
  private[graft] def probePairs(queries: DataFrame, cent0: DataFrame,
      nProbe: Int): DataFrame = {
    val cent = cent0.withColumn("cent_nrm",
      sqrt(dotF(col("centroid"), col("centroid"))))
    val qn = queries.select(col("query_id"), col("embedding"),
      sqrt(dotF(col("embedding"), col("embedding"))).as("q_nrm"))
    qn.crossJoin(broadcast(cent))
      .select(col("query_id"), col("c_label"),
        (dotF(col("embedding"), col("centroid")) /
          (col("q_nrm") * col("cent_nrm"))).as("c_sim"))
      .withColumn("c_rank", row_number().over(Window
        .partitionBy(col("query_id")).orderBy(col("c_sim").desc, col("c_label"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("query_id").as("__pq"), col("c_label"))
  }

  private[graft] def ivfPqCore(queries: DataFrame, cent0: DataFrame,
      labels: DataFrame, books: DataFrame, codes: DataFrame, m: Int,
      topK: Int, nProbe: Int,
      probesOpt: Option[DataFrame] = None): DataFrame = {
    require(m >= 1 && topK >= 1 && nProbe >= 1,
      s"need m, topK, nProbe >= 1, got ($m, $topK, $nProbe)")
    val probes = probesOpt.getOrElse(probePairs(queries, cent0, nProbe))
    val dt = pqSubRows(queries, "query_id", m)
      .join(broadcast(books), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        pqDist(col("svec"), col("centroid")).as("d"))
    // candidates: pivoted codes of probed cells only — the pruned scan
    val cand = codes.groupBy("vec_id")
      .pivot("sub", 0 until m).agg(first(col("code")))
      .join(labels, "vec_id")
      .join(broadcast(probes), col("label") === col("c_label"))
    val scored = (0 until m).foldLeft(cand) { (acc, s) =>
      val dtS = dt.filter(col("sub") === s)
        .select(col("query_id").as(s"__q$s"), col("code").as(s"__c$s"),
          col("d").as(s"__d$s"))
      acc.join(broadcast(dtS),
        acc(s.toString) === col(s"__c$s") && col("__pq") === col(s"__q$s"))
    }
    val dist = (1 until m).foldLeft(col("__d0")) { (acc, s) => acc + col(s"__d$s") }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("vec_id"))
    scored.select(col("__pq").as("query_id"), col("vec_id"), dist.as("dist"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("vec_id"), col("rk").cast("long").as("rk"))
  }

  /** Two-stage retrieval — the production stack's final shape: the
    * [[ivfPqTopK]] IVFADC stage shortlists `shortlist` candidates per
    * query from CODES (16 B rows, probed cells only), then ONLY those
    * candidates' float vectors are fetched and re-ranked by exact cosine
    * (ties by vec_id). The expensive exact math touches
    * `shortlist · |queries|` vectors instead of the corpus — the
    * recall-vs-cost dial every deployed ANN service exposes (bigger
    * shortlist → approaches exact-within-probed-cells at linearly more
    * float reads). Both stages deterministic, so the composition
    * hash-oracles (`q_ann_rerank`).
    * @return (query_id, vec_id, rk) — exact-cosine rank within the
    *   shortlist, top `topK` per query */
  def ivfPqRerank(queries: DataFrame, corpus: DataFrame, books: DataFrame,
      codes: DataFrame, m: Int = 4, shortlist: Int = 50, topK: Int = 5,
      nProbe: Int = 2): DataFrame = {
    require(topK <= shortlist, s"topK $topK must be <= shortlist $shortlist")
    val cand = ivfPqTopK(queries, corpus, books, codes, m, shortlist, nProbe)
      .select(col("query_id"), col("vec_id"))
    val qn = queries.select(col("query_id"), col("embedding").as("__qe"),
      sqrt(dotF(col("embedding"), col("embedding"))).as("__qn"))
    val cn = corpus.select(col("vec_id"), col("embedding").as("__ce"),
      sqrt(dotF(col("embedding"), col("embedding"))).as("__cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("vec_id"))
    cand.join(qn, Seq("query_id")).join(cn, Seq("vec_id"))
      .withColumn("__sim", dotF(col("__qe"), col("__ce")) /
        (col("__qn") * col("__cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("vec_id"), col("rk").cast("long").as("rk"))
  }

  /** Per-label centroid as SCALED-INTEGER per-dimension sums: each component
    * contributes `floor(x · 10⁶)` (float→double promotion, one multiply and
    * `floor` — all IEEE-exact, and floor has no rounding-mode ambiguity the
    * way `round`'s half-up/half-even split does), summed as plain BIGINTs
    * (order-independent, overflow-safe to ~9·10¹² vectors per cell). The
    * class-profile table of a labeled embedding set — the input to drift
    * monitoring, per-class balance reports, and [[labelOutliers]].
    *
    * One shuffle on (label, pos) with map-side partial sums; output is
    * k·dim rows — metadata-sized next to any corpus.
    *
    * @return (label, pos, s_sum, n) — 1-based pos, n = vectors in label */
  def labelCentroidSums(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("p0", "x")))
      .select(col("label"), (col("p0") + 1).cast("long").as("pos"),
        floor(col("x").cast("double") * lit(1e6)).as("sx"))
      .groupBy("label", "pos")
      .agg(sum(col("sx")).as("s_sum"), count(lit(1)).as("n"))

  /** Centroid-distance outliers — the embedding-space pruning pass of a
    * curation pipeline (mislabeled / noisy examples sit far from their
    * class centroid): rank each label's members by cosine similarity to the
    * label centroid ASCENDING and keep the `k` least similar.
    *
    * The centroid is the exact DECIMAL per-dimension sum (cosine is
    * scale-invariant, so the un-divided sum ranks identically to the mean
    * and is partition-order-independent — the same idiom [[ivfTopK]] proves
    * against its hash oracle). Centroids (label-count rows) broadcast onto
    * the corpus scan: the embedding table NEVER shuffles on the similarity
    * path; the only corpus-sized exchange is the per-label rank window.
    *
    * @return (label, rk, vec_id) for the k most-outlying members per label */
  def labelOutliers(emb: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cent = emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum(col("v").cast("decimal(27,10)")).as("cv"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
      .select(col("label").as("c_label"),
        transform(col("ps"), p => p.getField("cv").cast("float")).as("centroid"))
    val centN = cent.withColumn("cent_nrm",
      sqrt(dotF(col("centroid"), col("centroid"))))
    emb.join(broadcast(centN), col("label") === col("c_label"))
      .select(col("label"), col("vec_id"),
        (dotF(col("embedding"), col("centroid")) /
          (sqrt(dotF(col("embedding"), col("embedding"))) * col("cent_nrm"))).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("sim").asc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("label"), col("rk"), col("vec_id"))
  }

  /** Exact integer dot product of two int-code arrays (products in Long). */
  private def dotI(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => (p * q).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** MMR diversity re-ranking (Carbonell & Goldstein, SIGIR 1998) over a
    * retrieval SHORTLIST: greedily select `k` items maximizing
    * `a·relevance − b·max-similarity-to-already-selected`, so the result
    * list covers the query's distinct aspects instead of k near-duplicates
    * — the de-redundancy step after [[rrfFuse]]-style retrieval, and the
    * diversity pass over few-shot example pools.
    *
    * Exactness: relevance is an integer the caller supplies (a fused RRF
    * score, an inverted rank), similarity is the exact integer dot of
    * [[quantizeInt8]] codes, and the selection value `a·rel − b·maxsim` is
    * pure Long arithmetic with ties broken on doc_id — every pick is
    * bit-identical on any engine/partitioning, which is what lets the
    * greedy loop carry a full SQL hash oracle (steps unrolled as CTEs).
    *
    * Shape at scale: MMR is inherently sequential (pick i depends on picks
    * 1..i−1) and runs on a SHORTLIST — the candidate frame is pinned once,
    * then each of the k steps is one tiny distributed argmax (shortlist ×
    * selected-so-far dots, a TakeOrdered) with one driver row per step.
    * Diversifying a full corpus is a misuse; retrieve first, then MMR the
    * top-N.
    *
    * @param cands (doc_id, rel: long, q: array&lt;int&gt;) — the shortlist
    * @param a,b   the integer λ trade-off (value = a·rel − b·maxsim)
    * @return (step, doc_id, value) — step = 1-based pick order */
  def mmrSelect(cands: DataFrame, k: Int, a: Long = 1L, b: Long = 1L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(a >= 0 && b >= 0 && (a > 0 || b > 0), s"bad trade-off ($a, $b)")
    val spark = cands.sparkSession
    import spark.implicits._
    val c = cands.select(col("doc_id").cast("long").as("doc_id"),
      col("rel").cast("long").as("rel"), col("q")).localCheckpoint(true)
    var picks = Vector.empty[(Long, Long, Long)] // (step, doc_id, value)
    var step = 1
    while (step <= k) {
      val selIds = picks.map(_._2)
      val rest = if (selIds.isEmpty) c else c.filter(!col("doc_id").isin(selIds: _*))
      val scored =
        if (selIds.isEmpty)
          rest.select(col("doc_id"), (lit(a) * col("rel")).as("value"))
        else {
          val sel = c.filter(col("doc_id").isin(selIds: _*))
            .select(col("q").as("s_q"))
          rest.crossJoin(sel)
            .select(col("doc_id"), col("rel"), dotI(col("q"), col("s_q")).as("sim"))
            .groupBy("doc_id", "rel").agg(max(col("sim")).as("maxsim"))
            .select(col("doc_id"),
              (lit(a) * col("rel") - lit(b) * col("maxsim")).as("value"))
        }
      val top = scored.orderBy(col("value").desc, col("doc_id")).limit(1).collect()
      if (top.isEmpty) step = k + 1 // shortlist exhausted: stop launching jobs
      else {
        picks :+= ((step.toLong, top(0).getLong(0), top(0).getLong(1)))
        step += 1
      }
    }
    // the picks are driver-local rows — the shortlist checkpoint is dead
    graft.util.Blocks.freeCheckpoint(c)
    picks.toDF("step", "doc_id", "value")
  }
}
