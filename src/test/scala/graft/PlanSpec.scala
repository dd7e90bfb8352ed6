package graft

/** Physical-plan regression guards: the scale properties the engine promises
  * (broadcast dims, pruned scans, partial aggregation, no cartesian joins on
  * keyed paths) must survive refactors. String-level checks on the executed
  * plan keep them cheap and intent-revealing. */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir("sf0.001")).queryExecution.executedPlan.toString

  test("lookup joins broadcast the dim side") {
    assert(plan("q_join_lookup").contains("BroadcastHashJoin"))
    assert(plan("q_dws_sku").contains("BroadcastHashJoin"))
    // the config join's `table` column is a literal in the envelope fixture,
    // so Catalyst folds the equi-condition into a right-side filter and the
    // join degenerates to a broadcast of the (filtered, 1-row) config — a
    // broadcast either way; it must never shuffle the stream side
    val p = plan("q_join_broadcast")
    assert(p.contains("Broadcast") && !p.contains("SortMergeJoin"))
  }

  test("the big-dim lookup never broadcasts: shuffle-merge join by construction") {
    val p = plan("q_join_lookup_big")
    assert(!p.contains("BroadcastExchange"),
      "DimCache dim side must stay shuffle-side (the dim is 'too big to broadcast')")
    assert(p.contains("SortMergeJoin"), p.take(800))
  }

  test("shuffle contamination never broadcasts the eval side") {
    // the whole point of the variant is eval suites past the broadcast
    // budget — a tiny test fixture must not silently flip the plan back
    // (the LSH cross-join deliberately leaves its band join to AQE: both
    // sides are corpus-derived and big at real widths, so no plan pin)
    val p = plan("q_contamination_shuffle")
    assert(!p.contains("BroadcastExchange"),
      "eval side must stay shuffle-side:\n" + p.take(800))
    assert(p.contains("SortMergeJoin"), p.take(800))
  }

  test("per-source quota cap pre-prunes map-side (WindowGroupLimit)") {
    val p = plan("q_source_cap")
    assert(p.contains("WindowGroupLimit"),
      "rank<=k filter must push a partial top-k below the shuffle:\n" + p.take(800))
  }

  test("scans are column-pruned") {
    // envelope queries read lineitem: the scan must not include money columns
    // it never uses
    val p = plan("q_route_filter")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"), "unused column not pruned from scan")
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    val p = plan("q_dws_province")
    assert(p.contains("partial_count"), p.take(500))
  }

  test("the interval join keeps an equi-key (no cartesian product)") {
    val p = plan("q_join_interval")
    assert(!p.contains("CartesianProduct"), "interval join degraded to cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "interval join lost its equi-key")
  }

  test("pay-suc composite: keyed interval join + broadcast dim, fact shuffled once") {
    val p = plan("q_dwd_pay_suc")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "payment interval join must stay keyed on order_id")
    assert(p.contains("BroadcastHashJoin"), "dic lookup must broadcast the dim side")
  }

  test("base-log composite: one keyed window, no join machinery") {
    val p = plan("q_dwd_base_log")
    assert(p.contains("Window"), "is_new repair must be a keyed window")
    assert(!p.contains("Join"), "the log pipeline must not introduce joins")
  }

  test("pure range join stays a hash join on the bin key (no nested loop)") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join degraded to a nested loop")
    assert(p.contains("Join"), "bin bucketing must still join")
  }

  test("winnowing: one keyed window, no cross-document join") {
    val p = plan("q_winnow")
    assert(p.contains("Window"), "window-min selection must be a keyed window")
    assert(!p.contains("Join"), "fingerprinting must not join documents")
  }

  test("contamination screen broadcasts the eval side — the corpus never shuffles for the join") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), "eval shingles must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the train corpus must not shuffle into the screen join")
  }

  test("PII scrub is scan-stage work: no shuffle beyond the dump sort, no join") {
    val p = plan("q_pii_scrub")
    assert(!p.contains("Join"), "redaction must not join")
    // exactly one exchange: the verify-protocol ORDER BY's range partitioning
    assert(p.split("Exchange").length - 1 <= 1, p.take(600))
  }

  test("span-dup stats never form pairs: aggregations only, no pairwise join fan-out") {
    val p = plan("q_span_dup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "cross-doc span stats degraded to pairwise work")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "doc-frequency rollup must aggregate, not enumerate pairs")
  }

  test("global prefix-sum: corpus window is chunk-keyed, offsets broadcast back") {
    val p = plan("q_token_budget")
    // the corpus-sized running sum must be partitioned by the chunk id —
    // an empty partition spec here would funnel 100 TB through one task
    assert("""Window \[[^\]]*windowspecdefinition\(pid#""".r.findFirstIn(p).isDefined,
      "corpus running sum lost its chunk partitioning:\n" + p.take(800))
    assert(p.contains("BroadcastHashJoin"), "chunk offsets must broadcast, not shuffle")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the corpus must not shuffle for the offset join")
  }

  test("temperature mix: per-source rates broadcast — the corpus never shuffles") {
    val p = plan("q_temp_mix")
    assert(p.contains("BroadcastHashJoin"), "rate table must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the corpus must not shuffle into the rate join")
  }

  test("shard shuffle: position ranks run per shard, never globally") {
    val p = plan("q_shard_shuffle")
    assert("""windowspecdefinition\(shard#""".r.findFirstIn(p).isDefined,
      "shard positions lost their per-shard partitioning:\n" + p.take(800))
  }

  test("int8 quantization is scan-stage work: no shuffle beyond the dump sort, no join") {
    val p = plan("q_embed_quant")
    assert(!p.contains("Join"), "quantization must not join")
    assert(p.split("Exchange").length - 1 <= 1, p.take(600))
  }

  test("span removal: linear aggregations, never a pairwise or nested-loop join") {
    val p = plan("q_strip_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "span removal is window+rollup only — a join means the shape regressed")
  }

  test("bm25: corpus stats broadcast; top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q_bm25")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row stats must broadcast onto the scan")
  }

  test("profile: one pass — a single scan of the table feeds every column's stats") {
    val p = plan("q_profile")
    assert(p.split("FileScan").length - 1 == 1,
      "profile must scan the table exactly once:\n" + p.take(800))
  }

  test("negative pairs: bucket-local windows + one equi self-join, no cartesian") {
    val p = plan("q_neg_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(600))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "ring pairing must stay an equi join")
  }

  test("zorder value is scan-stage arithmetic: no shuffle beyond the dump sort") {
    val p = plan("q_zorder")
    assert(!p.contains("Join"), "zorder must not join")
    assert(p.split("Exchange").length - 1 <= 1, p.take(600))
  }

  test("SRP-LSH pairs: band-bucket equi joins only — never a cartesian") {
    // the exhaustive twin (q_embed_dup) IS a cartesian by design; the scale
    // path must never degrade to one, or LSH buys nothing at 100 TB
    val p = plan("q_embed_dup_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "SRP candidate generation must stay an equi join on (band, bval):\n" + p.take(800))
  }

  test("matryoshka truncation is scan-stage work: no shuffle beyond the dump sort, no join") {
    val p = plan("q_embed_matryoshka")
    assert(!p.contains("Join"), "matryoshka must not join")
    assert(p.split("Exchange").length - 1 <= 1, p.take(600))
  }

  test("DSIR screen: both unigram models broadcast — the corpus never shuffles on a model join") {
    val p = plan("q_dsir_screen")
    assert(p.contains("BroadcastHashJoin"), "model joins must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the raw corpus must not shuffle into the model joins:\n" + p.take(800))
    // model builds are partially aggregated before their exchanges (the
    // bucket shuffle carries <= buckets rows per map task, not the corpus)
    assert(p.contains("partial_count") || p.contains("partial count"),
      "bucket models must combine map-side:\n" + p.take(800))
  }

  test("hashed linear classifier: weight table broadcasts, one corpus exchange") {
    val p = plan("q_quality_clf")
    assert(p.contains("BroadcastHashJoin"), "the weight table must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the corpus must not shuffle into the weight join:\n" + p.take(800))
  }

  test("bloom screen: position probes broadcast — the train corpus never shuffles") {
    val p = plan("q_bloom_decon")
    assert(p.contains("BroadcastHashJoin"), "bit-table probes must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the train shingles must not shuffle into the probes:\n" + p.take(800))
  }

  test("unimax: water-filling attaches broadcast — the corpus never shuffles for the allocation") {
    val p = plan("q_unimax")
    assert(p.contains("BroadcastHashJoin"), "the language allocation must broadcast")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere:\n" + p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the corpus must not shuffle into the allocation join:\n" + p.take(800))
  }

  test("kmv sketch: rank-limit pre-prunes map-side (WindowGroupLimit), state O(k) per group") {
    val p = plan("q_kmv_distinct")
    assert(p.contains("WindowGroupLimit"),
      "the rank<=k filter must push into a map-side group limit:\n" + p.take(800))
  }

  test("cms sketch: map-side-combined cell counts; probe lookup is a hash join") {
    val p = plan("q_cms_freq")
    assert(p.contains("partial_count"),
      "cell counts must partial-aggregate before the shuffle:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the d-cell probe lookup joins two bounded tables on (g, cell) — a
    // hash join, never a nested loop (the only BNLJ is the 3x20 probe spine)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "probe-cell lookup must be an equi hash join:\n" + p.take(800))
  }

  test("hll sketch: register max partial-aggregates map-side, no cartesian") {
    val p = plan("q_hll_distinct")
    assert(p.contains("partial_max"),
      "register max must partial-aggregate before the shuffle:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("pq: codebook broadcasts onto the corpus scan; ADC lookups broadcast") {
    // q_pq_train/q_pq_topk return checkpointed frames (their executed plan
    // is an RDD scan), so pin the OPERATOR plans directly
    import org.apache.spark.sql.functions.col
    val e = graft.model.Envelopes.table(spark, sfDir("sf0.001"), "embeddings")
    val books = graft.ext.Similarity.pqCodebooks(e, m = 4, k = 16, iters = 1)
    val enc = graft.ext.Similarity.pqEncode(e, books, m = 4)
    val t = enc.queryExecution.executedPlan.toString
    assert(t.contains("BroadcastHashJoin"),
      "the <= m*k-row codebook must broadcast for assignment:\n" + t.take(800))
    assert(!t.contains("CartesianProduct"), t.take(800))
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val p = graft.ext.Similarity.pqTopK(qs, books, enc, m = 4, topK = 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the m distance-table lookups must broadcast:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // IVFADC: the centroid table and the probed-cell list broadcast too —
    // the corpus side of the fine stage is the pivoted code table only
    val ip = graft.ext.Similarity.ivfPqTopK(qs, e, books, enc, m = 4,
        topK = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(ip.contains("BroadcastHashJoin") &&
      !ip.contains("CartesianProduct"), ip.take(800))
    graft.util.Blocks.freeCheckpoint(books)
  }

  test("store-backed IVFADC search: lookups broadcast, no product joins") {
    import org.apache.spark.sql.functions.col
    val e = graft.model.Envelopes.table(spark, sfDir("sf0.001"), "embeddings")
    val books = graft.ext.Similarity.pqCodebooks(e, m = 4, k = 16, iters = 1)
    val root = java.nio.file.Files.createTempDirectory("plan_ivf").toString
    graft.streaming.IncrementalIvf.mergeBatch(e, s"$root/ix", books,
      batchId = 0L)
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val search = graft.streaming.IncrementalIvf.search(spark, s"$root/ix",
      qs, books, m = 4, topK = 5, nProbe = 2)
    val p = search.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      "distance tables and probes must broadcast over the code scan:\n" +
        p.take(800))
    // the fine stage scans CODES: the only plan leaves carrying a float
    // embedding column are the query probe's own reads — the store never
    // hands back a vector
    val leaves = search.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
    val vecScans = leaves.count(l => l.contains("embedding") &&
      l.contains("parquet"))
    assert(vecScans <= 2, // qs is derived twice (probe + subvector split)
      s"store search must not scan float vectors beyond the query side " +
        s"($vecScans embedding parquet scans):\n" + leaves.mkString("\n").take(800))
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Tmp.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("triangles: oriented wedge build and closure probe are equi joins only") {
    val p = plan("q_triangles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "wedge/closure must never degrade to a product:\n" + p.take(800))
  }

  test("cdc chunking is pure window work: no join machinery at all") {
    val p = plan("q_cdc_chunk")
    assert(!p.contains("Join"), "no joins of any kind:\n" + p.take(800))
  }

  test("lm surprise: both LM bucket models broadcast, corpus exchange only at the doc rollup") {
    val p = plan("q_lm_surprise")
    assert(p.contains("BroadcastHashJoin"), "LM models must broadcast")
    // the doc-spine re-anchor joins two doc-keyed sides and may legally
    // shuffle; the MODEL probes must not. Count the shuffle-join operators:
    // at most the one spine join.
    val smj = "SortMergeJoin".r.findAllIn(p).size + "ShuffledHashJoin".r.findAllIn(p).size
    assert(smj <= 1, s"expected at most the spine join to shuffle, got $smj:\n" + p.take(800))
  }

  test("prefix AllPairs: equi joins only — candidates never form a cartesian or nested loop") {
    val p = plan("q_dedup_ngram_prefix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the prefix self-join and verify joins must all stay equi:\n" + p.take(800))
  }

  test("framed histogram: fixed frame needs no stats join — aggregations and windows only") {
    // the frame-derived variant (q_hist_quantile) pays a broadcast stats
    // join; the FIXED frame folds the bin math into the scan, so the whole
    // plan is joinless — the property that makes it mergeable cross-batch
    val p = plan("q_hist_framed")
    assert(!p.contains("Join"), "no join machinery at all:\n" + p.take(800))
    assert(p.contains("partial_count"), "bin counts must map-side combine:\n" + p.take(500))
  }

  test("chunk-level dedup adds one fp-keyed window to the chunker — still no joins") {
    val p = plan("q_cdc_chunk_dedup")
    assert(!p.contains("Join"), "no joins of any kind:\n" + p.take(800))
  }

  test("dq check: k rules = one scan, one partial/final aggregate, no Expand, no joins") {
    val p = plan("q_dq_check")
    assert(!p.contains("Join") && !p.contains("Expand"),
      "the whole rule suite must ride one aggregate pass:\n" + p.take(800))
    assert("Scan ".r.findAllIn(p).size <= 1,
      "four rules must not rescan the table:\n" + p.take(800))
    assert(p.contains("partial_"), "violation counts must map-side combine")
  }

  test("cov components: all pairs from ONE table scan, no joins, no Expand") {
    val p = plan("q_cov")
    assert(!p.contains("Join") && !p.contains("Expand"),
      "power sums must not multiply the scan:\n" + p.take(800))
    assert("Scan ".r.findAllIn(p).size <= 1,
      "six pairs must share one lineitem scan:\n" + p.take(800))
  }

  test("join preflight: top-K via TakeOrdered, never a global window or the join itself") {
    val p = plan("q_join_preflight")
    assert(p.contains("TakeOrderedAndProject"),
      "top keys must use the distributed top-K operator:\n" + p.take(800))
    assert(!p.contains("Window"),
      "no global window over the key table:\n" + p.take(800))
  }

  test("cep variants: negation pre-filters the widened type set; strict does NOT filter") {
    // negation: the scan must push ONE IN over pattern ∪ banned types
    val neg = plan("q_cep_neg")
    assert(neg.contains("PushedFilters") && neg.contains("In(event_type"),
      "negation scan must push the type IN:\n" + neg.take(800))
    // strict contiguity: ANY event is state-relevant — a type filter here
    // would silently restore relaxed semantics
    val nxt = plan("q_cep_next")
    assert(!nxt.contains("In(event_type"),
      "strict scan must NOT pre-filter event types:\n" + nxt.take(800))
    // round 10: the A-next-B shape routes to the window-lead plan (the
    // fold would show an ObjectHashAggregate over collect_list instead)
    assert(nxt.contains("Window"),
      "A-next-B must take the window-lead plan:\n" + nxt.take(800))
    assert(!nxt.contains("collect_list"),
      "A-next-B must not build per-key event arrays:\n" + nxt.take(800))
    // both stay the one-key-shuffle automaton shape: no joins
    assert(!neg.contains("Join") && !nxt.contains("Join"))
    // predicate stages: the operator cannot pre-filter (opaque SQL), so
    // the CALL SITE must — q_cep_where's implied type IN reaches the scan
    val whr = plan("q_cep_where")
    assert(whr.contains("PushedFilters") && whr.contains("In(event_type"),
      "q_cep_where's call-site type IN must reach the scan:\n" + whr.take(800))
    assert(!whr.contains("Join"))
  }

  test("cep relaxed class: the SORTED-ITERATOR plan — no per-key collect_list array") {
    // round 11: long-keyed patternMatches/patternMatchesTimes route to
    // flatMapSortedGroups — one key shuffle + a SPILLABLE sort; the fold's
    // collect_list would pin the busiest key's whole event array instead
    for (q <- Seq("q_cep", "q_cep_times", "q_cep_opt", "q_cep_where")) {
      val p = plan(q)
      assert(!p.contains("collect_list"),
        s"$q must not build per-key event arrays:\n" + p.take(800))
      assert(p.contains("FlatMapGroups") || p.contains("MapGroups"),
        s"$q must stream groups through the automaton:\n" + p.take(800))
      assert(p.contains("PushedFilters") && p.contains("In(event_type"),
        s"$q keeps the pushed type IN:\n" + p.take(800))
      assert(!p.contains("Join"), s"$q stays join-free:\n" + p.take(800))
    }
    // strict/negation route too: notnext keeps the UNFILTERED scan (every
    // event is state-relevant), neg keeps the widened pattern ∪ banned IN
    for (q <- Seq("q_cep_notnext", "q_cep_neg")) {
      val p = plan(q)
      assert(!p.contains("collect_list"),
        s"$q must not build per-key event arrays:\n" + p.take(800))
      assert(p.contains("FlatMapGroups") || p.contains("MapGroups"),
        s"$q must stream groups through the automaton:\n" + p.take(800))
    }
    assert(!plan("q_cep_notnext").contains("In(event_type"),
      "strict scan must NOT pre-filter event types")
    // consecutive loops share strictness's scan rule: ANY event can
    // break a loop, so no type pre-filter — and still no per-key array
    val consec = plan("q_cep_consec")
    assert(!consec.contains("In(event_type"),
      "consecutive-loop scan must NOT pre-filter event types")
    assert(!consec.contains("collect_list") &&
      (consec.contains("FlatMapGroups") || consec.contains("MapGroups")),
      "q_cep_consec streams groups through the automaton:\n" +
        consec.take(800))
    // round 12: the LAST two fold holdouts route too — skip-to-next runs
    // the shared run-set stepper, iter runs analyzer-bound predicates in
    // the streamed group; neither may collect the key's event array
    for (q <- Seq("q_cep_skipnext", "q_cep_iter", "q_cep_skipto")) {
      val p = plan(q)
      assert(!p.contains("collect_list"),
        s"$q must not build per-key event arrays:\n" + p.take(800))
      assert(p.contains("FlatMapGroups") || p.contains("MapGroups"),
        s"$q must stream groups through the automaton:\n" + p.take(800))
      assert(p.contains("PushedFilters") && p.contains("In(event_type"),
        s"$q keeps the pushed type IN:\n" + p.take(800))
      assert(!p.contains("Join"), s"$q stays join-free:\n" + p.take(800))
    }
  }

  test("hits: no cartesian anywhere; final hub-authority combine is an equi join") {
    // the per-half-step plans (edge join + broadcast max attach) sit behind
    // per-iteration checkpoints — the visible plan is the final combine
    val p = plan("q_hits")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no product joins anywhere in the visible plan:\n" + p.take(800))
    assert(p.contains("Join"), "the hub-authority combine is a join:\n" + p.take(400))
  }
}
