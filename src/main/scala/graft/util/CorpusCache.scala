package graft.util

import org.apache.spark.sql.SparkSession

/** Access-ordered LRU of shared per-(session, corpus dir) state; evicted
  * values are released via `free`. ONE implementation for every memo that
  * pins checkpointed per-corpus intermediates (the dedup SharedIndex, the
  * cosine-pair baseline, the trade-graph edge table) so the cap and the
  * eviction contract cannot drift between call sites.
  *
  * Contract: a released value recomputes on its NEXT accessor call, but
  * frames it handed out BEFORE the release are invalidated (a
  * localCheckpoint's blocks ARE its data) — so consume a corpus's query
  * frames before touching `CorpusCache.Cap + 1` OTHER corpora in the same
  * session. Every driver in this repo (Verify, Bench, the probes) consumes
  * dir-by-dir and never comes close; a consumer that must hold frames
  * across many dirs should build its own state and control release itself.
  * All access synchronizes on the map. */
final class CorpusCache[V](free: V => Unit) {
  private val m = new java.util.LinkedHashMap[(SparkSession, String), V](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[(SparkSession, String), V]): Boolean =
      if (size() > CorpusCache.Cap) { free(e.getValue); true } else false
  }
  def get(s: SparkSession, dir: String)(mk: => V): V = m.synchronized {
    val k = (s, dir)
    val cur = m.get(k)
    if (cur != null) cur else { val v = mk; m.put(k, v); v }
  }
}

object CorpusCache {
  /** How many corpora keep their shared intermediates pinned at once. A
    * verify/bench pass runs every query against ONE dir, so even the
    * tri-scale sweep (three dirs, visited dir-by-dir) never evicts a
    * corpus it is still consuming; longer multi-dir sessions evict the
    * coldest instead of accumulating checkpoint blocks for the session
    * lifetime (the round-6 advisor finding). */
  val Cap = 3
}
