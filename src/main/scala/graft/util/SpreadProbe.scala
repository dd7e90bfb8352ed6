package graft.util

/** Driver-side counter of `.rdd` physical-planning probes taken by the
  * scale-adaptive scan wideners ([[graft.ext.Dedup.spread]] and
  * [[graft.model.Envelopes.widen]]) — instrumentation for the scale guard:
  * a FILE-BACKED input must decide on metadata alone (`inputFiles`), never
  * by physically planning the lineage on the driver. `SpreadSpec` /
  * `WidenSpec` assert file inputs never increment this. */
object SpreadProbe {
  val hits = new java.util.concurrent.atomic.AtomicLong(0L)
}
