package graft.streaming

import org.apache.spark.sql.SparkSession

/** Selects the keyed-state implementation for operators that ship both a
  * legacy `flatMapGroupsWithState` form and a modern `transformWithState`
  * twin ([[IsNewFix]]/[[IsNewFixTws]], [[TtlState]]/[[TtlStateTws]] — each
  * pair pinned equal by a parity spec).
  *
  * `transformWithState` requires the RocksDB state-store provider, so the
  * default is AUTO: use the modern form exactly when the session's provider
  * is RocksDB, the legacy form otherwise (it runs on every provider).
  * `spark.graft.state.impl = tws|fmgws` overrides — e.g. to force the
  * legacy form during a staged rollout, or tws on a session that sets the
  * provider per query rather than globally.
  */
object StateImpl {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** true → dispatch to the transformWithState twin. */
  def useTws(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.state.impl") match {
      case Some("tws") => true
      case Some("fmgws") => false
      case Some(other) => throw new IllegalArgumentException(
        s"spark.graft.state.impl must be tws or fmgws, got '$other'")
      case None =>
        spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
          .contains(RocksDbProvider)
    }
}
