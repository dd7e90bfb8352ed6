package graft.streaming

import java.time.{Instant, ZoneId, ZoneOffset}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** T5 on the MODERN state API: the same new-visitor repair as [[IsNewFix]],
  * expressed as a Spark 4 `StatefulProcessor` for
  * `KeyValueGroupedDataset.transformWithState` — typed named state
  * (`ValueState[String]`, the literal shape of the reference's Flink
  * `ValueState<String>` at `DwdBaseLog.java:141`), RocksDB-backed, with
  * per-state TTL and timers available where `flatMapGroupsWithState` offers
  * only one opaque state object and one timeout.
  *
  * Both implementations are kept deliberately: `flatMapGroupsWithState` runs
  * on every state store provider (and is the form the rest of the engine
  * uses); this one is the forward path — `transformWithState` requires the
  * RocksDB provider, which `IsNewFixTwsSpec` configures per query. The spec
  * pins record-for-record parity between the two on a multi-batch stream.
  */
object IsNewFixTws {
  import IsNewFix.{LogEvent, FixedEvent}

  private def day(tsMs: Long, zone: ZoneId): String =
    Instant.ofEpochMilli(tsMs).atZone(zone).toLocalDate.toString

  private def yesterday(tsMs: Long, zone: ZoneId): String =
    Instant.ofEpochMilli(tsMs).atZone(zone).toLocalDate.minusDays(1).toString

  /** The reference's repair rules over a named ValueState. Same group
    * buffering + (ts, event_id) sort as [[IsNewFix.fixGroup]] — outputs
    * depend on the state the group's first event establishes. */
  final class Processor(zone: ZoneId)
      extends StatefulProcessor[String, LogEvent, FixedEvent] {
    @transient private var firstLoginDt: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      firstLoginDt = getHandle.getValueState[String](
        "first_login_dt", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(mid: String, rows: Iterator[LogEvent],
        timerValues: TimerValues): Iterator[FixedEvent] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
      var st = if (firstLoginDt.exists()) firstLoginDt.get() else null
      val st0 = st
      val out = sorted.map { e =>
        val today = day(e.ts, zone)
        val fixed =
          if (e.is_new == "1") {
            if (st == null) { st = today; "1" }
            else if (st == today) "1"
            else "0"
          } else {
            if (st == null) st = yesterday(e.ts, zone)
            "0"
          }
        FixedEvent(e.mid, e.is_new, e.ts, e.event_id, fixed)
      }
      if (st != null && st != st0) firstLoginDt.update(st)
      out.iterator
    }
  }

  /** Apply the repair via transformWithState. Works on batch Datasets too
    * (Spark plans a local state pass), but the intended form is streaming
    * with the RocksDB provider. */
  def apply(events: Dataset[IsNewFix.LogEvent])(
      implicit spark: SparkSession): Dataset[IsNewFix.FixedEvent] = {
    import spark.implicits._
    val zone = ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone", ZoneOffset.UTC.getId))
    events.groupByKey(_.mid)
      .transformWithState(new Processor(zone), TimeMode.None(), OutputMode.Append())
  }
}
