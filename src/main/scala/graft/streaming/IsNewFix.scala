package graft.streaming

import java.time.{Instant, ZoneOffset}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T5 — keyed-state new-visitor repair, streaming form
  * (`DwdBaseLog.isNewFix:135-183`, rules :154-178).
  *
  * Keyed `first_login_dt` state per device id, exactly the reference's
  * `ValueState<String>`:
  *   - `is_new=1`, no state        → store today, keep 1
  *   - `is_new=1`, state == today  → keep 1
  *   - `is_new=1`, state != today  → rewrite to 0
  *   - `is_new=0`, no state        → backfill yesterday (an old visitor from
  *                                    before the log system), keep 0
  *   - `is_new=0`, state set       → keep 0
  *
  * Scale: state is one short string per mid behind a hash shuffle on mid —
  * the same layout the reference holds in its HashMap state backend. Events
  * inside a micro-batch are applied in (ts, event_id) order so results are
  * deterministic and equal to [[graft.ops.Stateful.isNewFixBatch]] on a
  * complete replay.
  */
object IsNewFix {

  final case class LogEvent(mid: String, is_new: String, ts: Long, event_id: Long)
  final case class FixedEvent(mid: String, is_new: String, ts: Long,
      event_id: Long, is_new_fixed: String)

  private def day(tsMs: Long): String =
    Instant.ofEpochMilli(tsMs).atZone(ZoneOffset.UTC).toLocalDate.toString

  private def yesterday(tsMs: Long): String =
    Instant.ofEpochMilli(tsMs).atZone(ZoneOffset.UTC).toLocalDate.minusDays(1).toString

  def fixGroup(mid: String, events: Iterator[LogEvent],
      state: GroupState[String]): Iterator[FixedEvent] = {
    val sorted = events.toSeq.sortBy(e => (e.ts, e.event_id))
    var st = state.getOption.orNull
    val out = sorted.map { e =>
      val today = day(e.ts)
      val fixed =
        if (e.is_new == "1") {
          if (st == null) { st = today; "1" }
          else if (st == today) "1"
          else "0"
        } else {
          if (st == null) st = yesterday(e.ts)
          "0"
        }
      FixedEvent(e.mid, e.is_new, e.ts, e.event_id, fixed)
    }
    if (st != null) state.update(st)
    out.iterator
  }

  /** Apply the repair to a (possibly streaming) Dataset of log events. */
  def apply(events: Dataset[LogEvent])(implicit spark: SparkSession): Dataset[FixedEvent] = {
    import spark.implicits._
    events.groupByKey(_.mid)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fixGroup)
  }
}
