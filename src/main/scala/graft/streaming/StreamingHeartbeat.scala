package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A heartbeat record: any keyed event stream reduced to (key, ts). */
case class Heartbeat(key: Long, ts: Timestamp)

/** A detected silence: `key` stopped emitting at `last_ts`; the gap was
  * declared once the event-time watermark passed `last_ts + gap`. */
case class Silence(key: Long, last_ts: Timestamp, n_beats: Long)

/** Per-key detector state: last beat instant + beats since (re)arm.
  * Top-level so the state encoder's generated code can construct it. */
case class HeartbeatSeen(lastMs: Long, n: Long)

/** Missed-heartbeat / silence detection — the streaming twin of the
  * batch gap-fill family ([[graft.operators.Temporal.gapFill]]): instead
  * of materializing empty buckets after the fact, emit a record the
  * moment a key's stream goes quiet for more than `gapMs` of EVENT time.
  *
  * This is the one stateful pattern the engine had not yet exercised:
  * `EventTimeTimeout`. The state keeps only (last_ts, count) per key —
  * O(keys), not O(events) — and the watermark both bounds the state and
  * CLOCKS the timeouts: a timeout fires when the watermark (not wall
  * time) passes the registered instant, so detection is deterministic
  * under replay, backfill, and reprocessing — wall-clock timers
  * (ProcessingTimeTimeout) would fire differently every run.
  *
  * Scale shape: one shuffle on the key (the groupByKey); state store
  * holds one small row per live key; keys that time out are REMOVED, so
  * a churning key population doesn't accrete state.
  */
object StreamingHeartbeat {

  /** `beats` must carry a watermark on `ts` (the caller picks the
    * lateness bound); emits one [[Silence]] per detected gap and
    * re-arms if the key later resumes. */
  def silences(beats: Dataset[Heartbeat], gapMs: Long): Dataset[Silence] = {
    implicit val outEnc = Encoders.product[Silence]
    implicit val stateEnc = Encoders.product[HeartbeatSeen]
    implicit val keyEnc = Encoders.scalaLong
    beats.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Heartbeat], state: GroupState[HeartbeatSeen]) =>
          if (state.hasTimedOut) {
            // watermark passed last_ts + gap with no new beats: the gap
            // is real (no on-time event can precede it anymore)
            val s = state.get
            state.remove()
            Iterator.single(Silence(key, new Timestamp(s.lastMs), s.n))
          } else {
            val prev = state.getOption
            val beats = it.toArray
            val next = HeartbeatSeen(
              math.max(prev.map(_.lastMs).getOrElse(Long.MinValue),
                beats.iterator.map(_.ts.getTime).max),
              prev.map(_.n).getOrElse(0L) + beats.length)
            state.update(next)
            state.setTimeoutTimestamp(next.lastMs + gapMs)
            Iterator.empty
          }
      }
  }
}
