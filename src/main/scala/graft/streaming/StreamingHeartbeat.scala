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
  * O(keys), not O(events). A gap surfaces by EITHER path: the watermark
  * (not wall time) passing last_ts + gap fires the timeout for a key
  * that stays silent, and a key that RESUMES reports the gap
  * retroactively from the beat walk — so the set of detected gaps is a
  * function of the data alone, not of how the stream was micro-batched
  * (a wall-clock ProcessingTimeTimeout would fire differently every
  * run, and a timeout-only design would miss gaps whose resume lands in
  * the same batch).
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
            // walk the batch's beats in event order and emit every gap
            // RETROACTIVELY too: a key that resumes before its timeout
            // processed (one big replayed batch, a backfill) still
            // reports the silence — without this, detection would depend
            // on micro-batch boundaries instead of the data
            val beats = it.toArray.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[Silence]
            beats.foreach { b =>
              val t = b.ts.getTime
              cur match {
                case Some(HeartbeatSeen(last, n)) if t - last > gapMs =>
                  out += Silence(key, new Timestamp(last), n)
                  cur = Some(HeartbeatSeen(t, 1L))
                case Some(HeartbeatSeen(last, n)) =>
                  cur = Some(HeartbeatSeen(math.max(last, t), n + 1L))
                case None =>
                  cur = Some(HeartbeatSeen(t, 1L))
              }
            }
            val next = cur.get
            state.update(next)
            state.setTimeoutTimestamp(next.lastMs + gapMs)
            out.result().iterator
          }
      }
  }
}
