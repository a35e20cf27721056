package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user funnel progress: first-view / first-click-after-view /
  * first-purchase-after-click timestamps. */
case class FunnelState(tv: Long, tc: Long, tp: Long) {
  def stage: Int = if (tp >= 0) 3 else if (tc >= 0) 2 else if (tv >= 0) 1 else 0
}

/** The per-user funnel stage after the latest arrival (re-emitted each
  * micro-batch the user appears in — update semantics). */
case class FunnelProgress(user_id: Long, stage: Int)

/** Streaming twin of GraphPack's q119 ordered funnel: the batch side is a
  * chain of grouped mins (first view, first click after it, first purchase
  * after that); the stream keeps ONE three-timestamp state row per user
  * and advances it as events arrive. Within a micro-batch the group slice
  * is sorted by (ts, event_id) — processing each event against the chain
  * in time order reproduces the batch mins exactly for an in-order feed
  * (parity proven in StreamingGraphSpec, including a funnel cut across
  * the batch boundary).
  *
  * Scale shape: O(users) fixed-size state rows; per-batch work is one
  * sort per (user, batch) slice. The same at-least-once, in-order-feed
  * trade as StreamingTransitions. */
object StreamingFunnel {

  val Unset = -1L

  def progress(events: Dataset[TransitionEvent]): Dataset[FunnelProgress] = {
    implicit val outEnc = Encoders.product[FunnelProgress]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TransitionEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
          it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "view" if st.tv == Unset =>
                st = st.copy(tv = t)
              case "click" if st.tv != Unset && t > st.tv && st.tc == Unset =>
                st = st.copy(tc = t)
              case "purchase" if st.tc != Unset && t > st.tc && st.tp == Unset =>
                st = st.copy(tp = t)
              case _ => ()
            }
          }
          state.update(st)
          FunnelProgress(uid, st.stage)
      }
  }
}
