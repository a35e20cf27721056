package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every probe row (key, pts), the most recent event row
  * (key, ts <= pts) — the temporal lookup Spark has no native operator for
  * (builder-prompt list; reference has no temporal logic at all).
  *
  * Implementation is the scale-path union trick, NOT a join: events and
  * probes are unioned into one keyed timeline, sorted once per key, and a
  * running `last(..., ignoreNulls)` carries each event's payload forward to
  * the probes that follow it. Cost is one shuffle on the key + one sort —
  * linear in |events| + |probes| — versus the naive join-then-rank whose
  * intermediate is |probes| × |events-per-key|.
  *
  * Tie semantics: an event AT the probe timestamp counts (ts <= pts);
  * among events with identical ts the highest `ordCol` wins. Probes with
  * no prior event keep null payloads (left-join semantics).
  */
object AsOfJoin {

  /** probes(key, pts, extra...) asof events(key, ts, ordCol ∈ payload...)
    * → one row per probe: (key, pts, extra..., asof_<payload>...). */
  def asOf(probes: DataFrame, events: DataFrame,
           key: String, pts: String, ts: String, ordCol: String,
           payload: Seq[String]): DataFrame = {
    val probeExtra = probes.columns.filterNot(c => c == key || c == pts).toSeq
    def nullOf(df: DataFrame, c: String) = lit(null).cast(df.schema(c).dataType)

    // the payload travels as ONE struct through a SINGLE last(ignoreNulls):
    // per-column last() calls would each skip nulls independently, so a
    // legitimately-NULL payload field on the newest event could get
    // back-filled from an OLDER event, mixing fields across events
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payload.map(c => events.schema(c).copy(name = c)))
    val evSide = events.select(
      (Seq(col(key), col(ts).as("_t"), lit(0).as("_kind"),
        col(ordCol).as("_ord"), struct(payload.map(col): _*).as("_p")) ++
        probeExtra.map(c => nullOf(probes, c).as(s"_q_$c"))): _*)
    val prSide = probes.select(
      (Seq(col(key), col(pts).as("_t"), lit(1).as("_kind"),
        nullOf(events, ordCol).as("_ord"),
        lit(null).cast(payloadStructType).as("_p")) ++
        probeExtra.map(c => col(c).as(s"_q_$c"))): _*)

    // events sort before probes at equal t (_kind 0 < 1); among events at
    // equal t the highest _ord is last, so the running last() picks it
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_kind"), col("_ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evSide.unionByName(prSide)
      .select(
        col(key) +: col("_t") +: col("_kind") +:
          last(col("_p"), ignoreNulls = true).over(w).as("_pl") +:
          probeExtra.map(c => col(s"_q_$c").as(c)): _*)
      .filter(col("_kind") === 1)
      .select(
        col(key) +: col("_t") +:
          (payload.map(c => col("_pl").getField(c).as(s"asof_$c")) ++
            probeExtra.map(col)): _*)
      .withColumnRenamed("_t", pts)
  }
}
