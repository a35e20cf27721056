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
    * → one row per probe: (key, pts, extra..., asof_<payload>...).
    *
    * `forward = true` flips the direction (earliest event with ts >= pts
    * — the "next reading" lookup); `tolerance` bounds the match
    * distance |pts - ts| in the timeline's long units (epoch MICROS for
    * timestamp axes, the raw value otherwise) — a probe whose nearest
    * event is farther keeps null payloads, pandas merge_asof semantics.
    * Both reuse the
    * same single-shuffle union timeline: forward runs the scan on the
    * NEGATED timeline, tolerance post-filters on the matched event's
    * own timestamp carried inside the payload struct. */
  def asOf(probes: DataFrame, events: DataFrame,
           key: String, pts: String, ts: String, ordCol: String,
           payload: Seq[String], forward: Boolean = false,
           tolerance: Option[Long] = None): DataFrame = {
    val probeExtra = probes.columns.filterNot(c => c == key || c == pts).toSeq
    def nullOf(df: DataFrame, c: String) = lit(null).cast(df.schema(c).dataType)

    // the payload travels as ONE struct through a SINGLE last(ignoreNulls):
    // per-column last() calls would each skip nulls independently, so a
    // legitimately-NULL payload field on the newest event could get
    // back-filled from an OLDER event, mixing fields across events
    // _et carries the matched event's axis value for the tolerance gate;
    // its type must track the axis family (double for fractional axes)
    val etType: org.apache.spark.sql.types.DataType =
      events.schema(ts).dataType match {
        case org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DoubleType |
             (_: org.apache.spark.sql.types.DecimalType) =>
          org.apache.spark.sql.types.DoubleType
        case _ => org.apache.spark.sql.types.LongType
      }
    val payloadStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_et", etType) +:
        payload.map(c => events.schema(c).copy(name = c)))
    // the timeline runs on a numeric axis so the forward direction is
    // just a negation: TIMESTAMP → epoch MICROS (a plain long cast would
    // truncate to seconds and silently change sub-second tie semantics),
    // DATE → epoch days, integral → long, fractional/decimal → double
    // (a long cast would truncate 1.9 to 1 and wrongly match a future
    // event to a backward probe at 1.5)
    val dir = if (forward) -1L else 1L
    def toLong(df: DataFrame, c: String) = {
      import org.apache.spark.sql.types._
      df.schema(c).dataType match {
        case TimestampType => unix_micros(col(c))
        case DateType => unix_date(col(c)).cast("long")
        case ByteType | ShortType | IntegerType | LongType =>
          col(c).cast("long")
        case FloatType | DoubleType | (_: DecimalType) =>
          col(c).cast("double")
        case t => throw new IllegalArgumentException(
          s"as-of axis column $c has unsupported type ${t.simpleString}")
      }
    }
    def axis(df: DataFrame, c: String) = toLong(df, c) * dir
    val evSide = events.select(
      (Seq(col(key), axis(events, ts).as("_t"), lit(0).as("_kind"),
        col(ordCol).as("_ord"),
        struct(toLong(events, ts).as("_et") +: payload.map(col): _*)
          .as("_p"),
        nullOf(probes, pts).as("_orig_pts")) ++
        probeExtra.map(c => nullOf(probes, c).as(s"_q_$c"))): _*)
    val prSide = probes.select(
      (Seq(col(key), axis(probes, pts).as("_t"), lit(1).as("_kind"),
        nullOf(events, ordCol).as("_ord"),
        lit(null).cast(payloadStructType).as("_p"),
        col(pts).as("_orig_pts")) ++
        probeExtra.map(c => col(c).as(s"_q_$c"))): _*)

    // events sort before probes at equal t (_kind 0 < 1); among events at
    // equal t the highest _ord is last, so the running last() picks it
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_kind"), col("_ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = evSide.unionByName(prSide)
      .select(
        col(key) +: col("_t") +: col("_kind") +: col("_orig_pts") +:
          last(col("_p"), ignoreNulls = true).over(w).as("_pl") +:
          probeExtra.map(c => col(s"_q_$c").as(c)): _*)
      .filter(col("_kind") === 1)
    val gated = tolerance match {
      case Some(tol) => matched.withColumn("_pl",
        when(abs(col("_t") * dir - col("_pl").getField("_et")) <= tol,
          col("_pl")))
      case None => matched
    }
    gated
      .select(
        col(key) +: col("_orig_pts").as(pts) +:
          (payload.map(c => col("_pl").getField(c).as(s"asof_$c")) ++
            probeExtra.map(col)): _*)
  }
}
