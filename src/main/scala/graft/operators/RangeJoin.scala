package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: points (t) ⋈ intervals (s <= t < e) — with the binning
  * optimization (builder-prompt list; no reference analog).
  *
  * A bare range predicate gives Spark a BroadcastNestedLoopJoin —
  * |points| × |intervals| comparisons. Binning restores an equi-join:
  * intervals are exploded to every fixed-width bin they cover, points
  * hash to their own bin, the join runs on the bin key, and the exact
  * range predicate filters within the (tiny) bin-collision candidate set.
  * Cost: |points| + Σ interval_width/bin rows through a hash join; each
  * (point, interval) match is produced exactly once because a point lives
  * in exactly one bin.
  *
  * Pick `binSeconds` near the typical interval width: too small explodes
  * the interval side, too large inflates the candidate set.
  */
object RangeJoin {

  /** points(tCol TIMESTAMP, ...) ⋈ intervals(sCol, eCol TIMESTAMP, ...) on
    * sCol <= tCol < eCol. Inner join; all columns from both sides. */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
                      tCol: String, sCol: String, eCol: String,
                      binSeconds: Long = 3600L): DataFrame = {
    val binOf = (c: org.apache.spark.sql.Column) =>
      floor(c.cast("double") / binSeconds.toDouble).cast("long")
    val binned = intervals.withColumn("_bin",
      explode(sequence(binOf(col(sCol)),
        // e is exclusive: a zero-width or bin-aligned end still covers the
        // bin containing s; subtract an epsilon via (e - 1 microsecond).
        // The greatest() clamp keeps malformed intervals (e <= s) from
        // producing a DESCENDING sequence, which would explode arbitrarily
        // many spurious bin rows — the exact predicate below filters their
        // matches, but their blow-up cost must stay bounded (1 row here)
        greatest(binOf(col(sCol)),
          binOf(col(eCol) - expr("INTERVAL 1 MICROSECOND"))))))
    points.withColumn("_bin", binOf(col(tCol)))
      .join(binned, "_bin")
      .filter(col(tCol) >= col(sCol) && col(tCol) < col(eCol))
      .drop("_bin")
  }
}
