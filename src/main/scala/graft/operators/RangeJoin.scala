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

  /** Interval × interval overlap join, binned: left [lS, lE) ⋈ right
    * [rS, rE) on `keyCol` equality AND overlap (lS < rE && rS < lE).
    * Both interval columns are LONG (e.g. epoch micros); bounds are
    * half-open.
    *
    * Same idea as [[binnedRangeJoin]] but both sides explode to the bins
    * they cover, the join runs on (key, bin), and the exact overlap
    * predicate filters bin-collision candidates. A pair overlapping k
    * shared bins would match k times; instead of a distinct shuffle over
    * the matches, each pair is REPORTED exactly once, in the bin that
    * contains the overlap's start (greatest of the two starts — that bin
    * is covered by both intervals by construction, so the pair is seen
    * there, and the predicate is true in no earlier shared bin's
    * reporting test). Cost: Σ width/bin exploded rows per side through
    * one hash join — no nested loop, no dedup shuffle.
    *
    * Column names of the two inputs must not collide except `keyCol`. */
  def binnedIntervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                         lS: String, lE: String, rS: String, rE: String,
                         binWidth: Long): DataFrame = {
    require(binWidth > 0)
    def bins(df: DataFrame, sC: String, eC: String) =
      df.withColumn("_bin", explode(sequence(
        expr(s"$sC DIV $binWidth"),
        // half-open end; greatest() bounds malformed (e <= s) intervals
        // to a single spurious bin row, as in binnedRangeJoin
        greatest(expr(s"$sC DIV $binWidth"),
          expr(s"($eC - 1) DIV $binWidth")))))
    bins(left, lS, lE).join(bins(right, rS, rE), Seq(keyCol, "_bin"))
      .filter(col(lS) < col(rE) && col(rS) < col(lE))
      .filter(col("_bin") === expr(s"greatest($lS, $rS) DIV $binWidth"))
      .drop("_bin")
  }
}
