package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.sources.Tables

/** Driver-contract queries for the time-series operators ([[Temporal]]).
  * All value arithmetic runs on integer cents (value snapped to 1e-2
  * fixed point) so windowed/filled sums are exact in both engines. */
object TemporalPack extends QueryPack {

  /** Trailing window width for q126 (seconds). */
  val SlideSec = 900L

  /** SAX signature segments and result size for q136. */
  val CorrSegments = 4
  val CorrK = 25

  /** q183: EMA smoothing factor and the truncation window (terms). */
  val EmaAlpha = 0.3
  val EmaW = 8

  /** Truncated-EMA weights alpha*(1-alpha)^j, floor-quantized to 1e-6
    * LONGS at plan-build time — the weighted sum is then pure integer
    * arithmetic (count * weight_e6), exact and order-free in both
    * engines; only the final normalization divides. */
  val EmaWeightsE6: Seq[Long] = (0 until EmaW).map(j =>
    math.floor(EmaAlpha * math.pow(1 - EmaAlpha, j) * 1e6).toLong)

  /** Trailing window (hours) and z gate for the q150 capstone. */
  val CapstoneRoll = 24
  val CapstoneZ = 3.0

  // Tables.events, not .table: the raw parquet ts is TIMESTAMP(NANOS),
  // which Spark surfaces as BIGINT; the helper truncates to the micros
  // TIMESTAMP DuckDB also sees.
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  private def cents = round(col("value") * 100, 0).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hourly gap-filled metric series per event type: every hour of the
    // corpus's global time range appears for every type, with n=0 gap
    // rows carrying the previous hour's exact cents-sum forward. The hour
    // is emitted as a formatted string: both engines format the same
    // wall-clock value read from the parquet TIMESTAMP, sidestepping
    // epoch/timezone conversion differences.
    "q125_gap_fill" -> ((s, dir) => {
      Temporal.gapFill(events(s, dir), "event_type", "ts", cents, "hour")
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n"), col("v_filled"), col("is_gap"))
        .orderBy("event_type", "hour")
    }),

    // Trailing 15-minute event-time window per event: per type, the
    // count and cents-sum of the type's events in the last 900 seconds
    // (RANGE frame over epoch seconds — peers in the same second share
    // the window). Output is the per-type audit summary: window extremes
    // prove the full per-row window computation ran.
    "q126_time_rolling" -> ((s, dir) => {
      Temporal.slidingByTime(events(s, dir), "event_type", "ts", cents, SlideSec)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max("w_n").as("max_n"),
          max("w_cents").as("max_cents"),
          min("w_cents").as("min_cents"),
          sum("w_n").as("sum_n"))
        .orderBy("event_type")
    }),

    // Time-series similarity search: top-25 most correlated user pairs
    // by daily activity. SAX-signature blocking prunes the pair space
    // (never all-pairs); Pearson moments are exact BIGINTs in both
    // engines, double only in the final ratio, snapped to 6 decimals.
    "q136_series_corr" -> ((s, dir) => {
      Temporal.correlatedPairs(events(s, dir), "user_id", "ts", cents,
          CorrSegments, CorrK)
        .select(col("ka").as("user_a"), col("kb").as("user_b"),
          col("n"), col("corr"))
        .orderBy(desc("corr"), col("user_a"), col("user_b"))
    }),

    // Temporal capstone, one plan: the gap-filled hourly grid (q125's
    // core) feeds BOTH an availability report — longest outage run per
    // type via gaps-and-islands (the row_number-difference trick: equal
    // (rn - rn_within_gap) ⇔ same consecutive run) — and a trailing-24h
    // anomaly count on the filled integer-cents series (q112's exact
    // moment arithmetic, here over the COMPLETE grid so quiet hours
    // count as zeros instead of vanishing). The monitor a training-data
    // ingest runs per source feed.
    "q150_temporal_capstone" -> ((s, dir) => {
      val grid = Temporal.gapFill(events(s, dir), "event_type", "ts",
        cents, "hour")
      val wAll = Window.partitionBy("event_type").orderBy("bucket")
      val wGap = Window.partitionBy("event_type", "is_gap").orderBy("bucket")
      val runs = grid
        .withColumn("grp",
          row_number().over(wAll) - row_number().over(wGap))
        .filter(col("is_gap"))
        .groupBy("event_type", "grp").agg(count(lit(1)).as("run"))
        .groupBy("event_type").agg(max("run").as("max_gap_run"))
      val hourly = grid.withColumn("c",
        when(col("n") === 0, 0L).otherwise(col("v_filled")))
      val wRoll = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(-CapstoneRoll, -1)
      val anomalies = hourly
        .withColumn("n_w", count(col("c")).over(wRoll))
        .withColumn("s_w", sum(col("c")).over(wRoll))
        .withColumn("ss_w", sum(col("c") * col("c")).over(wRoll))
        .filter(col("n_w") === CapstoneRoll)
        .withColumn("mean_w", col("s_w").cast("double") / CapstoneRoll)
        .withColumn("var_w",
          (col("ss_w").cast("double") -
            col("s_w").cast("double") * col("s_w").cast("double")
              / CapstoneRoll) / (CapstoneRoll - 1))
        .withColumn("z", when(col("var_w") > 0,
          (col("c").cast("double") - col("mean_w")) / sqrt(col("var_w"))))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(abs(col("z")) > CapstoneZ, 1L).otherwise(0L))
            .as("n_anomalies"))
      grid.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("is_gap"), 1L).otherwise(0L)).as("n_gap_hours"))
        .join(runs, Seq("event_type"), "left")
        .withColumn("max_gap_run", coalesce(col("max_gap_run"), lit(0L)))
        .join(anomalies, Seq("event_type"), "left")
        .orderBy("event_type")
    }),

    // Per-type value trend as a closed-form OLS fit over exact integer
    // moments: slope in cents per hour since the corpus's first event.
    // Drift as a model, complementing q145's distribution-shift monitor.
    "q152_trend_fit" -> ((s, dir) => {
      Temporal.trendFit(events(s, dir), "event_type", "ts", cents)
        .orderBy("event_type")
    }),

    // CUSUM change-point detection on each type's daily event counts:
    // the day where the cumulative sum of (count − mean) deviations
    // peaks in magnitude is the most likely level-shift point — the
    // classic drift detector for ingest-volume monitoring. All-integer
    // arithmetic: deviations are scaled by the day count (c·D − T) so
    // the mean never becomes a float, and the cumulative window sums
    // longs — exact, order-pinned by (day), identical across engines.
    // One aggregation to days, one per-type window over ≤ |days| rows.
    "q167_cusum_change" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val wT = Window.partitionBy("event_type")
      val wC = Window.partitionBy("event_type").orderBy("day")
      val scored = daily
        .withColumn("total", sum(col("c")).over(wT))
        .withColumn("n_days", count(lit(1)).over(wT))
        .withColumn("cusum",
          sum(col("c") * col("n_days") - col("total")).over(wC))
      val wPick = Window.partitionBy("event_type")
        .orderBy(abs(col("cusum")).desc, col("day"))
      scored.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("change_day"),
          abs(col("cusum")).as("max_abs_cusum"),
          col("n_days"), col("total"))
        .orderBy("event_type")
    }),

    // Truncated exponential moving average over the per-type daily
    // series — the smoothing pass behind every monitoring dashboard.
    // True EMA is a sequential recurrence (unbounded lookback);
    // truncating at 8 terms (residual weight 0.7^8 < 6%) turns it into
    // 8 LAG columns over one window — embarrassingly parallel per key,
    // no recursion, and the series START is handled by renormalizing
    // over the weights actually present. Weights are 1e-6-quantized
    // longs, so num/den are exact integers; one division at the end.
    "q183_ema_smooth" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lags = col("c") +: (1 until EmaW).map(j => lag(col("c"), j).over(w))
      val num = lags.zip(EmaWeightsE6).map { case (l, wq) =>
        when(l.isNotNull, l * lit(wq)).otherwise(0L)
      }.reduce(_ + _)
      val den = lags.zip(EmaWeightsE6).map { case (l, wq) =>
        when(l.isNotNull, lit(wq)).otherwise(0L)
      }.reduce(_ + _)
      daily
        .withColumn("ema", graft.functions.Portable.snap6(
          num.cast("double") / den.cast("double")))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("c").as("n"), col("ema"))
        .orderBy("event_type", "day")
    }),

    // Day-of-week seasonal decomposition: per (type, ISO weekday), the
    // ratio of that weekday's mean daily volume to the type's overall
    // mean — the multiplicative seasonal index a monitor divides out
    // before alerting (q112/q150 flag deviations; this explains the
    // weekly ones). The index is a ratio of INTEGER products
    // (s_dow·n_tot)/(n_days·s_tot), so both engines divide identical
    // numerators — no float accumulation anywhere. Two grouped
    // aggregations over the daily table; everything downstream of the
    // day reduction is |types|·7 rows.
    "q187_seasonal_index" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val tot = daily.groupBy("event_type")
        .agg(sum("c").as("s_tot"), count(lit(1)).as("n_tot"))
      daily
        // weekday() is 0=Monday; +1 aligns with DuckDB's isodow (1=Mon)
        .withColumn("dow", (weekday(col("day")) + 1).cast("long"))
        .groupBy(col("event_type"), col("dow"))
        .agg(sum("c").as("s_dow"), count(lit(1)).as("n_days"))
        .join(tot, "event_type")
        .select(col("event_type"), col("dow"), col("n_days"), col("s_dow"),
          graft.functions.Portable.snap6(
            (col("s_dow") * col("n_tot")).cast("double")
              / (col("n_days") * col("s_tot")).cast("double"))
            .as("seasonal_idx"))
        .orderBy("event_type", "dow")
    })
  )

  def oracles: Map[String, String] = Map(

    "q125_gap_fill" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |agg AS (
        |  SELECT event_type, bucket, count(*) AS n, sum(c) AS v
        |  FROM b GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, g.bucket
        |  FROM (SELECT DISTINCT event_type FROM b) t
        |  CROSS JOIN (
        |    SELECT unnest(generate_series(min(bucket), max(bucket),
        |                                  INTERVAL 1 HOUR)) AS bucket
        |    FROM b) g)
        |SELECT grid.event_type,
        |       strftime(grid.bucket, '%Y-%m-%d %H:%M:%S') AS hour,
        |       CAST(coalesce(agg.n, 0) AS BIGINT) AS n,
        |       CAST(coalesce(
        |         last_value(agg.v IGNORE NULLS) OVER (
        |           PARTITION BY grid.event_type ORDER BY grid.bucket),
        |         0) AS BIGINT) AS v_filled,
        |       coalesce(agg.n, 0) = 0 AS is_gap
        |FROM grid LEFT JOIN agg
        |  ON agg.event_type = grid.event_type AND agg.bucket = grid.bucket
        |ORDER BY grid.event_type, hour""".stripMargin,

    "q126_time_rolling" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         |         CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events),
         |w AS (
         |  SELECT event_type,
         |         count(*) OVER fr AS w_n,
         |         sum(c) OVER fr AS w_cents
         |  FROM e
         |  WINDOW fr AS (PARTITION BY event_type ORDER BY ep
         |                RANGE BETWEEN $SlideSec PRECEDING AND CURRENT ROW))
         |SELECT event_type, count(*) AS n, max(w_n) AS max_n,
         |       CAST(max(w_cents) AS BIGINT) AS max_cents,
         |       CAST(min(w_cents) AS BIGINT) AS min_cents,
         |       CAST(sum(w_n) AS BIGINT) AS sum_n
         |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q150_temporal_capstone" ->
      s"""WITH b AS (
         |  SELECT event_type, date_trunc('hour', ts) AS bucket,
         |         CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events),
         |agg AS (
         |  SELECT event_type, bucket, count(*) AS n, sum(c) AS v
         |  FROM b GROUP BY 1, 2),
         |grid AS (
         |  SELECT t.event_type, g.bucket
         |  FROM (SELECT DISTINCT event_type FROM b) t
         |  CROSS JOIN (
         |    SELECT unnest(generate_series(min(bucket), max(bucket),
         |                                  INTERVAL 1 HOUR)) AS bucket
         |    FROM b) g),
         |f AS (
         |  SELECT grid.event_type, grid.bucket,
         |         CAST(coalesce(agg.n, 0) AS BIGINT) AS n,
         |         CAST(coalesce(agg.v, 0) AS BIGINT) AS c,
         |         coalesce(agg.n, 0) = 0 AS is_gap
         |  FROM grid LEFT JOIN agg
         |    ON agg.event_type = grid.event_type
         |   AND agg.bucket = grid.bucket),
         |runs AS (
         |  SELECT event_type, max(run) AS max_gap_run FROM (
         |    SELECT event_type, grp, count(*) AS run FROM (
         |      SELECT event_type, is_gap,
         |             row_number() OVER (PARTITION BY event_type
         |                                ORDER BY bucket)
         |           - row_number() OVER (PARTITION BY event_type, is_gap
         |                                ORDER BY bucket) AS grp
         |      FROM f) g
         |    WHERE is_gap GROUP BY 1, 2) r
         |  GROUP BY 1),
         |roll AS (
         |  SELECT event_type, c,
         |         count(c) OVER fr AS n_w,
         |         CAST(sum(c) OVER fr AS BIGINT) AS s_w,
         |         CAST(sum(c * c) OVER fr AS BIGINT) AS ss_w
         |  FROM f
         |  WINDOW fr AS (PARTITION BY event_type ORDER BY bucket
         |                ROWS BETWEEN $CapstoneRoll PRECEDING
         |                         AND 1 PRECEDING)),
         |an AS (
         |  SELECT event_type, count(*) AS n_windows,
         |         CAST(sum(CASE WHEN abs(z) > $CapstoneZ
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
         |  FROM (
         |    SELECT event_type,
         |           CASE WHEN (CAST(ss_w AS DOUBLE)
         |                      - CAST(s_w AS DOUBLE) * CAST(s_w AS DOUBLE)
         |                        / $CapstoneRoll) / (${CapstoneRoll - 1}) > 0
         |                THEN (CAST(c AS DOUBLE)
         |                      - CAST(s_w AS DOUBLE) / $CapstoneRoll)
         |                     / sqrt((CAST(ss_w AS DOUBLE)
         |                             - CAST(s_w AS DOUBLE) * CAST(s_w AS DOUBLE)
         |                               / $CapstoneRoll) / (${CapstoneRoll - 1}))
         |                END AS z
         |    FROM roll WHERE n_w = $CapstoneRoll) zz
         |  GROUP BY 1)
         |SELECT f.event_type,
         |       count(*) AS n_hours,
         |       CAST(sum(CASE WHEN is_gap THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_gap_hours,
         |       CAST(coalesce(any_value(runs.max_gap_run), 0) AS BIGINT)
         |         AS max_gap_run,
         |       any_value(an.n_windows) AS n_windows,
         |       any_value(an.n_anomalies) AS n_anomalies
         |FROM f
         |LEFT JOIN runs ON runs.event_type = f.event_type
         |LEFT JOIN an ON an.event_type = f.event_type
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q136_series_corr" ->
      s"""WITH b AS (
         |  SELECT user_id AS k,
         |         CAST(floor(epoch(date_trunc('day', ts)) / 86400)
         |              AS BIGINT) AS d,
         |         CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events),
         |agg AS (SELECT k, d, CAST(sum(c) AS BIGINT) AS c
         |        FROM b GROUP BY 1, 2),
         |bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM b),
         |grid AS (
         |  SELECT t.k, g.day_idx
         |  FROM (SELECT DISTINCT k FROM b) t
         |  CROSS JOIN (SELECT unnest(generate_series(0, d1 - d0))
         |              AS day_idx FROM bounds) g),
         |daily AS (
         |  SELECT grid.k, grid.day_idx, coalesce(agg.c, 0) AS cents
         |  FROM grid LEFT JOIN agg
         |    ON agg.k = grid.k
         |   AND agg.d = grid.day_idx + (SELECT d0 FROM bounds)),
         |nd AS (SELECT max(day_idx) + 1 AS nd FROM daily),
         |segsum AS (
         |  SELECT k, CAST((day_idx * $CorrSegments) // (SELECT nd FROM nd)
         |              AS INT) AS seg,
         |         CAST(sum(cents) AS BIGINT) AS s
         |  FROM daily GROUP BY 1, 2),
         |sig AS (
         |  SELECT k, string_agg(CASE WHEN s * $CorrSegments >= tot
         |                            THEN '1' ELSE '0' END, ''
         |                       ORDER BY seg) AS sig
         |  FROM (SELECT k, seg, s,
         |               CAST(sum(s) OVER (PARTITION BY k) AS BIGINT) AS tot
         |        FROM segsum) GROUP BY k),
         |d AS (SELECT daily.k, sig.sig, daily.day_idx, daily.cents
         |      FROM daily JOIN sig USING (k)),
         |mom AS (
         |  SELECT a.k AS ka, bb.k AS kb, count(*) AS n,
         |         CAST(sum(a.cents) AS BIGINT) AS sx,
         |         CAST(sum(bb.cents) AS BIGINT) AS sy,
         |         CAST(sum(a.cents * bb.cents) AS BIGINT) AS sxy,
         |         CAST(sum(a.cents * a.cents) AS BIGINT) AS sxx,
         |         CAST(sum(bb.cents * bb.cents) AS BIGINT) AS syy
         |  FROM d a JOIN d bb
         |    ON a.sig = bb.sig AND a.day_idx = bb.day_idx AND a.k < bb.k
         |  GROUP BY 1, 2)
         |SELECT ka AS user_a, kb AS user_b, n,
         |       floor((CAST(n * sxy - sx * sy AS DOUBLE) /
         |              sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
         |                   CAST(n * syy - sy * sy AS DOUBLE))) * 1000000.0)
         |         / 1000000.0 AS corr
         |FROM mom
         |WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
         |ORDER BY corr DESC, user_a, user_b
         |LIMIT $CorrK""".stripMargin,

    // Mirrors trendFit exactly: integer moments on hours-since-global-min
    // and cents; doubles only in the final ratios with the identical
    // expression tree, floor-snapped to 6 decimals.
    "q152_trend_fit" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 AS ep,
        |         CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |x AS (
        |  SELECT event_type, (ep - m.ep0) // 3600 AS x, y
        |  FROM e CROSS JOIN (SELECT min(ep) AS ep0 FROM e) m),
        |mo AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM x GROUP BY 1)
        |SELECT event_type, n,
        |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
        |         floor((CAST(n * sxy - sx * sy AS DOUBLE) /
        |                CAST(n * sxx - sx * sx AS DOUBLE)) * 1000000.0)
        |           / 1000000.0 END AS slope,
        |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
        |         floor(((CAST(sy AS DOUBLE) -
        |                 (CAST(n * sxy - sx * sy AS DOUBLE) /
        |                  CAST(n * sxx - sx * sx AS DOUBLE))
        |                   * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
        |               * 1000000.0) / 1000000.0 END AS intercept
        |FROM mo ORDER BY event_type""".stripMargin,

    "q167_cusum_change" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, day, c,
        |         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS total,
        |         count(*) OVER (PARTITION BY event_type) AS n_days
        |  FROM daily),
        |cus AS (
        |  SELECT event_type, day, n_days, total,
        |         CAST(sum(c * n_days - total)
        |           OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS cusum
        |  FROM t),
        |pick AS (
        |  SELECT event_type, day, abs(cusum) AS m, n_days, total,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY abs(cusum) DESC, day) AS rn
        |  FROM cus)
        |SELECT event_type, CAST(day AS VARCHAR) AS change_day,
        |       m AS max_abs_cusum, CAST(n_days AS BIGINT) AS n_days, total
        |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q183_ema_smooth" -> {
      val lagCols = (1 until EmaW).map(j =>
        s"lag(c, $j) OVER (PARTITION BY event_type ORDER BY day) AS c$j")
        .mkString(",\n|         ")
      val numTerms = (s"c * ${EmaWeightsE6.head}" +:
        (1 until EmaW).map(j =>
          s"coalesce(c$j * ${EmaWeightsE6(j)}, 0)")).mkString(" + ")
      val denTerms = (s"${EmaWeightsE6.head}" +:
        (1 until EmaW).map(j =>
          s"CASE WHEN c$j IS NOT NULL THEN ${EmaWeightsE6(j)} ELSE 0 END"))
        .mkString(" + ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |l AS (
         |  SELECT event_type, day, c,
         |         $lagCols
         |  FROM daily)
         |SELECT event_type, CAST(day AS VARCHAR) AS day, c AS n,
         |       ${graft.functions.Portable.snap6Sql(
             s"CAST($numTerms AS DOUBLE) / CAST($denTerms AS DOUBLE)")} AS ema
         |FROM l ORDER BY event_type, day""".stripMargin
    },

    "q187_seasonal_index" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |tot AS (
         |  SELECT event_type, CAST(sum(c) AS BIGINT) AS s_tot,
         |         CAST(count(*) AS BIGINT) AS n_tot
         |  FROM daily GROUP BY 1),
         |per AS (
         |  SELECT event_type, CAST(isodow(day) AS BIGINT) AS dow,
         |         CAST(sum(c) AS BIGINT) AS s_dow,
         |         CAST(count(*) AS BIGINT) AS n_days
         |  FROM daily GROUP BY 1, 2)
         |SELECT p.event_type, p.dow, p.n_days, p.s_dow,
         |       ${graft.functions.Portable.snap6Sql(
             "CAST(s_dow * n_tot AS DOUBLE) / CAST(n_days * s_tot AS DOUBLE)")}
         |         AS seasonal_idx
         |FROM per p JOIN tot t USING (event_type)
         |ORDER BY p.event_type, p.dow""".stripMargin
  )
}
