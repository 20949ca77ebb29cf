package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping over the event stream (SURVEY §2 rows 163-164):
  * calendar densification (gap filling) and last-observation-carried-
  * forward interpolation — the two transforms every metrics warehouse
  * runs before charting or feeding a forecaster, because aggregates
  * silently DROP empty buckets and downstream consumers need an
  * explicit row (or a carried value) for every bucket.
  *
  * Scale shape: the only corpus-scale work is one keyed aggregate to
  * the (event_type, hour) grain; the spine, the left join and the fill
  * windows all run over time-span-bounded metadata (#types × #hours),
  * the same bounded-window discipline as w4/a12. The span itself is a
  * 1-row broadcast aggregate — never a driver collect.
  */
object TimeSeries {

  /** Hourly grain per event type: count + exact-decimal mean value
    * (value is money-like; decimal sum ⇒ bit-identical mean across
    * engines regardless of aggregation order, SURVEY §4). */
  private def hourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("v"))

  /** The dense (event_type × hour) spine between the corpus' first and
    * last hour: ONE 1-row aggregate carries the span AND the distinct
    * type set (collect_set over the bounded type domain), and both
    * explodes generate from that single row — no second fact scan, no
    * cross join at all. */
  private def spine(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"),
        array_sort(collect_set(col("event_type"))).as("types"))
      .select(explode(col("types")).as("event_type"), col("lo"), col("hi"))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("hr"))

  /** ts1: gap filling — every (event_type, hour) bucket in the corpus
    * span gets a row; silent holes become explicit n=0 / is_gap=1
    * rows. Left join of the bounded spine against the hourly
    * aggregate; output is #types × #hours rows. */
  def ts1GapFill(s: SparkSession, dir: String): DataFrame =
    spine(s, dir)
      .join(hourly(s, dir), Seq("event_type", "hr"), "left")
      .select(col("event_type"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        coalesce(col("n"), lit(0L)).as("n"),
        when(col("n").isNull, 1).otherwise(0).as("is_gap"))
      .orderBy(col("event_type"), col("hr"))

  /** ts2: last-observation-carried-forward interpolation over the
    * gap-filled spine — each hole inherits the most recent preceding
    * hour's mean value (null until the first observation). The
    * standard two-window form: a running count of non-null
    * observations partitions the timeline into fill groups, each
    * group's single non-null leader is broadcast down it by a
    * group-keyed max. Both windows are PARTITIONED (by type, then by
    * (type, group)) over the bounded spine — no corpus-sized or
    * unpartitioned window anywhere. */
  def ts2LocfFill(s: SparkSession, dir: String): DataFrame = {
    val joined = spine(s, dir)
      .join(hourly(s, dir), Seq("event_type", "hr"), "left")
    val grpW = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("grp", count(col("v")).over(grpW))
      .withColumn("filled_value",
        max(col("v")).over(Window.partitionBy(col("event_type"), col("grp"))))
      .select(col("event_type"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("v").as("avg_value"),
        col("filled_value"))
      .orderBy(col("event_type"), col("hr"))
  }

  /** ts3: per-series linear trend — ordinary least squares of daily
    * event counts against a day index (slope/intercept/R², the "is
    * this metric growing and how fast" question behind every capacity
    * plan and drift alert). The regression consumes the DAY-GRAIN
    * aggregate (bounded by the time span), never raw events; the day
    * index is centered on the corpus' first day via a 1-row broadcast
    * min (r4's pattern — small x values keep the float sums
    * well-conditioned and bit-stable across engines). regr_slope /
    * regr_intercept / regr_r2 are partial-aggregable moment sums, so
    * even the day aggregate's inputs combine map-side. */
  def ts3Trend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val lo = daily.agg(min(col("day")).as("lo"))
    daily.crossJoin(broadcast(lo)) // 1-row bounded metadata
      .select(col("event_type"),
        datediff(col("day"), col("lo")).cast("double").as("x"),
        col("n").cast("double").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        round(regr_slope(col("y"), col("x")), 6).as("slope"),
        round(regr_intercept(col("y"), col("x")), 6).as("intercept"),
        round(regr_r2(col("y"), col("x")), 6).as("r2"))
      .orderBy(col("event_type"))
  }

  val ResampleSecs = 900 // 15-minute buckets

  /** ts4: OHLC resampling — open/high/low/close/volume per
    * (event_type, [[ResampleSecs]]-second bucket), the downsampling
    * every metrics store and market-data pipeline runs before charting
    * or modeling a finer-grained stream. NOT a per-bucket window or
    * sort: open/close are `min_by`/`max_by` against the totally
    * ordered (ts, event_id) struct key — partial-aggregable
    * struct-extrema, so every executor combines map-side and the only
    * shuffle is the keyed aggregate itself (bucket count grows with
    * the time span, never one task's sort). Volume goes through an
    * exact decimal sum (order-independent ⇒ bit-stable, SURVEY §4);
    * open/high/low/close are exact picks of input doubles. The bucket
    * key is epoch-seconds floored to the grain — engine-neutral, no
    * timezone/format dependence. */
  def ts4OhlcResample(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        (floor(unix_timestamp(col("ts")) / ResampleSecs).cast("long") *
          ResampleSecs).as("bucket"),
        col("ts"), col("event_id"), col("value"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min_by(col("value"), struct(col("ts"), col("event_id"))), 6).as("open"),
        round(max(col("value")), 6).as("high"),
        round(min(col("value")), 6).as("low"),
        round(max_by(col("value"), struct(col("ts"), col("event_id"))), 6).as("close"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6).as("volume"))
      .orderBy(col("event_type"), col("bucket"))

  val EwmaAlpha = 0.3 // smoothing weight on the newest observation

  /** ts5: exponentially weighted moving average per series — the
    * smoother behind every alerting baseline and "current level"
    * estimate (reacts faster than a flat rolling mean, needs no
    * window buffer). EWMA is inherently sequential (e_t = α·v_t +
    * (1−α)·e_{t−1}), which no parallel window frame expresses — but
    * the sequence it runs over is the HOURLY aggregate, bounded by
    * the time span (ts1/ts2's spine argument), never raw events: the
    * corpus-scale work is the same keyed hour aggregate, then each
    * series' bounded (type, hour, v) list folds in-row with the
    * `aggregate` higher-order function (one pass, exact left fold —
    * both engines evaluate the identical double sequence, so the
    * result is bit-deterministic and fully oracle-checkable against a
    * recursive CTE). Initial condition e_1 = v_1. */
  def ts5Ewma(s: SparkSession, dir: String): DataFrame =
    hourly(s, dir)
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("hr"), col("v")))).as("srt"))
      .select(col("event_type"), explode(expr(
        s"""aggregate(srt,
           |  cast(array() as array<struct<hr: timestamp, v: double, e: double>>),
           |  (acc, x) -> acc || array(named_struct('hr', x.hr, 'v', x.v,
           |    'e', CASE WHEN size(acc) = 0 THEN x.v
           |         ELSE $EwmaAlpha * x.v + ${1 - EwmaAlpha} * element_at(acc, -1).e
           |    END)))""".stripMargin)).as("o"))
      .select(col("event_type"),
        date_format(col("o.hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("o.v").as("v"), round(col("o.e"), 6).as("ewma"))
      .orderBy("event_type", "hr")

  val HoltAlpha = 0.3 // level smoothing
  val HoltBeta = 0.1  // trend smoothing

  /** ts8: Holt double exponential smoothing per series — ts5's EWMA
    * plus an explicit trend term (l_t = α·v_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}), the level+slope baseline a
    * drifting metric needs where a flat EWMA lags systematically; the
    * one-step forecast l+b is the anomaly-alert reference value.
    * Same scale shape as ts5: the sequential recurrence runs over the
    * span-bounded HOURLY aggregate as an in-row `aggregate` fold —
    * both engines evaluate the identical double sequence
    * (l₁ = v₁, b₁ = 0), so the result is bit-deterministic and fully
    * hash-checkable against a recursive-CTE oracle. */
  def ts8Holt(s: SparkSession, dir: String): DataFrame =
    hourly(s, dir)
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("hr"), col("v")))).as("srt"))
      .select(col("event_type"), explode(expr(
        s"""aggregate(srt,
           |  cast(array() as array<struct<hr: timestamp, v: double,
           |    l: double, b: double>>),
           |  (acc, x) -> acc || array(named_struct('hr', x.hr, 'v', x.v,
           |    'l', CASE WHEN size(acc) = 0 THEN x.v
           |         ELSE $HoltAlpha * x.v + ${1 - HoltAlpha} *
           |           (element_at(acc, -1).l + element_at(acc, -1).b) END,
           |    'b', CASE WHEN size(acc) = 0 THEN 0.0D
           |         ELSE $HoltBeta *
           |           (($HoltAlpha * x.v + ${1 - HoltAlpha} *
           |             (element_at(acc, -1).l + element_at(acc, -1).b))
           |            - element_at(acc, -1).l) +
           |           ${1 - HoltBeta} * element_at(acc, -1).b END)))"""
          .stripMargin)).as("o"))
      .select(col("event_type"),
        date_format(col("o.hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("o.v").as("v"), round(col("o.l"), 6).as("level"),
        round(col("o.b"), 6).as("trend"),
        round(col("o.l") + col("o.b"), 6).as("forecast_next"))
      .orderBy("event_type", "hr")

  val AutocorrMaxLag = 3 // lags 1..3 hours

  /** ts6: per-series lag-k autocorrelation (k = 1..[[AutocorrMaxLag]])
    * of the hourly mean-value series — the seasonality/persistence
    * diagnostic behind "is this metric mean-reverting, trending, or
    * noise" and the standard pre-check before fitting any AR-family
    * forecaster. Pearson corr of the series against its own k-hour
    * lag: the lags come from a window PARTITIONED by event_type over
    * the hourly aggregate (bounded by the time span — ts1's spine
    * argument), and `corr` is a partial-aggregable moment sum, so the
    * corpus-scale work remains the one keyed hour aggregate. Hourly
    * means are rounded to 6dp BEFORE the corr (both engines correlate
    * the identical double sequence) and the corr itself rounds to 6dp,
    * far above the ~1e-13 moment-order noise — cross-engine stable. */
  def ts6Autocorr(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val lagged = hourly(s, dir).select(
      col("event_type") +: col("v") +:
        (1 to AutocorrMaxLag).map(k => lag(col("v"), k).over(w).as(s"v_$k")): _*)
    lagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        (1 to AutocorrMaxLag).map(k =>
          round(corr(col("v"), col(s"v_$k")), 6).as(s"ac_$k")): _*)
      .orderBy(col("event_type"))
  }

  /** ts7: seasonality strength per series — the additive-decomposition
    * diagnostic (classic STL reading): the hour-of-day profile is the
    * seasonal component, and 1 − Var(v − s_hod)/Var(v) measures how
    * much of the series routine daily rhythm explains — the number
    * that decides whether an alert baseline needs a seasonal model or
    * a flat EWMA (ts5). All work beyond the one keyed hour aggregate
    * runs on the span-bounded hourly frame: the 24-row seasonal
    * profile joins back by broadcast, and the variance fold is a
    * moment aggregate. Variances ride exact decimal-rounded means
    * (both engines fold identical doubles); round-6 output. */
  def ts7Seasonality(s: SparkSession, dir: String): DataFrame = {
    val h = hourly(s, dir)
      .select(col("event_type"), col("v"), hour(col("hr")).as("hod"))
    val prof = h.groupBy(col("event_type").as("pt"), col("hod").as("ph"))
      .agg(round(sum(col("v").cast("decimal(18,6)")).cast("double") /
        count(lit(1)), 6).as("s"))
    h.join(broadcast(prof),
        col("event_type") === col("pt") && col("hod") === col("ph"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        round(var_pop(col("v")), 6).as("var_total"),
        round(var_pop(col("v") - col("s")), 6).as("var_resid"),
        round(lit(1.0) - var_pop(col("v") - col("s")) / var_pop(col("v")), 6)
          .as("seasonal_strength"))
      .orderBy(col("event_type"))
  }

  val oracles: Map[String, String] = Map(
    "ts8_holt" ->
      s"""WITH RECURSIVE h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*), 6) AS v
         |  FROM events GROUP BY 1, 2),
         |idx AS (SELECT event_type, hr, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i
         |  FROM h),
         |r AS (
         |  SELECT event_type, hr, v, i, v AS l, CAST(0.0 AS DOUBLE) AS b
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT n.event_type, n.hr, n.v, n.i,
         |    $HoltAlpha * n.v + ${1 - HoltAlpha} * (r.l + r.b),
         |    $HoltBeta * (($HoltAlpha * n.v + ${1 - HoltAlpha} * (r.l + r.b))
         |      - r.l) + ${1 - HoltBeta} * r.b
         |  FROM r JOIN idx n ON n.event_type = r.event_type AND n.i = r.i + 1)
         |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr, v,
         |  round(l, 6) AS level, round(b, 6) AS trend,
         |  round(l + b, 6) AS forecast_next
         |FROM r ORDER BY 1, 2""".stripMargin,
    "ts7_seasonality" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |hh AS (SELECT event_type, v, extract(hour FROM hr) AS hod FROM h),
        |prof AS (SELECT event_type AS pt, hod AS ph,
        |    round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*), 6) AS s
        |  FROM hh GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_hours,
        |  round(var_pop(v), 6) AS var_total,
        |  round(var_pop(v - s), 6) AS var_resid,
        |  round(1.0 - var_pop(v - s) / var_pop(v), 6) AS seasonal_strength
        |FROM hh JOIN prof ON event_type = pt AND hod = ph
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts6_autocorr" ->
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*), 6) AS v
         |  FROM events GROUP BY 1, 2),
         |l AS (SELECT event_type, v,
         |    lag(v, 1) OVER (PARTITION BY event_type ORDER BY hr) AS v_1,
         |    lag(v, 2) OVER (PARTITION BY event_type ORDER BY hr) AS v_2,
         |    lag(v, 3) OVER (PARTITION BY event_type ORDER BY hr) AS v_3
         |  FROM h)
         |SELECT event_type, count(*) AS n_hours,
         |  round(corr(v, v_1), 6) AS ac_1,
         |  round(corr(v, v_2), 6) AS ac_2,
         |  round(corr(v, v_3), 6) AS ac_3
         |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts3_trend" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |lo AS (SELECT min(day) AS lo FROM daily),
        |xy AS (SELECT d.event_type,
        |    CAST(date_diff('day', lo.lo, d.day) AS DOUBLE) AS x,
        |    CAST(d.n AS DOUBLE) AS y
        |  FROM daily d CROSS JOIN lo)
        |SELECT event_type, count(*) AS n_days,
        |  round(regr_slope(y, x), 6) AS slope,
        |  round(regr_intercept(y, x), 6) AS intercept,
        |  round(regr_r2(y, x), 6) AS r2
        |FROM xy GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts1_gap_fill" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |span AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |    date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT t.event_type, g.hr
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi,
        |    INTERVAL 1 HOUR)) AS hr FROM span) g)
        |SELECT s.event_type, strftime(s.hr, '%Y-%m-%d %H:%M:%S') AS hr,
        |  COALESCE(h.n, 0) AS n,
        |  CASE WHEN h.n IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM spine s LEFT JOIN h USING (event_type, hr)
        |ORDER BY 1, 2""".stripMargin,
    "ts2_locf_fill" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
        |    count(*) AS n,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |    date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT t.event_type, g.hr
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi,
        |    INTERVAL 1 HOUR)) AS hr FROM span) g),
        |j AS (SELECT s.event_type, s.hr, COALESCE(h.n, 0) AS n, h.v
        |  FROM spine s LEFT JOIN h USING (event_type, hr)),
        |g AS (SELECT *, count(v) OVER (PARTITION BY event_type
        |    ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS grp FROM j)
        |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr, n,
        |  v AS avg_value,
        |  max(v) OVER (PARTITION BY event_type, grp) AS filled_value
        |FROM g ORDER BY 1, 2""".stripMargin,
    "ts5_ewma" ->
      s"""WITH RECURSIVE h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*), 6) AS v
         |  FROM events GROUP BY 1, 2),
         |idx AS (SELECT event_type, hr, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i
         |  FROM h),
         |r AS (
         |  SELECT event_type, hr, v, i, v AS e FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT n.event_type, n.hr, n.v, n.i,
         |    $EwmaAlpha * n.v + ${1 - EwmaAlpha} * r.e
         |  FROM r JOIN idx n ON n.event_type = r.event_type AND n.i = r.i + 1)
         |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr, v,
         |  round(e, 6) AS ewma
         |FROM r ORDER BY 1, 2""".stripMargin,
    "ts4_ohlc_resample" ->
      s"""SELECT event_type,
         |  CAST(floor(epoch(ts) / $ResampleSecs) * $ResampleSecs AS BIGINT) AS bucket,
         |  COUNT(*) AS n,
         |  round(first(value ORDER BY ts, event_id), 6) AS open,
         |  round(max(value), 6) AS high,
         |  round(min(value), 6) AS low,
         |  round(last(value ORDER BY ts, event_id), 6) AS close,
         |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS volume
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts1_gap_fill" -> (ts1GapFill _),
    "ts2_locf_fill" -> (ts2LocfFill _),
    "ts3_trend" -> (ts3Trend _),
    "ts4_ohlc_resample" -> (ts4OhlcResample _),
    "ts5_ewma" -> (ts5Ewma _),
    "ts6_autocorr" -> (ts6Autocorr _),
    "ts7_seasonality" -> (ts7Seasonality _),
    "ts8_holt" -> (ts8Holt _))
}
