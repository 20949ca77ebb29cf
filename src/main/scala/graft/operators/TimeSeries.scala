package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SeriesFoldExpr

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
      // compiled O(n) recurrence (SeriesFoldExpr) replacing the
      // interpreted O(n²)-append `aggregate` HOF; identical fold
      // arithmetic, so the recursive-CTE oracle hash is unchanged
      .withColumn("e", SeriesFoldExpr.ewmaFold(col("srt"), EwmaAlpha))
      .select(col("event_type"), col("e"), posexplode(col("srt")))
      .select(col("event_type"),
        date_format(col("col.hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("col.v").as("v"),
        round(element_at(col("e"), col("pos") + 1), 6).as("ewma"))
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
  def ts8Holt(s: SparkSession, dir: String): DataFrame = {
    // compiled O(n) level+trend recurrence (SeriesFoldExpr), packed
    // [l..., b...]; same arithmetic order as the replaced HOF fold
    val lAt = element_at(col("lb"), col("pos") + 1)
    val bAt = element_at(col("lb"), col("nn") + col("pos") + 1)
    hourly(s, dir)
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("hr"), col("v")))).as("srt"))
      .withColumn("lb", SeriesFoldExpr.holtFold(col("srt"), HoltAlpha, HoltBeta))
      .withColumn("nn", size(col("srt")))
      .select(col("event_type"), col("lb"), col("nn"), posexplode(col("srt")))
      .select(col("event_type"),
        date_format(col("col.hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("col.v").as("v"), round(lAt, 6).as("level"),
        round(bAt, 6).as("trend"),
        round(lAt + bAt, 6).as("forecast_next"))
      .orderBy("event_type", "hr")
  }

  /** ts17: rolling-origin forecast BACKTEST — ts5/ts8 produce
    * forecasts; ts17 is the model-selection plane that says which one
    * to TRUST: for every series, the one-step-ahead forecast at each
    * hour t is the state built from hours 1..t−1 only (EWMA: e_{t−1};
    * Holt: l_{t−1}+b_{t−1} — the honest walk-forward protocol, no
    * look-ahead), scored against the actual v_t as per-series MAE and
    * RMSE per model. Scale shape: the corpus-scale work is the same
    * keyed hourly aggregate ts5/ts8 pay; both recurrences run as the
    * compiled in-row folds over the span-bounded series, and the
    * error aggregates quantize each |err| / err² to int64 at 1e-9
    * BEFORE summing (the g2/prof10 discipline — a plain sum(double)
    * is partial-merge-order dependent), so MAE/RMSE are bit-stable
    * and fully hash-checkable against the recursive-CTE oracle. */
  def ts17ForecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val rows = hourly(s, dir)
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("hr"), col("v")))).as("srt"))
      .withColumn("e", SeriesFoldExpr.ewmaFold(col("srt"), EwmaAlpha))
      .withColumn("lb", SeriesFoldExpr.holtFold(col("srt"), HoltAlpha, HoltBeta))
      .withColumn("nn", size(col("srt")))
      .select(col("event_type"), col("nn"), posexplode(col("srt")),
        col("e"), col("lb"))
      .filter(col("pos") >= 1) // a forecast needs a prior state
      .select(col("event_type"), col("col.v").as("v"),
        // element_at is 1-indexed and pos is 0-indexed, so index `pos`
        // IS the state after hours 1..t-1
        element_at(col("e"), col("pos")).as("f_ewma"),
        (element_at(col("lb"), col("pos")) +
          element_at(col("lb"), col("nn") + col("pos"))).as("f_holt"))
    val q9 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e9) + lit(0.5)).cast("long")
    def metrics(fc: org.apache.spark.sql.Column, model: String) =
      rows.select(col("event_type"), (col("v") - fc).as("err"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"),
          sum(q9(abs(col("err")))).as("sae"),
          sum(q9(col("err") * col("err"))).as("sse"))
        .select(col("event_type"), lit(model).as("model"), col("n_eval"),
          round((col("sae").cast("double") / col("n_eval")) / lit(1e9), 6)
            .as("mae"),
          round(sqrt((col("sse").cast("double") / col("n_eval")) / lit(1e9)), 6)
            .as("rmse"))
    metrics(col("f_ewma"), "ewma")
      .unionByName(metrics(col("f_holt"), "holt"))
      .orderBy("event_type", "model")
  }

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

  val SeasAdjTau = 3.0 // |z| flagging threshold on deseasonalized residuals

  /** ts14: seasonally-adjusted anomaly detection — each hour scored
    * against its OWN hour-of-day profile (ts7's seasonal means), so a
    * nightly lull never pages and a spike AT an off-peak hour does:
    * residual = v − hod_mean, z = residual / per-series residual σ.
    * Complements ts9 (local trailing level, blind to seasonality) and
    * ts10 (sustained drift): this is the calendar-aware point-anomaly
    * lens. Scale shape: the corpus-scale work is the SAME hourly
    * keyed aggregate every ts operator shares; the profile
    * (#types × 24) broadcasts back; σ is exact decimal moments per
    * series, int64-quantized BEFORE the divide (the ts10 mu/σ rule),
    * z quantized at the output boundary. */
  def ts14SeasonalAdjust(s: SparkSession, dir: String): DataFrame = {
    // one events scan TOTAL (the ts13 argument): profile, residuals
    // and σ all branch off this bounded #types × #hours frame
    val h = hourly(s, dir)
      .select(col("event_type"), col("hr"), col("v"),
        hour(col("hr")).as("hod"))
      .localCheckpoint()
    val prof = h.groupBy(col("event_type").as("pt"), col("hod").as("ph"))
      .agg(q6(sum(col("v").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("expected"))
    val withResid = h.join(broadcast(prof),
        col("event_type") === col("pt") && col("hod") === col("ph"))
      .select(col("event_type"), col("hr"), col("v"),
        col("expected"), (col("v") - col("expected")).as("resid"))
    val rd = col("resid").cast("decimal(18,6)")
    val sig = withResid.groupBy(col("event_type").as("st"))
      .agg(count(lit(1)).as("sn"), sum(rd).as("s1"), sum(rd * rd).as("s2"))
      .select(col("st"), q6(sqrt(
        (col("s2").cast("double") * col("sn") -
          col("s1").cast("double") * col("s1").cast("double")) /
          (col("sn").cast("double") * col("sn") - col("sn")))).as("sigma"))
    withResid.join(broadcast(sig), col("event_type") === col("st"))
      .select(col("event_type"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("v"), col("expected"),
        when(col("sigma") > 0, q4(col("resid") / col("sigma"))).as("z"),
        when(col("sigma") > 0 &&
          abs(col("resid") / col("sigma")) >= SeasAdjTau, 1).otherwise(0)
          .as("is_anomaly"))
      .orderBy("event_type", "hr")
  }

  val ZscoreWindow = 24 // trailing hours in the rolling baseline
  val ZscoreMinObs = 12 // below this the baseline is too thin to score
  val ZscoreTau = 3.0   // |z| at or above this flags an anomaly

  /** ts9: rolling z-score anomaly flags — each hour scored against the
    * mean/stddev of the PRECEDING [[ZscoreWindow]] observed hours
    * (frame ends at 1 PRECEDING, so a spike never suppresses itself by
    * inflating its own baseline). This is the LOCAL-spike complement
    * to e6's global median/MAD outliers: a value that is normal
    * corpus-wide but 5σ above its recent trailing level is exactly
    * what a paging alert needs. Scale shape: the window is PARTITIONED
    * by event_type over the span-bounded hourly aggregate (ts1's spine
    * argument) — corpus-scale work remains the one keyed hour
    * aggregate. Determinism: the rolling moments are DECIMAL window
    * sums (order-independent, exact), converted to double only for the
    * final mean/variance arithmetic — both engines then evaluate
    * identical doubles, so the z-scores and the ≥τ flag are
    * bit-stable (SURVEY §4). */
  def ts9RollingZscore(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(-ZscoreWindow, -1)
    val vd = col("v").cast("decimal(18,6)")
    val withMoments = hourly(s, dir)
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum", sum(vd).over(w))
      .withColumn("roll_sum2", sum(vd * vd).over(w))
    val n = col("roll_n").cast("double")
    val sm = col("roll_sum").cast("double")
    val s2 = col("roll_sum2").cast("double")
    val mean = sm / n
    val variance = (s2 * n - sm * sm) / (n * n * (n - lit(1.0)))
    withMoments
      .withColumn("z",
        // int64-quantize at the output boundary (q4 = floor(x·1e4+0.5)
        // /1e4), never round(double, 4): the ts10 mu/σ lesson — Spark
        // rounds via the shortest decimal STRING while DuckDB rounds
        // the binary value, so they can disagree by 1e-4 exactly at
        // half boundaries. floor/×/÷ are IEEE-identical in both.
        when(col("roll_n") >= ZscoreMinObs && variance > 0,
          q4((col("v") - mean) / sqrt(variance))))
      .select(col("event_type"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("v"), col("roll_n"), col("z"),
        when(abs(col("z")) >= ZscoreTau, 1).otherwise(0).as("is_anomaly"))
      .orderBy("event_type", "hr")
  }

  val CusumK = 0.5 // slack, in sigmas: drift below k·sigma accumulates nothing
  val CusumH = 4.0 // alarm threshold, in sigmas (the standard (0.5, 4) tuning)

  /** Cross-engine-exact 6dp quantization: floor(x·1e6 + 0.5)/1e6.
    * Unlike round(double, 6) / a decimal cast, every step is an IEEE
    * op on bit-identical inputs, so both engines produce the same
    * double (SURVEY §4, the g4 int64-quantization rule). */
  private[graft] def q6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)

  /** 4dp variant of [[q6]] for ts9's z-score output boundary. */
  private[graft] def q4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1e4) + lit(0.5)).cast("double") / lit(1e4)

  /** ts10: CUSUM changepoint detection per series — the two one-sided
    * cumulative sums S⁺ₜ = max(0, S⁺ₜ₋₁ + (vₜ−μ−kσ)) and
    * S⁻ₜ = max(0, S⁻ₜ₋₁ + (μ−vₜ−kσ)) (Page 1954), which accumulate
    * SUSTAINED drift from the series' own baseline and alarm when
    * either side crosses hσ — the level-shift detector where ts9's
    * z-score only sees single-hour spikes. Sequential by definition,
    * so it follows ts5/ts8's shape exactly: the recurrence folds
    * in-row over each series' span-bounded hourly list; μ and σ are
    * exact decimal moments of the same series rounded to 6dp BEFORE
    * the fold, so both engines fold the identical double sequence and
    * the whole output (sums, alarms) is hash-checkable against a
    * recursive-CTE oracle. */
  def ts10Cusum(s: SparkSession, dir: String): DataFrame = {
    val stats = hourly(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("sn"),
        sum(col("v").cast("decimal(18,6)")).as("sv"),
        sum(col("v").cast("decimal(18,6)") * col("v").cast("decimal(18,6)"))
          .as("sv2"))
      .select(col("event_type"),
        // INT64-quantize (floor(x·1e6 + 0.5) / 1e6), never
        // round(double, 6) or a decimal cast: Spark's double→decimal
        // path goes through the shortest STRING representation while
        // DuckDB scales the BINARY value, so the two can disagree by
        // 1e-6 at half boundaries — and mu/σ enter EVERY fold step,
        // so one such disagreement compounds across the series
        // (measured: 1 row in 3385 off by 1e-6 under both round()
        // and decimal-cast quantization; the g4 adamic_adar lesson,
        // SURVEY §4). floor/×/÷ on bit-identical doubles are IEEE-
        // identical in both engines.
        q6(col("sv").cast("double") / col("sn")).as("mu"),
        q6(sqrt((col("sv2").cast("double") * col("sn") -
          col("sv").cast("double") * col("sv").cast("double")) /
          (col("sn").cast("double") * col("sn").cast("double") -
            col("sn").cast("double")))).as("sigma"))
    // compiled O(n) two-sided recurrence (SeriesFoldExpr), packed
    // [sp..., sn...]; fold arithmetic order matches the replaced HOF
    // form exactly (S⁺₀ = 0, so step 1's 0 + v − μ − kσ ≡ the old
    // CASE's v − μ − kσ bit-for-bit)
    val spAt = element_at(col("cs"), col("pos") + 1)
    val snAt = element_at(col("cs"), col("nn") + col("pos") + 1)
    hourly(s, dir)
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("hr"), col("v")))).as("srt"))
      .join(stats, Seq("event_type"))
      .withColumn("cs",
        SeriesFoldExpr.cusumFold(col("srt"), col("mu"), col("sigma"), CusumK))
      .withColumn("nn", size(col("srt")))
      .select(col("event_type"), col("sigma"), col("cs"), col("nn"),
        posexplode(col("srt")))
      .select(col("event_type"),
        date_format(col("col.hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("col.v").as("v"),
        // int64-quantize, same cross-engine argument as mu/σ above,
        // here on the OUTPUT boundary
        q6(spAt).as("cusum_pos"),
        q6(snAt).as("cusum_neg"),
        when(spAt > lit(CusumH) * col("sigma") ||
          snAt > lit(CusumH) * col("sigma"), 1).otherwise(0).as("alarm"))
      .orderBy("event_type", "hr")
  }

  /** ts11: LINEAR interpolation across gaps — ts2's LOCF holds the
    * last level flat, which biases any downstream rate/derivative
    * when the underlying signal moves during the hole; the standard
    * alternative reconstructs the straight line between the two
    * nearest OBSERVED neighbors. Same bounded-spine scale shape as
    * ts2; the prev/next anchors come from four IGNORE-NULLS window
    * picks (value + hour index each way), all PARTITIONED by type.
    * Edge holes (before the first / after the last observation) have
    * one anchor only and stay null, labeled by the method column.
    * Arithmetic is exact picks + one fraction on identical doubles →
    * hash-stable. */
  def ts11LinearInterp(s: SparkSession, dir: String): DataFrame = {
    val joined = spine(s, dir)
      .join(hourly(s, dir), Seq("event_type", "hr"), "left")
      .withColumn("i", (col("hr").cast("long") / 3600L).cast("long"))
      .withColumn("oi", when(col("v").isNotNull, col("i")))
    val back = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fwd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(1, Window.unboundedFollowing)
    val interp = col("pv") +
      (col("nv") - col("pv")) * (col("i") - col("pi")) / (col("ni") - col("pi"))
    joined
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pi", last(col("oi"), ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("ni", first(col("oi"), ignoreNulls = true).over(fwd))
      .select(col("event_type"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        coalesce(col("n"), lit(0L)).as("n"),
        when(col("v").isNotNull, col("v"))
          // q6 int64 quantization, not round(double, 6) — the same
          // cross-engine half-boundary argument as ts9/ts10
          .when(col("pv").isNotNull && col("nv").isNotNull, q6(interp))
          .as("value"),
        when(col("v").isNotNull, "obs")
          .when(col("pv").isNotNull && col("nv").isNotNull, "interp")
          .otherwise("edge").as("method"))
      .orderBy("event_type", "hr")
  }

  /** ts12: time-weighted average of `value` per event_type — the
    * correct aggregate for irregularly-sampled state series (a value
    * "holds" until the user's next observation, so a reading that
    * stood for an hour must weigh 3600× one that stood a second;
    * the plain AVG r11-style is sample-biased toward chatty users).
    * Weight = microseconds until the SAME user's next event (lead
    * over a per-user window — high-cardinality partition key, so the
    * one shuffle scales; each user's last event has no hold duration
    * and drops in both engines). Numerator Σ value·dt runs in DECIMAL
    * (exact, order-free — the §4 money-sum rule) with dt an exact
    * int64 of µs; the single final divide is quantized at the output
    * boundary. */
  def ts12TimeWeighted(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dt").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("hold_us"),
        sum(col("v") * col("dt")).as("vdt"))
      .select(col("event_type"), col("n_intervals"), col("hold_us"),
        q6(col("vdt").cast("double") / col("hold_us").cast("double"))
          .as("twa"))
      .orderBy("event_type")
  }

  /** e10: anomaly EPISODES — ts9's per-hour anomaly flags collapsed
    * into contiguous runs (start/end hour, length, peak |z|): what an
    * alerting pipeline actually pages on (one 6-hour incident, not six
    * point alerts). The standard gaps-and-islands grouping — global
    * row number minus anomalous-rows row number is constant exactly
    * within a consecutive anomalous run — with BOTH windows
    * partitioned by series over the span-bounded hourly z frame
    * (ts9's spine argument: the corpus-scale work is ts9's one keyed
    * aggregate; everything here is #types × #hours metadata). Episode
    * bounds are exact string picks, peak_z an exact max of ts9's
    * already-quantized z — nothing new to quantize. */
  def e10AnomalyEpisodes(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    ts9RollingZscore(s, dir)
      .withColumn("rn_all", row_number().over(wAll))
      .filter(col("is_anomaly") === 1)
      .withColumn("grp", col("rn_all") - row_number().over(wAll))
      .groupBy(col("event_type"), col("grp"))
      .agg(min(col("hr")).as("start_hr"), max(col("hr")).as("end_hr"),
        count(lit(1)).as("n_hours"), max(abs(col("z"))).as("peak_z"))
      .select(col("event_type"), col("start_hr"), col("end_hr"),
        col("n_hours"), col("peak_z"))
      .orderBy("event_type", "start_hr")
  }

  /** ts13: Theil–Sen robust trend per series — the median of all
    * pairwise slopes of the daily-count series (Theil 1950 / Sen 1968;
    * the standard robust alternative to ts3's OLS, unmoved by up to
    * ~29% outlier days, where one traffic spike drags an OLS slope).
    * Intercept = median residual at the chosen slope (Sen's form).
    * Scale shape: the only corpus-scale work is the SAME day-grain
    * keyed aggregate ts3 runs; the pairwise self-join runs over the
    * bounded (type × span-days) day frame — O(m²) pairs per series
    * with m the calendar span, metadata-sized like ts6's lag products,
    * never a fact-row join. The slope is quantized (q6, the int64
    * rule) BEFORE the residual pass so both engines compute residual
    * medians against bit-identical slopes; both medians interpolate
    * identically on even counts and are re-quantized at the output
    * boundary. */
  def ts13TheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val lo = daily.agg(min(col("day")).as("lo"))
    // one events scan TOTAL: the day frame is referenced by both
    // slope-join sides and the residual pass — without the checkpoint
    // Catalyst re-derives it per branch and the plan scans events ~6×
    // (the prof5 one-tree lesson; here the frame is bounded
    // #types × span-days metadata, so materializing it is free)
    val d = daily.crossJoin(broadcast(lo)) // 1-row bounded metadata
      .select(col("event_type"),
        datediff(col("day"), col("lo")).cast("double").as("x"),
        col("n").cast("double").as("y"))
      .localCheckpoint()
    val slopes = d.select(col("event_type"), col("x").as("x1"), col("y").as("y1"))
      .join(d.select(col("event_type").as("et2"), col("x").as("x2"),
        col("y").as("y2")),
        col("event_type") === col("et2") && col("x1") < col("x2"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        q6(median((col("y2") - col("y1")) / (col("x2") - col("x1"))))
          .as("slope"))
    d.join(slopes, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("n_pairs")).as("n_pairs"), // constant per type
        max(col("slope")).as("slope"),
        q6(median(col("y") - col("slope") * col("x"))).as("intercept"))
      .orderBy("event_type")
  }

  /** ts9's oracle body — shared so e10's episode oracle can wrap the
    * exact same anomaly frame as a subquery. */
  private val Ts9OracleSql: String =
    s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
       |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*), 6) AS v
       |  FROM events GROUP BY 1, 2),
       |m AS (SELECT event_type, hr, v,
       |    count(*) OVER w AS roll_n,
       |    SUM(CAST(v AS DECIMAL(18,6))) OVER w AS roll_sum,
       |    SUM(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6)))
       |      OVER w AS roll_sum2
       |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr
       |    ROWS BETWEEN $ZscoreWindow PRECEDING AND 1 PRECEDING)),
       |z AS (SELECT event_type, hr, v, roll_n,
       |    CASE WHEN roll_n >= $ZscoreMinObs AND
       |      (CAST(roll_sum2 AS DOUBLE) * roll_n
       |        - CAST(roll_sum AS DOUBLE) * CAST(roll_sum AS DOUBLE))
       |        / (CAST(roll_n AS DOUBLE) * roll_n * (roll_n - 1.0)) > 0
       |    THEN CAST(floor((v - CAST(roll_sum AS DOUBLE) / roll_n) /
       |      sqrt((CAST(roll_sum2 AS DOUBLE) * roll_n
       |        - CAST(roll_sum AS DOUBLE) * CAST(roll_sum AS DOUBLE))
       |        / (CAST(roll_n AS DOUBLE) * roll_n * (roll_n - 1.0)))
       |      * 1e4 + 0.5) AS BIGINT) / 1e4
       |    END AS z
       |  FROM m)
       |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr, v,
       |  roll_n, z,
       |  CASE WHEN abs(z) >= $ZscoreTau THEN 1 ELSE 0 END AS is_anomaly
       |FROM z ORDER BY 1, 2""".stripMargin

  /** Minimum segment length (days) on each side of a ts15 candidate
    * split — the standard guard against degenerate 1-point segments.
    * (Declared before the oracles map: a later declaration would
    * interpolate the uninitialized 0 into the SQL.) */
  val CpMinSeg = 3

  /** Half-width of ts16's centered moving-average trend window
    * (12 preceding + current + 11 following = one 24 h day). Declared
    * before the oracles map — a later declaration interpolates the
    * uninitialized 0 into the SQL (the CpMinSeg trap). */
  val StlHalf = 12

  /** ts16's oracle text — a def so ts18's oracle can wrap the SAME
    * decomposition SQL as a subquery (the advice-#4 builder rule: one
    * definition of the decomposition on the oracle side too). */
  private[graft] def ts16Oracle: String = {
      def q6s(e: String) = s"CAST(floor(($e) * 1e6 + 0.5) AS BIGINT) / 1e6"
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
         |    count(*) AS cnt FROM events GROUP BY 1, 2),
         |span AS (SELECT date_trunc('hour', min(ts)) AS lo,
         |    date_trunc('hour', max(ts)) AS hi FROM events),
         |spine AS (SELECT t.event_type, g.hr
         |  FROM (SELECT DISTINCT event_type FROM events) t
         |  CROSS JOIN (SELECT unnest(generate_series(lo, hi,
         |    INTERVAL 1 HOUR)) AS hr FROM span) g),
         |dense AS (SELECT s.event_type, s.hr, COALESCE(h.cnt, 0) AS n
         |  FROM spine s LEFT JOIN h USING (event_type, hr)),
         |wt AS (SELECT event_type, hr, n,
         |    CAST(count(*) OVER fr AS BIGINT) AS frame_n,
         |    CAST(sum(n) OVER fr AS BIGINT) AS frame_sum
         |  FROM dense WINDOW fr AS (PARTITION BY event_type ORDER BY hr
         |    ROWS BETWEEN $StlHalf PRECEDING AND ${StlHalf - 1} FOLLOWING)),
         |det AS (SELECT event_type, hr, n,
         |    CASE WHEN frame_n = ${2 * StlHalf}
         |      THEN CAST(frame_sum AS DOUBLE) / ${2 * StlHalf}.0 END
         |      AS trend_raw,
         |    extract(hour FROM hr) AS hod FROM wt),
         |dq AS (SELECT *, CAST(n AS DOUBLE) - trend_raw AS det,
         |    CAST(floor((CAST(n AS DOUBLE) - trend_raw) * 1e6 + 0.5)
         |      AS BIGINT) AS detq FROM det),
         |prof AS (SELECT event_type AS pt, hod AS ph,
         |    ${q6s("(CAST(sum(detq) AS DOUBLE) / 1e6) / count(*)")}
         |      AS seasonal
         |  FROM dq WHERE trend_raw IS NOT NULL GROUP BY 1, 2)
         |SELECT d.event_type, strftime(d.hr, '%Y-%m-%d %H:%M:%S') AS hr,
         |  d.n, ${q6s("trend_raw")} AS trend,
         |  CASE WHEN trend_raw IS NOT NULL THEN seasonal END AS seasonal,
         |  CASE WHEN trend_raw IS NOT NULL
         |    THEN ${q6s("det - seasonal")} END AS remainder
         |FROM dq d LEFT JOIN prof ON d.event_type = pt AND d.hod = ph
         |ORDER BY d.event_type, d.hr""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ts19_lttb" -> ts19Oracle,
    "ts16_stl_decompose" -> ts16Oracle,
    "ts18_stl_anomalies" -> {
      def q6s(e: String) = s"CAST(floor(($e) * 1e6 + 0.5) AS BIGINT) / 1e6"
      s"""WITH stl AS (SELECT * FROM ($ts16Oracle) t),
         |r AS (SELECT event_type, hr, n, remainder FROM stl
         |  WHERE remainder IS NOT NULL),
         |med AS (SELECT event_type, quantile_cont(remainder, 0.5) AS med
         |  FROM r GROUP BY 1),
         |dev AS (SELECT r.event_type, r.hr, r.n, r.remainder, m.med,
         |    abs(r.remainder - m.med) AS ad
         |  FROM r JOIN med m USING (event_type)),
         |mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
         |  FROM dev GROUP BY 1)
         |SELECT d.event_type, d.hr, d.n, d.remainder,
         |  CASE WHEN mad.mad > 0 THEN
         |    ${q6s(s"(d.remainder - d.med) / (${Mining.MadScale} * mad.mad)")}
         |  END AS robust_z
         |FROM dev d JOIN mad USING (event_type)
         |WHERE d.ad > ${Mining.MadK * Mining.MadScale} * mad.mad
         |ORDER BY d.event_type, d.hr""".stripMargin
    },
    "ts15_changepoint" -> {
      def q6s(e: String) = s"CAST(floor(($e) * 1e6 + 0.5) AS BIGINT) / 1e6"
      s"""WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
         |    count(*) AS cnt FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, d,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
         |      AS BIGINT) AS idx,
         |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum,
         |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot
         |  FROM daily),
         |cand AS (SELECT event_type, d, idx, n,
         |    CAST(cum AS DOUBLE) / idx AS mean_l,
         |    CAST(tot - cum AS DOUBLE) / (n - idx) AS mean_r
         |  FROM w WHERE idx >= $CpMinSeg AND idx <= n - $CpMinSeg),
         |sc AS (SELECT *, abs(mean_l - mean_r) AS score,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY abs(mean_l - mean_r) DESC, d) AS rn
         |  FROM cand)
         |SELECT event_type, strftime(d, '%Y-%m-%d') AS split_day,
         |  n AS n_days, idx AS n_before, n - idx AS n_after,
         |  ${q6s("mean_l")} AS mean_before,
         |  ${q6s("mean_r")} AS mean_after,
         |  ${q6s("score")} AS mean_gap
         |FROM sc WHERE rn = 1 ORDER BY event_type""".stripMargin
    },
    "e10_anomaly_episodes" ->
      s"""WITH a AS (SELECT event_type, hr, z, is_anomaly,
         |    row_number() OVER (PARTITION BY event_type ORDER BY hr)
         |      AS rn_all
         |  FROM ($Ts9OracleSql)),
         |g AS (SELECT event_type, hr, z,
         |    rn_all - row_number() OVER (PARTITION BY event_type
         |      ORDER BY hr) AS grp
         |  FROM a WHERE is_anomaly = 1)
         |SELECT event_type, min(hr) AS start_hr, max(hr) AS end_hr,
         |  count(*) AS n_hours, max(abs(z)) AS peak_z
         |FROM g GROUP BY event_type, grp
         |ORDER BY event_type, start_hr""".stripMargin,
    "ts12_time_weighted" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) AS us,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events),
        |d AS (SELECT event_type, v,
        |    lead(us, 1) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) - us AS dt
        |  FROM e)
        |SELECT event_type, count(*) AS n_intervals,
        |  CAST(SUM(dt) AS BIGINT) AS hold_us,
        |  CAST(floor(CAST(SUM(v * dt) AS DOUBLE)
        |    / CAST(SUM(dt) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) / 1e6 AS twa
        |FROM d WHERE dt IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts9_rolling_zscore" -> Ts9OracleSql,
    "ts10_cusum" ->
      s"""WITH RECURSIVE h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*), 6) AS v
         |  FROM events GROUP BY 1, 2),
         |st AS (SELECT event_type,
         |    CAST(floor(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*) * 1e6 + 0.5) AS BIGINT) / 1e6 AS mu,
         |    CAST(floor(sqrt((CAST(SUM(CAST(v AS DECIMAL(18,6))
         |        * CAST(v AS DECIMAL(18,6))) AS DOUBLE) * count(*)
         |      - CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
         |        * CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE))
         |      / (CAST(count(*) AS DOUBLE) * count(*) - count(*)))
         |      * 1e6 + 0.5) AS BIGINT) / 1e6 AS sigma
         |  FROM h GROUP BY 1),
         |idx AS (SELECT h.event_type, h.hr, h.v, st.mu, st.sigma,
         |    row_number() OVER (PARTITION BY h.event_type ORDER BY h.hr) AS i
         |  FROM h JOIN st USING (event_type)),
         |r AS (
         |  SELECT event_type, hr, v, mu, sigma, i,
         |    greatest(CAST(0.0 AS DOUBLE), v - mu - $CusumK * sigma) AS sp,
         |    greatest(CAST(0.0 AS DOUBLE), mu - v - $CusumK * sigma) AS sn
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT n.event_type, n.hr, n.v, n.mu, n.sigma, n.i,
         |    greatest(CAST(0.0 AS DOUBLE), r.sp + n.v - n.mu - $CusumK * n.sigma),
         |    greatest(CAST(0.0 AS DOUBLE), r.sn + n.mu - n.v - $CusumK * n.sigma)
         |  FROM r JOIN idx n ON n.event_type = r.event_type AND n.i = r.i + 1)
         |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr, v,
         |  CAST(floor(sp * 1e6 + 0.5) AS BIGINT) / 1e6 AS cusum_pos,
         |  CAST(floor(sn * 1e6 + 0.5) AS BIGINT) / 1e6 AS cusum_neg,
         |  CASE WHEN sp > $CusumH * sigma OR sn > $CusumH * sigma
         |    THEN 1 ELSE 0 END AS alarm
         |FROM r ORDER BY 1, 2""".stripMargin,
    "ts11_linear_interp" ->
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
        |j AS (SELECT s.event_type, s.hr, COALESCE(h.n, 0) AS n, h.v,
        |    CAST(epoch(s.hr) AS BIGINT) / 3600 AS i,
        |    CASE WHEN h.v IS NOT NULL
        |      THEN CAST(epoch(s.hr) AS BIGINT) / 3600 END AS oi
        |  FROM spine s LEFT JOIN h USING (event_type, hr)),
        |a AS (SELECT *,
        |    last_value(v IGNORE NULLS) OVER wb AS pv,
        |    last_value(oi IGNORE NULLS) OVER wb AS pi,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    first_value(oi IGNORE NULLS) OVER wf AS ni
        |  FROM j WINDOW
        |    wb AS (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    wf AS (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr, n,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL
        |         THEN CAST(floor((pv + (nv - pv) * (i - pi) / (ni - pi))
        |           * 1e6 + 0.5) AS BIGINT) / 1e6
        |  END AS value,
        |  CASE WHEN v IS NOT NULL THEN 'obs'
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
        |       ELSE 'edge' END AS method
        |FROM a ORDER BY 1, 2""".stripMargin,
    "ts17_forecast_backtest" ->
      s"""WITH RECURSIVE h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*), 6) AS v
         |  FROM events GROUP BY 1, 2),
         |idx AS (SELECT event_type, hr, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i
         |  FROM h),
         |r AS (
         |  SELECT event_type, v, i, v AS e FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT n.event_type, n.v, n.i,
         |    $EwmaAlpha * n.v + ${1 - EwmaAlpha} * r.e
         |  FROM r JOIN idx n ON n.event_type = r.event_type AND n.i = r.i + 1),
         |r2 AS (
         |  SELECT event_type, v, i, v AS l, CAST(0.0 AS DOUBLE) AS b
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT n.event_type, n.v, n.i,
         |    $HoltAlpha * n.v + ${1 - HoltAlpha} * (r2.l + r2.b),
         |    $HoltBeta * (($HoltAlpha * n.v + ${1 - HoltAlpha} * (r2.l + r2.b))
         |      - r2.l) + ${1 - HoltBeta} * r2.b
         |  FROM r2 JOIN idx n ON n.event_type = r2.event_type AND n.i = r2.i + 1),
         |f AS (SELECT n.event_type, n.v,
         |    r.e AS f_ewma, r2.l + r2.b AS f_holt
         |  FROM idx n
         |  JOIN r ON r.event_type = n.event_type AND r.i = n.i - 1
         |  JOIN r2 ON r2.event_type = n.event_type AND r2.i = n.i - 1),
         |m AS (
         |  SELECT event_type, 'ewma' AS model, COUNT(*) AS n_eval,
         |    CAST(SUM(CAST(floor(abs(v - f_ewma) * 1e9 + 0.5) AS BIGINT))
         |      AS BIGINT) AS sae,
         |    CAST(SUM(CAST(floor((v - f_ewma) * (v - f_ewma) * 1e9 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS sse
         |  FROM f GROUP BY 1
         |  UNION ALL
         |  SELECT event_type, 'holt' AS model, COUNT(*) AS n_eval,
         |    CAST(SUM(CAST(floor(abs(v - f_holt) * 1e9 + 0.5) AS BIGINT))
         |      AS BIGINT) AS sae,
         |    CAST(SUM(CAST(floor((v - f_holt) * (v - f_holt) * 1e9 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS sse
         |  FROM f GROUP BY 1)
         |SELECT event_type, model, n_eval,
         |  round((CAST(sae AS DOUBLE) / n_eval) / 1e9, 6) AS mae,
         |  round(sqrt((CAST(sse AS DOUBLE) / n_eval) / 1e9), 6) AS rmse
         |FROM m ORDER BY event_type, model""".stripMargin,
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
    "ts14_seasonal_adjust" ->
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*), 6) AS v
         |  FROM events GROUP BY 1, 2),
         |hh AS (SELECT event_type, hr, v, CAST(hour(hr) AS INT) AS hod
         |  FROM h),
         |prof AS (SELECT event_type, hod,
         |    CAST(floor(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*) * 1e6 + 0.5) AS BIGINT) / 1e6 AS expected
         |  FROM hh GROUP BY 1, 2),
         |r AS (SELECT hh.event_type, hh.hr, hh.v, prof.expected,
         |    hh.v - prof.expected AS resid
         |  FROM hh JOIN prof USING (event_type, hod)),
         |sg AS (SELECT event_type,
         |    CAST(floor(sqrt((CAST(SUM(CAST(resid AS DECIMAL(18,6))
         |        * CAST(resid AS DECIMAL(18,6))) AS DOUBLE) * count(*)
         |      - CAST(SUM(CAST(resid AS DECIMAL(18,6))) AS DOUBLE)
         |        * CAST(SUM(CAST(resid AS DECIMAL(18,6))) AS DOUBLE))
         |      / (CAST(count(*) AS DOUBLE) * count(*) - count(*)))
         |      * 1e6 + 0.5) AS BIGINT) / 1e6 AS sigma
         |  FROM r GROUP BY 1)
         |SELECT r.event_type, strftime(r.hr, '%Y-%m-%d %H:%M:%S') AS hr,
         |  r.v, r.expected,
         |  CASE WHEN sg.sigma > 0 THEN
         |    CAST(floor(r.resid / sg.sigma * 1e4 + 0.5) AS BIGINT) / 1e4
         |  END AS z,
         |  CASE WHEN sg.sigma > 0 AND abs(r.resid / sg.sigma) >= $SeasAdjTau
         |    THEN 1 ELSE 0 END AS is_anomaly
         |FROM r JOIN sg USING (event_type)
         |ORDER BY 1, 2""".stripMargin,
    "ts13_theil_sen" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |lo AS (SELECT min(day) AS lo FROM daily),
        |d AS (SELECT dd.event_type,
        |    CAST(date_diff('day', lo.lo, dd.day) AS DOUBLE) AS x,
        |    CAST(dd.n AS DOUBLE) AS y
        |  FROM daily dd CROSS JOIN lo),
        |sl AS (SELECT a.event_type, count(*) AS n_pairs,
        |    CAST(floor(median((b.y - a.y) / (b.x - a.x)) * 1e6 + 0.5)
        |      AS BIGINT) / 1e6 AS slope
        |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.x < b.x
        |  GROUP BY 1)
        |SELECT d.event_type, count(*) AS n_days, max(sl.n_pairs) AS n_pairs,
        |  max(sl.slope) AS slope,
        |  CAST(floor(median(d.y - sl.slope * d.x) * 1e6 + 0.5) AS BIGINT)
        |    / 1e6 AS intercept
        |FROM d JOIN sl ON d.event_type = sl.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
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

  /** ts15: single-changepoint detection per series (binary
    * segmentation's first step, Scott & Knott 1974 / the AMOC case of
    * Killick et al. 2012): for each event type's daily-count series,
    * the split day maximizing the between-segment mean gap
    * |mean_left − mean_right|, with [[CpMinSeg]] days required on each
    * side. Determinism is structural: daily counts are exact integers,
    * prefix sums over them are exact window folds, and each candidate's
    * means are single correctly-rounded int÷int divisions — so the
    * score is the same double in both engines and the (score desc,
    * day asc) argmax cannot flip. Scale shape: ONE corpus-scale keyed
    * aggregate to (type, day) grain (map-side partials); every window
    * below runs over the span-bounded series frame (#types × #days —
    * the ts1 spine argument), and the argmax is a per-series
    * row_number, not a global sort. */
  def ts15Changepoint(s: SparkSession, dir: String): DataFrame =
    changepointOf(Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt")))

  /** ts15 core on an arbitrary (event_type, d, cnt) daily frame —
    * factored out so the spec can plant a synthetic level shift. */
  private[graft] def changepointOf(daily: DataFrame): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val series = byType.orderBy(col("d"))
    val cand = daily
      .withColumn("idx", row_number().over(series).cast("long"))
      .withColumn("cum", sum(col("cnt")).over(series))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("tot", sum(col("cnt")).over(byType))
      .filter(col("idx") >= CpMinSeg && col("idx") <= col("n") - CpMinSeg)
      .withColumn("mean_l", col("cum").cast("double") / col("idx"))
      .withColumn("mean_r",
        (col("tot") - col("cum")).cast("double") / (col("n") - col("idx")))
      .withColumn("score", abs(col("mean_l") - col("mean_r")))
    cand
      .withColumn("rn", row_number().over(
        byType.orderBy(col("score").desc, col("d"))))
      .filter(col("rn") === 1)
      .select(col("event_type"),
        graft.Cols.fmtDate(col("d")).as("split_day"),
        col("n").as("n_days"), col("idx").as("n_before"),
        (col("n") - col("idx")).as("n_after"),
        q6(col("mean_l")).as("mean_before"),
        q6(col("mean_r")).as("mean_after"),
        q6(col("score")).as("mean_gap"))
      .orderBy("event_type")
  }

  /** ts16: classical additive seasonal decomposition — series =
    * trend + seasonal + remainder (the `seasonal_decompose` every
    * metrics stack runs before alerting on "is traffic actually
    * down?"; Cleveland's STL is the loess refinement of exactly this
    * estimator). Trend is the centered 24 h moving average over the
    * DENSE hourly count series (ts1's spine — classical decomposition
    * requires a regular grid, and a missing hour is a true zero);
    * seasonal is the hour-of-day mean of the detrended series;
    * remainder is what's left. Emitted only where the trend frame is
    * FULL (the classical edge convention — edges carry NULLs).
    * Determinism: counts are integers, the trend is one exact-int
    * frame sum ÷ 24 (correctly rounded), and each detrended value is
    * int64-quantized (1e-6) before the seasonal mean so the per-hod
    * fold is order-free (the g2 rq discipline); remainder arithmetic
    * is fixed-order IEEE on those quantized values. Scale shape: ONE
    * corpus-scale keyed aggregate to (type, hour); spine, windows,
    * profile and joins all run on the span-bounded series frame
    * (#types × #hours), the profile broadcasts back. */
  def ts16StlDecompose(s: SparkSession, dir: String): DataFrame =
    stlOf(spine(s, dir)
      .join(Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt")), Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("cnt"), lit(0L)).as("n")))

  /** ts16 core on an arbitrary DENSE (event_type, hr, n) frame —
    * factored out so the spec can plant an exact square-wave season. */
  private[graft] def stlOf(dense: DataFrame): DataFrame = {
    val wTrend = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(-StlHalf, StlHalf - 1)
    val withTrend = dense
      .withColumn("frame_n", count(lit(1)).over(wTrend))
      .withColumn("trend_raw", when(col("frame_n") === 2 * StlHalf,
        sum(col("n")).over(wTrend).cast("double") /
          lit((2 * StlHalf).toDouble)))
      .withColumn("det", col("n").cast("double") - col("trend_raw"))
      .withColumn("detq", floor(col("det") * lit(1e6) + lit(0.5)).cast("long"))
      // bounded series frame; two consumers (profile + output join)
      .localCheckpoint()
    val prof = withTrend.filter(col("trend_raw").isNotNull)
      .groupBy(col("event_type").as("pt"), hour(col("hr")).as("ph"))
      .agg(q6((sum(col("detq")).cast("double") / lit(1e6)) / count(lit(1)))
        .as("seasonal"))
    withTrend.join(broadcast(prof),
        col("event_type") === col("pt") && hour(col("hr")) === col("ph"),
        "left")
      .select(col("event_type"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("n"), q6(col("trend_raw")).as("trend"),
        when(col("trend_raw").isNotNull, col("seasonal")).as("seasonal"),
        when(col("trend_raw").isNotNull, q6(col("det") - col("seasonal")))
          .as("remainder"))
      .orderBy("event_type", "hr")
  }

  /** ts18: STL-residual ANOMALY flags — ts16 made actionable (the
    * r14 removal-pattern on the monitoring plane): the decomposition
    * explains a series as trend + seasonality; what remains is the
    * signal an on-call actually wants flagged, and thresholding the
    * RAW counts instead would page on every seasonal peak. Per
    * series: robust center/scale of the remainder (median + MAD —
    * e6's estimator at the residual grain, immune to the very
    * anomalies being hunted), flag |r − med| > MadK·1.4826·MAD, and
    * emit only the anomalous hours with their robust z-score. Scale
    * shape: ts16's bounded series spine (hours × types, never fact
    * rows), two bounded per-series percentile aggregates riding
    * broadcast joins, one filter — every input is q6-quantized by
    * ts16 so both engines threshold identical doubles. mad = 0
    * (constant remainder) keeps the e6 comparison semantics: any
    * positive deviation flags, and the z-score is NULL rather than
    * an Inf that no alert router wants. */
  def ts18StlAnomalies(s: SparkSession, dir: String): DataFrame =
    stlAnomaliesOf(ts16StlDecompose(s, dir))

  /** ts18 core on an arbitrary stl frame — spec hook (planted spike). */
  private[graft] def stlAnomaliesOf(stl: DataFrame): DataFrame = {
    val r = stl.filter(col("remainder").isNotNull)
      .select(col("event_type"), col("hr"), col("n"), col("remainder"))
    val med = r.groupBy(col("event_type"))
      .agg(expr("percentile(remainder, 0.5)").as("med"))
    val dev = r.join(broadcast(med), Seq("event_type"))
      .withColumn("ad", abs(col("remainder") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("ad") > lit(Mining.MadK * Mining.MadScale) * col("mad"))
      .select(col("event_type"), col("hr"), col("n"), col("remainder"),
        when(col("mad") > 0, q6((col("remainder") - col("med")) /
          (lit(Mining.MadScale) * col("mad")))).as("robust_z"))
      .orderBy("event_type", "hr")
  }

  /** ts19's output size: every series downsamples to ≤ this many
    * points (the dashboard pixel budget LTTB was designed for).
    * `final val` with no type annotation — a compile-time constant,
    * so the `oracles` map (initialized BEFORE this line in object
    * init order) interpolates 20, not an uninitialized 0 (the
    * PassageWords/SpanTokensSql rule). */
  final val LttbTarget = 20

  /** ts19: LTTB downsampling (Steinarsson 2013 — the de-facto
    * standard for plotting large series) — reduce each hourly series
    * to [[LttbTarget]] visually-representative points: first/last
    * always kept, each middle bucket contributes the point whose
    * triangle with the previous pick and the next bucket's centroid
    * has maximal area, so peaks/troughs survive where a naive
    * every-Nth or per-bucket-mean sample flattens them — the
    * downsampler behind every monitoring dashboard rendering months
    * of metrics in one request.
    *
    * Scale shape: the corpus pays exactly the hourly keyed aggregate
    * every ts operator pays; the greedy runs as ONE compiled O(n)
    * fold per bounded series ([[org.apache.spark.sql.graft
    * .LttbUtil]]), never a per-bucket pass over the corpus.
    * Exactness: the inherently sequential argmax chain runs on the
    * exact integer grid (x = rank, y = 1e-6-quantized v) with
    * BigInt/HUGEINT cross-multiplied areas — no double ever decides
    * a pick — so the full selection hash-replays in the unrolled
    * greedy oracle (the n11 pattern on the time axis). */
  def ts19LttbDownsample(s: SparkSession, dir: String): DataFrame =
    lttbOf(hourly(s, dir))

  /** ts19 core on an arbitrary (event_type, hr, v) frame — spec hook
    * (planted spike fixture). */
  private[graft] def lttbOf(h: DataFrame): DataFrame = {
    val selAt = element_at(col("srt"), col("col").cast("int"))
    h
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("hr"), col("v")))).as("srt"))
      .withColumn("sel",
        org.apache.spark.sql.graft.SeriesFoldExpr.lttbFold(col("srt"), LttbTarget))
      .select(col("event_type"), col("srt"), posexplode(col("sel")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("sel_rank"),
        date_format(selAt.getField("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        selAt.getField("v").as("v"))
      .orderBy("event_type", "sel_rank")
  }

  /** ts19's oracle: the greedy unrolled at compile time (n11's
    * committed pattern) — step k picks bucket k's max-area point
    * against the step-(k−1) anchor and bucket (k+1)'s centroid, all
    * in HUGEINT on the same quantized grid as the kernel; series
    * with n ≤ target pass through whole. */
  private def ts19Oracle: String = {
    val t = LttbTarget
    val t2 = t - 2
    val head =
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*), 6) AS v
         |  FROM events GROUP BY 1, 2),
         |idx AS (SELECT event_type, hr, v,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS i,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n,
         |    CAST(floor(v * 1e6 + 0.5) AS BIGINT) AS y
         |  FROM h),
         |mid AS (SELECT event_type, i, y,
         |    ((i - 2) * $t2) // (n - 2) + 1 AS bk
         |  FROM idx WHERE n > $t AND i BETWEEN 2 AND n - 1),
         |cent AS (SELECT event_type, bk, SUM(i) AS sx, SUM(y) AS sy,
         |    COUNT(*) AS cnt FROM mid GROUP BY 1, 2),
         |lastc AS (SELECT event_type, i AS sx, y AS sy, 1 AS cnt
         |  FROM idx WHERE n > $t AND i = n),
         |s0 AS (SELECT event_type, i AS ai, y AS ay FROM idx
         |  WHERE n > $t AND i = 1)""".stripMargin
    val steps = (1 to t2).map { k =>
      val centSrc = if (k < t2) "cent" else "lastc"
      val centCond = if (k < t2) s"ct.bk = ${k + 1} AND " else ""
      s""",
         |s$k AS (SELECT event_type, i AS ai, y AS ay FROM (
         |    SELECT c.event_type, c.i, c.y, ROW_NUMBER() OVER (
         |      PARTITION BY c.event_type ORDER BY
         |      abs((CAST(a.ai AS HUGEINT) * ct.cnt - ct.sx) * (c.y - a.ay)
         |        - (a.ai - c.i) * (ct.sy - CAST(a.ay AS HUGEINT) * ct.cnt))
         |        DESC, c.i ASC) AS rn
         |    FROM mid c
         |    JOIN s${k - 1} a ON a.event_type = c.event_type
         |    JOIN $centSrc ct ON ${centCond}ct.event_type = c.event_type
         |    WHERE c.bk = $k) WHERE rn = 1)""".stripMargin
    }.mkString
    val selUnion = ((0 to t2).map(k =>
      s"SELECT event_type, ai AS i, ${k + 1} AS sel_rank FROM s$k") ++ Seq(
      s"SELECT event_type, i, $t AS sel_rank FROM idx WHERE n > $t AND i = n",
      s"SELECT event_type, i, CAST(i AS BIGINT) AS sel_rank FROM idx WHERE n <= $t"))
      .mkString("\n  UNION ALL ")
    head + steps +
      s""",
         |sel AS (
         |  $selUnion)
         |SELECT s.event_type, CAST(s.sel_rank AS INT) AS sel_rank,
         |  strftime(x.hr, '%Y-%m-%d %H:%M:%S') AS hr, x.v
         |FROM sel s JOIN idx x ON x.event_type = s.event_type AND x.i = s.i
         |ORDER BY s.event_type, s.sel_rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts19_lttb" -> (ts19LttbDownsample _),
    "ts16_stl_decompose" -> (ts16StlDecompose _),
    "ts18_stl_anomalies" -> (ts18StlAnomalies _),
    "ts15_changepoint" -> (ts15Changepoint _),
    "ts1_gap_fill" -> (ts1GapFill _),
    "ts2_locf_fill" -> (ts2LocfFill _),
    "ts3_trend" -> (ts3Trend _),
    "ts4_ohlc_resample" -> (ts4OhlcResample _),
    "ts5_ewma" -> (ts5Ewma _),
    "ts6_autocorr" -> (ts6Autocorr _),
    "ts7_seasonality" -> (ts7Seasonality _),
    "ts8_holt" -> (ts8Holt _),
    "ts17_forecast_backtest" -> (ts17ForecastBacktest _),
    "ts9_rolling_zscore" -> (ts9RollingZscore _),
    "ts10_cusum" -> (ts10Cusum _),
    "ts11_linear_interp" -> (ts11LinearInterp _),
    "ts12_time_weighted" -> (ts12TimeWeighted _),
    "ts13_theil_sen" -> (ts13TheilSen _),
    "ts14_seasonal_adjust" -> (ts14SeasonalAdjust _),
    "e10_anomaly_episodes" -> (e10AnomalyEpisodes _))
}
