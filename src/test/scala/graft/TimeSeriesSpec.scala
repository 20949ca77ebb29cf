package graft

import graft.operators.TimeSeries

/** Gap filling (row 163) and LOCF interpolation (row 164). The spine
  * invariants (full coverage, conserved counts) pin ts1; ts2's carried
  * value is recomputed by a driver-side forward walk.
  */
class TimeSeriesSpec extends GraftSpec {

  test("ts1 spine covers every (type, hour) cell and conserves event counts") {
    val rows = TimeSeries.ts1GapFill(spark, sf).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    val hours = rows.map(_.getAs[String]("hr")).distinct
    assert(rows.length == types.length * hours.length,
      s"dense grid expected: ${rows.length} rows vs ${types.length} types × ${hours.length} hours")
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    // gap rows are exactly the n=0 rows, and holes genuinely exist
    rows.foreach { r =>
      assert((r.getAs[Int]("is_gap") == 1) == (r.getAs[Long]("n") == 0L))
    }
    assert(rows.count(_.getAs[Int]("is_gap") == 1) > 0,
      "fixture should contain genuine hourly holes")
    // hours are consecutive: span size == distinct hour count
    val hs = hours.sorted
    assert(hs.head < hs.last)
  }

  test("ts2 filled value is the most recent non-null observation (driver walk)") {
    val rows = TimeSeries.ts2LocfFill(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("hr"),
        Option(r.getAs[java.lang.Double]("avg_value")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("filled_value")).map(_.doubleValue)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      var carried: Option[Double] = None
      g.sortBy(_._2).foreach { case (t, hr, raw, filled) =>
        if (raw.isDefined) carried = raw
        assert(filled == carried,
          s"$t $hr: filled=$filled, expected carried=$carried (raw=$raw)")
      }
    }
    // leading rows before the first observation stay null somewhere or
    // every series starts with data — either way raw rows must exist
    assert(rows.exists(_._3.isDefined))
    // holes inherit: at least one n=0 row carries a non-null fill
    assert(rows.exists(r => r._3.isEmpty && r._4.isDefined),
      "some hole should inherit a carried value")
  }

  test("ts3 slope/intercept/r2 match a driver-side OLS recompute") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val lo = daily.map(_._2).min
    val byType = daily.groupBy(_._1)
    val got = TimeSeries.ts3Trend(spark, sf).collect()
    assert(got.length == byType.size)
    got.foreach { r =>
      val pts = byType(r.getAs[String]("event_type"))
        .map(p => ((p._2 - lo) / 86400000L.toDouble, p._3.toDouble))
      val n = pts.length
      val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
      val sxy = pts.map(p => (p._1 - mx) * (p._2 - my)).sum
      val sxx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
      val syy = pts.map(p => (p._2 - my) * (p._2 - my)).sum
      val slope = sxy / sxx
      assert(r.getAs[Long]("n_days") == n)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-4)
      assert(math.abs(r.getAs[Double]("intercept") - (my - slope * mx)) < 1e-4)
      assert(math.abs(r.getAs[Double]("r2") - sxy * sxy / (sxx * syy)) < 1e-4)
    }
  }
}
