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
}
