package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Invariant checks for the warehouse analytics core (rows 13-23). */
class AnalyticsSpec extends GraftSpec {

  test("q1 groups are the returnflag × linestatus combinations") {
    val rows = Analytics.q1PricingSummary(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    rows.foreach(r => assert(r.getAs[Long]("count_order") > 0))
  }

  test("q3 returns at most 10 rows in descending revenue order") {
    val rev = Analytics.q3TopkRevenue(spark, sf)
      .select("revenue").collect().map(_.getDouble(0))
    assert(rev.length <= 10)
    assert(rev.sameElements(rev.sortBy(-_)))
  }

  test("a3 approx distinct within 5% of exact at rsd=0.01") {
    val exact = Analytics.a2DistinctAgg(spark, sf)
      .select("l_returnflag", "n_orders").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Analytics.a3ApproxDistinct(spark, sf)
      .select("l_returnflag", "approx_orders").collect().foreach { r =>
        val e = exact(r.getString(0)).toDouble
        assert(math.abs(r.getLong(1) - e) / e < 0.05)
      }
  }

  test("a1 rollup grand total equals the table row count") {
    val total = Tables.lineitem(spark, sf).count()
    val grand = Analytics.a1Rollup(spark, sf)
      .filter(col("returnflag") === "ALL").collect()
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == total)
  }

  test("j1 semi+anti partition the customer table") {
    val df = Analytics.j1SemiAnti(spark, sf)
    assert(df.count() == Tables.customer(spark, sf).count())
    assert(df.select("c_custkey").distinct().count() == df.count())
  }

  test("e1 session event counts sum to the event count") {
    val total = Tables.events(spark, sf).count()
    val summed = Analytics.e1Sessionize(spark, sf)
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(summed == total)
  }
}
