package graft

import graft.operators.Profiling
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** ANALYZE-style profiling operators (SURVEY §2 rows 135-136). */
class ProfilingSpec extends GraftSpec {

  test("prof1: one profile row per column, consistent with direct aggregates") {
    val rows = Profiling.prof1ColumnProfile(spark, sf).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    val qty = rows.find(_.getString(0) == "l_quantity").get
    assert(qty.getLong(1) == n, "n_rows")
    assert(qty.getLong(2) == 0L, "n_nulls (testdata has none)")
    val direct = li.agg(
      countDistinct(col("l_quantity")), min(col("l_quantity")),
      max(col("l_quantity"))).head()
    assert(qty.getLong(3) == direct.getLong(0), "exact NDV")
    assert(qty.getDouble(4) == direct.getDouble(1) &&
      qty.getDouble(5) == direct.getDouble(2), "min/max")
  }

  test("prof1 plan: single lineitem scan (the unpivot adds no second pass)") {
    val plan = Profiling.prof1ColumnProfile(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // count node-detail headers only (the tree listing repeats the name)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
    // exact multi-column NDV is the Expand form (documented 100 TB
    // swap: approx_count_distinct drops the Expand, same shape)
    assert(plan.contains("Expand"), s"expected Expand for multi-NDV:\n$plan")
  }

  test("prof2: buckets partition the table — counts sum to rowcount, bounds covered") {
    val li = Tables.lineitem(spark, sf)
    val rows = Profiling.prof2Histogram(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == li.count(), "bucket counts must sum to n")
    val buckets = rows.map(_.getLong(0)).toSet
    assert(buckets.min >= 0 && buckets.max <= (Profiling.HistBuckets - 1))
    assert(buckets.contains(0L) && buckets.contains(Profiling.HistBuckets - 1L),
      "min and max rows must land in the first and last bucket")
  }

  test("prof2 plan: bounds come in as a broadcast, not a driver collect") {
    val plan = Profiling.prof2Histogram(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"1-row bounds should broadcast:\n$plan")
  }
}
