package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Invariant checks for the relational core (SURVEY §2 rows 1-12).
  * Value-level correctness is the DuckDB oracle's job; these assert
  * the semantic contracts that survive any data distribution.
  */
class RelationalSpec extends GraftSpec {

  test("r1 keeps only error events above threshold") {
    val rows = Relational.r1FilteredScan(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("value") > 100.0))
  }

  test("r2 returns at most 100 rows sorted by value desc") {
    val vals = Relational.r2PriorityTopk(spark, sf)
      .select("value").collect().map(_.getDouble(0))
    assert(vals.length <= 100)
    assert(vals.sameElements(vals.sortBy(-_)))
  }

  test("r3 single-row health metrics are internally consistent") {
    val r = Relational.r3HealthMetrics(spark, sf).collect().head
    assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_errors"))
    assert(r.getAs[Long]("n_users") > 0)
  }

  test("r5 last-write-wins emits exactly one row per (user, type)") {
    val df = Relational.r5UpsertLatest(spark, sf)
    assert(df.count() ==
      df.select("user_id", "event_type").distinct().count())
  }

  test("r6 dedup counts sum to the input row count") {
    val total = Tables.events(spark, sf).count()
    val summed = Relational.r6DedupKey(spark, sf)
      .agg(sum("n_dups")).collect().head.getLong(0)
    assert(summed == total)
  }

  test("r10 emits at most 5 rows per group, ranks 1..n") {
    val byGroup = Relational.r10TopnPerGroup(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .collect()
    assert(byGroup.nonEmpty)
    byGroup.foreach { r =>
      assert(r.getAs[Long]("n") <= 5)
      assert(r.getAs[Int]("mx").toLong == r.getAs[Long]("n"))
    }
  }

  test("r13 page 2 is exactly event-id ranks 501..1000 — no overlap, no gap") {
    val page = Relational.r13KeysetPage(spark, sf).collect().map(_.getLong(0))
    val firstTwo = Tables.events(spark, sf).select("event_id")
      .orderBy("event_id").limit(2 * Relational.PageSize)
      .collect().map(_.getLong(0))
    assert(page.toSeq == firstTwo.drop(Relational.PageSize).toSeq)
  }
}
