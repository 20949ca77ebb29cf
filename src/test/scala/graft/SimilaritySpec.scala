package graft

import graft.operators.Similarity

/** ANN recall contracts (rows 29-31): the approximate paths must
  * recover a healthy fraction of the exact top-k neighbors. */
class SimilaritySpec extends GraftSpec {

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private lazy val exact = topkSets(Similarity.n1CosineTopk(spark, sf))

  test("n1 returns exactly top-k rows per query with ranks 1..k") {
    val byQ = Similarity.n1CosineTopk(spark, sf)
      .collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == Similarity.NumQueries)
    byQ.values.foreach { rs =>
      assert(rs.length == Similarity.TopK)
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to Similarity.TopK))
    }
  }

  // bounds match SURVEY §6's claims; measured with the default knobs:
  // n2 = 0.90 at sf0.001 and sf0.01 (16 tables), n3 = 0.82 / 0.78
  test("n2 LSH recall >= 0.8 vs exact") {
    val approx = topkSets(Similarity.n2AnnLsh(spark, sf))
    val recall = exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / exact.size
    assert(recall >= 0.8, s"n2 recall=$recall")
  }

  test("n3 IVF recall >= 0.75 vs exact") {
    val approx = topkSets(Similarity.n3IvfAnn(spark, sf))
    val recall = exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / exact.size
    assert(recall >= 0.75, s"n3 recall=$recall")
  }
}
