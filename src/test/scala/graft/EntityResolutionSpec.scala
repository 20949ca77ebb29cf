package graft

import graft.operators.EntityResolution

/** Blocked fuzzy matching (row 165): the emitted pair set is recomputed
  * driver-side with an independent textbook DP edit distance (pinning
  * Spark's levenshtein kernel), and the blocking contract is asserted
  * explicitly — matches share a block, non-candidates never pay the
  * kernel.
  */
class EntityResolutionSpec extends GraftSpec {

  private def editDistance(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("er1 pairs match a driver-side blocked recompute with reference DP distance") {
    val names = Tables.part(spark, sf).groupBy("p_name").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count"))
    val byBlock = names.toSeq.groupBy(_._1.split(" ").last)
    val want = byBlock.values.flatMap { block =>
      for {
        (na, ca) <- block; (nb, cb) <- block
        if na < nb
        d = editDistance(na, nb)
        if d <= EntityResolution.MaxEditDistance
      } yield (na, nb, d, ca, cb)
    }.toSeq.sortBy(p => (p._1, p._2))
    val got = EntityResolution.er1FuzzyMatch(spark, sf).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Int]("dist"), r.getAs[Long]("n_parts_a"),
        r.getAs[Long]("n_parts_b"))).toSeq
    assert(got == want, s"got ${got.take(5)}...\nwant ${want.take(5)}...")
    assert(got.nonEmpty, "fixture should contain fuzzy matches")
  }

  test("er1 emitted pairs always share a block and clear the length prune") {
    EntityResolution.er1FuzzyMatch(spark, sf).collect().foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a.split(" ").last == b.split(" ").last, s"cross-block pair $a / $b")
      assert(math.abs(a.length - b.length) <= EntityResolution.MaxEditDistance)
    }
  }
}
