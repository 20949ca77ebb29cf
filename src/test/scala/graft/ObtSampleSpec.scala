package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** s6 weighted sampling (row 154) and obt1 star-schema denormalize
  * (row 155).
  */
class ObtSampleSpec extends GraftSpec {

  test("s6 winners match a driver-side Efraimidis-Spirakis recompute") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def uOf(id: Long): Double = {
      val hex = md.digest(s"es:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4294967296.0
    }
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_words"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val want = docs.map { case (id, w) =>
      (id, math.floor(-math.log(uOf(id)) / w * 1e9 + 0.5) / 1e9)
    }.sortBy { case (id, k) => (k, id) }.take(Analytics.WeightedSampleK)
      .map(_._1).toSeq
    val got = Analytics.s6WeightedSample(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("s6 keys favor heavy docs: expected-rank property via weight sums") {
    // E[−ln(u)/w] = 1/w: the mean key of the top-weight half must be
    // below the mean key of the bottom-weight half on any corpus with
    // weight spread.
    val rows = Analytics.s6WeightedSample(spark, sf).collect()
    assert(rows.length == math.min(Analytics.WeightedSampleK,
      Tables.documents(spark, sf).count()).toInt)
    rows.foreach(r => assert(r.getAs[Double]("es_key") > 0.0))
  }

  test("n11 MMR set is no less diverse than plain top-k and keeps the top-1") {
    import graft.operators.Similarity
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    def avgPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.size)
        yield cos(vecs(ids(i)), vecs(ids(j)))
      if (ps.isEmpty) 0.0 else ps.sum / ps.size
    }
    val mmr = Similarity.n11MmrRerank(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getAs[Int]("mmr_rank"))).toMap
    val topk = Similarity.n1CosineTopk(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getAs[Int]("rank"))).toMap
    assert(mmr.keySet == topk.keySet)
    var diversityWins = 0
    mmr.foreach { case (qid, rows) =>
      // relevance anchor: MMR's first pick IS the plain top-1
      assert(rows.head.getLong(1) == topk(qid).head.getLong(1))
      val mmrSim = avgPairSim(rows.map(_.getLong(1)).toSeq)
      val topSim = avgPairSim(topk(qid).map(_.getLong(1)).toSeq)
      assert(mmrSim <= topSim + 1e-9, s"q$qid: MMR less diverse ($mmrSim > $topSim)")
      if (mmrSim < topSim - 1e-9) diversityWins += 1
    }
    assert(diversityWins > 0, "MMR never diversified any query")
  }

  test("n11 executor-side kernel is bit-identical to the retired driver greedy loop") {
    import graft.operators.Similarity
    // driver-side mirror of the pre-r11 implementation: pool = exact
    // top-MmrPool per query, greedy argmax (λ·rel − (1−λ)·maxRed, −id)
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val queries = e.keys.filter(_ < Similarity.NumQueries).toSeq.sorted
    val want = queries.flatMap { qid =>
      val cands = e.keys.filter(_ != qid).toSeq
        .map(id => (id, cos(e(qid), e(id))))
        .sortBy { case (id, c) => (-c, id) }.take(Similarity.MmrPool).toVector
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      while (sel.length < Similarity.TopK && sel.length < cands.length) {
        val pick = cands.filterNot(c => sel.exists(_._1 == c._1))
          .maxBy { case (id, rel) =>
            val red = if (sel.isEmpty) 0.0
              else sel.map(s => cos(e(id), e(s._1))).max
            (Similarity.MmrLambda * rel - (1 - Similarity.MmrLambda) * red, -id)
          }
        sel += pick
      }
      sel.zipWithIndex.map { case ((id, rel), i) => (qid, id, i + 1,
        BigDecimal(rel).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }
    val got = Similarity.n11MmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("n11 runs distributed: no driver collect materializes as a LocalTableScan") {
    import graft.operators.Similarity
    val plan = Similarity.n11MmrRerank(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"),
      "n11 plan contains a literal frame — the greedy loop went back to the driver")
    assert(plan.contains("graft_mmr"), "n11 plan lost the MMR kernel")
  }

  test("a13 z-statistic matches a driver-side recompute from raw counts") {
    import graft.operators.Mining
    val ev = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    def count(t: String, succ: Boolean) = ev.count { case (k, v) =>
      k == t && (!succ || v > Mining.AbThreshold) }
    val (na, xa) = (count(Mining.AbCohortA, false), count(Mining.AbCohortA, true))
    val (nb, xb) = (count(Mining.AbCohortB, false), count(Mining.AbCohortB, true))
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (xa.toDouble / na - xb.toDouble / nb) /
      math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    val r = Mining.a13AbTest(spark, sf).collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("x_a") == xa)
    assert(r.getAs[Long]("n_b") == nb && r.getAs[Long]("x_b") == xb)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
    assert((r.getAs[Int]("significant") == 1) == (math.abs(z) > Mining.AbZCrit))
  }

  test("obt1 preserves every lineitem row and widens it consistently") {
    val out = Analytics.obt1Denormalize(spark, sf)
    assert(out.count() == Tables.lineitem(spark, sf).count())
    // spot-check one row against direct lookups
    val r = out.limit(1).collect().head
    val l = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === r.getAs[Long]("l_orderkey") &&
        col("l_linenumber") === r.getAs[Long]("l_linenumber"))
      .collect().head
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderkey") === r.getAs[Long]("l_orderkey")).collect().head
    assert(r.getAs[Any]("o_orderdate") == o.getAs[Any]("o_orderdate"))
    val expRev = BigDecimal(l.getAs[Double]("l_extendedprice") *
      (1 - l.getAs[Double]("l_discount")))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("revenue") - expRev) < 1e-9)
  }

  test("obt1 plan: dims broadcast, at most one shuffle join, one fact scan") {
    val plan = Analytics.obt1Denormalize(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    val smj = "SortMergeJoin".r.findAllIn(plan).size +
      "ShuffledHashJoin".r.findAllIn(plan).size
    // formatted explain names each node twice (tree + detail)
    assert(bhj >= 8, s"expected >=4 broadcast joins (x2 in explain), got $bhj:\n$plan")
    assert(smj <= 2, s"only the orders join may shuffle, got $smj:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
