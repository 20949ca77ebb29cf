package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank (row 160): the distributed power iteration is pinned
  * against an exact driver-side reference on the same edge list, and
  * probability mass conservation is asserted directly.
  */
class GraphSpec extends GraftSpec {

  private def referenceRanks(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val inflow = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for ((src, dsts) <- out; d <- dsts) inflow(d) += r(src) / dsts.size
      r = nodes.map(v => v -> ((1.0 - Graph.Damping) / n +
        Graph.Damping * (inflow(v) + dangling / n))).toMap
    }
    r
  }

  test("g2 matches an exact driver-side power iteration") {
    val e = Graph.edges(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val want = referenceRanks(e, Graph.PrIters)
    val got = Graph.pagerank(Graph.edges(spark, sf)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("r")).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (node, r) =>
      assert(math.abs(r - want(node)) < 1e-9, s"node $node: $r vs ${want(node)}")
    }
  }

  test("g2 rank mass stays a probability distribution") {
    val ranks = Graph.pagerank(Graph.edges(spark, sf))
    val total = ranks.agg(sum("r")).collect().head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"mass $total")
    assert(ranks.filter(col("r") <= 0).count() == 0)
  }

  test("g2 top-k is deterministically ordered and typed") {
    val rows = Graph.g2Pagerank(spark, sf).collect()
    assert(rows.length <= Graph.PrTopK && rows.nonEmpty)
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    rows.foreach { r =>
      val kind = r.getAs[String]("kind")
      val node = r.getAs[Long]("node")
      assert((kind == "customer") == (node % 2 == 0))
    }
  }
}
