package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics (SURVEY §2 row 160): PageRank over the
  * order-derived customer→supplier graph — the iterative keyed-
  * aggregate family beyond d6's connected components (Brin & Page
  * 1998; the DataFrame shape is the standard Pregel-on-relations
  * power iteration).
  */
object Graph {

  val Damping = 0.85
  val PrIters = 10
  val PrTopK = 20

  /** Directed edge list of the co-order graph: customer → supplier
    * for every (order, lineitem) pair, deduped. Node ids are
    * disjointly encoded (customer 2k, supplier 2k+1). Edge count is
    * fact-derived but DISTINCT-bounded by |customers|×|their
    * suppliers| — the one fact-scan + one distinct shuffle. */
  private[graft] def edges(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

  /** Power-iteration PageRank on an arbitrary (src, dst) edge frame.
    * Per round: one src-keyed join+aggregate (contributions), one
    * 1-row dangling-mass aggregate (suppliers have no out-links —
    * their rank teleports uniformly), one node-keyed left join to
    * form the new rank vector — every step a keyed aggregate or
    * broadcast, lineage TRUNCATED each round (localCheckpoint; the
    * d6/t18 discipline — untruncated plans grow geometrically).
    * Driver state is two scalars per round (dangling mass, L1
    * delta); the rank vector itself never leaves the cluster. */
  private[graft] def pagerank(edgeDf: DataFrame, iters: Int = PrIters)
      : DataFrame = {
    val e = edgeDf.localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("r", lit(1.0 / n)).localCheckpoint()
    for (_ <- 0 until iters) {
      val withDeg = ranks.join(outdeg, col("node") === col("src"), "left")
      // nodes with no out-edges contribute their whole rank as
      // uniformly-teleported dangling mass
      val dangling = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("r")), lit(0.0))).collect().head.getDouble(0)
      val contrib = e.join(
        ranks.join(outdeg, col("node") === col("src")).select(
          col("node").as("csrc"), (col("r") / col("outdeg")).as("share")),
        col("src") === col("csrc"))
        .groupBy(col("dst")).agg(sum(col("share")).as("inflow"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit((1.0 - Damping) / n) + lit(Damping) *
            (coalesce(col("inflow"), lit(0.0)) + lit(dangling / n))).as("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** g2: PageRank top-[[PrTopK]] — which suppliers (and customers)
    * sit at the center of the order flow. Deterministic total order
    * (rank desc to 9 places, node asc); rows-only (iterative fixed
    * point — no SQL oracle), pinned by a driver-side reference
    * recompute spec and a mass-conservation spec. */
  def g2Pagerank(s: SparkSession, dir: String): DataFrame =
    pagerank(edges(s, dir))
      .select(col("node"),
        when(pmod(col("node"), lit(2)) === 0, "customer")
          .otherwise("supplier").as("kind"),
        round(col("r"), 9).as("rank"))
      .orderBy(col("rank").desc, col("node").asc)
      .limit(PrTopK)

  val oracles: Map[String, String] = Map.empty

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g2_pagerank" -> (g2Pagerank _))
}
