package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** One-shot evidence probe for the r13 verdict's ask #5: NAME the
  * residual cost of the r13 de-hint on the star joins (q8/q7/q11/q9
  * drifted ~150-300 ms r12→r13 while the plan audit shows
  * BroadcastHashJoin either way).
  *
  * Hypothesis under test: with a broadcast() hint the join is planned
  * STATICALLY (the dim subtree broadcasts straight off its scan; the
  * fact side never shuffles), while the de-hinted plan goes through
  * AQE — the initial plan is a shuffle join, BOTH sides' exchange map
  * stages materialize, and only then does the runtime replan to a
  * broadcast join reading the dim's materialized shuffle output. The
  * residual cost is therefore the fact-side shuffle WRITE (a map
  * stage over the fact scan that the static plan never runs) plus a
  * replan round per join.
  *
  * The probe measures, per query at the bench sf: (a) min-of-N wall
  * time as shipped (AQE, no hints), (b) min-of-N with AQE disabled
  * for the query (forces the static size-estimate plan — what the
  * r12 hinted plan compiled to, since every hinted dim is far under
  * the broadcast threshold at sf0.1), and (c) the final-plan stage
  * anatomy (ShuffleQueryStage / BroadcastQueryStage / AQEShuffleRead
  * counts) so the delta has a named mechanism, not a guess. Findings
  * land in SURVEY §5. */
object DehintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "5").toInt
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    val qs = Seq[(String, () => DataFrame)](
      "q8_market_share" -> (() => operators.Analytics.q8MarketShare(spark, sfDir)),
      "q7_nation_volume" -> (() => operators.Analytics.q7NationVolume(spark, sfDir)),
      "q11_important_stock" -> (() => operators.Analytics.q11ImportantStock(spark, sfDir)),
      "q9_product_profit" -> (() => operators.Analytics.q9ProductProfit(spark, sfDir)))

    def time(f: () => DataFrame): (Double, String) = {
      var best = Double.MaxValue
      var plan = ""
      for (_ <- 1 to passes) {
        val t0 = System.nanoTime()
        val df = f()
        df.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) best = sec
        plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      }
      (best, plan)
    }
    def stageCounts(plan: String): String = {
      val fin = {
        val s = plan.indexOf("== Final Plan ==")
        val e = plan.indexOf("== Initial Plan ==")
        if (s >= 0 && e > s) plan.substring(s, e) else plan
      }
      def n(p: String) = p.r.findAllIn(fin).size
      s"shuffleStages=${n("ShuffleQueryStage")} bcastStages=${n("BroadcastQueryStage")} " +
        s"aqeReads=${n("AQEShuffleRead")} bhj=${n("BroadcastHashJoin")} " +
        s"smj=${n("SortMergeJoin")} exchanges=${n("Exchange")}"
    }

    // warm the scans/codegen once so pass-1 JIT doesn't pollute either arm
    qs.foreach { case (_, f) => f().collect() }
    for ((name, f) <- qs) {
      // arm 1: as shipped (AQE, planner-chosen joins — the r13 form)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val (tAqe, planAqe) = time(f)
      // arm 2: static size-estimate planning at the default threshold
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val (tStatic, planStatic) = time(f)
      // arm 3: the r12 HINTED plan's shape reproduced — static
      // planning with the broadcast threshold raised so every dim
      // broadcasts straight off its scan (exactly what broadcast()
      // hints compiled to at sf0.1; the fact side's estimate stays
      // far above any threshold)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
      val (tHinted, planHinted) = time(f)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      println(f"$name%-22s aqe=$tAqe%.3fs static=$tStatic%.3fs " +
        f"hintedShape=$tHinted%.3fs dehintCost=${tAqe - tHinted}%+.3fs")
      println(s"  aqe-final:    ${stageCounts(planAqe)}")
      println(s"  static-final: ${stageCounts(planStatic)}")
      println(s"  hinted-shape: ${stageCounts(planHinted)}")
    }
    spark.stop()
  }
}
