package graft
import org.apache.spark.sql.functions._
object TmpSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val li = Tables.lineitem(spark, dir)
    // warm
    li.agg(count(lit(1))).collect()
    for (_ <- 1 to 3) {
      time("full prof1b") { graft.operators.Profiling.prof1bApproxProfile(spark, dir).write.format("noop").mode("overwrite").save() }
      time("hll only") { li.agg(approx_count_distinct(col("l_quantity")), approx_count_distinct(col("l_extendedprice")), approx_count_distinct(col("l_discount")), approx_count_distinct(col("l_tax"))).collect() }
      time("decimal sums only") { li.agg(sum(col("l_quantity").cast("decimal(12,2)")), sum(col("l_extendedprice").cast("decimal(12,2)")), sum(col("l_discount").cast("decimal(12,2)")), sum(col("l_tax").cast("decimal(12,2)"))).collect() }
      time("long cents sums") { li.agg(sum(floor(col("l_quantity")*100+0.5).cast("long")), sum(floor(col("l_extendedprice")*100+0.5).cast("long")), sum(floor(col("l_discount")*100+0.5).cast("long")), sum(floor(col("l_tax")*100+0.5).cast("long"))).collect() }
      time("minmax+counts") { li.agg(count(lit(1)), count(col("l_quantity")), min(col("l_quantity")), max(col("l_quantity")), min(col("l_extendedprice")), max(col("l_extendedprice"))).collect() }
    }
    spark.stop()
  }
}
