package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns using Spark's higher-order
  * functions (`zip_with` / `aggregate`) — codegen'd, no UDFs, and the
  * accumulation order is the array order, which makes the results
  * bit-identical to a sequential C loop (the DuckDB oracle's
  * list_dot_product).
  */
object VectorFunctions {
  /** Sequential dot product of two array<double> columns. */
  def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  /** L2 norm. */
  def l2norm(a: String): Column =
    sqrt(expr(s"aggregate($a, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"))

  /** cosine = dot / (||a|| * ||b||); callers precompute norms so the
    * O(n·k) norm pass isn't repeated per candidate pair. */
  def cosineFromParts(dotC: Column, normA: Column, normB: Column): Column =
    dotC / (normA * normB)
}
