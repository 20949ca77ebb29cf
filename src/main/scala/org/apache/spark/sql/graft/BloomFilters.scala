package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column entry point for Spark's native bloom-filter membership
  * predicate (the expression the optimizer's runtime-filter rule
  * injects; here driven explicitly with a driver-built sketch). The
  * serialized filter rides as a literal — a few hundred KB shipped
  * once per task via the closure, not a broadcast join side — and the
  * probe is `BloomFilter.mightContainLong` inside codegen.
  */
object BloomFilters {
  /** `mightContain(serializedFilter, key)` over a long key column.
    * The filter must have been built with putLong semantics
    * (`DataFrameStatFunctions.bloomFilter` on an integral column). */
  def mightContain(serialized: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(serialized, BinaryType), ExpressionUtils.expression(key)))
}
