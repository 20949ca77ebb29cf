package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-compat guard (r8 postmortem): the correctness gate compares
  * engine vs oracle frames through pandas, whose sort/hash path throws
  * `unhashable type: numpy.ndarray` on top-level array (and struct/map)
  * columns — that crash is what turned ix1's otherwise-correct output
  * into the round's one non-green CORRECTNESS row. Every
  * [[SparkEntry.queries]] output must therefore be scalar-only at the
  * top level; nested values that matter for the gate are digested
  * (md5 over a canonical join) so the hash check still covers their
  * full content. Construction is lazy — this sweeps all ~200 schemas
  * without executing the queries (index-building constructors excepted).
  */
class OutputSchemaSpec extends GraftSpec {

  test("every queries output schema is scalar-only at the top level") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"driver-hostile top-level columns (digest them):\n${offenders.mkString("\n")}")
  }

  test("every oracle key has a queries entry (an orphaned oracle is a guaranteed gate failure)") {
    // r10 postmortem: e10's oracle was committed by the end-of-round
    // sweep without its Spark query — the driver gate then reports
    // MISSING-OUTPUT for a query that never ran. The contract is
    // oracleSql.keySet ⊆ queries.keySet, enforced here so a half-landed
    // operator fails the suite instead of the round's correctness gate.
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
