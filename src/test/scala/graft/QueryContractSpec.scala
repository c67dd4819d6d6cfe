package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract smoke for every declared operator: each query
  * builds a plan against sf0.001, executes, and yields a stable schema.
  * (Value-level correctness is the DuckDB oracle gate — tools/check.py /
  * the driver's t2; these are the cheap always-on assertions.) */
class QueryContractSpec extends AnyFunSuite with SparkSuite {

  test("every decl has a unique name and entry in queries/oracleSql") {
    val names = SparkEntry.allDecls.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.queries.keySet == names.toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  SparkEntry.allDecls.foreach { decl =>
    test(s"${decl.name}: executes at sf0.001 with non-empty schema") {
      val df = decl.fn(spark, sf)
      assert(df.schema.fields.nonEmpty)
      val n = df.count()
      assert(n >= 0)
      // queries with a DuckDB oracle must produce rows for the hash gate
      // to be meaningful (empty-vs-empty is a vacuous pass)
      if (decl.oracle.isDefined)
        assert(n > 0, s"${decl.name} returned 0 rows at sf0.001")
    }
  }

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
