package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every query runs, returns rows, and has a
  * matching oracle entry (the correctness gate requires both). */
class QueriesSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql covers exactly the declared queries") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
