package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSuite {

  test("bucketed join has zero exchanges and matches the plain join") {
    import graft.SparkSuite.implicits._
    val joined = Bucketing.bucketedJoin(spark, sf)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle either side:\n$plan")
    val got = joined.select("o_orderkey", "c_name")
      .as[(Long, String)].collect().toSet
    val orders = graft.sources.Tables.orders(spark, sf)
    val customer = graft.sources.Tables.customer(spark, sf)
    val expected = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
