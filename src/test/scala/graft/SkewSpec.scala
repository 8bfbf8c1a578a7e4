package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {

  test("salted aggregation equals direct aggregation") {
    import graft.SparkSuite.implicits._
    val events = graft.sources.Tables.events(spark, sf)
    val salted = Skew.saltedAgg(events, col("event_type"), col("event_id"), 8,
      countAs = "cnt", sumCol = Some(col("value")), sumAs = "total")
      .select(col("key"), col("cnt"), round(col("total"), 2).as("total"))
      .as[(String, Long, Double)].collect().toSet
    val direct = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    import graft.SparkSuite.implicits._
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val saltedRows = Skew.saltedJoin(orders, customer, "o_custkey", col("o_orderkey"), 4)
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    val plainRows = orders.join(customer, "o_custkey")
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    assert(saltedRows == plainRows)
    assert(saltedRows.nonEmpty)
  }
}
