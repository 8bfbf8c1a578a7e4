package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOf

class AsOfSpec extends SparkSuite {

  test("as-of join matches an independent join+groupBy reference") {
    import graft.SparkSuite.implicits._
    val events = graft.sources.Tables.events(spark, sf)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))

    val got = AsOf.join(clicks, views, "c_user", "c_ts", "v_user", "v_ts")
      .select(col("click_id"), col("v_ts"))
      .as[(Long, Option[java.sql.Timestamp])].collect()
      .map { case (id, ts) => id -> ts.map(_.getTime) }.toMap

    // reference: all (click, earlier-view) pairs -> max view ts per click
    val ref = clicks.join(views,
        col("c_user") === col("v_user") && col("v_ts") <= col("c_ts"), "left")
      .groupBy("click_id").agg(max(col("v_ts")).as("v_ts"))
      .as[(Long, Option[java.sql.Timestamp])].collect()
      .map { case (id, ts) => id -> ts.map(_.getTime) }.toMap

    assert(got == ref)
    assert(got.nonEmpty)
    assert(got.values.exists(_.isDefined), "expected at least one attributed click")
    assert(got.values.exists(_.isEmpty), "expected at least one unattributed click")
  }

  test("as-of join plans the custom exec with sorted hash distribution") {
    val events = graft.sources.Tables.events(spark, sf)
    val l = events.select(col("event_id").as("lid"), col("user_id").as("lk"), col("ts").as("lt"))
    val r = events.select(col("user_id").as("rk"), col("ts").as("rt"))
    val plan = AsOf.join(l, r, "lk", "lt", "rk", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(plan.contains("Sort "))
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("as-of join result is partition-count invariant") {
    import graft.SparkSuite.implicits._
    val events = graft.sources.Tables.events(spark, sf)
    def run(n: Int): Map[Long, Option[Long]] = {
      val clicks = events.filter(col("event_type") === "click").repartition(n)
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      val views = events.filter(col("event_type") === "view").repartition(n)
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      AsOf.join(clicks, views, "c_user", "c_ts", "v_user", "v_ts")
        .select(col("click_id"), col("v_ts"))
        .as[(Long, Option[java.sql.Timestamp])].collect()
        .map { case (id, ts) => id -> ts.map(_.getTime) }.toMap
    }
    assert(run(1) == run(7))
  }

  test("null timestamps never match: left gets null-extension, right is skipped") {
    import graft.SparkSuite.implicits._
    val left = Seq(
      (1L, 10L, Some(new java.sql.Timestamp(5000L))),
      (2L, 10L, None)) // null left ts: must NOT match as if at epoch 0
      .toDF("lid", "l_key", "l_ts")
    val right = Seq(
      (10L, Some(new java.sql.Timestamp(1000L)), "real"),
      (10L, None, "null-ts")) // null right ts: must never be retained
      .toDF("r_key", "r_ts", "tag")
    val got = AsOf.join(left, right, "l_key", "l_ts", "r_key", "r_ts")
      .select(col("lid"), col("tag"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("real"))
    assert(got(2L).isEmpty, "null left ts must produce the null-extended row")
  }
}
