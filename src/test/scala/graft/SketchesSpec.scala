package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSuite {

  test("HLL distinct counts are within the configured error bound") {
    val rows = Sketches.eventSketches(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.15,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("approximate percentiles bracket the exact median sensibly") {
    import spark.implicits._
    val rows = Sketches.eventSketches(spark, sf)
      .select("event_type", "approx_p50", "approx_p99")
      .as[(String, Double, Double)].collect()
    val exactMedians = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    rows.foreach { case (t, p50, p99) =>
      assert(p50 <= p99)
      val exact = exactMedians(t)
      assert(math.abs(p50 - exact) / math.max(exact, 1.0) < 0.1,
        s"$t: approx_p50=$p50 exact=$exact")
    }
  }
}
