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

  test("q115 hand-rolled HLL estimate is within the m=256 error regime") {
    val rows = Sketches.hllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("hll_estimate")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val rel = r.getAs[Double]("rel_error")
      assert(est > 0)
      // 1.04/sqrt(256) ≈ 6.5% std error; 4 sigma is a generous pin
      assert(math.abs(rel) < 0.26, s"${r.getString(0)}: est=$est exact=$exact rel=$rel")
      assert(math.abs((est - exact) / exact - rel) < 1e-3)
    }
  }

  test("q116 count-min never underestimates and ranks the true top-k") {
    import graft.SparkSuite.implicits._
    val rows = Sketches.heavyHitters(spark, sf).collect()
    assert(rows.length == Sketches.CmsTopK)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_cnt"),
        s"CMS underestimated ${r.getString(0)}")
      assert(r.getAs[Long]("overestimate") ==
        r.getAs[Long]("cms_estimate") - r.getAs[Long]("exact_cnt"))
    }
    val wantTop = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().sortBy { case (t, c) => (-c, t) }
      .take(Sketches.CmsTopK).toSeq
    assert(rows.map(r => (r.getString(0), r.getAs[Long]("exact_cnt"))).toSeq == wantTop)
  }

  test("approximate percentiles bracket the exact median sensibly") {
    import graft.SparkSuite.implicits._
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
