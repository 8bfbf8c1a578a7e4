package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-14 additions (q259+). */
class Round14OpsSpec extends SparkSuite {

  test("q259 benford digits partition the orders and expectations sum to ~1") {
    val rows = graft.operators.DataQuality.benford(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    val nOrders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders,
      "every order lands in exactly one first-digit bucket")
    // Benford expectations are a fixed distribution: Σ log10(1+1/d) = 1
    val bf = rows.map(_.getAs[Long]("benford_ppm")).sum
    assert(bf >= 999990L && bf <= 1000000L, s"benford ppm sum $bf")
    // the observed shares are a distribution too (integer-floor slack)
    val sh = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(sh > 999900L && sh <= 1000000L, s"share ppm sum $sh")
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_ppm") ==
        r.getAs[Long]("share_ppm") - r.getAs[Long]("benford_ppm"))
    }
  }

  test("q260 cusum telescopes to zero and flags the max-|S| day") {
    val rows = graft.operators.Relational.changepoint(spark, sf)
      .collect().sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    // Σ(D·n_d − N) over all days telescopes to exactly 0
    assert(rows.last.getAs[Long]("cusum_scaled") == 0L,
      "full-span CUSUM must return to zero")
    // recompute the cumulative sum independently
    val d = rows.length.toLong
    val n = rows.map(_.getAs[Long]("n")).sum
    var acc = 0L
    rows.foreach { r =>
      acc += d * r.getAs[Long]("n") - n
      assert(r.getAs[Long]("cusum_scaled") == acc)
    }
    // exactly one changepoint, and it attains the max |S| (earliest wins)
    val flagged = rows.filter(_.getAs[Long]("is_changepoint") == 1L)
    assert(flagged.length == 1)
    val maxAbs = rows.map(r => math.abs(r.getAs[Long]("cusum_scaled"))).max
    val first = rows.find(r =>
      math.abs(r.getAs[Long]("cusum_scaled")) == maxAbs).get
    assert(flagged.head.getAs[Long]("day") == first.getAs[Long]("day"))
  }

  test("q261 readability scores are clamped, finite and cover all langs") {
    val rows = graft.operators.TextAnalysis.readability(spark, sf).collect()
    val langs = graft.sources.Tables.documents(spark, sf)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("lang")).toSet == langs)
    rows.foreach { r =>
      val mean = r.getAs[Long]("mean_flesch_micros")
      assert(mean >= 0L && mean <= 206835000L, s"mean out of range: $mean")
      assert(r.getAs[Long]("n_easy") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_docs") > 0L)
    }
  }

  test("q261 flesch formula spot-check on a hand-computed doc") {
    // "Hello world. It is sunny." → w=5, s=2, y: e-o-o-i-i-u-(y? 'sunny'
    // has u and y) — count vowel GROUPS in lowercase:
    // hello: e,o; world: o; it: i; is: i; sunny: u,y → 7
    val df = spark.createDataFrame(Seq((1L, "Hello world. It is sunny.", "en",
      "t", 25L))).toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = 5.0; val s = 2.0; val y = 7.0
    val expected = math.floor(
      (206.835 - 1.015 * (w / s) - 84.6 * (y / w)) * 1e6).toLong.max(0L)
    val out = df.select(
      size(regexp_extract_all(col("text"), lit("[^ \\t\\n\\r]+"), lit(0)))
        .as("w"),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).as("s"),
      size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
        .as("y")).collect().head
    assert(out.getAs[Int]("w") == 5 && out.getAs[Int]("s") == 2 &&
      out.getAs[Int]("y") == 7)
    assert(expected > 0L)
  }
}
