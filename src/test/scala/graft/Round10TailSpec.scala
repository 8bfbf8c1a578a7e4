package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-10 tail operators (q142-q150): the
  * remaining TPC-H join shapes (semi, outer-distribution, having-join,
  * disjunctive, anti), the index silhouette, vocabulary growth,
  * embedding isotropy and the Zipf fit. The DuckDB oracle checks exact
  * values; these specs pin the structural laws each operator must
  * satisfy on any corpus. */
class Round10TailSpec extends SparkSuite {

  test("q142 priority counts equal an independently composed semi-join") {
    import graft.operators.Relational.{PriorityQuarterEnd, PriorityQuarterStart}
    val rows = graft.operators.Relational.priorityReturns(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.nonEmpty)
    // recompose the other way round: distinct returned orderkeys,
    // inner join, countDistinct
    val ret = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey")).distinct()
    val expect = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit(PriorityQuarterStart).cast("timestamp")
        && col("o_orderdate") < lit(PriorityQuarterEnd).cast("timestamp"))
      .join(ret, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(countDistinct(col("o_orderkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == expect)
  }

  test("q143 distribution accounts for every customer and every matched order") {
    val rows = graft.operators.Relational.orderDistribution(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = graft.sources.Tables.customer(spark, sf).count()
    assert(rows.map(_._2).sum == nCust, "custdist must partition the customers")
    val matchedOrders = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(rows.map { case (c, d) => c * d }.sum == matchedOrders,
      "sum(c_count*custdist) must equal the orders that found a customer")
    // ordering contract: custdist desc, then c_count desc
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 > b._1))
      case _ => ()
    }
  }

  test("q144 large orders respect the threshold, the depth and a recomputed quantity") {
    import graft.operators.Relational.{LargeOrdersTopK, LargeQtyThreshold}
    val rows = graft.operators.Relational.largeOrders(spark, sf).collect()
    assert(rows.length <= LargeOrdersTopK && rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(5) > LargeQtyThreshold))
    val prices = rows.map(r => (r.getDouble(4), r.getLong(2)))
    prices.sliding(2).foreach {
      case Array(a, b) => assert(a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      case _ => ()
    }
    val probe = rows.head
    val recomputed = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === probe.getLong(2))
      .agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    assert(recomputed == probe.getDouble(5))
  }

  test("q145 branch sums are disjoint and add up to the combined report") {
    import graft.operators.Relational.DisjunctiveBranches
    val row = graft.operators.Relational.disjunctiveRevenue(spark, sf).collect()(0)
    val li = graft.sources.Tables.lineitem(spark, sf)
    val part = graft.sources.Tables.part(spark, sf)
    val perBranch = DisjunctiveBranches.map { case (brand, (szLo, szHi), (qLo, qHi)) =>
      li.join(part, col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === brand && col("p_size").between(szLo, szHi)
          && col("l_quantity").between(qLo, qHi))
        .agg(count(lit(1)), sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .collect()(0)
    }
    assert(perBranch.map(_.getLong(0)).sum == row.getLong(0),
      "branches must be disjoint and jointly exhaustive for the OR")
    val revSum = perBranch.map(r => Option(r.get(1)).fold(0.0)(_ => r.getDouble(1))).sum
    assert(math.abs(revSum - row.getDouble(1)) < 0.02)
  }

  test("q146 dormant accounts are above average and really quiet since the cutoff") {
    import graft.operators.Relational.{IdleNationKeys, IdleSince}
    val rows = graft.operators.Relational.idleAccounts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(IdleNationKeys.contains(r.getInt(0))))
    val cohort = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_nationkey").isin(IdleNationKeys: _*))
    val avgBal = cohort.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal"))).collect()(0).getDouble(0)
    val recent = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit(IdleSince).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val expect = cohort.filter(col("c_acctbal") > avgBal)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toMap == expect)
    // each member is above the cohort average, so the sum must clear it
    rows.foreach(r => assert(r.getDouble(2) > avgBal * r.getLong(1) - 0.01))
  }

  test("q147 silhouette covers the probed corpus with values in [0, 1]") {
    val rows = graft.operators.Similarity.silhouette(spark, sf).collect()
    assert(rows.nonEmpty)
    val nProbed = graft.operators.Similarity.hierCells(spark, sf)
      .filter(size(col("tc")) >= 2).count()
    assert(rows.map(_.getLong(1)).sum == nProbed,
      "per-cell counts must partition the probed vectors")
    rows.foreach { r =>
      val (mean, min) = (r.getDouble(2), r.getDouble(3))
      assert(min >= 0.0 && mean <= 1.0 && min <= 1.0)
      // per-mille floor before the mean can pull it at most 1e-3 under
      assert(min <= mean + 0.001 + 1e-9)
    }
  }

  test("q148 growth curve is monotone and lands on the full corpus totals") {
    val rows = graft.operators.TextAnalysis.vocabGrowth(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == graft.operators.TextAnalysis.GrowthFractions.length)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 <= b._3 && a._4 <= b._4, "tokens and vocab must be monotone")
      case _ => ()
    }
    val docs = graft.sources.Tables.documents(spark, sf)
    val tot = docs.select(explode(split(col("text"), "[ \t\n\r]+")).as("t"))
      .filter(length(col("t")) > 0)
    assert(rows.last._3 == tot.count(), "frac=1 must count every token")
    assert(rows.last._4 == tot.distinct().count(), "frac=1 must count the full vocabulary")
  }

  test("q149 isotropy report bounds its cosines and counts the corpus") {
    val r = graft.operators.Similarity.embedIsotropy(spark, sf).collect()(0)
    assert(r.getLong(0) == graft.sources.Tables.embeddings(spark, sf).count())
    val (norm2, mean, min, max) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(norm2 >= 0.0)
    assert(min <= max && min >= -1.0 - 1e-9 && max <= 1.0 + 1e-9)
    assert(mean >= min - 0.001 - 1e-9 && mean <= max + 1e-9)
  }

  test("q151 all checks pass on testdata, and each check fires on planted violations") {
    import graft.SparkSuite.implicits._
    val rows = graft.operators.DataQuality.dataQuality(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) == 0L))
      assert(r.getBoolean(2), s"testdata must be clean: ${r.getString(0)}")
    }
    // planted violations: dup order key, orphan lineitem, orphan order
    // custkey, negative price/discount/quantity, null orderdate
    val badOrders = Seq(
      (1L, 10L, Some(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")), -5.0),
      (1L, 10L, Some(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")), 10.0),
      (2L, 99L, None: Option[java.sql.Timestamp], 10.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val badCust = Seq((10L, 0.0)).toDF("c_custkey", "c_acctbal")
    val badLines = Seq((1L, 1.5, 0.1), (7L, -2.0, 1.5))
      .toDF("l_orderkey", "l_quantity", "l_discount")
    val report = graft.operators.DataQuality
      .dataQualityFrom(badOrders, badCust, badLines)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(report("orders_pk_unique") == 1L)
    assert(report("lineitem_orderkey_ri") == 1L)
    assert(report("orders_custkey_ri") == 1L)
    assert(report("orders_totalprice_positive") == 1L)
    assert(report("lineitem_discount_range") == 1L)
    assert(report("lineitem_quantity_positive") == 1L)
    assert(report("orders_orderdate_nonnull") == 1L)
    assert(report("customer_pk_unique") == 0L)
  }

  test("q152 drift is nonnegative, partitions the corpus and zeroes a mirrored source") {
    val rows = graft.operators.TextAnalysis.sourceDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum ==
      graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      // per-summand 1e-9 floors can pull KL at most n_langs nano under 0
      assert(r.getDouble(3) >= -r.getLong(2) * 1e-9, s"${r.getString(0)} negative KL")
    }
  }

  test("q153 coverage is monotone in depth and exact at depth 1") {
    val rows = graft.operators.TextAnalysis.vocabCoverage(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byDepth = rs.sortBy(_._2)
      byDepth.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3 && a._5 <= b._5 + 1e-9)
        case _ => ()
      }
      byDepth.foreach(r => assert(r._5 >= 0.0 && r._5 <= 1.0))
      // depth-1 coverage is the top token's share, recomputed from scratch
      val freqs = graft.sources.Tables.documents(spark, sf)
        .filter(org.apache.spark.sql.functions.col("lang") === lang)
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), "[ \t\n\r]+")).as("t"))
        .filter(org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("t")) > 0)
        .groupBy("t").count().collect().map(_.getLong(1))
      assert(byDepth.head._3 == freqs.max)
      assert(byDepth.head._4 == freqs.sum)
    }
  }

  test("q154 variance spectrum bounds: 64 dims, PR in [1, 64], max <= total") {
    val r = graft.operators.Similarity.embedVariance(spark, sf).collect()(0)
    assert(r.getLong(1) == 64)
    assert(r.getLong(0) == graft.sources.Tables.embeddings(spark, sf).count())
    val (tot, mx, pr) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(mx >= 0.0 && tot >= mx)
    assert(pr >= 1.0 - 1e-6 && pr <= 64.0 + 1e-6)
  }

  test("q155 merged stats equal a direct single-pass aggregate (mergeability law)") {
    import org.apache.spark.sql.functions._
    val merged = graft.operators.DataQuality.incrementalStats(spark, sf)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val direct = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)), sum("n_chars"), min("n_chars"), max("n_chars"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(merged == direct)
  }

  test("q156 forecast revenue equals the recomposed predicate sum") {
    import org.apache.spark.sql.functions._
    import graft.operators.Relational._
    val r = graft.operators.Relational.forecastRevenue(spark, sf).collect()(0)
    assert(r.getLong(0) > 0)
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate").between(lit(ForecastYearStart).cast("timestamp"),
        lit(ForecastYearEnd).cast("timestamp"))
        && col("l_shipdate") =!= lit(ForecastYearEnd).cast("timestamp")
        && col("l_discount") >= ForecastDiscLo && col("l_discount") <= ForecastDiscHi
        && col("l_quantity") < ForecastMaxQty)
      .agg(count(lit(1)), sum(col("l_extendedprice") * col("l_discount")))
      .collect()(0)
    assert(direct.getLong(0) == r.getLong(0))
    assert(math.abs(math.floor(direct.getDouble(1) * 100 + 0.5) / 100 - r.getDouble(1)) < 0.011)
  }

  test("q157 bilateral volume stays inside the pair and the ship window") {
    import graft.operators.Relational._
    val rows = graft.operators.Relational.nationVolume(spark, sf).collect()
    assert(rows.nonEmpty)
    val pair = Set(VolumeNationA, VolumeNationB)
    rows.foreach { r =>
      assert(pair(r.getString(0)) && pair(r.getString(1)))
      assert(r.getString(0) != r.getString(1), "intra-nation trade is not bilateral")
      assert(r.getInt(2) >= 1996 && r.getInt(2) <= 1997)
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("q158 market share is the ratio of its own reported sums") {
    val rows = graft.operators.Relational.marketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (shareRev, totalRev, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(shareRev >= 0.0 && shareRev <= totalRev)
      assert(share == math.floor(shareRev / totalRev * 1e6 + 0.5) / 1e6)
    }
  }

  test("q159 every reported supplier ties at the recomputed quarterly maximum") {
    import org.apache.spark.sql.functions._
    import graft.operators.Relational._
    val rows = graft.operators.Relational.topSupplierRev(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit(TopSuppQuarterStart).cast("timestamp")
        && col("l_shipdate") < lit(TopSuppQuarterEnd).cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("r"))
      .collect().map(_.getDouble(1))
    val mx = revs.max
    rows.foreach(r => assert(r.getDouble(2) == mx))
    assert(rows.length == revs.count(_ == mx), "all tied maxima must be reported")
  }

  test("q160 small-quantity lines clear their part's threshold, recomputed") {
    import org.apache.spark.sql.functions._
    import graft.operators.Relational._
    val r = graft.operators.Relational.smallQtyRevenue(spark, sf).collect()(0)
    assert(r.getLong(0) > 0)
    val lines = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.part(spark, sf)
        .filter(col("p_brand") === SmallQtyBrand).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
    val avg = lines.groupBy(_._1).map { case (k, ls) =>
      k -> SmallQtyFactor * (ls.map(_._2).sum / ls.length) }
    val small = lines.filter { case (k, q, _) => q < avg(k) }
    assert(small.length.toLong == r.getLong(0))
    assert(math.abs(small.map(_._3).sum / 7.0 - r.getDouble(1)) < 0.011)
  }

  test("q161 purity partitions the corpus with entropy/share laws holding") {
    val rows = graft.operators.Similarity.cellPurity(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ==
      graft.sources.Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val (n, nLabels) = (r.getLong(1), r.getLong(2))
      val (share, ent) = (r.getDouble(4), r.getDouble(5))
      assert(nLabels >= 1 && nLabels <= n)
      // the majority label holds at least an equal share
      assert(share >= 1.0 / nLabels - 1e-6)
      assert(ent >= 0.0 && ent <= math.log(nLabels.toDouble) + 1e-6)
      if (nLabels == 1) assert(ent == 0.0 && share == 1.0)
    }
  }

  test("q162 moments equal a from-scratch computation per language") {
    val rows = graft.operators.TextAnalysis.lengthMoments(spark, sf).collect()
    val data = graft.sources.Tables.documents(spark, sf)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    rows.foreach { r =>
      val xs = data(r.getString(0))
      val n = xs.length.toDouble
      assert(r.getLong(1) == xs.length)
      val mu = xs.sum / n
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
      def close(a: Double, b: Double) = math.abs(a - b) < 1e-4
      assert(close(r.getDouble(2), mu))
      assert(close(r.getDouble(3), math.sqrt(m2)))
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      assert(close(r.getDouble(4), m3 / (math.sqrt(m2) * m2)))
      assert(close(r.getDouble(5), m4 / (m2 * m2) - 3.0))
    }
  }

  test("q163 streamed rate limiter really throttles and admits each user's first event") {
    val out = graft.streaming.EventStream.rateLimitStreamed(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val events = graft.sources.Tables.events(spark, sf)
    val total = events.count()
    assert(out.length > 0 && out.length < total, "bucket must drop SOMETHING")
    // the graded order is total: no (user, ts) ties on the corpus
    import org.apache.spark.sql.functions._
    assert(events.groupBy("user_id", "ts").count()
      .filter(col("count") > 1).count() == 0)
    // a fresh bucket holds >= 1 token: every user's first event passes
    val firsts = events
      .groupBy(col("user_id"))
      .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("f"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val admitted = out.toSet
    firsts.foreach { case (u, f) => assert(admitted((u, f)), s"user $u first event dropped") }
  }

  test("q164 json roundtrip aggregate equals the direct parquet aggregate") {
    import org.apache.spark.sql.functions._
    val viaJson = graft.operators.Interchange.jsonRoundtripAgg(spark, sf).collect()
    val direct = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)), countDistinct(col("lang")), sum(col("n_chars")),
        sum(length(col("text")).cast("long")), min(col("doc_id")), max(col("doc_id")))
      .orderBy("source").collect()
    assert(viaJson.length == direct.length && viaJson.nonEmpty)
    viaJson.zip(direct).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, s"roundtrip drift for source ${a.getString(0)}")
    }
  }

  test("q165 sensitivity curve is monotone and anchored at the artifact floor") {
    import graft.operators.Dedup.{JaccardThreshold, SensitivityThresholds}
    val rows = graft.operators.Dedup.dedupSensitivity(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == SensitivityThresholds.length)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 >= b._2 && a._3 >= b._3, "raising the threshold cannot add pairs")
      case _ => ()
    }
    val artifact = graft.operators.Dedup.verifiedPairs(spark, sf)
    assert(rows.head._1 == JaccardThreshold)
    assert(rows.head._2 == artifact.count(), "floor row must cover the whole artifact")
    rows.foreach(r => assert(r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("q166 bucket histogram partitions the corpus and prices the self-join") {
    val rows = graft.operators.Similarity.lshBucketStats(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._3).sum == n, "histogram rows must partition the corpus")
    rows.foreach { case (size, buckets, nRows, pairs) =>
      assert(nRows == size * buckets)
      assert(pairs == buckets * (size * (size - 1) / 2))
    }
  }

  test("q167 skew report matches per-table totals and the hot-key law") {
    import graft.operators.Relational.SkewHotFactor
    val rows = graft.operators.Relational.joinSkewAdvisor(spark, sf).collect()
    assert(rows.length == 2)
    val byKey = rows.map(r => r.getString(0) -> r).toMap
    assert(byKey("lineitem.l_orderkey").getLong(2) ==
      graft.sources.Tables.lineitem(spark, sf).count())
    assert(byKey("orders.o_custkey").getLong(2) ==
      graft.sources.Tables.orders(spark, sf).count())
    rows.foreach { r =>
      val (nKeys, nRows, maxFreq) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(maxFreq * nKeys >= nRows, "max cannot undercut the mean")
      assert(r.getDouble(5) >= 1.0 - 1e-6)
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
      // hot keys each exceed factor×mean, so their mass bounds from below
      val meanFreq = nRows.toDouble / nKeys
      assert(r.getDouble(7) * nRows >= r.getLong(6) * SkewHotFactor * meanFreq - nRows * 1e-6 - 1)
    }
  }

  test("q168 streamed stream-static labels equal the batch twin") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.EventStream.streamStaticDedupExec(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    val docs = graft.sources.Tables.documents(spark, sf)
    val split = docs.agg(expr("(count(1) * 4) div 5")).collect()(0).getLong(0)
    val batch = graft.streaming.EventStream.streamingIncrementalDedup(
      docs.filter(col("doc_id") >= split), docs.filter(col("doc_id") < split))
      .collect().map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(streamed.sorted.toSeq == batch.sorted.toSeq)
    assert(streamed.nonEmpty)
    streamed.foreach { case (_, status, m) =>
      assert(status == "exact" || status == "new")
      assert((status == "exact") == (m >= 0))
      if (m >= 0) assert(m < split, "match must point into the static corpus")
    }
  }

  test("q169 merged sketch exactly equals the rebuilt sketch and stays in the error regime") {
    val r = graft.operators.Sketches.hllMerge(spark, sf).collect()(0)
    assert(r.getBoolean(3), "merge(per-lang registers) must equal rebuild")
    assert(r.getDouble(1) == r.getDouble(2))
    // m=256 → standard error ~1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert(math.abs(r.getDouble(4)) < 0.26, s"rel_error ${r.getDouble(4)} out of regime")
    assert(r.getLong(0) > 0)
  }

  test("q170 filtered search returns same-label neighbors with contiguous ranks") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Similarity.filteredSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
      rs.foreach { r =>
        assert(r.getInt(1) == labels(q), "query label column must be the query's label")
        assert(labels(r.getLong(2)) == labels(q), s"neighbor of $q crosses the label filter")
        assert(r.getLong(2) != q)
      }
    }
  }

  test("q171 sparse cosine pairs clear the threshold with a recomputed similarity") {
    import org.apache.spark.sql.functions._
    import graft.operators.Indexing.SparseSimThreshold
    val rows = graft.operators.Indexing.sparseCosine(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered a < b")
      assert(r.getDouble(2) >= SparseSimThreshold && r.getDouble(2) <= 1.0 + 1e-9)
    }
    // recompute the first pair's cosine from raw token counts
    val (a, b) = (rows.head.getLong(0), rows.head.getLong(1))
    val toks = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(a, b))
      .select(col("doc_id"), explode(split(col("text"), "[ \t\n\r]+")).as("t"))
      .filter(length(col("t")) > 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val df = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), "[ \t\n\r]+")).as("t"))
      .filter(length(col("t")) > 0).distinct()
      .groupBy("t").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = graft.sources.Tables.documents(spark, sf).count().toDouble
    def wvec(id: Long): Map[String, Long] = {
      val ts = toks.filter(_._1 == id).map(_._2)
      val dl = ts.length.toDouble
      ts.groupBy(identity).map { case (t, o) =>
        t -> math.floor(o.length / dl * math.log(n / df(t)) * 1e6 + 0.5).toLong }
    }
    val (wa, wb) = (wvec(a), wvec(b))
    val dp = wa.keySet.intersect(wb.keySet).toSeq.map(t => wa(t) * wb(t)).sum
    val cos = dp.toDouble /
      (math.sqrt(wa.values.map(x => x * x).sum.toDouble) *
        math.sqrt(wb.values.map(x => x * x).sum.toDouble))
    assert(math.abs(rows.head.getDouble(2) - cos) < 2e-6)
  }

  test("q150 zipf slope equals a from-scratch least-squares fit per language") {
    import graft.operators.TextAnalysis.ZipfTopK
    val rows = graft.operators.TextAnalysis.zipfSlope(spark, sf).collect()
    assert(rows.nonEmpty)
    val freqs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), "[ \t\n\r]+")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("lang", "t").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows.foreach { r =>
      val lang = r.getString(0)
      val top = freqs.filter(_._1 == lang).map(t => (t._3, t._2))
        .sortBy { case (n, tok) => (-n, tok) }.take(ZipfTopK)
      assert(r.getLong(1) == top.length)
      assert(r.getLong(2) == top.map(_._1).sum)
      val pts = top.zipWithIndex.map { case ((n, _), i) =>
        (math.floor(math.log((i + 1).toDouble) * 1e6 + 0.5),
          math.floor(math.log(n.toDouble) * 1e6 + 0.5))
      }
      val k = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
      val slope = math.floor((k * sxy - sx * sy) / (k * sxx - sx * sx) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(3) == slope, s"$lang slope mismatch")
      assert(r.getDouble(3) < 0.0, "rank-frequency must fall")
    }
  }
}
