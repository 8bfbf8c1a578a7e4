package graft

import org.apache.spark.sql.functions._

/** Round-15 graded operators: series-level Kendall τ-b, Mann-Whitney
  * rank-sum, Dunning LLR collocations, and pairwise source JSD. */
class Round15OpsSpec extends SparkSuite {

  test("q293 kendall pair census is complete and tau is bounded") {
    val r = graft.operators.Relational.kendallTau(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val nDays = row.getAs[Long]("n_days")
    val nPairs = row.getAs[Long]("n_pairs")
    // the lag-explode generator must cover EVERY pair — a silent span
    // overflow (> KendallMaxSpan) would drop pairs without failing
    assert(nPairs == nDays * (nDays - 1) / 2,
      s"pair census incomplete: $nPairs of ${nDays * (nDays - 1) / 2}")
    // guard the day-index SPAN, not the distinct-day count: with gaps
    // in the day domain the span can exceed the cap while the count
    // stays under it (ADVICE r10)
    val dayMs = 86400000L
    val spanRow = graft.sources.Tables.events(spark, sf)
      .select(expr(s"(unix_millis(ts) - ${graft.operators.Relational.RetentionEpochMs}) div $dayMs")
        .as("day"))
      .agg((max(col("day")) - min(col("day"))).as("span")).collect().head
    assert(spanRow.getAs[Long]("span") <= graft.operators.Relational.KendallMaxSpan,
      "day span exceeds the generator cap — raise KendallMaxSpan")
    val c = row.getAs[Long]("concordant"); val d = row.getAs[Long]("discordant")
    assert(c + d + row.getAs[Long]("ties_x") >= nPairs - row.getAs[Long]("ties_y"),
      "every pair is concordant, discordant, or tied in some coordinate")
    val tau = row.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
    // heavier days carry more total value by construction
    assert(tau > 0.0, s"volume-value association should be positive, got $tau")
  }

  test("q293 tau matches a driver-side recomputation") {
    val dayMs = 86400000L
    val daily = graft.sources.Tables.events(spark, sf)
      .select(expr(s"(unix_millis(ts) - ${graft.operators.Relational.RetentionEpochMs}) div $dayMs")
        .as("day"), floor(col("value") * lit(1e6)).cast("long").as("v"))
      .groupBy("day").agg(count(lit(1)).as("x"), sum(col("v")).as("y"))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val s = java.lang.Long.signum(daily(j)._1 - daily(i)._1) *
        java.lang.Long.signum(daily(j)._2 - daily(i)._2)
      if (s > 0) c += 1 else if (s < 0) d += 1
      if (daily(i)._1 == daily(j)._1) tx += 1
      if (daily(i)._2 == daily(j)._2) ty += 1
    }
    val row = graft.operators.Relational.kendallTau(spark, sf).collect().head
    assert(row.getAs[Long]("concordant") == c)
    assert(row.getAs[Long]("discordant") == d)
    assert(row.getAs[Long]("ties_x") == tx)
    assert(row.getAs[Long]("ties_y") == ty)
  }

  test("q294 rank-sum identities hold and the AUC matches U") {
    val row = graft.operators.DataQuality.mannWhitney(spark, sf).collect().head
    val na = row.getAs[Long]("n_a"); val nb = row.getAs[Long]("n_b")
    val u2 = row.getAs[Long]("u2_a")
    // group sizes = corpus slice sizes
    val docs = graft.sources.Tables.documents(spark, sf)
    import graft.operators.DataQuality.{MwGroupA, MwGroupB}
    assert(na == docs.filter(col("lang") === MwGroupA).count())
    assert(nb == docs.filter(col("lang") === MwGroupB).count())
    // 0 <= U <= n_a * n_b  (doubled throughout)
    assert(u2 >= 0L && u2 <= 2 * na * nb)
    assert(row.getAs[Long]("auc_ppm") == u2 * 1000000 / (2 * na * nb))
    // U_A + U_B = n_a * n_b: recompute U_B by swapping the groups
    val histB = docs.filter(col("lang").isin(MwGroupA, MwGroupB))
      .select(col("lang"), col("n_chars").as("value"))
    val vals = histB.collect().map(r => (r.getString(0), r.getAs[Long](1)))
    var u2b = 0L
    for ((la, va) <- vals if la == MwGroupB; (lb, vb) <- vals if lb == MwGroupA) {
      if (va > vb) u2b += 2 else if (va == vb) u2b += 1
    }
    assert(u2 + u2b == 2 * na * nb, s"U_A + U_B must equal n_a*n_b: $u2 + $u2b")
  }

  test("q294 doubled-U equals the brute-force pair count") {
    val docs = graft.sources.Tables.documents(spark, sf)
    import graft.operators.DataQuality.{MwGroupA, MwGroupB}
    val vals = docs.filter(col("lang").isin(MwGroupA, MwGroupB))
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getAs[Long](1)))
    var u2 = 0L
    for ((la, va) <- vals if la == MwGroupA; (lb, vb) <- vals if lb == MwGroupB) {
      if (va > vb) u2 += 2 else if (va == vb) u2 += 1
    }
    val row = graft.operators.DataQuality.mannWhitney(spark, sf).collect().head
    assert(row.getAs[Long]("u2_a") == u2)
  }

  test("q295 LLR top list is count-weighted, not rare-pair-dominated") {
    val rows = graft.operators.TextAnalysis.llrBigrams(spark, sf).collect()
    assert(rows.length == 20)
    // scores are sorted descending with the bigram tie-break
    val scores = rows.map(_.getAs[Long]("llr_micros"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.head > 0, "top collocation must have positive association")
    // the PMI failure mode: a hapax pair of hapax words tops PMI but
    // must NOT top LLR — the top-5 here all have k11 > 1
    assert(rows.take(5).forall(_.getAs[Long]("k11") >= 2),
      "LLR top-5 should be evidence-weighted")
  }

  test("q295 LLR agrees with a driver-side contingency recomputation") {
    val top = graft.operators.TextAnalysis.llrBigrams(spark, sf).collect()
      .map(r => (r.getAs[String]("bigram"), r.getAs[Long]("k11"),
        r.getAs[Long]("llr_micros"))).head
    // recompute the statistic for the single top bigram from raw counts
    val docs = graft.sources.Tables.documents(spark, sf)
    val toks = docs.select(graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .select(explode_outer(graft.functions.TextFunctions.shingles(col("w"), 2)).as("bg"))
      .filter(col("bg").isNotNull).collect().map(_.getString(0))
    val n = toks.length.toLong
    val k11 = toks.count(_ == top._1).toLong
    val a = top._1.split("_")(0); val b = top._1.split("_")(1)
    val ra = toks.count(_.startsWith(a + "_")).toLong
    val cb = toks.count(_.endsWith("_" + b)).toLong
    assert(k11 == top._2)
    def t(k: Long, r: Long, c: Long): Long =
      if (k > 0) math.floor(k.toDouble * math.log(k.toDouble * n / (r.toDouble * c)) * 1e6).toLong
      else 0L
    val llr = 2 * (t(k11, ra, cb) + t(ra - k11, ra, n - cb)
      + t(cb - k11, n - ra, cb) + t(n - ra - cb + k11, n - ra, n - cb))
    assert(llr == top._3, s"driver recomputation $llr vs ${top._3}")
  }

  test("q296 JSD covers every source pair and stays within the ln 2 bound") {
    val rows = graft.operators.TextAnalysis.jsdSources(spark, sf).collect()
    val nSrc = graft.sources.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2)
    val ln2Nano = math.floor(math.log(2.0) * 1e9).toLong
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      val j = r.getAs[Long]("jsd_nano")
      // floors only subtract, so the upper bound is exact; the lower
      // bound admits up to 1 nano per floored summand (n_common + 2)
      assert(j <= ln2Nano, s"JSD must be ≤ ln 2: $j")
      assert(j >= -(r.getAs[Long]("n_common") + 3) / 2,
        s"JSD must be ≥ 0 up to floor error: $j")
    }
  }

  test("q296 matches a driver-side distribution recomputation for one pair") {
    val top = graft.operators.TextAnalysis.jsdSources(spark, sf).collect().head
    val (sa, sb) = (top.getAs[String]("source_a"), top.getAs[String]("source_b"))
    val toks = graft.sources.Tables.documents(spark, sf)
      .filter(col("source").isin(sa, sb))
      .select(col("source"),
        explode_outer(graft.functions.TextFunctions.wsTokens(col("text"))).as("t"))
      .filter(col("t").isNotNull).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def counts(s: String): Map[String, Long] =
      toks.filter(_._1 == s).groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val (cA, cB) = (counts(sa), counts(sb))
    val (na, nb) = (cA.values.sum, cB.values.sum)
    val common = cA.keySet.intersect(cB.keySet)
    assert(top.getAs[Long]("n_common") == common.size.toLong)
    var s2 = 0L
    common.foreach { t =>
      val pa = cA(t).toDouble / na.toDouble
      val pb = cB(t).toDouble / nb.toDouble
      s2 += math.floor(pa * math.log(2.0 * pa / (pa + pb)) * 1e9).toLong
      s2 += math.floor(pb * math.log(2.0 * pb / (pa + pb)) * 1e9).toLong
    }
    val ia = common.toSeq.map(cA).sum; val ib = common.toSeq.map(cB).sum
    s2 += math.floor(math.log(2.0) * (na - ia).toDouble / na.toDouble * 1e9).toLong
    s2 += math.floor(math.log(2.0) * (nb - ib).toDouble / nb.toDouble * 1e9).toLong
    assert(top.getAs[Long]("jsd_nano") == s2 / 2,
      s"driver recomputation ${s2 / 2} vs ${top.getAs[Long]("jsd_nano")}")
  }

  private def docLengths: Array[(String, Long)] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getAs[Long](1)))

  test("q297 ANOVA moments and F match a driver-side recomputation") {
    val row = graft.operators.DataQuality.anovaF(spark, sf).collect().head
    val xs = docLengths
    val groups = xs.groupBy(_._1).values.toSeq
    assert(row.getAs[Long]("k_groups") == groups.size.toLong)
    assert(row.getAs[Long]("n_total") == xs.length.toLong)
    val tMilli = groups.map { g =>
      val ni = g.length.toLong; val si = g.map(_._2).sum
      math.floor(si.toDouble * si.toDouble / ni.toDouble * 1000.0).toLong
    }.sum
    val s = xs.map(_._2).sum; val q = xs.map(x => x._2 * x._2).sum
    val n = xs.length.toLong
    val ssb = tMilli - math.floor(s.toDouble * s.toDouble / n.toDouble * 1000.0).toLong
    val ssw = q * 1000L - tMilli
    assert(row.getAs[Long]("ssb_milli") == ssb)
    assert(row.getAs[Long]("ssw_milli") == ssw)
    val k = groups.size.toLong
    val f = math.floor(ssb.toDouble * (n - k).toDouble
      / (ssw.toDouble * (k - 1).toDouble) * 1e6).toLong
    assert(row.getAs[Long]("f_micros") == f)
    assert(f > 0, "between-group variation must be positive")
  }

  test("q298 Kruskal-Wallis H matches a driver-side rank recomputation") {
    val row = graft.operators.DataQuality.kruskalWallis(spark, sf).collect().head
    val xs = docLengths
    val n = xs.length.toLong
    // doubled average ranks per distinct value
    val hist = xs.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val sortedVals = hist.keys.toSeq.sorted
    var cum = 0L
    val r2 = sortedVals.map { v =>
      val r = 2 * cum + hist(v) + 1; cum += hist(v); v -> r
    }.toMap
    val tMilli = xs.groupBy(_._1).values.map { g =>
      val ni = g.length.toLong
      val ri2 = g.map(x => r2(x._2)).sum
      math.floor(ri2.toDouble * ri2.toDouble / ni.toDouble * 1000.0).toLong
    }.sum
    val tie = hist.values.map(c => c * c * c - c).sum
    assert(row.getAs[Long]("n_total") == n)
    assert(row.getAs[Long]("tie_term") == tie)
    val hRaw = 3.0 * tMilli.toDouble / (1000.0 * (n * (n + 1)).toDouble) -
      3.0 * (n + 1).toDouble
    assert(row.getAs[Long]("h_micros") == math.floor(hRaw * 1e6).toLong)
    val hAdj = hRaw / (1.0 - tie.toDouble /
      (n.toDouble * n.toDouble * n.toDouble - n.toDouble))
    assert(row.getAs[Long]("h_adj_micros") == math.floor(hAdj * 1e6).toLong)
    // tie-corrected H can only grow (correction factor < 1)
    assert(row.getAs[Long]("h_adj_micros") >= row.getAs[Long]("h_micros"))
  }

  test("q299 Jarque-Bera moments match a driver-side recomputation") {
    val row = graft.operators.DataQuality.jarqueBera(spark, sf).collect().head
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id")).count().collect().map(_.getAs[Long]("count"))
    val n = counts.length.toLong
    assert(row.getAs[Long]("n_users") == n)
    val (s1, s2, s3, s4) = (counts.sum,
      counts.map(x => x * x).sum,
      counts.map(x => x * x * x).sum,
      counts.map(x => x * x * x * x).sum)
    val mean = s1.toDouble / n.toDouble
    val p2 = s2.toDouble / n.toDouble
    val p3 = s3.toDouble / n.toDouble
    val p4 = s4.toDouble / n.toDouble
    val m2 = p2 - mean * mean
    val m3 = p3 - 3.0 * mean * p2 + 2.0 * mean * mean * mean
    val m4 = p4 - 4.0 * mean * p3 + 6.0 * mean * mean * p2 -
      3.0 * mean * mean * mean * mean
    val skew = m3 / (m2 * math.sqrt(m2))
    val kurt = m4 / (m2 * m2)
    assert(row.getAs[Long]("skew_micros") == math.floor(skew * 1e6).toLong)
    assert(row.getAs[Long]("kurt_micros") == math.floor(kurt * 1e6).toLong)
    val jb = n.toDouble / 6.0 *
      (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    assert(row.getAs[Long]("jb_micros") == math.floor(jb * 1e6).toLong)
    assert(row.getAs[Long]("jb_micros") >= 0L)
  }

  test("q300 Brown-Forsythe matches a driver-side median-deviation recomputation") {
    val row = graft.operators.DataQuality.brownForsythe(spark, sf).collect().head
    val xs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byLang = xs.groupBy(_._1)
    // doubled median per group from the two middle order statistics
    val med2 = byLang.map { case (l, g) =>
      val s = g.sortBy(x => (x._3, x._2)).map(_._3)
      l -> (s((s.length + 1) / 2 - 1) + s((s.length + 2) / 2 - 1))
    }
    val devs = xs.map(x => (x._1, math.abs(2 * x._3 - med2(x._1))))
    val tMilli = devs.groupBy(_._1).values.map { g =>
      val ni = g.length.toLong; val si = g.map(_._2).sum
      math.floor(si.toDouble * si.toDouble / ni.toDouble * 1000.0).toLong
    }.sum
    val n = devs.length.toLong; val k = byLang.size.toLong
    val s = devs.map(_._2).sum; val q = devs.map(d => d._2 * d._2).sum
    val ssb = tMilli - math.floor(s.toDouble * s.toDouble / n.toDouble * 1000.0).toLong
    val ssw = q * 1000L - tMilli
    assert(row.getAs[Long]("k_groups") == k)
    assert(row.getAs[Long]("n_total") == n)
    assert(row.getAs[Long]("ssb_milli") == ssb)
    assert(row.getAs[Long]("ssw_milli") == ssw)
    assert(row.getAs[Long]("f_micros") == math.floor(ssb.toDouble * (n - k).toDouble
      / (ssw.toDouble * (k - 1).toDouble) * 1e6).toLong)
  }

  test("q301 KM curve is a valid survival function with real censoring") {
    import graft.operators.Relational.KmCapHours
    val rows = graft.operators.Relational.kaplanMeier(spark, sf).collect()
    assert(rows.nonEmpty)
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // first step's risk set is the whole cohort
    assert(rows.head.getAs[Long]("n_risk") == nUsers)
    // survival is strictly decreasing across event times, stays in (0, 1]
    val s = rows.map(_.getAs[Long]("s_ppm"))
    assert(s.zip(s.tail).forall { case (a, b) => a > b })
    assert(s.head < 1000000L && s.last > 0L)
    // censoring must be REAL at this SF (the degeneracy guard: every
    // risk set strictly exceeds its event count because censored
    // users survive past the last event time)
    val nEvents = rows.map(_.getAs[Long]("d_events")).sum
    assert(nEvents < nUsers, "at least one censored user required")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_risk") > r.getAs[Long]("d_events"))
      assert(r.getAs[Long]("duration_hours") < KmCapHours)
    }
  }

  test("q301 KM matches a driver-side product-limit recomputation") {
    import graft.operators.Relational.KmCapHours
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val subj = byUser.values.map { g =>
      val ft = g.map(_._2).min
      val pts = g.filter(_._3 == "purchase").map(_._2)
      if (pts.nonEmpty && (pts.min - ft) / 3600000000L < KmCapHours)
        ((pts.min - ft) / 3600000000L, 1L)
      else (KmCapHours, 0L)
    }.toSeq
    val rows = graft.operators.Relational.kaplanMeier(spark, sf).collect()
    var lnS = 0L
    val eventTimes = subj.filter(_._2 == 1L).map(_._1).distinct.sorted
    assert(rows.map(_.getAs[Long]("duration_hours")).toSeq == eventTimes)
    eventTimes.zip(rows).foreach { case (t, r) =>
      val nRisk = subj.count(_._1 >= t).toLong
      val d = subj.count(x => x._1 == t && x._2 == 1L).toLong
      lnS += math.floor(math.log((nRisk - d).toDouble / nRisk.toDouble) * 1e9).toLong
      assert(r.getAs[Long]("n_risk") == nRisk)
      assert(r.getAs[Long]("d_events") == d)
      assert(r.getAs[Long]("ln_s_nano") == lnS)
      assert(r.getAs[Long]("s_ppm") ==
        math.floor(math.exp(lnS.toDouble / 1e9) * 1e6).toLong)
    }
  }

  test("q302 NB confusion matches a full driver-side train/score recomputation") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    def md5i28(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString.take(7), 16)
    }
    val (train, test) = docs.partition(d => md5i28("nb_" + d._1) % 2 == 0)
    assert(train.nonEmpty && test.nonEmpty)
    val ctl = scala.collection.mutable.Map[(String, String), Long]()
    train.foreach { case (_, l, w) =>
      w.foreach(t => ctl((t, l)) = ctl.getOrElse((t, l), 0L) + 1) }
    val nl = ctl.groupBy(_._1._2).map { case (l, m) => l -> m.values.sum }
    val v = ctl.keys.map(_._1).toSet.size.toLong
    val langs = train.map(_._2).distinct.sorted
    val dl = train.groupBy(_._2).map { case (l, g) => l -> g.length.toLong }
    val dt = train.length.toLong
    val prior = langs.map(l =>
      l -> math.floor(math.log(dl(l).toDouble / dt.toDouble) * 1e6).toLong).toMap
    val lnden = langs.map(l =>
      l -> math.floor(math.log((nl(l) + v).toDouble) * 1e6).toLong).toMap
    val conf = scala.collection.mutable.Map[(String, String), Long]()
    test.filter(_._3.nonEmpty).foreach { case (_, tl, w) =>
      val counts = w.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      val m = w.length.toLong
      val best = langs.map { l =>
        val ms = counts.map { case (t, c) =>
          ctl.get((t, l)).map(cc =>
            c * math.floor(math.log((cc + 1).toDouble) * 1e6).toLong).getOrElse(0L)
        }.sum
        (-(prior(l) - m * lnden(l) + ms), l)
      }.min._2
      conf((tl, best)) = conf.getOrElse((tl, best), 0L) + 1
    }
    val rows = graft.operators.TextAnalysis.naiveBayes(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n_docs"))).toMap
    assert(rows == conf.toMap, s"spark=$rows driver=$conf")
  }

  private def allTokenLists: Array[Seq[String]] =
    graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .collect().map(_.getSeq[String](0))

  test("q303 conditional entropy matches a driver-side recomputation") {
    val row = graft.operators.TextAnalysis.condEntropy(spark, sf).collect().head
    val bigrams = allTokenLists.flatMap(w => w.zip(w.drop(1)))
    val n = bigrams.length.toLong
    val bc = bigrams.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val mc = bigrams.groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    def ent(counts: Iterable[Long]): Long = counts.map(c =>
      math.floor(c.toDouble / n.toDouble * math.log(n.toDouble / c.toDouble)
        * 1e9).toLong).sum
    assert(row.getAs[Long]("n_pairs") == n)
    assert(row.getAs[Long]("v_bigrams") == bc.size.toLong)
    assert(row.getAs[Long]("v_first") == mc.size.toLong)
    val (hb, h1) = (ent(bc.values), ent(mc.values))
    assert(row.getAs[Long]("h_bigram_nano") == hb)
    assert(row.getAs[Long]("h_first_nano") == h1)
    assert(row.getAs[Long]("h_cond_nano") == hb - h1)
    // chain rule sanity: 0 ≤ H(w2|w1) ≤ H(w1,w2)
    assert(hb - h1 >= 0 && hb - h1 <= hb)
    assert(row.getAs[Long]("ppl_micros") ==
      math.floor(math.exp((hb - h1).toDouble / 1e9) * 1e6).toLong)
  }

  test("q304 FD census separates holding from failing dependencies") {
    val rows = graft.operators.DataQuality.fdDiscovery(spark, sf).collect()
    assert(rows.length == graft.operators.DataQuality.FdCandidates.size)
    val byKey = rows.map(r => ((r.getString(0), r.getString(1), r.getString(2)),
      (r.getAs[Long]("n_lhs"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("g3_violations"), r.getAs[Long]("holds")))).toMap
    // keys hold; plausible-but-false dependencies fail
    assert(byKey(("documents", "doc_id", "lang"))._4 == 1L)
    assert(byKey(("nation", "n_nationkey", "n_name"))._4 == 1L)
    assert(byKey(("documents", "source", "lang"))._4 == 0L)
    rows.foreach { r =>
      val (nLhs, nRows, g3, holds) = byKey(
        (r.getString(0), r.getString(1), r.getString(2)))
      assert(nLhs <= nRows && g3 >= 0 && g3 < nRows)
      assert((g3 == 0L) == (holds == 1L))
    }
    // driver-side g3 recomputation for the failing documents FD
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val g3 = docs.groupBy(_._1).values.map { g =>
      g.length.toLong - g.groupBy(_._2).values.map(_.length).max.toLong }.sum
    assert(byKey(("documents", "source", "lang"))._3 == g3)
  }

  test("q305 TextRank matches a driver-side integer-pico recomputation") {
    import graft.operators.Graph.{PrIterations, TextRankTopK}
    val pairs = allTokenLists.flatMap(w => w.zip(w.drop(1)))
      .filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else p.swap).distinct
    val edges = pairs ++ pairs.map(_.swap)
    val deg = edges.groupBy(_._1).map { case (t, g) => t -> g.length.toLong }
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.length.toLong
    var pr = nodes.map(t => t -> 1000000000000L / n).toMap
    for (_ <- 1 to PrIterations) {
      val in = scala.collection.mutable.Map[String, Long]()
      edges.foreach { case (s, d) =>
        in(d) = in.getOrElse(d, 0L) + pr(s) / deg(s) }
      pr = nodes.map(t =>
        t -> (150000000000L / n + in.getOrElse(t, 0L) * 17 / 20)).toMap
    }
    val expect = nodes.map(t => (t, pr(t), deg(t)))
      .sortBy { case (t, p, _) => (-p, t) }.take(TextRankTopK).toSeq
    val rows = graft.operators.Graph.textRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("pr_pico"),
        r.getAs[Long]("degree"))).toSeq
    assert(rows == expect, s"spark=${rows.take(3)} driver=${expect.take(3)}")
  }

  test("q306 logreg matches a driver-side integer-GD recomputation and discriminates") {
    import graft.operators.DataQuality.{LrIterations, LrPosLang, LrRate}
    val raw = graft.sources.Tables.documents(spark, sf)
      .select((col("lang") === LrPosLang).cast("long").as("y"), col("n_chars"),
        size(graft.functions.TextFunctions.wsTokens(col("text"))).cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = raw.length.toLong
    val m1 = raw.map(_._2).sum / n; val m2 = raw.map(_._3).sum / n
    val feats = raw.map { case (y, a, b) => (y, a - m1, b - m2) }
    var (w0, w1, w2) = (0L, 0L, 0L)
    def s(x1: Long, x2: Long): Double =
      (w0.toDouble + w1.toDouble * (x1.toDouble / 1000.0)
        + w2.toDouble * (x2.toDouble / 100.0)) / 1000000.0
    for (_ <- 1 to LrIterations) {
      var (g0, g1, g2) = (0L, 0L, 0L)
      feats.foreach { case (y, x1, x2) =>
        val p = 1.0 / (1.0 + math.exp(-s(x1, x2)))
        g0 += math.floor((p - y.toDouble) * 1e6).toLong
        g1 += math.floor((p - y.toDouble) * (x1.toDouble / 1000.0) * 1e6).toLong
        g2 += math.floor((p - y.toDouble) * (x2.toDouble / 100.0) * 1e6).toLong
      }
      w0 -= math.floor(g0.toDouble * LrRate / n.toDouble).toLong
      w1 -= math.floor(g1.toDouble * LrRate / n.toDouble).toLong
      w2 -= math.floor(g2.toDouble * LrRate / n.toDouble).toLong
    }
    val npos = feats.map(_._1).sum
    val thr = math.log(npos.toDouble / (n - npos).toDouble)
    val preds = feats.map { case (y, x1, x2) => (y, if (s(x1, x2) > thr) 1L else 0L) }
    val row = graft.operators.DataQuality.logReg(spark, sf).collect().head
    assert((row.getAs[Long]("w0_micros"), row.getAs[Long]("w1_micros"),
      row.getAs[Long]("w2_micros")) == ((w0, w1, w2)))
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("n_pos") == npos)
    assert(row.getAs[Long]("n_correct") == preds.count(p => p._1 == p._2).toLong)
    val tp = preds.count(p => p._1 == 1L && p._2 == 1L).toLong
    assert(row.getAs[Long]("n_true_pos") == tp)
    // the trained model must actually discriminate at the prior
    // threshold — neither all-negative nor all-positive
    assert(tp > 0L && tp < npos)
  }

  test("q307 Haar energies satisfy the exact integer Parseval identity") {
    import graft.operators.Relational.HaarLevels
    val rows = graft.operators.Relational.haarEnergy(spark, sf).collect()
    assert(rows.length == HaarLevels)
    val days = graft.sources.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("d")).collect()
      .map(_.getLong(0))
    val d0 = days.min
    val counts = Array.fill(32)(0L)
    days.foreach(d => counts((d - d0).toInt) += 1)
    // driver-side recomputation per level (zero-filled grid; the
    // operator's n_blocks counts only parents containing a PRESENT
    // day — empty tail blocks contribute 0 energy either way)
    var blocks = counts
    var present = counts.map(_ > 0L)
    rows.sortBy(_.getAs[Int]("level")).foreach { r =>
      val k = r.getAs[Int]("level")
      val parents = blocks.grouped(2).toArray
      val diffs = parents.map(p => p(0) - p(1))
      val pPresent = present.grouped(2).map(_.exists(identity)).toArray
      assert(r.getAs[Long]("block_days") == (1L << k))
      assert(r.getAs[Long]("n_blocks") == pPresent.count(identity).toLong)
      assert(r.getAs[Long]("energy") == diffs.map(d => d * d).sum)
      blocks = parents.map(_.sum)
      present = pPresent
    }
    // Parseval on unnormalized sums: 32·Σx² = S² + Σ_k E_k·2^(5−k)
    val lhs = 32L * counts.map(c => c * c).sum
    val s = counts.sum
    val rhs = s * s + rows.map(r =>
      r.getAs[Long]("energy") * (1L << (HaarLevels - r.getAs[Int]("level")))).sum
    assert(lhs == rhs, s"Parseval: $lhs vs $rhs")
  }

  test("q308 stump is the exact gini argmin with both sides populated") {
    val row = graft.operators.DataQuality.decisionStump(spark, sf).collect().head
    val xs = graft.sources.Tables.documents(spark, sf)
      .select(col("n_chars"),
        (col("lang") === graft.operators.DataQuality.LrPosLang).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = xs.length.toLong; val npos = xs.map(_._2).sum
    val cands = xs.map(_._1).distinct.sorted.init.map { v =>
      val le = xs.filter(_._1 <= v)
      val (nle, ple) = (le.length.toLong, le.map(_._2).sum)
      val (ngt, pgt) = (n - nle, npos - ple)
      val g = math.floor((2.0 * ple.toDouble * (nle - ple).toDouble / nle.toDouble
        + 2.0 * pgt.toDouble * (ngt - pgt).toDouble / ngt.toDouble)
        / n.toDouble * 1e6).toLong
      (v, g, nle, ple)
    }
    val best = cands.minBy(c => (c._2, c._1))
    assert(row.getAs[Long]("threshold") == best._1)
    assert(row.getAs[Long]("gini_micros") == best._2)
    assert(row.getAs[Long]("n_le") == best._3)
    assert(row.getAs[Long]("pos_le") == best._4)
    assert(row.getAs[Long]("n_le") > 0 && row.getAs[Long]("n_le") < n)
    // the chosen split must beat the no-split gini
    val g0 = math.floor(2.0 * npos.toDouble * (n - npos).toDouble
      / n.toDouble / n.toDouble * 1e6).toLong
    assert(row.getAs[Long]("gini_micros") <= g0)
  }

  test("q309 Shapley credits match a driver-side coalition recomputation") {
    import graft.operators.Relational.AttribLookbackUs
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val touches = ev.filter(e => Set("view", "click", "signup")(e._4))
    val credits = scala.collection.mutable.Map[String, (Long, Long)]()
    ev.filter(_._4 == "purchase").foreach { p =>
      val cents = math.floor(p._5 * 100 + 0.5).toLong
      val s = touches.filter(t => t._2 == p._2 && t._3 < p._3 &&
        t._3 >= p._3 - AttribLookbackUs).map(_._4).distinct
      val chs = if (s.isEmpty) Seq("(none)") else s.toSeq
      val per = cents * 10000L / chs.length
      chs.foreach { c =>
        val (n0, c0) = credits.getOrElse(c, (0L, 0L))
        credits(c) = (n0 + 1, c0 + per)
      }
    }
    val rows = graft.operators.Relational.shapleyCredit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_conversions"),
        r.getAs[Long]("credit_microcents"))).toMap
    assert(rows == credits.toMap, s"spark=$rows driver=$credits")
  }

  test("q310 matched uplift strata and ATT fold are consistent") {
    val rows = graft.operators.Relational.matchedUplift(spark, sf).collect()
    val (attRows, strata) = rows.partition(_.getString(0) == "(att)")
    assert(attRows.length == 1 && strata.nonEmpty)
    val att = attRows.head
    // ATT row aggregates exactly the common-support strata
    assert(att.getAs[Long]("nt") == strata.map(_.getAs[Long]("nt")).sum)
    assert(att.getAs[Long]("nc") == strata.map(_.getAs[Long]("nc")).sum)
    val wsum = strata.map(r => r.getAs[Long]("nt") * r.getAs[Long]("uplift_micros")).sum
    assert(att.getAs[Long]("uplift_micros") ==
      math.floor(wsum.toDouble / att.getAs[Long]("nt").toDouble).toLong)
    strata.foreach { r =>
      assert(r.getAs[Long]("nt") > 0 && r.getAs[Long]("nc") > 0)
      assert(r.getAs[Long]("uplift_micros") ==
        r.getAs[Long]("treated_mean_micros") - r.getAs[Long]("control_mean_micros"))
    }
    // treatment assignment is the first-event rule: arm sizes must
    // partition the common-support users
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(att.getAs[Long]("nt") + att.getAs[Long]("nc") <= users)
  }

  test("q311 late-order census matches a driver-side EXISTS recomputation") {
    import graft.operators.Relational.{LateShipDays, LateWindowEnd, LateWindowStart}
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(cast(o_orderdate AS timestamp)) div 1000000").as("od"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ships = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        expr("unix_micros(cast(l_shipdate AS timestamp)) div 1000000").as("sd"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
    val startS = java.time.Instant.parse(s"${LateWindowStart}T00:00:00Z").getEpochSecond
    val endS = java.time.Instant.parse(s"${LateWindowEnd}T00:00:00Z").getEpochSecond
    val expected = orders
      .filter(o => o._3 >= startS && o._3 < endS)
      .filter(o => ships.get(o._1).exists(_ > o._3 + LateShipDays * 86400L))
      .groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val rows = graft.operators.Relational.lateOrders(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("order_count")).toMap
    assert(rows == expected, s"spark=$rows driver=$expected")
  }

  private def dupEdges: Array[(Long, Long)] =
    graft.operators.Dedup.verifiedPairs(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("q312 WL colors match a driver-side refinement recomputation") {
    import graft.operators.Graph.WlRounds
    val pairs = dupEdges
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
    pairs.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil); adj(b) = a :: adj.getOrElse(b, Nil) }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
    var c: Map[Long, String] = adj.map { case (v, ns) => v -> ns.length.toString }.toMap
    for (_ <- 1 to WlRounds)
      c = adj.map { case (v, ns) =>
        v -> md5hex(c(v) + "|" + ns.map(c).sorted.mkString(","))
      }.toMap
    val expect = c.values.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val rows = graft.operators.Graph.wlHash(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_nodes")).toMap
    assert(rows == expect, s"spark=$rows driver=$expect")
    assert(rows.values.sum == adj.size.toLong)
  }

  test("q313 clustering census matches a driver-side recomputation") {
    val pairs = dupEdges.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    pairs.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Set()) + b; adj(b) = adj.getOrElse(b, Set()) + a }
    val perNode = adj.filter(_._2.size >= 2).map { case (v, ns) =>
      val nsSeq = ns.toSeq
      val tri = (for {
        i <- nsSeq.indices; j <- (i + 1) until nsSeq.size
        (x, y) = (nsSeq(i) min nsSeq(j), nsSeq(i) max nsSeq(j))
        if pairs((x, y))
      } yield 1).size.toLong
      val d = ns.size.toLong
      (d, tri, tri * 2000000L / (d * (d - 1)))
    }.toSeq
    val expect = perNode.groupBy(_._1).map { case (d, g) =>
      d -> (g.size.toLong, g.map(_._2).sum, g.map(_._3).sum / g.size) }
    val rows = graft.operators.Graph.localClustering(spark, sf).collect()
      .map(r => r.getAs[Long]("degree") -> ((r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_triangles"), r.getAs[Long]("mean_cc_ppm")))).toMap
    assert(rows == expect, s"spark=$rows driver=$expect")
  }

  test("q314 LOF matches a driver-side density recomputation") {
    import graft.operators.Similarity.{LofK, LofTopK}
    val cells = graft.operators.Similarity.hierCells(spark, sf)
      .select(col("vec_id"), col("tc")(0)("id").as("cent_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCell = cells.groupBy(_._2).filter(_._2.size >= LofK + 1)
    val members = byCell.values.flatten.map(_._1).toSet
    val knn = members.map { a =>
      val cellmates = byCell(cells(a)).map(_._1).filter(_ != a)
      a -> cellmates.map { b =>
        (math.floor((1.0 - cos(vs(a), vs(b))) * 1e9).toLong, b)
      }.toSeq.sorted.take(LofK)
    }.toMap
    val kdist = knn.map { case (a, ns) => a -> ns.map(_._1).max }
    val sReach = knn.map { case (a, ns) =>
      a -> ns.map { case (dn, b) => math.max(kdist(b), dn) }.sum }
    val lrd = sReach.map { case (a, s) => a -> LofK * 1000000000000000L / math.max(s, 1L) }
    val lof = knn.map { case (a, ns) =>
      (a, cells(a), kdist(a), ns.map(n => lrd(n._2)).sum * 1000000L / (LofK * lrd(a)))
    }.toSeq.sortBy(x => (-x._4, x._1)).take(LofTopK)
    val rows = graft.operators.Similarity.lofOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("kdist_nano"),
        r.getAs[Long]("lof_ppm"))).toSeq
    assert(rows == lof, s"spark=${rows.take(3)} driver=${lof.take(3)}")
    // LOF of a clustered point ≈ 1; the report must surface genuine
    // density outliers at its head
    assert(rows.head._4 > 1000000L)
  }

  test("q315 recall curve is monotone and anchored to the graded operating point") {
    import graft.operators.Similarity.{BucketK, IvfNProbe, ProbeSweepMax}
    val rows = graft.operators.Similarity.probeCurve(spark, sf).collect()
      .sortBy(_.getAs[Int]("nprobe"))
    assert(rows.length == ProbeSweepMax)
    // more probes can only add candidates, never remove them
    val recalls = rows.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    recalls.foreach(r => assert(r >= 0 && r <= 1000000L))
    rows.foreach { r =>
      assert(r.getAs[Long]("recall_ppm") ==
        r.getAs[Long]("n_match") * 1000000L / (10 * BucketK))
    }
    // the sweep's nprobe = IvfNProbe point must reproduce q109's
    // aggregate match count (same index, same queries, same k)
    val q109 = graft.operators.Similarity.ivfRecall(spark, sf).collect()
      .map(_.getAs[Long]("n_match")).sum
    assert(rows(IvfNProbe - 1).getAs[Long]("n_match") == q109)
  }

  test("q316 lexical constants match a driver-side recomputation") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val expect = docs.groupBy(_._1).map { case (src, g) =>
      val counts = g.flatMap(_._2).groupBy(identity)
        .map { case (_, xs) => xs.length.toLong }
      val n = counts.sum; val v = counts.size.toLong
      val s2 = counts.map(c => c * c).sum
      src -> ((n, v, counts.count(_ == 1L).toLong,
        math.floor((s2 - n).toDouble * 1e7 / (n.toDouble * n.toDouble)).toLong,
        math.floor(math.log(v.toDouble) / math.log(n.toDouble) * 1e6).toLong))
    }
    val rows = graft.operators.TextAnalysis.yulesK(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_types"), r.getAs[Long]("n_hapax"),
        r.getAs[Long]("yule_k_milli"), r.getAs[Long]("herdan_c_micro")))).toMap
    assert(rows == expect, s"spark=${rows.take(2)} driver=${expect.take(2)}")
    rows.values.foreach { case (n, v, h, _, c) =>
      assert(h <= v && v <= n && c > 0 && c <= 1000000L)
    }
  }

  test("q317 burstiness report matches a driver-side dispersion recomputation") {
    import graft.operators.TextAnalysis.{BurstMinDf, BurstTopK}
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val nDocs = docs.length.toLong
    val perTerm = docs.flatMap { case (d, w) =>
      w.groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) } }
      .groupBy(_._1).filter(_._2.length >= BurstMinDf)
      .map { case (t, g) =>
        val total = g.map(_._2).sum; val s2 = g.map(x => x._2 * x._2).sum
        (t, g.length.toLong, total,
          math.floor((s2.toDouble / total.toDouble
            - total.toDouble / nDocs.toDouble) * 1e6).toLong)
      }.toSeq
    val expect = perTerm.sortBy(x => (-x._4, x._1)).take(BurstTopK)
    val rows = graft.operators.TextAnalysis.termBurstiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("df"), r.getAs[Long]("total"),
        r.getAs[Long]("vmr_micro"))).toSeq
    assert(rows == expect, s"spark=${rows.take(3)} driver=${expect.take(3)}")
  }

  test("q318 U-shape credits conserve revenue up to integer truncation") {
    import graft.operators.Relational.AttribLookbackUs
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val touches = ev.filter(e => Set("view", "click", "signup")(e._4))
    val credits = scala.collection.mutable.Map[String, (Long, Long)]()
    var totalCents = 0L; var truncLoss = 0L
    ev.filter(_._4 == "purchase").foreach { p =>
      val cents = math.floor(p._5 * 100 + 0.5).toLong
      totalCents += cents
      val s = touches.filter(t => t._2 == p._2 && t._3 < p._3 &&
        t._3 >= p._3 - AttribLookbackUs).sortBy(t => (t._3, t._1))
      def add(c: String, cr: Long): Unit = {
        val (n0, c0) = credits.getOrElse(c, (0L, 0L))
        credits(c) = (n0 + 1, c0 + cr)
      }
      if (s.isEmpty) add("(none)", cents * 10000L)
      else if (s.length == 1) add(s.head._4, cents * 10000L)
      else if (s.length == 2) s.foreach(t => add(t._4, cents * 5000L))
      else {
        add(s.head._4, cents * 4000L); add(s.last._4, cents * 4000L)
        val mid = cents * 2000L / (s.length - 2)
        s.tail.init.foreach(t => add(t._4, mid))
        truncLoss += cents * 2000L - mid * (s.length - 2)
      }
    }
    val rows = graft.operators.Relational.uShapeAttribution(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_credits"),
        r.getAs[Long]("credit_microcents")))).toMap
    assert(rows == credits.toMap, s"spark=$rows driver=$credits")
    assert(rows.values.map(_._2).sum == totalCents * 10000L - truncLoss)
  }

  test("q319 hashing audit matches a driver-side bucket recomputation") {
    import graft.operators.TextAnalysis.FhBuckets
    val row = graft.operators.TextAnalysis.featureHashing(spark, sf).collect().head
    val terms = allTokenLists.flatten.groupBy(identity)
      .map { case (t, g) => t -> g.length.toLong }
    def md5i28(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString.take(7), 16)
    }
    val buckets = terms.groupBy { case (t, _) => md5i28("fh_" + t) % FhBuckets }
      .toSeq.map { case (_, g) => (g.size.toLong, g.values.sum) }
    val nTerms = terms.size.toLong
    assert(row.getAs[Long]("n_terms") == nTerms)
    assert(row.getAs[Long]("occupied") == buckets.size.toLong)
    assert(row.getAs[Long]("max_load") == buckets.map(_._1).max)
    assert(row.getAs[Long]("collision_ppm") ==
      (nTerms - buckets.size) * 1000000L / nTerms)
    val s2 = buckets.map(b => b._1 * b._1).sum
    assert(row.getAs[Long]("chi2_micro") == math.floor(
      (FhBuckets.toDouble * s2.toDouble / nTerms.toDouble - nTerms.toDouble)
        * 1e6).toLong)
    val nTokens = terms.values.sum
    assert(row.getAs[Long]("max_mass_ppm") ==
      buckets.map(_._2).max * 1000000L / nTokens)
  }

  test("q320 Good-Turing table matches a driver-side count-of-counts") {
    import graft.operators.TextAnalysis.GtMaxR
    val tris = allTokenLists.flatMap(w =>
      if (w.length < 3) Nil
      else (0 to w.length - 3).map(i => s"${w(i)}_${w(i + 1)}_${w(i + 2)}"))
    val counts = tris.groupBy(identity).map { case (_, g) => g.length.toLong }
    val nr = counts.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val nTokens = tris.length.toLong
    val rows = graft.operators.TextAnalysis.goodTuring(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("r")).toSeq ==
      nr.keys.filter(_ <= GtMaxR).toSeq.sorted)
    rows.foreach { row =>
      val r = row.getAs[Long]("r")
      val next = nr.getOrElse(r + 1, 0L)
      assert(row.getAs[Long]("nr") == nr(r))
      assert(row.getAs[Long]("nr_next") == next)
      assert(row.getAs[Long]("r_star_micro") == math.floor(
        (r + 1).toDouble * next.toDouble / nr(r).toDouble * 1e6).toLong)
      if (r == 1L)
        assert(row.getAs[Long]("missing_mass_ppm") == nr(1L) * 1000000L / nTokens)
      else assert(row.isNullAt(row.fieldIndex("missing_mass_ppm")))
    }
  }

  test("q321 leaderboard turnover matches a driver-side recomputation") {
    import graft.operators.Relational.TurnoverK
    val ev = graft.sources.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tops = ev.groupBy(_._1).map { case (d, g) =>
      d -> g.groupBy(_._2).map { case (u, xs) => (u, xs.length.toLong) }
        .toSeq.sortBy { case (u, c) => (-c, u) }.take(TurnoverK).map(_._1).toSet
    }
    val expect = tops.keys.filter(d => tops.contains(d - 1)).toSeq.sorted.map { d =>
      val common = tops(d).intersect(tops(d - 1)).size.toLong
      (d, common, common * 1000000L / TurnoverK)
    }
    val rows = graft.operators.Relational.rankTurnover(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_common"),
        r.getAs[Long]("retention_ppm"))).toSeq
    assert(rows == expect, s"spark=${rows.take(3)} driver=${expect.take(3)}")
  }

  test("q322 L-moments match a direct order-statistic recomputation") {
    val row = graft.operators.DataQuality.lMoments(spark, sf).collect().head
    val xs = graft.sources.Tables.documents(spark, sf)
      .select(col("n_chars")).collect().map(_.getLong(0)).sorted
    val n = xs.length.toLong
    // direct PWM sums over sorted positions (1-indexed)
    var (b0, b1, b2, b3) = (0L, 0L, 0L, 0L)
    xs.zipWithIndex.foreach { case (x, i0) =>
      val i = i0 + 1L
      b0 += x
      b1 += x * (i - 1)
      b2 += x * (i - 1) * (i - 2)
      b3 += x * (i - 1) * (i - 2) * (i - 3)
    }
    val d0 = b0.toDouble / n.toDouble
    val d1 = b1.toDouble / (n * (n - 1)).toDouble
    val d2 = b2.toDouble / (n * (n - 1) * (n - 2)).toDouble
    val d3 = b3.toDouble / (n * (n - 1) * (n - 2) * (n - 3)).toDouble
    val l2 = 2.0 * d1 - d0
    val l3 = 6.0 * d2 - 6.0 * d1 + d0
    val l4 = 20.0 * d3 - 30.0 * d2 + 12.0 * d1 - d0
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("l1_micro") == math.floor(d0 * 1e6).toLong)
    assert(row.getAs[Long]("l2_micro") == math.floor(l2 * 1e6).toLong)
    assert(row.getAs[Long]("t3_micro") == math.floor(l3 / l2 * 1e6).toLong)
    assert(row.getAs[Long]("t4_micro") == math.floor(l4 / l2 * 1e6).toLong)
    // L-scale positive; τ3/τ4 inside their theoretical (−1, 1) bound
    assert(row.getAs[Long]("l2_micro") > 0)
    assert(math.abs(row.getAs[Long]("t3_micro")) < 1000000L)
    assert(math.abs(row.getAs[Long]("t4_micro")) < 1000000L)
  }

  test("q323 Theil-Sen matches a driver-side pairwise-median recomputation") {
    val days = graft.sources.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("d")).collect()
      .map(_.getLong(0))
    val d0 = days.min
    val daily = days.groupBy(d => d - d0).map { case (d, g) => (d, g.length.toLong) }
      .toSeq.sortBy(_._1)
    val slopes = (for {
      (di, ci) <- daily; (dj, cj) <- daily if di < dj
    } yield math.floor((cj - ci).toDouble * 1e9 / (dj - di).toDouble).toLong)
      .sorted
    val np = slopes.length
    val med2 = slopes((np + 1) / 2 - 1) + slopes((np + 2) / 2 - 1)
    val slope = math.floor(med2.toDouble / 2.0).toLong
    val res = daily.map { case (d, c) => c * 1000000000L - slope * d }.sorted
    val nd = res.length
    val rmed2 = res((nd + 1) / 2 - 1) + res((nd + 2) / 2 - 1)
    val row = graft.operators.Relational.theilSen(spark, sf).collect().head
    assert(row.getAs[Long]("n_days") == nd.toLong)
    assert(row.getAs[Long]("n_pairs") == np.toLong)
    assert(row.getAs[Long]("slope_nano") == slope)
    assert(row.getAs[Long]("intercept_nano") ==
      math.floor(rmed2.toDouble / 2.0).toLong)
  }

  test("q324 grid is anchored to q244 at the default corner") {
    import graft.operators.Indexing.{Bm25B, Bm25K1, Bm25Grid}
    val rows = graft.operators.Indexing.bm25Grid(spark, sf).collect()
    assert(rows.length == Bm25Grid.size)
    // one shared query set across all corners
    assert(rows.map(_.getAs[Long]("n_queries")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("mrr_ppm") ==
        r.getAs[Long]("sum_rr_ppm") / r.getAs[Long]("n_queries"))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_queries"))
    }
    // the (k1, b) default corner must reproduce q244's per-query sums
    val q244 = graft.operators.Indexing.bm25Eval(spark, sf).collect()
    val defRow = rows.find(r =>
      r.getAs[Long]("k1_milli") == (Bm25K1 * 1000).round &&
        r.getAs[Long]("b_milli") == (Bm25B * 1000).round).get
    assert(defRow.getAs[Long]("sum_rr_ppm") ==
      q244.map(_.getAs[Long]("rr_ppm")).sum)
    assert(defRow.getAs[Long]("n_hits") ==
      q244.count(_.getAs[Int]("self_rank") > 0).toLong)
  }

  test("q325 PR curve matches the q18 decisions at every threshold") {
    import graft.operators.TextAnalysis.PrClass
    val scored = graft.operators.TextAnalysis.langId(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getAs[Int]("score")))
    val nTrue = scored.count(_._1 == PrClass).toLong
    val rows = graft.operators.TextAnalysis.prCurve(spark, sf).collect()
    rows.foreach { r =>
      val t = r.getAs[Int]("threshold")
      val preds = scored.filter(s => s._2 == PrClass && s._3 >= t)
      val tp = preds.count(_._1 == PrClass).toLong
      val fp = preds.length - tp
      assert(r.getAs[Long]("tp") == tp)
      assert(r.getAs[Long]("fp") == fp)
      assert(r.getAs[Long]("fn") == nTrue - tp)
      assert(r.getAs[Long]("precision_ppm") == tp * 1000000L / (tp + fp))
      assert(r.getAs[Long]("recall_ppm") == tp * 1000000L / nTrue)
      assert(r.getAs[Long]("f1_ppm") ==
        2 * tp * 1000000L / (2 * tp + fp + (nTrue - tp)))
    }
    // raising the threshold can only shrink the predicted-positive set
    val byT = rows.sortBy(_.getAs[Int]("threshold"))
    val tps = byT.map(_.getAs[Long]("tp"))
    val fps = byT.map(_.getAs[Long]("fp"))
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b })
    assert(fps.zip(fps.tail).forall { case (a, b) => a >= b })
  }

  test("q326 k-anonymity census matches a driver-side class recomputation") {
    import graft.operators.DataQuality.{KAnonBucket, KAnonK}
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars"), col("source")).collect()
      .map(r => ((r.getString(0), r.getLong(1) / KAnonBucket), r.getString(2)))
    val classes = docs.groupBy(_._1).toSeq.map { case (_, g) =>
      (g.length.toLong, g.map(_._2).distinct.length.toLong) }
    val row = graft.operators.DataQuality.kAnonymity(spark, sf).collect().head
    assert(row.getAs[Long]("n_classes") == classes.length.toLong)
    assert(row.getAs[Long]("n_rows") == classes.map(_._1).sum)
    assert(row.getAs[Long]("min_class_size") == classes.map(_._1).min)
    assert(row.getAs[Long]("max_class_size") == classes.map(_._1).max)
    assert(row.getAs[Long]("n_classes_below_k") ==
      classes.count(_._1 < KAnonK).toLong)
    assert(row.getAs[Long]("n_rows_at_risk") ==
      classes.filter(_._1 < KAnonK).map(_._1).sum)
    assert(row.getAs[Long]("min_l_diversity") == classes.map(_._2).min)
  }

  private def eventTuples: Array[(Long, Long, Long, String)] =
    graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q327 CUPED matches a driver-side closed-form recomputation") {
    val ev = eventTuples
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val perUser = ev.groupBy(_._1).toSeq.map { case (u, g) =>
      (u % 2, g.count(_._2 < mid).toLong,
        g.count(e => e._2 >= mid && e._4 == "purchase").toLong)
    }
    val n = perUser.length.toLong
    val sx = perUser.map(_._2).sum; val sy = perUser.map(_._3).sum
    val sxx = perUser.map(p => p._2 * p._2).sum
    val sxy = perUser.map(p => p._2 * p._3).sum
    val syy = perUser.map(p => p._3 * p._3).sum
    val theta = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val (as, bs) = perUser.partition(_._1 == 0)
    def mean(g: Seq[(Long, Long, Long)], f: ((Long, Long, Long)) => Long) =
      g.map(f).sum.toDouble / g.length.toDouble
    val rawDiff = mean(as, _._3) - mean(bs, _._3)
    val xDiff = mean(as, _._2) - mean(bs, _._2)
    val row = graft.operators.Relational.cuped(spark, sf).collect().head
    assert(row.getAs[Long]("n_a") == as.length.toLong)
    assert(row.getAs[Long]("n_b") == bs.length.toLong)
    assert(row.getAs[Long]("theta_micro") == math.floor(theta * 1e6).toLong)
    assert(row.getAs[Long]("raw_diff_micro") == math.floor(rawDiff * 1e6).toLong)
    assert(row.getAs[Long]("adj_diff_micro") ==
      math.floor((rawDiff - theta * xDiff) * 1e6).toLong)
    val rho2 = math.pow(n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble, 2) /
      ((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    assert(row.getAs[Long]("rho2_ppm") == math.floor(rho2 * 1e6).toLong)
    assert(row.getAs[Long]("rho2_ppm") >= 0 && row.getAs[Long]("rho2_ppm") <= 1000000L)
  }

  test("q328 DiD matches a driver-side four-cell recomputation") {
    val ev = eventTuples
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, g) =>
      val first = g.sortBy(e => (e._2, e._3)).head._4
      (if (first == "click") 1L else 0L,
        g.count(e => e._2 < mid && e._4 == "purchase").toLong,
        g.count(e => e._2 >= mid && e._4 == "purchase").toLong)
    }
    val (t, c) = perUser.partition(_._1 == 1L)
    val row = graft.operators.Relational.diffInDiff(spark, sf).collect().head
    assert(row.getAs[Long]("n_t") == t.length.toLong)
    assert(row.getAs[Long]("n_c") == c.length.toLong)
    assert(row.getAs[Long]("pre_t_mean_micro") ==
      t.map(_._2).sum * 1000000L / t.length)
    assert(row.getAs[Long]("post_c_mean_micro") ==
      c.map(_._3).sum * 1000000L / c.length)
    val did = (t.map(_._3).sum.toDouble / t.length - t.map(_._2).sum.toDouble / t.length) -
      (c.map(_._3).sum.toDouble / c.length - c.map(_._2).sum.toDouble / c.length)
    assert(row.getAs[Long]("did_micro") == math.floor(did * 1e6).toLong)
  }

  test("q329 MDE is consistent with q214's arms and its own verdict") {
    import graft.operators.Relational.AbConvMin
    val ev = eventTuples
    val perUser = ev.groupBy(_._1).toSeq.map { case (u, g) =>
      (u % 2, if (g.count(_._4 == "purchase") >= AbConvMin) 1L else 0L) }
    val (as, bs) = perUser.partition(_._1 == 0)
    val (xa, xb) = (as.map(_._2).sum, bs.map(_._2).sum)
    val (na, nb) = (as.length.toLong, bs.length.toLong)
    val p = (xa + xb).toDouble / (na + nb).toDouble
    val d = xa.toDouble / na.toDouble - xb.toDouble / nb.toDouble
    val mdeV = (1.96 + 0.8416) * math.sqrt(p * (1.0 - p) *
      (1.0 / na.toDouble + 1.0 / nb.toDouble))
    val row = graft.operators.Relational.mde(spark, sf).collect().head
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
    assert(row.getAs[Long]("p_pool_ppm") == (xa + xb) * 1000000L / (na + nb))
    assert(row.getAs[Long]("mde_ppm") == math.floor(mdeV * 1e6).toLong)
    assert(row.getAs[Long]("obs_diff_ppm") == math.floor(math.abs(d) * 1e6).toLong)
    assert(row.getAs[Long]("powered") ==
      (if (row.getAs[Long]("obs_diff_ppm") >= row.getAs[Long]("mde_ppm")) 1L else 0L))
  }

  private def dailyCounts: Seq[(Long, Long)] = {
    val days = graft.sources.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("d")).collect()
      .map(_.getLong(0))
    val d0 = days.min
    days.groupBy(d => d - d0).toSeq.map { case (d, g) => (d, g.length.toLong) }
      .sortBy(_._1)
  }

  test("q330 weekday ANOVA matches a driver-side recomputation") {
    val daily = dailyCounts
    val groups = daily.groupBy(_._1 % 7).toSeq.map(_._2)
    val tMilli = groups.map { g =>
      val ni = g.length.toLong; val si = g.map(_._2).sum
      math.floor(si.toDouble * si.toDouble / ni.toDouble * 1000.0).toLong
    }.sum
    val n = daily.length.toLong; val k = groups.length.toLong
    val s = daily.map(_._2).sum; val q = daily.map(x => x._2 * x._2).sum
    val ssb = tMilli - math.floor(s.toDouble * s.toDouble / n.toDouble * 1000.0).toLong
    val ssw = q * 1000L - tMilli
    val row = graft.operators.DataQuality.weekdayAnova(spark, sf).collect().head
    assert(row.getAs[Long]("k_groups") == k)
    assert(row.getAs[Long]("n_total") == n)
    assert(row.getAs[Long]("ssb_milli") == ssb)
    assert(row.getAs[Long]("ssw_milli") == ssw)
    assert(row.getAs[Long]("f_micros") == math.floor(ssb.toDouble * (n - k).toDouble
      / (ssw.toDouble * (k - 1).toDouble) * 1e6).toLong)
  }

  test("q331 backtest matches a driver-side rolling-origin recomputation") {
    val daily = dailyCounts.toMap
    val evalDays = daily.keys.filter(d => daily.contains(d - 1) && daily.contains(d - 7))
      .toSeq.sorted
    val saeLast = evalDays.map(d => math.abs(daily(d) - daily(d - 1))).sum
    val saeSeasonal = evalDays.map(d => math.abs(daily(d) - daily(d - 7))).sum
    val row = graft.operators.Relational.forecastBacktest(spark, sf).collect().head
    assert(row.getAs[Long]("n_eval") == evalDays.length.toLong)
    assert(row.getAs[Long]("sae_last") == saeLast)
    assert(row.getAs[Long]("sae_seasonal") == saeSeasonal)
    assert(row.getAs[Long]("mae_last_micro") ==
      saeLast * 1000000L / evalDays.length)
    val expectWinner =
      if (saeSeasonal < saeLast) "seasonal"
      else if (saeLast < saeSeasonal) "last" else "tie"
    assert(row.getAs[String]("winner") == expectWinner)
  }

  test("q332 CM estimates match a driver-side sketch and never undercount") {
    import graft.operators.TextAnalysis.{CmDepth, CmTopK, CmWidth}
    val tris = allTokenLists.flatMap(w =>
      if (w.length < 3) Nil
      else (0 to w.length - 3).map(i => s"${w(i)}_${w(i + 1)}_${w(i + 2)}"))
    val counts = tris.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    def md5i28(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString.take(7), 16)
    }
    val grid = Array.fill(CmDepth, CmWidth.toInt)(0L)
    counts.foreach { case (t, m) =>
      (0 until CmDepth).foreach(i =>
        grid(i)((md5i28(s"cm${i}_" + t) % CmWidth).toInt) += m)
    }
    val expect = counts.toSeq.sortBy { case (t, m) => (-m, t) }.take(CmTopK)
      .map { case (t, m) =>
        val est = (0 until CmDepth)
          .map(i => grid(i)((md5i28(s"cm${i}_" + t) % CmWidth).toInt)).min
        (t, m, est, est - m, (est - m) * 1000000L / m)
      }
    val rows = graft.operators.TextAnalysis.countMin(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("true_mass"),
        r.getAs[Long]("est_mass"), r.getAs[Long]("overestimate"),
        r.getAs[Long]("err_ppm"))).toSeq
    assert(rows == expect, s"spark=${rows.take(2)} driver=${expect.take(2)}")
    // CM's one-sided guarantee
    rows.foreach(r => assert(r._4 >= 0L))
  }

  test("q333 Friedman matches a driver-side within-block rank recomputation") {
    val daily = dailyCounts
    val blocks = daily.map { case (d, c) => (d / 7, d % 7, c) }
      .groupBy(_._1).filter(_._2.length == 7)
    val ranks = blocks.values.flatMap { g =>
      g.map { case (_, wd, c) =>
        val r2 = g.map(y =>
          if (y._3 < c) 2L else if (y._3 == c) 1L else 0L).sum + 1L
        (wd, r2)
      }
    }
    val rj2 = ranks.groupBy(_._1).map { case (_, g) => g.map(_._2).sum }
    val n = blocks.size.toLong; val k = 7L
    val s2 = rj2.map(r => r * r).sum
    val f = 3.0 * s2.toDouble / (n * k * (k + 1)).toDouble -
      3.0 * (n * (k + 1)).toDouble
    val row = graft.operators.DataQuality.friedman(spark, sf).collect().head
    assert(row.getAs[Long]("n_blocks") == n)
    assert(row.getAs[Long]("k") == k)
    assert(row.getAs[Long]("s2") == s2)
    assert(row.getAs[Long]("f_micros") == math.floor(f * 1e6).toLong)
    // rank-sum conservation: ΣR2_j = n·k·(k+1) (doubled ranks)
    assert(ranks.map(_._2).sum == n * k * (k + 1))
  }

  test("q334 gap curve matches a driver-side delta recomputation") {
    import graft.operators.Relational.SessionGapsMin
    val ev = eventTuples.map(e => (e._1, e._2, e._3)).sortBy(e => (e._1, e._2, e._3))
    val deltas = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3))
      s.zip(s.drop(1)).map { case (a, b) => b._2 - a._2 }
    }.toSeq
    val nEvents = ev.length.toLong
    val nUsers = ev.map(_._1).distinct.length.toLong
    val rows = graft.operators.Relational.sessionGapCurve(spark, sf).collect()
      .sortBy(_.getAs[Long]("gap_minutes"))
    assert(rows.map(_.getAs[Long]("gap_minutes")).toSeq == SessionGapsMin)
    rows.foreach { r =>
      val g = r.getAs[Long]("gap_minutes") * 60000000L
      val brk = deltas.count(_ > g).toLong
      assert(r.getAs[Long]("n_sessions") == nUsers + brk)
      assert(r.getAs[Long]("events_per_session_ppm") ==
        nEvents * 1000000L / (nUsers + brk))
      assert(r.getAs[Long]("break_share_ppm") ==
        brk * 1000000L / (nEvents - nUsers))
    }
    // a larger gap can only merge sessions
    val ns = rows.map(_.getAs[Long]("n_sessions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q335 SNM candidates are sound and the audit is self-consistent") {
    import graft.operators.Dedup.{FuzzyMaxDistance, SnmWindow}
    val row = graft.operators.Dedup.snmBlocking(spark, sf).collect().head
    val names = graft.sources.Tables.part(spark, sf)
      .select(col("p_name")).distinct().collect().map(_.getString(0))
    val n = names.length.toLong
    assert(row.getAs[Long]("n_names") == n)
    // driver-side two-pass candidate generation
    def passPairs(sorted: Seq[String]): Set[(String, String)] =
      (for {
        i <- sorted.indices; j <- (i + 1) to math.min(i + SnmWindow, sorted.size - 1)
      } yield {
        val (a, b) = (sorted(i), sorted(j))
        (if (a < b) a else b, if (a < b) b else a)
      }).toSet
    val cand = passPairs(names.sorted.toSeq) ++
      passPairs(names.sortBy(_.reverse).toSeq)
    assert(row.getAs[Long]("n_candidates") == cand.size.toLong)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val matches = cand.count { case (a, b) => lev(a, b) <= FuzzyMaxDistance }
    assert(row.getAs[Long]("n_matches") == matches.toLong)
    // truth from q135's exhaustive pass; SNM matches must be a subset
    val truth = graft.operators.Dedup.fuzzyNames(spark, sf).count()
    assert(row.getAs[Long]("n_truth_matches") == truth)
    assert(row.getAs[Long]("n_matches") <= truth)
    assert(row.getAs[Long]("recall_ppm") == matches * 1000000L / truth)
    // the multi-pass blocker must actually find matches here
    assert(row.getAs[Long]("n_matches") > 0)
  }

  test("q336 source cosines match a driver-side tf-idf recomputation") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val tc = docs.flatMap { case (s, w) =>
      if (w.length < 3) Nil
      else (0 to w.length - 3).map(i => (s, s"${w(i)}_${w(i + 1)}_${w(i + 2)}"))
    }.groupBy(identity).map { case ((s, t), g) => (s, t, g.length.toLong) }.toSeq
    val ns = tc.map(_._1).distinct.length.toLong
    val dfm = tc.groupBy(_._2).map { case (t, g) => t -> g.length.toLong }
    val wts = tc.map { case (s, t, tf) =>
      (s, t, math.floor(tf.toDouble * math.log(ns.toDouble / dfm(t).toDouble)
        * 1000.0).toLong)
    }.filter(_._3 > 0)
    val norms = wts.groupBy(_._1).map { case (s, g) => s -> g.map(x => x._3 * x._3).sum }
    val byTerm = wts.groupBy(_._2)
    val sources = tc.map(_._1).distinct.sorted
    val expect = (for {
      i <- sources.indices; j <- (i + 1) until sources.size
    } yield {
      val (a, b) = (sources(i), sources(j))
      val dot = byTerm.values.map { g =>
        val wa = g.find(_._1 == a).map(_._3).getOrElse(0L)
        val wb = g.find(_._1 == b).map(_._3).getOrElse(0L)
        wa * wb
      }.sum
      (a, b, math.floor(dot.toDouble /
        (math.sqrt(norms(a).toDouble) * math.sqrt(norms(b).toDouble)) * 1e6).toLong)
    }).toSeq
    val rows = graft.operators.TextAnalysis.sourceCosine(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("cos_ppm"))).toSeq
    assert(rows == expect, s"spark=${rows.take(3)} driver=${expect.take(3)}")
    rows.foreach(r => assert(r._3 >= 0 && r._3 <= 1000000L))
  }

  test("q337 HLL sweep matches a driver-side register recomputation") {
    import graft.operators.Sketches.HllSweepP
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
    val exact = users.distinct.length.toLong
    def md5i60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val hs = users.map(u => md5i60("hs_" + u))
    val rows = graft.operators.Sketches.hllSweep(spark, sf).collect()
      .sortBy(_.getAs[Int]("p"))
    assert(rows.map(_.getAs[Int]("p")).toSeq == HllSweepP)
    rows.foreach { r =>
      val p = r.getAs[Int]("p"); val m = 1 << p
      val regs = hs.groupBy(h => (h % m).toInt).map { case (_, g) =>
        g.map { h =>
          val shifted = h / m
          val bits = java.lang.Long.toBinaryString(shifted)
          (60 - p + 1) - (if (shifted == 0) 0 else bits.length)
        }.max
      }
      val v = regs.size
      val s = regs.map(mj => 1.0 / (1L << mj).toDouble).sum
      val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
      val eRaw = alpha * m.toDouble * m.toDouble / (s + (m - v).toDouble)
      val z = (m - v).toDouble
      val e = if (eRaw <= 2.5 * m && z > 0) m.toDouble * math.log(m.toDouble / z)
        else eRaw
      assert(r.getAs[Long]("exact_distinct") == exact)
      assert(r.getAs[Double]("hll_estimate") ==
        math.floor(e * 1e4 + 0.5) / 1e4)
      assert(r.getAs[Long]("theory_err_ppm") ==
        math.floor(1.04 / math.sqrt(m.toDouble) * 1e6).toLong)
      // measured error should be within ~4 theoretical sigmas
      assert(math.abs(r.getAs[Double]("rel_error")) <
        5.0 * 1.04 / math.sqrt(m.toDouble))
    }
  }

  test("q338 concentration metrics match a driver-side recomputation") {
    val rev = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (k, g) => (k, g.map(_._2).sum) }
    val total = rev.map(_._2).sum
    val revk = rev.map(_._2 / 1000)
    val (totk, s2) = (revk.sum, revk.map(r => r * r).sum)
    val top4 = rev.sortBy(r => (-r._2, r._1)).take(4).map(_._2).sum
    val row = graft.operators.Relational.marketConcentration(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_customers") == rev.length.toLong)
    assert(row.getAs[Long]("total_cents") == total)
    assert(row.getAs[Long]("hhi_ppm") == math.floor(
      s2.toDouble / (totk.toDouble * totk.toDouble) * 1e6).toLong)
    assert(row.getAs[Long]("cr4_ppm") == top4 * 1000000L / total)
    assert(row.getAs[Long]("top1_share_ppm") ==
      rev.map(_._2).max * 1000000L / total)
    // HHI lower bound 1/n (perfect equality), upper bound CR4-consistent
    assert(row.getAs[Long]("hhi_ppm") >= 1000000L / rev.length - 1)
  }

  test("q339 interarrival CV matches a driver-side recomputation") {
    val ev = eventTuples
    val gaps = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.map(e => (e._2, e._3)).sortBy(identity)
      s.zip(s.drop(1)).map { case (a, b) => (b._1 - a._1) / 1000000L }
    }.toSeq
    val n = gaps.length.toLong
    val sd = gaps.sum; val sd2 = gaps.map(d => d * d).sum
    val cv2 = n.toDouble * sd2.toDouble / (sd.toDouble * sd.toDouble) - 1.0
    val row = graft.operators.Relational.interarrivalCv(spark, sf).collect().head
    assert(row.getAs[Long]("n_gaps") == n)
    assert(row.getAs[Long]("mean_gap_s") == sd / n)
    assert(row.getAs[Long]("cv2_micro") == math.floor(cv2 * 1e6).toLong)
    assert(row.getAs[Long]("cv_micro") == math.floor(math.sqrt(cv2) * 1e6).toLong)
    // dispersion must be nonnegative (Cauchy-Schwarz)
    assert(row.getAs[Long]("cv2_micro") >= -1L)
  }

  test("q340 NB moment fit matches a driver-side recomputation") {
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id")).count().collect().map(_.getAs[Long]("count"))
    val n = counts.length.toLong
    val mu = counts.sum.toDouble / n.toDouble
    val v = counts.map(x => x * x).sum.toDouble / n.toDouble - mu * mu
    val row = graft.operators.DataQuality.negBinomial(spark, sf).collect().head
    assert(row.getAs[Long]("n_users") == n)
    assert(row.getAs[Long]("mean_micro") == math.floor(mu * 1e6).toLong)
    assert(row.getAs[Long]("var_micro") == math.floor(v * 1e6).toLong)
    assert(row.getAs[Long]("dispersion_micro") == math.floor(v / mu * 1e6).toLong)
    assert(row.getAs[Long]("r_micro") == math.floor(mu * mu / (v - mu) * 1e6).toLong)
    assert(row.getAs[Long]("p_micro") == math.floor(mu / v * 1e6).toLong)
  }

  test("q341 Chao1 matches a driver-side spectrum recomputation") {
    val tris = allTokenLists.flatMap(w =>
      if (w.length < 3) Nil
      else (0 to w.length - 3).map(i => s"${w(i)}_${w(i + 1)}_${w(i + 2)}"))
    val counts = tris.groupBy(identity).map { case (_, g) => g.length.toLong }
    val v = counts.size.toLong; val nTok = tris.length.toLong
    val n1 = counts.count(_ == 1L).toLong; val n2 = counts.count(_ == 2L).toLong
    val row = graft.operators.DataQuality.chao1(spark, sf).collect().head
    assert(row.getAs[Long]("v_obs") == v)
    assert(row.getAs[Long]("n_tokens") == nTok)
    assert(row.getAs[Long]("n1") == n1)
    assert(row.getAs[Long]("n2") == n2)
    assert(row.getAs[Long]("chao1_est") ==
      v + math.floor(n1.toDouble * n1.toDouble / (2.0 * n2.toDouble)).toLong)
    assert(row.getAs[Long]("coverage_ppm") == 1000000L - n1 * 1000000L / nTok)
    // the estimator can only add unseen types
    assert(row.getAs[Long]("chao1_est") >= v)
  }

  test("q342 partial correlation matches a driver-side co-moment recomputation") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("d"), col("event_type"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val d0 = ev.map(_._1).min
    val daily = ev.groupBy(e => e._1 - d0).toSeq.map { case (t, g) =>
      (t, g.length.toLong,
        g.filter(_._2 == "purchase")
          .map(e => math.floor(e._3 * 100 + 0.5).toLong).sum)
    }
    val n = daily.length.toLong
    def r(xs: Seq[Long], ys: Seq[Long]): Double = {
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(v => v * v).sum; val syy = ys.map(v => v * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    }
    val (ts, xs, ys) = (daily.map(_._1), daily.map(_._2), daily.map(_._3))
    val (rxy, rxt, ryt) = (r(xs, ys), r(xs, ts), r(ys, ts))
    val row = graft.operators.Relational.partialCorr(spark, sf).collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("r_raw_micro") == math.floor(rxy * 1e6).toLong)
    assert(row.getAs[Long]("r_xt_micro") == math.floor(rxt * 1e6).toLong)
    assert(row.getAs[Long]("r_yt_micro") == math.floor(ryt * 1e6).toLong)
    assert(row.getAs[Long]("r_partial_micro") == math.floor(
      (rxy - rxt * ryt) /
        math.sqrt((1.0 - rxt * rxt) * (1.0 - ryt * ryt)) * 1e6).toLong)
  }

  test("q343 runs test matches a driver-side run-counting recomputation") {
    val daily = dailyCounts
    val n = daily.length
    val sorted = daily.sortBy(x => (x._2, x._1)).map(_._2)
    val med2 = sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1)
    val signs = daily.sortBy(_._1).map(x => if (x._2 * 2 > med2) 1L else 0L)
    val nAbove = signs.sum
    val nRuns = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }.toLong
    val row = graft.operators.Relational.runsTest(spark, sf).collect().head
    assert(row.getAs[Long]("n_days") == n.toLong)
    assert(row.getAs[Long]("n_above") == nAbove)
    assert(row.getAs[Long]("n_below") == n - nAbove)
    assert(row.getAs[Long]("n_runs") == nRuns)
    val (ad, bd, nd) = (nAbove.toDouble, (n - nAbove).toDouble, n.toDouble)
    val er = 2.0 * ad * bd / nd + 1.0
    assert(row.getAs[Long]("expected_runs_micro") ==
      math.floor(er * 1e6).toLong)
    val varR = 2.0 * ad * bd * (2.0 * ad * bd - nd) / (nd * nd * (nd - 1.0))
    assert(math.abs(row.getAs[Double]("z") -
      (nRuns.toDouble - er) / math.sqrt(varR)) < 1e-5)
  }

  test("q344 per-class MCC matches a driver-side confusion recomputation") {
    val scored = graft.operators.TextAnalysis.langId(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val total = scored.length.toLong
    val rows = graft.operators.TextAnalysis.mcc(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      scored.map(_._1).distinct.sorted.toSeq)
    rows.foreach { r =>
      val l = r.getString(0)
      val tp = scored.count(s => s._1 == l && s._2 == l).toLong
      val fp = scored.count(s => s._1 != l && s._2 == l).toLong
      val fn = scored.count(s => s._1 == l && s._2 != l).toLong
      val tn = total - tp - fp - fn
      assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn")) == ((tp, fp, fn, tn)))
      val expect =
        if (tp + fp == 0 || tp + fn == 0 || tn + fp == 0 || tn + fn == 0) 0L
        else math.floor((tp.toDouble * tn.toDouble - fp.toDouble * fn.toDouble) /
          math.sqrt((tp + fp).toDouble * (tp + fn).toDouble *
            (tn + fp).toDouble * (tn + fn).toDouble) * 1e6).toLong
      assert(r.getAs[Long]("mcc_micro") == expect)
      assert(math.abs(r.getAs[Long]("mcc_micro")) <= 1000000L)
    }
  }

  test("q345 Neyman allocation matches a driver-side recomputation and sums to one") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = docs.groupBy(_._1).toSeq.map { case (l, g) =>
      val nh = g.length.toLong
      val s1 = g.map(_._2).sum; val s2 = g.map(x => x._2 * x._2).sum
      val mu = s1.toDouble / nh.toDouble
      val sh = math.floor(math.sqrt(s2.toDouble / nh.toDouble - mu * mu) * 1e6).toLong
      (l, nh, sh, nh * sh)
    }.sortBy(_._1)
    val nt = expect.map(_._2).sum; val wt = expect.map(_._4).sum
    val rows = graft.operators.Sampling.neymanAllocation(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("nh"), r.getAs[Long]("sh_micro"),
        r.getAs[Long]("proportional_ppm"), r.getAs[Long]("neyman_ppm"))).toSeq
    assert(rows == expect.map { case (l, nh, sh, w) =>
      (l, nh, sh, nh * 1000000L / nt, w * 1000000L / wt) })
    // both allocations are (integer-truncated) partitions of unity
    assert(math.abs(rows.map(_._4).sum - 1000000L) < rows.length)
    assert(math.abs(rows.map(_._5).sum - 1000000L) < rows.length)
  }
}
