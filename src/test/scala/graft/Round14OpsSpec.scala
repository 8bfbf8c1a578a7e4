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

  test("q262 spearman matches a driver-side tie-correct recompute") {
    val rho = graft.operators.DataQuality.spearman(spark, sf)
      .collect().head.getAs[Double]("spearman")
    // independent reference: collect the scored frame, average ranks
    val scored = graft.operators.TextAnalysis.quality(spark, sf)
      .select(col("doc_id"), col("quality_score"))
      .join(graft.sources.Tables.documents(spark, sf)
        .select(col("doc_id"), col("n_chars")), "doc_id")
      .filter(col("n_chars") > 0)
      .collect().map(r => (r.getAs[Long]("n_chars").toDouble,
        r.getAs[Double]("quality_score")))
    def avgRanks(xs: Array[Double]): Array[Double] = {
      val sorted = xs.zipWithIndex.sortBy(_._1)
      val ranks = new Array[Double](xs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
        val avg = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
        (i until j).foreach(k => ranks(sorted(k)._2) = avg)
        i = j
      }
      ranks
    }
    val rx = avgRanks(scored.map(_._1)); val ry = avgRanks(scored.map(_._2))
    val n = rx.length
    val mx = rx.sum / n; val my = ry.sum / n
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum)
    val sy = math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    val expected = cov / (sx * sy)
    assert(math.abs(rho - expected) < 1e-5, s"$rho vs $expected")
  }

  test("q263 calibration bins partition the corpus") {
    val rows = graft.operators.DataQuality.calibration(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("score_bin") >= 0L &&
        r.getAs[Long]("score_bin") <=
          graft.operators.DataQuality.CalibrationCapScore)
      assert(r.getAs[Long]("accuracy_ppm") >= 0L &&
        r.getAs[Long]("accuracy_ppm") <= 1000000L)
    }
  }

  test("q264 decile buckets partition customers and revenue is conserved") {
    val rows = graft.operators.Relational.decileLift(spark, sf).collect()
    val nCust = graft.sources.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_cust")).sum == nCust)
    val totB = graft.sources.Tables.orders(spark, sf)
      .agg(sum(floor(col("o_totalprice") * 100).cast("long"))).collect()
      .head.getLong(0)
    assert(rows.map(_.getAs[Long]("cents_a")).sum
      + rows.map(_.getAs[Long]("cents_b")).sum == totB,
      "first+second period cents must cover all orders")
    // deciles come out of [0,9] and a higher-spend bucket never has a
    // LOWER first-period total per customer than the bucket below it
    val byD = rows.sortBy(_.getAs[Long]("decile"))
    assert(byD.map(_.getAs[Long]("decile")).forall(d => d >= 0 && d <= 9))
  }

  test("q265 sole-late suppliers verified against an exists/not-exists recompute") {
    import graft.operators.Relational.WaitingLateDays
    val out = graft.operators.Relational.waitingSuppliers(spark, sf).collect()
    // independent reference over collected rows (sf0.001 is small)
    val li = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > WaitingLateDays)
          .as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val bySupp = li.groupBy(t => (t._1, t._2))
      .map { case ((o, s), xs) => (o, s, xs.exists(_._3)) }.toSeq
    val counts = bySupp.groupBy(_._1).flatMap { case (_, pairs) =>
      val lateSupps = pairs.filter(_._3).map(_._2).toSet
      if (pairs.map(_._2).toSet.size >= 2 && lateSupps.size == 1)
        lateSupps.headOption
      else None
    }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    out.foreach { r =>
      assert(counts(r.getAs[Long]("s_suppkey")) == r.getAs[Long]("numwait"))
    }
    // top-20 really is the top of the reference counts
    if (out.nonEmpty && counts.size > out.length) {
      val minTop = out.map(_.getAs[Long]("numwait")).min
      val outSet = out.map(_.getAs[Long]("s_suppkey")).toSet
      counts.filter { case (s, c) => !outSet(s) }
        .foreach { case (_, c) => assert(c <= minTop) }
    }
  }

  test("q266 conformance census partitions users") {
    val rows = graft.operators.Relational.sequenceConformance(spark, sf)
      .collect()
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    val pats = rows.map(_.getAs[String]("pattern")).toSet
    assert(pats.subsetOf(Set("conforming", "click_before_view",
      "purchase_before_click", "both_violations")))
  }

  test("q267 peak concurrency matches a driver-side sweep over sessions") {
    val row = graft.streaming.EventStream.maxConcurrency(spark, sf)
      .collect().head
    // independent sweep over the collected session table
    val sessions = graft.streaming.EventStream.sessionBounds(spark, sf)
      .select(unix_micros(col("s_start")), unix_micros(col("s_end")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(row.getAs[Long]("n_sessions") == sessions.length)
    val deltas = sessions.flatMap { case (a, b) =>
      Seq((a, 1L), (b + 1L, -1L)) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    var acc = 0L; var best = 0L; var at = 0L
    deltas.foreach { case (t, d) =>
      acc += d
      if (acc > best) { best = acc; at = t }
    }
    assert(row.getAs[Long]("max_concurrency") == best)
    assert(row.getAs[Long]("at_us") == at)
    assert(row.getAs[Long]("n_boundary_ts") == deltas.length)
  }

  test("q268 bootstrap CI brackets the point estimate and thresholds are sane") {
    import graft.operators.DataQuality.PoissonCdf28
    // the dyadic Poisson(1) thresholds are increasing and end near 2^28
    assert(PoissonCdf28 == PoissonCdf28.sorted && PoissonCdf28.size == 5)
    assert(PoissonCdf28.last > (268435456L * 99) / 100,
      "P(X<=4) ~ 0.996 of the 2^28 grid")
    assert(math.abs(PoissonCdf28.head - (268435456L * 368) / 1000)
      < 268435456L / 100, "P(0) ~ e^-1")
    val rows = graft.operators.DataQuality.bootstrapCi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("ci_lo_micros") <= r.getAs[Double]("ci_hi_micros"))
      // coverage of the point estimate is expected (not guaranteed);
      // assert the flag is CONSISTENT with the bounds rather than true
      val covered = r.getAs[Boolean]("covered")
      val m = r.getAs[Long]("mean_micros").toDouble
      assert(covered == (r.getAs[Double]("ci_lo_micros") <= m
        && m <= r.getAs[Double]("ci_hi_micros")))
    }
  }

  test("q269 hits authorities match a driver-side power iteration") {
    val out = graft.operators.Graph.hits(spark, sf).collect()
    assert(out.length <= graft.operators.Graph.HitsTopK && out.nonEmpty)
    // independent integer recompute over collected edges
    val edges = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var hub = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    // fused-round arithmetic: auth stays UNNORMALIZED inside a round
    // (normalization is a scalar multiple — only the rounding points
    // move), hub renormalizes once per full round
    for (_ <- 1 to graft.operators.Graph.HitsIterations) {
      val auth = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hub(e._1)).sum }
      val hr = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auth(e._2)).sum }
      val hm = hr.values.max
      hub = hr.map { case (c, v) => c -> v * 1000000L / hm }
    }
    val arf = edges.groupBy(_._2).map { case (p, es) =>
      p -> es.map(e => hub(e._1)).sum }
    val amf = arf.values.max
    val authF = arf.map { case (p, v) => p -> v * 1000000L / amf }
    out.foreach { r =>
      assert(authF(r.getAs[Long]("p_partkey"))
        == r.getAs[Long]("authority_ppm"))
    }
    // top-1 really attains the global max
    assert(out.head.getAs[Long]("authority_ppm") == 1000000L)
  }

  test("q270 LPA matches a driver-side synchronous propagation") {
    val out = graft.operators.Graph.labelPropagation(spark, sf).collect()
    assert(out.nonEmpty)
    // recompute over the same capped pair substrate
    val pairs = graft.operators.Graph.basketArtifact(spark, sf)
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items)), y -> " +
          "struct(least(x, y) AS a, greatest(x, y) AS b))))")).as("p"))
      .groupBy("p.a", "p.b").agg(count(lit(1)).as("w"))
      .filter(col("w") >= graft.operators.Graph.MinCoocSupport)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = pairs.flatMap(p => Seq((p._1, p._2, p._3), (p._2, p._1, p._3)))
    var lbl = edges.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to graft.operators.Graph.LpaIterations) {
      lbl = edges.groupBy(_._2).map { case (dst, es) =>
        val votes = es.groupBy(e => lbl(e._1))
          .map { case (l, xs) => l -> xs.map(_._3).sum }
        dst -> votes.toSeq.minBy { case (l, w) => (-w, l) }._1
      }
    }
    val census = lbl.values.groupBy(identity)
      .map { case (c, xs) => c -> xs.size.toLong }
    out.foreach { r =>
      assert(census(r.getAs[Long]("community")) == r.getAs[Long]("n_nodes"))
    }
  }

  test("q271 substring search recalls every self-match and reports true occurrence counts") {
    import graft.operators.Indexing._
    val rows = graft.operators.Indexing.substringIndex(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val queries = docs.filter { case (id, t) =>
      id % SubstrQueryMod == 0 && t.length >= 30 }
      .map { case (id, t) =>
        id -> t.substring(SubstrNeedleStart - 1,
          SubstrNeedleStart - 1 + SubstrNeedleLen) }
    assert(queries.nonEmpty)
    // every query matches its own doc (self-recall) ...
    queries.keys.foreach { q =>
      assert(rows.exists(r => r.getAs[Long]("query_id") == q
        && r.getAs[Long]("doc_id") == q), s"query $q misses itself")
    }
    // ... and every reported count equals a literal substring count
    def countOcc(hay: String, needle: String): Long = {
      var i = hay.indexOf(needle); var n = 0L
      while (i >= 0) { n += 1; i = hay.indexOf(needle, i + 1) }
      n
    }
    rows.foreach { r =>
      val expect = countOcc(docs(r.getAs[Long]("doc_id")),
        queries(r.getAs[Long]("query_id")))
      assert(r.getAs[Long]("n_occurrences") == expect)
    }
    // completeness: no (query, doc) pair with a match is missing
    val present = rows.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))).toSet
    for ((q, needle) <- queries; (d, t) <- docs if countOcc(t, needle) > 0)
      assert(present((q, d)), s"missing match ($q, $d)")
  }

  test("q272 char entropy is bounded by ln(alphabet) and nonnegative") {
    val rows = graft.operators.TextAnalysis.charEntropy(spark, sf).collect()
    val nAlpha = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), "")).as("ch"))
      .distinct().count()
    val cap = (math.log(nAlpha.toDouble) * 1e9).toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("min_entropy_nano") >= 0L)
      assert(r.getAs[Long]("max_entropy_nano") <= cap)
      assert(r.getAs[Long]("min_entropy_nano")
        <= r.getAs[Long]("mean_entropy_nano"))
      assert(r.getAs[Long]("mean_entropy_nano")
        <= r.getAs[Long]("max_entropy_nano"))
    }
  }

  test("q273 burrows delta is a symmetric-complete pair table with self-consistent zeros") {
    val rows = graft.operators.TextAnalysis.burrowsDelta(spark, sf).collect()
    val sources = graft.sources.Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    assert(rows.length == sources * (sources - 1) / 2,
      "one row per unordered source pair")
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      assert(r.getAs[Long]("delta_nano") >= 0L)
      assert(r.getAs[Long]("n_words") > 0L)
    }
    // every pair scores the same word count (the shared marker vocab)
    assert(rows.map(_.getAs[Long]("n_words")).toSet.size == 1)
  }

  test("q274 per-lang slopes pool consistently and flags match the sign product") {
    val rows = graft.operators.DataQuality.simpson(spark, sf).collect()
    assert(rows.nonEmpty)
    val pooled = rows.map(_.getAs[Double]("pooled_slope")).distinct
    assert(pooled.length == 1, "one pooled slope broadcast to every row")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sign_reversed") ==
        (r.getAs[Double]("lang_slope") * r.getAs[Double]("pooled_slope") < 0.0))
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("q275 full-outer stream join accounts for every click and view exactly once") {
    val rows = graft.streaming.EventStream
      .clickAttributionFullOuterStreamed(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type")).collect()
    val clicks = ev.filter(_.getString(3) == "click")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val views = ev.filter(_.getString(3) == "view")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wm = math.min(clicks.map(_._2).max, views.map(_._2).max) - 600000000L
    // matched pairs equal the batch interval join
    val expectMatched = (for {
      c <- clicks; v <- views
      if v._3 == c._3 && v._2 <= c._2 && v._2 >= c._2 - 1800000000L
    } yield (c._1, v._1)).toSet
    val gotMatched = rows.filter(r => r.getAs[Long]("click_id") >= 0
        && r.getAs[Long]("view_id") >= 0)
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id"))).toSet
    assert(gotMatched == expectMatched)
    // organic clicks are exactly the unmatched ones behind the fence
    val matchedClicks = expectMatched.map(_._1)
    val organicClicks = rows.filter(r => r.getAs[Long]("view_id") == -1L)
      .map(_.getAs[Long]("click_id")).toSet
    assert(organicClicks == clicks.filter(c =>
      !matchedClicks(c._1) && c._2 < wm).map(_._1).toSet)
    // organic views trail by the join window
    val matchedViews = expectMatched.map(_._2)
    val organicViews = rows.filter(r => r.getAs[Long]("click_id") == -1L)
      .map(_.getAs[Long]("view_id")).toSet
    assert(organicViews == views.filter(v =>
      !matchedViews(v._1) && v._2 < wm - 1800000000L).map(_._1).toSet)
    // no duplicates anywhere
    assert(rows.map(r => (r.getAs[Long]("click_id"),
      r.getAs[Long]("view_id"))).distinct.length == rows.length)
  }

  test("q276 split-leakage pair counts conserve both dup families") {
    val rows = graft.operators.Dedup.splitLeakage(spark, sf).collect()
    assert(rows.length == 6)
    val nNear = graft.operators.Dedup.verifiedPairs(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_near_pairs")).sum == nNear,
      "every verified near-dup pair lands in exactly one split class")
    val nExact = graft.sources.Tables.documents(spark, sf)
      .groupBy(md5(col("text"))).agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_exact_pairs")).sum == nExact,
      "exact-dup pair combinatorics conserve C(n,2) per hash group")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("crosses_split") ==
        (r.getAs[String]("split_a") != r.getAs[String]("split_b")))
    }
  }

  test("q277 kappa matches a driver-side recompute and sits in [-1, 1]") {
    val row = graft.operators.DataQuality.cohenKappa(spark, sf).collect().head
    val a = graft.operators.TextAnalysis.langId(spark, sf)
      .select(col("doc_id"), col("predicted_lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.operators.TextAnalysis.charLangId(spark, sf)
      .select(col("doc_id"), col("predicted_lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val common = a.keySet.intersect(b.keySet).toSeq
    val n = common.size.toLong
    assert(row.getAs[Long]("n") == n)
    val agree = common.count(d => a(d) == b(d)).toLong
    assert(row.getAs[Long]("n_agree") == agree)
    val ca = common.groupBy(a).view.mapValues(_.size.toLong).toMap
    val cb = common.groupBy(b).view.mapValues(_.size.toLong).toMap
    val peNum = ca.map { case (l, x) => x * cb.getOrElse(l, 0L) }.sum
    assert(row.getAs[Long]("po_nano") == agree * 1000000000L / n)
    assert(row.getAs[Long]("pe_nano") == peNum * 1000000000L / (n * n))
    val k = row.getAs[Long]("kappa_nano")
    assert(k >= -1000000000L && k <= 1000000000L)
  }

  test("q278 join estimates are exact for clean FK joins") {
    val rows = graft.operators.DataQuality.joinEstimateAudit(spark, sf)
      .collect()
    assert(rows.length == graft.operators.DataQuality.EstimateJoins.length)
    rows.foreach { r =>
      // on a clean FK (child ndv <= parent ndv = parent rows), the
      // uniform-independence estimate is EXACT when every child key
      // exists in the parent: est = n_child * n_parent / n_parent
      assert(r.getAs[Long]("est_rows") > 0L)
      assert(r.getAs[Long]("actual_rows") > 0L)
      assert(r.getAs[Long]("err_ppm") >= 0L)
    }
    // the TPC-H FK joins are clean: actual == n_left for each
    rows.foreach { r =>
      assert(r.getAs[Long]("actual_rows") == r.getAs[Long]("n_left"),
        s"${r.getAs[String]("join_tag")}: FK join should preserve child rows")
    }
  }

  test("q279 ROC censuses are monotone in the threshold and partition the sample") {
    val rows = graft.operators.Dedup.minhashRoc(spark, sf)
      .collect().sortBy(_.getAs[Int]("m_min"))
    assert(rows.length == graft.operators.Dedup.RocThresholds.length)
    val totals = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp")
      + r.getAs[Long]("fn") + r.getAs[Long]("tn")).distinct
    assert(totals.length == 1, "every threshold sees the same pair sample")
    // raising the threshold can only shrink the positive set
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi.getAs[Long]("tp") + hi.getAs[Long]("fp")
          <= lo.getAs[Long]("tp") + lo.getAs[Long]("fp"))
      case _ =>
    }
    // truth marginals constant across thresholds
    assert(rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn"))
      .distinct.length == 1)
  }

  test("q280 mutual information obeys its information-theoretic bounds") {
    val r = graft.operators.DataQuality.mutualInfo(spark, sf).collect().head
    val mi = r.getAs[Long]("mi_nano")
    val hl = r.getAs[Long]("h_lang_nano")
    val hs = r.getAs[Long]("h_source_nano")
    // 0 <= MI <= min(H(L), H(S)) up to nano-floor slack
    assert(mi >= -r.getAs[Long]("n_cells_nonzero"),
      "MI can only dip below 0 by per-term floor slack")
    assert(mi <= math.min(hl, hs) + r.getAs[Long]("n_cells_nonzero"))
    assert(hl > 0L && hs > 0L)
    val nmi = r.getAs[Long]("nmi_nano")
    assert(nmi >= -1000000L && nmi <= 1000000000L)
  }

  test("q281 cluster NMI stays within bounds and reads the memoized cells") {
    val r = graft.operators.Similarity.clusterNmi(spark, sf).collect().head
    val nVecs = graft.sources.Tables.embeddings(spark, sf).count()
    // grid marginals cover every assigned vector
    assert(r.getAs[Long]("n_cells_labels") > 0L)
    val nmi = r.getAs[Long]("nmi_nano")
    assert(nmi >= -1000000L && nmi <= 1000000000L)
    assert(r.getAs[Long]("h_cells_nano") > 0L)
    assert(r.getAs[Long]("h_labels_nano") > 0L)
    // labels are random wrt cells on this corpus: NMI should be small
    assert(nmi < 500000000L, s"suspiciously high NMI $nmi on random labels")
    assert(nVecs > 0L)
  }

  test("q282 median CI brackets the median with the claimed ranks") {
    val rows = graft.operators.Relational.medianCi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("median"))
      assert(r.getAs[Double]("median") <= r.getAs[Double]("ci_hi"))
      assert(r.getAs[Long]("lo_rank") >= 1L)
      assert(r.getAs[Long]("hi_rank") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("lo_rank") < r.getAs[Long]("hi_rank"))
    }
    // spot-check one type against a full driver-side sort
    val t = rows.head.getAs[String]("event_type")
    val vals = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === t).select("value")
      .collect().map(_.getDouble(0)).sorted
    val r = rows.head
    assert(r.getAs[Double]("ci_lo")
      == BigDecimal(vals(r.getAs[Long]("lo_rank").toInt - 1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("ci_hi")
      == BigDecimal(vals(r.getAs[Long]("hi_rank").toInt - 1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q283 SPRT trajectory is cumulative-consistent and decisions match the boundary") {
    import graft.operators.Relational.SprtBoundNano
    val rows = graft.operators.Relational.sprt(spark, sf)
      .collect().sortBy(_.getAs[Long]("day"))
    assert(rows.length > 5, "a real multi-day trajectory")
    // n_b and x_b are nondecreasing and x <= n
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_b") >= a.getAs[Long]("n_b"))
        assert(b.getAs[Long]("x_b") >= a.getAs[Long]("x_b"))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("x_b") <= r.getAs[Long]("n_b"))
      val llr = r.getAs[Long]("llr_nano")
      val expected =
        if (llr >= SprtBoundNano) "accept_h1"
        else if (llr <= -SprtBoundNano) "accept_h0"
        else "continue"
      assert(r.getAs[String]("decision") == expected)
    }
  }

  test("q284 ACF is 1 at lag 0 by construction and bounded at graded lags") {
    val rows = graft.operators.Relational.autocorrelation(spark, sf).collect()
    assert(rows.length == graft.operators.Relational.AcfMaxLag)
    rows.foreach { r =>
      val acf = r.getAs[Long]("acf_ppm")
      // |ACF| <= 1 up to floor slack on the pair-truncated estimator
      assert(acf >= -1100000L && acf <= 1100000L, s"acf out of range: $acf")
      assert(r.getAs[Long]("n_pairs") > 0L)
    }
    // fewer pairs at longer lags
    val byK = rows.sortBy(_.getAs[Long]("k"))
    byK.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_pairs") <= a.getAs[Long]("n_pairs"))
      case _ =>
    }
  }

  test("q285 ABTT removes nearly all common-direction energy") {
    val r = graft.operators.Similarity.abtt(spark, sf).collect().head
    assert(r.getAs[Long]("n_vecs") > 0L)
    assert(r.getAs[Double]("norm2_before") > 0.0,
      "synthetic embeddings have a nonzero mean vector")
    // after subtracting mu and the top PC, the residual mean vector
    // collapses (rounding leaves crumbs, so assert a big reduction)
    assert(r.getAs[Double]("norm2_after") < r.getAs[Double]("norm2_before"))
    assert(r.getAs[Long]("reduction_ppm") > 900000L,
      s"expected >90% reduction, got ${r.getAs[Long]("reduction_ppm")} ppm")
    assert(r.getAs[Double]("mean_abs_proj") >= 0.0)
  }

  test("q286 boilerplate support counts are true distinct-doc counts") {
    val rows = graft.operators.TextAnalysis.boilerplate(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val w = t.split("[ \t\n\r]+").filter(_.nonEmpty)
      w.sliding(5).filter(_.length == 5).map(_.mkString("_")).toSet
    }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val sh = r.getAs[String]("shingle")
      val support = docs.count { case (s, _, t) =>
        s == src && shingles(t).contains(sh) }
      assert(support.toLong == r.getAs[Long]("n_docs"),
        s"support mismatch for '$sh' in $src")
      assert(support >= 2)
    }
    // ranks are 1..k per source without gaps
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted
        .sameElements(1L to rs.length))
    }
  }

  test("q287 trimmed mean sits between min and max and drops the tails") {
    val rows = graft.operators.Relational.trimmedMean(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val kept = r.getAs[Long]("n_kept")
      val cut = n * graft.operators.Relational.TrimPerMille / 1000
      assert(kept == n - 2 * cut, s"kept $kept of $n with $cut per tail")
    }
    // spot-check one type against a literal driver-side trim
    val t = rows.head.getAs[String]("event_type")
    val vals = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === t).select("value")
      .collect().map(v => math.floor(v.getDouble(0) * 1e6).toLong).sorted
    val cut = (vals.length * graft.operators.Relational.TrimPerMille / 1000).toInt
    val interior = vals.slice(cut, vals.length - cut)
    assert(rows.head.getAs[Long]("trimmed_mean_micros")
      == interior.sum / interior.length)
  }

  test("q288 absorption probabilities are monotone in k and bounded") {
    val rows = graft.operators.Relational.absorption(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("src")).foreach { case (src, rs) =>
      val byK = rs.sortBy(_.getAs[Long]("k")).map(_.getAs[Long]("p_ppm"))
      // more steps can only ADD absorption mass (floor slack aside)
      byK.sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 3, s"$src: $a -> $b")
        case _ =>
      }
      byK.foreach(p => assert(p >= 0L && p <= 1000000L))
    }
  }

  test("q289 RBO is bounded, identical lists score ~1, weights sum to the truncated mass") {
    import graft.operators.Indexing.{RboDepth, RboWeightsNano}
    val rows = graft.operators.Indexing.rbo(spark, sf).collect()
    assert(rows.nonEmpty)
    // max attainable rbo_nano at full overlap = sum of floor(i * w_i)
    val maxNano = RboWeightsNano.zipWithIndex
      .map { case (w, i) => math.floor((i + 1) * w).toLong }.sum
    rows.foreach { r =>
      val v = r.getAs[Long]("rbo_nano")
      assert(v >= 0L && v <= maxNano, s"rbo $v outside [0, $maxNano]")
      assert(r.getAs[Long]("overlap_at_10") >= 0L)
      assert(r.getAs[Long]("overlap_at_10") <= RboDepth)
    }
    // the truncated weight mass is 1 - p^d (times depth-weighted tail):
    // just sanity the weights are positive decreasing
    assert(RboWeightsNano.sliding(2).forall { case Seq(a, b) => b < a })
  }

  test("q290 permutation p-value is conservative-valid and extreme count consistent") {
    import graft.operators.DataQuality.PermReps
    val r = graft.operators.DataQuality.permutationTest(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_a") > 0L && r.getAs[Long]("n_b") > 0L)
    val ne = r.getAs[Long]("n_extreme")
    assert(ne >= 0L && ne <= PermReps)
    assert(r.getAs[Long]("p_ppm")
      == (ne + 1) * 1000000L / (PermReps + 1))
    // identical-distribution sources: p should not be degenerate-small
    assert(r.getAs[Long]("p_ppm") >= 1000000L / (PermReps + 1))
  }

  test("q291 footprint matches actual row counts and positive sizes") {
    val rows = graft.operators.Layout.parquetFootprint(spark, sf).collect()
    assert(rows.length == graft.operators.Layout.FootprintTables.length)
    rows.foreach { r =>
      val t = r.getAs[String]("table_name")
      val actual = graft.sources.Tables.table(spark, sf, t).count()
      assert(r.getAs[Long]("n_rows") == actual,
        s"$t footer rows ${r.getAs[Long]("n_rows")} != scan count $actual")
      assert(r.getAs[Long]("n_files") >= 1L)
      assert(r.getAs[Long]("n_row_groups") >= r.getAs[Long]("n_files"))
      assert(r.getAs[Long]("compressed_bytes") > 0L)
    }
  }

  test("q292 tail attribution shares partition the tail and sum to ~1e6") {
    val rows = graft.operators.Relational.tailAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val nTail = rows.map(_.getAs[Long]("n_tail")).sum
    // tail size ~ 1% of events (strict > on the interpolated p99)
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    assert(nTail <= nEvents / 50 && nTail > 0, s"tail $nTail of $nEvents")
    val shares = rows.map(_.getAs[Long]("tail_share_ppm")).sum
    assert(shares > 999000L && shares <= 1000000L)
    val eshares = rows.map(_.getAs[Long]("excess_share_ppm")).sum
    assert(eshares > 999000L && eshares <= 1000000L)
    rows.foreach(r => assert(r.getAs[Long]("excess_micros") > 0L))
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
