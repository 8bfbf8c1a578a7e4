package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-11 operators: the deterministic
  * training shuffle manifest (q172), mergeable histogram quantiles
  * (q173), MAD robust outliers (q174) and the length-mass N50 (q175).
  * The DuckDB oracle checks exact values; these pin the structural
  * laws each operator must satisfy on any corpus. */
class Round11OpsSpec extends SparkSuite {

  test("q172 manifest partitions the corpus with contiguous offsets and stable hashes") {
    import graft.operators.Layout.{ShuffleShards, ShuffleWidth}
    val rows = graft.operators.Layout.shuffleManifest(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= ShuffleShards)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "shards must partition the corpus")
    // offsets are the exclusive prefix sums of shard sizes in shard order
    val sorted = rows.sortBy(_.getAs[Long]("shard_id"))
    var acc = 0L
    sorted.foreach { r =>
      assert(r.getAs[Long]("global_offset") == acc)
      acc += r.getAs[Long]("n_docs")
    }
    // hash-range law: every shard's hash span stays inside its slot
    sorted.foreach { r =>
      val s = r.getAs[Long]("shard_id")
      assert(r.getAs[Long]("min_h") >= s * ShuffleWidth)
      assert(r.getAs[Long]("max_h") < (s + 1) * ShuffleWidth)
      assert(r.getAs[Boolean]("hash_unique"))
    }
    // determinism: a second run produces the identical manifest
    val again = graft.operators.Layout.shuffleManifest(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q172 order is seed-dependent but layout-independent") {
    import graft.functions.{HashFunctions => H}
    val docs = graft.sources.Tables.documents(spark, sf)
    // the order key is a pure function of (seed, doc_id): reshuffling the
    // input rows cannot change any manifest entry
    val h1 = docs.select(H.md5Int60(concat(lit("graft-shuffle-42:"),
      col("doc_id").cast("string"))).as("h")).collect().map(_.getLong(0)).sorted
    val h2 = docs.repartition(7).select(H.md5Int60(concat(lit("graft-shuffle-42:"),
      col("doc_id").cast("string"))).as("h")).collect().map(_.getLong(0)).sorted
    assert(h1.sameElements(h2))
    // a different seed is a genuinely different permutation
    val other = docs.select(H.md5Int60(concat(lit("graft-shuffle-43:"),
      col("doc_id").cast("string"))).as("h")).collect().map(_.getLong(0)).sorted
    assert(!h1.sameElements(other))
  }

  test("q173 estimates are within one bin of the exact quantile and bins match") {
    import graft.operators.Sketches.QhBinW
    val rows = graft.operators.Sketches.quantileMerge(spark, sf).collect()
    assert(rows.map(_.getAs[String]("p")).toSet == Set("p50", "p90", "p99"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("bins_match"), "merged hist must equal direct hist")
      assert(r.getAs[Long]("abs_err") <= QhBinW,
        "histogram resolution guarantee: estimate within one bin width")
      val n = r.getAs[Long]("n")
      val t = r.getAs[Long]("target")
      assert(t >= 1 && t <= n)
    }
    // rank targets: p50 ≤ p90 ≤ p99, and so are the exact values
    val byP = rows.map(r => r.getAs[String]("p") -> r).toMap
    assert(byP("p50").getAs[Long]("exact_value") <= byP("p90").getAs[Long]("exact_value"))
    assert(byP("p90").getAs[Long]("exact_value") <= byP("p99").getAs[Long]("exact_value"))
  }

  test("q174 robust stats match a driver-side recomputation per language") {
    val rows = graft.operators.DataQuality.robustOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    val xs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), size(graft.functions.TextFunctions.wsTokens(col("text"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    def med2(v: Vector[Long]): Long = {
      val n = v.length
      v((n + 1) / 2 - 1) + v((n + 2) / 2 - 1)
    }
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val v = xs(lang)
      assert(r.getAs[Long]("n") == v.length)
      val m2 = med2(v)
      assert(r.getAs[Double]("median_tokens") == m2 / 2.0)
      val dev2 = v.map(x => math.abs(2 * x - m2)).sorted
      val mad4 = med2(dev2)
      assert(r.getAs[Double]("mad_tokens") == mad4 / 4.0)
      assert(r.getAs[Long]("n_outliers") == dev2.count(d => 2 * d > 3 * mad4))
      assert(r.getAs[Double]("max_abs_dev") == dev2.last / 2.0)
    }
  }

  test("q174 fence survives a planted monster doc (breakdown robustness)") {
    // a mean/std rule would swallow the outlier into sigma; the MAD rule
    // must still flag a value far from the median even when it is huge
    val rows = graft.operators.DataQuality.robustOutliers(spark, sf).collect()
    rows.foreach { r =>
      val med = r.getAs[Double]("median_tokens")
      val mad = r.getAs[Double]("mad_tokens")
      // the fence itself: any doc more than 3 MADs out counts — sanity
      // check the reported max deviation against the fence
      if (r.getAs[Long]("n_outliers") > 0)
        assert(r.getAs[Double]("max_abs_dev") > 3.0 * mad,
          s"flagged outliers but max dev inside fence (med=$med mad=$mad)")
    }
  }

  test("q175 N50 law: docs at or above n50 carry at least half the mass, and the next cut does not") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = graft.operators.TextAnalysis.lengthN50(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val v = docs(lang)
      val tot = v.sum
      assert(r.getAs[Long]("total_chars") == tot)
      assert(r.getAs[Long]("n_docs") == v.length)
      val n50 = r.getAs[Long]("n50")
      val n90 = r.getAs[Long]("n90")
      assert(n90 <= n50, "the 90%-mass cut can only be lower")
      val massGe = v.filter(_ >= n50).map(_.toLong).sum
      assert(2 * massGe >= tot)
      // minimality: lengths strictly above n50 hold less than half
      val massGt = v.filter(_ > n50).map(_.toLong).sum
      assert(2 * massGt < tot)
      assert(r.getAs[Long]("n_docs_ge_n50") == v.count(_ >= n50))
      assert(r.getAs[Long]("n_docs_ge_n90") == v.count(_ >= n90))
    }
  }

  test("q176 clusters are transitively closed and the golden pick maximizes usage") {
    import graft.operators.Dedup.FuzzyMaxDistance
    val rows = graft.operators.Dedup.goldenRecords(spark, sf).collect()
    assert(rows.nonEmpty)
    val parts = graft.sources.Tables.part(spark, sf)
      .groupBy(col("p_name")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val allMembers = rows.flatMap(_.getAs[String]("members").split('|'))
    assert(allMembers.distinct.length == allMembers.length, "clusters are disjoint")
    rows.foreach { r =>
      val members = r.getAs[String]("members").split('|').toVector
      assert(members.length == r.getAs[Long]("n_names"))
      assert(members.min == r.getAs[String]("cluster_key"))
      assert(members.sorted == members, "member list is sorted")
      // transitive closure: every member links to some other member
      members.foreach { m =>
        assert(members.exists(o => o != m && lev(m, o) <= FuzzyMaxDistance),
          s"$m has no in-cluster match")
      }
      // golden pick: max usage, ties to the lexicographically earlier name
      val golden = r.getAs[String]("golden_name")
      val best = members.map(m => (parts(m), m)).max(
        Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
      assert(golden == best._2)
      assert(r.getAs[Long]("total_parts") == members.map(parts).sum)
    }
    // no cross-cluster edge survives: a member of one cluster is never
    // within distance of a member of another (CC maximality)
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val mi = rows(i).getAs[String]("members").split('|')
      val mj = rows(j).getAs[String]("members").split('|')
      assert(!mi.exists(a => mj.exists(b => lev(a, b) <= FuzzyMaxDistance)),
        "two output clusters are linkable — CC not maximal")
    }
  }

  test("q177 matches an independent exact-integer replication of the algorithm") {
    import graft.operators.Similarity.{PcaIters, PcaQ}
    val rows = graft.operators.Similarity.pcaPower(spark, sf).collect()
    assert(rows.length == graft.operators.Similarity.PcaTopDims)
    // independent replication from the raw table
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    val d = vecs.head.length
    val q = vecs.map(_.map(x => math.floor(x * PcaQ + 0.5).toLong))
    val sj = Array.tabulate(d)(j => q.map(_(j)).sum)
    val m = Array.tabulate(d, d)((j, k) =>
      BigInt(n) * q.map(v => v(j) * v(k)).sum - BigInt(sj(j)) * sj(k))
    var v = Array.fill(d)(BigInt(PcaQ))
    for (_ <- 1 to PcaIters) {
      val w = Array.tabulate(d)(j => (0 until d).map(k => m(j)(k) * v(k)).sum)
      val wmax = w.map(_.abs).max
      v = w.map(wj => wj.signum * (wj.abs * PcaQ / wmax))
    }
    val lead = (0 until d).maxBy(j => (v(j).abs, BigInt(-j)))
    if (v(lead).signum < 0) v = v.map(-_)
    val expTop = (0 until d).map(j => (v(j).abs, j)).sortBy(t => (-t._1, t._2)).take(5)
    rows.zip(expTop).foreach { case (r, (_, j)) =>
      assert(r.getAs[Long]("dim") == j)
      assert(r.getAs[Double]("loading") == v(j).toDouble / PcaQ)
    }
    // structural laws: max-normalized leading loading, PSD eigenvalue,
    // share inside (0, 1]
    assert(math.abs(rows.head.getAs[Double]("loading")) == 1.0)
    assert(rows.head.getAs[Double]("lambda1") >= 0.0)
    val share = rows.head.getAs[Double]("explained_share")
    assert(share > 0.0 && share <= 1.0)
  }

  test("q178 equals the per-batch watermark fold recomputed in the driver") {
    import graft.streaming.EventStream.LateEveryN
    val out = graft.streaming.EventStream.lateDataStreamed(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_events")).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"),
        dayofmonth(col("ts")).as("dd"))
      .collect().map { r =>
        val base = if (r.getAs[Int]("dd") <= 10) 0 else if (r.getAs[Int]("dd") <= 20) 1 else 2
        val b = if (base < 2 && r.getAs[Long]("event_id") % LateEveryN == 0) 2 else base
        (r.getTimestamp(1).getTime, r.getString(2), b)
      }
    val delayMs = 10L * 60 * 1000
    val hourMs = 3600L * 1000
    // wm(k) = max ts through batch k-2, minus delay (measured engine law)
    def wm(k: Int): Long = {
      val prior = ev.filter(_._3 <= k - 2).map(_._1)
      if (prior.isEmpty) Long.MinValue else prior.max - delayMs
    }
    val wmf = ev.map(_._1).max - delayMs
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val expected = ev
      .filter { case (ts, _, b) => (ts / hourMs) * hourMs + hourMs > wm(b) }
      .filter { case (ts, _, _) => (ts / hourMs) * hourMs + hourMs <= wmf }
      .groupBy { case (ts, et, _) => (fmt.format((ts / hourMs) * hourMs), et) }
      .view.mapValues(_.length.toLong).toMap
    assert(out == expected,
      s"streamed result diverges from the watermark fold " +
        s"(only-stream=${(out.keySet -- expected.keySet).take(3)}, " +
        s"only-fold=${(expected.keySet -- out.keySet).take(3)})")
    // the fence is exercised: some late rows dropped, some kept
    val lateRows = ev.filter(_._3 == 2).filter { case (ts, _, _) =>
      // late = arrived in batch 2 with day ≤ 20 event time
      new java.util.Date(ts).toInstant.atZone(java.time.ZoneOffset.UTC).getDayOfMonth <= 20
    }
    val dropped = lateRows.count { case (ts, _, b) => (ts / hourMs) * hourMs + hourMs <= wm(b) }
    assert(lateRows.nonEmpty && dropped > 0 && dropped < lateRows.length,
      s"late fence not exercised on both sides: $dropped of ${lateRows.length}")
  }

  test("q179 neighbor lists are symmetric-consistent, ranked, and support-floored") {
    import graft.operators.Graph.{ItemNeighborsK, MinCoocSupport}
    val rows = graft.operators.Graph.itemNeighbors(spark, sf).collect()
    assert(rows.nonEmpty)
    val byItem = rows.groupBy(_.getAs[Long]("item"))
    byItem.foreach { case (_, rs) =>
      assert(rs.length <= ItemNeighborsK)
      val sorted = rs.sortBy(_.getAs[Long]("neighbor_rank"))
      assert(sorted.map(_.getAs[Long]("neighbor_rank")).toSeq ==
        (1L to sorted.length).toSeq)
      // rank order follows (cosine desc, neighbor asc)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (ca, cb) = (a.getAs[Double]("cosine"), b.getAs[Double]("cosine"))
          assert(ca > cb || (ca == cb &&
            a.getAs[Long]("neighbor") < b.getAs[Long]("neighbor")))
        case _ => ()
      }
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ab") >= MinCoocSupport)
      val c = r.getAs[Double]("cosine")
      assert(c > 0.0 && c <= 1.0)
      assert(r.getAs[Long]("item") != r.getAs[Long]("neighbor"))
    }
    // the pair relation under the lists is symmetric: if b is scored for
    // a, the SAME support underlies (b, a) — spot-check via a reverse map
    val support = rows.map(r => (r.getAs[Long]("item"), r.getAs[Long]("neighbor")) ->
      r.getAs[Long]("n_ab")).toMap
    support.foreach { case ((a, b), s) =>
      support.get((b, a)).foreach(s2 => assert(s2 == s,
        s"asymmetric support for ($a,$b): $s vs $s2"))
    }
  }
}
