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
}
