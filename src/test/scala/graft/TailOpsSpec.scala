package graft

import java.security.MessageDigest

import graft.operators.{Graph, Indexing, Layout, Pipeline, Relational, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-9 tail operators: phrase search (q96), BPE merge induction
  * (q97), n-gram novelty (q98), split assignment (q99), corpus overlap
  * (q100), event path mining (q101). Each test replays the operator's
  * contract driver-side on the sf0.001 corpus and compares exactly.
  */
class TailOpsSpec extends SparkSuite {

  private lazy val docs: Seq[(Long, String)] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def alphaTokens(t: String): Seq[String] =
    "[a-z]+".r.findAllIn(t.toLowerCase).toSeq

  private def wsShingles(t: String): Set[String] = {
    val w = "[^ \\t\\n\\r]+".r.findAllIn(t).toSeq
    w.sliding(3).filter(_.length == 3).map(_.mkString("_")).toSet
  }

  test("q96 phrase search equals a driver-side adjacency count") {
    val got = Indexing.phraseSearch(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    for (p <- Indexing.PhraseQueries) {
      val Array(a, b) = p.split(" ", 2)
      val perDoc = docs.flatMap { case (id, t) =>
        val w = alphaTokens(t)
        val n = w.sliding(2).count(pr => pr.length == 2 && pr.head == a && pr(1) == b)
        if (n > 0) Some(id -> n.toLong) else None
      }
      val want = perDoc.sortBy { case (id, n) => (-n, id) }
        .take(Indexing.PhraseTopK).zipWithIndex
        .map { case ((id, n), i) => (p, i + 1, id, n) }
      assert(got.filter(_._1 == p).sortBy(_._2).toSeq == want,
        s"phrase '$p' ranking diverges")
    }
  }

  test("q97 BPE merge candidates equal the vocabulary-weighted pair counts") {
    val wordCounts = docs.flatMap(d => alphaTokens(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairFreq = wordCounts.toSeq.filter(_._1.length >= 2)
      .flatMap { case (w, n) => w.sliding(2).map(p => p -> n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = pairFreq.toSeq.sortBy { case (p, f) => (-f, p) }
      .take(TextAnalysis.BpeTopK)
    val got = TextAnalysis.bpeMerges(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    // the top merge really is the most frequent adjacent pair
    assert(got.head._2 == pairFreq.values.max)
  }

  test("q98 novelty: first doc scores 1.0, n_new totals the distinct shingle count") {
    val got = TextAnalysis.ngramNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val shingled = docs.map { case (id, t) => id -> wsShingles(t) }
      .filter(_._2.nonEmpty)
    assert(got.map(_._1).toSeq == shingled.map(_._1).sorted)
    // every shingle's first occurrence is claimed exactly once
    val allDistinct = shingled.flatMap(_._2).toSet
    assert(got.map(_._3).sum == allDistinct.size.toLong)
    // the lowest doc_id with shingles can only contain first occurrences
    val firstDoc = shingled.map(_._1).min
    val firstRow = got.find(_._1 == firstDoc).get
    assert(firstRow._4 == 1.0 && firstRow._2 == firstRow._3)
    // replay the per-doc ratio contract
    val firstOf = shingled.flatMap { case (id, s) => s.map(g => g -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    for ((id, n, nNew, nov) <- got) {
      val s = shingled.find(_._1 == id).get._2
      assert(n == s.size.toLong)
      assert(nNew == s.count(g => firstOf(g) == id).toLong)
      assert(nov == math.floor(nNew.toDouble / n.toDouble * 1e6 + 0.5) / 1e6)
    }
  }

  private def md5PerMille(prefix: String, id: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$prefix$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16) % 1000
  }

  test("q99 split assignment is disjoint, exhaustive, and hash-replayable") {
    val got = Sampling.splitAssign(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val langs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // exhaustive: every doc in exactly one split
    assert(got.map(_._3).sum == langs.length.toLong)
    val want = langs.groupBy { case (id, lang) =>
      val b = md5PerMille("spl_", id)
      val split = if (b < Sampling.TrainPerMille) "train"
        else if (b < Sampling.ValPerMille) "val" else "test"
      (lang, split)
    }.view.mapValues(_.size.toLong).toMap
    assert(got.map(t => (t._1, t._2) -> t._3).toMap == want)
    val perLang = langs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    for ((lang, _, n, share) <- got)
      assert(share == math.floor(n.toDouble / perLang(lang).toDouble * 1e6 + 0.5) / 1e6)
  }

  test("q100 corpus overlap equals the set arithmetic over the doc_id halves") {
    val half = docs.length / 2
    val old = docs.filter(_._1 < half).flatMap(d => wsShingles(d._2)).toSet
    val neu = docs.filter(_._1 >= half).flatMap(d => wsShingles(d._2)).toSet
    val common = (old intersect neu).size.toLong
    val r = Pipeline.corpusOverlap(spark, sf).collect().head
    assert(r.getLong(0) == old.size.toLong && r.getLong(1) == neu.size.toLong)
    assert(r.getLong(2) == common)
    assert(r.getDouble(3) ==
      math.floor(common.toDouble / (old.size + neu.size - common).toDouble * 1e6 + 0.5) / 1e6)
    assert(r.getDouble(4) ==
      math.floor(common.toDouble / neu.size.toDouble * 1e6 + 0.5) / 1e6)
  }

  test("q101 event paths equal a driver-side session walk") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      // split sessions at >30-minute gaps, then take consecutive triples
      val sessions = sorted.foldLeft(Vector.empty[Vector[(Long, Long, Long, String)]]) {
        case (acc, e) =>
          if (acc.isEmpty || e._2 - acc.last.last._2 > 1800000L) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
      }
      sessions.flatMap(s => s.sliding(3).filter(_.length == 3)
        .map(t => t.map(_._4).mkString(">")))
    }
    val want = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(Relational.PathTopK)
    val got = Relational.eventPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("q102 BPE training replays the canonical merge recurrence") {
    def applyMerge(toks: Vector[String], x: String, y: String): Vector[String] =
      toks.foldLeft(Vector.empty[String]) { (acc, t) =>
        if (acc.nonEmpty && acc.last == x && t == y) acc.init :+ (x + y)
        else acc :+ t
      }
    var vocab: Seq[(Vector[String], Long)] = docs.flatMap { case (_, t) => alphaTokens(t) }
      .groupBy(identity).toSeq
      .collect { case (w, g) if w.length >= 2 =>
        (w.map(_.toString).toVector, g.size.toLong)
      }
    val want = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to TextAnalysis.BpeRounds) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, n) <- vocab; i <- 0 until toks.length - 1) {
        val k = (toks(i), toks(i + 1))
        pairs(k) = pairs.getOrElse(k, 0L) + n
      }
      val ((x, y), f) = pairs.toSeq
        .minBy { case ((a, b), n) => (-n, s"$a $b") }(
          Ordering.Tuple2(Ordering.Long, Ordering.String))
      want += ((r, x, y, x + y, f))
      vocab = vocab.map { case (toks, n) => (applyMerge(toks, x, y), n) }
    }
    val got = TextAnalysis.bpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == want.result())
  }

  test("q103 z-order layout replays the curve math; date probe prunes on the curve only") {
    val o = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (ckLo, ckHi) = (o.map(_._1).min, o.map(_._1).max)
    val (dLo, dHi) = (o.map(_._2).min, o.map(_._2).max)
    def morton(cx: Long, cy: Long): Long =
      (0 until 8).map(i => (((cx >> i) & 1L) << (2 * i + 1)) + (((cy >> i) & 1L) << (2 * i))).sum
    val rows = o.flatMap { case (ck, d) =>
      val cx = (ck - ckLo) * Layout.ZCells / (ckHi - ckLo + 1)
      val cy = (d - dLo) * Layout.ZCells / (dHi - dLo + 1)
      Seq(("zorder", morton(cx, cy) * Layout.ZFiles / (Layout.ZCells.toLong * Layout.ZCells), cx, cy),
        ("linear", cx * Layout.ZFiles / Layout.ZCells, cx, cy))
    }
    val want = rows.groupBy(r => (r._1, r._2)).toSeq.map { case ((lay, f), g) =>
      val (cxs, cys) = (g.map(_._3), g.map(_._4))
      (lay, f, g.size.toLong, cxs.min, cxs.max, cys.min, cys.max,
        if (cxs.max >= Layout.ProbeLo && cxs.min <= Layout.ProbeHi) 1 else 0,
        if (cys.max >= Layout.ProbeLo && cys.min <= Layout.ProbeHi) 1 else 0)
    }.sortBy(r => (r._1, r._2))
    val got = Layout.zorderLayout(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getInt(7), r.getInt(8))).toSeq
    assert(got == want)
    // the layout contrast the operator exists to show: every linear file
    // is hit by the date probe; the curve layout skips some
    val lin = got.filter(_._1 == "linear")
    assert(lin.forall(_._9 == 1))
    assert(got.filter(_._1 == "zorder").exists(_._9 == 0))
  }

  test("q104 triangle census equals the driver-side count over the verified pairs") {
    val pairs = graft.operators.Dedup.verifiedPairs(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val eset = pairs.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val deg = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(identity).view.mapValues(_.size.toLong)
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val tris = (for {
      (a, b) <- pairs; c <- nodes
      if b < c && eset((b, c)) && eset((a, c))
    } yield 1).size.toLong
    val r = Graph.dupTriangles(spark, sf).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((nodes.size.toLong, pairs.size.toLong, wedges, tris)))
    val coeff = if (wedges == 0) 0.0 else math.floor(3.0 * tris / wedges * 1e6 + 0.5) / 1e6
    assert(r.getDouble(4) == coeff)
  }

  test("q105 merge upsert classes partition the key set") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), unix_millis(col("ts")), col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val half = ev.length / 2
    val want = ev.groupBy(e => (e._3, e._4)).toSeq.map { case ((_, typ), g) =>
      val hasBase = g.exists(_._1 < half)
      val hasNew = g.exists(_._1 >= half)
      val winner = g.maxBy(e => (e._2, e._1))
      (typ, hasBase, hasNew, winner._1 >= half)
    }.groupBy(_._1).toSeq.map { case (typ, ks) =>
      (typ, ks.size.toLong,
        ks.count(!_._2).toLong,
        ks.count(k => k._2 && k._3 && k._4).toLong,
        ks.count(k => k._2 && k._3 && !k._4).toLong,
        ks.count(!_._3).toLong)
    }.sortBy(_._1)
    val got = Relational.mergeUpsert(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(got.forall(r => r._3 + r._4 + r._5 + r._6 == r._2))
  }

  test("q107 BPE encode fertility equals the driver-side application of the trained merges") {
    // merges from the engine trainer (itself proven equal to the driver
    // recurrence by the q102 test); this test focuses on application
    val merges = TextAnalysis.bpeTrain(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def encode(w: String): Int =
      merges.foldLeft(w.map(_.toString).toVector) { case (toks, (x, y)) =>
        toks.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == x && t == y) acc.init :+ (x + y)
          else acc :+ t
        }
      }.length
    val dl = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = dl.flatMap { case (lang, t) => alphaTokens(t).map(w => (lang, w)) }
      .groupBy(identity).toSeq
      .map { case ((lang, w), g) => (lang, g.size.toLong, w) }
      .groupBy(_._1).toSeq.map { case (lang, ws) =>
        val nWords = ws.map(_._2).sum
        val nChars = ws.map(x => x._2 * x._3.length).sum
        val nToks = ws.map(x => x._2 * encode(x._3)).sum
        (lang, nWords, nChars, nToks,
          math.floor(nToks.toDouble / nWords * 1e6 + 0.5) / 1e6,
          math.floor(nChars.toDouble / nToks * 1e6 + 0.5) / 1e6)
      }.sortBy(_._1)
    val got = TextAnalysis.bpeEncode(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == want)
  }

  test("q108 minhash estimate matches a driver-side signature computation") {
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h28(g: String) = java.lang.Long.parseLong(md5hex(g).take(7), 16)
    def sig(t: String): Array[Long] = {
      val hs = wsShingles(t).map(h28)
      Array.tabulate(128)(i =>
        if (hs.isEmpty) Long.MaxValue
        else hs.map(x => ((2L * i + 1) * x + 101L * i + 7) % 2147483647L).min)
    }
    val textById = docs.toMap
    val nPairs = graft.operators.Dedup.verifiedPairs(spark, sf).count()
    val got = graft.operators.Dedup.minhashError(spark, sf).collect()
    assert(got.length == nPairs)
    for (r <- got) {
      val (sa, sb) = (sig(textById(r.getLong(0))), sig(textById(r.getLong(1))))
      val m = (0 until 128).count(i => sa(i) == sb(i))
      assert(r.getDouble(3) == m / 128.0)
      val err = BigDecimal(math.abs(r.getDouble(2) - m / 128.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == err)
    }
  }

  test("q109 recall equals the driver-side intersection of exact and probed top-k") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = (0L until 10L).map { q =>
      val top = emb.keys.filter(_ != q).toSeq
        .map(j => (j, cos(emb(q), emb(j))))
        .sortBy { case (j, c) => (-c, j) }.take(Similarity.BucketK).map(_._1).toSet
      q -> top
    }.toMap
    val approx = Similarity.annIvfHier(spark, sf)
      .filter(col("query_id") < 10)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.ivfRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.keySet == (0L until 10L).toSet)
    for (q <- 0L until 10L) {
      val m = truth(q).intersect(approx.getOrElse(q, Set.empty)).size.toLong
      assert(got(q) == m, s"query $q")
    }
  }

  test("q110 streamed custom-state user stats equal the batch per-user aggregate") {
    val got = graft.streaming.EventStream.userStatsStreamed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("q111 per-language quality percentile equals the driver-side cume_dist") {
    val scores = TextAnalysis.quality(spark, sf)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val langs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val byLang = langs.groupBy(_._2).view.mapValues(_.keys.toSeq.map(scores))
    val got = graft.operators.Ranking.qualityPercentile(spark, sf).collect()
    assert(got.length == scores.size)
    for (r <- got) {
      val (id, lang, q, pct, keep) =
        (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getInt(4))
      assert(lang == langs(id) && q == scores(id))
      val grp = byLang(lang)
      val want = math.floor(grp.count(_ <= q).toDouble / grp.size * 1e6 + 0.5) / 1e6
      assert(pct == want, s"doc $id")
      assert(keep == (if (pct > graft.operators.Ranking.KeepPctAbove) 1 else 0))
    }
  }

  test("datagen invariant: every document has at least one whitespace token") {
    // q19's per-token ratios divide by the token count; a zero-token doc
    // would score null/NaN, which q111's (lang, score) equi-join DROPS
    // while the DuckDB oracle ranks it NULLS-LAST — a row-count
    // divergence that only materializes if the generator ever ships an
    // empty/whitespace-only text. Pins the invariant at every scale
    // (the embeddings twin of this test lives in SimilaritySpec).
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val bad = graft.sources.Tables.documents(spark, dir)
        .filter(size(graft.functions.TextFunctions.wsTokens(col("text"))) === 0)
        .count()
      assert(bad == 0, s"$dir has $bad token-less documents — " +
        "q111's score join would drop them while the oracle ranks NULLS-LAST")
    }
  }

  test("q112 dup savings equals the driver-side per-cluster arithmetic") {
    val nchars = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val clus = graft.operators.Dedup.dupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = clus.groupBy(_._2).toSeq
      .map { case (cid, ms) =>
        val ids = ms.map(_._1)
        (cid, ids.size.toLong, ids.map(nchars).sum, ids.min,
          ids.map(nchars).sum - nchars(ids.min))
      }
      .filter(_._2 >= 2)
      .sortBy { case (cid, _, _, _, saved) => (-saved, cid) }
      .take(Pipeline.SavingsTopK)
    val got = Pipeline.dupSavings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("q113 streamed interval join equals the batch interval join") {
    val got = graft.streaming.EventStream.clickAttributionStreamed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getString(4))).toSeq
    val ev = graft.sources.Tables.events(spark, sf)
    val want = ev.as("c").filter(col("c.event_type") === "click")
      .join(ev.as("v").filter(col("v.event_type") === "view"),
        col("v.user_id") === col("c.user_id") &&
          col("v.ts") <= col("c.ts") &&
          col("v.ts") >= col("c.ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("c.event_id"), col("c.user_id"),
        date_format(col("c.ts"), "yyyy-MM-dd HH:mm:ss"),
        col("v.event_id"), date_format(col("v.ts"), "yyyy-MM-dd HH:mm:ss"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toSeq.sortBy(r => (r._1, r._4))
    assert(got == want)
  }

  test("q114 confusion matrix totals the q18 predictions and partitions each language") {
    val preds = TextAnalysis.langId(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val want = preds.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((l, p), n) =>
        val nl = preds.count(_._1 == l).toLong
        (l, p, n, math.floor(n.toDouble / nl * 1e6 + 0.5) / 1e6)
      }.sortBy(r => (r._1, r._2))
    val got = TextAnalysis.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    // each labeled language's shares sum to ~1
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    }
  }

  test("q117 retention week-0 cell is the full cohort and offsets are non-negative") {
    val rows = graft.operators.Relational.retention(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, nAct, size, ret) =>
      assert(off >= 0)
      assert(nAct <= size)
      assert(math.abs(ret - math.floor(nAct.toDouble / size * 1e6 + 0.5) / 1e6) < 1e-9)
    }
    // every cohort has a week-0 row where everyone is active by definition
    val cohorts = rows.map(_._1).distinct
    cohorts.foreach { cw =>
      val w0 = rows.filter(r => r._1 == cw && r._2 == 0)
      assert(w0.length == 1 && w0.head._3 == w0.head._4, s"cohort $cw week-0 broken")
    }
    // week-0 actives across cohorts = total distinct users
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.filter(_._2 == 0).map(_._3).sum == users)
  }

  test("q118 bloom probe has no false negatives against the exact overlap") {
    val bloom = graft.operators.Dedup.bloomDecontam(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bloom.nonEmpty)
    bloom.foreach { case (id, nExact, nBloom, nFp) =>
      assert(nBloom >= nExact, s"doc $id: bloom $nBloom < exact $nExact — false negative")
      assert(nFp == nBloom - nExact)
    }
    // every doc the exact decontamination flags is bloom-flagged too
    val exactIds = graft.operators.Dedup.decontaminate(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val bloomIds = bloom.map(_._1).toSet
    assert(exactIds.subsetOf(bloomIds))
  }

  test("q120 z-scores equal the driver-side trailing-window arithmetic") {
    val rows = graft.operators.Relational.anomalyWeeks(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      val counts = sorted.map(_.getLong(2))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val trail = counts.slice(math.max(0, i - graft.operators.Relational.AnomalyTrailW), i)
        val k = trail.length.toDouble
        def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
        if (k < 1) assert(r.isNullAt(3))
        else assert(r.getDouble(3) == r4(trail.sum / k))
        if (k < 2) { assert(r.isNullAt(4)); assert(r.isNullAt(5)); assert(r.isNullAt(6)) }
        else {
          val s = trail.sum.toDouble
          val s2 = trail.map(c => c * c).sum.toDouble
          val std = math.sqrt(math.max((s2 - s * s / k) / (k - 1.0), 0.0))
          assert(r.getDouble(4) == r4(std))
          if (std > 0) {
            val z = (counts(i).toDouble - s / k) / std
            assert(r.getDouble(5) == r4(z))
            assert(r.getBoolean(6) == (math.abs(z) >= graft.operators.Relational.AnomalyZ))
          } else { assert(r.isNullAt(5)); assert(r.isNullAt(6)) }
        }
      }
    }
  }

  test("q106 streamed dedup emits exactly the batch-distinct key set") {
    val got = graft.streaming.EventStream.dedupStreamed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want)
  }
}
