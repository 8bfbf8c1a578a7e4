package graft

import graft.operators._
import java.nio.file.Files

/** Degenerate-corpus robustness: every operator family must return an
  * empty (or singleton) result on empty / single-document inputs, not
  * throw — at 100 TB a partition-pruned read or an over-aggressive
  * filter hands operators exactly these shapes. */
class EdgeCasesSpec extends SparkSuite {

  private def writeCorpus(docs: Seq[(Long, String, String, String, Long)],
                          vecs: Seq[(Long, Array[Float])]): String = {
    import graft.SparkSuite.implicits._
    val dir = Files.createTempDirectory("graft_edge").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vecs.toDF("vec_id", "embedding")
      .withColumn("label", org.apache.spark.sql.functions.lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private lazy val emptyDir = writeCorpus(Seq.empty, Seq.empty)
  private lazy val oneDir = writeCorpus(
    Seq((0L, "the quick brown fox jumps over the lazy dog", "en", "src0", 43L)),
    Seq((0L, Array.fill(64)(0.5f))))

  test("dedup family is empty-safe") {
    assert(Dedup.exactDedup(spark, emptyDir).count() == 0)
    assert(Dedup.minhashPairs(spark, emptyDir).count() == 0)
    assert(Dedup.simhashPairs(spark, emptyDir).count() == 0)
    assert(Dedup.ngramDedup(spark, emptyDir).count() == 0)
    assert(Dedup.dupClusters(spark, emptyDir).count() == 0)
    assert(Dedup.winnowPairs(spark, emptyDir).count() == 0)
  }

  test("similarity family is empty-safe") {
    assert(Similarity.embedNeardup(spark, emptyDir).count() == 0)
    assert(Similarity.annBruteForce(spark, emptyDir).count() == 0)
    assert(Similarity.annLsh(spark, emptyDir).count() == 0)
    assert(Similarity.annIvf(spark, emptyDir).count() == 0)
    assert(Similarity.annIvfHier(spark, emptyDir).count() == 0)
  }

  test("text/curation ops are empty-safe") {
    assert(TextAnalysis.langId(spark, emptyDir).count() == 0)
    assert(TextAnalysis.quality(spark, emptyDir).count() == 0)
    assert(TextAnalysis.tfidf(spark, emptyDir).count() == 0)
    assert(TextAnalysis.fingerprint(spark, emptyDir).count() == 0)
    assert(TextAnalysis.langStats(spark, emptyDir).count() == 0)
    assert(TextAnalysis.pmi(spark, emptyDir).count() == 0)
    assert(Sampling.stratifiedSample(spark, emptyDir).count() == 0)
    assert(Pipeline.curate(spark, emptyDir).count() == 0)
    assert(Pipeline.clusterReps(spark, emptyDir).count() == 0)
    assert(Pipeline.curationChain(spark, emptyDir).count() == 0)
    assert(Dedup.decontaminate(spark, emptyDir).count() == 0)
    assert(Packing.shardPack(spark, emptyDir).count() == 0)
    assert(TextAnalysis.repetition(spark, emptyDir).count() == 0)
  }

  test("round-5 operators are empty-safe") {
    import graft.SparkSuite.implicits._
    assert(Dedup.passageDedup(spark, emptyDir).count() == 0)
    assert(Sampling.langBalance(spark, emptyDir).count() == 0)
    assert(Ranking.lengthDeciles(spark, emptyDir).count() == 0)
    assert(Similarity.annHnsw(spark, emptyDir).count() == 0)
    assert(Dedup.incrementalDedup(spark, emptyDir).count() == 0)
    assert(TextAnalysis.charLangId(spark, emptyDir).count() == 0)
    assert(Similarity.embedOutliers(spark, emptyDir).count() == 0)
    assert(Relational.funnelFrom(
      Seq.empty[(Long, String, java.sql.Timestamp)]
        .toDF("user_id", "event_type", "ts")).count() == 0)
  }

  test("round-5 operators on a single-document corpus") {
    val pd = Dedup.passageDedup(spark, oneDir).collect()
    assert(pd.length == 1 && pd.head.getLong(2) == 1L) // its one block survives
    val lb = Sampling.langBalance(spark, oneDir).collect()
    assert(lb.length == 1) // the only language is the smallest: fully kept
    val ld = Ranking.lengthDeciles(spark, oneDir).collect()
    assert(ld.length == 1 && ld.head.getLong(2) == 1L && ld.head.getLong(3) == 0L)
    assert(Similarity.annHnsw(spark, oneDir).count() == 0) // no non-self node
    val inc = Dedup.incrementalDedup(spark, oneDir).collect()
    assert(inc.length == 1 && inc.head.getString(1) == "new") // empty corpus side
    val cl = TextAnalysis.charLangId(spark, oneDir).collect()
    assert(cl.length == 1 && cl.head.getString(2) == "en") // own profile wins
    val eo = Similarity.embedOutliers(spark, oneDir).collect()
    assert(eo.length == 1 && !eo.head.getBoolean(3)) // cos(v, v) = 1
  }

  test("round-7 operators are empty-safe") {
    assert(Sampling.domainCap(spark, emptyDir).count() == 0)
    assert(Sampling.tempMix(spark, emptyDir).count() == 0)
    assert(TextAnalysis.vocabOov(spark, emptyDir).count() == 0)
    assert(Indexing.invertedIndex(spark, emptyDir).count() == 0)
    assert(Similarity.annPq(spark, emptyDir).count() == 0)
    assert(Similarity.semDedup(spark, emptyDir).count() == 0)
    assert(Indexing.bm25(spark, emptyDir).count() == 0)
    assert(Graph.pageRank(spark, emptyDir).count() == 0)
    assert(TextAnalysis.lmScore(spark, emptyDir).count() == 0)
    assert(Pipeline.dedupReport(spark, emptyDir).count() == 0)
    assert(Similarity.annIvfPq(spark, emptyDir).count() == 0)
  }

  test("round-7 operators on a single-document corpus") {
    val dc = Sampling.domainCap(spark, oneDir).collect()
    assert(dc.length == 1 && dc.head.getLong(2) == 1L) // rank 1 of its source
    val tm = Sampling.tempMix(spark, oneDir).collect()
    assert(tm.length == 1 && tm.head.getLong(3) == Sampling.MixScale) // min lang: keep all
    val vo = TextAnalysis.vocabOov(spark, oneDir).collect()
    assert(vo.length == 1 && vo.head.getLong(2) == 0L) // 8 distinct words, all in vocab
    val ii = Indexing.invertedIndex(spark, oneDir).collect()
    assert(ii.length == 8 && ii.forall(_.getLong(2) == 1L)) // 8 terms ("the" tf=2), seg_df 1
    assert(Similarity.annPq(spark, oneDir).count() == 0)   // no non-self neighbor
    val sd = Similarity.semDedup(spark, oneDir).collect()
    assert(sd.length == 1 && !sd.head.getBoolean(2))       // alone in its cell
  }

  test("single-document corpus: no pairs, self cluster, own fingerprints") {
    assert(Dedup.minhashPairs(spark, oneDir).count() == 0)
    val clusters = Dedup.dupClusters(spark, oneDir).collect()
    assert(clusters.length == 1 && clusters.head.getLong(1) == 0L)
    val reps = Pipeline.clusterReps(spark, oneDir).collect()
    assert(reps.length == 1 && reps.head.getLong(1) == 0L && reps.head.getLong(3) == 1L)
    assert(Similarity.annLsh(spark, oneDir).count() == 0) // no partner in bucket
    assert(TextAnalysis.fingerprint(spark, oneDir).count() == 1)
  }
}
