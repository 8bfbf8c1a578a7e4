package graft.tools

import graft.GraftSession
import graft.operators._

/** Ad-hoc stage profiler: times each sub-stage of the heavy pipelines so
  * optimization targets measurements, not guesses. */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(s"local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t("warmup count") { graft.sources.Tables.documents(spark, sfDir).count() }
    val sigs = Dedup.minhashSignaturesArr(spark, sfDir)
    t("minhash signatures") { sigs.count() }
    t("minhash signatures 2nd") { sigs.count() }
    // A/B: the native TypedImperativeAggregate (one Array[Long] buffer)
    // vs the 128 codegen'd min columns
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.{HashFunctions => H, TextFunctions => T}
      val exploded = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), T.wsTokens(col("text")).as("w"))
        .select(col("doc_id"), explode_outer(T.shingleSet(col("w"), Dedup.ShingleK)).as("g"))
        .filter(col("g").isNotNull)
        .withColumn("h", H.md5Int28(col("g")))
      val typed = exploded.groupBy("doc_id")
        .agg(org.apache.spark.sql.graft.native.minhashSignature(col("h"), Dedup.NumHashes).as("sig"))
      t("typed-agg signatures") { typed.count() }
      t("typed-agg signatures 2nd") { typed.count() }
    }
    val cand = Dedup.minhashCandidates(sigs)
    t("minhash candidates") { cand.count() }
    t("minhash pairs full") { Dedup.minhashPairs(spark, sfDir).count() }
    t("simhash pairs full") { Dedup.simhashPairs(spark, sfDir).count() }
    t("embed neardup") { Similarity.embedNeardup(spark, sfDir).count() }
    t("ann lsh") { Similarity.annLsh(spark, sfDir).count() }
    t("fingerprint") { TextAnalysis.fingerprint(spark, sfDir).count() }
    t("ngram dedup") { Dedup.ngramDedup(spark, sfDir).count() }
    t("wordcount") { WordCount.query(spark, sfDir).count() }
    spark.stop()
  }

  /** ANN-specific breakdown: where q17/q28 wall-clock goes. */
  def ann(args: Array[String]): Unit = main0Ann(args)
  def main0Ann(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(s"local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val v = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    t("warmup") { v.count() }
    val n = t("corpusSize (memoized)") { Similarity.corpusSize(spark, sfDir) }
    val k = math.max(Similarity.IvfMinCentroids, math.ceil(math.sqrt(n.toDouble)).toInt)
    val cents = t("trainCentroids 2 rounds") { Similarity.trainCentroids(spark, v, n, k) }
    println(s"[profile] k=$k cents=${cents.count()}")
    t("q28 full") { Similarity.annIvf(spark, sfDir).count() }
    t("q28 full 2nd") { Similarity.annIvf(spark, sfDir).count() }
    t("q17 candidates") { Similarity.annLshCandidates(spark, sfDir).count() }
    t("q17 full") { Similarity.annLsh(spark, sfDir).count() }
    t("q17 full 2nd") { Similarity.annLsh(spark, sfDir).count() }
    t("q15 full") { Similarity.embedNeardup(spark, sfDir).count() }
    spark.stop()
  }

  /** Pipeline breakdown: q33 stage costs. */
  def main0Pipe(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(s"local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t("warmup") { graft.sources.Tables.documents(spark, sfDir).count() }
    t("normalize") { TextAnalysis.normalize(spark, sfDir).count() }
    t("quality") { TextAnalysis.quality(spark, sfDir).count() }
    t("minhashPairs") { Dedup.minhashPairs(spark, sfDir).count() }
    t("q33 full") { Pipeline.curate(spark, sfDir).count() }
    t("q33 full 2nd") { Pipeline.curate(spark, sfDir).count() }
    t("q18 langid") { TextAnalysis.langId(spark, sfDir).count() }
    spark.stop()
  }
}

object ProfilePipe { def main(args: Array[String]): Unit = Profile.main0Pipe(args) }

object ProfileAnn { def main(args: Array[String]): Unit = Profile.main0Ann(args) }
