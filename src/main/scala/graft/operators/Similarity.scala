package graft.operators

import graft.functions.{VectorFunctions => V}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>` 64-d).
  *
  * Three shapes:
  *  - q16 brute-force top-k: the correctness baseline. The SMALL query
  *    side is broadcast; the corpus is scanned partition-local, never
  *    shuffled, and the per-query top-k is a window over the (tiny)
  *    query × corpus candidate product. At 100 TB the corpus-side scan
  *    dominates and parallelizes linearly.
  *  - q15 near-dup pairs: random-hyperplane LSH (8 tables × 4 bits)
  *    generates candidate pairs bucket-locally, then exact cosine ≥
  *    threshold verifies. Recall at the threshold is the standard
  *    1-(1-p^b)^L curve; the DuckDB oracle implements the identical
  *    spec, so correctness is checked exactly, not statistically.
  *  - q17 bucketed ANN: one 4-bit table partitions the corpus into 16
  *    buckets; per-query top-k within its bucket. The join is
  *    co-partitioned on the bucket code — the scale path where the
  *    brute-force product is infeasible.
  *
  * Hyperplane weights are integers derived from md5 of "tag_bit_dim"
  * (see [[weight]]) — cross-engine reproducible, precomputed once on the
  * driver and inlined as literal arrays (64 longs per bit), so the per-row
  * work is one codegen'd fold per bit, no per-row hashing.
  */
object Similarity {

  val Dims = 64
  val NeardupTables = 8
  val NeardupBits = 4
  val CosineThreshold = 0.42
  val AnnK = 5
  val BucketBits = 4
  val BucketK = 3

  /** Deterministic pseudo-random weight in [-1000, 1000]:
    * first 28 bits of md5("tag_bit_dim") mod 2001 - 1000.
    * DuckDB: ('0x'||substr(md5(key),1,7))::BIGINT % 2001 - 1000. */
  private[operators] def weight(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 7), 16) % 2001 - 1000
  }

  private def weights(tag: String, table: Int, bit: Int): Seq[Double] =
    (0 until Dims).map(d => weight(s"${tag}_${table}_${bit}_${d}").toDouble)

  /** embeddings with the vector cast up to array<double> once. */
  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Signed-projection bit code: for each bit, sign of <v, w_bit>. */
  private def code(tag: String, table: Int, bits: Int): Column =
    (0 until bits).map { i =>
      val w = typedlit(weights(tag, table, i))
      when(aggregate(zip_with(col("v"), w, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x) > 0,
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** q15_embed_neardup — near-duplicate vector pairs: LSH candidates
    * (8 tables × 4-bit codes) verified by exact cosine ≥ 0.42. */
  def embedNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val base = vecs(spark, sfDir)
    val tableStructs: Seq[Column] = (0 until NeardupTables).map { t =>
      struct(lit(t).as("t"), code("lsh", t, NeardupBits).as("c"))
    }
    val buckets = base
      .select(col("vec_id"), col("v"), explode(array(tableStructs: _*)).as("tc"))
      .select(col("vec_id"), col("v"), col("tc.t").as("t"), col("tc.c").as("c"))
    val cand = buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.t") === col("b.t") && col("a.c") === col("b.c")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(base.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(base.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .withColumn("cosine", V.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= CosineThreshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** q16_ann_bruteforce — exact top-5 cosine neighbors for the first 10
    * vectors; query side broadcast, corpus never shuffled. */
  def annBruteForce(spark: SparkSession, sfDir: String): DataFrame = {
    val base = vecs(spark, sfDir)
    val queries = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_raw").desc, col("neighbor_id").asc)
    base.select(col("vec_id").as("neighbor_id"), col("v"))
      .join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_raw", V.cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= AnnK)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_raw"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** q17_ann_lsh — bucketed ANN: one 4-bit signed-projection table splits
    * the corpus into 16 buckets; top-3 neighbors within each query's own
    * bucket. The self-join is co-partitioned on the bucket code. */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val coded = vecs(spark, sfDir)
      .withColumn("c", code("ivf", 0, BucketBits))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_raw").desc, col("neighbor_id").asc)
    coded.alias("a")
      .join(coded.alias("b"),
        col("a.c") === col("b.c") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("neighbor_id"),
        V.cosine(col("a.v"), col("b.v")).as("cosine_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= BucketK)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_raw"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }
}
