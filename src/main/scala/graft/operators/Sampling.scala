package graft.operators

import graft.functions.{HashFunctions => H}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the rebalancing step of a
  * training-data mix (downsample the dominant language/source, keep the
  * tail), expressed so the SAME rows are selected on every engine, any
  * partitioning, any run:
  *
  * membership = md5("smp_" || doc_id) mod 1000 < per-stratum rate.
  *
  * That makes sampling a pure scan-local filter: no RNG state, no
  * `sample()` nondeterminism, no shuffle — at 100 TB it rides the
  * parquet scan and composes with pushdown. The hash family is the same
  * md5-prefix trick the LSH weights use (cross-engine reproducible, so
  * the DuckDB oracle checks the sample EXACTLY, not statistically).
  *
  * The reference has no sampling surface; this is part of the
  * LLM-pipeline tier the builder brief adds.
  */
object Sampling {

  /** Per-mille keep rates per language; the dominant language (en, ~44%
    * of the synthetic corpus) is downsampled 2× vs the tail. */
  val DefaultRate = 200
  val EnRate = 100

  /** q48_sample — deterministic stratified sample of the documents
    * table: (doc_id, lang, source, bucket) for every kept doc. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bucket",
        pmod(H.md5Int28(concat(lit("smp_"), col("doc_id").cast("string"))), lit(1000)))
      .withColumn("keep_rate",
        when(col("lang") === "en", lit(EnRate)).otherwise(lit(DefaultRate)))
      .filter(col("bucket") < col("keep_rate"))
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy("doc_id")

  /** q60_lang_balance — DATA-DEPENDENT rebalancing: downsample every
    * language to (approximately) the size of the smallest one, the
    * "flatten the language mix" step of a multilingual training set.
    * Where q48's rates are fixed configuration, here the rate comes from
    * the corpus itself: membership is
    *
    *   md5("bal_" || doc_id) mod n_lang  <  n_target
    *
    * with n_lang = docs in this doc's language and n_target = min over
    * languages — keeping an ≈ n_target/n_lang fraction of each stratum,
    * exactly n_target in expectation, and exactly reproducible (the
    * DuckDB oracle recomputes the identical membership, so the check is
    * row-exact, not statistical).
    *
    * Scale shape: the per-language counts are one partial-aggregable
    * groupBy whose result (|languages| rows) broadcasts back onto the
    * scan, the global min is a 1-row broadcast, and membership is a
    * scan-local filter — no shuffle of the corpus, no RNG state, no
    * per-group windows (a rank-based exact-n variant would put n/|langs|
    * rows in one window task; the hash-threshold form is what keeps
    * this a pure scan at 100 TB). */
  def langBalance(spark: SparkSession, sfDir: String): DataFrame =
    langBalanceFrom(Tables.documents(spark, sfDir))

  /** [[langBalance]] over an arbitrary (doc_id, lang, source) frame. */
  private[graft] def langBalanceFrom(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val target = counts.agg(min(col("n_lang")).as("n_target"))
    docs.join(broadcast(counts), "lang")
      .crossJoin(broadcast(target))
      .filter(pmod(H.md5Int28(concat(lit("bal_"), col("doc_id").cast("string"))),
        col("n_lang")) < col("n_target"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }
}
