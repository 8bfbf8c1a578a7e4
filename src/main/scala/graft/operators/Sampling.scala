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
}
