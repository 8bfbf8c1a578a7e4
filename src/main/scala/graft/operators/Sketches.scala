package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregation sketches — the constant-memory substitutes a
  * 100 TB pipeline uses where exact distinct/percentile would need an
  * unbounded shuffle: HLL++ (`approx_count_distinct`, ~1.5 KB of state
  * for any cardinality at rsd=0.05) and the percentile sketch
  * (`approx_percentile`). Both are mergeable partial aggregates, so they
  * partial-combine map-side like any sum.
  *
  * Approximate results are engine-specific by nature, so these carry no
  * DuckDB hash oracle; `SketchesSpec` bounds their error against exact
  * computation instead (SURVEY §2 row 30).
  */
object Sketches {

  /** Per-event-type approximate user cardinality + value percentiles,
    * alongside the exact count for the accuracy tests. */
  def eventSketches(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.05).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_percentile(col("value"), lit(0.5), lit(1000)).as("approx_p50"),
        approx_percentile(col("value"), lit(0.99), lit(1000)).as("approx_p99"))
      .orderBy("event_type")
}
