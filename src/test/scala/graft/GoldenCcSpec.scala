package graft

import org.apache.spark.sql.functions._

/** q176's connected-component labeling has TWO physical plans behind
  * one label law — driver union-find while the fuzzy-match edge list
  * is vocabulary-bounded, the distributed large-star/small-star loop
  * past [[graft.operators.Dedup.FuzzyBroadcastMaxVocab]]. This spec
  * pins that both emit the IDENTICAL coalesced assignment (node →
  * component-min id, nodes off the match graph label themselves) on
  * the real corpus vocabulary, so the gate is pure physical strategy.
  */
class GoldenCcSpec extends SparkSuite {
  import graft.operators.Dedup
  import org.apache.spark.sql.expressions.Window

  test("driver union-find and distributed CC emit the identical coalesced labeling") {
    val ids = graft.sources.Tables.part(spark, sf)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .select(col("p_name"),
        row_number().over(Window.orderBy(col("p_name"))).cast("long").as("nid"))
      .localCheckpoint()
    val pairs = Dedup.fuzzyVocabPairs(
        ids.select(col("p_name").as("name"), col("nid").as("pl")), banded = false)
      .select(col("pl_a").as("u"), col("pl_b").as("v"))
      .localCheckpoint()
    def assignment(distributed: Boolean): Map[Long, Long] = {
      val cc = Dedup.fuzzyCcLabels(spark, pairs, distributed)
      ids.join(cc, Seq("nid"), "left")
        .select(col("nid"), coalesce(col("cluster_id"), col("nid")).as("cid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val driver = assignment(distributed = false)
    val dist = assignment(distributed = true)
    assert(driver.values.toSet.size < driver.size,
      "vacuous corpus: no fuzzy cluster of size >= 2 — the comparison proves nothing")
    assert(dist === driver)
  }
}
