package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** The q135/q176 fuzzy pair search has TWO physical plans — broadcast
  * BNLJ for catalog vocabularies, a length-banded hash join past
  * [[graft.operators.Dedup.FuzzyBroadcastMaxVocab]] — and exactly ONE
  * output contract. This spec pins (1) pair-set equality between the
  * two plans on the real corpus vocabulary plus an adversarial
  * length-skewed vocabulary, and (2) the banded plan's scale shape: an
  * equi (hash) join, never a nested-loop or cartesian stage. */
class FuzzyBandingSpec extends SparkSuite {
  import graft.operators.Dedup

  private def partVocab = graft.sources.Tables.part(spark, sf)
    .groupBy(col("p_name")).agg(count(lit(1)).as("pl"))
    .select(col("p_name").as("name"), col("pl"))

  test("banded and BNLJ plans emit the identical pair set on the corpus vocabulary") {
    val bnlj = Dedup.fuzzyVocabPairs(partVocab, banded = false)
      .select("name_a", "name_b", "distance").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val band = Dedup.fuzzyVocabPairs(partVocab, banded = true)
      .select("name_a", "name_b", "distance").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(bnlj.nonEmpty, "vacuous corpus: no fuzzy pairs at all")
    assert(band === bnlj)
  }

  test("plans agree on a vocabulary engineered around the bin boundaries") {
    // names whose lengths straddle bin edges (w = 3: bins [0,2], [3,5],
    // [6,8], ...) — every qualifying pair must cross at most one bin
    // edge, and non-qualifying same-bin pairs must still be rejected
    import graft.SparkSuite.implicits._
    val vocab = Seq(
      "ab", "abc", "abcd", "abcde", "abcdef", // chain crossing 2 edges
      "xy", "xyzzy", // distance > 2 in length: must never pair
      "aa", "ba", "bb", // dense same-bin cluster
      "zzzzzzzz", "zzzzzzzz!", // far bin, adjacent lengths
      "q", "qq", "qqq", "qqqq" // boundary lengths 1-4
    ).toDF("name").withColumn("pl", length(col("name")).cast("long"))
    val bnlj = Dedup.fuzzyVocabPairs(vocab, banded = false)
      .select("name_a", "name_b", "distance").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val band = Dedup.fuzzyVocabPairs(vocab, banded = true)
      .select("name_a", "name_b", "distance").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(bnlj.nonEmpty)
    assert(band === bnlj)
    // the length pre-filter really rejects |len diff| > d pairs
    assert(!bnlj.exists { case (a, b, _) => math.abs(a.length - b.length) > 2 })
  }

  test("the banded plan is an equi join: no nested-loop, no cartesian") {
    val p = Dedup.fuzzyVocabPairs(partVocab, banded = true)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    // the bin key must reach a hash-based equi join (broadcast-hash at
    // test scale, shuffled-hash/sort-merge at vocabulary scale)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }

  test("payload columns ride through both plans") {
    val out = Dedup.fuzzyVocabPairs(partVocab, banded = true)
    assert(out.columns.toSeq ===
      Seq("name_a", "name_b", "distance", "pl_a", "pl_b"))
    val r = out.orderBy("name_a", "name_b").limit(1).collect()
    if (r.nonEmpty) assert(r.head.getLong(3) >= 1L && r.head.getLong(4) >= 1L)
  }
}
