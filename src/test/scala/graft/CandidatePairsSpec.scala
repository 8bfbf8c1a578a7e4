package graft

import graft.operators.{CandidatePairs, Dedup}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** The LSH hot-bucket cap: output-preserving work redistribution plus
  * telemetry. Plants a pathological bucket (many ids on one key — the
  * boilerplate-shingle scenario) and asserts the salted join (a) emits
  * exactly the uncapped pair set, (b) bounds per-(bucket, salt) task
  * membership, (c) reports the hot bucket through the Observation. */
class CandidatePairsSpec extends SparkSuite {

  private val HotN = 200
  private val Cap = 16

  /** One hot bucket ("hot", 200 ids) + two small buckets. */
  private lazy val buckets = {
    import graft.SparkSuite.implicits._
    val hot = (0 until HotN).map(i => ("hot", i.toLong))
    val small = Seq(("s1", 1000L), ("s1", 1001L), ("s1", 1002L), ("s2", 2000L), ("s2", 2001L))
    (hot ++ small).toDF("k", "id")
  }

  test("salted self-join emits exactly the uncapped all-pairs set") {
    val got = CandidatePairs.boundedSelfJoin(buckets, Seq("k"), "id", Cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected =
      (for (a <- 0 until HotN; b <- (a + 1) until HotN) yield (a.toLong, b.toLong)).toSet ++
        Set((1000L, 1001L), (1000L, 1002L), (1001L, 1002L), (2000L, 2001L))
    assert(got == expected)
  }

  test("cap bounds per-(bucket, salt) membership on the planted hot bucket") {
    val (left, right) = CandidatePairs.salted(buckets, Seq("k"), "id", Cap)
    // the hot bucket must be split into ceil(200/16) = 13 salt groups
    assert(left.filter(col("k") === "hot").select("n_salt").distinct()
      .head().getLong(0) == (HotN + Cap - 1) / Cap)
    // hash-assigned salts are ~uniform: no task sees more than ~3x cap
    // left rows (the quadratic side is the left x right product per salt)
    val maxPerSalt = left.groupBy("k", "salt").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPerSalt <= 3L * Cap, s"max per-salt membership $maxPerSalt")
    // small buckets degenerate to the plain self-join (single salt)
    assert(right.filter(col("k") === "s1").count() == 3)
  }

  test("observation reports the planted hot bucket") {
    val obs = Observation("hot-bucket-test")
    CandidatePairs.boundedSelfJoin(buckets, Seq("k"), "id", Cap, Some(obs)).count()
    val m = obs.get
    assert(m("hot_buckets") == 1L)
    assert(m("hot_bucket_rows") == HotN.toLong)
    assert(m("max_bucket_n") == HotN.toLong)
  }

  test("q12 pair set is invariant to the bucket cap on real data") {
    val default = Dedup.minhashPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap=2 forces the salted path for essentially every bucket
    val tiny = Dedup.minhashPairs(spark, sf, 2, None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny == default)
  }

  test("contrib form: one payload row per shared key per pair, cap-invariant") {
    import graft.SparkSuite.implicits._
    // docs -> (block, term, weight): a/b share block X and terms t1,t2
    // (weights differ); c shares block X but only term t1 with a/b;
    // d sits alone in block Y
    val rows = Seq(
      (1L, "X", "t1", 10L), (1L, "X", "t2", 3L),
      (2L, "X", "t1", 7L), (2L, "X", "t2", 5L),
      (3L, "X", "t1", 2L),
      (4L, "Y", "t9", 8L))
      .toDF("id", "blk", "term", "wi")
    def dots(cap: Int) = CandidatePairs
      .boundedSelfJoinContrib(rows, Seq("blk", "term"), "id", Seq("wi"), cap)
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wi_a") * col("wi_b")).as("dp"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val expected = Map(
      (1L, 2L) -> (10L * 7L + 3L * 5L), // both shared terms contribute once
      (1L, 3L) -> (10L * 2L),
      (2L, 3L) -> (7L * 2L))            // d pairs with nobody
    assert(dots(16) == expected)
    // the salted redistribution never changes the contribution multiset
    assert(dots(1) == expected)
  }
}
