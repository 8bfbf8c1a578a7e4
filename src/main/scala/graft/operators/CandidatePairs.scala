package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Skew-bounded candidate-pair generation for LSH bucket self-joins.
  *
  * The scale hazard of every banded-LSH dedup pass is the HOT BUCKET: a
  * boilerplate shingle (cookie banner, license header) that lands
  * thousands of documents on one (band, signature) key makes the naive
  * bucket self-join build an O(n²) pair list inside a single task. The
  * fix here is a salted replicated join with per-bucket salt
  * cardinality:
  *
  *   - every bucket of n members gets `n_salt = ceil(n / cap)` salts;
  *   - the LEFT side keeps one salt per row (hash of its id);
  *   - the RIGHT side is replicated to every salt of its bucket;
  *   - the join adds `salt` to the bucket key, so each task handles
  *     ~cap left rows × n right rows instead of n × n.
  *
  * For buckets at or under the cap, n_salt = 1 and the plan degenerates
  * to the plain bucket self-join — one code path, no cold/hot split.
  * The emitted pair set is IDENTICAL to the uncapped self-join for any
  * cap (each right row is replicated to every salt, so every ordered
  * pair meets exactly once): the cap redistributes quadratic work, it
  * never drops pairs. Hot buckets therefore still cost O(n²/cap) tasks
  * of O(cap·n) work — callers that want to truncate instead (e.g. route
  * a 100k-member boilerplate bucket to an exact-dup pass) should filter
  * on the [[bucketSizes]] frame before calling.
  *
  * Telemetry: pass an [[Observation]] to get `hot_bucket_rows` (rows in
  * over-cap buckets), `hot_buckets` (count of over-cap buckets, via the
  * sum-of-1/n identity so it needs no distinct aggregate) and
  * `max_bucket_n` once the query runs — hot buckets are visible, never
  * silent.
  */
object CandidatePairs {

  /** One row per bucket: keyCols + bucket_n. */
  def bucketSizes(buckets: DataFrame, keyCols: Seq[String]): DataFrame =
    buckets.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("bucket_n"))

  /** Left/right salted frames (exposed for spec assertions on the salt
    * distribution). Left rows carry (row cols, bucket_n, n_salt, salt);
    * right rows are exploded to one copy per salt of their bucket.
    *
    * Bucket sizes come from a window count, NOT a groupBy+join back:
    * the join form would embed the (possibly expensive) bucket subplan
    * three more times, while the window form gives left and right an
    * IDENTICAL exchange+window prefix that Spark's ReuseExchange
    * computes once. */
  private[graft] def salted(
      buckets: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      cap: Int): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    val withN = buckets
      .withColumn("bucket_n", count(lit(1)).over(w))
      .withColumn("n_salt", expr(s"((bucket_n - 1) div $cap) + 1"))
    val left = withN.withColumn("salt", pmod(xxhash64(col(idCol)), col("n_salt")))
    val right = withN.withColumn("salt", explode(sequence(lit(0L), col("n_salt") - 1)))
    (left, right)
  }

  /** Shared hot-bucket telemetry: wraps the salted LEFT frame in the
    * caller's [[Observation]] (rows in over-cap buckets, over-cap bucket
    * count via the sum-of-1/n identity, max bucket size) — one
    * definition so [[boundedSelfJoin]] and [[boundedSelfJoinContrib]]
    * cannot drift. */
  private def withHotBucketObs(
      leftBase: DataFrame, cap: Int, obs: Option[Observation]): DataFrame =
    obs match {
      case Some(o) => leftBase.observe(
        o,
        sum(when(col("bucket_n") > cap, 1L).otherwise(0L)).as("hot_bucket_rows"),
        round(sum(when(col("bucket_n") > cap, lit(1.0) / col("bucket_n"))
          .otherwise(lit(0.0)))).cast("long").as("hot_buckets"),
        max(col("bucket_n")).as("max_bucket_n"))
      case None => leftBase
    }

  /** All distinct (id_a < id_b) pairs of rows sharing a bucket key,
    * with per-task work bounded by `cap` as described above. */
  def boundedSelfJoin(
      buckets: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      cap: Int,
      obs: Option[Observation] = None): DataFrame = {
    require(cap > 0, s"bucket cap must be positive, got $cap")
    val (leftBase, right) = salted(buckets, keyCols, idCol, cap)
    val left = withHotBucketObs(leftBase, cap, obs)
    val keyEq: Column = (keyCols :+ "salt")
      .map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    left.alias("a")
      .join(right.alias("b"), keyEq && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** [[boundedSelfJoin]]'s CONTRIBUTION form: same salted bucket
    * machinery and the same every-ordered-pair-meets-exactly-once
    * guarantee, but each match keeps caller-selected payload columns
    * from both sides (`<c>_a` / `<c>_b`) and is NOT deduplicated — a
    * pair emits once PER BUCKET KEY it shares, which is exactly what
    * per-key contribution sums need (q171 accumulates sparse
    * dot-product terms over (block, term) buckets this way: work ∝
    * shared terms per pair, never |pair| × |posting|). */
  def boundedSelfJoinContrib(
      buckets: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      payloadCols: Seq[String],
      cap: Int,
      obs: Option[Observation] = None): DataFrame = {
    require(cap > 0, s"bucket cap must be positive, got $cap")
    val (leftBase, right) = salted(buckets, keyCols, idCol, cap)
    val left = withHotBucketObs(leftBase, cap, obs)
    val keyEq: Column = (keyCols :+ "salt")
      .map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val payload = payloadCols.flatMap(c =>
      Seq(col(s"a.$c").as(s"${c}_a"), col(s"b.$c").as(s"${c}_b")))
    left.alias("a")
      .join(right.alias("b"), keyEq && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a") +: col(s"b.$idCol").as("id_b")
        +: payload: _*)
  }
}
