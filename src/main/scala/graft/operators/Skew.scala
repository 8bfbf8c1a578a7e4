package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: explicit salting for the cases AQE's
  * runtime skew-join splitting does not cover (skewed AGGREGATION keys,
  * and joins over pre-bucketed inputs where AQE cannot re-split).
  *
  * The reference has no equivalent — its single-server shuffle
  * (`lua-mapreduce-server.lua:173-183`) concentrates every hot key in one
  * process; at 100 TB a hot key (empty string, null-ish sentinel, bot
  * user) concentrates a shuffle partition the same way, and salting
  * splits it across `n` reducers.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-style measures for a
    * possibly-skewed key. Phase 1 aggregates on (key, salt) — spreading a
    * hot key over `n` reducers — phase 2 merges the partials per key.
    *
    * `saltSource` must be deterministic per row AND high-cardinality
    * (e.g. a row id column): salting hashes it into [0, n), so a
    * low-cardinality source (a flag, a date) silently collapses the
    * salt space back onto few reducers and the hot key stays hot.
    * Callers picking a key-derived source (never the key itself!)
    * should sanity-check `approx_count_distinct(saltSource) >> n`. */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, n: Int,
                countAs: String = "cnt", sumCol: Option[Column] = None,
                sumAs: String = "total"): DataFrame = {
    val phase1 = df
      .groupBy(key.as("__key"), pmod(hash(saltSource), lit(n)).as("__salt"))
      .agg(
        count(lit(1)).as("__c"),
        sum(sumCol.getOrElse(lit(0.0))).as("__s"))
    val merged = phase1.groupBy(col("__key"))
      .agg(sum(col("__c")).as(countAs), sum(col("__s")).as(sumAs))
    if (sumCol.isDefined) merged.withColumnRenamed("__key", "key")
    else merged.drop(sumAs).withColumnRenamed("__key", "key")
  }

  /** q24_salted_agg — the salted two-phase aggregation as a verified
    * query: per-event-type counts/sums computed through an 8-way salt. */
  def saltedAggQuery(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    saltedAgg(graft.sources.Tables.events(spark, sfDir),
      col("event_type"), col("event_id"), 8,
      countAs = "cnt", sumCol = Some(col("value")), sumAs = "total")
      .select(col("key").as("event_type"), col("cnt"), round(col("total"), 2).as("total"))
      .orderBy("event_type")

  /** Salted broadcast-free join for a skewed fact side: the fact rows get
    * a deterministic salt in [0, n); the (small or mid-size) dim side is
    * replicated n× with every salt value, and the join key becomes
    * (key, salt) — splitting each hot key across n tasks. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, n: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(n)))
    val replicated = dim.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
