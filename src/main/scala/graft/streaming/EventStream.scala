package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A single event row for typed streaming transforms. */
case class Event(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Per-user running aggregate maintained by the stateful operator. */
case class UserStats(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming surface.
  *
  * The transforms are plain DataFrame/Dataset functions, so the SAME code
  * runs in batch (where the DuckDB oracle can check it — q23) and behind
  * `readStream` (where `StreamingSpec` drives it through MemoryStream).
  * That batch/stream unification is the Spark-native re-expression of the
  * reference's "stream tasks to workers as they arrive" loop
  * (`lua-mapreduce-server.lua:228-334`).
  *
  * Scale: the windowed aggregation is keyed by (window, event_type) with
  * a watermark bounding state; `runningUserStats` keeps O(users) state in
  * the state store (RocksDB on a cluster), both standard 1000-executor
  * patterns.
  */
object EventStream {

  /** 5-minute tumbling-window counts/sums per event type. Works on batch
    * and streaming frames alike; streaming callers should watermark
    * first (see [[withWatermarkedWindow]]). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming form: watermark bounds window state for append-mode sinks. */
  def withWatermarkedWindow(events: DataFrame): DataFrame =
    windowedAgg(events.withWatermark("ts", "10 minutes"))

  /** q23_stream_window — the windowed aggregation executed in batch mode
    * over the events table (same code path the stream runs). */
  def windowQuery(spark: SparkSession, sfDir: String): DataFrame =
    windowedAgg(Tables.events(spark, sfDir))
      .orderBy("win_start", "event_type")

  /** Arbitrary stateful processing: per-user running stats via
    * mapGroupsWithState (update mode), the custom-state primitive the
    * brief calls for. Exercised by StreamingSpec. */
  def runningUserStats(spark: SparkSession, events: Dataset[Event]): Dataset[UserStats] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserStats(userId, n, v)
          state.update(next)
          next
      }
  }
}
