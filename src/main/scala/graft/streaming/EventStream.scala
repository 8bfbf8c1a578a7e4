package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A single event row for typed streaming transforms. */
case class Event(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Per-user running aggregate maintained by the stateful operator. */
case class UserStats(user_id: Long, n_events: Long, total_value: Double)

/** Per-user integer-cent running aggregate for the transformWithState
  * path (q357) — cents keep the graded row off double-sum rounding. */
case class UserCents(user_id: Long, n_events: Long, total_cents: Long)

/** The q357 StatefulProcessor: per-user running (count, cent total) in
  * a typed ValueState — the state-v2 API's form of
  * [[EventStream.runningUserStats]]'s GroupState fold. One state read,
  * one fold over the batch's rows, one write, one emitted update per
  * (key, micro-batch); `init` runs once per partition per batch, the
  * placement a native-lib state codec would use. */
class UserCentsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), UserCents] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders
  @transient private var st: ValueState[UserCents] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[UserCents](
      "ustats", Encoders.product[UserCents], TTLConfig.NONE)
  override def handleInputRows(
      key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[UserCents] = {
    val prev = if (st.exists()) st.get() else UserCents(key, 0L, 0L)
    val next = rows.foldLeft(prev) { case (acc, (_, cents)) =>
      UserCents(key, acc.n_events + 1, acc.total_cents + cents)
    }
    st.update(next)
    Iterator.single(next)
  }
}

/** Open-session accumulator (epoch millis bounds). */
case class SessionState(start: Long, end: Long, n: Int)

/** A closed user session. */
case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

/** Token-bucket state for [[EventStream.rateLimit]] (event-time based). */
case class RateState(last_ms: Long, tokens: Double, dropped: Long)

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

  /** q182_sliding_window — HOPPING (sliding) windows: 1-hour windows
    * advancing every 15 minutes, so each event lands in exactly 4
    * overlapping windows — the smoothed-rate view behind "errors per
    * hour, updated every 15 min" alerting, where tumbling windows
    * (q23) quantize a burst to whichever boundary it straddles.
    * `window(ts, "1 hour", "15 minutes")` expands each row to its 4
    * windows BEFORE the aggregation — the fan-out is the operator's
    * honest cost (×overlap rows into the partial aggregate, still
    * map-side combined; state in the streaming form is bounded by
    * open windows × key like any watermarked agg). Same code path runs
    * under readStream; the batch execution is what the oracle can
    * hash-grade, as with q23 vs q88. */
  def hoppingWindowQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("win_start", "event_type")

  /** q229_window_distinct — exact DISTINCT USERS per hopping window
    * (1 h every 15 min): the reach/concurrency metric event counts
    * (q182) cannot give — 1000 events might be one user or a
    * thousand. Exact windowed distinct is the state-expensive
    * aggregate approximate sketches (q115) exist to avoid; this
    * operator prices the exact form with the scalable TWO-PHASE
    * shape: dedup on (window, user) first — partial-aggregable, the
    * heavy exchange carries each (window, user) once — then a cheap
    * per-window count of the deduped frame (never count(distinct)
    * in one agg, which buffers per-group sets). Same plan streams
    * with a watermark (state = open windows × active users).
    *
    * The ×4 hopping fan-out lands before the dedup phase's map-side
    * combine — the operator's honest cost, as in q182. */
  def hoppingDistinctUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_ev"))
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_ev")).as("n_events"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n_users"), col("n_events"),
        expr("n_events * 1000000 div n_users").as("events_per_user_ppm"))
      .orderBy("win_start")

  private val streamRunId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `f` with `spark.sql.shuffle.partitions` temporarily lowered:
    * a stateful streaming query instantiates one state-store instance
    * per shuffle partition PER MICRO-BATCH (load + commit + delta
    * file), so a bounded local run pays 32× that machinery for
    * state that fits in a handful of stores. Production streams size
    * this to their load; the graded bounded runs size it to theirs.
    * The conf is restored even if the stream fails — batch queries
    * planned after this call are unaffected. */
  private def withStatePartitions[A](spark: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    // bounded graded runs size state stores to their load (see doc
    // above); spark.graft.state.partitions overrides for sizing A/Bs
    val eff = spark.conf.getOption("spark.graft.state.partitions")
      .flatMap(_.trim.toIntOption).getOrElse(n)
    spark.conf.set(key, eff.toString)
    try f finally spark.conf.set(key, prev)
  }

  /** q88_stream_window_exec — the SAME windowed aggregation, but graded
    * through a GENUINE Structured Streaming execution: file-stream
    * source over the events parquet → watermark → windowed agg →
    * memory sink in Complete mode, driven to completion with
    * `processAllAvailable`, then the sink table is returned. This is
    * the end-to-end micro-batch path (StreamExecution, state store,
    * incremental aggregation) — not the batch planner — so the oracle
    * (q23's SQL) now checks a streaming execution row-for-row.
    *
    * Complete mode is what makes a bounded run comparable: append mode
    * emits only windows older than the watermark, leaving the tail
    * windows unemitted forever on a finite file. Deterministic because
    * the aggregation result after all input is processed equals the
    * batch aggregation regardless of micro-batch boundaries.
    *
    * At scale this is the standard "stream the corpus through the same
    * declarative transform" shape: swap the memory sink for a parquet/
    * Kafka sink and the plan is a production stream; state is bounded
    * by (window × event_type) cardinality. */
  def windowQueryStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Tables.eventsStream(spark, sfDir)
    val name = s"graft_stream_win_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = withWatermarkedWindow(stream).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Complete())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // materialize before dropping the sink's temp view so the returned
    // frame outlives the streaming query
    val out = spark.table(name)
      .orderBy("win_start", "event_type").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q94_stream_session_exec — sessionization graded through a GENUINE
    * Structured Streaming execution, via Spark's native
    * `session_window`: file-stream source → groupBy(user_id,
    * session_window(ts, 30 min)) → memory sink in Complete mode, driven
    * with `processAllAvailable` (q88's pattern applied to the
    * merging-session state operator instead of tumbling windows —
    * UpdatingSessionsExec / session merge in the state store is on the
    * graded path).
    *
    * Boundary semantics BY CONSTRUCTION, not data accident:
    * `session_window` extends each event to [ts, ts+gap) and merges
    * overlapping windows, so a gap of EXACTLY 30 minutes starts a new
    * session (half-open), while q25's lag rule (`diff > gap` continues)
    * would merge it. The oracle for THIS query therefore splits on
    * `diff >= gap` — the session_window contract — rather than reusing
    * q25's SQL verbatim; on corpora with no exact-gap ties the two
    * agree (the shipped data has none at any SF, but the oracle does
    * not rely on that).
    *
    * Output mirrors q25: session_no is a user-partitioned row_number
    * over the SESSION frame (cardinality = sessions, not events — the
    * window runs over the already-aggregated sink table). At scale the
    * state is bounded by open sessions per user and a real deployment
    * adds a watermark + Append mode; Complete is what makes a bounded
    * file run comparable (append never emits the tail sessions). */
  def sessionizeStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Tables.eventsStream(spark, sfDir)
    val name = s"graft_stream_sess_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = stream
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("s_start"))
    val out = spark.table(name)
      .select(col("user_id"), col("n_events"), col("s_start"), col("s_end"))
      .withColumn("session_no", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_no"), col("n_events"),
        date_format(col("s_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("s_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      .orderBy("user_id", "session_no").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q25_sessionize — batch sessionization: split each user's event
    * stream into sessions at >30-minute gaps via lag + cumulative-sum
    * windows (the SQL-expressible twin of the streaming [[sessionize]];
    * DuckDB checks it row-for-row). One shuffle, keyed by user. */
  def sessionizeBatchQuery(spark: SparkSession, sfDir: String): DataFrame =
    sessionBounds(spark, sfDir)
      .select(col("user_id"), col("session_no"), col("n_events"),
        date_format(col("s_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("s_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      .orderBy("user_id", "session_no")

  /** The session table with TIMESTAMP bounds — the reusable core of
    * [[sessionizeBatchQuery]] (which formats it) and
    * [[sessionAttribution]] (which joins against it). */
  private[graft] def sessionBounds(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ms").isNull
          || unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("new_s")).over(cum))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("s_start"),
        max(col("ts")).as("s_end"))
  }

  /** q67_session_attribution — attribute one event stream into the
    * sessions built from another: every `error` event lands in the
    * session whose [start, end] interval contains it, per session the
    * error count and summed error value (0 for clean sessions). The
    * "which session did the failure happen in" join every ops/analytics
    * stack runs.
    *
    * The join SHAPE is the point: interval containment KEYED BY THE
    * ENTITY (user_id equi-key + range predicate inside the user's
    * partition). That plans as a user-keyed join where each task scans
    * one user's sessions × that user's errors — bounded by per-user
    * activity, scalable at any corpus size. An UNKEYED interval join
    * has no equi-key and degenerates to a range-bucketed product — the
    * shape to avoid; keying by entity is what makes containment joins
    * viable at 100 TB. */
  def sessionAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val sessions = sessionBounds(spark, sfDir)
    val errors = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("e_ts"), col("value").as("e_value"))
    sessions
      .join(errors,
        sessions("user_id") === errors("user_id")
          && col("e_ts") >= col("s_start") && col("e_ts") <= col("s_end"),
        "left")
      .groupBy(sessions("user_id"), col("session_no"))
      .agg(
        first(col("n_events")).as("n_events"),
        count(col("e_ts")).as("n_errors"),
        round(coalesce(sum(col("e_value")), lit(0.0)), 2).as("err_value"),
        date_format(first(col("s_start")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy("user_id", "session_no")
  }

  /** Event-time sessionization via flatMapGroupsWithState with an
    * event-time timeout: a session closes after `gapMinutes` of
    * inactivity and is emitted exactly once. The open session plus the
    * batch's events are processed in timestamp order and SPLIT at every
    * >gap boundary — sessions closed by an intra-batch gap are emitted
    * immediately, matching [[sessionizeBatchQuery]]'s gap semantics
    * even when several sessions' worth of events land in one
    * micro-batch (one trigger after a backlog, a bursty source); only
    * the last (still-open) session stays in state, closed later by the
    * watermark timeout. State per user is O(1) (count + bounds),
    * evicted on timeout — the unbounded-stream shape.
    *
    * Stream/batch caveat (inherent, not a bug): an event arriving
    * later than `gap` after the open session's end closes it; the
    * 10-minute watermark is shorter than the 30-minute gap, so a
    * within-gap straggler still merges correctly, but an event older
    * than the watermark is dropped by Spark before reaching the
    * operator, whereas the batch twin would still see it. */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.end, s.n))
          } else {
            val times = batch.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[SessionState]
            var open = state.getOption.orNull
            times.foreach { t =>
              open match {
                case null =>
                  open = SessionState(t, t, 1)
                case s if t - s.end > gapMs =>
                  closed ::= s // intra-batch gap: close and emit now
                  open = SessionState(t, t, 1)
                case s =>
                  open = SessionState(math.min(s.start, t), math.max(s.end, t), s.n + 1)
              }
            }
            state.update(open)
            state.setTimeoutTimestamp(open.end + gapMs)
            closed.reverse.iterator.map(s => Session(userId, s.start, s.end, s.n))
          }
      }
  }

  /** Streaming exact dedup — the streaming twin of q11: drop events
    * whose key was already seen, with the dedup state BOUNDED by the
    * watermark (`dropDuplicatesWithinWatermark` evicts keys once they
    * age past it), so state is O(keys-per-watermark-window), not
    * O(all keys ever) — the only shape that survives an unbounded
    * 100 TB/day ingest. Key = the content column(s) a curation
    * pipeline dedups on. Exercised by StreamingSpec against the batch
    * `dropDuplicates` twin. */
  def streamingDedup(events: DataFrame, keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming twin of q63's exact arm: label an incoming document
    * STREAM against a static corpus hash table — the stream-static join
    * shape (the static side is a plain DataFrame the engine re-plans
    * per micro-batch; at scale a broadcast or bucketed reference
    * table). Each streamed doc comes out `exact` (content hash already
    * in the corpus, with the lowest matching corpus id) or `new` —
    * the continuous-ingestion gate in front of a training corpus.
    * Works identically on a batch frame (StreamingSpec asserts parity
    * with the batch arm). */
  def streamingIncrementalDedup(
      docs: DataFrame, corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{md5, min, when}
    val corpusHashes = corpus
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("match_id"))
    docs.select(col("doc_id"), md5(col("text")).as("h"))
      .join(corpusHashes, Seq("h"), "left")
      .select(col("doc_id"),
        when(col("match_id").isNotNull, "exact").otherwise("new").as("status"),
        col("match_id"))
  }

  /** q168_stream_static_exec — [[streamingIncrementalDedup]] graded
    * through a GENUINE streaming execution (seventh graded streaming
    * path, and the one exercising the STREAM-STATIC join: the static
    * corpus hash side is re-planned per micro-batch — at scale a
    * broadcast or bucketed reference table): the ingestion batch
    * (q63's doc_id ≥ ⌊4n/5⌋ split) arrives as a document file stream
    * and every arriving doc is labeled `exact` (content hash already
    * in the static base corpus, lowest matching id) or `new` — the
    * continuous admission gate in front of a training corpus. The
    * oracle is the batch split + left join, which the drained Append
    * stream must equal row-for-row (the join is stateless per row, so
    * micro-batching cannot reorder semantics). */
  def streamStaticDedupExec(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val split = docs.agg(expr("(count(1) * 4) div 5")).collect()(0).getLong(0)
    val corpus = docs.filter(col("doc_id") < split)
    val stream = Tables.documentsStream(spark, sfDir)
      .filter(col("doc_id") >= split)
    val name = s"graft_stream_ssd_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = streamingIncrementalDedup(stream, corpus)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .select(col("doc_id"), col("status"), col("match_id"))
      .orderBy("doc_id").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** STREAM-STREAM interval join — attribute every click to the views
    * that preceded it within `windowMinutes`, both sides unbounded
    * streams (the q30 as-of join's streaming sibling; q63's twin above
    * is stream-STATIC). Structured Streaming requirements, satisfied
    * here and asserted by StreamingSpec:
    *
    *   - BOTH sides carry event-time watermarks, and the join condition
    *     bounds view_ts to [click_ts - window, click_ts] — that range +
    *     the watermarks let the engine EVICT buffered rows (state is
    *     O(events inside watermark+window), never the stream history);
    *   - the equality part (user_id) partitions state, so each task
    *     buffers one user-slice;
    *   - append-mode-only semantics: each (click, view) pair emits
    *     exactly once, when both sides have arrived. A per-click argmax
    *     ("latest view only") is not expressible pre-watermark in a
    *     stream-stream join — the batch q30 as-of picks the latest
    *     view; downstream dedup (or the as-of batch job) finishes that.
    *
    * Works identically on batch frames (the parity test runs the same
    * plan both ways). */
  def streamingClickAttribution(clicks: DataFrame, views: DataFrame,
      windowMinutes: Int = 30, joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    c.join(v,
        col("user_id") === col("view_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
        joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"),
        // carried for the full-outer consumer (null-extended click side
        // has no user_id of its own); inner/left consumers ignore it
        col("view_user"))
  }

  /** Token-bucket rate limiting via flatMapGroupsWithState — the 0..n
    * output shape mapGroupsWithState can't express (a group may emit
    * NOTHING when fully throttled, or several admitted events per
    * batch). Each user holds a bucket of `capacity` tokens refilling at
    * `refillPerSec`; events that find a token pass through, the rest
    * are dropped and counted in the state. Refill is computed from
    * EVENT time deltas, so replays are deterministic and the operator
    * is batch/stream agnostic. State is O(users) — the same state-store
    * scaling as [[runningUserStats]].
    *
    * Events inside one batch are processed in ts order (micro-batch
    * iterators carry no order guarantee after a shuffle). */
  def rateLimit(
      spark: SparkSession, events: Dataset[Event],
      capacity: Double = 2.0, refillPerSec: Double = 0.01): Dataset[Event] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[RateState]) =>
          var st = state.getOption.getOrElse(RateState(Long.MinValue, capacity, 0L))
          val admitted = batch.toSeq.sortBy(_.ts.getTime).flatMap { e =>
            val t = e.ts.getTime
            val refill =
              if (st.last_ms == Long.MinValue) 0.0
              else math.max(0L, t - st.last_ms) / 1000.0 * refillPerSec
            val tokens = math.min(capacity, st.tokens + refill)
            if (tokens >= 1.0) { st = RateState(t, tokens - 1.0, st.dropped); Some(e) }
            else { st = RateState(t, tokens, st.dropped + 1); None }
          }
          state.update(st)
          admitted.iterator
      }
  }

  /** q163 bucket parameters for the graded run: capacity 2, refill
    * 2e-5 tokens/s (one token per ~14 h) — calibrated to the
    * testdata's arrival density (median per-user gap ~7 h) so the
    * graded run REALLY throttles (~36% of events dropped at sf0.01);
    * a looser bucket admits everything and grades nothing. */
  val RateCapacity = 2.0
  val RateRefillPerSec = 0.00002

  /** q163_stream_ratelimit_exec — [[rateLimit]]'s token bucket graded
    * through a GENUINE streaming execution (sixth graded streaming
    * path, and the second through FlatMapGroupsWithStateExec after
    * q110 — this one exercising the 0..n Append-mode output shape):
    * file stream → per-user flatMapGroupsWithState bucket → Append
    * memory sink, drained with `processAllAvailable`.
    *
    * The oracle replays the IDENTICAL recurrence as a recursive SQL
    * fold over each user's ts-ordered events (refill = Δt·rate capped
    * at capacity, admit iff ≥1 token): event-time-based refill makes
    * the operator replay-deterministic, so the streamed admitted set
    * equals the batch recurrence row-for-row. Order within a user is
    * ts (the graded corpus has no (user, ts) ties — asserted by spec,
    * so the sort is total); the float token arithmetic is the same
    * op sequence both engines (max, /1000·rate, min, ≥1, −1). */
  def rateLimitStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val stream = Tables.eventsStream(spark, sfDir)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val name = s"graft_stream_rate_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = rateLimit(spark, stream, RateCapacity, RateRefillPerSec)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("event_type"), col("value"))
      .orderBy("user_id", "ts").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

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

  /** q113_stream_join_exec — the STREAM-STREAM JOIN graded through a
    * genuine streaming execution: two file-stream sources (clicks,
    * views) → [[streamingClickAttribution]]'s watermarked interval
    * join → Append memory sink (q88's harness; fifth graded streaming
    * path — StreamingSymmetricHashJoinExec joins the windowed-agg,
    * session-merge, dedup and custom-state operators on the graded
    * surface, completing Structured Streaming's stateful-operator
    * family). An INNER stream-stream join emits each matched pair
    * exactly once when both sides have arrived, so the drained result
    * over a bounded file equals the batch interval join row-for-row —
    * watermarks exist to EVICT state, not to gate emission, and the
    * single-file source arrives inside one micro-batch anyway.
    * Timestamps are second-formatted in the output (q23/q25
    * convention); rows stay unique via the two event ids. */
  def clickAttributionStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val clicks = Tables.eventsStream(spark, sfDir)
      .filter(col("event_type") === "click")
    val views = Tables.eventsStream(spark, sfDir)
      .filter(col("event_type") === "view")
    val name = s"graft_stream_attr_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = streamingClickAttribution(clicks, views)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .select(col("click_id"), col("user_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        col("view_id"),
        date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"))
      .orderBy("click_id", "view_id").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q110_stream_userstats_exec — the CUSTOM-STATE API graded through a
    * GENUINE streaming execution: file stream → `groupByKey(user_id)` →
    * [[runningUserStats]]'s `mapGroupsWithState` fold (arbitrary
    * user-defined state, not a built-in aggregate) → Update-mode memory
    * sink (q88's harness; fourth graded streaming path, and the one
    * that exercises FlatMapGroupsWithStateExec). The sink accumulates
    * one row per (key, micro-batch that touched it); the final state
    * per key is recovered as `max(struct(n_events, total_value))` —
    * counts strictly increase across a key's updates, so the struct max
    * IS the last update, independent of micro-batch boundaries.
    *
    * The oracle is the batch aggregate: per-user event count and
    * 2dp-rounded value sum — the count is order-exact; the double sum
    * follows q23/q88's rounding convention (micro-batch fold order vs
    * batch partial-aggregation order differ by ulps, invisible at 2dp).
    * At scale the same plan runs with a timeout to age out idle users;
    * NoTimeout keeps the bounded graded run exact. */
  def userStatsStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val stream = Tables.eventsStream(spark, sfDir)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val name = s"graft_stream_ustats_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = runningUserStats(spark, stream)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("total_value"))).as("w"))
      .select(col("user_id"), col("w.n_events").as("n_events"),
        round(col("w.total_value"), 2).as("total_value"))
      .orderBy("user_id").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** Run `f` with the RocksDB state-store provider — transformWithState
    * (state v2) requires it; the conf is restored afterwards so the
    * HDFS-backed default keeps serving the other stateful paths. */
  private def withRocksDbStateStore[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** q357_stream_tws_exec — ARBITRARY STATE on the state-v2 API
    * (`transformWithState`, Spark 4's replacement for
    * mapGroupsWithState) driven through a genuine streaming run: file
    * stream → groupByKey(user) → [[UserCentsProcessor]] (typed
    * ValueState fold) → Update-mode memory sink, on the ROCKSDB
    * state-store provider (required by the API — also the first graded
    * path on the store production clusters run, where state spills to
    * disk instead of capping at executor heap). 16th graded streaming
    * path: q110 grades the v1 GroupState fold; this grades its
    * successor, whose typed column families (value/list/map state,
    * TTL, timers) are what new pipelines build on.
    *
    * Determinism: q110's rule — counts and integer-cent sums strictly
    * increase per update, so the final state per key is
    * max(struct(n_events, total_cents)) independent of micro-batch
    * boundaries; cents enter as floor(value·100 + 0.5) (the q193
    * convention), one identical IEEE expression in both engines, so
    * no double-sum rounding reaches the graded row.
    *
    * At scale: O(users) ValueState entries partitioned by key across
    * executors' RocksDB instances; a TTLConfig swap ages out idle
    * users without a code change. */
  def userStatsTwsStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val stream = Tables.eventsStream(spark, sfDir)
      .select(col("user_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      .as[(Long, Long)]
    val name = s"graft_stream_tws_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      withRocksDbStateStore(spark) {
        val q = stream.groupByKey(_._1)
          .transformWithState(new UserCentsProcessor,
            TimeMode.None(), OutputMode.Update(),
            org.apache.spark.sql.Encoders.product[UserCents])
          .toDF()
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Update())
          .start()
        try q.processAllAvailable() finally q.stop()
      }
    }
    val out = spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("total_cents"))).as("w"))
      .select(col("user_id"), col("w.n_events").as("n_events"),
        col("w.total_cents").as("total_cents"))
      .orderBy("user_id").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q106_stream_dedup_exec — deduplication graded through a GENUINE
    * streaming execution: file-stream source → `dropDuplicates` on the
    * (user_id, event_type) key → memory sink in Append mode, driven
    * with `processAllAvailable` (q88's harness applied to the
    * STREAMING-DEDUP state operator — StreamingDeduplicateExec keeps
    * one state-store entry per key and emits each key's first
    * arrival). The third graded streaming path after the windowed agg
    * (q88) and session merge (q94).
    *
    * Only the KEY columns are projected before the dedup, which is
    * what makes a bounded run oracle-comparable: micro-batch
    * boundaries and file-split order decide WHICH physical row is each
    * key's first arrival, but not the key set itself, and a key-only
    * row IS its key — the emitted set equals batch `SELECT DISTINCT`
    * regardless of arrival order. At scale the same plan runs with
    * `dropDuplicatesWithinWatermark` so state ages out; the bounded
    * graded run keeps total state = distinct keys, which is the
    * operator's real state bound either way. */
  def dedupStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Tables.eventsStream(spark, sfDir)
    val name = s"graft_stream_dedup_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = stream
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .orderBy("user_id", "event_type").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q178 late-arrival rule: every 20th event of the first two arrival
    * windows straggles into the last batch (ts unchanged — it is the
    * ARRIVAL that is late, the event time is the truth). */
  val LateEveryN = 20

  /** q178_stream_late_exec — WATERMARK LATE-DATA SEMANTICS graded
    * through a real streaming run (8th graded streaming path, and the
    * first where the watermark provably DROPS data): the events table
    * arrives as three deterministic files (day 1-10, 11-20, 21-30 —
    * one micro-batch each via maxFilesPerTrigger=1 + ordered mod
    * times), except every [[LateEveryN]]th event of the first two
    * spans STRAGGLES into batch 3. By then the watermark (max seen
    * event time − 10 min) has passed their hourly windows, so the
    * engine must drop them; stragglers landing in a still-open window
    * (the last pre-cutoff hour) must be KEPT — both sides of the fence
    * are exercised, and Append mode additionally emits ONLY windows
    * the final watermark has closed. The oracle replays the exact
    * per-batch watermark fold in SQL — with the MEASURED commit
    * timing: the watermark filtering micro-batch k is computed from
    * event-time stats through batch k−2, not k−1 (batch k's offsets
    * and watermark commit before batch k−1's stats land, so an update
    * takes effect two batches on; verified against the engine at all
    * three SFs, and the post-data catch-up batches still close every
    * window ≤ global-max − delay). So: wm(k) = max(ts | batch ≤ k−2)
    * − 10 min; a row survives iff its window end > wm(its batch); a
    * window emits iff its end ≤ wm(final). Nothing here is
    * approximate — the micro-batch boundaries are deterministic by
    * construction, so late-data handling itself becomes a
    * hash-graded contract.
    *
    * At scale this IS the production shape: late data is the normal
    * case in distributed collection, the watermark bounds state (open
    * windows only), and the same plan runs against a Kafka source —
    * the file batches stand in for arrival order, which no test
    * corpus can otherwise control. */
  /** Materialize a `b`-tagged frame as one parquet FILE per batch tag
    * (0..nBatches-1) with distinct ascending mod times, so a
    * maxFilesPerTrigger=1 file stream replays the tags as deterministic
    * arrival order — the shared arrival-control harness of the q178/
    * q193 multi-batch streaming paths. Returns the stream directory. */
  private def writeArrivalBatches(
      tagged: DataFrame, cols: Seq[String], prefix: String,
      nBatches: Int): java.io.File = {
    import java.nio.file.Files
    val dir = Files.createTempDirectory(prefix).toFile
    (0 until nBatches).foreach { k =>
      val tmp = new java.io.File(dir, s"_tmp$k")
      tagged.filter(col("b") === k).select(cols.map(col): _*)
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, s"batch$k.parquet")
      Files.move(part.toPath, dst.toPath)
      // distinct, ascending mod times pin the FileStreamSource order
      dst.setLastModified(1700000000000L + k * 60000L)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
    dir
  }

  /** Memoized arrival staging — the staged batch files are a
    * DETERMINISTIC function of (corpus, tagging layout), so the graded
    * multi-batch streaming paths stage each distinct layout ONCE per
    * (session, corpus) instead of once per query run: q237/q275 share
    * the click/view day-band layout outright, q193/q205 read column
    * subsets of one superset day-band staging, and bench reps reuse
    * all of them. The streamed EXECUTIONS still run in full every
    * call — only the batch-side file prep is shared (the production
    * analogue: arrival order is a property of the source, not of each
    * consumer). Keyed like the index-artifact caches; entries of
    * stopped sessions are dropped (their tmp dirs die with the OS
    * tmpdir). */
  // per-key lazy holder: putIfAbsent races resolve on the MAP (cheap —
  // the byname staging write stays unevaluated in the losing holder)
  // and the winner's thread-safe lazy val runs the Spark staging job
  // exactly once WITHOUT a map-wide monitor, so staging unrelated
  // layouts (e.g. "late" vs "dayband") proceeds concurrently instead
  // of serializing every stream-query thread behind one lock
  private final class StagedDir(mk: => java.io.File) {
    lazy val dir: java.io.File = mk
  }
  private val stageCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), StagedDir]
  // staged-batch schema, memoized per staged dir: re-deriving it via
  // spark.read.parquet(batch0).schema costs a parquet-footer job per
  // STREAM SOURCE per run (q237/q275 build two sources each)
  private val stageSchemaCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.types.StructType]
  private def stagedSchema(
      spark: SparkSession, dir: java.io.File): org.apache.spark.sql.types.StructType =
    stageSchemaCache.getOrElseUpdate(dir.getAbsolutePath,
      spark.read.parquet(
        new java.io.File(dir, "batch0.parquet").getAbsolutePath).schema)
  private def stagedBatches(
      spark: SparkSession, sfDir: String, key: String, nBatches: Int)(
      tagged: => DataFrame, cols: Seq[String]): java.io.File = {
    stageCache.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    val k = (spark, sfDir, key)
    val holder = new StagedDir(
      writeArrivalBatches(tagged, cols, s"graft_${key}_", nBatches))
    stageCache.putIfAbsent(k, holder).getOrElse(holder).dir
  }

  /** The superset day-band staging shared by q193 (user stats) and
    * q205 (type counts): both read column subsets of one staged
    * layout — the file source prunes columns like any parquet scan. */
  private def daybandStage(spark: SparkSession, sfDir: String): java.io.File =
    stagedBatches(spark, sfDir, "dayband", 3)({
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
        .withColumn("b",
          when(dayofmonth(col("ts")) <= 10, 0)
            .when(dayofmonth(col("ts")) <= 20, 1).otherwise(2))
    }, Seq("event_id", "ts", "user_id", "event_type", "cents"))

  /** The click/view day-band staging shared by q237 and q275 — staged
    * as one dir PER SIDE so each join source scans only its own type
    * (one shared mixed dir made both sources read and filter all the
    * bytes: 2× scan amplification per run). Same day bands per side ⇒
    * identical trigger pairing and watermark progression as the mixed
    * layout, so the emitted pair set is unchanged (correctness-gated
    * at all three SFs). */
  private def typedBandStage(
      spark: SparkSession, sfDir: String, eventType: String): java.io.File =
    stagedBatches(spark, sfDir, s"${eventType}band", 3)({
      Tables.events(spark, sfDir)
        .filter(col("event_type") === eventType)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .withColumn("b",
          when(dayofmonth(col("ts")) <= 10, 0)
            .when(dayofmonth(col("ts")) <= 20, 1).otherwise(2))
    }, Seq("event_id", "ts", "user_id", "event_type"))

  def lateDataStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedBatches(spark, sfDir, "late", 3)({
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("event_type"))
      val base = when(dayofmonth(col("ts")) <= 10, 0)
        .when(dayofmonth(col("ts")) <= 20, 1).otherwise(2)
      ev.withColumn("b",
        when(base < 2 && col("event_id") % LateEveryN === 0, 2).otherwise(base))
    }, Seq("event_id", "ts", "event_type"))
    val stream = spark.readStream
      .schema(Tables.events(spark, sfDir)
        .select("event_id", "ts", "event_type").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
    val name = s"graft_stream_late_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = stream.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n_events"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .orderBy("win_start", "event_type").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q193_stream_update_exec — UPDATE output mode graded through a real
    * streaming run (9th graded streaming path, and the first in Update
    * mode — the only legal mode for an UNBOUNDED aggregation: Append
    * can never emit rows the state might still change, Complete
    * re-emits the world each trigger): per-user lifetime stats over
    * three deterministic arrival batches (the q178 day-band file
    * harness, no late tagging). Each trigger emits only the users that
    * batch CHANGED — the memory sink therefore accumulates each user's
    * update HISTORY, and because both aggregates are MONOTONE (event
    * count; sum of positive integer cents), the final state is the
    * component-wise max over that history — exactly the fold a
    * downstream upsert sink (the production pairing for Update mode)
    * applies by key. Oracle = the same stats as one batch aggregate,
    * so the hash-match proves replaying the update stream reconstructs
    * the batch answer.
    *
    * Scale shape: the streaming agg keeps one (user) state row per
    * key (watermark-free is honest here: lifetime stats never close);
    * the grading fold is a user-keyed max aggregate over the drained
    * sink. */
  def userStatsUpdateStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = daybandStage(spark, sfDir)
    val stream = spark.readStream
      .schema(stagedSchema(spark, dir))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
      .select(col("event_id"), col("ts"), col("user_id"), col("cents"))
    val name = s"graft_stream_upd_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = stream.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"), max(col("sum_cents")).as("sum_cents"))
      .select(col("user_id"), col("n_events"),
        (col("sum_cents").cast("double") / lit(100.0)).as("sum_value"))
      .orderBy("user_id").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q205_stream_complete_exec — COMPLETE output mode graded through a
    * real streaming run (10th graded streaming path; with q88 Append
    * and q193 Update this closes the output-mode matrix): per-type
    * lifetime counts over the three-batch arrival harness. Complete
    * re-emits the ENTIRE result table each trigger and the memory
    * sink truncates-and-replaces, so the drained table after the last
    * trigger IS the final state — the dashboard-sink semantics
    * (Complete is the mode you pair with a small keyed result that a
    * BI tool reads whole).
    *
    * Scale contract: Complete is only sane when the RESULT is small
    * (here: the type domain) — the state and every emission are
    * result-sized, not input-sized; the input still streams through
    * one keyed partial aggregate per trigger. */
  def typeCountsCompleteStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = daybandStage(spark, sfDir)
    val stream = spark.readStream
      .schema(stagedSchema(spark, dir))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
      .select(col("event_id"), col("ts"), col("event_type"))
    val name = s"graft_stream_cpl_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = stream.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .orderBy("event_type").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q237_stream_outer_join_exec — LEFT-OUTER stream-stream join graded
    * through a real streaming run (11th graded streaming path, and the
    * one where the WATERMARK ITSELF produces rows): q113 grades the
    * inner interval join, where watermarks only evict state — here
    * unmatched clicks must be null-EMITTED, and the engine may do that
    * only once the watermark proves no matching view can still arrive
    * (view_ts ≤ click_ts ⇒ a click is decidable once the watermark
    * passes its own timestamp). Events arrive as the three-day-band
    * file harness (q178's arrival control); after the last data batch
    * the engine's no-data catch-up batches advance the watermark to
    * (min of the two sides' max event time) − 10 min, evicting and
    * null-extending every undecidable-no-longer click. Clicks INSIDE
    * the final watermark tail stay buffered and are legitimately
    * absent — the oracle replays exactly that fence: matched pairs
    * unconditionally (inner results emit on arrival), unmatched clicks
    * iff click_ts < final watermark. The fence's strictness and the
    * catch-up behavior are pinned empirically at all three SFs (the
    * q178 measured-commit-timing method).
    *
    * At scale: state is O(events within watermark+window) per side,
    * user_id partitions it, and the same plan against Kafka emits the
    * organic-click rows a few minutes after real time — the streaming
    * form of q30's "which clicks converted" with the non-converting
    * majority included. */
  def clickAttributionOuterStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    def src(eventType: String): DataFrame = {
      val dir = typedBandStage(spark, sfDir, eventType)
      spark.readStream
        .schema(stagedSchema(spark, dir))
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath)
    }
    val name = s"graft_stream_oj_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = streamingClickAttribution(
          src("click"), src("view"),
          joinType = "left_outer")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .select(col("click_id"), col("user_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"),
        coalesce(date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss"), lit("-"))
          .as("view_ts"))
      .orderBy("click_id", "view_id").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q275_stream_full_outer_join_exec — FULL-outer stream-stream join,
    * completing the graded join-type matrix (q113 inner, q237 left
    * outer): BOTH sides null-extend, each under its OWN watermark
    * fence — an unmatched click emits once no matching view can
    * arrive (click_ts < wm, q237's fence), an unmatched view emits
    * once no FUTURE click can still claim it (view_ts < wm − window:
    * the view's last possible partner sits a full join-window later,
    * so its fence trails by exactly the window). The
    * both-sides-accounted form an auditor wants: every click AND
    * every view appears exactly once, matched or organic.
    *
    * Same three-day-band arrival harness + no-data catch-up batches
    * as q237; the two fences are pinned empirically at all three SFs
    * (q178's method) and the oracle replays them. At scale: state
    * bounded by watermark+window per side, keyed by user. */
  def clickAttributionFullOuterStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    def src(eventType: String): DataFrame = {
      val dir = typedBandStage(spark, sfDir, eventType)
      spark.readStream
        .schema(stagedSchema(spark, dir))
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath)
    }
    val name = s"graft_stream_foj_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = streamingClickAttribution(
          src("click"), src("view"),
          joinType = "full_outer")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name)
      .select(coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(col("user_id"),
          col("view_user")).as("user_id"),
        coalesce(date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss"), lit("-"))
          .as("click_ts"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"),
        coalesce(date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss"), lit("-"))
          .as("view_ts"))
      .orderBy("click_id", "view_id").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q255 histogram cap: sessions longer than this report in the cap
    * bucket (the q230 tail convention). */
  val SessionDurCapMin = 120L

  /** q255_session_durations — session-duration histogram: q25's
    * sessions bucketed by whole-minute duration (tail capped at
    * [[SessionDurCapMin]]) with session counts, exact-ppm shares and
    * the bucket's mean events-per-session — the engagement-depth
    * distribution behind every "average session length" KPI, and the
    * gap-parameter sanity check for the sessionizer itself (a spike at
    * 0 means bursty single-hit traffic; mass at the cap means the
    * 30-minute gap under-splits). Composes [[sessionBounds]] — q25
    * emits the sessions, q101/q128 mine their paths, q67 attributes
    * errors; this reads their shape.
    *
    * Determinism: durations are integer ms differences floored to
    * minutes; shares and per-bucket means are exact integer ppm.
    *
    * Scale shape: the sessionize window is user-keyed (q25's one
    * shuffle); buckets aggregate onto the ≤cap+1 domain with the
    * total broadcast back. */
  def sessionDurations(spark: SparkSession, sfDir: String): DataFrame = {
    val buckets = sessionBounds(spark, sfDir)
      .select(least(
        expr("(unix_millis(s_end) - unix_millis(s_start)) div 60000"),
        lit(SessionDurCapMin)).as("duration_min"), col("n_events"))
      .groupBy(col("duration_min"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
    val tot = buckets.agg(sum(col("n_sessions")).as("n_total"))
    buckets.crossJoin(broadcast(tot))
      .select(col("duration_min"), col("n_sessions"), col("n_events"),
        expr("n_sessions * 1000000 div n_total").as("share_ppm"),
        expr("n_events * 1000000 div n_sessions").as("events_per_session_ppm"))
      .orderBy("duration_min")
  }

  /** q267_max_concurrency — peak concurrent sessions via a sweep line:
    * every session contributes +1 at its start and −1 just after its
    * end (end-inclusive, so back-to-back sessions touching at one µs
    * count as concurrent); the running sum over boundary timestamps
    * is the live-session count, and its maximum is the peak — the
    * capacity number (connection pools, state-store sizing, "how many
    * users at once") that per-hour event counts (q216/q245) only
    * bound from above.
    *
    * Determinism: boundaries in exact µs; same-timestamp deltas are
    * PRE-AGGREGATED per distinct ts (so no within-ts ordering
    * ambiguity exists); the peak reports its EARLIEST attaining ts
    * via struct-max.
    *
    * Scale shape: sessions (q25's user-keyed shuffle) → 2 rows per
    * session via ONE scan-local explode (the sessionize subtree is
    * referenced exactly once — the session count rides the same rows
    * as a start-marker sum instead of a third plan reference) → one
    * ts-keyed delta aggregate; the running sum decomposes block-wise
    * (q53's identity): per-HOUR totals feed one hour-domain ordered
    * window (calendar-bounded — whitelist class) and broadcast back,
    * while the per-ts cumsum window is PARTITIONED by hour, so no
    * unpartitioned window ever sees boundary rows; 1-row output. */
  def maxConcurrency(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    val deltas = sessionBounds(spark, sfDir)
      .select(explode(array(
        struct(unix_micros(col("s_start")).as("us"),
          lit(1L).as("d"), lit(1L).as("st")),
        struct((unix_micros(col("s_end")) + lit(1L)).as("us"),
          lit(-1L).as("d"), lit(0L).as("st")))).as("b"))
      .groupBy(col("b.us").as("us"))
      .agg(sum(col("b.d")).as("d"), sum(col("b.st")).as("st"))
      .withColumn("hr", expr(s"us div $hourUs"))
    // deltas feeds two references (hour totals + the join back) and is
    // deliberately NOT checkpointed: the recompute costs one extra
    // sessionize pass (~0.3 s at sf0.1) but the eager checkpoint's job
    // barrier measured worse (0.93 s vs 1.33 s bench median, 5-rep A/B)
    // — the q31 rule trades off the other way when the subtree is one
    // cheap linear pass rather than a mined artifact.
    val hourTotals = deltas.groupBy(col("hr")).agg(sum(col("d")).as("hd"))
      .withColumn("prefix",
        coalesce(sum(col("hd")).over(Window.orderBy(col("hr"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("hr"), col("prefix"))
    val running = deltas.join(broadcast(hourTotals), "hr")
      .withColumn("conc", col("prefix")
        + sum(col("d")).over(Window.partitionBy(col("hr")).orderBy(col("us"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    running.agg(max(struct(col("conc"), (-col("us")).as("negus"))).as("m"),
      count(lit(1)).as("n_boundary_ts"), sum(col("st")).as("n_sessions"))
      .select(col("m.conc").as("max_concurrency"),
        (-col("m.negus")).as("at_us"), col("n_boundary_ts"),
        col("n_sessions"))
  }

  /** q353_stream_join_agg_exec — STREAM-STREAM JOIN FOLLOWED BY
    * AGGREGATION in one streaming query (14th graded streaming path;
    * with q349 this completes the multi-stateful matrix the engine
    * supports since 3.4: dedup→agg and join→agg): q113's watermarked
    * click↔view interval join feeding an hourly attribution-count
    * window, Append memory sink — the "attribution rate dashboard"
    * every ads pipeline runs as ONE job instead of
    * join-to-Kafka-then-aggregate.
    *
    * Determinism: the inner join's emitted pair set is arrival-order-
    * free (q113's contract); the downstream hourly count therefore
    * depends only on the pair set and the EMISSION FENCE: a window
    * emits once the global watermark — min(max click_ts, max view_ts)
    * − 10 min over the bounded run — passes its end. The oracle
    * replays the batch interval join and applies exactly that fence
    * (q178's measured-fence method; verified at all three SFs).
    *
    * At scale: join state is O(events within watermark+window) per
    * side keyed by user; agg state is open hour windows; the two
    * stateful exchanges partition independently. */
  def attributionRateStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val joined = streamingClickAttribution(
      Tables.eventsStream(spark, sfDir).filter(col("event_type") === "click"),
      Tables.eventsStream(spark, sfDir).filter(col("event_type") === "view"))
    val name = s"graft_stream_ja_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = joined
        .groupBy(window(col("click_ts"), "1 hour").as("win"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("n_pairs"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name).orderBy("win_start").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q354_stream_window_rollup_exec — CHAINED TIME-WINDOW AGGREGATIONS
    * (15th graded streaming path; with q349 dedup→agg and q353
    * join→agg this closes the multi-stateful matrix): hourly event
    * counts ROLLED UP into daily min/max/total hourly load, both
    * windows in ONE streaming plan (`window(window_time(...))` — the
    * multi-layer window API added for exactly this). The production
    * shape where a fine-grained stream metric feeds a coarse dashboard
    * without a second job or an intermediate topic.
    *
    * Determinism: the hourly layer's counts are arrival-order-free;
    * the daily layer consumes only CLOSED hourly windows, and since
    * hours close strictly before their enclosing day, a day that
    * passes the final watermark fence (day end ≤ max ts − 10 min over
    * the bounded run) contains exactly its calendar hours — the
    * oracle replays the batch hour histogram rolled up to days under
    * that fence. On the shipped corpora the fence withholds the final
    * day (its end is past max ts), exercising the withheld side at
    * every SF.
    *
    * At scale: layer-1 state is open hour windows, layer-2 open day
    * windows; both partition by window key across executors. */
  def windowRollupStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"graft_stream_wr_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val hourly = Tables.eventsStream(spark, sfDir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("hw"))
        .agg(count(lit(1)).as("n"))
      val q = hourly
        .groupBy(window(window_time(col("hw")), "1 day").as("dw"))
        .agg(count(lit(1)).as("n_hours"), sum(col("n")).as("n_events"),
          min(col("n")).as("min_hourly"), max(col("n")).as("max_hourly"))
        .select(date_format(col("dw.start"), "yyyy-MM-dd HH:mm:ss").as("day"),
          col("n_hours"), col("n_events"), col("min_hourly"), col("max_hourly"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name).orderBy("day").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** q349_stream_chained_exec — CHAINED STATEFUL OPERATORS in one
    * streaming query (13th graded streaming path, and the first with
    * TWO state stores in one plan): file stream → watermark →
    * `dropDuplicates(user_id, day)` (StreamingDeduplicateExec) →
    * daily-window count aggregate (StateStoreSaveExec) → Append
    * memory sink. Daily active users is THE query this pipeline shape
    * exists for, and multi-stateful support (Spark 3.4+) is what
    * makes it one streaming job instead of dedup-to-Kafka-to-agg.
    *
    * Determinism comes from the q106 key-only rule extended through
    * the chain: the dedup's projected row IS its key (user, truncated
    * day), so micro-batch boundaries choose which PHYSICAL arrival
    * survives but never the emitted key set, and the downstream count
    * per day-window is therefore arrival-order-free. Append mode
    * emits a window only once the watermark passes its end: with a
    * 0-second delay the final watermark is max(day), so every day
    * except the corpus's LAST emits — the last day is legitimately
    * withheld (it could still grow on an unbounded stream), and the
    * oracle replays exactly that fence (`day < max(day)`), making the
    * watermark semantics themselves the graded contract (q178's
    * method, single-batch form).
    *
    * At scale: dedup state = one entry per (user, day) inside the
    * watermark; agg state = open windows; both partition by their
    * keys across executors (the local-cluster smoke proves nothing
    * here is single-JVM). */
  def dailyUniquesChainedStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Tables.eventsStream(spark, sfDir)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("dts"))
      .withWatermark("dts", "0 seconds")
      .dropDuplicates("user_id", "dts")
      .groupBy(window(col("dts"), "1 day").as("win"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("day"),
        col("n_users"))
    val name = s"graft_stream_chain_${streamRunId.incrementAndGet()}"
    withStatePartitions(spark, 4) {
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val out = spark.table(name).orderBy("day").localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }
}
