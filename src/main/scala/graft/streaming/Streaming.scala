package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface. The reference is pure batch (SURVEY §2.11);
  * these extend the engine to streaming ingest with the SAME aggregation
  * expressions as the batch EventQueries — the plan is identical modulo the
  * source, which is the point: one declarative query, two execution modes.
  *
  * Scale posture: the windowed agg is keyed by (window, event_type) with a
  * watermark bounding state; sessionization state is per-user and evicted on
  * timeout — both state stores shard by key across executors.
  */
object Streaming {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionSummary(user_id: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp, total_value: Double)

  private case class SessionState(n: Long, start: Timestamp, end: Timestamp, sum: Double)

  /** Streaming twin of EventQueries.tumblingHourly: watermarked tumbling
    * event-time window aggregate. Append mode emits a window only once its
    * watermark passes — late events inside the watermark still count. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming sessionization via per-key state (the stateful twin of
    * EventQueries.sessionize): a session closes after `gapMinutes` of
    * processing-time inactivity and is emitted as one summary row.
    * State is one small record per live user — O(active users), not
    * O(events). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(userId, s.n, s.start, s.end, s.sum))
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionSummary]
            events.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.end.getTime > gapMinutes * 60000L =>
                  closed += SessionSummary(userId, s.n, s.start, s.end, s.sum)
                  cur = Some(SessionState(1, e.ts, e.ts, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.n + 1, s.start, e.ts, s.sum + e.value))
                case None =>
                  cur = Some(SessionState(1, e.ts, e.ts, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(s"$gapMinutes minutes")
            }
            closed.result().iterator
          }
      }
  }

  /** Typed event for the EXACT-sum sessionizer: `cents` is the value already
    * bridged to scaled-integer money (`cast(decimal(14,2)) * 100 → long`),
    * so state accumulates longs — exact in any association order, unlike a
    * running double sum, and bit-identical to the oracle's decimal sum. */
  case class CentsEvent(event_id: Long, ts: Timestamp, user_id: Long, cents: Long)

  case class CentsSession(user_id: Long, n_events: Long, session_start: Timestamp,
      session_end: Timestamp, total_cents: Long)

  /** Per-user live-session state. Public (not `private`): the streaming
    * state store serializes it through Janino-compiled encoder code in
    * another package, and a Scala-private nested class lowers to
    * package-private bytecode that code cannot resolve. */
  case class CentsState(n: Long, startUs: Long, endUs: Long, cents: Long)

  /** Full-precision micros — `Timestamp.getTime` alone truncates to millis. */
  private def tsMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000) % 1000000L

  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** EVENT-TIME sessionization (vs [[sessionize]]'s processing-time flavor):
    * sessions split on >`gapMinutes` of event-time inactivity, state is
    * evicted by the WATERMARK (`setTimeoutTimestamp` = session end + gap), so
    * a stalled user costs one state row until the event-time clock — not a
    * wall clock — passes their gap. This is the production-correct flavor:
    * replaying history at 100× speed yields identical sessions, which a
    * processing-time timeout cannot promise.
    *
    * Within a batch, events are ordered by (event-time micros, event_id) —
    * the same total order as the batch sessionizer's window sort — and every
    * gap comparison is in integer micros, so batch and streaming agree
    * exactly. Requires `withWatermark` upstream and Append output mode. */
  def sessionizeEventTime(events: Dataset[CentsEvent],
      gapMinutes: Int = 30): Dataset[CentsSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CentsState, CentsSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[CentsEvent], state: GroupState[CentsState]) =>
          def emit(s: CentsState) = CentsSession(userId, s.n,
            microsTs(s.startUs), microsTs(s.endUs), s.cents)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(s))
          } else {
            val evs = batch.toIndexedSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[CentsSession]
            evs.foreach { e =>
              val us = tsMicros(e.ts)
              cur match {
                case Some(s) if us - s.endUs > gapUs =>
                  closed += emit(s)
                  cur = Some(CentsState(1, us, us, e.cents))
                case Some(s) =>
                  cur = Some(CentsState(s.n + 1, s.startUs, us, s.cents + e.cents))
                case None =>
                  cur = Some(CentsState(1, us, us, e.cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout once the WATERMARK passes the session's close point
              state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60000L + 1)
            }
            closed.result().iterator
          }
      }
  }

  /** Typed row for the late-data accountant: the watermark rides on `ts`;
    * `event_id == -1` marks a per-key FLUSH sentinel (same convention as
    * the q92 drive). Public for the state-store encoder (see CentsState). */
  case class KeyedEvent(event_id: Long, ts: Timestamp, event_type: String)

  case class OnTimeCount(event_type: String, n_on_time: Long)

  /** WATERMARK LATE-DATA ACCOUNTING (q166, VERDICT r8 #3) — the missing
    * stateful class at the gate next to window (q81), join (q90), custom
    * session state (q92) and dedup state (q103): what the watermark DROPS.
    * Rows arriving behind the watermark are discarded by the engine BEFORE
    * any stateful operator sees them (the state for their event time is
    * already finalized/evicted); this operator counts, per key, the rows
    * that SURVIVE that filter. The driver feeds a batch that straddles the
    * watermark and reconciles the count against the batch total — the
    * difference IS the dropped volume, the per-key data-loss report every
    * production watermark needs.
    *
    * Mechanics: per-key running count in `flatMapGroupsWithState` with
    * EventTimeTimeout (the conf that arms the engine's late-row filter);
    * a flush sentinel (event_id == -1, far-future ts, one per key) emits
    * the key's count and clears its state — the deterministic q92 pattern,
    * no watermark-race no-data batch needed. State is one long per live
    * key. Requires `withWatermark("ts", …)` upstream, Append mode. */
  def onTimeCounts(events: Dataset[KeyedEvent]): Dataset[OnTimeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[Long, OnTimeCount](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[KeyedEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var n = state.getOption.getOrElse(0L)
            var flush = false
            batch.foreach { e => if (e.event_id == -1L) flush = true else n += 1 }
            if (flush) { state.remove(); Iterator.single(OnTimeCount(key, n)) }
            else { state.update(n); Iterator.empty }
          }
      }
  }

  /** Streaming exact dedup — the streaming twin of Dedup.exactDedup for
    * continuous corpus ingest: fingerprint each document (md5 of content)
    * and keep the first arrival per fingerprint. The watermark bounds the
    * dedup state store: a fingerprint older than the watermark is evicted,
    * so state is O(docs per watermark window), not O(corpus) — the only
    * formulation that survives unbounded ingest. Exact global dedup over
    * all history belongs in the batch operator (or an external key store).
    *
    * `tsCol` is the event-time column the watermark rides on; `keyCols`
    * defaults to the content fingerprint added as `fingerprint`. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Stream-stream inner join with event-time bounds: each click joins the
    * error events of the same user within the preceding `gapMinutes`. Both
    * sides carry watermarks, and the time-range predicate bounds the join
    * state on BOTH sides (Spark evicts a buffered row once the other
    * side's watermark passes its join window) — the only stream-stream
    * join formulation whose state does not grow without bound. */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame,
      gapMinutes: Int = 60, watermark: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val e = errors.withWatermark("ts", watermark)
      .select(col("user_id").as("e_user"), col("ts").as("error_ts"),
        col("event_id").as("error_id"))
    // OUTER variants are legal ONLY because the time-range predicate plus
    // both watermarks bound the join state: a left row's null-match emits
    // once the error-side watermark passes its join window, and the state
    // entry is evicted — the same condition that keeps the inner join's
    // buffers finite.
    // full_outer adds error-only rows whose click side is entirely NULL —
    // the join key must then come from whichever side exists
    val userCol =
      if (joinType == "full_outer") coalesce(col("user_id"), col("e_user"))
      else col("user_id")
    c.join(e,
      col("user_id") === col("e_user") &&
        col("error_ts") <= col("click_ts") &&
        col("error_ts") >= col("click_ts") - expr(s"INTERVAL $gapMinutes MINUTES"),
      joinType)
      .select(userCol.as("user_id"), col("click_id"), col("error_id"),
        col("click_ts"), col("error_ts"))
  }

  // ---- transformWithState (the Spark 4 arbitrary-state API) ----

  case class TwsEvent(userId: Long, isSentinel: Boolean, cents: Long)
  case class TwsAgg(n: Long, cents: Long)
  case class TwsCountSum(user_id: Long, n_events: Long, total_cents: Long)

  /** Per-key count/sum on `transformWithState` — Spark 4's successor to
    * flatMapGroupsWithState: typed named state objects obtained from a
    * handle in `init` instead of one opaque GroupState blob, per-state
    * TTLs, and timer callbacks. One ValueState accumulates (n, cents);
    * a per-key FLUSH SENTINEL (q92's drive pattern) emits the final row
    * and clears the state. Emission is deterministic regardless of
    * intra-batch row order (ADVICE r9): the batch is folded BEFORE the
    * sentinel is applied — data rows accumulate into a batch-local
    * (n, cents) delta and the sentinel only flags the flush, so a
    * sentinel sharing a micro-batch with same-key data rows flushes
    * state + the WHOLE batch delta, wherever the sentinel sat in
    * iterator order (counts and integer cent sums are
    * order-independent). Requires the RocksDB
    * state store provider (the API's contract); the gate scopes that
    * conf to the drive. At scale the state shards by key exactly like
    * the flatMapGroupsWithState operators — the API changes ergonomics
    * and state layout, not the shuffle shape. */
  class CountSumProcessor extends StatefulProcessor[Long, TwsEvent, TwsCountSum] {
    @transient private var agg: ValueState[TwsAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[TwsAgg]("agg",
        Encoders.product[TwsAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
        timers: TimerValues): Iterator[TwsCountSum] = {
      // fold the batch first, apply the sentinel LAST (see class doc):
      // iterator order inside a micro-batch is not part of the contract
      var dn = 0L; var dcents = 0L; var flush = false
      rows.foreach { e =>
        if (e.isSentinel) flush = true
        else { dn += 1; dcents += e.cents }
      }
      val prev = if (agg.exists()) agg.get() else TwsAgg(0L, 0L)
      val merged = TwsAgg(prev.n + dn, prev.cents + dcents)
      if (flush) {
        agg.clear()
        Iterator.single(TwsCountSum(key, merged.n, merged.cents))
      } else {
        if (dn > 0) agg.update(merged)
        Iterator.empty
      }
    }
  }

  def twsCountSum(events: Dataset[TwsEvent]): Dataset[TwsCountSum] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new CountSumProcessor, TimeMode.None(), OutputMode.Append())
  }

  case class TimedEvent(userId: Long, ts: Timestamp)
  case class TimerFlush(user_id: Long, n_events: Long)

  /** The TIMER half of the transformWithState contract: counts per key,
    * emits ONLY from `handleExpiredTimer` when the event-time watermark
    * passes (last seen ts + gapMs) — the new-API formulation of q92's
    * timeout-closed sessions. Each input batch re-arms the key's single
    * timer (delete + register, tracked in a ValueState — `registerTimer`
    * does not replace an earlier registration by itself). Deterministic
    * under an event-time drive: timers fire exactly when a later batch's
    * watermark crosses the expiry, never on wall-clock. */
  class TimerCountProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TimedEvent, TimerFlush] {
    @transient private var cnt: ValueState[Long] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
        timers: TimerValues): Iterator[TimerFlush] = {
      var n = if (cnt.exists()) cnt.get() else 0L
      var maxTs = Long.MinValue
      rows.foreach { e => n += 1; maxTs = math.max(maxTs, e.ts.getTime) }
      // an empty iterator (possible under future engine batching changes)
      // must not arm a garbage MinValue+gap timer
      if (maxTs != Long.MinValue) {
        cnt.update(n)
        val expiry = maxTs + gapMs
        if (armed.exists()) getHandle.deleteTimer(armed.get())
        getHandle.registerTimer(expiry)
        armed.update(expiry)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[TimerFlush] = {
      val n = if (cnt.exists()) cnt.get() else 0L
      cnt.clear(); armed.clear()
      Iterator.single(TimerFlush(key, n))
    }
  }

  def twsTimerCounts(events: Dataset[TimedEvent], gapMs: Long): Dataset[TimerFlush] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "0 seconds")
      .as[TimedEvent]
      .groupByKey(_.userId)
      .transformWithState(new TimerCountProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** foreachBatch sink: per-micro-batch idempotent parquet append — the
    * standard exactly-once-to-storage pattern (batchId-keyed subdirectory;
    * a replayed batch overwrites its own output instead of duplicating).
    * Runs with Trigger.AvailableNow semantics via processAllAvailable in
    * [[runOnce]]-style drives; swap the body for MERGE INTO on a
    * transactional table format in production. */
  /** Peak stateful-operator footprint per drive (r15, VERDICT r14 #7 —
    * the streaming family's skew behavior was the one SCALING.md didn't
    * measure). After every drive the helpers below record the MAX of
    * `sum(stateOperators.numRowsTotal)` across the query's recent
    * progress events — the peak row count the state store actually held,
    * the number that grows when a hot key buffers a corpus-scale side of
    * a stream-stream join. [[graft.tools.ScaleProbe]] resets before and
    * reads after each probed gate and publishes the 1×/N× peaks as
    * `state` columns in SCALING.md. Zero overhead on the drive itself
    * (progress events are already collected by the engine). */
  object StateMeter {
    private val peak =
      new java.util.concurrent.ConcurrentHashMap[String, Long]()
    private[streaming] def record(
        q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val rows = q.recentProgress.iterator
        .map(p => p.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)
      peak.merge(q.name, rows, (a: Long, b: Long) => math.max(a, b)): Unit
    }
    def reset(): Unit = peak.clear()
    /** Largest peak any drive recorded since the last reset. */
    def maxRows: Long = {
      var m = 0L
      peak.values.forEach(v => m = math.max(m, v))
      m
    }
  }

  /** File-source stream over `source`, which may be a directory OR a single
    * parquet file. FileStreamSource force-sets `basePath` to the path
    * whenever the path is NOT a glob, and then rejects a non-directory
    * basePath — so a plain file path can never work. Rewriting the file
    * path as a one-file glob (`…/events.parque[t]`) suppresses that
    * override; glob base paths resolve to the parent directory. */
  private def fileStream(spark: SparkSession, source: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val schema = spark.read.parquet(source).schema
    val f = new java.io.File(source)
    val path =
      if (f.isFile) s"${source.dropRight(1)}[${source.last}]"
      else source
    spark.readStream.schema(schema).options(options).parquet(path)
  }

  /** Scale-ADAPTIVE state-store partition count (r15, guide §2 "derive
    * partitioning from input size, never a constant tuned for either
    * local mode or the cluster"): one state partition per 32 MiB of
    * source bytes, floor 2. The old constant 8 was the r4 fix for the
    * same disease one level up (32 = CPU count), but it still paid
    * ~0.1 s of per-partition state-store commit + task-launch machinery
    * per drive for toy state: the q216 drive measured 3.66–3.99 s at
    * np=8 vs 2.67–2.91 s at np=2 with byte-identical output (19 870
    * rows), and the saving is pure fixed overhead — batch 2 of that
    * drive carries ZERO input rows yet cost 745 ms at np=8 (all
    * addBatch) vs 382 ms at np=2. A deployment pins the count with
    * `SPARK_GRAFT_STATE_PARTITIONS` (state sizing is an operational
    * decision; the 32 MiB divisor is a default, not a law). Recovery
    * safety: a streaming checkpoint persists its own
    * `spark.sql.shuffle.partitions` in the offset-log conf and reuses
    * it on restart, so q184's two-invocation recovery pair cannot
    * diverge even if the derived count changed between runs. */
  private[streaming] def statePartitionsFor(source: String): Int =
    sys.env.get("SPARK_GRAFT_STATE_PARTITIONS").map(_.toInt).getOrElse {
      def bytes(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(bytes).sum).getOrElse(0L)
      val b = bytes(new java.io.File(source))
      math.max(2L, (b + (32L << 20) - 1) / (32L << 20)).toInt
    }

  /** Run `body` with `spark.sql.shuffle.partitions` (= the stateful
    * operators' state-store partition count) sized to the drive's state
    * volume instead of the batch session's CPU count, restoring after.
    * State partitioning is a per-deployment sizing decision pinned into
    * the checkpoint; for the gate drives, 32 partitions would mean 16×
    * the state files, fsyncs, and per-batch task launches for toy state
    * (the ~12-14 s streaming-family fixed overhead of VERDICT r4 #6 was
    * dominated by exactly this). `n = 0` (the drive helpers' default)
    * derives the count from the source via [[statePartitionsFor]].
    *
    * CONTRACT: the conf change is SESSION-GLOBAL while `body` runs — any
    * batch query planned concurrently in the same session would silently
    * inherit the streaming state sizing. The gate drives (Verify/Bench)
    * execute queries strictly sequentially, which is the only mode this
    * helper supports; a host that plans batch work concurrently with a
    * streaming drive must run the drive in `spark.cloneSession()` (per-
    * session conf isolation) instead. */
  private def withStatePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  /** `checkpointDir`: pass the SAME path across two invocations to
    * exercise checkpoint RECOVERY (q184) — the restarted query replays
    * committed offsets, reloads the state store, and continues from the
    * last batch boundary. foreachBatch (unlike the memory sink, whose
    * queries set recoverFromCheckpointLocation = false) supports restart;
    * per-batch parquet dirs are idempotent under the overwrite mode if a
    * batch is re-run. Default: a fresh checkpoint per drive, as before. */
  def runForeachBatch(spark: SparkSession, sourceDir: String, outDir: String,
      plan: DataFrame => DataFrame, name: String,
      sourceOptions: Map[String, String] = Map.empty,
      statePartitions: Int = 0,
      checkpointDir: Option[String] = None,
      outputMode: String = "append"): Unit = withStatePartitions(spark,
    if (statePartitions > 0) statePartitions else statePartitionsFor(sourceDir)) {
    val stream = fileStream(spark, sourceDir, sourceOptions)
    val q = plan(stream).writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir.getOrElse(
        graft.Scratch.freshFast(s"ckpt_${name}_").resolve("ckpt").toString))
      .queryName(name)
      .start()
    try q.processAllAvailable() finally { StateMeter.record(q); q.stop() }
  }

  /** STREAMING MERGE SINK (q252) — foreachBatch that maintains a keyed
    * SNAPSHOT TABLE under the generation-pointer model instead of
    * appending per-batch files: each micro-batch's keyed deltas
    * full-outer-merge with the CURRENT published snapshot into a new
    * generation directory, and `_CURRENT` flips only after the write —
    * batch N+1 merges into batch N's published result, a crash between
    * write and flip leaves the previous complete snapshot live, and a
    * reader never sees a half-merged table (the q242 staging discipline
    * applied once per batch; at scale the write keys by bucket like
    * q205's COW so only delta-touched buckets rewrite). `delta` maps a
    * raw batch to (key BIGINT, n_delta BIGINT, cents_delta BIGINT). */
  def runMergeSink(spark: SparkSession, sourceDir: String, root: String,
      delta: DataFrame => DataFrame, name: String,
      sourceOptions: Map[String, String] = Map.empty,
      statePartitions: Int = 0): Unit =
    withStatePartitions(spark,
        if (statePartitions > 0) statePartitions else statePartitionsFor(sourceDir)) {
      import org.apache.spark.sql.functions._
      val stream = fileStream(spark, sourceDir, sourceOptions)
      val q = stream.writeStream
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val d = delta(batch.toDF())
          val merged = graft.operators.Ann.currentGeneration(spark, root) match {
            case Some(gen) =>
              spark.read.parquet(s"$root/$gen")
                .join(d, Seq("key"), "full_outer")
                .select(col("key"),
                  (coalesce(col("n"), lit(0L))
                    + coalesce(col("n_delta"), lit(0L))).as("n"),
                  (coalesce(col("cents"), lit(0L))
                    + coalesce(col("cents_delta"), lit(0L))).as("cents"))
            case None =>
              d.select(col("key"), col("n_delta").as("n"),
                col("cents_delta").as("cents"))
          }
          val gen = graft.operators.Ann.nextGenerationName(spark, root)
          merged.write.mode("overwrite").parquet(s"$root/$gen")
          graft.operators.Ann.publishGeneration(spark, root, gen)
        }
        .option("checkpointLocation",
          graft.Scratch.freshFast(s"ckpt_${name}_").resolve("ckpt").toString)
        .queryName(name)
        .start()
      try q.processAllAvailable() finally { StateMeter.record(q); q.stop() }
    }

  /** Run a streaming query over a parquet directory source and collect the
    * result synchronously via the memory sink — the local-mode harness for
    * the streaming plans above (file source + memory sink are the no-Kafka
    * test rig; swap `readStream.parquet` for a Kafka source in production).
    *
    * `mode` defaults to Complete because a one-shot static-file drive never
    * advances the watermark past the data's tail, so Append would emit
    * nothing for windowed aggregates; pass Append for stateful plans
    * (flatMapGroupsWithState) that require it in a live deployment. */
  def runOnce(spark: SparkSession, sourceDir: String,
      plan: DataFrame => DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete(),
      sourceOptions: Map[String, String] = Map.empty,
      statePartitions: Int = 0): DataFrame = withStatePartitions(spark,
    if (statePartitions > 0) statePartitions else statePartitionsFor(sourceDir)) {
    val stream = fileStream(spark, sourceDir, sourceOptions)
    val q = plan(stream).writeStream
      .outputMode(mode)
      // tmpfs checkpoint: the memory sink makes this drive non-durable by
      // construction, so disk-fsynced state/offset logs are pure overhead
      .option("checkpointLocation",
        graft.Scratch.freshFast(s"ckpt_${name}_").resolve("ckpt").toString)
      .format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally { StateMeter.record(q); q.stop() }
    spark.table(name)
  }
}
