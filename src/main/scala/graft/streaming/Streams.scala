package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.10 Structured Streaming shapes (SURVEY.md).
  *
  * The reference (a public Hadoop release, /root/reference/README.md:4) has
  * no streaming engine — streaming-ish Hadoop work is incremental batch over
  * directories. Here each operator is written as a TRANSFORM over a DataFrame
  * that is unbounded-safe (works under readStream + watermark, verified with
  * MemoryStream in ScalaTest) and registered in batch mode on `events` so the
  * DuckDB oracle can hash-check the semantics.
  *
  * Scale notes: event-time windows + watermarks bound state linearly in
  * (#keys × #open windows); session windows merge in the state store; dedup
  * state is bounded by the watermark horizon. All aggregations here are
  * partial-aggregated before the shuffle.
  */
/** Typed event row for the stateful operators (matches the events fixture). */
case class GraftEvent(ts: java.sql.Timestamp, event_type: String,
                      user_id: Long, event_id: Long)

/** Accumulating per-user session state carried by [[Streams.runningUserStats]]. */
case class UserState(n_events: Long, last_type: String)

/** Typed state value for [[UserTotalsProcessor]] (top-level for the Encoder). */
case class UserTotals(n_events: Long, max_event_id: Long)

/** One unioned input row for the stateful streaming as-of ([[Streams.latestPurchaseAsof]]):
  * dim updates (purchases, `is_dim = true`) and fact events share the stream,
  * keyed by user — the standard shape when the dimension itself is an
  * unbounded stream (the case the stream-STATIC as-of cannot cover). */
case class AsofStreamRow(ts: java.sql.Timestamp, user_id: Long, event_id: Long,
                         is_dim: Boolean, event_type: String)

/** Latest dim update seen so far for one key: event time in microseconds +
  * the dim row id (tiebreak). Monotone — see [[LatestDimAsofProcessor]]. */
case class LastDimState(ts_us: Long, pid: Long)

/** The two primitives every as-of state site shares, in ONE place (round-16
  * review: three verbatim copies of each had crept in across the
  * single-level, buffered, and epoch-keyed processors — a future fix to
  * either would have had to land in lockstep at every site or the
  * spellings' equality contract silently diverges). */
object LastDimState {
  /** µs since epoch. getTime already includes the millisecond part of
    * nanos; add back the sub-millisecond microseconds so µs-precision
    * fixture timestamps order exactly. */
  def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** The monotone advance test: candidate `c` replaces the current state
    * iff strictly later by (ts_us, pid). */
  def advances(cur: Option[LastDimState], c: LastDimState): Boolean =
    cur.forall(p => c.ts_us > p.ts_us || (c.ts_us == p.ts_us && c.pid > p.pid))
}

/** State TTL shared by the stateful processors: None = keep forever (the
  * fixture contract — every key stays live), Some(ms) = expire a key's
  * state that long after its last write. At 100 TB an unbounded key space
  * (user ids) never expires otherwise, so production deployments set
  * [[Streams.StateTtlConf]]. Spark only allows TTL under
  * TimeMode.ProcessingTime (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL),
  * so the builders switch time mode when a TTL is configured. */
object StateTtl {
  def config(ttlMs: Option[Long]): org.apache.spark.sql.streaming.TTLConfig =
    ttlMs.map(ms => org.apache.spark.sql.streaming.TTLConfig(
        java.time.Duration.ofMillis(ms)))
      .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE)
}

/** TRUE stateful streaming as-of join (round 13 — the round-12 verdict's
  * "what's missing" #3): each fact event is enriched with the most recent
  * dim update at-or-before its event time, with the dim side UNBOUNDED —
  * state is one O(1) `ValueState[LastDimState]` per key, so streaming memory
  * is linear in #keys regardless of how many dim updates flow past (the
  * foreachBatch/MergeAsofExec spelling re-reads a bounded dim per micro-batch;
  * this is the latest-value join for the unbounded-dim case).
  *
  * Ordering contract (the standard latest-value streaming join): per key,
  * rows are processed in event-time order WITHIN each micro-batch (sorted
  * here), and the stream is assumed in-order ACROSS micro-batches — i.e. a
  * fact arrives after every dim update at-or-before its timestamp. The state
  * cell is MONOTONE (only advances in (ts, id)), which makes a late dim
  * update safe by construction: if the state has already advanced past it,
  * every future in-order fact has ts ≥ the state's ts > the late dim's ts,
  * so ignoring it is exactly the as-of answer. Dims sort before facts at an
  * equal timestamp — the as-of contract is inclusive. Batch mode delivers
  * all rows per key as one call of [[handleInputRows]], so the batch run is
  * the exact event-time as-of join, which is the DuckDB oracle. */
class LatestDimAsofProcessor(ttlMs: Option[Long] = None)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, AsofStreamRow, (Long, Long, String, Option[Long])] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ValueState}
  @transient private var last: ValueState[LastDimState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[LastDimState]("lastDim",
      org.apache.spark.sql.Encoders.product[LastDimState], StateTtl.config(ttlMs))

  import LastDimState.{micros, advances}

  override def handleInputRows(user: Long, rows: Iterator[AsofStreamRow],
                               tv: TimerValues): Iterator[(Long, Long, String, Option[Long])] = {
    val sorted = rows.toSeq.sortBy(r => (micros(r.ts), if (r.is_dim) 0 else 1, r.event_id))
    var cur = if (last.exists()) Some(last.get()) else None
    val out = Vector.newBuilder[(Long, Long, String, Option[Long])]
    sorted.foreach { r =>
      if (r.is_dim) {
        val c = LastDimState(micros(r.ts), r.event_id)
        if (advances(cur, c)) cur = Some(c)
      } else out += ((r.event_id, user, r.event_type, cur.map(_.pid)))
    }
    cur.foreach(last.update)
    out.result().iterator
  }
}

/** OUT-OF-ORDER-tolerant stateful streaming as-of (round 14 — verdict #1):
  * the same enrichment contract as [[LatestDimAsofProcessor]] but WITHOUT
  * that processor's in-order-across-micro-batches assumption. Every row —
  * dim update or fact — buffers in an event-time `ListState` until the
  * watermark passes it; on each batch and on event-time timers, buffered
  * rows with ms-truncated event time STRICTLY behind the watermark are
  * finalized in event-time order (dims advance the monotone
  * `ValueState[LastDimState]`, facts emit enriched) and the rest stay
  * buffered. The watermark contract — no future input with event time
  * behind the watermark — is exactly the finalization guard, so a fact
  * delayed across micro-batches still sees every dim at-or-before its
  * timestamp: correctness depends only on the watermark, not arrival
  * order. The strict whole-millisecond compare (`ts.getTime < wm`) keeps
  * µs-precision rows safe: a future row in the same millisecond, whatever
  * its sub-ms part, can never sort at-or-before an already-flushed fact.
  *
  * State per key is O(rows inside the watermark horizon) + O(1) — the
  * bound Spark's own stream-stream join keeps; at 100 TB the horizon (the
  * `withWatermark` delay) is the knob, not the stream length. A timer at
  * (earliest buffered ms + 1) guarantees a quiet key still drains when
  * other keys advance the watermark. Under `TimeMode.None` (the batch
  * twin) there is no watermark: all rows arrive in one call and flush
  * immediately (wm = +∞), computing the exact event-time as-of — the same
  * DuckDB oracle as the in-order variant. Timers exist only in EventTime
  * mode, and Spark forbids TTL outside ProcessingTime mode, so the state
  * here is TTL-less; horizon-bounded buffering is the expiry story. */
/** Dev-only master switch for the streaming flush diagnostics (the per-run
  * rewrite/read/cleanup counters below and in [[EpochBufferedAsofProcessor]]).
  * OFF by default (round-17 ADVICE: the production flush path should not pay
  * a shared-map access per key per batch, and the per-run entries are never
  * evicted) — StreamingSpec flips it on for its delta-asserts; a deployment
  * can opt in with `-Dgraft.streaming.diag=true`. Volatile, not a session
  * conf: the counters are JVM-local dev instrumentation, not library
  * surface, and the processors that consult it run on executor task threads
  * where no SparkSession is in scope. */
object StreamDiag {
  @volatile var enabled: Boolean = java.lang.Boolean.getBoolean("graft.streaming.diag")
}

object BufferedAsofProcessor {
  /** Dev diagnostic: full-buffer ListState rewrites performed by
    * [[BufferedAsofProcessor.flush]], scoped PER STREAMING RUN (round-16
    * verdict #4 — the former JVM-global AtomicLong made the StreamingSpec
    * write-amplification delta-assert sound only under a documented
    * single-writer assumption; keying by the query's runId, read off
    * `getHandle.getQueryInfo` at init, replaces that assumption with
    * structure: concurrent BufferedAsofProcessor queries in one JVM count
    * separately, spec-pinned with two live queries). The round-15 fix the
    * counter exists to pin: flush skips the rewrite on batches that flush
    * nothing — a key inside a long watermark horizon previously paid an
    * O(horizon) state write per micro-batch. Not part of the library
    * surface; entries are never evicted (a handful of UUIDs per test JVM —
    * dev-only, bounded by #runs). */
  private val rewrites =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.util.concurrent.atomic.AtomicLong]

  private[streaming] def bumpRewrite(runId: java.util.UUID): Unit =
    if (StreamDiag.enabled)
      rewrites.computeIfAbsent(runId, _ => new java.util.concurrent.atomic.AtomicLong)
        .incrementAndGet()

  /** Rewrites performed by the run with this id (0 if it never rewrote). */
  def stateRewrites(runId: java.util.UUID): Long =
    Option(rewrites.get(runId)).fold(0L)(_.get())

  /** Dev diagnostic (per-run, same scoping): full-buffer ListState READS
    * materialized by flush. Round 17 — the read-side sibling of the
    * rewrite-skip: a batch whose watermark provably reaches nothing (the
    * armed drain timer's expiry − 1 is the buffer's min event time, and
    * every incoming row is at/after the watermark) appends WITHOUT
    * re-materializing the O(horizon) buffer; the StreamingSpec
    * write-amplification case pins reads stay flat across such batches. */
  private val reads =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.util.concurrent.atomic.AtomicLong]

  private[streaming] def bumpRead(runId: java.util.UUID): Unit =
    if (StreamDiag.enabled)
      reads.computeIfAbsent(runId, _ => new java.util.concurrent.atomic.AtomicLong)
        .incrementAndGet()

  /** Full-buffer reads performed by the run with this id. */
  def bufferReads(runId: java.util.UUID): Long =
    Option(reads.get(runId)).fold(0L)(_.get())

  /** Fallback runId when no streaming QueryInfo exists (the batch twin —
    * which never calls flush, so never counts). */
  private[streaming] val NoRun = new java.util.UUID(0L, 0L)

  private[streaming] def runIdOf(h: org.apache.spark.sql.streaming.StatefulProcessorHandle): java.util.UUID =
    try h.getQueryInfo.getRunId catch { case _: Exception => NoRun }
}

class BufferedAsofProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, AsofStreamRow, (Long, Long, String, Option[Long])] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
    TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var last: ValueState[LastDimState] = _
  @transient private var buf: ListState[AsofStreamRow] = _
  @transient private var eventTime: Boolean = _
  @transient private var runId: java.util.UUID = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    last = getHandle.getValueState[LastDimState]("lastDim",
      org.apache.spark.sql.Encoders.product[LastDimState], TTLConfig.NONE)
    buf = getHandle.getListState[AsofStreamRow]("buffer",
      org.apache.spark.sql.Encoders.product[AsofStreamRow], TTLConfig.NONE)
    eventTime = timeMode == TimeMode.EventTime()
    runId = BufferedAsofProcessor.runIdOf(getHandle)
  }

  import LastDimState.{micros, advances}

  /** Process finalized rows in event-time order against the monotone
    * latest-dim state: dims advance it, facts emit enriched. */
  private def finalizeRows(ready: Vector[AsofStreamRow]): Iterator[(Long, Long, String, Option[Long])] =
    if (ready.isEmpty) Iterator.empty
    else {
      var cur = if (last.exists()) Some(last.get()) else None
      val out = Vector.newBuilder[(Long, Long, String, Option[Long])]
      ready.sortBy(r => (micros(r.ts), if (r.is_dim) 0 else 1, r.event_id))
        .foreach { r =>
          if (r.is_dim) {
            val c = LastDimState(micros(r.ts), r.event_id)
            if (advances(cur, c)) cur = Some(c)
          } else out += ((r.event_id, r.user_id, r.event_type, cur.map(_.pid)))
        }
      cur.foreach(last.update)
      out.result().iterator
    }

  /** Finalize every buffered row whose event time is strictly behind the
    * watermark (ms units — the watermark's own granularity); re-buffer the
    * rest and arm a timer so they drain even if this key goes quiet.
    * `armedPre` threads the timer set handleInputRows already read for its
    * READ-skip check, so a flushing input batch pays exactly one
    * listTimers like before the skip existed. */
  private def flush(wmMs: Long, armedPre: Option[Set[Long]] = None)
      : Iterator[(Long, Long, String, Option[Long])] = {
    BufferedAsofProcessor.bumpRead(runId)
    val (ready, rest) = buf.get().toVector.partition(_.ts.getTime < wmMs)
    def armed: Set[Long] = armedPre.getOrElse(
      getHandle.listTimers().map(_.asInstanceOf[Long]).toSet)
    if (rest.isEmpty) {
      buf.clear()
      // buffer fully drained: a timer armed earlier would now fire a
      // pointless no-op flush — remove it so drained keys hold no timers.
      // Materialize BEFORE deleting (like the re-arm path below): deleting
      // under the live listTimers() iterator mutates the timer store
      // mid-iteration on providers whose iterator is not snapshot-isolated
      armed.foreach(getHandle.deleteTimer)
    } else {
      // ready.isEmpty ⇒ the ListState already holds exactly `rest`
      // (appends land before flush, nothing was removed), so skip the
      // rewrite: a key inside a long watermark horizon would otherwise
      // pay an O(horizon) RocksDB write per micro-batch
      if (ready.nonEmpty) {
        BufferedAsofProcessor.bumpRewrite(runId)
        buf.put(rest.toArray)
      }
      // keep exactly one armed timer per key: registering a duplicate
      // expiry WARNs, and stale earlier timers fire pointless flushes
      val want = rest.iterator.map(_.ts.getTime).min + 1L
      val a = armed
      a.iterator.filter(_ != want).foreach(getHandle.deleteTimer)
      if (!a.contains(want)) getHandle.registerTimer(want)
    }
    finalizeRows(ready)
  }

  override def handleInputRows(user: Long, rows: Iterator[AsofStreamRow],
                               tv: TimerValues): Iterator[(Long, Long, String, Option[Long])] =
    if (eventTime) {
      val incoming = rows.toArray
      val wm = tv.getCurrentWatermarkInMs()
      // READ-skip (round 17, the rewrite-skip's sibling): the armed drain
      // timer's expiry − 1 IS the buffer's min event time (flush invariant:
      // exactly one armed timer at min-ts + 1), so when the watermark sits
      // below it AND below every incoming row, nothing can finalize —
      // append without re-materializing the O(horizon) buffer. A stale
      // later timer (if one ever existed) only makes the check
      // conservative; the skip never changes output, only when the buffer
      // is read.
      val armed = getHandle.listTimers().map(_.asInstanceOf[Long]).toSet
      val skip = armed.nonEmpty && wm < armed.min &&
        incoming.forall(_.ts.getTime >= wm)
      buf.appendList(incoming)
      if (skip) {
        // incoming rows may extend the buffer's FRONT: keep the single
        // armed timer at the new min-ts + 1 so quiet-key draining stays
        // anchored to the true minimum
        val want =
          if (incoming.isEmpty) armed.min
          else math.min(armed.min, incoming.iterator.map(_.ts.getTime).min + 1L)
        if (want != armed.min) {
          armed.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(want)
        }
        Iterator.empty
      } else flush(wm, Some(armed))
    } else {
      // batch twin: one call per key, wm = +∞, nothing was ever buffered —
      // finalize directly instead of round-tripping every row through the
      // RocksDB ListState (measured 5.3× the in-order variant's cost at
      // the 64× events probe before this path; at par — 2.0 s vs 2.8 s
      // in-window — after)
      finalizeRows(rows.toVector)
    }

  /** A fired timer is itself a watermark proof: Spark expires timers
    * against the END-of-batch (eviction) watermark, while
    * getCurrentWatermarkInMs() reports the START-of-batch (late-events)
    * one — flushing with only the latter would see no eligible rows and
    * re-arm the just-fired timer, an infinite no-data-batch loop (found by
    * the round-14 spec hanging). max(wm, expiry) finalizes at least the
    * earliest buffered row per fire, so timer-driven draining always makes
    * progress and terminates. */
  override def handleExpiredTimer(user: Long, tv: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[(Long, Long, String, Option[Long])] =
    // listTimers inside a fire still reports the FIRING timer (Spark
    // removes it after the callback), so exclude it from the armed view:
    // flush would otherwise deleteTimer() the auto-removed entry — a WARN
    // per fired timer per key, measured at 6.1M log lines (~800 MB of log
    // I/O) in one 64× buffered probe run (round 18)
    flush(math.max(tv.getCurrentWatermarkInMs(), info.getExpiryTimeInMs()),
      Some(getHandle.listTimers().map(_.asInstanceOf[Long]).toSet
        - info.getExpiryTimeInMs()))
}

/** Per-user running totals on the Spark 4 `transformWithState` API — the
  * successor of flatMapGroupsWithState, with named typed state cells
  * (`ValueState`/`ListState`/`MapState`, optional TTL) instead of one opaque
  * blob per key. State here is one O(1) `ValueState[UserTotals]` per user, so
  * streaming memory is linear in #users regardless of stream length. */
class UserTotalsProcessor(ttlMs: Option[Long] = None)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, GraftEvent, (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ValueState}
  @transient private var totals: ValueState[UserTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserTotals]("totals",
      org.apache.spark.sql.Encoders.product[UserTotals], StateTtl.config(ttlMs))

  override def handleInputRows(user: Long, rows: Iterator[GraftEvent],
                               tv: TimerValues): Iterator[(Long, Long, Long)] = {
    val evs = rows.toSeq
    val prev = if (totals.exists()) totals.get() else UserTotals(0L, 0L)
    val next = UserTotals(prev.n_events + evs.size,
                          math.max(prev.max_event_id, evs.map(_.event_id).max))
    totals.update(next)
    Iterator((user, next.n_events, next.max_event_id))
  }
}

object Streams {
  type Q = (SparkSession, String) => DataFrame

  /** Session conf: state TTL in ms for the stateful processors (unset =
    * keep state forever, the fixture contract). See [[StateTtl]] — setting
    * it also switches the tws builders to TimeMode.ProcessingTime, the only
    * mode Spark allows TTL under. */
  val StateTtlConf = "spark.graft.stream.stateTtlMs"

  private def ttlFromConf(s: SparkSession): Option[Long] =
    graft.Confs.longConf(s, StateTtlConf)

  /** Arbitrary keyed state (the §2.10 `stream_stateful` stream-side shape):
    * per-user running event counts + last event type, maintained with
    * flatMapGroupsWithState so it runs identically under readStream with
    * update mode. Batch twin (oracle-checked) is [[streamStateful]]. */
  def runningUserStats(events: org.apache.spark.sql.Dataset[GraftEvent])
      : DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, (Long, Long, String)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, evs, state: GroupState[UserState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val prev = state.getOption.getOrElse(UserState(0L, ""))
          val next = UserState(prev.n_events + sorted.size,
            sorted.lastOption.map(_.event_type).getOrElse(prev.last_type))
          state.update(next)
          Iterator((user, next.n_events, next.last_type))
      }
      .toDF("user_id", "n_events", "last_type")
  }

  // -- shared transforms: one body for batch (oracle) and stream (tests) ----

  /** Fixed 1h tumbling windows per event type. withWatermark is a no-op in
    * batch mode, so the same function serves both engines of verification. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
              col("event_type"), col("cnt"))

  /** Overlapping 1h windows sliding every 15 min. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
              col("event_type"), col("cnt"))

  /** 30-minute-gap sessionization per user. */
  def sessionStats(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
              col("session_window.end").as("s_end"), col("cnt"))

  // -- batch registrations (oracle-checked) ---------------------------------

  val streamTumbling: Q = (s, d) =>
    tumblingCounts(Tables.events(s, d))

  val streamTumblingSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
      |       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
      |       event_type, count(*) AS cnt
      |FROM events
      |GROUP BY w_start, w_end, event_type
      |ORDER BY w_start, event_type""".stripMargin

  val streamSliding: Q = (s, d) =>
    slidingCounts(Tables.events(s, d))

  /** Every event belongs to exactly 4 sliding windows whose starts are the
    * 15-min buckets at and before it (window 1h ⊃ all 4 by construction). */
  val streamSlidingSql: String =
    """SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS w_start,
      |       time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' + INTERVAL '1 hour' AS w_end,
      |       event_type, count(*) AS cnt
      |FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
      |GROUP BY w_start, w_end, event_type
      |ORDER BY w_start, event_type""".stripMargin

  val streamSession: Q = (s, d) =>
    sessionStats(Tables.events(s, d))

  /** Gaps-and-islands twin of session_window: a new session starts when the
    * gap to the previous event is >= 30 min (Spark session end is exclusive:
    * last_ts + gap). */
  val streamSessionSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS s_start,
      |       max(ts) + INTERVAL '30 minutes' AS s_end, count(*) AS cnt
      |FROM sessions
      |GROUP BY user_id, sid
      |ORDER BY user_id, s_start""".stripMargin

  /** Deterministic batch twin of streaming dropDuplicates: first event id per
    * (user, type). The streaming form (watermark + dropDuplicates) is unit
    * tested with MemoryStream. */
  val streamDedup: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(min(col("event_id")).as("first_event"))

  val streamDedupSql: String =
    """SELECT user_id, event_type, min(event_id) AS first_event
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** Watermark shape in batch: hourly counts over the last day relative to
    * the stream's max event time. The actual late-row-drop behavior (rows
    * older than watermark excluded from open windows) is unit tested with
    * MemoryStream; this batch twin is oracle-checked. */
  val streamWatermarkLate: Q = (s, d) => {
    val ev = Tables.events(s, d)
    // the 1-row horizon aggregate is explicitly broadcast (scalar-subquery
    // lowering): pins the plan to a broadcast loop join over one row rather
    // than leaving the join strategy to size estimation
    val horizon = ev.agg((max(col("ts")) - expr("INTERVAL 1 DAY")).as("h"))
    tumblingCounts(ev.crossJoin(broadcast(horizon)).where(col("ts") >= col("h")))
  }

  val streamWatermarkLateSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
      |       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
      |       event_type, count(*) AS cnt
      |FROM events
      |WHERE ts >= (SELECT max(ts) - INTERVAL '1 day' FROM events)
      |GROUP BY w_start, w_end, event_type
      |ORDER BY w_start, event_type""".stripMargin

  /** Arbitrary-keyed-state shape in batch: per-user lifetime stats a
    * flatMapGroupsWithState pipeline would maintain (count, first/last event
    * time, total value). The stateful streaming execution is unit tested. */
  val streamStateful: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("first_ts"),
           max(col("ts")).as("last_ts"),
           sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))

  val streamStatefulSql: String =
    """SELECT user_id, count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts,
      |       cast(sum(cast(value as decimal(12,2))) as double) AS total_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** One shared body for batch (oracle) and stream (unit test): per-user
    * totals via [[UserTotalsProcessor]]. Batch runs it as a single
    * implicit micro-batch, so the output equals the plain per-user
    * aggregate — which is exactly the DuckDB oracle. */
  def userTotalsTws(events: org.apache.spark.sql.Dataset[GraftEvent],
                    ttlMs: Option[Long] = None): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // TTL is only assignable under ProcessingTime (Spark's
    // STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL guard)
    val mode = if (ttlMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events.groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor(ttlMs), mode, OutputMode.Update())
      .toDF("user_id", "n_events", "max_event_id")
  }

  /** transformWithState in BATCH mode needs the RocksDB state store provider
    * (the default HDFS-backed provider cannot host its named state cells and
    * fails with CANNOT_LOAD_STATE_STORE) plus the StateStoreCoordinator RPC
    * endpoint, which only a streaming query would have created — in a
    * batch-only session store load dies with RpcEndpointNotFoundException.
    * Bootstrap the coordinator through the query manager's lazy val
    * (private[sql] in Scala = public in bytecode, hence the reflection). */
  private def bootstrapBatchTws(s: SparkSession): Unit = {
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.streams.getClass.getMethods
      .find(_.getName == "stateStoreCoordinator")
      .foreach(_.invoke(s.streams))
  }

  /** The one save/bootstrap/restore block scoping the RocksDB provider
    * conf to a batch tws run (round-13 advisor: a permanent set silently
    * switched the state-store provider of every later stream_* query on
    * the shared session; round-16 review: three verbatim copies had
    * accumulated across the two batch-tws wrappers and the StreamingSpec
    * test helper). Callers choose what eager materialization (if any)
    * happens inside the scope. */
  private[graft] def scopedBatchTws[A](s: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    bootstrapBatchTws(s)
    try body
    finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None => s.conf.unset(key)
    }
  }

  /** Runs `body`'s plan EAGERLY via localCheckpoint inside the provider
    * scope — the state-store execution happens here, executor-side, no
    * driver collect. The checkpointed frame is RDD-backed, which
    * graft.Bench already rebuilds per pass (embedsRddState), so bench
    * timings still cover the operator. */
  private def withBatchTws(s: SparkSession)(body: => DataFrame): DataFrame =
    scopedBatchTws(s)(body.localCheckpoint())

  /** [[withBatchTws]] for a body that ALREADY materializes its stateful
    * stage internally (the epoch-keyed as-of checkpoints its pass-1 output
    * to feed two branches): the provider conf can be restored as soon as
    * the body has built — its downstream plan is state-store-free — and a
    * second full-output checkpoint would only duplicate the write. */
  private def withBatchTwsPreMaterialized(s: SparkSession)(body: => DataFrame): DataFrame =
    scopedBatchTws(s)(body)

  val streamTransformState: Q = (s, d) => {
    import s.implicits._
    withBatchTws(s) {
      userTotalsTws(Tables.events(s, d)
          .select(col("ts"), col("event_type"), col("user_id"), col("event_id"))
          .as[GraftEvent],
        ttlFromConf(s))
    }
  }

  val streamTransformStateSql: String =
    """SELECT user_id, count(*) AS n_events, max(event_id) AS max_event_id
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** One shared body for batch (oracle) and stream (unit test): the
    * stateful streaming as-of of [[LatestDimAsofProcessor]]. Append mode —
    * each fact row is emitted exactly once, already enriched. */
  def latestPurchaseAsof(rows: org.apache.spark.sql.Dataset[AsofStreamRow],
                         ttlMs: Option[Long] = None): DataFrame = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val mode = if (ttlMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    rows.groupByKey(_.user_id)
      .transformWithState(new LatestDimAsofProcessor(ttlMs), mode, OutputMode.Append())
      .toDF("event_id", "user_id", "event_type", "last_purchase_id")
  }

  /** One shared body for batch (oracle) and stream (unit test): the
    * OUT-OF-ORDER-tolerant as-of of [[BufferedAsofProcessor]]. The stream
    * side MUST carry a watermark on `ts` (EventTime mode — buffering and
    * timers hang off it); the batch side runs TimeMode.None, where the
    * processor flushes everything in its single per-key call — the exact
    * event-time as-of. */
  def latestPurchaseAsofBuffered(rows: org.apache.spark.sql.Dataset[AsofStreamRow],
                                 streaming: Boolean = false): DataFrame = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val mode = if (streaming) TimeMode.EventTime() else TimeMode.None()
    rows.groupByKey(_.user_id)
      .transformWithState(new BufferedAsofProcessor, mode, OutputMode.Append())
      .toDF("event_id", "user_id", "event_type", "last_purchase_id")
  }

  /** Batch registration of the stateful streaming as-of: purchases are the
    * unbounded dim-update stream, every other event is a fact; each fact
    * gets the user's most recent purchase id at-or-before its timestamp
    * (NULL before the first purchase). Batch mode hands the processor all
    * rows per key in one call, so this computes the exact event-time as-of
    * join — the DuckDB oracle below. */
  private def asofStreamRows(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("ts"), col("user_id"), col("event_id"),
              (col("event_type") === "purchase").as("is_dim"), col("event_type"))
      .as[AsofStreamRow]
  }

  /** `spark.graft.asof.epochKey` (epoch width in seconds) selects the
    * two-level-key skew escape of [[EpochAsof]] — same contract and oracle,
    * but a hot user's stream processes in parallel across epochs (the
    * round-15 hot-key probe measured the single-level spelling at 2.6× on a
    * 50%-hot key; BASELINE.md). Unset = single-level default. */
  val streamAsofState: Q = (s, d) =>
    EpochAsof.epochWidthFor(s) match {
      case Some(w) => withBatchTwsPreMaterialized(s) {
        // ttl honored in BOTH spellings (round-16 review: the epoch branch
        // silently dropped it)
        EpochAsof.latestPurchaseAsofEpoch(asofStreamRows(s, d), w,
          ttlMs = ttlFromConf(s))
      }
      case None => withBatchTws(s) {
        latestPurchaseAsof(asofStreamRows(s, d), ttlFromConf(s))
      }
    }

  /** Batch registration of the out-of-order-tolerant as-of: same contract
    * and oracle as [[streamAsofState]] (batch mode flushes everything —
    * the exact as-of); what differs is the STREAMING execution, where this
    * variant needs no cross-batch ordering — the MemoryStream spec delivers
    * facts out of order across micro-batches and still matches the oracle. */
  val streamAsofBuffered: Q = (s, d) =>
    EpochAsof.epochWidthFor(s) match {
      // the epoch escape's BATCH twin is the same exact as-of for both
      // family members (batch flushes everything), so the buffered
      // registration reuses it under the conf; what differs is the
      // STREAMING spelling (EpochBufferedAsofProcessor, spec-pinned on an
      // out-of-order MemoryStream)
      case Some(w) => withBatchTwsPreMaterialized(s) {
        EpochAsof.latestPurchaseAsofEpoch(asofStreamRows(s, d), w,
          ttlMs = ttlFromConf(s))
      }
      case None => withBatchTws(s) {
        latestPurchaseAsofBuffered(asofStreamRows(s, d))
      }
    }

  val streamAsofStateSql: String =
    """WITH p AS (
      |  SELECT user_id, ts, max(event_id) AS pid
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |f AS (
      |  SELECT event_id, user_id, ts, event_type FROM events
      |  WHERE event_type <> 'purchase'),
      |ranked AS (
      |  SELECT f.event_id, f.user_id, f.event_type, p.pid,
      |         row_number() OVER (PARTITION BY f.event_id
      |                            ORDER BY p.ts DESC, p.pid DESC) AS rn
      |  FROM f LEFT JOIN p ON f.user_id = p.user_id AND p.ts <= f.ts)
      |SELECT event_id, user_id, event_type, pid AS last_purchase_id
      |FROM ranked WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  /** Sink-mode shape: complete-mode aggregate (memory/append/update modes are
    * exercised in the MemoryStream unit tests). */
  val streamSink: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))

  val streamSinkSql: String =
    """SELECT event_type, count(*) AS cnt FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Stream-static join: the unbounded event stream enriched by a broadcast
    * static dimension (customer). Structured Streaming supports this shape
    * natively in append mode with no state; at 100 TB the dim broadcast is
    * refreshed per micro-batch. Batch registration (oracle-checked) here;
    * streaming execution unit-tested with MemoryStream on the stream side. */
  def enrichWithCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(broadcast(customer), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("cnt"))

  val streamJoinStatic: Q = (s, d) =>
    enrichWithCustomer(Tables.events(s, d), Tables.customer(s, d))

  val streamJoinStaticSql: String =
    """SELECT c_mktsegment, event_type, count(*) AS cnt
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type
      |ORDER BY c_mktsegment, event_type""".stripMargin

  /** Stream-stream interval join: per user, each view followed by a purchase
    * within 30 minutes (funnel/attribution shape). Under readStream BOTH
    * sides carry watermarks and the time-bound condition bounds the join
    * state (Spark evicts buffered rows past watermark+interval); the batch
    * registration is the same equi+range join, oracle-checked. */
  def viewToPurchase(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
                         col("event_id").as("v_id"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
                             col("event_id").as("p_id"))
    v.join(p, col("v_user") === col("p_user") &&
              col("p_ts") >= col("v_ts") &&
              col("p_ts") < col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("v_user").as("user_id"), col("v_id"), col("p_id"),
              col("v_ts"), col("p_ts"))
  }

  val streamJoinStream: Q = (s, d) => {
    val ev = Tables.events(s, d)
    viewToPurchase(ev.where(col("event_type") === "view"),
                   ev.where(col("event_type") === "purchase"))
  }

  val streamJoinStreamSql: String =
    """SELECT v.user_id, v.event_id AS v_id, p.event_id AS p_id,
      |       v.ts AS v_ts, p.ts AS p_ts
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL '30 minutes'
      |ORDER BY v.user_id, v_id, p_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "stream_join_static" -> streamJoinStatic,
    "stream_join_stream" -> streamJoinStream,
    "stream_tumbling" -> streamTumbling,
    "stream_sliding" -> streamSliding,
    "stream_session" -> streamSession,
    "stream_dedup" -> streamDedup,
    "stream_watermark_late" -> streamWatermarkLate,
    "stream_stateful" -> streamStateful,
    "stream_transform_state" -> streamTransformState,
    "stream_asof_state" -> streamAsofState,
    "stream_asof_buffered" -> streamAsofBuffered,
    "stream_sink" -> streamSink,
    // round 18: streaming MinHash-LSH near-dup admission (batch twin
    // registered; the streaming spelling is StreamingSpec-pinned equal)
    "stream_neardup" -> ((s, d) => StreamNeardup.admitNeardupBatch(s, d)),
    // round 19: streaming embedding-cosine (SemDeDup) admission (batch twin
    // registered; the streaming IVF-cell spelling is StreamingSpec-pinned
    // equal under exact-mode numProbe)
    "stream_semdedup" -> ((s, d) => StreamSemdedup.semdedupBatch(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "stream_join_static" -> streamJoinStaticSql,
    "stream_join_stream" -> streamJoinStreamSql,
    "stream_tumbling" -> streamTumblingSql,
    "stream_sliding" -> streamSlidingSql,
    "stream_session" -> streamSessionSql,
    "stream_dedup" -> streamDedupSql,
    "stream_watermark_late" -> streamWatermarkLateSql,
    "stream_stateful" -> streamStatefulSql,
    "stream_transform_state" -> streamTransformStateSql,
    "stream_asof_state" -> streamAsofStateSql,
    "stream_asof_buffered" -> streamAsofStateSql, // same contract, different engine
    "stream_sink" -> streamSinkSql,
    "stream_neardup" -> StreamNeardup.streamNeardupSql,
    "stream_semdedup" -> StreamSemdedup.semdedupSql,
  )

  /** Registered SORT-FREE (round 15): the trailing ORDER BY on these was
    * comparator scaffolding over outputs no streaming consumer would ever
    * see globally ordered (a stream sink is append/update, not sorted) —
    * for the as-of pair it range-exchanged the full enriched fact stream
    * per bench pass. Keys are total orders: event_id is the fact PK,
    * (w_start, event_type) the window-aggregate key, (user_id, s_start)
    * the session key. Verify applies these; equal to each oracle's
    * trailing ORDER BY (ExplainInvariantsSpec pins it). */
  val dumpSort: Map[String, Seq[String]] = Map(
    "stream_asof_state" -> Seq("event_id"),
    "stream_asof_buffered" -> Seq("event_id"),
    "stream_sliding" -> Seq("w_start", "event_type"),
    "stream_session" -> Seq("user_id", "s_start"),
    // tranche 3 (round 15): comparator-only trailing sorts over unique keys
    "stream_tumbling" -> Seq("w_start", "event_type"),
    "stream_dedup" -> Seq("user_id", "event_type"),
    "stream_watermark_late" -> Seq("w_start", "event_type"),
    "stream_stateful" -> Seq("user_id"),
    "stream_transform_state" -> Seq("user_id"),
    "stream_join_static" -> Seq("c_mktsegment", "event_type"),
    "stream_join_stream" -> Seq("user_id", "v_id", "p_id"),
    "stream_sink" -> Seq("event_type"),
    "stream_neardup" -> Seq("doc_id"),
    "stream_semdedup" -> Seq("vec_id"),
  )
}
