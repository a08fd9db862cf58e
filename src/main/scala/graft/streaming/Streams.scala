package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Structured Streaming pipelines over the events stream. The
  * transforms are defined once and shared by the batch registry
  * queries (EventQueries) and streaming jobs — the Spark analog of
  * running the same SQL on TiDB's TP stream and AP snapshot.
  *
  * At scale: `windowed` is an incremental stateful aggregation keyed
  * by (window, event_type); `SessionTracker` keeps one small state
  * object per user key and emits sessions on inactivity timeout —
  * both shard across executors by key.
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionState(nSessions: Long, lastTsMicros: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long,
      n_events: Long)

  /** Tumbling 1-hour windowed aggregation — works identically on a
    * batch DataFrame and a streaming one. */
  def windowed(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Sliding (hopping) windows shared by batch and streaming — the
    * e_window_slide plan under a stream: each event lands in 4
    * overlapping 24 h windows on a 6 h hop, state evicted by the
    * watermark like any windowed agg. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day", "6 hours")
        .getField("start").as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** OHLC candles shared by batch and streaming — e_ohlc's plan
    * under a stream: min_by/max_by partials carry (value, order-key)
    * through the stateful agg, so live candles need no sort or
    * window either. */
  def ohlc(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").getField("start").as("w_start"),
        col("event_type"))
      .agg(expr("min_by(value, struct(ts, event_id))").as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        expr("max_by(value, struct(ts, event_id))").as("close"),
        count(lit(1)).as("volume"))

  /** Native session windows (30-minute gap), shared by batch and
    * streaming: under a stream this runs Spark's stateful
    * SessionWindow merge with watermark-driven eviction — the same
    * operator family as the reference's continuous aggregation over
    * the TP stream. */
  def sessioned(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"), col("sum_value"))

  /** CHAINED stateful aggregation (Spark 4 multiple-stateful-operator
    * support): hourly windowed totals re-windowed into a daily rollup
    * inside ONE query — the streaming twin of a two-level rollup
    * materialized view. The second groupBy windows over the first's
    * `window` struct column; under a stream both levels keep their own
    * watermark-evicted state and daily rows finalize when the
    * watermark passes the day. */
  def dailyRollup(events: DataFrame, stream: Boolean): DataFrame = {
    val base = if (stream) events.withWatermark("ts", "10 minutes")
      else events
    val hourly = base
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("v"))
    hourly
      .groupBy(window(col("window"), "1 day"), col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("v")).cast("double").as("sum_value"))
      .select(col("window.start").as("d_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming exact dedup on a business key within the watermark
    * horizon — the streaming twin of d_dedup_exact: state holds one
    * entry per key and ages out with the watermark, so memory is
    * bounded by the horizon, not the stream length. */
  def dedupedWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_type", "user_id")

  final case class UserTotals(user_id: Long, n_events: Long,
      sum_value: Double)

  /** Spark 4 arbitrary-state v2 (`transformWithState`): a per-user
    * running totals processor on typed ValueState. State lives in the
    * RocksDB state store, one small record per key, TTL-capable —
    * the modern replacement for mapGroupsWithState and the engine's
    * continuous-aggregation primitive at scale. */
  class TotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserTotals] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var totals: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Double)],
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserTotals] = {
      var (n, v) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; v += e.value }
      totals.update((n, v))
      Iterator.single(UserTotals(key, n, math.round(v * 100) / 100.0))
    }
  }

  /** transformWithState pipeline over the event stream (requires the
    * RocksDB state store provider). */
  def runningTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks in the preceding hour. Watermarks on BOTH sides
    * let Spark bound the join state (clicks older than the horizon
    * are evicted), so state size tracks the interval, not the stream
    * length — the scalable form of event-correlation joins. */
  def clickPurchaseJoin(clicks: DataFrame,
      purchases: DataFrame): DataFrame =
    clickPurchaseJoinOf(clicks, purchases, "inner")

  /** LEFT OUTER variant of [[clickPurchaseJoin]]: purchases with no
    * click in the preceding hour still emit, click columns null —
    * the conversion-attribution shape ("purchases no click drove").
    * In a live stream the null-padded row for purchase P is emitted
    * only once the global watermark passes P (no matching click can
    * arrive anymore), which is exactly the same eviction horizon
    * that bounds the inner join's state — outer emission costs no
    * extra state, it just turns eviction into output. */
  def clickPurchaseOuterJoin(clicks: DataFrame,
      purchases: DataFrame): DataFrame =
    clickPurchaseJoinOf(clicks, purchases, "left_outer")

  /** The full interval-join matrix ([[clickPurchaseJoin]]'s condition
    * with any join type). right_outer keeps every CLICK, null-padding
    * the purchase columns for clicks that drove no purchase within
    * the hour (the abandoned-funnel shape); full_outer both sides; in every
    * variant the null-padded row is emitted only once the global
    * watermark proves no partner can arrive, off the SAME eviction
    * horizon that bounds the inner state — Spark supports all four
    * types on watermarked interval conditions, and the spec proves
    * null-side emission for each. */
  def clickPurchaseJoinOf(clicks: DataFrame, purchases: DataFrame,
      joinType: String): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    p.join(c, col("c_user") === col("p_user") &&
      col("click_ts") <= col("purchase_ts") &&
      col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      joinType)
      .select(col("purchase_id"), col("click_id"), col("p_user"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Streaming AS-OF join: per purchase, the LATEST click of the
    * same user within the preceding hour — the streaming twin of the
    * batch e_asof, restricted to a bounded lookback (an unbounded
    * as-of cannot bound stream state; the 1-hour window IS the
    * production contract). Two CHAINED stateful operators: the
    * watermarked interval join emits (purchase, candidate-click)
    * pairs, and the downstream window-keyed aggregation reduces them
    * to the max (click_ts, click_id) per purchase, emitting once the
    * watermark proves no later candidate can arrive. The purchase's
    * event-time column flows through the join, so the aggregation
    * inherits its watermark — the Spark 3.5+/4 multi-stateful
    * pipeline shape. */
  def clickPurchaseAsof(clicks: DataFrame,
      purchases: DataFrame): DataFrame =
    clickPurchaseJoinOf(clicks, purchases, "inner")
      .groupBy(window(col("purchase_ts"), "1 hour"),
        col("purchase_id"), col("p_user"))
      .agg(max(struct(col("click_ts"), col("click_id"))).as("best"))
      .select(col("purchase_id"), col("p_user"),
        col("best.click_ts").as("click_ts"),
        col("best.click_id").as("click_id"))

  final case class SessionOut(user_id: Long, s_start: java.sql.Timestamp,
      n_events: Long)

  /** CEP pattern state: automaton stage (0 = idle, 1 = saw view,
    * 2 = saw view..click) + completed-match count. */
  final case class CepState(stage: Int, count: Long)

  /** Streaming CEP — e_pattern's automaton twin: per user, count
    * view→click→purchase sequences with no error between, as a
    * stateful automaton in flatMapGroupsWithState (the earliest-
    * match automaton computes exactly the batch entry's lazy-regex
    * non-overlapping count). Events are sorted by event time INSIDE
    * each micro-batch; cross-batch correctness holds when batches
    * arrive in event-time order (the spec drives a time-split feed)
    * — a production job buffers by watermark before the automaton,
    * exactly like the session emitter below. One tiny state object
    * per user, sharded by key. */
  def cepMatches(events: Dataset[Event]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id).flatMapGroupsWithState[
        CepState, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (user: Long, it: Iterator[Event], state: GroupState[CepState]) =>
        val st0 = state.getOption.getOrElse(CepState(0, 0L))
        var stage = st0.stage
        var count = st0.count
        it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          e.event_type.charAt(0) match {
            case 'e' => stage = 0
            case 'v' if stage == 0 => stage = 1
            case 'c' if stage == 1 => stage = 2
            case 'p' if stage == 2 => count += 1; stage = 0
            case _ => ()
          }
        }
        state.update(CepState(stage, count))
        Iterator((user, count))
    }
  }

  /** Session EMISSION via flatMapGroupsWithState: closed sessions are
    * emitted as rows (not just counted) — one output row per
    * completed 30-min-gap session, state = the single open session
    * per user. In a live stream the open session would close on an
    * event-time timeout; driving a finite batch through the stream
    * flushes it when the group's input ends (flagged by `flushTail`).
    */
  def sessionRows(events: Dataset[Event],
      flushTail: Boolean): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = 30L * 60 * 1000000
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    events.groupByKey(_.user_id).flatMapGroupsWithState[
      (Long, Long, Long), SessionOut](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (userId: Long, batch: Iterator[Event],
          state: GroupState[(Long, Long, Long)]) =>
        var open = state.getOption // (startUs, lastUs, n)
        val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
        batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val tsUs = DateTimeUtils.fromJavaTimestamp(e.ts)
          open match {
            // strict <: an event exactly at last+gap falls outside the
            // [last, last+gap) window — matches session_window's
            // exclusive end.
            case Some((s0, last, n)) if tsUs - last < gapUs =>
              open = Some((s0, tsUs, n + 1))
            case Some((s0, _, n)) =>
              out += SessionOut(userId, DateTimeUtils.toJavaTimestamp(s0), n)
              open = Some((tsUs, tsUs, 1L))
            case None =>
              open = Some((tsUs, tsUs, 1L))
          }
        }
        if (flushTail) {
          open.foreach { case (s0, _, n) =>
            out += SessionOut(userId, DateTimeUtils.toJavaTimestamp(s0), n)
          }
          state.remove()
        } else open.foreach(state.update)
        out.iterator
    }
  }

  /** Session EMISSION on a LIVE stream: the open session closes when
    * the event-time watermark passes its inactivity deadline
    * (`GroupStateTimeout.EventTimeTimeout`), not when the input ends —
    * no batch `flushTail` crutch. Each key holds one timer at
    * `last + gap`; when it fires the completed session is emitted and
    * the state removed, so state stays one small record per ACTIVE
    * user and drains as users go quiet. Sessions that complete inside
    * a batch are emitted immediately; only the tail session per user
    * waits for the watermark.
    *
    * Out-of-order merges: a late-but-within-watermark event may land
    * BEFORE the open session's bounds, so the merge extends
    * `[start, last]` with min/max rather than assuming event-time
    * order across batches. Requires `watermarkDelay < gap`: then any
    * surviving late event is at most `delay < gap` behind the open
    * start, so it always merges into (never precedes) the open
    * session and one state record per key stays sufficient. */
  def sessionRowsStream(events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val gapUs = 30L * 60 * 1000000
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
            state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (s0, _, n) = state.get
            state.remove()
            Iterator.single(
              SessionOut(userId, DateTimeUtils.toJavaTimestamp(s0), n))
          } else {
            var open = state.getOption // (startUs, lastUs, n)
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val tsUs = DateTimeUtils.fromJavaTimestamp(e.ts)
              open match {
                case Some((s0, last, n)) if tsUs - last < gapUs =>
                  open = Some((math.min(s0, tsUs), math.max(last, tsUs),
                    n + 1))
                case Some((s0, _, n)) =>
                  out += SessionOut(userId,
                    DateTimeUtils.toJavaTimestamp(s0), n)
                  open = Some((tsUs, tsUs, 1L))
                case None =>
                  open = Some((tsUs, tsUs, 1L))
              }
            }
            open.foreach { st =>
              state.update(st)
              // Fire once the watermark passes last + gap (strictly
              // after the current watermark, as the API requires).
              state.setTimeoutTimestamp(math.max(st._2 / 1000 + gapUs / 1000,
                state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Stateful sessionization via mapGroupsWithState: counts sessions
    * per user with a 30-minute inactivity gap. The per-group state is
    * O(1) (count + last timestamp), so state storage stays bounded
    * regardless of event volume. */
  def sessionCounts(events: Dataset[Event]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000
    events.groupByKey(_.user_id).mapGroupsWithState[
      (SessionState, Long), UserSessions] {
      (userId: Long, batch: Iterator[Event],
          state: GroupState[(SessionState, Long)]) =>
        val (prev, prevEvents) =
          state.getOption.getOrElse((SessionState(0L, Long.MinValue), 0L))
        var s = prev
        var n = prevEvents
        batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val tsUs = e.ts.getTime * 1000
          val newSession = s.lastTsMicros == Long.MinValue ||
            tsUs - s.lastTsMicros > gapUs
          s = SessionState(s.nSessions + (if (newSession) 1 else 0), tsUs)
          n += 1
        }
        state.update((s, n))
        UserSessions(userId, s.nSessions, n)
    }
  }

  /** Stream-static enrichment — the dimension-join every event
    * pipeline runs (reference analog: the TP stream joining a
    * dim table snapshot). The static side is re-resolved per
    * micro-batch (so a slowly-changing dimension picks up updates
    * between batches) and BROADCAST: the stream side never
    * shuffles, stays stateless, and needs no watermark — append
    * mode, unbounded keys, O(batch) work per batch at any scale.
    * Unknown keys keep flowing with an explicit UNKNOWN segment
    * (left join), not silently dropped. */
  def enriched(events: DataFrame, users: DataFrame): DataFrame =
    events.join(
        broadcast(users.select(col("c_custkey").as("user_id"),
          col("c_mktsegment"))),
        Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))

  /** One CDC change record: a keyed upsert with a sequence number
    * (the change-stream position — later wins). */
  final case class Change(o_orderkey: Long, o_totalprice: Double, seq: Long)

  /** Apply one micro-batch of CDC changes to a snapshot — the
    * streaming twin of q_upsert (reference: executor/insert.go ON
    * DUPLICATE KEY UPDATE fed by a change stream). Within the batch
    * the LATEST change per key wins (max seq — micro-batches are
    * unordered inside); across batches later batches overwrite
    * earlier ones because application is sequential. The merge is
    * the same single co-partitioned full-outer join as q_upsert, so
    * every batch is one bounded job; at 100 TB the snapshot is
    * key-partitioned and each batch rewrites only the partitions its
    * keys touch (the foreachBatch body stays identical). Used from a
    * foreachBatch sink that writes versioned snapshot dirs and flips
    * a pointer when the write commits (idempotent replay: re-running
    * batch N rewrites version N deterministically) — StreamingSpec
    * drives exactly that loop. */
  def cdcApplyBatch(snapshot: DataFrame, changes: DataFrame): DataFrame = {
    // max over (seq, price) structs, not max_by: if two changes for a
    // key tie on seq inside one micro-batch, max_by picks an arbitrary
    // one and idempotent replay would not be deterministic.
    val latest = changes.groupBy("o_orderkey")
      .agg(max(struct(col("seq"), col("o_totalprice")))
        .getField("o_totalprice").as("u_price"))
    snapshot.as("b").join(latest, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("u_price"), col("o_totalprice")).as("o_totalprice"))
  }

  /** Exactly-once foreachBatch sink: each micro-batch lands in its
    * own `batch_id=` partition via DYNAMIC partition overwrite, so a
    * replayed batchId (failure recovery re-delivers the same
    * micro-batch with the same id — the Structured Streaming
    * contract) rewrites its own partition deterministically instead
    * of appending duplicates. This is the idempotence half of
    * end-to-end exactly-once; the source offsets in the checkpoint
    * are the other half. At 100 TB the same body holds — overwrite
    * scope is one batch partition, never the table. */
  def idempotentSink(dir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)

  /** Streaming corpus dedup — the production ingest-dedup loop
    * (d_dedup_incremental's persisted fingerprint index composed
    * with [[idempotentSink]]'s exactly-once discipline): per
    * micro-batch, incoming fingerprints anti-join the PERSISTED
    * index restricted to STRICTLY EARLIER batches, and only novel
    * fingerprints append — into the batch's OWN `batch_id=`
    * partition via dynamic partition overwrite. The
    * `batch_id < current` fence is the replay guard: a re-delivered
    * micro-batch (same id, same rows — the Structured Streaming
    * recovery contract) never sees its own previous output, so it
    * recomputes the identical novel set and overwrites its partition
    * bit-identically — exactly-once growth of the index with no
    * transaction log. At 100 TB the index is the ~0.1% fingerprint
    * sidecar of the corpus: the anti-join broadcasts while it fits
    * and shuffles bare (fp) pairs after; the batch side is one
    * map-combined group per micro-batch.
    *
    * Batch input schema: (fp, doc_id). Index rows:
    * (fp, keep_id, batch_id) — keep_id is the smallest doc carrying
    * the fingerprint within its FIRST batch (the doc the corpus
    * keeps; later duplicates never enter the index). */
  def dedupIngestSink(indexDir: String)(batch: DataFrame,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    // A null fingerprint is NO fingerprint (the RowLocks null-key
    // rule): left_anti never matches on null, so a null print would
    // re-append every batch and break exactly-once membership.
    val novelInBatch = batch.where(col("fp").isNotNull)
      .groupBy("fp").agg(min(col("doc_id")).as("keep_id"))
    // Schema-safe prior read (Formats.readParquetOr: ONLY the two
    // absent-layout analysis errors degrade to empty; anything else
    // propagates — a quiet empty fallback would re-append indexed
    // fingerprints and break exactly-once membership). The fence
    // excludes the batch's OWN partition: for the in-contract replay
    // (same id, same rows) a batch never sees its previous output
    // and recomputes bit-identically. A RESTARTED batchId sequence
    // (checkpoint reset, a new query over the same index) is NOT
    // in-contract on its own: a reused id's dynamic overwrite would
    // REPLACE that partition's previously-committed prints, dropping
    // them from membership. The migration step is
    // [[compactIngestIndex]]: it moves the whole membership into the
    // reserved batch_id=-1 partition, after which no live partition
    // can collide with any new sequence (spec-pinned).
    val prior = graft.sources.Formats.readParquetOr(spark, indexDir)(
        novelInBatch.limit(0).withColumn("batch_id", lit(batchId)))
      .filter(col("batch_id") =!= batchId).select("fp")
    // SCOPED checkpoint: the novel set is consumed entirely within
    // this batch, so its cp artifact is deleted on exit — an
    // unbounded stream must not leak one cp dir per batch.
    graft.tools.Reliable.scoped(
      novelInBatch.join(prior, Seq("fp"), "left_anti")
        .withColumn("batch_id", lit(batchId))) { novel =>
      // Nothing novel → write nothing. A partitioned write of an
      // empty frame would create a _SUCCESS-only dir (no schema
      // footer), poisoning the next batch's read; skipping keeps
      // replay idempotent (the recompute is deterministic, so a
      // replayed all-duplicate batch skips again).
      if (!novel.isEmpty)
        novel.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(indexDir)
    }
  }

  /** COMPACTION for the batch-partitioned ingest indexes (the
    * streaming small-files janitor — [[dedupIngestSink]] and
    * [[neardupIngestSink]] append one `batch_id=` partition per
    * micro-batch forever; after a few hundred thousand batches the
    * index is a directory-listing problem, not a data problem). The
    * whole membership is rewritten into the reserved `batch_id=-1`
    * partition, then the absorbed batch partitions are deleted.
    *
    * Every invariant the sinks rely on survives:
    *  - the fence: −1 never equals a real batch id, so the compacted
    *    rows stay visible to every future batch's prior-read;
    *  - exactly-once: a replay of an ABSORBED batch sees its rows in
    *    the prior (−1) partition, recomputes novel = ∅ and writes
    *    nothing — membership growth stays exactly-once across the
    *    compaction;
    *  - crash safety, by SEQUENCING rather than a swap: step 1
    *    overwrites the −1 partition with the full key-deduped
    *    membership (dynamic overwrite — atomic per partition), step
    *    2 deletes the absorbed partitions one by one. A crash
    *    between the steps leaves every key present (some twice);
    *    duplicate rows are harmless to the sinks — the prior-read
    *    feeds anti-joins and bucket joins, where duplicates change
    *    no admit decision — and the next compaction's `dedupCols`
    *    pass removes them. Re-running compact is idempotent.
    *
    * `dedupCols` is the layout's row identity (exact index:
    * fingerprint; near-dup index: (doc_id, band)) — only
    * crash-recovery duplicates are ever dropped by it. Returns the
    * number of batch partitions absorbed. */
  def compactIngestIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, dedupCols: Seq[String]): Int = {
    val F = graft.sources.Formats
    val all = F.readParquetOr(spark, indexDir)(null)
    if (all == null) return 0
    // Step 1: the full membership lands in −1 (dynamic overwrite —
    // readers see the old or the new −1 partition, never a torn
    // one). Checkpointed first — the sinks' own discipline: the
    // write targets the directory the plan reads, and only a
    // lineage cut makes that safe (Spark refuses a same-path
    // overwrite whose plan still scans it).
    graft.tools.Reliable.scoped(all.dropDuplicates(dedupCols)
        .withColumn("batch_id", lit(-1L))) { compacted =>
      compacted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(indexDir)
    }
    // Step 2: absorbed partitions retire (Hadoop FS — the index may
    // live on HDFS/S3 on a real cluster).
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val absorbed = fs.listStatus(root).filter { st =>
      val n = st.getPath.getName
      st.isDirectory && n.startsWith("batch_id=") && n != "batch_id=-1"
    }
    absorbed.foreach(st => fs.delete(st.getPath, true))
    absorbed.length
  }

  /** One batch's near-dup ingest outcome: rows seen, identity-novel
    * docs, near-dups dropped against the index or within the batch,
    * and docs whose bands were appended. `nNovel = nNearDup +
    * nIndexed` by construction. */
  final case class NeardupTick(batchId: Long, nIn: Long, nNovel: Long,
      nNearDup: Long, nIndexed: Long)

  /** Streaming NEAR-DUP corpus ingest — [[dedupIngestSink]]'s
    * exactly-once discipline lifted from exact fingerprints to the
    * MinHash-LSH layout: the persisted index holds each admitted
    * document's 16 banded signature rows (the d_dedup_minhash
    * banding, ONE spelling via DedupQueries.bandedSigs), partitioned
    * by ingest batch. Per micro-batch, QUERY-THEN-APPEND:
    *
    *  1. identity dedup — doc_ids already indexed (in any OTHER
    *     batch partition; the restart-robust `=!=` fence) drop;
    *  2. near-dup QUERY — the batch's banded rows equi-join the
    *     prior index on (band, bhash) — candidate pairs are bounded
    *     by shared-bucket posting lists, never batch × corpus — and
    *     a doc whose best signature agreement ≥ τ is DROPPED (the
    *     production admit-gate: the corpus keeps its first
    *     representative);
    *  3. within-batch rule — a doc also drops when a SMALLER-id doc
    *     in the same batch agrees ≥ τ (order-free and deterministic:
    *     the test is against all smaller ids, not against survivors,
    *     so chains cannot make the outcome order-dependent);
    *  4. survivors' band rows append under the batch's own partition
    *     via dynamic overwrite — an in-contract replay recomputes
    *     the identical admit set against the fenced prior and
    *     rewrites its own partition bit-identically.
    *
    * At 100 TB this is the streaming near-dup admission loop: per
    * batch the corpus-side work is one (band, bhash)-keyed join
    * against the persisted posting lists (16 rows per doc, 64-long
    * signatures — the index is ~200 bytes/doc), and the full text
    * never crosses an exchange — signatures build in the fused
    * map-side kernel. */
  def neardupIngestSink(indexDir: String, tau: Double)(
      batch: DataFrame, batchId: Long): NeardupTick = {
    val spark = batch.sparkSession
    val D = graft.dedup.DedupQueries
    val in = batch.where(col("doc_id").isNotNull)
      .dropDuplicates("doc_id").select("doc_id", "text")
    val banded = D.bandedSigs(in)
    val prior = graft.sources.Formats.readParquetOr(spark, indexDir)(
        banded.limit(0).withColumn("batch_id", lit(batchId)))
      .filter(col("batch_id") =!= batchId)
    val priorIds = prior.select("doc_id").distinct()
    // SCOPED checkpoint (the dedupIngestSink discipline): the novel
    // banded set feeds the index query, the within-batch pairing,
    // the admit anti-join and the write — without it the signature
    // kernel re-runs per consumer; with scoped() the artifact dies
    // with the batch.
    graft.tools.Reliable.scoped(
      banded.join(priorIds, Seq("doc_id"), "left_anti")) { nb =>
      val nIn = in.count()
      val nNovel = nb.select("doc_id").distinct().count()
      // Near-dups vs the INDEX: agreement on any shared band bucket.
      val vsIndex = nb
        .join(prior.select(col("band"), col("bhash"),
          col("sigs").as("s2")), Seq("band", "bhash"))
        .filter(D.estJaccard(col("sigs"), col("s2")) >= tau)
        .select("doc_id")
      // Near-dups WITHIN the batch: any smaller-id doc agreeing ≥ τ.
      val within = nb.select(col("band"), col("bhash"),
          col("doc_id").as("id2"), col("sigs").as("s2"))
        .join(nb.select(col("band"), col("bhash"), col("doc_id"),
          col("sigs")), Seq("band", "bhash"))
        .filter(col("doc_id") < col("id2"))
        .filter(D.estJaccard(col("sigs"), col("s2")) >= tau)
        .select(col("id2").as("doc_id"))
      val drop = vsIndex.union(within).distinct()
      val nNearDup = drop.count()
      val keep = nb.join(drop, Seq("doc_id"), "left_anti")
        .withColumn("batch_id", lit(batchId))
      // Empty-write skip: same _SUCCESS-poison rule as the exact
      // sink.
      if (nNovel - nNearDup > 0)
        keep.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(indexDir)
      NeardupTick(batchId, nIn, nNovel, nNearDup, nNovel - nNearDup)
    }
  }

  /** Streaming VECTOR ingest — [[dedupIngestSink]]'s exactly-once
    * discipline composed with the serving IVF index
    * ([[graft.ann.IvfIndex]]): per micro-batch, vectors whose
    * `vec_id` is already indexed (in the base generation or a
    * STRICTLY EARLIER ingest batch) drop; novel vectors are assigned
    * at the serving generation's FIXED centroids (one broadcast
    * argmin over the batch only) and land in the batch's OWN
    * `ingest_batch=`/`cell=` delta partitions via dynamic partition
    * overwrite. The physical append is a DELTA layout, not an
    * in-place append into the generation's cell shards, because
    * exactly-once demands partition-scoped overwrite: a re-delivered
    * batch (same id, same rows) recomputes the identical novel set —
    * its own output is fenced out of the prior-ids read — and
    * rewrites its partitions bit-identically, where a bare
    * mode("append") would duplicate every replayed vector. Probes
    * read base ∪ delta ([[graft.ann.IvfIndex.probeWithDeltas]] —
    * cell pruning applies to each scan) and return exactly what a
    * physical append at the same centroids would (spec-pinned);
    * retrainAndSwapFrom over base ∪ delta is the compaction point
    * that absorbs deltas into the next generation (plain
    * retrainAndSwap re-reads only the serving generation and must
    * NOT be followed by a delta retire — the autoRetrainSink loop
    * below is the one correct spelling of compact-then-retire). The drift card over base ∪ delta is the
    * live streaming metric ([[graft.ann.IvfIndex.driftCardOf]]).
    * At 100 TB: the ids ledger read is a one-column columnar
    * projection of the cell shards plus the (tiny) delta ids; the
    * batch side never exceeds one micro-batch of vectors.
    *
    * Batch input schema: (vec_id, v). A null vec_id is NO vector
    * (the RowLocks null-key rule); duplicate ids within a batch
    * collapse to one row (ids are the identity — the streaming
    * contract is that one id always carries one payload). */
  def vectorIngestSink(root: String, deltaDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val serving = graft.ann.IvfIndex.servingDir(root)
    val inBatch = batch.where(col("vec_id").isNotNull)
      .dropDuplicates("vec_id")
      .select("vec_id", "v")
    val baseIds = spark.read.parquet(s"$serving/cells")
      .select("vec_id")
    // Same own-partition fence as dedupIngestSink (=!=, not <): the
    // in-contract replay recomputes identically. A RESTARTED batchId
    // sequence over a LIVE delta layout is not in-contract (a reused
    // ingest_batch id would dynamic-overwrite only the (id, cell)
    // partitions the new batch touches, stranding the rest of the
    // old partition); drain the deltas first — run the auto-retrain
    // compaction (or retire an absorbed layout) before pointing a
    // fresh checkpoint at the same deltaDir.
    val priorDelta = graft.sources.Formats.readParquetOr(
        spark, deltaDir)(
        inBatch.select("vec_id").withColumn("ingest_batch", lit(batchId))
          .limit(0))
      .filter(col("ingest_batch") =!= batchId).select("vec_id")
    // Checkpointed before the emptiness probe AND the write (the
    // dedupIngestSink discipline): without it the whole
    // novel-detection pipeline — batch dedup, base-id projection
    // scan, prior-delta scan, anti join — runs twice per micro-batch.
    graft.tools.Reliable.scoped(inBatch
      .join(baseIds.union(priorDelta), Seq("vec_id"), "left_anti")) {
      novel =>
        if (!novel.isEmpty)
          graft.ann.IvfIndex.assignAt(spark, serving, novel)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch", "cell")
            .parquet(deltaDir)
    }
  }

  /** The CLOSED serving loop — [[vectorIngestSink]] with the
    * drift-gated retrain decision executed inline: after each
    * micro-batch lands, the drift card runs over base ∪ delta (the
    * live streaming metric), and when more than `flagFrac` of the
    * NEW-ROW MASS sits in retrain-flagged cells, the loop COMPACTS —
    * [[graft.ann.IvfIndex.retrainAndSwap]] over base ∪ delta trains
    * gen_N+1 from the full current corpus, the pointer flips
    * atomically, and the absorbed delta partitions retire. Ordering
    * makes the retirement safe: deltas are deleted only AFTER the
    * new generation is complete and CURRENT points at it, so their
    * ids are already in the serving base — a re-delivered batch
    * recomputes novel = ∅ against the new base and writes nothing
    * (replay stays a no-op across the compaction). Returns the
    * generation serving after the batch (callers observe swaps).
    *
    * At 100 TB this is the production cadence: per-batch cost is
    * one broadcast argmin + a delta write + the one-scan card;
    * the full corpus re-read happens only when the card says the
    * centroids stopped summarizing what arrives. */
  def autoRetrainSink(root: String, deltaDir: String,
      growthCap: Double, flagFrac: Double)(
      batch: DataFrame, batchId: Long): String =
    autoRetrainTick(root, deltaDir, growthCap, flagFrac)(
      batch, batchId).genAfter

  /** One batch's drift observation — what [[autoRetrainTick]] saw and
    * did: the serving generation before/after, the new-row mass the
    * card measured over base ∪ delta (0 when no deltas exist), the
    * share of that mass in retrain-flagged cells, and whether the
    * loop compacted. This is the dashboard row a serving fleet
    * watches: flat `massFlagged/massNew` under a rising `massNew` is
    * healthy growth; a climbing share is the centroids aging; a
    * `retrained` tick is the loop paying the one full-corpus pass. */
  final case class DriftTick(batchId: Long, genBefore: String,
      genAfter: String, massNew: Long, massFlagged: Long,
      retrained: Boolean)

  /** [[autoRetrainSink]] with the per-batch drift metrics returned
    * instead of discarded — the series [[driftDashboardSink]]
    * persists. Semantics are identical to autoRetrainSink (it IS the
    * same code path). */
  def autoRetrainTick(root: String, deltaDir: String,
      growthCap: Double, flagFrac: Double)(
      batch: DataFrame, batchId: Long): DriftTick = {
    val spark = batch.sparkSession
    val F = graft.sources.Formats
    // FINISH an interrupted retirement before anything else — in
    // O(1), via the retirement MARKER the compaction writes before
    // it trains (replacing the r17 id-overlap join, which re-scanned
    // the full base-id ledger every quiet batch just to probe for a
    // crash that almost never happened). The marker names the target
    // generation; the pointer flip is the commit point:
    //  - CURRENT >= target → the flip committed, so every delta row
    //    is in the serving base; retire the delta layout (the crash
    //    landed between flip and delete — without this the stale
    //    rows would double into the next compaction's corpus);
    //  - CURRENT < target → the compaction never committed; the
    //    deltas are still the un-absorbed truth, keep them (the
    //    partial gen dir, if any, is garbage that the next
    //    compaction's mode("overwrite") replaces).
    // Either way the marker is consumed.
    val marker = new java.io.File(s"$deltaDir.RETIRING")
    if (marker.exists()) {
      val target = new String(java.nio.file.Files.readAllBytes(
        marker.toPath), "UTF-8").trim.stripPrefix("gen_").toInt
      if (graft.ann.IvfIndex.currentGen(root)
          .stripPrefix("gen_").toInt >= target)
        F.deleteRecursively(new java.io.File(deltaDir))
      marker.delete()
    }
    val genBefore = graft.ann.IvfIndex.currentGen(root)
    vectorIngestSink(root, deltaDir)(batch, batchId)
    val serving = graft.ann.IvfIndex.servingDir(root)
    val deltas = Option(F.readParquetOr(spark, deltaDir)(null))
    val (massNew, massFlagged, retrained) = deltas.map { d =>
      // ONE centroid read serves the card and the compaction's
      // cluster count.
      val cents = spark.read.parquet(s"$serving/centroids")
      val card = graft.ann.IvfIndex.driftCardOf(
        spark.read.parquet(s"$serving/cells")
          .select(col("cell"), col("vec_id"), col("v"),
            lit(false).as("is_new"))
          .unionByName(d.select(col("cell"), col("vec_id"), col("v"),
            lit(true).as("is_new"))),
        cents, isNew = col("is_new"), growthCap = growthCap)
      // The gate is flagged MASS, not flagged cell count: drift
      // concentrates (a shifted distribution funnels into the few
      // nearest centroids), so "how many cells flagged" under-reads
      // a hard burst that a thousand quiet cells dilute. What the
      // card must answer is "what share of the vectors arriving
      // since the last (re)train sit in cells whose centroids no
      // longer summarize them".
      val r = card.agg(
        sum(col("n_new")).as("mass_new"),
        sum(when(col("retrain") === 1, col("n_new")).otherwise(0L))
          .as("mass_flagged")).head()
      val (mNew, mFlagged) = (r.getLong(0), r.getLong(1))
      val compact = mNew > 0 && mFlagged.toDouble / mNew > flagFrac
      if (compact) {
        // COMPACT: write the retirement marker naming the target
        // generation, train gen_N+1 from the full current corpus
        // (base ∪ delta), flip, retire the absorbed deltas, consume
        // the marker. The flip is the commit point; the marker makes
        // every crash window O(1)-recoverable (see the recovery at
        // the top). Training parameters come from the layout's
        // PARAMS (initServing) — deriving c from the serving
        // centroid count would ratchet capacity down every time
        // Lloyd drops an empty cell; the count fallback exists only
        // for pre-PARAMS layouts.
        val (cTrain, itersTrain) = graft.ann.IvfIndex
          .servingParams(root)
          .getOrElse((cents.count().toInt, 2))
        val target = s"gen_${graft.ann.IvfIndex.currentGen(root)
          .stripPrefix("gen_").toInt + 1}"
        java.nio.file.Files.write(marker.toPath,
          s"$target\n".getBytes("UTF-8"))
        graft.ann.IvfIndex.retrainAndSwapFrom(root,
          spark.read.parquet(s"$serving/cells").select("vec_id", "v")
            .unionByName(d.select("vec_id", "v")),
          c = cTrain, iters = itersTrain)
        F.deleteRecursively(new java.io.File(deltaDir))
        marker.delete()
      }
      (mNew, mFlagged, compact)
    }.getOrElse((0L, 0L, false))
    DriftTick(batchId, genBefore, graft.ann.IvfIndex.currentGen(root),
      massNew, massFlagged, retrained)
  }

  /** The drift DASHBOARD — [[autoRetrainTick]] with its per-batch
    * observation persisted as a metrics series under `metricsDir`,
    * partitioned by batch id with dynamic overwrite: a replayed
    * batch rewrites its OWN row to reflect what the replay actually
    * observed (post-compaction that is novel = ∅, mass 0 — the row
    * stays truthful about the layout's state), and no batch id ever
    * holds two rows, so the series is exactly-once the same way the
    * ingest itself is. One driver-side row per micro-batch — the
    * write cost is a single tiny file; the card computation it
    * records is the same one-scan pass the retrain gate already
    * paid for. */
  def driftDashboardSink(root: String, deltaDir: String,
      growthCap: Double, flagFrac: Double, metricsDir: String)(
      batch: DataFrame, batchId: Long): DriftTick = {
    val tick = autoRetrainTick(root, deltaDir, growthCap, flagFrac)(
      batch, batchId)
    val spark = batch.sparkSession
    import spark.implicits._
    Seq((tick.genBefore, tick.genAfter, tick.massNew,
        tick.massFlagged, tick.retrained))
      .toDF("gen_before", "gen_after", "mass_new", "mass_flagged",
        "retrained")
      .withColumn("batch_id", lit(batchId))
      .repartition(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(metricsDir)
    tick
  }
}
