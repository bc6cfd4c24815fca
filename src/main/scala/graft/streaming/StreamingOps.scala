package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Typed event record for the stateful operators. */
case class Event(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Running per-user totals emitted by [[StreamingOps.runningUserTotals]]. */
case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

/** One closed session emitted by [[StreamingOps.sessionExamplesStream]]:
  * q146's (prefix-session, next-action label) example shape, streaming. */
case class SessionExample(user_id: Long, start_ms: Long, n_events: Long, label: String)

/** In-flight session state for [[StreamingOps.sessionExamplesStream]]. */
case class SessState(startMs: Long, lastMs: Long, n: Long, lastType: String)

/** Named ValueState record for [[StreamingOps.runningUserTotalsTws]]
  * (top-level: the state encoder's codegen needs a public constructor). */
case class TotState(n: Long, sum: Double)

/** Structured Streaming surface (SURVEY §2.10 extension): windowed
  * aggregation, sessionization, watermark-based late-data handling,
  * arbitrary-state operators, and a stream-stream interval join.
  *
  * Each transform is a plain `DataFrame => DataFrame` over an event table
  * with (ts: timestamp, user_id: long, event_type: string, value: double)
  * — Spark's unified batch/streaming contract means the SAME function runs
  * in both modes: applied to a batch DataFrame it is a grouped aggregate;
  * applied to `readStream` output it is an incremental stateful operator.
  * StreamingSpec asserts batch/stream equivalence on identical input, and
  * EventQueries' q12/q24 are the oracle-verified batch twins of these
  * shapes.
  *
  * Scale/state posture: hourly windows keep one state row per (window,
  * type) — bounded by the watermark horizon; session windows keep one
  * in-flight session per user, merged on arrival and evicted once the
  * watermark passes the gap. State never grows with total stream length,
  * only with concurrent activity — the property that matters on an
  * unbounded 100 TB/day stream.
  */
object StreamingOps {

  /** Streaming lake maintenance — q132's partition-scoped MERGE driven
    * from a CDC STREAM: `foreachBatch` is the documented pattern for
    * multi-step merge sinks (streaming writers cannot express a read-
    * merge-overwrite transaction). Per micro-batch: list the batch's
    * touched (o_year, o_month) partitions — a driver-side, metadata-sized
    * collect of the PARTITION LIST, never rows — and apply the identical
    * latest-wins partition-scoped upsert the batch path uses. Replay-safe
    * under foreachBatch's at-least-once contract: re-applying a batch
    * converges to the same state (the merge is idempotent), which is what
    * makes this sink correct without a transaction log. UpsertSpec asserts
    * the streamed result equals the one-shot batch merge, and that a batch
    * over `maxPartitionsPerBatch` fails the query rather than materializing
    * an unbounded driver list.
    */
  def cdcUpsertSink(cdc: DataFrame, lakePath: String,
      maxPartitionsPerBatch: Int = 10000): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    cdc.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
      val s = batch.sparkSession
      import s.implicits._
      // the collect below is metadata-sized BY CONTRACT (a micro-batch
      // touches the partitions its rows live in, bounded by batch span ×
      // partition granularity); cap the LIST SIZE inside the query so a
      // misconfigured source fails loudly before the driver materializes
      // an unbounded list — limit(cap+1) bounds the collect itself
      val parts = batch.select($"o_year", $"o_month").distinct()
        .limit(maxPartitionsPerBatch + 1).collect()
      require(parts.length <= maxPartitionsPerBatch,
        s"CDC micro-batch touches > $maxPartitionsPerBatch partitions - partition list is no longer metadata-sized")
      if (parts.nonEmpty) {
        val touched = parts.map(r =>
          $"o_year" === r.getInt(0) && $"o_month" === r.getInt(1)).reduce(_ || _)
        graft.etl.EtlQueries.applyUpsert(s, lakePath, batch.toDF(), touched)
      }
    }

  /** Tumbling 1-hour (window_start, event_type) counts + value sums. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour windows advancing every 15 minutes: each event lands
    * in length/slide = 4 overlapping windows — the fan-out is a map-side
    * generator inside the aggregate, so the shuffle carries pre-aggregated
    * (window, type) rows ×4, never events ×4. Completes the window-type
    * family next to tumbling (hourlyTypeCounts) and session
    * (userSessions); state per key finalizes at watermark passage like any
    * windowed aggregate.
    */
  def slidingTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** 30-minute-gap sessions per user (same expression as batch q24). */
  def userSessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("user_id"),
        col("sw.start").as("sess_start"),
        col("n_events"), col("sum_value"))

  /** Late-data policy: events older than `delay` behind the max seen ts are
    * dropped and their windows finalized (append-mode emission).
    */
  def withLateDataDrop(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)

  /** The streaming deployment shape: watermark then windowed aggregation —
    * in append mode a window emits exactly once, when the watermark passes
    * its end.
    */
  def hourlyTypeCountsStream(events: DataFrame, delay: String = "1 hour"): DataFrame =
    hourlyTypeCounts(withLateDataDrop(events, delay))

  def userSessionsStream(events: DataFrame, delay: String = "1 hour"): DataFrame =
    userSessions(withLateDataDrop(events, delay))

  /** Stream-stream interval inner join: each `error` event matched to the
    * same user's `purchase` events in the preceding hour. Expects
    * errors(event_id, user_id, ts) and purchases(user_id, ts).
    *
    * Both sides carry watermarks and the join condition bounds event-time
    * distance, so Spark derives a state-eviction horizon: buffered rows
    * older than (watermark − range width) are dropped — state is bounded by
    * stream RATE × horizon, never by stream length, which is what keeps an
    * unbounded stream joinable at all. In batch mode the watermarks are
    * no-ops and this is a plain range join (q53 verifies that twin against
    * DuckDB; q51 is the bucketed batch formulation of the same relation).
    */
  def errorsWithRecentPurchases(errors: DataFrame, purchases: DataFrame,
      delay: String = "1 hour"): DataFrame = {
    val e = errors.withWatermark("ts", delay).alias("e")
    val p = purchases.withWatermark("ts", delay).alias("p")
    e.join(p, expr(
        "e.user_id = p.user_id AND p.ts > e.ts - interval 1 hour AND p.ts <= e.ts"))
      .select(col("e.event_id").as("event_id"), col("e.user_id").as("user_id"),
        col("p.ts").as("p_ts"))
  }

  /** Stream-stream interval LEFT OUTER join — the attribution shape the
    * inner variant silently gets wrong: the unmatched errors are usually
    * the interesting rows, and an inner join drops exactly those. Same
    * watermark + time-bound state eviction as
    * [[errorsWithRecentPurchases]]; the null-extended row for an unmatched
    * error can only emit once the watermark proves no matching purchase
    * can still arrive, so outer results trail inner ones by the horizon —
    * the price of exactly-once null semantics on an unbounded stream. In
    * batch mode the watermarks are no-ops and this is a plain left-outer
    * range join (q152's oracle-verified twin).
    */
  def errorsWithRecentPurchasesOuter(errors: DataFrame, purchases: DataFrame,
      delay: String = "1 hour"): DataFrame = {
    val e = errors.withWatermark("ts", delay).alias("e")
    val p = purchases.withWatermark("ts", delay).alias("p")
    e.join(p, expr(
        "e.user_id = p.user_id AND p.ts > e.ts - interval 1 hour AND p.ts <= e.ts"),
        "left_outer")
      .select(col("e.event_id").as("event_id"), col("e.user_id").as("user_id"),
        col("p.ts").as("p_ts"))
  }

  /** Stream-stream interval FULL OUTER join — both unmatched sides
    * survive: errors with no purchase in their preceding hour (the
    * left-outer rows of [[errorsWithRecentPurchasesOuter]]) AND purchases
    * followed by no error within an hour (the healthy conversions — the
    * rows a monitoring pipeline wants as its negative class). Same
    * watermark + interval-bound state as the inner/left variants; each
    * side's null-extended rows emit only once the watermark proves no
    * match can arrive. In batch mode the watermarks are no-ops and this
    * is a plain full-outer range join (q168's oracle-verified twin).
    * `user_id` is coalesced across sides so every output row names its
    * user; a null `event_id` marks an unmatched purchase.
    */
  def errorsWithRecentPurchasesFull(errors: DataFrame, purchases: DataFrame,
      delay: String = "1 hour"): DataFrame = {
    val e = errors.withWatermark("ts", delay).alias("e")
    val p = purchases.withWatermark("ts", delay).alias("p")
    e.join(p, expr(
        "e.user_id = p.user_id AND p.ts > e.ts - interval 1 hour AND p.ts <= e.ts"),
        "full_outer")
      .select(col("e.event_id").as("event_id"),
        coalesce(col("e.user_id"), col("p.user_id")).as("user_id"),
        col("p.ts").as("p_ts"))
  }

  /** Stream-static enrichment join: the streaming fact joined to a static
    * dimension. STATELESS — unlike the stream-stream join above there is
    * no watermark and no join state; the static side is planned as a fixed
    * relation, re-resolved and broadcast each micro-batch (which is also
    * how a slowly-changing dim picks up updates between batches). In batch
    * mode the same call is a plain broadcast hash join — the per-row cost
    * a 100 TB stream pays is one hash probe, nothing buffered.
    */
  def enrichWithStatic(facts: DataFrame, dim: DataFrame, key: String): DataFrame =
    facts.join(broadcast(dim), Seq(key))

  /** Exactly-once event dedup within the watermark horizon: duplicate
    * (user_id, event_type, ts) rows arriving within `delay` of each other
    * are dropped. Unlike a plain streaming dropDuplicates, state does not
    * grow with stream length — rows older than the watermark are evicted,
    * so state is bounded by rate × delay. STREAMING-ONLY (Spark rejects
    * dropDuplicatesWithinWatermark on batch plans); its batch-semantics
    * twin is a plain dropDuplicates on the same keys, and StreamingSpec
    * asserts the two agree when no duplicate pair straddles the horizon —
    * which is what q64 registers under the oracle gate.
    */
  def dedupedEvents(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")

  /** `flatMapGroupsWithState` (append mode): emit one milestone row each
    * time a user's cumulative event count crosses a multiple of `n` — the
    * 0-to-many-outputs-per-group shape that `mapGroupsWithState` cannot
    * express. State per key is one counter.
    */
  def eventMilestones(events: Dataset[Event], n: Int): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    require(n > 0)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[Long]) =>
          var c = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          it.foreach { _ =>
            c += 1
            if (c % n == 0) out += ((uid, c))
          }
          state.update(c)
          out.iterator
      }
  }

  /** Streaming twin of q146's session-example builder, and the one state
    * pattern the other custom-state ops don't exercise: EVENT-TIME TIMEOUT
    * eviction. A user's in-flight session lives in state as four numbers;
    * each closed session emits one (user, session start, size, last-type
    * label) training example — either because a later event of the same
    * user arrived past the gap, or because the WATERMARK passed the
    * session's close (`hasTimedOut`), which is what bounds state on a
    * user who simply goes away: without the timeout, every idle user
    * would hold state forever and the store would grow with lifetime
    * users rather than concurrent activity. A batch whose events arrive
    * after their session's close has already passed the watermark emits
    * immediately (`setTimeoutTimestamp` must stay above the watermark).
    * StreamingSpec asserts stream emissions == the batch gaps-and-islands
    * result restricted to closed sessions.
    *
    * Out-of-order handling (ADVICE r7): the carried state and the batch's
    * events are merged ORDER-INSENSITIVELY — the state interval
    * [startMs, lastMs] and each event join one sorted gaps-and-islands
    * fold, so an in-watermark event OLDER than state.lastMs (late arrival
    * in a later micro-batch) extends the session downward/inward without
    * rewinding lastMs, and lastType stays the type of the time-maximal
    * event. A late event chain more than `gap` BEFORE the carried start
    * correctly forms (and immediately closes) its own earlier session
    * rather than corrupting the in-flight one.
    */
  def sessionExamplesStream(events: Dataset[Event], gapMinutes: Int = 30,
      delay: String = "1 hour"): Dataset[SessionExample] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessState]) =>
          def example(st: SessState) = SessionExample(uid, st.startMs, st.n, st.lastType)
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionExample]
          if (state.hasTimedOut) { // watermark passed the session close
            out += example(state.get)
            state.remove()
          } else {
            // state interval + point events, sorted by (start, end): one
            // gaps-and-islands fold over the union. Islands followed by a
            // >gap hole are closed by event time regardless of arrival
            // order; only the time-maximal island stays in flight.
            val items = state.getOption.toSeq ++
              it.map(e => SessState(e.ts.getTime, e.ts.getTime, 1, e.event_type))
            var cur: SessState = null
            items.sortBy(s => (s.startMs, s.lastMs)).foreach { s =>
              cur match {
                case null => cur = s
                case c if s.startMs - c.lastMs <= gapMs =>
                  cur = SessState(c.startMs, math.max(c.lastMs, s.lastMs), c.n + s.n,
                    if (s.lastMs >= c.lastMs) s.lastType else c.lastType)
                case c => // gap: the earlier island is closed
                  out += example(c)
                  cur = s
              }
            }
            if (cur != null) {
              val closeAt = cur.lastMs + gapMs
              if (closeAt <= state.getCurrentWatermarkMs()) {
                out += example(cur) // already closed when the batch arrived
                state.remove()
              } else {
                state.update(cur)
                state.setTimeoutTimestamp(closeAt)
              }
            }
          }
          out.iterator
      }
  }

  /** Custom arbitrary state (`mapGroupsWithState`, update mode): running
    * per-user event count + value sum. The state per key is two numbers —
    * fixed-size regardless of stream length, the property that keeps a
    * 100 TB/day stream's state store bounded by |active users|. In batch
    * mode the same function runs as a grouped map over each key's full
    * history (Spark's unified contract again); StreamingSpec asserts the
    * stream's final emissions equal the batch aggregate.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[(Long, Double)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0.0))
          it.foreach { e => n += 1; s += e.value }
          state.update((n, s))
          UserTotals(uid, n, s)
      }
  }

  /** Spark 4's `transformWithState` — the successor arbitrary-state API
    * (SPARK-46815) and the semantic twin of [[runningUserTotals]]: same
    * two-numbers-per-user state, expressed through the new
    * `StatefulProcessor` contract with a NAMED `ValueState` variable
    * instead of the single opaque `GroupState` blob. What the new tier
    * buys at 100 TB/day: state variables are individually named/typed/
    * TTL-able (a processor can hold several, each evictable on its own
    * policy), schema evolution of state is supported, and the operator
    * requires the RocksDB state store provider — the disk-backed store
    * whose footprint is bounded by |active keys|, not executor heap.
    * StreamingSpec asserts final emissions equal the batch aggregate AND
    * agree with the legacy-API operator on identical input.
    */
  private class RunningTotalsProcessor
      extends StatefulProcessor[Long, Event, UserTotals] {
    @transient private var totals: ValueState[TotState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[TotState](
        "totals", Encoders.product[TotState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else TotState(0L, 0.0)
      var n = prev.n; var s = prev.sum
      rows.foreach { e => n += 1; s += e.value }
      totals.update(TotState(n, s))
      Iterator.single(UserTotals(key, n, s))
    }
  }

  def runningUserTotalsTws(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
