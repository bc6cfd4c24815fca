package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.date_trunc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Batch/stream equivalence for graft.streaming (SURVEY §5: session
  * windows have no DuckDB twin, so the oracle is the batch run of the SAME
  * transform — Spark's unified-semantics contract, checked here on the
  * real events testdata; the batch shapes themselves are DuckDB-verified
  * as q12/q24).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def eventData(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select($"ts", $"user_id", $"event_type", $"value")
      .as[Ev].collect().toSeq
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def runCompleteStream(data: Seq[Ev], transform: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val source = MemoryStream[Ev](implicitly[org.apache.spark.sql.Encoder[Ev]], spark.sqlContext)
    // two batches: state must merge results across micro-batches
    val (b1, b2) = data.splitAt(data.length / 2)
    val q = transform(source.toDF())
      .writeStream.format("memory").queryName("sink_" + System.nanoTime())
      .outputMode(OutputMode.Complete()).start()
    source.addData(b1)
    q.processAllAvailable()
    source.addData(b2)
    q.processAllAvailable()
    val out = spark.table(q.name)
    q.stop()
    out
  }

  test("hourly window agg: streaming (2 micro-batches, complete mode) == batch") {
    import spark.implicits._
    val data = eventData()
    val batch = StreamingOps.hourlyTypeCounts(data.toDF())
    val stream = runCompleteStream(data, StreamingOps.hourlyTypeCounts)
    assert(sortedRows(stream) == sortedRows(batch))
    assert(batch.count() > 0)
  }

  test("sliding windows: streaming (2 micro-batches, complete mode) == batch") {
    import spark.implicits._
    val data = eventData()
    val batch = StreamingOps.slidingTypeCounts(data.toDF())
    val stream = runCompleteStream(data, StreamingOps.slidingTypeCounts)
    assert(sortedRows(stream) == sortedRows(batch))
    // every event lands in exactly length/slide = 4 windows
    assert(batch.agg(org.apache.spark.sql.functions.sum($"n")).head.getLong(0) == data.length * 4L)
  }

  test("session windows: streaming (2 micro-batches, complete mode) == batch") {
    import spark.implicits._
    val data = eventData()
    val batch = StreamingOps.userSessions(data.toDF())
    val stream = runCompleteStream(data, StreamingOps.userSessions)
    assert(sortedRows(stream) == sortedRows(batch))
    assert(batch.count() > 0)
  }

  test("session windows append mode: a session emits once the watermark passes its close") {
    import spark.implicits._
    def ev(min: Int, v: Double) = Ev(Timestamp.from(
      java.time.Instant.parse("2024-02-01T00:00:00Z").plusSeconds(min * 60L)), 1L, "s", v)

    val source = MemoryStream[Ev](implicitly[org.apache.spark.sql.Encoder[Ev]], spark.sqlContext)
    val q = StreamingOps.userSessionsStream(source.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("sess_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()

    source.addData(ev(0, 1.0), ev(10, 2.0)) // one session, end = 10+30 gap = 40min
    q.processAllAvailable()
    assert(spark.table(q.name).count() == 0) // session not closed yet

    source.addData(ev(120, 4.0)) // watermark → 110min > 40: session emits
    q.processAllAvailable()
    val rows = spark.table(q.name).as[(Long, Timestamp, Long, Double)].collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head._3 == 2L && rows.head._4 == 3.0)
  }

  test("mapGroupsWithState running totals: final stream emissions == batch aggregate") {
    import spark.implicits._
    import graft.streaming.{Event, UserTotals}
    val data = eventData().map(e => Event(e.ts, e.user_id, e.event_type, e.value))

    val source = MemoryStream[Event](implicitly[org.apache.spark.sql.Encoder[Event]], spark.sqlContext)
    val q = StreamingOps.runningUserTotals(source.toDS())
      .writeStream.format("memory").queryName("state_" + System.nanoTime())
      .outputMode(OutputMode.Update()).start()
    val (b1, b2) = data.splitAt(data.length / 2)
    source.addData(b1); q.processAllAvailable()
    source.addData(b2); q.processAllAvailable()
    // update mode: several emissions per user; totals are monotone, so the
    // final state per user is the max-n row
    val streamed = spark.table(q.name).as[UserTotals].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
    q.stop()

    val batch = data.groupBy(_.user_id).map { case (u, evs) =>
      u -> ((evs.size.toLong, evs.map(_.value).sum))
    }
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (u, t) =>
      val (n, sumV) = batch(u)
      assert(t.n_events == n)
      assert(math.abs(t.sum_value - sumV) < 1e-6) // fp accumulation order differs
    }
  }

  // equality with the legacy mapGroupsWithState operator is transitive:
  // both specs pin the same batch aggregate on the same input
  test("transformWithState running totals (RocksDB store): final emissions == batch aggregate") {
    import spark.implicits._
    import graft.streaming.{Event, UserTotals}
    val data = eventData().map(e => Event(e.ts, e.user_id, e.event_type, e.value))
    // transformWithState requires the RocksDB state store provider; scope
    // the provider switch to this query and restore the session default
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = MemoryStream[Event](implicitly[org.apache.spark.sql.Encoder[Event]], spark.sqlContext)
      val q = StreamingOps.runningUserTotalsTws(source.toDS())
        .writeStream.format("memory").queryName("tws_" + System.nanoTime())
        .outputMode(OutputMode.Update()).start()
      val (b1, b2) = data.splitAt(data.length / 2)
      source.addData(b1); q.processAllAvailable()
      source.addData(b2); q.processAllAvailable()
      val streamed = spark.table(q.name).as[UserTotals].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
      q.stop()
      val batch = data.groupBy(_.user_id).map { case (u, evs) =>
        u -> ((evs.size.toLong, evs.map(_.value).sum))
      }
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (u, t) =>
        val (n, sumV) = batch(u)
        assert(t.n_events == n)
        assert(math.abs(t.sum_value - sumV) < 1e-6)
      }
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }

  test("flatMapGroupsWithState milestones: exactly floor(count/n) emissions per user") {
    import spark.implicits._
    import graft.streaming.Event
    val data = eventData().map(e => Event(e.ts, e.user_id, e.event_type, e.value))
    val source = MemoryStream[Event](implicitly[org.apache.spark.sql.Encoder[Event]], spark.sqlContext)
    val q = StreamingOps.eventMilestones(source.toDS(), 3)
      .writeStream.format("memory").queryName("ms_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()
    val (b1, b2) = data.splitAt(data.length / 2)
    source.addData(b1); q.processAllAvailable()
    source.addData(b2); q.processAllAvailable()
    val got = spark.table(q.name).as[(Long, Long)].collect().groupBy(_._1)
    q.stop()
    val counts = data.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    counts.filter(_._2 >= 3).foreach { case (u, c) =>
      val ms = got.getOrElse(u, Array.empty).map(_._2).sorted.toSeq
      assert(ms == (3L to c by 3L).toSeq, s"user $u count $c got $ms")
    }
    assert(got.keySet.subsetOf(counts.filter(_._2 >= 3).keySet))
  }

  test("event-time-timeout sessionization: emissions == batch gaps-and-islands on closed sessions") {
    import spark.implicits._
    import graft.streaming.{Event, SessionExample}
    def at(min: Int) = Timestamp.from(
      java.time.Instant.parse("2024-03-01T00:00:00Z").plusSeconds(min * 60L))
    def ev(uid: Long, min: Int, tpe: String) = Event(at(min), uid, tpe, 1.0)

    val source = MemoryStream[Event](implicitly[org.apache.spark.sql.Encoder[Event]], spark.sqlContext)
    val q = StreamingOps.sessionExamplesStream(source.toDS(), gapMinutes = 30, delay = "1 hour")
      .writeStream.format("memory").queryName("sessx_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()

    // b1: u1 two events in one session; u2 one event
    source.addData(ev(1, 0, "view"), ev(1, 10, "buy"), ev(2, 5, "view"))
    q.processAllAvailable()
    assert(spark.table(q.name).count() == 0) // nothing closed yet

    // b2: u1 at 120min — an in-batch gap for u1 (closes session at 0–10);
    // the watermark (120 − 60 = 60min) then passes u2's close (5+30=35)
    source.addData(ev(1, 120, "view"))
    q.processAllAvailable()

    // b3: far-future watermark driver closes u1's 120min session too
    source.addData(ev(99, 600, "view"))
    q.processAllAvailable()

    val got = spark.table(q.name).as[SessionExample].collect()
      .map(s => (s.user_id, s.start_ms, s.n_events, s.label)).toSet
    q.stop()
    val want = Set( // u99's own session is still open — correctly absent
      (1L, at(0).getTime, 2L, "buy"),
      (2L, at(5).getTime, 1L, "view"),
      (1L, at(120).getTime, 1L, "view"))
    assert(got == want, s"got $got")
  }

  test("sessionization merges late-but-in-watermark events order-insensitively (ADVICE r7)") {
    import spark.implicits._
    import graft.streaming.{Event, SessionExample}
    def at(min: Int) = Timestamp.from(
      java.time.Instant.parse("2024-03-01T00:00:00Z").plusSeconds(min * 60L))
    def ev(uid: Long, min: Int, tpe: String) = Event(at(min), uid, tpe, 1.0)

    val source = MemoryStream[Event](implicitly[org.apache.spark.sql.Encoder[Event]], spark.sqlContext)
    val q = StreamingOps.sessionExamplesStream(source.toDS(), gapMinutes = 30, delay = "1 hour")
      .writeStream.format("memory").queryName("sessoo_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()

    // b1: u1 [0,10]; u2 [60,60]. Watermark after b1 = 60 − 60 = 0min.
    source.addData(ev(1, 0, "view"), ev(1, 10, "buy"), ev(2, 60, "view"))
    q.processAllAvailable()

    // b2, both events strictly inside the watermark (> 0min):
    //  u1 at 40 — within gap of lastMs=10, extends forward: [0,40], label "end"
    //  u2 at 35 — OLDER than state.lastMs=60 (cross-batch out-of-order):
    //   must extend the session DOWNWARD to start 35 and keep label "view"
    //   (the pre-fix code rewound lastMs to 35 and overwrote the label)
    source.addData(ev(1, 40, "end"), ev(2, 35, "early"))
    q.processAllAvailable()

    // far-future watermark closes both in-flight sessions
    source.addData(ev(99, 600, "view"))
    q.processAllAvailable()

    val got = spark.table(q.name).as[SessionExample].collect()
      .map(s => (s.user_id, s.start_ms, s.n_events, s.label)).toSet
    q.stop()
    val want = Set(
      (1L, at(0).getTime, 3L, "end"),
      (2L, at(35).getTime, 2L, "view"))
    assert(got == want, s"got $got")
  }

  test("checkpoint restart: sessionizer state survives stop/resume; output == uninterrupted run") {
    import spark.implicits._
    import graft.streaming.{Event, SessionExample}
    def at(min: Int) = Timestamp.from(
      java.time.Instant.parse("2024-04-01T00:00:00Z").plusSeconds(min * 60L))
    def ev(uid: Long, min: Int, tpe: String) = Event(at(min), uid, tpe, 1.0)
    val b1 = Seq(ev(1, 0, "view"), ev(1, 10, "buy"), ev(2, 5, "view"))
    val b2 = Seq(ev(1, 120, "view")) // closes u1's first session via gap
    val b3 = Seq(ev(99, 600, "end")) // watermark-closes everything else

    // every production stream restarts: the run must resume from the
    // checkpointed offsets + state store, not recompute or drop sessions
    def run(interrupt: Boolean): Set[(Long, Long, Long, String)] = {
      val id = System.nanoTime()
      val cp = Scratch.path(s"sess_cp_$id")
      val outDir = Scratch.path(s"sess_out_$id")
      val source = MemoryStream[Event](
        implicitly[org.apache.spark.sql.Encoder[Event]], spark.sqlContext)
      def start() = StreamingOps.sessionExamplesStream(source.toDS())
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Append()).start()
      var q = start()
      source.addData(b1); q.processAllAvailable()
      if (interrupt) { q.stop(); q = start() } // kill mid-stream, resume from cp
      source.addData(b2); q.processAllAvailable()
      if (interrupt) { q.stop(); q = start() }
      source.addData(b3); q.processAllAvailable()
      q.stop()
      spark.read.parquet(outDir).as[SessionExample].collect()
        .map(s => (s.user_id, s.start_ms, s.n_events, s.label)).toSet
    }

    val restarted = run(interrupt = true)
    val clean = run(interrupt = false)
    assert(restarted == clean, s"restarted $restarted vs clean $clean")
    // and both equal the batch gaps-and-islands closed sessions
    assert(clean == Set(
      (1L, at(0).getTime, 2L, "buy"),
      (2L, at(5).getTime, 1L, "view"),
      (1L, at(120).getTime, 1L, "view")))
  }

  test("checkpoint restart: windowed agg (append) resumes and emits each window exactly once") {
    import spark.implicits._
    def ev(min: Int, v: Double) = Ev(Timestamp.from(
      java.time.Instant.parse("2024-06-01T00:00:00Z").plusSeconds(min * 60L)), 1L, "a", v)
    val id = System.nanoTime()
    val cp = Scratch.path(s"wm_cp_$id")
    val outDir = Scratch.path(s"wm_out_$id")
    val source = MemoryStream[Ev](implicitly[org.apache.spark.sql.Encoder[Ev]], spark.sqlContext)
    def start() = StreamingOps.hourlyTypeCountsStream(source.toDF(), "10 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    var q = start()
    source.addData(ev(0, 1.0), ev(30, 2.0)) // hour-0 window open
    q.processAllAvailable()
    q.stop(); q = start() // restart with the window still in state
    source.addData(ev(75, 4.0)) // watermark 65min: hour-0 closes post-restart
    q.processAllAvailable()
    q.stop(); q = start()
    source.addData(ev(130, 8.0)) // closes hour-1
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(outDir)
      .as[(Timestamp, String, Long, Double)].collect().sortBy(_._1.getTime)
    // exactly-once across restarts: each closed window appears ONCE with
    // the full pre-restart + post-restart contents
    assert(rows.length == 2, s"got ${rows.toSeq}")
    assert(rows(0)._3 == 2L && rows(0)._4 == 3.0)
    assert(rows(1)._3 == 1L && rows(1)._4 == 4.0)
  }

  test("stream-stream interval join: streaming (2 micro-batches each side, append) == batch") {
    import spark.implicits._
    // time-ordered split: event time only advances, so the watermark never
    // drops a row the batch join would keep
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", date_trunc("second", $"ts").as("ts"))
      .orderBy($"ts")
    val errs = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts").as[(Long, Long, Timestamp)].collect().toSeq
    val purs = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts").as[(Long, Timestamp)].collect().toSeq

    val se = MemoryStream[(Long, Long, Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Long, Timestamp)]], spark.sqlContext)
    val sp = MemoryStream[(Long, Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Timestamp)]], spark.sqlContext)
    val q = StreamingOps.errorsWithRecentPurchases(
        se.toDF().toDF("event_id", "user_id", "ts"),
        sp.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("ssj_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()
    val (e1, e2) = errs.splitAt(errs.length / 2)
    val (p1, p2) = purs.splitAt(purs.length / 2)
    se.addData(e1); sp.addData(p1); q.processAllAvailable()
    se.addData(e2); sp.addData(p2); q.processAllAvailable()
    val streamed = sortedRows(spark.table(q.name))
    q.stop()

    val batch = StreamingOps.errorsWithRecentPurchases(
      errs.toDF("event_id", "user_id", "ts"), purs.toDF("user_id", "ts"))
    assert(streamed == sortedRows(batch))
    assert(batch.count() > 0)
  }

  test("watermark eviction MEASURED: interval-join buffers drain past the horizon") {
    import spark.implicits._
    // Join state is the scale-critical store: each side buffers
    // rate × (range + delay). Buffer 60 purchases + 30 errors around t0,
    // then advance both sides' event time ~12 hours — the join must not
    // retain the stale buffers.
    def at(sec: Long) = Timestamp.from(
      java.time.Instant.parse("2024-08-01T00:00:00Z").plusSeconds(sec))
    val se = MemoryStream[(Long, Long, Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Long, Timestamp)]], spark.sqlContext)
    val sp = MemoryStream[(Long, Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Timestamp)]], spark.sqlContext)
    val q = StreamingOps.errorsWithRecentPurchases(
        se.toDF().toDF("event_id", "user_id", "ts"),
        sp.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("ssje_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()
    se.addData((1L to 30L).map(i => (i, i, at(i))))
    sp.addData((1L to 60L).map(i => (i % 30L, at(i))))
    q.processAllAvailable()
    val buffered = q.lastProgress.stateOperators.head.numRowsTotal
    assert(buffered >= 90L, s"expected both sides buffered, saw $buffered")
    se.addData(Seq((900L, 900L, at(43200L)))); sp.addData(Seq((901L, at(43200L))))
    q.processAllAvailable()
    se.addData(Seq((902L, 902L, at(43260L)))); sp.addData(Seq((903L, at(43260L))))
    q.processAllAvailable()
    val remaining = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(remaining <= 10L,
      s"join state kept $remaining rows — horizon eviction is broken")
  }

  test("left-outer interval join: unmatched errors emit nulls once the watermark proves no match") {
    import spark.implicits._
    def at(min: Int) = Timestamp.from(
      java.time.Instant.parse("2024-07-01T00:00:00Z").plusSeconds(min * 60L))
    // u1's error has a purchase 20min before (match); u2's has none (the
    // row an inner join drops). Sentinels (ids >= 90) push the watermark
    // far past both errors' horizons so the null-extended row can emit.
    val errs = Seq((1L, 1L, at(30)), (2L, 2L, at(40)))
    val purs = Seq((1L, at(10)))

    val se = MemoryStream[(Long, Long, Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Long, Timestamp)]], spark.sqlContext)
    val sp = MemoryStream[(Long, Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Timestamp)]], spark.sqlContext)
    val q = StreamingOps.errorsWithRecentPurchasesOuter(
        se.toDF().toDF("event_id", "user_id", "ts"),
        sp.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("ssoj_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()
    se.addData(errs); sp.addData(purs); q.processAllAvailable()
    se.addData((99L, 99L, at(2000))); sp.addData((98L, at(2000)))
    q.processAllAvailable()
    // a second watermark advance flushes outer state finalized by the first
    se.addData((97L, 97L, at(4000))); sp.addData((96L, at(4000)))
    q.processAllAvailable()
    val got = spark.table(q.name).as[(Long, Long, Option[Timestamp])].collect()
      .filter(_._1 < 90).toSet
    q.stop()

    val batch = StreamingOps.errorsWithRecentPurchasesOuter(
        errs.toDF("event_id", "user_id", "ts"), purs.toDF("user_id", "ts"))
      .as[(Long, Long, Option[Timestamp])].collect().toSet
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got == Set((1L, 1L, Some(at(10))), (2L, 2L, None)))
  }

  test("full-outer interval join: both unmatched sides emit nulls past the watermark") {
    import spark.implicits._
    def at(min: Int) = Timestamp.from(
      java.time.Instant.parse("2024-07-02T00:00:00Z").plusSeconds(min * 60L))
    // u1: error matched by a purchase 20min earlier; u2: error with no
    // purchase (left-null row); u3: purchase with no error in the
    // following hour (right-null row — the one q152 still drops)
    val errs = Seq((1L, 1L, at(30)), (2L, 2L, at(40)))
    val purs = Seq((1L, at(10)), (3L, at(15)))

    val se = MemoryStream[(Long, Long, Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Long, Timestamp)]], spark.sqlContext)
    val sp = MemoryStream[(Long, Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Timestamp)]], spark.sqlContext)
    val q = StreamingOps.errorsWithRecentPurchasesFull(
        se.toDF().toDF("event_id", "user_id", "ts"),
        sp.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("ssfj_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()
    se.addData(errs); sp.addData(purs); q.processAllAvailable()
    // sentinels (ids >= 90) push the watermark far past both horizons;
    // a second advance flushes outer state finalized by the first
    se.addData((99L, 99L, at(2000))); sp.addData((98L, at(2000)))
    q.processAllAvailable()
    se.addData((97L, 97L, at(4000))); sp.addData((96L, at(4000)))
    q.processAllAvailable()
    val got = spark.table(q.name)
      .as[(Option[Long], Long, Option[Timestamp])].collect()
      .filter(r => r._1.forall(_ < 90) && r._2 < 90).toSet
    q.stop()

    val batch = StreamingOps.errorsWithRecentPurchasesFull(
        errs.toDF("event_id", "user_id", "ts"), purs.toDF("user_id", "ts"))
      .as[(Option[Long], Long, Option[Timestamp])].collect().toSet
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got == Set(
      (Some(1L), 1L, Some(at(10))),   // matched
      (Some(2L), 2L, None),           // unmatched error
      (None, 3L, Some(at(15)))))      // unmatched purchase
  }

  test("dropDuplicatesWithinWatermark: re-delivered events dedupe inside the horizon") {
    import spark.implicits._
    def ev(min: Int, v: Double) = Ev(Timestamp.from(
      java.time.Instant.parse("2024-03-01T00:00:00Z").plusSeconds(min * 60L)), 7L, "dup", v)

    val source = MemoryStream[Ev](implicitly[org.apache.spark.sql.Encoder[Ev]], spark.sqlContext)
    val q = source.toDF()
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("ddw_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()

    source.addData(ev(0, 1.0), ev(1, 2.0))
    q.processAllAvailable()
    source.addData(ev(2, 1.0)) // re-delivery of value 1.0 within the horizon
    q.processAllAvailable()
    val vals = spark.table(q.name).as[Ev].collect().map(_.value).sorted.toSeq
    q.stop()
    assert(vals == Seq(1.0, 2.0)) // duplicate suppressed
  }

  test("watermark eviction MEASURED: dedup state drops from 100 rows to the live horizon") {
    import spark.implicits._
    // SCALING.md's streaming claim is "state = rate × horizon, nothing
    // grows with stream length" — assert it from the engine's own state
    // metrics, not just output semantics: 100 keys buffered, then event
    // time jumps 10 hours past their 30-minute horizon and the store must
    // shrink to the still-live keys.
    def ev(sec: Long, uid: Long) = Ev(Timestamp.from(
      java.time.Instant.parse("2024-06-01T00:00:00Z").plusSeconds(sec)), uid, "k", 1.0)
    val source = MemoryStream[Ev](implicitly[org.apache.spark.sql.Encoder[Ev]], spark.sqlContext)
    val q = source.toDF()
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id"))
      .writeStream.format("memory").queryName("evict_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()
    source.addData((1L to 100L).map(u => ev(u, u)))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.head.numRowsTotal == 100L)
    // watermark advances past every buffered key's horizon...
    source.addData(ev(36000L, 999L)); q.processAllAvailable()
    // ...and the next batch's cleanup pass must actually evict
    source.addData(ev(36060L, 1000L)); q.processAllAvailable()
    val remaining = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(remaining <= 5L,
      s"state store kept $remaining rows — eviction is broken, state grows with stream length")
  }

  test("dedupedEvents stream == batch dropDuplicates on the same keys (q64's twin claim)") {
    import spark.implicits._
    def ev(min: Int, uid: Long) = Ev(Timestamp.from(
      java.time.Instant.parse("2024-05-01T00:00:00Z").plusSeconds(min * 60L)), uid, "t", 1.0)
    // duplicates share (user_id, event_type, ts) exactly; all within horizon
    val rows = Seq(ev(0, 1L), ev(0, 1L), ev(5, 1L), ev(5, 2L), ev(5, 2L), ev(9, 3L))

    val source = MemoryStream[Ev](implicitly[org.apache.spark.sql.Encoder[Ev]], spark.sqlContext)
    val q = StreamingOps.dedupedEvents(source.toDF().select($"user_id", $"event_type", $"ts"))
      .writeStream.format("memory").queryName("dedup_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()
    val (r1, r2) = rows.splitAt(3)
    source.addData(r1); q.processAllAvailable()
    source.addData(r2); q.processAllAvailable()
    val streamed = sortedRows(spark.table(q.name))
    q.stop()

    val batch = rows.toDF().select($"user_id", $"event_type", $"ts")
      .dropDuplicates("user_id", "event_type", "ts")
    assert(streamed == sortedRows(batch))
    assert(batch.count() == 4)
  }

  test("watermark append mode: windows emit once closed; late events are dropped") {
    import spark.implicits._
    def ev(min: Int, v: Double) = Ev(Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(min * 60L)), 1L, "a", v)

    val source = MemoryStream[Ev](implicitly[org.apache.spark.sql.Encoder[Ev]], spark.sqlContext)
    val q = StreamingOps.hourlyTypeCountsStream(source.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("wm_" + System.nanoTime())
      .outputMode(OutputMode.Append()).start()

    source.addData(ev(0, 1.0), ev(30, 2.0)) // hour-0 window open
    q.processAllAvailable()
    assert(spark.table(q.name).count() == 0) // nothing closed yet

    source.addData(ev(75, 4.0)) // watermark → 75-10=65min: hour-0 closes
    q.processAllAvailable()
    val closed = spark.table(q.name).as[(Timestamp, String, Long, Double)].collect()
    assert(closed.length == 1)
    assert(closed.head._3 == 2L && closed.head._4 == 3.0)

    source.addData(ev(5, 100.0)) // late: behind the watermark, must be dropped
    source.addData(ev(130, 8.0)) // watermark → 120min: hour-1 closes WITHOUT the late row
    q.processAllAvailable()
    val rows = spark.table(q.name).as[(Timestamp, String, Long, Double)].collect()
      .sortBy(_._1.getTime)
    q.stop()
    assert(rows.length == 2)
    assert(rows(1)._3 == 1L && rows(1)._4 == 4.0) // only the 75-min event; late 100.0 absent
  }

  test("stream-static enrichment join (q83 shape): streaming == batch, stateless") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = Seq(
      ("click", "engage", 10L), ("view", "engage", 5L),
      ("purchase", "convert", 50L), ("signup", "convert", 30L),
      ("error", "ops", 0L)).toDF("event_type", "tier", "w10")
    def shape(df: DataFrame): DataFrame =
      StreamingOps.enrichWithStatic(
          df.select(col("event_type"), round(col("value") * 100).cast("long").as("v100")),
          dim, "event_type")
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"), sum(col("v100") * col("w10")).as("wsum"))
    val data = eventData()
    val batch = shape(data.toDF())
    val stream = runCompleteStream(data, shape)
    assert(sortedRows(stream) == sortedRows(batch))
    assert(batch.count() > 0)
  }

  test("state store reader: checkpointed agg state is inspectable and holds exactly the open windows") {
    import spark.implicits._
    def ev(min: Int, tpe: String, v: Double) = Ev(Timestamp.from(
      java.time.Instant.parse("2024-07-01T00:00:00Z").plusSeconds(min * 60L)), 1L, tpe, v)
    val id = System.nanoTime()
    val cp = Scratch.path(s"ssr_cp_$id")
    val outDir = Scratch.path(s"ssr_out_$id")
    val source = MemoryStream[Ev](
      implicitly[org.apache.spark.sql.Encoder[Ev]], spark.sqlContext)
    val q = StreamingOps.hourlyTypeCountsStream(source.toDF(), "10 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    source.addData(ev(0, "a", 1.0), ev(30, "a", 2.0), ev(75, "b", 4.0))
    q.processAllAvailable()
    // batch 2's watermark (65 min) closes hour 0 and EVICTS it from state
    source.addData(ev(130, "c", 8.0))
    q.processAllAvailable()
    q.stop()
    // the statestore source reads the last committed state as a DataFrame —
    // the operational surface for debugging a live 100 TB stream's state
    // without stopping it. After batch 2 the watermark is 120 min
    // (processAllAvailable runs the no-data finalization batch), so hours
    // 0 and 1 are emitted AND EVICTED; exactly the open hour-2 window
    // must remain, with its partial aggregate buffers
    val state = spark.read.format("statestore").load(cp)
    val rows = state
      .select($"key.window.start".cast("long").as("ws"),
        $"key.event_type".as("tpe"),
        $"value.count".as("n"), $"value.sum".as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val base = java.time.Instant.parse("2024-07-01T00:00:00Z").getEpochSecond
    assert(rows == Set((base + 2 * 3600L, "c", 1L, 8.0)), s"state rows: $rows")
    // and the evicted windows are exactly the ones the sink received
    val emitted = spark.read.parquet(outDir)
      .select($"window_start".cast("long"), $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(emitted == Set((base, "a"), (base + 3600L, "b")), s"emitted: $emitted")
  }
}
