package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants of the late-round-8 warehouse-ops tier
  * (q155–q161) — properties that survive a data refresh, complementing
  * the DuckDB hash gate (which pins one dataset's values):
  * SCD2 interval chaining, PageRank's damping floor, decay domination,
  * attribution mass conservation.
  */
class WarehouseOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q155 SCD2 intervals chain gaplessly per user and never repeat a state") {
    val rows = relational.EventQueries.q155Scd2Build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, hist) =>
      // output is ordered (user_id, valid_from_us); each row: user_id,
      // state, valid_from_us, valid_to_us, is_current
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) == b.getLong(2),
            "valid_to must equal the next interval's valid_from")
          assert(a.getString(1) != b.getString(1),
            "consecutive intervals must change state")
        case _ => ()
      }
      // exactly one open (current) interval per user, and it is the last
      assert(hist.count(_.getLong(3) == -1L) == 1)
      assert(hist.last.getInt(4) == 1)
    }
  }

  test("q164 incremental SCD2 merge equals the full rebuild at any cut") {
    val full = relational.EventQueries.q155Scd2Build(spark, sf).collect()
      .map(_.toSeq).toSet
    // sweep cuts: mid-corpus, before everything (all-delta, no seeds),
    // after everything (empty delta, pure pass-through)
    Seq(1705276800000000L, // 2024-01-15
        1704067200000000L, // 2024-01-01 (≤ min ts)
        1706659200000000L  // 2024-01-31 (> max ts)
    ).foreach { cut =>
      val merged = relational.EventQueries.scd2Merge(spark, sf, cut).collect()
        .map(_.toSeq).toSet
      assert(merged == full, s"merge at cut=$cut diverged from rebuild")
    }
  }

  test("q157 ranks respect the damping floor and the top-20 total order") {
    val rows = relational.GraphQueries.q157GraphPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    // 0.15 teleport mass in ×10⁶ fixed-point: no connected node sinks below
    assert(rows.forall(_._2 >= 150000L))
    // orderBy(rank desc, key asc) is a total order
    assert(rows.sameElements(rows.sortBy { case (k, v) => (-v, k) }))
  }

  test("q159 decayed score never exceeds the undecayed cent sum per user") {
    import spark.implicits._
    val got = relational.EventQueries.q159DecayedScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val raw = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(sum(floor($"value" * 100).cast("long")).as("cents"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == raw.keySet)
    got.foreach { case (u, (score, n)) =>
      assert(score <= raw(u)._1, s"user $u: decayed $score > raw ${raw(u)._1}")
      assert(score >= 0L && n == raw(u)._2)
    }
  }

  test("q160 attribution conserves purchase count and revenue mass") {
    import spark.implicits._
    val rows = relational.EventQueries.q160Attribution(spark, sf).collect()
    val (nAttr, revAttr) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    val direct = Tables.events(spark, sf)
      .where($"event_type" === "purchase")
      .agg(count(lit(1)), sum(floor($"value" * 100).cast("long")))
      .head()
    assert(nAttr == direct.getLong(0), "every purchase lands in exactly one channel")
    assert(revAttr == direct.getLong(1), "revenue mass is conserved across channels")
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("q172 life table telescopes: at_risk drains by exits, hazard in [0,1], guard in plan") {
    val df = relational.EventQueries.q172SurvivalHazard(spark, sf)
    // the calendar-bound raise_error guard is load-bearing at scale (q120's
    // documented-bound class) — pin it so a refactor can't drop it silently
    assert(df.queryExecution.analyzed.toString.contains("raise_error"),
      "q172 lost its MaxWindowDays guard")
    // the three window sums (row_number + two frames) must share ONE pass —
    // counted as physical WindowExec nodes, not plan-string substrings
    // (ADVICE r9: "Window" also appears in windowspecdefinition / field
    // names, so the string count could flip on cosmetic plan changes).
    // PlanWalk descends through the AdaptiveSparkPlanExec wrapper — a
    // plain .collect on the executed plan sees NOTHING under AQE and the
    // assertion would pass vacuously at 0; the >= 1 floor guards against
    // that failure mode returning.
    val nWindowExec = PlanWalk.allNodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(nWindowExec >= 1, "walker stopped seeing the life-table WindowExec at all")
    assert(nWindowExec <= 2,
      "life-table windows no longer collapse into a single WindowExec")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // day 0's at-risk set is every observed user (everyone eventually exits)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.head.getLong(1) == users)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) == a.getLong(1) - a.getLong(2) - a.getLong(3),
          "at_risk(d+1) must equal at_risk(d) - conversions(d) - censored(d)")
      case _ => ()
    }
    val last = rows.last
    assert(last.getLong(1) == last.getLong(2) + last.getLong(3),
      "the final day must exhaust the risk set")
    rows.foreach { r =>
      val h = r.getDouble(4)
      assert(h >= 0.0 && h <= 1.0, s"hazard out of [0,1]: $h")
    }
  }

  test("q173 gini: totals tie to direct counts, coefficient in [0,1), guard in plan") {
    val df = relational.EventQueries.q173GiniConcentration(spark, sf)
    assert(df.queryExecution.analyzed.toString.contains("raise_error"),
      "q173 lost its MaxEngagementLevels guard")
    val r = df.collect().head
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val events = Tables.events(spark, sf).count()
    assert(r.getLong(0) == users, "n must be the distinct user count")
    assert(r.getLong(1) == events, "total_events must be the event count")
    val g = r.getDouble(2)
    assert(g >= 0.0 && g < 1.0, s"gini out of [0,1): $g")
  }

  test("q174 A/A z-test: arms partition users, conversions bounded, |z| small") {
    val r = relational.EventQueries.q174AbTest(spark, sf).collect().head
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(3) == users, "arms must partition the user set")
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(4) <= r.getLong(3),
      "conversions cannot exceed arm size")
    val z = r.getDouble(6)
    // parity is independent of behavior: an A/A test should read as noise
    // (and the saturated-arms 0/0 case is defined to 0 by contract)
    assert(!z.isNaN && math.abs(z) < 5.0, s"A/A |z| should be small, got $z")
  }
}
