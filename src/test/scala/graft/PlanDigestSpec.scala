package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide plan-shape regression gate (VERDICT r14 missing #4):
  * the oracle hash proves every query's VALUES; nothing before this suite
  * proved its PLAN stayed the plan we audited — a pushdown or broadcast
  * regression ships silently as long as the values still match. Digest =
  * counts of the scale-relevant physical operators (exchanges, join
  * strategies, aggregates, sorts, windows, scans) over the pre-execution
  * plan, walked through the AQE wrappers (PlanWalk). Checked in at
  * PLAN_DIGESTS.json; any drift fails with a per-query diff.
  *
  * Regenerating after an INTENTIONAL plan change (or a testdata regen,
  * which can legitimately flip a size-based join choice):
  *   SPARK_GRAFT_WRITE_DIGESTS=1 sbt "testOnly graft.PlanDigestSpec"
  * then review the JSON diff like any golden change.
  *
  * Determinism notes: the digest reads the INITIAL adaptive plan (no
  * execution), so AQE runtime re-planning never churns it; loop-built
  * queries (BPE training, Lloyd, beam search) run their construction
  * jobs but their FINAL plan over localCheckpoint RDDs is stable.
  * RDD scans, locals, and codegen wrappers are deliberately not
  * counted — they vary with checkpoint placement, not with the
  * scale-relevant shape.
  */
class PlanDigestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  val goldenPath = "PLAN_DIGESTS.json"

  private def digest(df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.execution._
    val names = PlanWalk.allNodes(df.queryExecution.executedPlan).flatMap {
      case _: exchange.ShuffleExchangeExec => Some("shuffle")
      case _: exchange.BroadcastExchangeExec => Some("bcast")
      case _: exchange.ReusedExchangeExec => Some("reuse")
      case _: joins.BroadcastHashJoinExec => Some("bhj")
      case _: joins.SortMergeJoinExec => Some("smj")
      case _: joins.ShuffledHashJoinExec => Some("shj")
      case _: joins.BroadcastNestedLoopJoinExec => Some("bnlj")
      case _: joins.CartesianProductExec => Some("cartesian")
      case _: aggregate.HashAggregateExec => Some("hashagg")
      case _: aggregate.ObjectHashAggregateExec => Some("objagg")
      case _: aggregate.SortAggregateExec => Some("sortagg")
      case _: SortExec => Some("sort")
      case _: window.WindowExec => Some("window")
      case _: window.WindowGroupLimitExec => Some("wgl")
      case _: TakeOrderedAndProjectExec => Some("topk")
      case _: FileSourceScanExec => Some("scan")
      case _: datasources.v2.BatchScanExec => Some("scan")
      case _ => None
    }
    names.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${v.size}" }.mkString(" ")
  }

  private def readGolden(): Map[String, String] = {
    val f = new java.io.File(goldenPath)
    if (!f.exists()) return Map.empty
    val txt = java.nio.file.Files.readString(f.toPath)
    // flat {"name": "digest", ...} — parsed with a regex, written by us
    """"([^"]+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  test("every registered query's plan digest matches the checked-in golden (exchange/join/agg shape)") {
    val got = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> digest(fn(spark, sf))
    }
    if (sys.env.contains("SPARK_GRAFT_WRITE_DIGESTS")) {
      val json = got.map { case (k, v) => s"""  "$k": "$v"""" }
        .mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(goldenPath), json)
      info(s"wrote ${got.size} digests to $goldenPath")
    } else {
      val golden = readGolden()
      assert(golden.nonEmpty, s"$goldenPath missing — regenerate with SPARK_GRAFT_WRITE_DIGESTS=1")
      val missing = got.map(_._1).filterNot(golden.contains)
      val drifted = got.filter { case (n, d) => golden.get(n).exists(_ != d) }
      val stale = golden.keys.filterNot(got.map(_._1).toSet)
      assert(missing.isEmpty && drifted.isEmpty && stale.isEmpty,
        s"""plan digests drifted — review, then regenerate the golden if intentional
           |new queries without a digest: ${missing.mkString(", ")}
           |stale golden entries: ${stale.mkString(", ")}
           |${drifted.map { case (n, d) => s"$n:\n  golden: ${golden(n)}\n  now:    $d" }
            .mkString("\n")}""".stripMargin)
    }
  }
}
