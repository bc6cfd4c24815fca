package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.relational.ScaleQueries

/** Plan-shape assertions for the at-scale join tier (q76/q77/q81/q82):
  * these queries exist for their PHYSICAL plans, so the specs pin the plan,
  * not just the rows (the DuckDB oracle already pins the rows).
  */
class ScaleQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q76 star join broadcasts the dim chain and returns per-nation revenue") {
    val df = ScaleQueries.q76StarJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast dims in:\n$plan")
    val rows = df.collect()
    assert(rows.length > 0 && rows.length <= 5) // at most the 5 ASIA nations
    // revenue column is sorted descending
    val revs = rows.map(_.getDouble(1))
    assert(revs.sameElements(revs.sortBy(-(_: Double))))
  }

  test("q77 join is runtime-bloom-filtered under scale-shaped thresholds") {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // at 100 TB the fact scan passes the 10 GB default by itself; at test
      // scale we zero the threshold to see the same injected plan
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force the shuffle join the filter exists to protect (a broadcast
      // join needs no runtime filter and suppresses injection)
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = ScaleQueries.q77RuntimeFilterJoin(spark, sf)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.toLowerCase.contains("bloomfilter"),
        s"expected an injected bloom runtime filter in:\n$opt")
      assert(df.count() > 0)
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _))
    }
  }

  test("q81 bucketed join plan has no shuffle exchange") {
    // run once to (re)create the bucketed tables
    assert(ScaleQueries.q81BucketedJoin(spark, sf).count() > 0)
    import spark.implicits._
    val tag = Scratch.tag(sf)
    // at test SF the planner would broadcast (and skip the bucketed read
    // entirely); disable it to see the shuffle-join regime the bucketing
    // exists for — the regime both sides are in at 100 TB
    val c = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.legacy.bucketedTableScan.outputOrdering").map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // sortBy order is only propagated under this conf (since Spark 3.0,
      // because multi-file buckets broke it); our one-file-per-bucket
      // layout is exactly the case it is sound for
      c.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = spark.table(s"graft_bkt_items_$tag")
        .join(spark.table(s"graft_bkt_orders_$tag"), $"l_orderkey" === $"o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(!plan.contains("+- Sort"), s"one-file-per-bucket sortBy must avoid re-sort:\n$plan")
    } finally saved.foreach { case (k, v) => v.fold(c.unset(k))(c.set(k, _)) }
  }

  test("q81 bucketed tables hold one file per bucket") {
    val tag = Scratch.tag(sf)
    for (t <- Seq(s"graft_bkt_items_$tag", s"graft_bkt_orders_$tag")) {
      val loc = new java.io.File(
        spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
          .location)
      val dataFiles = loc.listFiles().filter(f => f.getName.startsWith("part-"))
      assert(dataFiles.length == 8, s"$t: ${dataFiles.length} files, want 8 (one per bucket)")
    }
  }

  test("q133 fact scan is dynamically partition-pruned by the dim subquery") {
    import spark.implicits._
    val df = ScaleQueries.q133DppStarProbe(spark, sf)
    df.collect() // AQE finalizes the plan (and DPP metrics) at execution
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("dynamicpruning"),
      s"expected a DPP subquery on the fact scan:\n${plan.toString.take(2000)}")
    // and the pruning is real: the fact scan read 2 of the 7 year
    // partitions (metrics come from the executed scan). After AQE
    // finalizes, leaf scans live inside materialized query stages, which
    // neither children-traversal nor collectWithSubqueries descends into —
    // walk the wrappers explicitly.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val kids: Seq[SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      (p match { case s: FileSourceScanExec => Seq(s); case _ => Nil }) ++
        kids.flatMap(allScans) ++ p.subqueries.flatMap(allScans)
    }
    val scans = allScans(plan).filter(
      _.partitionFilters.exists(_.toString.contains("dynamicpruning")))
    assert(scans.nonEmpty, "no dynamically-pruned file scan found")
    // pruning is real: the scan read exactly the dim's years, not the table's
    val o = Tables.orders(spark, sf)
    val dimYears = o.groupBy(year($"o_orderdate")).count()
      .filter($"count" % 2 === 1).count()
    val allYears = o.select(year($"o_orderdate")).distinct().count()
    assert(dimYears > 0 && dimYears < allYears, "fixture must make pruning observable")
    val read = scans.head.metrics("numPartitions").value
    assert(read == dimYears,
      s"DPP should leave $dimYears of $allYears partitions, got $read; " +
        s"filters=${scans.head.partitionFilters.mkString(" | ")}")
  }

  test("q91 compaction plan uses WindowGroupLimit (top-1 pushed into the sort)") {
    val plan = ScaleQueries.q91LatestWins(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("q94 LATERAL decorrelates to a ranked join, not a nested loop") {
    val plan = graft.relational.AdvancedQueries.q94Lateral(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected decorrelated ranked join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"LATERAL must not plan as a nested loop:\n$plan")
  }

  test("q82 outlier counts match an independent driver-side recomputation") {
    import spark.implicits._
    val got = ScaleQueries.q82GroupOutliers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // same exact-integer-moment formula, computed sequentially in Scala
    val vals = Tables.events(spark, sf)
      .select($"event_type", round($"value" * 100).cast("long").as("v"))
      .as[(String, Long)].collect().toSeq
    val want = vals.groupBy(_._1).flatMap { case (k, kv) =>
      val v = kv.map(_._2)
      val n = v.size.toDouble
      val s1 = v.sum.toDouble
      val s2 = v.map(x => x * x).sum.toDouble
      val mean = s1 / n
      val std = math.sqrt(s2 / n - mean * mean)
      val c = v.count(x => math.abs((x - mean) / std) > 2.0)
      if (c > 0) Some(k -> c.toLong) else None
    }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q158 incremental merge equals the direct full aggregation (IVM law)") {
    import spark.implicits._
    val got = ScaleQueries.q158IncrementalAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity".cast("long")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("q156's per-source cap plans as WindowGroupLimit, not a full ranking") {
    // the scale claim: rank<=10 is pushed into the per-source sort so a
    // task holds a 10-row heap per key, never a source's full doc list
    val df = graft.text.PipelineQueries.q156SourceCap(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected group-limit pushdown in:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the cap binds: no source exceeds 10 kept documents
    val perSource = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(perSource.values.forall(_ <= 10))
  }

  test("q163 integrity audit covers every edge with zero orphans and full row counts") {
    val rows = ScaleQueries.q163RefIntegrity(spark, sf).collect()
    assert(rows.length == 7)
    val liRows = Tables.lineitem(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
        s"${r.getString(0)}: expected zero orphans on the consistent generator")
      assert(r.getLong(1) > 0L)
    }
    // n_rows is the CHILD cardinality, not the join's: a duplicate-free
    // parent must leave lineitem edges exactly lineitem-sized
    assert(rows.filter(_.getString(0).startsWith("lineitem.")).forall(_.getLong(1) == liRows))
  }

  test("q165 pairs are canonical (a<b), counts positive, and order is total") {
    val df = ScaleQueries.q165CopurchasePairs(spark, sf)
    // the scale claim: top-25 under a total order is a per-partition heap,
    // never a global sort of the pair-count relation
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.forall { case (a, b, n) => a < b && n >= 1 })
    assert(rows.sameElements(rows.sortBy { case (a, b, n) => (-n, a, b) }))
  }

  test("q166: 12 contracts hold; the composite-key contract detects its violation") {
    val rows = ScaleQueries.q166ContractChecks(spark, sf).collect()
    assert(rows.length == 13)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, s"${r.getString(0)}: must check a non-empty set")
    }
    val (violated, held) =
      rows.partition(_.getString(0) == "unique:lineitem.l_orderkey+l_linenumber")
    held.foreach(r =>
      assert(r.getLong(2) == 0L, s"${r.getString(0)}: violations must be 0"))
    // the generator draws line numbers randomly — the duplicate composite
    // keys are real, and the detector must see them
    assert(violated.head.getLong(2) > 0L,
      "the known-violated contract must be detected")
  }

  test("q170 rule metrics are bounded: conf in (0,1], lift positive, pairs = q165's") {
    val rules = ScaleQueries.q170AssociationRules(spark, sf).collect()
    val pairs = ScaleQueries.q165CopurchasePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rules.map(r => (r.getLong(0), r.getLong(1))).toSet == pairs)
    rules.foreach { r =>
      val (conf, lift) = (r.getDouble(3), r.getDouble(4))
      assert(conf > 0.0 && conf <= 1.0, s"conf out of range: $r")
      assert(lift > 0.0, s"lift must be positive: $r")
    }
  }

  test("q167 diff classes conserve mass and the changed delta is exactly the bump") {
    import org.apache.spark.sql.functions.col
    val m = ScaleQueries.q167SnapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val keys = Tables.orders(spark, sf).select(col("o_orderkey")).collect().map(_.getLong(0))
    val added = keys.count(_ % 97 == 0)
    val removed = keys.count(_ % 100 == 0)
    val changed = keys.count(k => k % 10 == 0 && k % 100 != 0)
    assert(m("added")._1 == added && m("removed")._1 == removed)
    assert(m("changed")._1 == changed)
    // every changed row is a +$5.00 bump, nothing else
    assert(m("changed")._2 == 500L * changed)
    assert(m("unchanged")._2 == 0L)
    // mass: each base key lands in exactly one class; adds are extra
    assert(m.values.map(_._1).sum == keys.length + added)
  }

  test("q161 checksum is layout-invariant: shuffled input, identical fingerprint") {
    val base = Tables.orders(spark, sf)
    val a = graft.etl.EtlQueries.checksumOf(base).collect().toSeq
    val b = graft.etl.EtlQueries.checksumOf(
      base.repartition(7).sortWithinPartitions(col("o_totalprice").desc))
      .collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}
