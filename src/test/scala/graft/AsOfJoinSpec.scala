package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{AsOf, AsOfJoinExec}

/** The native as-of join operator (plans.AsOfJoin): correctness against
  * hand-computed answers on adversarial small inputs, row-for-row
  * equality with q33's compositional window form on real data, and the
  * physical plan contract (one AsOfJoinExec, exchanges only below it,
  * no WindowExec, ordering reused by the merge).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  import org.apache.spark.sql.DataFrame

  private def leftDf(rows: Seq[(Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "t", "tag")
  }
  private def rightDf(rows: Seq[(Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("rk", "rt", "payload")
  }
  private def asof(l: DataFrame, r: DataFrame): Seq[(Long, Long, String, Option[String])] = {
    AsOf.joinAsOf(l, r, Seq("k" -> "rk"), "t", "rt")
      .select(col("k"), col("t"), col("tag"), col("payload"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3))))
      .sortBy(x => (x._1, x._2, x._3))
  }

  test("latest right row at or before each left time wins; no match → null") {
    val l = leftDf(Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d")))
    val r = rightDf(Seq((1L, 7L, "p7"), (1L, 15L, "p15"), (3L, 1L, "zz")))
    assert(asof(l, r) === Seq(
      (1L, 5L, "c", None),          // before any purchase
      (1L, 10L, "a", Some("p7")),   // 7 <= 10 < 15
      (1L, 20L, "b", Some("p15")),  // latest of {7,15}
      (2L, 10L, "d", None)))        // key has no right rows at all
  }

  test("equal timestamps match (<= not <) and every left row is kept") {
    val l = leftDf(Seq((1L, 7L, "x"), (1L, 7L, "y")))
    val r = rightDf(Seq((1L, 7L, "p7")))
    assert(asof(l, r) === Seq(
      (1L, 7L, "x", Some("p7")),
      (1L, 7L, "y", Some("p7"))))
  }

  test("empty right side null-extends every left row") {
    val l = leftDf(Seq((1L, 1L, "a"), (2L, 2L, "b")))
    val r = rightDf(Seq.empty)
    assert(asof(l, r) === Seq((1L, 1L, "a", None), (2L, 2L, "b", None)))
  }

  test("right rows strictly after all left times never match") {
    val l = leftDf(Seq((1L, 10L, "a")))
    val r = rightDf(Seq((1L, 11L, "later"), (1L, 99L, "much_later")))
    assert(asof(l, r) === Seq((1L, 10L, "a", None)))
  }

  test("keys never match across groups even when times interleave") {
    val l = leftDf(Seq((1L, 10L, "a"), (2L, 10L, "b")))
    val r = rightDf(Seq((2L, 9L, "for2")))
    assert(asof(l, r) === Seq((1L, 10L, "a", None), (2L, 10L, "b", Some("for2"))))
  }

  test("shared attributes (true self-join without re-read) fail loudly") {
    val base = leftDf(Seq((1L, 1L, "a")))
    val e = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(base, base.filter(col("t") > 0), Seq("k" -> "k"), "t", "t")
    }
    assert(e.getMessage.contains("share attributes"))
  }

  test("key/time type mismatches fail loudly") {
    val l = leftDf(Seq((1L, 1L, "a")))
    val r = rightDf(Seq((1L, 1L, "p"))).withColumn("rk", col("rk").cast("int"))
    val e = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(l, r, Seq("k" -> "rk"), "t", "rt")
    }
    assert(e.getMessage.contains("key types must match"))
  }

  test("q171 (native operator) ≡ q33 (union+window form) row for row") {
    val a = relational.AdvancedQueries.q33AsofJoin(spark, sf).collect().toSeq
    val b = relational.AdvancedQueries.q171AsofNative(spark, sf).collect().toSeq
    assert(a.nonEmpty, "fixture produced no as-of rows")
    assert(a === b)
  }

  // AQE wraps the plan in AdaptiveSparkPlanExec and (Spark 4) nests the
  // work inside childless ResultQueryStageExec/ShuffleQueryStageExec
  // wrappers that plain collect() does not descend into — node-hunt
  // recursively through every wrapper.
  private def findAsof(p: org.apache.spark.sql.execution.SparkPlan): Seq[AsOfJoinExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => findAsof(a.executedPlan)
      case q: QueryStageExec => findAsof(q.plan)
      case e: AsOfJoinExec => e +: p.children.flatMap(findAsof)
      case _ => p.children.flatMap(findAsof)
    }
  }

  test("plan contract: one AsOfJoinExec, no WindowExec, sorts feed the merge") {
    val qe = relational.AdvancedQueries.q171AsofNative(spark, sf).queryExecution
    val plan = qe.executedPlan
    val asofNodes = findAsof(plan)
    assert(asofNodes.size == 1, s"expected exactly one AsOfJoinExec in:\n$plan")
    assert(!plan.toString.contains("WindowExec"),
      "native form must not fall back to the window formulation")
    // EnsureRequirements satisfied the declared contract: each side is
    // hash-clustered on its key and sorted (key, time) below the merge.
    val asofStr = asofNodes.head.toString
    assert(asofStr.contains("Sort"), s"expected child sorts under:\n$asofStr")
    assert(asofNodes.head.children.forall(
      _.outputPartitioning.toString.toLowerCase.contains("hashpartitioning")),
      s"both sides must be hash-partitioned on the join key:\n$plan")
  }

  test("randomized: operator matches a brute-force reference on 20 seeded corpora") {
    // Small key/time domains force the edge cases the unit tests pin one
    // at a time — equal timestamps, keys missing from either side, many
    // rights per left, empty partitions after hashing — to co-occur.
    val rnd = new scala.util.Random(9L)
    (1 to 20).foreach { trial =>
      val nl = 1 + rnd.nextInt(40)
      val nr = rnd.nextInt(40)
      val l = Seq.fill(nl)(
        (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong, s"L${rnd.nextInt(100)}"))
      // operator contract: right side unique on (key, time) — dedupe like
      // q171 dedupes purchases
      val r = Seq.fill(nr)(
          (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong, s"R${rnd.nextInt(100)}"))
        .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      val expected = l.map { case (k, t, tag) =>
        val cand = r.filter(x => x._1 == k && x._2 <= t)
        val best = if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3)
        (k, t, tag, best)
      }.sortBy(x => (x._1, x._2, x._3))
      assert(asof(leftDf(l), rightDf(r)) === expected,
        s"trial $trial diverged (|l|=$nl, |r|=${r.size})")
    }
  }

  test("metrics: every left row emitted, matches counted separately") {
    val l = leftDf(Seq((1L, 10L, "a"), (1L, 3L, "b"), (2L, 5L, "c")))
    val r = rightDf(Seq((1L, 4L, "p")))
    val df = AsOf.joinAsOf(l, r, Seq("k" -> "rk"), "t", "rt")
    df.collect()
    val exec = findAsof(df.queryExecution.executedPlan).head
    assert(exec.metrics("numOutputRows").value === 3)
    assert(exec.metrics("numMatched").value === 1)
  }
}
