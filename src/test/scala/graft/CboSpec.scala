package graft

import org.apache.spark.sql.catalyst.TableIdentifier
import org.scalatest.funsuite.AnyFunSuite
import graft.relational.AdvancedQueries

/** The cost-based-optimizer tier (q206): proves the statistics actually
  * exist in the catalog and that they actually CHANGE the plan — the two
  * facts the row-level oracle can't see (any join order returns the same
  * answer; that's the point of the oracle, and the blindness of it).
  */
class CboSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def leafOrder(cboOn: Boolean): Seq[String] = {
    val pre = AdvancedQueries.cboPrefix(spark, sf)
    val flags = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prior = flags.map(k => k -> spark.conf.getOption(k))
    flags.foreach(spark.conf.set(_, cboOn.toString))
    try {
      val plan = spark.sql(AdvancedQueries.cboJoinSql(pre)).queryExecution.optimizedPlan
      plan.collectLeaves().flatMap {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.catalogTable.map(_.identifier.table.stripPrefix(s"${pre}_"))
        case _ => None
      }
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE leaves rowCount + column stats in the catalog") {
    val pre = AdvancedQueries.cboPrefix(spark, sf)
    Seq("region", "nation", "customer", "orders").foreach { t =>
      val meta = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(s"${pre}_$t"))
      val st = meta.stats.getOrElse(fail(s"$t: no table stats"))
      assert(st.rowCount.isDefined, s"$t: no rowCount")
      assert(st.colStats.nonEmpty, s"$t: no column stats")
      // ndv present on the analyzed join keys — the input the DP
      // reorderer's selectivity estimates actually consume
      assert(st.colStats.exists(_._2.distinctCount.isDefined), s"$t: no ndv")
    }
  }

  test("stats + CBO reorder the worst-order chain join; without them the syntactic order stands") {
    // the SQL joins fact-first by construction (cboJoinSql's doc): that
    // is what the optimizer keeps when it has no costs to work with
    val without = leafOrder(cboOn = false)
    assert(without == Seq("orders", "customer", "nation", "region"),
      s"syntactic order expected without CBO, got: $without")
    val withCbo = leafOrder(cboOn = true)
    assert(withCbo != without, "CBO did not change the join order")
    // the fact table must no longer be the first (deepest) relation —
    // the reorderer builds from the filtered dimensions outward
    assert(withCbo.head != "orders",
      s"fact still joined first under CBO: $withCbo")
  }

  test("equi-height histograms fix the skewed-column selectivity estimate; uniform stats mislead") {
    val pre = AdvancedQueries.histPrefix(spark, sf)
    val flags = Seq("spark.sql.cbo.enabled")
    val prior = flags.map(k => k -> spark.conf.getOption(k))
    flags.foreach(spark.conf.set(_, "true"))
    try {
      def estimateOf(table: String): BigInt = {
        val plan = spark.sql(
          s"SELECT * FROM $table WHERE ${AdvancedQueries.HistProbeSql}")
          .queryExecution.optimizedPlan
        plan.stats.rowCount.getOrElse(fail(s"$table: no rowCount estimate under CBO"))
      }
      val actual = BigInt(spark.sql(
        s"SELECT count(*) FROM ${pre}_hist WHERE ${AdvancedQueries.HistProbeSql}")
        .collect()(0).getLong(0))
      val estPlain = estimateOf(s"${pre}_plain")
      val estHist = estimateOf(s"${pre}_hist")
      def err(e: BigInt): Double =
        math.abs(e.toDouble - actual.toDouble) / actual.toDouble
      // the law: the histogram estimate is materially accurate (≤2×) on
      // the skewed column; the uniform min/max interpolation misses it
      // by the ~5× class of error histograms exist to fix
      assert(err(estHist) < err(estPlain),
        s"histogram did not improve the estimate: plain=$estPlain hist=$estHist actual=$actual")
      assert(estHist.toDouble <= actual.toDouble * 2 &&
        estHist.toDouble >= actual.toDouble / 2,
        s"histogram estimate off >2x: $estHist vs $actual")
      assert(err(estPlain) > 0.5,
        s"uniform estimate unexpectedly accurate ($estPlain vs $actual) — the demo column lost its skew")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q206 executes under the reordered plan and leaves every CBO flag restored") {
    val flags = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val before = flags.map(spark.conf.getOption)
    val rows = AdvancedQueries.q206CboJoinReorder(spark, sf).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "ASIA")
    assert(rows(0).getAs[Long]("n_orders") > 0)
    assert(flags.map(spark.conf.getOption) == before, "CBO flags leaked")
  }
}
