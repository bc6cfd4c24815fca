package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement for SCALING.md: the same join+agg over (a) the q81
  * bucketed tables and (b) raw parquet, with auto-broadcast disabled so
  * both run in the shuffle-join regime a 100 TB fact lives in. Usage:
  * runMain graft.BucketBench [sfDir] [reps]
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", Scratch.path("warehouse"))
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // build the bucketed tables (timed separately — this is the one-time cost)
    val t0 = System.nanoTime()
    relational.ScaleQueries.q81BucketedJoin(spark, sfDir).count()
    println(f"[bucketbench] bucketed write + first join: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val tag = Scratch.tag(sfDir)
    def agg(items: DataFrame, orders: DataFrame): DataFrame =
      items.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("q"))
    def time(label: String)(mk: () => DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        println(f"[bucketbench] $label rep$i: ${(System.nanoTime() - t) / 1e9}%.2f s")
      }
    time("bucketed  SMJ") { () =>
      agg(spark.table(s"graft_bkt_items_$tag"), spark.table(s"graft_bkt_orders_$tag")) }
    time("unbucketed SMJ") { () =>
      agg(Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity"),
        Tables.orders(spark, sfDir).select($"o_orderkey", $"o_orderstatus")) }
    spark.stop()
  }
}
