package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: dumps the executed physical plan of registered
  * queries (all, or the names passed as args after the sfDir). Used to keep
  * the plan-quality bar honest — pushed filters, pruned ReadSchema,
  * broadcast choices, partial aggregation, WindowGroupLimit — without
  * spelunking through test logs.
  *
  * Usage: runMain graft.Explain /root/testdata/sf0.01 [q18_knn_topk ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries.get(name) match {
        case Some(fn) => println(fn(spark, sfDir).queryExecution.executedPlan.toString)
        case None => println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
