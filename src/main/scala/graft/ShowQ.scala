package graft
import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print one registered query's result (and optionally its
  * oracle SQL) — the show() twin of [[TimeQ]].
  * Usage: runMain graft.ShowQ <sfDir> <name> [maxRows]
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).show(n, truncate = false)
    spark.stop()
  }
}
