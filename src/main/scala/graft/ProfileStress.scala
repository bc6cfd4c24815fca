package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement for the q85 watch item (BENCH_certified_r16 movers
  * disposition): q85's 3×-countDistinct profile runs as ONE scan through
  * an Expand ×4 (rows quadruple between scan and partial agg) — the
  * canonical Spark plan for multi-distinct, and the registry's most
  * memory-bandwidth-sensitive shape. This tool times it against the
  * alternative a rewrite would ship: the non-distinct stats in one plain
  * agg plus three per-column distinct→count sub-aggregates joined back
  * (4 scans, no Expand). Whichever wins on the CURRENT host is evidence
  * for the next round's keep-or-rewrite decision — the disposition's
  * "if q85 holds >1.25× normalized at probe parity" clause.
  * Usage: runMain graft.ProfileStress [sfDir] [reps]
  */
object ProfileStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def cur = relational.AdvancedQueries.q85Profile(spark, sfDir)
    def alt: DataFrame = {
      val o = Tables.orders(spark, sfDir)
      val base = o.agg(count(lit(1)).as("n_rows"),
        sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("ck_nulls"),
        min($"o_custkey".cast("string")).as("ck_min"),
        max($"o_custkey".cast("string")).as("ck_max"),
        sum(when($"o_orderpriority".isNull, 1L).otherwise(0L)).as("pr_nulls"),
        min($"o_orderpriority".cast("string")).as("pr_min"),
        max($"o_orderpriority".cast("string")).as("pr_max"),
        sum(when($"o_orderstatus".isNull, 1L).otherwise(0L)).as("st_nulls"),
        min($"o_orderstatus".cast("string")).as("st_min"),
        max($"o_orderstatus".cast("string")).as("st_max"))
      val dck = o.select($"o_custkey").distinct().agg(count($"o_custkey").as("ck_d"))
      val dpr = o.select($"o_orderpriority").distinct()
        .agg(count($"o_orderpriority").as("pr_d"))
      val dst = o.select($"o_orderstatus").distinct()
        .agg(count($"o_orderstatus").as("st_d"))
      base.crossJoin(dck).crossJoin(dpr).crossJoin(dst)
    }
    val curT = (1 to reps).map(_ => run(cur))
    val altT = (1 to reps).map(_ => run(alt))
    println(f"[profilestress] $sfDir expand-x4 (q85 shape): " +
      curT.map(t => f"$t%.3f").mkString(" ") + f" | min=${curT.min}%.3f s")
    println(f"[profilestress] $sfDir per-column (4 scans):  " +
      altT.map(t => f"$t%.3f").mkString(" ") + f" | min=${altT.min}%.3f s")
    spark.stop()
  }
}
