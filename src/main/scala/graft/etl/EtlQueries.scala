package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Registered queries exercising the sink surface (SURVEY §2.1 S3/S4):
  * the partitioned-parquet write → re-read round trip, verified through the
  * DuckDB oracle (the oracle aggregates the source directly, so a bug in
  * either the write or the re-read breaks the hash match).
  */
object EtlQueries {

  /** Hive-partitioned write + re-read + aggregate over `orders`. Mirrors
    * the reference's `partitionBy("year","month").parquet(...)` sinks
    * (etl.py:167–169, 203–204). Partition-column values come back as
    * directory strings (inferred int) and are cast back to long; the
    * aggregate proves row fidelity across the round trip.
    */
  def q21EtlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = s"/root/repo/target/tmp/etl_roundtrip_${math.abs(dir.hashCode)}"
    // repartition on the partition columns → one file per (year, month)
    // dir instead of one per (task × dir): fewer, bigger files — the
    // layout a downstream reader wants (and measurably faster to write
    // and re-read here).
    Tables.orders(s, dir)
      .withColumn("o_year", year($"o_orderdate"))
      .withColumn("o_month", month($"o_orderdate"))
      .repartition($"o_year", $"o_month")
      .write.mode("overwrite").partitionBy("o_year", "o_month").parquet(out)
    s.read.parquet(out)
      .groupBy($"o_year".cast("long").as("o_year"), $"o_month".cast("long").as("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total_price"))
      .orderBy($"o_year", $"o_month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_etl_roundtrip" -> (q21EtlRoundtrip _),
  )

  val oracles: Map[String, String] = Map(
    "q21_etl_roundtrip" ->
      """SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin,
  )
}
