package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Parquet carries its own schema, so no inference pass happens (unlike the
  * reference's schema-on-read JSON scans, /root/reference/etl.py:64). Loaders
  * are thin on purpose: Catalyst's column pruning + filter pushdown reach the
  * scan only when the read is a plain declarative `spark.read.parquet`.
  *
  * Scale posture: a single parquet file per table here; at 100 TB the same
  * call reads a partitioned directory tree and nothing else changes — all
  * downstream operators are written against the schema, not the layout.
  */
object Tables {
  private def p(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = p(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")

  /** `events.ts` has shipped under two generator layouts, so the loader
    * adapts to whichever schema the scan reports rather than assuming one:
    *
    *  - parquet `timestamp[us]` (current generator): Spark reads it as
    *    TIMESTAMP_NTZ (no UTC-adjust flag in the file). All downstream
    *    consumers (`unix_micros`, `window`, `withWatermark`, `date_trunc`)
    *    and every DuckDB oracle treat `ts` as an instant in UTC, so we cast
    *    NTZ → TIMESTAMP deliberately; sessions run with
    *    `spark.sql.session.timeZone=UTC` (Verify/Bench/test builders), which
    *    makes the cast a pure re-tag of the same micros value — no shift.
    *  - parquet TIMESTAMP(NANOS) (old generator): Spark's vectorized reader
    *    surfaces it as LongType under `spark.sql.legacy.parquet.nanosAsLong`;
    *    rebuild a micro-truncated timestamp. `ts div 1000` — integer
    *    division; `/` would widen the ns long to double (53-bit mantissa,
    *    ulp ≈ 256 at 1.7e18) and round the microsecond by ±1 (q34).
    *
    * DuckDB reads either layout natively; `epoch_ns(ts) // 1000` in the
    * oracles is exact on both.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val df = p(s, d, "events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
