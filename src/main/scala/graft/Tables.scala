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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; `spark.sql.legacy.parquet.nanosAsLong` maps it to LongType and we
    * rebuild a (micro-truncated) timestamp column ourselves. That conf is set
    * in the session builders (Verify/Bench/test session — session config
    * belongs at session construction, not inside a loader); DuckDB reads the
    * same file at full nanos, so oracle queries must only compare
    * second-or-coarser derivations.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must be built with spark.sql.legacy.parquet.nanosAsLong=true (see Verify/Bench builders)")
    import org.apache.spark.sql.functions._
    // `ts div 1000` — integer division. `/` would widen the ns long to
    // double (53-bit mantissa, ulp ≈ 256 at 1.7e18) and round the microsecond
    // by ±1: invisible at second granularity, wrong at millisecond (q34).
    p(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
