package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every `queries` key has a
  * DuckDB-runnable twin in `oracleSql` unless the operation is not
  * SQL-expressible (driver then records a weaker rows-only check).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (relational.CoreQueries.queries, relational.CoreQueries.oracles),
      (relational.AdvancedQueries.queries, relational.AdvancedQueries.oracles),
      (relational.ScaleQueries.queries, relational.ScaleQueries.oracles),
      (relational.EventQueries.queries, relational.EventQueries.oracles),
      (relational.GraphQueries.queries, relational.GraphQueries.oracles),
      (text.TextQueries.queries, text.TextQueries.oracles),
      (text.DedupQueries.queries, text.DedupQueries.oracles),
      (text.PipelineQueries.queries, text.PipelineQueries.oracles),
      (vector.VectorQueries.queries, vector.VectorQueries.oracles),
      (etl.EtlQueries.queries, etl.EtlQueries.oracles),
      (media.MediaQueries.queries, media.MediaQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.CoreQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
