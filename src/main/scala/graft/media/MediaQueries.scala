package graft.media

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Binary-column surface with a DuckDB oracle: payloads are the documents'
  * UTF-8 bytes (`cast(text as binary)` ≡ DuckDB `encode(text)`), so byte
  * length, content hash and first-byte semantics are cross-checkable while
  * exercising real BinaryType columns. The codec-shaped processing lives in
  * MediaFunctions (typed Datasets, mapPartitions) and is covered by
  * MediaSpec; this query covers the relational side of the multimodal
  * pillar.
  */
object MediaQueries {

  /** Per-source stats over binary payloads: byte sizes (≠ char counts for
    * non-ASCII), md5 content hashes computed ON THE BINARY column,
    * first-byte range. Map-side except the final small aggregate.
    */
  def q23BinaryMetadata(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"source", $"text",
        $"text".cast("binary").as("payload"))
      .select($"source",
        length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("content_md5"),
        ascii($"text").cast("long").as("first_byte"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("total_bytes"),
        countDistinct($"content_md5").as("n_unique_payloads"),
        min($"first_byte").as("min_first_byte"),
        max($"first_byte").as("max_first_byte"))
      .orderBy($"source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_binary_metadata" -> (q23BinaryMetadata _),
  )

  val oracles: Map[String, String] = Map(
    "q23_binary_metadata" ->
      """WITH m AS (
        |  SELECT source, octet_length(encode(text)) AS n_bytes,
        |         md5(text) AS content_md5, ascii(text) AS first_byte
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  count(DISTINCT content_md5) AS n_unique_payloads,
        |  CAST(min(first_byte) AS BIGINT) AS min_first_byte,
        |  CAST(max(first_byte) AS BIGINT) AS max_first_byte
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
  )
}
