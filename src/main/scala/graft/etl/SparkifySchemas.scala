package graft.etl

import org.apache.spark.sql.types._

/** Explicit StructTypes for the two Sparkify source formats
  * (/root/reference/README.md:32, 47; FIXTURES.md §B).
  *
  * The reference infers schemas on every read (etl.py:64, 124, 172) — an
  * extra full pass over the JSON before any work starts, and at 100 TB an
  * extra full *scan*. Pinning the schema removes that pass and lets the
  * JSON reader prune fields it never parses (Catalyst pushes the projected
  * field set into the scan).
  */
object SparkifySchemas {

  /** Song file: one JSON object per file (README.md:29–33). */
  val songSchema: StructType = StructType(Seq(
    StructField("num_songs", LongType),
    StructField("artist_id", StringType),
    StructField("artist_latitude", DoubleType),
    StructField("artist_longitude", DoubleType),
    StructField("artist_location", StringType),
    StructField("artist_name", StringType),
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("duration", DoubleType),
    StructField("year", LongType),
  ))

  /** Log file: NDJSON, one event per line (README.md:44–48).
    * `ts` is epoch milliseconds.
    */
  val logSchema: StructType = StructType(Seq(
    StructField("artist", StringType),
    StructField("auth", StringType),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("itemInSession", LongType),
    StructField("lastName", StringType),
    StructField("length", DoubleType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("method", StringType),
    StructField("page", StringType),
    StructField("registration", DoubleType),
    StructField("sessionId", LongType),
    StructField("song", StringType),
    StructField("status", LongType),
    StructField("ts", LongType),
    StructField("userAgent", StringType),
    StructField("userId", StringType),
  ))
}
