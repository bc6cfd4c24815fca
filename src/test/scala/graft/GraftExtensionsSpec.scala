package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Drives every SQL function GraftExtensions registers through spark.sql
  * on an isolated session (newSession shares the SparkContext but the
  * extension must be applied at builder time, so a dedicated session is
  * built against the running context).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // The shared test session is built .withExtensions(new GraftExtensions)
  // — same wiring as the Verify/Bench/Explain mains.
  lazy val spark: SparkSession = SparkTestSession.spark

  test("kernels are callable from SQL") {
    val spark2 = spark
    val row = spark2.sql(
      """SELECT
        |  dot_f(array(cast(1.0 as float), cast(2.0 as float)),
        |        array(cast(3.0 as float), cast(4.0 as float))) AS d,
        |  word_shingles('a b c d', 3) AS ws,
        |  char_ngrams('abcd', 3) AS cg,
        |  jaccard_sorted(word_shingles('a b c', 2), word_shingles('a b c', 2)) AS j,
        |  jaccard_sorted_long(char_ngram_hashes('abcd', 3), char_ngram_hashes('abcd', 3)) AS jl,
        |  size(minhash_signature(word_shingles('a b c d', 3), 16)) AS mh,
        |  simhash60(array('alpha')) AS sh,
        |  rolling_fingerprints('the quick brown fox jumps over the lazy dog', 4, 8) AS rf,
        |  feature_hash_vector(word_shingles('a b c d', 3), 64) AS fv
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getSeq[String](row.fieldIndex("ws")) == Seq("a b c", "b c d"))
    assert(row.getSeq[String](row.fieldIndex("cg")) == Seq("abc", "bcd"))
    assert(row.getAs[Double]("j") == 1.0)
    assert(row.getAs[Double]("jl") == 1.0)
    assert(row.getAs[Int]("mh") == 16)
    // simhash of a single shingle == its h60 (every bit votes for itself)
    val expected = spark2.sql(
      "SELECT cast(conv(substring(md5('alpha'), 1, 15), 16, 10) as bigint) AS h").collect()(0).getLong(0)
    assert(row.getAs[Long]("sh") == expected)
    // winnowing guarantees at least one fingerprint for any text >= k+w-1 chars
    assert(row.getSeq[Long](row.fieldIndex("rf")).nonEmpty)
    // two distinct shingles, each contributing ±1 to one of 64 dims
    val fv = row.getSeq[Float](row.fieldIndex("fv"))
    assert(fv.length == 64 && fv.map(math.abs).sum <= 2.0f && fv.exists(_ != 0.0f))
  }

  test("SQL form matches the DataFrame form on real data") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    Tables.documents(spark2, "/root/testdata/sf0.001").createOrReplaceTempView("docs_v")
    val viaSql = spark2.sql(
      "SELECT doc_id, simhash60(word_shingles(text, 3)) AS sh FROM docs_v ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDf = Tables.documents(spark2, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        graft.expressions.NativeKernels.simhash60(
          graft.expressions.NativeKernels.wordShingles(col("text"), 3)).as("sh"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf)
  }
}
