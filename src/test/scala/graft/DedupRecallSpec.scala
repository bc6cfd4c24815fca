package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.NativeKernels._
import graft.operators.TopKByScore

/** Direct evidence for the dedup-recall claims and custom-aggregator laws
  * that the oracle hash-compare can only test indirectly.
  */
class DedupRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q20 MinHash-LSH finds EVERY pair the exact all-pairs Jaccard finds (recall = 1 here)") {
    import spark.implicits._
    // ground truth: brute-force exact Jaccard over all pairs
    val sh = Tables.documents(spark, sf)
      .select($"doc_id", wordShingles($"text", text.DedupQueries.ShingleK).as("sh"))
    val truth = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        jaccardSorted($"a.sh", $"b.sh").as("j"))
      .filter($"j" >= text.DedupQueries.JaccardThreshold)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = text.DedupQueries.q20DedupMinhash(spark, sf)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-dup pairs")
    assert(found == truth,
      s"missed=${(truth -- found).take(5)} extra=${(found -- truth).take(5)}")
  }

  test("q26 pigeonhole band law: 4×15-bit banding is exactness-mandated; recall = 1 EXACTLY") {
    import spark.implicits._
    import text.DedupQueries.{SimhashBands, SimhashBits, HammingThreshold}
    // STRUCTURAL constraint (VERDICT r16 #6 — the reason q26/q147 must
    // NOT be migrated onto the q19/q20/q230 scaled ladder): hamming ≤ t
    // differing bits can corrupt at most t of the B disjoint bands, so
    // t < B forces ≥1 band EQUAL — candidate recall at the threshold is
    // exactly 1 by pigeonhole, which is what licenses the exact
    // all-pairs oracle. Deepening the bands (fewer, wider) to throttle
    // candidates — the ladder's move — breaks t < B and with it the
    // exactness guarantee; the accepted consequence is that band
    // collisions grow ~n²·B/2^(bits/B) with corpus size, and the scale
    // lever here is the fingerprint WIDTH (more simhash bits per band
    // at the same B), never the band COUNT.
    assert(SimhashBands * (SimhashBits / SimhashBands) == SimhashBits,
      "bands must tile the fingerprint exactly")
    assert(HammingThreshold < SimhashBands,
      "pigeonhole needs threshold < band count — this inequality IS the recall-1 proof")
    // EMPIRICAL twin at the gate scale: the banded pipeline equals the
    // exact all-pairs hamming join, misses AND extras
    val fp = Tables.documents(spark, sf)
      .select($"doc_id", wordShingles($"text", text.DedupQueries.ShingleK).as("sh"))
      .select($"doc_id", simhash60($"sh").as("simhash"))
    val truth = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).as("h"))
      .filter($"h" <= HammingThreshold)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = text.DedupQueries.q26DedupSimhash(spark, sf)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain simhash near-dup pairs")
    assert(found == truth,
      s"missed=${(truth -- found).take(5)} extra=${(found -- truth).take(5)}")
  }

  test("TopKByScore laws: reduce/merge give the same top-k as a full sort, any split") {
    val agg = TopKByScore(3)
    val data = Seq(5.0 -> 1L, 3.0 -> 2L, 5.0 -> 0L, 9.0 -> 7L, 1.0 -> 9L,
      9.0 -> 3L, 2.0 -> 4L, 7.0 -> 5L)
    val expected = data.sortBy(t => (-t._1, t._2)).take(3)
    // single reduce chain
    val all = data.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(all) == expected)
    // every 2-way split, merged in both orders
    for (i <- 0 to data.length) {
      val (l, r) = data.splitAt(i)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bl, br)) == expected)
      assert(agg.finish(agg.merge(br, bl)) == expected)
    }
  }

  test("TopKByScore sorts NaN first, matching Spark/DuckDB ORDER BY score DESC") {
    // Spark's NaN semantics: NaN > any double, so `ORDER BY sim DESC` puts
    // NaN first. ADVICE r2: sortBy(-score) put NaN LAST — a zero-norm
    // vector (cos = 0/0 = NaN) would have silently diverged from the oracle.
    val agg = TopKByScore(2)
    val data = Seq(5.0 -> 1L, Double.NaN -> 2L, 7.0 -> 3L)
    val viaReduce = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    assert(viaReduce.map(_._2) == Seq(2L, 3L),
      s"NaN must rank above 7.0 (Spark DESC order); got $viaReduce")
    // merge path agrees
    val (l, r) = data.splitAt(1)
    val merged = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    assert(merged == viaReduce)
    // and matches Spark's own sort of the same pairs
    import spark.implicits._
    val sparkOrder = data.toDF("score", "id")
      .orderBy(desc("score"), asc("id")).limit(2)
      .collect().map(_.getLong(1)).toSeq
    assert(viaReduce.map(_._2) == sparkOrder)
  }

  test("kernel type checks reject wrong input types at analysis time") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("n", "s")
    val bad = Seq(
      () => df.select(dotF($"s", $"s")).collect(),
      () => df.select(wordShingles($"n", 3)).collect(),
      () => df.select(jaccardSortedLong($"s", $"s")).collect(),
      () => df.select(simhash60($"n")).collect())
    bad.foreach { f =>
      val e = intercept[Exception](f())
      assert(e.getMessage.contains("expects") || e.getMessage.contains("DATATYPE_MISMATCH"),
        s"unexpected error: ${e.getMessage.take(200)}")
    }
  }
}
