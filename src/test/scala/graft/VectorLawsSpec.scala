package graft

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws tying the approximate/restricted operators to their exact
  * counterparts — evidence the oracle compare can't give, because it only
  * checks each query against its own restatement.
  */
class VectorLawsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("IVF search with nprobe = ncells degenerates to exact kNN (== q18)") {
    val exact = vector.VectorQueries.q18KnnTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ivfAll = vector.VectorQueries.ivfSearch(spark, sf, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(exact.nonEmpty)
    assert(ivfAll == exact,
      s"missing=${(exact -- ivfAll).take(3)} extra=${(ivfAll -- exact).take(3)}")
  }

  test("IVF k-means: Lloyd SSE descends monotonically across training rounds") {
    // mean-update + L2-assignment is the textbook Lloyd step, so the sum of
    // squared distances to assigned centroids cannot increase; the epsilon
    // covers the 2^-20 mean quantization + float narrowing
    val sse = (0 to vector.VectorQueries.IvfIters).map(i =>
      vector.VectorQueries.kmeansSseDf(spark, sf, i).collect()(0).getDouble(0))
    for (i <- 1 until sse.size) {
      assert(sse(i) <= sse(i - 1) * (1 + 1e-9) + 1e-6,
        s"SSE rose at round $i: ${sse.mkString(" -> ")}")
    }
    assert(sse.last < sse.head, s"training should improve on the raw seeds: $sse")
  }

  test("incremental dedup == all-pairs dedup restricted to cross-split pairs") {
    val full = text.DedupQueries.q20DedupMinhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val crossOnly = full.filter { case (a, b, _) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b, j) =>
        val (n, c) = if (a % 5 == 0) (a, b) else (b, a)
        (n, c, j)
      }.toSet
    val incremental = text.DedupQueries.q67IncrementalDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incremental == crossOnly,
      s"missing=${(crossOnly -- incremental).take(3)} extra=${(incremental -- crossOnly).take(3)}")
    assert(crossOnly.nonEmpty, "fixture should contain cross-split near-dup pairs")
  }
}
