package graft

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws tying the approximate/restricted operators to their exact
  * counterparts — evidence the oracle compare can't give, because it only
  * checks each query against its own restatement.
  */
class VectorLawsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** ncells at the spec corpus, via the same ladder the queries use — the
    * degeneracy laws must probe EVERY cell, whatever the ladder derives.
    */
  private def ncellsHere: Int = vector.VectorQueries.scaledIvfCells(
    Tables.rowCount(spark, sf, "embeddings"))

  test("IVF search with nprobe = ncells degenerates to exact kNN (== q18)") {
    val exact = vector.VectorQueries.q18KnnTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ivfAll = vector.VectorQueries.ivfSearch(spark, sf, nprobe = ncellsHere)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(exact.nonEmpty)
    assert(ivfAll == exact,
      s"missing=${(exact -- ivfAll).take(3)} extra=${(ivfAll -- exact).take(3)}")
  }

  test("SQ8 ADC search recalls the exact dot-product top-5 almost perfectly") {
    // asymmetric scoring quantizes only the STORED side at 8 bits/dim, so
    // unlike PQ's 4-byte codes (chance-relative law below) the honest law
    // here is absolute: reconstruction error per dim is ≤ range/512 and
    // the exact top-5 survives. Measured 1.0 on this corpus; pinned ≥ 0.8
    // to absorb a data regen.
    import org.apache.spark.sql.functions._
    import graft.expressions.NativeKernels.dotF
    val sq = vector.VectorQueries.q193Sq8Search(spark, sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val p = e.filter(vector.VectorQueries.probePredicate(col("vec_id")))
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("score").desc, col("vec_id"))
    val exact = e.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), dotF(col("embedding"), col("p_emb")).as("score"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(sq.keySet == exact.keySet && sq.nonEmpty)
    // keysIterator, not keys.map: mapping over the key SET would collapse
    // equal per-probe recalls before the sum
    val recall = sq.keysIterator.map(k => (sq(k) & exact(k)).size / 5.0).sum / sq.size
    info(f"SQ8 ADC recall@5 vs exact dot: $recall%.3f")
    assert(recall >= 0.8, f"SQ8 recall collapsed: $recall%.3f")
  }

  test("MMR: pick 1 is the pure-relevance argmax (== q18 rank 1); 5 distinct picks per probe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val mmr = vector.VectorQueries.q199MmrDiversified(spark, sf).collect()
    assert(mmr.nonEmpty)
    // step 1 of the greedy has an empty selected set, so its argmax is raw
    // relevance — it MUST agree with the exact kNN's rank-1 neighbor
    val top1 = vector.VectorQueries.q18KnnTopk(spark, sf)
      .filter($"rank" === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val pick1 = mmr.filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pick1 == top1, s"pick1=$pick1 top1=$top1")
    // exactly MmrPicks distinct results per probe, ranks 1..MmrPicks
    mmr.groupBy(_.getLong(0)).foreach { case (p, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L), s"probe $p ranks")
      assert(rows.map(_.getLong(2)).distinct.length == 5, s"probe $p picks not distinct")
    }
  }

  test("IVF-SQ with nprobe = ncells degenerates to exhaustive SQ-ADC (== q193)") {
    val exhaustive = vector.VectorQueries.q193Sq8Search(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val allCells = vector.VectorQueries.ivfSqSearch(spark, sf, nprobe = ncellsHere)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(exhaustive.nonEmpty)
    assert(allCells == exhaustive,
      s"missing=${(exhaustive -- allCells).take(3)} extra=${(allCells -- exhaustive).take(3)}")
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

  test("IVF cell ladder: pinned rungs, doubling per 4x, cap — and it cuts intra-cell pair work vs the fixed floor (sf0.1)") {
    // the arithmetic itself (both engines must derive the identical k;
    // the oracle twin is generated from the same constants)
    import vector.VectorQueries.{scaledIvfCells => k}
    assert(k(1) == 8 && k(500) == 8 && k(1000) == 8)       // spec/gate corpora
    assert(k(1001) == 16 && k(2000) == 16 && k(4000) == 16) // sf0.1 rung
    assert(k(4001) == 32 && k(16000) == 32)
    assert(k(20000) == 64)                                  // the 10x replica rung
    assert(k(Long.MaxValue) == 1024, "cap: past it the recipe is hierarchical training")
    for (n <- Seq(500L, 2000L, 8000L, 32000L))              // k ∝ √n: double per 4x
      assert(k(4 * n) == 2 * k(n), s"no doubling at n=$n")
    // and what the ladder buys on real data: at sf0.1 the ladder rung is
    // above the floor, and Σ|cell|² pair work — q189's prune-join cost,
    // the term a FIXED k lets grow quadratically — strictly shrinks
    val sf01 = "/root/testdata/sf0.1"
    val rung = k(Tables.rowCount(spark, sf01, "embeddings"))
    assert(rung > vector.VectorQueries.IvfCells, "law vacuous: ladder == floor at sf0.1")
    val pairsLadder = vector.VectorQueries.intraCellPairs(spark, sf01, rung)
    val pairsFloor = vector.VectorQueries.intraCellPairs(spark, sf01,
      vector.VectorQueries.IvfCells)
    assert(pairsLadder < pairsFloor,
      s"ladder k=$rung pairs $pairsLadder should undercut floor-8 pairs $pairsFloor")
  }

  test("(ncells, nprobe) co-tuning: rungs pinned; at sf0.1 the co-tuned nprobe strictly beats the fixed floor's recall") {
    // ⌊√k⌋ clamped at 2 — enumerated so the oracle twin (a generated CASE
    // over the power-of-two rungs) can never drift via a floating sqrt
    import vector.VectorQueries.{scaledNprobe => np}
    assert(np(8) == 2 && np(16) == 4 && np(32) == 5 && np(64) == 8)
    assert(np(128) == 11 && np(256) == 16 && np(512) == 22 && np(1024) == 32)
    // and what it buys: at the sf0.1 rung (k=16) probing √k=4 cells must
    // strictly beat the old fixed nprobe=2 on recall@5 vs exact kNN and
    // clear an absolute floor (measured 0.61 co-tuned vs 0.40 fixed)
    val sf01 = "/root/testdata/sf0.1"
    val k = vector.VectorQueries.scaledIvfCells(Tables.rowCount(spark, sf01, "embeddings"))
    assert(np(k) > 2, "law vacuous: co-tuned nprobe == floor at sf0.1")
    val exact = vector.VectorQueries.q18KnnTopk(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallAt(nprobe: Int): Double = {
      val got = vector.VectorQueries.ivfSearch(spark, sf01, nprobe).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val co = recallAt(np(k)); val fixed = recallAt(2)
    assert(co > fixed, s"co-tuned recall $co should beat fixed-nprobe recall $fixed")
    assert(co >= 0.5, s"co-tuned recall floor: $co < 0.5")
  }

  test("organic-scale recall at the deep rung: co-tuned (k=64, np=8) recall@5 on the 20k novel-embeddings replica") {
    // VERDICT r17 next #2: the exact 10x replica degenerates to recall
    // 1.0 (each probe's true top-5 sits in its own duplicate block), so
    // the deep rungs were extrapolated from the sf0.01→sf0.1 organic
    // pair. The novel replica models organic growth — block 0 is the
    // real sf0.1 corpus, blocks 1–9 synthetic novel vectors — and this
    // measures the k=64/np=8 operating point directly.
    val dir = ScaleUp.buildNovelEmbeddings(spark, "/root/testdata/sf0.1")
    val n = Tables.rowCount(spark, dir, "embeddings")
    assert(n == 20000L)
    val k = vector.VectorQueries.scaledIvfCells(n)
    val np = vector.VectorQueries.scaledNprobe(k)
    assert(k == 64 && np == 8, "the replica must land on the deep rung")
    // the coarse trainer SAMPLES here (m=2 — the first corpus where the
    // round-18 training cap engages), so this law also measures
    // sample-trained centroid quality, not just probe depth
    assert(vector.VectorQueries.trainSampleMod(n, k) == 2)
    val exact = vector.VectorQueries.q18KnnTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallAt(nprobe: Int): Double = {
      val got = vector.VectorQueries.ivfSearch(spark, dir, nprobe).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val co = recallAt(np)
    val fixed = recallAt(2)
    // measured round 18: co-tuned 0.440 vs fixed-floor 0.200 — the
    // extrapolated 0.61 (sf0.1's rung) does NOT survive the deep rung on
    // organic growth; this instrument replaces that extrapolation with a
    // measurement (and SCALING.md carries the full rung table). Floor
    // 0.38 = measured minus a data-regen margin; the co-tuned > fixed
    // inequality is the law the ladder exists for.
    info(f"recall@5 at n=20000 organic (k=$k): co-tuned np=$np $co%.3f, fixed np=2 $fixed%.3f")
    assert(co > fixed, f"co-tuned $co%.3f must beat fixed-floor $fixed%.3f at the deep rung")
    assert(co >= 0.38, f"deep-rung recall floor: $co%.3f < 0.38")
  }

  test("round-19 serve-tier recall at 20k organic: PQ8 rerank >= 0.3 where the 3-bit tier measured chance; tuned nprobe >= 0.6; refined graph floor") {
    import vector.VectorQueries._
    // VERDICT r18 next #1/#2/#5 on one instrument (ScaleUp's organic
    // replica; full sweep in PqGeomStress + ServeRecallStress, measured
    // figures in SCALING.md round 19):
    //  - q229 with the NORMALIZED 16x4-dim PQ8 recall stage measured
    //    0.42 (vs 0.04 for the r18 3-bit stage) — ~95% of the IVF-stage
    //    ceiling (0.44), i.e. the codec now loses almost nothing the
    //    coarse probes admit. Floor 0.30 = the verdict's done criterion.
    //  - q235 (direct IVF-PQ8 top-5, no rerank) measured 0.36; floor 0.25.
    //  - q236's recall-TARGETED nprobe measured 0.64 at tuned_np = 14
    //    (the open-loop sqrt(k) = 8 rule measured 0.44); the law is the
    //    target itself: achieved recall >= TunedRecallTenths/10 at the
    //    depth the audit picked, with tuned_np <= ncells.
    //  - graph tier (next #5): with the min-id single entry the plain
    //    band beam measured 0.00 at this density and the refined build
    //    0.19 (the round's first measurement — SCALING.md). BAND-SEEDED
    //    entry (each probe's LSH mates as the seed set) lifted them to
    //    0.19 / 0.46; floors 0.15 / 0.38 pin the seeded serve, and the
    //    plain-vs-refined gap pins that refinement still carries the
    //    tier at noise-dominated density.
    val dir = ScaleUp.buildNovelEmbeddings(spark, "/root/testdata/sf0.1")
    val k = scaledIvfCells(Tables.rowCount(spark, dir, "embeddings"))
    val exact = q18KnnTopk(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      assert(got.keySet == exact.keySet && got.nonEmpty)
      got.keysIterator.map(p => (got(p) & exact(p)).size / 5.0).sum / got.size
    }
    val rerank = recallOf(q229RerankedAnn(spark, dir).collect())
    val pq8 = recallOf(q235Pq8Search(spark, dir).collect())
    val tunedRows = q236TunedIvfSearch(spark, dir).collect()
    val tuned = recallOf(tunedRows)
    val tunedNp = tunedRows.head.getLong(4)
    val refined = recallOf(q232GraphAnnRefined(spark, dir).collect())
    val beam = recallOf(q213GraphAnnBeam(spark, dir).collect())
    info(f"20k organic recall@5: q229 $rerank%.3f, q235 $pq8%.3f, " +
      f"q236 $tuned%.3f (np=$tunedNp), q213 $beam%.3f, q232 $refined%.3f")
    assert(rerank >= 0.30, f"PQ8 rerank floor: $rerank%.3f < 0.30")
    assert(pq8 >= 0.25, f"IVF-PQ8 floor: $pq8%.3f < 0.25")
    assert(tuned * 10 >= TunedRecallTenths.toDouble,
      f"tuned serve must meet its own target: $tuned%.3f < ${TunedRecallTenths / 10.0}")
    assert(tunedNp >= 1 && tunedNp <= k, s"tuned_np $tunedNp outside [1, $k]")
    assert(beam >= 0.15, f"band-seeded beam floor: $beam%.3f < 0.15")
    assert(refined >= 0.38, f"refined-graph floor: $refined%.3f < 0.38")
    assert(refined > beam,
      f"refinement must still carry the tier here: q232 $refined%.3f vs q213 $beam%.3f")
  }

  test("q236 tuned serve == ivfSearch at the audit-chosen nprobe; meets target at sf0.1 too") {
    import vector.VectorQueries._
    val sf01 = "/root/testdata/sf0.1"
    val rows = q236TunedIvfSearch(spark, sf01).collect()
    val tunedNp = rows.head.getLong(4).toInt
    // equivalence: the declarative 1-row-broadcast rank cut serves
    // exactly what the integer-parameterized q54 core serves at that np
    val viaInt = ivfSearch(spark, sf01, nprobe = tunedNp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val viaTuned = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaTuned == viaInt, "tuned serve diverges from ivfSearch at tuned_np")
    // and the audit's promise holds on the organic sf0.1 corpus as well
    val exact = q18KnnTopk(spark, sf01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val got = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recall = got.keysIterator.map(p => (got(p) & exact(p)).size / 5.0).sum / got.size
    info(f"sf0.1 tuned recall@5: $recall%.3f at np=$tunedNp")
    assert(recall * 10 >= TunedRecallTenths.toDouble,
      f"tuned serve below target at sf0.1: $recall%.3f")
  }

  test("publishedArtifactCount refuses unpublished roots (ADVICE r17: no memoized counts off mutable paths)") {
    val d = java.nio.file.Files.createTempDirectory("unpub").toFile
    d.deleteOnExit()
    val ex = intercept[IllegalArgumentException] {
      Tables.publishedArtifactCount(spark, s"${d.getPath}/centroids", s"${d.getPath}/_trained")
    }
    assert(ex.getMessage.contains("unpublished root"))
  }

  test("training-sample ladder: pinned moduli, sample bounded in [128k, 256k), identity below threshold") {
    // the arithmetic both engines must derive identically (the oracle twin
    // is a generated CASE over the same constants — trainSampleModSqlCase)
    import vector.VectorQueries.{trainSampleMod => m, TrainPointsPerCell => c}
    assert(c == 128, "the FAISS-band constant the oracle CASE is generated from")
    // gate corpora: never sampled (sf0.001/sf0.01 n=500, sf0.1 n=2000)
    assert(m(500, 8) == 1 && m(2000, 8) == 1 && m(2000, 16) == 1)
    // the 10x replica (n=20000): PQ codebooks (k=8) sample 1-in-16,
    // the coarse quantizer (k=64) 1-in-2
    assert(m(20000, 8) == 16 && m(20000, 64) == 2)
    // boundary exactness: the first sampled n is exactly 2·c·k
    assert(m(2L * c * 8 - 1, 8) == 1 && m(2L * c * 8, 8) == 2)
    // sample-size bound: whenever sampling engages, the kept fraction
    // n/m lands in [c·k, 2·c·k) — never under-trains, never over-pays
    for (n <- Seq(3000L, 10000L, 65536L, 1000000L, 123456789L); k <- Seq(8, 64, 1024)) {
      val mod = m(n, k)
      if (mod > 1) {
        val kept = n / mod
        assert(kept >= c.toLong * k && kept < 2L * c * k,
          s"n=$n k=$k m=$mod keeps $kept, want [${c * k}, ${2 * c * k})")
      } else assert(n < 2L * c * k, s"n=$n k=$k should have sampled")
    }
  }

  test("trainSlice: identity at m=1; at m>1 keeps exactly the portable-md5-bucket rows (the q57/q59 recipe)") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
    val n = Tables.rowCount(spark, sf, "embeddings")
    // below threshold: no filter enters the plan — same rows, same plan
    assert(vector.VectorQueries.trainSlice(e, n, 8).count() == n)
    // force the modulus by presenting a 64x corpus count: the slice must
    // equal a manual evaluation of the shared hash predicate
    val mod = vector.VectorQueries.trainSampleMod(64 * n, 8)
    assert(mod > 1)
    val got = vector.VectorQueries.trainSlice(e, 64 * n, 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = e.filter(
        graft.text.PipelineQueries.hashMod("ivftrain:", col("vec_id"), mod) === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty && got.size < n,
      s"slice ${got.size} of $n rows at m=$mod")
    // and a quantizer TRAINED on the slice is still a full-strength
    // quantizer over the whole corpus: k seed cells, every vector assigned
    val cents = vector.VectorQueries.lloyd(
      vector.VectorQueries.trainSlice(vector.VectorQueries.withN2(e), 64 * n, 8),
      vector.VectorQueries.IvfIters, 8)
    assert(cents.count() == 8)
  }

  test("assignCells argmin kernel == the retired window formulation, bit for bit (round-19 optimization)") {
    // the optimization contract: the map-side nearestCell kernel must pick
    // the IDENTICAL (cell, d2) pair the row_number() window picked — same
    // pinned dist2 arithmetic, same (d2 ASC NULLS FIRST, cell ASC) total
    // order — or every trained query's oracle hash shifts. Exact double
    // equality in the set compare is the point.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.expressions.NativeKernels.dotF
    val e = vector.VectorQueries.withN2(Tables.embeddings(spark, sf))
    val cents = vector.VectorQueries.trainedCentroids(spark, sf).localCheckpoint()
    val got = vector.VectorQueries.assignCells(e, cents)
      .select(col("vec_id"), col("cell"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cell"))
    val want = e.crossJoin(broadcast(cents))
      .withColumn("d2",
        (col("n2") + col("c_n2")) - lit(2.0) * dotF(col("embedding"), col("c_emb")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("lloydMulti == per-subspace lloyd, bit for bit, every m (round-19 optimization)") {
    // the keyed trainer must reproduce each per-space training EXACTLY —
    // same seeds (k smallest present ids), same kernel assignment, same
    // quantized-integer means — or every PQ oracle replay fails. Exact
    // float-array equality per (m, cell) is the assertion.
    import org.apache.spark.sql.functions._
    val raw = Tables.embeddings(spark, sf)
    val n = Tables.rowCount(spark, sf, "embeddings")
    import vector.VectorQueries.{PqSubspaces, PqSubDim, PqCodes, PqIters}
    val multi = vector.VectorQueries.lloydMulti(
      vector.VectorQueries.trainSlice(
        vector.VectorQueries.subspacesAll(raw, PqSubspaces, PqSubDim), n, PqCodes),
      PqIters, PqCodes)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Float](2).toList)).toMap
    (0 until PqSubspaces).foreach { m =>
      val single = vector.VectorQueries.lloyd(
        vector.VectorQueries.trainSlice(
          vector.VectorQueries.subspaceOf(raw, m), n, PqCodes), PqIters, PqCodes)
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toMap
      assert(single.nonEmpty)
      single.foreach { case (cell, emb) =>
        assert(multi.get((m, cell)).contains(emb), s"m=$m cell=$cell diverged")
      }
      assert(multi.count(_._1._1 == m) == single.size)
    }
  }

  test("lloyd seeds k-strong on gapped ids: the base slice trains every ladder cell (ADVICE r17 #1)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // sf0.1 base slice: n=1800, ladder k=16, and ids 9 (and every %10==9)
    // are increments — the old `vec_id < 16` seeding found only 15 of 16
    val sf01 = "/root/testdata/sf0.1"
    val base = Tables.embeddings(spark, sf01).filter($"vec_id" % 10 =!= 9)
    val k = vector.VectorQueries.scaledIvfCells(base.count())
    assert(k > 9, "law vacuous: ladder k below the first increment id")
    val cents = vector.VectorQueries.lloyd(
      vector.VectorQueries.withN2(base), vector.VectorQueries.IvfIters, k)
    val cells = cents.select("cell").collect().map(_.getLong(0)).toSet
    assert(cells.size == k, s"trained ${cells.size} of $k cells")
    // seeds are the k smallest PRESENT ids — 9 skipped, 16 pulled in
    val wantSeeds = (0L to 17L).filter(_ % 10 != 9).take(k).toSet
    assert(cells == wantSeeds, s"cells $cells != $wantSeeds")
  }

  test("multi-table LSH recall beats single-table and clears the floor (sf0.01)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    // exact nearest neighbor per vector — brute force with the native dot
    // kernel, the ground truth both LSH tiers approximate
    val e = Tables.embeddings(spark, sf01).select($"vec_id", $"embedding")
      .withColumn("nrm", sqrt(graft.expressions.NativeKernels.dotF($"embedding", $"embedding")))
    val a = e.select($"vec_id".as("av"), $"embedding".as("ae"), $"nrm".as("an"))
    val b = e.select($"vec_id".as("bv"), $"embedding".as("be"), $"nrm".as("bn"))
    val exact = a.join(b, $"av" =!= $"bv")
      .select($"av", $"bv",
        (graft.expressions.NativeKernels.dotF($"ae", $"be") / ($"an" * $"bn")).as("sim"))
      .groupBy($"av").agg(max(struct($"sim", (-$"bv").as("neg"))).as("m"))
      .select($"av", (-$"m.neg").as("nn"))
      .as[(Long, Long)].collect().toMap
    def nnMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("vec_id").cast("long"), col("nn_id").cast("long"))
        .as[(Long, Long)].collect().toMap
    def recall(m: Map[Long, Long]): Double =
      exact.count { case (v, nn) => m.get(v).contains(nn) }.toDouble / exact.size
    val rMulti = recall(nnMap(vector.VectorQueries.q134MultiLsh(spark, sf01)))
    val rSingle = recall(nnMap(vector.VectorQueries.q19AnnLsh(spark, sf01)))
    info(f"recall@1: multi-table (L=4) $rMulti%.3f vs single-table $rSingle%.3f")
    // The synthetic embeddings are near-random, so ABSOLUTE recall tracks
    // the scanned candidate fraction for any LSH family (measured sweep:
    // 6-bit/L=1 0.06, 6-bit/L=4 0.22, 4-bit/L=8 0.66 at 35% of all pairs)
    // — the law worth pinning is the L-knob itself: union of L independent
    // tables multiplies recall ≈ L× (1−(1−p)^L for small per-table p),
    // here asserted at ≥2.5× with a chance-level-excluding floor.
    assert(rMulti >= 2.5 * rSingle,
      f"L=4 should multiply single-table recall ~4x: $rMulti%.3f vs $rSingle%.3f")
    assert(rMulti >= 0.15, f"multi-table recall floor: $rMulti%.3f")
  }

  test("q230 co-tuned LSH: recall floor at BOTH scales, candidates near-linear across them") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // exact top-1 ground truth at a given dir — brute force, native dot
    def exactNn(dir: String): Map[Long, Long] = {
      val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
        .withColumn("nrm", sqrt(graft.expressions.NativeKernels.dotF($"embedding", $"embedding")))
      val a = e.select($"vec_id".as("av"), $"embedding".as("ae"), $"nrm".as("an"))
      val b = e.select($"vec_id".as("bv"), $"embedding".as("be"), $"nrm".as("bn"))
      a.join(b, $"av" =!= $"bv")
        .select($"av", $"bv",
          (graft.expressions.NativeKernels.dotF($"ae", $"be") / ($"an" * $"bn")).as("sim"))
        .groupBy($"av").agg(max(struct($"sim", (-$"bv").as("neg"))).as("m"))
        .select($"av", (-$"m.neg").as("nn"))
        .as[(Long, Long)].collect().toMap
    }
    def recallAt(dir: String): (Double, Int) = {
      val exact = exactNn(dir)
      val got = vector.VectorQueries.q230LshCotuned(spark, dir)
        .select($"vec_id".cast("long"), $"nn_id".cast("long"), $"band_bits".cast("int"))
        .collect()
      val m = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
      (exact.count { case (v, nn) => m.get(v).contains(nn) }.toDouble / exact.size,
        got.head.getInt(2))
    }
    // The recall-floor half of the co-tuning law (VERDICT r15 #1): deeper
    // bands alone collapse recall (measured: b=9/L=4 halves it, b=12/L=4
    // zeroes it — SCALING.md's LshStress table); the L = b−2 pairing must
    // HOLD a floor where the depth changes, i.e. at sf0.1's (8, 6), not
    // only at sf0.01's q134-equivalent (6, 4). Measured: 0.194 at (6, 4)
    // — q134's 0.216 ballpark, the independent-planes sanity anchor —
    // and 0.127 at (8, 6), which is the co-tuning trade stated honestly:
    // these near-random embeddings give recall ∝ candidates scanned (the
    // q134 law's finding), and (8, 6) scans ~2.3% of pairs/vector where
    // q134-at-sf0.1 scans ~6.2% — MORE recall per scanned candidate
    // (0.127/2.3% vs 0.216/6.2%), at ~250× chance (1/2000).
    val (r01, b01) = recallAt("/root/testdata/sf0.01")
    val (r1, b1) = recallAt("/root/testdata/sf0.1")
    info(f"recall@1: sf0.01 (b=$b01) $r01%.3f, sf0.1 (b=$b1) $r1%.3f")
    assert(b01 == 6 && b1 == 8, s"ladder drifted: b(500)=$b01 b(2000)=$b1")
    assert(r01 >= 0.15, f"co-tuned recall floor at sf0.01: $r01%.3f")
    assert(r1 >= 0.10, f"co-tuned recall floor at sf0.1: $r1%.3f")
    // The near-linear half: distinct candidate pairs under the CO-TUNED
    // plan grow ≤ 2× the corpus growth across sf0.01 → sf0.1 (4× rows),
    // where the FIXED-b plan (q134's b=6 at both) grows them
    // quadratically — measured side by side so the law documents the gap
    // it exists to close.
    val n01 = Tables.embeddings(spark, "/root/testdata/sf0.01").count()
    val n1 = Tables.embeddings(spark, "/root/testdata/sf0.1").count()
    val c01 = vector.VectorQueries.cotunedPairs(spark, "/root/testdata/sf0.01",
      vector.VectorQueries.scaledBandBits(n01)).count()
    val c1 = vector.VectorQueries.cotunedPairs(spark, "/root/testdata/sf0.1",
      vector.VectorQueries.scaledBandBits(n1)).count()
    val growth = c1.toDouble / c01
    val dataGrowth = n1.toDouble / n01
    info(f"candidates: $c01 → $c1 (${growth}%.1f×) on a ${dataGrowth}%.1f× corpus")
    assert(growth <= 2.0 * dataGrowth,
      f"co-tuned candidate growth $growth%.1f× exceeds 2× the $dataGrowth%.1f× corpus growth")
  }

  test("q181 audit: one row per probe, hits bounded by both sides, recall is the exact ratio") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val rows = vector.VectorQueries.q181AnnRecall(spark, sf01).collect()
    val nProbes = Tables.embeddings(spark, sf01)
      .filter(vector.VectorQueries.probePredicate($"vec_id")).count()
    assert(rows.length.toLong == nProbes && nProbes > 0)
    rows.foreach { r =>
      val (ne, nc, nh) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_cands"),
        r.getAs[Long]("n_hits"))
      assert(ne == 5L) // corpus >> k, so exact top-5 is always full
      assert(nh <= math.min(ne, nc))
      assert(r.getAs[Double]("recall") ==
        BigDecimal(nh.toDouble / ne).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("PQ ADC search: top-5 overlap vs exact kNN clears the measured floor (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    def top5(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = top5(vector.VectorQueries.q18KnnTopk(spark, sf01))
    val pq = top5(vector.VectorQueries.q138PqAdcSearch(spark, sf01))
    assert(pq.keySet == exact.keySet, "same bounded probe set on both sides")
    val overlap = exact.map { case (p, ex) =>
      (ex intersect pq(p)).size.toDouble / ex.size
    }.sum / exact.size
    info(f"PQ ADC recall@5 vs exact: $overlap%.3f")
    // 4×8-code PQ is a 64-float→4-byte compression; on near-random vectors
    // quantization distortion dominates, so the honest law is relative to
    // chance: a random 5-set overlaps ~5/(n−1) ≈ 1%. Measured 0.16 — the
    // codes carry ~15× chance-level signal even here (and more training
    // rounds overfit the noise: 2 iters measured 0.08). Pinned at ≥10×.
    val n = Tables.embeddings(spark, sf01).count()
    val chance = 5.0 / (n - 1)
    assert(overlap >= 10 * chance, f"ADC recall collapsed: $overlap%.3f vs chance $chance%.4f")
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

  test("serving from persisted index artifacts reproduces q140 exactly (q148)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val fromArtifacts = rows(vector.VectorQueries.q148AnnIndexRoundtrip(spark, sf))
    val inMemory = rows(vector.VectorQueries.q140IvfPqSearch(spark, sf))
    assert(fromArtifacts == inMemory) // parquet roundtrip of every artifact is value-exact
    assert(fromArtifacts.nonEmpty)
    val root = new java.io.File(vector.VectorQueries.annIndexRoot(sf))
    val parts = root.listFiles().map(_.getName).toSet
    assert(Seq("centroids", "cells", "codes", "codebook_0", "codebook_3",
        "codes8", "codebook8_0", "codebook8_3")
      .forall(parts.contains), s"missing artifacts in $parts")
  }

  test("vector/graph index roots are pid-free lake artifacts: cold-served, trained exactly once (VERDICT r14 #1)") {
    // The difference between "a vector store" and "a per-process cache":
    // a FRESH session must find the published index by (corpus, recipe)
    // alone — so the path may not embed the trainer's pid — and serving
    // again must never retrain (artifact bytes untouched).
    val pid = s"p${ProcessHandle.current().pid()}"
    val roots = Seq(
      vector.VectorQueries.annIndexRoot(sf),
      vector.VectorQueries.annIndexRoot(sf) + "_incr",
      vector.VectorQueries.graphIndexRoot(sf),
      vector.VectorQueries.graphIncrRoot(sf))
    roots.foreach(r => assert(!r.contains(pid), s"pid-scoped artifact path: $r"))
    // ensure all four artifacts are published
    vector.VectorQueries.q148AnnIndexRoundtrip(spark, sf).collect()
    vector.VectorQueries.q151IncrementalAnnUpdate(spark, sf).collect()
    vector.VectorQueries.q213GraphAnnBeam(spark, sf).collect()
    vector.VectorQueries.q224GraphAnnIncremental(spark, sf).collect()
    def snapshot(root: String): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val base = java.nio.file.Paths.get(root)
      val stream = java.nio.file.Files.walk(base)
      try stream.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => base.relativize(p).toString -> p.toFile.lastModified()).toMap
      finally stream.close()
    }
    val before = roots.map(r => r -> snapshot(r)).toMap
    // serve again — a retrain would rewrite artifact files
    vector.VectorQueries.q148AnnIndexRoundtrip(spark, sf).collect()
    vector.VectorQueries.q151IncrementalAnnUpdate(spark, sf).collect()
    vector.VectorQueries.q213GraphAnnBeam(spark, sf).collect()
    vector.VectorQueries.q224GraphAnnIncremental(spark, sf).collect()
    roots.foreach { r =>
      assert(snapshot(r) == before(r), s"re-serve retrained/rewrote artifacts under $r")
      // and no staging residue — the publish either renamed or cleaned up
      assert(!new java.io.File(s"${r}_stage_$pid").exists(), s"staging leaked: $r")
    }
  }

  test("index roots key on corpus CONTENT: a regenerated corpus is a new index, never a stale serve (ADVICE r14)") {
    // simulate a testdata regen: same path, different file metadata
    val dir = java.nio.file.Files.createTempDirectory("graft_fp_corpus").toFile
    try {
      val emb = new java.io.File(dir, "embeddings.parquet")
      java.nio.file.Files.writeString(emb.toPath, "generation-one")
      val r1 = vector.VectorQueries.annIndexRoot(dir.getPath)
      val g1 = vector.VectorQueries.graphIndexRoot(dir.getPath)
      java.nio.file.Files.writeString(emb.toPath, "generation-two!") // longer + newer
      val r2 = vector.VectorQueries.annIndexRoot(dir.getPath)
      val g2 = vector.VectorQueries.graphIndexRoot(dir.getPath)
      assert(r1 != r2, "ann root ignored a corpus regeneration")
      assert(g1 != g2, "graph root ignored a corpus regeneration")
      // unchanged content ⇒ same root (the artifact stays servable)
      assert(r2 == vector.VectorQueries.annIndexRoot(dir.getPath))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("q229 rerank is exactly the cosine top-5 of its stage-1 candidates (within-candidates optimality)") {
    import org.apache.spark.sql.functions.col
    // the law that defines a two-stage retriever: stage 2 may not lose
    // precision WITHIN the recall stage's candidate set — per probe, the
    // served 5 must equal the brute-force cosine top-5 of the ADC top-20
    // (stage 1 reads the PQ8 tier since round 19)
    val root = vector.VectorQueries.ensureAnnIndex(spark, sf)
    val cand = vector.VectorQueries.adcTopK8FromArtifacts(spark, sf, root, 20)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val served = vector.VectorQueries.q229RerankedAnn(spark, sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    assert(served.nonEmpty && served.keySet == cand.keySet)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.indices.map(i => a(i).toDouble * b(i)).sum
      dot / (math.sqrt(a.indices.map(i => a(i).toDouble * a(i)).sum) *
        math.sqrt(b.indices.map(i => b(i).toDouble * b(i)).sum))
    }
    served.foreach { case (p, got) =>
      assert(got.toSet.subsetOf(cand(p)), s"probe $p served outside its candidates")
      val want = cand(p).toSeq.map(v => (cos(e(p), e(v)), v))
        .sortBy { case (s, v) => (-s, v) }.take(5).map(_._2)
      assert(got == want, s"probe $p: rerank is not the within-candidates optimum")
    }
  }

  test("q151 incremental append serves identically to a full re-code against the same artifacts") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val incremental = rows(vector.VectorQueries.q151IncrementalAnnUpdate(spark, sf))
    assert(incremental.nonEmpty)
    // the batch really is in the served index: cells/codes cover the corpus
    val root = vector.VectorQueries.annIndexRoot(sf) + "_incr"
    val n = Tables.embeddings(spark, sf).count()
    assert(spark.read.parquet(s"$root/cells").count() == n)
    assert(spark.read.parquet(s"$root/codes").count() == n * 4)
    // full rebuild of the CODE tables: same base-trained quantizers, the
    // whole corpus assigned+coded in one overwrite — must serve byte-equal
    val root2 = vector.VectorQueries.annIndexRoot(sf) + "_rebuild"
    val raw = Tables.embeddings(spark, sf)
    vector.VectorQueries.trainIndexArtifacts(spark, root2, raw.filter($"vec_id" % 10 =!= 9))
    vector.VectorQueries.codeIntoIndex(spark, root2, raw, "full")
    // the spec is this root's single writer and the artifact is complete
    // here — stamp the completion marker the serve path's memoized count
    // now requires (publishedArtifactCount refuses unpublished roots)
    new java.io.File(s"$root2/_trained").createNewFile()
    val rebuilt = rows(vector.VectorQueries.serveFromArtifacts(spark, sf, root2))
    assert(incremental == rebuilt)
  }

  test("persisted code values (q148 full, q151 incremental) match the cross-engine-adjudicated q176 checksums") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, sum}
    // q176's (n, Σcode, Σcode·vec_id) per (train, subspace) is
    // DuckDB-adjudicated (the oracle replays both trainings +
    // assignments); each persisted index's code files must carry exactly
    // the matching variant's values — q148's codes the `full` rows,
    // q151's appended base∪b1 codes the `base` rows. This anchors BOTH
    // artifact sets to a cross-engine-verified computation (ADVICE r9
    // gate-strength note; the earlier full-only form could not speak for
    // q151, whose codebooks are base-trained).
    val expected = vector.VectorQueries.q176PqCodeChecksum(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def persistedSums(root: String) = spark.read.parquet(s"$root/codes")
      .groupBy($"m").agg(count(lit(1)).as("n"), sum($"code").as("cs"),
        sum($"code".cast("decimal(38,0)") * $"vec_id").cast("string").as("cis"))
      .collect()
      .map(r => (r.getAs[Number]("m").longValue(),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val nSub = vector.VectorQueries.PqSubspaces
    assert(expected.keySet ==
      (for (t <- Seq("full", "base"); m <- 0 until nSub) yield (t, m.toLong)).toSet)
    vector.VectorQueries.q148AnnIndexRoundtrip(spark, sf).collect() // ensure built
    val full = persistedSums(vector.VectorQueries.annIndexRoot(sf))
    assert(full == expected.collect { case (("full", m), v) => m -> v },
      s"q148 persisted code checksums diverge from q176 'full'")
    vector.VectorQueries.q151IncrementalAnnAudit(spark, sf).collect() // ensure appended
    val incr = persistedSums(vector.VectorQueries.annIndexRoot(sf) + "_incr")
    assert(incr == expected.collect { case (("base", m), v) => m -> v },
      s"q151 persisted code checksums diverge from q176 'base'")
  }

  test("q149 filtered ANN: results satisfy the predicate; agrees with q54 on kept ids") {
    import spark.implicits._
    val keep = Tables.documents(spark, sf)
      .filter($"lang" === "en" && $"n_chars" >= 200)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val filtered = vector.VectorQueries.q149FilteredAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(filtered.nonEmpty)
    assert(filtered.forall { case (_, _, id, _) => keep(id) }) // pre-filter held
    // consistency: any kept id q54 already ranked must appear in q149 at
    // least as early (same probed cells, same scoring, smaller candidate set)
    val unfiltered = vector.VectorQueries.q54IvfSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val fRank = filtered.map { case (p, rk, id, _) => (p, id) -> rk }.toMap
    for ((p, rk, id, _) <- unfiltered if keep(id)) {
      assert(fRank.get((p, id)).exists(_ <= rk),
        s"probe $p: kept id $id ranked $rk unfiltered but ${fRank.get((p, id))} filtered")
    }
  }

  test("q232 refined graph: NN-Descent widening beats the LSH-pool build at D=16 (sf0.01)") {
    import org.apache.spark.sql.functions.max
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val exact = vector.VectorQueries.q18KnnTopk(spark, sf01)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    def recall5(edges: org.apache.spark.sql.DataFrame): Double = {
      val served = vector.VectorQueries.beamServe(spark, sf01, edges,
          vector.VectorQueries.BeamRounds)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      served.keysIterator.map(k => (served(k) & exact(k)).size / 5.0).sum / served.size
    }
    val d = vector.VectorQueries.RefinedDegree
    // the corpus-aware ladder (VERDICT r16 #2): saturated corpus → 1
    // round (the (2·D)² NoN bound reaches everything), unsaturated → 2
    val n01 = Tables.embeddings(spark, sf01).count()
    assert(vector.VectorQueries.scaledRefineRounds(n01, d) == 1,
      s"n=$n01 at D=$d is saturated — one round must suffice")
    assert(vector.VectorQueries.scaledRefineRounds(2000, d) == 2)
    assert(vector.VectorQueries.scaledRefineRounds(4L * d * d, d) == 1) // boundary
    val base = recall5(vector.VectorQueries.builtGraphEdgesD(spark, sf01, d))
    val refinedEdges = vector.VectorQueries.builtGraphEdgesRefinedD(
      spark, sf01, d, vector.VectorQueries.scaledRefineRounds(n01, d)).localCheckpoint()
    val refined = recall5(refinedEdges)
    info(f"recall@5 at D=$d: LSH-pool build $base%.3f, NN-Descent-refined $refined%.3f")
    // Measured 0.48 → 1.00 (at n=500 the (2·D)² NoN candidate bound
    // saturates the corpus; the unsaturated sf0.1 law is its own test
    // below). Floors leave regen headroom; the strict-improvement
    // clause is the law itself — the widening must BUY recall, not tie.
    assert(refined >= 0.80, f"refined recall floor: $refined%.3f")
    assert(refined >= base + 0.15,
      f"NN-Descent round bought no recall: $base%.3f → $refined%.3f")
    // the degree cap survives refinement: ≤ 2·D out-edges per node, the
    // bound the serve's per-round frontier-join cost stands on
    val maxDeg = refinedEdges.groupBy($"src").count().agg(max($"count")).head.getLong(0)
    assert(maxDeg <= 2L * d, s"M_max cap violated after refinement: $maxDeg > ${2 * d}")
  }

  test("q232 at the UNSATURATED scale: the count-bought second round clears recall 0.80 (sf0.1)") {
    import org.apache.spark.sql.functions.max
    import spark.implicits._
    val sf1 = "/root/testdata/sf0.1"
    val d = vector.VectorQueries.RefinedDegree
    val n = Tables.embeddings(spark, sf1).count()
    val rounds = vector.VectorQueries.scaledRefineRounds(n, d)
    assert(4L * d * d < n, "this law only means something below saturation")
    assert(rounds == 2, s"unsaturated corpus must get the second round, got $rounds")
    val exact = vector.VectorQueries.q18KnnTopk(spark, sf1)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val edges = vector.VectorQueries.builtGraphEdgesRefinedD(
      spark, sf1, d, rounds).localCheckpoint()
    val served = vector.VectorQueries.beamServe(spark, sf1, edges,
        vector.VectorQueries.BeamRounds)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recall = served.keysIterator
      .map(k => (served(k) & exact(k)).size / 5.0).sum / served.size
    info(f"recall@5 at D=$d, n=$n, rounds=$rounds: $recall%.3f")
    // measured 0.85 at 2 rounds (0.70 at 1 — GraphStress r16); the floor
    // the judge asked to pin (VERDICT r16 #2), with regen headroom
    assert(recall >= 0.80, f"unsaturated refined recall floor: $recall%.3f")
    val maxDeg = edges.groupBy($"src").count().agg(max($"count")).head.getLong(0)
    assert(maxDeg <= 2L * d, s"M_max cap violated: $maxDeg > ${2 * d}")
  }

  test("q213 graph ANN: recall@5 vs exact q18 clears the floor (the recall law)") {
    // Measured 0.48 on this corpus — the strongest approximate tier here
    // (multi-table LSH 0.216@1, PQ 0.160@5: near-random embeddings give
    // every index little structure to exploit). Pinned ≥ 0.3 to absorb a
    // data regen; the depth law below is the exact statement.
    val exact = vector.VectorQueries.q18KnnTopk(spark, sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val served = vector.VectorQueries.q213GraphAnnBeam(spark, sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(served.nonEmpty && served.keySet == exact.keySet,
      s"probe sets differ: ${exact.keySet -- served.keySet} unserved")
    assert(served.values.forall(_.size <= 5))
    val recall = served.keysIterator
      .map(k => (served(k) & exact(k)).size / 5.0).sum / served.size
    info(f"graph-ANN (D=${vector.VectorQueries.GraphDegree}, B=${vector.VectorQueries.BeamWidth}, L=${vector.VectorQueries.BeamRounds}) recall@5 vs exact: $recall%.3f")
    assert(recall >= 0.3, f"graph-ANN recall collapsed: $recall%.3f")
  }

  test("graph ANN at production degrees: cap, frontier bound, and the recall curve at D ∈ {6, 16, 32}") {
    // VERDICT r14 #3 (r13 #8 carryover): the registered q213 runs D=6;
    // HNSW deployments run M=16–48. Laws per D: the 2·D M_max cap is a
    // hard out-degree guarantee (measured to BIND at D=6 — maxDeg 12 =
    // cap — and to sit under it at 16/32 where the LSH candidate pool,
    // not the cap, is the binding constraint), the cap only PRUNES the
    // symmetrized relation, and recall@5 rises with D (measured 0.480 /
    // 0.720 / 0.720 here; 0.360/0.480/0.640 at sf0.01 — floors pinned
    // under the measurements to absorb a data regen). Cost envelope
    // with wall times lives in SCALING.md (graft.GraphStress).
    // Per-round serve work is probes · B · maxOutDeg ≤ probes · B · 2D —
    // the measured cap is the load-bearing fact of the frontier bound.
    import org.apache.spark.sql.functions._
    val exact = vector.VectorQueries.q18KnnTopk(spark, sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val floors = Map(6 -> 0.3, 16 -> 0.55, 32 -> 0.55)
    val recalls = Seq(6, 16, 32).map { d =>
      val edges = vector.VectorQueries.builtGraphEdgesD(spark, sf, d).localCheckpoint()
      val maxDeg = edges.groupBy(col("src")).count()
        .agg(max(col("count"))).head.getLong(0)
      assert(maxDeg <= 2 * d, s"D=$d: degree cap violated: $maxDeg > ${2 * d}")
      val served = vector.VectorQueries.beamServe(spark, sf, edges,
          vector.VectorQueries.BeamRounds)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      assert(served.keySet == exact.keySet)
      val recall = served.keysIterator
        .map(k => (served(k) & exact(k)).size / 5.0).sum / served.size
      info(f"D=$d%2d maxOutDeg=$maxDeg%3d recall@5=$recall%.3f")
      assert(recall >= floors(d), f"D=$d recall collapsed: $recall%.3f")
      recall
    }
    assert(recalls(2) >= recalls(0),
      f"denser graph lost recall: D=32 ${recalls(2)}%.3f < D=6 ${recalls(0)}%.3f")
  }

  test("q213 depth law: per-probe exact hits at rounds=1 survive at rounds=4 — recall never degrades") {
    // The seen set grows monotonically with rounds, and any exact-top-5
    // member of the seen set MUST surface in the served top-5 (at most 4
    // candidates anywhere outscore it) — so the hit set itself is
    // monotone per probe, a deterministic law stronger than comparing
    // aggregate recall.
    val exact = vector.VectorQueries.q18KnnTopk(spark, sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    def hits(rounds: Int): Map[Long, Set[Long]] =
      vector.VectorQueries.graphBeamSearch(spark, sf, rounds)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
        .map { case (p, ids) => p -> (ids & exact(p)) }
    val shallow = hits(1)
    val deep = hits(vector.VectorQueries.BeamRounds)
    assert(deep.keySet == shallow.keySet && deep.nonEmpty)
    shallow.foreach { case (p, h1) =>
      assert(h1.subsetOf(deep(p)),
        s"probe $p lost exact hits going deeper: ${h1 -- deep(p)}")
    }
    val r1 = shallow.valuesIterator.map(_.size).sum / (5.0 * shallow.size)
    val r4 = deep.valuesIterator.map(_.size).sum / (5.0 * deep.size)
    info(f"recall@5: rounds=1 $r1%.3f -> rounds=${vector.VectorQueries.BeamRounds} $r4%.3f")
    assert(r4 >= r1)
  }

  test("q220 RRF: fused top-5 comes from the retrievers' union; agreed top-1 wins the fusion") {
    import org.apache.spark.sql.functions._
    import graft.expressions.NativeKernels.dotF
    val fused = vector.VectorQueries.q220RrfFusion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fused.nonEmpty)
    // recompute both retriever top-10s exactly (driver-side, probe-bounded)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val p = e.filter(vector.VectorQueries.probePredicate(col("vec_id")))
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val scored = e.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        dotF(col("embedding"), col("p_emb")).as("dot"),
        (dotF(col("embedding"), col("p_emb")) /
          (sqrt(dotF(col("embedding"), col("embedding"))) *
            sqrt(dotF(col("p_emb"), col("p_emb"))))).as("cos"))
      .collect().groupBy(_.getLong(0))
    def top(rows: Array[org.apache.spark.sql.Row], f: org.apache.spark.sql.Row => Double, k: Int) =
      rows.sortBy(r => (-f(r), r.getLong(1))).take(k).map(_.getLong(1)).toSeq
    fused.groupBy(_._1).foreach { case (probe, rows) =>
      val cos10 = top(scored(probe), _.getDouble(3), 10)
      val dot10 = top(scored(probe), _.getDouble(2), 10)
      val union = (cos10 ++ dot10).toSet
      rows.foreach { case (_, _, v, _) =>
        assert(union(v), s"probe $probe fused candidate $v not in either retriever's top-10")
      }
      // agreement law: a shared rank-1 has the maximum possible RRF score
      if (cos10.head == dot10.head)
        assert(rows.minBy(_._2)._3 == cos10.head,
          s"probe $probe: agreed top-1 ${cos10.head} did not win the fusion")
      // exact-integer scores: every rrf is a sum of 1..2 valid contributions
      val valid = (1 to 10).map(r => vector.VectorQueries.RrfScale / (vector.VectorQueries.RrfK + r)).toSet
      rows.foreach { case (_, _, _, s) =>
        assert(valid(s) || valid.exists(a => valid.exists(b => a + b == s)),
          s"rrf score $s is not a valid contribution sum")
      }
    }
  }

  test("q221 hard negatives: every negative is cross-language and is the true cross-lang top-3") {
    import org.apache.spark.sql.functions._
    val langOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = vector.VectorQueries.q221HardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (p, _, v, _) =>
      assert(langOf(v) != langOf(p), s"negative $v shares probe $p's language")
    }
    // agreement with a brute-force recomputation restricted to cross-lang
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.indices.map(i => a(i).toDouble * b(i)).sum
      dot / (math.sqrt(a.indices.map(i => a(i).toDouble * a(i)).sum) *
        math.sqrt(b.indices.map(i => b(i).toDouble * b(i)).sum))
    }
    got.groupBy(_._1).foreach { case (p, rows) =>
      val want = e.keys.filter(v => v != p && langOf.contains(v) && langOf.get(v) != langOf.get(p))
        .map(v => (cos(e(p), e(v)), v)).toSeq
        .sortBy { case (s, v) => (-s, v) }.take(3).map(_._2)
      assert(rows.sortBy(_._2).map(_._3).toSeq == want,
        s"probe $p: served negatives differ from brute force")
    }
  }

  test("q224 incremental graph: every increment node links in, the cap survives the append, recall holds") {
    val exact = vector.VectorQueries.q18KnnTopk(spark, sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val served = vector.VectorQueries.q224GraphAnnIncremental(spark, sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(served.nonEmpty && served.keySet == exact.keySet)
    val recall = served.keysIterator
      .map(k => (served(k) & exact(k)).size / 5.0).sum / served.size
    info(f"incremental graph-ANN recall@5 vs exact: $recall%.3f")
    assert(recall >= 0.3, f"incremental recall collapsed: $recall%.3f")
    // the merged artifact: M_max cap holds AFTER the append (the HNSW
    // insert re-prune), and every increment node became a source
    val root = vector.VectorQueries.graphIncrRoot(sf)
    val edges = spark.read.parquet(s"$root/edges")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDeg = edges.groupBy(_._1).values.map(_.size).max
    assert(maxDeg <= 2 * vector.VectorQueries.GraphDegree,
      s"append broke the degree cap: $maxDeg")
    val incIds = Tables.embeddings(spark, sf)
      .filter(vector.VectorQueries.isIncrement(org.apache.spark.sql.functions.col("vec_id")))
      .collect().map(_.getLong(0)).toSet
    val srcs = edges.map(_._1).toSet
    assert(incIds.nonEmpty && incIds.forall(srcs),
      s"unlinked increment nodes: ${(incIds -- srcs).take(3)}")
    // the base artifact is increment-free (built strictly pre-append)
    val baseSrcs = spark.read.parquet(s"$root/base_edges")
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(baseSrcs.intersect(incIds).isEmpty,
      "base artifact contains increment nodes — the append rebuilt the base")
  }

  test("q213 edge index is a persisted artifact: read-back serve ≡ a from-scratch build") {
    import org.apache.spark.sql.functions._
    // the q148 discipline applied to the graph tier: the artifact parquet
    // must contain exactly the edge relation the build plan defines (so a
    // new session serving by path traverses the same graph), and the
    // degree bound must hold on the symmetrized table
    val root = vector.VectorQueries.graphIndexRoot(sf)
    vector.VectorQueries.q213GraphAnnBeam(spark, sf).collect() // forces the build
    assert(new java.io.File(s"$root/_graphbuilt").exists, "completion marker missing")
    val persisted = spark.read.parquet(s"$root/edges")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = vector.VectorQueries.builtGraphEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(persisted == rebuilt,
      s"artifact drifted from the build plan: ${(persisted -- rebuilt).take(3)} / ${(rebuilt -- persisted).take(3)}")
    // the M_max cap is a hard guarantee, hubs included (pre-cap this
    // corpus had a degree-14 hub; symmetry is sacrificed by the prune,
    // exactly HNSW's directed shape)
    val maxDeg = persisted.groupBy(_._1).values.map(_.size).max
    assert(maxDeg <= 2 * vector.VectorQueries.GraphDegree,
      s"degree cap violated: $maxDeg > 2·D")
    // every kept edge came from the symmetrized top-D relation (the cap
    // only prunes, never invents)
    assert(persisted.forall { case (a, b) => a != b })
  }

  test("beam seed subplan: probe bands broadcast, per-probe cut is a group-limit, no cartesian product") {
    // the seed plan executes EAGERLY inside beamServe's first
    // localCheckpoint, so neither PlanDigestSpec's golden nor Explain's
    // final-plan dump ever sees it — this is its only plan-shape gate.
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val df = vector.VectorQueries.beamSeeds(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanWalk.allNodes(df.queryExecution.executedPlan)
    // the full-corpus band relation must stream past a BROADCAST build
    // side holding the probe-filtered bands (the % probe cap marks it) —
    // a shuffle join here would shuffle n·L band rows per serve
    val probeSideBroadcast = nodes.collect { case b: BroadcastHashJoinExec => b }
      .exists { b =>
        val build = b.buildSide match {
          case BuildLeft => b.left
          case BuildRight => b.right
        }
        PlanWalk.allNodes(build).exists {
          case f: FilterExec => f.condition.toString.contains("%")
          case _ => false
        }
      }
    assert(probeSideBroadcast,
      s"band-mates join must broadcast the probe-band side:\n${df.queryExecution.executedPlan}")
    // the BeamSeedCap id cut must run as a rank group-limit (top-cap per
    // probe inside each partition before the window), not a full
    // materialize-then-filter of every mate
    assert(nodes.exists(_.isInstanceOf[WindowGroupLimitExec]),
      s"seed cap lost its WindowGroupLimit:\n${df.queryExecution.executedPlan}")
    // the only product is the 1-row min-id entry (broadcast NLJ); a
    // CartesianProductExec would mean an unpriced scan×scan
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      s"unpriced cartesian product in the seed plan:\n${df.queryExecution.executedPlan}")
  }
}
