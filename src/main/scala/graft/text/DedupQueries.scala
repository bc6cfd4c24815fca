package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.NativeKernels._

/** Near-duplicate detection over `documents` — the training-data-pipeline
  * dedup menu beyond exact dedup (q16): MinHash-LSH (q20), SimHash (q26),
  * n-gram-Jaccard probe search (q28), and embedding-cosine (q50).
  *
  * Scale design shared by q20/q26: the candidate step NEVER compares all
  * pairs. Documents are reduced map-side to small sketches (128 minhashes /
  * one 60-bit simhash), sketches are banded, and candidates come from an
  * equi-join on the band key — the shuffle carries sketches, not documents,
  * and the join cost is proportional to real collisions. Only verified
  * candidates ever load their shingle sets again.
  *
  * Everything is codegen'd Catalyst built-ins (no UDFs): shingling via
  * `transform(sequence…)`, minhash via `array_min(transform(…, xxhash64))`,
  * simhash bit-votes via `filter`+`size`.
  */
object DedupQueries {

  val ShingleK = 3
  val NumHashes = 128   // q20 signature length
  val JaccardThreshold = 0.6

  /** Co-tuned MinHash banding plan (VERDICT r16 #1 — q230's sizing
    * discipline applied to the MinHash family): rows-per-band r from an
    * integer ladder on the corpus count (r = 4 at n ≤ 1000, +1 per 4×,
    * clamped to 8), bands b = [[NumHashes]] / r. A pair with Jaccard J
    * band-collides with probability 1−(1−J^r)^b, so r is the candidate
    * throttle: the n²-pair BACKGROUND contributes ~n²·b·J₀^r candidates
    * (J₀ = typical non-dup similarity), and raising r by 1 per 4× corpus
    * growth shrinks J₀^r faster than n² grows — the near-linear regime,
    * exactly q230's occupancy argument restated in Jaccard space. Recall
    * at the corpus's true-dup similarity stays pinned: at J ≥ 0.87 the
    * miss probability is < 1e-11 at (4, 32) and < 2e-3 at the deepest
    * (8, 16) rung — DedupRecallSpec proves recall = 1 at the verify
    * gate's scale. Integer ladder, no floating log: both engines must
    * derive the identical (r, b) from the identical count.
    */
  private[graft] def scaledMinhashPlan(n: Long): (Int, Int) = {
    var r = 4
    while (r < 8 && n > (1000L << (2 * (r - 4)))) r += 1
    (r, NumHashes / r)
  }

  /** The plan every minhash consumer in this corpus rides, derived from
    * the documents-table cardinality — a zero-column count answered from
    * parquet row-group metadata. Gated consumers (q40's survivors, q67's
    * new batch) size from the SAME full-corpus count: it is the
    * metadata-only upper bound of their input, and one rung too deep
    * only sharpens the candidate throttle while recall stays ≥ 1−2e-3
    * (the ladder's worst rung) — whereas sizing from a computed subset
    * would force a second pass over a non-metadata count.
    */
  private[graft] def docMinhashPlan(s: SparkSession, dir: String): (Int, Int) =
    scaledMinhashPlan(Tables.rowCount(s, dir, "documents"))

  /** DuckDB twins of [[scaledMinhashPlan]] — generated from the same
    * ladder constants so the q20/q50 oracles adjudicate the identical
    * sizing arithmetic via emitted (bands, rows_per_band) columns.
    * Expect a relation exposing `n` = count(*) of documents.
    */
  private[graft] val minhashRowsSqlCase: String =
    "CASE " + (4 until 8).map(r => s"WHEN n <= ${1000L << (2 * (r - 4))} THEN $r")
      .mkString(" ") + " ELSE 8 END"
  private[graft] val minhashBandsSqlCase: String =
    "CASE " + (4 until 8).map(r =>
      s"WHEN n <= ${1000L << (2 * (r - 4))} THEN ${NumHashes / r}")
      .mkString(" ") + s" ELSE ${NumHashes / 8} END"

  /** doc_id + sorted distinct word-k-shingle set. WordShingles is the
    * native kernel; TextFunctions.shingles (the `transform(sequence…)`
    * composition) is its executable specification — NativeKernelsSpec
    * asserts they agree; the kernel is ~100× faster (interpreted lambdas
    * vs one loop, see graft.expressions.NativeKernels).
    */
  private def shingleSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", wordShingles($"text", ShingleK).as("sh"))
  }

  /** (doc_id, band, band_key) rows from the minhash signature pipeline
    * under the co-tuned plan (r rows per band, b bands) —
    * repartitioned on the band key so every consumer joins on an identical
    * canonical Exchange: ReuseExchange then computes the (expensive)
    * signatures ONCE and the second join side reads the reused shuffle
    * output. Without it one side broadcasts and the whole signature
    * pipeline runs twice (measured ~35% of q20).
    */
  private def bandedKeys(s: SparkSession, sh: DataFrame, r: Int, b: Int): DataFrame = {
    import s.implicits._
    val sig = sh.select($"doc_id", minhashSignature($"sh", NumHashes).as("sig"))
    sig.select($"doc_id",
      posexplode(transform(sequence(lit(0), lit(b - 1)),
        bd => xxhash64(slice($"sig", bd * lit(r) + lit(1), lit(r))))))
      .select($"doc_id", $"pos".as("band"), $"col".as("band_key"))
      .repartition($"band", $"band_key")
  }

  /** Band-collision candidate pairs (id_a < id_b) — the shared
    * not-all-pairs candidate generator for q20/q40/q50.
    */
  private def candidatePairs(s: SparkSession, sh: DataFrame, r: Int, b: Int): DataFrame = {
    import s.implicits._
    val banded = bandedKeys(s, sh, r, b)
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
  }

  /** Band candidates verified with exact Jaccard — the full MinHash-LSH
    * near-dup detector over any (doc_id, sh) input; shared by q20 (whole
    * corpus) and q40 (gate survivors). The (r, b) plan comes from the
    * caller ([[docMinhashPlan]]) so every consumer of one corpus rides
    * one banding.
    */
  private[graft] def verifiedPairs(s: SparkSession, sh: DataFrame, r: Int, b: Int): DataFrame = {
    import s.implicits._
    candidatePairs(s, sh, r, b)
      .join(sh.select($"doc_id".as("id_a"), $"sh".as("sh_a")), "id_a")
      .join(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")), "id_b")
      .select($"id_a", $"id_b", jaccardSorted($"sh_a", $"sh_b").as("j"))
      .filter($"j" >= JaccardThreshold)
  }

  /** MinHash-LSH near-dup pairs, exact-Jaccard-verified, banding SIZED TO
    * THE CORPUS (VERDICT r16 #1).
    *
    * signature[j] = min over shingles of xxhash64(shingle, j) — one pass,
    * map-side. Bands of r hashes are re-hashed to a band key; candidates
    * are pairs sharing ≥1 band key; each candidate is then verified with
    * the EXACT Jaccard of its shingle sets, so false positives cannot leak
    * into the result. (r, b) come from [[scaledMinhashPlan]] on the corpus
    * count and are emitted as hash-checked columns, so the oracle
    * adjudicates the sizing arithmetic itself (the q230 pattern). With
    * J≥0.87 for every true near-dup in this corpus, recall is ≥ 1 − 1e-11
    * at the (4, 32) rung and ≥ 1 − 2e-3 at the deepest (8, 16) rung —
    * which is why the oracle can be the exact all-pairs Jaccard (cited
    * sketch: Broder '97 / MMDS ch.3; LSH banding as in Spark MLlib's
    * MinHashLSH, re-expressed as pure Catalyst expressions).
    */
  def q20DedupMinhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (r, b) = docMinhashPlan(s, dir)
    verifiedPairs(s, shingleSets(s, dir), r, b)
      .select($"id_a", $"id_b", round($"j", 4).as("jaccard"),
        lit(b).cast("long").as("bands"),
        lit(r).cast("long").as("rows_per_band"))
      .orderBy($"id_a", $"id_b")
  }

  val EmbeddingDims = 64
  val CosineThreshold = 0.9

  /** Embedding-cosine near-dup — the fifth dedup method next to exact
    * (q16), MinHash-LSH (q20), SimHash (q26) and n-gram Jaccard (q28).
    *
    * Each document is embedded by signed feature hashing of its shingle set
    * (FeatureHashVector, map-side, one pass); near-dups are pairs whose
    * embeddings have cosine ≥ 0.9. Candidates come from the SAME MinHash
    * banding as q20 — the corpus-sized [[scaledMinhashPlan]], emitted as
    * hash-checked columns here too — so embeddings are only ever compared
    * within band collisions, never all-pairs. The exact-Jaccard gate is
    * kept alongside the cosine gate because the banding recall guarantee
    * is stated in Jaccard terms (J ≥ 0.6 ⇒ candidate with P > 1 − 1e-11
    * at the (4, 32) rung); on any corpus the registered result is exactly
    * {pairs : J ≥ 0.6 ∧ cos ≥ 0.9}, which is what the oracle restates.
    *
    * Every arithmetic step is exact-integer-in-double (±1 bucket sums,
    * integer-valued dot products), so Spark and DuckDB agree bit-for-bit
    * before the round(…,4) display guard.
    */
  def q50DedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (r, b) = docMinhashPlan(s, dir)
    val sh = shingleSets(s, dir)
    val emb = sh
      .withColumn("emb", featureHashVector($"sh", EmbeddingDims))
      .withColumn("nrm", sqrt(dotF($"emb", $"emb")))
    candidatePairs(s, sh, r, b)
      .join(emb.select($"doc_id".as("id_a"), $"sh".as("sh_a"),
        $"emb".as("emb_a"), $"nrm".as("nrm_a")), "id_a")
      .join(emb.select($"doc_id".as("id_b"), $"sh".as("sh_b"),
        $"emb".as("emb_b"), $"nrm".as("nrm_b")), "id_b")
      .select($"id_a", $"id_b",
        jaccardSorted($"sh_a", $"sh_b").as("j"),
        (dotF($"emb_a", $"emb_b") / ($"nrm_a" * $"nrm_b")).as("cos"))
      .filter($"j" >= JaccardThreshold && $"cos" >= CosineThreshold)
      .select($"id_a", $"id_b", round($"cos", 4).as("cos_sim"),
        lit(b).cast("long").as("bands"),
        lit(r).cast("long").as("rows_per_band"))
      .orderBy($"id_a", $"id_b")
  }

  val SimhashBits = 60
  val SimhashBands = 4          // 4 × 15 bits; hamming ≤ 3 ⇒ ≥1 band equal
  val HammingThreshold = 3

  /** SimHash near-dup pairs (Charikar '02): 60-bit fingerprint from
    * per-bit majority votes over shingle hashes; candidates from 15-bit
    * band collisions (pigeonhole: hamming ≤ 3 over 4 bands forces ≥1 equal
    * band, so recall at the threshold is exactly 1 and the oracle is the
    * all-pairs hamming join); verified on the full fingerprint.
    *
    * The per-shingle hash is the md5-prefix h60 — portable, so the DuckDB
    * oracle reproduces the fingerprint bit-for-bit. (SimHash bits ARE the
    * result, unlike q20's minhash internals, so q26 pays md5 for
    * verifiability; SimHash60 computes votes natively in one pass.)
    */
  def q26DedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fp = shingleSets(s, dir)
      .select($"doc_id", simhash60($"sh").as("simhash"))
    val banded = fp.select($"doc_id", $"simhash",
      posexplode(array((0 until SimhashBands).map(i =>
        shiftright($"simhash", 15 * i).bitwiseAND(lit(0x7fffL))): _*)))
      .select($"doc_id", $"simhash", $"pos".as("band"), $"col".as("band_key"))
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= HammingThreshold)
      .orderBy($"id_a", $"id_b")
  }

  /** Structural probe bound (VERDICT r5/r6 scale-killer #2): the previous
    * `doc_id % 50 == 0` probe set was a fixed 2% of the corpus — the
    * broadcast grew linearly with input, and it carried FULL gram arrays,
    * so this was the worst of the three fraction-broadcast plans. The id
    * cap bounds the probe side at ≤ MaxGramProbes rows regardless of
    * corpus size; ScaleSpec asserts input-size independence.
    */
  private[graft] val MaxGramProbes = 32
  private[graft] def probePredicate(docId: Column): Column =
    docId % 50 === 0 && docId < MaxGramProbes * 50L

  /** Character-trigram Jaccard probe search: for each probe doc (bounded
    * probe set, see [[probePredicate]]) the most-similar other document.
    * Probes broadcast (≤ MaxGramProbes by construction); one pass over the
    * corpus; per-probe top-1 via a map-side-combining max(struct) — the
    * menu's exactness baseline next to q20/q26's sketches.
    */
  def q28NgramJaccardProbe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // grams travel as sorted distinct xxhash64 longs: the 500k-pair merge
    // then costs primitive compares (measured 10× over UTF8String grams);
    // Jaccard over hashes == Jaccard over grams up to ~2⁻⁶⁴ collisions.
    //
    // The repartition below is load-bearing: without a materialization
    // boundary, whole-stage codegen fuses this projection into the
    // nested-loop probe join's inner loop and recomputes charNgramHashes
    // once per PAIR (~n_probes×) instead of once per document — measured
    // 5 s → 123 s at sf0.1. One small shuffle of (doc_id, grams) pins the
    // per-document evaluation; at cluster scale it also spreads the probe
    // sweep evenly.
    val g = Tables.documents(s, dir)
      .select($"doc_id", charNgramHashes(lower($"text"), 3).as("grams"))
      .repartition($"doc_id")
    val probes = g.filter(probePredicate($"doc_id"))
      .select($"doc_id".as("probe_id"), $"grams".as("p_grams"))
    val scored = g.join(broadcast(probes), $"doc_id" =!= $"probe_id")
      .select($"probe_id", $"doc_id", jaccardSortedLong($"p_grams", $"grams").as("j"))
    // per-probe top-1 as max(struct(j, -doc_id)): field-by-field struct
    // ordering = (j DESC, doc_id ASC) ties — same result as a row_number
    // window, but the aggregate partial-combines map-side, so the shuffle
    // carries one row per probe per partition instead of sorting the whole
    // probe × corpus score table.
    scored
      .groupBy($"probe_id")
      .agg(max(struct($"j", (-$"doc_id").as("neg_id"))).as("m"))
      .select($"probe_id", (-$"m.neg_id").as("best_id"), round($"m.j", 4).as("jaccard"))
      .orderBy($"probe_id")
  }

  /** Capstone corpus-cleaning pipeline — the flagship LLM-training-data
    * use case, composing the pillars end-to-end in the canonical order
    * (filter first, dedup the survivors — RefinedWeb/Gopher style):
    *   1. quality gate: ≥ 20 tokens (TextFunctions length signal);
    *   2. language gate: char-bigram lang-ID must agree with the label;
    *   3. near-dup removal AMONG SURVIVORS: MinHash-LSH + exact-Jaccard
    *      verify (verifiedPairs — the same detector q20 verifies), keep
    *      the smaller doc_id of each pair, drop via LEFT ANTI join — no
    *      collect, no IN-list.
    * Filtering before dedup cuts the sketch/banding work to the surviving
    * fraction of the corpus (~37% here) — at 100 TB the gates are cheap
    * map-side scans and the expensive stage only ever sees what they pass.
    * Output: surviving corpus stats per language.
    */
  def q40CorpusClean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.{langId, tokens}
    val survivors = Tables.documents(s, dir)
      .filter(size(tokens($"text")) >= 20)
      .filter(langId($"text") === $"lang")
      // materialize survivors ONCE: the set feeds both the dedup branch
      // and the final anti-join side, and a plain repartition does NOT
      // dedupe them — per-branch column pruning produces differently-
      // projected exchanges that never canonically match, so the
      // regexp-heavy langId gate ran twice (review r3, verified in the
      // executed plan). localCheckpoint is the intermediate-table pattern
      // the reference pipeline itself uses between stages (etl.py writes
      // each dimension before reuse); cost is one linear write of the
      // surviving ~37%.
      .localCheckpoint()
    val sh = survivors.select($"doc_id", wordShingles($"text", ShingleK).as("sh"))
    val (mr, mb) = docMinhashPlan(s, dir)
    val dropIds = verifiedPairs(s, sh, mr, mb)
      .select($"id_b".as("doc_id")).distinct()
    survivors
      .join(dropIds, Seq("doc_id"), "left_anti")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg($"n_chars"), 2).as("avg_chars"))
      .orderBy($"lang")
  }

  /** The new-batch predicate for the incremental dedup path (q67/q67's
    * index build): doc_id % 5 == 0 is "today's arrivals" (~20%), the rest
    * is the already-indexed corpus.
    */
  private[graft] def isNewBatch(docId: Column): Column = docId % 5 === 0

  /** PID-FREE root for the persisted corpus-side dedup index — same
    * lake-artifact policy as annIndexRoot (round 15): scoped by corpus
    * dir + content fingerprint, published atomically via
    * [[graft.Scratch.publishOnce]], so a fresh session serves the
    * published index by path instead of re-sketching the corpus. The
    * BANDING PLAN is part of the root (r17): the stored band index is
    * only joinable under the (r, b) it was built with, so a ladder
    * change must invalidate the artifact — without the suffix, q67's
    * new-batch bands under a retuned plan silently match nothing
    * against a stale store (caught at sf0.1 when the co-tuned ladder
    * first moved the plan off the old fixed (4, 32)).
    */
  private[graft] def dedupIndexRoot(s: SparkSession, dir: String): String = {
    val (r, b) = docMinhashPlan(s, dir)
    graft.Scratch.path(
      s"dedupindex_${graft.Scratch.tag(dir)}" +
        s"_f${graft.Scratch.fingerprint(s"$dir/documents.parquet")}_r${r}x$b")
  }

  /** Build half of the incremental dedup path: sketch + band the INDEXED
    * corpus (everything outside the new batch) ONCE and persist both the
    * band index (doc_id, band, band_key) and the shingle store needed for
    * exact verification. This is the artifact a production ingestion
    * pipeline maintains continuously — at 100 TB it exists already and is
    * appended to per batch; rebuilding it per run would re-pay the full
    * corpus sketch cost the incremental path exists to avoid (VERDICT r9
    * wrong #1: the pre-r10 registered form did exactly that).
    */
  private[graft] def buildDedupIndex(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = dedupIndexRoot(s, dir)
    val (r, b) = docMinhashPlan(s, dir)
    graft.Scratch.publishOnce(root) { staging =>
      val corpusSh = shingleSets(s, dir).filter(!isNewBatch($"doc_id"))
      bandedKeys(s, corpusSh, r, b)
        .write.mode("overwrite").parquet(s"$staging/bands")
      corpusSh.write.mode("overwrite").parquet(s"$staging/shingles")
    }
  }

  /** Incremental near-dup dedup — the production ingestion shape: a NEW
    * batch (~20%, [[isNewBatch]]) checked against the PERSISTED corpus
    * index ([[buildDedupIndex]] — built once per corpus, q148/q164's
    * publish-once pattern), never new×new or corpus×corpus. The recurring
    * work this registers is exactly the per-batch path: sketch ONLY the
    * new batch (a pruned scan — the batch predicate pushes to parquet),
    * equi-join its bands against the stored band index, verify candidates
    * with exact Jaccard against the stored shingle sets. Cost is
    * batch-proportional; the corpus is touched only through its (small)
    * index files. The output is exactly the pairs an all-pairs run would
    * have added, so the oracle is unchanged.
    */
  def q67IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = buildDedupIndex(s, dir)
    val (r, b) = docMinhashPlan(s, dir) // same corpus count the index build used
    val newSh = shingleSets(s, dir).filter(isNewBatch($"doc_id"))
    val newBands = bandedKeys(s, newSh, r, b)
      .select($"doc_id".as("new_id"), $"band", $"band_key")
    val corpusBands = s.read.parquet(s"$root/bands")
      .select($"doc_id".as("corpus_id"), $"band", $"band_key")
    newBands.join(corpusBands, Seq("band", "band_key"))
      .select($"new_id", $"corpus_id").distinct()
      .join(newSh.select($"doc_id".as("new_id"), $"sh".as("sh_n")), "new_id")
      .join(s.read.parquet(s"$root/shingles")
        .select($"doc_id".as("corpus_id"), $"sh".as("sh_c")), "corpus_id")
      .select($"new_id", $"corpus_id", jaccardSorted($"sh_n", $"sh_c").as("j"))
      .filter($"j" >= JaccardThreshold)
      .select($"new_id", $"corpus_id", round($"j", 4).as("jaccard"))
      .orderBy($"new_id", $"corpus_id")
  }

  /** Build half of the incremental EXACT dedup path (q175): the DISTINCT
    * corpus-side content fingerprints (q16's md5-of-normalized-text, 32
    * bytes each), persisted once under the shared dedup index root. This
    * is the store a production pipeline keeps forever and appends novel
    * fingerprints to per batch — corpus text is scanned once at build,
    * never again on the recurring path.
    */
  private[graft] def buildExactIndex(s: SparkSession, dir: String): String = {
    import s.implicits._
    import graft.functions.TextFunctions.fingerprint
    // its OWN published root (suffix `_fp`), not a subdir of the banded
    // index: publishOnce makes a root visible in one atomic rename, so
    // two artifacts may not share one — whichever published second would
    // find the root already occupied (round 15)
    graft.Scratch.publishOnce(s"${dedupIndexRoot(s, dir)}_fp", "_fp_built") { staging =>
      Tables.documents(s, dir).filter(!isNewBatch($"doc_id"))
        .select(fingerprint($"text").as("fp")).distinct()
        .write.mode("overwrite").parquet(s"$staging/fps")
    }
  }

  /** Incremental EXACT dedup — completes the incremental story next to q67
    * (near-dup) and q16 (full-corpus exact): the new batch's fingerprints
    * checked against the persisted fingerprint store, cost ∝ batch. The
    * left join on the 32-byte fingerprint is the only shuffle touching
    * content — text never leaves its scan (fingerprints are computed
    * map-side before the exchange), and the store side is distinct by
    * construction so the join cannot multiply rows. Output: per-lang batch
    * accounting (dup-of-corpus vs novel) with an exact novel-id-sum so the
    * oracle pins the novel SET, not just its size (q145's fingerprinting
    * device).
    */
  def q175IncrementalExactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.fingerprint
    val root = buildExactIndex(s, dir)
    val newFp = Tables.documents(s, dir).filter(isNewBatch($"doc_id"))
      .select($"doc_id", $"lang", fingerprint($"text").as("fp"))
    val store = s.read.parquet(s"$root/fps").select($"fp", lit(1L).as("hit"))
    newFp.join(store, Seq("fp"), "left")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_new"),
        sum(when($"hit".isNotNull, 1L).otherwise(0L)).as("n_dup"),
        sum(when($"hit".isNull, 1L).otherwise(0L)).as("n_novel"),
        sum(when($"hit".isNull, $"doc_id")).as("novel_id_sum"))
      .orderBy($"lang")
  }

  /** Near-dup CLUSTERS from the verified pair graph — pairs alone
    * over-drop (a∼b, b∼c drops b and c even though a∼c may not hold as a
    * pair; transitively connected docs are one duplicate group with one
    * survivor). Components by iterative min-label propagation: each round,
    * every node takes the min label among itself and its neighbors; the
    * fixpoint labels every component with its minimum doc_id.
    *
    * Scale shape: per round one equi-join (edges ⋈ labels) + one partial-
    * aggregated min — rounds = component diameter (near-dup clusters are
    * shallow; the 20-round guard is far above any real corpus).
    * `localCheckpoint` truncates lineage so the plan does not grow per
    * round — the standard iterative-algorithm pattern (GraphX Pregel
    * does the same). The driver holds only a per-round convergence count,
    * never rows.
    */
  def q69DedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    componentLabels(s, dir).groupBy($"comp".as("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        (count(lit(1)) - 1).as("n_dropped"),
        max($"id").as("max_member"))
      .orderBy($"cluster_id")
  }

  /** Min-label-propagation fixpoint over the verified near-dup pair graph:
    * (id, comp) for every CLUSTERED document, comp = the component's
    * minimum doc_id. Extracted from q69 so the apply step (q145) shares
    * the exact clustering the report step summarizes.
    */
  private[graft] def componentLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (mr, mb) = docMinhashPlan(s, dir)
    val pairs = verifiedPairs(s, shingleSets(s, dir), mr, mb)
      .select($"id_a", $"id_b").localCheckpoint()
    val edges = pairs.union(pairs.select($"id_b".as("id_a"), $"id_a".as("id_b")))
      .toDF("src", "dst")
    var labels = edges.select($"src".as("id")).distinct()
      .withColumn("comp", $"id").localCheckpoint()
    var converged = false
    var rounds = 0
    // min-label propagation moves the minimum one hop per round, so the
    // bound must exceed the largest component diameter; 50 covers any
    // plausible near-dup chain, and non-convergence FAILS LOUDLY below —
    // returning a non-fixpoint would silently split components (review r3)
    val maxRounds = 50
    while (!converged && rounds < maxRounds) {
      val viaNeighbors = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), $"comp", lit(null).cast("long").as("old"))
      // round-19 optimization: the convergence test used to be a SECOND
      // per-round job joining new labels against old BY id — carrying the
      // node's previous label through the min-aggregation (each id
      // contributes exactly one labels row, so max(old) IS that label)
      // folds the test into the same checkpointed pass; `changed` is then
      // a plain scan of the checkpoint, no join, no recompute.
      val updated = labels.select($"id", $"comp", $"comp".as("old"))
        .union(viaNeighbors)
        .groupBy($"id").agg(min($"comp").as("comp"), max($"old").as("old"))
        .localCheckpoint()
      val changed = updated.filter($"comp" =!= $"old").count()
      labels = updated.select($"id", $"comp")
      converged = changed == 0
      rounds += 1
    }
    require(converged,
      s"label propagation did not converge in $maxRounds rounds — component diameter exceeds the bound")
    labels
  }

  /** The dedup APPLY step q69 reports on: canonical-survivor selection.
    * Policy: first-seen wins — each near-dup cluster keeps its minimum
    * doc_id (deterministic, order-free); every unclustered document
    * survives untouched. Output is the per-source before/after accounting
    * plus an exact survivor-id-sum fingerprint, so the oracle pins the
    * SET of survivors, not just their count.
    *
    * Scale shape: `dropped` is (clustered docs − clusters)-sized — tiny
    * against the corpus — and joins back on doc_id as a plain equi-join;
    * at 100 TB AQE turns it into a broadcast join when it fits, and the
    * corpus never shuffles on anything but that key.
    */
  def q145DedupApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // comp IS the component's min doc_id at the fixpoint, so the canonical
    // survivor test is id == comp — no extra aggregate or join
    val dropped = componentLabels(s, dir)
      .filter($"id" =!= $"comp").select($"id".as("drop_id"))
    Tables.documents(s, dir)
      .select($"doc_id", $"source")
      .join(dropped, $"doc_id" === $"drop_id", "left")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_before"),
        sum(when($"drop_id".isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        sum(when($"drop_id".isNull, 1L).otherwise(0L)).as("n_after"),
        sum(when($"drop_id".isNull, $"doc_id")).as("survivor_id_sum"))
      .orderBy($"source")
  }

  /** Corpus-level MinHash sketches per source, built by sketch UNION: each
    * document reduces map-side to a 32-hash PORTABLE signature
    * (md5-derived — the oracle recomputes every value), then
    * [[graft.operators.SignatureMin]] element-wise-mins them per source.
    * min distributes over set union, so the aggregate equals the signature
    * of the union of the source's shingle sets — the incremental
    * corpus-similarity index you keep per shard/source at 100 TB (state:
    * 32 longs per group, mergeable; documents never shuffle). Output pins
    * the whole signature via exact integer sum + two sampled positions.
    */
  def q101CorpusSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val K = 32
    val sigMin = udaf(graft.operators.SignatureMin)
    Tables.documents(s, dir)
      .select($"source", minhashPortable(wordShingles($"text", ShingleK), K).as("sig"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sigMin($"sig").as("ssig"))
      .select(
        $"source", $"n_docs",
        aggregate($"ssig", lit(0L), _ + _).as("sig_sum"),
        element_at($"ssig", 1).as("sig0"),
        element_at($"ssig", 2).as("sig1"))
      .orderBy($"source")
  }

  /** The q101 sketches put to use: estimated Jaccard between every source
    * pair = fraction of equal signature positions, top-10. The pairwise
    * comparison runs over 20 sketch rows of 32 longs — corpus similarity
    * at the cost of comparing SKETCHES, the entire point of building them.
    * Estimates are exact multiples of 1/32, so the oracle matches exactly.
    */
  def q102SourceSimilarity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val K = 32
    val sigMin = udaf(graft.operators.SignatureMin)
    val sk = Tables.documents(s, dir)
      .select($"source", minhashPortable(wordShingles($"text", ShingleK), K).as("sig"))
      .groupBy($"source").agg(sigMin($"sig").as("ssig"))
    val a = sk.select($"source".as("src_a"), $"ssig".as("sa"))
    val b = sk.select($"source".as("src_b"), $"ssig".as("sb"))
    a.join(b, $"src_a" < $"src_b")
      .select($"src_a", $"src_b",
        round(size(filter(zip_with($"sa", $"sb", _ === _), x => x))
          .cast("double") / K, 4).as("est_jaccard"))
      .orderBy($"est_jaccard".desc, $"src_a", $"src_b")
      .limit(10)
  }

  /** Corpus novelty: per source, the fraction of its (distinct-per-doc)
    * word 8-grams that first appear in one of ITS documents — first
    * occurrence attributed by global min doc_id per gram. The redundancy
    * curve that says which sources still add new text. Inverted-index
    * shape: grams aggregate to (gram, first_doc) once, documents join
    * back by gram; totals are exact integers with one final division.
    */
  def q127GramNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // round-19 optimization (guide §2.4: two operations keyed the same way
    // share one exchange): first_doc used to be a separate groupBy(g)
    // aggregate joined back BY g — the gram relation was exploded twice
    // and shuffled twice, plus a string-keyed join. min(doc_id) OVER
    // (PARTITION BY g) is the identical value on the identical rows with
    // ONE gram exchange and no join.
    val grams = Tables.documents(s, dir)
      .select($"doc_id", $"source", explode(wordShingles($"text", 8)).as("g"))
    grams
      .withColumn("first_doc", min($"doc_id").over(Window.partitionBy($"g")))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("total_grams"),
        count(when($"doc_id" === $"first_doc", 1)).as("novel_grams"))
      .select($"source", $"total_grams", $"novel_grams",
        round($"novel_grams".cast("double") / $"total_grams", 4).as("novelty_rate"))
      .orderBy($"source")
  }

  /** Fuzzy benchmark decontamination — the MinHash complement of q63's
    * EXACT 8-gram decontamination (the GPT-3/Llama-style sweep: an eval
    * item reworded or lightly edited into the training corpus shares no
    * exact 8-gram but keeps high shingle-set Jaccard): per eval document
    * (q63's id-capped eval predicate), every corpus document whose exact
    * Jaccard clears [[JaccardThreshold]], candidates generated by the
    * ASYMMETRIC band equi-join (eval bands × corpus bands — the eval side
    * is structurally bounded, the corpus side is banded once by the same
    * [[bandedKeys]] pipeline q20 reuses) — never eval×corpus all-pairs.
    * Zero-match eval docs still report (n=0) so the output is the full
    * audit table. Recall of the banding at J ≥ 0.87 is 1−1e-11 (q20's
    * law, DedupRecallSpec) and the oracle IS the exact all-pairs compare,
    * so a missed true pair fails the hash rather than hiding.
    */
  def q186FuzzyDecontamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // single definition site (VERDICT r10 wrong #1): the SAME predicate
    // q63 binds — a MaxEvalDocs change moves both eval sets together
    val isEval = (c: Column) => PipelineQueries.evalPredicate(c)
    val sh = shingleSets(s, dir)
    val (mr, mb) = docMinhashPlan(s, dir)
    val banded = bandedKeys(s, sh, mr, mb)
    val evalBands = banded.filter(isEval($"doc_id"))
      .select($"doc_id".as("eval_id"), $"band", $"band_key")
    val cands = banded.filter(!isEval($"doc_id"))
      .join(evalBands, Seq("band", "band_key"))
      .select($"eval_id", $"doc_id").distinct()
    // static pruning on the verify fetches: the eval side scans only the
    // id-capped eval rows, the corpus side excludes them — each scan reads
    // its role's fraction instead of the whole corpus twice
    val verified = cands
      .join(sh.filter(isEval($"doc_id"))
        .select($"doc_id".as("eval_id"), $"sh".as("sh_e")), "eval_id")
      .join(sh.filter(!isEval($"doc_id"))
        .select($"doc_id", $"sh".as("sh_c")), "doc_id")
      .select($"eval_id", $"doc_id", jaccardSorted($"sh_e", $"sh_c").as("j"))
      .filter($"j" >= JaccardThreshold)
    val perEval = verified.groupBy($"eval_id")
      .agg(count(lit(1)).as("n_contaminating"),
        round(max($"j"), 4).as("max_jaccard"))
    Tables.documents(s, dir)
      .filter(isEval($"doc_id"))
      .select($"doc_id".as("eval_id"))
      .join(perEval, Seq("eval_id"), "left")
      .na.fill(0L, Seq("n_contaminating"))
      .select($"eval_id", $"n_contaminating", coalesce($"max_jaccard", lit(0.0)).as("max_jaccard"))
      .orderBy($"eval_id")
  }

  /** Template/boilerplate detection by normalized-prefix fingerprint — the
    * C4-style sweep for generated/templated pages: documents sharing the
    * md5 of their first 48 whitespace-collapsed lowercase characters are
    * instances of one template (near-dup bodies behind a shared opening,
    * the complement of q15's whole-document fingerprint and q20's
    * content-wide MinHash). The prefix is normalized and hashed MAP-SIDE,
    * so only the 32-hex-char fingerprint ever shuffles — at 100 TB the
    * text stays where it was scanned; clusters are fingerprints with ≥2
    * members (cluster count ∝ templates, not corpus).
    */
  def q180TemplateClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prefix = substring(regexp_replace(lower($"text"), "\\s+", " "), 1, 48)
    Tables.documents(s, dir)
      .select($"doc_id", $"source", $"lang", md5(prefix).as("fp"))
      .groupBy($"fp")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"source").as("n_sources"),
        countDistinct($"lang").as("n_langs"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
      .filter($"n_docs" >= 2)
      .orderBy($"fp")
  }

  /** q191's span unit: a duplicated run must be at least this many tokens.
    * (The cited deployments use ~50-token spans; 8 keeps the statistic
    * non-degenerate on this corpus's short synthetic docs — the machinery
    * is length-agnostic.)
    */
  private[graft] val SpanL = 8

  /** EXACT-SUBSTRING dedup (the remaining canonical dedup family next to
    * MinHash/SimHash/SemDeDup — cited shape: Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499): for
    * every document, how many of its tokens are covered by a ≥[[SpanL]]-
    * token run that also appears verbatim in ANOTHER document — the
    * per-doc removal statistic the suffix-array method computes. The
    * distributed formulation replaces the single-node suffix array with
    * gram grouping: every L-token gram with its position, grams held by
    * ≥2 distinct docs are duplicated, and a per-doc gaps-and-islands merge
    * turns overlapping duplicated gram positions back into MAXIMAL spans
    * (two grams chain into one island iff their starts are ≤ L apart, so
    * an island covers max−min+L tokens — exactly the union of its
    * intervals). Docs shorter than L carry no gram and report 0.
    *
    * Scale shape: the gram explode + group is work ∝ corpus tokens — the
    * honest price of EXACT substring matching at scale (the same relation
    * q63's decontamination sweep builds); only (gram, doc_id) then
    * (doc_id, pos) rows shuffle, never text, and the island merge is one
    * per-doc window. The oracle replays gram → distinct-doc → island
    * arithmetic exactly, so a span merged or counted wrong fails the hash.
    */
  def q191ExactSubstring(s: SparkSession, dir: String): DataFrame =
    exactSubstringCoverage(Tables.documents(s, dir), SpanL)

  /** The reusable core behind q191: input needs (doc_id, text). Exposed
    * (package-private) for the planted-duplicate spec, which asserts exact
    * span arithmetic on constructed documents.
    */
  private[graft] def exactSubstringCoverage(documents: DataFrame, L: Int): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokens
    val docs = documents
      .select($"doc_id", tokens($"text").as("toks"))
      .withColumn("n", size($"toks").cast("long"))
    val grams = docs.filter($"n" >= L)
      .select($"doc_id", posexplode(expr(
        s"transform(sequence(1, cast(n - ${L - 1} as int)), i -> concat_ws(' ', slice(toks, i, $L)))"))
        .as(Seq("pos", "g")))
    // round-19 optimization (guide §2.4): "held by ≥2 distinct docs" is
    // min(doc_id) ≠ max(doc_id) within the gram's window — the same truth
    // the countDistinct aggregate computed, but with ONE exchange of the
    // gram relation instead of two plus a string-keyed join (the explode
    // also ran once per consumer). Groups are buffered by WindowExec with
    // spill, the same per-gram locality the join's shuffle imposed anyway.
    val wG = Window.partitionBy($"g")
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val spans = grams
      .withColumn("mn", min($"doc_id").over(wG))
      .withColumn("mx", max($"doc_id").over(wG))
      .filter($"mn" =!= $"mx")
      .select($"doc_id", $"pos")
      .withColumn("brk",
        when($"pos" - lag($"pos", 1).over(w) > L, 1L).otherwise(0L))
      .withColumn("island", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_id", $"island")
      .agg((max($"pos") - min($"pos") + L).cast("long").as("covered"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"), sum($"covered").as("dup_tokens"))
    docs.select($"doc_id", $"n".as("n_toks"))
      .join(spans, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "dup_tokens"))
      .select($"doc_id", $"n_toks", $"n_spans", $"dup_tokens",
        round($"dup_tokens".cast("double") / $"n_toks", 4).as("dup_frac"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_exact_substring" -> (q191ExactSubstring _),
    "q180_template_clusters" -> (q180TemplateClusters _),
    "q186_fuzzy_decontamination" -> (q186FuzzyDecontamination _),
    "q127_gram_novelty" -> (q127GramNovelty _),
    "q102_source_similarity" -> (q102SourceSimilarity _),
    "q69_dedup_clusters" -> (q69DedupClusters _),
    "q145_dedup_apply" -> (q145DedupApply _),
    "q67_incremental_dedup" -> (q67IncrementalDedup _),
    "q175_incremental_exact_dedup" -> (q175IncrementalExactDedup _),
    "q101_corpus_sketch" -> (q101CorpusSketch _),
    "q40_corpus_clean" -> (q40CorpusClean _),
    "q20_dedup_minhash" -> (q20DedupMinhash _),
    "q26_dedup_simhash" -> (q26DedupSimhash _),
    "q28_ngram_jaccard_probe" -> (q28NgramJaccardProbe _),
    "q50_dedup_embedding" -> (q50DedupEmbedding _),
  )

  // Shared SQL fragment: distinct word-3-shingles per doc of `src`. DuckDB
  // list slicing is 1-based inclusive (t[i:i+2] = 3 tokens) and truncates
  // past the end, so the greatest() guard degrades to the whole-text
  // shingle exactly like TextFunctions.shingles' size<k branch.
  private def shingleCteFrom(src: String): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM $src),
       |sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(t[i:i+${ShingleK - 1}], ' ') AS s
       |  FROM toks, UNNEST(range(1, greatest(len(t) - ${ShingleK - 1}, 1) + 1)) AS u(i)
       |)""".stripMargin
  private val shingleCte = shingleCteFrom("documents")

  val oracles: Map[String, String] = Map(
    // gram → distinct-doc → gaps-and-islands replayed exactly; gr is
    // MATERIALIZED (referenced by both dup and p — DuckDB would re-run
    // the gram explode per reference otherwise)
    "q191_exact_substring" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |d AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM toks),
         |gr AS MATERIALIZED (
         |  SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos,
         |    array_to_string(t[CAST(i AS INTEGER):CAST(i + ${SpanL - 1} AS INTEGER)], ' ') AS g
         |  FROM d, UNNEST(range(1, CAST(n - ${SpanL - 2} AS BIGINT))) AS u(i)
         |  WHERE n >= $SpanL
         |), dup AS (
         |  SELECT g FROM (
         |    SELECT g, count(DISTINCT doc_id) AS nd FROM gr GROUP BY g
         |  ) WHERE nd >= 2
         |), p AS (
         |  SELECT gr.doc_id, gr.pos FROM gr JOIN dup USING (g)
         |), brk AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $SpanL
         |         THEN 1 ELSE 0 END AS b
         |  FROM p
         |), isl AS (
         |  SELECT doc_id, pos,
         |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM brk
         |), sp AS (
         |  SELECT doc_id, island, max(pos) - min(pos) + $SpanL AS covered
         |  FROM isl GROUP BY doc_id, island
         |), per AS (
         |  SELECT doc_id, count(*) AS n_spans,
         |    CAST(sum(covered) AS BIGINT) AS dup_tokens
         |  FROM sp GROUP BY doc_id
         |)
         |SELECT d.doc_id, d.n AS n_toks,
         |  coalesce(per.n_spans, 0) AS n_spans,
         |  coalesce(per.dup_tokens, 0) AS dup_tokens,
         |  round(CAST(coalesce(per.dup_tokens, 0) AS DOUBLE) / d.n, 4) AS dup_frac
         |FROM d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin,
    // \s+ means the same ASCII whitespace class to Java regex and RE2;
    // md5 renders lowercase hex in both engines
    "q180_template_clusters" ->
      """WITH p AS (
        |  SELECT doc_id, source, lang,
        |    md5(substr(regexp_replace(lower(text), '\s+', ' ', 'g'), 1, 48)) AS fp
        |  FROM documents
        |)
        |SELECT fp, count(*) AS n_docs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT lang) AS n_langs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM p GROUP BY fp HAVING count(*) >= 2 ORDER BY fp""".stripMargin,
    // exact all-pairs eval×corpus Jaccard — the banded Spark side must
    // reproduce it exactly (recall-1 banding + exact verify)
    "q186_fuzzy_decontamination" ->
      s"""WITH $shingleCte,
         |e AS (SELECT doc_id, s FROM sh WHERE ${PipelineQueries.evalPredicateSql("doc_id")}),
         |c AS (SELECT doc_id, s FROM sh WHERE NOT ${PipelineQueries.evalPredicateSql("doc_id")}),
         |ne AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
         |nc AS (SELECT doc_id, count(*) AS n FROM c GROUP BY doc_id),
         |inter AS (
         |  SELECT e.doc_id AS eval_id, c.doc_id AS corp_id, count(*) AS i
         |  FROM e JOIN c ON e.s = c.s GROUP BY 1, 2
         |), j AS (
         |  SELECT inter.eval_id, inter.corp_id,
         |    CAST(i AS DOUBLE) / (ne.n + nc.n - i) AS j
         |  FROM inter
         |  JOIN ne ON ne.doc_id = inter.eval_id
         |  JOIN nc ON nc.doc_id = inter.corp_id
         |), hits AS (
         |  SELECT eval_id, count(*) AS n_contaminating,
         |    round(max(j), 4) AS max_jaccard
         |  FROM j WHERE j >= $JaccardThreshold GROUP BY eval_id
         |)
         |SELECT d.doc_id AS eval_id,
         |  coalesce(h.n_contaminating, 0) AS n_contaminating,
         |  coalesce(h.max_jaccard, 0.0) AS max_jaccard
         |FROM documents d LEFT JOIN hits h ON h.eval_id = d.doc_id
         |WHERE ${PipelineQueries.evalPredicateSql("d.doc_id")}
         |ORDER BY eval_id""".stripMargin,
    // source-level min over DISTINCT (source, shingle) == elementwise min
    // of per-doc signatures (min distributes over union); h60 spelled as
    // the usual '0x'||substr(md5) 60-bit derivation
    "q101_corpus_sketch" ->
      s"""WITH toks AS (
         |  SELECT source, string_split(text, ' ') AS t FROM documents
         |), sh AS (
         |  SELECT DISTINCT source, array_to_string(t[i:i+${ShingleK - 1}], ' ') AS s
         |  FROM toks, UNNEST(range(1, greatest(len(t) - ${ShingleK - 1}, 1) + 1)) AS u(i)
         |), hj AS (
         |  SELECT source, j,
         |    min(CAST('0x' || substr(md5('mh:' || j || ':' || s), 1, 15) AS BIGINT)) AS m
         |  FROM sh, UNNEST(range(0, 32)) AS v(j)
         |  GROUP BY source, j
         |), nd AS (
         |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
         |)
         |SELECT hj.source, any_value(nd.n_docs) AS n_docs,
         |  CAST(sum(m) AS BIGINT) AS sig_sum,
         |  max(CASE WHEN j = 0 THEN m END) AS sig0,
         |  max(CASE WHEN j = 1 THEN m END) AS sig1
         |FROM hj JOIN nd ON hj.source = nd.source
         |GROUP BY hj.source ORDER BY hj.source""".stripMargin,
    // 8-gram variant of the shingle CTE, wordShingles degenerate included
    "q127_gram_novelty" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id, source,
         |    array_to_string(t[i:i+7], ' ') AS g
         |  FROM toks, UNNEST(range(1, greatest(len(t) - 7, 1) + 1)) AS u(i)
         |), fs AS (
         |  SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g
         |)
         |SELECT source,
         |  count(*) AS total_grams,
         |  CAST(count(CASE WHEN sh.doc_id = fs.first_doc THEN 1 END) AS BIGINT) AS novel_grams,
         |  round(CAST(count(CASE WHEN sh.doc_id = fs.first_doc THEN 1 END) AS DOUBLE)
         |    / count(*), 4) AS novelty_rate
         |FROM sh JOIN fs ON sh.g = fs.g
         |GROUP BY source ORDER BY source""".stripMargin,
    "q102_source_similarity" ->
      s"""WITH toks AS (
         |  SELECT source, string_split(text, ' ') AS t FROM documents
         |), sh AS (
         |  SELECT DISTINCT source, array_to_string(t[i:i+${ShingleK - 1}], ' ') AS s
         |  FROM toks, UNNEST(range(1, greatest(len(t) - ${ShingleK - 1}, 1) + 1)) AS u(i)
         |), hj AS (
         |  SELECT source, j,
         |    min(CAST('0x' || substr(md5('mh:' || j || ':' || s), 1, 15) AS BIGINT)) AS m
         |  FROM sh, UNNEST(range(0, 32)) AS v(j)
         |  GROUP BY source, j
         |), p AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    round(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) / 32.0, 4) AS est_jaccard
         |  FROM hj a JOIN hj b ON a.j = b.j AND a.source < b.source
         |  GROUP BY src_a, src_b
         |)
         |SELECT src_a, src_b, est_jaccard FROM p
         |ORDER BY est_jaccard DESC, src_a, src_b LIMIT 10""".stripMargin,
    // filter-first composition: the shingle/dedup CTEs run over `surv`,
    // matching the Spark side's gate-then-dedup order
    "q40_corpus_clean" ->
      s"""WITH surv AS (
         |  SELECT * FROM documents
         |  WHERE len(string_split(text, ' ')) >= 20
         |    AND (${graft.text.TextQueries.langCase.replace("\n", " ")}) = lang
         |),
         |${shingleCteFrom("surv")},
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), drops AS (
         |  SELECT DISTINCT id_b AS doc_id FROM inter
         |  JOIN sizes na ON id_a = na.doc_id JOIN sizes nb ON id_b = nb.doc_id
         |  WHERE c * 1.0 / (na.n + nb.n - c) >= $JaccardThreshold
         |)
         |SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars
         |FROM surv d
         |WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.doc_id = d.doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // components via recursive transitive closure over the same verified
    // pair graph; comp = min reachable id == the propagation fixpoint
    "q69_dedup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes na ON id_a = na.doc_id JOIN sizes nb ON id_b = nb.doc_id
         |  WHERE c * 1.0 / (na.n + nb.n - c) >= $JaccardThreshold
         |), edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), reach AS (
         |  SELECT DISTINCT src AS id, src AS r FROM edges
         |  UNION
         |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON e.src = reach.id
         |), comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
         |SELECT comp AS cluster_id, count(*) AS n_members,
         |  CAST(count(*) - 1 AS BIGINT) AS n_dropped, max(id) AS max_member
         |FROM comps GROUP BY comp ORDER BY cluster_id""".stripMargin,
    // q69's recursive-CTE components + first-seen-wins survivor policy;
    // survivor_id_sum pins the survivor SET exactly
    "q145_dedup_apply" ->
      s"""WITH RECURSIVE $shingleCte,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes na ON id_a = na.doc_id JOIN sizes nb ON id_b = nb.doc_id
         |  WHERE c * 1.0 / (na.n + nb.n - c) >= $JaccardThreshold
         |), edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), reach AS (
         |  SELECT DISTINCT src AS id, src AS r FROM edges
         |  UNION
         |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON e.src = reach.id
         |), comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |dropped AS (SELECT id FROM comps WHERE id != comp)
         |SELECT d.source, count(*) AS n_before,
         |  CAST(sum(CASE WHEN dr.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(sum(CASE WHEN dr.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
         |  CAST(sum(CASE WHEN dr.id IS NULL THEN d.doc_id END) AS BIGINT) AS survivor_id_sum
         |FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // exact restatement of the store semantics: distinct corpus
    // fingerprints, left-joined by the new batch
    "q175_incremental_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT DISTINCT md5(lower(text)) AS fp FROM documents WHERE doc_id % 5 != 0
        |), nb AS (
        |  SELECT doc_id, lang, md5(lower(text)) AS fp FROM documents WHERE doc_id % 5 = 0
        |)
        |SELECT lang, count(*) AS n_new,
        |  CAST(sum(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST(sum(CASE WHEN c.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(sum(CASE WHEN c.fp IS NULL THEN nb.doc_id END) AS BIGINT) AS novel_id_sum
        |FROM nb LEFT JOIN corpus c ON nb.fp = c.fp
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // cross-set restatement of the q20 oracle: pairs straddling the
    // new/corpus split (recall argument identical to q20's)
    "q67_incremental_dedup" ->
      s"""WITH $shingleCte,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s
         |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0
         |  GROUP BY 1, 2
         |)
         |SELECT new_id, corpus_id, round(c * 1.0 / (na.n + nb.n - c), 4) AS jaccard
         |FROM inter
         |JOIN sizes na ON new_id = na.doc_id JOIN sizes nb ON corpus_id = nb.doc_id
         |WHERE c * 1.0 / (na.n + nb.n - c) >= $JaccardThreshold
         |ORDER BY new_id, corpus_id""".stripMargin,
    // Exact all-pairs Jaccard ≥ threshold — valid as the oracle because the
    // Spark side verifies candidates exactly (no false positives) and the
    // banding miss probability at the corpus's J-range is < 1e-11 at the
    // gate's ladder rung. The co-tuned (bands, rows_per_band) plan rides
    // along as columns DuckDB re-derives from count(*) via the SAME
    // integer ladder — a sizing drift in either engine is a hash mismatch.
    "q20_dedup_minhash" ->
      s"""WITH $shingleCte,
         |mp AS (
         |  SELECT $minhashBandsSqlCase AS b, $minhashRowsSqlCase AS r
         |  FROM (SELECT count(*) AS n FROM documents)
         |),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, round(c * 1.0 / (na.n + nb.n - c), 4) AS jaccard,
         |  CAST(mp.b AS BIGINT) AS bands, CAST(mp.r AS BIGINT) AS rows_per_band
         |FROM inter
         |JOIN sizes na ON id_a = na.doc_id JOIN sizes nb ON id_b = nb.doc_id, mp
         |WHERE c * 1.0 / (na.n + nb.n - c) >= $JaccardThreshold
         |ORDER BY id_a, id_b""".stripMargin,
    "q26_dedup_simhash" ->
      s"""WITH $shingleCte,
         |h AS (SELECT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS hv FROM sh),
         |bits AS (
         |  SELECT doc_id, b,
         |    CASE WHEN 2 * sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE 0 END) > count(*)
         |         THEN (1::BIGINT << b) ELSE 0::BIGINT END AS bitv
         |  FROM h, UNNEST(range(0, $SimhashBits)) AS u(b) GROUP BY doc_id, b
         |),
         |fp AS (SELECT doc_id, CAST(sum(bitv) AS BIGINT) AS simhash FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingThreshold
         |ORDER BY id_a, id_b""".stripMargin,
    // Exact restatement: all pairs with J ≥ 0.6 (candidate recall argument
    // as in q20) whose feature-hashed embeddings have cosine ≥ 0.9. The
    // per-dim sums and dot products are integer-valued, so double math is
    // exact in both engines.
    "q50_dedup_embedding" ->
      s"""WITH $shingleCte,
         |mp AS (
         |  SELECT $minhashBandsSqlCase AS b, $minhashRowsSqlCase AS r
         |  FROM (SELECT count(*) AS n FROM documents)
         |),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), jp AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes na ON id_a = na.doc_id JOIN sizes nb ON id_b = nb.doc_id
         |  WHERE c * 1.0 / (na.n + nb.n - c) >= $JaccardThreshold
         |), h AS (
         |  SELECT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS hv FROM sh
         |), vsum AS (
         |  SELECT doc_id, hv % $EmbeddingDims AS dim,
         |    sum(CASE WHEN (hv >> 59) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS v
         |  FROM h GROUP BY 1, 2
         |), nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM vsum GROUP BY doc_id),
         |dots AS (
         |  SELECT p.id_a, p.id_b, sum(a.v * b.v) AS dot
         |  FROM jp p
         |  JOIN vsum a ON a.doc_id = p.id_a
         |  JOIN vsum b ON b.doc_id = p.id_b AND b.dim = a.dim
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, round(cos, 4) AS cos_sim,
         |  CAST(mp.b AS BIGINT) AS bands, CAST(mp.r AS BIGINT) AS rows_per_band
         |FROM (
         |  SELECT d.id_a, d.id_b, d.dot / (na.nrm * nb.nrm) AS cos
         |  FROM dots d
         |  JOIN nrm na ON d.id_a = na.doc_id JOIN nrm nb ON d.id_b = nb.doc_id
         |), mp WHERE cos >= $CosineThreshold ORDER BY id_a, id_b""".stripMargin,
    "q28_ngram_jaccard_probe" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(
        |    list_transform(range(1, greatest(length(lower(text)) - 2, 1) + 1),
        |                   i -> substr(lower(text), i, 3))) AS grams
        |  FROM documents
        |), probes AS (
        |  SELECT doc_id AS probe_id, grams AS p_grams FROM g
        |  WHERE doc_id % 50 = 0 AND doc_id < 1600
        |), scored AS (
        |  SELECT probe_id, doc_id,
        |    CAST(len(list_intersect(p_grams, grams)) AS DOUBLE) /
        |      len(list_distinct(list_concat(p_grams, grams))) AS j
        |  FROM probes, g WHERE doc_id != probe_id
        |), ranked AS (
        |  SELECT probe_id, doc_id, j,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY j DESC, doc_id) AS rn
        |  FROM scored
        |)
        |SELECT probe_id, doc_id AS best_id, round(j, 4) AS jaccard
        |FROM ranked WHERE rn = 1 ORDER BY probe_id""".stripMargin,
  )
}
