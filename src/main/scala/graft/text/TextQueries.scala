package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis surface over the `documents` table (BASELINE north star:
  * language-ID, quality scoring, token counting, fingerprinting). All
  * map-side Catalyst expressions — at 100 TB these are embarrassingly
  * parallel scans with no shuffle except the final aggregates.
  */
object TextQueries {

  /** Token counting two ways: whitespace and BPE-ish regex pre-tokenizer. */
  def q13DocTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
        $"doc_id",
        size(tokens($"text")).cast("long").as("n_tokens"),
        tokenCountRegex($"text").as("n_tokens_re"),
        $"n_chars",
        length($"text").cast("long").as("text_len"))
      .orderBy($"doc_id")
  }

  /** Quality scoring: mean word length + stopword ratio. */
  def q14DocQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
        $"doc_id",
        avgWordLen($"text").as("avg_word_len"),
        stopwordRatio($"text").as("stopword_ratio"))
      .orderBy($"doc_id")
  }

  /** Document fingerprinting (md5 of normalized text). */
  def q15DocFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }

  /** Exact dedup via fingerprint: per-lang doc count vs distinct-content
    * count. The distinct runs on the 32-byte fingerprint, not the text —
    * at 100 TB the shuffle carries hashes, never documents.
    */
  def q16DedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(fingerprint($"text")).as("n_unique"))
      .orderBy($"lang")
  }

  /** Language-ID heuristic (char-bigram profiles, argmax). Output is the
    * prediction per doc plus agreement with the labeled lang.
    */
  def q17LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", langId($"text").as("pred_lang"), $"lang")
      .withColumn("agree", ($"pred_lang" === $"lang").cast("long"))
      .orderBy($"doc_id")
  }

  /** Top-5 terms per language by document frequency: the Generator surface
    * (`explode` over the token array — SURVEY Phase 4's "explode word
    * counts"). explode → per-(lang, token) distinct-doc counts → per-lang
    * top-k. At scale the explode is map-side; the aggregate is partial+
    * final on (lang, token); WindowGroupLimit caps the per-lang ranking.
    */
  def q36TopTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"df".desc, $"token")
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", explode(tokens($"text")).as("token"))
      .groupBy($"lang", $"token")
      .agg(countDistinct($"doc_id").as("df"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"lang", $"rn".cast("long").as("rn"), $"token", $"df")
      .orderBy($"lang", $"rn")
  }

  /** TF-IDF: top-3 scored terms per probe document. Term frequencies and
    * document frequencies are separate aggregates joined on token (a
    * shuffle join — the vocabulary is corpus-sized, never broadcast at
    * scale); the corpus size N arrives as a broadcast 1-row cross join, not
    * a collected scalar.
    */
  def q38Tfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val toks = docs.select($"doc_id", explode(tokens($"text")).as("token"))
    val tf = toks.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"tfidf".desc, $"token")
    tf.filter($"doc_id" % 25 === 0)
      .join(dfreq, "token")
      .crossJoin(broadcast(n))
      .select($"doc_id", $"token",
        ($"tf" * log($"n_docs".cast("double") / $"df")).as("tfidf"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"doc_id", $"rn".cast("long").as("rn"), $"token", round($"tfidf", 4).as("tfidf"))
      .orderBy($"doc_id", $"rn")
  }

  /** Winnowing fingerprints (Schleimer et al. '03 — the MOSS local
    * fingerprinting scheme; the brief's "rolling hash" pillar): rolling
    * polynomial hash over 4-codepoint windows, min of each 8-hash window,
    * distinct selected prints. Guarantees any shared substring ≥ k+w−1
    * chars contributes a shared fingerprint — the content-defined
    * complement to q15's whole-document md5. Pure integer arithmetic, so
    * the oracle recomputes every value exactly.
    */
  def q49Winnowing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.expressions.NativeKernels.rollingFingerprints
    Tables.documents(s, dir)
      .select($"doc_id", rollingFingerprints($"text", 4, 8).as("fps"))
      .select($"doc_id",
        size($"fps").cast("long").as("n_fps"),
        element_at($"fps", 1).as("min_fp"),
        element_at($"fps", -1).as("max_fp"))
      .orderBy($"doc_id")
  }

  /** Deterministic train/valid/test split — the reproducible-split op every
    * training pipeline needs: bucket = portable 60-bit md5 hash of a salted
    * doc key, mod 100 → 80/10/10. Map-side only (the hash is a per-row
    * expression, no shuffle until the 3-row rollup), and the assignment is
    * stable across engines, runs, and cluster layouts — re-running on 100 TB
    * reproduces the identical split, and a new doc never moves old docs
    * between splits (unlike ordinal or random splits).
    */
  def q57HashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the ONE portable bucket construction, shared with q59's sampler —
    // the Spark recipe must match the oracles' '0x'||substr(md5) exactly
    val bucket = PipelineQueries.hashBucket("split:", $"doc_id")
    Tables.documents(s, dir)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
      .groupBy($"split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        countDistinct($"source").as("n_sources"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
      .orderBy($"split")
  }

  /** Gopher-style repetition filter: fraction of duplicated word 3-grams
    * per doc (1 − distinct/total), rolled up per source with a flag count.
    * The distinct-gram count reuses the wordShingles kernel (sorted
    * distinct); everything is map-side until the per-source rollup.
    */
  def q58RepetitionFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.expressions.NativeKernels.wordShingles
    val nTotal = greatest(size(tokens($"text")) - lit(2), lit(1)).cast("double")
    val dupFrac = lit(1.0) - size(wordShingles($"text", 3)).cast("double") / nTotal
    Tables.documents(s, dir)
      .select($"source", dupFrac.as("dup_frac"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"dup_frac" > 0.05, 1L).otherwise(0L)).as("n_flagged"),
        round(avg($"dup_frac"), 4).as("avg_dup_frac"))
      .orderBy($"source")
  }

  /** PII scrubbing (the redaction pass a training-data pipeline runs before
    * anything leaves the raw zone): digit-run masking over the id-bearing
    * `c_name` column, plus email redaction exercised on a deterministic
    * contact string derived from the same column — the corpus itself
    * carries no literal emails, so the derivation is what proves the email
    * branch fires. All regexp built-ins: map-side, codegen'd, no UDF; at
    * 100 TB this is a pure scan-side rewrite folded into the projection.
    */
  def q70PiiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.{maskIdDigits, scrubEmails}
    val contact = lower(concat(regexp_replace($"c_name", "#", "."), lit("@example.com")))
    Tables.customer(s, dir)
      .filter($"c_custkey" % 20 === 0)
      .select(
        $"c_custkey",
        maskIdDigits($"c_name").as("masked_name"),
        regexp_count($"c_name", lit("[0-9]")).cast("long").as("n_digits"),
        scrubEmails(contact).as("scrubbed_contact"))
      .orderBy($"c_custkey")
  }

  /** Document chunking with overlap — the pretokenization split that turns
    * a corpus into training sequences (size 128 tokens, stride 96 → 32
    * tokens of overlap). Chunk COUNT comes from exact integer arithmetic
    * (`(n-128+95) div 96 + 1`), chunk ids from `posexplode(sequence(...))`
    * — a generator, so each document row fans out map-side with no shuffle
    * and no driver involvement; md5 keeps the verified payload small. At
    * 100 TB this is the op that feeds sequence packing (q62).
    */
  def q78DocChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val K = 128; val S = 96
    Tables.documents(s, dir)
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", split($"text", " ", -1).as("toks"))
      .withColumn("n", size($"toks"))
      .withColumn("n_chunks",
        when($"n" <= K, lit(1L))
          .otherwise(expr(s"cast((n - ${K - S + 1}) div $S + 1 as bigint)")))
      .select($"doc_id", $"toks",
        posexplode(sequence(lit(0L), $"n_chunks" - 1)))
      .select($"doc_id", $"col".as("chunk_id"),
        slice($"toks", $"col" * S + 1, lit(K)).as("ct"))
      .select($"doc_id", $"chunk_id",
        size($"ct").cast("long").as("n_toks"),
        md5(concat_ws(" ", $"ct")).as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Unicode canonicalization (NFC + accent strip + lowercase) via the
    * native [[graft.expressions.NativeKernels.foldText]] kernel — the
    * normalization pass run before any fingerprint/dedup so that "Café"
    * and "cafe" collide. The accented prefix is injected because the
    * synthetic corpus is ASCII; it proves the fold against DuckDB's
    * independent utf8proc implementation, not just on identity input.
    */
  def q79TextNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.expressions.NativeKernels.foldText
    val folded = foldText(concat(lit("Àé Îõ ÜÇ Ñ ß — "), $"text"))
    Tables.documents(s, dir)
      .filter($"doc_id" % 10 === 0)
      .select(
        $"doc_id",
        md5(folded).as("fold_md5"),
        length(folded).cast("long").as("fold_len"),
        substring(folded, 1, 16).as("fold_prefix"))
      .orderBy($"doc_id")
  }

  /** Per-language bigram language model head: top-5 word bigrams by count
    * per language — the n-gram statistics pass behind perplexity filters
    * and classic LM-based quality scoring. Shingle fan-out is a generator
    * (map-side); counts partial-aggregate before the (lang, bigram)
    * shuffle; the top-k window runs over per-lang count rows, which are
    * vocabulary-sized, never corpus-sized.
    */
  def q89BigramLm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"bigram")
    Tables.documents(s, dir)
      .select($"lang", explode(shingles(tokens($"text"), 2)).as("bigram"))
      .groupBy($"lang", $"bigram")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"lang", $"rn", $"bigram", $"n")
      .orderBy($"lang", $"rn")
  }

  /** Bigram-LM cross-entropy scoring — the perplexity-based quality filter
    * q89 builds the statistics for (reference analog: LM-based corpus
    * filtering as in CCNet/Gopher). The model is the conditional MLE
    * p(w2|w1) = n(w1 w2) / n(w1 ·) per language, trained on the corpus
    * itself; each document is then scored by the weighted mean negative
    * log-probability of its bigrams (its cross-entropy under the model —
    * perplexity's log). High cross-entropy = surprising under the corpus
    * distribution = quality-filter candidate.
    *
    * Scale shape: the corpus-positions relation collapses map-side to
    * per-doc distinct grams with multiplicity (`tf`); model statistics are
    * window sums over that same relation (see in-code note), so the
    * corpus-scale work is one groupBy plus two hash-partitioned window
    * passes — no join, and no broadcast of anything that grows with the
    * corpus. (A production variant that truncates the model to top-M
    * bigrams could broadcast it; the full MLE model is kept here because
    * the oracle replays it exactly.)
    */
  def q141DocPerplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // The model "join" is expressed as two unordered window sums over the
    // tf relation itself (n2 = Σtf per (lang, bigram), n1 = Σtf per
    // (lang, w1)) instead of materializing model/context tables and
    // joining them back: one explode + one groupBy of the corpus instead
    // of two (a DataFrame reused in two branches is recomputed per
    // branch), and no join at all. The two window shuffles carry the same
    // (lang, bigram)-keyed tf rows the join formulation shuffled anyway —
    // measured ~20–30% faster at sf0.1.
    val tf = Tables.documents(s, dir)
      .select($"doc_id", $"lang", explode(shingles(tokens($"text"), 2)).as("bigram"))
      .groupBy($"doc_id", $"lang", $"bigram")
      .agg(count(lit(1)).as("tf"))
    tf.withColumn("w1", substring_index($"bigram", " ", 1))
      .withColumn("n2", sum($"tf").over(Window.partitionBy($"lang", $"bigram")))
      .withColumn("n1", sum($"tf").over(Window.partitionBy($"lang", $"w1")))
      .withColumn("lp", log($"n2".cast("double") / $"n1"))
      .groupBy($"doc_id")
      .agg(
        sum($"tf").cast("long").as("n_bigrams"),
        round(-sum($"lp" * $"tf") / sum($"tf"), 4).as("cross_entropy"))
      .orderBy($"doc_id")
  }

  /** Heavy hitters over an unbounded key domain — the sketch-then-recount
    * pattern. A plain groupBy-count shuffles every distinct key (fine for
    * a bounded vocab, fatal for open domains: URLs, user ids, raw grams at
    * 100 TB). Instead a [[graft.operators.MisraGries]] summary (k=64)
    * partial-aggregates map-side, so the shuffle carries one ≤64-entry map
    * per (lang × partition); its guarantee (no false negatives above
    * n/(k+1) ≈ 1.5%) makes the candidate set a superset of every token at
    * the reported 3% threshold. Candidates (≤64/lang) broadcast back as a
    * semi-join filter and are recounted EXACTLY, so the sketch prunes the
    * shuffle but never decides a number — the output is exact and
    * partitioning-invariant, which is what lets a SQL oracle replay it
    * with a plain GROUP BY + HAVING.
    */
  def q142HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mg = udaf(new graft.operators.MisraGries(64))
    val toks = Tables.documents(s, dir)
      .select($"lang", explode(tokens($"text")).as("tok"))
    val candidates = toks.groupBy($"lang").agg(mg($"tok").as("sketch"))
      .select($"lang", explode(map_keys($"sketch")).as("tok"))
    val totals = toks.groupBy($"lang").agg(count(lit(1)).as("n_toks"))
    toks.join(broadcast(candidates), Seq("lang", "tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("n"))
      .join(broadcast(totals), "lang")
      .filter($"n" * 100 >= $"n_toks" * 3) // exact integer 3% threshold
      .select($"lang", $"tok", $"n")
      .orderBy($"lang", $"tok")
  }

  /** Heavy hitters via Spark's built-in DataSketches frequent-items
    * surface (`approx_top_k_accumulate` / `_combine` / `_estimate`,
    * SPARK-52515) — the TWO-PHASE form whose intermediate sketch STATE is
    * a first-class column: per-lang states built in one scan, merged with
    * `_combine` into a global state (no rescan — the same mergeability
    * q197 shows for cardinality, here for frequency), top-64 estimated
    * out. Same sketch-then-exact-recount discipline as q142's
    * Misra-Gries: the sketch only nominates candidates (its merged error
    * ≤ 3.5·N/10000 ≈ 0.035% of the stream, so nothing at the reported 2%
    * global threshold can be missed); the ≤64 survivors broadcast back
    * and are recounted EXACTLY, making the output partitioning- and
    * merge-order-invariant — which is what lets the plain GROUP BY +
    * HAVING oracle hash-match a sketch-driven plan.
    */
  def q198ApproxTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"lang", explode(tokens($"text")).as("tok"))
    val candidates = toks.groupBy($"lang")
      .agg(expr("approx_top_k_accumulate(tok, 10000)").as("st"))
      .agg(expr("approx_top_k_combine(st, 10000)").as("c"))
      .select(explode(expr("approx_top_k_estimate(c, 64)")).as("e"))
      .select($"e.item".as("tok"))
    val total = toks.agg(count(lit(1)).as("n_toks"))
    toks.join(broadcast(candidates), "tok")
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter($"n" * 50 >= $"n_toks") // exact integer 2% threshold
      .select($"tok", $"n")
      .orderBy($"tok")
  }

  /** Composite rule-based quality filter (Gopher/C4-style heuristic gate):
    * document length, mean word length, alphabetic-word fraction, symbol
    * density, and stopword presence, composed into a single keep/drop
    * decision. Every rule is EXACT INTEGER arithmetic (`4·n_words ≤
    * n_chars` instead of `mean ≥ 4.0`), so the flags are hash-stable
    * across engines and the whole gate is one codegen'd map-side
    * projection — at 100 TB this is the embarrassingly-parallel first
    * pass that runs before any shuffle-bearing dedup tier.
    */
  def q143QualityRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val nWords = size(toks).cast("long")
    val nCharsNs = length(regexp_replace($"text", " ", "")).cast("long")
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(toks,
      w => w.isin("the", "a", "of", "and", "to", "in", "is"))).cast("long")
    val nSym = size(regexp_extract_all($"text", lit("#|\\.\\.\\."), lit(0))).cast("long")
    val rules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "r_len" -> ($"n_words" >= 30 && $"n_words" <= 100000),
      "r_word_len" -> ($"n_chars_ns" >= $"n_words" * 4 && $"n_chars_ns" <= $"n_words" * 10),
      "r_alpha" -> ($"n_alpha" * 5 >= $"n_words" * 4),
      "r_symbols" -> ($"n_sym" * 10 < $"n_chars_ns"),
      "r_stopwords" -> ($"n_stop" >= 2))
    Tables.documents(s, dir)
      .select($"doc_id", nWords.as("n_words"), nCharsNs.as("n_chars_ns"),
        nAlpha.as("n_alpha"), nStop.as("n_stop"), nSym.as("n_sym"))
      .select($"doc_id" +:
        rules.map { case (n, c) => c.cast("long").as(n) } :+
        rules.map(_._2).reduce(_ && _).cast("long").as("keep"): _*)
      .orderBy($"doc_id")
  }

  /** BPE merge-candidate table (the statistic behind the first BPE
    * iteration): per language, the five most frequent within-word adjacent
    * character pairs, weighted by word occurrence (per-word multiplicity
    * collapsed by the kernel's distinct — the standard "count words, not
    * positions" formulation). Two generator fan-outs (words, then pairs)
    * happen map-side; only (lang, pair) count rows shuffle.
    */
  def q96BpePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.expressions.NativeKernels.charNgrams
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"pair")
    Tables.documents(s, dir)
      .select($"lang", explode(tokens($"text")).as("word"))
      .filter(length($"word") >= 2)
      .select($"lang", explode(charNgrams(lower($"word"), 2)).as("pair"))
      .groupBy($"lang", $"pair")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"lang", $"rn", $"pair", $"n")
      .orderBy($"lang", $"rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_doc_perplexity" -> (q141DocPerplexity _),
    "q142_heavy_hitters" -> (q142HeavyHitters _),
    "q198_approx_top_k" -> (q198ApproxTopK _),
    "q143_quality_rules" -> (q143QualityRules _),
    "q96_bpe_pairs" -> (q96BpePairs _),
    "q89_bigram_lm" -> (q89BigramLm _),
    "q78_doc_chunks" -> (q78DocChunks _),
    "q79_text_normalize" -> (q79TextNormalize _),
    "q70_pii_scrub" -> (q70PiiScrub _),
    "q57_hash_split" -> (q57HashSplit _),
    "q58_repetition_filter" -> (q58RepetitionFilter _),
    "q49_winnowing" -> (q49Winnowing _),
    "q38_tfidf" -> (q38Tfidf _),
    "q36_top_terms" -> (q36TopTerms _),
    "q13_doc_tokens" -> (q13DocTokens _),
    "q14_doc_quality" -> (q14DocQuality _),
    "q15_doc_fingerprint" -> (q15DocFingerprint _),
    "q16_dedup_exact" -> (q16DedupExact _),
    "q17_langid" -> (q17LangId _),
  )

  private[graft] val langCase: String = {
    // mirrors TextFunctions.langId: argmax, ties broken en > de > es > fr
    val score = Map(
      "en" -> "len(regexp_extract_all(lower(text), 'th|he|in|er|an'))",
      "de" -> "len(regexp_extract_all(lower(text), 'ch|ei|ie|un|de'))",
      "es" -> "len(regexp_extract_all(lower(text), 'la|os|ar|es|el'))",
      "fr" -> "len(regexp_extract_all(lower(text), 'le|en|nt|ou|re'))",
    )
    s"""CASE
       | WHEN ${score("en")} >= ${score("de")} AND ${score("en")} >= ${score("es")} AND ${score("en")} >= ${score("fr")} THEN 'en'
       | WHEN ${score("de")} >= ${score("es")} AND ${score("de")} >= ${score("fr")} THEN 'de'
       | WHEN ${score("es")} >= ${score("fr")} THEN 'es'
       | ELSE 'fr' END""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // mirrors q89's gram construction (incl. the <2-token degenerate) and
    // replays the MLE training exactly; ln + round(4) as in q38
    "q141_doc_perplexity" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN n < 2 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, n),
        |      i -> array_to_string(toks[CAST(i AS INTEGER):CAST(i + 1 AS INTEGER)], ' '))
        |    END AS grams
        |  FROM t
        |), e AS (
        |  SELECT doc_id, lang, unnest(grams) AS bigram FROM g
        |), tf AS (
        |  SELECT doc_id, lang, bigram, count(*) AS tf
        |  FROM e GROUP BY doc_id, lang, bigram
        |), m AS (
        |  SELECT lang, bigram, split_part(bigram, ' ', 1) AS w1, sum(tf) AS n2
        |  FROM tf GROUP BY lang, bigram
        |), c AS (
        |  SELECT lang, w1, sum(n2) AS n1 FROM m GROUP BY lang, w1
        |), s AS (
        |  SELECT m.lang, m.bigram, ln(CAST(n2 AS DOUBLE) / n1) AS lp
        |  FROM m JOIN c ON m.lang = c.lang AND m.w1 = c.w1
        |)
        |SELECT tf.doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  round(-sum(lp * tf) / sum(tf), 4) AS cross_entropy
        |FROM tf JOIN s ON tf.lang = s.lang AND tf.bigram = s.bigram
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    // exact recount semantics: the MG sketch only prunes candidates, so the
    // oracle is the plain exact formulation
    "q142_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
        |), tot AS (
        |  SELECT lang, count(*) AS n_toks FROM toks GROUP BY lang
        |), c AS (
        |  SELECT lang, tok, count(*) AS n FROM toks GROUP BY lang, tok
        |)
        |SELECT c.lang, c.tok, c.n FROM c JOIN tot ON c.lang = tot.lang
        |WHERE c.n * 100 >= tot.n_toks * 3 ORDER BY c.lang, c.tok""".stripMargin,
    // the sketch only nominates; the exact recount + integer threshold
    // decide — so the oracle is the sketch-free formulation
    "q198_approx_top_k" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |), tot AS (
        |  SELECT count(*) AS n_toks FROM toks
        |), c AS (
        |  SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |)
        |SELECT c.tok, c.n FROM c, tot
        |WHERE c.n * 50 >= tot.n_toks ORDER BY c.tok""".stripMargin,
    // every rule is integer arithmetic — flags are hash-exact by construction
    "q143_quality_rules" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_words,
        |    length(replace(text, ' ', '')) AS n_chars_ns,
        |    len(list_filter(string_split(text, ' '),
        |      w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
        |    len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','of','and','to','in','is'))) AS n_stop,
        |    len(regexp_extract_all(text, '#|\.\.\.')) AS n_sym
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(n_words >= 30 AND n_words <= 100000 AS BIGINT) AS r_len,
        |  CAST(n_chars_ns >= n_words * 4 AND n_chars_ns <= n_words * 10 AS BIGINT) AS r_word_len,
        |  CAST(n_alpha * 5 >= n_words * 4 AS BIGINT) AS r_alpha,
        |  CAST(n_sym * 10 < n_chars_ns AS BIGINT) AS r_symbols,
        |  CAST(n_stop >= 2 AS BIGINT) AS r_stopwords,
        |  CAST(n_words >= 30 AND n_words <= 100000
        |    AND n_chars_ns >= n_words * 4 AND n_chars_ns <= n_words * 10
        |    AND n_alpha * 5 >= n_words * 4
        |    AND n_sym * 10 < n_chars_ns
        |    AND n_stop >= 2 AS BIGINT) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    // list_distinct mirrors the charNgrams kernel's per-word dedup;
    // words shorter than 2 chars are filtered in both engines
    "q96_bpe_pairs" ->
      """WITH w AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
        |), p AS (
        |  SELECT lang, unnest(list_distinct(list_transform(
        |    range(1, length(word)),
        |    i -> substr(lower(word), CAST(i AS INTEGER), 2)))) AS pair
        |  FROM w WHERE length(word) >= 2
        |), c AS (
        |  SELECT lang, pair, count(*) AS n FROM p GROUP BY lang, pair
        |), r AS (
        |  SELECT lang, pair, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, pair) AS rn
        |  FROM c
        |)
        |SELECT lang, rn, pair, n FROM r WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,
    // the CASE mirrors TextFunctions.shingles' degenerate: < 2 tokens →
    // one gram holding the whole text
    "q89_bigram_lm" ->
      """WITH t AS (
        |  SELECT lang, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents
        |), g AS (
        |  SELECT lang,
        |    CASE WHEN n < 2 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, n),
        |      i -> array_to_string(toks[CAST(i AS INTEGER):CAST(i + 1 AS INTEGER)], ' '))
        |    END AS grams
        |  FROM t
        |), e AS (
        |  SELECT lang, unnest(grams) AS bigram FROM g
        |), c AS (
        |  SELECT lang, bigram, count(*) AS n FROM e GROUP BY lang, bigram
        |), r AS (
        |  SELECT lang, bigram, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
        |  FROM c
        |)
        |SELECT lang, rn, bigram, n FROM r WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,
    "q78_doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents WHERE doc_id % 5 = 0
        |), c AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN n <= 128 THEN 1 ELSE (n - 33) // 96 + 1 END AS n_chunks
        |  FROM t
        |), e AS (
        |  SELECT doc_id, toks, CAST(i AS BIGINT) AS chunk_id
        |  FROM c, UNNEST(range(0, n_chunks)) AS u(i)
        |), sl AS (
        |  SELECT doc_id, chunk_id,
        |    toks[CAST(chunk_id * 96 + 1 AS INTEGER):CAST(chunk_id * 96 + 128 AS INTEGER)] AS ct
        |  FROM e
        |)
        |SELECT doc_id, chunk_id, CAST(len(ct) AS BIGINT) AS n_toks,
        |  md5(array_to_string(ct, ' ')) AS chunk_md5
        |FROM sl ORDER BY doc_id, chunk_id""".stripMargin,
    "q79_text_normalize" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    lower(strip_accents(nfc_normalize('Àé Îõ ÜÇ Ñ ß — ' || text))) AS folded
        |  FROM documents WHERE doc_id % 10 = 0
        |)
        |SELECT doc_id, md5(folded) AS fold_md5,
        |  CAST(length(folded) AS BIGINT) AS fold_len,
        |  substr(folded, 1, 16) AS fold_prefix
        |FROM f ORDER BY doc_id""".stripMargin,
    "q70_pii_scrub" ->
      """SELECT c_custkey,
        | regexp_replace(c_name, '[0-9]{4,}', '[ID]', 'g') AS masked_name,
        | CAST(len(regexp_extract_all(c_name, '[0-9]')) AS BIGINT) AS n_digits,
        | regexp_replace(lower(replace(c_name, '#', '.') || '@example.com'),
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS scrubbed_contact
        |FROM customer WHERE c_custkey % 20 = 0 ORDER BY c_custkey""".stripMargin,
    "q57_hash_split" ->
      """WITH s AS (
        |  SELECT *,
        |    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
        |  FROM documents
        |), sp AS (
        |  SELECT *, CASE WHEN bucket < 80 THEN 'train'
        |                 WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
        |  FROM s
        |)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  count(DISTINCT source) AS n_sources,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,
    // slice toks[i : i+2] truncates past the end like the kernel's
    // whole-text degenerate (< 3 tokens → one "gram" = the full text)
    "q58_repetition_filter" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
        |), g AS (
        |  SELECT doc_id, source,
        |    greatest(len(toks) - 2, 1) AS n_total,
        |    len(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |      i -> array_to_string(toks[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ')))) AS n_distinct
        |  FROM t
        |), f AS (
        |  SELECT source, 1.0 - CAST(n_distinct AS DOUBLE) / n_total AS dup_frac FROM g
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN dup_frac > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  round(avg(dup_frac), 4) AS avg_dup_frac
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    // direct per-window polynomial == the kernel's rolling evaluation of
    // the same polynomial mod 2^31 (documents are ASCII: ord == byte).
    // least(length,4) / greatest(...,1) mirror the kernel's n<k branch: a
    // text shorter than k hashes ALL its chars as one window (ADVICE r2 —
    // the unguarded range() dropped sub-k docs from the oracle entirely).
    "q49_winnowing" ->
      """WITH h AS (
        |  SELECT doc_id, i,
        |    CAST(COALESCE(list_sum(list_transform(range(0, least(length(text), 4)),
        |      j -> ord(substr(text, CAST(i + j AS INTEGER), 1))
        |           * CAST(pow(256, least(length(text), 4) - 1 - j) AS BIGINT))), 0)
        |      % 2147483648 AS BIGINT) AS hv
        |  FROM documents, UNNEST(range(1, greatest(length(text) - 3, 1) + 1)) AS u(i)
        |), nh AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
        |wmin AS (
        |  SELECT doc_id, i,
        |    min(hv) OVER (PARTITION BY doc_id ORDER BY i
        |                  ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS f
        |  FROM h
        |), valid AS (
        |  SELECT w.doc_id, f FROM wmin w JOIN nh ON w.doc_id = nh.doc_id
        |  WHERE w.i <= greatest(nh.n - 7, 1)
        |)
        |SELECT doc_id, count(DISTINCT f) AS n_fps, min(f) AS min_fp, max(f) AS max_fp
        |FROM valid GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q38_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
        |), dfreq AS (
        |  SELECT token, count(*) AS df FROM tf GROUP BY token
        |), n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token,
        |    tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n
        |  WHERE tf.doc_id % 25 = 0
        |), ranked AS (
        |  SELECT doc_id, token, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
        |  FROM scored
        |)
        |SELECT doc_id, rn, token, round(tfidf, 4) AS tfidf
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "q36_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
        |), df AS (
        |  SELECT lang, token, count(DISTINCT doc_id) AS df FROM toks GROUP BY lang, token
        |), ranked AS (
        |  SELECT lang, token, df,
        |    row_number() OVER (PARTITION BY lang ORDER BY df DESC, token) AS rn
        |  FROM df
        |)
        |SELECT lang, rn, token, df FROM ranked WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,
    "q13_doc_tokens" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]')) AS n_tokens_re,
        | n_chars, length(text) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q14_doc_quality" ->
      """SELECT doc_id,
        | round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_word_len,
        | round(CAST(len(list_filter(string_split(text, ' '),
        |   w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q15_doc_fingerprint" ->
      "SELECT doc_id, md5(lower(text)) AS fp FROM documents ORDER BY doc_id",
    "q16_dedup_exact" ->
      """SELECT lang, count(*) AS n_docs, count(DISTINCT md5(lower(text))) AS n_unique
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q17_langid" ->
      s"""SELECT doc_id, $langCase AS pred_lang, lang,
         | CAST($langCase = lang AS BIGINT) AS agree
         |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
