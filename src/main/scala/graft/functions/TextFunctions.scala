package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines.
  *
  * Everything here is composed from codegen'd Catalyst built-ins (no UDFs):
  * each function returns a `Column`, so it stays inside whole-stage codegen
  * and the optimizer can prune/push around it. At 100 TB these run as pure
  * map-side expressions — zero shuffle, zero driver involvement.
  */
object TextFunctions {

  /** Whitespace tokenization (split on single spaces, the documents-table
    * convention). `-1` keeps trailing empties out per Java split semantics.
    */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** BPE-ish subword-boundary token count: runs of alphanumerics OR single
    * non-alphanumeric-non-space marks, the usual pre-tokenizer regex shape.
    */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Exact-dedup document fingerprint: md5 of the lowercased text.
    * Deterministic, partition-local, join-key-friendly (32 hex chars).
    */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Mean word length = chars-without-spaces / token count. */
  def avgWordLen(text: Column): Column =
    round(length(regexp_replace(text, " ", "")).cast("double") / size(tokens(text)), 4)

  /** Fraction of tokens that are (English-ish) stopwords — a quality signal:
    * natural prose sits in a band, keyword-spam and boilerplate fall outside.
    */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    round(
      size(filter(toks, w => w.isInCollection(StopWords))).cast("double") / size(toks),
      4)
  }

  /** Character-bigram language-ID heuristic: score each candidate language
    * by occurrences of its characteristic bigrams, pick the argmax with a
    * fixed precedence tie-break. The classic n-gram-profile approach
    * (Cavnar–Trenkle) reduced to codegen-friendly regexp counts — at scale
    * this is a pure map-side expression.
    */
  val LangProfiles: Seq[(String, String)] = Seq(
    "en" -> "th|he|in|er|an",
    "de" -> "ch|ei|ie|un|de",
    "es" -> "la|os|ar|es|el",
    "fr" -> "le|en|nt|ou|re",
  )

  def langScore(text: Column, profile: String): Column =
    size(regexp_extract_all(lower(text), lit(profile), lit(0))).cast("long")

  def langId(text: Column): Column = {
    val scores = LangProfiles.map { case (l, p) => l -> langScore(text, p) }
    // argmax with ties broken by profile order (en > de > es > fr)
    def build(rest: List[(String, Column)]): Column = rest match {
      case (lang, _) :: Nil => lit(lang)
      case (lang, score) :: tail =>
        when(tail.map(t => score >= t._2).reduce(_ && _), lang).otherwise(build(tail))
      case Nil => lit(null)
    }
    build(scores.toList)
  }

  /** Word k-shingles over the token array: contiguous k-grams joined with a
    * single space. Built from `transform(sequence(...))` so it stays a
    * Catalyst expression (no explode, no UDF).
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** PII-style masking of identifier digit runs (account numbers, record
    * ids): any run of `minRun`+ digits becomes the `[ID]` token. Pure
    * regexp_replace — map-side, codegen'd, RE2-portable pattern (no
    * lookaround, no \\w classes) so oracles can restate it exactly.
    */
  def maskIdDigits(col: Column, minRun: Int = 4): Column =
    regexp_replace(col, s"[0-9]{$minRun,}", "[ID]")

  /** Email-address pattern shared by [[scrubEmails]] and its oracles. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Redact email addresses with the `[EMAIL]` token. */
  def scrubEmails(col: Column): Column =
    regexp_replace(col, EmailPattern, "[EMAIL]")
}
