package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All operators are pure column expressions (whole-stage codegen, no
  * UDFs) so they run at scan speed over a 100 TB `documents` table and
  * their semantics can be mirrored 1:1 in the DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokenizer. `split` on \s+ after trim; empty text →
    * empty array (split of '' yields ['']). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array())
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-space punctuation each count as one piece — a cheap proxy for
    * tokenizer budget accounting (public GPT-2-style pretokenizer
    * shape). RE2-compatible pattern (no lookaround) so the oracle can
    * mirror it. */
  val subwordPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def subwordCount(text: Column): Column = regexp_count(text, lit(subwordPattern))

  /** English stopword sample used by quality + langid scoring. */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Quality features per document: lengths, token stats, stopword and
    * punctuation ratios. Ratios are rounded to 4 decimals for stable
    * cross-engine comparison. */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t)
    val nChar = length(col(textCol))
    val stopHits = size(filter(t, x => lower(x).isin(stopwordsEn: _*)))
    val punct = nChar - length(regexp_replace(col(textCol), "[\\.,;:!\\?]", ""))
    df.withColumn("n_chars_calc", nChar.cast("long"))
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("avg_token_len",
        when(nTok === 0, lit(null)).otherwise(round(nChar.cast("double") / nTok, 4)))
      .withColumn("stopword_ratio",
        when(nTok === 0, lit(null)).otherwise(round(stopHits.cast("double") / nTok, 4)))
      .withColumn("punct_count", punct.cast("long"))
  }

  /** Tiny per-language stopword profiles (public common-word lists). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "not"),
    "es" -> Seq("el", "la", "los", "que", "es", "no"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas"))

  /** N-gram-heuristic language ID: score = stopword hits per profile,
    * prediction = argmax with alphabetical tie-break (deterministic).
    */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(lower(col(textCol)))
    val scored = langProfiles.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang",
        size(filter(t, x => x.isin(words: _*))).cast("long"))
    }
    // argmax; ties -> alphabetically first (first-match CASE chain in
    // profile order, each lang winning when >= all later profiles)
    val langs = langProfiles.map(_._1)
    val pred = langs.zipWithIndex.foldRight(lit("und"): Column) {
      case ((lang, i), elseCol) =>
        val beatsLater = langs.drop(i + 1)
          .foldLeft(col(s"score_$lang") > 0) { (acc, other) =>
            acc && col(s"score_$lang") >= col(s"score_$other")
          }
        when(beatsLater, lit(lang)).otherwise(elseCol)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Canonical text normalization for fingerprinting: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))

  /** Document fingerprint: md5 of the normalized text — whitespace-
    * and punctuation-insensitive exact-dup key. */
  def fingerprint(text: Column): Column = md5(normalized(text))
}
