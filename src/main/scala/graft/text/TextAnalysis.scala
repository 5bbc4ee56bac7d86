package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** `tokens(normalized(text))` with the regex split elided:
    * [[normalized]] output separates tokens by exactly one space and
    * carries no boundary whitespace, so a literal single-space split
    * is equivalent to `\s+` there (proven corpus-wide in the r17
    * optimization pass, and by every oracle hash downstream) and
    * skips the per-row regex machinery. Use wherever the input is the
    * normalized form; raw text keeps [[tokens]]. */
  def normalizedTokens(text: Column): Column = {
    val n = normalized(text)
    when(length(n) === 0, array()).otherwise(split(n, " "))
  }

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
    * non-alphanumerics to spaces, collapse whitespace, trim.
    *
    * `lower` stays the built-in (full Unicode semantics); the
    * strip+collapse+trim tail is the single-pass byte kernel
    * [[graft.functions.CollapseNonAlnum]] — proven equal to the
    * two-regex form it replaces (see its scaladoc) and measured 2.2×
    * faster over the sf0.1 corpus (0.198 s → 0.089 s full-scan noop),
    * a saving every text-family operator inherits since this is their
    * shared scan prefix. */
  def normalized(text: Column): Column =
    graft.functions.CollapseNonAlnum(lower(text))

  /** Document fingerprint: md5 of the normalized text — whitespace-
    * and punctuation-insensitive exact-dup key. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Normalized-text terms, one row per occurrence. The pre-explode
    * repartition spreads compact sources before the fan-out (same trap
    * as Dedup.shingles). */
  private[graft] def termOccurrences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.repartition(col(idCol))
      .select(col(idCol), explode(split(normalized(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")

  /** Corpus vocabulary: document frequency + total term frequency per
    * normalized term, top `k` by (df, tf, term) — the frequency table a
    * tokenizer/vocab build starts from. Both aggregates ride ONE
    * shuffle on the term (map-side combined); the bounded top-k sort
    * runs as TakeOrderedAndProject, never a global sort materialization.
    */
  def vocabulary(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // two-level aggregation instead of count_distinct: the per-(doc,
    // term) pre-aggregate is map-side combined at the explode site, and
    // the term-level rollup then counts rows (= docs) and sums
    // occurrences — no Expand operator, one explode of the corpus
    termOccurrences(docs, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("n"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("n").as("tf"))
      .orderBy(col("df").desc, col("tf").desc, col("term"))
      .limit(k)

  /** Scaled-integer TF-IDF, top `perDoc` terms per document. The score
    * is `tf * floor(1e6 * N / (df + 1))` — an integer. The floor-of-
    * one-division quantization is the cross-engine portability
    * contract: no float logs, no order-dependent float sums, so the
    * DuckDB oracle is bit-exact. Ties break lexicographically. */
  def tfIdfTopTerms(docs: DataFrame, perDoc: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // document frequency derives from the tf aggregate (its rows ARE
    // the distinct (doc, term) pairs) — the corpus explodes ONCE, not
    // once per branch
    val tf = termOccurrences(docs, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))  // 1-row corpus size — broadcast literal
      .withColumn("tfidf",
        (col("tf") * floor(lit(1000000.0) * col("n_docs") / (col("df") + 1))).cast("long"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perDoc)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Repeated-n-gram statistics (the C4/Gopher-style repetition quality
    * gate): per document, total k-gram occurrences, distinct k-grams,
    * the most-repeated k-gram's count, and the duplicate fraction
    * (total − distinct) / total. Two map-side-combined aggregations
    * over the shingle stream; documents shorter than k keep zero
    * counts and a NULL fraction. */
  def repetitionStats(docs: DataFrame, k: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = graft.dedup.Dedup.shingles(docs, k, idCol, textCol, distinct = false)
    val counts = sh.groupBy(col(idCol), col("shingle")).agg(count(lit(1)).as("n"))
    val stats = counts.groupBy(col(idCol)).agg(
      sum("n").as("total_ngrams"),
      count(lit(1)).as("distinct_ngrams"),
      max("n").as("max_repeat"))
    docs.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("total_ngrams"), lit(0L)).as("total_ngrams"),
        coalesce(col("distinct_ngrams"), lit(0L)).as("distinct_ngrams"),
        coalesce(col("max_repeat"), lit(0L)).as("max_repeat"),
        when(coalesce(col("total_ngrams"), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(round(
            (col("total_ngrams") - col("distinct_ngrams")).cast("double") /
              col("total_ngrams"), 4)).as("dup_fraction"))
  }

  /** Out-of-vocabulary rate per document against a supplied vocabulary
    * (typically [[vocabulary]]'s top-k): the unigram-LM quality-filter
    * proxy used in corpus curation. Per doc: total term occurrences,
    * occurrences of terms NOT in the vocab, and their ratio. The vocab
    * side reduces to distinct terms and broadcasts (top-k is small by
    * construction); the term stream is the one explode. Documents with
    * zero terms keep zero counts and a NULL rate. */
  def oovRate(docs: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = termOccurrences(docs, idCol, textCol)
    val inVocab = broadcast(vocab.select("term").distinct())
    val tot = terms.groupBy(col(idCol)).agg(count(lit(1)).as("n_terms"))
    val oov = terms.join(inVocab, Seq("term"), "left_anti")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_oov"))
    docs.select(col(idCol)).join(tot, Seq(idCol), "left")
      .join(oov, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_terms"), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(round(coalesce(col("n_oov"), lit(0L)).cast("double") /
            col("n_terms"), 4)).as("oov_rate"))
  }

  /** Unigram-LM surprisal proxy — the "rare-token density" quality
    * signal (the cheap stand-in for a perplexity filter): each term
    * occurrence contributes `32 − (⌊log₂ df⌋ + 1)` bits, i.e. rare
    * terms (df = 1) score 31, ubiquitous terms approach 32 − log₂ N.
    * The log is taken EXACTLY as `length(bin(df))` — a string length,
    * not a float log — so the DuckDB oracle is bit-identical (float
    * `log2` differs between libm implementations at power-of-two
    * boundaries). Per doc: occurrence count, total surprisal, and the
    * `floor(1e4·mean)` scaled mean.
    *
    * Scale shape: the corpus explodes once; df derives from the tf
    * aggregate's rows (same trick as [[tfIdfTopTerms]]); everything
    * else is doc-keyed aggregation. */
  def surprisal(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = termOccurrences(docs, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("n"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("w", (lit(32) - length(bin(col("df")))).cast("long"))
    val agg = scored.groupBy(col(idCol)).agg(
      sum(col("n")).as("n_terms"),
      sum(col("n") * col("w")).as("total_surprisal"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("total_surprisal"), lit(0L)).as("total_surprisal"),
        when(coalesce(col("n_terms"), lit(0L)) === 0, lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) * col("total_surprisal").cast("double") /
            col("n_terms")).cast("long")).as("mean_surprisal_scaled"))
  }

  /** Feature-hashed linear scoring — the fastText-style quality-
    * classifier SHAPE with a deterministic stand-in weight vector:
    * terms hash into `dim` buckets (md5, so the oracle agrees), each
    * bucket carries a fixed pseudo-weight in [−128, 127] derived from
    * md5 of the bucket id, and the document score is the sparse dot
    * product Σ count(bucket)·w(bucket). Swapping the stand-in for
    * trained weights is a broadcast-joined (bucket → weight) table —
    * the plumbing (hash, group, dot) is exactly what a real classifier
    * inference pass runs at corpus scale.
    *
    * `dim` must divide 256 (buckets come from the md5 byte). */
  def hashedFeatureScore(docs: DataFrame, dim: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0 && 256 % dim == 0, "dim must divide 256")
    val bucket = Curation.hashBucket(col("term")) % dim
    val weight = (Curation.hashBucket(concat(lit("w:"),
      col("bucket").cast("string"))) - 128).cast("long")
    val feats = termOccurrences(docs, idCol, textCol)
      .withColumn("bucket", bucket.cast("long"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("w", weight)
    val agg = feats.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_features"),
      sum(col("n")).as("n_terms"),
      sum(col("n") * col("w")).as("score"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Gopher-style document-quality rule suite (the public Rae et al.
    * 2021 heuristics): word count, mean word length, fraction of words
    * containing an alphabetic character, distinct stopword hits,
    * symbol-to-word ratio ('#' and '...'), plus the combined pass/fail
    * gate (50 ≤ words ≤ 100k, 3 ≤ mean len ≤ 10, ≥80% alpha words,
    * ≥2 distinct stopwords, ≤10% symbols). Ratios are
    * `floor(1e4 · ratio)` scaled integers computed through DOUBLE on
    * both engines, so the DuckDB oracle is bit-exact.
    *
    * Scale shape: pure column expressions over one scan — no shuffle,
    * no UDF; the rule gate runs at scan speed over a 100 TB corpus. */
  def gopherQuality(df: DataFrame, textCol: String = "text",
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val t = tokens(col(textCol))
    val nWords = size(t).cast("long")
    val wordChars = length(regexp_replace(col(textCol), "\\s+", "")).cast("long")
    val alphaWords = size(filter(t, x => x.rlike("[A-Za-z]"))).cast("long")
    val stopDistinct =
      size(array_intersect(transform(t, x => lower(x)), typedLit(stopwordsEn)))
        .cast("long")
    val symbols = regexp_count(col(textCol), lit("#|\\.\\.\\.")).cast("long")
    def scaled(num: Column) = when(nWords === 0, lit(null).cast("long"))
      .otherwise(floor(lit(10000.0) * num.cast("double") / nWords).cast("long"))
    val meanLen = scaled(wordChars)
    val alphaFrac = scaled(alphaWords)
    val symbolRatio = scaled(symbols)
    df.withColumn("n_words", nWords)
      .withColumn("mean_word_len_scaled", meanLen)
      .withColumn("alpha_word_frac_scaled", alphaFrac)
      .withColumn("distinct_stopwords", stopDistinct)
      .withColumn("symbol_ratio_scaled", symbolRatio)
      .withColumn("gopher_pass", coalesce(
        nWords.between(minWords, maxWords) &&
          meanLen.between(30000L, 100000L) &&
          alphaFrac >= 8000L && stopDistinct >= 2L &&
          symbolRatio <= 1000L, lit(false)))
  }

  /** RE2-compatible PII patterns (no lookaround — Java regex and the
    * oracle's RE2 agree on these constructs). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+[0-9]{7,15}"

  /** PII scrub: per document, match counts per pattern and the md5 of
    * the redacted text (emails → [EMAIL], phone numbers → [PHONE]).
    * Pure column expressions — scrubbing runs at scan speed and the
    * oracle verifies the exact redacted bytes via the digest. */
  def piiScrub(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      regexp_count(col(textCol), lit(emailPattern)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(phonePattern)).cast("long").as("n_phones"),
      md5(regexp_replace(
        regexp_replace(col(textCol), emailPattern, "[EMAIL]"),
        phonePattern, "[PHONE]")).as("redacted_md5"))

  /** BPE merge learning — the training loop itself, not just the pair
    * counting (v4): `rounds` iterations of count-adjacent-pairs →
    * argmax → apply-merge over the WORD VOCABULARY. The scale story is
    * the standard one (Sennrich et al. 2016 trains on the frequency
    * table): ONE corpus pass builds (word, count); every round after
    * that runs over the vocab table — millions of rows at 100 TB, not
    * the corpus — with a 1-row argmax collect per round (control
    * plane, like the k-means centroid update).
    *
    * Symbol sequences are kept in a DUAL-SPACED string encoding
    * (`"ab"` → `" a  b "`, every symbol flanked by its own spaces) so
    * the merge step is a plain left-to-right non-overlapping string
    * replace of `" a  b "` with `" ab "` — the same greedy semantics,
    * byte for byte, in any engine with literal replace(); no
    * fold-with-state HOF needed, and cross-symbol false matches are
    * impossible because every occurrence carries its own flanking
    * spaces. Ties break (count desc, left, right) — deterministic.
    *
    * Returns one row per learned merge: (round, left, right,
    * pair_count). */
  def learnBpeMerges(docs: DataFrame, rounds: Int,
      textCol: String = "text"): DataFrame = {
    require(rounds >= 1)
    val spark = docs.sparkSession
    val vocab = docs
      .select(explode(normalizedTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(regexp_replace(col("word"), "(.)", " $1 ").as("s"), col("n"))
    // Iterative persist-and-release (the MLlib loop idiom): round r's
    // pair-count action materializes the current vocab from the
    // previous round's cached blocks, after which the previous round is
    // unpersisted — at most TWO vocab-sized block sets live at any
    // point, zero extra materialization jobs, and everything is
    // released before return. (r6 used eager localCheckpoints here,
    // which are not releasable via unpersist and pinned one block set
    // per round for the life of the JVM — measurable memory pressure
    // across a long bench suite.)
    import org.apache.spark.storage.StorageLevel
    var cur = vocab.persist(StorageLevel.MEMORY_AND_DISK)
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to rounds) {
      val syms = split(trim(col("s")), "  ")
      val nSyms = size(syms)
      val pairRows = cur
        .filter(nSyms >= 2)
        .select(col("n"), explode(zip_with(
          slice(syms, lit(1), nSyms - 1), slice(syms, lit(2), nSyms - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      // cur is materialized now — its parent's blocks are no longer needed
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (pairRows.nonEmpty) {
        val (a, b, cnt) =
          (pairRows(0).getString(0), pairRows(0).getString(1), pairRows(0).getLong(2))
        merges += ((r, a, b, cnt))
        val next = cur.select(
          replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")).as("s"), col("n"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev = cur
        cur = next
      }
    }
    cur.unpersist(blocking = false)
    if (prev != null) prev.unpersist(blocking = false)
    import spark.implicits._
    merges.toSeq.toDF("round", "left", "right", "pair_count")
      .select(col("round").cast("long").as("round"), col("left"),
        col("right"), col("pair_count"))
  }

  /** Apply learned BPE merges (the ENCODE step closing the
    * [[learnBpeMerges]] loop): each word re-encoded through the merge
    * list in training order — the same dual-spaced literal-replace
    * semantics as training, so train and encode can never disagree on
    * greedy overlap — and the per-document piece count summed. This is
    * tokenizer-budget accounting with a TRAINED tokenizer instead of
    * the whitespace/regex proxies (t1); pure column expressions over
    * the token array, scan-speed, merges inlined as literals (a real
    * vocabulary ships as a broadcast list the same way). */
  def applyBpeMerges(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def encode(w: Column): Column =
      merges.foldLeft(regexp_replace(w, "(.)", " $1 ")) {
        case (s, (a, b)) => replace(s, lit(s" $a  $b "), lit(s" $a$b "))
      }
    val pieces = (w: Column) => size(split(trim(encode(w)), "  ")).cast("long")
    val toks = normalizedTokens(col(textCol))
    docs.select(col(idCol),
      size(toks).cast("long").as("n_words"),
      aggregate(transform(toks, pieces), lit(0L), (acc, x) => acc + x)
        .as("n_pieces"))
  }

  /** Skip-gram co-occurrence counts — the counting step of
    * word-embedding training (word2vec/GloVe family): for every
    * ordered position pair within `window` tokens, one (center,
    * context, offset-distance) observation, aggregated corpus-wide
    * with the top `k` pairs kept.
    *
    * Scale shape: tokens posexplode once, then ONE equi-join per the
    * bounded offset fan-out — `(doc, pos)` joins `(doc, pos + Δ)` for
    * Δ ∈ [1, window], so the work is `window × corpus-tokens`, LINEAR
    * in the corpus (a per-doc self-join with an |Δpos| ≤ w residual
    * filter would be quadratic in document length). Pairs are emitted
    * in both orders by symmetry at aggregation time (count doubles,
    * not the join). Top-k via TakeOrdered — no global sort. */
  def coOccurrence(docs: DataFrame, window: Int, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && k >= 1)
    symSkipgramCounts(docs, window, idCol, textCol)
      .orderBy(col("n").desc, col("term"), col("ctx"))
      .limit(k)
  }

  /** Symmetric skip-gram counts: n(term, ctx) over every ordered
    * co-occurrence within `window` tokens, both directions. Shared by
    * [[coOccurrence]] (raw counts) and [[pmiTopPairs]] (association
    * scores).
    *
    * The corpus-sized aggregate runs over the ORDERED stream only
    * (window × corpus-tokens rows); symmetry is applied afterwards by
    * unioning the count table with its swap and re-aggregating — that
    * second pass is vocabulary²-bounded, so the symmetric doubling
    * never touches corpus-sized data (n_sym(a,b) = n_ord(a,b) +
    * n_ord(b,a), and the a=b diagonal correctly doubles). */
  private def symSkipgramCounts(docs: DataFrame, window: Int,
      idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .repartition(col(idCol))
      .select(col(idCol),
        posexplode(normalizedTokens(col(textCol))).as(Seq("pos", "term")))
    val right = toks.select(col(idCol),
      explode(sequence(lit(1), lit(window))).as("__d"),
      (col("pos") - col("__d")).as("pos"), col("term").as("ctx"))
    val ordCnt = toks.join(right, Seq(idCol, "pos"))
      .groupBy("term", "ctx")
      .agg(count(lit(1)).as("__n_ord"))
    ordCnt.unionAll(
        ordCnt.select(col("ctx").as("term"), col("term").as("ctx"),
          col("__n_ord")))
      .groupBy("term", "ctx")
      .agg(sum(col("__n_ord")).as("n"))
  }

  /** Pointwise mutual information over skip-gram co-occurrence — the
    * association score behind collocation mining and PMI-based phrase
    * detection (word2vec's SGNS objective is shifted PMI): for pairs
    * seen at least `minCount` times,
    * `pmi = ln(n_ab · T / (n_a · n_b))` with T the total observation
    * count and `n_a` the symmetric marginal, top `k` by (pmi, term,
    * ctx). Rounded to 4 decimals for cross-engine hash stability.
    *
    * Scale shape: the observation stream aggregates ONCE on (term,
    * ctx) (map-side combined — the linear bounded-offset join of
    * [[coOccurrence]]); marginals are a vocabulary-sized rollup of
    * that aggregate, re-joined on the term key (vocabulary-
    * proportional, never corpus-proportional); T is one scalar
    * broadcast. The `n_a · n_b` product is computed in DOUBLE so
    * web-corpus marginals (10¹⁰ tokens ⇒ ~10¹⁸ products) cannot
    * overflow int64. Top-k via TakeOrdered. */
  def pmiTopPairs(docs: DataFrame, window: Int, minCount: Long, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && k >= 1 && minCount >= 1)
    val counts = symSkipgramCounts(docs, window, idCol, textCol)
      .withColumnRenamed("n", "n_ab")
    val marg = counts.groupBy("term").agg(sum(col("n_ab")).as("n_a"))
    val total = counts.agg(sum(col("n_ab")).as("__t"))
    counts.filter(col("n_ab") >= minCount)
      .join(marg, "term")
      .join(marg.select(col("term").as("ctx"), col("n_a").as("n_b")), "ctx")
      .crossJoin(broadcast(total))
      .select(col("term"), col("ctx"), col("n_ab"),
        round(log(col("n_ab").cast("double") * col("__t") /
          (col("n_a").cast("double") * col("n_b"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("term"), col("ctx"))
      .limit(k)
  }

  /** Character-distribution statistics per document over the
    * NORMALIZED text (lowercase a–z0–9 + space — single-byte UTF-8,
    * so the codegen'd [[graft.functions.ByteHistogram]] over the
    * UTF-8 bytes IS the character histogram): Shannon entropy,
    * distinct-character count, and the modal character's share.
    * Low entropy or a high mode share flags repeated-character
    * gibberish and template spam that token-level quality gates miss;
    * natural-language text sits near the top of the ~log₂(37) range.
    *
    * Scale shape: one fused codegen loop per row (the histogram
    * expression) plus a 256-element array fold — pure scan-level
    * column math, zero shuffles, no UDFs. The entropy fold runs in
    * ascending byte order (filter preserves array order), so the
    * float sum is deterministic and oracle-reproducible. */
  def charStats(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hist = graft.functions.ByteHistogram(
      encode(normalized(col(textCol)), "UTF-8"))
    val n = col("n_chars_norm")
    val nd = n.cast("double")
    val p = (c: Column) => c.cast("double") / nd
    docs.select(col(idCol),
        length(normalized(col(textCol))).cast("long").as("n_chars_norm"),
        hist.as("__hist"))
      .select(col(idCol), n,
        size(filter(col("__hist"), c => c > 0)).cast("long")
          .as("n_distinct_chars"),
        when(n === 0, lit(null))
          .otherwise(round(p(array_max(col("__hist"))), 4)).as("mode_ratio"),
        when(n === 0, lit(null))
          .otherwise(round(aggregate(filter(col("__hist"), c => c > 0),
            lit(0.0), (acc, c) => acc - p(c) * log(p(c))), 4))
          .as("char_entropy"))
  }

  /** Bigram language-model surprisal — the CCNet-style perplexity
    * filter re-expressed relationally: train add-one-smoothed bigram
    * probabilities on the corpus itself, score every document by its
    * mean bigram negative log-likelihood (high = unlike the corpus =
    * gibberish or off-distribution; low = fluent/templated). p(b|a) =
    * (c(a,b) + 1) / (c(a) + V) with c(a) the corpus unigram count and
    * V the distinct-term vocabulary size.
    *
    * Engine-exact: each bigram's NLL is quantized to an int64
    * (⌊−ln(p)·10⁶⌋), so per-document sums are exact integer math —
    * order-independent — and the mean is integer DIV. A true KenLM
    * drops in by replacing the counts join with a scored lookup table
    * of the same (bigram → nll) shape.
    *
    * Scale shape: bigrams come from a zero-join array zip on the scan
    * (adjacent-pair slices, no posexplode self-join); the model is ONE
    * map-side-combined count per table (bigram, unigram) plus two
    * scalars; scoring is two term-keyed equi-joins (model-sized build
    * sides) and one per-doc aggregate. Everything is linear in corpus
    * tokens. */
  def bigramSurprisal(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = normalizedTokens(col(textCol))
    val n = size(toks)
    // adjacent pairs via two shifted slices — scan-level, no join
    val pairs = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val docBigrams = docs.repartition(col(idCol))
      .select(col(idCol), explode(pairs).as("bigram"))
      .withColumn("ctx", split(col("bigram"), " ").getItem(0))
    val unigrams = docs.repartition(col(idCol))
      .select(explode(toks).as("term"))
    val uniCnt = unigrams.groupBy("term").agg(count(lit(1)).as("c_ctx"))
    val vocabSize = unigrams.select(countDistinct(col("term")).as("v"))
    val biCnt = docBigrams.groupBy("bigram").agg(count(lit(1)).as("c_bi"))
    val nll = floor(-log((col("c_bi") + 1).cast("double") /
      (col("c_ctx") + col("v"))) * 1000000).cast("long")
    val scored = docBigrams
      .join(biCnt, "bigram")
      .join(uniCnt.withColumnRenamed("term", "ctx"), "ctx")
      .crossJoin(broadcast(vocabSize))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(nll).as("sum_nll_e6"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("sum_nll_e6"),
        expr("sum_nll_e6 DIV n_bigrams").as("mean_nll_e6"))
  }

  /** Zipf rank-frequency slope — the corpus-health audit run after
    * curation: natural language follows freq ∝ rank^s with s ≈ −1;
    * a slope far from −1 flags template spam (too flat) or a
    * collapsed vocabulary (too steep). Least-squares slope of
    * ln(freq) on ln(rank) over the top `topN` terms.
    *
    * Engine-exact by construction: the log coordinates are quantized
    * to integers (⌊ln(v)·10⁶⌋ as int64) so every regression sum is
    * exact integer arithmetic — order-independent, no float-
    * accumulation drift — and only the final slope division is FP
    * (identical int64 inputs ⇒ identical double), rounded to 4. With
    * topN ≤ ~500 the n·Σxy products stay inside int64 even at
    * web-corpus term frequencies (ln(10¹²)·10⁶ ≈ 2.8·10⁷ per term).
    *
    * Scale shape: one map-side-combined vocab aggregate, a TakeOrdered
    * top-N (no global sort), then the ranking window and regression
    * sums run over topN ROWS — constant-bounded, corpus-independent. */
  def zipfSlope(docs: DataFrame, topN: Int = 200,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(topN >= 2 && topN <= 1000)
    import org.apache.spark.sql.expressions.Window
    val vocab = termOccurrences(docs, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("tf"))
    val top = vocab.orderBy(col("tf").desc, col("term")).limit(topN)
    // global window over ≤ topN rows — bounded, not a corpus sort
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("tf").desc, col("term"))).cast("long"))
    val pts = ranked.select(
      floor(log(col("rank").cast("double")) * 1000000).cast("long").as("x"),
      floor(log(col("tf").cast("double")) * 1000000).cast("long").as("y"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_terms"),
        when(den === 0, lit(null)).otherwise(
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / den, 4)).as("zipf_slope"))
  }

  /** Data-driven length gate: the cutoff is the corpus's own `p`
    * quantile of normalized token counts, not a hand-picked constant —
    * a fixed "drop under 50 tokens" rule tuned on one corpus silently
    * over- or under-cuts the next. Exact interpolated quantile
    * (integer-valued counts ⇒ exact binary-fraction interpolants,
    * cross-engine stable — the a12 idiom), computed as ONE scalar
    * aggregate and broadcast back onto the scan: no driver collect,
    * two passes over doc metadata. */
  def adaptiveLengthGate(docs: DataFrame, p: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    val counts = docs.select(col(idCol),
      size(normalizedTokens(col(textCol))).cast("long").as("n_tokens"))
    val cut = counts.agg(
      round(expr(s"percentile(n_tokens, $p)"), 6).as("cutoff"))
    counts.crossJoin(broadcast(cut))
      .select(col(idCol), col("n_tokens"), col("cutoff"),
        (col("n_tokens") >= col("cutoff")).as("passes"))
  }

  /** Vocabulary coverage curve: for each token budget k, the fraction
    * of corpus token OCCURRENCES covered by the top-k terms — the
    * sizing curve a tokenizer/vocab decision reads (diminishing
    * returns past the knee). Exact integer counts; only the final
    * coverage ratio is FP (identical int64 inputs at both engines).
    *
    * Scale shape: one map-side-combined vocab aggregate, a TakeOrdered
    * top-max(budgets) (no global sort of the vocabulary), then the
    * cumulative sum and budget join run over ≤ max(budgets) rows —
    * constant-bounded, corpus-independent (the v9 idiom). */
  def vocabCoverage(docs: DataFrame,
      budgets: Seq[Int] = Seq(16, 64, 256, 1024, 4096),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(b => b > 0 && b <= 65536))
    val vocab = termOccurrences(docs, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("tf"))
    val tot = vocab.agg(sum(col("tf")).as("__total"))
    val top = vocab.orderBy(col("tf").desc, col("term")).limit(budgets.max)
    val ord = Window.orderBy(col("tf").desc, col("term"))
    val ranked = top
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum",
        sum(col("tf")).over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val b = docs.sparkSession.createDataFrame(
      budgets.map(Tuple1(_))).toDF("budget")
    ranked.join(broadcast(b), col("rank") <= col("budget"))
      .groupBy(col("budget"))
      .agg(count(lit(1)).as("n_terms"), max(col("cum")).as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("budget").cast("long").as("budget"), col("n_terms"),
        col("covered"), col("__total").as("total"),
        round(col("covered").cast("double") / col("__total"), 6).as("coverage"))
  }

  /** Per-source distribution drift: KL(source ‖ corpus) over the
    * corpus's top-`topN` terms — the corpus-health audit that catches
    * a source whose vocabulary has drifted from the mix (template
    * spam, wrong language, scraper breakage) before it trains. Source
    * term probabilities are add-one smoothed over the top-N support
    * (so a source missing a common term still scores finitely);
    * corpus probabilities are raw.
    *
    * Engine-exact: per-term contributions are quantized to int64
    * (⌊p·ln(p/q)·10⁹⌋) so per-source sums are order-free exact; the
    * doubles feeding ln come from identical division sequences at
    * both engines.
    *
    * Scale shape: one map-side-combined term aggregate, a TakeOrdered
    * top-N (no global sort), then every frame is bounded by
    * |sources|·topN — the grid, the per-source sums, and the final
    * rollup are all broadcast-sized. The corpus-sized term stream is
    * touched twice (top-N build, per-source counts), both linear. */
  def sourceDivergence(docs: DataFrame, topN: Int = 200,
      idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    require(topN >= 2 && topN <= 1000)
    val occ = docs.repartition(col(idCol))
      .select(col(srcCol), explode(split(normalized(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val top = occ.groupBy("term").agg(count(lit(1)).as("c_ct"))
      .orderBy(col("c_ct").desc, col("term")).limit(topN)
    val nc = top.agg(sum(col("c_ct")).as("__nc"), count(lit(1)).as("__v"))
    val stc = occ.join(broadcast(top.select("term")), Seq("term"), "left_semi")
      .groupBy(col(srcCol), col("term")).agg(count(lit(1)).as("c_st0"))
    val grid = docs.select(col(srcCol)).distinct().crossJoin(broadcast(top))
    val cells = grid.join(stc, Seq(srcCol, "term"), "left")
      .withColumn("c_st", coalesce(col("c_st0"), lit(0L)))
    val ns = cells.groupBy(col(srcCol)).agg(sum(col("c_st")).as("__ns"))
    val pS = (col("c_st") + 1).cast("double") / (col("__ns") + col("__v"))
    val pC = col("c_ct").cast("double") / col("__nc")
    cells.join(ns, srcCol).crossJoin(broadcast(nc))
      .withColumn("kl_term_e9",
        floor(pS * log(pS / pC) * 1000000000L).cast("long"))
      .groupBy(col(srcCol))
      .agg(max(col("__ns")).as("n_obs"),
        sum(when(col("c_st") > 0, 1L).otherwise(0L)).as("n_present"),
        sum(col("kl_term_e9")).as("kl_e9"))
  }
}
