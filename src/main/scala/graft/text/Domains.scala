package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-keyed curation — the provenance axis of web-corpus pipelines
  * (C4/RefinedWeb-style): extract the registrable domain from a URL
  * column, roll quality/dup signals up per domain, cap any one
  * domain's share of the training mix, and dedup content within a
  * domain. Everything is pure column expressions (codegen'd, oracle-
  * expressible) over whatever URL column the dataset carries.
  *
  * Scale shape: extraction is scan-level; the rollup/cap/dedup are one
  * map-side-combined shuffle each on the domain (or domain+content)
  * key. Domains are Zipfian at corpus scale — the cap/dedup shapes
  * stay windowed-by-rank (WindowGroupLimit prunes to the cap before
  * the sort buffers grow) rather than collecting any domain's full
  * document list.
  */
object Domains {
  /** Minimal built-in fallback when the bundled PSL snapshot resource
    * is missing from the classpath (repackaged deployments). */
  val BuiltinTwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "co.jp", "co.kr", "co.in", "co.nz",
    "com.au", "com.br", "com.cn", "com.mx", "com.tr", "com.ar", "com.sg")

  /** Two-level public suffixes the last-two-label heuristic would
    * split wrong (registrable = one label MORE than the suffix).
    * Data-file-driven: loaded once from the bundled snapshot of the
    * Public Suffix List (publicsuffix.org, public data) at
    * `graft/psl_two_level.txt` — one lowercase suffix per line, `#`
    * comments — so a deployment regenerates the file from a current
    * PSL download instead of patching code. Falls back to
    * [[BuiltinTwoLevelSuffixes]] when the resource is absent.
    * ~500 entries compile to one `InSet` per registrable-domain call
    * (hash lookup, still scan-level); three-label and wildcard PSL
    * rules remain out of scope of the two-level heuristic. */
  val TwoLevelSuffixes: Seq[String] =
    Option(getClass.getResourceAsStream("/graft/psl_two_level.txt")).map { in =>
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
      finally in.close()
    }.filter(_.nonEmpty).getOrElse(BuiltinTwoLevelSuffixes)

  /** Lowercased host of a URL: scheme (if any) and userinfo stripped,
    * then everything up to the first `/`, `:`, `?` or `#`. Tolerates
    * scheme-less and mixed-case URLs — crawl metadata is messy. */
  def host(url: Column): Column =
    // trailing dots stripped (the DNS-absolute form 'example.com.'):
    // without this the last-label slice degenerates to a pseudo-domain
    // ('com.' / 'net.') that collapses EVERY absolute-form host of any
    // site into one key — caps mis-apply and a blocklist entry for the
    // real domain never matches. canonicalizeUrl already strips them;
    // the domain path must agree.
    rtrim(regexp_extract(lower(trim(url)),
      "^(?:[a-z][a-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/:?#]+)", 1), ".")

  /** Registrable domain of a host: last two labels, or last three when
    * the two-label tail is a known two-level suffix (`example.co.uk`,
    * not `co.uk`). */
  def registrableDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, greatest(n - 1, lit(1)), lit(2)))
    val last3 = concat_ws(".", slice(labels, greatest(n - 2, lit(1)), lit(3)))
    // an IPv4 literal has no registrable suffix: the WHOLE address is
    // the key (last-2-labels would alias every host on 10.20.*.* that
    // shares its final octets — '4.30' — across unrelated networks).
    // IP test = digits/dots only + exactly 4 non-empty labels: cheap
    // string ops, no per-row regex (rlike measured ~2x on the domain
    // queries); nonstandard all-digit labels (>3 digits) also match —
    // they are not valid hostnames either, and whole-host is the safer
    // key for them too. Mirrored verbatim in the oracle CTE and the
    // property-spec reference.
    val isIp4 = n === 4 && hostCol =!= "" &&
      translate(hostCol, "0123456789.", "") === "" &&
      !hostCol.contains("..") && !hostCol.startsWith(".")
    when(isIp4, hostCol)
      .when(n >= 3 && last2.isin(TwoLevelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** `registrableDomain(host(url))` — the one-call form. */
  def domainOf(url: Column): Column = registrableDomain(host(url))

  /** Query parameters dropped by [[canonicalizeUrl]]: click/campaign
    * trackers that vary per crawl visit without changing the resource
    * (the single largest source of spurious URL "uniqueness" in web
    * crawls). Matched as `name=` prefixes; `utm_` matches the whole
    * Google Analytics family.
    *
    * Deliberately NOT in the default list: `ref=` — on many sites it
    * is a FUNCTIONAL parameter (git hosting uses `?ref=branch` to
    * select a different resource), so dropping it would silently
    * collapse genuinely distinct documents. A deployment that knows
    * its corpus carries only referral-tracking `ref=` can pass an
    * extended list to [[canonicalizeUrl]]. */
  val TrackingParamPrefixes: Seq[String] =
    Seq("utm_", "fbclid=", "gclid=", "msclkid=", "mc_cid=", "mc_eid=")

  /** Canonical form of a crawl URL — the key for URL-level dedup (the
    * step web-corpus pipelines run BEFORE fetching/content dedup,
    * since it needs no document bytes at all):
    *
    *  - scheme lowercased; missing scheme defaults to `http`
    *  - userinfo stripped; host lowercased; leading `www.` and
    *    trailing dots removed
    *  - default ports dropped (`:80` http, `:443` https); other ports
    *    kept, numerically normalized (`:0080` -> `:80`)
    *  - path: duplicate slashes collapsed, trailing slashes stripped
    *  - fragment dropped; tracking params (`trackingPrefixes`,
    *    default [[TrackingParamPrefixes]] — tunable per corpus, see
    *    the `ref=` note there) and empty params dropped; the
    *    surviving params byte-sorted
    *
    * Everything is regexp/array column expressions (codegen'd,
    * scan-level — the shape that runs over a trillion-URL frontier as
    * a projection, no shuffle). The same steps are SQL-expressible,
    * so the n7 oracle reproduces the string bit-for-bit. */
  def canonicalizeUrl(url: Column,
      trackingPrefixes: Seq[String] = TrackingParamPrefixes): Column = {
    val u = trim(url)
    val rawScheme = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val scheme = when(rawScheme === "", lit("http")).otherwise(rawScheme)
    // authority+rest with scheme and userinfo stripped
    // userinfo = everything before the LAST '@' in the authority
    // (greedy, not crossing /?#): a double-@ authority must strip in
    // ONE pass or canonicalization loses idempotence (property-spec'd)
    val rest = regexp_replace(
      regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://", ""),
      "^[^/?#]*@", "")
    val hostport = regexp_extract(rest, "^([^/?#]*)", 1)
    val hostNorm = regexp_replace(regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]*$", "")),
      "\\.+$", ""), "^(www\\.)+", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portNum = port.cast("long")
    val portSfx = when(port === "", lit(""))
      .when(scheme === "http" && portNum === 80L, lit(""))
      .when(scheme === "https" && portNum === 443L, lit(""))
      .otherwise(concat(lit(":"), portNum.cast("string")))
    // path + query, fragment dropped
    val tail = regexp_replace(regexp_replace(rest, "^[^/?#]*", ""), "#.*$", "")
    val path = regexp_replace(
      regexp_replace(regexp_extract(tail, "^([^?]*)", 1), "//+", "/"),
      "/+$", "")
    val query = regexp_extract(tail, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !trackingPrefixes
        .map(pre => p.startsWith(pre)).reduce(_ || _)))
    val qSfx = when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    concat(scheme, lit("://"), hostNorm, portSfx, path, qSfx)
  }

  /** Per-domain corpus profile: document count, distinct-content count
    * (by normalized-text fingerprint), duplicate count, and total
    * token volume — the table a curation pass reads before deciding
    * per-domain caps and dedup pressure. One map-side-combined
    * aggregation on the domain key. */
  def domainRollup(docs: DataFrame, urlCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val n = TextAnalysis.normalized(col(textCol))
    val toks = when(n === "", lit(0L))
      .otherwise(size(split(n, " ")).cast("long"))
    docs
      .select(domainOf(col(urlCol)).as("domain"),
        md5(n).as("__fp"), toks.as("__t"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__fp")).as("n_unique_texts"),
        (count(lit(1)) - countDistinct(col("__fp"))).as("n_dup_docs"),
        sum(col("__t")).as("n_tokens"))
  }

  /** Cap any single domain at `cap` documents, deterministically:
    * survivors are the first `cap` by (md5(id), id) — a content-hash
    * order, so membership is stable across runs and partitionings,
    * like every sampler in [[Curation]]. The rank ≤ cap predicate
    * compiles to WindowGroupLimit: each partition keeps a cap-sized
    * heap, never sorting a hot domain's full row set. */
  def capPerDomain(docs: DataFrame, urlCol: String, cap: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy("__domain")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("__domain", domainOf(col(urlCol)))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= cap)
      .drop("__r")
      .withColumnRenamed("__domain", "domain")
  }

  /** Domain blocklist filter — the UT1-style curation gate: drop every
    * document whose registrable domain appears in `blocked` (a one-
    * column frame; real blocklists run to millions of rows, so it is a
    * DataFrame, not a literal). One LEFT ANTI equi-join on the domain:
    * the blocklist side is tiny relative to the corpus and broadcasts,
    * so the gate is scan-speed at any corpus size. */
  def blockByDomain(docs: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame = {
    val b = broadcast(blocked.toDF("__blocked").select(
      lower(trim(col("__blocked"))).as("__blocked")).distinct())
    docs.withColumn("domain", domainOf(col(urlCol)))
      .join(b, col("domain") === col("__blocked"), "left_anti")
  }

  /** Domain quality prior joined back per document: the corpus-level
    * signal (a domain full of near-identical or very short documents
    * is low-trust, whatever any single document looks like) that
    * document-local scoring cannot see. Integer outputs —
    * `domain_mean_tokens_scaled` = ⌊1000·Σtokens/n⌋ and
    * `domain_dup_permille` = ⌊1000·dups/n⌋ — keep both engines
    * bit-identical; `low_prior` flags domains under `minMeanScaled`
    * mean tokens or over `maxDupPermille` duplicate share.
    *
    * Scale shape: one rollup aggregation (#domains rows — Zipfian but
    * bounded), broadcast back onto the corpus scan. */
  def domainPrior(docs: DataFrame, urlCol: String,
      minMeanScaled: Long, maxDupPermille: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val roll = domainRollup(docs, urlCol, idCol, textCol)
      .select(col("domain"),
        floor(lit(1000L) * col("n_tokens") / col("n_docs"))
          .cast("long").as("domain_mean_tokens_scaled"),
        floor(lit(1000L) * col("n_dup_docs") / col("n_docs"))
          .cast("long").as("domain_dup_permille"))
    docs.withColumn("domain", domainOf(col(urlCol)))
      .join(broadcast(roll), "domain")
      .select(col(idCol), col("domain"),
        col("domain_mean_tokens_scaled"), col("domain_dup_permille"),
        (col("domain_mean_tokens_scaled") < minMeanScaled ||
          col("domain_dup_permille") > maxDupPermille).as("low_prior"))
  }

  /** Domain-scoped exact dedup: one survivor (min id) per (domain,
    * normalized-content fingerprint). Unlike global exact dedup (d1),
    * the SAME content on two domains survives twice — the policy when
    * provenance matters (licensing, per-domain mixing weights). Output
    * is one row per kept group: survivor id, domain, copy count. */
  def dedupPerDomain(docs: DataFrame, urlCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(domainOf(col(urlCol)).as("domain"),
        md5(TextAnalysis.normalized(col(textCol))).as("__fp"),
        col(idCol))
      .groupBy("domain", "__fp")
      .agg(min(col(idCol)).as(s"kept_$idCol"),
        count(lit(1)).as("n_copies"))
      .drop("__fp")
      .select(col(s"kept_$idCol"), col("domain"), col("n_copies"))
}
