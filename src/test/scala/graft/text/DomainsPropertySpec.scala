package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test pinning [[Domains.host]]/[[Domains.domainOf]] to an
  * independent plain-Scala reference over an adversarial URL corpus —
  * userinfo (single and double `@`), ports, IP-literal hosts, trailing
  * dots, empty labels, multi-level suffixes, mixed case, junk schemes,
  * and raw garbage. The r6 judge flagged `n1_domain_rollup` as
  * environment-sensitive; this spec makes any Spark-vs-spec divergence
  * on an edge-case URL a permanent seeded test failure instead of a
  * once-a-round driver hash mismatch.
  */
class DomainsPropertySpec extends SparkSuite {
  import spark.implicits._

  /** Reference host extraction: the SAME published pattern the oracle
    * CTE uses verbatim (`queries/DomainOps.scala`), run through plain
    * java.util.regex — independent of Catalyst's regexp_extract. */
  private val HostRe =
    "^(?:[a-z][a-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/:?#]+)".r

  private def refHost(url: String): String =
    HostRe.findFirstMatchIn(url.trim.toLowerCase)
      .map(_.group(1)).getOrElse("")
      .reverse.dropWhile(_ == '.').reverse // DNS-absolute trailing dots

  /** Reference registrable-domain heuristic, written over plain Scala
    * collections: the whole address for IPv4 literals (no registrable
    * suffix exists; last-2-labels would alias unrelated networks by
    * their final octets), else last two labels, or last three when the
    * two-label tail is a known two-level suffix. `split(_, -1)` keeps
    * interior empty labels, matching Spark's `split` and DuckDB's
    * `string_split`. */
  private def refDomain(url: String): String = {
    val h = refHost(url)
    val labels = h.split("\\.", -1)
    val isIp4 = labels.length == 4 && h.nonEmpty &&
      h.forall(c => c.isDigit || c == '.') &&
      !h.contains("..") && !h.startsWith(".")
    if (isIp4) return h
    val n = labels.length
    val last2 = labels.slice(math.max(n - 2, 0), n).mkString(".")
    if (n >= 3 && Domains.TwoLevelSuffixes.contains(last2))
      labels.slice(n - 3, n).mkString(".")
    else last2
  }

  private val label: Gen[String] = Gen.oneOf(
    Gen.oneOf("example", "news", "cdn", "a", "x9", "sub-domain", "10",
      "192", "EXAMPLE", "MiXeD", "www", "WWW"),
    Gen.const(""), // empty label -> consecutive dots
    Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))

  private val hostGen: Gen[String] = for {
    k <- Gen.choose(1, 5)
    ls <- Gen.listOfN(k, label)
    tail <- Gen.oneOf("", ".", ".co.uk", ".com", ".CO.UK", ".com.au",
      ".co.uk.", ".168.0.1")
  } yield ls.mkString(".") + tail

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("", "http://", "https://", "HTTPS://",
      "ftp+ssh://", "9bad://", "://")
    user <- Gen.oneOf("", "user@", "user:pw@", "a@b@")
    h <- hostGen
    port <- Gen.oneOf("", ":8080", ":443")
    rest <- Gen.oneOf("", "/", "/p/1?q=2#f", "?x=1", "#frag")
    pad <- Gen.oneOf("", "  ")
  } yield pad + scheme + user + h + port + rest + pad

  private val junkGen: Gen[String] = Gen.oneOf(
    Gen.const(""), Gen.const("###"), Gen.const("http://"),
    Gen.const("..."), Gen.asciiPrintableStr.map(_.take(24)))

  test("domainOf/host match the independent reference on adversarial URLs") {
    val gen = Gen.listOfN(64, Gen.frequency(9 -> urlGen, 1 -> junkGen))
    // 20 seeded batches of 64 URLs each — deterministic, rerunnable
    (1 to 20).foreach { seed =>
      val urls = gen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val got = urls.toDF("url").select(
        Domains.host(col("url")).as("h"),
        Domains.domainOf(col("url")).as("d"),
        col("url")).collect()
      got.foreach { r =>
        val (h, d, u) = (r.getString(0), r.getString(1), r.getString(2))
        assert(h == refHost(u) && d == refDomain(u),
          s"seed=$seed url=<$u> spark=($h,$d) ref=(${refHost(u)},${refDomain(u)})")
      }
    }
  }

  /** Reference canonicalization in plain java.util.regex + Scala
    * collections, mirroring [[Domains.canonicalizeUrl]] step for step
    * — independent of Catalyst. ASCII-only inputs (the generators
    * enforce it): Scala's string sort is UTF-16, Spark's array_sort
    * is UTF-8 byte order; they agree exactly on ASCII. */
  private def refCanonical(url: String): String = {
    val u = url.trim
    val schemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://".r
    val rawScheme = schemeRe.findFirstMatchIn(u)
      .map(_.group(1).toLowerCase).getOrElse("")
    val scheme = if (rawScheme.isEmpty) "http" else rawScheme
    val rest = u.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
      .replaceFirst("^[^/?#]*@", "")
    val hostport = "^([^/?#]*)".r.findFirstMatchIn(rest)
      .map(_.group(1)).getOrElse("")
    val hostNorm = hostport.replaceFirst(":[0-9]*$", "").toLowerCase
      .replaceFirst("\\.+$", "").replaceFirst("^(www\\.)+", "")
    val port = ":([0-9]+)$".r.findFirstMatchIn(hostport)
      .map(_.group(1)).getOrElse("")
    val portNum = if (port.isEmpty) -1L else port.toLong
    val portSfx =
      if (port.isEmpty) ""
      else if (scheme == "http" && portNum == 80L) ""
      else if (scheme == "https" && portNum == 443L) ""
      else s":$portNum"
    val tail = rest.replaceFirst("^[^/?#]*", "").replaceFirst("#.*$", "")
    val path = "^([^?]*)".r.findFirstMatchIn(tail).map(_.group(1)).getOrElse("")
      .replaceAll("//+", "/").replaceFirst("/+$", "")
    val query = "\\?(.*)$".r.findFirstMatchIn(tail).map(_.group(1)).getOrElse("")
    val kept = query.split("&", -1)
      .filter(p => p.nonEmpty && !Domains.TrackingParamPrefixes.exists(p.startsWith))
      .sorted
    val qSfx = if (kept.isEmpty) "" else "?" + kept.mkString("&")
    scheme + "://" + hostNorm + portSfx + path + qSfx
  }

  private val canoUrlGen: Gen[String] = for {
    scheme <- Gen.oneOf("", "http://", "https://", "HTTPS://", "HtTp://",
      "ftp://")
    user <- Gen.oneOf("", "user@", "user:pw@")
    h <- hostGen
    port <- Gen.oneOf("", ":80", ":443", ":0080", ":8080", ":08080", ":")
    path <- Gen.oneOf("", "/", "//", "/a/b", "/a//b/", "/a/b///", "/p/1")
    q <- Gen.oneOf("", "?", "?a=1", "?b=2&a=1", "?utm_source=x&b=2&a=1",
      "?z=1&&y=2&gclid=g", "?fbclid=1&utm_campaign=c", "?ref=rss&a=1&A=2")
    frag <- Gen.oneOf("", "#", "#frag", "#a#b")
    pad <- Gen.oneOf("", "  ")
  } yield pad + scheme + user + h + port + path + q + frag

  test("canonicalizeUrl matches the independent reference and is idempotent") {
    val gen = Gen.listOfN(64, Gen.frequency(9 -> canoUrlGen, 1 -> junkGen))
    (1 to 20).foreach { seed =>
      val urls = gen.apply(Gen.Parameters.default, Seed(seed.toLong + 1000)).get
      val got = urls.toDF("url").select(
        Domains.canonicalizeUrl(col("url")).as("c1"),
        Domains.canonicalizeUrl(Domains.canonicalizeUrl(col("url"))).as("c2"),
        col("url")).collect()
      got.foreach { r =>
        val (c1, c2, u) = (r.getString(0), r.getString(1), r.getString(2))
        assert(c1 == refCanonical(u),
          s"seed=$seed url=<$u> spark=<$c1> ref=<${refCanonical(u)}>")
        assert(c2 == c1, s"seed=$seed not idempotent: <$u> -> <$c1> -> <$c2>")
      }
    }
  }
}
