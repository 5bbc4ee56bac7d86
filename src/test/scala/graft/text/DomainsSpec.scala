package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Domain-keyed curation ([[Domains]]): URL → registrable domain over
  * messy crawl shapes, per-domain caps, and domain-scoped dedup. */
class DomainsSpec extends SparkSuite {
  import spark.implicits._

  test("host + registrableDomain handle scheme-less, userinfo, port, case, and two-level suffixes") {
    val cases = Seq(
      ("https://www.example.com/path?q=1", "www.example.com", "example.com"),
      ("http://user:pw@sub.example.co.uk:8080/a", "sub.example.co.uk", "example.co.uk"),
      ("example.org/path", "example.org", "example.org"),
      ("HTTPS://CDN.Example.COM/x#frag", "cdn.example.com", "example.com"),
      ("ftp+ssh://files.example.net", "files.example.net", "example.net"),
      ("co.uk", "co.uk", "co.uk"),              // bare suffix: nothing more to strip
      ("localhost", "localhost", "localhost"),  // single label stays itself
      ("  https://spaced.example.com  ", "spaced.example.com", "example.com"))
      .toDF("url", "want_host", "want_domain")
    val got = cases.select(
      Domains.host(col("url")).as("h"),
      Domains.domainOf(col("url")).as("d"),
      col("want_host"), col("want_domain")).collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(2), s"host of ${r.toSeq}")
      assert(r.getString(1) == r.getString(3), s"domain of ${r.toSeq}")
    }
  }

  test("PSL snapshot: co.za/com.eg-class hosts split at the right label") {
    // these long-tail two-level suffixes come from the bundled
    // psl_two_level.txt, not the built-in fallback
    assert(Domains.TwoLevelSuffixes.size > Domains.BuiltinTwoLevelSuffixes.size,
      "the bundled PSL snapshot must be loaded from resources")
    val cases = Seq(
      ("https://www.shop.example.co.za/x", "example.co.za"),
      ("http://news.example.com.eg/y", "example.com.eg"),
      ("https://example.ac.th", "example.ac.th"),
      ("sub.deep.example.com.ng", "example.com.ng"),
      ("https://example.gob.mx/z", "example.gob.mx"),
      // a NON-suffix two-label tail still splits last-two
      ("https://a.b.example.com/x", "example.com"))
      .toDF("url", "want")
    cases.select(Domains.domainOf(col("url")).as("d"), col("want"))
      .collect().foreach(r => assert(r.getString(0) == r.getString(1),
        s"domain '${r.getString(0)}' != expected '${r.getString(1)}'"))
  }

  test("ref= is functional by default; a custom tracker list can drop it") {
    val urls = Seq("https://git.example.com/repo/file?ref=main").toDF("url")
    // default: ref=main selects a different resource — KEPT
    assert(urls.select(Domains.canonicalizeUrl(col("url"))).head().getString(0)
      == "https://git.example.com/repo/file?ref=main")
    // referral-tracking corpus: caller opts into dropping it
    val extended = Domains.TrackingParamPrefixes :+ "ref="
    assert(urls.select(Domains.canonicalizeUrl(col("url"), extended))
      .head().getString(0) == "https://git.example.com/repo/file")
  }

  test("canonicalizeUrl: case, www, trailing dots, default ports, slashes, trackers, fragments") {
    val cases = Seq(
      // messy twin of a clean URL -> identical canonical form
      ("HTTPS://WWW.Example.COM.:443//a//b/?utm_source=x&b=2&a=1#frag",
        "https://example.com/a/b?a=1&b=2"),
      ("https://example.com/a/b?a=1&b=2", "https://example.com/a/b?a=1&b=2"),
      // scheme-less defaults to http; leading-zero port normalizes
      ("example.org:0080/about/", "http://example.org/about"),
      // non-default port survives, numerically normalized
      ("http://example.org:08080/x", "http://example.org:8080/x"),
      // https default port dropped only for https
      ("http://example.com:443/x", "http://example.com:443/x"),
      // tracker-only query vanishes entirely
      ("https://a.net/p?utm_campaign=c&fbclid=123", "https://a.net/p"),
      // empty params dropped; survivors byte-sorted
      ("https://a.net/p?z=1&&y=2&gclid=g", "https://a.net/p?y=2&z=1"),
      // root path normalizes to no path; userinfo stripped
      ("https://user:pw@Host.com/", "https://host.com"),
      ("  http://spaced.example.com  ", "http://spaced.example.com"))
      .toDF("url", "want")
    cases.select(Domains.canonicalizeUrl(col("url")).as("got"), col("want"))
      .collect().foreach { r =>
        assert(r.getString(0) == r.getString(1),
          s"canonical '${r.getString(0)}' != expected '${r.getString(1)}'")
      }
  }

  test("canonicalizeUrl is idempotent on its own output") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM.:443//a//b/?utm_source=x&b=2&a=1#frag",
      "example.org:0080/about/", "https://a.net/p?z=1&&y=2",
      "https://user@h.com:9999/deep/path/?q=1").toDF("url")
    val once = urls.select(Domains.canonicalizeUrl(col("url")).as("c1"))
    val twice = once.select(col("c1"),
      Domains.canonicalizeUrl(col("c1")).as("c2"))
    twice.collect().foreach(r =>
      assert(r.getString(0) == r.getString(1), s"not idempotent: ${r.toSeq}"))
  }

  test("capPerDomain keeps exactly cap docs per domain, deterministically") {
    val docs = (1L to 40L).map(i =>
      (i, s"https://${if (i % 2 == 0) "even" else "odd"}.example.com/$i", s"text $i"))
      .toDF("doc_id", "url", "text")
    val capped = Domains.capPerDomain(docs, "url", cap = 5)
    assert(capped.count() == 5, "one domain (example.com) -> one cap")
    // stable: same survivors on a reshuffled input
    val again = Domains.capPerDomain(docs.repartition(7), "url", cap = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == capped.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("dedupPerDomain: same content on two domains survives twice; copies counted per domain") {
    val docs = Seq(
      (1L, "https://a.com/x", "shared boilerplate text"),
      (2L, "https://a.com/y", "Shared  BOILERPLATE text!"),  // same normalized content, same domain
      (3L, "https://b.org/z", "shared boilerplate text"),    // same content, other domain
      (4L, "https://a.com/w", "unique content here"))
      .toDF("doc_id", "url", "text")
    val out = Domains.dedupPerDomain(docs, "url")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a.com", 2L), (3L, "b.org", 1L), (4L, "a.com", 1L)))
  }

  test("blockByDomain drops exactly the blocklisted registrable domains, case-insensitively") {
    val docs = Seq(
      (1L, "https://www.bad.example.com/x", "a"),
      (2L, "https://GOOD.example.org/y", "b"),
      (3L, "spam.co.uk/z", "c"),
      (4L, "https://fine.net/w", "d"))
      .toDF("doc_id", "url", "text")
    val blocked = Seq("Example.COM", "spam.co.uk").toDF("domain")
    val kept = Domains.blockByDomain(docs, "url", blocked)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L),
      "subdomain of a blocked registrable domain must be dropped; others kept")
    // plan: the blocklist side broadcasts — no shuffle of the corpus
    val plan = Domains.blockByDomain(docs, "url", blocked)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist gate must be a broadcast anti-join, plan:\n${plan.take(2000)}")
  }

  test("domainPrior: corpus-level trust signal a document-local score cannot see") {
    // dupfarm.com: 4 docs, 2 distinct texts -> 500 permille dups;
    // thin.com: short docs; rich.org: long unique docs
    val docs = Seq(
      (1L, "https://dupfarm.com/a", "copy paste content here today"),
      (2L, "https://dupfarm.com/b", "copy paste content here today"),
      (3L, "https://dupfarm.com/c", "other copied words appear twice"),
      (4L, "https://dupfarm.com/d", "other copied words appear twice"),
      (5L, "https://thin.com/a", "tiny"),
      (6L, "https://rich.org/a", "a genuinely long document with many distinct informative words inside"))
      .toDF("doc_id", "url", "text")
    val out = Domains.domainPrior(docs, "url",
      minMeanScaled = 5000L, maxDupPermille = 400L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((5000L, 500L, true)), s"dupfarm: $out")   // 5 tokens, half dups
    assert(out(5L)._1 == 1000L && out(5L)._3, "thin domain flagged by mean tokens")
    assert(out(6L)._2 == 0L && !out(6L)._3, "rich domain passes")
    assert(out(2L) == out(1L) && out(3L) == out(1L), "prior is per-domain, not per-doc")
  }

  test("n2_domain_cap plan: rank<=cap prunes via WindowGroupLimit, no full-domain sort buffer") {
    val docs = (1L to 100L).map(i => (i, "https://one.example.com/p", s"t$i"))
      .toDF("doc_id", "url", "text")
    val plan = Domains.capPerDomain(docs, "url", cap = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"cap must push into WindowGroupLimit, plan:\n${plan.take(2000)}")
  }
}
