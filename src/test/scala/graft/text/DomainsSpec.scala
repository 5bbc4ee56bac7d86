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

  test("n2_domain_cap plan: rank<=cap prunes via WindowGroupLimit, no full-domain sort buffer") {
    val docs = (1L to 100L).map(i => (i, "https://one.example.com/p", s"t$i"))
      .toDF("doc_id", "url", "text")
    val plan = Domains.capPerDomain(docs, "url", cap = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"cap must push into WindowGroupLimit, plan:\n${plan.take(2000)}")
  }
}
