package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge cases of [[TextStats.canonicalizeUrl]] the q_url_* oracles never
  * reach (their constructed URLs always carry an authority, a path, and a
  * non-empty query): passthroughs, query-only removals, host-only forms,
  * and the normalizations' idempotence. */
class UrlSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("url")
      .select(TextStats.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("case, www, default port, slashes, fragment, tracking params, param order") {
    assert(canon("HTTP://WWW.ExAmple.COM:80//a//b/?b=2&utm_source=x&a=1#frag")
      == Seq("http://example.com/a/b?a=1&b=2"))
    // https default port; non-default ports survive
    assert(canon("HTTPS://Site.org:443/x", "https://site.org:8443/x")
      == Seq("https://site.org/x", "https://site.org:8443/x"))
    // :80 is NOT default for https (and vice versa)
    assert(canon("https://site.org:80/x") == Seq("https://site.org:80/x"))
  }

  test("query edge cases: all-tracking, empty, lone '?', repeated keys") {
    // a query that is nothing but tracking params vanishes with its '?'
    assert(canon("http://a.com/p?utm_a=1&utm_b=2&gclid=z")
      == Seq("http://a.com/p"))
    assert(canon("http://a.com/p?") == Seq("http://a.com/p"))
    // repeated keys survive sorted (value-aware ordering)
    assert(canon("http://a.com/p?x=2&x=1") == Seq("http://a.com/p?x=1&x=2"))
  }

  test("root path, host-only, and non-absolute passthrough") {
    // root path strips to the bare authority; host-only stays itself
    assert(canon("http://a.com/", "http://a.com")
      == Seq("http://a.com", "http://a.com"))
    // no scheme:// → pass through trimmed, untouched otherwise
    assert(canon("  /relative/Path?b=1&a=2  ", "mailto:x@y.com")
      == Seq("/relative/Path?b=1&a=2", "mailto:x@y.com"))
  }

  test("path/query case preserved; only scheme+host fold") {
    assert(canon("http://A.com/CaseD/Path?Key=Val")
      == Seq("http://a.com/CaseD/Path?Key=Val"))
  }

  test("canonicalization is idempotent") {
    val dirty = Seq(
      "HTTP://WWW.ExAmple.COM:80//a//b/?b=2&utm_source=x&a=1#frag",
      "https://Site.org:443/x?gclid=1", "http://a.com/", "relative")
    val once = canon(dirty: _*)
    assert(canon(once: _*) == once)
  }

  test("robotsScreen: longest match wins, allow beats disallow on ties, default allow") {
    val s = spark
    import s.implicits._
    val rules = Seq(
      ("a.com", "/", false), ("a.com", "/pub", true),
      ("a.com", "/pub/secret", false),
      // tie pair: same prefix twice with both verdicts → allow wins
      ("t.com", "/x", false), ("t.com", "/x", true)).toDF(
      "domain", "prefix", "allow")
    val urls = Seq(
      (1L, "http://a.com/pub/page"),      // /pub (4) beats / (1) → allow
      (2L, "http://a.com/private"),       // only / matches → disallow
      (3L, "http://a.com/pub/secret/x"),  // /pub/secret (11) → disallow
      (4L, "http://a.com"),               // root path "/" → / rule → disallow
      (5L, "http://t.com/x/y"),           // tie at /x → allow wins
      (6L, "http://norules.org/any")      // host absent from rules → allow
    ).toDF("doc_id", "url")
    val got = Curation.robotsScreen(urls, col("url"), rules)
      .select(col("doc_id"), col("allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> true, 6L -> true))
  }

  test("robotsScreen verdict matches on dirty surface forms (canonical matching)") {
    val s = spark
    import s.implicits._
    val rules = Seq(("a.com", "/p", false)).toDF("domain", "prefix", "allow")
    val urls = Seq((1L, "HTTP://WWW.A.com:80//p//x#f"), (2L, "http://a.com/p/x"))
      .toDF("doc_id", "url")
    val got = Curation.robotsScreen(urls, col("url"), rules)
      .select(col("allowed")).collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(false, false))
  }

  test("crawl-frontier erasure: forgetting a canonical URL re-admits any surface form") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files.createTempDirectory("url_seen_del")
      .toString + "/seen"
    def screen(batch: Seq[(Long, String)], bid: Long): Set[Long] =
      graft.streaming.IncrementalDedup.dedupBatch(
          batch.toDF("doc_id", "url")
            .withColumn("canon", TextStats.canonicalizeUrl(col("url"))),
          store, col("canon"), col("doc_id"), bid)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // first crawl admits; a re-crawl under ANY dirty surface form is
    // rejected (the q_url_seen composition)
    assert(screen(Seq((1L, "http://a.com/p?x=1")), 0L) == Set(1L))
    assert(screen(Seq((2L, "HTTP://WWW.A.com:80/p?x=1&utm_s=9")), 1L) == Set.empty)
    // ERASURE (a takedown/right-to-erasure on the frontier): forget the
    // canonical key — IncrementalDedup.deleteBatch keyed by the canon,
    // the generic store erase composing with the canonicalizer
    assert(graft.streaming.IncrementalDedup.deleteBatch(
      Seq((1L, "http://a.com/p?x=1")).toDF("doc_id", "url")
        .withColumn("canon", TextStats.canonicalizeUrl(col("url"))),
      store, col("canon"), 2L) == 1L)
    // the re-crawl — under a different surface form — is ACCEPTED again
    assert(screen(Seq((3L, "http://A.com/p/?x=1")), 3L) == Set(3L))
  }

  test("urlHost matches the canonical authority") {
    val s = spark
    import s.implicits._
    val got = Seq("HTTP://WWW.ExAmple.COM:80/a", "https://x.y.org:8443/b",
      "nope").toDF("url")
      .select(TextStats.urlHost(col("url")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.com", "x.y.org:8443", ""))
  }
}
