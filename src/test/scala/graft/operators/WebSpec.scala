package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Web]] URL-canonicalization family against hand-written URLs (the
  * DuckDB oracle re-checks the same logic at sf0.01; these pin each
  * normalization rule individually). */
class WebSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("url").select(Web.normalizeUrl(col("url"))).head().getString(0)

  test("scheme and host lowercase; www and default port stripped") {
    assert(norm("HTTPS://WWW.Site.COM:443/A/b") === "https://site.com/A/b")
    assert(norm("http://Site.com:80/x") === "http://site.com/x")
  }

  test("non-default port kept") {
    assert(norm("http://site.com:8080/x") === "http://site.com:8080/x")
    assert(norm("https://site.com:80/x") === "https://site.com:80/x")
  }

  test("fragment dropped, trailing slashes trimmed") {
    assert(norm("https://site.com/a/#frag") === "https://site.com/a")
    assert(norm("https://site.com/a///") === "https://site.com/a")
  }

  test("tracking params dropped, remaining params sorted, empty query elided") {
    assert(norm("https://site.com/p?utm_source=x&b=2&a=1") === "https://site.com/p?a=1&b=2")
    assert(norm("https://site.com/p?utm_campaign=x&fbclid=1&gclid=2&ref=3")
      === "https://site.com/p")
    assert(norm("https://site.com/p?refresh=1") === "https://site.com/p?refresh=1")
  }

  test("path case is preserved; query values are case-preserved") {
    assert(norm("https://site.com/CaseSensitive?Q=Val") === "https://site.com/CaseSensitive?Q=Val")
  }

  test("hostOf lowers, strips www and port") {
    val h = Seq("HTTP://WWW.Foo.Example.ORG:8080/p?q=1#f").toDF("url")
      .select(Web.hostOf(col("url"))).head().getString(0)
    assert(h === "foo.example.org")
  }

  test("registrableDomain: ICANN multi-label, PSL-private, and TLD fallback") {
    val sfx = Seq("co.uk", "example.com")
    val out = Seq(
      "a.b.site.co.uk", // co.uk listed → site.co.uk
      "deep.sub.example.com", // PSL-private example.com → sub.example.com
      "plain.org", // fallback: last two labels
      "x.y.plain.org", // fallback still last two
      "localhost" // single label: unchanged
    ).toDF("host").select(Web.registrableDomain(col("host"), sfx)).as[String].collect()
    assert(out === Seq("site.co.uk", "sub.example.com", "plain.org", "plain.org", "localhost"))
  }

  test("perDomainCap keeps n per domain in order, ties broken deterministically") {
    val df = Seq(
      ("d1", 1L, 10L), ("d1", 2L, 30L), ("d1", 3L, 30L), ("d1", 4L, 5L),
      ("d2", 5L, 1L)).toDF("domain", "doc_id", "n_chars")
    val kept = Web.perDomainCap(df, "domain", 2, Seq(col("n_chars").desc, col("doc_id").asc))
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L, 5L)) // d1: the two 30s (id asc), d2: its only row
  }

  test("blockedTermHits counts word-boundary matches incl. phrases; substrings don't match") {
    val docs = Seq(
      (1L, "the slow query is slow"), // 2 hits
      (2L, "slowest queries are fine"), // substring: 0 hits
      (3L, "a hash join beats a hash  join here"), // phrase ×2 (multi-space)
      (4L, "Drop THE table"), // case-insensitive via lower()
      (5L, "nothing here")).toDF("doc_id", "text")
    val out = TextCorpus.blockedTermHits(docs, Seq("slow", "drop", "hash join"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 0L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("blockedTermHits rejects non-literal terms") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextCorpus.blockedTermHits(docs, Seq("a.b*"))
    }
    intercept[IllegalArgumentException] {
      TextCorpus.blockedTermHits(docs, Seq.empty)
    }
  }

  test("blocklistFilter drops exactly the blocked domains via broadcast anti-join") {
    val docs = Seq(("a.com", 1L), ("b.com", 2L), ("c.com", 3L)).toDF("domain", "doc_id")
    val bl = Seq("b.com").toDF("domain")
    val out = Web.blocklistFilter(docs, "domain", bl).select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L, 3L))
    val plan = Web.blocklistFilter(docs, "domain", bl).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("LeftAnti"))
  }

  test("embedded URLs in the query: host/query come from the FIRST '://' and '?'") {
    val url = "https://news.example.com/out?a=1&to=http://spam.ru/p?x=2#f"
    val out = Seq(Tuple1(url)).toDF("url")
      .select(Web.normalizeUrl(col("url")).as("n"), Web.hostOf(col("url")).as("h"))
      .head()
    // host must be the outer page's, never the embedded ad/spam host
    assert(out.getString(1) === "news.example.com")
    // the query keeps BOTH params (the second '?' belongs to the value),
    // the fragment is stripped at the first '#'
    assert(out.getString(0) === "https://news.example.com/out?a=1&to=http://spam.ru/p?x=2")
  }

  test("policyFilter: longest prefix wins, allow breaks ties, no rule = allowed") {
    val urls = Seq(
      (1L, "http://a.example.com/articles/7"),  // /articles/ disallow wins over /
      (2L, "http://a.example.com/articles/19"), // /articles/1 allow (longest)
      (3L, "http://a.example.com/dup"),         // same-length allow+disallow tie
      (4L, "http://other.example.com/x"),       // no rules for host
      (5L, "http://a.example.com"),             // empty path reads as '/'
      (6L, "HTTP://WWW.A.Example.COM:80/articles/7?q=1#f") // host/path canonical
    ).toDF("id", "url")
    val rules = Seq(
      ("a.example.com", "/", true),
      ("a.example.com", "/articles/", false),
      ("a.example.com", "/articles/1", true),
      ("a.example.com", "/dup", false),
      ("a.example.com", "/dup", true)
    ).toDF("host", "path_prefix", "allow")
    val out = Web.policyFilter(urls, "id", "url", rules)
      .select("id", "path", "matched_prefix", "allowed")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(out(1L) === (("/articles/7", "/articles/", false)))
    assert(out(2L) === (("/articles/19", "/articles/1", true)))
    assert(out(3L) === (("/dup", "/dup", true)), "allow must win the tie")
    assert(out(4L) === (("/x", "", true)), "rule-less host defaults to allowed")
    assert(out(5L) === (("/", "/", true)), "bare host path is '/'")
    assert(out(6L) === (("/articles/7", "/articles/", false)),
      "case/port/query/fragment must not defeat matching")
  }

  test("policyFilter: RFC 9309 '*' and trailing '$' special characters") {
    val urls = Seq(
      (1L, "http://a.example.com/private.php"),   // /*.php$ disallow
      (2L, "http://a.example.com/private.php5"),  // NOT anchored-matched
      (3L, "http://a.example.com/files/a/deep"),  // mid-pattern '*'
      (4L, "http://a.example.com/exact"),         // /exact$ matches exactly
      (5L, "http://a.example.com/exactly"),       // anchor rejects the suffix
      (6L, "http://a.example.com/a$b")            // mid-pattern '$' is literal
    ).toDF("id", "url")
    val rules = Seq(
      ("a.example.com", "/*.php$", false),
      ("a.example.com", "/files/*/deep", false),
      ("a.example.com", "/exact$", false),
      ("a.example.com", "/a$b", false)
    ).toDF("host", "path_prefix", "allow")
    val out = Web.policyFilter(urls, "id", "url", rules)
      .select("id", "matched_prefix", "allowed")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2)))).toMap
    assert(out(1L) === (("/*.php$", false)))
    assert(out(2L) === (("", true)), "'$' must anchor the end")
    assert(out(3L) === (("/files/*/deep", false)))
    assert(out(4L) === (("/exact$", false)))
    assert(out(5L) === (("", true)))
    assert(out(6L) === (("/a$b", false)), "mid-pattern '$' matches literally")
  }

  test("policyFilter: wildcard length beats shorter plain prefix, and vice versa") {
    val urls = Seq(
      (1L, "http://a.example.com/articles/13"), // /articles/*3 (12) > /articles/1 (11)
      (2L, "http://a.example.com/index.html")   // /index.html (11) > /*.html$ (8)
    ).toDF("id", "url")
    val rules = Seq(
      ("a.example.com", "/articles/", false),
      ("a.example.com", "/articles/1", true),
      ("a.example.com", "/articles/*3", false),
      ("a.example.com", "/index", false),
      ("a.example.com", "/index.html", true),
      ("a.example.com", "/*.html$", false)
    ).toDF("host", "path_prefix", "allow")
    val out = Web.policyFilter(urls, "id", "url", rules)
      .select("id", "matched_prefix", "allowed")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2)))).toMap
    assert(out(1L) === (("/articles/*3", false)))
    assert(out(2L) === (("/index.html", true)))
  }

  test("policyFilter: rows sharing an id keep independent verdicts") {
    // the winner is a function of (host, path); a duplicated id must
    // not cross-assign one row's verdict to the other
    val urls = Seq(
      (7L, "http://a.example.com/articles/9"),
      (7L, "http://a.example.com/open")
    ).toDF("id", "url")
    val rules = Seq(
      ("a.example.com", "/articles/", false),
      ("a.example.com", "/open", true)
    ).toDF("host", "path_prefix", "allow")
    val out = Web.policyFilter(urls, "id", "url", rules)
      .select("path", "allowed").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out === Map("/articles/9" -> false, "/open" -> true))
  }

  test("frontierSchedule: politeness slots per host, centrality-damped priority, batch cut") {
    // host graph: five hosts feed hub, hub feeds a back (the 2-cycle
    // keeps hub's mass from draining across the odd/even iterations of
    // a pure chain); leaf hangs off a rank-less feeder → hub ≫ leaf
    val edges = Seq(
      ("a.example.com", "hub.example.com"),
      ("b.example.com", "hub.example.com"),
      ("c.example.com", "hub.example.com"),
      ("d.example.com", "hub.example.com"),
      ("e.example.com", "hub.example.com"),
      ("hub.example.com", "a.example.com"),
      ("f.example.com", "leaf.example.com")
    ).toDF("src_host", "dst_host")
    val frontier = Seq(
      ("hub.example.com", "https://hub.example.com/1"),
      ("hub.example.com", "https://hub.example.com/2"),
      ("hub.example.com", "https://hub.example.com/3"),
      ("leaf.example.com", "https://leaf.example.com/1")
    ).toDF("host", "url_norm")
    val out = Web.frontierSchedule(frontier, edges,
        politenessSec = 7L, batchSize = 3)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5))))
    // hub rank > leaf rank (3 in-links vs 1); hub/1 (q=1) first, then
    // the damped hub/2 vs leaf/1 ordering is decided by rank div q
    assert(out.length === 3, "batch must cut at batchSize")
    assert(out.head._1 === "https://hub.example.com/1")
    val m = out.toMap
    m.get("https://hub.example.com/2").foreach { case (q, _, sched) =>
      assert(q === 2L && sched === 7L, "politeness slot = (q-1)*politenessSec")
    }
    // priorities strictly follow rank_fp div q — re-derive and compare
    val all = Web.frontierSchedule(frontier, edges, 7L, batchSize = 10)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(2), r.getLong(4)))
    all.foreach { case (u, rank, q, prio) =>
      assert(prio === rank / q, s"$u: priority $prio != $rank div $q")
    }
    // every host's slots start at 0 and step by politenessSec
    val hubSlots = all.filter(_._1.startsWith("https://hub"))
      .map(x => (x._3, x._1)).sorted.map(_._1)
    assert(hubSlots === Seq(1L, 2L, 3L))
  }

  test("blocked terms reject leading/trailing/doubled spaces loudly") {
    val docs = Seq((1L, "hash join here")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextCorpus.blockedTermHits(docs, Seq("hash  join"))
    }
    intercept[IllegalArgumentException] {
      TextCorpus.blockedTermHits(docs, Seq("drop "))
    }
    val ok = TextCorpus.blockedTermHits(docs, Seq("hash join")).head()
    assert(ok.getLong(1) === 1L)
  }

  test("resolveCanonical: relative forms win over the '://' absolute sniff (r15 advice)") {
    val fetch = "https://News.example.com:443/article?x=1"
    def resolve(href: String): String =
      Seq((href, fetch)).toDF("href", "url")
        .select(Web.resolveCanonical(col("href"), col("url")).as("r"))
        .head().getString(0)
    // the trap: a root-relative href whose QUERY embeds an absolute
    // URL contains '://' but must still resolve against the fetch
    // origin, not stand as absolute
    assert(resolve("/r?to=https://x.example.org/y")
      === "https://News.example.com:443/r?to=https://x.example.org/y")
    assert(resolve("https://canon.example.org/c") === "https://canon.example.org/c")
    assert(resolve("//cdn.example.org/c") === "https://cdn.example.org/c")
    assert(resolve("/plain/path") === "https://News.example.com:443/plain/path")
    assert(resolve("") === fetch)
    assert(resolve("page.html") === fetch) // path-relative: fall back
  }
}
