package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Html]] — block extraction and content-density scoring. */
class HtmlSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val page =
    """<html><head><title>Doc One</title>""" +
      """<style>p { color: #fff; }</style>""" +
      """<script>if (a < b && c > 1) { track("x=1&y=2"); }</script></head>""" +
      """<body><div id="nav"><a href="/">Home</a> <a href="/c">Cat</a> <a href="/d">Dig</a></div>""" +
      """<h1>A Short Title</h1>""" +
      """<p>this is the actual content of the page and it has plenty of words in it</p>""" +
      """<p>Extra &amp; more &lt;deep&gt;&nbsp;data with the usual markup traps</p>""" +
      """<!-- a comment with <p>fake tags</p> inside -->""" +
      """<ul><li>one</li><li>two</li></ul>""" +
      """<br/><footer>(c) 2026 Example</footer></body></html>"""

  private def blocks =
    Html.htmlBlocks(Seq((1L, page)).toDF("doc_id", "html"), "doc_id", "html")

  test("script, style, and comment payloads never reach any block") {
    val all = blocks.select("text").as[String].collect().mkString("\n")
    assert(!all.contains("track"), "script body leaked")
    assert(!all.contains("color"), "style body leaked")
    assert(!all.contains("fake tags"), "comment body leaked")
  }

  test("entity decode happens after tag strip, &amp; last") {
    val t = blocks.filter(col("text").startsWith("Extra"))
      .select("text").as[String].head()
    assert(t === "Extra & more <deep> data with the usual markup traps")
  }

  test("density and word-count rules: nav/title/footer/stubs drop, prose keeps") {
    val byText = blocks.select("text", "keep").as[(String, Boolean)]
      .collect().toMap
    assert(byText("this is the actual content of the page and it has plenty of words in it"))
    assert(byText("Extra & more <deep> data with the usual markup traps"))
    assert(!byText("Home Cat Dig"), "link-dense nav must drop on density")
    assert(!byText("A Short Title"), "3-word title must drop on minWords")
    assert(!byText("(c) 2026 Example"), "footer stub must drop on minWords")
    assert(!byText("one") && !byText("two"), "one-word list items must drop")
    assert(!byText("Doc One"), "title tag content must drop on minWords")
  }

  test("stopword counts use the lowercased word list") {
    val n = blocks
      .filter(col("text") === "this is the actual content of the page and it has plenty of words in it")
      .select("n_stop").as[Long].head()
    // the(x2), of(x2), and, it(x2), is, in, a? ("a" alone absent), this
    assert(n === 10L, s"got $n")
  }

  test("block numbering is 1-based over non-empty blocks and stable") {
    val nos = blocks.select("block_no").as[Long].collect().sorted
    assert(nos.head === 1L && nos === (1L to nos.length).toArray)
  }

  test("extractedText equals kept blocks joined in document order") {
    val viaColumn = Seq((1L, page)).toDF("doc_id", "html")
      .select(Html.extractedText(col("html")).as("content"))
      .as[String].head()
    val viaBlocks = blocks.filter(col("keep"))
      .orderBy("block_no").select("text").as[String].collect().mkString("\n")
    assert(viaColumn === viaBlocks)
    assert(viaColumn.startsWith("this is the actual content"))
  }

  test("stopword gate engages when minStopPct > 0") {
    // all-rare-word block: passes density + words, fails stopword share
    val df = Seq((1L, "<p>alpha beta gamma delta epsilon zeta</p>")).toDF("doc_id", "html")
    val strict = Html.htmlBlocks(df, "doc_id", "html", minStopPct = 20)
    assert(!strict.select("keep").as[Boolean].head())
    val lax = Html.htmlBlocks(df, "doc_id", "html")
    assert(lax.select("keep").as[Boolean].head())
  }

  test("extractLinks: document order, either quoting, script decoys and hrefless drop") {
    val page2 =
      """<html><head><script>var u='<a href="http://fake.example.org/x">';</script></head>""" +
        """<body><a href="http://a.example.com/1">one</a>""" +
        """<a class='m' href='http://b.example.org/2'>two</a>""" +
        """<a href="/rel">three</a><a name="anchor">no href</a>""" +
        """<a href="">empty</a></body></html>"""
    val links = Seq((1L, page2)).toDF("doc_id", "html")
      .select(Html.extractLinks(col("html")).as("l"))
      .as[Seq[String]].head()
    assert(links === Seq("http://a.example.com/1", "http://b.example.org/2", "/rel"))
  }

  test("extractLinks composes with Web.hostOf for the link graph") {
    val page2 = """<a href="HTTPS://WWW.X.Example.COM:443/p?utm_source=t">x</a>"""
    val host = Seq((1L, page2)).toDF("doc_id", "html")
      .select(explode(Html.extractLinks(col("html"))).as("href"))
      .select(Web.hostOf(col("href")).as("h")).as[String].head()
    assert(host === "x.example.com")
  }

  test("extractAnchors pairs each href with its decoded inner text, in order") {
    val page2 =
      """<a href="/a"><b>Bold</b> link &amp; more</a>""" +
        """<a name="x">no href</a><a href='/b'></a>"""
    val out = Seq((1L, page2)).toDF("doc_id", "html")
      .select(explode(Html.extractAnchors(col("html"))).as("a"))
      .select(col("a.href"), col("a.text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("/a", "Bold link & more"), ("/b", "")))
  }

  test("extractSitemapLocs: trimmed values in order, commented-out entries drop") {
    val xml = """<?xml version="1.0"?><urlset>""" +
      """<url><loc>https://a.example.com/1</loc></url>""" +
      """<url><loc> http://b.example.org/2 </loc></url>""" +
      """<!-- <url><loc>http://decoy.example.net/x</loc></url> -->""" +
      """<url><loc></loc></url></urlset>"""
    val locs = Seq((1L, xml)).toDF("doc_id", "xml")
      .select(Html.extractSitemapLocs(col("xml")).as("l"))
      .as[Seq[String]].head()
    assert(locs === Seq("https://a.example.com/1", "http://b.example.org/2"))
  }

  test("extractCanonical: rel filter, either quoting, attr order, chrome decoys") {
    val mk = (s: String) => s"<html><head>$s</head><body><p>x</p></body></html>"
    val cases = Seq(
      1L -> mk("""<link rel="stylesheet" href="/c.css"><link rel="canonical" href="https://a.example.com/p">"""),
      2L -> mk("""<link rel='canonical' href='/doc/3'>"""),
      3L -> mk("""<link href="//b.example.org/q" rel="canonical">"""),
      4L -> mk("""<!-- <link rel="canonical" href="http://evil/x"> -->"""),
      5L -> mk("""<script>var s='<link rel="canonical" href="http://scripted/y">';</script>"""),
      6L -> mk("""<link rel="canonical" href="https://first/1"><link rel="canonical" href="https://second/2">"""))
    val out = cases.toDF("id", "html")
      .select(col("id"), Html.extractCanonical(col("html")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "https://a.example.com/p", "stylesheet link must not match")
    assert(out(2L) === "/doc/3")
    assert(out(3L) === "//b.example.org/q", "attribute order must not matter")
    assert(out(4L) === "", "commented-out canonical is chrome")
    assert(out(5L) === "", "script-quoted canonical is chrome")
    assert(out(6L) === "https://first/1", "first declaration wins")
  }

  test("resolveCanonical + canonicalCollapse: resolution flavors and keep-min") {
    val df = Seq(
      (1L, "https://WWW.A.example.com/fetch/1?utm_source=x", "https://a.example.com/p"),
      (2L, "https://a.example.com:443/p?b=2&a=1#f", ""),           // no declaration
      (3L, "http://a.example.com/m/3", "//a.example.com/p"),       // protocol-relative
      (4L, "HTTPS://a.example.com/amp/4", "/p"),                   // root-relative
      (5L, "https://b.example.com/other", "page.html")             // path-relative: fallback
    ).toDF("id", "url", "href")
    val out = Web.canonicalCollapse(df, "id", "url", "href")
      .select("id", "canon_url", "group_n", "keep")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    // 1 (absolute), 3 (protocol-relative keeps http? no — '//' takes the
    // fetch scheme: http://a.example.com/p ≠ https://a.example.com/p),
    // 4 (root-relative on the https fetch origin) — so {1,4} group on
    // https://a.example.com/p and 1 survives by keep-min
    assert(out(1L) === (("https://a.example.com/p", 2L, true)))
    assert(out(4L) === (("https://a.example.com/p", 2L, false)))
    assert(out(3L) === (("http://a.example.com/p", 1L, true)),
      "protocol-relative takes the FETCH scheme")
    assert(out(2L)._1 === "https://a.example.com/p?a=1&b=2",
      "no declaration falls back to the normalized fetch URL")
    assert(out(5L)._1 === "https://b.example.com/other",
      "path-relative href is out of scope and falls back")
  }

  test("empty and tags-only documents yield no blocks and empty content") {
    val df = Seq((1L, ""), (2L, "<html><body></body></html>")).toDF("doc_id", "html")
    assert(Html.htmlBlocks(df, "doc_id", "html").count() === 0L)
    val contents = df.select(Html.extractedText(col("html"))).as[String].collect()
    assert(contents.forall(_ === ""))
  }
}
