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

  test("empty and tags-only documents yield no blocks and empty content") {
    val df = Seq((1L, ""), (2L, "<html><body></body></html>")).toDF("doc_id", "html")
    assert(Html.htmlBlocks(df, "doc_id", "html").count() === 0L)
    val contents = df.select(Html.extractedText(col("html"))).as[String].collect()
    assert(contents.forall(_ === ""))
  }
}
