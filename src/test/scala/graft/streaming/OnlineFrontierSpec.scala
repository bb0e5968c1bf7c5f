package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming crawl-frontier maintenance: canonical-URL identity across
  * batches, policy/blocklist admission, first-arrival per-domain
  * capping against standing counts, and replay idempotence. */
class OnlineFrontierSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val suffixes = Seq("example.com", "example.org")

  private def page(links: String*): String =
    links.map(u => s"""<a href="$u">x</a>""").mkString(
      "<html><body>", "", "</body></html>")

  private def rules =
    Seq(("a.example.com", "/private/", false),
        ("a.example.com", "/", true))
      .toDF("host", "path_prefix", "allow")

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("online-frontier").toString

  private def online(root: String, cap: Int = Int.MaxValue) =
    new OnlineFrontier(root, rules, Seq("blocked.org"), suffixes, cap)

  test("URLs discover once; policy and blocklist gate admission; relatives drop") {
    val root = freshDir()
    val f = online(root)
    def batch(pages: String*) = pages.zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "html")

    f.processBatch(batch(page(
      "HTTP://WWW.A.Example.COM:80/p1?utm_source=x", // canonicalizes
      "http://a.example.com/private/x",              // policy disallow
      "http://sub.blocked.org/y",                    // blocklisted eTLD+1
      "/relative/z")), 0L)                           // relative: drops
    // p1 again under a different raw spelling + one genuinely new URL
    f.processBatch(batch(page(
      "http://a.example.com/p1", "http://b.example.org/q")), 1L)

    val got = f.frontier(spark).collect()
      .map(r => r.getAs[String]("url_norm")).toSet
    assert(got === Set("http://a.example.com/p1", "http://b.example.org/q"))
  }

  test("per-domain cap admits first arrivals across batches, then closes") {
    val root = freshDir()
    val f = online(root, cap = 2)
    def batch(links: String*) =
      Seq((0L, page(links: _*))).toDF("doc_id", "html")

    f.processBatch(batch(
      "http://a.example.com/1", "http://a.example.com/2",
      "http://a.example.com/3"), 0L) // in-batch: 2 smallest admit
    f.processBatch(batch(
      "http://a.example.com/0", "http://b.example.org/1"), 1L)

    val got = f.frontier(spark).collect()
      .map(r => r.getAs[String]("url_norm")).toSet
    // /0 arrives AFTER the domain closed — first-arrival semantics
    assert(got === Set("http://a.example.com/1", "http://a.example.com/2",
      "http://b.example.org/1"))
  }

  test("replaying a micro-batch is idempotent") {
    val root = freshDir()
    val f = online(root, cap = 2)
    def batch(links: String*) =
      Seq((0L, page(links: _*))).toDF("doc_id", "html")

    f.processBatch(batch("http://a.example.com/1"), 0L)
    f.processBatch(batch("http://a.example.com/2",
      "http://a.example.com/3"), 1L)
    val before = f.frontier(spark).collect()
      .map(r => r.getAs[String]("url_norm")).sorted
    f.processBatch(batch("http://a.example.com/2",
      "http://a.example.com/3"), 1L) // at-least-once redelivery
    val after = f.frontier(spark).collect()
      .map(r => r.getAs[String]("url_norm")).sorted
    assert(before.toSeq === Seq("http://a.example.com/1",
      "http://a.example.com/2"))
    assert(after.toSeq === before.toSeq)
  }
}
