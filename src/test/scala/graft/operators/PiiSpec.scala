package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the PII scrub: per-class detection, the staged
  * counting discipline (a phone body must not be re-counted as an id
  * run), redaction output, and the quarantine routing. */
class PiiSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def statsOf(text: String) =
    Pii.piiStats(Seq((1L, text)).toDF("doc_id", "text")).collect().head

  test("each PII class is counted and redacted") {
    val r = statsOf(
      "write user.name+tag@sub.example.com or admin@ex-a.co " +
        "from 10.42.0.1 call +49301234567 acct 987654321012 done")
    assert(r.getAs[Long]("n_emails") === 2)
    assert(r.getAs[Long]("n_ipv4") === 1)
    assert(r.getAs[Long]("n_phones") === 1)
    assert(r.getAs[Long]("n_idnums") === 1)
    assert(r.getAs[String]("redacted") ===
      "write <EMAIL> or <EMAIL> from <IP> call <PHONE> acct <ID> done")
  }

  test("staged counting never double-counts: phone digits are not id runs") {
    val r = statsOf("call +123456789012 only")
    assert(r.getAs[Long]("n_phones") === 1)
    assert(r.getAs[Long]("n_idnums") === 0)
    assert(r.getAs[String]("redacted") === "call <PHONE> only")
  }

  test("an IPv4 is not also an id run or phone") {
    val r = statsOf("host 192.168.100.200 up")
    assert(r.getAs[Long]("n_ipv4") === 1)
    assert(r.getAs[Long]("n_phones") === 0)
    assert(r.getAs[Long]("n_idnums") === 0)
  }

  test("the four counts sum to the number of tags in the redacted text") {
    val r = statsOf(
      "a@b.co and c@d.org 1.2.3.4 5.6.7.8 +1234567 999999999 123456789012345")
    val total = r.getAs[Long]("n_emails") + r.getAs[Long]("n_ipv4") +
      r.getAs[Long]("n_phones") + r.getAs[Long]("n_idnums")
    val tags = "<EMAIL>|<IP>|<PHONE>|<ID>".r.findAllIn(r.getAs[String]("redacted")).size
    assert(total === tags)
  }

  test("clean text passes through untouched with zero counts") {
    val r = statsOf("just plain words and a short 123 number")
    assert(r.getAs[Long]("n_emails") + r.getAs[Long]("n_ipv4") +
      r.getAs[Long]("n_phones") + r.getAs[Long]("n_idnums") === 0)
    assert(r.getAs[String]("redacted") === "just plain words and a short 123 number")
  }

  test("short digit runs (under 9) are kept — dates and quantities survive") {
    val r = statsOf("in 2024 we shipped 12345678 units")
    assert(r.getAs[Long]("n_idnums") === 0)
    assert(r.getAs[String]("redacted") === "in 2024 we shipped 12345678 units")
  }

  test("quarantine routes only documents over the PII budget") {
    val docs = Seq(
      (1L, "clean text"),
      (2L, "one a@b.co email"),
      (3L, "two a@b.co and 1.2.3.4 hits")).toDF("doc_id", "text")
    val q0 = Pii.quarantine(docs, maxPii = 0).select("doc_id").as[Long].collect().sorted
    assert(q0.toSeq === Seq(2L, 3L))
    val q1 = Pii.quarantine(docs, maxPii = 1).select("doc_id").as[Long].collect().sorted
    assert(q1.toSeq === Seq(3L))
  }

  test("kAnonymityClasses: class sizes and the sub-k verdict") {
    val rel = Seq(
      (1L, 10, "A"), (2L, 10, "A"), (3L, 10, "A"),
      (4L, 10, "B"), (5L, 20, "A")).toDF("id", "zip", "seg")
    val classes = Pii.kAnonymityClasses(rel, Seq("zip", "seg"), k = 2)
      .orderBy("zip", "seg")
      .select("zip", "seg", "class_size", "suppressed")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(classes.toSeq === Seq(
      (10, "A", 3L, false), (10, "B", 1L, true), (20, "A", 1L, true)))
  }

  test("kAnonymize drops exactly the rows of sub-k classes") {
    val rel = Seq(
      (1L, 10, "A"), (2L, 10, "A"), (3L, 10, "A"),
      (4L, 10, "B"), (5L, 20, "A")).toDF("id", "zip", "seg")
    val kept = Pii.kAnonymize(rel, Seq("zip", "seg"), k = 2)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 3L))
    // k above every class size suppresses everything
    assert(Pii.kAnonymize(rel, Seq("zip", "seg"), k = 10).count() === 0L)
  }

  test("redact equals the piiStats redacted column") {
    val docs = Seq((1L, "mail a@b.co ip 1.2.3.4 tel +7654321 id 987654321")).toDF("doc_id", "text")
    val viaRedact = docs.select(Pii.redact(col("text"))).as[String].collect().head
    val viaStats = Pii.piiStats(docs).select("redacted").as[String].collect().head
    assert(viaRedact === viaStats)
    assert(viaRedact === "mail <EMAIL> ip <IP> tel <PHONE> id <ID>")
  }
}
