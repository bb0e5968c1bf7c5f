package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[UnicodeNormalize]]: composition, singleton folding, compat forms,
  * idempotence, and SQL registration. Every non-ASCII character in this
  * file is a \u escape on purpose: composed and decomposed spellings
  * RENDER identically, so literal source glyphs would hide which byte
  * sequence each assertion means. */
class UnicodeNormalizeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val composedCafe = "caf\u00e9"
  private val decomposedCafe = "cafe\u0301"

  private def norm(s: String, form: String = "NFC"): String =
    Seq(s).toDF("t").select(UnicodeNormalize.normalize(col("t"), form)).head().getString(0)

  test("NFC composes combining marks and folds singletons") {
    assert(composedCafe !== decomposedCafe) // different bytes going in...
    assert(norm(decomposedCafe) === composedCafe) // ...same bytes coming out
    assert(norm("\u212b") === "\u00c5") // Angstrom sign -> A-with-ring
    assert(norm("\u1100\u1161") === "\uac00") // Hangul jamo -> syllable
  }

  test("NFC leaves compatibility characters; NFKC folds them") {
    assert(norm("\ufb01le") === "\ufb01le") // fi ligature survives NFC
    assert(norm("\ufb01le", "NFKC") === "file")
    assert(norm("\uff28\uff49", "NFKC") === "Hi") // fullwidth forms
    assert(norm("\u2460", "NFKC") === "1") // circled one
  }

  test("NFD decomposes what NFC composes; both are idempotent") {
    assert(norm(composedCafe, "NFD") === decomposedCafe)
    assert(norm(norm(decomposedCafe)) === composedCafe)
    assert(norm("plain ascii 123") === "plain ascii 123")
  }

  test("null propagates; unknown form rejected at construction") {
    val out = Seq(Option.empty[String]).toDF("t")
      .select(UnicodeNormalize.normalize(col("t"))).head()
    assert(out.isNullAt(0))
    intercept[IllegalArgumentException] {
      UnicodeNormalize.normalize(col("t"), "NFX")
    }
  }

  test("SQL registration: unicode_normalize works from spark.sql with and without a form") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT unicode_normalize('" + decomposedCafe +
        "'), unicode_normalize('\ufb01le', 'NFKC')")
      .head()
    assert(r.getString(0) === composedCafe)
    assert(r.getString(1) === "file")
  }

  test("dedup keys agree across composed and decomposed spellings after NFC") {
    val docs = Seq((1L, composedCafe + " au lait"), (2L, decomposedCafe + " au lait"))
      .toDF("doc_id", "text")
    val keys = docs.select(md5(UnicodeNormalize.normalize(col("text")))).distinct().count()
    assert(keys === 1L)
  }
}
