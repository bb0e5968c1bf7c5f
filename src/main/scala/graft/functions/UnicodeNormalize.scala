package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the very
  * first step of any multilingual corpus pipeline (CCNet normalizes
  * before hashing; every dedup key and every tokenizer disagrees with
  * itself if `café` composed and `cafe´` decomposed hash differently).
  * Spark ships no normalizer builtin, so this wraps
  * `java.text.Normalizer` (ICU-less JDK NFC/NFD/NFKC/NFKD — the
  * standard Unicode algorithm) behind a `UnaryExpression` with
  * `doGenCode`, keeping the hot path inside whole-stage codegen like
  * [[CharDiversity]].
  *
  * NFC round-trips bit-exactly against DuckDB's `nfc_normalize`, which
  * is what lets the `nfc_normalize` gate hash cross-engine; the compat
  * forms (NFKC — the one tokenizer pipelines usually want, it folds
  * ligatures and width variants) carry spec coverage instead since the
  * oracle engine only exposes NFC. Pure projection: zero shuffles. */
object UnicodeNormalize {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(text: Column, form: String = "NFC"): Column =
    ColumnGlue.column(UnicodeNormalizeExpr(ColumnGlue.expression(text), form))

  /** Imperative core (called from generated code). Already-normalized
    * strings (the overwhelming common case — ASCII passes the quick
    * check in O(n) without allocating) return the input unchanged.
    * The form arrives as its enum ORDINAL — resolved once at plan time,
    * not a per-row valueOf string lookup on the hot path. */
  def eval(input: UTF8String, formOrdinal: Int): UTF8String = {
    val s = input.toString
    val f = FormsByOrdinal(formOrdinal)
    if (Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }

  /** Stable ordinal → Form table (index = Normalizer.Form.ordinal). */
  val FormsByOrdinal: Array[Normalizer.Form] = Normalizer.Form.values()
}

/** `unicode_normalize(text, form)`: the normalized string. */
case class UnicodeNormalizeExpr(child: Expression, form: String)
  extends UnaryExpression with ExpectsInputTypes {

  require(UnicodeNormalize.Forms.contains(form),
    s"unknown normalization form $form (one of ${UnicodeNormalize.Forms.mkString(", ")})")

  // resolved ONCE here; eval/codegen pass the ordinal, never the string
  private val formOrdinal: Int = Normalizer.Form.valueOf(form).ordinal

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.eval(input.asInstanceOf[UTF8String], formOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormalize.eval($c, $formOrdinal)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}
