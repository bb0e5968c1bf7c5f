package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnGlue
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass language-ID expression.
  *
  * Same math as the HOF formulation in [[graft.operators.TextAnalysis]]
  * (kept there as `languageIdHof`, asserted bit-identical by
  * NativeFunctionsSpec) and as the DuckDB oracle: whitespace tokens of
  * `trim(lower(text))` counted against four function-word lists, CJK by
  * codepoint class, ties resolved in en→de→fr→es order with
  * strictly-greater wins. The HOF form interprets one lambda per
  * (token × language); this runs one JIT'd pass per row inside
  * whole-stage codegen.
  */
object LangId {

  def languageId(text: Column): Column =
    ColumnGlue.column(LangIdExpr(ColumnGlue.expression(text)))

  private val En = Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "was")
  private val De = Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von")
  private val Fr = Set("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans")
  private val Es = Set("el", "la", "los", "y", "es", "no", "por", "que", "una", "para")

  private val ZhResult = UTF8String.fromString("zh")
  private val UnknownResult = UTF8String.fromString("unknown")
  private val EnResult = UTF8String.fromString("en")
  private val DeResult = UTF8String.fromString("de")
  private val FrResult = UTF8String.fromString("fr")
  private val EsResult = UTF8String.fromString("es")

  /** Imperative core (called from generated code). */
  def eval(input: UTF8String): UTF8String = {
    val original = input.toString
    // CJK first: one codepoint in the unified-ideograph block decides
    var i = 0
    while (i < original.length) {
      val c = original.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) return ZhResult
      i += 1
    }
    val tokens = input.toLowerCase.trim().toString.split("\\s+", -1)
    var e = 0; var d = 0; var f = 0; var s = 0
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (En.contains(tok)) e += 1
      if (De.contains(tok)) d += 1
      if (Fr.contains(tok)) f += 1
      if (Es.contains(tok)) s += 1
      t += 1
    }
    if (e == 0 && d == 0 && f == 0 && s == 0) UnknownResult
    else if (s > e && s > d && s > f) EsResult
    else if (f > e && f > d) FrResult
    else if (d > e) DeResult
    else EnResult
  }
}

/** `lang_id(text)`: StringType language code. */
case class LangIdExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangId.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangId.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
