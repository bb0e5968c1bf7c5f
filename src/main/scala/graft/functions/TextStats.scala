package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text quality statistics.
  *
  * Same math as the HOF formulations in [[graft.operators.TextAnalysis]]
  * (alphaRatio / punctRatio / stopwordRatio / meanTokenLen, kept there as
  * the executable reference and asserted bit-identical by
  * NativeFunctionsSpec) and as the DuckDB oracle. All four ratios are
  * exact rational values (integer counts divided as doubles), so native
  * and HOF agree bit-for-bit. One JIT'd pass per row instead of one
  * interpreted lambda per token per metric.
  */
object TextStats {

  def textStats(text: Column): Column =
    ColumnGlue.column(TextStatsExpr(ColumnGlue.expression(text)))

  private val Stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.operators.TextAnalysis.EnglishStopwords.foreach(s.add)
    s
  }

  /** Imperative core (called from generated code). */
  def eval(input: UTF8String): InternalRow = {
    val text = input.toString
    val totalChars = text.codePointCount(0, text.length)
    var alpha = 0
    var punct = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha += 1
      if (c == '.' || c == '!' || c == '?') punct += 1
      i += 1
    }
    val alphaRatio = if (totalChars == 0) 0.0 else alpha.toDouble / totalChars
    val punctRatio = if (totalChars == 0) 0.0 else punct.toDouble / totalChars

    val tokens = input.trim().toString.split("\\s+", -1)
    var stop = 0
    var lenSum = 0L
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (Stopwords.contains(tok)) stop += 1
      lenSum += tok.codePointCount(0, tok.length)
      t += 1
    }
    val n = tokens.length // split never yields an empty array
    new GenericInternalRow(Array[Any](
      alphaRatio, punctRatio, stop.toDouble / n, lenSum.toDouble / n))
  }
}

/** `text_stats(text)`: struct<alpha_ratio, punct_ratio, stopword_ratio,
  * mean_token_len> doubles. */
case class TextStatsExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("mean_token_len", DoubleType, nullable = false)))
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}
