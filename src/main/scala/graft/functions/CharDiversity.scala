package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-diversity counts: over the LETTERS of the text
  * (A–Z folded to a–z, everything else ignored) emit
  * `struct<n_alpha: long, c2_sum: long>` where `n_alpha` is the letter
  * count and `c2_sum` = Σ count(letter)². The Simpson diversity index
  * 1 − c2_sum/n_alpha² — the no-logarithm cousin of character entropy —
  * falls out as one exact double division: a low-diversity document
  * (keyboard mash, repeated boilerplate, single-character floods) scores
  * near 0 while normal prose sits near 1/26-adjusted values, making this
  * the cheap quality-filter signal alongside
  * [[TextStats]]' ratio family. Integer outputs keep the gate hash-exact;
  * the division lives in the query so engines can't disagree on a log.
  *
  * One JIT'd pass, 26 counters on the stack — no explode, no per-char
  * rows; at 100 TB this is a codegen'd projection inside the scan stage. */
object CharDiversity {

  def charDiversity(text: Column): Column =
    ColumnGlue.column(CharDiversityExpr(ColumnGlue.expression(text)))

  /** Imperative core (called from generated code). */
  def eval(input: UTF8String): InternalRow = {
    val text = input.toString
    val counts = new Array[Long](26)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z') counts(c - 'a') += 1
      else if (c >= 'A' && c <= 'Z') counts(c - 'A') += 1
      i += 1
    }
    var n = 0L
    var c2 = 0L
    var j = 0
    while (j < 26) {
      n += counts(j)
      c2 += counts(j) * counts(j)
      j += 1
    }
    new GenericInternalRow(Array[Any](n, c2))
  }
}

/** `char_diversity(text)`: struct<n_alpha: long, c2_sum: long>. */
case class CharDiversityExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_alpha", LongType, nullable = false),
    StructField("c2_sum", LongType, nullable = false)))
  override def prettyName: String = "char_diversity"

  override protected def nullSafeEval(input: Any): Any =
    CharDiversity.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharDiversity.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): CharDiversityExpr =
    copy(child = newChild)
}
