package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-length expression for the compression-ratio quality signal.
  *
  * `deflate_len(text)` = the byte length of zlib-deflating the UTF-8
  * text at a FIXED level — the classic repetitiveness/quality signal
  * (highly repetitive or templated text compresses far below natural
  * prose; pure noise barely compresses at all). Pipelines threshold the
  * ratio `deflate_len / n_bytes` from both sides (CCNet-style).
  *
  * Native codegen'd expression per the custom-operator preference order:
  * one `Deflater` round per row inside whole-stage codegen, no UDF
  * serialization. The Deflater is allocated per call and `end()`ed in a
  * finally — zlib native memory must not wait for the GC. Level is
  * pinned (6) so results are a function of the text and the zlib build
  * alone; cross-engine recomputation isn't possible (DuckDB has no
  * deflate), so the gate pins a committed golden digest instead
  * ([[graft.SparkEntry]] `compression_signal`).
  */
object Compress {

  /** Fixed compression level: results must not vary with a default. */
  val Level = 6

  def deflateLen(text: Column): Column =
    ColumnGlue.column(DeflateLength(ColumnGlue.expression(text)))

  /** Deflated byte count of `bytes` at [[Level]], raw deflate stream
    * (nowrap — no zlib header, so the count is pure compressed body). */
  def deflateLenEval(input: UTF8String): Long = {
    val bytes = input.getBytes
    val d = new Deflater(Level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** `deflate_len(text)`: LongType deflated size of the UTF-8 bytes. */
case class DeflateLength(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    Compress.deflateLenEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Compress.deflateLenEval($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}
