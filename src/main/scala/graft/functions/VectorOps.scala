package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnGlue
import org.apache.spark.sql.types._

/** Native vector math over `array<float>` embedding columns.
  *
  * Same accumulation order as the `zip_with` + `aggregate` HOF
  * formulation (strict left-to-right double adds ⇒ bit-identical,
  * deterministic results — NativeFunctionsSpec asserts equality), but as
  * one JIT'd loop per row pair instead of per-element interpreted
  * lambdas, inside whole-stage codegen.
  */
object VectorOps {

  /** Dot product of two float-vector columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    ColumnGlue.column(DotProductF(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Imperative core (called from generated code). Lengths must match —
    * enforced upstream by construction (fixed-dim embedding columns). */
  def dotEval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** `dot_f(a, b)`: DoubleType dot product of two float arrays. */
case class DotProductF(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotEval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}
