package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product — the
  * hottest scalar kernel in the similarity family (n×C scoring in IVF,
  * per-candidate scoring in k-NN/LSH).
  *
  * Why an Expression and not a UDF: the UDF path deserializes each
  * array to `Seq[Double]` (boxing every element) and breaks
  * whole-stage codegen at the call site. `doGenCode` here emits a
  * static call that reads primitive doubles straight out of the
  * columnar `ArrayData`, so the kernel fuses into the generated loop.
  * The arithmetic is the IDENTICAL left-to-right multiply-add fold as
  * the previous UDF and the DuckDB oracle's `list_dot_product`, so
  * every oracle hash is unchanged.
  *
  * Registered for SQL as `dot_product(a, b)` via [[graft.GraftExtensions]].
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductExpr.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {

  /** Primitive-reading kernel shared by interpreted eval and codegen.
    * Left-to-right index-order fold — bitwise identical to the oracle.
    * Fails loudly on ragged or null-element input: ArrayData.getDouble
    * would otherwise silently read 0.0 for a null slot (the SQL
    * function is session-wide, so arbitrary arrays can reach it). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product: length mismatch ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"dot_product: null element at index $i")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Column-API entry point: `dot_product($"a", $"b")`. */
  def dot_product(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
