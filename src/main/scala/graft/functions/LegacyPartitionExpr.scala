package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Partitioning

/** Native Catalyst expression for the reference's shuffle-routing
  * function `floor(sha1(key)·N / (2^160−1))`
  * (`job/WordCountContext.java:87-91,140-147`), with whole-stage
  * codegen: `doGenCode` emits a direct static call, so the expression
  * participates in the fused generated loop instead of breaking it the
  * way a Scala UDF's boxing/closure dispatch would. Evaluation
  * delegates to [[graft.operators.Partitioning.legacyPartition]] — the
  * BigInteger math is exact, not a truncated-hex approximation.
  */
case class LegacyPartitionExpr(child: Expression, numWorkers: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "legacy_partition"

  override def nullSafeEval(key: Any): Any =
    Partitioning.legacyPartition(key.asInstanceOf[UTF8String].toString, numWorkers)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.Partitioning.legacyPartition($c.toString(), $numWorkers)")

  override protected def withNewChildInternal(newChild: Expression): LegacyPartitionExpr =
    copy(child = newChild)
}

object LegacyPartitionExpr {
  /** Column-API entry point: `legacy_partition($"key", 4)`. */
  def legacy_partition(key: Column, numWorkers: Int): Column =
    GraftSqlBridge.column(LegacyPartitionExpr(GraftSqlBridge.expression(key), numWorkers))
}
