package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression probing a broadcast
  * [[org.apache.spark.util.sketch.BloomFilter]] for a string key —
  * the narrow filter step of the decontamination pipeline
  * ([[graft.text.TextAnalysis.evalDecontaminationBloom]]).
  *
  * Why an Expression and not a UDF: the UDF path converts every
  * UTF8String to a boxed java.lang.String through the encoder and
  * breaks whole-stage codegen at the call site. `doGenCode` here
  * emits a static call that hands the raw UTF-8 bytes straight to
  * `mightContainBinary`, fusing the probe into the generated loop.
  *
  * Bit-equivalence: Spark's `bloom_filter_agg` inserts StringType
  * values via `BinaryUpdater` = `putBinary(UTF8String.getBytes)`
  * (spark-catalyst BloomFilterAggregate), and
  * `mightContainString(s)` is defined as
  * `mightContainBinary(utf8 bytes of s)` — so probing with
  * `mightContainBinary(getBytes)` returns the identical boolean for
  * every key as the previous `mightContainString` UDF.
  *
  * The filter rides an ordinary Spark broadcast (torrent transport,
  * one copy per executor), so the expression serializes a handle,
  * not the bit array — plan-size stays O(1) regardless of filter
  * width, which matters once the filter is the ~1 GB 10^10-shingle
  * form described in the scaladoc of `evalDecontaminationBloom`.
  */
case class BloomProbeExpr(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_probe requires a string argument, got ${dt.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(v: Any): Any =
    BloomProbeExpr.contains(bloom, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBroadcast", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomProbeExpr.contains($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
}

object BloomProbeExpr {

  /** Shared by interpreted eval and codegen: probe with the raw UTF-8
    * bytes — the exact byte stream `BinaryUpdater` inserted. */
  def contains(b: Broadcast[BloomFilter], s: UTF8String): Boolean =
    b.value.mightContainBinary(s.getBytes)

  /** Column-API entry point: `bloom_probe($"s", bloomBroadcast)`. */
  def bloom_probe(c: Column, b: Broadcast[BloomFilter]): Column =
    GraftSqlBridge.column(BloomProbeExpr(GraftSqlBridge.expression(c), b))
}
