package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions with code generation — these stay inside
  * whole-stage codegen (the generated Java calls the static HashKernels
  * methods), so the fingerprint/simhash hot path pays no iterator or boxing
  * overhead. Preference order per the project brief: native Expression over
  * UDF. */

/** 64-bit content fingerprint of a string (whitespace-normalized, ASCII
  * case-folded rolling hash; see HashKernels.fingerprint64). */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 expects STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.fingerprint64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.fingerprint64($c)")
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(c)
}

/** SimHash signature of a token array (array<string> → long). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.simhash64(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

object expressions {
  /** Column wrappers (Spark 4: Column ↔ Expression via classic ExpressionUtils). */
  def fingerprint64(c: Column): Column =
    ColumnBridge.column(Fingerprint64(ColumnBridge.expression(c)))
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}
