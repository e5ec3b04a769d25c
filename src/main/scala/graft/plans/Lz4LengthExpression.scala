package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** `lz4_len(content BINARY) → LONG` — a scalar Catalyst expression with
  * real codegen (no UDF serialization, stays inside whole-stage codegen):
  * the LZ4-compressed size of a blob, the kernel behind the
  * compressibility quality signal. Generated code calls the Scala
  * object's static forwarder directly; the compressor is shared and
  * thread-safe with a per-thread destination buffer ([[graft.cdc.Lz4Len]]).
  */
final case class Lz4Length(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lz4_len requires BINARY input, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    graft.cdc.Lz4Len(input.asInstanceOf[Array[Byte]]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(long) graft.cdc.Lz4Len.apply($c, 0, $c.length)")

  override protected def withNewChildInternal(newChild: Expression): Lz4Length =
    copy(child = newChild)
}

object Lz4Length {
  /** Column-level API: `df.select(lz4_len(encode($"text", "UTF-8")))`. */
  def lz4_len(content: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      Lz4Length(org.apache.spark.sql.GraftBridge.expression(content)))
}
