package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bin byte histogram of a payload in one pass over its bytes.
  *
  * The expression form `transform(sequence(1, n), i -> ascii(substr(s, i,
  * 1)) div 16)` hides an O(n²): UTF8String.substring rescans from the
  * start for multi-byte safety, so a 550-char doc costs ~150k byte reads.
  * This kernel walks the byte array once. Bin = byte >>> 4 (identical to
  * `ascii // 16` for 7-bit corpora the oracle computes over).
  */
case class ByteHistogram(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"byte_histogram needs a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(input: Any): Any =
    ByteHistogramKernel.hist(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteHistogramKernel.hist($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

object ByteHistogramKernel {
  def hist(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val bins = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xff) >>> 4) += 1
      i += 1
    }
    new GenericArrayData(bins)
  }
}
