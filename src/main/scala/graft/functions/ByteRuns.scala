package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Sequential-structure statistics of a payload in ONE pass over its
  * bytes: `[adjacent_equal_pairs, n_runs, max_run_len, distinct_bigrams]`
  * — the inputs a compression advisor needs (RLE gain is a run count,
  * order-1 modeling gain is bigram richness). The list-expression form
  * (`transform(sequence(2, n), i -> substr(s, i, 1) = substr(s, i-1, 1))`)
  * hides the same O(n²) substring rescan [[ByteHistogram]] documents;
  * this kernel walks the byte array once with an 8 KiB bigram bitmap.
  * Codegen-friendly (static call, same shape as the other kernels).
  */
case class ByteRuns(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"byte_runs needs a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_runs"

  override def nullSafeEval(input: Any): Any =
    ByteRunsKernel.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteRunsKernel.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteRuns =
    copy(child = newChild)
}

object ByteRunsKernel {
  def stats(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var adj = 0L
    var runs = if (n == 0) 0L else 1L
    var maxRun = if (n == 0) 0L else 1L
    var cur = 1L
    val seen = new Array[Boolean](65536)
    var distinct = 0L
    var i = 1
    while (i < n) {
      if (bytes(i) == bytes(i - 1)) {
        adj += 1; cur += 1
        if (cur > maxRun) maxRun = cur
      } else { runs += 1; cur = 1 }
      val bg = ((bytes(i - 1) & 0xff) << 8) | (bytes(i) & 0xff)
      if (!seen(bg)) { seen(bg) = true; distinct += 1 }
      i += 1
    }
    new GenericArrayData(Array(adj, runs, maxRun, distinct))
  }
}
