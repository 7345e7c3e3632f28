package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingles of a whitespace-tokenized string in one
  * pass — native replacement for
  * `array_distinct(transform(sequence(...), i -> concat(...)))`, which
  * evaluates interpreted per element with three `element_at` probes and a
  * quadratic-ish distinct. First-occurrence order preserved (same content
  * as array_distinct); downstream consumers are set-semantic (explode →
  * join / count), so order never reaches a result.
  */
case class ShingleSet(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"shingle_set needs a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.distinctShingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ShingleKernel.distinctShingles($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleKernel {
  def distinctShingles(s: UTF8String): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length < 3) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= words.length - 3) {
      seen.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
