package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k banded minhash signatures of a whitespace-tokenized string in ONE
  * pass, as a native Catalyst expression.
  *
  * Semantics are exactly operators.Dedup's expression pipeline (and its
  * DuckDB oracle): word-3-gram shingles, md5 per shingle, first 8 hex
  * chars as a 32-bit int, then per band b the linear rehash
  * `(h·(2b+1) + 7919·b) mod (2³¹−1)`, min over shingles. The interpreted
  * higher-order-function chain walks the shingle array once per band and
  * allocates per lambda call; this kernel is one tight loop per row inside
  * whole-stage codegen — the difference between profiling your dedup job
  * and not noticing it, at 100 TB.
  */
case class MinHashSigs(child: Expression, bands: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && bands > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"minhash_sigs needs (string, bands>0), got ${child.dataType}/$bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // a non-null doc with fewer than 3 tokens has no shingles → null result
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.sigs(input.asInstanceOf[UTF8String], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // nullSafeCodeGen (not defineCodeGen): the kernel returns null for
    // shingle-less inputs even when the child is non-null, so isNull must
    // be re-derived from the call result
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MinHashKernel.sigs($c, $bands);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashKernel {
  private val Prime = 2147483647L
  private val md5 = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  def sigs(s: UTF8String, bands: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length < 3) return null
    val mins = Array.fill(bands)(Long.MaxValue)
    val digestor = md5.get()
    var i = 0
    while (i <= words.length - 3) {
      val shingle = words(i) + " " + words(i + 1) + " " + words(i + 2)
      digestor.reset()
      val d = digestor.digest(shingle.getBytes(StandardCharsets.UTF_8))
      // first 8 hex chars of the md5 == first 4 bytes, big-endian
      var h = 0L
      var b = 0
      while (b < 4) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      var k = 0
      while (k < bands) {
        val v = (h * (2 * k + 1) + 7919L * k) % Prime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
