package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized string as a native Catalyst
  * expression.
  *
  * Semantics: FNV-1a 64-bit hash per token, bit-majority vote across
  * tokens (ties set the bit) — the classic Charikar simhash over an
  * unweighted token multiset. Runs inside whole-stage codegen via a
  * static call, so at 100 TB it costs one tight JVM loop per row next to
  * the scan — no UDF serialization, no interpreter dispatch.
  *
  * This is the scale path of the oracle-checked 16-bit variant in
  * operators.Dedup.q39 (same construction, wider hash, one pass).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash64 needs a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // also null for a zero-token (empty/whitespace-only) document — a
  // simhash of "no tokens" is not 0L (that would collide every empty doc
  // into one all-blocks bucket); null drops the doc from blocking, which
  // is what the q63 oracle's WHERE w <> '' does
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.computeOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("simhash")
      s"""java.lang.Long $tmp = graft.functions.SimHashImpl.computeOrNull($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Static kernel shared by interpreted eval and generated code. */
object SimHashImpl {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Null for a zero-token input (see SimHash64.nullable), else the hash. */
  def computeOrNull(s: UTF8String): java.lang.Long = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) == ' ') i += 1
    if (i == bytes.length) null else java.lang.Long.valueOf(compute(s))
  }

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    var nTokens = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      // skip separator run
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        var h = FnvOffset
        while (i < n && bytes(i) != ' ') {
          h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
          i += 1
        }
        nTokens += 1
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
    }
    if (nTokens == 0) return 0L
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2 * counts(b) >= nTokens) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two simhashes (dup candidates ≤ k bits). */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
