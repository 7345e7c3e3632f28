package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Levenshtein distance, bit-parallel (Myers 1999; Hyyrö 2003's
  * blocked formulation) — value-identical to the engine's built-in
  * `levenshtein`, ~20× less work on the strings that dominate q129's
  * verify pass.
  *
  * Why: q129's kernel is an exact (2·capWords)²-cell DP per candidate
  * pair; at capWords=128 that is 65k cell updates per pair and the single
  * hottest per-task loop in the dedup family. Myers' algorithm computes
  * the SAME unit-cost edit distance by carrying each DP column as two
  * 64-bit delta bitmasks (Pv/Mv), so a column transition is ~15 word ops
  * per 64 pattern rows — ⌈256/64⌉·256 word ops per pair instead of 65k
  * cell updates, with no approximation anywhere (guide §1.2: once the
  * plan shape is right, make the per-task kernel fast).
  *
  * Exactness contract: the bit-parallel path runs only when BOTH inputs
  * are pure ASCII (numBytes == numChars — q129's compressed word strings
  * are printable-ASCII by construction); anything else falls back to
  * `UTF8String.levenshteinDistance`, the built-in's own kernel, so the
  * expression is value-identical to `levenshtein(a, b)` for EVERY input
  * (EditDistanceSpec pins equality on randomized and adversarial cases,
  * including the 64/128/192/256-bit block boundaries).
  */
case class EditDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"levenshtein_bp needs string inputs, got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "levenshtein_bp"

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceKernel.lev(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.EditDistanceKernel.lev($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistance =
    copy(left = newLeft, right = newRight)
}

object EditDistanceKernel {
  /** Myers/Hyyrö bit-parallel unit-cost edit distance over ASCII bytes;
    * code-point fallback keeps non-ASCII inputs identical to the built-in.
    */
  def lev(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    if (ab.length != a.numChars() || bb.length != b.numChars())
      return a.levenshteinDistance(b)
    // pattern = the shorter side: fewer 64-row blocks per text column
    val (p, t) = if (ab.length <= bb.length) (ab, bb) else (bb, ab)
    val m = p.length
    val n = t.length
    if (m == 0) return n
    val blocks = (m + 63) >> 6
    // Peq[c·blocks + r]: mask of pattern positions in block r holding byte c
    val peq = new Array[Long](128 * blocks)
    var i = 0
    while (i < m) {
      peq((p(i) & 0x7f) * blocks + (i >> 6)) |= 1L << (i & 63)
      i += 1
    }
    val pv = new Array[Long](blocks)
    val mv = new Array[Long](blocks)
    java.util.Arrays.fill(pv, -1L)
    val lastMask = 1L << ((m - 1) & 63)
    val highBit = 1L << 63
    var score = m
    var j = 0
    while (j < n) {
      val base = (t(j) & 0x7f) * blocks
      // horizontal delta entering block 0 is +1 every column (the
      // Levenshtein boundary D[0][j] = j; Myers' SEARCH variant omits it)
      var hin = 1
      var r = 0
      while (r < blocks) {
        var eq = peq(base + r)
        val pvr = pv(r)
        val mvr = mv(r)
        val xv = eq | mvr
        if (hin < 0) eq |= 1L
        val xh = (((eq & pvr) + pvr) ^ pvr) | eq
        var ph = mvr | ~(xh | pvr)
        var mh = pvr & xh
        // carries between blocks ride bit 63 (row (r+1)·64); the LAST
        // block scores at the pattern's true last row instead — junk bits
        // above it can never contaminate lower bits (adds carry upward)
        val mask = if (r == blocks - 1) lastMask else highBit
        val hout = (if ((ph & mask) != 0L) 1 else 0) - (if ((mh & mask) != 0L) 1 else 0)
        ph <<= 1
        mh <<= 1
        if (hin > 0) ph |= 1L else if (hin < 0) mh |= 1L
        pv(r) = mh | ~(xv | ph)
        mv(r) = ph & xv
        hin = hout
        r += 1
      }
      score += hin
      j += 1
    }
    score
  }
}
