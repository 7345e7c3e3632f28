package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic subword tokenization: greedy longest-match (maximal
  * munch) over a fixed merge vocabulary — the BPE inference rule with the
  * merge table frozen at build time, replacing q32's ~4-chars/token
  * estimate with a real token count that q80's packing bins can trust.
  *
  * Rules: whitespace is a boundary (never a token), at each position the
  * longest vocabulary unit starting there is consumed as one token, any
  * unmatched character is its own single-char token. Because the vocab is
  * priority-ordered longest-first, maximal munch is EXACTLY equivalent to
  * a single left-to-right pass of `regexp_replace(text, '(u1|u2|…)', '#')`
  * (leftmost scan, first-listed — i.e. longest — alternative wins), which
  * is how the DuckDB oracle reproduces the count in closed form:
  * `tokens = length(after_replace) − n_spaces`.
  *
  * One tight loop per row inside whole-stage codegen; O(1) per character
  * (packed-int lookups, no allocation). Same native-kernel pattern as
  * [[MinHashSigs]].
  */
case class SubwordCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"subword_count needs string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_count"

  override def nullSafeEval(input: Any): Any =
    SubwordKernel.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordKernel.count($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

object SubwordKernel {

  /** The merge vocabulary, priority-ordered longest-first (order is part
    * of the contract — the oracle regex alternation is rendered from this
    * exact sequence). Units are the highest-frequency English tri/bigrams
    * from classic letter-frequency tables — a stand-in BPE merge table
    * that is deterministic and public.
    */
  val units: Seq[String] = Seq(
    // trigrams
    "the", "and", "ing", "ion", "ent", "her", "for", "tha",
    "ere", "tio", "ter", "est", "ers", "ati", "hat", "ate",
    // bigrams
    "th", "he", "in", "er", "an", "re", "on", "at",
    "en", "nd", "ti", "es", "or", "te", "of", "ed",
    "is", "it", "al", "ar", "st", "to", "nt", "ng",
    "se", "ha", "as", "ou", "le", "ve", "me", "ro")

  /** The oracle-side alternation, e.g. `(the|and|…|ro)`. */
  val regexAlternation: String = units.mkString("(", "|", ")")

  // packed-int membership tables: ascii-only (guarded), so a trigram key
  // is < 2^21 and a bigram key < 2^14 — O(1) array probes, cache-resident
  private val tri = new Array[Boolean](1 << 21)
  private val bi = new Array[Boolean](1 << 14)
  units.foreach { u =>
    if (u.length == 3) tri((u.charAt(0) << 14) | (u.charAt(1) << 7) | u.charAt(2)) = true
    else bi((u.charAt(0) << 7) | u.charAt(1)) = true
  }

  def count(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var i = 0
    var tokens = 0L
    while (i < n) {
      val c0 = str.charAt(i)
      if (c0 == ' ') { i += 1 }
      else if (c0 < 128 && i + 2 < n && str.charAt(i + 1) < 128 && str.charAt(i + 2) < 128
          && tri((c0 << 14) | (str.charAt(i + 1) << 7) | str.charAt(i + 2))) {
        tokens += 1; i += 3
      } else if (c0 < 128 && i + 1 < n && str.charAt(i + 1) < 128
          && bi((c0 << 7) | str.charAt(i + 1))) {
        tokens += 1; i += 2
      } else {
        // one token per CODE POINT, not per UTF-16 unit: a supplementary
        // char (surrogate pair) must count once, as the oracle's
        // length()-based closed form counts code points
        tokens += 1
        i += (if (Character.isHighSurrogate(c0) && i + 1 < n
                  && Character.isLowSurrogate(str.charAt(i + 1))) 2
              else 1)
      }
    }
    tokens
  }
}
