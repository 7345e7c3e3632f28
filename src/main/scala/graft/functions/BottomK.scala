package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One bounded bottom-k input row: ordered lexicographically by
  * (k1, k2, v). `v` doubles as a payload slot (q94 carries `n_chars`
  * there); for pure-key selections pass a constant.
  */
final case class BKItem(k1: Long, k2: Long, v: Long)

/** The bounded buffer: at most k items, kept sorted ascending. */
final case class BKTop(items: Seq[BKItem])

/** Partial-aggregable bounded bottom-k — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(key).orderBy(...)) <= k`.
  *
  * The window form hash-distributes the ENTIRE input into |key| reducer
  * partitions; with a handful of keys (an LLM corpus has few sources)
  * that is a one-reducer-per-key serialization AQE cannot split. This
  * Aggregator keeps a size-≤k sorted buffer whose `merge` is associative
  * and commutative, so Spark partial-aggregates map-side (GeoMean's
  * pattern): every map task reduces its slice to ≤k rows and only those
  * size-k buffers shuffle — per-key selection never funnels corpus-scale
  * rows through one task. Selection keys are deterministic, so outputs
  * are bit-identical to the window formulation.
  *
  * `distinctK1 = true` additionally dedupes on `k1` (keeping the
  * smallest (k2, v) per k1) — the textbook bottom-k sketch definition
  * (each slot carries a unique hash value; see q95).
  *
  * Skip fast-path: once the buffer is full, any row ≥ the current k-th
  * returns the buffer untouched — O(log k) per row after warm-up.
  */
final case class BottomK(k: Int, distinctK1: Boolean)
    extends Aggregator[BKItem, BKTop, BKTop] {
  require(k >= 1, s"bottom-k needs k >= 1, got $k")

  private def lt(a: BKItem, b: BKItem): Boolean =
    a.k1 < b.k1 || (a.k1 == b.k1 &&
      (a.k2 < b.k2 || (a.k2 == b.k2 && a.v < b.v)))

  // first index whose item is >= x in the full (k1, k2, v) order
  private def lowerBound(items: Seq[BKItem], x: BKItem): Int = {
    val ix = items.toIndexedSeq
    var lo = 0
    var hi = ix.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (lt(ix(m), x)) lo = m + 1 else hi = m
    }
    lo
  }

  override def zero: BKTop = BKTop(Vector.empty)

  override def reduce(b: BKTop, x: BKItem): BKTop = {
    val items = b.items
    val i = lowerBound(items, x)
    if (distinctK1) {
      // same k1 already present and <= x: keep it; present and > x: replace
      if (i > 0 && items(i - 1).k1 == x.k1) return b
      if (i < items.length && items(i).k1 == x.k1)
        return BKTop(items.updated(i, x))
    }
    if (items.length >= k && i >= k) b
    else BKTop(((items.take(i) :+ x) ++ items.drop(i)).take(k))
  }

  override def merge(a: BKTop, b: BKTop): BKTop = {
    val x = a.items.toIndexedSeq
    val y = b.items.toIndexedSeq
    val out = Vector.newBuilder[BKItem]
    var n = 0
    var i = 0
    var j = 0
    var lastK1 = 0L
    var haveLast = false
    while (n < k && (i < x.length || j < y.length)) {
      val pick =
        if (j >= y.length || (i < x.length && lt(x(i), y(j)))) { val t = x(i); i += 1; t }
        else { val t = y(j); j += 1; t }
      // equal-k1 items are adjacent in the merged order, so dedup is local
      if (!(distinctK1 && haveLast && lastK1 == pick.k1)) {
        out += pick
        n += 1
        lastK1 = pick.k1
        haveLast = true
      }
    }
    BKTop(out.result())
  }

  override def finish(b: BKTop): BKTop = b
  override def bufferEncoder: Encoder[BKTop] = Encoders.product[BKTop]
  override def outputEncoder: Encoder[BKTop] = Encoders.product[BKTop]
}

object BottomK {
  /** Column form: a struct<items: array<struct<k1, k2, v>>> aggregate of
    * the k smallest (k1, k2, v) rows per group, sorted ascending.
    */
  def agg(k: Int, distinctK1: Boolean)(k1: Column, k2: Column, v: Column): Column =
    udaf(BottomK(k, distinctK1), Encoders.product[BKItem]).apply(k1, k2, v)
}
