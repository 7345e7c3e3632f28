package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed `Aggregator` — the user-facing custom
  * aggregation API (Aggregator → udaf()), demonstrating the
  * custom-aggregate tier alongside the native Expressions.
  *
  * Buffer is (Σ ln x, n); merge is associative+commutative so Spark can
  * partial-aggregate map-side and merge across partitions — the shape
  * every distributed aggregate needs at scale.
  */
final case class GeoMeanBuf(var sumLog: Double, var n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf = {
    b.sumLog += math.log(x); b.n += 1; b
  }
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf =
    GeoMeanBuf(a.sumLog + b.sumLog, a.n + b.n)
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
