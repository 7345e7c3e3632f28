package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable KLL quantile sketch aggregates (Apache DataSketches
  * `KllDoublesSketch`, the public wire format) — the QUANTILE analogue of
  * Spark's own `hll_sketch_agg` family, which Spark 4 does not ship for
  * quantiles. Implemented exactly the way Spark implements its
  * DataSketches HLL functions: a `TypedImperativeAggregate` whose buffer
  * is the heap sketch object (serialized only at shuffle boundaries —
  * never per row), so the aggregation is partial-aggregable map-side and
  * the PARTIAL STATE is the storable artifact [[graft.sources.KllStore]]
  * ledgers keep per day.
  *
  * Determinism note (why consumers compare ESTIMATES against a tolerance,
  * never sketch bytes or exact values): unlike HLL's register-max, KLL
  * compaction is randomized — two aggregations of the same data may
  * retain different items. The k=200 default carries ~1.65% normalized
  * rank error at 99% confidence; q255's `ledger_ok` bound (10% of the
  * week's value span, floor 100 e2 units) is ≥6x that for the uniform
  * event-value distribution, the q56/q252 "both engines check their own
  * estimator" oracle convention.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg needs a double column, got ${child.dataType}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of serialized KLL sketches — the range-query read path of a day
  * ledger: merge exactly the day sketches a window asks for, no raw
  * re-scan. Binary in, binary out, so merges CHAIN (week of days, month
  * of weeks) without ever touching the value stream again.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg needs a binary sketch column, got ${child.dataType}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"
  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Scalar quantile read off a serialized KLL sketch (INCLUSIVE search —
  * the library default and the nearest-rank-compatible convention).
  * NULL on an empty sketch (a quantile of zero values does not exist).
  */
case class KllQuantile(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile needs (binary sketch, double rank), got ${left.dataType}/${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sk: Any, rank: Any): Any =
    KllKernels.quantile(sk.asInstanceOf[Array[Byte]], rank.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val tmp = ctx.freshName("graftKllQ")
    nullSafeCodeGen(ctx, ev, (sk, rank) => s"""
      |java.lang.Double $tmp = graft.functions.KllKernels.quantile($sk, $rank);
      |if ($tmp == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $tmp.doubleValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}

/** Static kernel callable from generated Java. */
object KllKernels {
  def quantile(bytes: Array[Byte], rank: Double): java.lang.Double = {
    val sketch = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sketch.isEmpty) null
    else java.lang.Double.valueOf(
      sketch.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE))
  }
}
