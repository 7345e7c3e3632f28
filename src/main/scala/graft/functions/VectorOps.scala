package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two embedding arrays as a native Catalyst
  * expression with codegen.
  *
  * Accumulates dot and both norms in double, strictly left-to-right, with
  * exact float→double widening — bit-identical to the reference formula
  * `Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²)` evaluated sequentially (what the DuckDB
  * oracle computes). One fused loop per pair instead of three interpreted
  * higher-order-function passes: this is the hot kernel of every
  * similarity operator at scale.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
          (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim needs two float[] or two double[] arrays, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isFloat) VectorKernels.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorKernels.cosineDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "cosineFloat" else "cosineDouble"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Static kernels callable from generated Java. */
object VectorKernels {
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Column-API surface for the graft native functions. */
object GraftFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  def simhash64(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))

  def minhash_sigs(c: Column, bands: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(c), bands))

  def shingle_set(c: Column): Column =
    Bridge.column(ShingleSet(Bridge.expression(c)))

  def byte_histogram(c: Column): Column =
    Bridge.column(ByteHistogram(Bridge.expression(c)))

  /** Bit-parallel exact Levenshtein — value-identical to the built-in
    * `levenshtein` for every input (see [[EditDistance]]).
    */
  def levenshtein_bp(a: Column, b: Column): Column =
    Bridge.column(EditDistance(Bridge.expression(a), Bridge.expression(b)))

  def byte_runs(c: Column): Column =
    Bridge.column(ByteRuns(Bridge.expression(c)))

  def subword_count(c: Column): Column =
    Bridge.column(SubwordCount(Bridge.expression(c)))

  def json_key_paths(c: Column): Column =
    Bridge.column(JsonKeyPaths(Bridge.expression(c)))

  /** Spark's native Bloom-filter aggregate (the engine's own runtime-join-
    * filter sketch) over a LONG column — binary-serialized filter out.
    * Not SQL-registered upstream, so bridged here for the q107 delta-dedup
    * pre-pass.
    */
  def bloom_agg(c: Column, expectedItems: Long): Column =
    Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        Bridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems))
        .toAggregateExpression())

  /** Membership probe against a CONSTANT serialized Bloom filter (the
    * expression requires a foldable/scalar-subquery filter side — the same
    * contract Spark's InjectRuntimeFilter satisfies by evaluating the
    * build-side subquery first).
    */
  def bloom_might_contain(bloom: Column, value: Column): Column =
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Bridge.expression(bloom), Bridge.expression(value)))

  /** Mergeable KLL quantile sketch over a double column (DataSketches
    * wire format; k=200 ≈ 1.65% rank error) — see [[KllSketchAgg]].
    */
  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Union of serialized KLL sketches — the day-ledger range read. */
  def kll_merge_agg(c: Column, k: Int = 200): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Quantile estimate off a serialized KLL sketch (INCLUSIVE). */
  def kll_quantile(c: Column, rank: Double): Column =
    Bridge.column(KllQuantile(
      Bridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(rank)))

  /** Register the SQL-callable names on an existing session (the
    * extension-free path used by tests and the driver mains).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("simhash64", exprs => SimHash64(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "minhash_sigs",
      exprs => MinHashSigs(exprs(0), exprs(1).eval().asInstanceOf[Int]),
      "built-in")
    registry.createOrReplaceTempFunction("shingle_set", exprs => ShingleSet(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("byte_histogram", exprs => ByteHistogram(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("subword_count", exprs => SubwordCount(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("json_key_paths", exprs => JsonKeyPaths(exprs.head), "built-in")
  }
}
