package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{
  AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 scale-probe source — a deterministic documents-shaped
  * generator table (`spark.read.format("graft.sources.SynthSource")
  * .option("rows", n).option("partitions", p)`) built on the public
  * connector API: TableProvider → SupportsRead → ScanBuilder with BOTH
  * pushdown mix-ins.
  *
  * Why it exists: the 100 TB design story needs a way to drive
  * cluster-shaped load without 100 TB of storage. This source plans `p`
  * independent InputPartitions over the doc_id range and generates each
  * row from splitmix64(doc_id) alone — any subset of the range produces
  * identical rows on any executor, so scans are retry-safe and
  * shuffle-free by construction (the reference's synthetic fixtures in
  * tests/stac_generators.py are the same idea at unit scale).
  *
  * Pushdown is REAL, not cosmetic:
  *  - SupportsPushDownRequiredColumns: only requested columns are
  *    generated — a doc_id-only scan never materializes text (the
  *    generator's cost is per-column, exactly like a columnar reader).
  *  - SupportsPushDownFilters: range/equality filters on doc_id narrow
  *    the PLANNED range — partitions outside [lo, hi) are never created,
  *    the file-pruning analogue. Accepted filters are consumed (removed
  *    from Spark's post-scan evaluation); everything else is declined and
  *    stays above the scan.
  *
  * SourcesSpec pins: row counts under pushed ranges, column-pruned
  * schemas, partition-count planning, cross-read determinism, and the
  * pushed-filter list surfacing in `description()`.
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val Vocab: Array[String] =
    "key agg row scan slow fast table value part hash merge batch spark line sort window join shuffle block cache".split(" ")
  private val Langs = Array("en", "de", "fr", "und")

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def textOf(id: Long): String = {
    val n = 8 + (math.floorMod(mix64(id), 25L)).toInt
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(Vocab(math.floorMod(mix64(id * 31 + k), Vocab.length.toLong).toInt))
      k += 1
    }
    sb.toString
  }

  def langOf(id: Long): String = Langs(math.floorMod(mix64(id ^ 0x5bf0L), Langs.length.toLong).toInt)
  def sourceOf(id: Long): String = "src" + math.floorMod(mix64(id ^ 0xa11ceL), 5L)
}

private[sources] class SynthTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions)
}

private[sources] class SynthScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = SynthSource.schema
  private var lo: Long = 0L
  private var hi: Long = rows
  private var accepted: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None

  // COUNT/MIN/MAX over the planned id range have CLOSED FORMS (count =
  // hi−lo, min = lo, max = hi−1; every generated column is non-null, so
  // a plain COUNT(col) counts rows too) — the aggregate-pushdown
  // analogue of a columnar footer read: the scan answers the query from
  // PLANNING METADATA and generates zero rows. Complete pushdown only
  // (no groupBy, no DISTINCT); anything else is declined and Spark
  // aggregates above the scan as usual.
  private def answers(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case c: Count =>
      !c.isDistinct && (c.column match {
        // a NULL literal must NOT be answered with the row count —
        // COUNT(NULL) is 0 (r16 advice); decline and let Spark evaluate
        case l: Literal[_] => l.value != null
        case r: NamedReference => SynthSource.schema.fieldNames.contains(r.describe)
        case _ => false
      })
    case m: Min => m.column match {
      case r: NamedReference => r.describe == "doc_id"
      case _ => false
    }
    case m: Max => m.column match {
      case r: NamedReference => r.describe == "doc_id"
      case _ => false
    }
    case _ => false
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall(answers)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (supportCompletePushDown(agg)) { pushedAgg = Some(agg); true } else false

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands back a subset of our schema in our field order
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, leave) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long) => true
      case GreaterThan("doc_id", _: java.lang.Long) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long) => true
      case LessThan("doc_id", _: java.lang.Long) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long) => true
      case _ => false
    }
    take.foreach {
      case EqualTo("doc_id", v: java.lang.Long) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case GreaterThan("doc_id", v: java.lang.Long) => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("doc_id", v: java.lang.Long) => lo = math.max(lo, v.longValue)
      case LessThan("doc_id", v: java.lang.Long) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("doc_id", v: java.lang.Long) => hi = math.min(hi, v.longValue + 1)
      case _ => ()
    }
    accepted = take
    leave // declined filters stay above the scan
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = pushedAgg match {
    case Some(agg) =>
      new SynthAggScan(math.min(lo, hi), hi, agg.aggregateExpressions.toSeq, accepted)
    case None => new SynthScan(required, math.min(lo, hi), hi, partitions, accepted)
  }
}

/** Complete-pushdown aggregate scan: ONE partition, ONE row, every value
  * a closed form of the planned [lo, hi) range. An empty range reports
  * count 0 and NULL min/max — exactly what the aggregates over zero rows
  * must be.
  */
private[sources] class SynthAggScan(
    lo: Long, hi: Long, funcs: Seq[AggregateFunc], pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(funcs.map(f => StructField(f.toString, LongType, nullable = true)))
  override def description(): String =
    s"graft_synth range=[$lo,$hi) PushedAggregates: [${funcs.mkString(", ")}] " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = Array(SynthRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory = {
    // the closed forms evaluate DRIVER-SIDE at planning; only primitive
    // values ship to the executor (the Scan and the AggregateFunc trees
    // never serialize)
    val n = math.max(0L, hi - lo)
    val vals: Array[Any] = funcs.map {
      case _: CountStar | _: Count => (n: java.lang.Long): Any
      case _: Min => if (n > 0) (lo: java.lang.Long): Any else null
      case _: Max => if (n > 0) ((hi - 1): java.lang.Long): Any else null
      case other => throw new IllegalArgumentException(s"unanswerable agg $other")
    }.toArray
    new SynthAggReaderFactory(vals)
  }
}

private[sources] class SynthAggReaderFactory(vals: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = new GenericInternalRow(vals)
      override def close(): Unit = ()
    }
}

private[sources] case class SynthRange(lo: Long, hi: Long) extends InputPartition

private[sources] class SynthScan(
    required: StructType, lo: Long, hi: Long, partitions: Int, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft_synth range=[$lo,$hi) cols=${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0L) return Array.empty
    val p = math.max(1, math.min(partitions.toLong, n).toInt)
    val step = (n + p - 1) / p
    (0 until p).map { i =>
      SynthRange(lo + i * step, math.min(hi, lo + (i + 1) * step))
    }.filter(r => r.hi > r.lo).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

private[sources] class SynthReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SynthRange]
    new SynthReader(r.lo, r.hi, fields)
  }
}

private[sources] class SynthReader(lo: Long, hi: Long, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private var cur = lo - 1

  override def next(): Boolean = { cur += 1; cur < hi }

  // text is the expensive column — generate it at most ONCE per row even
  // when both text and n_chars are projected (r16 review), and not at all
  // when neither is
  private val needsText = fields.contains("text") || fields.contains("n_chars")

  override def get(): InternalRow = {
    val txt = if (needsText) SynthSource.textOf(cur) else null
    val vals = fields.map {
      case "doc_id" => cur: java.lang.Long
      case "text" => UTF8String.fromString(txt)
      case "lang" => UTF8String.fromString(SynthSource.langOf(cur))
      case "source" => UTF8String.fromString(SynthSource.sourceOf(cur))
      case "n_chars" => (txt.length.toLong): java.lang.Long
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = ()
}
