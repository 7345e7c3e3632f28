package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{
  CatalogPlugin, FunctionCatalog, Identifier, SupportsRead, Table, TableCapability,
  TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 CATALOG (`TableCatalog` + `FunctionCatalog`) for the
  * synth generator — the half of the connector surface a path-based
  * `TableProvider` cannot carry: BUCKET-transform storage-partitioned
  * joins. Spark resolves a connector `bucket(n, col)` partition
  * transform by loading the function from the TABLE'S OWN catalog
  * (`V2ExpressionUtils` → `FunctionCatalog.loadFunction("bucket")`), so
  * only a catalog-registered table can report
  * `KeyGroupedPartitioning(bucket(n, doc_id))` — which is what lets a
  * self-join on `doc_id` ALONE plan shuffle-free (the SynthSource
  * `shards` option demonstrates the same mechanism with an
  * identity-transform shard column; this is the Iceberg-shaped bucket
  * form on the raw key).
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.table("graft.synth_100000_b8")   // 100k rows, 8 buckets
  * }}}
  *
  * Table names are `synth_<rows>_b<buckets>` — the catalog is a pure
  * resolver (read-only: create/alter/drop are refused), so any executor
  * or session reconstructs the identical table from the name alone.
  * Each InputPartition is one bucket (ids ≡ b mod n) carrying its
  * partition key; doc_id range filters still prune the planned range
  * inside every bucket, and column pruning reaches the generator.
  */
class GraftCatalog extends CatalogPlugin with TableCatalog with FunctionCatalog {
  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val TableName = """synth_(\d+)_b(\d+)""".r

  override def listTables(namespace: Array[String]): Array[Identifier] = Array.empty

  override def loadTable(ident: Identifier): Table = ident.name match {
    case TableName(rows, buckets) =>
      new SynthCatalogTable(rows.toLong, buckets.toInt)
    case _ => throw new NoSuchTableException(ident)
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is a read-only resolver")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is a read-only resolver")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is a read-only resolver")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is a read-only resolver")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name == "bucket") GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/** The connector bucket function: bucket(n, key) = key mod n — loaded by
  * Spark when it resolves the table's partition transform. For SPJ the
  * engine never recomputes this on rows (partition VALUES come from
  * `HasPartitionKey`); what matters is that both join sides resolve the
  * SAME canonical function with the same bucket count.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String = "graft bucket(n, key): key mod n"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, key LONG), got $inputType")
    BoundBucket
  }

  object BoundBucket extends ScalarFunction[Int] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def produceResult(input: InternalRow): Int =
      math.floorMod(input.getLong(1), input.getInt(0).toLong).toInt
  }
}

private[sources] class SynthCatalogTable(rows: Long, buckets: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft.synth($rows, b=$buckets)"
  override def schema(): StructType = SynthSource.schema
  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(buckets, "doc_id"))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthCatalogScanBuilder(rows, buckets)
}

private[sources] class SynthCatalogScanBuilder(rows: Long, buckets: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = SynthSource.schema
  private var lo: Long = 0L
  private var hi: Long = rows
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

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
    leave
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new SynthBucketScan(required, math.min(lo, hi), hi, buckets, accepted)
}

/** Bucket-keyed scan: one partition per bucket (ids ≡ b mod n), each
  * carrying its partition key; reports
  * KeyGroupedPartitioning(bucket(n, doc_id)).
  */
private[sources] class SynthBucketScan(
    required: StructType, lo: Long, hi: Long, buckets: Int, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft_synth_catalog range=[$lo,$hi) buckets=$buckets " +
      s"cols=${required.fieldNames.mkString(",")} PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.bucket(buckets, "doc_id")), buckets)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until buckets).map(b => SynthShardStripe(lo, math.max(lo, hi), b, buckets)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames, None)
}
