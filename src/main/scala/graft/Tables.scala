package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every operator takes `(SparkSession, sfDir)` and loads through here so
  * scans stay plain parquet relations Catalyst can push filters/projections
  * into. At 100 TB these would be partitioned/bucketed external tables; the
  * call sites only depend on the logical schema.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /** The events table's `ts` physical type has varied across testdata
    * generations — TIMESTAMP(NANOS) (unrepresentable in Spark's µs timestamp;
    * loadable only as a raw nanos long under
    * `spark.sql.legacy.parquet.nanosAsLong`), then timestamp[us] with
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Adapt to whatever the
    * files carry instead of binding to one generation: branch on the loaded
    * schema and normalize `ts` to a session-TZ (UTC everywhere in this repo)
    * TimestampType so downstream `window()`/`unix_micros`/oracle hashes are
    * identical across physical encodings.
    *
    *  - LongType (nanos-as-long): integer-divide to µs — never through a
    *    double, which can't hold an epoch-nanos value exactly.
    *  - TimestampNTZType: cast; with the UTC session this is µs-identical.
    *  - TimestampType: pass through.
    *
    * The legacy conf is set only on the retry path a NANOS file forces
    * (plain schema inference throws on TIMESTAMP(NANOS)), and must then stay
    * set for the session: the vectorized reader re-checks it per batch at
    * execution time, so un-setting it after load would break the scan.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try t("events")
      catch {
        case _: Exception =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          t("events")
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalArgumentException(s"events.ts: unsupported physical type $other")
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Local-mode crutch, OFF by default: a single parquet file arrives as
    * one scan partition on local[n], serializing lambda-heavy map work —
    * `graft.local.split=true` buys back parallelism with an explicit
    * repartition. At cluster scale the scan's own splitting
    * (`spark.sql.files.maxPartitionBytes`) already parallelizes, and an
    * unconditional corpus-wide repartition would be a full extra shuffle
    * before map-side work that needs no co-partitioning — so the default
    * plan carries no exchange here. Bench/Time instead split local scans
    * via maxPartitionBytes=2m.
    */
  def localSplit(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    if (df.sparkSession.conf.get("graft.local.split", "false").toBoolean) df.repartition(key)
    else df
}

/** A bundle of named queries plus their DuckDB oracle SQL. SparkEntry
  * assembles the full inventory from these (SURVEY.md §2).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
