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

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's timestamp type (µs) can't represent directly. Read them as raw
    * nanos longs and convert with integer division — never through a double,
    * which can't hold an epoch-nanos value exactly.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
