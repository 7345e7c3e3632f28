package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — SURVEY.md §2 inventory assembled from the operator
  * modules. Each entry: Spark-first plan + DuckDB oracle SQL.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.Lake,
    operators.CatalogOps,
    operators.TextAnalysis,
    operators.Dedup,
    operators.Similarity,
    operators.Multimodal,
    operators.StreamingOps,
    operators.Extras
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
