package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §5).
  *
  * AQE's skew-join splitting covers joins; hot-key AGGREGATION skew it
  * does not — a single key with 10⁹ rows still lands on one reducer. The
  * classic fix is salted two-stage aggregation: spray each key across
  * `saltBuckets` partial groups, aggregate, then merge. Works for any
  * algebraic aggregate (sum/count/min/max) — exactly the shape of a
  * per-dataset rollup when one dataset dominates the lake.
  */
object Skew {

  /** Two-stage salted sum/count aggregation over `key`.
    *
    * Stage 1 groups on (key, salt) — `saltBuckets`× more, evenly sized,
    * groups; stage 2 merges the partials per key. Both stages are
    * partial-agg map-side combinable, so the first shuffle carries at
    * most |keys|·saltBuckets rows per task.
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("key"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }
}
