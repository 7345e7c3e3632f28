package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join — the interval-join operator OSS Spark lacks.
  *
  * A naive `fact.value BETWEEN bands.lo AND bands.hi` join plans as a
  * BroadcastNestedLoopJoin (O(|fact|·|bands|) comparisons). This rewrites
  * it as an equi-join: each band row explodes to the fixed-width buckets
  * it overlaps, the fact side computes its bucket arithmetically, and the
  * range predicate only post-filters bucket-colliding rows. At 100 TB the
  * shuffle is on bucket id — fully parallel, skew-salvageable with AQE —
  * and the per-row work is O(overlapping buckets), not O(|bands|).
  *
  * (Same technique as the bin-based range joins in published engines —
  * e.g. the interval-join literature; implemented here as plan
  * composition so Catalyst keeps optimizing around it.)
  */
object RangeJoin {

  /** Join `fact` rows whose `value` falls in `[lo, hi)` of a bands table.
    * `lo`/`hi` must be integral columns; `bucketWidth` trades explode
    * fan-out (wide bands) against bucket collision rate (narrow bands).
    */
  def bucketed(
      fact: DataFrame,
      value: Column,
      bands: DataFrame,
      lo: Column,
      hi: Column,
      bucketWidth: Long): DataFrame = {
    // floor-division on BOTH sides: a bare cast of the double quotient
    // truncates toward zero and disagrees with the fact side's floor for
    // negative bounds (same hazard fixed in plans.RangeJoinRule)
    val bandBuckets = bands
      .withColumn(
        "__graft_bucket",
        explode(sequence(
          floor(lo / bucketWidth).cast("long"),
          floor((hi - 1) / bucketWidth).cast("long"))))
    val factBuckets = fact
      .withColumn("__graft_bucket", floor(value / bucketWidth).cast("long"))
    factBuckets
      .join(broadcast(bandBuckets), Seq("__graft_bucket"))
      .filter(value >= lo && value < hi)
      .drop("__graft_bucket")
  }
}
