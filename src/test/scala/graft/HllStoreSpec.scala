package graft

import graft.sources.HllStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable-sketch ledger's contract: per-day HLL sketches whose
  * register-max union answers any date range at the ESTIMATE level
  * exactly as a direct sketch of the range would — plus the LSM/CAS
  * append discipline every store in the family carries.
  */
class HllStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_hll").toString

  private val dayExpr = expr("unix_micros(ts) DIV 86400000000")

  test("init holds one sketch per attributed day; store-backed q252 equals derived") {
    val dir = tmp()
    val t = Tables(spark, sf)
    val st = HllStore.init(spark, dir, t.events)
    assert(st.version == 1L && st.kind == "base")
    val days = t.events.filter(col("user_id").isNotNull)
      .select(dayExpr.as("d")).distinct().count()
    assert(st.totalDays == days)
    def run() = SparkEntry.queries("q252_hll_rollup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    val derived = run()
    assert(derived.nonEmpty && derived.forall(_._4), "derived estimates out of bound")
    spark.conf.set("graft.hll.store", dir)
    try assert(run() == derived, "store-backed q252 diverges from derived")
    finally spark.conf.unset("graft.hll.store")
  }

  test("mergeability: union of day sketches estimates the direct range sketch exactly") {
    // THE property that makes a day ledger answer arbitrary windows:
    // HLL union is register-max, so union(sketch(day1), …, sketch(dayN))
    // carries the same register state as sketch(day1 ∪ … ∪ dayN) — the
    // estimates must agree EXACTLY, not approximately
    val t = Tables(spark, sf)
    val e = t.events.filter(col("user_id").isNotNull)
      .select(col("user_id"), dayExpr.as("day"))
    val viaLedger = HllStore.daySketches(t.events)
      .withColumn("wk", expr("day DIV 7"))
      .groupBy(col("wk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = e
      .groupBy(expr("day DIV 7").as("wk"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaLedger == direct,
      s"union-of-days diverges from direct range sketch:\n$viaLedger\nvs\n$direct")
    assert(viaLedger.size >= 4)
  }

  test("append publishes only new days; frozen days and re-sends are no-ops; compact folds") {
    val dir = tmp()
    val t = Tables(spark, sf)
    val cut = 19750L // mid-January 2024 in epoch days
    val early = t.events.filter(dayExpr < cut)
    val late = t.events.filter(dayExpr >= cut)
    val s1 = HllStore.init(spark, dir, early)
    assert(s1.kind == "base" && s1.newDays > 0)
    val s2 = HllStore.append(spark, dir, late)
    assert(s2.version == 2L && s2.kind == "delta" && s2.newDays > 0)
    assert(s2.totalDays == s1.totalDays + s2.newDays)
    // idempotent re-send: nothing new, no version published
    val s3 = HllStore.append(spark, dir, late)
    assert(s3.version == 2L && s3.totalDays == s2.totalDays)
    // already-ledgered days are frozen — appending them again is a no-op
    val s4 = HllStore.append(spark, dir, early)
    assert(s4.version == 2L && s4.totalDays == s2.totalDays)
    // compact folds the chain into one base with the identical day set
    val s5 = HllStore.compact(spark, dir)
    assert(s5.version == 3L && s5.kind == "base" && s5.totalDays == s2.totalDays)
    assert(HllStore.sketches(spark, dir).count() == s2.totalDays)
    // a bootstrap is not a sync: double-init fails loudly
    intercept[IllegalArgumentException] {
      HllStore.init(spark, dir, t.events)
    }
  }
}
