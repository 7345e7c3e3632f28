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
    val st = HllStore.init(spark, dir, t.events, corpus = sf)
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

  test("a streaming feed maintains the ledger; the final view equals a batch init") {
    // the production maintenance path: an ingest stream appends CLOSED
    // days per micro-batch (upstream watermarking delivers whole days —
    // the ledger's complete-days contract; a partial day appended early
    // would freeze short, which is exactly why the contract exists).
    // After the stream drains, per-day estimates off the streamed ledger
    // must equal a from-scratch batch build over the same events.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val us = 86400L * 1000000L // one day in µs
    def ev(day: Long, user: Long): (Long, Long) = (day * us + user, user)
    val batch1 = Seq(ev(0, 1), ev(0, 2), ev(1, 2), ev(1, 3))
    val batch2 = Seq(ev(2, 1), ev(2, 4))
    val batch3 = Seq(ev(3, 5), ev(4, 1), ev(4, 5))
    val ms = MemoryStream[(Long, Long)]
    val q = ms.toDF()
      .select(timestamp_micros(col("_1")).as("ts"), col("_2").as("user_id"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 0L) HllStore.init(spark, dir, batch, corpus = "mem")
        else HllStore.append(spark, dir, batch, corpus = "mem")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .queryName("hll_maintain")
      .start()
    ms.addData(batch1: _*)
    q.processAllAvailable(); q.stop()
    // subsequent closed-day batches through fresh AvailableNow runs
    for (b <- Seq(batch2, batch3)) {
      val ms2 = MemoryStream[(Long, Long)]
      val q2 = ms2.toDF()
        .select(timestamp_micros(col("_1")).as("ts"), col("_2").as("user_id"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          HllStore.append(spark, dir, batch, corpus = "mem"); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      ms2.addData(b: _*)
      q2.processAllAvailable(); q2.stop()
    }
    val all = (batch1 ++ batch2 ++ batch3)
      .toDF("_1", "_2")
      .select(timestamp_micros(col("_1")).as("ts"), col("_2").as("user_id"))
    val streamed = HllStore.sketches(spark, dir)
      .select(col("day"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fresh = HllStore.daySketches(all)
      .select(col("day"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == fresh, s"streamed ledger diverges: $streamed vs $fresh")
    assert(streamed.keySet == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("corpus provenance: mismatched ledgers are refused at read and append (r16 advice)") {
    val dir = tmp()
    val t = Tables(spark, sf)
    HllStore.init(spark, dir, t.events, corpus = "corpusA")
    assert(HllStore.corpus(spark, dir) == "corpusA")
    // provenance-checked read with the wrong tag fails loudly…
    intercept[IllegalArgumentException] {
      HllStore.sketches(spark, dir, expectCorpus = Some("corpusB"))
    }
    // …and so does q252's store path when graft.hll.store points at a
    // ledger built from a different corpus — wrong-but-plausible
    // merged_est_ok rows never reach the caller
    spark.conf.set("graft.hll.store", dir)
    try intercept[IllegalArgumentException] {
      SparkEntry.queries("q252_hll_rollup")(spark, sf).collect()
    } finally spark.conf.unset("graft.hll.store")
    // appends across corpora are refused, not averaged
    intercept[IllegalArgumentException] {
      HllStore.append(spark, dir, t.events, corpus = "corpusB")
    }
    // compact carries the tag through the fold
    HllStore.append(spark, dir, t.events.limit(0), corpus = "corpusA") // no-op append OK
    assert(HllStore.corpus(spark, dir) == "corpusA")
  }

  test("append publishes only new days; frozen days and re-sends are no-ops; compact folds") {
    val dir = tmp()
    val t = Tables(spark, sf)
    val cut = 19750L // mid-January 2024 in epoch days
    val early = t.events.filter(dayExpr < cut)
    val late = t.events.filter(dayExpr >= cut)
    val s1 = HllStore.init(spark, dir, early, corpus = sf)
    assert(s1.kind == "base" && s1.newDays > 0)
    val s2 = HllStore.append(spark, dir, late, corpus = sf)
    assert(s2.version == 2L && s2.kind == "delta" && s2.newDays > 0)
    assert(s2.totalDays == s1.totalDays + s2.newDays)
    // idempotent re-send: nothing new, no version published
    val s3 = HllStore.append(spark, dir, late, corpus = sf)
    assert(s3.version == 2L && s3.totalDays == s2.totalDays)
    // already-ledgered days are frozen — appending them again is a no-op
    val s4 = HllStore.append(spark, dir, early, corpus = sf)
    assert(s4.version == 2L && s4.totalDays == s2.totalDays)
    // compact folds the chain into one base with the identical day set
    val s5 = HllStore.compact(spark, dir)
    assert(s5.version == 3L && s5.kind == "base" && s5.totalDays == s2.totalDays)
    assert(HllStore.sketches(spark, dir).count() == s2.totalDays)
    // a bootstrap is not a sync: double-init fails loudly
    intercept[IllegalArgumentException] {
      HllStore.init(spark, dir, t.events, corpus = sf)
    }
  }
}
