package graft

import graft.sources.KllStore
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The quantile-ledger's contract: per-day KLL sketches whose merge
  * answers any date range within the sketch's rank error — plus the
  * LSM/CAS append discipline and corpus provenance every store in the
  * family carries. KLL compaction is RANDOMIZED (unlike HLL's
  * register-max), so the pins here are rank-level bounds and
  * deterministic metadata (day keys, per-day counts), never byte or
  * exact-value equality.
  */
class KllStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_kll").toString

  private val dayExpr = expr("unix_micros(ts) DIV 86400000000")

  private def heap(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  test("init holds one sketch per attributed day; store-backed q255 equals derived") {
    val dir = tmp()
    val t = Tables(spark, sf)
    val st = KllStore.init(spark, dir, t.events, corpus = sf)
    assert(st.version == 1L && st.kind == "base")
    val days = t.events.filter(col("value").isNotNull)
      .select(dayExpr.as("d")).distinct().count()
    assert(st.totalDays == days)
    // per-day sketch mass is deterministic even though retained items
    // are not: getN per day == the day's attributed row count
    val perDayN = KllStore.sketches(spark, dir).collect()
      .map(r => r.getLong(0) -> heap(r.getAs[Array[Byte]]("sk")).getN).toMap
    val exactN = t.events.filter(col("value").isNotNull)
      .groupBy(dayExpr.as("d")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDayN == exactN)
    def run() = SparkEntry.queries("q255_kll_quantiles")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    val derived = run()
    assert(derived.nonEmpty && derived.forall(_._5), "derived estimates out of bound")
    spark.conf.set("graft.kll.store", dir)
    try assert(run() == derived, "store-backed q255 diverges from derived")
    finally spark.conf.unset("graft.kll.store")
  }

  test("mergeability: union of day sketches ranks within error of the direct range sketch") {
    // THE property that makes a day ledger answer arbitrary windows:
    // merging the per-day sketches of a week estimates the week's
    // quantiles within the k=200 sketch's rank error. KLL compaction is
    // randomized, so the pin is at the RANK level: the exact rank of
    // each estimate sits within 5% of the asked rank (≈3x the 1.65%
    // normalized error).
    val t = Tables(spark, sf)
    val vals = t.events.filter(col("value").isNotNull)
      .select(
        expr("(unix_micros(ts) DIV 86400000000) DIV 7").as("wk"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val unioned = KllStore.daySketches(t.events)
      .withColumn("wk", expr("day DIV 7"))
      .groupBy(col("wk"))
      .agg(graft.functions.GraftFunctions.kll_merge_agg(col("sk")).as("sk"))
      .collect().map(r => r.getLong(0) -> heap(r.getAs[Array[Byte]]("sk")))
    assert(unioned.length >= 4)
    unioned.foreach { case (wk, sk) =>
      val sorted = byWeek(wk)
      assert(sk.getN == sorted.length.toLong, s"week $wk mass diverges")
      Seq(0.5, 0.95).foreach { q =>
        val est = sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
        // exact inclusive rank of the estimate in the week's value set
        val rank = sorted.count(_ <= est.toLong).toDouble / sorted.length
        assert(math.abs(rank - q) <= 0.05,
          s"week $wk q=$q estimate $est has exact rank $rank — outside the error bound")
      }
    }
  }

  test("a streaming feed maintains the quantile ledger; day keys and masses equal a batch init") {
    // the production maintenance path (HllStoreSpec's twin): an ingest
    // stream appends CLOSED days per micro-batch. KLL retained items are
    // randomized, so the final-view pins are the DETERMINISTIC ledger
    // facts: day keys, per-day sketch mass (getN), and quantile
    // estimates within the sketch's rank error of a batch rebuild.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val us = 86400L * 1000000L
    def ev(day: Long, v: Double): (Long, Double) = (day * us + (v * 100).toLong, v)
    val batches = Seq(
      Seq(ev(0, 1.0), ev(0, 2.0), ev(1, 5.0), ev(1, 7.0), ev(1, 9.0)),
      Seq(ev(2, 10.0), ev(2, 20.0), ev(2, 30.0)),
      Seq(ev(3, 4.0), ev(4, 8.0), ev(4, 6.0)))
    batches.zipWithIndex.foreach { case (b, i) =>
      val ms = MemoryStream[(Long, Double)]
      val q = ms.toDF()
        .select(timestamp_micros(col("_1")).as("ts"), col("_2").as("value"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (i == 0 && KllStore.currentVersion(spark, dir).isEmpty)
            KllStore.init(spark, dir, batch, corpus = "mem")
          else KllStore.append(spark, dir, batch, corpus = "mem")
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      ms.addData(b: _*)
      q.processAllAvailable(); q.stop()
    }
    val all = batches.flatten.toDF("_1", "_2")
      .select(timestamp_micros(col("_1")).as("ts"), col("_2").as("value"))
    val streamed = KllStore.sketches(spark, dir).collect()
      .map(r => r.getLong(0) -> heap(r.getAs[Array[Byte]]("sk"))).toMap
    val fresh = KllStore.daySketches(all).collect()
      .map(r => r.getLong(0) -> heap(r.getAs[Array[Byte]]("sk"))).toMap
    assert(streamed.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(streamed.keySet == fresh.keySet)
    streamed.foreach { case (day, sk) =>
      assert(sk.getN == fresh(day).getN, s"day $day mass diverges from batch build")
      // tiny exact day sets: the sketch holds every item, so the medians
      // agree exactly despite KLL's randomized compaction
      assert(sk.getQuantile(0.5, QuantileSearchCriteria.INCLUSIVE) ==
        fresh(day).getQuantile(0.5, QuantileSearchCriteria.INCLUSIVE))
    }
  }

  test("corpus provenance: mismatched ledgers are refused at read and append") {
    val dir = tmp()
    val t = Tables(spark, sf)
    KllStore.init(spark, dir, t.events, corpus = "corpusA")
    assert(KllStore.corpus(spark, dir) == "corpusA")
    intercept[IllegalArgumentException] {
      KllStore.sketches(spark, dir, expectCorpus = Some("corpusB"))
    }
    // q255's store path refuses a ledger built from a different corpus
    spark.conf.set("graft.kll.store", dir)
    try intercept[IllegalArgumentException] {
      SparkEntry.queries("q255_kll_quantiles")(spark, sf).collect()
    } finally spark.conf.unset("graft.kll.store")
    intercept[IllegalArgumentException] {
      KllStore.append(spark, dir, t.events, corpus = "corpusB")
    }
  }

  test("append publishes only new days; frozen days and re-sends are no-ops; compact folds") {
    val dir = tmp()
    val t = Tables(spark, sf)
    val cut = 19750L // mid-January 2024 in epoch days
    val early = t.events.filter(dayExpr < cut)
    val late = t.events.filter(dayExpr >= cut)
    val s1 = KllStore.init(spark, dir, early, corpus = sf)
    assert(s1.kind == "base" && s1.newDays > 0)
    val s2 = KllStore.append(spark, dir, late, corpus = sf)
    assert(s2.version == 2L && s2.kind == "delta" && s2.newDays > 0)
    assert(s2.totalDays == s1.totalDays + s2.newDays)
    // idempotent re-send: nothing new, no version published — CRITICAL
    // for KLL, where re-merging a frozen day would DOUBLE its mass
    val s3 = KllStore.append(spark, dir, late, corpus = sf)
    assert(s3.version == 2L && s3.totalDays == s2.totalDays)
    val s4 = KllStore.append(spark, dir, early, corpus = sf)
    assert(s4.version == 2L && s4.totalDays == s2.totalDays)
    // total ledger mass stayed exactly the event count (no double-add)
    val mass = KllStore.sketches(spark, dir).collect()
      .map(r => heap(r.getAs[Array[Byte]]("sk")).getN).sum
    assert(mass == t.events.filter(col("value").isNotNull).count())
    // compact folds the chain into one base with the identical day set
    val s5 = KllStore.compact(spark, dir)
    assert(s5.version == 3L && s5.kind == "base" && s5.totalDays == s2.totalDays)
    assert(KllStore.sketches(spark, dir).count() == s2.totalDays)
    intercept[IllegalArgumentException] {
      KllStore.init(spark, dir, t.events, corpus = sf)
    }
  }
}
