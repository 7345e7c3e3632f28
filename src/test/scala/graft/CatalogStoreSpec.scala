package graft

import graft.sources.CatalogStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.H — the catalog-maintenance EXECUTE path (versioned
  * partitioned-parquet store with atomic publish): upsert → write →
  * read-back → re-upsert idempotence, crash-orphan tolerance, retention
  * GC. Reference `datasets/update.py:14-58`, `update_root_catalog/task.py`.
  */
class CatalogStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_cat").toString

  private def base(): DataFrame = Tables(spark, sf).documents.select(
    col("doc_id").as("dataset_key"),
    concat(col("source"), lit("/"), col("doc_id")).as("title"),
    lit(1).as("revision"))

  // q68's fixture shape: revision bumps for doc_id%3, inserts in the
  // negative key namespace for doc_id%10==7
  private def changes(): DataFrame = {
    val t = Tables(spark, sf)
    t.documents.filter(col("doc_id") % 3 === 0).select(
        col("doc_id").as("dataset_key"),
        concat(col("source"), lit("-v2")).as("title"),
        lit(2).as("revision"))
      .unionAll(t.documents.filter(col("doc_id") % 10 === 7).select(
        (-(col("doc_id") + 1)).as("dataset_key"),
        concat(lit("new-"), col("source")).as("title"),
        lit(1).as("revision")))
  }

  private def snapshot(dir: String): Set[(Long, String, Int)] =
    CatalogStore.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("dataset_key"), r.getAs[String]("title"), r.getAs[Int]("revision")))
      .toSet

  test("init + read-back round-trips the initial catalog, sharded for pruning") {
    val dir = tmp()
    assert(CatalogStore.currentVersion(spark, dir).isEmpty)
    assert(CatalogStore.init(spark, dir, base()) == 1L)
    assert(CatalogStore.currentVersion(spark, dir).contains(1L))
    assert(snapshot(dir) == base().collect().map(r =>
      (r.getAs[Long]("dataset_key"), r.getAs[String]("title"), r.getAs[Int]("revision"))).toSet)
    // storage is hash-sharded: a key-filtered read partition-prunes
    val v = spark.read.parquet(s"$dir/v=1").filter(col("shard") === 3)
    assert(v.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("upsert applies a change batch and re-upsert of the same batch is a no-op") {
    val dir = tmp()
    CatalogStore.init(spark, dir, base())
    val nBase = base().count()
    val nUpd = base().filter(col("dataset_key") % 3 === 0).count()
    val nIns = changes().filter(col("dataset_key") < 0).count()

    val s1 = CatalogStore.upsert(spark, dir, changes())
    assert(s1 == CatalogStore.UpsertStats(2L, nIns, nUpd, nBase - nUpd))
    val after = snapshot(dir)
    assert(after.size == nBase + nIns)
    assert(after.count(_._2.endsWith("-v2")) == nUpd)
    assert(after.count(_._2.startsWith("new-")) == nIns)

    // idempotence: same batch again → nothing inserted/updated, no new
    // version published, content identical
    val s2 = CatalogStore.upsert(spark, dir, changes())
    assert(s2.version == 2L && s2.inserted == 0L && s2.updated == 0L)
    assert(s2.unchanged == nBase + nIns)
    assert(CatalogStore.currentVersion(spark, dir).contains(2L))
    assert(snapshot(dir) == after)
  }

  test("an orphan snapshot dir from a crashed writer is never read and gets clobbered") {
    val dir = tmp()
    CatalogStore.init(spark, dir, base())
    // simulate a writer that died after writing v=2 but before publishing:
    // v=2 exists with garbage content, _CURRENT still says 1
    base().limit(3).withColumn("title", lit("GARBAGE")).withColumn("shard", lit(0))
      .write.partitionBy("shard").parquet(s"$dir/v=2")
    assert(CatalogStore.currentVersion(spark, dir).contains(1L))
    assert(!snapshot(dir).exists(_._2 == "GARBAGE")) // reads ignore the orphan
    // the orphan is not data: time travel refuses it, listings omit it
    intercept[IllegalArgumentException](CatalogStore.readVersion(spark, dir, 2L))
    assert(CatalogStore.listVersions(spark, dir) == Seq(1L))
    val s = CatalogStore.upsert(spark, dir, changes())
    assert(s.version == 2L) // orphan dir overwritten, then published
    assert(snapshot(dir).count(_._2.endsWith("-v2")) > 0)
    assert(!snapshot(dir).exists(_._2 == "GARBAGE"))
  }

  test("retention GC drops old snapshots, never the published one") {
    val dir = tmp()
    CatalogStore.init(spark, dir, base())
    CatalogStore.upsert(spark, dir, changes()) // v=2
    val more = changes().withColumn("revision", lit(3)) // v=3
    CatalogStore.upsert(spark, dir, more)
    assert(CatalogStore.currentVersion(spark, dir).contains(3L))
    assert(CatalogStore.listVersions(spark, dir) == Seq(1L, 2L, 3L))

    // time travel: v=1 is still the pristine initial catalog
    val v1 = CatalogStore.readVersion(spark, dir, 1L).collect()
    assert(v1.length == base().count() && !v1.exists(_.getAs[String]("title").endsWith("-v2")))

    val reclaimed = CatalogStore.gcVersions(spark, dir, keep = 1)
    assert(reclaimed.toSet == Set(1L, 2L))
    assert(CatalogStore.currentVersion(spark, dir).contains(3L))
    assert(snapshot(dir).nonEmpty) // current still fully readable
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=1")))
  }
}
