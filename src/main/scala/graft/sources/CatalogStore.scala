package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The EXECUTE path for catalog maintenance — where q68 (upsert) and q85
  * (retention GC) stop being plan-as-query and actually mutate durable
  * state, re-expressing reference `datasets/update.py:14-58` (dataset
  * attribute update) and `update_root_catalog/task.py` (batched root-
  * catalog changes) on a parquet lake instead of DynamoDB/S3 objects.
  *
  * Layout under `dir`:
  * {{{
  *   v=1/shard=0..15/part-*.parquet   immutable catalog snapshots
  *   v=2/...
  *   _CURRENT                         pointer file: the published version
  * }}}
  *
  * Write protocol (crash-safe, idempotent — the batch analog of the
  * exactly-once streaming sink spec'd in SourcesSpec):
  *   1. merge change batch against the CURRENT snapshot (keep-latest by
  *      revision; base wins ties so replays are no-ops),
  *   2. if the batch changes nothing, short-circuit: no new version,
  *   3. else write snapshot v=N+1 (overwrite — an orphan dir from a
  *      crashed run is clobbered, never read, because only _CURRENT makes
  *      a version live),
  *   4. publish by writing _CURRENT via temp-file + atomic rename.
  *
  * Scale shape: the merge is one |catalog|+|batch| union → per-key window
  * (single shuffle on dataset_key); snapshots are sharded by key hash so
  * reads partition-prune and a 1000-executor write has no hot partition.
  * Version history means GC (q85's execute side) is directory removal,
  * never row rewrites.
  */
object CatalogStore {

  final case class UpsertStats(version: Long, inserted: Long, updated: Long, unchanged: Long)

  private val Shards = 16

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(dir, "_CURRENT")

  /** The published version, if any. */
  def currentVersion(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    if (!f.exists(pointer(dir))) None
    else {
      val in = f.open(pointer(dir))
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  private def publish(spark: SparkSession, dir: String, version: Long): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"_CURRENT.tmp-$version")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8"))
    finally out.close()
    // FileContext rename with OVERWRITE is the atomic replace primitive on
    // HDFS and local posix — readers see the old or new pointer, never a
    // missing or torn one (a delete-then-rename would leave a window where
    // the store has no pointer at all, and a crash in it would need manual
    // repair)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, pointer(dir), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def snapshotPath(dir: String, version: Long) = s"$dir/v=$version"

  private def write(df: DataFrame, dir: String, version: Long): Unit =
    df.select(
        col("dataset_key"),
        col("title"),
        col("revision"),
        pmod(hash(col("dataset_key")), lit(Shards)).as("shard"))
      .write
      .partitionBy("shard")
      .mode("overwrite")
      .parquet(snapshotPath(dir, version))

  /** Create the store with an initial catalog of (dataset_key, title,
    * revision) rows. Fails if already initialized.
    */
  def init(spark: SparkSession, dir: String, initial: DataFrame): Long = {
    require(currentVersion(spark, dir).isEmpty, s"catalog at $dir already initialized")
    write(initial, dir, 1L)
    publish(spark, dir, 1L)
    1L
  }

  /** The published snapshot (shard column dropped — storage detail). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(spark, dir)
      .getOrElse(throw new IllegalStateException(s"no published catalog at $dir"))
    readVersion(spark, dir, v)
  }

  /** Time travel: read a specific PUBLISHED snapshot. Published versions
    * are immutable, so any one GC hasn't reclaimed is a consistent
    * point-in-time catalog. Versions above the pointer are refused — an
    * orphan dir from a crashed writer is not data (it may be partial, and
    * the next upsert clobbers it), upholding the store invariant that only
    * `_CURRENT` makes a version live.
    */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val current = currentVersion(spark, dir)
      .getOrElse(throw new IllegalStateException(s"no published catalog at $dir"))
    require(version <= current, s"v=$version was never published (current is v=$current)")
    spark.read.parquet(snapshotPath(dir, version)).select("dataset_key", "title", "revision")
  }

  /** Retained PUBLISHED snapshot versions, ascending (orphan dirs above
    * the pointer are excluded — see [[readVersion]]).
    */
  def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val current = currentVersion(spark, dir).getOrElse(return Seq.empty)
    fs(spark, dir).listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
      .filter(_ <= current)
      .sorted
  }

  /** Keep-latest merge of the current snapshot with a change batch —
    * q68's kernel with explicit per-key actions: a change wins only with a
    * strictly higher revision (base wins ties, so re-applying a batch is a
    * no-op), absent keys insert. One shuffle on dataset_key.
    */
  private def merged(base: DataFrame, changes: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("dataset_key"))
    // title as the final tie-break: a malformed batch carrying two rows for
    // one key at the same revision still yields a DETERMINISTIC snapshot
    // (same input → same durable catalog), instead of task-scheduling luck
    val latest = byKey.orderBy(col("revision").desc, col("origin"), col("title"))
    base.select(col("dataset_key"), col("title"), col("revision")).withColumn("origin", lit("base"))
      .unionByName(
        changes.select(col("dataset_key"), col("title"), col("revision"))
          .withColumn("origin", lit("change")))
      .withColumn("rn", row_number().over(latest))
      .withColumn("base_rev", max(when(col("origin") === "base", col("revision"))).over(byKey))
      .filter(col("rn") === 1)
      .withColumn(
        "action",
        when(col("base_rev").isNull, "inserted")
          .when(col("origin") === "change" && col("revision") > col("base_rev"), "updated")
          .otherwise("unchanged"))
      .select(col("dataset_key"), col("title"), col("revision"), col("action"))
  }

  /** Apply a change batch. Returns the published version and action
    * counts; a batch that changes nothing publishes nothing.
    *
    * Concurrency contract: SINGLE WRITER — like the reference, where a
    * dataset's update runs inside one step-function execution at a time.
    * There is no commit coordinator here (that is Delta/Iceberg territory);
    * the pre-publish pointer recheck below turns most concurrent-writer
    * races into a loud failure instead of a silently lost batch, but it is
    * a guard, not a guarantee.
    */
  def upsert(spark: SparkSession, dir: String, changes: DataFrame): UpsertStats = {
    val current = currentVersion(spark, dir)
      .getOrElse(throw new IllegalStateException(s"no published catalog at $dir"))
    val m = merged(read(spark, dir), changes).localCheckpoint()
    val counts = m.groupBy(col("action")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (ins, upd) = (counts.getOrElse("inserted", 0L), counts.getOrElse("updated", 0L))
    val unch = counts.getOrElse("unchanged", 0L)
    if (ins + upd == 0) UpsertStats(current, 0L, 0L, unch)
    else {
      val next = current + 1
      write(m, dir, next)
      val observed = currentVersion(spark, dir)
      if (!observed.contains(current))
        throw new IllegalStateException(
          s"concurrent writer detected at $dir: read v=$current, now ${observed.getOrElse("none")} — batch NOT published")
      publish(spark, dir, next)
      UpsertStats(next, ins, upd, unch)
    }
  }

  /** Version-retention GC — q85's execute side: drop all but the newest
    * `keep` snapshots (the published one always survives). Pure directory
    * removal; returns the versions reclaimed.
    */
  def gcVersions(spark: SparkSession, dir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least one version")
    val f = fs(spark, dir)
    val current = currentVersion(spark, dir).getOrElse(return Seq.empty)
    val doomed = listVersions(spark, dir).reverse.drop(keep).filter(_ != current)
    doomed.foreach(v => f.delete(new Path(snapshotPath(dir, v)), true))
    doomed
  }
}
