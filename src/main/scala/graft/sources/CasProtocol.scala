package graft.sources

import org.apache.hadoop.fs.{FileContext, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The ONE compare-and-swap publish protocol every versioned lake
  * artifact shares (CatalogStore snapshots, DedupIndex / FreqStore /
  * IvfIndex LSM versions): claim `v=N` by renaming the staged dir onto it
  * with NO overwrite, and clear crash debris only through the explicit
  * quiesced-writers repair op. Extracted in r13 so the claim semantics —
  * including the TOCTOU fix that removed the inline orphan-delete — have
  * exactly one implementation to keep correct (four byte-identical copies
  * previously had to be kept in sync by hand).
  *
  * Store-specific knowledge stays in the stores: what a marker contains
  * (each store's `Meta`) is injected as the `committed` predicate; this
  * object owns only the claim/lose/repair mechanics.
  */
/** A version slot occupied by a marker-less directory — crash debris (or
  * a cross-process rename in flight). Thrown by [[CasProtocol.claim]] so
  * callers that are provably the ONLY writer (ImportPipeline's serialized
  * foreachBatch) can self-repair by TYPE instead of matching message
  * text, which silently breaks on any rewording.
  */
private[graft] final class SlotBlockedException(msg: String, cause: Throwable)
  extends IllegalStateException(msg, cause)

private[sources] object CasProtocol {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The CAS claim. `committed()` must re-read THIS version's marker
    * (never a cached pre-check); `lock` is the store's in-JVM commit
    * coordinator (cross-process safety rests on the filesystem's atomic
    * no-overwrite rename — see CatalogStore's scaladoc); `what` names the
    * payload for the loser's message ("batch", "count update", …).
    *
    * NO inline orphan-delete: a cross-JVM writer may commit v=N between
    * the marker check and the rename, and deleting its dir as an
    * "orphan" would silently discard the winner. The rename is the sole
    * claim mechanism; on failure the marker is re-checked and the loser
    * fails loudly with its staging removed. True crash debris (a
    * marker-less destination) blocks the slot until [[repair]].
    */
  def claim(
      spark: SparkSession, dir: String, staging: Path, dst: Path, version: Long,
      lock: AnyRef, committed: () => Boolean, what: String): Unit = {
    val fc = FileContext.getFileContext(
      new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)
    def lose(cause: Throwable): Nothing = {
      fs(spark, dir).delete(staging, true)
      throw new IllegalStateException(
        s"concurrent writer committed v=$version at $dir first — $what NOT published",
        cause)
    }
    lock.synchronized {
      val f = fs(spark, dir)
      if (committed())
        lose(new java.nio.file.FileAlreadyExistsException(dst.toString))
      try fc.rename(staging, dst)
      catch {
        case e: java.io.IOException =>
          val won = committed()
          if (!won && f.exists(dst)) {
            f.delete(staging, true)
            throw new SlotBlockedException(
              s"marker-less $dst occupies the v=$version slot (crash debris or a commit " +
                "in flight) — not overwriting; quiesce writers and run repair()", e)
          }
          if (won) lose(e)
          // slot empty AND no marker: the rename itself failed (a
          // transient filesystem error) — nobody won, so don't
          // misattribute a concurrent winner; the caller may retry
          f.delete(staging, true)
          throw new IllegalStateException(
            s"rename of staged $what into v=$version at $dir failed with the slot " +
              "empty — transient filesystem error, not a lost race; nothing " +
              "published, safe to retry", e)
      }
    }
  }

  /** Explicit crash-debris cleanup: deletes marker-less `v=N` dirs (a
    * crashed writer's partial claim) and everything under `_staging`.
    * MUST run with writers quiesced — a marker-less dir is
    * indistinguishable from a rename in flight. Never touches committed
    * versions (`committed(v)` re-reads the marker). Returns the deleted
    * paths.
    */
  def repair(
      spark: SparkSession, dir: String, committed: Long => Boolean): Seq[String] = {
    val f = fs(spark, dir)
    if (!f.exists(new Path(dir))) return Seq.empty
    val doomed = f.listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n == "_staging" ||
          (n.startsWith("v=") &&
            scala.util.Try(n.stripPrefix("v=").toLong).toOption
              .exists(v => !committed(v)))
      }
    doomed.foreach(p => f.delete(p, true))
    doomed.map(_.toString)
  }
}
