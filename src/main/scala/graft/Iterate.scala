package graft

import org.apache.spark.sql.{DataFrame, Row}

/** Helpers for iterative DataFrame algorithms (connected components,
  * frontier traversals): each round must cut lineage or the plan tree —
  * and every action's recomputation — grows with the iteration count.
  */
object Iterate {

  /** Cut lineage between loop rounds. Default: localCheckpoint (fast, but
    * executor-storage-pinned — a lost executor restarts the job). On a
    * real cluster set `graft.checkpoint.reliable=true` plus a checkpoint
    * dir and rounds persist to reliable storage instead, so the loop
    * survives executor loss at the cost of one HDFS/S3 write per round.
    */
  def cutLineage(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val reliable = df.sparkSession.conf
      .getOption("graft.checkpoint.reliable").exists(_.toBoolean) && sc.getCheckpointDir.isDefined
    if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
  }

  /** Bounded CONTROL-PLANE gather — the one audited seam through which a
    * domain-bounded matrix (a |types|² transition table, a d² covariance,
    * per-depth BFS counters) may be collected to the driver for scalar
    * iteration. The caller declares the bound; the gather fetches
    * `maxRows + 1` and fails loudly if the relation outgrew its domain —
    * the bound is machine-checked at runtime, not comment-checked (r16
    * verdict #3). Anything without a provable domain bound must stay in
    * the engine; this helper is for matrices whose DISTRIBUTED derivation
    * already collapsed the corpus onto attribute-domain keys.
    */
  def gatherBoundedMatrix(df: DataFrame, maxRows: Int, what: String): Array[Row] = {
    require(maxRows > 0, s"gatherBoundedMatrix($what): bound must be positive")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what: control-plane gather exceeded its declared domain bound of $maxRows rows " +
        "— the relation is not metadata-scale; keep it in the engine")
    rows
  }

  /** Lazy variant: the checkpoint materializes with the caller's next
    * action instead of an extra eager job — use when the loop already runs
    * a per-round action (e.g. a convergence probe), so each round costs
    * one scheduled job, not two. Missing partitions of a partially
    *-evaluated first action (a limit) are filled in by Spark's checkpoint
    * completion before lineage is cut.
    */
  def cutLineageLazy(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val reliable = df.sparkSession.conf
      .getOption("graft.checkpoint.reliable").exists(_.toBoolean) && sc.getCheckpointDir.isDefined
    if (reliable) df.checkpoint(false) else df.localCheckpoint(false)
  }
}
