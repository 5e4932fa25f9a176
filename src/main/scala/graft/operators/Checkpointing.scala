package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-wide durable-checkpoint switch for ITERATIVE operators.
  *
  * Loops that truncate lineage per round (`Dedup.dupClusters` label
  * propagation, `Classifier.train` epochs, `Graph.*` unless given an
  * explicit dir) default to `localCheckpoint` — fast, but the blocks
  * are non-replicated executor state: on a cluster, losing one executor
  * mid-loop kills the job with no lineage left to recompute. Setting
  * the session conf
  *
  *   spark.conf.set(Checkpointing.ConfKey, "hdfs://.../graft-ckpt")
  *
  * switches every such loop to reliable `checkpoint` on that directory
  * (durable storage), so a long iterative job survives executor loss.
  * The per-round state these loops checkpoint is nodes-/pairs-/sample-
  * sized — orders of magnitude below the corpus — so the extra I/O is
  * small. Single-pass lineage truncations stay local: re-running one
  * pass after a rare failure is cheaper than paying durable I/O on
  * every run.
  */
object Checkpointing {
  val ConfKey = "spark.graft.checkpointDir"

  /** The configured reliable-checkpoint dir, if any. */
  def configuredDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty)

  /** Checkpoint `df` with the session-selected durability. */
  def apply(df: DataFrame, eager: Boolean): DataFrame =
    configuredDir(df) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call; only
        // (re)set when the current dir is not already under ours
        if (!sc.getCheckpointDir.exists(_.contains(
            dir.stripPrefix("file:")))) {
          sc.setCheckpointDir(dir)
        }
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
}
