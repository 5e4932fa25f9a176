package graft.sources

import org.apache.hadoop.fs.Path

/** Durable last-value checkpoints for incremental loads — the state behind
  * Sqoop's `--incremental append/lastmodified` saved last-value
  * (`odps-sqoop/src/java/org/apache/sqoop/SqoopOptions.java:322-329`) and
  * the Flume/OGG offset persistence (`Configure.java:51-52`,
  * `HandlerInfoManager.java`). One tiny file per (job, key); commits use a
  * backup-chain of plain atomic renames (see [[save]]) so a crashed driver
  * never leaves a torn or lost checkpoint on ANY Hadoop filesystem — the
  * worst case after a crash is re-running from the previous mark
  * (at-least-once). All IO goes through the Hadoop `FileSystem` API, so an
  * incremental job can checkpoint to the cluster's durable store (HDFS,
  * S3A, file://) — not just the driver's local disk.
  */
final class Checkpoints(dir: String) {
  private val root = new Path(dir)
  Fs.mkdirs(root)

  private def file(job: String): Path = new Path(root, s"$job.ckpt")
  private def bak(job: String): Path = new Path(root, s".$job.ckpt.bak")

  def load(job: String): Option[String] = {
    val f = file(job)
    if (Fs.exists(f)) Some(Fs.readString(f))
    // a crash between the backup and commit renames of save() leaves the
    // previous committed value at .bak — fall back to it (the incremental
    // job re-runs from the OLD mark: at-least-once, never data loss)
    else if (Fs.exists(bak(job))) Some(Fs.readString(bak(job)))
    else None
  }

  /** Commit protocol using only plain (non-overwriting) renames, which are
    * atomic on HDFS AND the local filesystem — overwrite-renames degrade
    * to delete-then-rename on local/object stores, which would lose the
    * previous checkpoint if the driver died in between. Sequence:
    * write tmp → rename ckpt→bak → rename tmp→ckpt → delete bak. Every
    * crash window leaves either the old value (at ckpt or bak) or the new
    * value (at ckpt) readable via [[load]]. */
  def save(job: String, value: String): Unit = {
    val tmp = new Path(root, s".$job.ckpt.tmp")
    val dst = file(job)
    Fs.writeString(tmp, value)
    if (Fs.exists(dst)) {
      Fs.delete(bak(job))
      if (!Fs.rename(dst, bak(job)))
        sys.error(s"checkpoint backup rename failed: $dst")
    }
    if (!Fs.rename(tmp, dst))
      sys.error(s"checkpoint commit rename failed: $tmp -> $dst " +
        s"(previous value preserved at ${bak(job)})")
    Fs.delete(bak(job))
  }

  /** Run one incremental cycle: read the checkpoint, hand it to `body`
    * (which returns the new high-water mark), persist it. Returns the new
    * mark. The body only commits downstream effects before returning, so a
    * failure re-runs from the old mark (at-least-once, like Sqoop). */
  def advance(job: String, initial: String)(body: String => String): String = {
    val last = load(job).getOrElse(initial)
    val next = body(last)
    save(job, next)
    next
  }
}
