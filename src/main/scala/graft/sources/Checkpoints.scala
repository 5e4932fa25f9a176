package graft.sources

import org.apache.hadoop.fs.Path

/** Durable last-value checkpoints for incremental loads — the state behind
  * Sqoop's `--incremental append/lastmodified` saved last-value
  * (`odps-sqoop/src/java/org/apache/sqoop/SqoopOptions.java:322-329`) and
  * the Flume/OGG offset persistence (`Configure.java:51-52`,
  * `HandlerInfoManager.java`). One tiny file per (job, key); writes are
  * atomic (tmp + overwrite-rename) so a crashed driver never leaves a torn
  * checkpoint. All IO goes through the Hadoop `FileSystem` API, so an
  * incremental job can checkpoint to the cluster's durable store (HDFS,
  * S3A, file://) — not just the driver's local disk.
  */
final class Checkpoints(dir: String) {
  private val root = new Path(dir)
  Fs.mkdirs(root)

  private def file(job: String): Path = new Path(root, s"$job.ckpt")

  def load(job: String): Option[String] = {
    val f = file(job)
    if (Fs.exists(f)) Some(Fs.readString(f)) else None
  }

  def save(job: String, value: String): Unit = {
    val tmp = new Path(root, s".$job.ckpt.tmp")
    Fs.writeString(tmp, value)
    Fs.renameOverwrite(tmp, file(job))
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
