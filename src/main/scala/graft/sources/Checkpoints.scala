package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Durable last-value checkpoints for incremental loads — the state behind
  * Sqoop's `--incremental append/lastmodified` saved last-value
  * (`odps-sqoop/src/java/org/apache/sqoop/SqoopOptions.java:322-329`) and
  * the Flume/OGG offset persistence (`Configure.java:51-52`,
  * `HandlerInfoManager.java`). One tiny file per (job, key); writes are
  * atomic (tmp + move) so a crashed driver never leaves a torn checkpoint.
  */
final class Checkpoints(dir: String) {
  private val root: Path = Paths.get(dir)
  Files.createDirectories(root)

  private def file(job: String): Path = root.resolve(s"$job.ckpt")

  def load(job: String): Option[String] = {
    val f = file(job)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
    else None
  }

  def save(job: String, value: String): Unit = {
    val tmp = root.resolve(s".$job.ckpt.tmp")
    Files.write(tmp, value.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file(job), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
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
