package graft.sources

import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Async prefetch: overlap a partition's production with its consumption.
  *
  * The reference reads splits ahead of the consumer on background threads
  * into a bounded `BlockingQueue` (queue size 8, 60 s wait —
  * `read/columnar/AsyncPartitionReader.scala:32-130`, queue `:42-45`;
  * enable/size options `OdpsOptions.scala:102-106`). Spark's vectorized
  * Parquet scan already pipelines its I/O, so wrapping THAT would only add
  * a row-copy (SURVEY §2.1-4's sanctioned delegation) — the gap is
  * row-at-a-time sources with per-row/request latency (JDBC ranged
  * SELECTs, row-source downloads) and tasks whose downstream per-row work
  * is heavy enough to leave the source idle. There this wrapper decouples
  * the two sides inside each task: a daemon producer thread drains the
  * source iterator into a bounded queue of row CHUNKS (chunking amortizes
  * queue synchronization), while the task consumes from the queue —
  * wall-clock per task tends to max(produce, consume) instead of their
  * sum, with memory bounded by queueChunks·chunkRows rows.
  *
  * Semantics preserved: order, laziness across chunk boundaries, and
  * failure — a producer error surfaces to the consumer at the chunk
  * boundary where it occurred (all chunks before it are delivered; the
  * failing chunk's partial contents are not — failure is batch-granular,
  * as in the reference's batch reader). Task kill/completion cancels the
  * producer (it never blocks forever on an abandoned queue), and a
  * stalled producer surfaces as a timeout instead of a hung task.
  */
object AsyncPrefetch {

  private val Poison = new Object

  /** Wrap `it` with a bounded background prefetcher. Chunks of up to
    * `chunkRows` elements are queued, at most `queueChunks` ahead;
    * `timeoutMs` bounds how long the consumer tolerates a producer making
    * NO PROGRESS — neither reading a row nor offering a chunk (the
    * reference's 60 s wait). Progress resets the clock: a slow-but-alive
    * source (hundreds of ms per row — the very workload this wrapper
    * exists for) never times out just because a full chunk takes longer
    * than `timeoutMs` to accumulate. Buffered elements must be immutable or
    * owned copies — Dataset.mapPartitions hands out deserialized copies,
    * which is why [[rows]] goes through it (raw InternalRow iterators
    * reuse their row object and must NOT be buffered). */
  def prefetch[T](it: Iterator[T], queueChunks: Int = 8, chunkRows: Int = 256,
      timeoutMs: Long = 60000L): Iterator[T] = {
    require(queueChunks > 0 && chunkRows > 0)
    if (!it.hasNext) return Iterator.empty
    val queue = new ArrayBlockingQueue[AnyRef](queueChunks)
    @volatile var cancelled = false
    @volatile var error: Throwable = null

    // a killed/completed task must release the producer even if it is
    // blocked offering into a full queue nobody will drain
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
      cancelled = true
      queue.clear()
    })

    def offerUntilCancelled(x: AnyRef): Unit =
      while (!cancelled && !queue.offer(x, 100, TimeUnit.MILLISECONDS)) ()

    @volatile var lastProgressNanos = System.nanoTime()

    val producer = new Thread(() => {
      try {
        val buf = new ArrayBuffer[T](chunkRows)
        while (it.hasNext && !cancelled) {
          buf.clear()
          while (it.hasNext && buf.length < chunkRows) {
            buf += it.next()
            lastProgressNanos = System.nanoTime()
          }
          offerUntilCancelled(buf.toVector)
          lastProgressNanos = System.nanoTime()
        }
      } catch { case t: Throwable => error = t }
      finally offerUntilCancelled(Poison)
    }, "graft-prefetch")
    producer.setDaemon(true)
    producer.start()

    new Iterator[T] {
      private var chunk: Vector[T] = Vector.empty
      private var idx = 0
      private var exhausted = false

      private def pump(): Unit =
        while (!exhausted && idx >= chunk.size) {
          // poll in slices so the progress clock is consulted while
          // waiting — only a producer that is neither reading rows nor
          // offering chunks for timeoutMs is declared dead
          val polled = queue.poll(
            math.min(100L, timeoutMs), TimeUnit.MILLISECONDS)
          if (polled == null) {
            if ((System.nanoTime() - lastProgressNanos) / 1000000L >= timeoutMs) {
              cancelled = true
              throw new java.util.concurrent.TimeoutException(
                s"prefetch producer made no progress for ${timeoutMs} ms")
            }
          } else if (polled.eq(Poison)) {
            exhausted = true
            if (error != null) throw error
          } else {
            chunk = polled.asInstanceOf[Vector[T]]
            idx = 0
          }
        }

      override def hasNext: Boolean = { pump(); !exhausted }
      override def next(): T = {
        pump()
        if (exhausted) throw new NoSuchElementException
        val x = chunk(idx); idx += 1; x
      }
    }
  }

  /** DataFrame form: inserts the prefetch boundary per partition via
    * `mapPartitions` (rows arrive as deserialized copies there, so
    * buffering them is safe — the copy is the same price the reference
    * pays moving batches into its queue). The plan, partitioning and row
    * order are unchanged; only the in-task pipelining differs. Opt-in,
    * like the reference's prefetch switch. */
  def rows(df: DataFrame, queueChunks: Int = 8, chunkRows: Int = 256,
      timeoutMs: Long = 60000L): DataFrame =
    df.mapPartitions(it => prefetch(it, queueChunks, chunkRows, timeoutMs))(
      Encoders.row(df.schema))
}
