package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful CDC upsert over a stream of I/U/D operations — the OGG handler
  * pipeline (`ogg-plugin/.../DatahubHandler.java`, op types I/U/D with
  * change-id ordering) as a Structured Streaming `mapGroupsWithState`.
  *
  * Per-key ordering: the reference routes by shard hash of the key columns
  * (`TableMapping.java:56`) so ops for one key arrive in order; Spark's
  * groupByKey gives the same per-key serialization, and `seq` disambiguates
  * within a micro-batch.
  */
object CdcStream {

  /** One CDC operation: op ∈ I/U/D, seq = change id (total order per key),
    * payload = after-image (before-images travel in `prev`). */
  final case class CdcOp(key: Long, op: String, seq: Long, value: Double)

  /** Current-state row emitted downstream after each applied op. */
  final case class CdcState(key: Long, alive: Boolean, seq: Long, value: Double)

  /** Apply ops to running per-key state; emits the post-op state of every
    * key touched in each micro-batch. State lives in the Spark state store
    * (checkpointed, recoverable — SURVEY §2.9 offset/state persistence). */
  def applyStream(ops: Dataset[CdcOp]): Dataset[CdcState] = {
    implicit val stateEnc = Encoders.product[CdcState]
    implicit val opEnc = Encoders.product[CdcOp]
    implicit val keyEnc = Encoders.scalaLong
    ops.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[CdcOp], state: GroupState[CdcState]) =>
          val sorted = batch.toSeq.sortBy(_.seq)
          // Option, not a sentinel seq: a magic initial value (-1) would
          // silently drop legitimate ops with seq <= sentinel on a fresh
          // key (signed/hash-derived sequence ids)
          var cur = state.getOption
          sorted.foreach { o =>
            if (cur.forall(c => o.seq > c.seq)) {
              cur = Some(
                if (o.op == "D")
                  CdcState(key, alive = false, o.seq, cur.fold(0.0)(_.value))
                else CdcState(key, alive = true, o.seq, o.value))
            } // stale op (seq regression): drop, per latest-wins semantics
          }
          // the group was invoked with at least one op, so cur is defined
          state.update(cur.get)
          cur.get
      }
  }

  /** Run a CDC op stream to completion (test/verification path) and return
    * the final alive state per key. */
  def runBatch(spark: SparkSession, ops: Dataset[CdcOp], name: String,
      statePartitions: Int = 4): Dataset[CdcState] = {
    import spark.implicits._
    val q = applyStream(ops)
    // size state-store parallelism to the workload, not the batch shuffle
    // width — every micro-batch pays per-store snapshot+commit IO
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val sq = q.writeStream
        .outputMode(OutputMode.Update)
        .format("memory")
        .queryName(name)
        .start()
      try sq.processAllAvailable() finally sq.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // memory sink in update mode appends per-batch snapshots; latest seq wins
    val tbl = spark.table(name).as[CdcState]
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"key").orderBy($"seq".desc)
    tbl.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"alive")
      .drop("rn")
      .as[CdcState]
  }
}
