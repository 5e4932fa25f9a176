package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Stateful streaming funnel — [[graft.operators.Funnel]]'s first-touch
  * strict-order chain evaluated INCREMENTALLY as events arrive, with O(k)
  * state per entity (k reach timestamps, independent of event count).
  *
  * Exactness contract: the forward-only chain update is EXACTLY the batch
  * semantics whenever event time is monotone across micro-batches for
  * each entity (within a batch, events are sorted by (ts, step) — the
  * same tie convention the batch operator's windows produce). The chain
  * only ever extends: t1 is the first step-1 event seen, and a later
  * batch can never produce an earlier timestamp under the monotone
  * premise, so no retraction is ever needed. Late data beyond batch
  * monotonicity is ignored by the chain (a straggler that would have
  * advanced the funnel earlier is missed) — the deliberate streaming
  * trade; reconcile stragglers with a periodic batch
  * [[graft.operators.Funnel.reach]] over the settled corpus.
  * `StreamingSpec` pins stream ≡ batch over time-split batches.
  */
object StreamFunnel {

  /** One funnel-relevant event: `step` is the 0-based step index (the
    * caller maps predicates to indices and drops non-step events),
    * `ts` is event-time millis. */
  final case class StepEvent(entity: Long, step: Int, ts: Long)

  /** Per-entity progression: `reached` steps completed; `stepTs(i)` is the
    * first-touch time of step i+1 (length == reached). */
  final case class FunnelReach(entity: Long, reached: Int, stepTs: Seq[Long])

  /** Update-mode stream of per-entity funnel progression; each micro-batch
    * emits the post-batch state of every entity it touched. State lives in
    * the checkpointed state store. `withinMs` bounds the whole funnel
    * relative to t1, matching the batch operator's `within`. */
  def reachStream(events: Dataset[StepEvent], numSteps: Int,
      withinMs: Option[Long] = None): Dataset[FunnelReach] = {
    require(numSteps > 0, "funnel needs at least one step")
    implicit val reachEnc = Encoders.product[FunnelReach]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.entity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[StepEvent],
         state: GroupState[FunnelReach]) =>
          // (ts, step) order: at equal timestamps the earlier step is
          // considered first, and the strict > then rejects the later
          // step — identical to the batch windows' tie behavior
          val sorted = batch.toSeq.sortBy(e => (e.ts, e.step))
          var reached = state.getOption.map(_.reached).getOrElse(0)
          var times = state.getOption
            .map(_.stepTs.toArray).getOrElse(Array.empty[Long])
          sorted.foreach { e =>
            if (reached < numSteps && e.step == reached) {
              val ok =
                if (reached == 0) true
                else e.ts > times(reached - 1) &&
                  withinMs.forall(w => e.ts <= times(0) + w)
              if (ok) { times = times :+ e.ts; reached += 1 }
            }
          }
          val out = FunnelReach(key, reached, times.toSeq)
          state.update(out)
          out
      }
  }
}
