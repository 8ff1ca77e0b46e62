package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY.md §2 Tier B "UDF/custom state"):
  * per-user running aggregates via mapGroupsWithState — the primitive
  * the built-in windows can't express (cross-trigger, per-key state
  * with custom merge logic).
  *
  * State is one small case class per user_id: at 100 TB/day the state
  * store is bounded by |active users|, not event volume, and the
  * watermark-driven timeout (`GroupStateTimeout`) evicts idle keys.
  */
object Stateful {

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class SessionState(startUs: Long, lastUs: Long, n: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Custom event-time sessionization via flatMapGroupsWithState: a
    * session closes when the user is idle for `gap`, enforced two ways —
    * in-batch (gap between consecutive events inside one trigger) and
    * across triggers (EventTimeTimeout fires once the watermark passes
    * lastSeen + gap, which is what `session_window` cannot customize:
    * here the close emits a summary row only, and the gap rule could be
    * any per-key predicate). State per key is three longs; eviction is
    * watermark-driven, so the store is bounded by |users idle < gap|.
    *
    * Input must carry a watermark on `ts` (the caller sets it; the
    * timeout needs it to fire). */
  def sessionize(events: Dataset[SessionEvent], gapSec: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapSec * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.startUs, s.lastUs, s.n))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000L
              cur match {
                case Some(s) if us - s.lastUs > gapUs =>
                  closed += ClosedSession(uid, s.startUs, s.lastUs, s.n)
                  cur = Some(SessionState(us, us, 1L))
                case Some(s) =>
                  cur = Some(SessionState(s.startUs, math.max(s.lastUs, us), s.n + 1L))
                case None =>
                  cur = Some(SessionState(us, us, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapSec * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Idempotent foreachBatch sink: merges each micro-batch's keyed
    * rows into a store, recording the batch id per key. Spark's
    * foreachBatch contract is AT-LEAST-ONCE — after a failure the same
    * (batchId, data) pair replays — so the sink must make re-applying
    * a batch a no-op: a key ignores writes whose batchId is <= the one
    * already applied. With update-mode aggregates (absolute values,
    * not deltas), replay then converges to exactly-once table state —
    * the standard recipe for a transactional upsert target. The
    * in-memory TrieMap stands in for the external table; a real
    * deployment swaps `merge` for a MERGE INTO. */
  final class IdempotentUpsertStore extends Serializable {
    private val rows =
      scala.collection.concurrent.TrieMap.empty[Long, (Long, Double)]
    def merge(batchId: Long, batch: Iterable[(Long, Double)]): Unit =
      batch.foreach { case (k, v) =>
        rows.updateWith(k) {
          case Some((bid, old)) if bid >= batchId => Some((bid, old))
          case _ => Some((batchId, v))
        }
      }
    def snapshot: Map[Long, Double] =
      rows.readOnlySnapshot().map { case (k, (_, v)) => k -> v }.toMap
  }

  /** Wire an update-mode per-user total aggregation into the
    * idempotent store via foreachBatch. Returns the started query. */
  def upsertTotals(events: DataFrame, store: IdempotentUpsertStore)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions._
    events
      .groupBy(col("user_id"))
      .agg(sum(col("value")).as("total"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val rows = batch.collect()
          .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("total"))
        store.merge(batchId, rows.toSeq)
      }
      .start()
  }

  /** Running per-user totals, updated every trigger. */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val next = UserTotals(uid, n, tot)
          state.update(next)
          next
      }
  }
}
