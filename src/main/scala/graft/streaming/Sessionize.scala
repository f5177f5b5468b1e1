package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization — a training-data / behavioral-analytics operator
  * in two execution shapes:
  *
  *  - [[batchSessions]]: the gap-based window formulation (lag → new-session
  *    flag → running session index → per-session aggregate). Three window
  *    passes over ONE (user) partitioning — a single shuffle.
  *  - [[streamingCounts]]: the stateful streaming shape via
  *    `mapGroupsWithState` (per-key state survives across micro-batches).
  */
object Sessionize {

  /** Gap-based sessions: events within `gapSeconds` of the previous event
    * of the same user share a session. `tieBreak` must make the per-user
    * ordering total (deterministic session boundaries on tied timestamps).
    * Output: one row per session (user, session_idx, session_start,
    * session_end, n_events, total_value). */
  def batchSessions(events: DataFrame, userCol: String, tsCol: String,
                    valueCol: String, tieBreak: String,
                    gapSeconds: Long): DataFrame = {
    val order = Seq(col(tsCol), col(tieBreak))
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    val withFlag = events.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          (unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev"))) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withFlag.groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("total_value"))
  }

  case class UserCount(user_id: Long, n: Long)

  /** Stateful per-user event counting across micro-batches — the
    * `mapGroupsWithState` shape (state outlives each batch; the building
    * block for streaming sessionization / per-entity accumulators). */
  def streamingCounts(events: DataFrame, userCol: String): Dataset[UserCount] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val ucEnc = Encoders.product[UserCount]
    events.select(col(userCol).cast("long")).as[Long](Encoders.scalaLong)
      .groupByKey(identity)(Encoders.scalaLong)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          UserCount(user, n)
      }
  }
}
