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

  /** Session path mining — the top-k most common within-session event
    * SEQUENCES ("view>click>purchase"), the funnel-discovery counterpart
    * of [[batchSessions]]' per-session rollup. Sessions split on
    * `ts − prev > gapMicros` under the (tsMicros, id) total order; each
    * session's path is its states joined in that order; paths rank by
    * (count desc, path) on the heap top-k node — no global sort.
    *
    * Scale shape: one entity-key shuffle (lag + cumulative flag sum),
    * one (entity, session) aggregation whose collect_list is bounded by
    * session length (sessions are short by the gap construction — a
    * pathological never-idle entity degrades to its event count, the
    * same bound any sessionizer has), then a path-sized count. */
  def sessionPaths(events: DataFrame, entityCol: String, tsMicrosCol: String,
                   idCol: String, stateCol: String, gapMicros: Long,
                   topK: Int): DataFrame = {
    require(gapMicros > 0 && topK >= 1, "need positive gap and topK")
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsMicrosCol), col(idCol))
    val withSess = events
      .withColumn("__prev", lag(col(tsMicrosCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col(tsMicrosCol) - col("__prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = withSess
      .groupBy(col(entityCol), col("__sid"))
      .agg(collect_list(struct(col(tsMicrosCol), col(idCol), col(stateCol))).as("__evs"))
      .select(array_join(
        transform(array_sort(col("__evs")), e => e.getField(stateCol)), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    graft.plan.TopKPerGroup(paths, Seq(lit(1)),
      Seq(col("n").desc, col("path").asc), topK, "rank")
      .select(col("rank"), col("path"), col("n"))
  }

  case class OpenSession(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, start: Long, end: Long, n_events: Long)

  /** Stateful streaming session CLOSER via `flatMapGroupsWithState` —
    * the 0..n-outputs-per-key shape `mapGroupsWithState` cannot express:
    * each micro-batch folds a user's (sorted) event times into the open
    * session carried in state, EMITS every session closed by a gap
    * (> `gapMicros`) — whether the gap falls inside one batch or
    * between batches — and keeps the still-open session in state for the
    * next batch. Emission timing is deterministic given the batch
    * boundaries (the spec replays a fixed 2-file split); the final open
    * session stays un-emitted, exactly like a live pipeline (a timeout
    * or an end-of-stream flush would release it).
    *
    * Scale shape: state is ONE OpenSession per active user (bounded by
    * the entity cardinality, same class as [[streamingCounts]]); each
    * batch shuffles only its own events onto the state partitioning. */
  def streamingClosedSessions(events: DataFrame, userCol: String,
                              tsMicrosCol: String,
                              gapMicros: Long): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val tupleEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val stateEnc = Encoders.product[OpenSession]
    events.select(col(userCol).cast("long"), col(tsMicrosCol).cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[(Long, Long)], state: GroupState[OpenSession]) =>
          val ts = batch.map(_._2).toArray.sorted
          var open = state.getOption.orNull
          val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
          for (t <- ts) {
            if (open == null) open = OpenSession(t, t, 0L)
            else if (t - open.last > gapMicros) {
              closed += ClosedSession(user, open.start, open.last, open.n)
              open = OpenSession(t, t, 0L)
            }
            // a cross-batch LATE event (t <= open.last — there is no
            // watermark, so late arrival is normal input) joins the open
            // session without rewinding its frontier: `last` must stay
            // monotone or the next gap test compares against a rewound
            // timestamp and can emit end < start
            open = open.copy(start = math.min(open.start, t),
              last = math.max(open.last, t), n = open.n + 1)
          }
          if (open != null) state.update(open)
          closed.iterator
      }
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
