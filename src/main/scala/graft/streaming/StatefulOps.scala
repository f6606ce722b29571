package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY §7.5) —
  * the escape hatch when windowed aggs can't express the state machine.
  *
  * Operator: per-user activity monitor. State = (event count, last
  * event µs). Each micro-batch emits one updated snapshot per active
  * user, flagging bursts (≥ `burstThreshold` events inside `burstUs`).
  * State size is O(users), bounded at scale by a ProcessingTime
  * timeout that [[expiringMonitor]] configures.
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, ts_us: Long)
  final case class UserState(count: Long, lastUs: Long, burstStartUs: Long,
      burstCount: Long)
  final case class UserSnapshot(user_id: Long, count: Long, lastUs: Long,
      burst: Boolean)

  val BurstThreshold = 5
  val BurstUs: Long = 60L * 1000000 // 1 minute

  def updateUser(userId: Long, events: Iterator[UserEvent],
      state: GroupState[UserState]): Iterator[UserSnapshot] = {
    var s = state.getOption.getOrElse(UserState(0, 0, 0, 0))
    var burst = false
    events.toSeq.sortBy(e => e.ts_us).foreach { e =>
      val inBurstWindow = e.ts_us - s.burstStartUs <= BurstUs
      s = s.copy(
        count = s.count + 1,
        lastUs = math.max(s.lastUs, e.ts_us),
        burstStartUs = if (inBurstWindow) s.burstStartUs else e.ts_us,
        burstCount = if (inBurstWindow) s.burstCount + 1 else 1)
      if (s.burstCount >= BurstThreshold) burst = true
    }
    state.update(s)
    Iterator(UserSnapshot(userId, s.count, s.lastUs, burst))
  }

  /** Wire the operator over a stream of [[UserEvent]]. */
  def monitor(spark: SparkSession, events: Dataset[UserEvent])
      : Dataset[UserSnapshot] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateUser)
  }

  /** [[monitor]] with bounded state: users idle past `ttlMs` of
    * processing time have their state dropped — the knob that keeps
    * state O(active users) instead of O(all users ever seen) on an
    * unbounded stream. Same per-event semantics while a user is live. */
  /** The TTL-wrapped update, split out so TestGroupState can drive
    * both branches deterministically (a live streaming-query test of
    * processing-time timeouts needs a wall clock). */
  def expiringUpdate(ttlMs: Long)(id: Long, evs: Iterator[UserEvent],
      state: GroupState[UserState]): Iterator[UserSnapshot] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val out = updateUser(id, evs, state)
      state.setTimeoutDuration(ttlMs)
      out
    }

  def expiringMonitor(spark: SparkSession, events: Dataset[UserEvent],
      ttlMs: Long = 3600L * 1000): Dataset[UserSnapshot] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        expiringUpdate(ttlMs) _)
  }
}
