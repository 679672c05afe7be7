package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
  ExpiredTimerInfo, StatefulProcessor, ValueState, TTLConfig}

/** One throttled snapshot: the key's running total at emit time, plus the
  * processing-time instant the timer fired. */
case class ThrottleEmit(user_id: Long, total: Long, fired_at_ms: Long)

/** Pure transition core of [[ProcTimeThrottleProcessor]], factored out so
  * the processing-time semantics are testable with a CONTROLLED CLOCK
  * (ProcTimeSpec drives `nowMs` by hand) — the streaming wrapper only
  * does state-store plumbing. Contract: per key, at most one emit per
  * `intervalMs` of processing time, each emit carrying the then-current
  * running total; a quiet key (no new events since its last emit) holds
  * no timer and emits nothing. This is flink's processing-time
  * ProcessFunction throttle (rate-limited dashboard update): unlike every
  * event-time processor in this package, firing depends on the WALL CLOCK
  * of the operator, not on watermarks — replaying the same events faster
  * yields fewer, larger snapshots, which is the documented (and intended)
  * nondeterminism of processing-time semantics. */
object ProcTimeThrottle {
  /** (running total, does a registered timer exist). */
  final case class St(total: Long, timerArmed: Boolean)
  val zero: St = St(0L, timerArmed = false)

  /** Fold `n` new events in at processing time `nowMs`: returns the new
    * state and, when the key had no armed timer, the instant to register
    * one (now + interval — the throttle window opens at FIRST dirty, so
    * a steady trickle emits once per interval, not once per event). */
  def onEvents(st: St, n: Long, nowMs: Long, intervalMs: Long): (St, Option[Long]) =
    if (st.timerArmed) (st.copy(total = st.total + n), None)
    else (St(st.total + n, timerArmed = true), Some(nowMs + intervalMs))

  /** Timer fired at `fireMs`: emit the snapshot and disarm — the next
    * event re-arms, so a quiet key stays silent. */
  def onTimer(st: St, key: Long, fireMs: Long): (St, ThrottleEmit) =
    (st.copy(timerArmed = false), ThrottleEmit(key, st.total, fireMs))
}

/** Processing-time timer twin (r14, VERDICT r13 #4): the one processor in
  * this package on `TimeMode.ProcessingTime()` — all others are
  * event-time. Usage:
  *
  * {{{
  * stream.groupByKey(_.user_id)
  *   .transformWithState(new ProcTimeThrottleProcessor(1000),
  *     TimeMode.ProcessingTime(), OutputMode.Append())
  * }}}
  *
  * Timer instants come from `timers.getCurrentProcessingTimeInMs()` and
  * fire when a micro-batch runs at-or-after them — no watermark is
  * involved. The decision logic lives in [[ProcTimeThrottle]] under a
  * controlled clock; ProcTimeSpec additionally smoke-runs this wrapper
  * end-to-end through `transformWithState` with a real clock. */
class ProcTimeThrottleProcessor(intervalMs: Long)
    extends StatefulProcessor[Long, Event, ThrottleEmit] {
  @transient private var total: ValueState[Long] = _
  @transient private var armed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)
    armed = getHandle.getValueState[Boolean]("armed", Encoders.scalaBoolean, TTLConfig.NONE)
  }

  private def st: ProcTimeThrottle.St = ProcTimeThrottle.St(
    if (total.exists()) total.get() else 0L,
    if (armed.exists()) armed.get() else false)

  private def put(s: ProcTimeThrottle.St): Unit = {
    total.update(s.total); armed.update(s.timerArmed)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[ThrottleEmit] = {
    val n = rows.size.toLong
    val (next, reg) = ProcTimeThrottle.onEvents(st, n,
      timers.getCurrentProcessingTimeInMs(), intervalMs)
    put(next)
    reg.foreach(getHandle.registerTimer)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[ThrottleEmit] = {
    val (next, emit) = ProcTimeThrottle.onTimer(st, key, expired.getExpiryTimeInMs())
    put(next)
    Iterator.single(emit)
  }
}
