package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user running statistics via Spark 4's transformWithState — the
  * modern arbitrary-state API (successor of mapGroupsWithState):
  * typed ValueState per key, explicit TTL support, RocksDB-backed.
  * Emits (user_id, event_count, value_sum) after every batch touch.
  *
  * At 100 TB/day the properties that matter: state is per-key and
  * O(1) per user, TTL (pass a finite TTLConfig) bounds the store for
  * churning key spaces, and the RocksDB provider spills state off-heap
  * — none of which the aggregate-based APIs expose. */
class UserStatsProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double)] {

  @transient private var stats: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    stats = getHandle.getValueState[(Long, Double)]("stats",
      Encoders.product[(Long, Double)], ttl)

  /** Input rows are (event_id, user_id, value) keyed by user_id. */
  override def handleInputRows(userId: Long, rows: Iterator[(Long, Long, Double)],
                               timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var (n, s) = if (stats.exists()) stats.get() else (0L, 0.0)
    rows.foreach { case (_, _, v) => n += 1; s += v }
    stats.update((n, s))
    Iterator.single((userId, n, s))
  }
}
