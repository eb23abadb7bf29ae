package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gap-based sessionization — the canonical user-activity operator
  * (and the curation analogue of grouping crawl events into visits).
  * Two implementations, same boundary semantics (pinned empirically
  * in SessionsSpec): a session breaks only when the gap to the
  * previous event is STRICTLY greater than `gapSec` — an event
  * exactly `gapSec` after its predecessor merges in BOTH forms
  * (Spark merges session windows that merely touch: `[t, t+gap]`
  * closure over overlap-or-abut, not half-open intervals).
  *
  * Scale: the window form shuffles once on the user key and sorts per
  * user — parallelism is user-proportional, which is the right shape
  * for activity data (no 3-key skew: user cardinality is huge). The
  * native form is one `session_window` aggregation: Spark merges
  * windows in a single `MergingSessionsExec`-style pass and, unlike
  * the window form, supports streaming with watermark-based state
  * eviction (see the streaming test in SessionsSpec).
  */
object Sessions {

  /** Per-event session index (1-based per user, in time order). */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 gapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSec * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-session aggregates from the window form: bounds, size,
    * decimal-exact value sum, duration.
    */
  def stats(df: DataFrame, userCol: String, tsCol: String, valCol: String,
            gapSec: Long): DataFrame =
    sessionize(df, userCol, tsCol, gapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valCol).cast(DecimalType(20, 4))).cast("double").as("sum_value"))
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))

  /** Native `session_window` form. Emits the same shape minus the
    * per-user ordinal (window merging has no natural ordinal);
    * `session_end` is the max event time (= window end − gap, since
    * the merged window end is last-event + gap).
    */
  def statsNative(df: DataFrame, userCol: String, tsCol: String,
                  valCol: String, gapSec: Long): DataFrame =
    df.groupBy(col(userCol), session_window(col(tsCol), s"$gapSec seconds").as("__sw"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valCol).cast(DecimalType(20, 4))).cast("double").as("sum_value"))
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
      .drop("__sw")
}
