package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal table operators over timestamped event streams, batch side:
  * as-of join and gaps-and-islands sessionization. Both are one-shuffle,
  * window-per-key shapes: the only exchange is the hash partition on the
  * key column, and every window is PARTITION BY key (never a global
  * ORDER BY), so per-key groups stream through executors independently —
  * the layout that survives a 1000-executor scale-up. Hot keys are the
  * usual caveat: a single key's rows must fit one task's spill budget,
  * which holds for per-user event streams (a "user" with 100M events is a
  * data bug, not a plan input).
  */
object Temporal {

  /** As-of join: for each left row, the single most recent right row with
    * `right.ts <= left.ts` and the same key (inclusive, like DuckDB's
    * `ASOF JOIN ... ON r.ts <= l.ts`). Left rows with no prior right row
    * are kept with nulls (left-outer semantics).
    *
    * Implemented as the union-sweep, not a range join: tag both inputs,
    * union them, and run `last(right_payload, ignoreNulls)` over a window
    * partitioned by key and ordered by (ts, side) — right rows sort before
    * left rows at equal timestamps, which is exactly what makes the match
    * inclusive. One shuffle total (the window's key partition); a naive
    * `l JOIN r ON ts BETWEEN ...` + row_number is a quadratic range join
    * at scale, and a per-left correlated subquery never distributes.
    *
    * `rightPayload` names the right columns to carry; they surface
    * prefixed to avoid colliding with left columns. Ties among right rows
    * at the same (key, ts) are broken by `tieBreak` (defaults to the first
    * payload column) so the result is deterministic. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightPayload: Seq[String], prefix: String = "asof_",
      tieBreak: Option[String] = None): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name >= 1 column")
    val leftCols = left.columns.toSeq
    val tb = tieBreak.getOrElse(rightPayload.head)
    val payloadCols = (rightPayload :+ tb).distinct
    val rSchema = right.select(payloadCols.map(col): _*).schema
    val l = left.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(1).as("_side"), struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(rSchema).as("_r"))
    val r = right.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(0).as("_side"), lit(null).cast(l.schema("_l").dataType).as("_l"),
      struct(payloadCols.map(col): _*).as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col(s"_r.$tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    swept.select(
      leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightPayload.map(c => col(s"_match.$c").as(s"$prefix$c")): _*)
  }

  /** Gaps-and-islands sessionization: events of one key belong to the same
    * session while consecutive gaps stay <= `gapUs` microseconds. Returns
    * one row per session: key, session start/end, event count, and the sum
    * of `valueCol`. Two windows, both PARTITION BY key (lag to flag
    * session starts, running sum to number them), then one aggregation —
    * all on the same key partitioning, so Catalyst plans a single
    * exchange. This is the batch twin of
    * [[graft.streaming.GraftStreaming.sessionize]] (same session
    * semantics, flatMapGroupsWithState on the stream side). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gap must be positive, got $gapUs")
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val newSession = when(
      col("_prev").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("_prev")) > gapUs, 1L)
      .otherwise(0L)
    events
      .select(col(keyCol), col(tsCol), col(valueCol))
      .withColumn("_prev", lag(col(tsCol), 1).over(byKey))
      .withColumn("_new", newSession)
      .withColumn("_sid", sum(col("_new"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_sid"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        (unix_micros(col("session_end")) -
          unix_micros(col("session_start"))).as("dur_us"),
        col("n_events"), col("total_value"))
  }
}
