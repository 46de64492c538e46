package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` fixture table (batch forms;
  * the Structured Streaming counterparts live in `graft.streaming`).
  *
  * The reference has no streaming surface (SURVEY.md §2.8) — these extend
  * the engine per the north star. `ts` arrives as epoch-nanosecond LONGs:
  * the fixtures carry parquet TIMESTAMP(NANOS), which Spark only reads
  * via `spark.sql.legacy.parquet.nanosAsLong=true` (set in our session
  * builders); we keep the integer form end-to-end so results are
  * timezone-proof and engine-portable (DuckDB: `epoch_ns`/`epoch_ms`).
  *
  * Scale posture: tumbling windows are a plain hash agg on a derived key
  * (map-side partial aggs apply); sessionization shuffles once on
  * user_id and sorts within partitions — the classic gaps-and-islands
  * plan that survives any data size as long as a single user's events
  * fit a partition (salt pathological hot users upstream if not).
  */
object Events {

  /** Epoch-milliseconds from the ns LONG (floor division — ts ≥ 0). */
  private def ms = expr("ts div 1000000")

  /** Tumbling-window aggregate: count / avg / sum of `value` per
    * (event_type, window). `widthMs` is the window width. */
  def tumbling(events: DataFrame, widthMs: Long): DataFrame =
    events
      .withColumn("window_start_ms", (ms - (ms % widthMs)).cast("long"))
      .groupBy(col("event_type"), col("window_start_ms"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("value")), 9).as("avg_value"),
        round(sum(col("value")), 9).as("sum_value"))

  /** Gap-based sessionization (gaps-and-islands): a new session starts
    * when the time since the user's previous event exceeds `gapMs`.
    * Returns one row per session with start/end/duration/count/sum. */
  def sessionize(events: DataFrame, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapNs = gapMs * 1000000L
    events
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("ts") - col("__prev") > gapNs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      // `div` (integer division) — epoch-ns values exceed double's 53-bit
      // mantissa, so `/` (float division) would lose milliseconds
      .agg(count(lit(1)).as("n_events"),
        expr("min(ts) div 1000000").as("start_ms"),
        expr("max(ts) div 1000000").as("end_ms"),
        expr("(max(ts) - min(ts)) div 1000000").as("duration_ms"),
        round(sum(col("value")), 9).as("sum_value"))
  }

  /** M7-shaped run table: one "run" per event_type with its objective
    * (avg value) and start time, plus the dense `iteration` index in
    * start-time order (`tuning_analysis.py:30-41`). */
  def runTable(events: DataFrame): DataFrame = {
    val runs = events.groupBy(col("event_type").as("job_name"))
      .agg(round(avg(col("value")), 9).as("objective"),
        expr("min(ts) div 1000000").as("start_ms"))
    // tiny table (one row per event type) — single-partition window is fine
    Similarity.withIteration(runs, "start_ms")
      .withColumn("iteration", col("iteration").cast("long"))
  }
}
