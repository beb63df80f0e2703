package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators (the streaming variants live in
  * graft.streaming.EventStream and share these shapes). Timestamps in
  * the testdata are nanosecond parquet; Spark reads µs and DuckDB ns,
  * so every oracle-gated derivation floors to whole seconds/hours
  * first.
  */
object Events {

  /** #20: JSON property extraction + filter pushdown. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"))
  }

  val jsonExtractSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
       FROM events WHERE event_type = 'purchase'"""

  /** #26: gap-based sessionization (30-min inactivity) — lag +
    * running sum of boundary flags, partitioned per user so the whole
    * computation parallelizes across the user hash space with a
    * single shuffle.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"))
      .withColumn("gap", $"ts_sec" - lag($"ts_sec", 1).over(byUser))
      .withColumn("is_new", when($"gap".isNull || $"gap" > 1800, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"is_new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"event_id", $"user_id", $"session_id")
  }

  val sessionizeSql: String =
    """WITH e AS (
         SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
         FROM events),
       g AS (
         SELECT event_id, user_id, ts_sec,
                ts_sec - lag(ts_sec) OVER w AS gap
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
       SELECT event_id, user_id,
              CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
       FROM g"""

  /** #26b: the same sessionization through Spark's native
    * `session_window` operator (gap-merged windows in one pass) —
    * cross-validated against the manual lag+cumsum form by sharing
    * an oracle derived from it. Emitted in epoch seconds: the
    * window's end is exclusive (last event + gap).
    */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", timestamp_seconds(unix_timestamp($"ts")).as("tss"),
        $"event_id")
      .groupBy($"user_id", session_window($"tss", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        unix_timestamp($"session_window.start").as("start_sec"),
        unix_timestamp($"session_window.end").as("end_sec"),
        $"n_events")
  }

  /** Oracle: the lag+cumsum session ids re-aggregated to window
    * extents; end = last event + gap (session_window's exclusive
    * end).
    */
  val sessionWindowsSql: String =
    """WITH e AS (
         SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
         FROM events),
       g AS (
         SELECT event_id, user_id, ts_sec,
                ts_sec - lag(ts_sec) OVER w AS gap
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
       s AS (
         SELECT event_id, user_id, ts_sec,
                sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS session_id
         FROM g)
       SELECT user_id, min(ts_sec) AS start_sec,
              max(ts_sec) + 1800 AS end_sec,
              count(*) AS n_events
       FROM s GROUP BY user_id, session_id"""

  /** #27: hourly rollup — the batch equivalent of the streaming
    * tumbling-window aggregation.
    */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
  }

  val hourlyRollupSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 2) AS total
       FROM events GROUP BY 1, 2"""
}
