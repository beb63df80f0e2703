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

  /** Sliding (hopping) window rollup: 3-hour windows advancing every
    * hour, so each event lands in exactly 3 overlapping windows —
    * the batch twin of a streaming hopping-window aggregation and
    * the moving-average shape dashboards ask of event streams.
    * Spark's native `window(ts, "3 hours", "1 hour")` plans the
    * 3-fold replication as a map-side generator (no join against a
    * window spine, no shuffle beyond the aggregate's own), and
    * windows are epoch-aligned to the slide, so the window set for
    * an event is exactly {trunc_hour(ts) − 2h, −1h, −0h} — which is
    * what the oracle enumerates. Distinct users adds the standard
    * two-phase distinct expand; both measures ride one exchange.
    */
  def slidingRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "3 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
      .select($"w.start".as("win_start"), $"n_events", $"n_users")
      .orderBy($"win_start")
  }

  val slidingRollupSql: String =
    """WITH e AS (
         SELECT user_id, date_trunc('hour', ts) - to_hours(CAST(k AS BIGINT))
                  AS win_start
         FROM events CROSS JOIN (SELECT unnest(range(0, 3)) AS k) g)
       SELECT win_start, CAST(count(*) AS BIGINT) AS n_events,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM e GROUP BY 1 ORDER BY 1"""

  /** Time-series gap fill: the hourly count series densified so every
    * hour between the observed min and max appears, absent hours as 0.
    * The hour domain is bounded by wall-clock span (a decade is ~88k
    * rows), not by corpus size, so the generated spine is
    * aggregate-scale no matter how large the event table is; the
    * repartition spreads it off the single explode task before the
    * join, and the per-hour counts side arrives pre-aggregated.
    */
  def gapfillHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.events(spark, dir)
      .select(expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy($"h").agg(count(lit(1)).as("n"))
    val spine = counts.agg(min($"h").as("lo"), max($"h").as("hi"))
      .select(explode(sequence($"lo", $"hi")).as("h"))
      .repartition(col("h"))
    spine.join(counts, Seq("h"), "left")
      .select($"h", coalesce($"n", lit(0L)).as("n"))
  }

  val gapfillHourlySql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b)
       SELECT hrs.h AS h, COALESCE(c.n, 0) AS n
       FROM hrs LEFT JOIN c USING (h)"""

  /** Volume-anomaly detection on the gap-filled hourly series: flag
    * hours whose count deviates from the trailing 24-hour window by
    * more than z=2 standard deviations. The z-test is the integer
    * cross-multiplied form (24·x − s1)² > z²·(24·s2 − s1²) — counts
    * are integers, so the flag is bit-exact across engines with no
    * fp mean/stddev anywhere (BIGINT headroom to per-hour counts
    * ~10⁸). ROWS frame on the densified series = true wall-clock
    * trailing day; the window is unpartitioned but runs over the
    * aggregate-scale hour spine (bounded by calendar span, not corpus
    * — WindowAuditSpec carries the exemption rationale).
    */
  def anomalyHours(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val trailing = Window.orderBy($"h").rowsBetween(-24, -1)
    gapfillHourly(spark, dir)
      .withColumn("nw", count(lit(1)).over(trailing))
      .withColumn("s1", sum($"n").over(trailing))
      .withColumn("s2", sum($"n" * $"n").over(trailing))
      .filter($"nw" === 24 &&
        (lit(24) * $"n" - $"s1") * (lit(24) * $"n" - $"s1") >
          lit(4) * (lit(24) * $"s2" - $"s1" * $"s1"))
      .select($"h", $"n", $"s1".as("sum24"))
  }

  val anomalyHoursSql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       filled AS (
         SELECT hrs.h AS h, COALESCE(c.n, 0) AS n
         FROM hrs LEFT JOIN c USING (h)),
       win AS (
         SELECT h, n,
                count(*)   OVER w AS nw,
                sum(n)     OVER w AS s1,
                sum(n * n) OVER w AS s2
         FROM filled
         WINDOW w AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
       SELECT h, n, CAST(s1 AS BIGINT) AS sum24 FROM win
       WHERE nw = 24
         AND (24 * n - s1) * (24 * n - s1) > 4 * (24 * s2 - s1 * s1)"""

  /** Hour-of-week seasonality profile (the load-shape input capacity
    * planning and anomaly baselines read): per (day-of-week, hour)
    * cell, event count and mean value. The mean is exact: values sum
    * as integer MICRO-units (order-free), and the single double
    * division happens at the final projection — same device as BM25.
    * dow is aligned to DuckDB's 0=Sunday. One map-side-partial hash
    * aggregate to 168 cells.
    */
  def weeklyProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select((dayofweek($"ts") - 1).cast("long").as("dow"),
        hour($"ts").cast("long").as("hod"),
        round($"value" * 1000000).cast("long").as("micros"))
      .groupBy($"dow", $"hod")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"micros").cast("double")
          / count(lit(1)).cast("double") / 1000000.0, 4).as("avg_value"))
      .orderBy($"dow", $"hod")
  }

  val weeklyProfileSql: String =
    """SELECT CAST(date_part('dow', ts) AS BIGINT) AS dow,
              CAST(date_part('hour', ts) AS BIGINT) AS hod,
              CAST(count(*) AS BIGINT) AS n_events,
              round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE) / 1000000.0, 4) AS avg_value
       FROM events
       GROUP BY 1, 2
       ORDER BY 1, 2"""

  /** Top session paths: most common event-type TRIGRAMS inside the
    * 30-minute sessions (the clickstream navigation-pattern query).
    * Session assembly is the #26 lag+cumsum sessionizer; per-session
    * sequences come from ONE collect of (ts, id, type) structs sorted
    * in-array (array_sort is a per-row sort of a bounded session, not
    * a shuffle sort), trigrams explode map-side, and only (path,
    * count) scalars reach the final aggregate. Σ session-length cost,
    * linear in events.
    */
  def pathTrigrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp($"ts").as("ts_sec"))
      .withColumn("gap", $"ts_sec" - lag($"ts_sec", 1).over(byUser))
      .withColumn("is_new", when($"gap".isNull || $"gap" > 1800, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"is_new").over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(array_sort(collect_list(
        struct($"ts_sec", $"event_id", $"event_type"))).as("evs"))
      .select(expr("transform(evs, e -> e.event_type)").as("seq"))
      .filter(size($"seq") >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(seq) - 2),
             i -> concat_ws('>', seq[i - 1], seq[i], seq[i + 1]))"""))
        .as("path"))
      .groupBy($"path")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path")
      .limit(10)
  }

  /** First-order Markov transition matrix between consecutive event
    * types per user: count and row-normalized probability. Counts are
    * exact integers; the probability is one double division at the
    * final projection over a window that sits on the 25-cell
    * AGGREGATE (type × type), not the corpus — the WindowAuditSpec
    * aggregate-input exemption class.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val counts = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_timestamp($"ts").as("ts_sec"),
        $"event_id")
      .withColumn("to_type", lead($"event_type", 1).over(byUser))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy($"from_type")
    counts
      .withColumn("prob", round($"n".cast("double")
        / sum($"n").over(byFrom).cast("double"), 4))
      .orderBy($"from_type", $"to_type")
  }

  val transitionMatrixSql: String =
    """WITH e AS (
         SELECT user_id, event_type, event_id,
                CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
         FROM events),
       p AS (
         SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts_sec, event_id) AS to_type
         FROM e),
       c AS (
         SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
         FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
       SELECT from_type, to_type, n,
              round(CAST(n AS DOUBLE)
                    / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4)
                AS prob
       FROM c ORDER BY from_type, to_type"""

  val pathTrigramsSql: String =
    """WITH e AS (
         SELECT event_id, user_id, event_type,
                CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
         FROM events),
       g AS (
         SELECT event_id, user_id, event_type, ts_sec,
                ts_sec - lag(ts_sec) OVER w AS gap
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
       s AS (
         SELECT event_id, user_id, event_type, ts_sec,
                sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS session_id
         FROM g),
       seqs AS (
         SELECT user_id, session_id,
                list(event_type ORDER BY ts_sec, event_id) AS seq
         FROM s GROUP BY user_id, session_id),
       tri AS (
         SELECT unnest([seq[i] || '>' || seq[i + 1] || '>' || seq[i + 2]
                        for i in range(1, len(seq) - 1)]) AS path
         FROM seqs WHERE len(seq) >= 3)
       SELECT path, CAST(count(*) AS BIGINT) AS n
       FROM tri GROUP BY path
       ORDER BY n DESC, path
       LIMIT 10"""
}
