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

  /** Session-population statistics over the [[sessionize]] output —
    * the engagement summary a product review reads: session count,
    * exact discrete duration percentiles (p50/p90 via the value-
    * histogram rank device — a duration is always a real observed
    * value), and floor-divided mean events per session. Durations
    * and counts are integers end to end; the per-session reduction
    * is one aggregate over the sessionized frame, the percentile
    * window runs over the duration HISTOGRAM (bounded by distinct
    * durations, not sessions).
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val sess = Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("ts_sec"))
      .withColumn("gap", $"ts_sec" - lag($"ts_sec", 1).over(byUser))
      .withColumn("is_new", when($"gap".isNull || $"gap" > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum($"is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_ev"),
        (max($"ts_sec") - min($"ts_sec")).as("dur"))
    val hist = sess.groupBy($"dur").agg(count(lit(1)).as("c"))
    val tot = sess.agg(count(lit(1)).as("n_sessions"),
      sum($"n_ev").as("n_events"))
    val w = Window.orderBy($"dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum($"c").over(w))
      .crossJoin(broadcast(tot))
    def pct(p: Int) = cum.filter($"cum" * 100L >= $"n_sessions" * p)
      .orderBy($"dur").limit(1).select($"dur")
    pct(50).crossJoin(pct(90).withColumnRenamed("dur", "dur90"))
      .crossJoin(broadcast(tot))
      .select($"n_sessions", $"n_events",
        expr("n_events div n_sessions").as("mean_events"),
        $"dur".as("p50_dur_s"), $"dur90".as("p90_dur_s"))
  }

  val sessionStatsSql: String =
    """WITH e AS (
         SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
         FROM events),
       g AS (
         SELECT event_id, user_id, ts_sec,
                ts_sec - lag(ts_sec) OVER w AS gap
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
       s AS (
         SELECT user_id, ts_sec,
                CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
         FROM g),
       sess AS (
         SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_ev,
                CAST(max(ts_sec) - min(ts_sec) AS BIGINT) AS dur
         FROM s GROUP BY 1, 2),
       t AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                    CAST(sum(n_ev) AS BIGINT) AS n_events FROM sess),
       h AS (SELECT dur, CAST(count(*) AS BIGINT) AS c
             FROM sess GROUP BY 1),
       cum AS (SELECT dur, CAST(sum(c) OVER (ORDER BY dur) AS BIGINT) AS cum
               FROM h),
       p50 AS (SELECT dur FROM cum CROSS JOIN t
               WHERE cum * 100 >= n_sessions * 50 ORDER BY dur LIMIT 1),
       p90 AS (SELECT dur AS dur90 FROM cum CROSS JOIN t
               WHERE cum * 100 >= n_sessions * 90 ORDER BY dur LIMIT 1)
       SELECT n_sessions, n_events, n_events // n_sessions AS mean_events,
              dur AS p50_dur_s, dur90 AS p90_dur_s
       FROM t CROSS JOIN p50 CROSS JOIN p90"""

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

  /** Gate `events_spine_banded`: the banded two-phase SPINE window
    * device ([[bandedSpine]], SURVEY's minute/second-grain valve)
    * board-verified ACROSS band boundaries on real data. The gated
    * operators that ride the device default to bandWidth 8192 —
    * wider than the whole sf0.01/sf0.1 hour spine, so on the board
    * the ghost machinery never engages and only TimeSeriesSpec's
    * synthetic cases exercised it. This gate forces a small band
    * (128 h) over the gap-filled spine, REQUIREs the spine actually
    * spans several bands (no vacuous pass), computes a trailing
    * 24-hour (sum, max) census, and hashes against DuckDB's plain
    * unpartitioned ROWS-frame window — any ghost row leaking into
    * the output, any band missing its cross-boundary prefix, any
    * off-by-one in the −1 nudge shows up as a hash mismatch.
    */
  def spineBanded(spark: SparkSession, dir: String,
      bandWidth: Long = 128L): DataFrame = {
    import spark.implicits._
    val spine = gapfillHourly(spark, dir)
    val ends = spine.agg(min($"h").as("lo"), max($"h").as("hi")).head
    val bands = Math.floorDiv(ends.getLong(1), bandWidth) -
      Math.floorDiv(ends.getLong(0), bandWidth) + 1L
    require(bands >= 3,
      s"events_spine_banded: spine spans only $bands band(s) at " +
        s"bandWidth=$bandWidth — the cross-band path would go unexercised")
    bandedSpine(spine, "h", lookback = 24, bandWidth = bandWidth) { (df, w0) =>
      val w = w0.rowsBetween(-23, 0)
      df.withColumn("nw", count(lit(1)).over(w))
        .withColumn("s24", sum($"n").over(w))
        .withColumn("mx", max($"n").over(w))
    }
      .filter($"nw" === 24)
      .select($"h", $"s24", $"mx")
      .orderBy($"h")
  }

  val spineBandedSql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       g AS (SELECT hrs.h AS h, COALESCE(c.n, 0) AS n
             FROM hrs LEFT JOIN c USING (h)),
       w AS (SELECT h,
               count(*) OVER win AS nw,
               sum(n) OVER win AS s24,
               max(n) OVER win AS mx
             FROM g
             WINDOW win AS (ORDER BY h
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
       SELECT h, CAST(s24 AS BIGINT) AS s24, CAST(mx AS BIGINT) AS mx
       FROM w WHERE nw = 24 ORDER BY h"""

  /** Volume-anomaly detection on the gap-filled hourly series: flag
    * hours whose count deviates from the trailing 24-hour window by
    * more than z=2 standard deviations. The z-test is the integer
    * cross-multiplied form (24·x − s1)² > z²·(24·s2 − s1²) — counts
    * are integers, so the flag is bit-exact across engines with no
    * fp mean/stddev anywhere (BIGINT headroom to per-hour counts
    * ~10⁸). ROWS frame on the densified series = true wall-clock
    * trailing day; runs under [[bandedSpine]], so the window is
    * band-partitioned and holds past hourly grain (SCALING.md
    * "Spine-granularity ceiling" carries the receipts).
    */
  def anomalyHours(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bandedSpine(gapfillHourly(spark, dir), "h", lookback = 24) { (df, w0) =>
      val trailing = w0.rowsBetween(-24, -1)
      df.withColumn("nw", count(lit(1)).over(trailing))
        .withColumn("s1", sum($"n").over(trailing))
        .withColumn("s2", sum($"n" * $"n").over(trailing))
    }
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

  /** Kleinberg burst detection (Kleinberg, "Bursty and hierarchical
    * structure in streams", KDD 2002 — the 2-state automaton): the
    * hourly count series is explained by a base state (rate = the
    * series mean) and a burst state (rate = s × base), with a
    * transition cost γ·ln n for entering the burst; the minimum-cost
    * state sequence (Viterbi) marks the burst intervals. The standard
    * "when did attention spike" primitive over event streams.
    *
    * Scale split, the [[anomalyRobustHours]] precedent: the per-hour
    * aggregation and gap-fill are DISTRIBUTED (the corpus reduces to
    * the calendar-bounded spine — ~88k rows/decade at any corpus
    * size); the 2-state Viterbi then runs driver-side over that
    * domain-sized series at gate construction (an inherently
    * sequential DP, like the PAV sweep and the Jacobi eigensolve —
    * O(spine) work on metadata). No SQL oracle exists for the DP →
    * rows-only gate; TimeSeriesSpec checks Viterbi against EXHAUSTIVE
    * state-sequence enumeration on short series, which a same-code
    * re-run could not.
    */
  def bursts(spark: SparkSession, dir: String, s: Double = 2.0,
      gamma: Double = 1.0): DataFrame = {
    import spark.implicits._
    val spine = gapfillHourly(spark, dir)
      .orderBy($"h").collect().map(r => (r.getLong(0), r.getLong(1)))
    val iv = burstIntervals(spine.toSeq, s, gamma)
    if (iv.isEmpty)
      spark.emptyDataset[(Long, Long, Long, Long)]
        .toDF("start_h", "end_h", "n_hours", "n_events")
    else
      iv.toDF("start_h", "end_h", "n_hours", "n_events")
        .orderBy($"start_h")
  }

  /** Viterbi over the 2-state automaton; returns (start_h, end_h,
    * n_hours, n_events) per maximal burst interval. Emission cost is
    * the Poisson negative log-likelihood −(c·ln r − r − ln c!), with
    * the ln c! term DROPPED (identical in both states, so it cancels
    * from every comparison); entering the burst costs γ·ln n.
    */
  def burstIntervals(series: Seq[(Long, Long)], s: Double,
      gamma: Double): Seq[(Long, Long, Long, Long)] = {
    if (series.isEmpty) return Nil
    val n = series.length
    val base = math.max(series.map(_._2).sum.toDouble / n, 1e-9)
    val burst = s * base
    def emit(c: Long, r: Double): Double = -(c * math.log(r) - r)
    val enter = gamma * math.log(n.toDouble)
    // dp(state): (cost, backpointers)
    var c0 = emit(series.head._2, base)
    var c1 = enter + emit(series.head._2, burst)
    val bp = Array.ofDim[Int](n, 2)
    bp(0)(0) = 0; bp(0)(1) = 1
    for (i <- 1 until n) {
      val e0 = emit(series(i)._2, base)
      val e1 = emit(series(i)._2, burst)
      val stay0 = c0; val from1 = c1 // leaving the burst is free
      val n0 = math.min(stay0, from1) + e0
      bp(i)(0) = if (stay0 <= from1) 0 else 1
      val stay1 = c1; val from0 = c0 + enter
      val n1 = math.min(stay1, from0) + e1
      bp(i)(1) = if (stay1 <= from0) 1 else 0
      c0 = n0; c1 = n1
    }
    // backtrack
    val states = new Array[Int](n)
    states(n - 1) = if (c0 <= c1) 0 else 1
    for (i <- n - 1 until 0 by -1) states(i - 1) = bp(i)(states(i))
    // maximal burst runs
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    var i = 0
    while (i < n) {
      if (states(i) == 1) {
        var j = i
        while (j < n && states(j) == 1) j += 1
        out += ((series(i)._1, series(j - 1)._1, (j - i).toLong,
          series.slice(i, j).map(_._2).sum))
        i = j
      } else i += 1
    }
    out.result()
  }

  /** Pairwise dynamic-time-warping distance between event-type
    * hour-of-day activity profiles (Berndt & Clifford 1994 — the
    * time-series-similarity classic; DTW forgives phase shifts a
    * Euclidean distance punishes, which is exactly what differing
    * usage rhythms are). Profiles are dense 24-point integer count
    * vectors; the warp runs in the native `dtw` kernel
    * (functions/Dtw.scala — exact BIGINT DP, whole-stage codegen) so
    * no oracle-unfriendly fp exists anywhere.
    *
    * Scale shape: the corpus collapses to |types|·24 counts in one
    * map-side-partial aggregate; profile assembly is a per-row
    * transform over a 24-slot spine (no second shuffle), and the
    * pairwise join runs on the TYPE domain — corpus-size-independent,
    * broadcast both sides. No SQL oracle exists for the DP (DuckDB
    * has no DTW and its RE2 SQL can't express the recurrence), so the
    * gate is rows-only and exactness is pinned by TimeSeriesSpec's
    * reference fold.
    */
  def dtwProfiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val prof = Tables.events(spark, dir)
      .select($"event_type", hour($"ts").cast("long").as("hod"))
      .groupBy($"event_type", $"hod")
      .agg(count(lit(1)).as("n"))
      .groupBy($"event_type")
      .agg(map_from_entries(collect_list(struct($"hod", $"n"))).as("m"))
      .select($"event_type",
        expr("transform(sequence(0L, 23L), h -> coalesce(element_at(m, h), 0L))")
          .as("profile"))
    val a = prof.select($"event_type".as("type_a"), $"profile".as("pa"))
    val b = prof.select($"event_type".as("type_b"), $"profile".as("pb"))
    a.join(broadcast(b), $"type_a" < $"type_b")
      .select($"type_a", $"type_b",
        call_function("dtw", $"pa", $"pb").as("dtw_dist"))
      .orderBy($"dtw_dist", $"type_a", $"type_b")
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

  /** Per-state transition entropy of the first-order session Markov
    * chain ([[transitionMatrix]]'s counts) plus the pooled
    * empirical entropy RATE — how predictable is the next action
    * given the current one, in integer micro-nats: a state with
    * H ≈ 0 is a funnel (one successor dominates), a state at
    * ln(|states|) is noise, and the pooled rate Σ p̂(i)·H(i) is the
    * per-step compressibility of user behavior (Shannon's source
    * rate under the empirical bigram model). Exactness device: each
    * cell's ln(n_from/n_cell) is quantized ONCE to micro-nats; row
    * numerators Σ n_cell·lnq are exact BIGINTs floor-divided by
    * n_from once, and the pooled rate divides the SAME global
    * numerator by N — so rows and the ALL row are consistent by
    * construction. Domain-sized after the per-user lead window
    * (|event types|² cells).
    */
  def entropyRate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val cells = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_timestamp($"ts").as("ts_sec"),
        $"event_id")
      .withColumn("to_type", lead($"event_type", 1).over(byUser))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
    val margins = cells.groupBy($"from_type").agg(sum($"n").as("n_from"))
    val terms = cells.join(broadcast(margins), Seq("from_type"))
      .withColumn("lnq",
        round(log($"n_from".cast("double") / $"n".cast("double")) *
          lit(1.0e6)).cast("long"))
    val rows = terms.groupBy($"from_type")
      .agg(max($"n_from").as("n_from"), sum($"n" * $"lnq").as("num"))
      .select($"from_type", $"n_from", expr("num div n_from").as("h_micro"))
    val pooled = terms.agg(sum($"n").as("n_from"),
      sum($"n" * $"lnq").as("num"))
      .select(lit("ALL").as("from_type"), $"n_from",
        expr("num div n_from").as("h_micro"))
    rows.unionByName(pooled).orderBy($"from_type")
  }

  val entropyRateSql: String =
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
         FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
       m AS (
         SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
         FROM c GROUP BY 1),
       terms AS (
         SELECT c.from_type, n, n_from,
                CAST(round(ln(CAST(n_from AS DOUBLE) / CAST(n AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS lnq
         FROM c JOIN m ON m.from_type = c.from_type),
       rows_ AS (
         SELECT from_type, CAST(max(n_from) AS BIGINT) AS n_from,
                CAST(sum(n * lnq) AS BIGINT) // max(n_from) AS h_micro
         FROM terms GROUP BY from_type
         UNION ALL
         SELECT 'ALL', CAST(sum(n) AS BIGINT),
                CAST(sum(n * lnq) AS BIGINT) // sum(n)
         FROM terms)
       SELECT from_type, n_from, CAST(h_micro AS BIGINT) AS h_micro
       FROM rows_ ORDER BY from_type"""

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

  /** CUSUM changepoint scan over the gap-filled hourly series — the
    * classic "where did the level shift" statistic. For hour index t
    * (1-based over the T-hour spine) with prefix sum P_t and grand
    * total G, the centered cumulative deviation Σ_{i≤t}(x_i − G/T)
    * is held EXACT by cross-multiplying through T: d_t = T·P_t −
    * t·G, an integer — no fp mean anywhere, so the argmax (the
    * changepoint estimate) is bit-identical across engines. The gate
    * reports the top-`k` hours by |d| (tie → earlier hour): the #1
    * row is the estimated changepoint, the rest show the plateau
    * around it. Both windows are unpartitioned but run over the
    * calendar-bounded hour spine (WindowAuditSpec carries the
    * exemption); headroom: T ≤ 10^5 hours × G ≤ 10^12 events stays
    * under BIGINT. Final top-k is a LIMIT over the spine — a
    * TakeOrdered, never a full sort shuffle.
    */
  def cusumHours(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"h")
    val base = gapfillHourly(spark, dir)
    val series = base
      .withColumn("p", sum($"n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", row_number().over(w).cast("long"))
    // totals come from the PRE-window frame: T = spine length and
    // G = grand total need neither prefix sums nor the ordered scan,
    // so deriving them from `series` would execute the window subtree
    // twice for two scalars
    val totals = base.agg(count(lit(1)).as("t_n"), sum($"n").as("g"))
    series.crossJoin(broadcast(totals))
      .withColumn("d", $"t_n" * $"p" - $"t" * $"g")
      .select($"h", $"n", $"d")
      .orderBy(abs($"d").desc, $"h")
      .limit(k)
  }

  def cusumHoursSql(k: Int = 10): String =
    s"""WITH c AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
          FROM events GROUP BY 1),
        b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
        hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
        f AS (
          SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
          FROM hrs LEFT JOIN c USING (h)),
        s AS (
          SELECT h, n,
                 CAST(sum(n) OVER (ORDER BY h) AS BIGINT) AS p,
                 CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS t,
                 CAST(count(*) OVER () AS BIGINT) AS t_n,
                 CAST(sum(n) OVER () AS BIGINT) AS g
          FROM f)
        SELECT h, n, t_n * p - t * g AS d
        FROM s ORDER BY abs(t_n * p - t * g) DESC, h LIMIT $k"""

  /** Sample autocorrelation function at hourly lags 1..`maxLag` over
    * the gap-filled series — the periodicity detector (a daily cycle
    * shows as a ridge at lag 24) and the residual-whiteness check
    * after seasonal adjustment. Exactness device: every MOMENT is an
    * exact BIGINT off the spine — A_k = Σ y_t·y_{t+k}, head/tail
    * sums B₁/B₂, and the globals T, G = Σy, Q = Σy² — and the
    * textbook centered form is recovered by multiplying the mean
    * through: num_k = T²·A_k − T·G·(B₁+B₂) + (T−k)·G², den = T²·Q −
    * T·G², acf_k = num_k/den evaluated as ONE pinned fp expression
    * of the exact integers (identical IEEE doubles on both engines).
    * Headroom: A_k ≤ T·ŷ² holds BIGINT through a decade-long spine
    * at ~10⁶ events/hour. Plan shape: the 24 lags come from ONE
    * ordered window pass (an array of lags posexploded to (k, pair)
    * rows), so the spine is scanned once, not once per lag; the
    * window is spine-sized (calendar-bounded — same exemption as
    * events_cusum_hours), and the per-lag aggregate shuffles
    * 24·T domain rows, never corpus rows.
    */
  def autocorrelationHours(spark: SparkSession, dir: String,
      maxLag: Int = 24): DataFrame =
    acfOfSeries(gapfillHourly(spark, dir), maxLag)

  /** ACF core over any dense (h, n) series frame — see
    * [[autocorrelationHours]] for the arithmetic contract.
    */
  def acfOfSeries(base: DataFrame, maxLag: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val w = Window.orderBy($"h")
    val lags = (1 to maxLag).map(k => lag($"n", k).over(w))
    val pairs = base
      .withColumn("prev", array(lags: _*))
      .select($"n".as("yt"), posexplode($"prev").as(Seq("pos", "yh")))
      .filter($"yh".isNotNull)
      .select(($"pos" + 1).cast("long").as("lag"), $"yh", $"yt")
    val moments = pairs.groupBy($"lag").agg(
      count(lit(1)).as("pairs"),
      sum($"yh" * $"yt").as("ak"),
      sum($"yh").as("b1"), sum($"yt").as("b2"))
    val tot = base.agg(count(lit(1)).as("tt"), sum($"n").as("g"),
      sum($"n" * $"n").as("q"))
    moments.crossJoin(broadcast(tot))
      .withColumn("acf", round(
        (($"tt".cast("double") * $"tt".cast("double")
          * $"ak".cast("double"))
          - $"tt".cast("double") * $"g".cast("double")
            * ($"b1".cast("double") + $"b2".cast("double"))
          + $"pairs".cast("double") * $"g".cast("double")
            * $"g".cast("double")) /
        (($"tt".cast("double") * $"tt".cast("double")
          * $"q".cast("double"))
          - $"tt".cast("double") * $"g".cast("double")
            * $"g".cast("double")), 6))
      .select($"lag", $"pairs", $"acf")
      .orderBy($"lag")
  }

  def autocorrelationHoursSql(maxLag: Int = 24): String =
    s"""WITH c AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
          FROM events GROUP BY 1),
        b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
        hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
        f AS (SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
              FROM hrs LEFT JOIN c USING (h)),
        s AS (SELECT h, n, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS t
              FROM f),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS tt,
                       CAST(sum(n) AS BIGINT) AS g,
                       CAST(sum(n * n) AS BIGINT) AS q FROM f),
        p AS (SELECT s2.t - s1.t AS lag, s1.n AS yh, s2.n AS yt
              FROM s s1 JOIN s s2
                ON s2.t > s1.t AND s2.t - s1.t <= $maxLag),
        a AS (SELECT lag, CAST(count(*) AS BIGINT) AS pairs,
                     CAST(sum(yh * yt) AS BIGINT) AS ak,
                     CAST(sum(yh) AS BIGINT) AS b1,
                     CAST(sum(yt) AS BIGINT) AS b2
              FROM p GROUP BY lag)
        SELECT lag, pairs,
               round(((CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)
                       * CAST(ak AS DOUBLE))
                      - CAST(tt AS DOUBLE) * CAST(g AS DOUBLE)
                        * (CAST(b1 AS DOUBLE) + CAST(b2 AS DOUBLE))
                      + CAST(pairs AS DOUBLE) * CAST(g AS DOUBLE)
                        * CAST(g AS DOUBLE))
                     / ((CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)
                         * CAST(q AS DOUBLE))
                        - CAST(tt AS DOUBLE) * CAST(g AS DOUBLE)
                          * CAST(g AS DOUBLE)), 6) AS acf
        FROM a CROSS JOIN tot ORDER BY lag"""

  /** Robust volume anomalies over the hourly spine: hours whose
    * |count − median| exceeds k·MAD — the heavy-tail-safe companion
    * to the trailing z-test [[anomalyHours]] (one extreme hour
    * inflates a stddev and masks its neighbors; the median/MAD pair
    * doesn't move). Both statistics come from the COUNT HISTOGRAM
    * via the discrete rank device (median = smallest value whose
    * cume reaches ⌈n/2⌉, MAD likewise over |y−med|), all integers;
    * the flag compares |y−med| > k·MAD by integer multiplication —
    * no fp anywhere in the operator. Output is the flagged hours
    * with the receipts (med, mad) inline.
    */
  def anomalyRobustHours(spark: SparkSession, dir: String,
      k: Long = 5): DataFrame = {
    import spark.implicits._
    val base = gapfillHourly(spark, dir).localCheckpoint(true)
    def discMedian(df: DataFrame, colName: String): Long = {
      val hist = df.groupBy(col(colName)).agg(count(lit(1)).as("c"))
      val tot = hist.agg(sum($"c").as("__t"))
      val w = Window.orderBy(col(colName))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.withColumn("cum", sum($"c").over(w))
        .crossJoin(broadcast(tot))
        .filter($"cum" * 2L >= $"__t")
        .orderBy(col(colName)).limit(1)
        .head.getLong(0)
    }
    val med = discMedian(base, "n")
    val mad = discMedian(
      base.select(abs($"n" - med).as("d")), "d")
    base
      .filter(abs($"n" - med) > k * mad)
      .select($"h", $"n", lit(med).as("med"), lit(mad).as("mad"))
      .orderBy($"h")
  }

  def anomalyRobustHoursSql(k: Long = 5): String =
    s"""WITH c AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
          FROM events GROUP BY 1),
        b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
        hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
        f AS (SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
              FROM hrs LEFT JOIN c USING (h)),
        hn AS (SELECT n AS v, CAST(count(*) AS BIGINT) AS c
               FROM f GROUP BY 1),
        tn AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM hn),
        med AS (SELECT v AS med FROM (
                  SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum
                  FROM hn) CROSS JOIN tn
                WHERE cum * 2 >= t ORDER BY v LIMIT 1),
        hd AS (SELECT abs(n - med) AS v, CAST(count(*) AS BIGINT) AS c
               FROM f CROSS JOIN med GROUP BY 1),
        mad AS (SELECT v AS mad FROM (
                  SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum
                  FROM hd) CROSS JOIN tn
                WHERE cum * 2 >= t ORDER BY v LIMIT 1)
        SELECT h, n, med, mad
        FROM f CROSS JOIN med CROSS JOIN mad
        WHERE abs(n - med) > $k * mad
        ORDER BY h"""

  /** Wald–Wolfowitz runs test for serial randomness of the hourly
    * series around its mean — the cheap "is this iid or does it
    * trend/cycle" screen that belongs next to [[autocorrelationHours]]
    * (ACF says WHERE the structure is; the runs test says WHETHER,
    * in one number). Signs are exact: sign(T·y_t − G) compares the
    * cross-multiplied deviation (the [[cusumHours]] device), zero
    * hours are excluded per the textbook treatment, the run count R
    * and the n₊/n₋ census are integers off one ordered pass, and
    * the z-score — (R − μ)/σ with μ = 2n₊n₋/n + 1, σ² =
    * 2n₊n₋(2n₊n₋ − n)/(n²(n−1)) — is ONE pinned fp expression of
    * those integers. Spine-sized window, same exemption family.
    */
  def runsTestHours(spark: SparkSession, dir: String): DataFrame =
    runsTestOfSeries(gapfillHourly(spark, dir))

  /** Runs-test core over any dense (h, n) series — see
    * [[runsTestHours]] for the contract.
    */
  def runsTestOfSeries(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val tot = base.agg(count(lit(1)).as("tt"), sum($"n").as("g"))
    val signed = base.crossJoin(broadcast(tot))
      .withColumn("d", $"tt" * $"n" - $"g")
      .filter($"d" =!= 0L)
      .withColumn("s", when($"d" > 0L, 1L).otherwise(-1L))
    val w = Window.orderBy($"h")
    val runs = signed
      .withColumn("prev", lag($"s", 1).over(w))
      .agg(
        sum(when($"s" === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when($"s" === -1L, 1L).otherwise(0L)).as("n_neg"),
        (sum(when($"prev".isNull || $"prev" =!= $"s", 1L).otherwise(0L)))
          .as("r"))
    runs
      .withColumn("nn", $"n_pos" + $"n_neg")
      .withColumn("z", round(
        ($"r".cast("double") -
          (lit(2.0) * $"n_pos".cast("double") * $"n_neg".cast("double") /
            $"nn".cast("double") + lit(1.0))) /
        sqrt((lit(2.0) * $"n_pos".cast("double") * $"n_neg".cast("double") *
          (lit(2.0) * $"n_pos".cast("double") * $"n_neg".cast("double") -
            $"nn".cast("double"))) /
          ($"nn".cast("double") * $"nn".cast("double") *
            ($"nn".cast("double") - lit(1.0)))), 4))
      .select($"n_pos", $"n_neg", $"r", $"z")
  }

  val runsTestHoursSql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       f AS (SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
             FROM hrs LEFT JOIN c USING (h)),
       t AS (SELECT CAST(count(*) AS BIGINT) AS tt,
                    CAST(sum(n) AS BIGINT) AS g FROM f),
       sg AS (SELECT h, CASE WHEN tt * n - g > 0 THEN 1 ELSE -1 END AS s
              FROM f CROSS JOIN t WHERE tt * n - g <> 0),
       rr AS (SELECT s, lag(s) OVER (ORDER BY h) AS prev FROM sg),
       agg AS (
         SELECT CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_pos,
                CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_neg,
                CAST(sum(CASE WHEN prev IS NULL OR prev <> s
                  THEN 1 ELSE 0 END) AS BIGINT) AS r
         FROM rr)
       SELECT n_pos, n_neg, r,
              round((CAST(r AS DOUBLE) -
                     (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
                      / CAST(n_pos + n_neg AS DOUBLE) + 1.0))
                    / sqrt((2.0 * CAST(n_pos AS DOUBLE)
                            * CAST(n_neg AS DOUBLE)
                            * (2.0 * CAST(n_pos AS DOUBLE)
                               * CAST(n_neg AS DOUBLE)
                               - CAST(n_pos + n_neg AS DOUBLE)))
                           / (CAST(n_pos + n_neg AS DOUBLE)
                              * CAST(n_pos + n_neg AS DOUBLE)
                              * (CAST(n_pos + n_neg AS DOUBLE) - 1.0))),
                    4) AS z
       FROM agg"""

  /** Baseline-forecast backtest over the hourly series: the three
    * standard reference models every forecasting effort must beat —
    * naive (ŷ_t = y_{t−1}), seasonal-daily (y_{t−24}), seasonal-
    * weekly (y_{t−168}) — evaluated in-sample with exact integer
    * error moments (Σ|y−ŷ|, signed bias Σ(y−ŷ)) and MAE as one
    * pinned division. MAPE is deliberately absent: zero hours make
    * it undefined, which is the textbook reason MAE backtests
    * gap-filled count series. The three predictions come from ONE
    * ordered window pass (three lag columns stacked), the window
    * input is the calendar-bounded spine, and each model only
    * scores hours where its lag exists — n_eval differs per model
    * by construction, so the gate pins warm-up handling too.
    */
  def forecastEval(spark: SparkSession, dir: String): DataFrame =
    forecastEvalOfSeries(gapfillHourly(spark, dir))

  /** Backtest core over any dense (h, n) series — see
    * [[forecastEval]] for the contract.
    */
  def forecastEvalOfSeries(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val w = Window.orderBy($"h")
    base
      .withColumn("l1", lag($"n", 1).over(w))
      .withColumn("l24", lag($"n", 24).over(w))
      .withColumn("l168", lag($"n", 168).over(w))
      .selectExpr("n",
        "stack(3, 'naive_1', l1, 'seasonal_24', l24, " +
          "'seasonal_168', l168) AS (model, pred)")
      .filter($"pred".isNotNull)
      .groupBy($"model")
      .agg(count(lit(1)).as("n_eval"),
        sum(abs($"n" - $"pred")).as("abs_err"),
        sum($"n" - $"pred").as("bias"))
      .withColumn("mae", round(
        $"abs_err".cast("double") / $"n_eval".cast("double"), 4))
      .orderBy($"model")
  }

  val forecastEvalSql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       f AS (SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
             FROM hrs LEFT JOIN c USING (h)),
       s AS (SELECT n,
                    lag(n, 1) OVER (ORDER BY h) AS l1,
                    lag(n, 24) OVER (ORDER BY h) AS l24,
                    lag(n, 168) OVER (ORDER BY h) AS l168
             FROM f),
       u AS (SELECT 'naive_1' AS model, n, l1 AS pred FROM s
             UNION ALL SELECT 'seasonal_24', n, l24 FROM s
             UNION ALL SELECT 'seasonal_168', n, l168 FROM s)
       SELECT model, CAST(count(*) AS BIGINT) AS n_eval,
              CAST(sum(abs(n - pred)) AS BIGINT) AS abs_err,
              CAST(sum(n - pred) AS BIGINT) AS bias,
              round(CAST(sum(abs(n - pred)) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE), 4) AS mae
       FROM u WHERE pred IS NOT NULL
       GROUP BY model ORDER BY model"""

  /** Linearly-weighted moving average (WMA) over the trailing 24
    * hours of the gap-filled series — trend smoothing where the
    * newest hour weighs 24 and the oldest 1. The position-weighted
    * window sum needs NO per-offset lag chain: on the dense hour
    * spine the weight of hour i inside hour t's frame is
    * i − (t − 24), so Σ w_i·x_i = Σ i·x_i − (t−24)·Σ x_i — two plain
    * prefix-style window sums over one ROWS frame, decomposing the
    * position weighting into frame aggregates (the same algebra that
    * turns any polynomial-in-position weighting into a fixed number
    * of windowed moments). Reported exact: `wma_num` is the integer
    * numerator (denominator Σw = 300 is constant); `wma` divides
    * once. Warm-up hours (fewer than 24 predecessors) are excluded.
    * Headroom: h ≈ 5·10^5 × per-hour counts ≤ 10^9 × 24 terms stays
    * under BIGINT.
    */
  /** Banded two-phase device for the SPINE family — lifts a trailing
    * `ROWS BETWEEN (trailing−1) PRECEDING AND CURRENT ROW` window
    * over a DENSE spine off the single unpartitioned window task
    * (the hour-grain family's documented exemption) so the same
    * operators hold at minute/second grain, where the spine is
    * calendar-bounded but no longer small (a decade of seconds is
    * 3·10⁸ rows — past any one task).
    *
    * Device: rows band by `hourCol div bandWidth`; each row within
    * `trailing−1` of a band's END is additionally emitted as a GHOST
    * row of the NEXT band (map-side fan, ≤ 2× and in practice
    * ~(1 + trailing/bandWidth)× blow-up), so every row's full
    * trailing frame is present inside its own band and the window
    * runs `partitionBy(__band)` — parallel, spill-free, no
    * SinglePartition exchange. Ghost rows are dropped after the
    * windowed columns are computed. EXACT for any trailing-frame
    * computation on a dense spine, because density makes "previous
    * trailing−1 rows" ≡ "previous trailing−1 spine ticks", all of
    * which the ghost prefix carries. (An unbounded-preceding frame
    * does NOT fit this device — that's the bandedNtile offset
    * layout's job, Analytics.scala.)
    */
  def bandedSpine(spine: DataFrame, hourCol: String, lookback: Int,
      bandWidth: Long = 8192L)(
      f: (DataFrame, org.apache.spark.sql.expressions.WindowSpec) => DataFrame): DataFrame = {
    require(lookback >= 1 && bandWidth > lookback,
      s"bandWidth=$bandWidth must exceed lookback=$lookback")
    import spine.sparkSession.implicits._
    val h = col(hourCol)
    // floor division in exact integer arithmetic (`div` truncates
    // toward zero, so negative off-boundary hours need the −1 nudge)
    val ghosted = spine
      .withColumn("__own", expr(s"$hourCol div $bandWidth")
        - when(h < 0 && h % bandWidth =!= 0, 1L).otherwise(0L))
      .withColumn("__band", explode(when(
          h - ($"__own" + 1L) * bandWidth >= -lookback.toLong,
          array($"__own", $"__own" + 1L))
        .otherwise(array($"__own"))))
    // frameless on purpose: the caller picks its ROWS frame, which
    // must lie inside [-lookback, 0] — ghosts carry exactly lookback
    // predecessors across each band boundary and nothing after
    val w = Window.partitionBy(col("__band")).orderBy(h)
    f(ghosted, w)
      .filter($"__band" === $"__own")
      .drop("__band", "__own")
  }

  /** CLASSICAL seasonal decomposition of the hourly series
    * (Macaulay 1931, the moving-average decomposition STL
    * generalizes): trend = centered 2×24 moving average, seasonal =
    * per-hour-of-day mean of the detrended series. Both components
    * are held EXACT in integer ×48 units: the even-window 2×24 MA is
    * trend_x48(t) = c[t−12] + c[t+12] + 2·Σ_{−11..+11} c[t+i] (the
    * half-weight endpoints ARE the ×48 trick), rewritten into
    * trailing form at e = t+12 as 2·S25(e) − c(e) − c(e−24), so it
    * runs under [[bandedSpine]] with lookback 24 — no centered
    * frame, no unpartitioned window, minute-grain-safe. The
    * detrended census 48·c(t) − trend_x48(t) sums as BIGINTs per
    * hour-of-day; only the display mean divides (once, rounded).
    * Edge hours without a full ±12 window are trimmed, the classical
    * convention.
    */
  def decomposeClassical(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spine = gapfillHourly(spark, dir)
    val trail = bandedSpine(spine, "h", lookback = 24) { (df, w0) =>
      val w = w0.rowsBetween(-24, 0)
      df.withColumn("nw", count(lit(1)).over(w))
        .withColumn("s25", sum($"n").over(w))
        .withColumn("c24", lag($"n", 24).over(w0))
    }
    val trend = trail.filter($"nw" === 25)
      .select(($"h" - 12).as("t"),
        (lit(2L) * $"s25" - $"n" - $"c24").as("trend_x48"))
    val det = trend.join(spine.select($"h".as("t"), $"n"), Seq("t"))
      .select($"t", (lit(48L) * $"n" - $"trend_x48").as("det_x48"))
    det.groupBy(($"t" % 24).as("hod"))
      .agg(count(lit(1)).as("n_obs"), sum($"det_x48").as("det_sum_x48"))
      .select($"hod", $"n_obs", $"det_sum_x48",
        round($"det_sum_x48".cast("double")
          / (lit(48.0) * $"n_obs".cast("double")), 4).as("seasonal"))
      .orderBy($"hod")
  }

  val decomposeClassicalSql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       sp AS (SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
              FROM hrs LEFT JOIN c USING (h)),
       w AS (
         SELECT h, n,
                CAST(count(*) OVER tw AS BIGINT) AS nw,
                CAST(sum(n) OVER tw AS BIGINT) AS s25,
                lag(n, 24) OVER (ORDER BY h) AS c24
         FROM sp
         WINDOW tw AS (ORDER BY h
                       ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)),
       tr AS (
         SELECT h - 12 AS t, 2 * s25 - n - c24 AS trend_x48
         FROM w WHERE nw = 25),
       det AS (
         SELECT tr.t, 48 * sp.n - tr.trend_x48 AS det_x48
         FROM tr JOIN sp ON sp.h = tr.t)
       SELECT t % 24 AS hod, CAST(count(*) AS BIGINT) AS n_obs,
              CAST(sum(det_x48) AS BIGINT) AS det_sum_x48,
              round(CAST(sum(det_x48) AS DOUBLE)
                / (48.0 * CAST(count(*) AS DOUBLE)), 4) AS seasonal
       FROM det GROUP BY 1 ORDER BY 1"""

  def wmaHours(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bandedSpine(gapfillHourly(spark, dir), "h", lookback = 23) { (df, w0) =>
      val w = w0.rowsBetween(-23, 0)
      df.withColumn("nw", count(lit(1)).over(w))
        .withColumn("sx", sum($"n").over(w))
        .withColumn("shx", sum($"h" * $"n").over(w))
    }
      .filter($"nw" === 24)
      .withColumn("wma_num", $"shx" - ($"h" - 24) * $"sx")
      .select($"h", $"n", $"wma_num",
        round($"wma_num" / 300.0, 4).as("wma"))
  }

  /** Trailing-24-hour sliding distinct users per hour (sliding DAU —
    * the "active users right now" series, which no tumbling rollup
    * composes into because distinct does not sum). Exact plan: reduce
    * the corpus to the DISTINCT (hour, user) pair frame first (one
    * partial-agg'd shuffle — the only corpus-sized exchange), then
    * fan each pair map-side into the 24 window-end hours it supports
    * (sequence+explode, a generator: the 24× blow-up applies to the
    * pair frame, never the raw events) and count distinct per
    * window-end hour — countDistinct's two-phase expand dedups users
    * active in several hours of one window. Window ends clamp to the
    * observed spine; only fully-covered windows (end ≥ lo+23) report,
    * matching [[anomalyHours]]' warm-up convention.
    */
  def slidingDau(spark: SparkSession, dir: String,
      materialize: Boolean = true): DataFrame = {
    import spark.implicits._
    val raw = Tables.events(spark, dir)
      .select(expr("unix_timestamp(ts) div 3600").as("h"), $"user_id")
      .distinct()
    // materialize=false returns the composed plan (pairs recompute
    // once per consumer) so PlanAuditSpec can inspect the generator
    // structure the checkpoint would otherwise hide
    val pairs = if (materialize)
      raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else raw
    val bounds = pairs.agg(min($"h").as("lo"), max($"h").as("hi"))
    val composed = pairs
      .select(explode(sequence($"h", $"h" + 23)).as("wh"), $"user_id")
      .groupBy($"wh").agg(countDistinct($"user_id").as("users_24h"))
      .crossJoin(broadcast(bounds))
      .filter($"wh" >= $"lo" + 23 && $"wh" <= $"hi")
      .select($"wh", $"users_24h")
      .orderBy($"wh")
    if (!materialize) composed
    else {
      val out = composed.localCheckpoint(true)
      pairs.unpersist(blocking = false)
      out
    }
  }

  val slidingDauSql: String =
    """WITH pairs AS (
         SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
                user_id
         FROM events),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM pairs),
       fan AS (
         SELECT unnest(generate_series(h, h + 23)) AS wh, user_id
         FROM pairs),
       wins AS (
         SELECT wh, CAST(count(DISTINCT user_id) AS BIGINT) AS users_24h
         FROM fan GROUP BY 1)
       SELECT wh, users_24h
       FROM wins, b
       WHERE wh >= lo + 23 AND wh <= hi
       ORDER BY wh"""

  /** Hour-of-week seasonal residuals over the gap-filled hourly
    * series: each hour's count minus its (day-of-week × hour-of-day)
    * cell mean — the deseasonalization step that must precede any
    * volume-anomaly call on traffic with a weekly rhythm (a quiet
    * Sunday 3am is not an incident; [[anomalyHours]]' trailing window
    * would flag it). The residual is held EXACT by cross-multiplying
    * through the cell's observation count: dev_num = n·obs − tot, an
    * integer bit-identical across engines; the fp division happens
    * once at the final projection. Cell means come from the same
    * filled spine (zero hours belong to their cell), the dow/hod
    * decomposition is pure epoch-hour integer arithmetic (epoch day 0
    * = Thursday ⇒ dow = (h div 24 + 4) mod 7, DuckDB's 0=Sunday
    * numbering), and the 168-cell frame broadcasts back onto the
    * spine — corpus rows feed exactly one aggregation.
    */
  def seasonalResidual(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val filled = gapfillHourly(spark, dir)
      .withColumn("dow", (expr("h div 24") + 4) % 7)
      .withColumn("hod", $"h" % 24)
    val cells = filled.groupBy($"dow", $"hod")
      .agg(sum($"n").as("tot"), count(lit(1)).as("obs"))
    filled.join(broadcast(cells), Seq("dow", "hod"))
      .withColumn("dev_num", $"n" * $"obs" - $"tot")
      .select($"h", $"n", $"dow", $"hod", $"dev_num",
        round($"dev_num".cast("double") / $"obs".cast("double"), 4).as("dev"))
      .orderBy($"h")
  }

  val seasonalResidualSql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       f AS (
         SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
                (hrs.h // 24 + 4) % 7 AS dow, hrs.h % 24 AS hod
         FROM hrs LEFT JOIN c USING (h)),
       cells AS (
         SELECT dow, hod, CAST(sum(n) AS BIGINT) AS tot,
                CAST(count(*) AS BIGINT) AS obs
         FROM f GROUP BY 1, 2)
       SELECT h, n, f.dow AS dow, f.hod AS hod,
              n * obs - tot AS dev_num,
              round(CAST(n * obs - tot AS DOUBLE) / CAST(obs AS DOUBLE), 4)
                AS dev
       FROM f JOIN cells ON f.dow = cells.dow AND f.hod = cells.hod
       ORDER BY h"""

  val wmaHoursSql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       f AS (
         SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
         FROM hrs LEFT JOIN c USING (h)),
       w AS (
         SELECT h, n,
                count(*) OVER fr AS nw,
                CAST(sum(n) OVER fr AS BIGINT) AS sx,
                CAST(sum(h * n) OVER fr AS BIGINT) AS shx
         FROM f
         WINDOW fr AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
       SELECT h, n, shx - (h - 24) * sx AS wma_num,
              round(CAST(shx - (h - 24) * sx AS DOUBLE) / 300.0, 4) AS wma
       FROM w WHERE nw = 24"""

  /** Gaps-and-islands: each user's LONGEST consecutive-active-day
    * streak (the engagement metric tumbling windows can't express —
    * a streak has no fixed boundary). The classic device, kept
    * scale-right: the corpus collapses to the distinct (user, day)
    * frame first, `day − row_number()` within each user is constant
    * exactly along a consecutive run (so one groupBy materializes
    * the runs), and the per-user argmax takes longest-then-earliest
    * via one lexicographic struct max. Windows partition by user over
    * that user's ACTIVE-DAY frame — thousands of parallel small
    * frames, never a global sort.
    */
  def activeStreaks(spark: SparkSession, dir: String,
      topK: Int = 20): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, dir)
      .select($"user_id",
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    val runs = days
      .withColumn("grp", $"day" - row_number().over(w))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"), min($"day").as("start_day"))
    runs
      .groupBy($"user_id")
      .agg(max(struct($"len".as("l"), (-$"start_day").as("ns"))).as("b"))
      .select($"user_id", $"b.l".as("streak_days"),
        (-$"b.ns").as("start_day"))
      .orderBy($"streak_days".desc, $"user_id")
      .limit(topK)
  }

  val activeStreaksSql: String =
    """WITH days AS (
         SELECT DISTINCT user_id,
                epoch_us(date_trunc('microseconds', ts)) // 86400000000 AS day
         FROM events),
       g AS (
         SELECT user_id, day,
                day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                  AS grp
         FROM days),
       runs AS (
         SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
                CAST(min(day) AS BIGINT) AS start_day
         FROM g GROUP BY 1, 2),
       best AS (
         SELECT user_id, len, start_day,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY len DESC, start_day) AS rk
         FROM runs)
       SELECT user_id, len AS streak_days, start_day
       FROM best WHERE rk = 1
       ORDER BY streak_days DESC, user_id LIMIT 20"""

  /** Interval union (merge-overlapping): each event opens a
    * 30-minute presence interval; overlapping/touching intervals per
    * user merge, and the answer is per-user (merged interval count,
    * covered seconds) — the "how long was the user actually here"
    * question raw durations double-count. Same islands device as
    * [[activeStreaks]] at µs precision: a new island starts where an
    * interval's start clears the running max of all previous ends
    * (that max rides a rows-frame window over the user's distinct
    * event times), island id is the running sum of start flags, and
    * the merged spans are one groupBy. Everything integer µs;
    * covered_s = Σ(end−start) div 10⁶.
    */
  def intervalMerge(spark: SparkSession, dir: String,
      windowMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val spanUs = windowMinutes * 60L * 1000000L
    val pts = Tables.events(spark, dir)
      .select($"user_id", expr("unix_micros(ts)").as("s"))
      .distinct()
    val order = Window.partitionBy($"user_id").orderBy($"s")
    val prevEnds = order.rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = pts
      .withColumn("e", $"s" + spanUs)
      .withColumn("nw",
        when($"s" > coalesce(max($"e").over(prevEnds), lit(Long.MinValue)),
          1L).otherwise(0L))
      .withColumn("island", sum($"nw").over(upToHere))
      .groupBy($"user_id", $"island")
      .agg(min($"s").as("st"), max($"e").as("en"))
    islands.groupBy($"user_id")
      .agg(count(lit(1)).as("n_intervals"),
        expr("CAST(sum(en - st) div 1000000 AS BIGINT)").as("covered_s"))
      .orderBy($"user_id")
  }

  def intervalMergeSql(windowMinutes: Int = 30): String = {
    val spanUs = windowMinutes * 60L * 1000000L
    s"""WITH pts AS (
          SELECT DISTINCT user_id,
                 epoch_us(date_trunc('microseconds', ts)) AS s
          FROM events),
        w AS (
          SELECT user_id, s, s + $spanUs AS e,
                 CASE WHEN s > coalesce(
                        max(s + $spanUs) OVER (PARTITION BY user_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -9223372036854775808)
                      THEN 1 ELSE 0 END AS nw
          FROM pts),
        isl AS (
          SELECT user_id, s, e,
                 sum(nw) OVER (PARTITION BY user_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM w),
        m AS (
          SELECT user_id, island, min(s) AS st, max(e) AS en
          FROM isl GROUP BY 1, 2)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(en - st) // 1000000 AS BIGINT) AS covered_s
        FROM m GROUP BY user_id ORDER BY user_id"""
  }

  /** Local-maximum peak hours on the gap-filled hourly series: hours
    * strictly above both neighbors AND above the series mean — the
    * parameter-free peak census a capacity planner reads next to the
    * anomaly/CUSUM family (those flag deviation from a LOCAL
    * baseline; this finds the global crests). Exactness: the
    * above-mean cut cross-multiplies (n·hours > total) so no fp mean
    * exists; neighbors come from one lag/lead pass over the
    * calendar-bounded spine (same WindowAuditSpec exemption family
    * as the other spine scans); the mean is a one-row broadcast.
    */
  def peakHours(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val filled = gapfillHourly(spark, dir)
    val tot = filled.agg(count(lit(1)).as("hrs"), sum($"n").as("total"))
    val w = Window.orderBy($"h")
    filled
      .withColumn("prev", lag($"n", 1).over(w))
      .withColumn("next", lead($"n", 1).over(w))
      .crossJoin(broadcast(tot))
      .filter($"prev".isNotNull && $"next".isNotNull &&
        $"n" > $"prev" && $"n" > $"next" &&
        $"n" * $"hrs" > $"total")
      .select($"h", $"n", $"prev", $"next")
      .orderBy($"h")
  }

  val peakHoursSql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       f AS (SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
             FROM hrs LEFT JOIN c USING (h)),
       t AS (SELECT CAST(count(*) AS BIGINT) AS nh,
                    CAST(sum(n) AS BIGINT) AS total FROM f),
       lg AS (SELECT h, n,
                     lag(n)  OVER (ORDER BY h) AS prev,
                     lead(n) OVER (ORDER BY h) AS next
              FROM f)
       SELECT h, n, prev, next
       FROM lg, t
       WHERE prev IS NOT NULL AND next IS NOT NULL
         AND n > prev AND n > next AND n * nh > total
       ORDER BY h"""

  /** Exponentially-weighted moving average over the gap-filled
    * hourly series, base-½ decay TRUNCATED at 16 lags — the standard
    * recency smoother next to [[wmaHours]]' linear one. The
    * truncation is the scale design, not a shortcut: the untruncated
    * recursion ewma_t = (y_t + ewma_{t−1})/2 is a sequential scan no
    * engine parallelizes, while the dropped tail weighs 2⁻¹⁶ < 10⁻⁴
    * of the window — under one count at 10⁴ events/hour. With base 2
    * every weight 2^(15−j) is an exact BIGINT, so `ewma_num` is exact
    * (denominator 2¹⁶−1 constant) and the single fp division is
    * pinned. Plan: the [[slidingDau]] fan-out device — each spine
    * hour map-side explodes into the 16 window-end hours it feeds
    * with its weight, one domain-sized groupBy re-assembles; the
    * 16× blow-up applies to the calendar-bounded spine, never the
    * corpus, and no ordered window at all is needed.
    */
  def ewmaHours(spark: SparkSession, dir: String,
      halfLives: Int = 16): DataFrame =
    ewmaOfSeries(gapfillHourly(spark, dir), halfLives)

  /** EWMA core over any dense (h, n) series — see [[ewmaHours]]. */
  def ewmaOfSeries(base: DataFrame, halfLives: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val bounds = base.agg(min($"h").as("lo"), max($"h").as("hi"))
    val den = (1L << halfLives) - 1L
    base
      .select($"h", $"n", explode(sequence($"h", $"h" + (halfLives - 1)))
        .as("wh"))
      .select($"wh",
        ($"n" * expr(s"CAST(pow(2, ${halfLives - 1} - (wh - h)) AS BIGINT)"))
          .as("wn"))
      .groupBy($"wh").agg(sum($"wn").as("ewma_num"),
        count(lit(1)).as("nw"))
      .crossJoin(broadcast(bounds))
      .filter($"nw" === halfLives && $"wh" <= $"hi")
      .select($"wh".as("h"), $"ewma_num",
        round($"ewma_num".cast("double") / lit(den.toDouble), 4).as("ewma"))
      .orderBy($"h")
  }

  def ewmaHoursSql(halfLives: Int = 16): String = {
    val den = (1L << halfLives) - 1L
    s"""WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       f AS (SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
             FROM hrs LEFT JOIN c USING (h)),
       fan AS (
         SELECT unnest(generate_series(h, h + ${halfLives - 1})) AS wh,
                h, n
         FROM f),
       w AS (
         SELECT wh,
                CAST(sum(n * CAST(pow(2, ${halfLives - 1} - (wh - h))
                             AS BIGINT)) AS BIGINT) AS ewma_num,
                CAST(count(*) AS BIGINT) AS nw
         FROM fan GROUP BY wh)
       SELECT wh AS h, ewma_num,
              round(CAST(ewma_num AS DOUBLE) / $den.0, 4) AS ewma
       FROM w, b
       WHERE nw = $halfLives AND wh <= hi
       ORDER BY h"""
  }

  /** Last-observation-carried-forward (LOCF) imputation of the
    * hourly purchase-value series: hours with no observation inherit
    * the most recent observed value, tagged with how stale it is —
    * the standard time-series imputation that must precede any
    * model consuming a dense feature grid. The portability device:
    * NO `IGNORE NULLS` anywhere (engines disagree on its window
    * spelling) — the carried value is found by the two-step argmax
    * device instead: `last_h = max(CASE WHEN observed THEN h END)
    * OVER (ORDER BY h)` is a plain running max (integer, exact),
    * and the value at that hour returns by equi-joining the spine
    * to itself on `last_h` — domain-sized join, bit-identical
    * across engines. `gap_age = h − last_h` falls out for free.
    * Money in exact cents; the window runs over the calendar-bounded
    * spine (the events_anomaly_hours exemption family).
    */
  def locfHours(spark: SparkSession, dir: String,
      eventType: String = "purchase"): DataFrame = {
    import spark.implicits._
    val obs = Tables.events(spark, dir)
      .filter($"event_type" === eventType)
      .select(expr("unix_timestamp(ts) div 3600").as("h"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .groupBy($"h").agg(count(lit(1)).as("n"), sum($"vc").as("sum_c"))
    val spine = obs.agg(min($"h").as("lo"), max($"h").as("hi"))
      .select(explode(sequence($"lo", $"hi")).as("h"))
      .repartition(col("h"))
    val filled = spine.join(obs, Seq("h"), "left")
      .withColumn("last_h",
        max(when($"n".isNotNull, $"h")).over(
          Window.orderBy($"h")
            .rowsBetween(Window.unboundedPreceding, 0)))
    filled
      .join(obs.select($"h".as("oh"), $"sum_c".as("carried_c")),
        $"last_h" === $"oh")
      .select($"h", coalesce($"n", lit(0L)).as("n"),
        $"carried_c", ($"h" - $"last_h").as("gap_age"))
      .orderBy($"h")
  }

  def locfHoursSql(eventType: String = "purchase"): String =
    s"""WITH obs AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_c
         FROM events WHERE event_type = '$eventType' GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM obs),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       f AS (
         SELECT hrs.h AS h, obs.n AS n,
                CAST(max(CASE WHEN obs.n IS NOT NULL THEN hrs.h END)
                  OVER (ORDER BY hrs.h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS last_h
         FROM hrs LEFT JOIN obs USING (h))
       SELECT f.h AS h, CAST(coalesce(f.n, 0) AS BIGINT) AS n,
              o2.sum_c AS carried_c, f.h - f.last_h AS gap_age
       FROM f JOIN obs o2 ON f.last_h = o2.h
       ORDER BY h"""

  /** Cross-correlogram between two event types' hourly series at
    * lags −`maxLag`..+`maxLag` — the lead/lag detector ACF cannot
    * see (does a surge of `typeX` precede a surge of `typeY`, and by
    * how many hours? peak at positive k = x leads y by k). Both
    * series share ONE gap-filled spine so zero hours count; per lag
    * the five moments over the overlap (Σx, Σy, Σx², Σy², Σxy) are
    * exact BIGINTs and Pearson r_k is ONE pinned fp expression of
    * them. Plan shape is [[acfOfSeries]]' device generalized to two
    * columns and negative lags: one ordered window pass builds the
    * 2·maxLag+1 shifted-y array, posexplode fans the spine (never
    * the corpus) into (lag, x, y) rows, and the per-lag aggregate
    * shuffles (2L+1)·T domain rows.
    */
  def crossCorrHours(spark: SparkSession, dir: String,
      typeX: String = "error", typeY: String = "purchase",
      maxLag: Int = 24): DataFrame = {
    import spark.implicits._
    val counts = Tables.events(spark, dir)
      .filter($"event_type".isin(typeX, typeY))
      .select(expr("unix_timestamp(ts) div 3600").as("h"), $"event_type")
      .groupBy($"h")
      .agg(sum(when($"event_type" === typeX, 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === typeY, 1L).otherwise(0L)).as("y"))
    val spine = counts.agg(min($"h").as("lo"), max($"h").as("hi"))
      .select(explode(sequence($"lo", $"hi")).as("h"))
      .repartition(col("h"))
    val base = spine.join(counts, Seq("h"), "left")
      .select($"h", coalesce($"x", lit(0L)).as("x"),
        coalesce($"y", lit(0L)).as("y"))
    crossCorrOfSeries(base, maxLag)
  }

  /** CCF core over any dense (h, x, y) frame — see
    * [[crossCorrHours]] for the arithmetic contract.
    */
  def crossCorrOfSeries(base: DataFrame, maxLag: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val w = Window.orderBy($"h")
    // y_{t+k} for k = -maxLag..maxLag: lag(y, -k) is lead
    val shifted = (-maxLag to maxLag).map(k => lag($"y", -k).over(w))
    base
      .withColumn("ys", array(shifted: _*))
      .select($"x", posexplode($"ys").as(Seq("pos", "yk")))
      .filter($"yk".isNotNull)
      .select(($"pos" - maxLag).cast("long").as("lag"), $"x", $"yk")
      .groupBy($"lag")
      .agg(count(lit(1)).as("pairs"),
        sum($"x").as("sx"), sum($"yk").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"yk" * $"yk").as("syy"),
        sum($"x" * $"yk").as("sxy"))
      .withColumn("r", round(
        ($"pairs".cast("double") * $"sxy".cast("double")
          - $"sx".cast("double") * $"sy".cast("double")) /
        sqrt(($"pairs".cast("double") * $"sxx".cast("double")
            - $"sx".cast("double") * $"sx".cast("double"))
          * ($"pairs".cast("double") * $"syy".cast("double")
            - $"sy".cast("double") * $"sy".cast("double"))), 6))
      .select($"lag", $"pairs", $"sxy", $"r")
      .orderBy($"lag")
  }

  def crossCorrHoursSql(typeX: String = "error",
      typeY: String = "purchase", maxLag: Int = 24): String =
    s"""WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
                CAST(sum(CASE WHEN event_type = '$typeX' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
                CAST(sum(CASE WHEN event_type = '$typeY' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
         FROM events WHERE event_type IN ('$typeX', '$typeY')
         GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       f AS (SELECT hrs.h AS h, CAST(COALESCE(c.x, 0) AS BIGINT) AS x,
                    CAST(COALESCE(c.y, 0) AS BIGINT) AS y
             FROM hrs LEFT JOIN c USING (h)),
       p AS (SELECT f2.h - f1.h AS lag, f1.x AS x, f2.y AS yk
             FROM f f1 JOIN f f2
               ON f2.h - f1.h BETWEEN -$maxLag AND $maxLag),
       a AS (SELECT lag, CAST(count(*) AS BIGINT) AS pairs,
                    CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(yk) AS BIGINT) AS sy,
                    CAST(sum(x * x) AS BIGINT) AS sxx,
                    CAST(sum(yk * yk) AS BIGINT) AS syy,
                    CAST(sum(x * yk) AS BIGINT) AS sxy
             FROM p GROUP BY lag)
       SELECT lag, pairs, sxy,
              round((CAST(pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / sqrt((CAST(pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                    6) AS r
       FROM a ORDER BY lag"""

  /** Mann–Kendall monotone-trend test per event type over the DAILY
    * count series (Mann 1945 / Kendall's S): S = Σ_{i<j}
    * sign(n_j − n_i) over day pairs, the tie-corrected variance
    * Var(S) = [m(m−1)(2m+5) − Σ_t t(t−1)(2t+5)] / 18 (t = size of
    * each group of equal counts), and the continuity-corrected
    * z = (S − sign S)/√Var — the distribution-free "is volume
    * drifting?" readout that needs no normality assumption, unlike
    * the OLS slope gate. Integer until the last expression: S, the
    * tie term, and the ×18 variance numerator are exact BIGINTs, so
    * the only fp op is one sqrt+divide per event type.
    *
    * Scale shape: the corpus collapses to one row per (type, day)
    * first (scan + partial agg — the only data-sized stage), and the
    * pair frame is O(|types| · days²) DOMAIN rows — calendar-bounded
    * (a decade ≈ 3.7k days → ~7M pairs per type), independent of row
    * count, exactly the budget posture of the other spine operators.
    */
  def mannKendallDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mannKendallOf(Tables.events(spark, dir)
      .select($"event_type", expr("unix_timestamp(ts) div 86400").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("n")))
  }

  /** MK core over any per-group (event_type, d, n) series — see
    * [[mannKendallDaily]] for the arithmetic contract.
    */
  def mannKendallOf(daily: DataFrame): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    val pairs = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.d") < col("b.d"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(signum(col("b.n") - col("a.n")).cast("long")).as("s_stat"))
    val ties = daily.groupBy($"event_type", $"n")
      .agg(count(lit(1)).as("t"))
      .groupBy($"event_type")
      .agg(sum($"t").as("n_days"),
        sum($"t" * ($"t" - 1L) * (lit(2L) * $"t" + 5L)).as("tie_term"))
    pairs.join(ties, Seq("event_type"))
      .withColumn("var18",
        $"n_days" * ($"n_days" - 1L) * (lit(2L) * $"n_days" + 5L) - $"tie_term")
      .withColumn("z", round(
        when($"var18" <= 0L, lit(0.0)).otherwise(
          ($"s_stat".cast("double") - signum($"s_stat".cast("double"))) /
            sqrt($"var18".cast("double") / 18.0)), 4))
      .select($"event_type", $"n_days", $"s_stat", $"var18", $"z")
      .orderBy($"event_type")
  }

  val mannKendallDailySql: String =
    """WITH daily AS (
         SELECT event_type,
                CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
                CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       s AS (
         SELECT a.event_type AS event_type,
                CAST(sum(sign(b.n - a.n)) AS BIGINT) AS s_stat
         FROM daily a JOIN daily b
           ON a.event_type = b.event_type AND a.d < b.d
         GROUP BY 1),
       grp AS (SELECT event_type, n, CAST(count(*) AS BIGINT) AS t
               FROM daily GROUP BY 1, 2),
       ties AS (
         SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
                CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
         FROM grp GROUP BY 1),
       j AS (
         SELECT s.event_type AS event_type, n_days, s_stat,
                CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                     AS BIGINT) AS var18
         FROM s JOIN ties USING (event_type))
       SELECT event_type, n_days, s_stat, var18,
              round(CASE WHEN var18 <= 0 THEN 0.0
                    ELSE (CAST(s_stat AS DOUBLE) - sign(s_stat))
                         / sqrt(CAST(var18 AS DOUBLE) / 18.0) END, 4) AS z
       FROM j ORDER BY event_type"""

  /** Theil–Sen robust slope per event type over the daily count
    * series (Theil 1950 / Sen 1968) — the drift MAGNITUDE companion
    * to [[mannKendallDaily]]'s direction test: the median of all
    * pairwise slopes (n_j − n_i)/(d_j − d_i), 29%-breakdown robust
    * where the OLS slope is dragged by a single outlier day.
    *
    * Exactness device: each slope is quantized to integer
    * MICRO-units-per-day by `(Δn · 10⁶) div Δd` — Spark's `div` and
    * DuckDB's `//` both truncate toward zero on signed operands
    * (verified), so the quantized multiset is bit-identical across
    * engines — and the median is then the [[percentileContByLang]]
    * order-statistic device: a (slope, count) histogram, cumulative
    * ranks over the DISTINCT-slope frame, the two bracketing order
    * stats fetched by a rank-interval join, and `sen_x2_micro =
    * lo + hi` kept as an exact BIGINT (halving would reintroduce a
    * rounding branch).
    *
    * Scale shape: the corpus collapses to one (type, day) row first
    * — the only data-sized stage — and the pair frame is
    * O(|types| · days²) DOMAIN rows, calendar-bounded exactly like
    * the MK pair frame; the median windows run on the distinct-slope
    * histogram, never the pair frame.
    */
  def theilSenDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    theilSenOf(Tables.events(spark, dir)
      .select($"event_type", expr("unix_timestamp(ts) div 86400").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("n")))
  }

  /** Theil–Sen core over any per-group (event_type, d, n) series —
    * see [[theilSenDaily]] for the arithmetic contract.
    */
  def theilSenOf(daily: DataFrame): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    val hist = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.d") < col("b.d"))
      .select(col("a.event_type").as("event_type"),
        expr("((b.n - a.n) * 1000000L) div (b.d - a.d)").as("v"))
      .groupBy($"event_type", $"v").agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy($"event_type").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum($"c").over(cumW))
    val targets = hist.groupBy($"event_type").agg(sum($"c").as("m"))
      .select($"event_type", $"m",
        expr("(m + 1) div 2").as("r_lo"),
        expr("m div 2 + 1").as("r_hi"))
    def rankValue(rankCol: String, as: String) =
      cum.select($"event_type".as("he"), $"v", $"c", $"cum")
        .join(targets, $"he" === $"event_type" &&
          col(rankCol) > $"cum" - $"c" && col(rankCol) <= $"cum")
        .select($"event_type", $"m", $"v".as(as))
    rankValue("r_lo", "v_lo")
      .join(rankValue("r_hi", "v_hi"), Seq("event_type", "m"))
      .select($"event_type", $"m".as("n_pairs"),
        ($"v_lo" + $"v_hi").as("sen_x2_micro"))
      .withColumn("slope_per_day",
        round($"sen_x2_micro".cast("double") / 2.0e6, 4))
      .orderBy($"event_type")
  }

  val theilSenDailySql: String =
    """WITH daily AS (
         SELECT event_type,
                CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
                CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       h AS (
         SELECT a.event_type AS event_type,
                ((b.n - a.n) * 1000000) // (b.d - a.d) AS v,
                CAST(count(*) AS BIGINT) AS c
         FROM daily a JOIN daily b
           ON a.event_type = b.event_type AND a.d < b.d
         GROUP BY 1, 2),
       cum AS (
         SELECT event_type, v, c,
                CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
         FROM h),
       t AS (
         SELECT event_type, CAST(sum(c) AS BIGINT) AS m,
                (sum(c) + 1) // 2 AS r_lo,
                sum(c) // 2 + 1 AS r_hi
         FROM h GROUP BY 1),
       lo AS (
         SELECT t.event_type, t.m, cum.v AS v_lo
         FROM t JOIN cum ON t.event_type = cum.event_type
          AND t.r_lo > cum.cum - cum.c AND t.r_lo <= cum.cum),
       hi AS (
         SELECT t.event_type, cum.v AS v_hi
         FROM t JOIN cum ON t.event_type = cum.event_type
          AND t.r_hi > cum.cum - cum.c AND t.r_hi <= cum.cum)
       SELECT lo.event_type, m AS n_pairs,
              CAST(v_lo + v_hi AS BIGINT) AS sen_x2_micro,
              round(CAST(v_lo + v_hi AS DOUBLE) / 2000000.0, 4)
                AS slope_per_day
       FROM lo JOIN hi USING (event_type)
       ORDER BY event_type"""

  /** HOLT linear-trend exponential smoothing forecast over the
    * hourly count series (Holt 1957 / Winters 1960 — the
    * level-plus-trend recursion; the no-seasonality member of the
    * exponential-smoothing family next to the truncated EWMA,
    * 27av.4): α = β = ¼, state in integer MICRO units with
    * truncating division at every step — l_t = (10⁶·x_t +
    * 3(l_{t−1}+b_{t−1})) div 4, b_t = ((l_t − l_{t−1}) + 3b_{t−1})
    * div 4 — so the whole trajectory is BIGINT-exact and replays
    * bit-for-bit as a DuckDB recursive CTE (both engines truncate
    * integer division toward zero — verified, not assumed). Emits
    * the h = 1..24 forecast fan l_n + h·b_n.
    *
    * Contract: the smoothing recursion is inherently sequential, so
    * after the DISTRIBUTED spine aggregation the fold runs
    * driver-side over the collected spine — CALENDAR-BOUNDED rows
    * (a decade of hours is 88 k; the markov-matrix collect stance).
    * Past hour grain, the documented valve is the associative
    * matrix-product scan form of the same linear recursion (each
    * step is an affine 2×2 map; fold maps per-band, combine
    * prefixes), which trades the integer-truncation contract for
    * distribution — not needed at any calendar-bounded grain.
    */
  def holtForecast(spark: SparkSession, dir: String,
      horizon: Int = 24): DataFrame = {
    import spark.implicits._
    val spine = gapfillHourly(spark, dir)
      .orderBy($"h").collect().map(_.getLong(1))
    require(spine.length >= 2,
      s"holtForecast: need ≥ 2 spine hours, got ${spine.length}")
    var l = spine(0) * 1000000L
    var b = (spine(1) - spine(0)) * 1000000L
    for (t <- 1 until spine.length) {
      val lPrev = l
      l = (spine(t) * 1000000L + 3L * (lPrev + b)) / 4L
      b = ((l - lPrev) + 3L * b) / 4L
    }
    val rows = (1 to horizon).map(h => (h.toLong, l + h.toLong * b))
    spark.createDataFrame(rows).toDF("h_ahead", "forecast_micro")
      .select($"h_ahead", $"forecast_micro",
        round($"forecast_micro".cast("double") / 1.0e6, 4).as("forecast"))
      .orderBy($"h_ahead")
  }

  def holtForecastSql(horizon: Int = 24): String = {
    // l2 inlined twice in the recursive arm (SQL can't name it)
    val l2 = "(sp.n * 1000000 + 3 * (st.l + st.b)) // 4"
    s"""WITH RECURSIVE c AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
          FROM events GROUP BY 1),
        bnd AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
        hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM bnd),
        spf AS (SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
                FROM hrs LEFT JOIN c USING (h)),
        sp AS (SELECT CAST(h - (SELECT lo FROM bnd) + 1 AS BIGINT) AS rn, n
               FROM spf),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM sp),
        st(t, l, b) AS (
          SELECT CAST(1 AS BIGINT),
                 (SELECT n FROM sp WHERE rn = 1) * 1000000,
                 ((SELECT n FROM sp WHERE rn = 2)
                   - (SELECT n FROM sp WHERE rn = 1)) * 1000000
          UNION ALL
          SELECT st.t + 1,
                 $l2,
                 (($l2 - st.l) + 3 * st.b) // 4
          FROM st JOIN sp ON sp.rn = st.t + 1
          WHERE st.t < (SELECT n_rows FROM nn)),
        fin AS (SELECT l, b FROM st
                WHERE t = (SELECT n_rows FROM nn)),
        fan AS (SELECT CAST(unnest(range(1, ${horizon + 1})) AS BIGINT)
                  AS h_ahead)
        SELECT h_ahead, l + h_ahead * b AS forecast_micro,
               round(CAST(l + h_ahead * b AS DOUBLE) / 1000000.0, 4)
                 AS forecast
        FROM fan CROSS JOIN fin
        ORDER BY h_ahead"""
  }

  /** PINBALL (quantile) loss backtest of the seasonal-naive hourly
    * forecast (Koenker/Bassett 1978's check function; the metric
    * quantile forecasts are scored with, cf. the M5-uncertainty
    * setup): ŷ(t) = y(t−24), scored at τ ∈ {0.1, 0.5, 0.9}. Integer
    * DECI units: 10·loss = τ₁₀·(y−ŷ) when y ≥ ŷ else (10−τ₁₀)·(ŷ−y)
    * — counts are integers, so the per-τ totals are exact BIGINTs
    * and only the display mean divides. The lag rides
    * [[bandedSpine]] (lookback 24), so the backtest holds past
    * hourly grain; warm-up hours without a lag are excluded.
    */
  def pinballBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lagged = bandedSpine(gapfillHourly(spark, dir), "h",
        lookback = 24) { (df, w0) =>
      df.withColumn("yhat", lag($"n", 24).over(w0))
    }.filter($"yhat".isNotNull)
    val taus = Seq(1L, 5L, 9L).toDF("tau10")
    lagged.crossJoin(broadcast(taus))
      .select($"tau10",
        when($"n" >= $"yhat", $"tau10" * ($"n" - $"yhat"))
          .otherwise((lit(10L) - $"tau10") * ($"yhat" - $"n"))
          .as("loss_deci"))
      .groupBy($"tau10")
      .agg(count(lit(1)).as("n_hours"),
        sum($"loss_deci").as("loss_deci_sum"))
      .select($"tau10", $"n_hours", $"loss_deci_sum",
        round($"loss_deci_sum".cast("double")
          / ($"n_hours".cast("double") * 10.0), 4).as("mean_loss"))
      .orderBy($"tau10")
  }

  val pinballBacktestSql: String =
    """WITH c AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
         FROM events GROUP BY 1),
       b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
       hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM b),
       sp AS (SELECT hrs.h AS h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
              FROM hrs LEFT JOIN c USING (h)),
       lagged AS (
         SELECT h, n, lag(n, 24) OVER (ORDER BY h) AS yhat
         FROM sp),
       taus AS (SELECT CAST(unnest([1, 5, 9]) AS BIGINT) AS tau10),
       losses AS (
         SELECT t.tau10,
                CASE WHEN l.n >= l.yhat
                     THEN t.tau10 * (l.n - l.yhat)
                     ELSE (10 - t.tau10) * (l.yhat - l.n) END AS loss_deci
         FROM lagged l CROSS JOIN taus t
         WHERE l.yhat IS NOT NULL)
       SELECT tau10, CAST(count(*) AS BIGINT) AS n_hours,
              CAST(sum(loss_deci) AS BIGINT) AS loss_deci_sum,
              round(CAST(sum(loss_deci) AS DOUBLE)
                / (CAST(count(*) AS DOUBLE) * 10.0), 4) AS mean_loss
       FROM losses GROUP BY 1 ORDER BY 1"""

  /** HOLT–WINTERS additive seasonal smoothing forecast (Winters 1960
    * — [[holtForecast]]'s level+trend recursion completed with the
    * 24-slot hour-of-day seasonal state; α = β = γ = ¼). The whole
    * state trajectory — level, trend, and the seasonal VECTOR — is
    * integer micro units with truncating division, initialized from
    * the first day (l₀ = day-1 mean, b₀ = 0, s₀ = day-1 deviations)
    * and replayed exactly by a DuckDB recursive CTE that carries the
    * seasonal array as a LIST column. Forecast fan:
    * l + h·b + s[(last_hour + h) mod 24] for h = 1..24.
    *
    * Same contract as [[holtForecast]]: spine aggregation is the
    * distributed work, the inherently-sequential fold runs
    * driver-side over calendar-bounded rows, matrix-scan valve
    * documented there.
    */
  def holtWintersForecast(spark: SparkSession, dir: String,
      horizon: Int = 24): DataFrame = {
    import spark.implicits._
    val spine = gapfillHourly(spark, dir)
      .orderBy($"h").collect().map(r => (r.getLong(0), r.getLong(1)))
    require(spine.length >= 48,
      s"holtWinters: need ≥ 48 spine hours (one init day + one fit " +
        s"day), got ${spine.length}")
    val l0 = spine.take(24).map(_._2).sum * 1000000L / 24L
    val s = new Array[Long](24)
    spine.take(24).foreach { case (h, x) =>
      s((h % 24).toInt) = x * 1000000L - l0
    }
    var l = l0
    var b = 0L
    for (i <- 24 until spine.length) {
      val (h, x) = spine(i)
      val hd = (h % 24).toInt
      val xm = x * 1000000L
      val lPrev = l
      l = ((xm - s(hd)) + 3L * (lPrev + b)) / 4L
      b = ((l - lPrev) + 3L * b) / 4L
      s(hd) = ((xm - l) + 3L * s(hd)) / 4L
    }
    val lastH = spine.last._1
    val rows = (1 to horizon).map { h =>
      (h.toLong, l + h.toLong * b + s(((lastH + h) % 24).toInt))
    }
    spark.createDataFrame(rows).toDF("h_ahead", "forecast_micro")
      .select($"h_ahead", $"forecast_micro",
        round($"forecast_micro".cast("double") / 1.0e6, 4).as("forecast"))
      .orderBy($"h_ahead")
  }

  def holtWintersForecastSql(horizon: Int = 24): String =
    s"""WITH RECURSIVE c AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS n
          FROM events GROUP BY 1),
        bnd AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
        hrs AS (SELECT unnest(generate_series(lo, hi)) AS h FROM bnd),
        sp AS (SELECT CAST(hrs.h - (SELECT lo FROM bnd) + 1 AS BIGINT)
                        AS rn,
                      CAST(hrs.h % 24 AS BIGINT) AS hod,
                      CAST(COALESCE(c.n, 0) AS BIGINT) AS n
               FROM hrs LEFT JOIN c USING (h)),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM sp),
        i0 AS (SELECT CAST((sum(n) * 1000000) // 24 AS BIGINT) AS l0
               FROM sp WHERE rn <= 24),
        s0 AS (SELECT list(CAST(n * 1000000 - (SELECT l0 FROM i0)
                 AS BIGINT) ORDER BY hod) AS s
               FROM sp WHERE rn <= 24),
        st(rn, l, b, s) AS (
          SELECT CAST(24 AS BIGINT), (SELECT l0 FROM i0),
                 CAST(0 AS BIGINT), (SELECT s FROM s0)
          UNION ALL
          SELECT rn2, l2,
                 CAST(((l2 - l) + 3 * b) // 4 AS BIGINT),
                 [CASE WHEN i = idx
                       THEN CAST(((xm - l2) + 3 * s[i]) // 4 AS BIGINT)
                       ELSE s[i] END for i in range(1, 25)]
          FROM (
            SELECT st.rn + 1 AS rn2, st.l, st.b, st.s,
                   sp.hod + 1 AS idx, sp.n * 1000000 AS xm,
                   CAST(((sp.n * 1000000 - st.s[sp.hod + 1])
                     + 3 * (st.l + st.b)) // 4 AS BIGINT) AS l2
            FROM st JOIN sp ON sp.rn = st.rn + 1)
          WHERE rn2 <= (SELECT n_rows FROM nn)),
        fin AS (SELECT l, b, s FROM st
                WHERE rn = (SELECT n_rows FROM nn)),
        fan AS (SELECT CAST(unnest(range(1, ${horizon + 1})) AS BIGINT)
                  AS h_ahead)
        SELECT h_ahead,
               l + h_ahead * b
                 + s[CAST(((SELECT hi FROM bnd) + h_ahead) % 24
                     AS BIGINT) + 1] AS forecast_micro,
               round(CAST(l + h_ahead * b
                 + s[CAST(((SELECT hi FROM bnd) + h_ahead) % 24
                     AS BIGINT) + 1] AS DOUBLE) / 1000000.0, 4)
                 AS forecast
        FROM fan CROSS JOIN fin
        ORDER BY h_ahead"""

  /** Build-time DFT basis for [[periodogram]]: (period, phase r,
    * cos(2πr/p)·10⁶, sin(2πr/p)·10⁶) quantized ONCE so both engines
    * multiply the same integer literals — never each engine's own
    * trigonometry.
    */
  private[operators] val dftBasis: Seq[(Long, Long, Long, Long)] =
    for {
      p <- Seq(24L, 168L)
      r <- 0L until p
    } yield (p, r,
      math.round(math.cos(2.0 * math.Pi * r / p) * 1e6),
      math.round(math.sin(2.0 * math.Pi * r / p) * 1e6))

  /** Single-frequency periodogram at the two calendar periods that
    * matter for event streams — 24 h and 168 h: the DFT power
    * |Σ y·e^{−2πi·t/p}|² read as a relative amplitude, the
    * frequency-domain companion to the hour-of-week seasonality
    * profile (a planted daily cycle concentrates its mass at p=24;
    * white noise spreads it). Phases enter through the BUILD-TIME
    * integer basis ([[dftBasis]]); the cos/sin accumulators are then
    * exact micro-scaled BIGINTs in any order, and the amplitude
    * ratio √(c²+s²)/Σy is one pinned double rounded once. Absent
    * hours contribute exactly zero to a sum, so no gap-fill spine is
    * needed — the hour histogram alone drives the whole gate.
    *
    * Scale shape: one partial-agg'd groupBy to hourly counts, one
    * broadcast min for the phase origin, one broadcast 192-row basis
    * join, one final aggregate per period. Headroom: Σ y·10⁶ holds
    * BIGINT to ~9·10¹² events.
    */
  def periodogram(spark: SparkSession, dir: String): DataFrame =
    periodogramOf(Tables.events(spark, dir)
      .select(expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("y")))

  /** Epoch-anchored variant over RAW events — phases are h mod p
    * with the Unix epoch as origin instead of the corpus min-hour,
    * which removes the only non-incremental step ([[periodogramOf]]'s
    * global min) and makes the SAME expression tree legal as a
    * single streaming aggregation ([[graft.streaming.EventStream
    * .periodogram]] calls this verbatim on an unbounded frame; the
    * StreamingSpec proves two-batch incremental ≡ batch). A fixed
    * phase origin rotates (c, s) but leaves the amplitude invariant.
    */
  def periodogramEpochOf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val basis = broadcast(dftBasis.toDF("period", "r", "cosq", "sinq"))
    events
      .select(expr("unix_timestamp(ts) div 3600").as("h"))
      .crossJoin(broadcast(dftBasis.map(_._1).distinct.toDF("period")))
      .withColumn("r", $"h" % $"period")
      .join(basis, Seq("period", "r"))
      .groupBy($"period")
      .agg(count(lit(1)).as("total"),
        sum($"cosq").as("c_micro"), sum($"sinq").as("s_micro"))
      .select($"period", $"total", $"c_micro", $"s_micro",
        when($"total" > 0L,
          round(sqrt($"c_micro".cast("double") * $"c_micro" +
            $"s_micro".cast("double") * $"s_micro") /
            $"total".cast("double")).cast("long"))
          .otherwise(0L).as("amp_ppm"))
  }

  /** Core over any (h, y) hourly histogram. */
  def periodogramOf(hourly: DataFrame): DataFrame = {
    import hourly.sparkSession.implicits._
    val origin = hourly.agg(min($"h").as("h0"))
    val basis = broadcast(dftBasis.toDF("period", "r", "cosq", "sinq"))
    hourly.crossJoin(broadcast(origin))
      .withColumn("t", $"h" - $"h0")
      .crossJoin(broadcast(dftBasis.map(_._1).distinct.toDF("period")))
      .withColumn("r", $"t" % $"period")
      .join(basis, Seq("period", "r"))
      .groupBy($"period")
      .agg(count(lit(1)).as("n_hours"), sum($"y").as("total"),
        sum($"y" * $"cosq").as("c_micro"),
        sum($"y" * $"sinq").as("s_micro"))
      .select($"period", $"n_hours", $"total", $"c_micro", $"s_micro",
        when($"total" > 0L,
          round(sqrt($"c_micro".cast("double") * $"c_micro" +
            $"s_micro".cast("double") * $"s_micro") /
            $"total".cast("double")).cast("long"))
          .otherwise(0L).as("amp_ppm"))
      .orderBy($"period")
  }

  /** Epoch-anchored oracle twin of [[periodogramEpochOf]] — r = h %
    * p with NO min-h origin shift, the streaming-accumulator form
    * (phase anchored at the epoch so an accumulator never needs to
    * know the series start). Gates the live streaming periodogram.
    */
  val periodogramEpochSql: String = {
    val basisRows = dftBasis
      .map { case (p, r, c, s) => s"($p, $r, $c, $s)" }
      .mkString(",\n                 ")
    s"""WITH hourly AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h
         FROM events),
       basis AS (
         SELECT CAST(p AS BIGINT) AS period, CAST(r AS BIGINT) AS r,
                CAST(c AS BIGINT) AS cosq, CAST(s AS BIGINT) AS sinq
         FROM (VALUES $basisRows) t(p, r, c, s)),
       m AS (
         SELECT period,
                CAST(count(*) AS BIGINT) AS total,
                CAST(sum(cosq) AS BIGINT) AS c_micro,
                CAST(sum(sinq) AS BIGINT) AS s_micro
         FROM hourly JOIN basis ON basis.r = h % basis.period
         GROUP BY 1)
       SELECT period, total, c_micro, s_micro,
              CASE WHEN total > 0 THEN
                CAST(round(sqrt(CAST(c_micro AS DOUBLE) * c_micro
                  + CAST(s_micro AS DOUBLE) * s_micro)
                  / CAST(total AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS amp_ppm
       FROM m ORDER BY period"""
  }

  val periodogramSql: String = {
    val basisRows = dftBasis
      .map { case (p, r, c, s) => s"($p, $r, $c, $s)" }
      .mkString(",\n                 ")
    s"""WITH hourly AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
                CAST(count(*) AS BIGINT) AS y
         FROM events GROUP BY 1),
       o AS (SELECT CAST(min(h) AS BIGINT) AS h0 FROM hourly),
       basis AS (
         SELECT CAST(p AS BIGINT) AS period, CAST(r AS BIGINT) AS r,
                CAST(c AS BIGINT) AS cosq, CAST(s AS BIGINT) AS sinq
         FROM (VALUES $basisRows) t(p, r, c, s)),
       m AS (
         SELECT period,
                CAST(count(*) AS BIGINT) AS n_hours,
                CAST(sum(y) AS BIGINT) AS total,
                CAST(sum(y * cosq) AS BIGINT) AS c_micro,
                CAST(sum(y * sinq) AS BIGINT) AS s_micro
         FROM hourly CROSS JOIN o
         JOIN basis ON basis.r = (h - h0) % basis.period
         GROUP BY 1)
       SELECT period, n_hours, total, c_micro, s_micro,
              CASE WHEN total > 0 THEN
                CAST(round(sqrt(CAST(c_micro AS DOUBLE) * c_micro
                  + CAST(s_micro AS DOUBLE) * s_micro)
                  / CAST(total AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS amp_ppm
       FROM m ORDER BY period"""
  }

  /** Seasonal-strength ratio per event type (the STL-style
    * F_s = 1 − Var(residual)/Var(deseasonalized-or-not) diagnostic,
    * Hyndman's "measuring strength of seasonality" form applied to
    * the hour-of-week profile): how much of the hourly-count
    * variance does the 168-cell weekly pattern explain — the one
    * number that says whether [[seasonalResidual]]'s cells are a
    * real rhythm or noise. Exactness device: SS_within =
    * Σy² − Σ_c S_c²/n_c folds from exact BIGINT moments with each
    * cell's S_c²/n_c quantized ONCE by micro floor division
    * (≤ 168 cells per type, so the floor bias is bounded by 168
    * micro-units); SS_total = Σy² − (Σy)²/N the same way; the
    * strength ratio is one pinned double rounded to ppm and clamped
    * at 0. Observed hours only (the [[mannKendallDaily]]-family
    * series contract).
    *
    * BIGINT headroom (the cross-multiplied-rationals family budget,
    * SCALING.md "Exactness" table): the widest term is
    * sy²·10⁶ with sy = Σ hourly counts per type, so exactness holds
    * while sy < 3.0·10⁶ events per type (and per-cell S_c²·10⁶
    * likewise at the cell grain). Past that — ~10⁹ events/type at
    * 100 TB — drop the micro factor to 10³ (per-mille) or pre-scale
    * counts the [[graft.operators.Sampling.neymanAllocation]]
    * hectochar way before the squares; the ratio is scale-invariant.
    *
    * Scale shape: two partial-agg'd groupBys (hour histogram, then
    * (type, dow, hod) cells), one broadcast of the 168-cell frame —
    * no windows at all.
    */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.events(spark, dir)
      .select($"event_type", expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy($"event_type", $"h").agg(count(lit(1)).as("y"))
      // Unix hour 0 was a Thursday; dow here is just (h div 24) mod 7
      // — any fixed weekday labeling yields the same 168-cell split
      .withColumn("cell", expr("(h div 24) % 7 * 24 + h % 24"))
    val cells = hourly.groupBy($"event_type", $"cell")
      .agg(count(lit(1)).as("n_c"), sum($"y").as("s_c"))
      .groupBy($"event_type")
      .agg(sum(expr("(s_c * s_c * 1000000) div n_c")).as("within_micro"))
    val tot = hourly.groupBy($"event_type")
      .agg(count(lit(1)).as("n_hours"), sum($"y").as("sy"),
        sum($"y" * $"y").as("syy"))
    tot.join(broadcast(cells), Seq("event_type"))
      .withColumn("ss_within_micro",
        $"syy" * lit(1000000L) - $"within_micro")
      .withColumn("ss_total_micro",
        $"syy" * lit(1000000L) - expr("(sy * sy * 1000000) div n_hours"))
      .select($"event_type", $"n_hours", $"sy", $"syy",
        $"ss_within_micro", $"ss_total_micro",
        when($"ss_total_micro" > 0L,
          greatest(lit(0L),
            round((lit(1.0) - $"ss_within_micro".cast("double") /
              $"ss_total_micro".cast("double")) * lit(1.0e6)).cast("long")))
          .otherwise(0L).as("strength_ppm"))
      .orderBy($"event_type")
  }

  val seasonalStrengthSql: String =
    """WITH hourly AS (
         SELECT event_type,
                CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
                CAST(count(*) AS BIGINT) AS y
         FROM events GROUP BY 1, 2),
       hc AS (
         SELECT event_type, h, y,
                (h // 24) % 7 * 24 + h % 24 AS cell
         FROM hourly),
       cells AS (
         SELECT event_type,
                CAST(sum((s_c * s_c * 1000000) // n_c) AS BIGINT)
                  AS within_micro
         FROM (SELECT event_type, cell, CAST(count(*) AS BIGINT) AS n_c,
                      CAST(sum(y) AS BIGINT) AS s_c
               FROM hc GROUP BY 1, 2) z
         GROUP BY 1),
       tot AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(y * y) AS BIGINT) AS syy
         FROM hc GROUP BY 1),
       m AS (
         SELECT tot.event_type, n_hours, sy, syy,
                syy * 1000000 - within_micro AS ss_within_micro,
                syy * 1000000 - (sy * sy * 1000000) // n_hours
                  AS ss_total_micro
         FROM tot JOIN cells ON cells.event_type = tot.event_type)
       SELECT event_type, n_hours, sy, syy,
              CAST(ss_within_micro AS BIGINT) AS ss_within_micro,
              CAST(ss_total_micro AS BIGINT) AS ss_total_micro,
              CASE WHEN ss_total_micro > 0 THEN
                greatest(0, CAST(round((1.0
                  - CAST(ss_within_micro AS DOUBLE)
                    / CAST(ss_total_micro AS DOUBLE)) * 1000000.0)
                  AS BIGINT))
              ELSE 0 END AS strength_ppm
       FROM m ORDER BY event_type"""

  /** Binary-segmentation changepoint on the daily event-count
    * series (Scott & Knott 1974; the one-split primitive PELT
    * iterates): the day boundary whose two-segment split minimizes
    * total within-segment SSE — the level-shift locator that
    * complements [[cusumHours]]'s sequential drift alarm with a
    * global least-squares answer. Candidate costs fold from exact
    * BIGINT prefix moments (i, Σy, Σy²) via SSE = Q − S²/n per side,
    * each candidate quantized ONCE to micro-units and the argmin
    * taken on (cost, day) — deterministic in any evaluation order.
    * Observed days only (zero-event days excluded — the
    * [[mannKendallDaily]] series contract).
    *
    * Scale shape: one partial-agg'd groupBy to the daily series,
    * then prefix windows + argmin over the calendar-bounded day
    * spine (≤ 3653 rows/decade) — the audited spine-window family;
    * the corpus never re-enters.
    */
  def binsegDaily(spark: SparkSession, dir: String): DataFrame =
    binsegDailyOf(Tables.events(spark, dir)
      .select(expr("unix_timestamp(ts) div 86400").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("y")))

  /** Core over any (d, y) integer series. */
  def binsegDailyOf(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val upTo = Window.orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val pre = daily
      .withColumn("i", count(lit(1)).over(upTo))
      .withColumn("s", sum($"y").over(upTo))
      .withColumn("q", sum($"y" * $"y").over(upTo))
    val tot = pre.agg(max($"i").as("n"), max($"s").as("s_tot"),
      max($"q").as("q_tot"))
    val cand = pre.crossJoin(broadcast(tot))
      .filter($"i" < $"n")
      .withColumn("cost_micro",
        round((($"q" - $"s".cast("double") * $"s" / $"i") +
          ($"q_tot" - $"q" -
            ($"s_tot" - $"s").cast("double") * ($"s_tot" - $"s") /
              ($"n" - $"i"))) * lit(1.0e6)).cast("long"))
    // groupBy on a constant, NOT groupBy(): a global aggregate over
    // the EMPTY candidate frame (single-distinct-day series — no
    // i < n split exists) would emit one all-NULL row while the
    // oracle's ORDER BY…LIMIT 1 over zero candidates joined FROM
    // best, tot emits zero; grouping makes empty→empty on both
    // engines (TimeSeriesSpec pins the degenerate case).
    cand
      .groupBy(lit(1).as("one"))
      .agg(min(struct($"cost_micro", $"d", $"i", $"s")).as("m"),
        max($"n").as("n_days"), max($"s_tot").as("s_tot"),
        max($"q_tot").as("q_tot"))
      .select($"n_days", $"m.d".as("split_last_left_day"),
        $"m.i".as("n_left"), ($"n_days" - $"m.i").as("n_right"),
        $"m.s".as("s_left"), ($"s_tot" - $"m.s").as("s_right"),
        $"m.cost_micro".as("cost_micro"),
        round(($"q_tot" - $"s_tot".cast("double") * $"s_tot" / $"n_days") *
          lit(1.0e6)).cast("long").as("sse0_micro"))
      .withColumn("gain_micro", $"sse0_micro" - $"cost_micro")
  }

  val binsegDailySql: String =
    """WITH daily AS (
         SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
                CAST(count(*) AS BIGINT) AS y
         FROM events GROUP BY 1),
       pre AS (
         SELECT d,
                CAST(count(*) OVER w AS BIGINT) AS i,
                CAST(sum(y) OVER w AS BIGINT) AS s,
                CAST(sum(y * y) OVER w AS BIGINT) AS q
         FROM daily
         WINDOW w AS (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       tot AS (SELECT CAST(max(i) AS BIGINT) AS n,
                      CAST(max(s) AS BIGINT) AS s_tot,
                      CAST(max(q) AS BIGINT) AS q_tot
               FROM pre),
       cand AS (
         SELECT d, i, s,
                CAST(round(((q - CAST(s AS DOUBLE) * s / i)
                  + (q_tot - q - CAST(s_tot - s AS DOUBLE) * (s_tot - s)
                     / (n - i))) * 1000000.0) AS BIGINT) AS cost_micro
         FROM pre, tot WHERE i < n),
       best AS (
         SELECT d AS split_d, i AS n_left, s AS s_left,
                CAST(cost_micro AS BIGINT) AS cost_micro
         FROM cand ORDER BY cost_micro, d LIMIT 1)
       SELECT n AS n_days, CAST(split_d AS BIGINT) AS split_last_left_day,
              CAST(n_left AS BIGINT) AS n_left,
              CAST(n - n_left AS BIGINT) AS n_right,
              CAST(s_left AS BIGINT) AS s_left,
              CAST(s_tot - s_left AS BIGINT) AS s_right,
              cost_micro,
              CAST(round((q_tot - CAST(s_tot AS DOUBLE) * s_tot / n)
                * 1000000.0) AS BIGINT) AS sse0_micro,
              CAST(round((q_tot - CAST(s_tot AS DOUBLE) * s_tot / n)
                * 1000000.0) AS BIGINT) - cost_micro AS gain_micro
       FROM best, tot"""

  /** Grid points for the inter-arrival exponential fit: the j/8
    * quantiles of Exp(1), each −ln(1−j/8) quantized ONCE to integer
    * micro-nats at build time so BOTH engines compare against the
    * same literal (never each engine's own ln).
    */
  private[operators] val expGridMicroNats: Seq[(Int, Long)] =
    (1 to 7).map(j => j -> math.round(-math.log(1.0 - j / 8.0) * 1e6))

  /** Per-user inter-arrival exponential fit + grid
    * Kolmogorov–Smirnov readout per event type — does arrival
    * behavior look Poisson (memoryless gaps), the base assumption
    * behind burst detection ([[burstIntervals]]) and capacity
    * planning? The MLE under Exp(λ) is λ = 1/mean-gap; the fit is
    * then checked where it claims mass: at the 7 octile points of
    * the fitted CDF (x_j with F_exp(x_j) = j/8), compare the
    * empirical fraction of gaps ≤ x_j — a fixed-grid KS statistic
    * (sup over the grid, a defined, exactly-reproducible statistic;
    * the classical sup-over-data KS needs a corpus-sized rank).
    *
    * Exactness device: gaps are integer micros from a lag window
    * partitioned by (user, type) — user-sized partitions, never a
    * type-wide order; (n, Σgap) are exact BIGINTs; each threshold is
    * one double expression off those exact integers with the
    * BUILD-TIME micro-nat grid constants ([[expGridMicroNats]]), so
    * both engines evaluate bit-identical IEEE arithmetic; counts and
    * ppm fractions below the thresholds are exact integers again.
    *
    * Scale shape: corpus → per-(user,type) lag window → one
    * partial-agg'd groupBy(type) census → 7-row broadcast grid fan
    * over the type-domain frame → one conditional-count join back on
    * the gap stream (type-domain broadcast). Nothing type-sized ever
    * sorts.
    */
  def interArrivalFit(spark: SparkSession, dir: String): DataFrame =
    interArrivalFitOf(Tables.events(spark, dir))

  def interArrivalFitOf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"tus")
    val gaps = events
      .select($"user_id", $"event_type", expr("unix_micros(ts)").as("tus"))
      .withColumn("prev", lag($"tus", 1).over(w))
      .filter($"prev".isNotNull)
      .select($"event_type", ($"tus" - $"prev").as("gap_us"))
    val census = gaps.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"gap_us").as("sum_us"))
    val grid = broadcast(expGridMicroNats
      .map { case (j, q) => (j.toLong, q) }.toDF("grid_j", "lnq_micro"))
    val thresholds = census.crossJoin(grid)
      .withColumn("thr_us",
        $"lnq_micro".cast("double") * $"sum_us".cast("double") /
          ($"n".cast("double") * lit(1.0e6)))
    val counts = gaps.join(broadcast(thresholds), Seq("event_type"))
      .groupBy($"event_type", $"grid_j")
      .agg(max($"n").as("n"),
        sum(when($"gap_us".cast("double") <= $"thr_us", 1L).otherwise(0L))
          .as("n_le"))
      .withColumn("f_exp_ppm", $"grid_j" * lit(125000L))
      .withColumn("f_emp_ppm", expr("(n_le * 1000000) div n"))
      .withColumn("dev_ppm", abs($"f_emp_ppm" - $"f_exp_ppm"))
    val ks = counts.groupBy($"event_type").agg(max($"dev_ppm").as("ks_ppm"))
    counts.join(broadcast(ks), Seq("event_type"))
      .select($"event_type", $"grid_j", $"n", $"n_le",
        $"f_exp_ppm", $"f_emp_ppm", $"dev_ppm", $"ks_ppm")
      .orderBy($"event_type", $"grid_j")
  }

  val interArrivalFitSql: String = {
    val gridRows = expGridMicroNats
      .map { case (j, q) => s"($j, $q)" }.mkString(", ")
    s"""WITH e AS (
         SELECT user_id, event_type,
                epoch_us(date_trunc('microseconds', ts)) AS tus
         FROM events),
       g AS (
         SELECT event_type,
                tus - lag(tus) OVER (PARTITION BY user_id, event_type
                                     ORDER BY tus) AS gap_us
         FROM e),
       gaps AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL),
       census AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(gap_us) AS BIGINT) AS sum_us
         FROM gaps GROUP BY 1),
       grid AS (SELECT CAST(j AS BIGINT) AS grid_j,
                       CAST(q AS BIGINT) AS lnq_micro
                FROM (VALUES $gridRows) v(j, q)),
       thr AS (
         SELECT event_type, grid_j, n,
                CAST(lnq_micro AS DOUBLE) * CAST(sum_us AS DOUBLE)
                  / (CAST(n AS DOUBLE) * 1000000.0) AS thr_us
         FROM census, grid),
       c AS (
         SELECT thr.event_type, grid_j, CAST(max(thr.n) AS BIGINT) AS n,
                CAST(sum(CASE WHEN CAST(gap_us AS DOUBLE) <= thr_us
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_le
         FROM gaps JOIN thr ON thr.event_type = gaps.event_type
         GROUP BY 1, 2),
       f AS (
         SELECT event_type, grid_j, n, n_le,
                grid_j * 125000 AS f_exp_ppm,
                (n_le * 1000000) // n AS f_emp_ppm
         FROM c),
       d AS (
         SELECT event_type, grid_j, n, n_le, f_exp_ppm, f_emp_ppm,
                abs(f_emp_ppm - f_exp_ppm) AS dev_ppm
         FROM f),
       ks AS (SELECT event_type, CAST(max(dev_ppm) AS BIGINT) AS ks_ppm
              FROM d GROUP BY 1)
       SELECT d.event_type, d.grid_j, d.n, d.n_le,
              CAST(d.f_exp_ppm AS BIGINT) AS f_exp_ppm,
              CAST(d.f_emp_ppm AS BIGINT) AS f_emp_ppm,
              CAST(d.dev_ppm AS BIGINT) AS dev_ppm, ks.ks_ppm
       FROM d JOIN ks ON ks.event_type = d.event_type
       ORDER BY d.event_type, d.grid_j"""
  }
}
