package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Banded range join: pairs (l, r) with equal keys and
  * `r.time ∈ [l.time, l.time + band)`. Spark turns a raw inequality
  * join into BroadcastNestedLoop (quadratic); the scalable shape
  * buckets time at the band width — a right row at bucket b can only
  * match left rows in buckets {b, b−1}, so the right side is
  * replicated ×2 with those bucket keys and the join is a plain
  * equi-join on (key, bucket) + an exact range filter. Σ bucket²
  * replaces |L|×|R| per key.
  */
object RangeJoin {

  /** @param band     window width in microseconds
    * @param keys     equi-key columns on both sides
    * @param lTime    left event-time column (µs timestamp)
    * @param rTime    right event-time column
    */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lTime: String, rTime: String, band: Long): DataFrame = {
    import left.sparkSession.implicits._
    val l = left.withColumn("_bucket",
      expr(s"unix_micros($lTime) div $band"))
    val r = right
      .withColumn("_rb", expr(s"unix_micros($rTime) div $band"))
      .withColumn("_bucket", explode(array($"_rb", $"_rb" - 1)))
      .drop("_rb")
    l.join(r, keys :+ "_bucket")
      .filter(col(rTime) >= col(lTime) &&
        expr(s"unix_micros($rTime) < unix_micros($lTime) + $band"))
      .drop("_bucket")
  }

  /** Gate query: per signup, how many error events the same user
    * produced within 30 minutes after it (signup rows with zero
    * errors drop out — inner semantics, deterministic).
    */
  def errorsAfterSignup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id", $"ts")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts".as("err_ts"))
    bandJoin(signups, errors, Seq("user_id"), "ts", "err_ts",
      band = 30L * 60 * 1000000)
      .groupBy($"signup_id", $"user_id")
      .agg(count(lit(1)).as("n_errors"))
  }

  val errorsAfterSignupSql: String =
    """WITH ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts,
                          user_id, event_type FROM events)
       SELECT s.event_id AS signup_id, s.user_id, count(*) AS n_errors
       FROM (SELECT * FROM ev WHERE event_type = 'signup') s
       JOIN (SELECT * FROM ev WHERE event_type = 'error') e
         ON s.user_id = e.user_id
        AND e.ts >= s.ts
        AND e.ts < s.ts + INTERVAL 30 MINUTE
       GROUP BY s.event_id, s.user_id"""
}
