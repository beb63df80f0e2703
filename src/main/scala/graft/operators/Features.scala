package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct feature materialization — the feature-store
  * snapshot step of an ML pipeline: per-entity aggregates computed
  * strictly AS OF a reference time T, so no post-T information leaks
  * into a training row (the correctness property the feature-store
  * systems exist to enforce; a naive "latest aggregates" join ships
  * future leakage silently). Reference behavior surface: the
  * engagement family (coded4alex/data_engineer_task queries.py) reads
  * history; this materializes it into the model-input shape.
  */
object Features {

  /** Per-user activity features as of the 800‰ point of event time
    * (the same exact integer percentile device as
    * [[Sampling.temporalSplit]] — deterministic cross-engine):
    * lifetime/7d/24h counts, seconds since last activity, distinct
    * type breadth, and the most recent event type (deterministic
    * (es, event_id) tie-break). Every feature is an exact integer;
    * windows only partition by user. Users with no pre-T activity
    * are absent — a feature row with no history is a join decision
    * for the trainer, not a silent zero.
    */
  def userFeaturesAsOf(spark: SparkSession, dir: String,
      cutPerMille: Int = 800): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("unix_timestamp(ts)").as("es"))
    val hist = ev.groupBy($"es").agg(count(lit(1)).as("c"))
    val tot = hist.agg(sum($"c").as("n"))
    val w = Window.orderBy($"es")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cut = hist.withColumn("cum", sum($"c").over(w))
      .crossJoin(broadcast(tot))
      .filter($"cum" * 1000L >= $"n" * cutPerMille)
      .orderBy($"es").limit(1)
      .select($"es".as("t0"))
    val past = ev.crossJoin(broadcast(cut)).filter($"es" <= $"t0")
    val wl = Window.partitionBy($"user_id")
      .orderBy($"es".desc, $"event_id".desc)
    val lastType = past
      .withColumn("rn", row_number().over(wl))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("last_type"))
    past.groupBy($"user_id")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"es" > $"t0" - 7L * 86400L, 1L).otherwise(0L))
          .as("n_7d"),
        sum(when($"es" > $"t0" - 86400L, 1L).otherwise(0L)).as("n_24h"),
        (first($"t0") - max($"es")).as("secs_since_last"),
        count_distinct($"event_type").as("n_types"))
      .join(lastType, "user_id")
      .orderBy($"user_id")
  }

  def userFeaturesAsOfSql(cutPerMille: Int = 800): String =
    s"""WITH ev AS (
          SELECT user_id, event_id, event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) AS es
          FROM events),
        h AS (SELECT es, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1),
        t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        cum AS (SELECT es, CAST(sum(c) OVER (ORDER BY es) AS BIGINT) AS cum
                FROM h),
        cut AS (SELECT es AS t0 FROM cum CROSS JOIN t
                WHERE cum * 1000 >= n * $cutPerMille
                ORDER BY es LIMIT 1),
        past AS (SELECT ev.*, t0 FROM ev CROSS JOIN cut WHERE es <= t0),
        lastt AS (
          SELECT user_id, event_type AS last_type FROM (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY es DESC, event_id DESC) AS rn
            FROM past) WHERE rn = 1),
        agg AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_total,
                 CAST(sum(CASE WHEN es > t0 - 7 * 86400 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_7d,
                 CAST(sum(CASE WHEN es > t0 - 86400 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_24h,
                 CAST(min(t0) - max(es) AS BIGINT) AS secs_since_last,
                 CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
          FROM past GROUP BY user_id)
        SELECT a.user_id, n_total, n_7d, n_24h, secs_since_last,
               n_types, last_type
        FROM agg a JOIN lastt USING (user_id)
        ORDER BY a.user_id"""
}
