package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right
  * row with the same key and time ≤ the left row's time. Spark has
  * no native operator; the naive formulations are a range self-join
  * (quadratic per key) or a per-left-row subquery (worse). This is
  * the composition that scales: tag both sides, union, one window
  * sorted by (time, side-tag) per key, and `last(_, ignoreNulls)`
  * carries the most recent right payload forward into each left row.
  * Exactly ONE shuffle + sort for the whole operator — the same cost
  * as a plain sort-merge join — and every stage is codegen'd.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its latest row ≤ t wins)
    * @param keys       equi-key columns present on both sides
    * @param leftTime   event-time column name on `left`
    * @param rightTime  event-time column name on `right`
    * @param payload    right columns to carry (prefixed `asof_`)
    * @return `left` columns + `asof_<payload>` columns (null when no
    *         right row precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val leftCols = left.columns.toSeq
    // side tag 1 = right sorts BEFORE an equal-time left row, so a
    // right row at exactly t is visible to a left row at t (ASOF >=)
    val l = left.withColumn("_t", col(leftTime))
      .withColumn("_side", lit(2))
      .select(Seq(col("_t"), col("_side")) ++ leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p")): _*)
    val r = right.withColumn("_t", col(rightTime))
      .withColumn("_side", lit(1))
      .select(Seq(col("_t"), col("_side")) ++ leftCols.map(c =>
        if (keys.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"_p_$p")): _*)
    // payload columns as the final tie-break: with two right rows at
    // the same (key, t), `last` would otherwise pick by shuffle order
    // — nondeterministic across runs
    val tieBreak = payload.map(p => col(s"_p_$p").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq($"_t".asc, $"_side".asc) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .select((leftCols.map(col) :+ col("_side")) ++
        payload.map(p => last(col(s"_p_$p"), ignoreNulls = true).over(w)
          .as(s"asof_$p")): _*)
      .filter($"_side" === 2)
      .drop("_side")
  }

  /** Gate query: each non-signup event annotated with the value of
    * that user's most recent signup at-or-before it.
    */
  def eventsAsOfSignup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val probes = ev.filter($"event_type" =!= "signup")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_id"), $"value".as("signup_value"))
    asOf(probes, signups, keys = Seq("user_id"),
      leftTime = "ts", rightTime = "ts",
      payload = Seq("signup_id", "signup_value"))
      .select($"event_id", $"user_id", $"asof_signup_id",
        round($"asof_signup_value", 4).as("asof_signup_value"))
  }

  /** DuckDB oracle uses its native ASOF JOIN. Timestamps are µs on
    * the Spark side (Tables.events truncation) vs ns in the raw
    * parquet — the oracle truncates to µs for identical comparisons.
    */
  val eventsAsOfSignupSql: String =
    """WITH ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts,
                          user_id, event_type, value FROM events)
       SELECT p.event_id, p.user_id,
              l.signup_id AS asof_signup_id,
              round(l.signup_value, 4) AS asof_signup_value
       FROM (SELECT * FROM ev WHERE event_type <> 'signup') p
       ASOF LEFT JOIN
            (SELECT user_id, ts, event_id AS signup_id, value AS signup_value
             FROM ev WHERE event_type = 'signup') l
         ON p.user_id = l.user_id AND p.ts >= l.ts"""
}
