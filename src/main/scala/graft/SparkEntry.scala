package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory
  * each entry corresponds to. Column names in `queries` results and
  * `oracleSql` are aliased identically (the driver sorts columns by
  * name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Relational.q1Agg _,
    "q3_join" -> Relational.q3Join _,
    "q_window_running" -> Relational.windowRunning _,
  )

  /** DuckDB-equivalent ANSI SQL per query (same parquet tables,
    * registered as views by the driver). Omitted keys get a weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_join" -> Relational.q3JoinSql,
    "q_window_running" -> Relational.windowRunningSql,
  )
}
