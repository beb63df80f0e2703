package graft.pipeline

import graft.{Graft, Tables}
import graft.operators.Analytics
import org.apache.spark.sql.SparkSession

/** The reference's whole program (task.py main: extract → transform →
  * load → check_history → validation → execute_sql) as one composable
  * job. Each stage is a library call, so a cluster deployment runs
  * exactly this via spark-submit with a real input/output.
  *
  * Returns a run report instead of logging row counts — the contract
  * task.py's log lines informally provided.
  */
object EtlJob {

  case class RunReport(skipped: Boolean, tablesWritten: Seq[String],
      orphanOrders: Long, orphanCustomers: Long,
      topFemaleToken: Option[String], topMaleToken: Option[String])

  /** @param inputName idempotency key for the history ledger (≙ the
    *   CSV filename in check_history, task.py:231)
    */
  def run(spark: SparkSession, dataDir: String, outDir: String,
      inputName: String): RunReport = {
    val history = new History(spark, s"$outDir/_history")
    if (!history.recordIfNew(inputName))
      return RunReport(skipped = true, Nil, -1, -1, None, None)

    // transform + load: dimensional star build (≙ task.py:74-143)
    val written = DimensionalEtl.buildAndLoad(spark, dataDir, outDir)

    // validation (≙ queries.py:40-51)
    val orphanOrders = Analytics.validateOrphanOrders(spark, dataDir)
      .collect()(0).getLong(0)
    val orphanCustomers = Analytics.validateOrphanCustomers(spark, dataDir)
      .collect()(0).getLong(0)

    // analytics (≙ execute_sql, task.py:182)
    def top(g: String): Option[String] =
      Analytics.topToken(spark, dataDir, g).collect()
        .headOption.map(_.getString(0))

    RunReport(skipped = false, written, orphanOrders, orphanCustomers,
      top("female"), top("male"))
  }

  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_lake"
    val spark = Graft.session(appName = "graft-etl")
    spark.sparkContext.setLogLevel("WARN")
    val report = run(spark, dataDir, outDir, inputName = dataDir)
    println(report)
    spark.stop()
  }
}
