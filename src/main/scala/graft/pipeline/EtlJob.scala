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

  /** Gate `etl_job`: the composed reference program (SURVEY 13c —
    * extract → transform → star load → history → validation →
    * analytics) board-verified end-to-end instead of stage by stage.
    * The job runs TWICE into one scratch lake with the same input
    * name; the second run must be skipped by the history ledger (the
    * check_history contract, reference task.py:231). The readout
    * joins the WRITTEN bridge back to the WRITTEN dim — files on
    * disk, not recomputed frames — into a per-(source, gender)
    * census, with the whole RunReport riding as verdict columns
    * (fact rows, table count, skip flag, both orphan validations,
    * both top-token analytics), so a job that writes a stale dim,
    * mis-ranks a surrogate id, breaks ledger idempotency, or
    * mis-reports a validation hash-fails against the one composed
    * DuckDB oracle.
    */
  def jobRead(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = graft.util.Scratch.dir("graft_etl_job")
    val r1 = run(spark, dir, out, inputName = "batch-1.csv")
    val r2 = run(spark, dir, out, inputName = "batch-1.csv")
    require(!r1.skipped, "etl_job: first run must execute")
    require(r2.skipped,
      "etl_job: second run of the same input must be skipped by the ledger")
    val dim = spark.read.parquet(s"$out/token_dim")
    val bridge = spark.read.parquet(s"$out/doc_token_bridge")
    val factRows = spark.read.parquet(s"$out/documents_fact").count()
    bridge.join(broadcast(dim.select($"token_id", $"gender")), Seq("token_id"))
      .groupBy($"source_type", $"gender")
      .agg(count(lit(1)).as("n"), sum($"token_id").as("id_sum"))
      .withColumn("fact_rows", lit(factRows))
      .withColumn("n_tables", lit(r1.tablesWritten.size.toLong))
      .withColumn("second_skipped", lit(r2.skipped))
      .withColumn("orphan_orders", lit(r1.orphanOrders))
      .withColumn("orphan_customers", lit(r1.orphanCustomers))
      .withColumn("top_female", lit(r1.topFemaleToken.orNull).cast("string"))
      .withColumn("top_male", lit(r1.topMaleToken.orNull).cast("string"))
      .orderBy($"source_type", $"gender")
  }

  def jobReadSql: String = {
    import graft.functions.TextFns
    s"""WITH dim AS (
         SELECT token, row_number() OVER (ORDER BY token) AS token_id,
                ${TextFns.genderGuessSql("token")} AS gender
         FROM (
           SELECT DISTINCT trim(t) AS token FROM (
             SELECT unnest(string_split(text, ' ')) AS t FROM documents
             UNION ALL
             SELECT unnest(string_split(p_name, ' ')) AS t FROM part)
           WHERE length(trim(t)) > 0)),
       doc_tok AS (
         SELECT doc_id, trim(t) AS token
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
               FROM documents)
         WHERE length(trim(t)) > 0),
       part_tok AS (
         SELECT p_partkey, trim(t) AS token
         FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS t
               FROM part)
         WHERE length(trim(t)) > 0),
       bridge AS (
         SELECT token_id, 'doc' AS source_type
           FROM doc_tok JOIN dim USING (token)
         UNION ALL
         SELECT token_id, 'part' AS source_type
           FROM part_tok JOIN dim USING (token)),
       tok_counts AS (
         SELECT token, count(*) AS n,
                ${TextFns.genderGuessSql("token")} AS gender
         FROM (SELECT trim(t) AS token
               FROM (SELECT unnest(string_split(text, ' ')) AS t
                     FROM documents)
               WHERE length(trim(t)) > 0)
         GROUP BY token)
       SELECT b.source_type, d.gender,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(d.token_id) AS BIGINT) AS id_sum,
              (SELECT CAST(count(*) AS BIGINT) FROM documents) AS fact_rows,
              CAST(3 AS BIGINT) AS n_tables,
              TRUE AS second_skipped,
              (SELECT CAST(count(*) AS BIGINT)
               FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
               WHERE l_orderkey IS NULL) AS orphan_orders,
              (SELECT CAST(count(*) AS BIGINT)
               FROM customer LEFT JOIN orders ON c_custkey = o_custkey
               WHERE o_custkey IS NULL) AS orphan_customers,
              (SELECT token FROM tok_counts WHERE gender = 'female'
               ORDER BY n DESC, token LIMIT 1) AS top_female,
              (SELECT token FROM tok_counts WHERE gender = 'male'
               ORDER BY n DESC, token LIMIT 1) AS top_male
       FROM bridge b JOIN dim d USING (token_id)
       GROUP BY 1, 2 ORDER BY 1, 2"""
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
