package graft.sources

import org.apache.spark.sql.DataFrame

/** One table write behind a pluggable target, so the star-schema
  * load can go to the parquet lake (default) or a JDBC warehouse
  * (the reference's literal to_sql target, task.py:143) without the
  * pipeline knowing which.
  */
trait TableSink {
  /** Write `df` as `name`; returns a location descriptor. */
  def write(name: String, df: DataFrame, partitionCols: Seq[String] = Nil): String

  /** Drop `name` if present; a no-op when it doesn't exist (the
    * reference's `DROP TABLE IF EXISTS`, task.py:170).
    */
  def drop(name: String): Unit
}

/** Partitioned parquet lake writer — the scale path. */
class ParquetSink(outDir: String) extends TableSink {
  def write(name: String, df: DataFrame, partitionCols: Seq[String]): String = {
    val path = s"$outDir/$name"
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
    path
  }

  // recursive delete through the Hadoop FS API, so the same call
  // works against local disk, HDFS, or object stores
  def drop(name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    p.getFileSystem(conf).delete(p, true)
  }
}

/** JDBC warehouse writer (≙ task.py:143 `to_sql` + queries.py:1-34
  * DDL — Spark derives the DDL from the schema). Each upstream
  * partition opens its own connection and batch-inserts, so the
  * write parallelism is `numPartitions`, bounded to respect the
  * database's connection budget — unlike the reference's
  * single-connection pandas to_sql. `partitionCols` is accepted but
  * ignored: layout belongs to the database.
  */
class JdbcSink(url: String, props: java.util.Properties = new java.util.Properties,
    numPartitions: Int = 8, batchSize: Int = 10000) extends TableSink {
  def write(name: String, df: DataFrame, partitionCols: Seq[String]): String = {
    df.coalesce(numPartitions).write
      .mode("overwrite")
      .option("batchsize", batchSize.toString)
      .jdbc(url, name, props)
    s"$url#$name"
  }

  // plain DROP TABLE with a swallowed does-not-exist error, because
  // `IF EXISTS` isn't portable (Derby lacks it; Postgres has it)
  def drop(name: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $name")
      catch { case _: java.sql.SQLException => () }
      finally st.close()
    } finally conn.close()
  }
}

/** Load step (≙ task.py:143 `to_sql` into Postgres), re-expressed as
  * a partitioned parquet lake: the fact table partitioned by a
  * low-cardinality column (partition pruning at read), dims written
  * plain (they're broadcast at join time, layout doesn't matter).
  *
  * At 100 TB the fact write is the job: `partitionBy` on a
  * low-cardinality key (date, region) keeps file counts sane, and
  * writers scale with upstream partitions — no driver bottleneck,
  * unlike the reference's single-connection to_sql.
  */
object StarSchemaSink {

  /** Write one star through any [[TableSink]]: returns locations
    * keyed by table name.
    */
  def writeTo(sink: TableSink, fact: (String, DataFrame, Seq[String]),
      dims: Seq[(String, DataFrame)]): Map[String, String] = {
    val (fname, fdf, partCols) = fact
    val dimPaths = dims.map { case (name, df) =>
      name -> sink.write(name, df.coalesce(1))
    }
    (dimPaths :+ (fname -> sink.write(fname, fdf, partCols))).toMap
  }

  /** Write one star to the parquet lake: returns the written paths. */
  def write(outDir: String, fact: (String, DataFrame, Seq[String]),
      dims: Seq[(String, DataFrame)]): Map[String, String] =
    writeTo(new ParquetSink(outDir), fact, dims)

  /** Drop every named table through the sink — the reference's
    * `purge()` (task.py:170: DROP TABLE IF EXISTS over the five star
    * tables), for resetting a target before a clean re-load. Missing
    * tables are ignored, so purge is idempotent.
    */
  def purge(sink: TableSink, tables: Seq[String]): Unit =
    tables.foreach(sink.drop)
}

/** Board gate for the JDBC warehouse sink (SURVEY 12b — the last
  * sink verified only by suite). Companion to [[JdbcSink]].
  */
object JdbcGate {

  /** Gate `sink_jdbc`: the JDBC `to_sql` path board-verified END TO
    * END against a REAL database — a per-customer order rollup is
    * written through [[JdbcSink]] (per-partition connections, batch
    * inserts, Spark-derived DDL) into an embedded Derby warehouse,
    * OVERWRITTEN once more to prove replay idempotency, read back
    * over JDBC, and hashed against the plain DuckDB aggregate.
    * Lifecycle (create → load → overwrite → read → shutdown →
    * delete) lives inside the gate, like `sink_pgwire`.
    *
    * Derby is embedded (in-JVM), which is exactly wrong for a
    * 1000-executor cluster — there the same [[JdbcSink]] points at a
    * networked warehouse and nothing else changes (`sink_pgwire`
    * proves the networked path); embedded is what this environment
    * can verify hermetically, and the Spark side (connection-per-
    * partition write, schema-derived DDL, overwrite mode) is
    * identical either way.
    *
    * Output rides two constant verdict columns (`rewrite_stable`,
    * `purged_clean`) asserted in-gate: the overwrite must not
    * duplicate rows, and a post-read purge must really drop the
    * table (second purge a no-op per the idempotency contract).
    */
  def sinkGate(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_derby_gate")
    val url = s"jdbc:derby:$root/wh;create=true"
    val agg = graft.Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("cust_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .repartition(4) // connection-per-partition write — prove >1
    try {
      val sink = new JdbcSink(url, numPartitions = 4)
      StarSchemaSink.writeTo(sink, fact = ("cust_rollup", agg, Nil),
        dims = Nil)
      // replay: a re-run job overwrites, never appends
      sink.write("cust_rollup", agg, Nil)
      val props = new java.util.Properties
      val back = spark.read.jdbc(url, "cust_rollup", props)
        .select(col("cust_id").cast("long"), col("n").cast("long"),
          col("cents").cast("long"))
        .orderBy(col("cust_id"))
        .localCheckpoint(true)
      val expectedGroups = agg.count()
      require(back.count() == expectedGroups,
        s"sink_jdbc: overwrite not idempotent — ${back.count()} rows " +
          s"read back vs $expectedGroups groups written")
      // purge (task.py:170): really gone, and purging again is a no-op
      StarSchemaSink.purge(sink, Seq("cust_rollup", "never_written"))
      StarSchemaSink.purge(sink, Seq("cust_rollup"))
      val gone =
        try { spark.read.jdbc(url, "cust_rollup", props).count(); false }
        catch { case _: Exception => true }
      require(gone, "sink_jdbc: table still readable after purge")
      back.withColumn("rewrite_stable", lit(true))
        .withColumn("purged_clean", lit(true))
    } finally {
      // embedded Derby: a database shuts down via a sentinel connect
      // that always "fails" (SQLState 08006 on success)
      try java.sql.DriverManager.getConnection(s"jdbc:derby:$root/wh;shutdown=true")
      catch { case _: java.sql.SQLException => () }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }

  val sinkGateSql: String =
    """SELECT o_custkey AS cust_id, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS cents,
              true AS rewrite_stable, true AS purged_clean
       FROM orders GROUP BY 1 ORDER BY 1"""
}
