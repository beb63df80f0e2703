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
