package graft

import graft.sources.{JdbcSink, StarSchemaSink}

/** JDBC warehouse load (the reference's literal to_sql target,
  * task.py:143) round-tripped through embedded Derby — schema
  * derivation, overwrite semantics, and batch insert all exercised
  * for real; only the database brand differs from the reference's
  * Postgres.
  */
class JdbcSinkSpec extends SparkSpec {

  test("star schema writes to a JDBC database and reads back intact") {
    import spark.implicits._
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby")
    val url = s"jdbc:derby:$dbDir/wh;create=true"

    val dim = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("id", "name")
    val fact = (1 to 50).map(i => (i.toLong, (i % 3 + 1).toLong, i * 1.5))
      .toDF("row_id", "dim_id", "amount")

    val locs = StarSchemaSink.writeTo(new JdbcSink(url, numPartitions = 2),
      fact = ("fact_amounts", fact, Nil),
      dims = Seq("dim_names" -> dim))
    assert(locs.keySet == Set("fact_amounts", "dim_names"))

    val dimBack = spark.read.jdbc(url, "dim_names", new java.util.Properties)
    val factBack = spark.read.jdbc(url, "fact_amounts", new java.util.Properties)
    assert(dimBack.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    assert(factBack.count() == 50)
    assert(factBack.agg(org.apache.spark.sql.functions.sum($"amount"))
      .collect()(0).getDouble(0) == (1 to 50).map(_ * 1.5).sum)

    // overwrite is idempotent (replay-safe, like the parquet lake)
    StarSchemaSink.writeTo(new JdbcSink(url, numPartitions = 2),
      fact = ("fact_amounts", fact, Nil), dims = Seq("dim_names" -> dim))
    assert(spark.read.jdbc(url, "fact_amounts", new java.util.Properties)
      .count() == 50)

    // purge (≙ task.py:170): drops both tables, ignores a never-
    // written one, and a second purge is a no-op — after which the
    // table is really gone (reading it must fail)
    val sink = new JdbcSink(url)
    StarSchemaSink.purge(sink, Seq("fact_amounts", "dim_names", "history"))
    StarSchemaSink.purge(sink, Seq("fact_amounts", "dim_names", "history"))
    intercept[Exception](
      spark.read.jdbc(url, "fact_amounts", new java.util.Properties).collect())
  }
}
