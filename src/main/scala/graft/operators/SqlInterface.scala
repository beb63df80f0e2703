package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ≙ task.py:182 `execute_sql` — the reference exposes its warehouse
  * to raw SQL; graft does the same through Spark SQL over the table
  * registry. The gate query runs [[passthroughSql]] VERBATIM on both
  * engines (Spark and the DuckDB oracle execute the identical
  * string), demonstrating ANSI-surface parity rather than a
  * hand-matched translation.
  */
object SqlInterface {

  val tables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  /** Register the star schema as temp views and run raw SQL. */
  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    tables.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
    spark.sql(sql)
  }

  /** Revenue by region/year — joins, group, having, order: the ANSI
    * subset both engines parse identically.
    */
  val passthroughSql: String =
    """SELECT r.r_name AS region, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
              count(*) AS n_orders,
              round(sum(o.o_totalprice), 2) AS revenue
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name, EXTRACT(YEAR FROM o.o_orderdate)
       HAVING count(*) > 5
       ORDER BY region, order_year"""

  def passthrough(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, passthroughSql)

  /** CTAS through the SQL surface — the DDL half of the reference's
    * `to_sql` load path spelled as a statement: CREATE TABLE … AS
    * SELECT materializes a managed parquet table in the session
    * warehouse, and the gate reads the TABLE back (not the query), so
    * catalog registration, the warehouse write, and the round trip
    * are all inside the verified surface. Integer cents keep the
    * aggregate hash-exact; the oracle is the inner SELECT.
    */
  val ctasInnerSql: String =
    """SELECT o_orderstatus AS status,
              CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS cents
       FROM orders GROUP BY o_orderstatus"""

  def ctas(spark: SparkSession, dir: String): DataFrame = {
    tables.foreach(t => Tables(spark, dir, t).createOrReplaceTempView(t))
    spark.sql("DROP TABLE IF EXISTS graft_ctas_status")
    spark.sql(s"CREATE TABLE graft_ctas_status USING parquet AS $ctasInnerSql")
    spark.table("graft_ctas_status").orderBy("status")
  }

  val ctasSql: String = ctasInnerSql + "\nORDER BY status"
}
