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
}
