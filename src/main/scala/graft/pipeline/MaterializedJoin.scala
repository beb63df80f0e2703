package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a JOIN view under append-only deltas —
  * the IVM step above [[MaterializedAgg]]'s group-by refresh (the
  * classic delta algebra of Blakeley/Larson/Tompa, SIGMOD 1986):
  * for V = A ⋈ B and insert-only deltas ΔA, ΔB,
  *
  *   V′ = V ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * and the four arms are DISJOINT by construction — each output row's
  * (a-row, b-row) provenance is exactly one of (old,old), (new,old),
  * (old,new), (new,new) — so no dedup pass is needed. Cost is
  * O(|Δ| ⋈ …): the old A ⋈ B never recomputes, the two mixed arms
  * each put the DELTA on the small side (broadcast it when it fits),
  * which is the whole point at 100 TB — a nightly fact append never
  * re-touches the historical join.
  */
object MaterializedJoin {

  /** One refresh step: `v` is the current view (schema = the join's
    * output), the deltas are insert-only.
    */
  def refreshAppend(v: DataFrame, aOld: DataFrame, bOld: DataFrame,
      dA: DataFrame, dB: DataFrame, key: Seq[String]): DataFrame = {
    val cols = v.columns.map(col).toSeq
    v.unionByName(broadcast(dA).join(bOld, key).select(cols: _*))
      .unionByName(aOld.join(broadcast(dB), key).select(cols: _*))
      .unionByName(dA.join(dB, key).select(cols: _*))
  }

  /** Gate: maintain the orders ⋈ customer view across an append of
    * one fifth of orders AND one seventh of customers, then report a
    * per-nation census of the refreshed view. The oracle is the FULL
    * recompute over the complete tables — incremental ≡ recompute,
    * hash-exact. The initial view is built once from the "old"
    * slices; the refresh arms never touch it.
    */
  def mvJoinRefresh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_i"))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey")
    val aOld = orders.filter($"o_orderkey" % 5 =!= 0)
    val dA = orders.filter($"o_orderkey" % 5 === 0)
    val bOld = cust.filter($"c_custkey" % 7 =!= 0)
    val dB = cust.filter($"c_custkey" % 7 === 0)
    val key = Seq("c_custkey")
    val v0 = aOld.withColumnRenamed("o_custkey", "c_custkey")
      .join(bOld, key)
    val v1 = refreshAppend(v0,
      aOld.withColumnRenamed("o_custkey", "c_custkey"), bOld,
      dA.withColumnRenamed("o_custkey", "c_custkey"), dB, key)
    v1.groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_rows"),
        sum($"o_orderkey").as("okey_sum"),
        sum($"price_i").as("price_sum"))
      .orderBy($"c_nationkey")
  }

  val mvJoinRefreshSql: String =
    """SELECT c_nationkey,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(o_orderkey) AS BIGINT) AS okey_sum,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS price_sum
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_nationkey
       ORDER BY c_nationkey"""
}
