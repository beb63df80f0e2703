package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hand-salting for skewed shuffle joins — the explicit fallback
  * when AQE's skew-join splitting can't apply (e.g. the skewed side
  * feeds an aggregation first, or the join is one AQE can't re-plan
  * mid-stage). Salting trades a `factor`× replication of the small
  * side for an even spread of a hot key's rows across `factor`
  * shuffle partitions.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with big's rows scattered
    * across `factor` sub-keys and small's rows replicated to all of
    * them. Result equals the plain join row-for-row.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `factor` null-padded copies of every
    // unmatched (replicated) small-side row — not the plain join
    val allowed = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin preserves semantics only for inner/left joins, got $joinType")
    // deterministic per-row salt: hash of the whole row, not rand()
    // (retries/speculative tasks must re-derive the same salt)
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.toSeq.map(col): _*), lit(factor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top-N heavy-hitter keys of `df` by count — the diagnosis step
    * that decides whether salting is worth the replication. Runs the
    * ss_topk SpaceSaving sketch (functions/HeavyHitters.scala): one
    * pass, O(capacity) memory per partition, and the shuffle moves
    * one sketch per partition instead of one row per distinct key —
    * the groupBy-count alternative shuffles the full key space, which
    * for a diagnosis query over a 100 TB skewed fact is itself the
    * skewed shuffle being diagnosed. Exact (err=0) whenever the
    * distinct-key count stays under `capacity`; otherwise `est`
    * over-counts by at most `err` and any key with true count >
    * N/capacity is guaranteed present — precisely the keys salting
    * decisions care about. Key must be BIGINT or STRING (ss_topk's
    * domain); columns: (key, est, err), est desc.
    */
  def heavyHitters(df: DataFrame, key: Column, topN: Int = 20,
      capacity: Int = 4096): DataFrame =
    df.agg(call_function("ss_topk", key, lit(topN), lit(capacity)).as("top"))
      .select(explode(col("top")).as("hh"))
      .select(col("hh.key").as("key"), col("hh.est").as("est"),
        col("hh.err").as("err"))

  /** Exact variant (full groupBy-count shuffle) — for when the key
    * space is known small or an audit demands exact counts.
    */
  def heavyHittersExact(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).count()
      .orderBy(col("count").desc, col("key"))
      .limit(topN)

  /** Gate: per-supplier revenue through [[saltedJoin]] (factor 8) —
    * the oracle states the PLAIN join, so the hash gate proves salt
    * scatter + replicate + drop is row-for-row invisible, with the
    * revenue summed in integer cents (order-free) so the equality is
    * exact, not approximate. The skew-relief property itself (8-way
    * split of a hot key's partition) is SkewSpec's job.
    */
  def saltedSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val big = graft.Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val small = graft.Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    saltedJoin(big, small, "suppkey", factor = 8)
      .groupBy(col("suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("cents")).cast("double") / 100.0, 2).as("revenue"))
      .orderBy(col("suppkey"))
  }

  val saltedSupplierRevenueSql: String =
    """SELECT s_suppkey AS suppkey, s_name,
              CAST(count(*) AS BIGINT) AS n_items,
              round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         AS DOUBLE) / 100.0, 2) AS revenue
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY 1, 2
       ORDER BY suppkey"""
}
