package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over the part co-purchase graph (edges =
  * distinct within-order part pairs, both directions): integer-unit
  * PageRank (Page et al. 1999).
  *
  * Exactness device: ranks live in integer MICRO-UNITS (init 10⁶ per
  * node) and every step is integer arithmetic — contribution =
  * rank div outdeg, damping = 150000 + (850·Σcontrib) div 1000 — so
  * the fixpoint iteration is bit-exact on any engine and any
  * partition merge order (a double PageRank's sums would be
  * order-dependent, which no cross-engine oracle can promise). The
  * oracle unrolls the same five stages as chained CTEs: recursive
  * CTEs forbid aggregates in the recursive term, and an unrolled
  * plan is also exactly what Spark executes here.
  *
  * Scale shape: the edge list (joined with its out-degrees) is
  * cached pre-partitioned on src once; each iteration shuffles only
  * the (node, rank) scalars back to that partitioning plus the
  * Σcontrib aggregate — the per-iteration minimum for distributed
  * PageRank. Rank mass is ≤ 10⁶·N micro-units, so the 850·sum
  * intermediate stays within long range up to ~10¹⁰ nodes.
  */
object Graph {

  /** Distinct undirected co-purchase edges, emitted in both
    * directions, from sorted per-order baskets (same map-side
    * generation as [[Analytics.basketPairs]] — Σ basket², never a
    * self-join).
    */
  def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"l_partkey")).as("parts"))
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)),
                       y -> struct(x AS p1, y AS p2))))""")).as("pr"))
      .filter($"pr.p1" < $"pr.p2")
      .select($"pr.p1".as("p1"), $"pr.p2".as("p2"))
      .distinct()
    pairs.select($"p1".as("src"), $"p2".as("dst"))
      .unionByName(pairs.select($"p2".as("src"), $"p1".as("dst")))
  }

  /** Gate: 5 integer-unit PageRank iterations, top 20 parts. */
  def pageRank(spark: SparkSession, dir: String): DataFrame =
    pageRankOf(copurchaseEdges(spark, dir), iters = 5, topK = 20)

  def pageRankOf(edges: DataFrame, iters: Int, topK: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    // one cached, src-partitioned copy serves every iteration; only
    // scalar (node, rank) rows move per step
    val e = edges.join(deg, "src")
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = deg.select($"src".as("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      ranks = e.join(ranks, $"src" === $"node")
        .select($"dst", expr("rank div outdeg").as("contrib"))
        .groupBy($"dst")
        .agg(expr("150000L + (850L * sum(contrib)) div 1000L").as("rank"))
        .select($"dst".as("node"), $"rank")
    }
    // materialize (top-k rows only) before unpersisting the edges so
    // no consumer re-derives from an evicted cache; localCheckpoint
    // rather than cache() so repeated invocations don't alias each
    // other through the plan-keyed CacheManager (which would make any
    // run after the first read a 20-row cache — unrepresentative)
    val out = ranks.orderBy($"rank".desc, $"node").limit(topK)
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    out
  }

  /** Oracle: the identical five stages unrolled as chained CTEs. */
  val pageRankSql: String = {
    val stages = (1 to 5).map { t =>
      s"""r$t AS (
            SELECT e.dst AS node,
                   CAST(150000 + (850 * sum(r.rank // d.outdeg)) // 1000
                        AS BIGINT) AS rank
            FROM r${t - 1} r
            JOIN deg d ON r.node = d.src
            JOIN edges e ON e.src = r.node
            GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH pairs AS (
          SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges AS (
          SELECT p1 AS src, p2 AS dst FROM pairs
          UNION ALL
          SELECT p2 AS src, p1 AS dst FROM pairs),
        deg AS (
          SELECT src, CAST(count(*) AS BIGINT) AS outdeg
          FROM edges GROUP BY src),
        r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
        $stages
        SELECT node, rank FROM r5 ORDER BY rank DESC, node LIMIT 20"""
  }
}
