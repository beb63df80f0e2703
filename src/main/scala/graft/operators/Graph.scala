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
    // node-count-sized; cached because it seeds the ranks AND joins
    // the edge list — uncached it would re-aggregate the edges twice
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one cached copy serves every iteration; the shuffle join on src
    // already leaves it hash-partitioned on src (an explicit
    // repartition here would be a second full exchange of the edge
    // list for the identical partitioning), and only scalar
    // (node, rank) rows move per step
    val e = edges.join(deg, "src")
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
    deg.unpersist(blocking = false)
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

  /** Per-node triangle participation over the co-purchase graph, top
    * 20. Enumeration is degree-ORIENTED (each undirected edge points
    * from its lower (degree, id) endpoint to the higher): every
    * triangle then has exactly one apex with two out-edges, so it is
    * found once, and wedge-generation work drops from the id-ordered
    * Σ |{a<b}|·|{c>b}| to Σ C(outdeg, 2) with outdeg ≤ √(2·|E|) —
    * the standard bound that keeps the wedge join feasible when a
    * hub node has 10⁶ neighbors at 100 TB (id-ordering would square
    * that hub; degree-ordering caps it). The oracle enumerates the
    * same triangle set in plain a<b<c id order — counts are
    * algorithm-independent, so the cheap spelling is exact there.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    trianglesOf(copurchaseEdges(spark, dir), topK = 20)

  def trianglesOf(edges: DataFrame, topK: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // edges feed the degree count AND the orientation join; oriented
    // feeds both wedge sides AND the closing semi-join — persist
    // each or the upstream edge-distinct recomputes three times
    // (measured 8.6 s → the persisted form below at sf0.1)
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
    // persisted pre-partitioned on the apex: the wedge self-join
    // below joins oriented⋈oriented on u, so caching the hash(u)
    // layout makes that join zero-exchange for BOTH sides (the last
    // orientation join leaves it on hash(dst), which would force two
    // fresh exchanges of the full oriented set)
    val oriented = e
      .join(deg.select($"src", $"deg".as("du")), "src")
      .join(deg.select($"src".as("dst"), $"deg".as("dv")), "dst")
      .filter($"du" < $"dv" || ($"du" === $"dv" && $"src" < $"dst"))
      .select($"src".as("u"), $"dst".as("v"), $"dv")
      .repartition($"u")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges from each apex's out-neighborhood, ordered within the
    // same (deg, id) total order so each unordered pair appears once
    val wedges = oriented.select($"u", $"v".as("v1"), $"dv".as("d1"))
      .join(oriented.select($"u", $"v".as("v2"), $"dv".as("d2")), "u")
      .filter($"d1" < $"d2" || ($"d1" === $"d2" && $"v1" < $"v2"))
      .select($"u", $"v1", $"v2")
    // (v1, v2) respects the orientation order, so the closing edge —
    // if it exists — is oriented v1→v2: one semi-join closes the wedge
    val tri = wedges.join(
      oriented.select($"u".as("v1"), $"v".as("v2")), Seq("v1", "v2"),
      "left_semi")
    val out = tri.select(explode(array($"u", $"v1", $"v2")).as("node"))
      .groupBy($"node")
      .agg(count(lit(1)).as("triangles"))
      .orderBy($"triangles".desc, $"node")
      .limit(topK)
      .localCheckpoint(true)
    oriented.unpersist(blocking = false)
    e.unpersist(blocking = false)
    out
  }

  /** Oracle: id-ordered a<b<c enumeration over the p1<p2 edge set. */
  val trianglesSql: String =
    """WITH pairs AS (
         SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       tri AS (
         SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
         FROM pairs e1
         JOIN pairs e2 ON e2.p1 = e1.p2
         JOIN pairs e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
       tnodes AS (
         SELECT a AS node FROM tri
         UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri)
       SELECT node, count(*) AS triangles
       FROM tnodes GROUP BY node
       ORDER BY triangles DESC, node LIMIT 20"""

  /** Min-hop BFS layers: nodes within `hops` hops of the seed set
    * (graph nodes whose id ≡ 0 mod 97), reported as one row per hop
    * (count + id checksum). Per hop the work is one frontier join
    * (shuffled on the edge partitioning, like the PageRank step) plus
    * one anti-join against the visited set — the distributed-BFS
    * minimum; the frontier is always the distinct NEW layer, so a
    * node is expanded exactly once no matter how many paths reach it
    * (work is O(|E reachable|) total, not O(paths), which is the
    * difference between BFS and path enumeration on a 100 TB graph).
    * The oracle unrolls the identical layers as chained CTEs — same
    * device as [[pageRankSql]].
    */
  def kHop(spark: SparkSession, dir: String): DataFrame =
    kHopOf(copurchaseEdges(spark, dir), seedMod = 97L, hops = 3)

  def kHopOf(edges: DataFrame, seedMod: Long, hops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.repartition($"src").persist(StorageLevel.MEMORY_AND_DISK)
    // each level is eagerly materialized (localCheckpoint): the next
    // level's lineage starts from the small (node, hop) set instead
    // of replaying every earlier frontier join — without this, level
    // h re-executes levels 1..h-1 and the BFS goes quadratic in jobs
    var frontier = e.select($"src".as("node")).distinct()
      .filter($"node" % seedMod === 0)
      .withColumn("hop", lit(0L))
      .localCheckpoint(true)
    var visited = frontier
    for (h <- 1 to hops) {
      frontier = e.join(frontier.select($"node"), $"src" === $"node")
        .select($"dst".as("node")).distinct()
        .join(visited.select($"node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(h.toLong))
        .localCheckpoint(true)
      visited = visited.unionByName(frontier)
    }
    val out = visited.groupBy($"hop")
      .agg(count(lit(1)).as("n"), sum($"node").as("node_sum"))
      .orderBy($"hop")
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    out
  }

  /** Oracle: the same BFS layers unrolled (h1..h3), NOT-IN for the
    * visited anti-joins.
    */
  val kHopSql: String =
    """WITH pairs AS (
         SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       edges AS (
         SELECT p1 AS src, p2 AS dst FROM pairs
         UNION ALL
         SELECT p2 AS src, p1 AS dst FROM pairs),
       h0 AS (
         SELECT DISTINCT src AS node FROM edges WHERE src % 97 = 0),
       h1 AS (
         SELECT DISTINCT e.dst AS node
         FROM edges e JOIN h0 ON e.src = h0.node
         WHERE e.dst NOT IN (SELECT node FROM h0)),
       h2 AS (
         SELECT DISTINCT e.dst AS node
         FROM edges e JOIN h1 ON e.src = h1.node
         WHERE e.dst NOT IN (SELECT node FROM h0 UNION ALL
                             SELECT node FROM h1)),
       h3 AS (
         SELECT DISTINCT e.dst AS node
         FROM edges e JOIN h2 ON e.src = h2.node
         WHERE e.dst NOT IN (SELECT node FROM h0 UNION ALL
                             SELECT node FROM h1 UNION ALL
                             SELECT node FROM h2)),
       layers AS (
         SELECT CAST(0 AS BIGINT) AS hop, node FROM h0
         UNION ALL SELECT 1, node FROM h1
         UNION ALL SELECT 2, node FROM h2
         UNION ALL SELECT 3, node FROM h3)
       SELECT hop, count(*) AS n, CAST(sum(node) AS BIGINT) AS node_sum
       FROM layers GROUP BY hop ORDER BY hop"""

  /** Weighted co-purchase edges: weight = co-purchase instance count
    * across orders (the same support semantics as
    * [[Analytics.basketPairs]], whose oracle self-join this mirrors),
    * emitted in both directions. Same Σ basket² map-side pair
    * generation — never a self-join on our side.
    */
  def copurchaseEdgesWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"l_partkey")).as("parts"))
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)),
                       y -> struct(x AS p1, y AS p2))))""")).as("pr"))
      .filter($"pr.p1" < $"pr.p2")
      .groupBy($"pr.p1".as("p1"), $"pr.p2".as("p2"))
      .agg(count(lit(1)).as("w"))
    pairs.select($"p1".as("src"), $"p2".as("dst"), $"w")
      .unionByName(pairs.select($"p2".as("src"), $"p1".as("dst"), $"w"))
  }

  /** Gate: 5 weighted integer-unit PageRank iterations, top 20. */
  def pageRankWeighted(spark: SparkSession, dir: String): DataFrame =
    pageRankWeightedOf(copurchaseEdgesWeighted(spark, dir), iters = 5, topK = 20)

  /** Weight-proportional PageRank: contribution = (rank·w) div Σ_out w,
    * all integer — bit-exact on any merge order, same exactness device
    * as [[pageRankOf]]. Long headroom: rank mass ≤ 10⁶·N micro-units,
    * so rank·w stays under 2⁶³ while N·max(w) < ~9·10¹² — e.g. 10⁹
    * nodes with weights to 10³; beyond that, rescale weights first.
    * Same plan shape as the unweighted form: edge list joined with
    * its out-weight once and cached hash-partitioned on src, only
    * (node, rank) scalars shuffle per iteration.
    */
  def pageRankWeightedOf(edges: DataFrame, iters: Int, topK: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val wout = edges.groupBy($"src").agg(sum($"w").as("wout"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = edges.join(wout, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = wout.select($"src".as("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      ranks = e.join(ranks, $"src" === $"node")
        .select($"dst", expr("(rank * w) div wout").as("contrib"))
        .groupBy($"dst")
        .agg(expr("150000L + (850L * sum(contrib)) div 1000L").as("rank"))
        .select($"dst".as("node"), $"rank")
    }
    val out = ranks.orderBy($"rank".desc, $"node").limit(topK)
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    wout.unpersist(blocking = false)
    out
  }

  /** Oracle: unrolled CTE chain, weights via the self-join count the
    * basket-pairs oracle already uses.
    */
  val pageRankWeightedSql: String = {
    val stages = (1 to 5).map { t =>
      s"""r$t AS (
            SELECT e.dst AS node,
                   CAST(150000 + (850 * sum((r.rank * e.w) // d.wout)) // 1000
                        AS BIGINT) AS rank
            FROM r${t - 1} r
            JOIN wout d ON r.node = d.src
            JOIN edges e ON e.src = r.node
            GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH pairs AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                 CAST(count(*) AS BIGINT) AS w
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        edges AS (
          SELECT p1 AS src, p2 AS dst, w FROM pairs
          UNION ALL
          SELECT p2 AS src, p1 AS dst, w FROM pairs),
        wout AS (
          SELECT src, CAST(sum(w) AS BIGINT) AS wout
          FROM edges GROUP BY src),
        r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM wout),
        $stages
        SELECT node, rank FROM r5 ORDER BY rank DESC, node LIMIT 20"""
  }

  /** Gate: connected components of the co-purchase graph, reported
    * as a per-component census (component = min part id in it).
    *
    * The iteration is [[Dedup.clusters]] — the same frontier-based
    * min-label propagation that clusters near-duplicate documents
    * runs unchanged on any undirected pair list, so components cost
    * zero new iterative machinery: per round only the still-improving
    * frontier joins the cached src-partitioned edges, labels converge
    * to the component-min in O(diameter) rounds, and each round's
    * lineage is truncated (localCheckpoint'd RDD) so round h never
    * replays rounds 1..h-1. The census then reduces the node-level
    * labels to |components| rows — nothing component-sized ever
    * crosses the driver.
    *
    * Oracle: recursive-CTE reachability closure (min reachable id) —
    * correct at the sf0.01 gate scale; the closure is O(n·|component|)
    * and exists only on the DuckDB side.
    */
  def components(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    componentsOf(copurchaseEdges(spark, dir).filter($"src" < $"dst"))
  }

  /** `pairs` must be one-directional (src < dst); [[Dedup.clusters]]
    * adds the reverse direction itself.
    */
  def componentsOf(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    Dedup.clusters(pairs, "src", "dst")
      .groupBy($"cluster_id".as("component"))
      .agg(count(lit(1)).as("n_nodes"), sum($"doc_id").as("node_sum"))
      .orderBy($"component")
  }

  /** Gate: degree-distribution census of the co-purchase graph — the
    * first diagnostic of any graph workload (hub detection, join
    * budget estimation: triangle work is Σ C(deg, 2)). Two nested
    * aggregations, the second over the |distinct degrees|-sized
    * frame; nothing node-sized crosses the driver.
    */
  def degrees(spark: SparkSession, dir: String): DataFrame =
    degreesOf(copurchaseEdges(spark, dir))

  def degreesOf(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges
      .groupBy($"src").agg(count(lit(1)).as("deg"))
      .groupBy($"deg")
      .agg(count(lit(1)).as("n_nodes"), sum($"src").as("node_sum"))
      .orderBy($"deg")
  }

  val degreesSql: String =
    """WITH pairs AS (
         SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       edges AS (
         SELECT p1 AS src, p2 AS dst FROM pairs
         UNION ALL
         SELECT p2 AS src, p1 AS dst FROM pairs),
       deg AS (
         SELECT src, CAST(count(*) AS BIGINT) AS deg
         FROM edges GROUP BY src)
       SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes,
              CAST(sum(src) AS BIGINT) AS node_sum
       FROM deg GROUP BY deg ORDER BY deg"""

  /** Gate: bounded-round weighted single-source shortest paths from
    * the seed set (part ids ≡ 0 mod 97), reported as a per-distance
    * census after 4 relaxation rounds.
    */
  def sssp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ssspDistsOf(copurchaseEdgesWeighted(spark, dir), seedMod = 97L, rounds = 4)
      .groupBy($"dist")
      .agg(count(lit(1)).as("n"), sum($"node").as("node_sum"))
      .orderBy($"dist")
  }

  /** Frontier Bellman-Ford: after round k, `dist(v)` = the exact
    * minimum path weight from the seed set using ≤ k edges — the
    * same fixpoint full k-round relaxation computes, because a node
    * whose distance did NOT improve in round k−1 would re-offer
    * candidates already offered then (the standard frontier
    * invariant), so only the improved set needs to propagate. All
    * integer, so min-combining is exact on any merge order.
    *
    * Scale shape: the weighted edge list is cached hash-partitioned
    * on src once; per round one frontier join on that partitioning +
    * one map-side-combined min per dst + one anti-join against the
    * node-sized distance map — only (node, dist) scalars shuffle,
    * and each round's lineage is truncated (same device as
    * [[kHopOf]]) so round k never replays rounds 1..k−1. Work is
    * O(|E touched by improvements|) per round, the distributed-SSSP
    * minimum; bounded rounds make the gate oracle-expressible
    * (unrolled CTEs), and unbounded SSSP is the same loop run to an
    * empty frontier.
    */
  def ssspDistsOf(edges: DataFrame, seedMod: Long, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.repartition($"src").persist(StorageLevel.MEMORY_AND_DISK)
    var dists = e.select($"src".as("node")).distinct()
      .filter($"node" % seedMod === 0)
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = dists
    for (_ <- 1 to rounds) {
      val cand = e.join(frontier, $"src" === $"node")
        .select($"dst", ($"dist" + $"w").as("cdist"))
        .groupBy($"dst").agg(min($"cdist").as("cdist"))
      val improved = cand.join(dists, $"dst" === $"node", "left_outer")
        .filter($"dist".isNull || $"cdist" < $"dist")
        .select($"dst".as("node"), $"cdist".as("dist"))
        .localCheckpoint(true)
      dists = dists
        .join(improved.select($"node".as("i_node")),
          $"node" === $"i_node", "left_anti")
        .unionByName(improved)
        .localCheckpoint(true)
      frontier = improved
    }
    e.unpersist(blocking = false)
    dists
  }

  /** Oracle: the identical 4 relaxation rounds unrolled — d_k(v) =
    * min(d_{k-1}(v), min over edges (d_{k-1}(u) + w)) — full
    * relaxation, which the frontier form provably equals.
    */
  val ssspSql: String = {
    val stages = (1 to 4).map { t =>
      s"""d$t AS (
            SELECT node, min(dist) AS dist FROM (
              SELECT node, dist FROM d${t - 1}
              UNION ALL
              SELECT e.dst AS node, d.dist + e.w AS dist
              FROM d${t - 1} d JOIN edges e ON e.src = d.node) u
            GROUP BY node)"""
    }.mkString(",\n")
    s"""WITH pairs AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                 CAST(count(*) AS BIGINT) AS w
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        edges AS (
          SELECT p1 AS src, p2 AS dst, w FROM pairs
          UNION ALL
          SELECT p2 AS src, p1 AS dst, w FROM pairs),
        d0 AS (
          SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
          FROM edges WHERE src % 97 = 0),
        $stages
        SELECT dist, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(node) AS BIGINT) AS node_sum
        FROM d4 GROUP BY dist ORDER BY dist"""
  }

  val componentsSql: String =
    """WITH RECURSIVE pairs AS (
         SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       und AS (
         SELECT p1 AS src, p2 AS dst FROM pairs
         UNION ALL
         SELECT p2 AS src, p1 AS dst FROM pairs),
       reach(id, r) AS (
         SELECT src, src FROM und
         UNION
         SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.id),
       labels AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
       SELECT component, CAST(count(*) AS BIGINT) AS n_nodes,
              CAST(sum(id) AS BIGINT) AS node_sum
       FROM labels GROUP BY component ORDER BY component"""

  /** Gate: neighborhood-Jaccard link prediction, top 20. */
  def neighborJaccard(spark: SparkSession, dir: String): DataFrame =
    neighborJaccardOf(copurchaseEdges(spark, dir), topK = 20)

  /** Link prediction by neighborhood Jaccard (Liben-Nowell & Kleinberg
    * 2003): score the NON-adjacent pairs (a, b) by
    * |N(a)∩N(b)| / |N(a)∪N(b)|, held exact in integer parts per
    * million — jac_ppm = (common·10⁶) div (deg(a)+deg(b)−common).
    * Common-neighbor counts come from apex-side wedge enumeration
    * (each shared neighbor c contributes the (a, b) pair once from
    * its own adjacency, a < b ordering dedups the unordered pair):
    * map-side generation per apex partition, then one partial-agg'd
    * count per pair. Unlike triangle counting, exact common-neighbor
    * counting is intrinsically Σ C(deg, 2) over apexes — degree
    * orientation cannot cap it because EVERY apex's wedges are the
    * payload, not a closure witness; [[degrees]] is the published
    * budget check (Σ C(deg,2) ≤ |E|·max-deg), and past that budget
    * the scalable relaxation is neighborhood MinHash
    * ([[MinHashLSH]] over adjacency lists), trading exactness for
    * linear sketches — the same valve the dedup family documents.
    * Candidates already adjacent are removed by one anti-join against
    * the oriented edge set; prediction = highest-scoring new links.
    */
  def neighborJaccardOf(edges: DataFrame, topK: Int,
      materialize: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    def cached(df: DataFrame): DataFrame =
      if (materialize) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    val e = cached(edges)
    val deg = cached(e.groupBy($"src").agg(count(lit(1)).as("deg")))
    // wedges around each apex: both directions are present, so the
    // apex's full neighborhood is its out-list; a < b emits each
    // unordered candidate pair once per shared neighbor. Generation
    // is the co-partitioned self-join (the triangles device): one
    // exchange lays the adjacency out on hash(src), both join sides
    // reuse it zero-exchange, and the a < b filter + pair packing run
    // inside whole-stage codegen — no per-apex C(deg,2) array ever
    // materializes (a 10⁶-wedge hub row would). Pairs travel PACKED
    // into one long (a·2³² + b — node ids must fit 32 bits, which
    // the part-key domain does by orders of magnitude): the
    // Σ C(deg,2) wedge stream is the dominant exchange, and a single
    // 8-byte primitive key more than halves its width vs a two-field
    // struct
    val nb = cached(e.repartition($"src"))
    if (materialize) nb.count()
    val common = nb.select($"src", $"dst".as("a"))
      .join(nb.select($"src", $"dst".as("b")), "src")
      .filter($"a" < $"b")
      .select(($"a" * lit(4294967296L) + $"b").as("pk"))
      .groupBy($"pk")
      .agg(count(lit(1)).as("common"))
      .select(expr("pk div 4294967296L").as("a"),
        ($"pk" % lit(4294967296L)).as("b"), $"common")
    val newLinks = common
      .join(e.select($"src".as("a"), $"dst".as("b")), Seq("a", "b"),
        "left_anti")
    val composed = newLinks
      .join(deg.select($"src".as("a"), $"deg".as("da")), "a")
      .join(deg.select($"src".as("b"), $"deg".as("db")), "b")
      .withColumn("jac_ppm",
        expr("(common * 1000000L) div (da + db - common)"))
      .select($"a", $"b", $"common", $"jac_ppm")
      .orderBy($"jac_ppm".desc, $"a", $"b")
      .limit(topK)
    if (!materialize) composed
    else {
      val out = composed.localCheckpoint(true)
      nb.unpersist(blocking = false)
      deg.unpersist(blocking = false)
      e.unpersist(blocking = false)
      out
    }
  }

  /** Oracle: wedge self-join per apex + NOT EXISTS against the edge
    * set — the textbook spelling of the same candidate algebra.
    */
  val neighborJaccardSql: String =
    """WITH pairs AS (
         SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       edges AS (
         SELECT p1 AS src, p2 AS dst FROM pairs
         UNION ALL
         SELECT p2 AS src, p1 AS dst FROM pairs),
       deg AS (
         SELECT src, CAST(count(*) AS BIGINT) AS deg
         FROM edges GROUP BY src),
       common AS (
         SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS common
         FROM edges e1 JOIN edges e2
           ON e1.src = e2.src AND e1.dst < e2.dst
         GROUP BY 1, 2),
       cand AS (
         SELECT a, b, common FROM common c
         WHERE NOT EXISTS (SELECT 1 FROM pairs p
                           WHERE p.p1 = c.a AND p.p2 = c.b))
       SELECT a, b, common,
              (common * 1000000) // (da.deg + db.deg - common) AS jac_ppm
       FROM cand
       JOIN deg da ON da.src = cand.a
       JOIN deg db ON db.src = cand.b
       ORDER BY jac_ppm DESC, a, b LIMIT 20"""
}
