package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining classic decision-support query shapes (TPC-H Q13,
  * Q14, Q15, Q17, Q18, Q19, Q22, Q8 — the spec is public), adapted
  * to this corpus's columns. Together with Relational's Q1/Q3/Q5/Q7
  * and the subquery/lateral gates these close out the canonical
  * ad-hoc SQL surface a reference user would expect (reference:
  * queries.py runs arbitrary SQL via execute_sql, task.py:181).
  *
  * Money stays in the exact integer cents × basis-points device of
  * [[Relational.q5RegionRevenue]] so every gate hash-matches its
  * DuckDB oracle bit-for-bit. Each query's scale posture is noted
  * inline: which sides broadcast, which joins ride the keyed
  * shuffle, and why the shape survives 100 TB.
  */
object DecisionSupport {

  private def cents(c: String) =
    expr(s"CAST(round($c * 100) AS BIGINT)")

  /** Q13 (customer distribution): how many customers placed k
    * orders, INCLUDING k = 0 — the left-outer + conditional-join-
    * predicate shape. The join keys customer↔orders on custkey (a
    * keyed shuffle at 100 TB — a customer table is never broadcast-
    * able), the per-customer count partial-aggregates map-side, and
    * the final histogram groups on a domain-sized key (distinct
    * order counts), so the second exchange moves |distinct k| rows
    * per partition.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey")
    Tables.customer(spark, dir).select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_custkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13CustDistSql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
       FROM (SELECT c_custkey,
                    CAST(count(o_custkey) AS BIGINT) AS c_count
             FROM customer
             LEFT JOIN orders ON c_custkey = o_custkey
                             AND o_orderpriority <> '1-URGENT'
             GROUP BY c_custkey)
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC"""

  /** Q14 (promo effect): revenue from PROMO-type parts vs all
    * revenue in one month — the conditional-aggregate-over-a-join
    * shape. Part is the broadcast dim; lineitem is date-pruned at
    * the scan (PushedFilters carries the shipdate range). Emits the
    * two exact integer sums instead of the spec's ratio — a ratio of
    * 10^16-scale integers would overflow the cross-multiplication at
    * larger SFs, and the two sums carry strictly more information.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String,
      from: String = "1996-03-01", until: String = "1996-04-01"): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir).select($"p_partkey", $"p_type")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= from && $"l_shipdate" < until)
      .select($"l_partkey", cents("l_extendedprice").as("pc"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)").as("db"))
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", expr("pc * (10000L - db)"))
          .otherwise(0L)).as("promo_i"),
        sum(expr("pc * (10000L - db)")).as("total_i"))
  }

  def q14PromoRevenueSql(from: String = "1996-03-01",
      until: String = "1996-04-01"): String =
    s"""SELECT
         CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN pc * (10000 - db) ELSE 0 END) AS BIGINT)
           AS promo_i,
         CAST(sum(pc * (10000 - db)) AS BIGINT) AS total_i
       FROM (SELECT l_partkey,
                    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                    CAST(round(l_discount * 10000) AS BIGINT) AS db
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '$from'
               AND l_shipdate < TIMESTAMP '$until')
       JOIN part ON l_partkey = p_partkey"""

  /** Q15 (top supplier): suppliers whose quarter revenue equals the
    * global maximum — the aggregate + scalar-max-subquery shape. The
    * per-supplier revenue aggregate shuffles once on suppkey; the
    * max is a one-row frame joined back by broadcast (never a
    * global sort, never an unpartitioned window), so the plan is
    * agg → one-row broadcast → filter at any scale.
    */
  def q15TopSupplier(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= from && $"l_shipdate" < until)
      .groupBy($"l_suppkey")
      .agg(sum(cents("l_extendedprice") *
        (lit(10000L) - expr("CAST(round(l_discount * 10000) AS BIGINT)")))
        .as("rev_i"))
    val top = rev.agg(max($"rev_i").as("max_rev"))
    rev.join(broadcast(top), $"rev_i" === $"max_rev")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"rev_i")
      .orderBy($"s_suppkey")
  }

  def q15TopSupplierSql(from: String = "1996-01-01",
      until: String = "1996-04-01"): String =
    s"""WITH rev AS (
         SELECT l_suppkey,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
                  AS BIGINT) AS rev_i
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '$from'
           AND l_shipdate < TIMESTAMP '$until'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, rev_i
       FROM rev JOIN supplier ON l_suppkey = s_suppkey
       WHERE rev_i = (SELECT max(rev_i) FROM rev)
       ORDER BY s_suppkey"""

  /** Q17 (small-quantity order revenue): lineitems of a part-type
    * cut whose quantity is below 20% of that part's average — the
    * correlated-average shape. The per-part average joins back to
    * the SAME scan's rows, both sides shuffled on partkey (at
    * 100 TB the stats side is |parts-in-cut| rows — broadcast-able
    * after the cut, but keyed-shuffle-safe without assuming it).
    * The 0.2·avg comparison cross-multiplies to stay integral:
    * qty·5·cnt < Σqty. Output is the exact cents total and the
    * spec's avg_yearly as an integer div 7.
    */
  def q17SmallQty(spark: SparkSession, dir: String,
      ptype: String = "ECONOMY"): DataFrame = {
    import spark.implicits._
    val cut = Tables.part(spark, dir)
      .filter($"p_type" === ptype)
      .select($"p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(cut), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", expr("CAST(l_quantity AS BIGINT)").as("q_i"),
        cents("l_extendedprice").as("pc"))
    val stats = li.groupBy($"l_partkey".as("sp"))
      .agg(sum($"q_i").as("sum_q"), count(lit(1)).as("cnt"))
    li.join(stats, $"l_partkey" === $"sp")
      .filter($"q_i" * lit(5L) * $"cnt" < $"sum_q")
      .agg(sum($"pc").as("total_c"), count(lit(1)).as("n_lines"))
      .select($"total_c", expr("total_c div 7").as("avg_yearly_c"), $"n_lines")
  }

  def q17SmallQtySql(ptype: String = "ECONOMY"): String =
    s"""WITH li AS (
         SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q_i,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_type = '$ptype'),
       stats AS (
         SELECT l_partkey AS sp, CAST(sum(q_i) AS BIGINT) AS sum_q,
                CAST(count(*) AS BIGINT) AS cnt
         FROM li GROUP BY l_partkey)
       SELECT CAST(sum(pc) AS BIGINT) AS total_c,
              CAST(sum(pc) AS BIGINT) // 7 AS avg_yearly_c,
              CAST(count(*) AS BIGINT) AS n_lines
       FROM li JOIN stats ON l_partkey = sp
       WHERE q_i * 5 * cnt < sum_q"""

  /** Q18 (large-volume orders): orders whose total quantity clears a
    * threshold, with their customer — the having-over-groupBy +
    * join-back shape. The qty rollup shuffles lineitem once on
    * orderkey; survivors (a p99 tail) then join orders and customer
    * on their keys. At 100 TB the survivor side is small enough that
    * AQE converts those joins to broadcasts at runtime — the code
    * doesn't have to guess.
    */
  def q18LargeVolume(spark: SparkSession, dir: String,
      minQty: Long = 250L): DataFrame = {
    import spark.implicits._
    val vol = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_qty"))
      .filter($"sum_qty" > minQty)
    vol.join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"),
        cents("o_totalprice").as("price_c"), $"sum_qty")
      .orderBy($"price_c".desc, $"o_orderkey")
      .limit(100)
  }

  def q18LargeVolumeSql(minQty: Long = 250L): String =
    s"""SELECT c_name, c_custkey, o_orderkey,
              strftime(o_orderdate, '%Y-%m-%d') AS o_date,
              CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
              sum_qty
       FROM (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING sum(CAST(l_quantity AS BIGINT)) > $minQty)
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       ORDER BY price_c DESC, o_orderkey
       LIMIT 100"""

  /** Q19 (disjunctive predicate revenue): revenue over an OR of
    * three (brand × size-band × quantity-band) branches — the shape
    * that exercises disjunction handling. The part side broadcasts
    * pre-filtered to the UNION of the three brand cuts (the
    * disjunction's common support), so the stream side never carries
    * rows no branch can accept; the final OR applies post-join where
    * both sides' columns are in scope.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir)
      .filter($"p_brand".isin("Brand#2", "Brand#12", "Brand#22"))
      .select($"p_partkey", $"p_brand", $"p_size")
    val branch =
      ($"p_brand" === "Brand#2" && $"p_size".between(1, 15) &&
        $"q_i".between(1L, 15L)) ||
      ($"p_brand" === "Brand#12" && $"p_size".between(10, 30) &&
        $"q_i".between(10L, 25L)) ||
      ($"p_brand" === "Brand#22" && $"p_size".between(20, 50) &&
        $"q_i".between(20L, 40L))
    Tables.lineitem(spark, dir)
      .select($"l_partkey", expr("CAST(l_quantity AS BIGINT)").as("q_i"),
        cents("l_extendedprice").as("pc"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)").as("db"))
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .filter(branch)
      .agg(sum(expr("pc * (10000L - db)")).as("revenue_i"),
        count(lit(1)).as("n_lines"))
  }

  val q19DisjunctiveSql: String =
    """SELECT CAST(sum(pc * (10000 - db)) AS BIGINT) AS revenue_i,
              CAST(count(*) AS BIGINT) AS n_lines
       FROM (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q_i,
                    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                    CAST(round(l_discount * 10000) AS BIGINT) AS db
             FROM lineitem)
       JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1  AND 15
              AND q_i BETWEEN 1  AND 15)
          OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
              AND q_i BETWEEN 10 AND 25)
          OR (p_brand = 'Brand#22' AND p_size BETWEEN 20 AND 50
              AND q_i BETWEEN 20 AND 40)"""

  /** Q22 (idle high-balance customers): customers with an
    * above-average positive balance and NO recent orders, grouped by
    * market segment — the global-scalar-threshold + anti-join shape.
    * The positive-balance average is a one-row aggregate broadcast
    * back (the comparison cross-multiplies: bal·n > Σbal, exact in
    * cents); the "no recent orders" cut is a LEFT ANTI join on
    * custkey (keyed shuffle at scale — never a NOT IN materialized
    * list). Reference analog: the validation anti-joins of
    * queries.py:40-51 composed with a scalar subquery.
    */
  def q22IdleBalance(spark: SparkSession, dir: String,
      since: String = "1999-01-01"): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", cents("c_acctbal").as("bal_c"))
    val avgPos = cust.filter($"bal_c" > 0L)
      .agg(sum($"bal_c").as("sum_pos"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= since)
      .select($"o_custkey")
    cust.crossJoin(broadcast(avgPos))
      .filter($"bal_c" * $"n_pos" > $"sum_pos")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), sum($"bal_c").as("bal_sum_c"))
      .orderBy($"c_mktsegment")
  }

  def q22IdleBalanceSql(since: String = "1999-01-01"): String =
    s"""WITH cust AS (
         SELECT c_custkey, c_mktsegment,
                CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
         FROM customer),
       avgpos AS (
         SELECT CAST(sum(bal_c) AS BIGINT) AS sum_pos,
                CAST(count(*) AS BIGINT) AS n_pos
         FROM cust WHERE bal_c > 0)
       SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
              CAST(sum(bal_c) AS BIGINT) AS bal_sum_c
       FROM cust, avgpos
       WHERE bal_c * n_pos > sum_pos
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '$since')
       GROUP BY c_mktsegment
       ORDER BY c_mktsegment"""

  /** Q8 (market share): of the revenue that customers in one REGION
    * generated, the share supplied by one NATION, per order year —
    * the two-sums-per-group shape over a 5-way join. Nation/region
    * dims broadcast; orders↔customer and lineitem↔orders ride keyed
    * shuffles (at 100 TB neither side of those is broadcast-able).
    * Emits numerator and denominator as exact integers per year —
    * the division is the caller's presentation concern.
    */
  def q8MarketShare(spark: SparkSession, dir: String,
      region: String = "AMERICA", nation: String = "NATION_3"): DataFrame = {
    import spark.implicits._
    val regNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter($"r_name" === region)), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(regNations), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter($"n_name" === nation)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val ord = Tables.orders(spark, dir)
      .join(cust, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", year($"o_orderdate").cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey",
        (cents("l_extendedprice") *
          (lit(10000L) - expr("CAST(round(l_discount * 10000) AS BIGINT)")))
          .as("vol"))
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(suppNation.withColumn("is_nat", lit(1L))),
        $"l_suppkey" === $"s_suppkey", "left")
      .groupBy($"o_year")
      .agg(sum(when($"is_nat" === 1L, $"vol").otherwise(0L)).as("nation_i"),
        sum($"vol").as("total_i"))
      .orderBy($"o_year")
  }

  def q8MarketShareSql(region: String = "AMERICA",
      nation: String = "NATION_3"): String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
              CAST(sum(CASE WHEN sn.s_suppkey IS NOT NULL THEN vol ELSE 0 END)
                AS BIGINT) AS nation_i,
              CAST(sum(vol) AS BIGINT) AS total_i
       FROM (SELECT l_orderkey, l_suppkey,
                    CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000) AS BIGINT)) AS vol
             FROM lineitem) li
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
       JOIN region   ON cn.n_regionkey = r_regionkey
       LEFT JOIN (SELECT s_suppkey FROM supplier
                  JOIN nation ON s_nationkey = n_nationkey
                  WHERE n_name = '$nation') sn
              ON li.l_suppkey = sn.s_suppkey
       WHERE r_name = '$region'
       GROUP BY year(o_orderdate)
       ORDER BY o_year"""

  /** Q6 (forecasting revenue change): one-table scan-aggregate over
    * a date window, a discount band, and a quantity cut — the purest
    * pushdown shape in the suite. Every predicate reaches the
    * parquet scan (`PushedFilters` carries all four bounds), the
    * projection is two columns, and the whole query is one map-side
    * partial aggregate plus a one-row exchange — no join, no
    * wide shuffle at any SF. Discount stays in exact basis points.
    */
  def q6RevenueBand(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1997-01-01",
      dbLo: Long = 500L, dbHi: Long = 700L, qtyMax: Long = 24L): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= from && $"l_shipdate" < until)
      .select(cents("l_extendedprice").as("pc"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)").as("db"),
        expr("CAST(l_quantity AS BIGINT)").as("q_i"))
      .filter($"db".between(dbLo, dbHi) && $"q_i" < qtyMax)
      .agg(sum($"pc" * $"db").as("revenue_i"),
        count(lit(1)).as("n_lines"))
  }

  def q6RevenueBandSql(from: String = "1996-01-01",
      until: String = "1997-01-01", dbLo: Long = 500L, dbHi: Long = 700L,
      qtyMax: Long = 24L): String =
    s"""SELECT CAST(sum(pc * db) AS BIGINT) AS revenue_i,
              CAST(count(*) AS BIGINT) AS n_lines
       FROM (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                    CAST(round(l_discount * 10000) AS BIGINT) AS db,
                    CAST(l_quantity AS BIGINT) AS q_i
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '$from'
               AND l_shipdate < TIMESTAMP '$until')
       WHERE db BETWEEN $dbLo AND $dbHi AND q_i < $qtyMax"""

  /** Q4 (order-priority checking): orders in one quarter with at
    * least one lineitem shipped more than `lateDays` after the order
    * date, counted per priority — the EXISTS-decorrelated-to-semi-
    * join shape. This corpus has no commit/receipt dates, so
    * lateness is ship-vs-order (same shape, same join). The orders
    * scan is date-pruned; the semi-join rides a keyed shuffle on
    * orderkey (at 100 TB neither side broadcasts) and emits each
    * order AT MOST ONCE regardless of how many lines are late — the
    * property an inner join + distinct would pay an extra exchange
    * for; the final census groups on the 5-value priority domain.
    */
  def q4LatePriority(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01",
      lateDays: Int = 90): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= from && $"o_orderdate" < until)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_shipdate")
    ord.join(li, $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  def q4LatePrioritySql(from: String = "1996-01-01",
      until: String = "1996-04-01", lateDays: Int = 90): String =
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '$from'
         AND o_orderdate < TIMESTAMP '$until'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate
                                        + INTERVAL $lateDays DAY)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** Q10 (returned-item reporting): the top customers by revenue
    * lost to returns in one quarter — the 4-way join + top-k shape.
    * Nation broadcasts; customer↔orders and orders↔lineitem ride
    * keyed shuffles. The top-k is an orderBy+limit over the
    * per-customer aggregate (Spark plans TakeOrderedAndProject —
    * each partition keeps k rows, the driver merges |parts|·k, never
    * a global sort); custkey breaks revenue ties so LIMIT is
    * deterministic.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String,
      from: String = "1997-01-01", until: String = "1997-04-01",
      k: Int = 20): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= from && $"o_orderdate" < until)
      .select($"o_orderkey", $"o_custkey")
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        (cents("l_extendedprice") *
          (lit(10000L) - expr("CAST(round(l_discount * 10000) AS BIGINT)")))
          .as("vol"))
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey").agg(sum($"vol").as("revenue_i"))
    rev.join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name", $"revenue_i",
        cents("c_acctbal").as("acctbal_c"))
      .orderBy($"revenue_i".desc, $"c_custkey")
      .limit(k)
  }

  def q10ReturnedItemsSql(from: String = "1997-01-01",
      until: String = "1997-04-01", k: Int = 20): String =
    s"""SELECT c_custkey, c_name, n_name,
              CAST(sum(vol) AS BIGINT) AS revenue_i,
              CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
       FROM (SELECT l_orderkey,
                    CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000) AS BIGINT)) AS vol
             FROM lineitem WHERE l_returnflag = 'R')
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       WHERE o_orderdate >= TIMESTAMP '$from'
         AND o_orderdate < TIMESTAMP '$until'
       GROUP BY c_custkey, c_name, n_name, c_acctbal
       ORDER BY revenue_i DESC, c_custkey
       LIMIT $k"""

  /** Q2 (minimum-cost supplier): for each part in a type/size cut,
    * the supplier(s) achieving the minimum observed unit price — the
    * correlated-scalar-min shape, decorrelated into a per-part min
    * aggregate joined back by equality. No partsupp table exists in
    * this corpus, so the supply relation is read off lineitem (the
    * per-line price stands in for ps_supplycost; min total cents per
    * part-supplier pair, then the per-part min of those). Both the
    * stats side and the detail side shuffle once on partkey and the
    * join back is co-partitioned; part is the broadcast dim. Output
    * ordered by supplier balance DESC as the spec does, with full
    * key tie-breaks so the frame is deterministic.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String,
      ptype: String = "LARGE", sizeLo: Int = 10, sizeHi: Int = 30): DataFrame = {
    import spark.implicits._
    val partCut = Tables.part(spark, dir)
      .filter($"p_type" === ptype && $"p_size".between(sizeLo, sizeHi))
      .select($"p_partkey", $"p_name", $"p_size")
    val supply = Tables.lineitem(spark, dir)
      .join(broadcast(partCut), $"l_partkey" === $"p_partkey")
      .groupBy($"p_partkey", $"p_name", $"p_size", $"l_suppkey")
      .agg(min(cents("l_extendedprice")).as("cost_c"))
    val minCost = supply.groupBy($"p_partkey".as("mk"))
      .agg(min($"cost_c").as("min_c"))
    supply
      .join(minCost, $"p_partkey" === $"mk" && $"cost_c" === $"min_c")
      .join(broadcast(Tables.supplier(spark, dir)),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"s_nationkey" === $"n_nationkey")
      .select(cents("s_acctbal").as("s_bal_c"), $"s_name", $"n_name",
        $"p_partkey", $"p_name", $"p_size", $"cost_c")
      .orderBy($"s_bal_c".desc, $"n_name", $"s_name", $"p_partkey")
  }

  def q2MinCostSupplierSql(ptype: String = "LARGE", sizeLo: Int = 10,
      sizeHi: Int = 30): String =
    s"""WITH supply AS (
         SELECT p_partkey, p_name, p_size, l_suppkey,
                CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cost_c
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         WHERE p_type = '$ptype' AND p_size BETWEEN $sizeLo AND $sizeHi
         GROUP BY p_partkey, p_name, p_size, l_suppkey)
       SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS s_bal_c,
              s_name, n_name, p_partkey, p_name, p_size, cost_c
       FROM supply
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation   ON s_nationkey = n_nationkey
       WHERE cost_c = (SELECT min(cost_c) FROM supply s2
                       WHERE s2.p_partkey = supply.p_partkey)
       ORDER BY s_bal_c DESC, n_name, s_name, p_partkey"""

  /** Q21 (suppliers who kept orders waiting): suppliers whose line
    * was late on a multi-supplier order where NO other supplier was
    * late — the spec's double EXISTS / NOT-EXISTS self-join,
    * re-planned as a co-partitioned two-level aggregation: one
    * shuffle on orderkey builds the (order, supplier, late) frame,
    * the per-order supplier/late census reuses that partitioning,
    * and the sole-late filter is a row predicate — three correlated
    * self-joins become zero extra exchanges, which is the difference
    * between one pass and three sort-merge joins over the fact table
    * at 100 TB. The oracle deliberately keeps the textbook
    * EXISTS/NOT-EXISTS spelling so DuckDB cross-checks the rewrite.
    */
  def q21SoleLateSupplier(spark: SparkSession, dir: String,
      lateDays: Int = 90): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val os = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max(when($"l_shipdate" > $"o_orderdate" +
        expr(s"INTERVAL $lateDays DAYS"), 1L).otherwise(0L)).as("late"))
    val census = os.groupBy($"l_orderkey".as("ok"))
      .agg(count(lit(1)).as("n_supp"), sum($"late").as("n_late"))
    os.join(census, $"l_orderkey" === $"ok")
      .filter($"late" === 1L && $"n_supp" > 1L && $"n_late" === 1L)
      .join(broadcast(Tables.supplier(spark, dir)),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  /** Q12 (shipping modes and order priority): per "mode", count
    * high-priority vs low-priority orders among late-shipped lines —
    * the conditional-census-after-join shape, the last partsupp-free
    * TPC-H query. This corpus has no l_shipmode / commit / receipt
    * dates, so the mode dimension is l_linestatus and lateness is
    * ship-vs-order (the Q4 adaptation). Scale: the lineitem scan is
    * date-pruned before the keyed orderkey shuffle (neither side of
    * lineitem↔orders broadcasts at 100 TB), both CASE-counts
    * partial-aggregate map-side, and the final exchange carries
    * |distinct linestatus| rows per partition.
    */
  def q12ShipmodePriority(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1997-01-01",
      lateDays: Int = 60): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= from && $"l_shipdate" < until)
      .select($"l_orderkey", $"l_shipdate", $"l_linestatus")
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    li.join(ord, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"o_orderpriority" === "1-URGENT" ||
          $"o_orderpriority" === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when($"o_orderpriority" =!= "1-URGENT" &&
          $"o_orderpriority" =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  def q12ShipmodePrioritySql(from: String = "1996-01-01",
      until: String = "1997-01-01", lateDays: Int = 60): String =
    s"""SELECT l_linestatus,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '$from'
         AND l_shipdate < TIMESTAMP '$until'
         AND l_shipdate > o_orderdate + INTERVAL $lateDays DAY
       GROUP BY l_linestatus
       ORDER BY l_linestatus"""

  def q21SoleLateSupplierSql(lateDays: Int = 90): String =
    s"""WITH os AS (
         SELECT l_orderkey, l_suppkey,
                CAST(max(CASE WHEN l_shipdate > o_orderdate
                                   + INTERVAL $lateDays DAY
                              THEN 1 ELSE 0 END) AS BIGINT) AS late
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'
         GROUP BY l_orderkey, l_suppkey)
       SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM os l1
       JOIN supplier ON l1.l_suppkey = s_suppkey
       WHERE l1.late = 1
         AND EXISTS (SELECT 1 FROM os l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM os l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.late = 1)
       GROUP BY s_name
       ORDER BY numwait DESC, s_name"""

  /** Q9 (product-type profit measure) — profit per supplier nation
    * and ship year over a part-name cut. No partsupp exists in this
    * corpus, so unit supply cost is the documented stand-in
    * 60% of p_retailprice (a fixed rational — the shape, the
    * two-dim broadcast join tree, and the nation×year rollup are
    * Q9's; only the cost column is adapted, as q2 adapts
    * ps_supplycost). Exact integer units of 10⁻² cents:
    * profit_u = price_c·(100−d_pct) − 60·qty·retail_c, all BIGINT;
    * the display division happens once. Plan: lineitem joins two
    * BROADCAST dims (part cut, supplier→nation) — zero shuffles
    * before the (nation, year) hash aggregate, partial map-side.
    */
  def q9ProfitShape(spark: SparkSession, dir: String,
      nameToken: String = "widget"): DataFrame = {
    import spark.implicits._
    val partCut = Tables.part(spark, dir)
      .filter($"p_name".contains(nameToken))
      .select($"p_partkey", cents("p_retailprice").as("retail_c"))
    val supNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(partCut), $"l_partkey" === $"p_partkey")
      .join(broadcast(supNation), $"l_suppkey" === $"s_suppkey")
      .select($"nation", year($"l_shipdate").cast("long").as("o_year"),
        (cents("l_extendedprice")
          * (lit(100L) - round($"l_discount" * 100).cast("long"))
          - lit(60L) * round($"l_quantity").cast("long") * $"retail_c")
          .as("profit_u"))
      .groupBy($"nation", $"o_year")
      .agg(sum($"profit_u").as("profit_u"))
      .select($"nation", $"o_year", $"profit_u",
        round($"profit_u".cast("double") / 1.0e4, 2).as("profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  def q9ProfitShapeSql(nameToken: String = "widget"): String =
    s"""SELECT nation, o_year, CAST(sum(profit_u) AS BIGINT) AS profit_u,
               round(CAST(sum(profit_u) AS DOUBLE) / 10000.0, 2) AS profit
        FROM (
          SELECT n.n_name AS nation,
                 CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
                 CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                 - 60 * CAST(round(l.l_quantity) AS BIGINT)
                   * CAST(round(p.p_retailprice * 100) AS BIGINT)
                   AS profit_u
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          WHERE p.p_name LIKE '%$nameToken%')
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC"""

  /** Q11 (important stock identification) — the parts whose supplied
    * value inside ONE nation exceeds a fixed fraction of that
    * nation's total supplied value. partsupp's availqty·supplycost
    * is adapted to Σ lineitem extendedprice (the value actually
    * moved), the fraction test is CROSS-MULTIPLIED integer
    * (value_c·frac_den > total_c — no fp threshold), and the
    * one-row nation total broadcasts back (the q15 device). Plan:
    * one shuffle on partkey inside the nation slice.
    */
  def q11ImportantParts(spark: SparkSession, dir: String,
      nationName: String = "NATION_7", fracDen: Long = 2000L): DataFrame = {
    import spark.implicits._
    val supIn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter($"n_name" === nationName)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val vals = Tables.lineitem(spark, dir)
      .join(broadcast(supIn), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(sum(cents("l_extendedprice")).as("value_c"))
    val tot = vals.agg(sum($"value_c").as("total_c"))
    vals.crossJoin(broadcast(tot))
      .filter($"value_c" * fracDen > $"total_c")
      .select($"l_partkey", $"value_c")
      .orderBy($"value_c".desc, $"l_partkey")
  }

  def q11ImportantPartsSql(nationName: String = "NATION_7",
      fracDen: Long = 2000L): String =
    s"""WITH vals AS (
          SELECT l_partkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS value_c
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
          WHERE n_name = '$nationName'
          GROUP BY l_partkey),
        tot AS (SELECT CAST(sum(value_c) AS BIGINT) AS total_c FROM vals)
        SELECT l_partkey, value_c
        FROM vals CROSS JOIN tot
        WHERE value_c * $fracDen > total_c
        ORDER BY value_c DESC, l_partkey"""

  /** Q16 (parts/supplier relationship census) — distinct suppliers
    * per (brand, type, size) over a negated part cut, excluding
    * flagged suppliers. The spec's comment-LIKE complaint filter has
    * no comment column here; the documented stand-in flag is a
    * NEGATIVE account balance. The exclusion is a broadcast
    * anti-join BEFORE the distinct aggregation, the count-distinct
    * is one partial-agg'd exchange on the group key.
    */
  def q16SupplierCensus(spark: SparkSession, dir: String,
      excludeBrand: String = "Brand#1", excludeType: String = "PROMO")
      : DataFrame = {
    import spark.implicits._
    val partCut = Tables.part(spark, dir)
      .filter($"p_brand" =!= excludeBrand &&
        !$"p_type".startsWith(excludeType))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val flagged = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey".as("l_suppkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(partCut), $"l_partkey" === $"p_partkey")
      .join(broadcast(flagged), Seq("l_suppkey"), "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  def q16SupplierCensusSql(excludeBrand: String = "Brand#1",
      excludeType: String = "PROMO"): String =
    s"""SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> '$excludeBrand'
          AND p_type NOT LIKE '$excludeType%'
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q20 (potential part promotion) — suppliers in one nation who
    * DOMINATE the supply of some name-cut part in a ship year:
    * partsupp's `availqty > ½·Σ qty` becomes `supplier's qty share
    * > ½ of the part's total` (cross-multiplied integers, 2·own >
    * total). Q20's nested-IN chain is the same semi-join ladder:
    * qualifying (supplier, part) pairs → DISTINCT suppliers →
    * broadcast semi-join into the supplier dim. One partkey-grouped
    * aggregate + a broadcast total join; no pair blow-up anywhere.
    */
  def q20ExcessSuppliers(spark: SparkSession, dir: String,
      nameToken: String = "widget", shipYear: Int = 1997,
      nationName: String = "NATION_3"): DataFrame = {
    import spark.implicits._
    val partCut = Tables.part(spark, dir)
      .filter($"p_name".contains(nameToken)).select($"p_partkey")
    val qty = Tables.lineitem(spark, dir)
      .filter(year($"l_shipdate") === shipYear)
      .join(broadcast(partCut), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(round($"l_quantity").cast("long")).as("own_q"))
    val totals = qty.groupBy($"l_partkey".as("tk"))
      .agg(sum($"own_q").as("tot_q"))
    val dominant = qty
      .join(totals, $"l_partkey" === $"tk")
      .filter(lit(2L) * $"own_q" > $"tot_q")
      .select($"l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter($"n_name" === nationName)),
        $"s_nationkey" === $"n_nationkey")
      .join(broadcast(dominant), $"s_suppkey" === $"l_suppkey")
      .select($"s_name", cents("s_acctbal").as("s_bal_c"))
      .orderBy($"s_name")
  }

  def q20ExcessSuppliersSql(nameToken: String = "widget",
      shipYear: Int = 1997, nationName: String = "NATION_3"): String =
    s"""WITH qty AS (
          SELECT l_partkey, l_suppkey,
                 CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS own_q
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          WHERE year(l_shipdate) = $shipYear
            AND p_name LIKE '%$nameToken%'
          GROUP BY 1, 2),
        tot AS (SELECT l_partkey, CAST(sum(own_q) AS BIGINT) AS tot_q
                FROM qty GROUP BY 1),
        dom AS (
          SELECT DISTINCT q.l_suppkey
          FROM qty q JOIN tot t ON t.l_partkey = q.l_partkey
          WHERE 2 * q.own_q > t.tot_q)
        SELECT s_name, CAST(round(s_acctbal * 100) AS BIGINT) AS s_bal_c
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN dom ON l_suppkey = s_suppkey
        WHERE n_name = '$nationName'
        ORDER BY s_name"""
}
