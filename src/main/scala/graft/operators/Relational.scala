package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational gate queries — the Spark substrate every other
  * operator builds on. Shapes mirror the reference's SQL surface
  * (/root/reference/queries.py) generalized to the testdata star
  * schema. Doubles are rounded at the final projection for oracle
  * (DuckDB) hash parity; every top-k has a full deterministic
  * tie-break.
  */
object Relational {

  /** Pricing-summary aggregate (scan → filter → partial+final hash agg).
    * Filter and the 7-column projection push to the parquet scan.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** Revenue top-10 (fact ⋈ fact ⋈ broadcast dim). The customer
    * filter prunes before the join; customer is broadcast.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey
       LIMIT 10"""

  /** TPC-H Q5 shape — local-supplier volume: revenue per nation for
    * orders where the CUSTOMER and the SUPPLIER sit in the same
    * nation of one region, one order-date year. The classic
    * multi-join planning exercise: two fact tables (lineitem,
    * orders) join on their keys; the four dimensions
    * (customer/supplier/nation/region) are broadcast — region prunes
    * nation, nation prunes both halves of the c_nationkey =
    * s_nationkey equi-condition, so the only shuffles are the
    * fact-fact join and the final 5-row aggregate. Revenue is held
    * exact: cents × (10⁴ − discount-bp) summed as BIGINT (a double
    * Σ price·(1−disc) is merge-order-dependent — fine for a
    * benchmark, fatal for a cross-engine hash gate); headroom to
    * ~10¹⁸ covers 10⁷ rows/nation at max price, and past that the
    * same expression widens to decimal(38,0).
    */
  def q5RegionRevenue(spark: SparkSession, dir: String,
      region: String = "ASIA"): DataFrame = {
    import spark.implicits._
    val nat = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter($"r_name" === region)), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_nationkey".as("c_nat"), $"n_name")
    val supp = Tables.supplier(spark, dir)
      .select($"s_suppkey", $"s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)").as("db"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .filter($"s_nationkey" === $"c_nat")
      .groupBy($"n_name")
      .agg(sum(expr("pc * (10000L - db)")).as("revenue_i"))
      .orderBy($"revenue_i".desc, $"n_name")
  }

  def q5RegionRevenueSql(region: String = "ASIA"): String =
    s"""SELECT n_name,
          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
               AS BIGINT) AS revenue_i
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = '$region'
          AND s_nationkey = c_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue_i DESC, n_name"""

  /** TPC-H Q7 shape (volume shipping): bilateral trade revenue
    * between two nations by ship year — the 6-way join with a
    * DISJUNCTIVE nation predicate that exercises join planning
    * breadth beyond Q5's star: the two metadata dims (supplier→
    * nation, the 2-nation cut) broadcast, orders↔customer goes
    * through the keyed shuffle (a region of customers is
    * broadcast-able; at 100 TB a nation-pair of customers still
    * isn't, so the plan mustn't assume it), and the OR-of-pairs
    * filter applies after both nation columns are in scope —
    * Catalyst can't push a disjunction across two join sides, which
    * is exactly what the shape documents. Revenue in the same exact
    * integer cents×basis-points device as [[q5RegionRevenue]].
    */
  def q7VolumeShipping(spark: SparkSession, dir: String,
      nationA: String = "NATION_3", nationB: String = "NATION_7"): DataFrame = {
    import spark.implicits._
    val nat = Tables.nation(spark, dir)
      .filter($"n_name".isin(nationA, nationB))
      .select($"n_nationkey", $"n_name")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"cust_nation")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= "1995-01-01" && $"l_shipdate" < "1997-01-01")
      .select($"l_orderkey", $"l_suppkey",
        year($"l_shipdate").cast("long").as("l_year"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)").as("db"))
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .filter(($"supp_nation" === nationA && $"cust_nation" === nationB) ||
        ($"supp_nation" === nationB && $"cust_nation" === nationA))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(sum(expr("pc * (10000L - db)")).as("revenue_i"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  def q7VolumeShippingSql(nationA: String = "NATION_3",
      nationB: String = "NATION_7"): String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year,
          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
               AS BIGINT) AS revenue_i
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = '$nationA' AND n2.n_name = '$nationB')
            OR (n1.n_name = '$nationB' AND n2.n_name = '$nationA'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3"""

  /** Running per-supplier revenue ordered by ship date (window agg).
    * Partitioned by supplier — parallel across the shuffle, no
    * global sort.
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter($"l_suppkey" <= 10)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        $"l_extendedprice", $"l_shipdate")
      .withColumn("running_rev", round(sum($"l_extendedprice").over(w), 2))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_rev")
  }

  val windowRunningSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_extendedprice) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
       FROM lineitem
       WHERE l_suppkey <= 10"""

  /** RANGE-frame window — the time-window moving aggregate ROWS
    * frames can't express: per-customer trailing-30-day order value,
    * where the frame is "orders within 29 days before mine" however
    * many rows that is. Ordering key is integer days-since-epoch
    * (RANGE needs a numeric key in both engines), and the summed
    * measure is integer CENTS so the in-frame addition is order-free
    * — a double sum's fp result would depend on frame iteration
    * order, which no oracle can promise (same device as BM25's
    * micro-units).
    */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"d_epoch")
      .rangeBetween(-29, 0)
    Tables.orders(spark, dir)
      .filter($"o_custkey" <= 200)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate",
        datediff($"o_orderdate", lit("1970-01-01").cast("date"))
          .cast("long").as("d_epoch"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .withColumn("mv30",
        round(sum($"cents").over(w).cast("double") / 100.0, 2))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"mv30")
  }

  val windowRangeFrameSql: String =
    """SELECT o_orderkey, o_custkey, o_orderdate,
         round(sum(cents) OVER (
           PARTITION BY o_custkey ORDER BY d_epoch
           RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) * 1.0 / 100.0, 2)
           AS mv30
       FROM (
         SELECT o_orderkey, o_custkey, o_orderdate,
                CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                     AS BIGINT) AS d_epoch,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders WHERE o_custkey <= 200)"""

  /** FULL OUTER join — the join shape the validation anti-joins and
    * broadcast inner joins don't cover: reconcile two keyed sides
    * keeping BOTH unmatched sets (here: a customer slice vs 1995
    * order activity on an overlapping key range, so both null sides
    * genuinely occur). Full outer cannot broadcast (an unmatched
    * streamed row must still appear), so it plans as a sort-merge
    * join — one shuffle per side on the key, which is its honest
    * minimum at any scale.
    */
  def fullOuterActivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
      .filter($"c_custkey" <= 150)
      .select($"c_custkey", $"c_mktsegment")
    val o = Tables.orders(spark, dir)
      .filter($"o_custkey".between(100, 250) &&
        year($"o_orderdate") === 1995)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders_95"))
    c.join(o, $"c_custkey" === $"o_custkey", "full_outer")
      .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
        $"c_mktsegment".as("segment"),
        coalesce($"n_orders_95", lit(0L)).as("n_orders_95"),
        $"c_custkey".isNotNull.as("has_customer"),
        $"o_custkey".isNotNull.as("has_orders_95"))
  }

  val fullOuterActivitySql: String =
    """WITH c AS (
         SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 150),
       o AS (
         SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders_95
         FROM orders
         WHERE o_custkey BETWEEN 100 AND 250 AND year(o_orderdate) = 1995
         GROUP BY o_custkey)
       SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
              c.c_mktsegment AS segment,
              coalesce(o.n_orders_95, 0) AS n_orders_95,
              c.c_custkey IS NOT NULL AS has_customer,
              o.o_custkey IS NOT NULL AS has_orders_95
       FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey"""

  /** INTERSECT / EXCEPT set operations — year-over-year customer
    * cohorts: buyers active in both 1997 and 1998 (retained) vs
    * active in 1997 only (churned). Spark plans both as distinct +
    * LEFT SEMI / LEFT ANTI hash joins on the key — one key-partitioned
    * shuffle per side, no sort, no all-pairs — so the set-algebra
    * surface costs the same as the equivalent semi-join phrasing.
    */
  def setOpsCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def activeIn(yr: Int): DataFrame =
      Tables.orders(spark, dir)
        .filter(year($"o_orderdate") === yr)
        .select($"o_custkey".as("custkey"))
    val y97 = activeIn(1997)
    val y98 = activeIn(1998)
    y97.intersect(y98).withColumn("cohort", lit("retained"))
      .unionByName(y97.except(y98).withColumn("cohort", lit("churned")))
      .orderBy($"custkey", $"cohort")
  }

  val setOpsCohortsSql: String =
    """WITH y97 AS (SELECT o_custkey AS custkey FROM orders
                    WHERE year(o_orderdate) = 1997),
            y98 AS (SELECT o_custkey AS custkey FROM orders
                    WHERE year(o_orderdate) = 1998)
       SELECT custkey, 'retained' AS cohort
       FROM (SELECT custkey FROM y97 INTERSECT SELECT custkey FROM y98)
       UNION ALL
       SELECT custkey, 'churned' AS cohort
       FROM (SELECT custkey FROM y97 EXCEPT SELECT custkey FROM y98)
       ORDER BY custkey, cohort"""

  /** Bag-semantics set algebra — INTERSECT ALL / EXCEPT ALL, the
    * multiplicity-preserving forms the DISTINCT variants silently
    * collapse: a customer with 3 orders in both years keeps
    * min(3, n₉₈) retained rows, and EXCEPT ALL keeps the SURPLUS
    * multiplicity (orders beyond the other year's count), which is
    * the right semantics for order-level (not customer-level)
    * cohort accounting. Spark's intersectAll/exceptAll plan as one
    * count-aggregate + generate per side — still no all-pairs, same
    * cost class as the distinct forms.
    */
  def setOpsAllCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def keysIn(yr: Int): DataFrame =
      Tables.orders(spark, dir)
        .filter(year($"o_orderdate") === yr)
        .select($"o_custkey".as("custkey"))
    val y97 = keysIn(1997)
    val y98 = keysIn(1998)
    y97.intersectAll(y98).withColumn("kind", lit("both"))
      .unionByName(y97.exceptAll(y98).withColumn("kind", lit("surplus97")))
      .groupBy($"custkey", $"kind")
      .agg(count(lit(1)).as("n"))
      .orderBy($"custkey", $"kind")
  }

  val setOpsAllCohortsSql: String =
    """WITH y97 AS (SELECT o_custkey AS custkey FROM orders
                    WHERE year(o_orderdate) = 1997),
            y98 AS (SELECT o_custkey AS custkey FROM orders
                    WHERE year(o_orderdate) = 1998),
       u AS (
         SELECT custkey, 'both' AS kind
         FROM (SELECT custkey FROM y97 INTERSECT ALL
               SELECT custkey FROM y98)
         UNION ALL
         SELECT custkey, 'surplus97' AS kind
         FROM (SELECT custkey FROM y97 EXCEPT ALL
               SELECT custkey FROM y98))
       SELECT custkey, kind, CAST(count(*) AS BIGINT) AS n
       FROM u GROUP BY 1, 2 ORDER BY custkey, kind"""

  /** Correlated subqueries — EXISTS, NOT EXISTS, and a correlated
    * scalar — run VERBATIM on both engines (same device as
    * sql_passthrough). Catalyst decorrelates all three into joins
    * (left semi, left anti, and a left outer over a grouped
    * aggregate): per-row re-execution never happens, which
    * RelationalSpec pins by asserting the plan contains the join
    * shapes and no subquery nodes survive.
    */
  val existsSubquerySql: String =
    """SELECT c.c_custkey,
              (SELECT round(max(o.o_totalprice), 2) FROM orders o
               WHERE o.o_custkey = c.c_custkey) AS max_price
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > 150000)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderstatus = 'F'
                           AND o.o_totalprice > 250000)
       ORDER BY c.c_custkey"""

  def existsSubquery(spark: SparkSession, dir: String): DataFrame =
    SqlInterface.run(spark, dir, existsSubquerySql)

  /** LATERAL correlated derived table — top-2-orders-per-customer as
    * the SQL standard phrases it, run VERBATIM on both engines.
    * Catalyst plans the correlated LIMIT as a per-key ranking window
    * under a lateral join — the same physical shape as the
    * olap_window_ranks formulation, so the lateral surface costs
    * nothing extra. Fully tie-broken inside (price DESC, orderkey)
    * and outside.
    */
  val lateralTopNSql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.price
       FROM customer c,
       LATERAL (SELECT o.o_orderkey, round(o.o_totalprice, 2) AS price
                FROM orders o
                WHERE o.o_custkey = c.c_custkey
                ORDER BY o.o_totalprice DESC, o.o_orderkey
                LIMIT 2) t
       WHERE c.c_custkey <= 300
       ORDER BY c.c_custkey, price DESC, o_orderkey"""

  def lateralTopN(spark: SparkSession, dir: String): DataFrame =
    SqlInterface.run(spark, dir, lateralTopNSql)
}
