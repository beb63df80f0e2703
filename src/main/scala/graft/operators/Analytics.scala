package graft.operators

import graft.Tables
import graft.functions.TextFns
import graft.pipeline.DimensionalEtl
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gate queries for the reference's ETL transform surface
  * (task.py:74-139) and its SQL query library (queries.py) —
  * generalized from Netflix columns to the testdata star schema.
  * Each `xxxSql` is the DuckDB oracle with identical aliases.
  */
object Analytics {

  // ── ETL transform surface ────────────────────────────────────────

  /** #2/#3/#5: split+trim+explode documents.text → (doc_id, token). */
  def etlSplitExplode(spark: SparkSession, dir: String): DataFrame =
    DimensionalEtl.docTokens(spark, dir)

  val etlSplitExplodeSql: String =
    """SELECT doc_id, trim(t) AS token
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
       WHERE length(trim(t)) > 0"""

  /** #6/#7: union of token extracts → distinct dim + ordered
    * surrogate id + gender enrichment (#9).
    */
  def etlDimTokens(spark: SparkSession, dir: String): DataFrame =
    DimensionalEtl.tokenDim(spark, dir)

  val etlDimTokensSql: String =
    s"""SELECT token,
        row_number() OVER (ORDER BY token) AS token_id,
        ${TextFns.genderGuessSql("token")} AS gender
        FROM (
          SELECT DISTINCT trim(t) AS token FROM (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
            UNION ALL
            SELECT unnest(string_split(p_name, ' ')) AS t FROM part)
          WHERE length(trim(t)) > 0)"""

  /** #10: bridge table (entity_id, token_id, source_type). */
  def etlBridge(spark: SparkSession, dir: String): DataFrame =
    DimensionalEtl.bridge(spark, dir)

  val etlBridgeSql: String =
    """WITH dim AS (
         SELECT token, row_number() OVER (ORDER BY token) AS token_id
         FROM (
           SELECT DISTINCT trim(t) AS token FROM (
             SELECT unnest(string_split(text, ' ')) AS t FROM documents
             UNION ALL
             SELECT unnest(string_split(p_name, ' ')) AS t FROM part)
           WHERE length(trim(t)) > 0)),
       doc_tok AS (
         SELECT doc_id, trim(t) AS token
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
         WHERE length(trim(t)) > 0),
       part_tok AS (
         SELECT p_partkey, trim(t) AS token
         FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS t FROM part)
         WHERE length(trim(t)) > 0)
       SELECT CAST(doc_id AS BIGINT) AS entity_id, token_id, 'doc' AS source_type
         FROM doc_tok JOIN dim USING (token)
       UNION ALL
       SELECT CAST(p_partkey AS BIGINT) AS entity_id, token_id, 'part' AS source_type
         FROM part_tok JOIN dim USING (token)"""

  /** #8: first-space name split (nsplit, task.py:55). */
  def etlNsplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        TextFns.firstWord($"text").as("first_word"),
        length(TextFns.restWords($"text")).as("rest_len"))
  }

  val etlNsplitSql: String =
    """SELECT doc_id,
       CASE WHEN strpos(text, ' ') > 0
            THEN substring(text, 1, strpos(text, ' ') - 1) ELSE text END AS first_word,
       CAST(length(CASE WHEN strpos(text, ' ') > 0
            THEN substring(text, strpos(text, ' ') + 1) ELSE '' END) AS INT) AS rest_len
       FROM documents"""

  /** #9: gender heuristic over the exploded tokens (distinct). */
  def etlGender(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    DimensionalEtl.docTokens(spark, dir)
      .select($"token").distinct()
      .withColumn("gender", TextFns.genderGuess($"token"))
  }

  val etlGenderSql: String =
    s"""SELECT token, ${TextFns.genderGuessSql("token")} AS gender
        FROM (SELECT DISTINCT trim(t) AS token
              FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
              WHERE length(trim(t)) > 0)"""

  // ── Validation (queries.py:40-51: anti-join missing-data counts) ──

  /** #14: orders with no lineitem (≙ shows with no crew). */
  def validateOrphanOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir).select($"o_orderkey")
      .join(Tables.lineitem(spark, dir).select($"l_orderkey"),
        $"o_orderkey" === $"l_orderkey", "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
  }

  val validateOrphanOrdersSql: String =
    """SELECT count(*) AS n_orphans
       FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_orderkey IS NULL"""

  /** #14: customers with no orders (≙ shows with no listings). */
  def validateOrphanCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir).select($"c_custkey")
      .join(Tables.orders(spark, dir).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
  }

  val validateOrphanCustomersSql: String =
    """SELECT count(*) AS n_orphans
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       WHERE o_custkey IS NULL"""

  /** Declarative data-expectations audit (the dbt-test /
    * Great-Expectations contract shape, generalizing #14): one result
    * row per rule with its violation count — uniqueness, domain,
    * range, null, and referential rules over orders. All row-level
    * rules ride ONE aggregate pass (a single scan, map-side partial
    * sums of CASE flags, then stack() to long form — 6 rules cost
    * the same scan as 1); uniqueness adds the count-distinct
    * aggregate and the referential rule one anti-join, each the
    * operation's honest minimum. Green = all zeros except the
    * planted-orphan rule the testdata carries by construction.
    */
  def expectations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val rowRules = o.agg(
      sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("v_null"),
      sum(when($"o_totalprice" <= 0, 1L).otherwise(0L)).as("v_price"),
      sum(when(!$"o_orderstatus".isin("O", "F", "P"), 1L).otherwise(0L))
        .as("v_status"),
      sum(when($"o_orderdate" < lit("1992-01-01").cast("timestamp") ||
          $"o_orderdate" >= lit("1999-01-01").cast("timestamp"), 1L)
        .otherwise(0L)).as("v_date"),
      (count(lit(1)) - countDistinct($"o_orderkey")).as("v_unique"))
      .select(expr(
        """stack(5,
             'custkey_not_null', v_null,
             'totalprice_positive', v_price,
             'status_in_domain', v_status,
             'orderdate_in_range', v_date,
             'orderkey_unique', v_unique) AS (rule, n_violations)"""))
    val referential = o.select($"o_custkey")
      .join(Tables.customer(spark, dir).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("custkey_references_customer").as("rule"), $"n_violations")
    rowRules.unionByName(referential).orderBy($"rule")
  }

  val expectationsSql: String =
    """WITH agg AS (
         SELECT
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null,
           sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_price,
           sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
             AS v_status,
           sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                      OR o_orderdate >= TIMESTAMP '1999-01-01'
                    THEN 1 ELSE 0 END) AS v_date,
           count(*) - count(DISTINCT o_orderkey) AS v_unique
         FROM orders),
       rules AS (
         SELECT 'custkey_not_null' AS rule, CAST(v_null AS BIGINT) AS n_violations FROM agg
         UNION ALL
         SELECT 'totalprice_positive', CAST(v_price AS BIGINT) FROM agg
         UNION ALL
         SELECT 'status_in_domain', CAST(v_status AS BIGINT) FROM agg
         UNION ALL
         SELECT 'orderdate_in_range', CAST(v_date AS BIGINT) FROM agg
         UNION ALL
         SELECT 'orderkey_unique', CAST(v_unique AS BIGINT) FROM agg
         UNION ALL
         SELECT 'custkey_references_customer', CAST(count(*) AS BIGINT)
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         WHERE c_custkey IS NULL)
       SELECT rule, n_violations FROM rules ORDER BY rule"""

  /** Order-invariant table fingerprint — content equality between
    * two copies of a table (cross-engine migration, replica audit,
    * backup validation) WITHOUT moving or sorting either copy: each
    * row digests to an integer (leading 60 bits of an md5 over a
    * canonical serialization) and the rows' modular sum (mod 2⁶¹−1)
    * is the table's fingerprint. Commutative addition makes the
    * digest independent of row order, partitioning, and file layout
    * — the whole check is one map-side-combined aggregate pass per
    * side, and two 100 TB copies compare by exchanging 16 bytes.
    *
    * Serialization is per-FIELD md5, concatenated fixed-width, then
    * hashed again: a delimiter-joined row string would let a field-
    * boundary shift between adjacent string columns ('a|b','c' vs
    * 'a','b|c') — or a NULL silently skipped by concat_ws — collide
    * with probability 1; 32 hex chars per field parse unambiguously,
    * and NULL carries an explicit all-zeros marker distinct from
    * every real digest (finding one would be an md5 preimage). The
    * 60-bit slice keeps the per-row value inside BIGINT on both
    * engines (Spark `conv`, DuckDB '0x' cast); the sum accumulates
    * in DECIMAL(38,0) / HUGEINT so it is EXACT before the one final
    * mod — a wrapping 64-bit sum would be engine-dependent. Forgery
    * bound: matching digests differ with probability ≤ 2⁻⁶¹ per
    * corrupted row set, and n_rows rules out the empty-vs-empty
    * triviality.
    */
  private val fingerprintFields =
    Seq("doc_id", "text", "lang", "source", "n_chars")

  /** One fixed-width (32-hex) digest per field; NULL → 32 zeros. */
  private def fieldDigests(fields: Seq[String]): String =
    fields.map(f =>
      s"coalesce(md5(CAST($f AS STRING)), lpad('', 32, '0'))")
      .mkString(", ")

  def tableFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(expr(
        s"""CAST(conv(substr(md5(
              concat(${fieldDigests(fingerprintFields)})),
            1, 15), 16, 10) AS BIGINT)""").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("""CAST(sum(CAST(h AS DECIMAL(38,0))) % 2305843009213693951
                AS BIGINT)""").as("fingerprint"))
  }

  val tableFingerprintSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(CAST('0x' || substr(md5(
                      concat(${fieldDigests(fingerprintFields)})),
                    1, 15) AS BIGINT) AS HUGEINT)) % 2305843009213693951
                 AS BIGINT) AS fingerprint
        FROM documents"""

  // ── Analytics (queries.py:54-121) ────────────────────────────────

  /** #15 (q5_1_1..3): most common token per gender class — the
    * explode→enrich→group-count→top-1 chain, one gate query per
    * reference variant (female/male/unknown).
    */
  def topToken(spark: SparkSession, dir: String,
      gender: String = "female"): DataFrame = {
    import spark.implicits._
    DimensionalEtl.docTokens(spark, dir)
      .withColumn("gender", TextFns.genderGuess($"token"))
      .filter($"gender" === gender)
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(1)
  }

  def topTokenSql(gender: String = "female"): String =
    s"""SELECT token, count(*) AS n
        FROM (SELECT trim(t) AS token
              FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
              WHERE length(trim(t)) > 0)
        WHERE ${TextFns.genderGuessSql("token")} = '$gender'
        GROUP BY token ORDER BY n DESC, token LIMIT 1"""

  /** #16 (q5_2): longest order→last-shipment gap, top-1. */
  def longestGap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate")
      .join(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate"),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(max($"l_shipdate").as("last_ship"))
      .select($"o_orderkey", datediff($"last_ship", $"o_orderdate").as("gap_days"))
      .orderBy($"gap_days".desc, $"o_orderkey")
      .limit(1)
  }

  val longestGapSql: String =
    """SELECT o_orderkey,
       CAST(date_diff('day', o_orderdate, last_ship) AS INT) AS gap_days
       FROM (SELECT o_orderkey, o_orderdate, max(l_shipdate) AS last_ship
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             GROUP BY o_orderkey, o_orderdate)
       ORDER BY gap_days DESC, o_orderkey LIMIT 1"""

  /** #17 (q5_3): calendar month with the most orders, top-1. */
  def monthHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(month($"o_orderdate").cast("long").as("month"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"month")
      .limit(1)
  }

  val monthHistogramSql: String =
    """SELECT CAST(month(o_orderdate) AS BIGINT) AS month, count(*) AS n
       FROM orders GROUP BY 1 ORDER BY n DESC, month LIMIT 1"""

  /** #18 (q5_4): year with the largest YoY % increase in finished
    * orders. The reference self-joins on year+1 (queries.py:93); a
    * lag window over the tiny per-year aggregate is the Spark-native
    * equivalent with one fewer shuffle.
    */
  def yoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byYear = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F")
      .groupBy(year($"o_orderdate").cast("long").as("yr"))
      .agg(count(lit(1)).as("n"))
    // Deliberately unpartitioned: the window input is the per-year
    // aggregate (decades of rows forever), so one partition IS the
    // plan. WindowAuditSpec carries the exemption; a foldable
    // partition key would be erased by EliminateWindowPartitions
    // anyway, so there is nothing to dress up here.
    byYear
      .withColumn("prev_n", lag($"n", 1).over(Window.orderBy($"yr")))
      .filter($"prev_n".isNotNull)
      .select($"yr", $"n", $"prev_n",
        round(($"n" - $"prev_n") * lit(100.0) / $"prev_n", 4).as("growth_pct"))
      .orderBy($"growth_pct".desc, $"yr")
      .limit(1)
  }

  val yoyGrowthSql: String =
    """SELECT yr, n, prev_n,
       round((n - prev_n) * 100.0 / prev_n, 4) AS growth_pct
       FROM (SELECT yr, n, lag(n) OVER (ORDER BY yr) AS prev_n
             FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n
                   FROM orders WHERE o_orderstatus = 'F' GROUP BY 1))
       WHERE prev_n IS NOT NULL
       ORDER BY growth_pct DESC, yr LIMIT 1"""

  /** #19 (q5_5): suppliers co-occurring in the same orders as
    * supplier 0 more than once — semi-join prefilter (the reference's
    * two-phase shape, queries.py:110-121) then a distinct-order
    * count. The anchor's order set is the only thing shuffled.
    */
  def cooccurrence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey")
    val anchorOrders = li.filter($"l_suppkey" === 0)
      .select($"l_orderkey").distinct()
    val coCounts = li.filter($"l_suppkey" =!= 0)
      .join(anchorOrders, "l_orderkey")
      .groupBy($"l_suppkey")
      .agg(countDistinct($"l_orderkey").as("n_shared"))
      .filter($"n_shared" > 1)
    coCounts
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_name", $"n_shared")
      .orderBy($"n_shared".desc, $"s_name")
  }

  val cooccurrenceSql: String =
    """WITH anchor AS (
         SELECT DISTINCT l_orderkey FROM lineitem WHERE l_suppkey = 0)
       SELECT s_name, count(DISTINCT l.l_orderkey) AS n_shared
       FROM lineitem l
       JOIN anchor USING (l_orderkey)
       JOIN supplier ON l.l_suppkey = s_suppkey
       WHERE l.l_suppkey <> 0
       GROUP BY s_name
       HAVING count(DISTINCT l.l_orderkey) > 1
       ORDER BY n_shared DESC, s_name"""

  /** Signup→purchase funnel by cohort week: of each week's signups,
    * how many purchased within 7 days. Conversion detection rides the
    * banded range join ([[RangeJoin.bandJoin]] — Σ bucket², never
    * per-user cross products), collapsed to a distinct converted-set
    * before the left join back, so multi-purchase users count once.
    * The left join keeps zero-conversion weeks visible — the number a
    * growth dashboard actually needs.
    */
  def funnelSignupPurchase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"))
    val converted = RangeJoin.bandJoin(signups, purchases, Seq("user_id"),
        "ts", "p_ts", band = 7L * 24 * 3600 * 1000000)
      .select($"signup_id").distinct()
      .withColumn("conv", lit(1L))
    signups.join(converted, Seq("signup_id"), "left")
      .groupBy(date_trunc("week", $"ts").as("wk"))
      .agg(count(lit(1)).as("n_signups"),
        sum(coalesce($"conv", lit(0L))).as("n_converted"))
      .withColumn("conv_rate",
        round($"n_converted".cast("double") / $"n_signups", 4))
  }

  val funnelSignupPurchaseSql: String =
    """WITH ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts,
                          user_id, event_type FROM events),
       s AS (SELECT event_id AS signup_id, user_id, ts FROM ev
             WHERE event_type = 'signup'),
       p AS (SELECT user_id, ts AS p_ts FROM ev
             WHERE event_type = 'purchase'),
       conv AS (SELECT DISTINCT s.signup_id
                FROM s JOIN p ON s.user_id = p.user_id
                 AND p.p_ts >= s.ts AND p.p_ts < s.ts + INTERVAL 7 DAY)
       SELECT date_trunc('week', s.ts) AS wk,
              CAST(count(*) AS BIGINT) AS n_signups,
              CAST(count(c.signup_id) AS BIGINT) AS n_converted,
              round(count(c.signup_id) * 1.0 / count(*), 4) AS conv_rate
       FROM s LEFT JOIN conv c ON s.signup_id = c.signup_id
       GROUP BY 1"""

  /** Retention cohort matrix: users grouped by FIRST-signup week,
    * tracked over weekly activity for the next 4 weeks — the
    * (cohort × week-offset) grid of a retention dashboard. Per-user
    * first signup dedups repeat signups; activity weeks are
    * distinct'd per user BEFORE the join (both sides partial-agg'd),
    * so the join moves (user, week) scalars and the matrix cell is a
    * distinct-user count. Cohort sizes ride a broadcast so the rate
    * needs no second pass over the activity.
    */
  /** Signup-cohort LTV curve: per signup epoch-week and week index
    * since signup, the cohort's purchase revenue, its running
    * cumulative, and cumulative LTV per cohort member — the
    * unit-economics readout next to [[retentionCohorts]]'s activity
    * matrix. Exactness: revenue converts ONCE to integer micro-units
    * (round(value·10⁶) of identical input doubles), so all sums,
    * cumulatives, and the floor-divided per-user LTV are BIGINT —
    * no fp accumulation order anywhere; the cohort key is the
    * integer epoch-week (unix div 604800) so week arithmetic can't
    * drift on calendar conventions. The cumulative window runs over
    * the (cohort, week-index) AGGREGATE partitioned by cohort;
    * purchases join signups BY KEY; pre-signup purchases are
    * excluded symmetrically.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val signup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id")
      .agg(min(expr("unix_timestamp(ts) div 604800")).as("cw"))
    val sizes = signup.groupBy($"cw").agg(count(lit(1)).as("users"))
    val rev = ev.filter($"event_type" === "purchase")
      .select($"user_id",
        expr("unix_timestamp(ts) div 604800").as("pw"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("micros"))
      .join(signup, "user_id")
      .withColumn("widx", $"pw" - $"cw")
      .filter($"widx" >= 0)
      .groupBy($"cw", $"widx")
      .agg(sum($"micros").as("rev_micros"))
    val wc = Window.partitionBy($"cw").orderBy($"widx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("cum_micros", sum($"rev_micros").over(wc))
      .join(broadcast(sizes), Seq("cw"))
      .select($"cw".as("cohort_wk"), $"widx", $"rev_micros",
        $"cum_micros", $"users",
        expr("cum_micros div users").as("ltv_micros"))
      .orderBy($"cohort_wk", $"widx")
  }

  val cohortLtvSql: String =
    """WITH s AS (
         SELECT user_id,
                CAST(min(CAST(floor(epoch(ts)) AS BIGINT) // 604800)
                  AS BIGINT) AS cw
         FROM events WHERE event_type = 'signup' GROUP BY user_id),
       sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS users
              FROM s GROUP BY cw),
       r AS (
         SELECT s.cw,
                CAST(floor(epoch(e.ts)) AS BIGINT) // 604800 - s.cw AS widx,
                CAST(sum(CAST(round(e.value * 1000000) AS BIGINT))
                  AS BIGINT) AS rev_micros
         FROM events e JOIN s USING (user_id)
         WHERE e.event_type = 'purchase'
           AND CAST(floor(epoch(e.ts)) AS BIGINT) // 604800 >= s.cw
         GROUP BY 1, 2),
       c AS (
         SELECT cw, widx, rev_micros,
                CAST(sum(rev_micros) OVER (PARTITION BY cw
                  ORDER BY widx) AS BIGINT) AS cum_micros
         FROM r)
       SELECT cw AS cohort_wk, widx, rev_micros, cum_micros, users,
              cum_micros // users AS ltv_micros
       FROM c JOIN sz USING (cw)
       ORDER BY cohort_wk, widx"""

  /** Sample-ratio-mismatch check for a hash-split experiment — the
    * first gate any A/B readout must pass (an assignment bug shows
    * up as a ratio the randomizer could not have produced, and
    * every downstream metric is garbage if it does). Variant = the
    * user's md5 per-mille bucket parity (the [[graft.operators
    * .Sampling]] portable device, salt "ab"), expected 50/50; for
    * two cells the chi-square collapses to (n_a−n_b)²/n, kept exact
    * in the integers with ONE pinned division for the reported
    * statistic, and the α=0.05 flag decided by integer
    * cross-multiplication against 3.8415 — (n_a−n_b)²·10⁴ >
    * 38415·n — so the boundary can't drift on fp.
    */
  def abSrmCheck(spark: SparkSession, dir: String,
      salt: String = "ab"): DataFrame = {
    import spark.implicits._
    val users = Tables.events(spark, dir).select($"user_id").distinct()
    val counts = users
      .withColumn("variant",
        when(Sampling.bucket($"user_id", salt) % 2 === 0, "A")
          .otherwise("B"))
      .groupBy()
      .agg(count(lit(1)).as("n_users"),
        sum(when($"variant" === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when($"variant" === "B", 1L).otherwise(0L)).as("n_b"))
    counts
      .withColumn("chi2", round(
        (($"n_a" - $"n_b") * ($"n_a" - $"n_b")).cast("double") /
          $"n_users".cast("double"), 4))
      .withColumn("srm",
        ($"n_a" - $"n_b") * ($"n_a" - $"n_b") * 10000L >
          lit(38415L) * $"n_users")
      .select($"n_users", $"n_a", $"n_b", $"chi2", $"srm")
  }

  def abSrmCheckSql(salt: String = "ab"): String =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
        v AS (SELECT CASE WHEN ${Sampling.bucketSql("user_id", salt)} % 2 = 0
                          THEN 'A' ELSE 'B' END AS variant FROM u),
        c AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                     CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_a,
                     CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_b
              FROM v)
        SELECT n_users, n_a, n_b,
               round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                     / CAST(n_users AS DOUBLE), 4) AS chi2,
               (n_a - n_b) * (n_a - n_b) * 10000 > 38415 * n_users AS srm
        FROM c"""

  /** The A/B readout [[abSrmCheck]] clears the way for: Welch's
    * unequal-variance t on purchase value between the two hash
    * variants. Values convert ONCE to integer micro-units
    * (round(v·10⁶) of identical input doubles), so the per-variant
    * moment sums S = Σx and Q = Σx² are exact BIGINTs in any merge
    * order; means, Welch variances v = (nQ − S²)/(n(n−1)), and t =
    * (m₁−m₂)/√(v₁/n₁ + v₂/n₂) are then ONE pinned fp expression
    * tree of those integers (every operand cast once — identical
    * IEEE doubles both engines). Headroom: Q ≤ n·x̂² holds BIGINT
    * through 10⁹ purchases at ~$90 (micro² = 8·10¹⁵ per unit) —
    * past that the moment columns widen to DECIMAL(38).
    */
  def abTtest(spark: SparkSession, dir: String,
      salt: String = "ab"): DataFrame = {
    import spark.implicits._
    val m = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        expr("CAST(round(value * 1000000) AS BIGINT)").as("x"))
      .withColumn("variant",
        when(Sampling.bucket($"user_id", salt) % 2 === 0, "A")
          .otherwise("B"))
      .groupBy()
      .agg(
        sum(when($"variant" === "A", 1L).otherwise(0L)).as("n1"),
        sum(when($"variant" === "A", $"x").otherwise(0L)).as("s1"),
        sum(when($"variant" === "A", $"x" * $"x").otherwise(0L)).as("q1"),
        sum(when($"variant" === "B", 1L).otherwise(0L)).as("n2"),
        sum(when($"variant" === "B", $"x").otherwise(0L)).as("s2"),
        sum(when($"variant" === "B", $"x" * $"x").otherwise(0L)).as("q2"))
    def meanD(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    def varD(n: String, s: String, q: String) =
      (col(n).cast("double") * col(q).cast("double") -
        col(s).cast("double") * col(s).cast("double")) /
        (col(n).cast("double") * (col(n).cast("double") - lit(1.0)))
    m.withColumn("t_stat", round(
        (meanD("s1", "n1") - meanD("s2", "n2")) /
          sqrt(varD("n1", "s1", "q1") / $"n1".cast("double") +
            varD("n2", "s2", "q2") / $"n2".cast("double")), 4))
      .select($"n1", $"s1", $"n2", $"s2", $"t_stat")
  }

  def abTtestSql(salt: String = "ab"): String =
    s"""WITH p AS (
          SELECT user_id, CAST(round(value * 1000000) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase'),
        v AS (SELECT x, CASE WHEN ${Sampling.bucketSql("user_id", salt)}
                               % 2 = 0
                             THEN 'A' ELSE 'B' END AS variant FROM p),
        mo AS (
          SELECT
            CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
              AS n1,
            CAST(sum(CASE WHEN variant = 'A' THEN x ELSE 0 END) AS BIGINT)
              AS s1,
            CAST(sum(CASE WHEN variant = 'A' THEN x * x ELSE 0 END)
              AS BIGINT) AS q1,
            CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
              AS n2,
            CAST(sum(CASE WHEN variant = 'B' THEN x ELSE 0 END) AS BIGINT)
              AS s2,
            CAST(sum(CASE WHEN variant = 'B' THEN x * x ELSE 0 END)
              AS BIGINT) AS q2
          FROM v)
        SELECT n1, s1, n2, s2,
               round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                     / sqrt(((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                             / (CAST(n1 AS DOUBLE)
                                * (CAST(n1 AS DOUBLE) - 1.0)))
                            / CAST(n1 AS DOUBLE)
                            + ((CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
                                - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                               / (CAST(n2 AS DOUBLE)
                                  * (CAST(n2 AS DOUBLE) - 1.0)))
                            / CAST(n2 AS DOUBLE)), 4) AS t_stat
        FROM mo"""

  /** Minimum detectable effect at 80% power / two-sided 5% α for the
    * [[abTtest]] design — the experiment-PLANNING readout the test
    * family lacks ("can this experiment even see the lift we care
    * about at its current traffic"): MDE = (z_{0.975} + z_{0.8})·SE,
    * SE = √(v₁/n₁ + v₂/n₂) from the same exact micro-unit moment
    * sums as the t-test (so the two gates cannot disagree about the
    * variance). The two normal quantiles are fixed LITERALS
    * (1.959964, 0.841621 — both engines see identical doubles); the
    * relative MDE divides by the pooled mean, pinned. One map-side
    * aggregate; nothing corpus-sized past it.
    */
  def abPowerMde(spark: SparkSession, dir: String,
      salt: String = "ab"): DataFrame = {
    import spark.implicits._
    val m = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        expr("CAST(round(value * 1000000) AS BIGINT)").as("x"))
      .withColumn("variant",
        when(Sampling.bucket($"user_id", salt) % 2 === 0, "A")
          .otherwise("B"))
      .groupBy()
      .agg(
        sum(when($"variant" === "A", 1L).otherwise(0L)).as("n1"),
        sum(when($"variant" === "A", $"x").otherwise(0L)).as("s1"),
        sum(when($"variant" === "A", $"x" * $"x").otherwise(0L)).as("q1"),
        sum(when($"variant" === "B", 1L).otherwise(0L)).as("n2"),
        sum(when($"variant" === "B", $"x").otherwise(0L)).as("s2"),
        sum(when($"variant" === "B", $"x" * $"x").otherwise(0L)).as("q2"))
    def varD(n: String, s: String, q: String) =
      (col(n).cast("double") * col(q).cast("double") -
        col(s).cast("double") * col(s).cast("double")) /
        (col(n).cast("double") * (col(n).cast("double") - lit(1.0)))
    m.withColumn("se_micro",
        sqrt(varD("n1", "s1", "q1") / $"n1".cast("double") +
          varD("n2", "s2", "q2") / $"n2".cast("double")))
      .withColumn("mean_micro",
        ($"s1" + $"s2").cast("double") / ($"n1" + $"n2").cast("double"))
      .select($"n1", $"n2",
        round($"mean_micro" / 1.0e6, 4).as("pooled_mean"),
        round(lit(1.959964 + 0.841621) * $"se_micro" / 1.0e6, 4)
          .as("mde_abs"),
        round(lit(1.959964 + 0.841621) * $"se_micro" / $"mean_micro", 6)
          .as("mde_rel"))
  }

  def abPowerMdeSql(salt: String = "ab"): String =
    s"""WITH p AS (
          SELECT user_id, CAST(round(value * 1000000) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase'),
        v AS (SELECT x, CASE WHEN ${Sampling.bucketSql("user_id", salt)}
                               % 2 = 0
                             THEN 'A' ELSE 'B' END AS variant FROM p),
        mo AS (
          SELECT
            CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
              AS n1,
            CAST(sum(CASE WHEN variant = 'A' THEN x ELSE 0 END) AS BIGINT)
              AS s1,
            CAST(sum(CASE WHEN variant = 'A' THEN x * x ELSE 0 END)
              AS BIGINT) AS q1,
            CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
              AS n2,
            CAST(sum(CASE WHEN variant = 'B' THEN x ELSE 0 END) AS BIGINT)
              AS s2,
            CAST(sum(CASE WHEN variant = 'B' THEN x * x ELSE 0 END)
              AS BIGINT) AS q2
          FROM v),
        d AS (
          SELECT n1, n2,
                 sqrt(((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
                      / CAST(n1 AS DOUBLE)
                      + ((CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
                          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                         / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)))
                      / CAST(n2 AS DOUBLE)) AS se_micro,
                 CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                   AS mean_micro
          FROM mo)
        SELECT n1, n2,
               round(mean_micro / 1000000, 4) AS pooled_mean,
               round((1.959964 + 0.841621) * se_micro / 1000000, 4)
                 AS mde_abs,
               round((1.959964 + 0.841621) * se_micro / mean_micro, 6)
                 AS mde_rel
        FROM d"""

  /** CUPED variance reduction (Deng/Xu/Kohavi/Walker, WSDM 2013) —
    * the experimentation-platform standard the plain t-test leaves
    * power on the table without: each user's post-period metric Y is
    * adjusted by their PRE-period covariate X,
    * Ŷ = Y − θ·(X − mean X) with θ = cov(X,Y)/var(X), which shrinks
    * variance by the squared correlation while leaving the treatment
    * difference unbiased (assignment is independent of the
    * pre-period).
    *
    * Exactness chain: per-user X/Y are exact micro-unit BIGINTs
    * (pre/post split at the deterministic epoch midpoint of the
    * purchase stream); θ and mean X are ONE pinned double expression
    * of decimal-exact pooled moments; each user's Ŷ is quantized
    * ONCE back to micro-units; both t statistics then come from
    * exact per-variant moment sums. Two aggregates over the
    * USER-sized frame (not the event stream), second moments in
    * decimal(38,0).
    */
  def abCuped(spark: SparkSession, dir: String,
      salt: String = "ab"): DataFrame = {
    import spark.implicits._
    val p = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", expr("unix_micros(ts)").as("tus"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("x"))
    val cut = p.agg(expr("(min(tus) + max(tus)) div 2").as("cut"))
    val users = p.crossJoin(broadcast(cut))
      .groupBy($"user_id")
      .agg(sum(when($"tus" < $"cut", $"x").otherwise(0L)).as("pre"),
        sum(when($"tus" >= $"cut", $"x").otherwise(0L)).as("post"))
      .withColumn("variant",
        when(Sampling.bucket($"user_id", salt) % 2 === 0, "A")
          .otherwise("B"))
    val pooled = users.agg(
      count(lit(1)).as("n"),
      sum($"pre").as("sx"), sum($"post").as("sy"),
      sum(($"pre".cast("decimal(38,0)") * $"pre")).as("sxx"),
      sum(($"pre".cast("decimal(38,0)") * $"post")).as("sxy"))
    val adj = users.crossJoin(broadcast(pooled))
      .withColumn("theta", expr(
        """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""))
      .withColumn("adj", expr(
        """CAST(round(CAST(post AS DOUBLE)
             - theta * (CAST(pre AS DOUBLE)
                        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
           AS BIGINT)"""))
    val m = adj.groupBy()
      .agg(
        max($"theta").as("theta"),
        sum(when($"variant" === "A", 1L).otherwise(0L)).as("n1"),
        sum(when($"variant" === "A", $"post").otherwise(0L)).as("sy1"),
        sum(when($"variant" === "A",
          $"post".cast("decimal(38,0)") * $"post").otherwise(lit(0)))
          .as("qy1"),
        sum(when($"variant" === "A", $"adj").otherwise(0L)).as("sa1"),
        sum(when($"variant" === "A",
          $"adj".cast("decimal(38,0)") * $"adj").otherwise(lit(0)))
          .as("qa1"),
        sum(when($"variant" === "B", 1L).otherwise(0L)).as("n2"),
        sum(when($"variant" === "B", $"post").otherwise(0L)).as("sy2"),
        sum(when($"variant" === "B",
          $"post".cast("decimal(38,0)") * $"post").otherwise(lit(0)))
          .as("qy2"),
        sum(when($"variant" === "B", $"adj").otherwise(0L)).as("sa2"),
        sum(when($"variant" === "B",
          $"adj".cast("decimal(38,0)") * $"adj").otherwise(lit(0)))
          .as("qa2"))
    def meanD(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    def varD(n: String, s: String, q: String) =
      (col(n).cast("double") * col(q).cast("double") -
        col(s).cast("double") * col(s).cast("double")) /
        (col(n).cast("double") * (col(n).cast("double") - lit(1.0)))
    def welch(s1: String, q1: String, s2: String, q2: String) =
      (meanD(s1, "n1") - meanD(s2, "n2")) /
        sqrt(varD("n1", s1, q1) / $"n1".cast("double") +
          varD("n2", s2, q2) / $"n2".cast("double"))
    m.select($"n1", $"n2",
      round($"theta", 6).as("theta"),
      round(welch("sy1", "qy1", "sy2", "qy2"), 4).as("t_raw"),
      round(welch("sa1", "qa1", "sa2", "qa2"), 4).as("t_cuped"),
      round(
        (varD("n1", "sa1", "qa1") * ($"n1".cast("double") - 1.0) +
          varD("n2", "sa2", "qa2") * ($"n2".cast("double") - 1.0)) /
        (varD("n1", "sy1", "qy1") * ($"n1".cast("double") - 1.0) +
          varD("n2", "sy2", "qy2") * ($"n2".cast("double") - 1.0)), 6)
        .as("var_ratio"))
  }

  def abCupedSql(salt: String = "ab"): String =
    s"""WITH p AS (
          SELECT user_id,
                 epoch_us(date_trunc('microseconds', ts)) AS tus,
                 CAST(round(value * 1000000) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase'),
        cut AS (SELECT (min(tus) + max(tus)) // 2 AS cut FROM p),
        users AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN tus < cut THEN x ELSE 0 END) AS BIGINT)
                   AS pre,
                 CAST(sum(CASE WHEN tus >= cut THEN x ELSE 0 END) AS BIGINT)
                   AS post,
                 CASE WHEN ${Sampling.bucketSql("user_id", salt)} % 2 = 0
                      THEN 'A' ELSE 'B' END AS variant
          FROM p, cut GROUP BY user_id),
        pooled AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(pre) AS BIGINT) AS sx,
                 CAST(sum(post) AS BIGINT) AS sy,
                 CAST(sum(CAST(pre AS HUGEINT) * pre) AS DECIMAL(38,0)) AS sxx,
                 CAST(sum(CAST(pre AS HUGEINT) * post) AS DECIMAL(38,0)) AS sxy
          FROM users),
        withadj AS (
          SELECT variant, post,
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
                 CAST(round(CAST(post AS DOUBLE)
                    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                      * (CAST(pre AS DOUBLE)
                         - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                   AS BIGINT) AS adj
          FROM users, pooled),
        mo AS (
          SELECT max(theta) AS theta,
            CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN variant = 'A' THEN post ELSE 0 END) AS BIGINT) AS sy1,
            CAST(sum(CASE WHEN variant = 'A' THEN CAST(post AS HUGEINT) * post ELSE 0 END) AS DECIMAL(38,0)) AS qy1,
            CAST(sum(CASE WHEN variant = 'A' THEN adj ELSE 0 END) AS BIGINT) AS sa1,
            CAST(sum(CASE WHEN variant = 'A' THEN CAST(adj AS HUGEINT) * adj ELSE 0 END) AS DECIMAL(38,0)) AS qa1,
            CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(sum(CASE WHEN variant = 'B' THEN post ELSE 0 END) AS BIGINT) AS sy2,
            CAST(sum(CASE WHEN variant = 'B' THEN CAST(post AS HUGEINT) * post ELSE 0 END) AS DECIMAL(38,0)) AS qy2,
            CAST(sum(CASE WHEN variant = 'B' THEN adj ELSE 0 END) AS BIGINT) AS sa2,
            CAST(sum(CASE WHEN variant = 'B' THEN CAST(adj AS HUGEINT) * adj ELSE 0 END) AS DECIMAL(38,0)) AS qa2
          FROM withadj)
        SELECT n1, n2, round(theta, 6) AS theta,
          round((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                / sqrt(((CAST(n1 AS DOUBLE) * CAST(qy1 AS DOUBLE)
                         - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
                        / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
                       / CAST(n1 AS DOUBLE)
                       + ((CAST(n2 AS DOUBLE) * CAST(qy2 AS DOUBLE)
                           - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE))
                          / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)))
                       / CAST(n2 AS DOUBLE)), 4) AS t_raw,
          round((CAST(sa1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(sa2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                / sqrt(((CAST(n1 AS DOUBLE) * CAST(qa1 AS DOUBLE)
                         - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE))
                        / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
                       / CAST(n1 AS DOUBLE)
                       + ((CAST(n2 AS DOUBLE) * CAST(qa2 AS DOUBLE)
                           - CAST(sa2 AS DOUBLE) * CAST(sa2 AS DOUBLE))
                          / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)))
                       / CAST(n2 AS DOUBLE)), 4) AS t_cuped,
          round((((CAST(n1 AS DOUBLE) * CAST(qa1 AS DOUBLE)
                   - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE))
                  / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
                 * (CAST(n1 AS DOUBLE) - 1.0)
                 + ((CAST(n2 AS DOUBLE) * CAST(qa2 AS DOUBLE)
                     - CAST(sa2 AS DOUBLE) * CAST(sa2 AS DOUBLE))
                    / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)))
                 * (CAST(n2 AS DOUBLE) - 1.0))
                / (((CAST(n1 AS DOUBLE) * CAST(qy1 AS DOUBLE)
                     - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
                   * (CAST(n1 AS DOUBLE) - 1.0)
                   + ((CAST(n2 AS DOUBLE) * CAST(qy2 AS DOUBLE)
                       - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE))
                      / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)))
                   * (CAST(n2 AS DOUBLE) - 1.0)), 6) AS var_ratio
        FROM mo"""

  /** Difference-in-differences readout over the purchase stream —
    * the quasi-experimental companion to [[abTTest]]/[[abCuped]] for
    * when assignment is NOT randomized (a rollout, a policy change):
    * DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) nets out both
    * the group baseline and the common time trend, identifying the
    * effect under parallel trends. Groups come from the same md5
    * bucket parity as [[abCuped]]; the pre/post cut is the same
    * deterministic epoch midpoint of the purchase stream — both
    * reproducible across engines, no config drift between the A/B
    * operators. Cell sums are exact micro-unit BIGINTs off ONE
    * map-side-combined aggregate to FOUR cells; the four means and
    * the DiD are pinned divisions in the final projection.
    */
  def didPurchaseValue(spark: SparkSession, dir: String,
      salt: String = "ab"): DataFrame =
    didPurchaseValueOf(Tables.events(spark, dir), salt)

  /** DiD core over any (user_id, ts, event_type, value) frame. */
  def didPurchaseValueOf(events: DataFrame,
      salt: String = "ab"): DataFrame = {
    import events.sparkSession.implicits._
    val p = events
      .filter($"event_type" === "purchase")
      .select($"user_id", expr("unix_micros(ts)").as("tus"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("x"))
    val cut = p.agg(expr("(min(tus) + max(tus)) div 2").as("cut"))
    def mean(sc: Column, nc: Column): Column =
      round(sc.cast("double") / (nc.cast("double") * 1.0e6), 4)
    p.crossJoin(broadcast(cut))
      .withColumn("treat",
        when(Sampling.bucket($"user_id", salt) % 2 === 0, 0L).otherwise(1L))
      .withColumn("post", when($"tus" >= $"cut", 1L).otherwise(0L))
      .agg(
        sum(when($"treat" === 1L && $"post" === 1L, 1L).otherwise(0L)).as("n_tp"),
        sum(when($"treat" === 1L && $"post" === 1L, $"x").otherwise(0L)).as("s_tp"),
        sum(when($"treat" === 1L && $"post" === 0L, 1L).otherwise(0L)).as("n_tr"),
        sum(when($"treat" === 1L && $"post" === 0L, $"x").otherwise(0L)).as("s_tr"),
        sum(when($"treat" === 0L && $"post" === 1L, 1L).otherwise(0L)).as("n_cp"),
        sum(when($"treat" === 0L && $"post" === 1L, $"x").otherwise(0L)).as("s_cp"),
        sum(when($"treat" === 0L && $"post" === 0L, 1L).otherwise(0L)).as("n_cr"),
        sum(when($"treat" === 0L && $"post" === 0L, $"x").otherwise(0L)).as("s_cr"))
      .select($"n_tp", $"n_tr", $"n_cp", $"n_cr",
        mean($"s_tp", $"n_tp").as("mean_treat_post"),
        mean($"s_tr", $"n_tr").as("mean_treat_pre"),
        mean($"s_cp", $"n_cp").as("mean_ctrl_post"),
        mean($"s_cr", $"n_cr").as("mean_ctrl_pre"),
        round((($"s_tp".cast("double") / ($"n_tp".cast("double") * 1.0e6)
            - $"s_tr".cast("double") / ($"n_tr".cast("double") * 1.0e6))
          - ($"s_cp".cast("double") / ($"n_cp".cast("double") * 1.0e6)
            - $"s_cr".cast("double") / ($"n_cr".cast("double") * 1.0e6))), 4)
          .as("did"))
  }

  def didPurchaseValueSql(salt: String = "ab"): String =
    s"""WITH p AS (
          SELECT user_id,
                 epoch_us(date_trunc('microseconds', ts)) AS tus,
                 CAST(round(value * 1000000) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase'),
        cut AS (SELECT (min(tus) + max(tus)) // 2 AS cut FROM p),
        c AS (
          SELECT CASE WHEN ${Sampling.bucketSql("user_id", salt)} % 2 = 0
                      THEN 0 ELSE 1 END AS treat,
                 CASE WHEN tus >= cut THEN 1 ELSE 0 END AS post, x
          FROM p, cut),
        a AS (
          SELECT
            CAST(sum(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
            CAST(sum(CASE WHEN treat = 1 AND post = 1 THEN x ELSE 0 END) AS BIGINT) AS s_tp,
            CAST(sum(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
            CAST(sum(CASE WHEN treat = 1 AND post = 0 THEN x ELSE 0 END) AS BIGINT) AS s_tr,
            CAST(sum(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
            CAST(sum(CASE WHEN treat = 0 AND post = 1 THEN x ELSE 0 END) AS BIGINT) AS s_cp,
            CAST(sum(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cr,
            CAST(sum(CASE WHEN treat = 0 AND post = 0 THEN x ELSE 0 END) AS BIGINT) AS s_cr
          FROM c)
        SELECT n_tp, n_tr, n_cp, n_cr,
          round(CAST(s_tp AS DOUBLE) / (CAST(n_tp AS DOUBLE) * 1000000), 4)
            AS mean_treat_post,
          round(CAST(s_tr AS DOUBLE) / (CAST(n_tr AS DOUBLE) * 1000000), 4)
            AS mean_treat_pre,
          round(CAST(s_cp AS DOUBLE) / (CAST(n_cp AS DOUBLE) * 1000000), 4)
            AS mean_ctrl_post,
          round(CAST(s_cr AS DOUBLE) / (CAST(n_cr AS DOUBLE) * 1000000), 4)
            AS mean_ctrl_pre,
          round((CAST(s_tp AS DOUBLE) / (CAST(n_tp AS DOUBLE) * 1000000)
                 - CAST(s_tr AS DOUBLE) / (CAST(n_tr AS DOUBLE) * 1000000))
                - (CAST(s_cp AS DOUBLE) / (CAST(n_cp AS DOUBLE) * 1000000)
                   - CAST(s_cr AS DOUBLE) / (CAST(n_cr AS DOUBLE) * 1000000)),
                4) AS did
        FROM a"""

  /** Data-driven Markov (removal-effect) attribution — the
    * principled alternative to the positional rules ([[Analytics]]'
    * last-touch and linear gates): model user journeys as a
    * first-order chain over channels with START/CONV/NULL states,
    * and credit each channel by how much the conversion probability
    * DROPS when it is removed from the chain (Anderl et al. 2014's
    * removal effect). Journeys truncate at the first purchase (the
    * conversion); a journey with no purchase terminates in NULL.
    *
    * Exactness device: transition probabilities are integer ppm
    * (`n·10⁶ div out_total`), and absorption is computed by a
    * BOUNDED 12-step power iteration whose state vector is
    * re-quantized to ppm by trunc division after every step — the
    * same documented-truncation posture as the EWMA/betweenness
    * gates — so every scenario replays bit-for-bit as 12 unrolled
    * SQL CTEs over the ≤(channels+3)²-row matrix. Channels are a
    * CONFIG input (like the BM25 workload): the oracle is static
    * text, and an unlisted event type simply never enters a journey.
    *
    * Scale shape: journey construction (per-user ordered prefix +
    * lead) is the distributed work and shuffles only (user, type,
    * ts) scalars; the chain itself is metadata (≤ 49 rows), so the
    * scenario folds run driver-side — the [[Pca]] Jacobi contract:
    * collect is bounded by the CHANNEL count, never the corpus.
    */
  def markovAttribution(spark: SparkSession, dir: String,
      channels: Seq[String] = Seq("click", "error", "signup", "view"),
      steps: Int = 12): DataFrame =
    markovAttributionOf(Tables.events(spark, dir), channels, steps)

  /** Attribution core over any (user_id, ts, event_type, event_id)
    * frame — lets specs plant journeys with known removal effects.
    */
  def markovAttributionOf(events: DataFrame,
      channels: Seq[String], steps: Int = 12): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val tagged = events
      .filter($"event_type" === "purchase" ||
        $"event_type".isin(channels.map(lit): _*))
      .select($"user_id", $"event_type", unix_timestamp($"ts").as("ts_sec"),
        $"event_id")
      .withColumn("rn", row_number().over(w))
    val firstP = tagged.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"rn").as("prn"))
    val journey = tagged.join(firstP, Seq("user_id"), "left")
      .filter($"prn".isNull || $"rn" <= $"prn")
      .withColumn("state", when($"event_type" === "purchase", "__CONV")
        .otherwise($"event_type"))
    val wj = Window.partitionBy($"user_id").orderBy($"rn")
    val hops = journey
      .withColumn("from_state",
        coalesce(lag($"state", 1).over(wj), lit("__START")))
      .select($"from_state", $"state".as("to_state"))
      .unionByName(journey
        .withColumn("nxt", lead($"state", 1).over(wj))
        .filter($"nxt".isNull && $"state" =!= "__CONV")
        .select($"state".as("from_state"), lit("__NULL").as("to_state")))
    val counts = hops.groupBy($"from_state", $"to_state")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy($"from_state").agg(sum($"n").as("tot"))
    // the chain is metadata: ≤ (|channels|+3)² rows — bounded by the
    // CONFIG, not the corpus (documented collect contract)
    val matrix = counts.join(totals, "from_state")
      .select($"from_state", $"to_state",
        expr("(n * 1000000) div tot").as("p_ppm"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    def absorbed(removed: Option[String]): Long = {
      var v = Map[String, Long]("__START" -> 1000000L)
      var conv = 0L
      for (_ <- 1 to steps) {
        val nv = scala.collection.mutable.Map.empty[String, Long]
        for {
          ((f, t), p) <- matrix
          if f != "__CONV" && f != "__NULL" &&
            removed.forall(c => f != c && t != c)
          m = v.getOrElse(f, 0L)
          if m > 0L
        } nv(t) = nv.getOrElse(t, 0L) + m * p
        v = nv.map { case (k, s) => k -> s / 1000000L }.toMap
        conv += v.getOrElse("__CONV", 0L)
        v = v - "__CONV" - "__NULL"
      }
      conv
    }
    val base = absorbed(None)
    val effects = channels.sorted.map { c =>
      val rc = absorbed(Some(c))
      (c, base, rc, math.max(0L, base - rc))
    }
    val sumEff = effects.map(_._4).sum
    effects.map { case (c, b, rc, e) =>
      (c, b, rc, e, if (sumEff > 0) e * 1000000L / sumEff else 0L)
    }.toDF("channel", "base_conv_ppm", "removed_conv_ppm",
      "effect_ppm", "share_ppm")
  }

  def markovAttributionSql(
      channels: Seq[String] = Seq("click", "error", "signup", "view"),
      steps: Int = 12): String = {
    val chList = channels.map(c => s"'$c'").mkString(", ")
    // every CTE is AS MATERIALIZED: DuckDB INLINES chained CTEs, so
    // without it each power-iteration step re-evaluates the whole
    // window-function base recursively — ~78 chained steps made the
    // plain form burn >12 min on 10k rows (r12 board-zeroing defect);
    // materialized, the identical query runs in ~0.6 s and is
    // hash-identical to the Spark output.
    def chain(tag: String, removedPred: String): String = {
      val t = s"""t_$tag AS MATERIALIZED (
           SELECT from_state, to_state, p_ppm FROM m WHERE $removedPred)"""
      val steps_ = (1 to steps).map { i =>
        val prev = if (i == 1) "v0" else s"v_${tag}_${i - 1}"
        s"""v_${tag}_$i AS MATERIALIZED (
           SELECT t.to_state AS state,
                  CAST(sum(v.m * t.p_ppm) // 1000000 AS BIGINT) AS m
           FROM $prev v JOIN t_$tag t ON t.from_state = v.state
           WHERE v.state NOT IN ('__CONV', '__NULL')
           GROUP BY 1)"""
      }
      val convSum = (1 to steps).map(i =>
        s"coalesce((SELECT m FROM v_${tag}_$i WHERE state = '__CONV'), 0)")
        .mkString(" + ")
      (Seq(t) ++ steps_ :+
        s"""c_$tag AS MATERIALIZED (SELECT CAST($convSum AS BIGINT) AS conv)""")
        .mkString(",\n       ")
    }
    val removalChains = channels.sorted.zipWithIndex.map { case (c, i) =>
      chain(s"r$i", s"from_state <> '$c' AND to_state <> '$c'")
    }
    val removalRows = channels.sorted.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS channel, (SELECT conv FROM c_r$i) AS removed" }
      .mkString("\n           UNION ALL ")
    s"""WITH j0 AS MATERIALIZED (
         SELECT user_id, event_type,
                CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_id,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                            event_id) AS rn
         FROM events
         WHERE event_type = 'purchase' OR event_type IN ($chList)),
       fp AS MATERIALIZED (SELECT user_id, min(rn) AS prn FROM j0
              WHERE event_type = 'purchase' GROUP BY 1),
       j AS MATERIALIZED (
         SELECT j0.user_id, j0.rn,
                CASE WHEN j0.event_type = 'purchase' THEN '__CONV'
                     ELSE j0.event_type END AS state
         FROM j0 LEFT JOIN fp ON fp.user_id = j0.user_id
         WHERE fp.prn IS NULL OR j0.rn <= fp.prn),
       hops AS MATERIALIZED (
         SELECT coalesce(lag(state) OVER (PARTITION BY user_id ORDER BY rn),
                         '__START') AS from_state,
                state AS to_state
         FROM j
         UNION ALL
         SELECT state, '__NULL' FROM (
           SELECT state, lead(state) OVER (PARTITION BY user_id
                                           ORDER BY rn) AS nxt
           FROM j) x
         WHERE nxt IS NULL AND state <> '__CONV'),
       cnt AS MATERIALIZED (SELECT from_state, to_state,
                CAST(count(*) AS BIGINT) AS n
               FROM hops GROUP BY 1, 2),
       m AS MATERIALIZED (
         SELECT from_state, to_state,
                CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_state)
                  AS BIGINT) AS p_ppm
         FROM cnt),
       v0 AS MATERIALIZED (SELECT '__START' AS state,
              CAST(1000000 AS BIGINT) AS m),
       ${chain("base", "TRUE")},
       ${removalChains.mkString(",\n       ")},
       eff AS MATERIALIZED (
         SELECT channel,
                (SELECT conv FROM c_base) AS base_conv_ppm,
                removed AS removed_conv_ppm,
                CAST(greatest(0, (SELECT conv FROM c_base) - removed)
                  AS BIGINT) AS effect_ppm
         FROM (${removalRows}) r),
       tot AS MATERIALIZED (SELECT CAST(sum(effect_ppm) AS BIGINT) AS s
              FROM eff)
       SELECT channel, base_conv_ppm, removed_conv_ppm, effect_ppm,
              CAST(CASE WHEN tot.s > 0
                   THEN (effect_ppm * 1000000) // tot.s ELSE 0 END
                AS BIGINT) AS share_ppm
       FROM eff, tot ORDER BY channel"""
  }

  /** Kaplan–Meier survival curve for time-to-repeat-purchase with
    * right-censoring (Kaplan/Meier, JASA 1958) — the
    * time-to-convert distribution done RIGHT when the window hasn't
    * closed: a user who hasn't purchased twice yet is CENSORED at
    * the observation end, not dropped (dropping them biases the
    * curve optimistic — exactly the mistake `time_to_convert`-style
    * means make on an open cohort). Duration = whole hours from
    * first to second purchase; censored duration = hours from first
    * purchase to the corpus max timestamp.
    *
    * Exactness device: S(t) = Π_{u≤t} (1 − d_u/n_u) is an ordered
    * PRODUCT — fp-hostile — so it's computed as
    * exp(Σ ln((n−d)/n)) with each step's ln quantized ONCE to
    * integer micro-nats: the prefix sums are exact BIGINTs in any
    * order, and exp is one pinned call per output row. The at-risk
    * count n_u comes from the DURATION HISTOGRAM (one row per
    * distinct duration) via an exclusive prefix sum — the
    * domain-sized-window family of olap_ks_test, never a
    * corpus-sized scan; the per-user duration pass is one window
    * partitioned by user.
    */
  def survivalRepeatPurchase(spark: SparkSession, dir: String): DataFrame =
    survivalRepeatPurchaseOf(Tables.events(spark, dir))

  /** KM core over any (user_id, ts, event_type) frame. */
  def survivalRepeatPurchaseOf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val p = events.filter($"event_type" === "purchase")
      .select($"user_id", expr("unix_micros(ts)").as("tus"))
    val horizon = p.agg(max($"tus").as("h_us"))
    val wU = Window.partitionBy($"user_id").orderBy($"tus")
    val perUser = p
      .withColumn("rn", row_number().over(wU))
      .filter($"rn" <= 2)
      .groupBy($"user_id")
      .agg(min($"tus").as("t1"),
        max(when($"rn" === 2, $"tus")).as("t2"))
      .crossJoin(broadcast(horizon))
      .select(
        when($"t2".isNotNull,
          expr("(t2 - t1) div 3600000000")).otherwise(
          expr("(h_us - t1) div 3600000000")).as("dur_h"),
        when($"t2".isNotNull, 1L).otherwise(0L).as("event"))
    val hist = perUser.groupBy($"dur_h")
      .agg(sum($"event").as("d"),
        sum(lit(1L) - $"event").as("c"))
    val wT = Window.orderBy($"dur_h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = hist.agg(sum($"d" + $"c").as("n_total"))
    hist.crossJoin(broadcast(total))
      .withColumn("left_before",
        coalesce(sum($"d" + $"c").over(wT), lit(0L)))
      .withColumn("n_risk", $"n_total" - $"left_before")
      .filter($"d" > 0L)
      // per-step ln((n−d)/n) in integer micro-nats, then an exact
      // running BIGINT sum in the same ordered pass
      // n_risk == d can only happen at the LAST duration (no one is
      // left after it): its step is pinned to 0 and survival to 0.0,
      // dodging ln(0) without perturbing any earlier prefix
      .withColumn("step_micro",
        when($"n_risk" > $"d",
          round(log(($"n_risk" - $"d").cast("double") /
            $"n_risk".cast("double")) * lit(1.0e6)).cast("long"))
          .otherwise(0L))
      .withColumn("lnS_micro", sum($"step_micro").over(
        Window.orderBy($"dur_h")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"dur_h", $"n_risk", $"d".as("n_events"),
        $"c".as("n_censored"),
        when($"n_risk" === $"d", lit(0.0))
          .otherwise(round(exp($"lnS_micro".cast("double") / lit(1.0e6)), 6))
          .as("survival"))
      .orderBy($"dur_h")
  }

  val survivalRepeatPurchaseSql: String =
    """WITH p AS (
         SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS tus
         FROM events WHERE event_type = 'purchase'),
       h AS (SELECT max(tus) AS h_us FROM p),
       r AS (
         SELECT user_id, tus,
                row_number() OVER (PARTITION BY user_id ORDER BY tus) AS rn
         FROM p),
       u AS (
         SELECT user_id, min(tus) AS t1,
                max(CASE WHEN rn = 2 THEN tus END) AS t2
         FROM r WHERE rn <= 2 GROUP BY 1),
       d AS (
         SELECT CASE WHEN t2 IS NOT NULL THEN (t2 - t1) // 3600000000
                     ELSE (h_us - t1) // 3600000000 END AS dur_h,
                CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS event
         FROM u, h),
       hist AS (
         SELECT dur_h, CAST(sum(event) AS BIGINT) AS d,
                CAST(sum(1 - event) AS BIGINT) AS c
         FROM d GROUP BY 1),
       t AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_total FROM hist),
       risk AS (
         SELECT dur_h, d, c,
                n_total - CAST(coalesce(sum(d + c) OVER (ORDER BY dur_h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
         FROM hist, t),
       steps AS (
         SELECT dur_h, n_risk, d, c,
                CASE WHEN n_risk > d THEN
                  CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                             / CAST(n_risk AS DOUBLE)) * 1000000) AS BIGINT)
                ELSE 0 END AS step_micro
         FROM risk WHERE d > 0)
       SELECT dur_h, n_risk, d AS n_events, c AS n_censored,
              CASE WHEN n_risk = d THEN 0.0
                   ELSE round(exp(CAST(sum(step_micro) OVER (ORDER BY dur_h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE) / 1000000), 6)
              END AS survival
       FROM steps ORDER BY dur_h"""

  /** Log-rank test (Mantel 1966) comparing time-to-repeat-purchase
    * survival between two user cohorts (user_id parity — the
    * deterministic assignment device of [[abSrmCheck]]): at each
    * distinct event duration t, group 1 is expected to contribute
    * d_t·n1_t/n_t of the d_t events under H₀ "same hazard"; the
    * statistic accumulates observed−expected and the
    * hypergeometric variance V_t = d_t·(n1/n)·(n0/n)·(n−d)/(n−1).
    * The chi-square companion to the KM curve
    * ([[survivalRepeatPurchaseOf]]) — KM draws the two curves,
    * log-rank says whether they differ.
    *
    * Exactness device: counts (d, c, at-risk) are exact BIGINTs off
    * the per-group DURATION HISTOGRAM (exclusive prefix sums over
    * the duration spine — the KM domain-sized-window family, never
    * corpus-sized); each row's expected/variance term is quantized
    * ONCE to integer micro-units (one double expression per term,
    * identical shape both engines), the micro sums are exact BIGINT
    * in any order, and the final chi² is one pinned division.
    */
  def logRankRepeatPurchase(spark: SparkSession, dir: String): DataFrame =
    logRankRepeatPurchaseOf(Tables.events(spark, dir))

  def logRankRepeatPurchaseOf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val p = events.filter($"event_type" === "purchase")
      .select($"user_id", expr("unix_micros(ts)").as("tus"))
    val horizon = p.agg(max($"tus").as("h_us"))
    val wU = Window.partitionBy($"user_id").orderBy($"tus")
    val perUser = p
      .withColumn("rn", row_number().over(wU))
      .filter($"rn" <= 2)
      .groupBy($"user_id")
      .agg(min($"tus").as("t1"),
        max(when($"rn" === 2, $"tus")).as("t2"))
      .crossJoin(broadcast(horizon))
      .select(($"user_id" % 2).as("g"),
        when($"t2".isNotNull,
          expr("(t2 - t1) div 3600000000")).otherwise(
          expr("(h_us - t1) div 3600000000")).as("dur_h"),
        when($"t2".isNotNull, 1L).otherwise(0L).as("event"))
    val hist = perUser.groupBy($"dur_h")
      .agg(sum(when($"g" === 0L, $"event").otherwise(0L)).as("d0"),
        sum(when($"g" === 0L, lit(1L) - $"event").otherwise(0L)).as("c0"),
        sum(when($"g" === 1L, $"event").otherwise(0L)).as("d1"),
        sum(when($"g" === 1L, lit(1L) - $"event").otherwise(0L)).as("c1"))
    val totals = hist.agg(sum($"d0" + $"c0").as("tot0"),
      sum($"d1" + $"c1").as("tot1"))
    val before = Window.orderBy($"dur_h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = hist.crossJoin(broadcast(totals))
      .withColumn("n0",
        $"tot0" - coalesce(sum($"d0" + $"c0").over(before), lit(0L)))
      .withColumn("n1",
        $"tot1" - coalesce(sum($"d1" + $"c1").over(before), lit(0L)))
      .withColumn("d", $"d0" + $"d1")
      .withColumn("n", $"n0" + $"n1")
      .filter($"d" > 0L)
    val agg = risk
      .withColumn("e1_micro",
        round($"d".cast("double") * $"n1".cast("double") /
          $"n".cast("double") * lit(1.0e6)).cast("long"))
      .withColumn("v_micro",
        when($"n" > 1L,
          round($"d".cast("double") * $"n1".cast("double") *
            $"n0".cast("double") * ($"n" - $"d").cast("double") /
            ($"n".cast("double") * $"n".cast("double") *
              ($"n" - 1L).cast("double")) * lit(1.0e6)).cast("long"))
          .otherwise(0L))
      .agg(sum($"d1").as("o1"), sum($"e1_micro").as("e1_micro"),
        sum($"v_micro").as("v_micro"))
    agg.crossJoin(broadcast(totals))
      .select($"tot0".as("n_group0"), $"tot1".as("n_group1"),
        $"o1", $"e1_micro", $"v_micro",
        when($"v_micro" > 0L,
          round(($"o1".cast("double") * lit(1.0e6) -
            $"e1_micro".cast("double")) *
            ($"o1".cast("double") * lit(1.0e6) -
              $"e1_micro".cast("double")) /
            ($"v_micro".cast("double") * lit(1.0e6)), 4))
          .otherwise(lit(0.0)).as("chi2"))
  }

  val logRankRepeatPurchaseSql: String =
    """WITH p AS (
         SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS tus
         FROM events WHERE event_type = 'purchase'),
       h AS (SELECT max(tus) AS h_us FROM p),
       r AS (
         SELECT user_id, tus,
                row_number() OVER (PARTITION BY user_id ORDER BY tus) AS rn
         FROM p),
       u AS (
         SELECT user_id, min(tus) AS t1,
                max(CASE WHEN rn = 2 THEN tus END) AS t2
         FROM r WHERE rn <= 2 GROUP BY 1),
       d AS (
         SELECT user_id % 2 AS g,
                CASE WHEN t2 IS NOT NULL THEN (t2 - t1) // 3600000000
                     ELSE (h_us - t1) // 3600000000 END AS dur_h,
                CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS event
         FROM u, h),
       hist AS (
         SELECT dur_h,
                CAST(sum(CASE WHEN g = 0 THEN event ELSE 0 END) AS BIGINT) AS d0,
                CAST(sum(CASE WHEN g = 0 THEN 1 - event ELSE 0 END) AS BIGINT) AS c0,
                CAST(sum(CASE WHEN g = 1 THEN event ELSE 0 END) AS BIGINT) AS d1,
                CAST(sum(CASE WHEN g = 1 THEN 1 - event ELSE 0 END) AS BIGINT) AS c1
         FROM d GROUP BY 1),
       t AS (SELECT CAST(sum(d0 + c0) AS BIGINT) AS tot0,
                    CAST(sum(d1 + c1) AS BIGINT) AS tot1 FROM hist),
       risk AS (
         SELECT dur_h, d0, d1,
                tot0 - CAST(coalesce(sum(d0 + c0) OVER (ORDER BY dur_h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n0,
                tot1 - CAST(coalesce(sum(d1 + c1) OVER (ORDER BY dur_h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n1
         FROM hist, t),
       terms AS (
         SELECT d0 + d1 AS d, n0 + n1 AS n, d1, n0, n1,
                CAST(round(CAST(d0 + d1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                  / CAST(n0 + n1 AS DOUBLE) * 1000000.0) AS BIGINT)
                  AS e1_micro,
                CASE WHEN n0 + n1 > 1 THEN
                  CAST(round(CAST(d0 + d1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                    * CAST(n0 AS DOUBLE)
                    * CAST(n0 + n1 - d0 - d1 AS DOUBLE)
                    / (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 AS DOUBLE)
                       * CAST(n0 + n1 - 1 AS DOUBLE)) * 1000000.0) AS BIGINT)
                ELSE 0 END AS v_micro
         FROM risk WHERE d0 + d1 > 0),
       agg AS (
         SELECT CAST(sum(d1) AS BIGINT) AS o1,
                CAST(sum(e1_micro) AS BIGINT) AS e1_micro,
                CAST(sum(v_micro) AS BIGINT) AS v_micro
         FROM terms)
       SELECT tot0 AS n_group0, tot1 AS n_group1, o1, e1_micro, v_micro,
              CASE WHEN v_micro > 0 THEN
                round((CAST(o1 AS DOUBLE) * 1000000.0
                       - CAST(e1_micro AS DOUBLE))
                      * (CAST(o1 AS DOUBLE) * 1000000.0
                         - CAST(e1_micro AS DOUBLE))
                      / (CAST(v_micro AS DOUBLE) * 1000000.0), 4)
              ELSE 0.0 END AS chi2
       FROM agg, t"""

  /** Nelson–Aalen cumulative-hazard estimator for time-to-repeat-
    * purchase (Nelson 1972, Aalen 1978) — the additive companion to
    * the KM product ([[survivalRepeatPurchaseOf]]): Ĥ(t) =
    * Σ_{u≤t} d_u/n_u accumulates hazard directly, so unlike KM it
    * needs NO logs at all — each step is the exact integer floor
    * division (d·10⁶) div n, and the running hazard is an exact
    * BIGINT prefix sum in micro units. exp(−Ĥ) (the Fleming–
    * Harrington survival) is left to the caller, keeping the gate
    * 100 % integer. Same duration-histogram at-risk device and
    * domain-sized window family as the KM gate.
    */
  def nelsonAalenRepeatPurchase(spark: SparkSession, dir: String): DataFrame =
    nelsonAalenRepeatPurchaseOf(Tables.events(spark, dir))

  def nelsonAalenRepeatPurchaseOf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val p = events.filter($"event_type" === "purchase")
      .select($"user_id", expr("unix_micros(ts)").as("tus"))
    val horizon = p.agg(max($"tus").as("h_us"))
    val wU = Window.partitionBy($"user_id").orderBy($"tus")
    val perUser = p
      .withColumn("rn", row_number().over(wU))
      .filter($"rn" <= 2)
      .groupBy($"user_id")
      .agg(min($"tus").as("t1"),
        max(when($"rn" === 2, $"tus")).as("t2"))
      .crossJoin(broadcast(horizon))
      .select(
        when($"t2".isNotNull,
          expr("(t2 - t1) div 3600000000")).otherwise(
          expr("(h_us - t1) div 3600000000")).as("dur_h"),
        when($"t2".isNotNull, 1L).otherwise(0L).as("event"))
    val hist = perUser.groupBy($"dur_h")
      .agg(sum($"event").as("d"), sum(lit(1L) - $"event").as("c"))
    val wT = Window.orderBy($"dur_h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = hist.agg(sum($"d" + $"c").as("n_total"))
    hist.crossJoin(broadcast(total))
      .withColumn("left_before",
        coalesce(sum($"d" + $"c").over(wT), lit(0L)))
      .withColumn("n_risk", $"n_total" - $"left_before")
      .filter($"d" > 0L)
      .withColumn("step_micro", expr("(d * 1000000) div n_risk"))
      .withColumn("h_micro", sum($"step_micro").over(
        Window.orderBy($"dur_h")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"dur_h", $"n_risk", $"d".as("n_events"),
        $"c".as("n_censored"), $"step_micro", $"h_micro")
      .orderBy($"dur_h")
  }

  val nelsonAalenRepeatPurchaseSql: String =
    """WITH p AS (
         SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS tus
         FROM events WHERE event_type = 'purchase'),
       h AS (SELECT max(tus) AS h_us FROM p),
       r AS (
         SELECT user_id, tus,
                row_number() OVER (PARTITION BY user_id ORDER BY tus) AS rn
         FROM p),
       u AS (
         SELECT user_id, min(tus) AS t1,
                max(CASE WHEN rn = 2 THEN tus END) AS t2
         FROM r WHERE rn <= 2 GROUP BY 1),
       d AS (
         SELECT CASE WHEN t2 IS NOT NULL THEN (t2 - t1) // 3600000000
                     ELSE (h_us - t1) // 3600000000 END AS dur_h,
                CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS event
         FROM u, h),
       hist AS (
         SELECT dur_h, CAST(sum(event) AS BIGINT) AS d,
                CAST(sum(1 - event) AS BIGINT) AS c
         FROM d GROUP BY 1),
       t AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_total FROM hist),
       risk AS (
         SELECT dur_h, d, c,
                n_total - CAST(coalesce(sum(d + c) OVER (ORDER BY dur_h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
         FROM hist, t),
       steps AS (
         SELECT dur_h, n_risk, d, c,
                (d * 1000000) // n_risk AS step_micro
         FROM risk WHERE d > 0)
       SELECT dur_h, n_risk, d AS n_events, c AS n_censored,
              CAST(step_micro AS BIGINT) AS step_micro,
              CAST(sum(step_micro) OVER (ORDER BY dur_h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS h_micro
       FROM steps ORDER BY dur_h"""

  /** Wilson score interval (Wilson, JASA 1927) for the
    * high-value-event proportion per event type — the proportion CI
    * that stays honest at extreme p̂ and small n where the Wald
    * interval p̂ ± z√(p̂q̂/n) collapses or escapes [0,1]: Wilson
    * inverts the score test, so the bounds are always inside [0,1]
    * and never zero-width at p̂ ∈ {0,1}. z is the BUILD-TIME
    * quantized 1.959964 micro constant (both engines multiply the
    * same literal); (k, n) are exact BIGINTs off one partial-agg'd
    * pass; each bound is one double expression over those integers,
    * rounded once to ppm.
    */
  def wilsonCiByType(spark: SparkSession, dir: String,
      threshold: Double = 50.0): DataFrame = {
    import spark.implicits._
    val zm = 1959964L // round(1.959964 * 1e6): z_{0.975}
    val counts = Tables.events(spark, dir)
      .select($"event_type",
        when($"value" >= threshold, 1L).otherwise(0L).as("hi"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"hi").as("k"))
    counts
      .withColumn("z", lit(zm).cast("double") / lit(1.0e6))
      .withColumn("p", $"k".cast("double") / $"n".cast("double"))
      .withColumn("den", lit(1.0) + $"z" * $"z" / $"n".cast("double"))
      .withColumn("ctr", $"p" + $"z" * $"z" / (lit(2.0) * $"n".cast("double")))
      .withColumn("half", $"z" * sqrt($"p" * (lit(1.0) - $"p") /
        $"n".cast("double") +
        $"z" * $"z" / (lit(4.0) * $"n".cast("double") * $"n".cast("double"))))
      .select($"event_type", $"n", $"k",
        expr("(k * 1000000) div n").as("p_ppm"),
        round(($"ctr" - $"half") / $"den" * lit(1.0e6)).cast("long")
          .as("lo_ppm"),
        round(($"ctr" + $"half") / $"den" * lit(1.0e6)).cast("long")
          .as("hi_ppm"))
      .orderBy($"event_type")
  }

  def wilsonCiByTypeSql(threshold: Double = 50.0): String =
    s"""WITH counts AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN value >= $threshold THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
         FROM events GROUP BY 1),
       w AS (
         SELECT event_type, n, k,
                CAST(1959964 AS DOUBLE) / 1000000.0 AS z,
                CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p
         FROM counts),
       parts AS (
         SELECT event_type, n, k, z, p,
                1.0 + z * z / CAST(n AS DOUBLE) AS den,
                p + z * z / (2.0 * CAST(n AS DOUBLE)) AS ctr,
                z * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                  + z * z / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                  AS half
         FROM w)
       SELECT event_type, n, k,
              (k * 1000000) // n AS p_ppm,
              CAST(round((ctr - half) / den * 1000000.0) AS BIGINT) AS lo_ppm,
              CAST(round((ctr + half) / den * 1000000.0) AS BIGINT) AS hi_ppm
       FROM parts ORDER BY event_type"""

  /** EXACT Shapley-value multi-touch attribution (Shapley 1953;
    * Dalessandro et al. 2012 for the marketing use): each channel's
    * credit is its average marginal contribution over all 2^k
    * channel coalitions — the only attribution satisfying
    * efficiency/symmetry/dummy, where last-touch and linear are ad
    * hoc. With k = |channels| small (the real-world case), the
    * coalition lattice is ENUMERABLE: v(S) = converting users whose
    * touched-channel set ⊆ S, and φ_c·k! = Σ_{S∌c} |S|!(k−1−|S|)!·
    * (v(S∪c)−v(S)) is an exact INTEGER in k!-ths — no sampling, no
    * fp. Efficiency holds exactly: Σφ·k! = k!·(v(full)−v(∅)).
    *
    * Scale shape: one groupBy collapses events to a user frame
    * (conv flag + touched-set bitmask via SUM(DISTINCT 2^i) — the
    * distinct powers make the sum the bitwise OR); v() is one
    * conditional aggregate of that frame fanned over the 2^k-row
    * broadcast subset ladder; the Shapley fold joins the 2^k-row v
    * table against a k·2^(k-1)-row broadcast (channel, S) ladder.
    * Past k ≈ 10 the 2^k fan-out stops being free — that is a
    * different operator (sampled permutations), refused here by the
    * require.
    */
  /** Channel names are interpolated into generated CASE/VALUES text
    * in BOTH engines, so they must be plain identifiers — a quote
    * would break (or worse, rewrite) the generated expression. The
    * require names the offender; callers with exotic channel labels
    * should map them to slugs first.
    */
  private[operators] def requireSafeChannels(channels: Seq[String]): Unit = {
    val bad = channels.filterNot(_.matches("[A-Za-z0-9_.-]+"))
    require(bad.isEmpty,
      s"channel names must match [A-Za-z0-9_.-]+ (they are spliced into " +
        s"generated SQL); offending: ${bad.mkString(", ")}")
    require(channels.distinct.size == channels.size,
      s"duplicate channel names: ${channels.diff(channels.distinct).mkString(", ")}")
  }

  def shapleyAttribution(spark: SparkSession, dir: String,
      channels: Seq[String] =
        Seq("click", "error", "signup", "view")): DataFrame = {
    requireSafeChannels(channels)
    require(channels.size <= 10,
      s"shapleyAttribution enumerates 2^k coalitions: k=${channels.size} " +
        "is past the exact-lattice budget; use a sampled-permutation " +
        "estimator for wide channel sets")
    val spark0 = spark
    import spark0.implicits._
    val chs = channels.sorted
    val k = chs.size
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val powerOf = chs.zipWithIndex.map { case (c, i) => c -> (1L << i) }.toMap
    val maskExpr = chs.map(c =>
      s"WHEN '$c' THEN ${powerOf(c)}L").mkString(
      "CASE event_type ", " ", " ELSE NULL END")
    val users = Tables.events(spark, dir)
      .select($"user_id", $"event_type")
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"),
        coalesce(sum_distinct(expr(maskExpr)), lit(0L)).as("mask"))
      .filter($"conv" === 1L)
    val subsets = broadcast((0L until (1L << k)).toDF("s"))
    val v = users.crossJoin(subsets)
      .filter(expr("(mask & s) = mask"))
      .groupBy($"s").agg(count(lit(1)).as("v"))
    // absent subsets (no converting user fits) count as v = 0
    val vFull = subsets.join(v, Seq("s"), "left")
      .withColumn("v", coalesce($"v", lit(0L)))
    val ladder = broadcast((for {
      c <- chs
      s <- 0L until (1L << k)
      if (s & powerOf(c)) == 0L
    } yield {
      val size = java.lang.Long.bitCount(s)
      (c, s, s | powerOf(c), fact(size) * fact(k - 1 - size))
    }).toDF("channel", "s0", "s1", "w"))
    val phi = ladder
      .join(vFull.select($"s".as("s0"), $"v".as("v0")), Seq("s0"))
      .join(vFull.select($"s".as("s1"), $"v".as("v1")), Seq("s1"))
      .groupBy($"channel")
      .agg(sum($"w" * ($"v1" - $"v0")).as("phi_xkf"))
    val tot = phi.agg(sum($"phi_xkf").as("tot_xkf"))
    phi.crossJoin(broadcast(tot))
      .select($"channel", $"phi_xkf", $"tot_xkf",
        when($"tot_xkf" > 0L, expr("(phi_xkf * 1000000) div tot_xkf"))
          .otherwise(0L).as("share_ppm"))
      .orderBy($"channel")
  }

  def shapleyAttributionSql(
      channels: Seq[String] =
        Seq("click", "error", "signup", "view")): String = {
    requireSafeChannels(channels)
    val chs = channels.sorted
    val k = chs.size
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val powerOf = chs.zipWithIndex.map { case (c, i) => c -> (1L << i) }.toMap
    val maskExpr = chs.map(c =>
      s"WHEN '$c' THEN ${powerOf(c)}").mkString(
      "CASE event_type ", " ", " ELSE NULL END")
    val subsetRows = (0L until (1L << k)).map(s => s"($s)").mkString(", ")
    val ladderRows = (for {
      c <- chs
      s <- 0L until (1L << k)
      if (s & powerOf(c)) == 0L
    } yield {
      val size = java.lang.Long.bitCount(s)
      s"('$c', $s, ${s | powerOf(c)}, ${fact(size) * fact(k - 1 - size)})"
    }).mkString(",\n                 ")
    s"""WITH users AS (
         SELECT user_id,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS conv,
                coalesce(CAST(sum(DISTINCT $maskExpr) AS BIGINT), 0) AS mask
         FROM events GROUP BY 1),
       conv_users AS (SELECT mask FROM users WHERE conv = 1),
       subsets AS (SELECT CAST(s AS BIGINT) AS s
                   FROM (VALUES $subsetRows) t(s)),
       v AS (
         -- count(mask), not count(*): an unmatched subset row must
         -- read v = 0, not 1
         SELECT s, CAST(count(mask) AS BIGINT) AS v
         FROM subsets LEFT JOIN conv_users ON (mask & s) = mask
         GROUP BY s),
       ladder AS (
         SELECT channel, CAST(s0 AS BIGINT) AS s0,
                CAST(s1 AS BIGINT) AS s1, CAST(w AS BIGINT) AS w
         FROM (VALUES $ladderRows) t(channel, s0, s1, w)),
       phi AS (
         SELECT channel,
                CAST(sum(w * (v1.v - v0.v)) AS BIGINT) AS phi_xkf
         FROM ladder
         JOIN v v0 ON v0.s = ladder.s0
         JOIN v v1 ON v1.s = ladder.s1
         GROUP BY 1),
       tot AS (SELECT CAST(sum(phi_xkf) AS BIGINT) AS tot_xkf FROM phi)
       SELECT channel, phi_xkf, tot_xkf,
              CASE WHEN tot_xkf > 0
                   THEN CAST((phi_xkf * 1000000) // tot_xkf AS BIGINT)
                   ELSE 0 END AS share_ppm
       FROM phi, tot ORDER BY channel"""
  }

  /** SAMPLED-permutation Shapley attribution (Castro, Gómez &
    * Tejada, C&OR 2009) — the valve [[shapleyAttribution]]'s own
    * `require` names for wide channel sets: instead of the 2^k
    * coalition lattice, average each channel's marginal contribution
    * over `nPerms` sampled permutations; the estimator is unbiased
    * and its standard error shrinks as 1/√m.
    *
    * Determinism without a PRNG: permutation i orders channels by
    * md5("i:channel") hex (the library's md5-hash-family device) —
    * reproducible in ANY engine or language, which is what lets the
    * driver's Python reference replay it value-for-value. The whole
    * randomness budget is that fixed hash family; no seed state, no
    * platform RNG.
    *
    * Scale shape: the corpus collapses to the same converting-user
    * (mask) frame as the exact operator; the coalition values v(S)
    * are computed ONLY for the ≤ m·k+1 distinct prefix masks the
    * sampled permutations touch (broadcast of that domain-sized mask
    * list against the user frame — never 2^k), so k can be large.
    * All marginals are exact integers; the only fp is the terminal
    * standard-error sqrt, emitted as the `se_micro` error-bound
    * column the gate contract requires (`var_num` =
    * m²·sample-variance stays exact BIGINT next to it).
    *
    * No SQL oracle: the permutation sample is data-INdependent but
    * the md5-ordered permutation unrolling is a generated-text
    * program, not a fixed query shape — the gate is declared
    * rows-only and tools/selfcheck.py replays the whole estimator
    * (hash family included) in plain Python, while the spec pins
    * unbiasedness against the exact operator on a crafted lattice.
    */
  def shapleyAttributionSampled(spark: SparkSession, dir: String,
      channels: Seq[String] = Seq("click", "error", "signup", "view"),
      nPerms: Int = 200): DataFrame = {
    requireSafeChannels(channels)
    require(channels.size <= 63, "bitmask channels capped at 63")
    require(nPerms >= 2, "need >= 2 permutations for a sample variance")
    val spark0 = spark
    import spark0.implicits._
    val chs = channels.sorted
    val powerOf = chs.zipWithIndex.map { case (c, i) => c -> (1L << i) }.toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // (channel, predecessor mask, successor mask) per permutation slot
    val ladder = (1 to nPerms).flatMap { i =>
      val perm = chs.sortBy(c => (md5hex(s"$i:$c"), c))
      perm.scanLeft(("", 0L)) { case ((_, acc), c) =>
        (c, acc | powerOf(c))
      }.sliding(2).collect { case Seq((_, pred), (c, succ)) =>
        (c, pred, succ)
      }.toSeq
    }
    val maskExpr = chs.map(c =>
      s"WHEN '$c' THEN ${powerOf(c)}L").mkString(
      "CASE event_type ", " ", " ELSE NULL END")
    val users = Tables.events(spark, dir)
      .select($"user_id", $"event_type")
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"),
        coalesce(sum_distinct(expr(maskExpr)), lit(0L)).as("mask"))
      .filter($"conv" === 1L)
    // v(S) for exactly the masks the sample touches — m·k+1 at most;
    // inner join streams the user frame against the BROADCAST mask
    // list (the exact operator's subset-ladder shape), then the
    // domain-sized left join fills untouched masks with v = 0
    val needed = broadcast(
      (ladder.flatMap(r => Seq(r._2, r._3)).distinct :+ 0L)
        .distinct.toDF("s"))
    val counts = users.join(needed, expr("(mask & s) = mask"))
      .groupBy($"s").agg(count(lit(1)).as("cnt"))
    val v = needed.join(counts, Seq("s"), "left")
      .withColumn("v", coalesce($"cnt", lit(0L)))
    val ladderDf = broadcast(ladder.toDF("channel", "s0", "s1"))
    val phi = ladderDf
      .join(v.select($"s".as("s0"), $"v".as("v0")), Seq("s0"))
      .join(v.select($"s".as("s1"), $"v".as("v1")), Seq("s1"))
      .groupBy($"channel")
      .agg(sum($"v1" - $"v0").as("phi_sum"),
        sum(($"v1" - $"v0") * ($"v1" - $"v0")).as("phi_sq_sum"))
    val m = nPerms.toLong
    phi
      .withColumn("n_perms", lit(m))
      .withColumn("mean_micro", expr(s"(phi_sum * 1000000) div $m"))
      // var_num = m·Σd² − (Σd)² = m²·(population variance of the
      // per-permutation marginals); SE of the mean = √(var/m)/√m =
      // √var_num / m^(3/2) — ONE terminal sqrt, rounded to micro
      .withColumn("var_num",
        lit(m) * $"phi_sq_sum" - $"phi_sum" * $"phi_sum")
      .withColumn("se_micro",
        round(sqrt($"var_num".cast("double")) / (m.toDouble * math.sqrt(
          m.toDouble)) * 1.0e6).cast("long"))
      .select($"channel", $"n_perms", $"phi_sum", $"phi_sq_sum",
        $"mean_micro", $"var_num", $"se_micro")
      .orderBy($"channel")
  }

  def retentionCohorts(spark: SparkSession, dir: String,
      maxOffset: Int = 3): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"ts", $"user_id", $"event_type")
    val cohort = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("first_ts"))
      .select($"user_id", date_trunc("week", $"first_ts").as("cohort_wk"))
    val sizes = cohort.groupBy($"cohort_wk").agg(count(lit(1)).as("n_cohort"))
    val activity = ev
      .select($"user_id", date_trunc("week", $"ts").as("act_wk")).distinct()
    cohort.join(activity, "user_id")
      .withColumn("week_offset",
        (datediff($"act_wk".cast("date"), $"cohort_wk".cast("date"))
          .cast("long") / 7).cast("long"))
      .filter($"week_offset".between(0, maxOffset))
      .groupBy($"cohort_wk", $"week_offset")
      .agg(countDistinct($"user_id").as("n_active"))
      .join(broadcast(sizes), "cohort_wk")
      .select($"cohort_wk", $"week_offset", $"n_active", $"n_cohort",
        round($"n_active".cast("double") / $"n_cohort", 4).as("retention"))
  }

  val retentionCohortsSql: String =
    """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, user_id,
                          event_type FROM events),
       cohort AS (
         SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
         FROM ev WHERE event_type = 'signup' GROUP BY user_id),
       sizes AS (
         SELECT cohort_wk, CAST(count(*) AS BIGINT) AS n_cohort
         FROM cohort GROUP BY cohort_wk),
       activity AS (
         SELECT DISTINCT user_id, date_trunc('week', ts) AS act_wk FROM ev),
       cells AS (
         SELECT c.cohort_wk,
                CAST(date_diff('day', c.cohort_wk::DATE, a.act_wk::DATE) // 7
                     AS BIGINT) AS week_offset,
                CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_active
         FROM cohort c JOIN activity a ON c.user_id = a.user_id
         WHERE date_diff('day', c.cohort_wk::DATE, a.act_wk::DATE) // 7
               BETWEEN 0 AND 3
         GROUP BY 1, 2)
       SELECT x.cohort_wk, x.week_offset, x.n_active, s.n_cohort,
              round(x.n_active * 1.0 / s.n_cohort, 4) AS retention
       FROM cells x JOIN sizes s ON x.cohort_wk = s.cohort_wk"""

  /** Market-basket pair mining: parts co-purchased within an order,
    * top 20 by support. NOT the self-join the SQL states — per-order
    * baskets are collected once (one key-partitioned shuffle), pairs
    * are generated map-side from each sorted basket, and only (p1,
    * p2) scalars shuffle into the count. The pair expansion is
    * Σ basket² — the same per-key quadratic budget as the LSH bucket
    * joins, bounded here by order line cardinality (≤ single digits
    * in any order-lines schema), never corpus². Positions i<j of the
    * sorted basket with arr[i]<arr[j] count exactly the line pairs
    * with distinct parts, once each — spec'd equal to the join form.
    */
  def basketPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"l_partkey")).as("parts"))
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)),
                       y -> struct(x AS p1, y AS p2))))""")).as("pr"))
      .filter($"pr.p1" < $"pr.p2")
      .groupBy($"pr.p1".as("p1"), $"pr.p2".as("p2"))
      .agg(count(lit(1)).as("support"))
      .orderBy($"support".desc, $"p1", $"p2")
      .limit(20)
  }

  val basketPairsSql: String =
    """SELECT a.l_partkey AS p1, b.l_partkey AS p2,
              CAST(count(*) AS BIGINT) AS support
       FROM lineitem a JOIN lineitem b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2
       ORDER BY support DESC, p1, p2
       LIMIT 20"""

  /** Frequent 3-itemsets — the next association-mining order above
    * [[basketPairs]]: top ordered part triples co-purchased in one
    * order. Same map-side device, one level deeper: each sorted
    * basket enumerates its C(b, 3) ordered triples INSIDE the
    * per-order aggregate via nested codegen `transform`s — work is
    * Σ C(b, 3), linear in orders for bounded basket size b, and no
    * self-join of the fact table ever runs (the oracle's 3-way
    * self-join spelling is what a naive engine would do; it explodes
    * at scale exactly where this shape doesn't). For UNBOUNDED
    * baskets the classical A-priori prune (candidates only from
    * frequent pairs) bounds the enumeration instead; with TPC-H-ish
    * basket sizes ≤ 7 the direct form is strictly cheaper and the
    * prune would add a pass.
    */
  def basketTriples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"l_partkey")).as("parts"))
      .select(explode(expr(
        """flatten(flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)), (y, j) ->
               transform(slice(parts, i + j + 3, size(parts)),
                         z -> struct(x AS p1, y AS p2, z AS p3))))))"""))
        .as("tr"))
      .filter($"tr.p1" < $"tr.p2" && $"tr.p2" < $"tr.p3")
      .groupBy($"tr.p1".as("p1"), $"tr.p2".as("p2"), $"tr.p3".as("p3"))
      .agg(count(lit(1)).as("support"))
      .orderBy($"support".desc, $"p1", $"p2", $"p3")
      .limit(20)
  }

  /** Frequent triples with the classical A-priori prune (Agrawal &
    * Srikant, VLDB 1994) — the scale valve [[basketTriples]]
    * documents, as code: downward closure says a triple with support
    * ≥ s only contains pairs with support ≥ s, so baskets are
    * REDUCED to items participating in a surviving pair before any
    * triple enumerates. On a corpus with unbounded baskets this
    * turns Σ C(b,3) into Σ C(b',3) over the pruned basket width b' —
    * the difference between infeasible and linear when supports are
    * selective; counting afterwards is exact, so the result set
    * equals the direct form at the same threshold (spec'd).
    *
    * Shapes: supports are ORDER-level (distinct parts per basket);
    * the surviving-pair semi-join broadcasts the frequent-pair frame
    * (small by A-priori's own premise); two orderkey-keyed shuffles
    * (basket assembly, reduced re-assembly) and map-side-partial
    * counts everywhere else.
    */
  def triplesApriori(spark: SparkSession, dir: String,
      minSupport: Long = 2L, topK: Int = 20): DataFrame = {
    import spark.implicits._
    val baskets = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val pairsWithOrder = baskets
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"l_partkey")).as("parts"))
      .select($"l_orderkey", explode(expr(
        """flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)),
                       y -> struct(x AS p1, y AS p2))))""")).as("pr"))
      .select($"l_orderkey", $"pr.p1".as("p1"), $"pr.p2".as("p2"))
    val freqPairs = pairsWithOrder
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("c"))
      .filter($"c" >= minSupport)
      .select($"p1", $"p2")
    val surviving = pairsWithOrder
      .join(broadcast(freqPairs), Seq("p1", "p2"), "left_semi")
    val reduced = surviving
      .select($"l_orderkey", explode(array($"p1", $"p2")).as("item"))
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"item")).as("parts"))
    reduced
      .select(explode(expr(
        """flatten(flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)), (y, j) ->
               transform(slice(parts, i + j + 3, size(parts)),
                         z -> struct(x AS p1, y AS p2, z AS p3))))))"""))
        .as("tr"))
      .groupBy($"tr.p1".as("p1"), $"tr.p2".as("p2"), $"tr.p3".as("p3"))
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= minSupport)
      .orderBy($"support".desc, $"p1", $"p2", $"p3")
      .limit(topK)
  }

  def triplesAprioriSql(minSupport: Long = 2L, topK: Int = 20): String =
    s"""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
       SELECT a.l_partkey AS p1, x.l_partkey AS p2, c.l_partkey AS p3,
              CAST(count(*) AS BIGINT) AS support
       FROM b a
       JOIN b x ON a.l_orderkey = x.l_orderkey
               AND a.l_partkey < x.l_partkey
       JOIN b c ON a.l_orderkey = c.l_orderkey
               AND x.l_partkey < c.l_partkey
       GROUP BY 1, 2, 3
       HAVING count(*) >= $minSupport
       ORDER BY support DESC, p1, p2, p3
       LIMIT $topK"""

  val basketTriplesSql: String =
    """SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
              CAST(count(*) AS BIGINT) AS support
       FROM lineitem a
       JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
       JOIN lineitem c ON a.l_orderkey = c.l_orderkey
                      AND b.l_partkey < c.l_partkey
       GROUP BY 1, 2, 3
       ORDER BY support DESC, p1, p2, p3
       LIMIT 20"""

  /** Association rules with confidence and lift (Agrawal/Imieliński/
    * Swami 1993) — the directional layer above [[basketPairs]]:
    * rule a→b scored by confidence = supp(ab)/supp(a) and
    * lift = N·supp(ab)/(supp(a)·supp(b)), both held exact in integer
    * ppm (floor-divided products of exact BIGINT supports; N·10⁶·supp
    * ≈ 10¹⁴ at gate scale — the DECIMAL(38,0) valve applies past
    * ~10⁹ baskets). Supports are ORDER-level (distinct parts per
    * basket), unlike the line-pair census of basketPairs.
    *
    * Plan: one distinct (order, part) shuffle feeds BOTH the
    * map-side pair enumeration (Σ basket², bounded by basket size —
    * never a fact self-join) and the item-support aggregate; rules
    * join pair supports to the two part-keyed support frames
    * (vocabulary-sized, broadcast), and the basket total rides in as
    * a one-row broadcast. Nothing corpus-sized shuffles twice.
    */
  def assocRules(spark: SparkSession, dir: String,
      minSupport: Long = 3L, topK: Int = 30): DataFrame = {
    import spark.implicits._
    val baskets = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val items = baskets.groupBy($"l_partkey".as("item"))
      .agg(count(lit(1)).as("supp_item"))
    val nBaskets = baskets.select($"l_orderkey").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val pairs = baskets
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"l_partkey")).as("parts"))
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)),
                       y -> struct(x AS p1, y AS p2))))""")).as("pr"))
      .groupBy($"pr.p1".as("p1"), $"pr.p2".as("p2"))
      .agg(count(lit(1)).as("supp_ab"))
      .filter($"supp_ab" >= minSupport)
    // both rule directions off the symmetric pair support
    val rules = pairs.select($"p1".as("ante"), $"p2".as("cons"), $"supp_ab")
      .unionByName(
        pairs.select($"p2".as("ante"), $"p1".as("cons"), $"supp_ab"))
    rules
      .join(broadcast(items.select($"item".as("ante"), $"supp_item".as("supp_a"))), "ante")
      .join(broadcast(items.select($"item".as("cons"), $"supp_item".as("supp_b"))), "cons")
      .crossJoin(broadcast(nBaskets))
      .select($"ante", $"cons", $"supp_ab", $"supp_a", $"supp_b",
        expr("(supp_ab * 1000000L) div supp_a").as("conf_ppm"),
        expr("(supp_ab * n_baskets * 1000000L) div (supp_a * supp_b)")
          .as("lift_ppm"))
      .orderBy($"lift_ppm".desc, $"ante", $"cons")
      .limit(topK)
  }

  def assocRulesSql(minSupport: Long = 3L, topK: Int = 30): String =
    s"""WITH baskets AS (
         SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       items AS (
         SELECT l_partkey AS item, CAST(count(*) AS BIGINT) AS supp_item
         FROM baskets GROUP BY 1),
       n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
             FROM baskets),
       pairs AS (
         SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                CAST(count(*) AS BIGINT) AS supp_ab
         FROM baskets a JOIN baskets b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
         HAVING count(*) >= $minSupport),
       rules AS (
         SELECT p1 AS ante, p2 AS cons, supp_ab FROM pairs
         UNION ALL
         SELECT p2 AS ante, p1 AS cons, supp_ab FROM pairs)
       SELECT ante, cons, supp_ab,
              ia.supp_item AS supp_a, ib.supp_item AS supp_b,
              (supp_ab * 1000000) // ia.supp_item AS conf_ppm,
              (supp_ab * n.n_baskets * 1000000)
                // (ia.supp_item * ib.supp_item) AS lift_ppm
       FROM rules
       JOIN items ia ON ia.item = rules.ante
       JOIN items ib ON ib.item = rules.cons
       CROSS JOIN n
       ORDER BY lift_ppm DESC, ante, cons
       LIMIT $topK"""

  /** Last-touch marketing attribution: each purchase is credited to
    * the user's most recent click/view at-or-before it within
    * `windowHours`; purchases with no in-window touch are 'direct'.
    * Rides [[AsOfJoin.asOf]] — ONE shuffle+sort for the whole
    * match — then filters the 72 h window on the µs clock (the
    * latest touch overall is the latest in-window touch whenever one
    * exists, so post-filtering the as-of pick is exact) and reduces
    * to a channel census. Ties (two touches at the same µs) resolve
    * by the asOf payload tie-break — greatest (touch_type, ts) —
    * which the oracle's row_number ORDER BY replays explicitly,
    * because DuckDB's native ASOF leaves equal-time ties unspecified.
    */
  def attributionLastTouch(spark: SparkSession, dir: String,
      windowHours: Int = 72): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val purchases = ev.filter($"event_type" === "purchase")
    val touches = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"ts", $"event_type".as("touch_type"),
        $"ts".as("touch_ts"))
    AsOfJoin.asOf(purchases, touches, keys = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("touch_type", "touch_ts"))
      .withColumn("channel",
        when($"asof_touch_ts".isNull ||
          unix_micros($"ts") - unix_micros($"asof_touch_ts") >
            windowHours * 3600000000L, "direct")
          .otherwise($"asof_touch_type"))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum($"value"), 2).as("total_value"))
      .orderBy($"channel")
  }

  def attributionLastTouchSql(windowHours: Int = 72): String =
    s"""WITH ev AS (
          SELECT event_id, date_trunc('microseconds', ts) AS ts,
                 user_id, event_type, value
          FROM events),
        p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
        t AS (SELECT user_id, ts AS touch_ts, event_type AS touch_type
              FROM ev WHERE event_type IN ('click', 'view')),
        cand AS (
          SELECT p.event_id, p.value, t.touch_type,
                 row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY t.touch_ts DESC, t.touch_type DESC) AS rk
          FROM p LEFT JOIN t
            ON p.user_id = t.user_id AND t.touch_ts <= p.ts
           AND t.touch_ts >= p.ts - INTERVAL $windowHours HOUR),
        best AS (
          SELECT event_id, value, coalesce(touch_type, 'direct') AS channel
          FROM cand WHERE rk = 1)
        SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
               round(sum(value), 2) AS total_value
        FROM best GROUP BY 1 ORDER BY 1"""

  /** LINEAR multi-touch attribution — the fairness counterpart of
    * [[attributionLastTouch]]: each purchase's value is split equally
    * across ALL its in-window touches (none → 'direct' keeps the full
    * amount). Exactness device: value in integer CENTS, each
    * channel's share = (value_cents · n_channel_touches) div n_touches
    * — integer division, so per-channel sums are BIGINT and
    * merge-order-exact (a double split would hash-differ across
    * engines; the truncation remainder is dropped identically on
    * both). Plan shape: the purchase×touch pairing is the banded
    * range join ([[RangeJoin.bandJoin]] — Σ bucket², never |P|×|T|
    * per user), everything after is two aggregations over the
    * pair-and-purchase frames.
    */
  def attributionLinear(spark: SparkSession, dir: String,
      windowHours: Int = 72): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts",
        expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"))
    val touches = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"ts".as("touch_ts"),
        $"event_type".as("touch_type"))
    // (touch, purchase) pairs with purchase.ts ∈ [touch.ts, +72h]
    // ≡ touch.ts ∈ [purchase.ts − 72h, purchase.ts]; +1µs makes the
    // bandJoin's exclusive upper bound inclusive
    val pairs = RangeJoin.bandJoin(touches, purchases.select($"event_id",
        $"user_id", $"ts", $"value_cents"),
      keys = Seq("user_id"), lTime = "touch_ts", rTime = "ts",
      band = windowHours * 3600000000L + 1)
    val perChannel = pairs.groupBy($"event_id", $"touch_type")
      .agg(count(lit(1)).as("n_ch"))
    val perPurchase = perChannel.groupBy($"event_id")
      .agg(sum($"n_ch").as("n_t"))
    val credited = perChannel
      .join(perPurchase, "event_id")
      .join(purchases.select($"event_id", $"value_cents"), "event_id")
      .select($"touch_type".as("channel"), $"n_ch",
        expr("(value_cents * n_ch) div n_t").as("credit"))
    val direct = purchases
      .join(perPurchase.select($"event_id"), Seq("event_id"), "left_anti")
      .select(lit("direct").as("channel"), lit(0L).as("n_ch"),
        $"value_cents".as("credit"))
    credited.unionByName(direct)
      .groupBy($"channel")
      .agg(sum($"n_ch").as("n_touches"), sum($"credit").as("credit_cents"))
      .orderBy($"channel")
  }

  def attributionLinearSql(windowHours: Int = 72): String =
    s"""WITH ev AS (
          SELECT event_id, date_trunc('microseconds', ts) AS ts,
                 user_id, event_type, value
          FROM events),
        p AS (SELECT event_id, user_id, ts,
                     CAST(round(value * 100) AS BIGINT) AS vc
              FROM ev WHERE event_type = 'purchase'),
        t AS (SELECT user_id, ts AS touch_ts, event_type AS touch_type
              FROM ev WHERE event_type IN ('click', 'view')),
        cand AS (
          SELECT p.event_id, t.touch_type
          FROM p JOIN t
            ON p.user_id = t.user_id AND t.touch_ts <= p.ts
           AND t.touch_ts >= p.ts - INTERVAL $windowHours HOUR),
        ch AS (SELECT event_id, touch_type, CAST(count(*) AS BIGINT) AS n_ch
               FROM cand GROUP BY 1, 2),
        tot AS (SELECT event_id, CAST(sum(n_ch) AS BIGINT) AS n_t
                FROM ch GROUP BY 1),
        cred AS (
          SELECT ch.touch_type AS channel, ch.n_ch,
                 (p.vc * ch.n_ch) // tot.n_t AS credit
          FROM ch JOIN tot ON ch.event_id = tot.event_id
          JOIN p ON p.event_id = ch.event_id
          UNION ALL
          SELECT 'direct', CAST(0 AS BIGINT), vc FROM p
          WHERE event_id NOT IN (SELECT event_id FROM tot))
        SELECT channel, CAST(sum(n_ch) AS BIGINT) AS n_touches,
               CAST(sum(credit) AS BIGINT) AS credit_cents
        FROM cred GROUP BY 1 ORDER BY 1"""

  /** POSITION-BASED (U-shaped) multi-touch attribution — the
    * standard 40/20/40 rule (first and last in-window touch each get
    * 40%, the middle touches split the remaining 20% equally; 1
    * touch → 100%, 2 touches → 50/50). Completes the attribution
    * menu next to last-touch ([[attributionLastTouch]]), linear
    * ([[attributionLinear]]) and data-driven Markov
    * ([[markovAttributionOf]]).
    *
    * Exactness device: weights are integer PARTS-PER-MILLION —
    * 400 000 for the endpoints, `200000 div (n−2)` for each middle
    * touch (both engines truncate identically) — and the credit is
    * the BIGINT product `value_cents · w_ppm`, summed per channel.
    * No fp until nothing is left to compute. Ranking ties break on
    * the unique touch event_id, so rank 1 / rank n are engine-stable
    * even for equal-timestamp touches.
    *
    * Plan shape: the purchase×touch pairing is the banded range join
    * (Σ bucket² per user, never |P|×|T|); the rank window partitions
    * by purchase event_id over the PAIR frame (bounded by the 72 h
    * window, not the corpus — the sanctioned aggregate-frame shape);
    * everything after is one hash aggregate.
    */
  def attributionPosition(spark: SparkSession, dir: String,
      windowHours: Int = 72): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts",
        expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"))
    val touches = ev.filter($"event_type".isin("click", "view"))
      .select($"event_id".as("touch_id"), $"user_id",
        $"ts".as("touch_ts"), $"event_type".as("touch_type"))
    val pairs = RangeJoin.bandJoin(touches, purchases.select($"event_id",
        $"user_id", $"ts", $"value_cents"),
      keys = Seq("user_id"), lTime = "touch_ts", rTime = "ts",
      band = windowHours * 3600000000L + 1)
    val wRank = Window.partitionBy($"event_id")
      .orderBy($"touch_ts", $"touch_id")
    val ranked = pairs
      .withColumn("rk", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_id")))
    val credited = ranked.select($"touch_type".as("channel"),
      when($"n" === 1, lit(1000000L))
        .when($"n" === 2, lit(500000L))
        .when($"rk" === 1 || $"rk" === $"n", lit(400000L))
        .otherwise(expr("200000L div (n - 2)")).as("w_ppm"),
      $"value_cents")
    val direct = purchases
      .join(pairs.select($"event_id").distinct(), Seq("event_id"),
        "left_anti")
      .select(lit("direct").as("channel"), lit(1000000L).as("w_ppm"),
        $"value_cents")
    credited.unionByName(direct)
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_touches"),
        sum($"value_cents" * $"w_ppm").as("credit_ppm_cents"))
      .orderBy($"channel")
  }

  def attributionPositionSql(windowHours: Int = 72): String =
    s"""WITH ev AS (
          SELECT event_id, date_trunc('microseconds', ts) AS ts,
                 user_id, event_type, value
          FROM events),
        p AS (SELECT event_id, user_id, ts,
                     CAST(round(value * 100) AS BIGINT) AS vc
              FROM ev WHERE event_type = 'purchase'),
        t AS (SELECT event_id AS touch_id, user_id, ts AS touch_ts,
                     event_type AS touch_type
              FROM ev WHERE event_type IN ('click', 'view')),
        cand AS (
          SELECT p.event_id, p.vc, t.touch_type,
                 row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY t.touch_ts, t.touch_id) AS rk,
                 CAST(count(*) OVER (PARTITION BY p.event_id) AS BIGINT) AS n
          FROM p JOIN t
            ON p.user_id = t.user_id AND t.touch_ts <= p.ts
           AND t.touch_ts >= p.ts - INTERVAL $windowHours HOUR),
        cred AS (
          SELECT touch_type AS channel,
                 CASE WHEN n = 1 THEN 1000000
                      WHEN n = 2 THEN 500000
                      WHEN rk = 1 OR rk = n THEN 400000
                      ELSE 200000 // (n - 2) END AS w_ppm, vc
          FROM cand
          UNION ALL
          SELECT 'direct', 1000000, vc FROM p
          WHERE event_id NOT IN (SELECT event_id FROM cand))
        SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
               CAST(sum(vc * w_ppm) AS BIGINT) AS credit_ppm_cents
        FROM cred GROUP BY 1 ORDER BY 1"""

  /** TIME-DECAY multi-touch attribution — each in-window touch's
    * share decays with its age at conversion by a 12-hour half-life
    * (the classic exponential-decay model, cf. the standard
    * marketing-analytics formulation; recency matters, but every
    * touch keeps some credit — the middle ground between last-touch
    * and linear).
    *
    * Exactness device: the decay is DISCRETIZED to half-life steps —
    * k = age_µs div 12h ∈ [0, 6] inside the 72 h window, weight
    * w = 2^(6−k) ∈ {64 … 1} — so weights are small integer units,
    * the per-purchase normalizer Σw is a BIGINT, and each channel
    * share is the integer division `value_cents·w div Σw` truncated
    * identically on both engines (the [[attributionLinear]] device
    * with non-uniform weights). A continuous 2^(−age/h) would be
    * transcendental and engine-drift-prone; the discrete ladder is
    * the documented contract.
    *
    * Plan shape: banded range join for the pairing, two hash
    * aggregates (per-purchase normalizer, per-channel rollup) — no
    * windows at all.
    */
  def attributionTimeDecay(spark: SparkSession, dir: String,
      windowHours: Int = 72): DataFrame = {
    import spark.implicits._
    val halfLifeUs = 12L * 3600 * 1000000
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts",
        expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"))
    val touches = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"ts".as("touch_ts"),
        $"event_type".as("touch_type"))
    val pairs = RangeJoin.bandJoin(touches, purchases.select($"event_id",
        $"user_id", $"ts", $"value_cents"),
      keys = Seq("user_id"), lTime = "touch_ts", rTime = "ts",
      band = windowHours * 3600000000L + 1)
      .withColumn("w", expr(
        s"shiftleft(1L, 6 - CAST((unix_micros(ts) - unix_micros(touch_ts))" +
          s" div $halfLifeUs AS INT))"))
    val perChannel = pairs.groupBy($"event_id", $"touch_type")
      .agg(count(lit(1)).as("n_ch"), sum($"w").as("w_ch"))
    val perPurchase = perChannel.groupBy($"event_id")
      .agg(sum($"w_ch").as("w_tot"))
    val credited = perChannel
      .join(perPurchase, "event_id")
      .join(purchases.select($"event_id", $"value_cents"), "event_id")
      .select($"touch_type".as("channel"), $"n_ch",
        expr("(value_cents * w_ch) div w_tot").as("credit"))
    val direct = purchases
      .join(perPurchase.select($"event_id"), Seq("event_id"), "left_anti")
      .select(lit("direct").as("channel"), lit(0L).as("n_ch"),
        $"value_cents".as("credit"))
    credited.unionByName(direct)
      .groupBy($"channel")
      .agg(sum($"n_ch").as("n_touches"), sum($"credit").as("credit_cents"))
      .orderBy($"channel")
  }

  def attributionTimeDecaySql(windowHours: Int = 72): String =
    s"""WITH ev AS (
          SELECT event_id, date_trunc('microseconds', ts) AS ts,
                 user_id, event_type, value
          FROM events),
        p AS (SELECT event_id, user_id, ts,
                     CAST(round(value * 100) AS BIGINT) AS vc
              FROM ev WHERE event_type = 'purchase'),
        t AS (SELECT user_id, ts AS touch_ts, event_type AS touch_type
              FROM ev WHERE event_type IN ('click', 'view')),
        cand AS (
          SELECT p.event_id, t.touch_type,
                 (CAST(1 AS BIGINT) << (6 - CAST(
                    (epoch_us(p.ts) - epoch_us(t.touch_ts))
                      // ${12L * 3600 * 1000000} AS INTEGER))) AS w
          FROM p JOIN t
            ON p.user_id = t.user_id AND t.touch_ts <= p.ts
           AND t.touch_ts >= p.ts - INTERVAL $windowHours HOUR),
        ch AS (SELECT event_id, touch_type,
                      CAST(count(*) AS BIGINT) AS n_ch,
                      CAST(sum(w) AS BIGINT) AS w_ch
               FROM cand GROUP BY 1, 2),
        tot AS (SELECT event_id, CAST(sum(w_ch) AS BIGINT) AS w_tot
                FROM ch GROUP BY 1),
        cred AS (
          SELECT ch.touch_type AS channel, ch.n_ch,
                 (p.vc * ch.w_ch) // tot.w_tot AS credit
          FROM ch JOIN tot ON ch.event_id = tot.event_id
          JOIN p ON p.event_id = ch.event_id
          UNION ALL
          SELECT 'direct', CAST(0 AS BIGINT), vc FROM p
          WHERE event_id NOT IN (SELECT event_id FROM tot))
        SELECT channel, CAST(sum(n_ch) AS BIGINT) AS n_touches,
               CAST(sum(credit) AS BIGINT) AS credit_cents
        FROM cred GROUP BY 1 ORDER BY 1"""

  /** Time-to-convert distribution — the product-analytics companion
    * of the funnel: per user, first signup → first SUBSEQUENT
    * purchase latency, summarized as exact integer-second
    * percentiles. Two tiny aggregations (per-user firsts) + one
    * conditional-min join; percentiles via PERCENTILE_DISC over the
    * converted-users frame, everything integer µs→s so the single
    * output row is hash-exact. The latency column is first-to-first,
    * the standard activation-metric definition.
    */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_type")
    val signups = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
    val firstPurchase = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"))
    val latency = signups
      .join(firstPurchase, $"user_id" === $"p_user" && $"p_ts" >= $"signup_ts")
      .groupBy($"user_id")
      .agg(expr("min(unix_micros(p_ts) - unix_micros(signup_ts)) div 1000000")
        .as("lat_s"))
    latency.agg(
        count(lit(1)).as("n_converted"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_s) AS BIGINT)")
          .as("p50_s"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_s) AS BIGINT)")
          .as("p90_s"),
        max($"lat_s").as("max_s"))
      .crossJoin(broadcast(signups.agg(count(lit(1)).as("n_signup_users"))))
  }

  val timeToConvertSql: String =
    """WITH ev AS (
         SELECT user_id, date_trunc('microseconds', ts) AS ts, event_type
         FROM events),
       s AS (SELECT user_id, min(ts) AS signup_ts
             FROM ev WHERE event_type = 'signup' GROUP BY 1),
       lat AS (
         SELECT s.user_id,
                CAST(min(epoch_us(p.ts) - epoch_us(s.signup_ts)) // 1000000
                     AS BIGINT) AS lat_s
         FROM s JOIN ev p
           ON p.user_id = s.user_id AND p.event_type = 'purchase'
          AND p.ts >= s.signup_ts
         GROUP BY s.user_id)
       SELECT CAST(count(*) AS BIGINT) AS n_converted,
              CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_s) AS BIGINT)
                AS p50_s,
              CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_s) AS BIGINT)
                AS p90_s,
              max(lat_s) AS max_s,
              (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup_users
       FROM lat"""

  /** Growth accounting — the weekly user ledger every product review
    * reads: per epoch-week, users split into NEW (first-ever
    * activity), RETAINED (active this week and last), RESURRECTED
    * (active this week, inactive last, not new), and CHURNED (active
    * last week, gone this week; 0 for the first week by definition).
    * The identity active(w) = new + retained + resurrected holds row
    * by row — MiningSpec pins it. Plan: the corpus collapses to the
    * distinct (user, week) frame once; first-weeks are one aggregate;
    * last-week presence is a self-join of the pair frame shifted by
    * one — every step an equi-join on (user, week), no windows at
    * all, so the shape survives any user count.
    */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val uw = Tables.events(spark, dir)
      .select($"user_id",
        expr("unix_micros(ts) div 604800000000").as("week"))
      .distinct()
      .cache()
    val firstW = uw.groupBy($"user_id").agg(min($"week").as("fw"))
    val prev = uw.select($"user_id", ($"week" + 1).as("week"),
      lit(1L).as("was_active"))
    val classed = uw
      .join(firstW, "user_id")
      .join(prev, Seq("user_id", "week"), "left")
      .select($"week",
        when($"week" === $"fw", "new")
          .when($"was_active".isNotNull, "retained")
          .otherwise("resurrected").as("cls"))
      .groupBy($"week").pivot("cls", Seq("new", "retained", "resurrected"))
      .agg(count(lit(1)))
      .na.fill(0L)
    val churned = prev.select($"user_id", $"week")
      .join(uw, Seq("user_id", "week"), "left_anti")
      .groupBy($"week").agg(count(lit(1)).as("churn_cand"))
    val weeks = uw.select($"week").distinct()
    val out = weeks
      .join(classed, Seq("week"), "left")
      .join(churned, Seq("week"), "left")
      .select($"week",
        coalesce($"new", lit(0L)).as("n_new"),
        coalesce($"retained", lit(0L)).as("n_retained"),
        coalesce($"resurrected", lit(0L)).as("n_resurrected"),
        coalesce($"churn_cand", lit(0L)).as("n_churned"))
      .orderBy($"week")
      .localCheckpoint(true)
    uw.unpersist(blocking = false)
    out
  }

  val growthAccountingSql: String =
    """WITH uw AS (
         SELECT DISTINCT user_id,
                epoch_us(date_trunc('microseconds', ts)) // 604800000000
                  AS week
         FROM events),
       fw AS (SELECT user_id, min(week) AS fw FROM uw GROUP BY 1),
       cls AS (
         SELECT u.week,
                CASE WHEN u.week = f.fw THEN 'new'
                     WHEN p.user_id IS NOT NULL THEN 'retained'
                     ELSE 'resurrected' END AS cls
         FROM uw u
         JOIN fw f ON f.user_id = u.user_id
         LEFT JOIN uw p ON p.user_id = u.user_id AND p.week = u.week - 1),
       churn AS (
         SELECT p.week + 1 AS week, CAST(count(*) AS BIGINT) AS n_churned
         FROM uw p
         LEFT JOIN uw n ON n.user_id = p.user_id AND n.week = p.week + 1
         WHERE n.user_id IS NULL
         GROUP BY 1)
       SELECT w.week,
              CAST(coalesce(sum(CASE WHEN cls = 'new' THEN 1 END), 0)
                   AS BIGINT) AS n_new,
              CAST(coalesce(sum(CASE WHEN cls = 'retained' THEN 1 END), 0)
                   AS BIGINT) AS n_retained,
              CAST(coalesce(sum(CASE WHEN cls = 'resurrected' THEN 1 END), 0)
                   AS BIGINT) AS n_resurrected,
              CAST(coalesce(any_value(c.n_churned), 0) AS BIGINT) AS n_churned
       FROM (SELECT DISTINCT week FROM uw) w
       LEFT JOIN cls ON cls.week = w.week
       LEFT JOIN churn c ON c.week = w.week
       GROUP BY w.week
       ORDER BY w.week"""

  /** Exact `NTILE(k)` over a global (metric, tie) order WITHOUT the
    * all-to-one window `ntile().over(Window.orderBy(...))` plans — the
    * [[SurrogateKey.orderedScalable]] / banded-cumsum device applied
    * to ranking:
    *
    *   1. `band` must be a coarse MONOTONE bucket of `metric` (so the
    *      global order equals (band, metric, tie)); per-band row
    *      counts are one map-side-combined aggregation;
    *   2. exclusive prefix offsets across bands — a window over that
    *      band-count frame only (hundreds of rows at any corpus
    *      size);
    *   3. offsets broadcast back; global rank = band offset +
    *      row_number within the band, so the heaviest metric value
    *      splits across bands' tasks instead of one sorter seeing
    *      every row.
    *
    * The bucket is then the SQL-standard NTILE assignment computed
    * from (rank, n): with q = n div k, r = n mod k the first r
    * buckets take q+1 rows — bit-identical to `NTILE(k) OVER (ORDER
    * BY metric, tie)` on any engine, which is what the oracle runs.
    */
  def bandedNtile(df: DataFrame, metric: String, band: org.apache.spark.sql.Column,
      tie: String, k: Int, out: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = df.withColumn("__band", band)
    val bandCounts = b.groupBy($"__band").agg(count(lit(1)).as("__bn"))
    val wB = Window.orderBy($"__band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandCounts
      .withColumn("__off", coalesce(sum($"__bn").over(wB), lit(0L)))
      .select($"__band".as("__o_band"), $"__off")
    val total = bandCounts.agg(sum($"__bn").as("__n"))
    val wIn = Window.partitionBy($"__band").orderBy(col(metric), col(tie))
    b.join(broadcast(offsets), $"__band" === $"__o_band")
      .crossJoin(broadcast(total))
      .withColumn("__rank", $"__off" + row_number().over(wIn))
      .withColumn(out, expr(
        s"""CASE WHEN __rank <= (__n div $k + 1) * (__n % $k)
              THEN (__rank - 1) div (__n div $k + 1) + 1
              ELSE __n % $k + 1 +
                (__rank - 1 - (__n div $k + 1) * (__n % $k))
                  div greatest(__n div $k, 1)
            END"""))
      .drop("__band", "__o_band", "__off", "__n", "__rank")
  }

  /** RFM customer segmentation — the classic warehouse scoring: per
    * customer recency (last order epoch-day), frequency (order
    * count), monetary (lifetime cents), each scored 1..5 by exact
    * quintile over (metric, custkey); gate output is the segment
    * census. All three quintiles ride [[bandedNtile]], so nothing
    * customer-sized ever funnels through one window task — the three
    * band functions (month of last order, raw order count, $100k
    * revenue chunk) are monotone coarse buckets of their metrics.
    * Scores ascend with the metric (5 = most recent day / most
    * orders / most revenue is NOT implied — 1 = earliest/least;
    * relabeling is a rename, not a semantics change).
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("custkey"))
      .agg(
        max(expr("unix_timestamp(o_orderdate) div 86400")).as("last_day"),
        count(lit(1)).as("freq"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    // checkpoint between the three quintile passes: each bandedNtile
    // runs TWO census aggregates (band counts + total) over its input
    // plan, so an uncheckpointed fold re-executes every earlier
    // pass's join+window inside every later pass's censuses — the
    // r16 probe charged 58 s of task time to that re-execution
    // pyramid. With the barrier each pass is 2 small aggregates + 1
    // banded window over a customer-sized frame, O(3×) not O(3²×).
    val scored = Seq(
      ("last_day", expr("last_day div 32"), "r_score"),
      ("freq", expr("freq"), "f_score"),
      ("cents", expr("cents div 10000000"), "m_score"))
      .foldLeft(cust.localCheckpoint(true)) { case (df, (metric, band, out)) =>
        bandedNtile(df, metric, band, tie = "custkey", k = 5, out = out)
          .localCheckpoint(true)
      }
    scored.groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_customers"), sum($"custkey").as("custkey_sum"))
      .orderBy($"r_score", $"f_score", $"m_score")
  }

  val rfmSegmentsSql: String =
    """WITH cust AS (
         SELECT o_custkey AS custkey,
                CAST(max(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
                     AS BIGINT) AS last_day,
                CAST(count(*) AS BIGINT) AS freq,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
         FROM orders GROUP BY 1),
       scored AS (
         SELECT custkey,
                CAST(NTILE(5) OVER (ORDER BY last_day, custkey) AS BIGINT)
                  AS r_score,
                CAST(NTILE(5) OVER (ORDER BY freq, custkey) AS BIGINT)
                  AS f_score,
                CAST(NTILE(5) OVER (ORDER BY cents, custkey) AS BIGINT)
                  AS m_score
         FROM cust)
       SELECT r_score, f_score, m_score,
              CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(custkey) AS BIGINT) AS custkey_sum
       FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Ordered multi-step funnel (view → click → purchase): a user
    * advances to step i+1 only with an event STRICTLY AFTER their
    * step-i completion time — the sequential semantics product
    * funnels mean (an unordered "did all three" overcounts users who
    * purchased before ever viewing). The sequential dependency is
    * resolved by chained per-user conditional minima: step i's
    * completion frame (user, tᵢ = min event time > tᵢ₋₁) is a
    * per-user AGGREGATE, so each chain link is one filtered scan +
    * one shuffle equi-join on user_id between user-sized frames —
    * never a window over raw events and never a per-user array
    * collect. Completion frames persist because each feeds both the
    * next link and the final census. Timestamps compare in exact
    * MICROSECONDS (integer), so "strictly after" cannot be blurred by
    * truncation. Output: one row per step with the surviving-user
    * count and the conversion from the previous step in integer parts
    * per million (computed on the one-row census before unpivot).
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    funnelStepsOf(Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("tus")))
  }

  /** Same funnel over any (user_id, event_type, tus) frame — lets
    * specs pin the strictly-after semantics on crafted sequences.
    * materialize=false returns the composed plan (the per-step frames
    * recompute per consumer) for PlanAuditSpec's structural pin.
    */
  def funnelStepsOf(ev: DataFrame, materialize: Boolean = true): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    def cached(df: DataFrame): DataFrame =
      if (materialize)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    val v = cached(ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"tus").as("t1")))
    val c = cached(ev.filter($"event_type" === "click")
      .join(v, "user_id").filter($"tus" > $"t1")
      .groupBy($"user_id").agg(min($"tus").as("t2")))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, "user_id").filter($"tus" > $"t2")
      .groupBy($"user_id").agg(min($"tus").as("t3"))
    val census = v.agg(count(lit(1)).as("n1"))
      .crossJoin(c.agg(count(lit(1)).as("n2")))
      .crossJoin(p.agg(count(lit(1)).as("n3")))
    val composed = census.select(expr(
      """stack(3,
           '1_view', n1, 1000000L,
           '2_click', n2, CASE WHEN n1 = 0 THEN 0L
                               ELSE (n2 * 1000000L) div n1 END,
           '3_purchase', n3, CASE WHEN n2 = 0 THEN 0L
                                  ELSE (n3 * 1000000L) div n2 END)
         AS (step, n_users, conv_ppm)"""))
    if (!materialize) composed
    else {
      val out = composed.localCheckpoint(true)
      v.unpersist(blocking = false)
      c.unpersist(blocking = false)
      out
    }
  }

  val funnelStepsSql: String =
    """WITH ev AS (
         SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
       v AS (SELECT user_id, min(tus) AS t1 FROM ev
             WHERE event_type = 'view' GROUP BY 1),
       c AS (SELECT ev.user_id, min(tus) AS t2 FROM ev
             JOIN v ON ev.user_id = v.user_id AND ev.tus > v.t1
             WHERE event_type = 'click' GROUP BY 1),
       p AS (SELECT ev.user_id, min(tus) AS t3 FROM ev
             JOIN c ON ev.user_id = c.user_id AND ev.tus > c.t2
             WHERE event_type = 'purchase' GROUP BY 1),
       census AS (
         SELECT (SELECT count(*) FROM v) AS n1,
                (SELECT count(*) FROM c) AS n2,
                (SELECT count(*) FROM p) AS n3)
       SELECT '1_view' AS step, CAST(n1 AS BIGINT) AS n_users,
              CAST(1000000 AS BIGINT) AS conv_ppm FROM census
       UNION ALL
       SELECT '2_click', CAST(n2 AS BIGINT),
              CAST(CASE WHEN n1 = 0 THEN 0
                        ELSE (n2 * 1000000) // n1 END AS BIGINT) FROM census
       UNION ALL
       SELECT '3_purchase', CAST(n3 AS BIGINT),
              CAST(CASE WHEN n2 = 0 THEN 0
                        ELSE (n3 * 1000000) // n2 END AS BIGINT) FROM census"""

  /** DAU/MAU stickiness — the engagement ratio dashboards track: per
    * calendar day, distinct active users (DAU) over that month's
    * distinct actives (MAU), in integer parts per million. Both
    * distincts reduce to the (day, user) pair frame FIRST (one
    * partial-agg'd shuffle against the corpus); the month frame
    * re-aggregates those pairs — a second distinct over day-pairs is
    * exactly month-distinct, so the corpus is scanned once. The
    * per-day and per-month frames are calendar-bounded aggregates;
    * their join broadcasts the month side. The pair frame persists
    * because it feeds both rollups.
    */
  def dauStickiness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.events(spark, dir)
      .select(to_date($"ts").as("d"), $"user_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dau = pairs.groupBy($"d").agg(count(lit(1)).as("dau"))
    val mau = pairs.select(trunc($"d", "month").as("m"), $"user_id").distinct()
      .groupBy($"m").agg(count(lit(1)).as("mau"))
    val out = dau
      .join(broadcast(mau), trunc($"d", "month") === $"m")
      .select($"d", $"dau", $"mau",
        expr("(dau * 1000000L) div mau").as("stickiness_ppm"))
      .orderBy($"d")
      .localCheckpoint(true)
    pairs.unpersist(blocking = false)
    out
  }

  val dauStickinessSql: String =
    """WITH pairs AS (
         SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
       dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau
               FROM pairs GROUP BY 1),
       mau AS (SELECT date_trunc('month', d) AS m,
                      CAST(count(DISTINCT user_id) AS BIGINT) AS mau
               FROM pairs GROUP BY 1)
       SELECT d, dau, mau, (dau * 1000000) // mau AS stickiness_ppm
       FROM dau JOIN mau ON date_trunc('month', d) = m
       ORDER BY d"""

  /** Bradley–Terry preference strengths over event types (Bradley &
    * Terry 1952; the MM fixpoint per Hunter 2004): each user casts
    * one "contest" per event-type pair — the type they engaged with
    * MORE wins (ties abstain) — and 10 minorization-maximization
    * iterations recover the latent strengths:
    * pᵢ ← wᵢ / Σⱼ nᵢⱼ/(pᵢ+pⱼ), renormalized to mean 10⁶ each step.
    * All iteration arithmetic is INTEGER (pico-unit numerators with
    * truncating division, a max(·,1) denominator guard), so the
    * trajectory replays exactly as unrolled SQL CTEs.
    *
    * Contract: contest construction (per-user type counts → pairwise
    * preferences → the wins/contests matrices) is the DISTRIBUTED
    * work; the MM fold then runs driver-side on the collected
    * ≤ |types|² matrix — config-bounded metadata, the markov-chain
    * collect stance (Analytics.markovAttributionOf).
    */
  def bradleyTerry(spark: SparkSession, dir: String,
      iters: Int = 10): DataFrame = {
    import spark.implicits._
    val perUser = Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("c"))
    val prefs = perUser.as("a")
      .join(perUser.as("b"), $"a.user_id" === $"b.user_id"
        && $"a.event_type" < $"b.event_type")
      .filter($"a.c" =!= $"b.c")
      .select(
        when($"a.c" > $"b.c", $"a.event_type")
          .otherwise($"b.event_type").as("winner"),
        when($"a.c" > $"b.c", $"b.event_type")
          .otherwise($"a.event_type").as("loser"))
      .groupBy($"winner", $"loser").agg(count(lit(1)).as("w"))
    // ≤ |types|² rows — config-bounded metadata (documented contract)
    val cells = prefs.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    val wins = cells.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap.withDefaultValue(0L)
    val nPair = cells
      .groupBy(c => if (c._1 < c._2) (c._1, c._2) else (c._2, c._1))
      .view.mapValues(_.map(_._3).sum).toMap.withDefaultValue(0L)
    def n(i: String, j: String) = nPair(if (i < j) (i, j) else (j, i))
    var p = types.map(_ -> 1000000L).toMap
    val k = types.length
    for (_ <- 1 to iters) {
      val raw = types.map { i =>
        val d = types.filter(_ != i).map { j =>
          val nij = n(i, j)
          if (nij == 0) 0L
          else nij * 1000000000000L / math.max(p(i) + p(j), 1L)
        }.sum
        i -> (if (d > 0) wins(i) * 1000000000000L / d else p(i))
      }.toMap
      val s = math.max(raw.values.sum, 1L)
      p = raw.map { case (i, v) => i -> v * k * 1000000L / s }
    }
    val rows = types.map { i =>
      (i, wins(i), types.filter(_ != i).map(j => n(i, j)).sum, p(i))
    }
    spark.createDataFrame(rows)
      .toDF("event_type", "wins", "n_contests", "p_micro")
      .orderBy($"p_micro".desc, $"event_type")
  }

  def bradleyTerrySql(iters: Int = 10): String = {
    val steps = (1 to iters).map { t =>
      s"""raw$t AS MATERIALIZED (
            SELECT ty.i,
                   CASE WHEN coalesce(d.d, 0) > 0
                        THEN (ty.w * 1000000000000) // d.d
                        ELSE p.p END AS p
            FROM ty
            JOIN it${t - 1} p ON p.i = ty.i
            LEFT JOIN (
              SELECT pr.i,
                     CAST(sum((pr.n * 1000000000000)
                       // greatest(p0.p + p1.p, 1)) AS BIGINT) AS d
              FROM pairs pr
              JOIN it${t - 1} p0 ON p0.i = pr.i
              JOIN it${t - 1} p1 ON p1.i = pr.j
              GROUP BY pr.i) d ON d.i = ty.i),
          it$t AS MATERIALIZED (
            SELECT i, CAST((p * (SELECT k FROM kk) * 1000000)
                      // greatest((SELECT sum(p) FROM raw$t), 1)
                      AS BIGINT) AS p
            FROM raw$t)"""
    }.mkString(",\n")
    s"""WITH pu AS (
          SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        prefs AS (
          SELECT CASE WHEN a.c > b.c THEN a.event_type
                      ELSE b.event_type END AS winner,
                 CASE WHEN a.c > b.c THEN b.event_type
                      ELSE a.event_type END AS loser,
                 CAST(count(*) AS BIGINT) AS w
          FROM pu a JOIN pu b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          WHERE a.c <> b.c
          GROUP BY 1, 2),
        ty AS (
          SELECT i, CAST(coalesce(sum(w), 0) AS BIGINT) AS w FROM (
            SELECT winner AS i, w FROM prefs
            UNION ALL SELECT loser, 0 FROM prefs)
          GROUP BY i),
        pairs AS (
          SELECT i, j, CAST(sum(n) AS BIGINT) AS n FROM (
            SELECT winner AS i, loser AS j, w AS n FROM prefs
            UNION ALL SELECT loser, winner, w FROM prefs)
          GROUP BY 1, 2),
        kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
        it0 AS (SELECT i, CAST(1000000 AS BIGINT) AS p FROM ty),
        $steps
        SELECT ty.i AS event_type, ty.w AS wins,
               CAST(coalesce((SELECT sum(n) FROM pairs pr
                              WHERE pr.i = ty.i), 0) AS BIGINT)
                 AS n_contests,
               it$iters.p AS p_micro
        FROM ty JOIN it$iters ON it$iters.i = ty.i
        ORDER BY p_micro DESC, event_type"""
  }
}
