package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP aggregation surface beyond plain GROUP BY: rollup hierarchies,
  * pivots, ranking windows, exact distribution stats. All shapes are
  * single-shuffle hash aggregates / windows — rollup computes every
  * grouping level in ONE pass (Expand + partial agg), where the naive
  * alternative is one job per level unioned.
  */
object Olap {

  /** ROLLUP (status, year): per-status-and-year, per-status, and
    * grand-total rows from one scan.
    */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderstatus".as("status"),
        year($"o_orderdate").cast("long").as("yr"), $"o_totalprice")
      .rollup($"status", $"yr")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
  }

  val rollupOrdersSql: String =
    """SELECT o_orderstatus AS status, CAST(year(o_orderdate) AS BIGINT) AS yr,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders GROUP BY ROLLUP (status, yr)"""

  /** CUBE (status, priority-class): every grouping combination —
    * both 1-D margins, the 2-D cells, and the grand total — in the
    * same single Expand + partial-agg pass as [[rollupOrders]] (2ᵈ
    * grouping sets instead of d+1; same one-shuffle plan shape).
    */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderstatus".as("status"),
        substring($"o_orderpriority", 1, 1).as("prio"), $"o_totalprice")
      .cube($"status", $"prio")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
  }

  val cubeOrdersSql: String =
    """SELECT o_orderstatus AS status, substr(o_orderpriority, 1, 1) AS prio,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders GROUP BY CUBE (status, prio)"""

  /** CUBE with GROUPING_ID — the disambiguation the bare cube gate
    * can't give: a NULL in a cube output is either real null data or
    * a rolled-up margin, and only the grouping bitmap tells them
    * apart (the standard's answer, and what BI layers key legends
    * on). Same one-Expand-pass plan as [[cubeOrders]]; the bitmap is
    * an integer column both engines define identically (bit i set ⇔
    * column i rolled up, most-significant-first).
    */
  def cubeGroupingId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderstatus".as("status"),
        substring($"o_orderpriority", 1, 1).as("prio"))
      .cube($"status", $"prio")
      .agg(grouping_id().cast("long").as("gid"),
        grouping($"status").cast("long").as("g_status"),
        count(lit(1)).as("n"))
      .orderBy($"gid", $"status", $"prio")
  }

  val cubeGroupingIdSql: String =
    """SELECT o_orderstatus AS status, substr(o_orderpriority, 1, 1) AS prio,
              CAST(GROUPING(o_orderstatus) * 2
                   + GROUPING(substr(o_orderpriority, 1, 1)) AS BIGINT)
                AS gid,
              CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
              count(*) AS n
       FROM orders
       GROUP BY CUBE (status, prio)
       ORDER BY gid, status, prio"""

  /** Pivot event counts: one row per hour-of-day, one column per
    * event type. The type list is explicit — at scale an unbounded
    * pivot means a driver-side distinct first; fixing the vocabulary
    * keeps it one pass.
    */
  val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(hour($"ts").cast("long").as("hod"), $"event_type")
      .groupBy($"hod")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0, eventTypes)
  }

  val pivotEventsSql: String = {
    val cols = eventTypes.map(t =>
      s"count(*) FILTER (event_type = '$t') AS $t").mkString(", ")
    s"SELECT CAST(hour(ts) AS BIGINT) AS hod, $cols FROM events GROUP BY hod"
  }

  /** Ranking window family over suppliers per nation: rank,
    * dense_rank, quartile, percent_rank in one window pass.
    */
  def supplierRanks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"s_nationkey")
      .orderBy($"s_acctbal".desc, $"s_suppkey")
    Tables.supplier(spark, dir)
      .select($"s_nationkey", $"s_suppkey", $"s_acctbal")
      .select($"s_nationkey", $"s_suppkey",
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"))
  }

  val supplierRanksSql: String =
    """SELECT s_nationkey, s_suppkey,
         CAST(rank() OVER w AS BIGINT) AS rk,
         CAST(dense_rank() OVER w AS BIGINT) AS drk,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         round(percent_rank() OVER w, 4) AS pct_rank
       FROM supplier
       WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)"""

  /** Exact distribution stats per event type: count, mean, sample
    * stddev, interpolated median — one hash aggregate. (Approximate
    * sketch variants are spec-gated: see OlapSpec HLL test.)
    */
  def statsSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(avg($"value"), 4).as("mean"),
        round(stddev_samp($"value"), 4).as("sd"),
        round(percentile($"value", lit(0.5)), 4).as("median"))
  }

  val statsSummarySql: String =
    """SELECT event_type, count(*) AS n,
         round(avg(value), 4) AS mean,
         round(stddev_samp(value), 4) AS sd,
         round(quantile_cont(value, 0.5), 4) AS median
       FROM events GROUP BY event_type"""

  /** SQL-standard discrete percentiles (PERCENTILE_DISC WITHIN GROUP)
    * per language over integer doc lengths: the smallest value whose
    * cume_dist reaches p — an actual data value, never interpolated,
    * so the result is integer-exact across engines. One hash-aggregate
    * pass; the per-group buffer is a value→count map, not the row set.
    */
  def percentilesByLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
          .cast("long").as("p50_chars"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)")
          .cast("long").as("p90_chars"))
  }

  /** Oracle states the standard's definition directly — value at rank
    * ceil(p·n) — with pure integer arithmetic for the rank ((p·n as a
    * fraction, ceil via (a+b-1) div b) so boundary groups (n a
    * multiple of 2 or 10) can't drift on fp rounding.
    */
  val percentilesByLangSql: String =
    """WITH ranked AS (
         SELECT lang, n_chars,
                row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
                count(*) OVER (PARTITION BY lang) AS n
         FROM documents)
       SELECT lang, max(n) AS n_docs,
              max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50_chars,
              max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90_chars
       FROM ranked GROUP BY lang"""

  /** Tukey-fence outlier audit per brand (the boxplot rule, Tukey
    * *EDA* 1977): values past Q1 − 1.5·IQR / Q3 + 1.5·IQR are
    * flagged — the distribution-free screen next to the parametric
    * z-test (events) and the robust MAD (olap_mad); quartiles make
    * it resistant where extreme values inflate mean/stddev. Fully
    * integer: prices are exact cents, quartiles are type-1 discrete
    * quantiles off the per-brand VALUE HISTOGRAM (min value whose
    * cumulative count clears ⌈q·n⌉ by cross-multiplication — 4·cum ≥
    * n / 4·cum ≥ 3·n), and the fences compare DOUBLED cents against
    * 5·Q1 − 3·Q3 and 5·Q3 − 3·Q1 so the ×1.5 never leaves the
    * integers. Outlier counts come from the same histogram.
    *
    * Scale: the corpus collapses to (brand, cents, cnt) first; the
    * cumulative window is partitioned by brand OVER THE HISTOGRAM
    * (aggregate input — the WindowAuditSpec low-card rule's
    * sanctioned shape); fences join back brand-keyed and broadcast.
    */
  def tukeyOutliersByBrand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.part(spark, dir)
      .select($"p_brand",
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"))
      .groupBy($"p_brand", $"cents").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"p_brand").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum", sum($"cnt").over(wCum))
      .join(hist.groupBy($"p_brand").agg(sum($"cnt").as("n")), "p_brand")
    val fences = cum.groupBy($"p_brand")
      .agg(min($"n").as("n"),
        min(when(lit(4L) * $"cum" >= $"n", $"cents")).as("q1"),
        min(when(lit(4L) * $"cum" >= lit(3L) * $"n", $"cents")).as("q3"))
    hist.join(broadcast(fences), "p_brand")
      .groupBy($"p_brand")
      .agg(min($"n").as("n"), min($"q1").as("q1_cents"),
        min($"q3").as("q3_cents"),
        sum(when(lit(2L) * $"cents" < lit(5L) * $"q1" - lit(3L) * $"q3",
          $"cnt").otherwise(0L)).as("n_low"),
        sum(when(lit(2L) * $"cents" > lit(5L) * $"q3" - lit(3L) * $"q1",
          $"cnt").otherwise(0L)).as("n_high"))
      .orderBy($"p_brand")
  }

  val tukeyOutliersByBrandSql: String =
    """WITH h AS (
         SELECT p_brand, CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
                CAST(count(*) AS BIGINT) AS cnt
         FROM part GROUP BY 1, 2),
       c AS (
         SELECT p_brand, cents, cnt,
                CAST(sum(cnt) OVER (PARTITION BY p_brand ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
                CAST(sum(cnt) OVER (PARTITION BY p_brand) AS BIGINT) AS n
         FROM h),
       f AS (
         SELECT p_brand, CAST(min(n) AS BIGINT) AS n,
                CAST(min(CASE WHEN 4 * cum >= n THEN cents END)
                  AS BIGINT) AS q1,
                CAST(min(CASE WHEN 4 * cum >= 3 * n THEN cents END)
                  AS BIGINT) AS q3
         FROM c GROUP BY 1)
       SELECT h.p_brand, CAST(min(f.n) AS BIGINT) AS n,
              CAST(min(f.q1) AS BIGINT) AS q1_cents,
              CAST(min(f.q3) AS BIGINT) AS q3_cents,
              CAST(sum(CASE WHEN 2 * h.cents < 5 * f.q1 - 3 * f.q3
                   THEN h.cnt ELSE 0 END) AS BIGINT) AS n_low,
              CAST(sum(CASE WHEN 2 * h.cents > 5 * f.q3 - 3 * f.q1
                   THEN h.cnt ELSE 0 END) AS BIGINT) AS n_high
       FROM h JOIN f ON f.p_brand = h.p_brand
       GROUP BY 1 ORDER BY 1"""

  /** Equi-width histogram of order value with a DENSE bin spine —
    * empty bins appear as zero rows (the property chart/alerting
    * consumers need and a bare GROUP BY can't give). Binning is
    * integer: cents div width with a top clamp, so bin edges can't
    * drift on fp; the 20-row spine comes from sequence+explode
    * (corpus-size-independent, the gap-fill device) and left-joins
    * the aggregate — broadcast-sized by construction.
    */
  /** Histogram domain: TPC-H o_totalprice lives in [0, $600k), held
    * as integer cents so every bin width derived from it stays exact.
    */
  private val HistRangeCents = 60000000L

  private def histWidthCents(bins: Int): Long = {
    require(bins > 0 && HistRangeCents % bins == 0,
      s"bins=$bins must divide the $HistRangeCents-cent domain evenly " +
        "(integer bin edges are what keeps the gate hash-exact)")
    HistRangeCents / bins
  }

  def histogramOrders(spark: SparkSession, dir: String, bins: Int = 20)
      : DataFrame = {
    import spark.implicits._
    val width = histWidthCents(bins)
    val counts = Tables.orders(spark, dir)
      .select(round($"o_totalprice" * 100).cast("long").as("cents"))
      // integer div, NOT Column./ (fp) — bin edges must be exact
      .select(least(expr(s"cents div $width"), lit(bins - 1L)).as("bin"))
      .groupBy($"bin").agg(count(lit(1)).as("n"))
    spark.range(bins).select($"id".as("bin"))
      .join(counts, Seq("bin"), "left")
      .select($"bin",
        round($"bin" * (width / 100.0), 2).as("lo"),
        round(($"bin" + 1) * (width / 100.0), 2).as("hi"),
        coalesce($"n", lit(0L)).as("n"))
      .orderBy($"bin")
  }

  def histogramOrdersSql(bins: Int = 20): String = {
    val width = histWidthCents(bins)
    s"""WITH c AS (
         SELECT least(CAST(round(o_totalprice * 100) AS BIGINT) // $width,
                      ${bins - 1}) AS bin,
                CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY 1),
       spine AS (SELECT unnest(generate_series(0, ${bins - 1})) AS bin)
       SELECT CAST(spine.bin AS BIGINT) AS bin,
              round(spine.bin * ${width / 100.0}, 2) AS lo,
              round((spine.bin + 1) * ${width / 100.0}, 2) AS hi,
              coalesce(c.n, 0) AS n
       FROM spine LEFT JOIN c ON spine.bin = c.bin
       ORDER BY bin"""
  }

  /** Per-group OLS regression (price-per-unit line: l_extendedprice
    * on l_quantity, by return flag) from EXACT integer moment sums.
    * Built-in `regr_slope`/`corr` accumulate doubles, whose value
    * depends on partition merge order — no oracle can promise that
    * bit pattern. Instead x (integer units) and y (cents) are cast to
    * integers, the five moment sums run as decimal(38,0) aggregates
    * (order-free, overflow-safe far beyond 100 TB row counts: y² ≈
    * 10¹³ per row leaves 10²⁵ rows of headroom), and slope /
    * intercept / r² are ONE double expression over those exact sums
    * at the final projection — the same IEEE ops in the same order on
    * identical inputs in both engines. One map-side-partial hash
    * aggregate; 5 groups.
    */
  def regressionByFlag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.lineitem(spark, dir).select(
      $"l_returnflag".as("flag"),
      $"l_quantity".cast("long").as("x"),
      round($"l_extendedprice" * 100).cast("long").as("y"))
    val sums = d.groupBy($"flag").agg(
      count(lit(1)).as("n"),
      sum($"x".cast("decimal(38,0)")).as("sx"),
      sum($"y".cast("decimal(38,0)")).as("sy"),
      sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
      sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"),
      sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"))
    val (n, sx, sy, sxx, syy, sxy) = ($"n".cast("double"),
      $"sx".cast("double"), $"sy".cast("double"), $"sxx".cast("double"),
      $"syy".cast("double"), $"sxy".cast("double"))
    val cov = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    sums.select($"flag", $"n",
        round((cov / varX) / lit(100.0), 6).as("slope"),
        round(((sy - (cov / varX) * sx) / n) / lit(100.0), 6)
          .as("intercept"),
        round((cov / varX) * (cov / varY) , 6).as("r2"))
      .orderBy($"flag")
  }

  /** The oracle restates the identical expression tree: exact HUGEINT
    * sums (DuckDB's native sum(bigint)), one cast to double per sum,
    * then the same arithmetic — r² as (cov/varX)·(cov/varY) so both
    * engines square via the same two divisions.
    */
  val regressionByFlagSql: String =
    """WITH d AS (
         SELECT l_returnflag AS flag,
                CAST(l_quantity AS BIGINT) AS x,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS y
         FROM lineitem),
       sums AS (
         SELECT flag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
         FROM d GROUP BY flag),
       f AS (
         SELECT flag, n,
                CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
                CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
         FROM sums)
       SELECT flag, n,
              round(((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd))
                    / 100.0, 6) AS slope,
              round(((syd - ((nd * sxyd - sxd * syd)
                             / (nd * sxxd - sxd * sxd)) * sxd) / nd)
                    / 100.0, 6) AS intercept,
              round(((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd))
                    * ((nd * sxyd - sxd * syd) / (nd * syyd - syd * syd)),
                    6) AS r2
       FROM f ORDER BY flag"""

  /** Share-of-total (ratio_to_report): each status's revenue share in
    * integer parts-per-million. Exactness device: prices become
    * integer cents before any sum, and the share is an integral
    * decimal divide — (cents·10⁶) div total — widened to
    * decimal(38,0)/HUGEINT so the product can't overflow a long even
    * at 10⁴× this corpus (Σcents·10⁶ passes 2⁶³ around ×100). The
    * grand total rides an unpartitioned window OVER () on the
    * aggregate-sized frame (|statuses| rows — the same exemption as
    * the banded cumsum's offset frame), never on the raw scan.
    */
  def shareOfTotal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables.orders(spark, dir)
      .select($"o_orderstatus".as("status"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("cents"))
      .withColumn("total",
        sum($"cents").over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"status", $"n_orders", $"cents",
        expr("""CAST((CAST(cents AS DECIMAL(38,0)) * 1000000)
                     DIV CAST(total AS DECIMAL(38,0)) AS BIGINT)""")
          .as("share_ppm"))
      .orderBy($"status")
  }

  val shareOfTotalSql: String =
    """WITH agg AS (
         SELECT o_orderstatus AS status, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
         FROM orders GROUP BY status)
       SELECT status, n_orders, cents,
              CAST((cents::HUGEINT * 1000000) // (SELECT sum(cents::HUGEINT)
                                                 FROM agg) AS BIGINT)
                AS share_ppm
       FROM agg ORDER BY status"""

  /** Median absolute deviation per language — the robust spread
    * statistic (stddev is hostage to the same outliers a 100 TB crawl
    * is full of). Two exact passes over integer char counts: the
    * per-group PERCENTILE_DISC median (a real data value, engine-
    * exact — see [[percentilesByLang]]), broadcast back as a
    * group-count-sized frame, then the median of |x − med| the same
    * way. No fp enters at any point.
    */
  def madByLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"lang", $"n_chars")
    val med = docs.groupBy($"lang")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
        .cast("long").as("med"))
    docs.join(broadcast(med), "lang")
      .withColumn("dev", abs($"n_chars" - $"med"))
      .groupBy($"lang", $"med")
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)")
          .cast("long").as("mad"))
      .select($"lang", $"n_docs", $"med", $"mad")
      .orderBy($"lang")
  }

  val madByLangSql: String =
    """WITH med AS (
         SELECT lang,
                CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
                     AS BIGINT) AS med
         FROM documents GROUP BY lang)
       SELECT d.lang, count(*) AS n_docs, m.med,
              CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(d.n_chars - m.med))
                   AS BIGINT) AS mad
       FROM documents d JOIN med m ON d.lang = m.lang
       GROUP BY d.lang, m.med ORDER BY d.lang"""

  /** GROUPING SETS with an explicit lattice — the general form ROLLUP
    * and CUBE are sugar for: the 2-D cells plus both 1-D margins but
    * NO grand total, a set CUBE cannot express by dropping rows and
    * ROLLUP cannot express at all. Same one-pass Expand +
    * partial-agg plan shape as [[rollupOrders]]: each input row is
    * replicated once per grouping set map-side, then one shuffle.
    * Source columns are never NULL, so the NULL pattern alone
    * disambiguates which set a row belongs to — no grouping_id
    * column needed for a lossless read-back.
    */
  def groupingSetsOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderstatus".as("status"),
        substring($"o_orderpriority", 1, 1).as("prio"), $"o_totalprice")
      .groupingSets(
        Seq(Seq($"status", $"prio"), Seq($"status"), Seq($"prio")),
        $"status", $"prio")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
  }

  val groupingSetsOrdersSql: String =
    """SELECT o_orderstatus AS status, substr(o_orderpriority, 1, 1) AS prio,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders
       GROUP BY GROUPING SETS ((status, prio), (status), (prio))"""

  /** UNPIVOT (melt): per-status order metrics computed wide in one
    * hash aggregate, then rotated to (status, metric, value) rows —
    * the inverse surface of [[pivotEvents]]. The rotation is a
    * zero-shuffle per-row generator (Expand — each aggregated row
    * emits one row per metric), so the exchange cost is the
    * aggregate's alone; rounding happens once in the wide frame so
    * the rotated values are bit-identical to their wide originals.
    */
  def unpivotOrderMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus".as("status"))
      .agg(count(lit(1)).cast("double").as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total_price"),
        round(avg($"o_totalprice"), 2).as("avg_price"))
      .unpivot(
        Array($"status"),
        Array($"n_orders", $"total_price", $"avg_price"),
        "metric", "value")
  }

  /** Oracle as UNION ALL — the engine-portable spelling of UNPIVOT —
    * over the same one-aggregate wide frame.
    */
  val unpivotOrderMetricsSql: String =
    """WITH wide AS (
         SELECT o_orderstatus AS status,
                CAST(count(*) AS DOUBLE) AS n_orders,
                round(sum(o_totalprice), 2) AS total_price,
                round(avg(o_totalprice), 2) AS avg_price
         FROM orders GROUP BY o_orderstatus)
       SELECT status, 'n_orders' AS metric, n_orders AS value FROM wide
       UNION ALL
       SELECT status, 'total_price', total_price FROM wide
       UNION ALL
       SELECT status, 'avg_price', avg_price FROM wide"""

  /** Exact per-group top-k via the native bounded-buffer aggregate
    * (`topk_by`, functions/TopKBy.scala) — the leaderboard shape the
    * ROW_NUMBER window answers by sorting every group; here memory
    * is O(k) per group per partition, the map side keeps ≤ 2k rows,
    * and the exchange carries ≤ k rows per (partition, group). The
    * oracle IS the window spelling — partial top-k under the total
    * (key desc, payload asc) order merges to the identical result.
    */
  def topkDocsByLang(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(expr(s"topk_by(n_chars, doc_id, $k)").as("top"))
      .select($"lang", explode($"top").as("t"))
      .select($"lang", $"t.key".as("n_chars"), $"t.payload".as("doc_id"))
      .orderBy($"lang", $"n_chars".desc, $"doc_id")
  }

  def topkDocsByLangSql(k: Int = 5): String =
    s"""SELECT lang, n_chars, doc_id FROM (
          SELECT lang, n_chars, doc_id,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_chars DESC, doc_id) AS rk
          FROM documents) z
        WHERE rk <= $k
        ORDER BY lang, n_chars DESC, doc_id"""

  /** Equi-DEPTH histogram of order value — the complement of
    * [[histogramOrders]]'s equi-width bins: every decile holds the
    * same row count (±1) and the gate reports each bucket's edges,
    * so the output IS an exact quantile table. Bucket assignment is
    * the SQL-standard `NTILE(k) OVER (ORDER BY cents, o_orderkey)`,
    * but computed via [[Analytics.bandedNtile]]'s partition-offset
    * rank — no corpus-sized frame ever funnels through one window
    * task (the $50k-cent band is a monotone coarse bucket of the
    * metric, so per-band row_number + exclusive band offsets
    * reconstruct the global rank; the offset window runs over the
    * ≤13-row band-count frame). Values ride as integer cents so the
    * edges are bit-exact across engines.
    */
  def histogramEquiDepth(spark: SparkSession, dir: String, buckets: Int = 10)
      : DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    Analytics.bandedNtile(o, "cents", expr("cents div 5000000"),
        tie = "o_orderkey", k = buckets, out = "bucket")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"),
        min($"cents").as("lo_cents"),
        max($"cents").as("hi_cents"),
        sum($"cents").as("sum_cents"))
      .orderBy($"bucket")
  }

  def histogramEquiDepthSql(buckets: Int = 10): String =
    s"""WITH o AS (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders),
        t AS (
          SELECT cents,
                 CAST(NTILE($buckets) OVER (ORDER BY cents, o_orderkey)
                      AS BIGINT) AS bucket
          FROM o)
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
               min(cents) AS lo_cents, max(cents) AS hi_cents,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM t GROUP BY 1 ORDER BY 1"""

  /** Pearson chi-square contingency audit of order priority ×
    * status — the independence test a warehouse runs to decide
    * whether two categorical dimensions actually interact. Output is
    * the full contingency table with each cell's observed count,
    * expected count under independence, and chi-square contribution.
    * All inputs to the fp step are exact BIGINTs (observed o, row
    * total r, column total c, grand total n) and each cell does ONE
    * double expression with a pinned evaluation order —
    * (d·d)/(n·r·c) with d = n·o − r·c computed in integers — so both
    * engines see identical doubles. d fits BIGINT at any real scale
    * (n·o ≤ 4.5·10^17 even at 1.5 billion orders); n·r·c does NOT,
    * so the denominator multiplies as doubles. Three broadcast-sized
    * margins join back to the |priorities|×|statuses| cell frame —
    * everything after the first groupBy is metadata-scale.
    */
  def chiSquareOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("observed"))
    val rowTot = obs.groupBy($"o_orderpriority")
      .agg(sum($"observed").as("r_tot"))
    val colTot = obs.groupBy($"o_orderstatus")
      .agg(sum($"observed").as("c_tot"))
    val grand = obs.agg(sum($"observed").as("n_tot"))
    obs.join(broadcast(rowTot), Seq("o_orderpriority"))
      .join(broadcast(colTot), Seq("o_orderstatus"))
      .crossJoin(broadcast(grand))
      .withColumn("d", expr("n_tot * observed - r_tot * c_tot"))
      .select($"o_orderpriority", $"o_orderstatus", $"observed",
        expr("round(CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) " +
          "/ CAST(n_tot AS DOUBLE), 4)").as("expected"),
        expr("round(CAST(d AS DOUBLE) * CAST(d AS DOUBLE) " +
          "/ (CAST(n_tot AS DOUBLE) * CAST(r_tot AS DOUBLE) " +
          "* CAST(c_tot AS DOUBLE)), 4)").as("contrib"))
      .orderBy($"o_orderpriority", $"o_orderstatus")
  }

  /** Two-sample Kolmogorov–Smirnov test between two languages' doc-
    * length distributions — the distribution-drift detector a data
    * pipeline runs between ingest batches or train/serve splits. The
    * statistic sup|F₁−F₂| is held EXACT by cross-multiplying the
    * ECDFs through both sample sizes: d(x) = |n₂·cum₁(x) −
    * n₁·cum₂(x)|, all BIGINT (headroom n₁·n₂ ≤ 2.5·10¹⁷ even at
    * half-billion-row groups), so the argmax row is bit-identical
    * across engines; the fp KS statistic divides ONCE at the end.
    * The cumulative window runs over the VALUE HISTOGRAM (one row
    * per distinct length, bounded by max doc length — the
    * text_quantile_cut exemption rationale), never corpus rows, and
    * sample totals come from the pre-window frame. Top-1 by
    * (d DESC, value) plans as a TakeOrdered over the domain spine.
    */
  def ksLengths(spark: SparkSession, dir: String,
      langA: String = "en", langB: String = "zh"): DataFrame = {
    import spark.implicits._
    val hist = Tables.documents(spark, dir)
      .filter($"lang".isin(langA, langB))
      .groupBy($"n_chars")
      .agg(sum(when($"lang" === langA, 1L).otherwise(0L)).as("c1"),
        sum(when($"lang" === langB, 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("f1", sum($"c1").over(w))
      .withColumn("f2", sum($"c2").over(w))
    val tot = hist.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    cum.crossJoin(broadcast(tot))
      .withColumn("d", abs($"n2" * $"f1" - $"n1" * $"f2"))
      .orderBy($"d".desc, $"n_chars")
      .limit(1)
      .select($"n_chars".as("at_chars"), $"n1", $"n2", $"d".as("ks_num"),
        round($"d".cast("double") / ($"n1" * $"n2").cast("double"), 6)
          .as("ks_stat"))
  }

  def ksLengthsSql(langA: String = "en", langB: String = "zh"): String =
    s"""WITH h AS (
          SELECT n_chars,
                 CAST(sum(CASE WHEN lang = '$langA' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN lang = '$langB' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c2
          FROM documents WHERE lang IN ('$langA', '$langB') GROUP BY 1),
        c AS (
          SELECT n_chars,
                 CAST(sum(c1) OVER (ORDER BY n_chars) AS BIGINT) AS f1,
                 CAST(sum(c2) OVER (ORDER BY n_chars) AS BIGINT) AS f2
          FROM h),
        t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                     CAST(sum(c2) AS BIGINT) AS n2 FROM h)
        SELECT n_chars AS at_chars, n1, n2,
               abs(n2 * f1 - n1 * f2) AS ks_num,
               round(CAST(abs(n2 * f1 - n1 * f2) AS DOUBLE)
                     / CAST(n1 * n2 AS DOUBLE), 6) AS ks_stat
        FROM c CROSS JOIN t
        ORDER BY ks_num DESC, at_chars LIMIT 1"""

  val chiSquareOrdersSql: String =
    """WITH obs AS (
         SELECT o_orderpriority, o_orderstatus,
                CAST(count(*) AS BIGINT) AS observed
         FROM orders GROUP BY 1, 2),
       r AS (SELECT o_orderpriority, CAST(sum(observed) AS BIGINT) AS r_tot
             FROM obs GROUP BY 1),
       c AS (SELECT o_orderstatus, CAST(sum(observed) AS BIGINT) AS c_tot
             FROM obs GROUP BY 1),
       g AS (SELECT CAST(sum(observed) AS BIGINT) AS n_tot FROM obs),
       cell AS (
         SELECT obs.*, r_tot, c_tot, n_tot,
                n_tot * observed - r_tot * c_tot AS d
         FROM obs JOIN r USING (o_orderpriority)
                  JOIN c USING (o_orderstatus) CROSS JOIN g)
       SELECT o_orderpriority, o_orderstatus, observed,
              round(CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE)
                    / CAST(n_tot AS DOUBLE), 4) AS expected,
              round(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                    / (CAST(n_tot AS DOUBLE) * CAST(r_tot AS DOUBLE)
                       * CAST(c_tot AS DOUBLE)), 4) AS contrib
       FROM cell ORDER BY 1, 2"""

  /** Exact per-group mode — SQL's MODE() WITHIN GROUP, with the
    * deterministic tie-break the standard leaves implementation-
    * defined made explicit (highest count, then lexicographically
    * first value): per order priority, the modal ship month. The
    * distributed spelling is the two-aggregation classic — count per
    * (group, value), then argmax per group via a ranking window whose
    * input is the (|priorities| × 12)-cell AGGREGATE, never corpus
    * rows (the partition key is low-cardinality, which is exactly why
    * the window must sit above the groupBy — WindowAuditSpec's
    * low-card rule pins this shape structurally).
    */
  def modeShipMonth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"n".desc, $"ship_month")
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority",
        month($"o_orderdate").cast("long").as("ship_month"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"o_orderpriority", $"ship_month".as("modal_month"), $"n")
      .orderBy($"o_orderpriority")
  }

  val modeShipMonthSql: String =
    """WITH c AS (
         SELECT o_orderpriority,
                CAST(month(o_orderdate) AS BIGINT) AS ship_month,
                CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY 1, 2)
       SELECT o_orderpriority, ship_month AS modal_month, n
       FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY n DESC, ship_month) AS rk
             FROM c)
       WHERE rk = 1
       ORDER BY o_orderpriority"""

  /** Benford first-digit ppm targets: round(log10(1 + 1/d)·10⁶),
    * precomputed so no transcendental runs in either engine — both
    * sides compare against the SAME integer literals.
    */
  private[graft] val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938) — the
    * fraud/data-quality screen: the leading digit of naturally
    * occurring amounts should follow log10(1 + 1/d). Observed shares
    * are exact integer ppm; expected shares are precomputed integer
    * literals (no log anywhere); the first digit comes from the
    * amount's INTEGER CENTS via string head — exact in both engines,
    * where a float division chain could round differently. One
    * map-side-partial aggregate to 9 cells; the total broadcasts
    * back. Deviations are data, not verdicts: order totals are sums
    * of a few uniform-ish parts, a distribution Benford only loosely
    * fits — the operator reports the gap, the analyst judges it.
    */
  def benfordOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val expected = benfordPpm
      .toDF("digit_e", "expected_ppm")
      .select($"digit_e".cast("long").as("digit_e"), $"expected_ppm")
    val obs = Tables.orders(spark, dir)
      .select(substring(expr(
        "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"),
        1, 1).cast("long").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("observed"))
    val total = obs.agg(sum($"observed").as("total"))
    obs.crossJoin(broadcast(total))
      .join(broadcast(expected), $"digit" === $"digit_e")
      .select($"digit", $"observed",
        expr("(observed * 1000000L) div total").as("obs_ppm"),
        $"expected_ppm",
        (expr("(observed * 1000000L) div total") - $"expected_ppm")
          .as("dev_ppm"))
      .orderBy($"digit")
  }

  val benfordOrdersSql: String = {
    val exp = benfordPpm.map { case (d, p) => s"($d, $p)" }.mkString(", ")
    s"""WITH e(digit, expected_ppm) AS (VALUES $exp),
        obs AS (
          SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                 CAST(count(*) AS BIGINT) AS observed
          FROM orders GROUP BY 1),
        t AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM obs)
        SELECT obs.digit AS digit, observed,
               (observed * 1000000) // total AS obs_ppm,
               CAST(expected_ppm AS BIGINT) AS expected_ppm,
               (observed * 1000000) // total - expected_ppm AS dev_ppm
        FROM obs, t JOIN e ON obs.digit = e.digit
        ORDER BY obs.digit"""
  }

  /** Exact per-row CUME_DIST / PERCENT_RANK — re-planned scale-safe.
    * The window spelling (`cume_dist() OVER (PARTITION BY g ORDER BY
    * x)`) funnels each partition through one sorter; here the corpus
    * reduces to the (group, value) FREQUENCY frame first (one
    * map-side-partial aggregate), the cumulative count runs over
    * that domain-sized frame (the window WindowAuditSpec's low-card
    * rule permits), and per-row values come back by an equi-join —
    * the [[histogramEquiDepth]] device pointed at rank statistics.
    * Held exact in integer ppm: cume = (#rows ≤ x)·10⁶ div n,
    * pct_rank = (#rows < x)·10⁶ div (n−1) — no fp division, so the
    * oracle's window spelling must agree bit-for-bit.
    */
  def cumeDistDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val freq = Tables.documents(spark, dir)
      .groupBy($"lang", $"n_chars")
      .agg(count(lit(1)).as("f"))
    val w = Window.partitionBy($"lang").orderBy($"n_chars")
    val ranks = freq
      .withColumn("cum_le", sum($"f").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_lt", $"cum_le" - $"f")
      .withColumn("n", sum($"f").over(
        Window.partitionBy($"lang")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars")
      .join(broadcast(ranks.select($"lang".as("r_lang"),
          $"n_chars".as("r_nc"), $"cum_le", $"cum_lt", $"n")),
        $"lang" === $"r_lang" && $"n_chars" === $"r_nc")
      .select($"doc_id", $"lang", $"n_chars",
        expr("(cum_le * 1000000L) div n").as("cume_ppm"),
        expr("CASE WHEN n = 1 THEN 0L " +
          "ELSE (cum_lt * 1000000L) div (n - 1) END").as("pct_rank_ppm"))
      .orderBy($"doc_id")
  }

  /** Exact WEIGHTED median (the robust center when rows carry mass —
    * here: median lineitem price per return flag, weighted by
    * quantity, in integer cents). No built-in computes this in either
    * engine; the portable spelling is the definition: collapse to the
    * (group, value) frequency frame with summed weights (one
    * map-side-partial aggregate — the corpus is touched once), then
    * the lower weighted median is the smallest value whose cumulative
    * weight w satisfies 2·w ≥ W — integer cross-multiplication, no
    * halving division. Windows run over the value-domain frame only,
    * the [[cumeDistDocs]] shape.
    */
  def weightedMedianPrice(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val freq = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
      .groupBy($"flag", $"pc").agg(sum($"q").as("wv"))
    val cum = Window.partitionBy($"flag").orderBy($"pc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy($"flag")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    freq
      .withColumn("cumw", sum($"wv").over(cum))
      .withColumn("wtot", sum($"wv").over(tot))
      .filter($"cumw" * 2 >= $"wtot")
      .groupBy($"flag")
      .agg(max($"wtot").as("w_total"), min($"pc").as("wmedian_cents"))
      .orderBy($"flag")
  }

  val weightedMedianPriceSql: String =
    """WITH freq AS (
         SELECT l_returnflag AS flag,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wv
         FROM lineitem GROUP BY 1, 2),
       c AS (
         SELECT flag, pc,
                CAST(sum(wv) OVER (PARTITION BY flag ORDER BY pc
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cumw,
                CAST(sum(wv) OVER (PARTITION BY flag) AS BIGINT) AS wtot
         FROM freq)
       SELECT flag, max(wtot) AS w_total, min(pc) AS wmedian_cents
       FROM c WHERE cumw * 2 >= wtot
       GROUP BY flag ORDER BY flag"""

  /** Deterministic Poisson-bootstrap confidence interval for a mean —
    * uncertainty quantification that survives a distributed engine
    * AND a cross-engine oracle. Classic bootstrap resampling draws
    * with an RNG (unreproducible, partition-dependent); the Poisson
    * bootstrap (Chamandy et al., "Estimating uncertainty for massive
    * data streams", Google 2012) replaces it with per-row
    * multiplicities drawn independently — and here even those are
    * DERANDOMIZED: row i's multiplicity in resample b counts how many
    * of 8 3-bit fields of md5(i, b) are zero (Binomial(8, 1/8) ≈
    * Poisson(1)), so every engine replays the identical resamples
    * bit-for-bit. One scan computes all B weighted (Σw·x, Σw) pairs
    * as map-side-partial BIGINT sums; the B resample means and the
    * percentile CI are metadata-scale arithmetic on one row.
    */
  val BootstrapB = 32

  def bootstrapMeanCI(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // One (row × resample) exploded pass instead of 2·B wide
    // aggregate expressions: the wide spelling inlined the md5-based
    // multiplicity 2·8 times per resample into 64 aggregate arms —
    // a plan whose ANALYSIS alone cost ~1.3 s per invocation (r16
    // probe: 1.73 s gate, 0.37 s of jobs). The exploded form hashes
    // once per (row, b), aggregates two BIGINT columns per resample
    // key, and collects B rows — the identical integer (Σw·x, Σw)
    // pairs, so the means and CI are bit-for-bit the same.
    val docs = Tables.documents(spark, dir).select($"doc_id", $"n_chars")
      .localCheckpoint(true)
    val h = conv(substring(md5(concat($"doc_id".cast("string"),
      lit("#boot"), $"b".cast("string"))), 1, 7), 16, 10).cast("long")
    // multiplicity: 8 3-bit fields of the 28-bit hash, success = 0
    val mult = (0 until 8).map(j =>
      when(shiftright(h, 3 * j) % 8 === 0, 1L)
        .otherwise(0L)).reduce(_ + _)
    val base = docs.agg(sum($"n_chars"), count(lit(1))).head()
    val point = base.getLong(0).toDouble / base.getLong(1)
    val perB = docs
      .select($"doc_id", $"n_chars",
        explode(sequence(lit(0), lit(BootstrapB - 1))).as("b"))
      .withColumn("w", mult)
      .groupBy($"b")
      .agg(sum($"w" * $"n_chars").as("wx"), sum($"w").as("w"))
      .collect()
    val means = perB.map(r =>
      r.getLong(1).toDouble / r.getLong(2)).toSeq.sorted
    // percentile_disc at 5% / 95% over the B sorted means; round
    // half-away-from-zero (values ≥ 0) to match SQL round()
    def disc(p: Double) = means(math.ceil(p * BootstrapB).toInt - 1)
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    Seq((BootstrapB.toLong, r4(point), r4(disc(0.05)), r4(disc(0.95))))
      .toDF("n_resamples", "mean_n_chars", "ci_lo", "ci_hi")
  }

  def bootstrapMeanCISql: String = {
    val b = "('0x' || substr(md5(doc_id::VARCHAR || '#boot' || b.b::VARCHAR), 1, 7))::BIGINT"
    s"""WITH m AS (
          SELECT b.b, d.n_chars,
                 (CASE WHEN ($b // 1) % 8 = 0 THEN 1 ELSE 0 END
                + CASE WHEN ($b // 8) % 8 = 0 THEN 1 ELSE 0 END
                + CASE WHEN ($b // 64) % 8 = 0 THEN 1 ELSE 0 END
                + CASE WHEN ($b // 512) % 8 = 0 THEN 1 ELSE 0 END
                + CASE WHEN ($b // 4096) % 8 = 0 THEN 1 ELSE 0 END
                + CASE WHEN ($b // 32768) % 8 = 0 THEN 1 ELSE 0 END
                + CASE WHEN ($b // 262144) % 8 = 0 THEN 1 ELSE 0 END
                + CASE WHEN ($b // 2097152) % 8 = 0 THEN 1 ELSE 0 END) AS w
          FROM documents d, range($BootstrapB) b(b)),
        means AS (
          SELECT b, CAST(sum(w * n_chars) AS DOUBLE) / CAST(sum(w) AS BIGINT)
                   AS mu
          FROM m GROUP BY b),
        pt AS (
          SELECT CAST(sum(n_chars) AS DOUBLE) / count(*) AS mu FROM documents)
        SELECT CAST($BootstrapB AS BIGINT) AS n_resamples,
               round((SELECT mu FROM pt), 4) AS mean_n_chars,
               round(percentile_disc(0.05) WITHIN GROUP (ORDER BY mu), 4)
                 AS ci_lo,
               round(percentile_disc(0.95) WITHIN GROUP (ORDER BY mu), 4)
                 AS ci_hi
        FROM means"""
  }

  /** Two-sample Mann-Whitney U (Wilcoxon rank-sum) between two
    * languages' doc-length distributions — the rank-based
    * location-shift test that pairs with [[ksLengths]]'s shape test
    * in a drift-monitoring suite (robust where a t-test's mean is
    * wrecked by the heavy doc-length tail). Exactness device: ranks
    * are midranks over the VALUE HISTOGRAM, and a midrank's only
    * fraction is the half from (t+1)/2 — so the operator carries
    * DOUBLED rank sums and everything stays BIGINT: a distinct value
    * with t = c₁+c₂ occurrences after `before` smaller ones has
    * doubled midrank 2·before + t + 1, giving 2R₁ = Σ c₁·(2·before +
    * t + 1) and 2U₁ = 2R₁ − n₁(n₁+1) (the sample-1-wins convention:
    * sample 1 uniformly larger ⇒ U₁ = n₁n₂, z > 0; headroom: 2R₁ ≤
    * 2n·n₁ ≈ 10¹⁸ only past 10⁹-row two-language samples). The tie
    * correction Σ(t³−t) is likewise exact BIGINT. Only the z-score
    * touches doubles, in ONE pinned expression of the exact integers
    * — z = (2U₁−n₁n₂) / (2·√(n₁n₂/12·((n+1) − Σ(t³−t)/(n(n−1))))) —
    * so both engines compute identical IEEE doubles (√ is correctly
    * rounded). The cumulative window runs over the value histogram,
    * never corpus rows (same exemption as [[ksLengths]]); everything
    * past the first groupBy is domain-sized.
    */
  def mannWhitneyLengths(spark: SparkSession, dir: String,
      langA: String = "en", langB: String = "de"): DataFrame = {
    import spark.implicits._
    val hist = Tables.documents(spark, dir)
      .filter($"lang".isin(langA, langB))
      .groupBy($"n_chars")
      .agg(sum(when($"lang" === langA, 1L).otherwise(0L)).as("c1"),
        sum(when($"lang" === langB, 1L).otherwise(0L)).as("c2"))
    val before = Window.orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("t", $"c1" + $"c2")
      .withColumn("bef", coalesce(sum($"t").over(before), lit(0L)))
    val agg = ranked.agg(
      sum($"c1").as("n1"), sum($"c2").as("n2"),
      sum($"c1" * (lit(2L) * $"bef" + $"t" + lit(1L))).as("r1_x2"),
      sum($"t" * $"t" * $"t" - $"t").as("tie_term"))
    agg.select($"n1", $"n2",
        ($"r1_x2" - $"n1" * ($"n1" + 1L)).as("u1_x2"), $"tie_term")
      .withColumn("n", $"n1" + $"n2")
      .withColumn("z", round(
        ($"u1_x2" - $"n1" * $"n2").cast("double") /
          (lit(2.0) * sqrt(
            $"n1".cast("double") * $"n2".cast("double") / lit(12.0) *
              (($"n" + 1L).cast("double") - $"tie_term".cast("double") /
                ($"n".cast("double") * ($"n" - 1L).cast("double"))))),
        4))
      .select($"n1", $"n2", $"u1_x2", $"tie_term", $"z")
  }

  def mannWhitneyLengthsSql(langA: String = "en",
      langB: String = "de"): String =
    s"""WITH h AS (
          SELECT n_chars,
                 CAST(sum(CASE WHEN lang = '$langA' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN lang = '$langB' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c2
          FROM documents WHERE lang IN ('$langA', '$langB') GROUP BY 1),
        r AS (
          SELECT c1, c2, c1 + c2 AS t,
                 CAST(coalesce(sum(c1 + c2) OVER (ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS bef
          FROM h),
        a AS (
          SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2,
                 CAST(sum(c1 * (2 * bef + t + 1)) AS BIGINT) AS r1_x2,
                 CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
          FROM r),
        u AS (
          SELECT n1, n2, r1_x2 - n1 * (n1 + 1) AS u1_x2,
                 tie_term, n1 + n2 AS n
          FROM a)
        SELECT n1, n2, CAST(u1_x2 AS BIGINT) AS u1_x2, tie_term,
               round(CAST(u1_x2 - n1 * n2 AS DOUBLE)
                     / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                         / 12.0
                         * (CAST(n + 1 AS DOUBLE) - CAST(tie_term AS DOUBLE)
                            / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))),
                     4) AS z
        FROM u"""

  /** Per-nation Gini coefficient of customer lifetime revenue — the
    * concentration statistic behind "top-x% of customers drive y% of
    * revenue" (and, in a training-data pipeline, source-contribution
    * skew). The rank form G = (2·Σ rᵢxᵢ − (n+1)·Σx) / (n·Σx) keeps
    * every accumulator exact BIGINT (value-tied customers permute
    * only within equal x, so Σ r·x is tie-order-free); the single fp
    * division is pinned and rounded once. Zero-order customers enter
    * at x = 0 — real inequality the orders table alone can't see.
    *
    * Scale shape: the per-nation rank is the banded two-phase device
    * (the [[graft.operators.Analytics]] bandedNtile layout): $10k
    * revenue bands give per-(nation, band) row_number windows plus a
    * band-level offset window — nothing customer-sized funnels
    * through one task. Headroom: Σ r·x ≤ n·Σx holds BIGINT while
    * n·Σcents < 9·10¹⁸ (a 10⁸-customer nation at $1k average is
    * 10¹⁹·0.1 — at that scale move cents to mills-of-dollars).
    */
  def giniRevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perCust = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("ck"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spent"))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey".as("ck"), $"c_nationkey".as("nk"))
      .join(perCust, Seq("ck"), "left")
      .withColumn("cents", coalesce($"spent", lit(0L)))
      .withColumn("band", expr("cents div 1000000"))
    val bandCounts = cust.groupBy($"nk", $"band")
      .agg(count(lit(1)).as("bn"))
    val wB = Window.partitionBy($"nk").orderBy($"band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandCounts
      .withColumn("off", coalesce(sum($"bn").over(wB), lit(0L)))
      .select($"nk", $"band", $"off")
    val wIn = Window.partitionBy($"nk", $"band")
      .orderBy($"cents", $"ck")
    val moments = cust.join(broadcast(offsets), Seq("nk", "band"))
      .withColumn("rk", $"off" + row_number().over(wIn))
      .groupBy($"nk")
      .agg(count(lit(1)).as("n"), sum($"cents").as("t"),
        sum($"rk" * $"cents").as("aa"))
    moments
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey".as("nk"), $"n_name".as("nation"))),
        Seq("nk"))
      .select($"nation", $"n", $"t".as("total_cents"),
        round((lit(2L) * $"aa" - ($"n" + 1L) * $"t").cast("double") /
          ($"n".cast("double") * $"t".cast("double")), 6).as("gini"))
      .orderBy($"nation")
  }

  val giniRevenueByNationSql: String =
    """WITH pc AS (
         SELECT o_custkey AS ck,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS spent
         FROM orders GROUP BY 1),
       cu AS (
         SELECT c_custkey AS ck, c_nationkey AS nk,
                CAST(coalesce(pc.spent, 0) AS BIGINT) AS cents
         FROM customer LEFT JOIN pc ON pc.ck = c_custkey),
       r AS (
         SELECT nk, cents,
                CAST(row_number() OVER (PARTITION BY nk
                  ORDER BY cents, ck) AS BIGINT) AS rk
         FROM cu),
       a AS (
         SELECT nk, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(cents) AS BIGINT) AS t,
                CAST(sum(rk * cents) AS BIGINT) AS aa
         FROM r GROUP BY 1)
       SELECT n_name AS nation, n, t AS total_cents,
              round(CAST(2 * aa - (n + 1) * t AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS gini
       FROM a JOIN nation ON n_nationkey = nk
       ORDER BY nation"""

  /** Theil T inequality index of customer revenue per nation, plus
    * the pooled 'ALL' row — the DECOMPOSABLE companion to
    * [[giniRevenueByNation]]: unlike Gini, Theil splits exactly into
    * within-group + between-group terms (T_total = Σ s_g·T_g +
    * Σ s_g·ln(s_g/p_g), s_g = revenue share, p_g = population
    * share), so the pooled row and the per-nation rows together
    * answer "is inequality driven inside nations or between them"
    * (TheilSpec pins the identity). Identity used per group:
    * T = [Σ x·ln x]/S − ln(S/N) — so no per-row x/μ division ever
    * happens. Exactness: x is exact integer cents; each customer's
    * x·ln x is quantized ONCE to integer milli-(cent·nat)s (round
    * at 10³ keeps the quantization error ~N/(2·10³·S) ≈ 10⁻⁹ at any
    * real μ, orders below the 6-decimal display rounding, with
    * BIGINT headroom Σ x·lnx·10³ < 9.2×10¹⁸ ≈ $4.6B·ln-weighted),
    * so the group sums are order-proof BIGINTs and the two fp steps
    * (the final division and ln μ) are pinned in one projection.
    * Zero-revenue customers contribute x·ln x = 0 — the correct
    * x→0 limit — and are counted in N.
    *
    * Scale shape: one partial-agg'd pass collapses orders to
    * per-customer cents, a second to |nations|+1 rows; no window,
    * no sort, nothing corpus-sized past the first aggregate.
    */
  def theilRevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perCust = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("ck"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spent"))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey".as("ck"), $"c_nationkey".as("nk"))
      .join(perCust, Seq("ck"), "left")
      .withColumn("cents", coalesce($"spent", lit(0L)))
      .withColumn("xlx_milli",
        when($"cents" > 0L, round($"cents".cast("double")
          * log($"cents".cast("double")) * lit(1000.0)).cast("long"))
          .otherwise(0L))
    def theilCol = round(
      $"xlx_milli".cast("double") / ($"t".cast("double") * 1000.0)
        - log($"t".cast("double") / $"n".cast("double")), 6)
    val byNation = cust.groupBy($"nk")
      .agg(count(lit(1)).as("n"), sum($"cents").as("t"),
        sum($"xlx_milli").as("xlx_milli"))
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey".as("nk"), $"n_name".as("nation"))), Seq("nk"))
      .select($"nation", $"n", $"t".as("total_cents"), theilCol.as("theil"))
    val pooled = cust
      .agg(count(lit(1)).as("n"), sum($"cents").as("t"),
        sum($"xlx_milli").as("xlx_milli"))
      .select(lit("ALL").as("nation"), $"n", $"t".as("total_cents"),
        theilCol.as("theil"))
    byNation.unionByName(pooled).orderBy($"nation")
  }

  val theilRevenueByNationSql: String =
    """WITH pc AS (
         SELECT o_custkey AS ck,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS spent
         FROM orders GROUP BY 1),
       cu AS (
         SELECT c_custkey AS ck, c_nationkey AS nk,
                CAST(coalesce(pc.spent, 0) AS BIGINT) AS cents
         FROM customer LEFT JOIN pc ON pc.ck = c_custkey),
       x AS (
         SELECT nk, cents,
                CAST(CASE WHEN cents > 0 THEN
                  round(CAST(cents AS DOUBLE) * ln(CAST(cents AS DOUBLE))
                        * 1000) ELSE 0 END AS BIGINT) AS xlx_milli
         FROM cu),
       g AS (
         SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(cents) AS BIGINT) AS t,
                CAST(sum(xlx_milli) AS BIGINT) AS xlx_milli
         FROM x JOIN nation ON n_nationkey = nk GROUP BY 1
         UNION ALL
         SELECT 'ALL', CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT),
                CAST(sum(xlx_milli) AS BIGINT)
         FROM x)
       SELECT nation, n, t AS total_cents,
              round(CAST(xlx_milli AS DOUBLE) / (CAST(t AS DOUBLE) * 1000)
                    - ln(CAST(t AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS theil
       FROM g ORDER BY nation"""

  /** ABC (Pareto) classification of parts by revenue contribution —
    * the inventory-analysis classic that operationalizes [[
    * giniRevenueByNation]]'s concentration number: parts are ranked
    * by revenue and split where the running share crosses 80%
    * (class A) and 95% (B), rest C. Exactness: revenue is the exact
    * cents×basis-points BIGINT of the Q5 device; the running total
    * uses the banded two-phase layout (coarse revenue-magnitude
    * bands, per-band windows + an offset window over the band-level
    * AGGREGATE — nothing part-sized in one task); class boundaries
    * compare cross-multiplied integers (5·cum ≤ 4·total, 20·cum ≤
    * 19·total — no fp at the 80/95 edges); only the reported share
    * divides, once, pinned.
    */
  def abcParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .select($"l_partkey".as("pk"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) " +
          "* (10000L - CAST(round(l_discount * 10000) AS BIGINT))")
          .as("r"))
      .groupBy($"pk").agg(sum($"r").as("rev"))
    val banded = rev.withColumn("band", expr("rev div 100000000000L"))
    val bandAgg = banded.groupBy($"band")
      .agg(sum($"rev").as("brev"))
    // offsets: revenue mass in strictly HIGHER bands (rank runs
    // from the richest part down)
    val wB = Window.orderBy($"band".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandAgg
      .withColumn("off", coalesce(sum($"brev").over(wB), lit(0L)))
      .select($"band", $"off")
    val total = bandAgg.agg(sum($"brev").as("tot"))
    val wIn = Window.partitionBy($"band")
      .orderBy($"rev".desc, $"pk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded.join(broadcast(offsets), Seq("band"))
      .crossJoin(broadcast(total))
      .withColumn("cum", $"off" + sum($"rev").over(wIn))
      .withColumn("cls",
        when(lit(5L) * $"cum" <= lit(4L) * $"tot", "A")
          .when(lit(20L) * $"cum" <= lit(19L) * $"tot", "B")
          .otherwise("C"))
      .groupBy($"cls")
      .agg(count(lit(1)).as("n_parts"), sum($"rev").as("revenue_i"))
      .crossJoin(broadcast(total))
      .withColumn("share", round(
        $"revenue_i".cast("double") / $"tot".cast("double"), 6))
      .select($"cls", $"n_parts", $"revenue_i", $"share")
      .orderBy($"cls")
  }

  val abcPartsSql: String =
    """WITH rev AS (
         SELECT l_partkey AS pk,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
                  AS BIGINT) AS rev
         FROM lineitem GROUP BY 1),
       t AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM rev),
       c AS (
         SELECT rev,
                CAST(sum(rev) OVER (ORDER BY rev DESC, pk) AS BIGINT)
                  AS cum
         FROM rev),
       cls AS (
         SELECT rev,
                CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                     WHEN 20 * cum <= 19 * tot THEN 'B'
                     ELSE 'C' END AS cls
         FROM c CROSS JOIN t)
       SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
              CAST(sum(rev) AS BIGINT) AS revenue_i,
              round(CAST(sum(rev) AS DOUBLE)
                    / CAST((SELECT tot FROM t) AS DOUBLE), 6) AS share
       FROM cls GROUP BY cls ORDER BY cls"""

  /** Year-over-year revenue bridge per brand — the price–volume
    * decomposition of ΔR every finance review runs: with average
    * unit price p̄ = r/q, the Laspeyres split V = (q₁−q₀)·p̄₀
    * (volume effect) and P = ΔR − V (price/mix effect) telescopes
    * EXACTLY (V + P = ΔR by construction, so the bridge always
    * reconciles). All inputs are exact BIGINT (revenue cents via the
    * round(·100) device, quantities integer-valued); V is the one fp
    * expression, pinned, and P is derived from it so rounding can't
    * break additivity by more than the two rounded terms. Brands
    * absent from either year are excluded (a one-sided bridge has no
    * p̄₀ or no q₁ — the HAVING guard, deterministic). Plan: two
    * keyed fact joins, one |brands|×2 aggregate, metadata-scale
    * after.
    */
  def priceVolumeBridge(spark: SparkSession, dir: String,
      y0: Int = 1996, y1: Int = 1997): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey",
        expr("CAST(l_quantity AS BIGINT)").as("q"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("rc"))
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", year($"o_orderdate").as("yr"))
      .filter($"yr".isin(y0, y1))
    val brand = Tables.part(spark, dir)
      .select($"p_partkey", $"p_brand")
    val agg = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(brand), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand".as("brand"))
      .agg(
        sum(when($"yr" === y0, $"q").otherwise(0L)).as("q0"),
        sum(when($"yr" === y1, $"q").otherwise(0L)).as("q1"),
        sum(when($"yr" === y0, $"rc").otherwise(0L)).as("r0"),
        sum(when($"yr" === y1, $"rc").otherwise(0L)).as("r1"))
      .filter($"q0" > 0 && $"q1" > 0)
    agg
      .withColumn("volume_effect", round(
        ($"q1" - $"q0").cast("double") *
          ($"r0".cast("double") / $"q0".cast("double")), 2))
      .withColumn("price_effect", round(
        ($"r1" - $"r0").cast("double") -
          (($"q1" - $"q0").cast("double") *
            ($"r0".cast("double") / $"q0".cast("double"))), 2))
      .select($"brand", $"r0", $"r1", $"q0", $"q1",
        $"volume_effect", $"price_effect")
      .orderBy($"brand")
  }

  def priceVolumeBridgeSql(y0: Int = 1996, y1: Int = 1997): String =
    s"""WITH f AS (
          SELECT p.p_brand AS brand, year(o.o_orderdate) AS yr,
                 CAST(l.l_quantity AS BIGINT) AS q,
                 CAST(round(l.l_extendedprice * 100) AS BIGINT) AS rc
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE year(o.o_orderdate) IN ($y0, $y1)),
        a AS (
          SELECT brand,
                 CAST(sum(CASE WHEN yr = $y0 THEN q ELSE 0 END) AS BIGINT)
                   AS q0,
                 CAST(sum(CASE WHEN yr = $y1 THEN q ELSE 0 END) AS BIGINT)
                   AS q1,
                 CAST(sum(CASE WHEN yr = $y0 THEN rc ELSE 0 END) AS BIGINT)
                   AS r0,
                 CAST(sum(CASE WHEN yr = $y1 THEN rc ELSE 0 END) AS BIGINT)
                   AS r1
          FROM f GROUP BY brand
          HAVING q0 > 0 AND q1 > 0)
        SELECT brand, r0, r1, q0, q1,
               round(CAST(q1 - q0 AS DOUBLE)
                     * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)), 2)
                 AS volume_effect,
               round(CAST(r1 - r0 AS DOUBLE)
                     - (CAST(q1 - q0 AS DOUBLE)
                        * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))), 2)
                 AS price_effect
        FROM a ORDER BY brand"""

  /** Oracle: the textbook window spelling, integer-cross-multiplied
    * to the same ppm arithmetic.
    */
  val cumeDistDocsSql: String =
    """SELECT doc_id, lang, n_chars,
         (count(*) OVER (PARTITION BY lang ORDER BY n_chars
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          * 1000000) // count(*) OVER (PARTITION BY lang) AS cume_ppm,
         CASE WHEN count(*) OVER (PARTITION BY lang) = 1 THEN 0
              ELSE ((count(*) OVER (PARTITION BY lang ORDER BY n_chars
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - count(*) OVER (PARTITION BY lang, n_chars))
                    * 1000000)
                   // (count(*) OVER (PARTITION BY lang) - 1) END
           AS pct_rank_ppm
       FROM documents
       ORDER BY doc_id"""

  /** Per-brand Spearman rank correlation between retail price and
    * size — the monotone-association statistic that survives the
    * nonlinearities Pearson ([[graft.operators.Profile]]'s
    * correlation matrix) misses. Exactness device: midranks over
    * DOUBLED values (a midrank's only fraction is a half, so 2·rank
    * stays BIGINT: 2·midrank = 2·rank_min + t − 1 with t the tie
    * count), making all five accumulators (Σx, Σy, Σxy, Σx², Σy²)
    * exact integers; ρ is Pearson over the doubled ranks — the
    * doubling cancels — computed in ONE pinned double expression of
    * the integer sums, so both engines emit identical IEEE doubles.
    * Both rank windows are PARTITIONED by brand; nothing
    * unpartitioned anywhere. Headroom: n·Σx² ≈ 4n⁴ holds BIGINT to
    * ~10⁴-row groups; past that, band the ranks like
    * Analytics.bandedNtile.
    */
  def spearmanBrand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir).select($"p_brand",
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_c"),
      $"p_size".cast("long").as("size_l"))
    val rx = Window.partitionBy($"p_brand").orderBy($"price_c")
    val ry = Window.partitionBy($"p_brand").orderBy($"size_l")
    val ranked = p
      .withColumn("x2", lit(2L) * rank().over(rx) +
        count(lit(1)).over(Window.partitionBy($"p_brand", $"price_c")) - 1L)
      .withColumn("y2", lit(2L) * rank().over(ry) +
        count(lit(1)).over(Window.partitionBy($"p_brand", $"size_l")) - 1L)
    ranked.groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        sum($"x2").as("sx"), sum($"y2").as("sy"),
        sum($"x2" * $"y2").as("sxy"),
        sum($"x2" * $"x2").as("sxx"),
        sum($"y2" * $"y2").as("syy"))
      .withColumn("rho", round(
        expr("""(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""),
        6))
      .select($"p_brand", $"n", $"sxy", $"rho")
      .orderBy($"p_brand")
  }

  val spearmanBrandSql: String =
    """WITH p AS (
         SELECT p_brand,
                CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
                CAST(p_size AS BIGINT) AS size_l
         FROM part),
       r AS (
         SELECT p_brand,
                2 * rank() OVER (PARTITION BY p_brand ORDER BY price_c)
                  + count(*) OVER (PARTITION BY p_brand, price_c) - 1 AS x2,
                2 * rank() OVER (PARTITION BY p_brand ORDER BY size_l)
                  + count(*) OVER (PARTITION BY p_brand, size_l) - 1 AS y2
         FROM p),
       a AS (
         SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x2) AS BIGINT) AS sx,
                CAST(sum(y2) AS BIGINT) AS sy,
                CAST(sum(x2 * y2) AS BIGINT) AS sxy,
                CAST(sum(x2 * x2) AS BIGINT) AS sxx,
                CAST(sum(y2 * y2) AS BIGINT) AS syy
         FROM r GROUP BY p_brand)
       SELECT p_brand, n, sxy,
              round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                    6) AS rho
       FROM a ORDER BY p_brand"""

  /** Per-group higher central moments — skewness and excess kurtosis
    * of lineitem quantity by return flag, the distribution-shape
    * profile a drift monitor tracks beyond mean/stddev
    * ([[statsSummary]]). Device: ONE scan accumulates the four raw
    * power sums as exact integers (quantities are integral; Σq⁴ ≤
    * n·50⁴ holds BIGINT to ~10¹² rows per group); the moment algebra
    * then runs through an identical STAGED pipeline of double
    * expressions in both engines — each stage (mean, m2, m3, m4) is
    * one pinned expression reusing the previous stage's value, so
    * the IEEE operation sequence matches bit-for-bit and g1/g2
    * hash-match without any integerization of the cubics.
    */
  def momentsQuantity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", expr("CAST(l_quantity AS BIGINT)").as("q"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"q").as("s1"),
        sum($"q" * $"q").as("s2"),
        sum($"q" * $"q" * $"q").as("s3"),
        sum($"q" * $"q" * $"q" * $"q").as("s4"))
      .withColumn("mean", expr("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("m2", expr(
        "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean"))
      .withColumn("m3", expr(
        """CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
           - 3.0 * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
           + 2.0 * mean * mean * mean"""))
      .withColumn("m4", expr(
        """CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
           - 4.0 * mean * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
           + 6.0 * mean * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
           - 3.0 * mean * mean * mean * mean"""))
      .select($"l_returnflag", $"n", $"s1", $"s2", $"s3", $"s4",
        round(expr("m3 / (m2 * sqrt(m2))"), 6).as("skewness"),
        round(expr("m4 / (m2 * m2) - 3.0"), 6).as("kurtosis_ex"))
      .orderBy($"l_returnflag")
  }

  val momentsQuantitySql: String =
    """WITH a AS (
         SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(q) AS BIGINT) AS s1,
                CAST(sum(q * q) AS BIGINT) AS s2,
                CAST(sum(q * q * q) AS BIGINT) AS s3,
                CAST(sum(q * q * q * q) AS BIGINT) AS s4
         FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
               FROM lineitem)
         GROUP BY l_returnflag),
       st1 AS (SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean
               FROM a),
       st2 AS (SELECT *, CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                         - mean * mean AS m2
               FROM st1),
       st3 AS (SELECT *, CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
                         - 3.0 * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                         + 2.0 * mean * mean * mean AS m3
               FROM st2),
       st4 AS (SELECT *, CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
                         - 4.0 * mean * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                         + 6.0 * mean * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                         - 3.0 * mean * mean * mean * mean AS m4
               FROM st3)
       SELECT l_returnflag, n, s1, s2, s3, s4,
              round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
              round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_ex
       FROM st4 ORDER BY l_returnflag"""

  /** Kruskal–Wallis rank test across ALL languages' doc-length
    * distributions — the k-group generalization of
    * [[mannWhitneyLengths]] (one test answering "do any of the k
    * sources/languages differ in location?" without k² pairwise
    * U-tests). Same exactness device: midranks over the VALUE
    * HISTOGRAM carried DOUBLED so every accumulator is BIGINT — a
    * value with t total occurrences after `bef` smaller ones has
    * doubled midrank 2·bef + t + 1, and each group's doubled rank
    * sum is Σ c_g·(2·bef + t + 1). The gate deliberately emits the
    * per-group EXACT INTEGERS (n_g, rsum_x2) plus the shared N and
    * tie term rather than folding them into H: the k-term Σ R²/n
    * sum would make the single fp result depend on cross-group
    * addition order, which no engine pins — the spec recomputes H
    * from these integers and checks it against an independent
    * in-memory rank fold. The cumulative window runs over the value
    * histogram (domain-sized — same exemption as ksLengths); corpus
    * rows feed exactly one aggregation.
    */
  def kruskalWallisLengths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.documents(spark, dir)
      .groupBy($"n_chars", $"lang").agg(count(lit(1)).as("c"))
    val vals = hist.groupBy($"n_chars").agg(sum($"c").as("t"))
    val before = Window.orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals
      .withColumn("bef", coalesce(sum($"t").over(before), lit(0L)))
    val tot = ranked.agg(sum($"t").as("n_total"),
      sum($"t" * $"t" * $"t" - $"t").as("tie_term"))
    hist.join(ranked, Seq("n_chars"))
      .groupBy($"lang")
      .agg(sum($"c").as("n_g"),
        sum($"c" * (lit(2L) * $"bef" + $"t" + lit(1L))).as("rsum_x2"))
      .crossJoin(broadcast(tot))
      .select($"lang", $"n_g", $"rsum_x2", $"n_total", $"tie_term")
      .orderBy($"lang")
  }

  val kruskalWallisLengthsSql: String =
    """WITH h AS (
         SELECT n_chars, lang, CAST(count(*) AS BIGINT) AS c
         FROM documents GROUP BY 1, 2),
       v AS (
         SELECT n_chars, CAST(sum(c) AS BIGINT) AS t
         FROM h GROUP BY 1),
       r AS (
         SELECT n_chars, t,
                CAST(coalesce(sum(t) OVER (ORDER BY n_chars
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS bef
         FROM v),
       tot AS (
         SELECT CAST(sum(t) AS BIGINT) AS n_total,
                CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
         FROM r)
       SELECT lang, CAST(sum(c) AS BIGINT) AS n_g,
              CAST(sum(c * (2 * bef + t + 1)) AS BIGINT) AS rsum_x2,
              n_total, tie_term
       FROM h JOIN r USING (n_chars) CROSS JOIN tot
       GROUP BY lang, n_total, tie_term
       ORDER BY lang"""

  /** SQL-standard INTERPOLATED percentiles (PERCENTILE_CONT WITHIN
    * GROUP) per language, re-planned scale-safe AND exact: the
    * standard's x_⌊pos⌋ + frac·(x_⌊pos⌋+1 − x_⌊pos⌋) at 0-based pos
    * = p·(n−1) is all integer when carried in hundredths — pos100 =
    * p_pct·(n−1), frac = pos100 mod 100, and the emitted value is
    * ×100: lo·(100−frac) + hi·frac, a BIGINT no fp interpolation
    * ever touches (the companion to [[percentilesByLang]]'s DISC
    * form, which can only return data values). The two bracketing
    * order statistics come from the per-group VALUE HISTOGRAM: rank
    * r's value is the row with cum−c < r ≤ cum, fetched by joining a
    * domain-sized (lang, rank) target frame against the cumulative
    * histogram — corpus rows feed one aggregation, the ranking
    * window is partitioned by lang over histogram rows, and no
    * per-group sort of raw rows exists anywhere.
    */
  def percentileContByLang(spark: SparkSession, dir: String,
      pcts: Seq[Int] = Seq(50, 90)): DataFrame = {
    import spark.implicits._
    val hist = Tables.documents(spark, dir)
      .groupBy($"lang", $"n_chars".cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy($"lang").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum($"c").over(cumW))
    val ns = hist.groupBy($"lang").agg(sum($"c").as("n"))
    val targets = ns.select($"lang", $"n",
        explode(typedLit(pcts.map(_.toLong))).as("p"))
      .select($"lang", $"n", $"p",
        expr("(p * (n - 1)) div 100 + 1").as("r_lo"),
        expr("least((p * (n - 1)) div 100 + 2, n)").as("r_hi"),
        expr("(p * (n - 1)) % 100").as("frac"))
    def rankValue(rankCol: String, as: String) =
      cum.select($"lang".as("hl"), $"v", $"c", $"cum")
        .join(targets, $"hl" === $"lang" &&
          col(rankCol) > $"cum" - $"c" && col(rankCol) <= $"cum")
        .select($"lang", $"p", $"n", $"frac", $"v".as(as))
    rankValue("r_lo", "v_lo")
      .join(rankValue("r_hi", "v_hi"), Seq("lang", "p", "n", "frac"))
      .select($"lang", $"p", $"n".as("n_docs"),
        ($"v_lo" * (lit(100L) - $"frac") + $"v_hi" * $"frac")
          .as("pcont_x100"))
      .withColumn("pcont", round($"pcont_x100".cast("double") / 100.0, 2))
      .orderBy($"lang", $"p")
  }

  def percentileContByLangSql(pcts: Seq[Int] = Seq(50, 90)): String = {
    val plist = pcts.mkString(", ")
    s"""WITH h AS (
         SELECT lang, CAST(n_chars AS BIGINT) AS v,
                CAST(count(*) AS BIGINT) AS c
         FROM documents GROUP BY 1, 2),
       cum AS (
         SELECT lang, v, c,
                CAST(sum(c) OVER (PARTITION BY lang ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
         FROM h),
       ns AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
       t AS (
         SELECT lang, n, CAST(p AS BIGINT) AS p,
                (p * (n - 1)) // 100 + 1 AS r_lo,
                least((p * (n - 1)) // 100 + 2, n) AS r_hi,
                (p * (n - 1)) % 100 AS frac
         FROM ns, unnest([$plist]) AS u(p)),
       lo AS (
         SELECT t.lang, t.p, t.n, t.frac, cum.v AS v_lo
         FROM t JOIN cum ON t.lang = cum.lang
          AND t.r_lo > cum.cum - cum.c AND t.r_lo <= cum.cum),
       hi AS (
         SELECT t.lang, t.p, cum.v AS v_hi
         FROM t JOIN cum ON t.lang = cum.lang
          AND t.r_hi > cum.cum - cum.c AND t.r_hi <= cum.cum)
       SELECT lo.lang, lo.p, lo.n AS n_docs,
              lo.v_lo * (100 - lo.frac) + hi.v_hi * lo.frac AS pcont_x100,
              round(CAST(lo.v_lo * (100 - lo.frac) + hi.v_hi * lo.frac
                    AS DOUBLE) / 100.0, 2) AS pcont
       FROM lo JOIN hi ON lo.lang = hi.lang AND lo.p = hi.p
       ORDER BY lo.lang, lo.p"""
  }

  /** The Skyline operator (Börzsönyi/Kossmann/Stocker, ICDE 2001):
    * Pareto-optimal (size, price) points — parts where you cannot get
    * a bigger size for the same-or-less money. The classic dominance
    * definition ((size' ≥ size ∧ price' ≤ price, one strict) knocks a
    * point out), restated scan-wise: aggregate to the best (min)
    * price per size, order sizes DESCENDING, and keep a size iff its
    * best price is strictly below every larger size's best price — a
    * running strict-min, the 2-d skyline's linear form.
    *
    * Scale: the corpus collapses to ≤|distinct sizes| rows in one
    * map-side-partial aggregate; the running-min window runs on that
    * DOMAIN frame (50 rows at any corpus size — WindowAuditSpec-
    * exempt), never on parts. The oracle keeps the textbook
    * NOT-EXISTS dominance spelling, cross-checking the rewrite.
    */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val best = graft.Tables.part(spark, dir)
      .select($"p_size".cast("long").as("size"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_i"))
      .groupBy($"size")
      .agg(min($"price_i").as("best_price_i"), count(lit(1)).as("n_parts"))
    val win = Window.orderBy($"size".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    best
      .withColumn("min_larger", min($"best_price_i").over(win))
      .filter($"min_larger".isNull || $"best_price_i" < $"min_larger")
      .select($"size", $"best_price_i", $"n_parts")
      .orderBy($"size")
  }

  val skylinePartsSql: String =
    """WITH best AS (
         SELECT CAST(p_size AS BIGINT) AS size,
                CAST(min(CAST(round(p_retailprice * 100) AS BIGINT))
                     AS BIGINT) AS best_price_i,
                CAST(count(*) AS BIGINT) AS n_parts
         FROM part GROUP BY 1)
       SELECT size, best_price_i, n_parts
       FROM best b
       WHERE NOT EXISTS (
         SELECT 1 FROM best o
         WHERE o.size >= b.size AND o.best_price_i <= b.best_price_i
           AND (o.size > b.size OR o.best_price_i < b.best_price_i))
       ORDER BY size"""

  /** Cramér's V + contingency-coefficient summary of the
    * priority × status association (Cramér 1946) — the effect-size
    * companion of [[chiSquareOrders]]: χ² grows with n, V ∈ [0, 1]
    * does not, so V is what a pipeline alerts on. χ² is accumulated
    * in integer MICRO units per cell (round(d²/(n·r·c)·10⁶) with
    * d = n·O − r·c BIGINT-exact — the chi-square device) so the sum
    * is merge-order-exact; V = √(χ²/(n·(min(r,c)−1))) and
    * C = √(χ²/(χ²+n)) divide once at the end. The cell frame is
    * |priorities|×|statuses| — metadata-scale after one corpus
    * aggregation.
    */
  def cramersVOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("observed"))
    val rowTot = obs.groupBy($"o_orderpriority")
      .agg(sum($"observed").as("r_tot"))
    val colTot = obs.groupBy($"o_orderstatus")
      .agg(sum($"observed").as("c_tot"))
    val grand = obs.agg(sum($"observed").as("n_tot"),
      countDistinct($"o_orderpriority").as("r"),
      countDistinct($"o_orderstatus").as("c"))
    // DENSE r×c cell lattice: a zero cell still contributes
    // (0−E)²/E = r·c/n — dropping it understates χ² (and V) whenever
    // an (priority, status) combination never occurs
    rowTot.crossJoin(broadcast(colTot))
      .join(obs, Seq("o_orderpriority", "o_orderstatus"), "left")
      .withColumn("observed", coalesce($"observed", lit(0L)))
      .crossJoin(broadcast(grand))
      .withColumn("d", expr("n_tot * observed - r_tot * c_tot"))
      .withColumn("contrib_micro",
        expr("CAST(round(CAST(d AS DOUBLE) * CAST(d AS DOUBLE) " +
          "/ (CAST(n_tot AS DOUBLE) * CAST(r_tot AS DOUBLE) " +
          "* CAST(c_tot AS DOUBLE)) * 1000000.0) AS BIGINT)"))
      .groupBy($"n_tot", $"r", $"c")
      .agg(sum($"contrib_micro").as("chi2_micro"))
      .select($"n_tot", $"r", $"c",
        (($"r" - 1) * ($"c" - 1)).as("dof"),
        round($"chi2_micro".cast("double") / 1.0e6, 4).as("chi2"),
        round(sqrt($"chi2_micro".cast("double") / 1.0e6
          / ($"n_tot".cast("double") * (least($"r", $"c") - 1)
            .cast("double"))), 6).as("cramers_v"),
        round(sqrt($"chi2_micro".cast("double") / 1.0e6
          / ($"chi2_micro".cast("double") / 1.0e6
            + $"n_tot".cast("double"))), 6).as("contingency_c"))
  }

  val cramersVOrdersSql: String =
    """WITH obs AS (
         SELECT o_orderpriority, o_orderstatus,
                CAST(count(*) AS BIGINT) AS observed
         FROM orders GROUP BY 1, 2),
       rt AS (SELECT o_orderpriority, CAST(sum(observed) AS BIGINT) AS r_tot
              FROM obs GROUP BY 1),
       ct AS (SELECT o_orderstatus, CAST(sum(observed) AS BIGINT) AS c_tot
              FROM obs GROUP BY 1),
       g AS (SELECT CAST(sum(observed) AS BIGINT) AS n_tot,
                    CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS r,
                    CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS c
             FROM obs),
       cell AS (
         SELECT g.n_tot, g.r, g.c,
                g.n_tot * CAST(coalesce(obs.observed, 0) AS BIGINT)
                  - rt.r_tot * ct.c_tot AS d,
                rt.r_tot, ct.c_tot
         FROM rt CROSS JOIN ct
         LEFT JOIN obs
           ON obs.o_orderpriority = rt.o_orderpriority
          AND obs.o_orderstatus = ct.o_orderstatus
         CROSS JOIN g),
       agg AS (
         SELECT n_tot, r, c,
                CAST(sum(CAST(round(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                  / (CAST(n_tot AS DOUBLE) * CAST(r_tot AS DOUBLE)
                  * CAST(c_tot AS DOUBLE)) * 1000000.0) AS BIGINT))
                  AS BIGINT) AS chi2_micro
         FROM cell GROUP BY 1, 2, 3)
       SELECT n_tot, r, c, (r - 1) * (c - 1) AS dof,
              round(CAST(chi2_micro AS DOUBLE) / 1000000.0, 4) AS chi2,
              round(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
                / (CAST(n_tot AS DOUBLE)
                  * CAST(least(r, c) - 1 AS DOUBLE))), 6) AS cramers_v,
              round(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
                / (CAST(chi2_micro AS DOUBLE) / 1000000.0
                  + CAST(n_tot AS DOUBLE))), 6) AS contingency_c
       FROM agg"""

  /** Delete-one-group JACKKNIFE for the ratio estimator (Quenouille
    * 1956 / Tukey 1958; the grouped jackknife is the production
    * variance device for ratio metrics — Σx/Σy has no closed-form
    * variance): θ = mean order value = Σ cents / #orders over all
    * customers, groups = the 25 customer nations. Each leave-one-out
    * replicate is quantized by INTEGER division
    * r_g = (X − x_g) div (Y − y_g) (cents — both engines truncate
    * identically), and the variance numerator
    * (G−1)·(G·Σr² − (Σr)²) stays BIGINT (headroom: r ~ 10⁷ cents,
    * r² ~ 10¹⁴, Σ over G=25 ~ 10¹⁶ — and r is scale-INVARIANT, so
    * the bound holds at any corpus size). Only the final SE divides.
    * Plan: one orders aggregate keyed by nation (via the customer
    * dim broadcast), then everything is G-row metadata.
    */
  def jackknifeOrderValue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey".as("ck"), $"c_nationkey".as("nk"))
    val perNation = Tables.orders(spark, dir)
      .select($"o_custkey".as("ck"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .join(broadcast(cust), Seq("ck"))
      .groupBy($"nk")
      .agg(sum($"cents").as("x_g"), count(lit(1)).as("y_g"))
    val tot = perNation.agg(sum($"x_g").as("xx"), sum($"y_g").as("yy"),
      count(lit(1)).as("g"))
    val reps = perNation.crossJoin(broadcast(tot))
      .select($"g", $"xx", $"yy",
        expr("(xx - x_g) div (yy - y_g)").as("r_g"))
    reps.groupBy($"g", $"xx", $"yy")
      .agg(sum($"r_g").as("sum_r"), sum($"r_g" * $"r_g").as("sum_r2"))
      .select($"g",
        expr("xx div yy").as("theta_cents"),
        $"sum_r",
        (($"g" - 1) * ($"g" * $"sum_r2" - $"sum_r" * $"sum_r"))
          .as("var_num"),
        round(sqrt((($"g" - 1) * ($"g" * $"sum_r2" - $"sum_r" * $"sum_r"))
          .cast("double")) / $"g".cast("double"), 4).as("jk_se_cents"))
  }

  val jackknifeOrderValueSql: String =
    """WITH pn AS (
         SELECT c.c_nationkey AS nk,
                CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS x_g,
                CAST(count(*) AS BIGINT) AS y_g
         FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
         GROUP BY 1),
       t AS (SELECT CAST(sum(x_g) AS BIGINT) AS xx,
                    CAST(sum(y_g) AS BIGINT) AS yy,
                    CAST(count(*) AS BIGINT) AS g
             FROM pn),
       reps AS (
         SELECT t.g, t.xx, t.yy, (t.xx - pn.x_g) // (t.yy - pn.y_g) AS r_g
         FROM pn CROSS JOIN t),
       agg AS (
         SELECT g, xx, yy, CAST(sum(r_g) AS BIGINT) AS sum_r,
                CAST(sum(r_g * r_g) AS BIGINT) AS sum_r2
         FROM reps GROUP BY 1, 2, 3)
       SELECT g, xx // yy AS theta_cents, sum_r,
              (g - 1) * (g * sum_r2 - sum_r * sum_r) AS var_num,
              round(sqrt(CAST((g - 1) * (g * sum_r2 - sum_r * sum_r)
                AS DOUBLE)) / CAST(g AS DOUBLE), 4) AS jk_se_cents
       FROM agg"""

  /** Kendall's τ-b rank correlation between retail price and size
    * per brand (Kendall 1938; τ-b with the Stuart tie correction) —
    * the rank-concordance companion of the per-group Spearman
    * (27bg.2): robust to monotone transforms and, unlike Spearman's
    * rank-average device, purely COUNTING — concordant, discordant,
    * and tie pair censuses are BIGINTs off a within-brand pair join,
    * so everything to the final √ is exact. Pair space is
    * Σ C(n_brand, 2), budget-guarded with a one-pass census (the
    * wedge-budget stance); past budget the documented valve is
    * per-brand hash-sampling the rows first — τ estimates degrade
    * gracefully under uniform pair thinning.
    */
  def kendallTauBrand(spark: SparkSession, dir: String,
      pairBudget: Long = 500000000L): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir)
      .select($"p_brand", $"p_partkey",
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("x"),
        $"p_size".cast("long").as("y"))
    val census = p.groupBy($"p_brand").agg(count(lit(1)).as("n"))
    val totalPairs = census.agg(
      expr("sum(n * (n - 1) div 2)").as("pairs")).head.getLong(0)
    require(totalPairs <= pairBudget,
      s"kendallTauBrand: $totalPairs within-brand pairs exceed " +
        s"pairBudget=$pairBudget — hash-sample rows per brand " +
        "(Sampling.hashSample) before the pair join")
    val a = p.select($"p_brand", $"p_partkey".as("ka"),
      $"x".as("xa"), $"y".as("ya"))
    val b = p.select($"p_brand", $"p_partkey".as("kb"),
      $"x".as("xb"), $"y".as("yb"))
    val pairs = a.join(b, Seq("p_brand")).filter($"ka" < $"kb")
    val counts = pairs.groupBy($"p_brand").agg(
      count(lit(1)).as("n0"),
      sum(when(($"xa" < $"xb" && $"ya" < $"yb")
        || ($"xa" > $"xb" && $"ya" > $"yb"), 1L).otherwise(0L)).as("nc"),
      sum(when(($"xa" < $"xb" && $"ya" > $"yb")
        || ($"xa" > $"xb" && $"ya" < $"yb"), 1L).otherwise(0L)).as("nd"),
      sum(when($"xa" === $"xb" && $"ya" =!= $"yb", 1L)
        .otherwise(0L)).as("tx"),
      sum(when($"ya" === $"yb" && $"xa" =!= $"xb", 1L)
        .otherwise(0L)).as("ty"),
      sum(when($"xa" === $"xb" && $"ya" === $"yb", 1L)
        .otherwise(0L)).as("txy"))
    counts.join(census, Seq("p_brand"))
      .select($"p_brand", $"n", $"n0", $"nc", $"nd", $"tx", $"ty", $"txy",
        when($"n0" - $"tx" - $"txy" > 0 && $"n0" - $"ty" - $"txy" > 0,
          round(($"nc" - $"nd").cast("double")
            / sqrt(($"n0" - $"tx" - $"txy").cast("double")
              * ($"n0" - $"ty" - $"txy").cast("double")), 6))
          .otherwise(lit(0.0)).as("tau_b"))
      .orderBy($"p_brand")
  }

  val kendallTauBrandSql: String =
    """WITH p AS (
         SELECT p_brand, p_partkey,
                CAST(round(p_retailprice * 100) AS BIGINT) AS x,
                CAST(p_size AS BIGINT) AS y
         FROM part),
       census AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n
                  FROM p GROUP BY 1),
       pr AS (
         SELECT a.p_brand,
                a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
         FROM p a JOIN p b
           ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
       c AS (
         SELECT p_brand, CAST(count(*) AS BIGINT) AS n0,
                CAST(sum(CASE WHEN (xa < xb AND ya < yb)
                               OR (xa > xb AND ya > yb)
                          THEN 1 ELSE 0 END) AS BIGINT) AS nc,
                CAST(sum(CASE WHEN (xa < xb AND ya > yb)
                               OR (xa > xb AND ya < yb)
                          THEN 1 ELSE 0 END) AS BIGINT) AS nd,
                CAST(sum(CASE WHEN xa = xb AND ya <> yb
                          THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                CAST(sum(CASE WHEN ya = yb AND xa <> xb
                          THEN 1 ELSE 0 END) AS BIGINT) AS ty,
                CAST(sum(CASE WHEN xa = xb AND ya = yb
                          THEN 1 ELSE 0 END) AS BIGINT) AS txy
         FROM pr GROUP BY 1)
       SELECT c.p_brand, census.n, c.n0, c.nc, c.nd, c.tx, c.ty, c.txy,
              CASE WHEN n0 - tx - txy > 0 AND n0 - ty - txy > 0
                   THEN round(CAST(nc - nd AS DOUBLE)
                     / sqrt(CAST(n0 - tx - txy AS DOUBLE)
                       * CAST(n0 - ty - txy AS DOUBLE)), 6)
                   ELSE 0.0 END AS tau_b
       FROM c JOIN census USING (p_brand)
       ORDER BY c.p_brand"""

  /** Herfindahl–Hirschman concentration index of supplier revenue
    * per nation, plus the pooled 'ALL' row — the antitrust-standard
    * market-concentration statistic (HHI = Σ shareᵢ², DOJ/FTC
    * Horizontal Merger Guidelines), and in a training-data pipeline
    * the one-number answer to "is this source mix dominated by a few
    * providers". Exactness device: each supplier's share is
    * quantized ONCE as integer ppm (cᵢ·10⁶ div T — exact BIGINT
    * floor division), then HHI is the exact Σ share_ppm² — no fp
    * anywhere, so any aggregation order agrees. HHI lands in
    * [0, 10¹²] (monopoly = 10¹²).
    *
    * Scale shape: per-supplier cents is one partial-agg'd groupBy of
    * lineitem (supplier-sized output); group totals are a
    * nation-sized aggregate broadcast back onto supplier rows. The
    * pooled row rides the same supplier frame with a one-row
    * broadcast total. Headroom: cᵢ·10⁶ holds BIGINT while a single
    * supplier's revenue < $9·10¹⁰ — past that, move cents to whole
    * dollars before the ppm quantization.
    */
  def hhiSupplierByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSupp = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey".as("sk"))
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("cents"))
    val supp = Tables.supplier(spark, dir)
      .select($"s_suppkey".as("sk"), $"s_nationkey".as("nk"))
      .join(perSupp, Seq("sk"), "left")
      .withColumn("cents", coalesce($"cents", lit(0L)))
    val nation = broadcast(Tables.nation(spark, dir)
      .select($"n_nationkey".as("nk"), $"n_name".as("nation")))
    def hhiOf(grouped: DataFrame): DataFrame =
      grouped
        .withColumn("share_ppm", expr("(cents * 1000000) div t"))
        .groupBy($"nation")
        .agg(count(lit(1)).as("n_suppliers"), max($"t").as("total_cents"),
          sum($"share_ppm" * $"share_ppm").as("hhi"))
    val byNation = hhiOf(
      supp.join(nation, Seq("nk"))
        .join(broadcast(supp.join(nation, Seq("nk")).groupBy($"nation")
          .agg(sum($"cents").as("t")).filter($"t" > 0L)), Seq("nation")))
    val pooled = hhiOf(
      supp.withColumn("nation", lit("ALL"))
        .crossJoin(broadcast(supp.agg(sum($"cents").as("t"))))
        .filter($"t" > 0L))
    byNation.unionByName(pooled).orderBy($"nation")
  }

  val hhiSupplierByNationSql: String =
    """WITH ps AS (
         SELECT l_suppkey AS sk,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS BIGINT) AS cents
         FROM lineitem GROUP BY 1),
       su AS (
         SELECT s_suppkey AS sk, s_nationkey AS nk,
                CAST(coalesce(ps.cents, 0) AS BIGINT) AS cents
         FROM supplier LEFT JOIN ps ON ps.sk = s_suppkey),
       named AS (
         SELECT n_name AS nation, cents
         FROM su JOIN nation ON n_nationkey = nk
         UNION ALL
         SELECT 'ALL' AS nation, cents FROM su),
       tot AS (
         SELECT nation, CAST(sum(cents) AS BIGINT) AS t
         FROM named GROUP BY 1),
       sh AS (
         SELECT named.nation, (cents * 1000000) // t AS share_ppm
         FROM named JOIN tot ON tot.nation = named.nation
         WHERE t > 0)
       SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
              (SELECT t FROM tot WHERE tot.nation = sh.nation)
                AS total_cents,
              CAST(sum(share_ppm * share_ppm) AS BIGINT) AS hhi
       FROM sh GROUP BY nation ORDER BY nation"""

  /** Mutual information between two categorical columns
    * (l_returnflag × l_linestatus) in integer micro-nats, with the
    * per-cell PMI table — the dependence measure that complements
    * the chi-square audit ([[chiSquareOrders]]) and Cramér's V: MI
    * is the KL divergence of the joint from independence, the
    * information-theoretic "how many nats does knowing X tell you
    * about Y". Exactness device: each cell's ln((n_xy·N)/(n_x·n_y))
    * is quantized ONCE to integer micro-nats; the MI numerator
    * Σ n_xy·pmi_micro is then an exact BIGINT in any order, divided
    * by N once (integer floor division, cross-engine exact).
    *
    * Scale shape: the joint and both margins are partial-agg'd
    * groupBys with domain-sized outputs (|X|·|Y| cells); margins
    * broadcast onto cells, and the pooled MI rides a one-row
    * broadcast back onto the cell table. Headroom: Σ n_xy·pmi_micro
    * ≤ N·ln(N)·10⁶ holds BIGINT to N ≈ 3·10¹¹ rows.
    */
  def mutualInfoLineitem(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("rf"), $"l_linestatus".as("ls"))
    val cells = base.groupBy($"rf", $"ls").agg(count(lit(1)).as("n"))
    val mx = base.groupBy($"rf").agg(count(lit(1)).as("n_x"))
    val my = base.groupBy($"ls").agg(count(lit(1)).as("n_y"))
    val tot = cells.agg(sum($"n").as("big_n"))
    val pmi = cells
      .join(broadcast(mx), Seq("rf"))
      .join(broadcast(my), Seq("ls"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi_micro",
        round(log(($"n".cast("double") * $"big_n".cast("double")) /
          ($"n_x".cast("double") * $"n_y".cast("double"))) * lit(1.0e6))
          .cast("long"))
    val mi = pmi.agg(sum($"n" * $"pmi_micro").as("num"),
      max($"big_n").as("nn"))
      .select(expr("num div nn").as("mi_micro"))
    pmi.crossJoin(broadcast(mi))
      .select($"rf", $"ls", $"n", $"n_x", $"n_y", $"big_n",
        $"pmi_micro", $"mi_micro")
      .orderBy($"rf", $"ls")
  }

  val mutualInfoLineitemSql: String =
    """WITH b AS (SELECT l_returnflag AS rf, l_linestatus AS ls FROM lineitem),
       cells AS (SELECT rf, ls, CAST(count(*) AS BIGINT) AS n
                 FROM b GROUP BY 1, 2),
       mx AS (SELECT rf, CAST(count(*) AS BIGINT) AS n_x FROM b GROUP BY 1),
       my AS (SELECT ls, CAST(count(*) AS BIGINT) AS n_y FROM b GROUP BY 1),
       tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM cells),
       pmi AS (
         SELECT rf, ls, n, n_x, n_y, big_n,
                CAST(round(ln((CAST(n AS DOUBLE) * CAST(big_n AS DOUBLE))
                  / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))) * 1000000.0)
                  AS BIGINT) AS pmi_micro
         FROM cells JOIN mx USING (rf) JOIN my USING (ls), tot),
       mi AS (
         SELECT CAST(sum(n * pmi_micro) AS BIGINT) // big_n AS mi_micro
         FROM pmi GROUP BY big_n)
       SELECT rf, ls, n, n_x, n_y, big_n, pmi_micro,
              CAST(mi.mi_micro AS BIGINT) AS mi_micro
       FROM pmi, mi ORDER BY rf, ls"""

  /** Hill tail-index estimator on customer lifetime revenue (Hill
    * 1975): α̂ = 1/H with H = (1/k)·Σ_{i≤k} ln x₍ᵢ₎ − ln x₍ₖ₊₁₎ over
    * the k largest observations — the standard answer to "HOW heavy
    * is the tail" that Gini/Theil (which average over everyone)
    * blur: α ≤ 2 means infinite variance, α ≤ 1 means even the mean
    * diverges, exactly the regime where sampling and sketching
    * assumptions break at 100 TB. k = ⌊n_pos/10⌋. Exactness device:
    * per distinct value one micro-nat ln quantization; the top-k
    * mass folds from the DESCENDING value histogram with the
    * boundary bucket split exactly (contrib = clamp(k − cum_excl)),
    * so Σ contrib·lnq is an exact BIGINT and H is one floor
    * division; α̂ = 10¹² div H_micro. Zero-revenue customers are
    * excluded (ln 0); an all-equal tail reads H = 0 → α pinned 0.
    * k is pinned ≥ 1 (n_pos < 10 would read k = 0 and divide by
    * zero); when no (k+1)-th observation exists at all (n_pos ≤ k,
    * i.e. a single positive customer) the estimator is undefined
    * and BOTH engines emit zero rows — the xk1 frame is empty and
    * the final join is against it.
    */
  def hillTailRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perCust = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .filter($"cents" > 0L)
    val hist = perCust.groupBy($"cents").agg(count(lit(1)).as("cnt"))
      .withColumn("lnq", round(log($"cents".cast("double")) * lit(1.0e6))
        .cast("long"))
    val total = hist.agg(sum($"cnt").as("n_pos"))
      .withColumn("k", greatest(lit(1L), expr("n_pos div 10")))
    val before = Window.orderBy($"cents".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.crossJoin(broadcast(total))
      .withColumn("cum_excl", coalesce(sum($"cnt").over(before), lit(0L)))
      .withColumn("contrib",
        greatest(lit(0L), least($"cnt", $"k" - $"cum_excl")))
    // constant-key groupBy so an empty filter (no (k+1)-th
    // observation) yields ZERO rows, not one all-NULL aggregate row;
    // the SQL twin is xk1's HAVING count(*) > 0
    val xk1 = cum.filter($"cum_excl" + $"cnt" >= $"k" + 1L)
      .groupBy(lit(1).as("one"))
      .agg(max(struct($"cents", $"lnq")).as("m"))
      .select($"m.lnq".as("ln_xk1"))
    cum.agg(max($"n_pos").as("n_pos"), max($"k").as("k"),
      sum($"contrib" * $"lnq").as("top_ln_sum"))
      .crossJoin(broadcast(xk1))
      .select($"n_pos", $"k", $"top_ln_sum", $"ln_xk1",
        (expr("top_ln_sum div k") - $"ln_xk1").as("h_micro"))
      .withColumn("alpha_micro",
        when($"h_micro" > 0L, expr("1000000000000 div h_micro"))
          .otherwise(0L))
  }

  val hillTailRevenueSql: String =
    """WITH pc AS (
         SELECT o_custkey,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents
         FROM orders GROUP BY 1),
       pos AS (SELECT cents FROM pc WHERE cents > 0),
       hist AS (
         SELECT cents, CAST(count(*) AS BIGINT) AS cnt,
                CAST(round(ln(CAST(cents AS DOUBLE)) * 1000000.0) AS BIGINT)
                  AS lnq
         FROM pos GROUP BY 1),
       t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_pos,
                    greatest(1, CAST(sum(cnt) AS BIGINT) // 10) AS k
             FROM hist),
       c AS (
         SELECT cents, cnt, lnq, n_pos, k,
                CAST(coalesce(sum(cnt) OVER (ORDER BY cents DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_excl
         FROM hist, t),
       contrib AS (
         SELECT n_pos, k, lnq, cents, cnt, cum_excl,
                greatest(0, least(cnt, k - cum_excl)) AS contrib
         FROM c),
       xk1 AS (
         SELECT CAST(max_by(lnq, cents) AS BIGINT) AS ln_xk1
         FROM contrib WHERE cum_excl + cnt >= k + 1
         HAVING count(*) > 0),
       agg AS (
         SELECT CAST(max(n_pos) AS BIGINT) AS n_pos,
                CAST(max(k) AS BIGINT) AS k,
                CAST(sum(contrib * lnq) AS BIGINT) AS top_ln_sum
         FROM contrib)
       SELECT n_pos, k, top_ln_sum, ln_xk1,
              CAST(top_ln_sum // k - ln_xk1 AS BIGINT) AS h_micro,
              CASE WHEN top_ln_sum // k - ln_xk1 > 0
                   THEN CAST(1000000000000 // (top_ln_sum // k - ln_xk1)
                     AS BIGINT)
                   ELSE 0 END AS alpha_micro
       FROM agg, xk1"""

  /** Lorenz-curve decile points of customer lifetime revenue per
    * nation — the curve behind [[giniRevenueByNation]]'s scalar
    * (Lorenz 1905): L(i) = the revenue share held by the poorest
    * fraction of customers up to population decile i. Points are
    * drawn from the per-nation VALUE HISTOGRAM by the crossing
    * device (first cents value whose cumulative population reaches
    * ⌊i·n/10⌋ — ties never split a value bucket, the reported depth
    * is the bucket's true cumulative count), so the corpus never
    * sorts: one partial-agg'd groupBy to per-customer cents, one to
    * the (nation, cents) histogram, then nation-PARTITIONED
    * cumulative windows over domain-sized frames. Shares are exact
    * integer ppm floor divisions.
    */
  def lorenzRevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perCust = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("ck"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spent"))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey".as("ck"), $"c_nationkey".as("nk"))
      .join(perCust, Seq("ck"), "left")
      .withColumn("cents", coalesce($"spent", lit(0L)))
    val hist = cust.groupBy($"nk", $"cents").agg(count(lit(1)).as("cnt"))
    val upTo = Window.partitionBy($"nk").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = hist.groupBy($"nk")
      .agg(sum($"cnt").as("n"), sum($"cents" * $"cnt").as("t"))
    val cum = hist
      .withColumn("cum_n", sum($"cnt").over(upTo))
      .withColumn("cum_cents", sum($"cents" * $"cnt").over(upTo))
    val ladder = broadcast((1L to 10L).toDF("decile"))
    cum.join(totals, Seq("nk"))
      .crossJoin(ladder)
      .withColumn("target_n", expr("(decile * n) div 10"))
      .filter($"cum_n" >= $"target_n" && $"t" > 0L)
      .groupBy($"nk", $"decile")
      .agg(min(struct($"cum_n", $"cum_cents")).as("m"),
        max($"target_n").as("target_n"), max($"t").as("t"))
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey".as("nk"), $"n_name".as("nation"))), Seq("nk"))
      .select($"nation", $"decile", $"target_n", $"m.cum_n".as("depth_n"),
        $"m.cum_cents".as("cum_cents"),
        expr("(m.cum_cents * 1000000) div t").as("share_ppm"))
      .orderBy($"nation", $"decile")
  }

  val lorenzRevenueByNationSql: String =
    """WITH pc AS (
         SELECT o_custkey AS ck,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS spent
         FROM orders GROUP BY 1),
       cu AS (
         SELECT c_nationkey AS nk,
                CAST(coalesce(pc.spent, 0) AS BIGINT) AS cents
         FROM customer LEFT JOIN pc ON pc.ck = c_custkey),
       hist AS (
         SELECT nk, cents, CAST(count(*) AS BIGINT) AS cnt
         FROM cu GROUP BY 1, 2),
       tot AS (
         SELECT nk, CAST(sum(cnt) AS BIGINT) AS n,
                CAST(sum(cents * cnt) AS BIGINT) AS t
         FROM hist GROUP BY 1),
       c AS (
         SELECT nk, cents,
                CAST(sum(cnt) OVER (PARTITION BY nk ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_n,
                CAST(sum(cents * cnt) OVER (PARTITION BY nk ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_cents
         FROM hist),
       ladder AS (SELECT CAST(d AS BIGINT) AS decile
                  FROM (VALUES (1), (2), (3), (4), (5),
                               (6), (7), (8), (9), (10)) v(d)),
       hit AS (
         SELECT c.nk, decile, (decile * n) // 10 AS target_n,
                cum_n, cum_cents, t
         FROM c JOIN tot ON tot.nk = c.nk, ladder
         WHERE cum_n >= (decile * n) // 10 AND t > 0),
       best AS (
         SELECT nk, decile, CAST(max(target_n) AS BIGINT) AS target_n,
                CAST(min(cum_n) AS BIGINT) AS depth_n,
                CAST(min_by(cum_cents, cum_n) AS BIGINT) AS cum_cents,
                CAST(max(t) AS BIGINT) AS t
         FROM hit GROUP BY 1, 2)
       SELECT n_name AS nation, decile, target_n, depth_n, cum_cents,
              CAST((cum_cents * 1000000) // t AS BIGINT) AS share_ppm
       FROM best JOIN nation ON n_nationkey = nk
       ORDER BY nation, decile"""

  /** Cochran–Armitage trend test (Cochran 1954, Armitage 1955): is
    * the high-value-order rate MONOTONE in the ordinal order
    * priority (1-URGENT … 5-LOW)? Chi-square on the 2×k table asks
    * "any difference"; CA spends its single degree of freedom on the
    * ordered alternative, the right test when categories carry a
    * direction. With dose score k = the priority's leading digit:
    * Z² = N·(N·Σk·r_k − R·Σk·n_k)² /
    * (R·(N−R)·(N·Σk²·n_k − (Σk·n_k)²)) — every accumulator an exact
    * BIGINT off ONE partial-agg'd pass over orders (k-domain-sized
    * intermediate), Z² the one pinned division. Emitting the five
    * integer moments keeps the gate cross-engine exact; headroom:
    * N·Σk·r_k holds BIGINT to N ≈ 4·10⁷ orders at k ≤ 5 — past
    * that, fold the moments in DOUBLE at the display edge only.
    */
  def cochranArmitageOrders(spark: SparkSession, dir: String,
      highCents: Long = 10000000L): DataFrame = {
    import spark.implicits._
    val perDose = Tables.orders(spark, dir)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("k"),
        (expr("CAST(round(o_totalprice * 100) AS BIGINT)") >= highCents)
          .cast("long").as("resp"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n_k"), sum($"resp").as("r_k"))
    val m = perDose.agg(sum($"n_k").as("n"), sum($"r_k").as("r"),
      sum($"k" * $"n_k").as("skn"), sum($"k" * $"k" * $"n_k").as("sk2n"),
      sum($"k" * $"r_k").as("skr"))
    m.select($"n", $"r", $"skn", $"sk2n", $"skr",
      ($"n" * $"skr" - $"r" * $"skn").as("num"),
      ($"r" * ($"n" - $"r") * ($"n" * $"sk2n" - $"skn" * $"skn")).as("den"))
      .withColumn("chi2_trend",
        when($"den" > 0L,
          round($"n".cast("double") * $"num".cast("double") *
            $"num".cast("double") / $"den".cast("double"), 4))
          .otherwise(lit(0.0)))
  }

  def cochranArmitageOrdersSql(highCents: Long = 10000000L): String =
    s"""WITH b AS (
         SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS k,
                CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                     >= $highCents THEN 1 ELSE 0 END AS resp
         FROM orders),
       perdose AS (
         SELECT k, CAST(count(*) AS BIGINT) AS n_k,
                CAST(sum(resp) AS BIGINT) AS r_k
         FROM b GROUP BY 1),
       m AS (
         SELECT CAST(sum(n_k) AS BIGINT) AS n, CAST(sum(r_k) AS BIGINT) AS r,
                CAST(sum(k * n_k) AS BIGINT) AS skn,
                CAST(sum(k * k * n_k) AS BIGINT) AS sk2n,
                CAST(sum(k * r_k) AS BIGINT) AS skr
         FROM perdose)
       SELECT n, r, skn, sk2n, skr,
              CAST(n * skr - r * skn AS BIGINT) AS num,
              CAST(r * (n - r) * (n * sk2n - skn * skn) AS BIGINT) AS den,
              CASE WHEN r * (n - r) * (n * sk2n - skn * skn) > 0
                   THEN round(CAST(n AS DOUBLE)
                     * CAST(n * skr - r * skn AS DOUBLE)
                     * CAST(n * skr - r * skn AS DOUBLE)
                     / CAST(r * (n - r) * (n * sk2n - skn * skn) AS DOUBLE), 4)
                   ELSE 0.0 END AS chi2_trend
       FROM m"""
}
