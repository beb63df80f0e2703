package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood-method recommenders over the order–part interaction
  * matrix (the reference corpus's implicit-feedback shape: an order
  * "liked" every part in its basket). Reference behavior surface:
  * coded4alex/data_engineer_task queries.py:54-121 stops at co-
  * occurrence counts; this module carries the classic next step —
  * item-item cosine kNN (Sarwar et al., "Item-based collaborative
  * filtering recommendation algorithms", WWW 2001).
  */
object Recommend {

  /** Item-item collaborative-filtering top-k: for the `nItems` most
    * popular parts, the `k` nearest parts by cosine over the binary
    * order×part matrix — sim(i,j) = co(i,j)/√(nᵢ·nⱼ), where co
    * counts orders containing both and nᵢ counts orders containing i
    * (distinct order–part pairs throughout, so a part repeated in
    * one order neither inflates its popularity nor its co-counts).
    *
    * Exactness device: similarity lives in integer PPM via the
    * half-up floor — floor(10⁶·co/√(nᵢnⱼ) + 0.5) — computed as ONE
    * pinned fp expression of exact BIGINTs (√ correctly rounded, the
    * integer product nᵢnⱼ converts exactly below 2⁵³), so ranking
    * and output are bit-identical across engines.
    *
    * Scale shape: co-pairs come from the per-order sorted-basket
    * enumeration (Σ C(b,2), linear in orders for bounded baskets —
    * the [[Analytics.basketPairs]] device, never an order×order or
    * interaction self-join); the popularity frame is item-sized and
    * joins BY KEY; the query-item cut is applied before the count
    * joins so the ranking window only ever sees the `nItems`
    * neighborhoods, partitioned by query item.
    */
  def itemItemCf(spark: SparkSession, dir: String,
      nItems: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    itemItemCfOf(Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")), nItems, k)
  }

  /** Core over any (o, p) interaction frame — see [[itemItemCf]]. */
  def itemItemCfOf(interactions: DataFrame,
      nItems: Int, k: Int): DataFrame = {
    val spark = interactions.sparkSession
    import spark.implicits._
    val op = interactions.distinct()
    val cnt = op.groupBy($"p").agg(count(lit(1)).as("n"))
    val co = op.groupBy($"o")
      .agg(sort_array(collect_set($"p")).as("parts"))
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)),
                       y -> struct(x AS p1, y AS p2))))""")).as("pr"))
      .groupBy($"pr.p1".as("p1"), $"pr.p2".as("p2"))
      .agg(count(lit(1)).as("co"))
    val both = co.select($"p1".as("item"), $"p2".as("neighbor"), $"co")
      .unionByName(
        co.select($"p2".as("item"), $"p1".as("neighbor"), $"co"))
    val q = cnt.orderBy($"n".desc, $"p").limit(nItems)
      .select($"p".as("item"))
    val cand = both
      .join(broadcast(q), Seq("item"))
      .join(cnt.select($"p".as("item"), $"n".as("n1")), Seq("item"))
      .join(cnt.select($"p".as("neighbor"), $"n".as("n2")),
        Seq("neighbor"))
      .withColumn("cos_ppm", expr(
        "CAST(floor(1000000.0D * CAST(co AS DOUBLE) " +
          "/ sqrt(CAST(n1 * n2 AS DOUBLE)) + 0.5D) AS BIGINT)"))
    val rk = Window.partitionBy($"item")
      .orderBy($"cos_ppm".desc, $"neighbor")
    cand.withColumn("rk", row_number().over(rk))
      .filter($"rk" <= k)
      .select($"item", $"neighbor", $"co", $"cos_ppm")
      .orderBy($"item", $"cos_ppm".desc, $"neighbor")
  }

  def itemItemCfSql(nItems: Int = 10, k: Int = 5): String =
    s"""WITH op AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY 1),
        co AS (
          SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS co
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
        bi AS (SELECT p1 AS item, p2 AS neighbor, co FROM co
               UNION ALL SELECT p2, p1, co FROM co),
        q AS (SELECT p AS item FROM cnt ORDER BY n DESC, p LIMIT $nItems),
        cand AS (
          SELECT bi.item, bi.neighbor, bi.co,
                 CAST(floor(1000000.0 * CAST(bi.co AS DOUBLE)
                   / sqrt(CAST(c1.n * c2.n AS DOUBLE)) + 0.5) AS BIGINT)
                   AS cos_ppm
          FROM bi JOIN q USING (item)
                  JOIN cnt c1 ON c1.p = bi.item
                  JOIN cnt c2 ON c2.p = bi.neighbor),
        r AS (SELECT *, row_number() OVER (PARTITION BY item
                ORDER BY cos_ppm DESC, neighbor) AS rk FROM cand)
        SELECT item, neighbor, co, cos_ppm FROM r
        WHERE rk <= $k ORDER BY item, cos_ppm DESC, neighbor"""

  /** Recommendation COVERAGE + exposure-concentration readout over
    * the item-CF top-k table (Herlocker et al. 2004's catalog
    * coverage; Gini exposure per Castells/Vargas diversity work) —
    * the serving-side audit: how much of the catalog do the rec
    * lists reach, and how concentrated is item exposure? Coverage is
    * integer ppm; the exposure Gini uses the PAIRWISE form
    * G = Σᵢⱼ|xᵢ−xⱼ| / (2·n·Σx) over the recommended-item exposure
    * counts — the rec table is (nItems·k)-bounded by construction
    * (metadata-scale), so the pair join is a few thousand integer
    * rows and needs no ranking window at all.
    */
  def coverage(spark: SparkSession, dir: String,
      nItems: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    val recs = itemItemCf(spark, dir, nItems, k)
      .select($"neighbor").localCheckpoint(true)
    val catalog = Tables.lineitem(spark, dir)
      .select($"l_partkey").distinct()
      .agg(count(lit(1)).as("catalog"))
    val expo = recs.groupBy($"neighbor").agg(count(lit(1)).as("x"))
    val tot = expo.agg(count(lit(1)).as("n_recommended"),
      sum($"x").as("sum_x"))
    val absDiff = expo.select($"x".as("xa"))
      .crossJoin(expo.select($"x".as("xb")))
      .agg(sum(abs($"xa" - $"xb")).as("dsum"))
    catalog.crossJoin(tot).crossJoin(absDiff)
      .select($"catalog", $"n_recommended",
        expr("(n_recommended * 1000000L) div catalog").as("coverage_ppm"),
        round($"dsum".cast("double")
          / (lit(2.0) * $"n_recommended".cast("double")
            * $"sum_x".cast("double")), 6).as("exposure_gini"))
  }

  def coverageSql(nItems: Int = 10, k: Int = 5): String =
    s"""WITH recs AS (
          SELECT neighbor FROM (${itemItemCfSql(nItems, k)})),
        cat AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS catalog
                FROM lineitem),
        expo AS (SELECT neighbor, CAST(count(*) AS BIGINT) AS x
                 FROM recs GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_recommended,
                       CAST(sum(x) AS BIGINT) AS sum_x
                FROM expo),
        ad AS (SELECT CAST(sum(abs(a.x - b.x)) AS BIGINT) AS dsum
               FROM expo a CROSS JOIN expo b)
        SELECT catalog, n_recommended,
               (n_recommended * 1000000) // catalog AS coverage_ppm,
               round(CAST(dsum AS DOUBLE)
                 / (2.0 * CAST(n_recommended AS DOUBLE)
                   * CAST(sum_x AS DOUBLE)), 6) AS exposure_gini
        FROM cat CROSS JOIN tot CROSS JOIN ad"""
}
