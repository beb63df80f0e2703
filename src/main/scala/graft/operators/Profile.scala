package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality sweep a curation pipeline runs
  * before training ingest: per column, null count, distinct count,
  * min/max (as strings for a uniform shape). One aggregation computes
  * every column's stats in a single pass over the scan; the per-column
  * rows are unpivoted driver-side from that one result row (O(cols),
  * not O(rows)).
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = df.columns.flatMap { c =>
      // coalesce: sum over zero rows is null, and a profiler must
      // survive an empty input rather than NPE in getLong
      Seq(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.toSeq.tail: _*).collect()(0)
    val out = df.columns.zipWithIndex.map { case (c, i) =>
      (c, row.getLong(4 * i), row.getLong(4 * i + 1),
        Option(row.getString(4 * i + 2)).getOrElse(""),
        Option(row.getString(4 * i + 3)).getOrElse(""))
    }
    out.toSeq.toDF("column", "n_nulls", "n_distinct", "min_val", "max_val")
  }

  def profileDocuments(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.documents(spark, dir))

  val profileDocumentsSql: String = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    cols.map { c =>
      s"""SELECT '$c' AS "column",
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
            coalesce(CAST(min($c) AS VARCHAR), '') AS min_val,
            coalesce(CAST(max($c) AS VARCHAR), '') AS max_val
          FROM documents"""
    }.mkString("\nUNION ALL\n")
  }

  /** The lineitem numeric columns the correlation profile reads, as
    * integer units (cents / basis points) so every moment sum is
    * exact.
    */
  private val corrVars: Seq[(String, String)] = Seq(
    "qty" -> "CAST(l_quantity AS BIGINT)",
    "price" -> "CAST(round(l_extendedprice * 100) AS BIGINT)",
    "disc" -> "CAST(round(l_discount * 10000) AS BIGINT)",
    "tax" -> "CAST(round(l_tax * 10000) AS BIGINT)")

  private val corrPairs: Seq[(String, String)] =
    for { i <- corrVars.indices; j <- (i + 1) until corrVars.length }
      yield (corrVars(i)._1, corrVars(j)._1)

  /** Pairwise Pearson correlation matrix — the multivariate step
    * after the per-column profile (feature redundancy, leakage
    * screening). ONE map-side-partial aggregate computes all 14
    * moments (4 sums, 4 sum-squares, 6 cross-products) as exact
    * DECIMAL(38,0) over integer units — the [[Olap.regressionByFlag]]
    * device widened to a matrix — and the 6 correlations are each ONE
    * shared double expression over those exact sums, shaped
    * identically in both engines: (n·Sxy − Sx·Sy) / √(n·Sxx − Sx²)
    * / √(n·Syy − Sy²), sqrt being correctly-rounded IEEE in both.
    * Scale: the corpus is scanned once; everything after the
    * aggregate is a 1-row × 14-col frame.
    */
  def correlationsLineitem(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, dir).select(
      corrVars.map { case (n, e) => expr(e).as(n) }: _*)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        corrVars.map { case (v, _) =>
          sum(col(v).cast("decimal(38,0)")).as(s"s_$v") } ++
        corrVars.map { case (v, _) =>
          sum((col(v) * col(v)).cast("decimal(38,0)")).as(s"s_${v}_$v") } ++
        corrPairs.map { case (a, b) =>
          sum((col(a) * col(b)).cast("decimal(38,0)")).as(s"s_${a}_$b") }
    val sums = base.agg(aggs.head, aggs.tail: _*)
    val withR = corrPairs.foldLeft(sums) { case (df, (a, b)) =>
      df.withColumn(s"r_${a}_$b", round(
        expr(s"""((CAST(n AS DOUBLE) * CAST(s_${a}_$b AS DOUBLE)
                   - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
                  / sqrt(CAST(n AS DOUBLE) * CAST(s_${a}_$a AS DOUBLE)
                         - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)))
                 / sqrt(CAST(n AS DOUBLE) * CAST(s_${b}_$b AS DOUBLE)
                        - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))"""),
        6))
    }
    val stackArgs = corrPairs
      .map { case (a, b) => s"'$a', '$b', r_${a}_$b" }.mkString(", ")
    withR.select(expr(
      s"stack(${corrPairs.length}, $stackArgs) AS (var_x, var_y, r)"))
      .orderBy($"var_x", $"var_y")
  }

  /** #27k gate: the approximate sketches (HyperLogLog distincts,
    * t-digest-style quantiles) next to their EXACT counterparts, with
    * the error bound as an output column — the driver's rows-only
    * check keeps it on the board, the `within_bound` column carries
    * the contract, and OlapSpec asserts every row holds it. An
    * approximation can't hash-match an oracle, so this is the
    * strongest gate shape available for the family: same pass
    * computes both sides, |err| is audited where it's produced.
    *
    * Bound: 5% relative (50 000 ppm) — HLL's default rsd is 5%, and
    * approx_percentile at accuracy 10⁴ is exact until a group exceeds
    * 10⁴ rows, then degrades gracefully under the same bound. Scale:
    * ONE aggregate scan; the exact count_distincts are the expensive
    * side — which is the point, the gate MEASURES what the sketch
    * buys; production paths use the sketch column alone.
    */
  def profileApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val row = Tables.documents(spark, dir).agg(
      approx_count_distinct($"doc_id").as("a_id"),
      count_distinct($"doc_id").as("e_id"),
      approx_count_distinct($"source").as("a_src"),
      count_distinct($"source").as("e_src"),
      approx_count_distinct($"n_chars").as("a_nc"),
      count_distinct($"n_chars").as("e_nc"),
      expr("approx_percentile(CAST(n_chars AS DOUBLE), array(0.5, 0.99), 10000)")
        .as("a_pct"),
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE)")
        .as("e_p50"),
      expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE)")
        .as("e_p99")
    ).head()
    val pct = row.getSeq[Double](6)
    val metrics = Seq(
      ("hll_distinct_doc_id", row.getLong(0).toDouble, row.getLong(1).toDouble),
      ("hll_distinct_source", row.getLong(2).toDouble, row.getLong(3).toDouble),
      ("hll_distinct_n_chars", row.getLong(4).toDouble, row.getLong(5).toDouble),
      ("approx_p50_n_chars", pct.head, row.getDouble(7)),
      ("approx_p99_n_chars", pct(1), row.getDouble(8)))
    metrics.map { case (m, a, e) =>
      val errPpm = if (e == 0.0) 0L
        else math.round(math.abs(a - e) / e * 1000000.0)
      (m, a, e, errPpm, errPpm <= 50000L)
    }.toDF("metric", "approx_value", "exact_value", "err_ppm", "within_bound")
  }

  /** Mergeable-sketch rollup — the pattern that makes sketches matter
    * at 100 TB: distinct counts DON'T compose across partitions
    * (Σ per-day distincts ≠ global distinct), but DataSketches HLL
    * sketches DO — aggregate once per group, then UNION-MERGE the
    * group sketches for any rollup without re-scanning the corpus.
    * One pass builds per-lang sketches (lgK = 14) next to per-lang
    * exact distincts; the `global(merged)` row is
    * `hll_sketch_estimate(hll_union_agg(per-lang sketches))` — the
    * merge path itself under test — against the global exact (= Σ
    * per-lang, since doc_id partitions by lang). Rows-only gate like
    * [[profileApprox]]; every row carries its 5% `within_bound`.
    */
  def hllMergeRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(expr("hll_sketch_agg(doc_id, 14)").as("sk"),
        count_distinct($"doc_id").as("exact"))
      .persist()
    val perOut = per.select($"lang".as("scope"),
      expr("CAST(hll_sketch_estimate(sk) AS DOUBLE)").as("approx_value"),
      $"exact".cast("double").as("exact_value"))
    val globalOut = per.agg(
        expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS DOUBLE)")
          .as("approx_value"),
        sum($"exact").cast("double").as("exact_value"))
      .select(lit("global(merged)").as("scope"), $"approx_value",
        $"exact_value")
    val out = perOut.unionByName(globalOut)
      .withColumn("err_ppm", expr(
        "CAST(round(abs(approx_value - exact_value) / exact_value * 1000000) AS BIGINT)"))
      .withColumn("within_bound", $"err_ppm" <= 50000L)
      .orderBy($"scope")
      .localCheckpoint(true)
    per.unpersist(blocking = false)
    out
  }

  /** Join-key skew diagnostic — the pre-flight a 100 TB join runs to
    * pick its strategy (broadcast / salt / AQE skew-split): the
    * distribution of per-key row counts for a shuffle key, plus the
    * heaviest key. ONE aggregation collapses the corpus to the
    * key-count frame; every statistic after runs on that frame
    * (quantiles via PERCENTILE_DISC over |keys| rows, the argmax with
    * an explicit count-desc/key-asc tie-break) — nothing corpus-sized
    * is sorted or windowed. All integer-exact, so the gate is
    * hash-exact. Key under audit: lineitem.l_suppkey, the key the
    * salted-join gate (27b) shuffles on — the two gates together are
    * diagnose → treat.
    */
  def joinSkew(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey").agg(count(lit(1)).as("c"))
    val row = counts.agg(
      count(lit(1)).as("n_keys"),
      min($"c").as("min_rows"),
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)")
        .as("p50_rows"),
      expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY c) AS BIGINT)")
        .as("p90_rows"),
      expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c) AS BIGINT)")
        .as("p99_rows"),
      max($"c").as("max_rows"))
    // argmax with explicit tie-break, computed on the key-count frame
    val top = counts.orderBy($"c".desc, $"l_suppkey").limit(1)
      .select($"l_suppkey".as("top_key"), $"c".as("top_key_rows"))
    row.crossJoin(top)
  }

  val joinSkewSql: String =
    """WITH counts AS (
         SELECT l_suppkey, CAST(count(*) AS BIGINT) AS c
         FROM lineitem GROUP BY l_suppkey),
       stats AS (
         SELECT CAST(count(*) AS BIGINT) AS n_keys,
                min(c) AS min_rows,
                CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)
                  AS p50_rows,
                CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY c) AS BIGINT)
                  AS p90_rows,
                CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c) AS BIGINT)
                  AS p99_rows,
                max(c) AS max_rows
         FROM counts),
       top AS (
         SELECT l_suppkey AS top_key, c AS top_key_rows
         FROM counts ORDER BY c DESC, l_suppkey LIMIT 1)
       SELECT n_keys, min_rows, p50_rows, p90_rows, p99_rows, max_rows,
              top_key, top_key_rows
       FROM stats, top"""

  val correlationsLineitemSql: String = {
    val selVars = corrVars
      .map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val moments =
      corrVars.map { case (v, _) => s"sum($v) AS s_$v" } ++
        corrVars.map { case (v, _) => s"sum($v * $v) AS s_${v}_$v" } ++
        corrPairs.map { case (a, b) => s"sum($a * $b) AS s_${a}_$b" }
    val rows = corrPairs.map { case (a, b) =>
      s"""SELECT '$a' AS var_x, '$b' AS var_y,
            round(((CAST(n AS DOUBLE) * CAST(s_${a}_$b AS DOUBLE)
                    - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
                   / sqrt(CAST(n AS DOUBLE) * CAST(s_${a}_$a AS DOUBLE)
                          - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)))
                  / sqrt(CAST(n AS DOUBLE) * CAST(s_${b}_$b AS DOUBLE)
                         - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)), 6)
              AS r
          FROM sums"""
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (SELECT $selVars FROM lineitem),
        sums AS (
          SELECT count(*) AS n, ${moments.mkString(", ")}
          FROM d)
        $rows
        ORDER BY var_x, var_y"""
  }
}
