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

  /** Population-stability (PSI-style) drift bins between a BASELINE
    * and a CURRENT population of one numeric column — the standard
    * production drift monitor: decile edges are frozen from the
    * baseline, both populations are counted against those fixed
    * edges, and per-bin mass shifts are reported. The gate emits the
    * EXACT INTEGER bin table (masses + ppm shares + deviation) and
    * leaves the logarithmic PSI statistic to the caller/spec — ln is
    * not correctly-rounded in IEEE so a folded Σ(p−q)·ln(p/q) could
    * differ in the last ulp across engines (the same stance as
    * [[Olap.kruskalWallisLengths]] emitting rank sums, not H).
    *
    * Scale devices: decile edges come from the VALUE HISTOGRAM's
    * cumulative frame — the crossing set i ∈ (⌊prev·B/N⌋, ⌊cum·B/N⌋]
    * per histogram row via integer sequence(), so the corpus never
    * sorts and the window is domain-sized; binning joins distinct
    * values against the B-row broadcast edge frame; the dense
    * 1..B spine left-join makes empty current bins report 0 rather
    * than vanish.
    */
  def psiBinsOf(base: DataFrame, curr: DataFrame, nBins: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val histB = base.groupBy($"v").agg(count(lit(1)).as("cb"))
    val histC = curr.groupBy($"v").agg(count(lit(1)).as("cc"))
    val cumW = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val nb = histB.agg(sum($"cb").as("nb"))
    val edges = histB
      .withColumn("cum", sum($"cb").over(cumW))
      .crossJoin(broadcast(nb))
      .select($"v".as("e"),
        expr(s"((cum - cb) * $nBins) div nb + 1").as("ilo"),
        expr(s"(cum * $nBins) div nb").as("ihi"))
      // sequence(lo, hi) DESCENDS when lo > hi (unlike SQL
      // generate_series' empty result) — drop non-crossing rows first
      .filter($"ihi" >= $"ilo")
      .select($"e", explode(sequence($"ilo", $"ihi")).as("i"))
      .filter($"i" >= 1 && $"i" <= nBins)
    val vals = histB.select($"v")
      .unionByName(histC.select($"v")).distinct()
    val binOf = vals.join(broadcast(edges), $"v" <= $"e", "left")
      .groupBy($"v").agg(coalesce(min($"i"), lit(nBins.toLong)).as("bin"))
    val spine = spark.range(1, nBins + 1).select($"id".as("bin"))
    val bMass = histB.join(binOf, "v").groupBy($"bin")
      .agg(sum($"cb").as("n_base"))
    val cMass = histC.join(binOf, "v").groupBy($"bin")
      .agg(sum($"cc").as("n_curr"))
    val nc = histC.agg(sum($"cc").as("nc"))
    spine.join(bMass, Seq("bin"), "left").join(cMass, Seq("bin"), "left")
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nc))
      .select($"bin", coalesce($"n_base", lit(0L)).as("n_base"),
        coalesce($"n_curr", lit(0L)).as("n_curr"),
        expr("(coalesce(n_base, 0) * 1000000L) div nb").as("p_ppm"),
        expr("(coalesce(n_curr, 0) * 1000000L) div nc").as("q_ppm"))
      .withColumn("dev_ppm", $"p_ppm" - $"q_ppm")
      .orderBy($"bin")
  }

  /** Gate: doc-length drift between even- and odd-numbered sources
    * (the stand-in for "last month's corpus vs this month's").
    */
  def psiDocLengths(spark: SparkSession, dir: String,
      nBins: Int = 10): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"n_chars".cast("long").as("v"),
        expr("CAST(substring(source, 4) AS INT) % 2 = 0").as("is_base"))
    psiBinsOf(docs.filter($"is_base").select($"v"),
      docs.filter(!$"is_base").select($"v"), nBins)
  }

  def psiDocLengthsSql(nBins: Int = 10): String =
    s"""WITH d AS (
         SELECT CAST(n_chars AS BIGINT) AS v,
                CAST(substring(source, 4) AS INTEGER) % 2 = 0 AS is_base
         FROM documents),
       hb AS (SELECT v, CAST(count(*) AS BIGINT) AS cb
              FROM d WHERE is_base GROUP BY 1),
       hc AS (SELECT v, CAST(count(*) AS BIGINT) AS cc
              FROM d WHERE NOT is_base GROUP BY 1),
       nb AS (SELECT CAST(sum(cb) AS BIGINT) AS nb FROM hb),
       nc AS (SELECT CAST(sum(cc) AS BIGINT) AS nc FROM hc),
       cum AS (
         SELECT v, cb,
                CAST(sum(cb) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
         FROM hb),
       edges AS (
         SELECT v AS e,
                unnest(generate_series(((cum - cb) * $nBins) // nb + 1,
                                       (cum * $nBins) // nb)) AS i
         FROM cum, nb),
       ed AS (SELECT e, i FROM edges WHERE i BETWEEN 1 AND $nBins),
       vals AS (SELECT v FROM hb UNION SELECT v FROM hc),
       binof AS (
         SELECT vals.v AS v,
                CAST(coalesce(min(ed.i), $nBins) AS BIGINT) AS bin
         FROM vals LEFT JOIN ed ON vals.v <= ed.e
         GROUP BY vals.v),
       bm AS (SELECT bin, CAST(sum(cb) AS BIGINT) AS n_base
              FROM hb JOIN binof USING (v) GROUP BY 1),
       cm AS (SELECT bin, CAST(sum(cc) AS BIGINT) AS n_curr
              FROM hc JOIN binof USING (v) GROUP BY 1),
       spine AS (SELECT unnest(generate_series(1, $nBins)) AS bin)
       SELECT CAST(spine.bin AS BIGINT) AS bin,
              CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
              CAST(coalesce(n_curr, 0) AS BIGINT) AS n_curr,
              (coalesce(n_base, 0) * 1000000) // nb AS p_ppm,
              (coalesce(n_curr, 0) * 1000000) // nc AS q_ppm,
              (coalesce(n_base, 0) * 1000000) // nb
                - (coalesce(n_curr, 0) * 1000000) // nc AS dev_ppm
       FROM spine
       LEFT JOIN bm ON spine.bin = bm.bin
       LEFT JOIN cm ON spine.bin = cm.bin
       CROSS JOIN nb CROSS JOIN nc
       ORDER BY bin"""

  /** KMV / theta-sketch audience overlap (Beyer et al. SIGMOD 2007;
    * the Theta-sketch set algebra of Dasgupta et al.): pairwise
    * DISTINCT-USER intersection estimates between event types from
    * k-minimum-value sketches — the segment-overlap question a
    * full distinct-count join would answer at corpus cost, answered
    * instead from k·|types| scalars.
    *
    * Everything is deterministic and integer-exact, so the gate is
    * hash-exact, not tolerance-checked: the hash is the md5-prefix
    * device (60-bit, portable to the oracle), each type keeps its k
    * smallest DISTINCT hashes (rank window partitioned by type over
    * the type-deduped hash frame), θ = the k-th smallest (or the 2⁶⁰
    * domain bound in exact mode, when the type has < k distinct
    * users — then the "estimate" IS the true intersection, the
    * SpaceSaving exact-mode device), and
    * est = ⌊common_below_θ · 2⁶⁰ / θ⌋.
    *
    * Scale shape: the corpus collapses to distinct (type, hash) in
    * one partial-agg'd shuffle; sketches are k-bounded per type, so
    * the pairwise stage is |types|²·k — corpus-size-independent.
    */
  def kmvOverlap(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    kmvOverlapOf(graft.Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("user_id")), k)

  /** Core over any (event_type, user_id) frame. */
  def kmvOverlapOf(df: DataFrame, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val bound = 1152921504606846976L // 2^60
    val hashes = df
      .select($"event_type",
        expr("conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)")
          .cast("long").as("h"))
      .distinct()
    val ranked = hashes
      .withColumn("rk", row_number().over(
        Window.partitionBy($"event_type").orderBy($"h")))
      .filter($"rk" <= k)
    val sketch = ranked.groupBy($"event_type")
      .agg(count(lit(1)).as("n_sk"), max($"h").as("max_h"))
      .withColumn("theta",
        when($"n_sk" < k, lit(bound)).otherwise($"max_h"))
    val vals = ranked.select($"event_type", $"h")
    val common = vals.as("x").join(vals.as("y"),
        $"x.h" === $"y.h" && $"x.event_type" < $"y.event_type")
      .select($"x.event_type".as("type_a"), $"y.event_type".as("type_b"),
        $"x.h".as("h"))
    val pairs = sketch.select($"event_type".as("type_a"),
        $"n_sk".as("n_a_sketch"), $"theta".as("theta_a"))
      .join(sketch.select($"event_type".as("type_b"),
        $"n_sk".as("n_b_sketch"), $"theta".as("theta_b")),
        $"type_a" < $"type_b")
      .withColumn("theta", least($"theta_a", $"theta_b"))
    // The θ cut lives inside the count (mirroring the oracle's
    // SUM(CASE...)) so a pair whose every shared hash equals θ still
    // surfaces with n_common = 0 instead of vanishing from the output.
    pairs
      .join(common, Seq("type_a", "type_b"), "left")
      .groupBy($"type_a", $"type_b", $"n_a_sketch", $"n_b_sketch", $"theta")
      .agg(sum(when($"h".isNotNull && $"h" < $"theta", 1L).otherwise(0L))
        .as("n_common"))
      .withColumn("est_inter", expr(
        s"CAST((CAST(n_common AS DECIMAL(38,0)) * ${bound}L) div theta " +
          "AS BIGINT)"))
      .orderBy($"type_a", $"type_b")
  }

  def kmvOverlapSql(k: Int = 256): String = {
    val bound = "1152921504606846976"
    s"""WITH hashes AS (
         SELECT DISTINCT event_type,
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                  AS h
         FROM events),
       ranked AS (
         SELECT event_type, h,
                row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
         FROM hashes),
       sk AS (SELECT event_type, h FROM ranked WHERE rk <= $k),
       sketch AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_sk,
                CASE WHEN count(*) < $k THEN $bound
                     ELSE max(h) END AS theta
         FROM sk GROUP BY 1),
       pairs AS (
         SELECT a.event_type AS type_a, b.event_type AS type_b,
                a.n_sk AS n_a_sketch, b.n_sk AS n_b_sketch,
                least(a.theta, b.theta) AS theta
         FROM sketch a JOIN sketch b ON a.event_type < b.event_type),
       common AS (
         SELECT x.event_type AS type_a, y.event_type AS type_b, x.h
         FROM sk x JOIN sk y
           ON x.h = y.h AND x.event_type < y.event_type)
       SELECT p.type_a, p.type_b, p.n_a_sketch, p.n_b_sketch,
              CAST(p.theta AS BIGINT) AS theta,
              CAST(sum(CASE WHEN c.h IS NOT NULL AND c.h < p.theta
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
              CAST((CAST(sum(CASE WHEN c.h IS NOT NULL AND c.h < p.theta
                              THEN 1 ELSE 0 END) AS HUGEINT) * $bound)
                   // CAST(p.theta AS HUGEINT) AS BIGINT) AS est_inter
       FROM pairs p
       LEFT JOIN common c ON c.type_a = p.type_a AND c.type_b = p.type_b
       GROUP BY p.type_a, p.type_b, p.n_a_sketch, p.n_b_sketch, p.theta
       ORDER BY 1, 2"""
  }
}
