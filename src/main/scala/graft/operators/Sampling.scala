package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible form of the
  * training-data mixing primitive. `sample(fraction)` draws from an
  * RNG whose result depends on partitioning and retry history; these
  * operators decide membership from a hash of the ROW KEY, so a
  * sample is (a) reproducible across runs/clusters/engines, (b) a
  * plain filter over the scan — zero shuffle, whole-stage codegen,
  * (c) consistent across tables (the same key always lands in the
  * same per-mille bucket, so fact and dim samples stay joinable),
  * and (d) nested: rate 50‰ ⊆ rate 100‰ by construction.
  *
  * Hash = first 7 hex chars of md5(key || salt) — 28 bits, portable
  * to any engine with md5 (the DuckDB oracle recomputes it exactly;
  * same family as MinHashLSH's hash). Change `salt` to draw an
  * independent sample.
  */
object Sampling {

  /** Per-mille bucket (0..999) for a key — stable across engines. */
  def bucket(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 7), 16, 10)
      .cast("long") % 1000

  def bucketSql(keyExpr: String, salt: String = ""): String =
    s"('0x' || substr(md5($keyExpr::VARCHAR || '$salt'), 1, 7))::BIGINT % 1000"

  /** Keep rows whose key falls in the first `ratePerMille` buckets. */
  def hashSample(df: DataFrame, key: Column, ratePerMille: Int,
      salt: String = ""): DataFrame = {
    require(ratePerMille >= 0 && ratePerMille <= 1000)
    df.filter(bucket(key, salt) < ratePerMille)
  }

  /** Stratified variant: per-stratum rates (training-mix weights),
    * e.g. keep 20% of English, 5% of everything else. Still one
    * zero-shuffle filter.
    */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int,
      salt: String = ""): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, v)) => when(strata === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket(key, salt) < rate)
  }

  /** Gate: 10% of documents by doc_id hash. */
  def sampleDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hashSample(Tables.documents(spark, dir), $"doc_id", 100)
      .select($"doc_id", $"lang")
  }

  val sampleDocsSql: String =
    s"""SELECT doc_id, lang FROM documents
        WHERE ${bucketSql("doc_id")} < 100"""

  /** Gate: language-stratified mix — 200‰ of en, 50‰ of de, 100‰
    * default.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    stratifiedSample(Tables.documents(spark, dir), $"doc_id", $"lang",
        Map("en" -> 200, "de" -> 50), defaultPerMille = 100)
      .groupBy($"lang").agg(count(lit(1)).as("n_kept"))
  }

  val sampleStratifiedSql: String =
    s"""SELECT lang, count(*) AS n_kept FROM documents
        WHERE ${bucketSql("doc_id")} <
          CASE lang WHEN 'en' THEN 200 WHEN 'de' THEN 50 ELSE 100 END
        GROUP BY lang"""

  /** Deterministic train/val/test assignment — every training
    * pipeline's first cut, with the properties `randomSplit` cannot
    * give: the same key lands in the same split on every run, engine,
    * and cluster (membership is the md5 per-mille [[bucket]], salted
    * independently of the sampling salts so split and sample draws
    * don't correlate); splits are disjoint and exhaustive BY
    * CONSTRUCTION (one CASE over one bucket value — no row can
    * two-home or vanish); and the assignment is a zero-shuffle scan
    * projection. Bands: train [0,900), val [900,950), test [950,1000).
    */
  def splitAssign(df: DataFrame, key: Column,
      salt: String = "split"): DataFrame =
    df.withColumn("split",
      when(bucket(key, salt) < 900, "train")
        .when(bucket(key, salt) < 950, "val")
        .otherwise("test"))

  /** Gate: the full document split assignment (the artifact a
    * training job consumes), plus per-row bucket for audit.
    */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    splitAssign(Tables.documents(spark, dir), $"doc_id")
      .select($"doc_id", $"split")
      .orderBy($"doc_id")
  }

  val sampleSplitSql: String =
    s"""SELECT doc_id,
          CASE WHEN ${bucketSql("doc_id", "split")} < 900 THEN 'train'
               WHEN ${bucketSql("doc_id", "split")} < 950 THEN 'val'
               ELSE 'test' END AS split
        FROM documents ORDER BY doc_id"""

  /** Temperature-based multi-source mixing (the training-mix
    * construction of multilingual/multi-domain pipelines, cf. the
    * α-smoothed sampling of mC4/XLM-R): per-source keep rates
    * ∝ n_source^α / n_source, normalized so the expected total kept
    * is `targetPerMille` of the corpus — α < 1 upweights rare
    * sources relative to proportional sampling. α is fixed at 0.5:
    * sqrt is IEEE-correctly-rounded in both engines (a general
    * `pow(x, α)` is not, which would break the exact gate; other
    * dyadic α compose from sqrt). The weights are converted to
    * integer micro-units before normalization and the rate is pure
    * integer arithmetic, so both engines derive bit-identical
    * per-mille rates; membership is the same md5 bucket as
    * [[hashSample]].
    *
    * Shape at 100 TB: source counts are a partial-agg'd tiny frame,
    * rates broadcast back, membership is a zero-shuffle scan filter —
    * the corpus never shuffles.
    */
  def sampleMixture(spark: SparkSession, dir: String,
      targetPerMille: Int = 200): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source")
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .withColumn("spow",
        round(sqrt($"n_docs".cast("double")) * lit(1000000.0)).cast("long"))
    val tot = counts.agg(sum($"n_docs").as("n_total"), sum($"spow").as("sum_pow"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate_pm", least(lit(1000L),
        expr(s"($targetPerMille * n_total * spow) div (sum_pow * n_docs)")))
      .select($"source", $"n_docs", $"rate_pm")
    val kept = docs
      .join(broadcast(rates.select($"source", $"rate_pm")), "source")
      .filter(bucket($"doc_id", "mix") < $"rate_pm")
      .groupBy($"source").agg(count(lit(1)).as("kept"))
    rates.join(kept, Seq("source"), "left")
      .select($"source", $"n_docs", $"rate_pm",
        coalesce($"kept", lit(0L)).as("n_kept"))
  }

  /** UniMax epoch-capped budget allocation (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling"): split a
    * total token budget B across sources as UNIFORMLY as possible,
    * subject to no source repeating more than `maxEpochs` times —
    * the mixture policy that neither drowns small sources
    * (proportional sampling) nor overcooks them (plain uniform).
    * Closed form of the water-filling recursion: sources sorted
    * ASCENDING by size; small sources bind at cap = E·nᵢ, and once a
    * source's cap exceeds the running fair share every larger source
    * is uncapped too (the fair share is invariant across uncapped
    * steps), so the capped set is a PREFIX. The per-row capped test
    * `E·nᵢ·(k−i+1) ≤ B − E·Pᵢ₋₁` is exact cross-multiplied BIGINT
    * arithmetic (monotone in i, so one window pass decides it), and
    * the uncapped share is one integer floor division — both engines
    * replay it bit-for-bit, no fp anywhere.
    *
    * Scale shape: the corpus collapses to a per-source token total
    * (one partial-agg'd pass); everything after runs on that
    * |sources|-row frame — the ordered window is aggregate-sized
    * (WindowAuditSpec's exempt family), the capped-prefix summary is
    * one broadcast row. The allocation feeds [[capTokensPerSource]]
    * per source to materialize the admitted set.
    */
  def unimaxAllocation(spark: SparkSession, dir: String,
      budgetTokens: Long = 50000L, maxEpochs: Long = 3L): DataFrame = {
    import spark.implicits._
    unimaxAllocationOf(
      Tables.documents(spark, dir)
        .select($"source", $"doc_id", $"text"),
      budgetTokens, maxEpochs)
  }

  /** Allocation core over any (source, text) frame. */
  def unimaxAllocationOf(docs: DataFrame, budgetTokens: Long,
      maxEpochs: Long): DataFrame = {
    require(budgetTokens >= 0 && maxEpochs >= 1)
    import org.apache.spark.sql.expressions.Window
    import docs.sparkSession.implicits._
    val totals = docs
      .select($"source",
        size(graft.operators.Dedup.tokensCol($"text")).cast("long").as("nt"))
      .groupBy($"source").agg(sum($"nt").as("n_tokens"))
    // |sources|-row frame from here on
    val w = Window.orderBy($"n_tokens", $"source")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val ranked = totals
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("p_prev", coalesce(sum($"n_tokens").over(wPrev), lit(0L)))
    val k = ranked.agg(count(lit(1)).as("k")).select($"k")
    val flagged = ranked.crossJoin(broadcast(k))
      .withColumn("capped",
        when(lit(maxEpochs) * $"n_tokens" * ($"k" - $"i" + 1L)
          <= lit(budgetTokens) - lit(maxEpochs) * $"p_prev", 1L)
          .otherwise(0L))
    val cappedAgg = flagged.agg(
      sum($"capped").as("m"),
      sum($"capped" * $"n_tokens").as("p_m"))
    flagged.crossJoin(broadcast(cappedAgg))
      .withColumn("alloc_tokens",
        when($"capped" === 1L, lit(maxEpochs) * $"n_tokens")
          .otherwise(expr(
            s"($budgetTokens - $maxEpochs * p_m) div (k - m)")))
      .select($"source", $"n_tokens",
        (lit(maxEpochs) * $"n_tokens").as("cap_tokens"),
        $"capped", $"alloc_tokens")
      .orderBy($"source")
  }

  def unimaxAllocationSql(budgetTokens: Long = 50000L,
      maxEpochs: Long = 3L): String =
    s"""WITH t AS (
         SELECT source,
                CAST(sum(len(list_filter(list_transform(
                  string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0))) AS BIGINT) AS n_tokens
         FROM documents GROUP BY 1),
       r AS (
         SELECT source, n_tokens,
                CAST(row_number() OVER (ORDER BY n_tokens, source)
                  AS BIGINT) AS i,
                CAST(coalesce(sum(n_tokens) OVER (
                  ORDER BY n_tokens, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS p_prev,
                CAST(count(*) OVER () AS BIGINT) AS k
         FROM t),
       f AS (
         SELECT *, CASE WHEN $maxEpochs * n_tokens * (k - i + 1)
                          <= $budgetTokens - $maxEpochs * p_prev
                        THEN 1 ELSE 0 END AS capped
         FROM r),
       s AS (
         SELECT CAST(sum(capped) AS BIGINT) AS m,
                CAST(sum(capped * n_tokens) AS BIGINT) AS p_m
         FROM f)
       SELECT source, n_tokens,
              CAST($maxEpochs * n_tokens AS BIGINT) AS cap_tokens,
              CAST(capped AS BIGINT) AS capped,
              CAST(CASE WHEN capped = 1 THEN $maxEpochs * n_tokens
                   ELSE ($budgetTokens - $maxEpochs * p_m) // (k - m)
                   END AS BIGINT) AS alloc_tokens
       FROM f, s ORDER BY source"""

  /** Deterministic proportional interleave — the training ORDER half
    * of mixture construction (rates and budgets say how much of each
    * source; this says in what sequence the trainer consumes it):
    * each source's r-th document lands at the systematic midpoint
    * (2r−1)·(10¹² div 2nₛ) of a shared integer line — the Madow
    * placement of [[ppsSystematic]] applied per source — so any
    * prefix of the global key order carries every source in
    * proportion to its size (no "all of CommonCrawl, then all of
    * books" pathology, no RNG shuffle that resumes differently after
    * a restart). Reading order within a source is the md5-bucket
    * order of [[hashSample]], so the interleave composes with the
    * sampling family and replays bit-for-bit on any engine.
    *
    * Scale shape: the per-source rank is the [[capTokensPerSource]]
    * two-phase banded layout (per-band counts → exclusive offsets
    * over the ≤1000-row band frame → within-band row_number), so a
    * 90%-one-source corpus never funnels through one window task;
    * the key is one integer expression. A full materialization of
    * the order is a sorted export ([[graft.pipeline.SortedExport]]'s
    * job); the gate reads the head of the order (TakeOrdered — no
    * global sort).
    */
  def interleaveOrderOf(df: DataFrame, salt: String = "ilv"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import df.sparkSession.implicits._
    val banded = df.withColumn("__band", bucket($"doc_id", salt))
    val bandCounts = banded.groupBy($"source", $"__band")
      .agg(count(lit(1)).as("__bn"))
    val wB = Window.partitionBy($"source").orderBy($"__band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandCounts
      .withColumn("__off", coalesce(sum($"__bn").over(wB), lit(0L)))
      .select($"source".as("__o_source"), $"__band".as("__o_band"), $"__off")
    val totals = bandCounts.groupBy($"source").agg(sum($"__bn").as("__ns"))
    val wIn = Window.partitionBy($"source", $"__band").orderBy($"doc_id")
    banded
      .join(broadcast(offsets),
        $"source" === $"__o_source" && $"__band" === $"__o_band")
      .join(broadcast(totals), "source")
      .withColumn("__r", $"__off" + row_number().over(wIn))
      .withColumn("interleave_key",
        (lit(2L) * $"__r" - 1L) * expr("1000000000000 div (2 * __ns)"))
      .drop("__band", "__o_source", "__o_band", "__off", "__ns", "__r")
  }

  /** Gate: the head of the global training order. */
  def sampleInterleave(spark: SparkSession, dir: String,
      head: Int = 200): DataFrame = {
    import spark.implicits._
    interleaveOrderOf(
      Tables.documents(spark, dir).select($"doc_id", $"source"))
      .orderBy($"interleave_key", $"source", $"doc_id")
      .limit(head)
      .select($"interleave_key", $"source", $"doc_id")
  }

  def sampleInterleaveSql(head: Int = 200): String =
    s"""WITH r AS (
         SELECT doc_id, source,
                CAST(row_number() OVER (PARTITION BY source
                  ORDER BY ${bucketSql("doc_id", "ilv")}, doc_id)
                  AS BIGINT) AS r,
                CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns
         FROM documents)
       SELECT CAST((2 * r - 1) * (1000000000000 // (2 * ns)) AS BIGINT)
                AS interleave_key,
              source, doc_id
       FROM r
       ORDER BY interleave_key, source, doc_id LIMIT $head"""

  /** Per-source token-budget cap — "take at most `budgetTokens`
    * tokens from each source", the other half of training-mix
    * construction (mixture sampling fixes RATES; a budget cap fixes
    * TOTALS, e.g. "CommonCrawl contributes at most X tokens").
    * Documents are admitted in deterministic md5-bucket order (the
    * same portable hash as [[hashSample]], doc_id tie-break), so the
    * admitted set is reproducible across engines/runs and monotone in
    * the budget: a bigger budget admits a superset. The running total
    * is monotone, so the kept set is a contiguous prefix of each
    * source's hash order — a doc is kept while the cumulative token
    * count INCLUDING it stays within budget.
    *
    * Computed in TWO PHASES so a dominant source never funnels
    * through one task (the [[SurrogateKey.orderedScalable]] device
    * applied to a running sum). A naive
    * `Window.partitionBy(source).orderBy(bucket, doc_id)` sorts ALL
    * of a source's docs in ONE partition — and a real pretraining mix
    * is usually >80% one crawl source, so at 100 TB that single
    * sorter sees billions of rows. Instead, the admission order's
    * major key — the per-mille bucket — is used as a BAND:
    *   1. partial token sums per (source, band): one map-side-combined
    *      aggregation, output ≤ 1000 rows per source;
    *   2. exclusive prefix offsets across bands, a window over that
    *      aggregate-sized frame only (bands whose offset already
    *      exceeds the budget are pruned here — their docs can never
    *      be admitted, so at a tight budget most of the corpus drops
    *      before the second shuffle);
    *   3. offsets broadcast back; a running sum within each
    *      (source, band) — ≤1/1000th of a source per task — plus the
    *      band offset reproduces the global cumulative sum exactly.
    * Same `cum_tokens` bit-for-bit, same admission semantics; the
    * hot source now splits across 1000 tasks, and both corpus-side
    * exchanges move (doc_id, source, n_tokens, band) scalars only —
    * text never shuffles.
    */
  def capTokensPerSource(df: DataFrame, budgetTokens: Long,
      salt: String = "cap"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import df.sparkSession.implicits._
    val banded = df.withColumn("__band", bucket($"doc_id", salt))
    val bandTotals = banded.groupBy($"source", $"__band")
      .agg(sum($"n_tokens").as("__band_tokens"))
    // exclusive prefix per source over ≤1000 band rows — partitioned
    // by bare `source`, safe ONLY because the input is the aggregate
    // (WindowAuditSpec's low-cardinality rule checks exactly that)
    val wBands = Window.partitionBy($"source").orderBy($"__band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals
      .withColumn("__band_offset",
        coalesce(sum($"__band_tokens").over(wBands), lit(0L)))
      // offset > budget ⇒ every doc in the band lands past the budget
      // (n_tokens ≥ 0 keeps cum ≥ offset); == budget stays, it can
      // still admit zero-token docs
      .filter($"__band_offset" <= budgetTokens)
      .select($"source".as("__o_source"), $"__band".as("__o_band"),
        $"__band_offset")
    val wIn = Window.partitionBy($"source", $"__band").orderBy($"doc_id")
    banded.join(broadcast(offsets),
        $"source" === $"__o_source" && $"__band" === $"__o_band")
      .withColumn("cum_tokens", $"__band_offset" + sum($"n_tokens").over(wIn))
      .filter($"cum_tokens" <= budgetTokens)
      .drop("__band", "__o_source", "__o_band", "__band_offset")
  }

  /** Probability-proportional-to-size SYSTEMATIC sampling (the
    * survey-statistics PPS design, Madow 1949): lay every unit's
    * weight end-to-end on an integer line in deterministic
    * (md5-band, doc_id) order, then select the unit covering every
    * stride-th position, stride = ⌊W/n⌋ — inclusion probability is
    * proportional to weight, the draw is exactly reproducible, and
    * unlike the u^(1/w) reservoir schemes there is NO transcendental
    * anywhere, so a cross-engine oracle can replay it bit-for-bit.
    * A unit wider than the stride is selected with multiplicity
    * (`picks` > 1) — the standard PPS treatment of giant units; a
    * zero-weight unit has an empty interval and can never be drawn.
    * Targets n draws exactly: total picks = W div stride ≥ n.
    *
    * Scale shape: the cumulative line is the SAME two-phase banded
    * cumsum as [[capTokensPerSource]] (per-band totals → exclusive
    * prefix over the ≤1000-row band frame → within-band running sum),
    * so nothing corpus-sized funnels through one window task; W and
    * the stride ride one broadcast scalar row.
    */
  def ppsSystematic(df: DataFrame, weight: Column, n: Long,
      salt: String = "pps", key: Column = col("doc_id")): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    import org.apache.spark.sql.expressions.Window
    import df.sparkSession.implicits._
    // `key` is the deterministic unit id the integer line is laid out
    // by (band assignment + within-band order) — any unique column
    // works, not just doc_id; the output keeps the caller's columns
    // and appends (weight, picks)
    val banded = df.withColumn("__w", weight)
      .withColumn("__key", key)
      .withColumn("__band", bucket($"__key", salt))
    val bandTotals = banded.groupBy($"__band")
      .agg(sum($"__w").as("__bt"))
    // exclusive prefix over the ≤1000-row band frame (unpartitioned —
    // aggregate-sized input; WindowAuditSpec carries the exemption)
    val wBands = Window.orderBy($"__band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals
      .withColumn("__off", coalesce(sum($"__bt").over(wBands), lit(0L)))
      .select($"__band".as("__o_band"), $"__off")
    // stride floors at 1 (W < n degenerates to every-unit-position —
    // all positive-weight units selected)
    val totals = bandTotals.agg(
      greatest(expr(s"sum(__bt) div ${n}L"), lit(1L)).as("__s"))
    val wIn = Window.partitionBy($"__band").orderBy($"__key")
    banded
      .join(broadcast(offsets), $"__band" === $"__o_band")
      .crossJoin(broadcast(totals))
      .withColumn("__c1", $"__off" + sum($"__w").over(wIn))
      .filter(expr("__c1 div __s > (__c1 - __w) div __s"))
      .withColumn("weight", $"__w")
      .withColumn("picks", expr("__c1 div __s - (__c1 - __w) div __s"))
      .drop("__w", "__key", "__band", "__o_band", "__off", "__s", "__c1")
  }

  /** Gate: 50 PPS draws from documents, weight = n_chars. */
  def samplePps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ppsSystematic(Tables.documents(spark, dir), $"n_chars", n = 50L)
      .select($"doc_id", $"weight", $"picks")
      .orderBy($"doc_id")
  }

  val samplePpsSql: String =
    s"""WITH b AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                 ${bucketSql("doc_id", "pps")} AS band
          FROM documents),
        c AS (
          SELECT doc_id, w,
                 CAST(sum(w) OVER (ORDER BY band, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS c1
          FROM b),
        s AS (SELECT greatest(CAST(sum(w) AS BIGINT) // 50, 1) AS s FROM b)
        SELECT doc_id, w AS weight,
               CAST(c1 // s - (c1 - w) // s AS BIGINT) AS picks
        FROM c, s
        WHERE c1 // s > (c1 - w) // s
        ORDER BY doc_id"""

  /** Deterministic NEGATIVE sampling for contrastive training
    * (anchor, negative) pairs — embedding models need k random
    * non-matching partners per anchor, and the naive spelling is a
    * cross join plus an RNG (quadratic AND unreproducible). Here:
    * every doc lands in one of 1000 md5 buckets; the per-bucket MIN
    * doc id forms a 1000-row representative map that BROADCASTS; each
    * anchor derives k target buckets by hashing (anchor, j) and joins
    * the map — O(k·|docs|) work, zero corpus self-join, and the
    * entire draw replays bit-for-bit on any engine (same md5 device
    * as [[bucket]]). A draw that lands on the anchor itself is
    * deterministically skipped (dropped, not re-rolled — both engines
    * agree). Negatives are hash-uniform over bucket representatives,
    * the standard in-batch/hash-negative compromise: not uniform over
    * docs, but reproducible and collision-audited, which is what a
    * training pipeline actually needs.
    */
  def sampleNegatives(df: DataFrame, k: Int = 4,
      salt: String = "neg"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // occupied buckets only — then DENSIFIED over the full 0..999
    // domain by backward fill (a target bucket with no doc takes the
    // nearest occupied bucket below it, wrapping at the bottom), so
    // every draw resolves regardless of corpus size. Both frames are
    // domain-sized (≤1000 rows): the non-equi fill join never sees
    // corpus scale, and the dense map is what broadcasts.
    val occ = df.groupBy(bucket($"doc_id", salt).as("ob"))
      .agg(min($"doc_id").as("o_neg"))
    val wrap = occ.orderBy($"ob".desc).limit(1)
      .select($"o_neg".as("wrap_rep"))
    val dense = spark.range(1000).toDF("b")
      .join(broadcast(occ), $"ob" <= $"b", "left")
      .groupBy($"b").agg(max_by($"o_neg", $"ob").as("le_rep"))
      .crossJoin(broadcast(wrap))
      .select($"b", coalesce($"le_rep", $"wrap_rep").as("neg_id"))
    df.select($"doc_id".as("anchor_id"),
        explode(expr(s"sequence(1, $k)")).as("j"))
      .withColumn("tb",
        bucket(concat($"anchor_id".cast("string"), lit("#"), $"j"), salt))
      .join(broadcast(dense), $"tb" === $"b")
      .filter($"neg_id" =!= $"anchor_id")
      .select($"anchor_id", $"j".cast("long").as("j"), $"neg_id")
      .orderBy($"anchor_id", $"j")
  }

  /** Gate: 4 negatives per document. */
  def sampleNegativesDocs(spark: SparkSession, dir: String): DataFrame =
    sampleNegatives(Tables.documents(spark, dir))

  val sampleNegativesDocsSql: String = {
    val bucketDoc = bucketSql("doc_id", "neg")
    val bucketTarget = bucketSql("(a.doc_id::VARCHAR || '#' || j.j::VARCHAR)", "neg")
    s"""WITH occ AS (
          SELECT $bucketDoc AS ob, CAST(min(doc_id) AS BIGINT) AS o_neg
          FROM documents GROUP BY 1),
        dense AS (
          SELECT t.t AS b, coalesce(
            (SELECT o.o_neg FROM occ o WHERE o.ob <= t.t
             ORDER BY o.ob DESC LIMIT 1),
            (SELECT o.o_neg FROM occ o ORDER BY o.ob DESC LIMIT 1)) AS neg_id
          FROM range(1000) t(t)),
        anchors AS (
          SELECT a.doc_id AS anchor_id, CAST(j.j AS BIGINT) AS j,
                 $bucketTarget AS tb
          FROM documents a, range(1, 5) j(j))
        SELECT anchor_id, j, neg_id
        FROM anchors JOIN dense ON tb = b
        WHERE neg_id <> anchor_id
        ORDER BY anchor_id, j"""
  }

  /** Rate-based approximate budget cap — the zero-shuffle sibling of
    * [[capTokensPerSource]] for when even banded exact admission is
    * more coordination than the job needs: per-source keep rates
    * derived so EXPECTED kept tokens ≈ budget, membership the same
    * md5-bucket filter as [[hashSample]]. Exact totals are traded for
    * a plan with no window at all — per-source token totals are one
    * partial-agg'd tiny frame, rates broadcast back, the corpus
    * never shuffles. Rates are pure integer arithmetic
    * (budget·1000 div total), so the gate is hash-exact — what is
    * approximate is the TOKEN TOTAL the rate admits (binomial around
    * the budget), not the row membership, which is deterministic.
    */
  def capTokensPerSourceRate(df: DataFrame, budgetTokens: Long,
      salt: String = "capr"): DataFrame = {
    import df.sparkSession.implicits._
    require(budgetTokens >= 0, s"budgetTokens=$budgetTokens must be >= 0")
    val rates = df.groupBy($"source")
      .agg(sum($"n_tokens").as("tot_tokens"))
      // tot_tokens = 0 is special-cased to rate 1000: any rate
      // satisfies a zero-token budget draw, so a zero-token source is
      // kept whole — including at budgetTokens = 0, where a
      // greatest(tot,1) denominator would yield 0 div 1 = 0 and
      // silently drop every doc
      .withColumn("rate_pm",
        when($"tot_tokens" === 0L, lit(1000L))
          .otherwise(least(lit(1000L),
            expr(s"($budgetTokens * 1000) div tot_tokens"))))
      .select($"source".as("__r_source"), $"rate_pm")
    df.join(broadcast(rates), $"source" === $"__r_source")
      .filter(bucket($"doc_id", salt) < $"rate_pm")
      .drop("__r_source")
  }

  /** Fixed-count quota — "exactly N docs per source" (eval splits,
    * per-domain calibration sets, balanced fine-tuning mixes): the
    * count sibling of the rate ([[sampleMixture]]) and token-budget
    * ([[capTokensPerSource]]) samplers. Admission order is the same
    * deterministic (md5 bucket, doc_id) as the budget cap, so the
    * quota set is reproducible and monotone in N, and the same
    * TWO-PHASE band device keeps it scale-safe: per-(source, band)
    * COUNTS (aggregate-sized), exclusive band rank offsets, bands
    * wholly past the quota pruned broadcast-side, then row_number
    * within (source, band) — global rank = offset + within-band rank,
    * no per-source window anywhere. A dominant source splits across
    * 1000 tasks exactly as in the budget cap.
    */
  def sampleFixedPerSource(df: DataFrame, n: Long,
      salt: String = "quota"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import df.sparkSession.implicits._
    require(n >= 1)
    val banded = df.withColumn("__band", bucket($"doc_id", salt))
    val bandCounts = banded.groupBy($"source", $"__band")
      .agg(count(lit(1)).as("__band_n"))
    val wBands = Window.partitionBy($"source").orderBy($"__band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandCounts
      .withColumn("__rank_offset",
        coalesce(sum($"__band_n").over(wBands), lit(0L)))
      // a band whose offset has already consumed the quota admits
      // nothing — its docs never reach the second shuffle
      .filter($"__rank_offset" < n)
      .select($"source".as("__o_source"), $"__band".as("__o_band"),
        $"__rank_offset")
    val wIn = Window.partitionBy($"source", $"__band").orderBy($"doc_id")
    banded.join(broadcast(offsets),
        $"source" === $"__o_source" && $"__band" === $"__o_band")
      .withColumn("rank_in_source",
        $"__rank_offset" + row_number().over(wIn))
      .filter($"rank_in_source" <= n)
      .drop("__band", "__o_source", "__o_band", "__rank_offset")
  }

  /** Gate: exactly 40 docs per source in hash-admission order. */
  def sampleQuotaDocs(spark: SparkSession, dir: String,
      n: Long = 40): DataFrame = {
    import spark.implicits._
    sampleFixedPerSource(
      Tables.documents(spark, dir).select($"doc_id", $"source"), n)
      .select($"doc_id", $"source", $"rank_in_source")
  }

  def sampleQuotaDocsSql(n: Long = 40): String =
    s"""SELECT doc_id, source, rank_in_source FROM (
          SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY ${bucketSql("doc_id", "quota")}, doc_id)
                   AS BIGINT) AS rank_in_source
          FROM documents)
        WHERE rank_in_source <= $n"""

  /** Gate: each source capped at 800 tokens (the test corpus carries
    * ~1.1-1.6k tokens per source, so the cap genuinely cuts).
    */
  def sampleTokenBudget(spark: SparkSession, dir: String,
      budgetTokens: Long = 800): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens"))
    capTokensPerSource(docs, budgetTokens)
      .select($"doc_id", $"source", $"n_tokens", $"cum_tokens")
  }

  def sampleTokenBudgetSql(budgetTokens: Long = 800): String =
    s"""WITH toks AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(list_transform(
                        string_split(trim(text), ' '), x -> trim(x)),
                        x -> length(x) > 0)) AS BIGINT) AS n_tokens
          FROM documents),
        cum AS (
          SELECT doc_id, source, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY source
                   ORDER BY ${bucketSql("doc_id", "cap")}, doc_id)
                   AS BIGINT) AS cum_tokens
          FROM toks)
        SELECT doc_id, source, n_tokens, cum_tokens FROM cum
        WHERE cum_tokens <= $budgetTokens"""

  /** Gate: the rate path at the same 800-token budget — kept rows
    * with their source's integer rate.
    */
  def sampleTokenBudgetRate(spark: SparkSession, dir: String,
      budgetTokens: Long = 800): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens"))
    capTokensPerSourceRate(docs, budgetTokens)
      .select($"doc_id", $"source", $"n_tokens", $"rate_pm")
  }

  def sampleTokenBudgetRateSql(budgetTokens: Long = 800): String =
    s"""WITH toks AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(list_transform(
                        string_split(trim(text), ' '), x -> trim(x)),
                        x -> length(x) > 0)) AS BIGINT) AS n_tokens
          FROM documents),
        rates AS (
          SELECT source,
                 CASE WHEN CAST(sum(n_tokens) AS BIGINT) = 0
                      THEN 1000::BIGINT
                      ELSE least(1000::BIGINT,
                        ($budgetTokens * 1000)
                          // CAST(sum(n_tokens) AS BIGINT)) END
                   AS rate_pm
          FROM toks GROUP BY source)
        SELECT t.doc_id, t.source, t.n_tokens,
               CAST(r.rate_pm AS BIGINT) AS rate_pm
        FROM toks t JOIN rates r ON t.source = r.source
        WHERE ${bucketSql("t.doc_id", "capr")} < r.rate_pm"""

  def sampleMixtureSql(targetPerMille: Int = 200): String =
    s"""WITH c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1),
        p AS (
          SELECT source, n_docs,
                 CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0::DOUBLE)
                      AS BIGINT) AS spow
          FROM c),
        t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
                     CAST(sum(spow) AS BIGINT) AS sum_pow FROM p),
        r AS (
          SELECT source, n_docs,
                 least(1000::BIGINT,
                   ($targetPerMille * t.n_total * p.spow)
                     // (t.sum_pow * p.n_docs)) AS rate_pm
          FROM p CROSS JOIN t)
        SELECT r.source, r.n_docs, CAST(r.rate_pm AS BIGINT) AS rate_pm,
               CAST(count(d.doc_id) AS BIGINT) AS n_kept
        FROM r LEFT JOIN documents d
          ON d.source = r.source AND ${bucketSql("d.doc_id", "mix")} < r.rate_pm
        GROUP BY 1, 2, 3"""

  /** Temporal train/test split with an EMBARGO gap (the financial-ML
    * backtest hygiene, cf. López de Prado's purged splits made
    * public in *Advances in Financial Machine Learning*): rows
    * before the cutoff train, rows after cutoff+gap test, and the
    * gap rows are EXCLUDED so that any label/feature leakage with
    * horizon ≤ gap cannot straddle the boundary — the failure mode a
    * plain timestamp split silently ships. Cutoff is the integer
    * epoch-second at the given per-mille rank of the event times
    * (banded exact NTILE arithmetic is overkill for one scalar: an
    * approx-free exact percentile via the value histogram), held
    * integer so both engines draw the same line. Output is the
    * per-split census — counts, users, and the boundary receipts
    * that prove the embargo really separates train from test.
    */
  def temporalSplit(spark: SparkSession, dir: String,
      cutPerMille: Int = 800, gapHours: Int = 24): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(expr("unix_timestamp(ts)").as("es"), $"user_id")
    val hist = ev.groupBy($"es").agg(count(lit(1)).as("c"))
    val tot = hist.agg(sum($"c").as("n"))
    // exact percentile over the VALUE HISTOGRAM: smallest es whose
    // running count reaches ceil(p·n/1000) — domain-sized window
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"es")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cut = hist.withColumn("cum", sum($"c").over(w))
      .crossJoin(broadcast(tot))
      .filter($"cum" * 1000L >= $"n" * cutPerMille)
      .orderBy($"es").limit(1)
      .select($"es".as("cut_es"))
    val gap = gapHours * 3600L
    ev.crossJoin(broadcast(cut))
      .withColumn("split",
        when($"es" <= $"cut_es", "train")
          .when($"es" > $"cut_es" + gap, "test")
          .otherwise("embargo"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_events"),
        count_distinct($"user_id").as("n_users"),
        min($"es").as("lo_es"), max($"es").as("hi_es"))
      .orderBy($"split")
  }

  def temporalSplitSql(cutPerMille: Int = 800, gapHours: Int = 24): String =
    s"""WITH ev AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, user_id
          FROM events),
        h AS (SELECT es, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1),
        t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        cum AS (SELECT es, CAST(sum(c) OVER (ORDER BY es) AS BIGINT) AS cum
                FROM h),
        cut AS (SELECT es AS cut_es FROM cum CROSS JOIN t
                WHERE cum * 1000 >= n * $cutPerMille
                ORDER BY es LIMIT 1),
        lab AS (
          SELECT CASE WHEN es <= cut_es THEN 'train'
                      WHEN es > cut_es + ${gapHours * 3600L} THEN 'test'
                      ELSE 'embargo' END AS split,
                 es, user_id
          FROM ev CROSS JOIN cut)
        SELECT split, CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(min(es) AS BIGINT) AS lo_es,
               CAST(max(es) AS BIGINT) AS hi_es
        FROM lab GROUP BY split ORDER BY split"""

  /** Deterministic k-FOLD assignment + balance census — the
    * cross-validation split (Stone 1974) as a replayable dataflow:
    * fold = md5-bucket(doc_id, "fold") div (1000/k), so folds are
    * disjoint, exhaustive, and bit-identical on any engine (the
    * sampleSplit device with k equal slices). The census reports the
    * per-(fold, source) cell counts a CV harness checks before
    * trusting fold symmetry. One aggregate; fold math is scan-side.
    */
  def kfoldCensus(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    import spark.implicits._
    require(1000 % k == 0, s"k=$k must divide the 1000-bucket space")
    val width = 1000 / k
    Tables.documents(spark, dir)
      .select($"doc_id", $"source")
      .withColumn("fold_b", bucket($"doc_id", "fold"))
      .withColumn("fold", expr(s"fold_b div $width"))
      .groupBy($"fold", $"source")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"fold", $"source")
  }

  def kfoldCensusSql(k: Int = 5): String = {
    val width = 1000 / k
    s"""SELECT ${bucketSql("doc_id", "fold")} // $width AS fold,
               source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** Importance-reweighting plan toward a UNIFORM source mix (the
    * domain-reweighting primitive behind DoReMi-style mixture tuning
    * and survey post-stratification — Horvitz–Thompson weights): per
    * source, weight ∝ target share / empirical share, i.e.
    * w_ppm = n_total·10⁶ div (k·n_source), clamped at `capPpm`
    * (uncapped tail weights explode on rare sources). Emits the plan
    * plus the diagnostic that decides if it's usable: Kish's
    * effective sample size (Σ nw)²/(Σ nw²) — exact integer
    * numerators (headroom: ppm² ·n² ≤ 10¹² ·n², n ≤ 10⁹ per source
    * under the cap), one final division. One aggregate pass;
    * metadata after.
    */
  def importanceWeights(spark: SparkSession, dir: String,
      capPpm: Long = 10000000L): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum($"n_docs").as("n_total"),
      count(lit(1)).as("k"))
    val plan = counts.crossJoin(broadcast(tot))
      .select($"source", $"n_docs",
        least(lit(capPpm),
          expr("(n_total * 1000000L) div (k * n_docs)")).as("w_ppm"))
      .localCheckpoint(true)
    val ess = plan
      .agg(sum($"n_docs" * $"w_ppm").as("sw"),
        sum($"n_docs" * $"w_ppm" * $"w_ppm").as("sw2"))
      .select(round($"sw".cast("double") * $"sw".cast("double")
        / $"sw2".cast("double"), 2).as("ess"))
    plan.crossJoin(broadcast(ess))
      .select($"source", $"n_docs", $"w_ppm",
        when($"w_ppm" === capPpm, 1L).otherwise(0L).as("capped"),
        $"ess")
      .orderBy($"source")
  }

  def importanceWeightsSql(capPpm: Long = 10000000L): String =
    s"""WITH counts AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
                       CAST(count(*) AS BIGINT) AS k
                FROM counts),
        plan AS (
          SELECT source, n_docs,
                 least($capPpm,
                   (n_total * 1000000) // (k * n_docs)) AS w_ppm
          FROM counts CROSS JOIN tot),
        ess AS (
          SELECT round(CAST(sum(n_docs * w_ppm) AS DOUBLE)
            * CAST(sum(n_docs * w_ppm) AS DOUBLE)
            / CAST(sum(n_docs * w_ppm * w_ppm) AS DOUBLE), 2) AS ess
          FROM plan)
        SELECT source, n_docs, w_ppm,
               CAST(CASE WHEN w_ppm = $capPpm THEN 1 ELSE 0 END
                 AS BIGINT) AS capped,
               ess
        FROM plan CROSS JOIN ess
        ORDER BY source"""

  /** Neyman optimal allocation of a fixed sampling budget across
    * strata (Neyman 1934): sample size ∝ N_h·σ_h, the allocation
    * minimizing the variance of the stratified mean — the principled
    * answer to "how many docs per source for the eval sample" that
    * proportional allocation (∝ N_h alone) only approximates when
    * strata variances are equal. Here strata are document sources
    * and the metric is n_chars; N_h·σ_h reduces to
    * √(n_h·Σx² − (Σx)²) exactly (the whole stratum is observed), so
    * the weight is one correctly-rounded IEEE sqrt over an exact
    * BIGINT, quantized once. The moments are taken over HECTOCHAR
    * units (x' = n_chars div 100) — allocation is scale-invariant in
    * the metric's units (∝ N_h·σ_h), and the pre-scale buys 100×
    * BIGINT headroom on the squared terms: n_h·Σx'² ≈ (n_h·x̄')²
    * stays under 2⁶³ while n_h·x̄' < 3.0·10⁹, i.e. ~10⁸ docs per
    * stratum at 3 kchar averages (raw chars would overflow at ~10⁶ —
    * Spark non-ANSI would wrap silently while DuckDB raises). The
    * rent is quantizing sub-100-char variance into the weight; the
    * seat-dealing arithmetic below is unchanged and exact. Integer seats are dealt by the
    * largest-remainder (Hamilton) method: floor quotas exactly via
    * (B·w) div W, leftovers to the largest (B·w) mod W with a
    * source-name tie-break — fully deterministic, sums to B exactly.
    *
    * Scale shape: one partial-agg'd groupBy(source) collapses the
    * corpus to the stratum census; everything after (weights, quota
    * arithmetic, the remainder rank) is source-domain-sized. The
    * remainder window is unpartitioned but runs on that domain-sized
    * frame.
    */
  def neymanAllocation(spark: SparkSession, dir: String,
      budget: Long = 100L): DataFrame = {
    import spark.implicits._
    val census = Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("n_chars div 100")).as("s1"),
        sum(expr("(n_chars div 100) * (n_chars div 100)")).as("s2"))
      .withColumn("w",
        round(sqrt(($"n_docs" * $"s2" - $"s1" * $"s1").cast("double")))
          .cast("long"))
    val tot = census.agg(sum($"w").as("big_w"))
    val quotas = census.crossJoin(broadcast(tot))
      .withColumn("base",
        when($"big_w" > 0L, expr(s"($budget * w) div big_w")).otherwise(0L))
      .withColumn("rem",
        when($"big_w" > 0L, expr(s"($budget * w) % big_w")).otherwise(0L))
    val leftover = quotas.agg((lit(budget) - sum($"base")).as("extra"))
    val wR = Window.orderBy($"rem".desc, $"source")
    quotas.crossJoin(broadcast(leftover))
      .withColumn("pos", row_number().over(wR).cast("long"))
      .select($"source", $"n_docs", $"w", $"base", $"rem",
        ($"base" + when($"pos" <= $"extra" && $"big_w" > 0L, 1L)
          .otherwise(0L)).as("alloc"))
      .orderBy($"source")
  }

  def neymanAllocationSql(budget: Long = 100L): String =
    s"""WITH census AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_chars // 100) AS BIGINT) AS s1,
                 CAST(sum((n_chars // 100) * (n_chars // 100)) AS BIGINT)
                   AS s2
          FROM documents GROUP BY 1),
        wts AS (
          SELECT source, n_docs,
                 CAST(round(sqrt(CAST(n_docs * s2 - s1 * s1 AS DOUBLE)))
                   AS BIGINT) AS w
          FROM census),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS big_w FROM wts),
        quotas AS (
          SELECT source, n_docs, w,
                 CASE WHEN big_w > 0 THEN ($budget * w) // big_w
                      ELSE 0 END AS base,
                 CASE WHEN big_w > 0 THEN ($budget * w) % big_w
                      ELSE 0 END AS rem,
                 big_w
          FROM wts, tot),
        lft AS (SELECT $budget - CAST(sum(base) AS BIGINT) AS extra
                FROM quotas),
        ranked AS (
          SELECT source, n_docs, w, base, rem, big_w,
                 CAST(row_number() OVER (ORDER BY rem DESC, source)
                   AS BIGINT) AS pos
          FROM quotas)
        SELECT source, n_docs, w, CAST(base AS BIGINT) AS base,
               CAST(rem AS BIGINT) AS rem,
               CAST(base + CASE WHEN pos <= extra AND big_w > 0
                                THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM ranked, lft
        ORDER BY source"""
}
