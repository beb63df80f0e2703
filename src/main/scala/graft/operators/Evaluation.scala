package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation metrics over corpus-scale score columns —
  * the measurement half of model-based curation: TextAnalysis'
  * language-ID already has a per-class precision/recall harness
  * (`text_langid_eval`); this adds the threshold-free ROC AUC for
  * scoring models ([[QualityModel]] here). At 100 TB the device
  * matters more than the metric: AUC is computed exactly from the
  * SCORE HISTOGRAM (one row per distinct score) via the rank-sum
  * identity, never by sorting corpus rows.
  */
object Evaluation {

  /** Exact ROC AUC of the quality-model score against a binary
    * label (lang = 'en'), via the Mann-Whitney identity
    * AUC = U/(n₁n₀): a positive with score s beats every negative
    * strictly below and half of the score-tied ones, so over the
    * score histogram (p_s, q_s) with nb_s = negatives strictly
    * below, 2U = Σ p_s·(2·nb_s + q_s) stays BIGINT-exact; the one
    * division is a pinned double rounded once. The cumulative
    * window runs over the score histogram — domain-sized (score
    * range is bounded by max doc length × max |weight|), same
    * exemption family as olap_mannwhitney; the corpus itself only
    * passes through the score aggregation.
    */
  def aucQualityVsEnglish(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val scored = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score",
        when($"lang" === "en", 1L).otherwise(0L).as("is_pos"))
    val hist = scored.groupBy($"score")
      .agg(sum($"is_pos").as("p"),
        sum(lit(1L) - $"is_pos").as("q"))
    val below = Window.orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = hist
      .withColumn("nb", coalesce(sum($"q").over(below), lit(0L)))
      .agg(sum($"p").as("n_pos"), sum($"q").as("n_neg"),
        sum($"p" * (lit(2L) * $"nb" + $"q")).as("u2"))
    agg.select($"n_pos", $"n_neg", $"u2",
      round(expr("""CAST(u2 AS DOUBLE)
                    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))"""),
        6).as("auc"))
  }

  val aucQualityVsEnglishSql: String = {
    val score = QualityModel.scoreDocumentsSql
    s"""WITH scored_docs AS ($score),
       s AS (
         SELECT sd.score,
                CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_pos
         FROM scored_docs sd JOIN documents d ON sd.doc_id = d.doc_id),
       h AS (
         SELECT score, CAST(sum(is_pos) AS BIGINT) AS p,
                CAST(sum(1 - is_pos) AS BIGINT) AS q
         FROM s GROUP BY score),
       c AS (
         SELECT p, q,
                CAST(coalesce(sum(q) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS nb
         FROM h),
       a AS (
         SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                CAST(sum(q) AS BIGINT) AS n_neg,
                CAST(sum(p * (2 * nb + q)) AS BIGINT) AS u2
         FROM c)
       SELECT n_pos, n_neg, u2,
              round(CAST(u2 AS DOUBLE)
                    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)),
                    6) AS auc
       FROM a"""
  }

  /** Precision–recall curve of the quality-model score against the
    * binary label — the eval that matters when positives are RARE
    * (ROC flatters a classifier at class imbalance; the curation
    * question "of what I keep, how much is good" is precision, and
    * PR is its whole trade-off). One point per distinct score,
    * descending: tp/fp are cumulative sums over the SCORE HISTOGRAM
    * (the ml_auc domain-sized-window device), and precision/recall
    * are integer ppm ratios — the entire gate is BIGINT arithmetic,
    * no fp anywhere. The trapezoidal PR-AUC, when wanted, folds from
    * these exact points; emitting the curve rather than one scalar
    * keeps the gate integer-exact and the operating-point choice
    * with the consumer.
    */
  def prCurveQualityVsEnglish(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val scored = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score",
        when($"lang" === "en", 1L).otherwise(0L).as("is_pos"))
    val hist = scored.groupBy($"score")
      .agg(sum($"is_pos").as("p"), sum(lit(1L) - $"is_pos").as("q"))
    val fromTop = Window.orderBy($"score".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = hist.agg(sum($"p").as("n_pos"))
    hist.crossJoin(broadcast(totals))
      .withColumn("tp", sum($"p").over(fromTop))
      .withColumn("fp", sum($"q").over(fromTop))
      .select($"score", $"tp", $"fp",
        expr("(tp * 1000000) div (tp + fp)").as("precision_ppm"),
        expr("(tp * 1000000) div n_pos").as("recall_ppm"))
      .orderBy($"score".desc)
  }

  val prCurveQualityVsEnglishSql: String = {
    val score = QualityModel.scoreDocumentsSql
    s"""WITH scored_docs AS ($score),
       s AS (
         SELECT sd.score,
                CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_pos
         FROM scored_docs sd JOIN documents d ON sd.doc_id = d.doc_id),
       h AS (
         SELECT score, CAST(sum(is_pos) AS BIGINT) AS p,
                CAST(sum(1 - is_pos) AS BIGINT) AS q
         FROM s GROUP BY score),
       t AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos FROM h),
       c AS (
         SELECT score,
                CAST(sum(p) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS tp,
                CAST(sum(q) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS fp
         FROM h)
       SELECT score, tp, fp,
              CAST((tp * 1000000) // (tp + fp) AS BIGINT) AS precision_ppm,
              CAST((tp * 1000000) // n_pos AS BIGINT) AS recall_ppm
       FROM c, t ORDER BY score DESC"""
  }

  /** Cumulative-gains / lift table at decile depths of the
    * quality-model score vs the English label — the campaign-
    * targeting readout ("scoring the top 20 % catches X % of the
    * positives, at Y× the base rate") that PR/ROC curves imply but
    * don't state at fixed depths. Depths are score-THRESHOLD
    * operating points drawn exactly from the SCORE HISTOGRAM: decile
    * i's row is the first histogram row (descending score) whose
    * cumulative count reaches (i·N) div 10, so ties never split a
    * score bucket and the reported depth is the bucket's true
    * cumulative count. gain_ppm is exact integer division;
    * lift is the one pinned double, rounded once.
    *
    * Scale shape: the corpus collapses into the score histogram by
    * one partial-agg'd groupBy; the cumulative pass is the ml_auc
    * domain-sized window; the decile ladder is a 10-row broadcast
    * fanned over histogram rows then min-reduced — nothing
    * corpus-sized moves after the first aggregate.
    */
  def gainsQualityVsEnglish(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val scored = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score",
        when($"lang" === "en", 1L).otherwise(0L).as("is_pos"))
    val hist = scored.groupBy($"score")
      .agg(sum($"is_pos").as("p"), sum(lit(1L) - $"is_pos").as("q"))
    val fromTop = Window.orderBy($"score".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = hist.agg(sum($"p" + $"q").as("big_n"), sum($"p").as("n_pos"))
    val cum = hist
      .withColumn("cum", sum($"p" + $"q").over(fromTop))
      .withColumn("tp", sum($"p").over(fromTop))
      .select($"cum", $"tp")
    val ladder = broadcast((1L to 10L).toDF("decile"))
    cum.crossJoin(broadcast(totals)).crossJoin(ladder)
      .withColumn("target_n", expr("(decile * big_n) div 10"))
      .filter($"cum" >= $"target_n")
      .groupBy($"decile")
      .agg(max($"target_n").as("target_n"),
        min(struct($"cum", $"tp")).as("m"),
        max($"big_n").as("big_n"), max($"n_pos").as("n_pos"))
      .select($"decile", $"target_n", $"m.cum".as("depth_n"),
        $"m.tp".as("tp"),
        when($"n_pos" > 0L, expr("(m.tp * 1000000) div n_pos"))
          .otherwise(0L).as("gain_ppm"),
        when($"n_pos" > 0L && $"m.cum" > 0L,
          round($"m.tp".cast("double") * $"big_n".cast("double") /
            ($"m.cum".cast("double") * $"n_pos".cast("double")), 6))
          .otherwise(lit(0.0)).as("lift"))
      .orderBy($"decile")
  }

  val gainsQualityVsEnglishSql: String = {
    val score = QualityModel.scoreDocumentsSql
    s"""WITH scored_docs AS ($score),
       s AS (
         SELECT sd.score,
                CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_pos
         FROM scored_docs sd JOIN documents d ON sd.doc_id = d.doc_id),
       h AS (
         SELECT score, CAST(sum(is_pos) AS BIGINT) AS p,
                CAST(sum(1 - is_pos) AS BIGINT) AS q
         FROM s GROUP BY score),
       t AS (SELECT CAST(sum(p + q) AS BIGINT) AS big_n,
                    CAST(sum(p) AS BIGINT) AS n_pos FROM h),
       c AS (
         SELECT CAST(sum(p + q) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
                CAST(sum(p) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS tp
         FROM h),
       ladder AS (SELECT CAST(d AS BIGINT) AS decile
                  FROM (VALUES (1), (2), (3), (4), (5),
                               (6), (7), (8), (9), (10)) v(d)),
       hit AS (
         SELECT decile, (decile * big_n) // 10 AS target_n,
                cum, tp, big_n, n_pos
         FROM c, t, ladder WHERE cum >= (decile * big_n) // 10),
       best AS (
         SELECT decile, CAST(max(target_n) AS BIGINT) AS target_n,
                CAST(min(cum) AS BIGINT) AS depth_n,
                CAST(min_by(tp, cum) AS BIGINT) AS tp,
                CAST(max(big_n) AS BIGINT) AS big_n,
                CAST(max(n_pos) AS BIGINT) AS n_pos
         FROM hit GROUP BY decile)
       SELECT decile, target_n, depth_n, tp,
              CASE WHEN n_pos > 0
                   THEN CAST((tp * 1000000) // n_pos AS BIGINT)
                   ELSE 0 END AS gain_ppm,
              CASE WHEN n_pos > 0 AND depth_n > 0
                   THEN round(CAST(tp AS DOUBLE) * CAST(big_n AS DOUBLE)
                     / (CAST(depth_n AS DOUBLE) * CAST(n_pos AS DOUBLE)), 6)
                   ELSE 0.0 END AS lift
       FROM best ORDER BY decile"""
  }

  /** McNemar paired-classifier test (McNemar, Psychometrika 1947):
    * do the language-ID heuristic and the quality-model keep flag
    * DISAGREE about English docs more in one direction than the
    * other? Two classifiers measured on the SAME documents are
    * paired — comparing their raw accuracies ignores that pairing;
    * McNemar looks only at the discordant cells (A right/B wrong vs
    * A wrong/B right), χ² = (n01−n10)²/(n01+n10). Everything is an
    * exact integer count off one corpus pass (the langid and quality
    * frames join on doc_id); the χ² is the one pinned division.
    * Emitting all four agreement cells keeps the gate cross-engine
    * exact and lets the consumer fold any paired statistic.
    */
  def mcnemarLangidVsQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val truth = docs.select($"doc_id", ($"lang" === "en").as("is_en"))
    val a = TextAnalysis.langId(spark, dir)
      .select($"doc_id", ($"pred_lang" === "en").as("pa"))
    val b = QualityModel.score(docs)
      .select($"doc_id", ($"keep" === 1L).as("pb"))
    val cells = truth.join(a, "doc_id").join(b, "doc_id")
      .select(($"pa" === $"is_en").cast("long").as("ca"),
        ($"pb" === $"is_en").cast("long").as("cb"))
      .agg(count(lit(1)).as("n"),
        sum($"ca" * $"cb").as("n11"),
        sum((lit(1L) - $"ca") * (lit(1L) - $"cb")).as("n00"),
        sum($"ca" * (lit(1L) - $"cb")).as("n10"),
        sum((lit(1L) - $"ca") * $"cb").as("n01"))
    cells.select($"n", $"n11", $"n00", $"n10", $"n01",
      when($"n01" + $"n10" > 0L,
        round(($"n01" - $"n10").cast("double") *
          ($"n01" - $"n10").cast("double") /
          ($"n01" + $"n10").cast("double"), 4))
        .otherwise(lit(0.0)).as("chi2"))
  }

  val mcnemarLangidVsQualitySql: String = {
    val langid = TextAnalysis.langIdSql
    val score = QualityModel.scoreDocumentsSql
    s"""WITH pred AS ($langid),
       scored_docs AS ($score),
       j AS (
         SELECT CASE WHEN (pred.pred_lang = 'en')
                       = (d.lang = 'en') THEN 1 ELSE 0 END AS ca,
                CASE WHEN (sd.keep = 1)
                       = (d.lang = 'en') THEN 1 ELSE 0 END AS cb
         FROM documents d
         JOIN pred ON pred.doc_id = d.doc_id
         JOIN scored_docs sd ON sd.doc_id = d.doc_id),
       cells AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(ca * cb) AS BIGINT) AS n11,
                CAST(sum((1 - ca) * (1 - cb)) AS BIGINT) AS n00,
                CAST(sum(ca * (1 - cb)) AS BIGINT) AS n10,
                CAST(sum((1 - ca) * cb) AS BIGINT) AS n01
         FROM j)
       SELECT n, n11, n00, n10, n01,
              CASE WHEN n01 + n10 > 0
                   THEN round(CAST(n01 - n10 AS DOUBLE)
                     * CAST(n01 - n10 AS DOUBLE)
                     / CAST(n01 + n10 AS DOUBLE), 4)
                   ELSE 0.0 END AS chi2
       FROM cells"""
  }

  /** Kolmogorov–Smirnov separation of the quality-model score
    * (the credit-scoring "KS statistic"): max vertical gap between
    * the positive and negative score CDFs — the single-threshold
    * companion to AUC (AUC integrates the separation; KS reports
    * the best ONE cutoff and where it sits, which is what a
    * curation threshold actually uses). Fully integer via cross
    * multiplication: at each distinct score the gap
    * |F₁−F₀| = |cum_pos·n_neg − cum_neg·n_pos|/(n_pos·n_neg) is
    * carried scaled (exact BIGINT), the max is taken on the scaled
    * value with a score tie-break, and the one ppm division happens
    * at the end. Same SCORE-HISTOGRAM domain-sized window family as
    * ml_auc. Headroom: cum·n holds BIGINT to n_pos·n_neg < 9·10¹⁸
    * (≈ 3·10⁹ docs a side).
    */
  def ksSeparationQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    ksSeparationOf(QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score",
        when($"lang" === "en", 1L).otherwise(0L).as("is_pos")))
  }

  /** Core over any (score, is_pos∈{0,1}) frame. */
  def ksSeparationOf(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    val hist = scored.groupBy($"score")
      .agg(sum($"is_pos").as("p"), sum(lit(1L) - $"is_pos").as("q"))
    val upTo = Window.orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = hist.agg(sum($"p").as("n_pos"), sum($"q").as("n_neg"))
    // constant-key groupBy, not a global agg: on an EMPTY scored
    // frame a global aggregate emits one all-NULL row while the
    // oracle's LIMIT-1 CTE joined into the final SELECT emits zero —
    // grouping makes empty→empty on both engines.
    hist.crossJoin(broadcast(totals))
      .withColumn("cum_p", sum($"p").over(upTo))
      .withColumn("cum_q", sum($"q").over(upTo))
      .withColumn("gap_scaled",
        abs($"cum_p" * $"n_neg" - $"cum_q" * $"n_pos"))
      .groupBy(lit(1).as("one"))
      .agg(max($"n_pos").as("n_pos"), max($"n_neg").as("n_neg"),
        max(struct($"gap_scaled", $"score")).as("m"))
      .select($"n_pos", $"n_neg", $"m.score".as("ks_score"),
        $"m.gap_scaled".as("gap_scaled"),
        when($"n_pos" > 0L && $"n_neg" > 0L,
          expr("(m.gap_scaled * 1000000) div (n_pos * n_neg)"))
          .otherwise(0L).as("ks_ppm"))
  }

  val ksSeparationQualitySql: String = {
    val score = QualityModel.scoreDocumentsSql
    s"""WITH scored_docs AS ($score),
       s AS (
         SELECT sd.score,
                CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_pos
         FROM scored_docs sd JOIN documents d ON sd.doc_id = d.doc_id),
       h AS (
         SELECT score, CAST(sum(is_pos) AS BIGINT) AS p,
                CAST(sum(1 - is_pos) AS BIGINT) AS q
         FROM s GROUP BY score),
       t AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                    CAST(sum(q) AS BIGINT) AS n_neg FROM h),
       c AS (
         SELECT score,
                abs(CAST(sum(p) OVER w AS BIGINT) * n_neg
                    - CAST(sum(q) OVER w AS BIGINT) * n_pos)
                  AS gap_scaled
         FROM h, t
         WINDOW w AS (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       best AS (
         SELECT score AS ks_score, gap_scaled
         FROM c ORDER BY gap_scaled DESC, score DESC LIMIT 1)
       SELECT n_pos, n_neg, CAST(ks_score AS BIGINT) AS ks_score,
              gap_scaled,
              CASE WHEN n_pos > 0 AND n_neg > 0
                   THEN CAST((gap_scaled * 1000000) // (n_pos * n_neg)
                     AS BIGINT)
                   ELSE 0 END AS ks_ppm
       FROM best, t"""
  }

  /** Murphy decomposition of the Brier score (Murphy 1973):
    * BRIER = RELIABILITY − RESOLUTION + UNCERTAINTY — one readout
    * that says how much of a scorer's squared error is
    * mis-calibration (REL: forecast level vs realized rate — fixable
    * by recalibration), how much is earned discrimination (RES: the
    * bins separate the base rate), and how much is irreducible class
    * noise (UNC = ō(1−ō)). The quality-model score is min-max
    * normalized ONCE to integer per-mille as the forecast; bins are
    * the DISTINCT forecast values (the condition under which
    * Murphy's identity is exact), so the whole computation runs on
    * the forecast-value histogram — domain-sized, never the corpus.
    * Every accumulator is an exact BIGINT in per-mille² units; bin
    * rates quantized once by floor division (the only deviation from
    * the real-arithmetic identity, bounded by 1 pm per bin).
    * Headroom: Σ n·Δ² ≤ N·10⁶ holds BIGINT to N ≈ 9·10¹² docs.
    */
  def brierDecompositionQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    brierDecompositionOf(QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score", ($"lang" === "en").cast("long").as("o")))
  }

  /** Core over any (score, o∈{0,1}) frame. */
  def brierDecompositionOf(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    val bounds = scored.agg(min($"score").as("mn"), max($"score").as("mx"))
    val cells = scored.crossJoin(broadcast(bounds))
      .select(
        when($"mx" > $"mn",
          expr("((score - mn) * 1000) div (mx - mn)")).otherwise(500L)
          .as("p"),
        $"o")
      .groupBy($"p", $"o").agg(count(lit(1)).as("n_po"))
    val bins = cells.groupBy($"p")
      .agg(sum($"n_po").as("n_p"),
        sum(when($"o" === 1L, $"n_po").otherwise(0L)).as("pos_p"),
        sum($"n_po" * ($"p" - $"o" * 1000L) * ($"p" - $"o" * 1000L))
          .as("brier_num_p"))
      .withColumn("obar_p", expr("(1000 * pos_p) div n_p"))
    val tot = bins.agg(sum($"n_p").as("n"), sum($"pos_p").as("n_pos"))
      .withColumn("o_pm", expr("(1000 * n_pos) div n"))
    bins.crossJoin(broadcast(tot))
      .agg(max($"n").as("n"), max($"n_pos").as("n_pos"),
        max($"o_pm").as("o_pm"),
        sum($"brier_num_p").as("brier_num"),
        sum($"n_p" * ($"p" - $"obar_p") * ($"p" - $"obar_p")).as("rel_num"),
        sum($"n_p" * ($"obar_p" - $"o_pm") * ($"obar_p" - $"o_pm"))
          .as("res_num"))
      .select($"n", $"n_pos", $"o_pm",
        expr("brier_num div n").as("brier_pm2"),
        expr("rel_num div n").as("rel_pm2"),
        expr("res_num div n").as("res_pm2"),
        ($"o_pm" * (lit(1000L) - $"o_pm")).as("unc_pm2"))
  }

  val brierDecompositionQualitySql: String = {
    val score = QualityModel.scoreDocumentsSql
    s"""WITH scored_docs AS ($score),
       s AS (
         SELECT sd.score,
                CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS o
         FROM scored_docs sd JOIN documents d ON sd.doc_id = d.doc_id),
       b AS (SELECT min(score) AS mn, max(score) AS mx FROM s),
       cells AS (
         SELECT CASE WHEN mx > mn THEN ((score - mn) * 1000) // (mx - mn)
                     ELSE 500 END AS p,
                o, CAST(count(*) AS BIGINT) AS n_po
         FROM s, b GROUP BY 1, 2),
       bins AS (
         SELECT p, CAST(sum(n_po) AS BIGINT) AS n_p,
                CAST(sum(CASE WHEN o = 1 THEN n_po ELSE 0 END) AS BIGINT)
                  AS pos_p,
                CAST(sum(n_po * (p - o * 1000) * (p - o * 1000)) AS BIGINT)
                  AS brier_num_p
         FROM cells GROUP BY 1),
       bb AS (
         SELECT p, n_p, pos_p, brier_num_p,
                (1000 * pos_p) // n_p AS obar_p
         FROM bins),
       tot AS (
         SELECT CAST(sum(n_p) AS BIGINT) AS n,
                CAST(sum(pos_p) AS BIGINT) AS n_pos,
                (1000 * CAST(sum(pos_p) AS BIGINT))
                  // CAST(sum(n_p) AS BIGINT) AS o_pm
         FROM bb),
       agg AS (
         SELECT CAST(sum(brier_num_p) AS BIGINT) AS brier_num,
                CAST(sum(n_p * (p - obar_p) * (p - obar_p)) AS BIGINT)
                  AS rel_num,
                CAST(sum(n_p * (obar_p - o_pm) * (obar_p - o_pm)) AS BIGINT)
                  AS res_num
         FROM bb, tot)
       SELECT n, n_pos, CAST(o_pm AS BIGINT) AS o_pm,
              CAST(brier_num // n AS BIGINT) AS brier_pm2,
              CAST(rel_num // n AS BIGINT) AS rel_pm2,
              CAST(res_num // n AS BIGINT) AS res_pm2,
              CAST(o_pm * (1000 - o_pm) AS BIGINT) AS unc_pm2
       FROM agg, tot"""
  }

  /** Split-conformal coverage audit (Papadopoulos et al. 2002; Lei
    * et al. JASA 2018) of the quality-model score: calibrate a
    * distribution-free interval on one deterministic half of the
    * corpus, then measure on the other half whether it covers the
    * promised 1−α = 90 % — the finite-sample-valid counterpart to
    * the Gaussian ±z·σ interval. Nonconformity is the absolute
    * deviation from the calibration mean, carried CROSS-MULTIPLIED
    * (|s·n_cal − Σ_cal| — exact BIGINT, no division), so the
    * quantile q̂ = the ⌈(1−α)(n_cal+1)⌉-th smallest residual is an
    * exact order statistic drawn from the residual VALUE HISTOGRAM
    * by the crossing device, and test-side coverage is an exact
    * integer count against the same scaled q̂ — the gate is 100 %
    * integer. The split rides the portable md5 per-mille bucket
    * ([[graft.operators.Sampling.bucket]], salt "conformal").
    */
  def conformalCoverageQuality(spark: SparkSession, dir: String): DataFrame =
    conformalOf(QualityModel.score(Tables.documents(spark, dir))
      .select(col("doc_id").as("id"), col("score")))

  /** Core over any (id, score) frame; α = 1/10. */
  def conformalOf(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    val b = scored.withColumn("bkt", Sampling.bucket($"id", "conformal"))
    val cal = b.filter($"bkt" < 500)
    val test = b.filter($"bkt" >= 500)
    val stats = cal.agg(count(lit(1)).as("n_cal"), sum($"score").as("s_cal"))
      .withColumn("q_rank",
        least(expr("(9 * (n_cal + 1) + 9) div 10"), $"n_cal"))
    val hist = cal.crossJoin(broadcast(stats))
      .select(abs($"score" * $"n_cal" - $"s_cal").as("r"))
      .groupBy($"r").agg(count(lit(1)).as("cnt"))
    val upTo = Window.orderBy($"r")
      .rowsBetween(Window.unboundedPreceding, 0)
    val q = hist
      .withColumn("cum", sum($"cnt").over(upTo))
      .crossJoin(broadcast(stats))
      .filter($"cum" >= $"q_rank")
      .agg(min($"r").as("q_scaled"))
    test.crossJoin(broadcast(stats)).crossJoin(broadcast(q))
      .select(
        when(abs($"score" * $"n_cal" - $"s_cal") <= $"q_scaled", 1L)
          .otherwise(0L).as("cov"),
        $"n_cal", $"q_rank", $"q_scaled")
      .groupBy($"n_cal", $"q_rank", $"q_scaled")
      .agg(count(lit(1)).as("n_test"), sum($"cov").as("covered"))
      .select($"n_cal", $"n_test", $"q_rank", $"q_scaled", $"covered",
        when($"n_test" > 0L, expr("(covered * 1000000) div n_test"))
          .otherwise(0L).as("coverage_ppm"))
  }

  val conformalCoverageQualitySql: String = {
    val score = QualityModel.scoreDocumentsSql
    val bkt = graft.operators.Sampling.bucketSql("doc_id", "conformal")
    s"""WITH scored_docs AS ($score),
       b AS (SELECT doc_id AS id, score, $bkt AS bkt FROM scored_docs),
       cal AS (SELECT id, score FROM b WHERE bkt < 500),
       tst AS (SELECT id, score FROM b WHERE bkt >= 500),
       stats AS (
         SELECT CAST(count(*) AS BIGINT) AS n_cal,
                CAST(sum(score) AS BIGINT) AS s_cal,
                least((9 * (CAST(count(*) AS BIGINT) + 1) + 9) // 10,
                      CAST(count(*) AS BIGINT)) AS q_rank
         FROM cal),
       hist AS (
         SELECT abs(score * n_cal - s_cal) AS r,
                CAST(count(*) AS BIGINT) AS cnt
         FROM cal, stats GROUP BY 1),
       c AS (
         SELECT r, CAST(sum(cnt) OVER (ORDER BY r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum
         FROM hist),
       q AS (
         SELECT CAST(min(r) AS BIGINT) AS q_scaled
         FROM c, stats WHERE cum >= q_rank),
       covt AS (
         SELECT CAST(count(*) AS BIGINT) AS n_test,
                CAST(sum(CASE WHEN abs(score * n_cal - s_cal) <= q_scaled
                          THEN 1 ELSE 0 END) AS BIGINT) AS covered
         FROM tst, stats, q)
       SELECT n_cal, n_test, q_rank, q_scaled, covered,
              CASE WHEN n_test > 0
                   THEN CAST((covered * 1000000) // n_test AS BIGINT)
                   ELSE 0 END AS coverage_ppm
       FROM covt, stats, q"""
  }

  /** Calibration (reliability) bins of the quality-model score
    * against the binary label — AUC says the ranking is right;
    * calibration says whether the score LEVEL means what it claims,
    * which is what a curation threshold actually consumes. Scores
    * land in `nBins` equal-width bins over the observed [lo, hi]
    * (the one-row bounds broadcast back — integer cross-multiplied
    * binning `(s−lo)·B div (hi−lo+1)`, no fp boundary and no
    * corpus-scale NTILE sort); each bin reports its exact integer
    * mass, score sum, and positive count, with mean score and
    * positive fraction as two pinned rounded divisions. A
    * well-calibrated scorer shows frac_pos monotone in bin.
    */
  def calibrationBins(spark: SparkSession, dir: String,
      nBins: Int = 10): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val scored = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score", when($"lang" === "en", 1L).otherwise(0L).as("is_pos"))
    val bounds = scored.agg(min($"score").as("lo"), max($"score").as("hi"))
    scored.crossJoin(broadcast(bounds))
      .select(expr(s"((score - lo) * $nBins) div (hi - lo + 1)").as("bin"),
        $"score", $"is_pos")
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"score").as("score_sum"),
        sum($"is_pos").as("n_pos"))
      .select($"bin", $"n", $"score_sum", $"n_pos",
        round($"score_sum".cast("double") / $"n".cast("double"), 4)
          .as("mean_score"),
        round($"n_pos".cast("double") / $"n".cast("double"), 4)
          .as("frac_pos"))
      .orderBy($"bin")
  }

  def calibrationBinsSql(nBins: Int = 10): String = {
    val score = QualityModel.scoreDocumentsSql
    s"""WITH scored_docs AS ($score),
       s AS (
         SELECT sd.score,
                CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_pos
         FROM scored_docs sd JOIN documents d ON sd.doc_id = d.doc_id),
       b AS (SELECT min(score) AS lo, max(score) AS hi FROM s),
       binned AS (
         SELECT CAST((score - lo) * $nBins AS BIGINT)
                // (hi - lo + 1) AS bin,
                score, is_pos
         FROM s, b)
       SELECT bin, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(score) AS BIGINT) AS score_sum,
              CAST(sum(is_pos) AS BIGINT) AS n_pos,
              round(CAST(sum(score) AS DOUBLE) / count(*), 4) AS mean_score,
              round(CAST(sum(is_pos) AS DOUBLE) / count(*), 4) AS frac_pos
       FROM binned
       GROUP BY bin ORDER BY bin"""
  }

  /** Isotonic calibration (pool-adjacent-violators — Ayer et al.
    * 1955; Zadrozny & Elkan KDD 2002 as the probability-calibration
    * trainer): the monotone non-decreasing fit of per-bin positive
    * rates, computed NOT by the sequential PAV sweep but by the
    * equivalent minimax identity
    * iso(i) = max_{j≤i} min_{k≥i} avg(j..k) — which is pure
    * relational algebra over the BIN domain, so the oracle restates
    * it verbatim and the gate is hash-exact (the sequential sweep has
    * no SQL spelling; EvaluationSpec proves minimax ≡ PAV pooling).
    *
    * Scale: the corpus collapses to `nBins` rows in the calibration
    * aggregate; every minimax stage is a join on that ≤10-row domain —
    * O(nBins³) work on METADATA, zero additional passes over data.
    */
  def isotonicCalibration(spark: SparkSession, dir: String,
      nBins: Int = 10): DataFrame = {
    import spark.implicits._
    val bins = calibrationBins(spark, dir, nBins)
      .select($"bin", $"n", $"n_pos")
    isotonicOf(bins)
  }

  /** Minimax isotonic fit over any (bin, n, n_pos) frame. */
  def isotonicOf(bins: DataFrame): DataFrame = {
    import bins.sparkSession.implicits._
    val ids = bins.select($"bin".as("b"))
    val seg = ids.select($"b".as("j")).join(ids.select($"b".as("k")),
        $"j" <= $"k")
      .join(bins, $"bin" >= $"j" && $"bin" <= $"k")
      .groupBy($"j", $"k")
      .agg((sum($"n_pos").cast("double") / sum($"n").cast("double"))
        .as("avg_jk"))
    val inner = ids.select($"b".as("i"))
      .join(seg, $"j" <= $"i" && $"i" <= $"k")
      .groupBy($"i", $"j").agg(min($"avg_jk").as("min_k"))
      .groupBy($"i").agg(max($"min_k").as("iso"))
    bins.join(inner, $"bin" === $"i")
      .select($"bin", $"n", $"n_pos", round($"iso", 6).as("iso_rate"))
      .orderBy($"bin")
  }

  def isotonicCalibrationSql(nBins: Int = 10): String = {
    val score = QualityModel.scoreDocumentsSql
    s"""WITH scored_docs AS ($score),
       s AS (
         SELECT sd.score,
                CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_pos
         FROM scored_docs sd JOIN documents d ON sd.doc_id = d.doc_id),
       bnd AS (SELECT min(score) AS lo, max(score) AS hi FROM s),
       binned AS (
         SELECT CAST((score - lo) * $nBins AS BIGINT)
                // (hi - lo + 1) AS bin, is_pos
         FROM s, bnd),
       bins AS (
         SELECT bin, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(is_pos) AS BIGINT) AS n_pos
         FROM binned GROUP BY bin),
       seg AS (
         SELECT j.bin AS j, k.bin AS k,
                CAST(sum(x.n_pos) AS DOUBLE) / CAST(sum(x.n) AS DOUBLE)
                  AS avg_jk
         FROM bins j
         JOIN bins k ON j.bin <= k.bin
         JOIN bins x ON x.bin >= j.bin AND x.bin <= k.bin
         GROUP BY 1, 2),
       inner_min AS (
         SELECT i.bin AS i, seg.j, min(seg.avg_jk) AS min_k
         FROM bins i JOIN seg ON seg.j <= i.bin AND i.bin <= seg.k
         GROUP BY 1, 2),
       iso AS (SELECT i, max(min_k) AS iso FROM inner_min GROUP BY i)
       SELECT b.bin, b.n, b.n_pos, round(iso.iso, 6) AS iso_rate
       FROM bins b JOIN iso ON iso.i = b.bin
       ORDER BY b.bin"""
  }

  /** Multi-feature OLS by normal equations — the canonical
    * distributed-regression shape: ONE map-side-combined aggregate
    * accumulates the Gram moments X'X and X'y (here 2 features +
    * intercept → 10 scalars), and the 3×3 solve is a metadata-scale
    * projection over that single row. The corpus never shuffles and
    * never sorts; at 100 TB the job is one pass + one 10-number
    * reduce, and d features cost O(d²) aggregate state — the same
    * shape MLlib's normal-equation solver uses, restated declaratively.
    *
    * Exactness: features and target are integer-quantized (quantity
    * units, discount basis points, price cents) and every moment is
    * an exact decimal(38,0) sum — order-free, with ~10²⁰ rows of
    * headroom over the worst per-row product (y² ≈ 10¹³). The solve
    * (Cramer) runs in doubles, but BOTH engines evaluate the SAME
    * expression tree over the SAME exact integers, and IEEE ops are
    * deterministic — the formula text below is interpolated into the
    * Spark projection and the DuckDB oracle from one constant.
    */
  def mlLinregNormal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mlLinregNormalOf(Tables.lineitem(spark, dir).select(
      $"l_quantity".cast("long").as("x1"),
      round($"l_discount" * 10000).cast("long").as("x2"),
      round($"l_extendedprice" * 100).cast("long").as("y")))
  }

  /** Core over any (x1, x2, y) integer-quantized frame. */
  def mlLinregNormalOf(d: DataFrame): DataFrame = {
    import d.sparkSession.implicits._
    val moments = d.agg(
      count(lit(1)).as("n"),
      sum($"x1".cast("decimal(38,0)")).as("s1"),
      sum($"x2".cast("decimal(38,0)")).as("s2"),
      sum(($"x1" * $"x1").cast("decimal(38,0)")).as("s11"),
      sum(($"x1" * $"x2").cast("decimal(38,0)")).as("s12"),
      sum(($"x2" * $"x2").cast("decimal(38,0)")).as("s22"),
      sum(($"x1" * $"y").cast("decimal(38,0)")).as("s1y"),
      sum(($"x2" * $"y").cast("decimal(38,0)")).as("s2y"),
      sum($"y".cast("decimal(38,0)")).as("sy"),
      sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
    moments
      .selectExpr(Evaluation.linregDoubleCasts: _*)
      .selectExpr(Evaluation.linregSolve: _*)
      .selectExpr(Evaluation.linregOut: _*)
  }

  /** Stage 1: one double cast per exact moment (deterministic —
    * integer → nearest double on both engines). */
  val linregDoubleCasts: Seq[String] = Seq(
    "CAST(n AS BIGINT) AS n_out", "CAST(n AS DOUBLE) AS nd",
    "CAST(s1 AS DOUBLE) AS d1", "CAST(s2 AS DOUBLE) AS d2",
    "CAST(s11 AS DOUBLE) AS d11", "CAST(s12 AS DOUBLE) AS d12",
    "CAST(s22 AS DOUBLE) AS d22", "CAST(s1y AS DOUBLE) AS d1y",
    "CAST(s2y AS DOUBLE) AS d2y", "CAST(sy AS DOUBLE) AS dy",
    "CAST(syy AS DOUBLE) AS dyy")

  /** Stage 2: Cramer's rule on the 3×3 normal matrix
    * [n s1 s2; s1 s11 s12; s2 s12 s22]·b = [sy s1y s2y]. */
  val linregSolve: Seq[String] = Seq(
    "n_out", "nd", "dy", "dyy", "d1y", "d2y",
    """((dy*(d11*d22 - d12*d12) - d1*(d1y*d22 - d12*d2y)
        + d2*(d1y*d12 - d11*d2y))
       / (nd*(d11*d22 - d12*d12) - d1*(d1*d22 - d12*d2)
          + d2*(d1*d12 - d11*d2))) AS b0""",
    """((nd*(d1y*d22 - d12*d2y) - dy*(d1*d22 - d12*d2)
        + d2*(d1*d2y - d1y*d2))
       / (nd*(d11*d22 - d12*d12) - d1*(d1*d22 - d12*d2)
          + d2*(d1*d12 - d11*d2))) AS b1""",
    """((nd*(d11*d2y - d1y*d12) - d1*(d1*d2y - d1y*d2)
        + dy*(d1*d12 - d11*d2))
       / (nd*(d11*d22 - d12*d12) - d1*(d1*d22 - d12*d2)
          + d2*(d1*d12 - d11*d2))) AS b2""")

  /** Stage 3: betas cents→dollars at the display edge; R² from the
    * unrounded solution via SSE = syy − b·X'y. */
  val linregOut: Seq[String] = Seq(
    "n_out AS n",
    "round(b0 / 100.0, 6) AS beta0",
    "round(b1 / 100.0, 6) AS beta1",
    "round(b2 / 100.0, 6) AS beta2",
    """round(1.0 - (dyy - b0*dy - b1*d1y - b2*d2y)
             / (dyy - dy*dy/nd), 6) AS r2""")

  val mlLinregNormalSql: String = {
    val casts = linregDoubleCasts.mkString(",\n              ")
    val solve = linregSolve.mkString(",\n              ")
    val out = linregOut.mkString(",\n              ")
    s"""WITH m AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS DECIMAL(38,0)) AS s1,
                CAST(sum(CAST(round(l_discount * 10000) AS BIGINT))
                     AS DECIMAL(38,0)) AS s2,
                CAST(sum(CAST(l_quantity AS BIGINT)
                         * CAST(l_quantity AS BIGINT))
                     AS DECIMAL(38,0)) AS s11,
                CAST(sum(CAST(l_quantity AS BIGINT)
                         * CAST(round(l_discount * 10000) AS BIGINT))
                     AS DECIMAL(38,0)) AS s12,
                CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)
                         * CAST(round(l_discount * 10000) AS BIGINT))
                     AS DECIMAL(38,0)) AS s22,
                CAST(sum(CAST(l_quantity AS BIGINT)
                         * CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS DECIMAL(38,0)) AS s1y,
                CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)
                         * CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS DECIMAL(38,0)) AS s2y,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS DECIMAL(38,0)) AS sy,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS DECIMAL(38,0)) AS syy
         FROM lineitem),
       c AS (SELECT $casts FROM m),
       s AS (SELECT $solve FROM c)
       SELECT $out FROM s"""
  }

  /** NDCG@k of the BM25 ranking against a tf-graded relevance proxy
    * — the RANKING-quality readout the retrieval family lacks (AUC
    * scores a classifier, langid_eval a labeler; nothing yet grades
    * an ordered list). Relevance of (query, doc) = total occurrences
    * of the query's terms in the doc, capped at grade 3 (the standard
    * graded-judgment shape when no human labels exist — a pseudo-
    * relevance proxy, documented as such); gain = 2^rel − 1 via a
    * 4-way CASE, no pow. DCG = Σ_r gain·w_r with the rank discounts
    * w_r = round(10⁶/log₂(r+1)) — ten CONSTANTS, identical in both
    * engines — so DCG and IDCG are exact BIGINT micro-unit sums and
    * the one division is pinned. IDCG ranks the SAME relevance table
    * by (rel desc, doc_id): deterministic total order, top-k cut.
    *
    * Scale shape: the relevance table is term-filtered BEFORE any
    * shuffle (only docs containing a query term survive the scan —
    * the bm25 postings posture); the ideal-ranking window partitions
    * by query over that filtered frame, exactly [[Search.bm25TopKOf]]'s
    * own top-k shape; the DCG join is k-sized metadata.
    */
  def ndcgBm25(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    ndcgBm25Of(spark, Tables.documents(spark, dir), Search.bm25Workload, k)

  /** NDCG core over any (doc_id, text) frame and workload — lets
    * specs assert ranking-metric behavior on crafted corpora through
    * the real code path.
    */
  def ndcgBm25Of(spark: SparkSession, docs: DataFrame,
      workload: Seq[(String, Seq[String])], k: Int): DataFrame = {
    import spark.implicits._
    val retrieved = Search.bm25TopKOf(spark, docs, workload, k)
      .select($"query_id", $"doc_id", $"rk")
    val allTerms = workload.flatMap(_._2).distinct
    val queryTerms = workload
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "token")
    val rel = docs
      .select($"doc_id", explode(split(trim($"text"), " ")).as("raw"))
      .select($"doc_id", trim($"raw").as("token"))
      .filter(length($"token") > 0)
      .filter($"token".isin(allTerms.map(lit): _*))
      .join(broadcast(queryTerms), "token")
      .groupBy($"query_id", $"doc_id")
      .agg(least(sum(lit(1L)), lit(3L)).as("rel"))
      .withColumn("gain", when($"rel" === 1L, 1L)
        .when($"rel" === 2L, 3L).when($"rel" >= 3L, 7L).otherwise(0L))
    def w(r: Column): Column = {
      // round(1e6 / log2(r+1)) for r in 1..k — constant per rank
      round(lit(1.0e6) / log2(r.cast("double") + lit(1.0))).cast("long")
    }
    val dcg = retrieved
      .join(rel, Seq("query_id", "doc_id"), "left")
      .groupBy($"query_id")
      .agg(sum(coalesce($"gain", lit(0L)) * w($"rk")).as("dcg_micro"))
    val wIdeal = Window.partitionBy($"query_id")
      .orderBy($"rel".desc, $"doc_id")
    val idcg = rel.filter($"rel" > 0L)
      .withColumn("irk", row_number().over(wIdeal).cast("long"))
      .filter($"irk" <= k)
      .groupBy($"query_id")
      .agg(count(lit(1)).as("n_rel_topk"),
        sum($"gain" * w($"irk")).as("idcg_micro"))
    dcg.join(idcg, Seq("query_id"))
      .select($"query_id", $"n_rel_topk", $"dcg_micro", $"idcg_micro",
        round($"dcg_micro".cast("double") / $"idcg_micro".cast("double"), 6)
          .as("ndcg"))
      .orderBy($"query_id")
  }

  /** MRR + precision/recall@k of the BM25 ranking against the same
    * tf-graded pseudo-relevance as [[ndcgBm25]] — the binary-judgment
    * half of the retrieval eval (NDCG reads graded gains; MRR/P@k/R@k
    * read "is it relevant at all", which is what a recall-oriented
    * RAG retriever is actually tuned on). ENTIRELY integer: the
    * reciprocal rank is `10⁶ div first_rank`, precision and recall
    * are ppm ratios of exact counts — no fp anywhere, not even
    * pinned.
    */
  def mrrBm25(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    mrrBm25Of(spark, Tables.documents(spark, dir), Search.bm25Workload, k)

  /** MRR core over any (doc_id, text) frame and workload. */
  def mrrBm25Of(spark: SparkSession, docs: DataFrame,
      workload: Seq[(String, Seq[String])], k: Int): DataFrame = {
    import spark.implicits._
    val retrieved = Search.bm25TopKOf(spark, docs, workload, k)
      .select($"query_id", $"doc_id", $"rk")
    val allTerms = workload.flatMap(_._2).distinct
    val queryTerms = workload
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "token")
    val rel = docs
      .select($"doc_id", explode(split(trim($"text"), " ")).as("raw"))
      .select($"doc_id", trim($"raw").as("token"))
      .filter(length($"token") > 0)
      .filter($"token".isin(allTerms.map(lit): _*))
      .join(broadcast(queryTerms), "token")
      .groupBy($"query_id", $"doc_id")
      .agg(count(lit(1)).as("matches"))
      // binary judgment = graded proxy at grade ≥ 2: merely MENTIONING
      // a term once is not relevance, and the threshold is what lets
      // a retrieved-but-irrelevant doc push first_rel_rank past 1
      .filter($"matches" >= 2L)
      .select($"query_id", $"doc_id")
    val nRel = rel.groupBy($"query_id").agg(count(lit(1)).as("n_rel"))
    retrieved
      .join(rel.withColumn("hit", lit(1L)), Seq("query_id", "doc_id"), "left")
      .groupBy($"query_id")
      .agg(min(when($"hit" === 1L, $"rk")).as("first_rel_rank"),
        sum(coalesce($"hit", lit(0L))).as("hits_at_k"))
      .join(nRel, Seq("query_id"))
      .select($"query_id",
        coalesce($"first_rel_rank", lit(0L)).as("first_rel_rank"),
        $"hits_at_k", $"n_rel",
        // CASE-guarded: div-by-zero would throw under ANSI when a
        // query has no relevant doc in the top k
        when(coalesce($"first_rel_rank", lit(0L)) > 0L,
          expr("1000000 div first_rel_rank")).otherwise(0L).as("rr_ppm"),
        expr(s"(hits_at_k * 1000000) div $k").as("p_at_k_ppm"),
        expr("(hits_at_k * 1000000) div n_rel").as("r_at_k_ppm"))
      .orderBy($"query_id")
  }

  def mrrBm25Sql(k: Int = 10): String = {
    val bm = Search.bm25TopKSql(k)
    val qvals = Search.bm25Workload
      .flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    s"""WITH bm AS (SELECT query_id, doc_id, rk FROM ($bm)),
       q(query_id, token) AS (VALUES $qvals),
       tok AS (
         SELECT doc_id,
                unnest(list_filter(
                  list_transform(string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS token
         FROM documents),
       rel AS (
         SELECT q.query_id, tok.doc_id
         FROM tok JOIN q ON q.token = tok.token
         GROUP BY 1, 2 HAVING count(*) >= 2),
       nr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
              FROM rel GROUP BY 1),
       a AS (
         SELECT bm.query_id,
                CAST(coalesce(min(CASE WHEN rel.doc_id IS NOT NULL
                  THEN bm.rk END), 0) AS BIGINT) AS first_rel_rank,
                CAST(sum(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits_at_k
         FROM bm LEFT JOIN rel
           ON rel.query_id = bm.query_id AND rel.doc_id = bm.doc_id
         GROUP BY 1)
       SELECT a.query_id AS query_id, first_rel_rank, hits_at_k, n_rel,
              CAST(CASE WHEN first_rel_rank > 0
                   THEN 1000000 // first_rel_rank ELSE 0 END AS BIGINT)
                AS rr_ppm,
              CAST((hits_at_k * 1000000) // $k AS BIGINT) AS p_at_k_ppm,
              CAST((hits_at_k * 1000000) // n_rel AS BIGINT) AS r_at_k_ppm
       FROM a JOIN nr ON nr.query_id = a.query_id
       ORDER BY a.query_id"""
  }

  def ndcgBm25Sql(k: Int = 10): String = {
    val bm = Search.bm25TopKSql(k)
    val qvals = Search.bm25Workload
      .flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    s"""WITH bm AS (SELECT query_id, doc_id, rk FROM ($bm)),
       q(query_id, token) AS (VALUES $qvals),
       tok AS (
         SELECT doc_id,
                unnest(list_filter(
                  list_transform(string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS token
         FROM documents),
       rel AS (
         SELECT q.query_id, tok.doc_id,
                CASE WHEN count(*) >= 3 THEN 3 ELSE count(*) END AS rel
         FROM tok JOIN q ON q.token = tok.token
         GROUP BY 1, 2),
       g AS (
         SELECT query_id, doc_id, rel,
                CASE rel WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END AS gain
         FROM rel WHERE rel > 0),
       dcg AS (
         SELECT bm.query_id,
                CAST(sum(coalesce(g.gain, 0)
                  * CAST(round(1000000.0 / log2(CAST(bm.rk AS DOUBLE) + 1.0))
                    AS BIGINT)) AS BIGINT) AS dcg_micro
         FROM bm LEFT JOIN g
           ON g.query_id = bm.query_id AND g.doc_id = bm.doc_id
         GROUP BY 1),
       ideal AS (
         SELECT query_id, gain,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY rel DESC, doc_id) AS BIGINT) AS irk
         FROM g),
       idcg AS (
         SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel_topk,
                CAST(sum(gain
                  * CAST(round(1000000.0 / log2(CAST(irk AS DOUBLE) + 1.0))
                    AS BIGINT)) AS BIGINT) AS idcg_micro
         FROM ideal WHERE irk <= $k GROUP BY 1)
       SELECT dcg.query_id AS query_id, n_rel_topk, dcg_micro, idcg_micro,
              round(CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE), 6)
                AS ndcg
       FROM dcg JOIN idcg ON idcg.query_id = dcg.query_id
       ORDER BY dcg.query_id"""
  }
}
