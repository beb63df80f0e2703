package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
