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
}
