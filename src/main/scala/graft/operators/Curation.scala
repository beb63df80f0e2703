package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gopher-style document filter bundle (Rae et al. 2021 §A1.1): the
  * cheap rule battery a curation pipeline applies before any
  * near-dup or model-based scoring. One pass of column expressions
  * over the scan — zero shuffles; at 100 TB the filter runs at
  * parquet-read speed and its selectivity feeds straight into the
  * downstream operators' input size.
  *
  * Every ratio rule is evaluated in cross-multiplied INTEGER
  * arithmetic (`sum_len >= 4*n` rather than `sum_len/n >= 4.0`), so
  * rule booleans are exact in both engines — no fp threshold can
  * disagree on a boundary doc. The displayed ratio columns are
  * round-4 doubles for humans; the booleans don't read them.
  */
object Curation {

  val stopWords = Seq("the", "a", "or", "and", "of")

  /** Rules (bounds tuned so the synthetic corpus genuinely mixes
    * keep/drop; the shape, not the constants, is the operator):
    *   ok_len    n_tokens in [30, 5000]
    *   ok_wl     mean word length in [4, 10]
    *   ok_alpha  ≥ 80% of tokens contain a letter
    *   ok_stop   ≥ 2 stop-word hits
    *   keep      all of the above
    */
  def gopherFilter(spark: SparkSession, dir: String): DataFrame =
    gopherFilterOf(spark, Tables.documents(spark, dir))

  /** Same rules over any (doc_id, text) frame — lets specs drive
    * boundary docs (exactly-30-token, exactly-mean-4) through the
    * real code path.
    */
  def gopherFilterOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val toks = Dedup.tokensCol($"text")
    docs
      .select($"doc_id",
        size(toks).cast("long").as("n"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("sum_len"),
        size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long").as("n_alpha"),
        size(filter(toks, t => t.isin(stopWords.map(lit): _*)))
          .cast("long").as("stop_hits"))
      .select($"doc_id",
        $"n".as("n_tokens"),
        when($"n" > 0, round($"sum_len".cast("double") / $"n", 4))
          .otherwise(0.0).as("mean_wl"),
        $"stop_hits",
        when($"n" >= 30 && $"n" <= 5000, 1L).otherwise(0L).as("ok_len"),
        when($"sum_len" >= lit(4L) * $"n" && $"sum_len" <= lit(10L) * $"n"
          && $"n" > 0, 1L).otherwise(0L).as("ok_wl"),
        when(lit(5L) * $"n_alpha" >= lit(4L) * $"n" && $"n" > 0, 1L)
          .otherwise(0L).as("ok_alpha"),
        when($"stop_hits" >= 2, 1L).otherwise(0L).as("ok_stop"))
      .withColumn("keep",
        when($"ok_len" + $"ok_wl" + $"ok_alpha" + $"ok_stop" === 4L, 1L)
          .otherwise(0L))
  }

  /** #36f global quantile cut: keep documents whose token count lies
    * within the corpus's [p10, p90] band — the distribution-RELATIVE
    * filter (trim both tails) that complements [[gopherFilter]]'s
    * absolute thresholds; the same shape curates any per-doc score.
    *
    * Exact distributed percentile WITHOUT sorting the corpus: one
    * partial-agg'd groupBy collapses the scan to a value histogram
    * (one row per distinct token count — bounded by max doc length,
    * orders smaller than the corpus), a running-count window over
    * that aggregate locates the threshold values, and the two-value
    * threshold row broadcasts back onto the scan. The histogram
    * window is unpartitioned by construction and exempt in
    * WindowAuditSpec with that justification. All rank arithmetic is
    * integer cross-multiplied (`cum*den >= total*num` ⟺
    * `cum >= ceil(total*q)` for the smallest such value) — no fp
    * rank can disagree on a boundary value.
    */
  def quantileCut(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    quantileCutOf(Tables.documents(spark, dir)
      .select($"doc_id",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens")),
      "n_tokens", loNum = 1, loDen = 10, hiNum = 9, hiDen = 10)
  }

  /** The cut over any (id, value) frame with rational bounds
    * lo = loNum/loDen, hi = hiNum/hiDen: keep rows with
    * loVal <= value <= hiVal where qVal = min{v : cum(v) ≥ ceil(q·n)}.
    */
  def quantileCutOf(scored: DataFrame, valueCol: String,
      loNum: Long, loDen: Long, hiNum: Long, hiDen: Long): DataFrame = {
    import scored.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol)
    val hist = scored.groupBy(v.as("v")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val thr = hist
      .withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("total", sum($"cnt").over(wAll))
      .agg(
        min(when($"cum" * loDen >= $"total" * loNum, $"v")).as("lo_val"),
        min(when($"cum" * hiDen >= $"total" * hiNum, $"v")).as("hi_val"))
    scored.crossJoin(broadcast(thr))
      .filter(v.between($"lo_val", $"hi_val"))
      .select(scored.columns.map(col): _*)
  }

  /** #36g per-group quantile cut: the same [p10, p90] band computed
    * WITHIN each language — a long Chinese doc and a long German doc
    * face their own language's distribution, not a global one skewed
    * by whichever language dominates the crawl. Same
    * histogram-then-rank shape as [[quantileCutOf]] but every window
    * is PARTITIONED by the group key (no unpartitioned-window
    * exemption needed); the per-group threshold frame is
    * group-count-sized and broadcasts back onto the scan.
    */
  def quantileCutByLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    quantileCutByOf(Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens")),
      "lang", "n_tokens", loNum = 1, loDen = 10, hiNum = 9, hiDen = 10)
  }

  def quantileCutByOf(scored: DataFrame, keyCol: String, valueCol: String,
      loNum: Long, loDen: Long, hiNum: Long, hiDen: Long): DataFrame = {
    import scored.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val (k, v) = (col(keyCol), col(valueCol))
    val hist = scored.groupBy(k.as("k"), v.as("v")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"k").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"k")
    val thr = hist
      .withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("total", sum($"cnt").over(wAll))
      .groupBy($"k")
      .agg(
        min(when($"cum" * loDen >= $"total" * loNum, $"v")).as("lo_val"),
        min(when($"cum" * hiDen >= $"total" * hiNum, $"v")).as("hi_val"))
    scored.join(broadcast(thr), k === $"k")
      .filter(v.between($"lo_val", $"hi_val"))
      .select(scored.columns.map(col): _*)
  }

  val quantileCutByLangSql: String =
    """WITH scored AS (
         SELECT doc_id, lang,
                CAST(len(list_filter(list_transform(string_split(trim(text), ' '),
                       x -> trim(x)), x -> length(x) > 0)) AS BIGINT) AS n_tokens
         FROM documents),
       hist AS (
         SELECT lang AS k, n_tokens AS v, count(*) AS cnt
         FROM scored GROUP BY k, v),
       cum AS (
         SELECT k, v,
                CAST(sum(cnt) OVER (PARTITION BY k ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                CAST(sum(cnt) OVER (PARTITION BY k) AS BIGINT) AS total
         FROM hist),
       thr AS (
         SELECT k, min(CASE WHEN cum * 10 >= total * 1 THEN v END) AS lo_val,
                min(CASE WHEN cum * 10 >= total * 9 THEN v END) AS hi_val
         FROM cum GROUP BY k)
       SELECT doc_id, lang, n_tokens
       FROM scored JOIN thr ON scored.lang = thr.k
       WHERE n_tokens BETWEEN lo_val AND hi_val"""

  /** The one-pass sketch path for the same cut: thresholds from
    * `percentile_approx` instead of the exact histogram — for when
    * even the value histogram is too wide to be "aggregate-sized"
    * (real-valued model scores over a 100 TB corpus). Rank error is
    * ≤ n/accuracy; CurationSpec pins the approx path to the exact
    * one on integer data at tight accuracy.
    */
  def quantileCutApproxOf(scored: DataFrame, valueCol: String,
      lo: Double, hi: Double, accuracy: Int = 100000): DataFrame = {
    import scored.sparkSession.implicits._
    val v = col(valueCol)
    val thr = scored.agg(
      percentile_approx(v, lit(lo), lit(accuracy)).as("lo_val"),
      percentile_approx(v, lit(hi), lit(accuracy)).as("hi_val"))
    scored.crossJoin(broadcast(thr))
      .filter(v.between($"lo_val", $"hi_val"))
      .select(scored.columns.map(col): _*)
  }

  /** #36k winsorization: instead of DROPPING the tails like
    * [[quantileCutByOf]], CLAMP values into the per-group [p10, p90]
    * band — the robust-statistics treatment when every document must
    * survive (a dedup key, a mixture weight) but outliers may not
    * dominate a sum. Identical threshold machinery (integer
    * cross-multiplied histogram ranks, group-count-sized frame
    * broadcast back), then an integer clamp and one hash aggregate —
    * the clamp itself adds zero exchanges.
    */
  def winsorizeByLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    winsorizeByOf(Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens")),
      "lang", "n_tokens", loNum = 1, loDen = 10, hiNum = 9, hiDen = 10)
  }

  def winsorizeByOf(scored: DataFrame, keyCol: String, valueCol: String,
      loNum: Long, loDen: Long, hiNum: Long, hiDen: Long): DataFrame = {
    import scored.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val (k, v) = (col(keyCol), col(valueCol))
    val hist = scored.groupBy(k.as("k"), v.as("v")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"k").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"k")
    val thr = hist
      .withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("total", sum($"cnt").over(wAll))
      .groupBy($"k")
      .agg(
        min(when($"cum" * loDen >= $"total" * loNum, $"v")).as("lo_val"),
        min(when($"cum" * hiDen >= $"total" * hiNum, $"v")).as("hi_val"))
    scored.join(broadcast(thr), k === $"k")
      .withColumn("w", greatest(least(v, $"hi_val"), $"lo_val"))
      .groupBy(k)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(v < $"lo_val", 1L).otherwise(0L)).as("clamped_lo"),
        sum(when(v > $"hi_val", 1L).otherwise(0L)).as("clamped_hi"),
        sum($"w").as("sum_winsorized"))
      .orderBy(k)
  }

  val winsorizeByLangSql: String =
    """WITH scored AS (
         SELECT doc_id, lang,
                CAST(len(list_filter(list_transform(string_split(trim(text), ' '),
                       x -> trim(x)), x -> length(x) > 0)) AS BIGINT) AS n_tokens
         FROM documents),
       hist AS (
         SELECT lang AS k, n_tokens AS v, count(*) AS cnt
         FROM scored GROUP BY k, v),
       cum AS (
         SELECT k, v,
                CAST(sum(cnt) OVER (PARTITION BY k ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                CAST(sum(cnt) OVER (PARTITION BY k) AS BIGINT) AS total
         FROM hist),
       thr AS (
         SELECT k, min(CASE WHEN cum * 10 >= total * 1 THEN v END) AS lo_val,
                min(CASE WHEN cum * 10 >= total * 9 THEN v END) AS hi_val
         FROM cum GROUP BY k)
       SELECT lang, count(*) AS n_docs,
              CAST(sum(CASE WHEN n_tokens < lo_val THEN 1 ELSE 0 END)
                   AS BIGINT) AS clamped_lo,
              CAST(sum(CASE WHEN n_tokens > hi_val THEN 1 ELSE 0 END)
                   AS BIGINT) AS clamped_hi,
              CAST(sum(greatest(least(n_tokens, hi_val), lo_val))
                   AS BIGINT) AS sum_winsorized
       FROM scored JOIN thr ON scored.lang = thr.k
       GROUP BY lang ORDER BY lang"""

  val quantileCutSql: String =
    """WITH scored AS (
         SELECT doc_id,
                CAST(len(list_filter(list_transform(string_split(trim(text), ' '),
                       x -> trim(x)), x -> length(x) > 0)) AS BIGINT) AS n_tokens
         FROM documents),
       hist AS (
         SELECT n_tokens AS v, count(*) AS cnt FROM scored GROUP BY v),
       cum AS (
         SELECT v,
                CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                CAST(sum(cnt) OVER () AS BIGINT) AS total
         FROM hist),
       thr AS (
         SELECT min(CASE WHEN cum * 10 >= total * 1 THEN v END) AS lo_val,
                min(CASE WHEN cum * 10 >= total * 9 THEN v END) AS hi_val
         FROM cum)
       SELECT doc_id, n_tokens
       FROM scored, thr WHERE n_tokens BETWEEN lo_val AND hi_val"""

  val gopherFilterSql: String = {
    val stopIn = stopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(trim(text), ' '),
                             x -> trim(x)), x -> length(x) > 0) AS toks
          FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n,
                 list_reduce(list_prepend(0::BIGINT,
                   list_transform(toks, x -> CAST(length(x) AS BIGINT))),
                   (a, b) -> a + b) AS sum_len,
                 CAST(len(list_filter(toks,
                   x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
                 CAST(len(list_filter(toks, x -> x IN ($stopIn))) AS BIGINT)
                   AS stop_hits
          FROM t),
        r AS (
          SELECT doc_id, n AS n_tokens,
                 CASE WHEN n > 0 THEN round(sum_len * 1.0 / n, 4)
                      ELSE 0.0 END AS mean_wl,
                 stop_hits,
                 CASE WHEN n >= 30 AND n <= 5000 THEN 1 ELSE 0 END AS ok_len,
                 CASE WHEN sum_len >= 4 * n AND sum_len <= 10 * n AND n > 0
                      THEN 1 ELSE 0 END AS ok_wl,
                 CASE WHEN 5 * n_alpha >= 4 * n AND n > 0 THEN 1 ELSE 0 END
                   AS ok_alpha,
                 CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS ok_stop
          FROM m)
        SELECT doc_id, n_tokens, mean_wl, stop_hits,
               CAST(ok_len AS BIGINT) AS ok_len,
               CAST(ok_wl AS BIGINT) AS ok_wl,
               CAST(ok_alpha AS BIGINT) AS ok_alpha,
               CAST(ok_stop AS BIGINT) AS ok_stop,
               CAST(CASE WHEN ok_len + ok_wl + ok_alpha + ok_stop = 4
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM r"""
  }

  /** Quantile normalization of quality scores across sources
    * (Bolstad et al. 2003, the microarray standard, here as the
    * cross-source score calibrator: a threshold learned on one
    * source's score scale transfers to every other source once each
    * source's distribution is mapped onto the GLOBAL quantiles).
    * Each doc's score becomes the global value at its within-source
    * quantile: target global rank t = ⌈r·N/n⌉ (exact integers), and
    * the value at rank t comes from the score VALUE HISTOGRAM's
    * cumulative frame — domain-sized, the olap_ks_test exemption
    * family — via a broadcast range join on [cum−cnt+1, cum]. The
    * corpus-sized ranking window is PARTITIONED by source; nothing
    * corpus-sized is globally sorted.
    */
  def qnormScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val s = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .select($"doc_id", $"source", $"score")
    val ranked = s
      .withColumn("r", row_number().over(
        Window.partitionBy($"source").orderBy($"score", $"doc_id")).cast("long"))
    val perSource = s.groupBy($"source").agg(count(lit(1)).as("n_src"))
    val total = s.agg(count(lit(1)).as("n_all"))
    val hist = s.groupBy($"score".as("gv"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(
        Window.orderBy($"gv").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    ranked
      .join(broadcast(perSource), "source")
      .crossJoin(broadcast(total))
      .withColumn("t", expr("(r * n_all + n_src - 1) div n_src"))
      .join(broadcast(hist), $"t" >= $"cum" - $"cnt" + 1 && $"t" <= $"cum")
      .select($"doc_id", $"source", $"score", $"gv".as("qnorm_score"))
      .orderBy($"doc_id")
  }

  def qnormScoresSql: String = {
    val score = QualityModel.scoreDocumentsSql
    s"""WITH scored_docs AS ($score),
       s AS (
         SELECT sd.doc_id, d.source, sd.score
         FROM scored_docs sd JOIN documents d ON sd.doc_id = d.doc_id),
       ranked AS (
         SELECT doc_id, source, score,
                CAST(row_number() OVER (PARTITION BY source
                  ORDER BY score, doc_id) AS BIGINT) AS r
         FROM s),
       per_source AS (
         SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM s GROUP BY 1),
       total AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM s),
       hist AS (
         SELECT gv, cnt,
                CAST(sum(cnt) OVER (ORDER BY gv) AS BIGINT) AS cum
         FROM (SELECT score AS gv, CAST(count(*) AS BIGINT) AS cnt
               FROM s GROUP BY 1)),
       t AS (
         SELECT r.doc_id, r.source, r.score,
                (r.r * total.n_all + p.n_src - 1) // p.n_src AS t
         FROM ranked r JOIN per_source p ON p.source = r.source, total)
       SELECT t.doc_id, t.source, t.score, h.gv AS qnorm_score
       FROM t JOIN hist h ON t.t >= h.cum - h.cnt + 1 AND t.t <= h.cum
       ORDER BY t.doc_id"""
  }

}
