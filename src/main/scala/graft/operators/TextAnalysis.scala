package graft.operators

import graft.Tables
import graft.functions.RollingHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #35-38 text-analysis operators for corpus curation: language ID,
  * quality scoring, token counting, document fingerprinting. All are
  * single-pass column expressions over the document scan — at 100 TB
  * these run at parquet-read speed with zero shuffles.
  */
object TextAnalysis {

  /** Marker vocabularies for the n-gram/stopword language heuristic.
    * Order is the deterministic tie-break (first wins on equal
    * score). NOTE: the synthetic testdata draws every doc from one
    * shared vocabulary and assigns `lang` labels randomly, so NO
    * marker set can beat chance there — `is_match` (~0.16 ≈ 1/5)
    * measures that honestly. What the gate validates is the operator
    * shape (per-class marker scoring, argmax, fixed tie-break —
    * exactly a real stopword-profile langid); swap the marker lists
    * for real profiles (e.g. most-frequent-words per language) on a
    * real corpus.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "or"),
    "de" -> Seq("data", "row", "table"),
    "es" -> Seq("join", "merge", "part"),
    "fr" -> Seq("fast", "slow", "small"),
    "zh" -> Seq("spark", "stream", "batch"))

  private def markerHits(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => t.isin(markers.map(lit): _*)))

  /** #35 language ID: argmax of marker-word hits, declared order as
    * tie-break.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Dedup.tokensCol($"text")
    val cols = Seq($"doc_id", $"lang") ++
      langMarkers.map { case (l, m) => markerHits(toks, m).as(s"s_$l") }
    val scored = Tables.documents(spark, dir).select(cols: _*)
    val best = langMarkers.map(_._1).map(l => col(s"s_$l"))
      .reduce((a, b) => greatest(a, b))
    val pred = langMarkers.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    scored.select($"doc_id", pred.as("pred_lang"),
      when($"lang" === pred, 1L).otherwise(0L).as("is_match"))
  }

  val langIdSql: String = {
    val toks =
      """list_filter(list_transform(string_split(trim(text), ' '), x -> trim(x)),
         x -> length(x) > 0)"""
    val scores = langMarkers.map { case (l, m) =>
      val in = m.map(w => s"'$w'").mkString(", ")
      s"len(list_filter($toks, t -> t IN ($in))) AS s_$l"
    }.mkString(", ")
    val best = "greatest(" + langMarkers.map(l => s"s_${l._1}").mkString(", ") + ")"
    val pred = langMarkers.foldRight("'und'") { case ((l, _), acc) =>
      s"CASE WHEN s_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH scored AS (SELECT doc_id, lang, $scores FROM documents),
        withbest AS (SELECT *, $best AS best FROM scored)
        SELECT doc_id, $pred AS pred_lang,
               CASE WHEN lang = $pred THEN 1 ELSE 0 END AS is_match
        FROM withbest"""
  }

  /** Sentence segmentation census: per document, the sentence count
    * and length profile from a terminator-greedy split — the
    * structural signal sentence-level curation (fluency windows,
    * citation density, max-run filters) keys on. The pattern
    * `[^.!?]+[.!?]*` deliberately avoids lookbehind (Java regex has
    * it, DuckDB's RE2 does not — parity chooses the common subset);
    * each match is one sentence with its terminators attached,
    * trimmed, empties dropped. Lengths are integers and the mean is
    * floor-divided — zero shuffle, zero fp, one scan.
    */
  def sentenceStats(spark: SparkSession, dir: String): DataFrame =
    sentenceStatsOf(Tables.documents(spark, dir))

  def sentenceStatsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id",
        expr("""filter(transform(
                  regexp_extract_all(text, '[^.!?]+[.!?]*', 0),
                  s -> trim(s)), s -> length(s) > 0)""").as("sents"))
      .select($"doc_id",
        size($"sents").cast("long").as("n_sentences"),
        expr("""CASE WHEN size(sents) = 0 THEN 0L
                ELSE aggregate(sents, 0L, (a, s) -> a + length(s))
                     div size(sents) END""").as("mean_chars"),
        expr("""CASE WHEN size(sents) = 0 THEN 0L
                ELSE aggregate(sents, 0L,
                       (a, s) -> greatest(a, CAST(length(s) AS BIGINT)))
                END""").as("max_chars"))
      .orderBy($"doc_id")
  }

  val sentenceStatsSql: String =
    """WITH s AS (
         SELECT doc_id,
                list_filter(list_transform(
                  regexp_extract_all(text, '[^.!?]+[.!?]*'),
                  x -> trim(x)), x -> length(x) > 0) AS sents
         FROM documents)
       SELECT doc_id,
              CAST(len(sents) AS BIGINT) AS n_sentences,
              CASE WHEN len(sents) = 0 THEN 0
                   ELSE CAST(list_sum(list_transform(sents,
                          x -> length(x))) AS BIGINT) // len(sents) END
                AS mean_chars,
              CASE WHEN len(sents) = 0 THEN 0
                   ELSE CAST(list_max(list_transform(sents,
                          x -> length(x))) AS BIGINT) END AS max_chars
       FROM s ORDER BY doc_id"""

  /** Classifier evaluation harness over [[langId]]: per-class
    * precision / recall / F1 against the stored gold label — the
    * measurement loop every filter model in a data pipeline owes its
    * operators (a language filter you can't score is a liability at
    * 100 TB, where a few points of recall are billions of tokens).
    * All metrics are integer ppm by floor division off exact
    * confusion-cell counts — tp·10⁶ div pred_n / div gold_n, F1 =
    * (2·p·r) div (p+r) on the ppm values — so the gate hash-matches
    * across engines with no fp anywhere. Classes are the GOLD label
    * set; a class never predicted reports precision 0 (its pred_n
    * guard), which is the honest degenerate. Cells are a
    * |classes|²-bounded aggregate; margins join back broadcast-size.
    */
  def langIdEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gold = Tables.documents(spark, dir).select($"doc_id", $"lang")
    val cells = langId(spark, dir)
      .join(gold, "doc_id")
      .groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n"))
    val byGold = cells.groupBy($"lang")
      .agg(sum($"n").as("gold_n"),
        sum(when($"pred_lang" === $"lang", $"n").otherwise(0L)).as("tp"))
    val byPred = cells.groupBy($"pred_lang".as("lang"))
      .agg(sum($"n").as("pred_n"))
    byGold.join(byPred, Seq("lang"), "left")
      .withColumn("pred_n", coalesce($"pred_n", lit(0L)))
      .withColumn("precision_ppm", expr(
        "CASE WHEN pred_n = 0 THEN 0 ELSE (tp * 1000000L) div pred_n END"))
      .withColumn("recall_ppm", expr("(tp * 1000000L) div gold_n"))
      .withColumn("f1_ppm", expr(
        """CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
           ELSE (2 * precision_ppm * recall_ppm)
                div (precision_ppm + recall_ppm) END"""))
      .select($"lang", $"gold_n", $"pred_n", $"tp",
        $"precision_ppm", $"recall_ppm", $"f1_ppm")
      .orderBy($"lang")
  }

  val langIdEvalSql: String = {
    val toks =
      """list_filter(list_transform(string_split(trim(text), ' '), x -> trim(x)),
         x -> length(x) > 0)"""
    val scores = langMarkers.map { case (l, m) =>
      val in = m.map(w => s"'$w'").mkString(", ")
      s"len(list_filter($toks, t -> t IN ($in))) AS s_$l"
    }.mkString(", ")
    val best = "greatest(" + langMarkers.map(l => s"s_${l._1}").mkString(", ") + ")"
    val pred = langMarkers.foldRight("'und'") { case ((l, _), acc) =>
      s"CASE WHEN s_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH scored AS (SELECT doc_id, lang, $scores FROM documents),
        withbest AS (SELECT *, $best AS best FROM scored),
        p AS (SELECT lang, $pred AS pred_lang FROM withbest),
        cells AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
                  FROM p GROUP BY 1, 2),
        bygold AS (
          SELECT lang, CAST(sum(n) AS BIGINT) AS gold_n,
                 CAST(sum(CASE WHEN pred_lang = lang THEN n ELSE 0 END)
                   AS BIGINT) AS tp
          FROM cells GROUP BY 1),
        bypred AS (
          SELECT pred_lang AS lang, CAST(sum(n) AS BIGINT) AS pred_n
          FROM cells GROUP BY 1),
        m AS (
          SELECT g.lang, g.gold_n,
                 CAST(coalesce(p2.pred_n, 0) AS BIGINT) AS pred_n, g.tp
          FROM bygold g LEFT JOIN bypred p2 USING (lang)),
        r AS (
          SELECT *,
                 CASE WHEN pred_n = 0 THEN 0
                      ELSE (tp * 1000000) // pred_n END AS precision_ppm,
                 (tp * 1000000) // gold_n AS recall_ppm
          FROM m)
        SELECT lang, gold_n, pred_n, tp, precision_ppm, recall_ppm,
               CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
                    ELSE (2 * precision_ppm * recall_ppm)
                         // (precision_ppm + recall_ppm) END AS f1_ppm
        FROM r ORDER BY lang"""
  }

  /** #36 quality score: length/stopword/word-shape signals combined
    * into [0,1]. Weights are arbitrary but fixed; the operator shape
    * (single-pass, no shuffle) is the point.
    */
  /** #36b text cleaning: the normalization pass a curation pipeline
    * runs before hashing/scoring — strip URLs and e-mail addresses,
    * collapse whitespace runs, trim. Pure codegen regexp_replace
    * chain; identical regex semantics in the DuckDB oracle.
    */
  def clean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val noUrl = regexp_replace($"text", "https?://[^ ]+", " ")
    val noMail = regexp_replace(noUrl, "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", " ")
    Tables.documents(spark, dir)
      .select($"doc_id",
        trim(regexp_replace(noMail, " +", " ")).as("clean_text"))
  }

  val cleanSql: String =
    """SELECT doc_id,
       trim(regexp_replace(regexp_replace(regexp_replace(text,
         'https?://[^ ]+', ' ', 'g'),
         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', ' ', 'g'),
         ' +', ' ', 'g')) AS clean_text
       FROM documents"""

  /** HTML→text extraction (the crawl-dump step BEFORE every other
    * curation operator: WET-style tag strip, not a DOM parse).
    * Pipeline, all codegen'd `regexp_replace` — a map-only scan with
    * zero shuffle, the right 100 TB shape for a per-document
    * normalization:
    *   1. drop `<head>…</head>` whole (title/meta/style boilerplate);
    *   2. drop `<script>/<style>` blocks by BACKREFERENCE
    *      (`</\1\s*>`), so markup inside a JS string cannot
    *      terminate the block early;
    *   3. drop `<!-- comments -->`;
    *   4. block-level closers/voids (`<br>`, `</p>`, `</div>`,
    *      `</h1..6>`, `</li>`, `</tr>`, `</table>`, `</ul>`, `</ol>`,
    *      `</blockquote>`, `</pre>`, `<hr>`) → newline, so words from
    *      adjacent blocks never concatenate;
    *   5. every remaining tag → space;
    *   6. decode the common entity set (`&nbsp; &lt; &gt; &quot;
    *      &#39;` and LAST `&amp;`, the standard order that avoids
    *      double-decoding);
    *   7. collapse whitespace runs, trim.
    * Malformed-HTML posture: heuristic by design (like the WET
    * extractors) — an unclosed `<script>` eats to the next closer;
    * documented, spec-pinned.
    */
  def stripHtml(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noHead = regexp_replace(c, "(?is)<head\\b[^>]*>.*?</head\\s*>", " ")
    val noBlock = regexp_replace(noHead,
      "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " ")
    val noComment = regexp_replace(noBlock, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)<(br|hr|/p|/div|/h[1-6]|/li|/tr|/table|/ul|/ol|/blockquote|/pre)\\b[^>]*>",
      "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (col, (from, to)) =>
        regexp_replace(col, java.util.regex.Pattern.quote(from),
          java.util.regex.Matcher.quoteReplacement(to))
      }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Gate `text_html_extract`: [[stripHtml]] verified by INVERSION —
    * each document is wrapped in-gate into a deterministic full HTML
    * page (head with title/style boilerplate, a script whose JS
    * string contains fake markup, a comment, an `<h1>` carrying the
    * lang, the body with every space entity-encoded as `&nbsp;`) and
    * the strip must recover exactly `lang ⊔ text` — the oracle is
    * the PLAIN original expression, never a regex replay, so the two
    * sides cannot share a bug. The wrap REQUIREs the corpus is
    * HTML-safe (no raw `&<>` in text, the sentinel-domain rule), so
    * a generator change fails loudly instead of hash-mismatching.
    */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"lang", $"text")
    val unsafe = docs.agg(sum(when($"text".rlike("[&<>]")
      || $"lang".rlike("[&<>]"), 1L).otherwise(0L)).as("n")).head.getLong(0)
    require(unsafe == 0L,
      s"text_html_extract: $unsafe document(s) contain raw &<> — the " +
        "inversion wrap needs an HTML-safe corpus; escape step required")
    val body = regexp_replace($"text", " ",
      java.util.regex.Matcher.quoteReplacement("&nbsp;"))
    val html = concat(
      lit("<!DOCTYPE html><html><head><meta charset=\"utf-8\">" +
        "<title>boilerplate title</title><style>p{color:#000}</style>" +
        "</head><body><script type=\"text/javascript\">var x = " +
        "\"<p>not text</p>\";</script><h1>"),
      $"lang",
      lit("</h1><!-- nav boilerplate --><p>"),
      body,
      lit("</p></body></html>"))
    docs.select($"doc_id", stripHtml(html).as("extracted"))
  }

  val htmlExtractSql: String =
    """SELECT doc_id,
         lang || ' ' || trim(regexp_replace(text, '\s+', ' ', 'g'))
           AS extracted
       FROM documents"""

  /** #36c n-gram repetition ratio (the Gopher-style repetition
    * filter, Rae et al. 2021): fraction of a doc's 3-shingle
    * occurrences that are repeats of an already-seen shingle —
    * 0 = no repetition, →1 = the doc loops. Rides the existing
    * shingle-posting build: one doc_id shuffle, all codegen.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shinglePostings carries per-(doc, shingle) dup_count internally
    // but only exposes distinct rows; recompute both totals here
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    Dedup.tokenRows(spark, dir)
      .withColumn("t2", lead($"token", 1).over(w))
      .withColumn("t3", lead($"token", 2).over(w))
      .filter($"t3".isNotNull)
      .groupBy($"doc_id",
        concat_ws(" ", $"token", $"t2", $"t3").as("shingle"))
      .agg(count(lit(1)).as("occ"))
      .groupBy($"doc_id")
      .agg(sum($"occ").as("total"), count(lit(1)).as("distinct_sh"))
      .select($"doc_id",
        round(($"total" - $"distinct_sh").cast("double") / $"total", 4)
          .as("rep_ratio"))
  }

  val repetitionSql: String =
    """SELECT doc_id,
         round((total - distinct_sh) * 1.0 / total, 4) AS rep_ratio
       FROM (
         SELECT doc_id, sum(occ) AS total, count(*) AS distinct_sh
         FROM (
           SELECT doc_id, s, count(*) AS occ FROM (
             SELECT doc_id,
                    t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s,
                    i
             FROM (
               SELECT doc_id,
                      list_filter(list_transform(string_split(trim(text), ' '),
                                  x -> trim(x)), x -> length(x) > 0) AS t
               FROM documents),
               LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
             WHERE len(t) >= 3)
           GROUP BY doc_id, s)
         GROUP BY doc_id)"""

  def quality(spark: SparkSession, dir: String): DataFrame =
    qualityOf(spark, Tables.documents(spark, dir))

  /** Same scoring over any (doc_id, text) frame — lets specs drive
    * degenerate inputs (empty/whitespace-only docs) through the real
    * code path.
    */
  def qualityOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val toks = Dedup.tokensCol($"text")
    val stop = Seq("the", "a", "or", "and", "of")
    docs
      .select($"doc_id", toks.as("toks"), length($"text").as("n_chars"))
      .select($"doc_id", $"n_chars".cast("long").as("n_chars"),
        size($"toks").cast("long").as("n_tokens"),
        // empty/whitespace-only docs are certain in real curation
        // input: unguarded 0.0/0 is NaN, and round(NaN).cast(long)
        // throws under Spark 4's default ANSI mode
        when(size($"toks") > 0,
          round(markerHits($"toks", stop).cast("double") / size($"toks"), 4))
          .otherwise(0.0).as("stop_ratio"),
        when(size($"toks") > 0,
          round(aggregate($"toks", lit(0L), (acc, t) => acc + length(t))
            .cast("double") / size($"toks"), 4))
          .otherwise(0.0).as("avg_token_len"))
      .withColumn("quality", {
        // 0.4·min(n_tokens/100,1) + 0.3·(1−stop_ratio) +
        // 0.3·min(avg_token_len/8,1), evaluated in integer units of
        // 1e-8 so the 4-decimal rounding has no fp ties (JVM HALF_UP
        // vs DuckDB binary rounding disagree on exact .5 ulps).
        val s = round($"stop_ratio" * 10000).cast("long")
        val a = round($"avg_token_len" * 10000).cast("long")
        // term scales at 1e8: 0.4·min(nt/100,1) → 400000·min(nt,100);
        // 0.3·(1−s/1e4) → 3000·(1e4−s); 0.3·min(a/(8·1e4),1) → 375·a
        val qe8 = lit(400000L) * least($"n_tokens", lit(100L)) +
          lit(3000L) * (lit(10000L) - s) +
          least(lit(375L) * a, lit(30000000L))
        floor((qe8 + lit(5000L)) / lit(10000.0)).cast("long") / lit(10000.0)
      })
  }

  val qualitySql: String = {
    val toks =
      """list_filter(list_transform(string_split(trim(text), ' '), x -> trim(x)),
         x -> length(x) > 0)"""
    s"""WITH base AS (
          SELECT doc_id, $toks AS toks, CAST(length(text) AS BIGINT) AS n_chars
          FROM documents),
        m AS (
          SELECT doc_id, n_chars, CAST(len(toks) AS BIGINT) AS n_tokens,
            CASE WHEN len(toks) > 0 THEN
              round(len(list_filter(toks, t -> t IN ('the','a','or','and','of'))) * 1.0
                    / len(toks), 4) ELSE 0.0 END AS stop_ratio,
            CASE WHEN len(toks) > 0 THEN
              round(list_reduce(list_transform(toks, t -> CAST(length(t) AS BIGINT)),
                    (x, y) -> x + y) * 1.0 / len(toks), 4) ELSE 0.0 END AS avg_token_len
          FROM base)
        SELECT doc_id, n_chars, n_tokens, stop_ratio, avg_token_len,
          CAST(floor((400000 * least(n_tokens, 100)
                + 3000 * (10000 - CAST(round(stop_ratio * 10000) AS BIGINT))
                + least(375 * CAST(round(avg_token_len * 10000) AS BIGINT),
                        30000000) + 5000) / 10000.0) AS BIGINT) / 10000.0
            AS quality
        FROM m"""
  }

  /** #37 token counting: whitespace tokens + a BPE-ish regex lexer
    * (letter runs / digit runs / single punctuation).
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        size(Dedup.tokensCol($"text")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(lower($"text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_bpe_tokens"))
  }

  val tokenCountsSql: String =
    """SELECT doc_id,
       CAST(len(list_filter(list_transform(string_split(trim(text), ' '),
            x -> trim(x)), x -> length(x) > 0)) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
            AS BIGINT) AS n_bpe_tokens
       FROM documents"""

  /** Tokenizer fertility per language — the mixture-design signal a
    * multilingual corpus needs BEFORE token budgeting: how many
    * subword-ish tokens one "word" (whitespace token) costs per
    * language, and how many bytes one token carries. A high-fertility
    * language burns budget faster than its document share suggests
    * (the standard multilingual-tokenizer observation); the byte
    * ratio separates wide scripts from verbose ones. Uses the SAME
    * BPE-ish lexer as [[tokenCounts]], so the two gates can't drift.
    * All sums exact BIGINT off one map-side-partial aggregate to
    * |langs| rows; the two ratios divide once at the edge.
    */
  def tokenFertility(spark: SparkSession, dir: String): DataFrame =
    tokenFertilityOf(Tables.documents(spark, dir))

  /** Fertility core over any (lang, text) frame. */
  def tokenFertilityOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"lang",
        size(Dedup.tokensCol($"text")).cast("long").as("ws"),
        size(regexp_extract_all(lower($"text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("bpe"),
        length($"text").cast("long").as("chars"),
        expr("octet_length(text)").cast("long").as("bytes"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"ws").as("ws_tokens"),
        sum($"bpe").as("bpe_tokens"), sum($"chars").as("n_chars"),
        sum($"bytes").as("n_bytes"))
      .select($"lang", $"n_docs", $"ws_tokens", $"bpe_tokens",
        $"n_chars", $"n_bytes",
        when($"ws_tokens" > 0,
          round($"bpe_tokens".cast("double") / $"ws_tokens".cast("double"), 4))
          .otherwise(0.0).as("fertility"),
        when($"bpe_tokens" > 0,
          round($"n_bytes".cast("double") / $"bpe_tokens".cast("double"), 4))
          .otherwise(0.0).as("bytes_per_token"))
      .orderBy($"lang")
  }

  val tokenFertilitySql: String =
    """WITH per AS (
         SELECT lang,
                CAST(len(list_filter(list_transform(
                  string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS BIGINT) AS ws,
                CAST(len(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe,
                CAST(length(text) AS BIGINT) AS chars,
                CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS bytes
         FROM documents),
       a AS (
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(ws) AS BIGINT) AS ws_tokens,
                CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
                CAST(sum(chars) AS BIGINT) AS n_chars,
                CAST(sum(bytes) AS BIGINT) AS n_bytes
         FROM per GROUP BY 1)
       SELECT lang, n_docs, ws_tokens, bpe_tokens, n_chars, n_bytes,
              CASE WHEN ws_tokens > 0 THEN
                round(CAST(bpe_tokens AS DOUBLE) / CAST(ws_tokens AS DOUBLE), 4)
              ELSE 0.0 END AS fertility,
              CASE WHEN bpe_tokens > 0 THEN
                round(CAST(n_bytes AS DOUBLE) / CAST(bpe_tokens AS DOUBLE), 4)
              ELSE 0.0 END AS bytes_per_token
       FROM a ORDER BY lang"""

  /** Encoding-health census per source — the crawl-hygiene screen
    * that runs before any text scoring: replacement characters
    * (U+FFFD marks a decode that already failed upstream), raw C0
    * control characters (binary junk masquerading as text), and the
    * classic UTF-8-read-as-Latin-1 mojibake signatures ("Ã"/"â€"
    * pairs). A source with a high replacement or control ratio gets
    * its INGEST fixed, not its documents filtered — which is why the
    * census is per source, with counts, not a per-doc filter. Counts
    * are exact integers by the subtract-after-strip device
    * (len − len(strip(class))); one aggregate to |sources| rows.
    */
  def encodingCensus(spark: SparkSession, dir: String): DataFrame =
    encodingCensusOf(Tables.documents(spark, dir))

  /** Census core over any (source, text) frame. */
  def encodingCensusOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def classCount(c: org.apache.spark.sql.Column, pattern: String) =
      (length(c) - length(regexp_replace(c, pattern, ""))).cast("long")
    docs
      .select($"source",
        length($"text").cast("long").as("chars"),
        classCount($"text", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").as("ctrl"),
        classCount($"text", "[^\\x00-\\x7F]").as("non_ascii"),
        when($"text".contains("�"), 1L).otherwise(0L).as("repl_doc"),
        when($"text".contains("Ã") || $"text".contains("â"),
          1L).otherwise(0L).as("moji_doc"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"chars").as("n_chars"),
        sum($"ctrl").as("ctrl_chars"), sum($"non_ascii").as("non_ascii_chars"),
        sum($"repl_doc").as("repl_docs"), sum($"moji_doc").as("moji_docs"))
      .orderBy($"source")
  }

  val encodingCensusSql: String =
    """WITH per AS (
         SELECT source,
                CAST(length(text) AS BIGINT) AS chars,
                CAST(length(text) - length(regexp_replace(text,
                  '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS BIGINT) AS ctrl,
                CAST(length(text) - length(regexp_replace(text,
                  '[^\x00-\x7F]', '', 'g')) AS BIGINT) AS non_ascii,
                CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END AS repl_doc,
                CASE WHEN contains(text, chr(195))
                       OR contains(text, chr(226))
                     THEN 1 ELSE 0 END AS moji_doc
         FROM documents)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(chars) AS BIGINT) AS n_chars,
              CAST(sum(ctrl) AS BIGINT) AS ctrl_chars,
              CAST(sum(non_ascii) AS BIGINT) AS non_ascii_chars,
              CAST(sum(repl_doc) AS BIGINT) AS repl_docs,
              CAST(sum(moji_doc) AS BIGINT) AS moji_docs
       FROM per GROUP BY 1 ORDER BY source"""

  /** #38 fingerprint: md5 of whitespace-normalized text (the
    * oracle-checkable half; the custom-codegen rolling hash is
    * rollingFingerprint).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        md5(trim(regexp_replace(lower($"text"), "\\s+", " "))).as("fp_md5"))
  }

  val fingerprintSql: String =
    """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
       FROM documents"""

  /** #38b polynomial rolling hash via the native codegen Expression
    * (graft.functions.RollingHash), exact-gated by a DuckDB fold over
    * the same bytes.
    */
  def rollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", RollingHash.rolling_hash(
        trim(regexp_replace(lower($"text"), "\\s+", " "))).as("fp_roll"))
  }

  /** Karp-Rabin fold re-derived in SQL: h = fold (h·257 + byte) mod
    * 2³¹−1 over the normalized text. The testdata corpus is pure
    * ASCII, so `ord(char)` equals the UTF-8 byte the native kernel
    * hashes (same assumption the multimodal oracle already relies
    * on); list_prepend(0) supplies the fold's initial accumulator.
    */
  val rollingFingerprintSql: String =
    """WITH norm AS (
         SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
         FROM documents)
       SELECT doc_id,
              list_reduce(list_prepend(0::BIGINT,
                list_transform(range(1, length(t) + 1), i -> ord(t[i])::BIGINT)),
                (h, c) -> (h * 257 + c) % 2147483647) AS fp_roll
       FROM norm"""

  // ── bigram coherence ──────────────────────────────────────────────

  /** #36i bigram-coherence fluency proxy: the mean corpus frequency
    * of a document's token-bigram INSTANCES. Fluent or templated
    * text reuses transitions the corpus uses everywhere (high mean);
    * shuffled/gibberish text steps through transitions nothing else
    * uses (mean → 1, each bigram counting only itself). The
    * integer-exact cousin of the KenLM-perplexity filters of
    * CCNet-style pipelines: counts instead of log-probs, so the
    * DuckDB gate matches value-for-value with no transcendentals.
    *
    * Shape at 100 TB: bigram rows ride the same per-doc window as
    * the shingle build (one doc_id shuffle); corpus counts are a
    * partial-agg'd groupBy on the 64-bit bigram hash (the bigram
    * vocabulary is far too large to broadcast — the count frame
    * joins back by hash as a plain shuffle join, the jaccard-family
    * precedent); the final per-doc fold is one more scalar
    * aggregate. Document text never passes an exchange.
    */
  def bigramCoherence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val bigrams = Dedup.tokenRows(spark, dir)
      .withColumn("t2", lead($"token", 1).over(w))
      .filter($"t2".isNotNull)
      .select($"doc_id", xxhash64(concat_ws(" ", $"token", $"t2")).as("bh"))
    val counts = bigrams.groupBy($"bh").agg(count(lit(1)).as("cnt"))
    bigrams.join(counts, "bh")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"cnt").as("sum_freq"))
      .select($"doc_id", $"n_bigrams",
        round($"sum_freq".cast("double") / $"n_bigrams", 4).as("coherence"))
  }

  val bigramCoherenceSql: String =
    """WITH toks AS (
         SELECT doc_id,
                list_filter(list_transform(string_split(trim(text), ' '),
                            x -> trim(x)), x -> length(x) > 0) AS t
         FROM documents),
       big AS (
         SELECT doc_id, unnest([t[i] || ' ' || t[i + 1]
                                for i in range(1, len(t))]) AS bg
         FROM toks WHERE len(t) >= 2),
       counts AS (SELECT bg, CAST(count(*) AS BIGINT) AS cnt
                  FROM big GROUP BY bg)
       SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              round(sum(c.cnt) * 1.0 / count(*), 4) AS coherence
       FROM big b JOIN counts c USING (bg)
       GROUP BY b.doc_id"""

  /** Readability + character-class profile — the curation signals a
    * Gopher/C4-style filter stack reads next after token stats:
    * Flesch reading-ease (Flesch 1948; syllables approximated as
    * vowel GROUPS, the standard regex surrogate) plus alpha/digit
    * character ratios. All inputs are integer regexp-match counts
    * (simple character classes, identical under Java regex and RE2),
    * so the only fp is the final Flesch/ratio expression — pure
    * +,−,×,÷ on identical integers, IEEE-deterministic across
    * engines (no log/exp). Zero guards via greatest(·,1): division
    * NaNs would throw under ANSI mode on empty docs. Shuffle-free:
    * per-row map work at scan speed, same class as text_tokens.
    */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id",
      regexp_count($"text", lit("[A-Za-z]+")).cast("long").as("n_words"),
      regexp_count($"text", lit("[.!?]+")).cast("long").as("n_sentences"),
      regexp_count(lower($"text"), lit("[aeiouy]+")).cast("long")
        .as("n_syllables"),
      regexp_count($"text", lit("[A-Za-z]")).cast("long").as("n_alpha"),
      regexp_count($"text", lit("[0-9]")).cast("long").as("n_digit"),
      length($"text").cast("long").as("n_chars"))
    d.select($"doc_id", $"n_words", $"n_sentences", $"n_syllables",
      round(lit(206.835)
          - lit(1.015) * ($"n_words".cast("double")
            / greatest($"n_sentences", lit(1L)).cast("double"))
          - lit(84.6) * ($"n_syllables".cast("double")
            / greatest($"n_words", lit(1L)).cast("double")), 4)
        .as("flesch"),
      round($"n_alpha".cast("double")
          / greatest($"n_chars", lit(1L)).cast("double"), 4)
        .as("alpha_ratio"),
      round($"n_digit".cast("double")
          / greatest($"n_chars", lit(1L)).cast("double"), 4)
        .as("digit_ratio"))
  }

  val readabilitySql: String =
    """WITH c AS (
         SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
             AS n_syllables,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
           CAST(length(text) AS BIGINT) AS n_chars
         FROM documents)
       SELECT doc_id, n_words, n_sentences, n_syllables,
         round(206.835
               - 1.015 * (CAST(n_words AS DOUBLE)
                          / CAST(greatest(n_sentences, 1) AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE)
                         / CAST(greatest(n_words, 1) AS DOUBLE)), 4) AS flesch,
         round(CAST(n_alpha AS DOUBLE)
               / CAST(greatest(n_chars, 1) AS DOUBLE), 4) AS alpha_ratio,
         round(CAST(n_digit AS DOUBLE)
               / CAST(greatest(n_chars, 1) AS DOUBLE), 4) AS digit_ratio
       FROM c"""

  /** #37i BPE merge-candidate mining — the first step of byte-pair-
    * encoding vocabulary induction (Sennrich et al. 2016): the
    * corpus-wide frequency of every ADJACENT symbol pair inside
    * words, top-k; the highest pair is the next BPE merge. The scale
    * device is the real tokenizer-training trick: collapse the
    * corpus to the (word, count) VOCABULARY frame first (one
    * map-side-partial aggregate — corpus text is touched exactly
    * once), then enumerate character pairs over vocabulary entries
    * weighted by word count — pair work is O(Σ|distinct word|), not
    * O(corpus), which is why real BPE trainers run on word counts.
    * Pair generation is a codegen `transform(sequence)`, no UDF.
    */
  def bpePairs(spark: SparkSession, dir: String, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select(explode(split(trim($"text"), " +")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("f"))
    words.filter(length($"w") >= 2)
      .select($"f", explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy($"pair").agg(sum($"f").as("freq"))
      .orderBy($"freq".desc, $"pair")
      .limit(topK)
  }

  /** #36l compression-ratio quality signal — the entropy proxy the
    * web-scale curation pipelines lean on (CCNet-lineage): deflate
    * output bytes / input bytes, in integer ppm. Templated or
    * repetitive text compresses far below natural prose; high-entropy
    * gibberish barely compresses at all — one number separates both
    * failure modes from the middle band natural text occupies. The
    * codec is the JDK `Deflater` at a FIXED level (deterministic
    * bytes for a given input), run batched in `mapPartitions` with
    * one reused Deflater per partition — the [[MultimodalCodec]]
    * amortized-codec shape applied to text. No cross-engine oracle
    * exists (DuckDB has no deflate), so the gate is DECLARED
    * rows-only and the semantic contract — repetitive ≪ natural <
    * random, ratios bounded — is QualityContractSpec's job.
    */
  def compressionRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val in = text.getBytes("UTF-8")
          d.reset()
          d.setInput(in)
          d.finish()
          var outLen = 0L
          while (!d.finished()) outLen += d.deflate(buf)
          val ratioPpm = if (in.length == 0) 1000000L
            else outLen * 1000000L / in.length
          (id, in.length.toLong, outLen, ratioPpm)
        }
      }
      .toDF("doc_id", "n_bytes", "deflate_bytes", "ratio_ppm")
      .orderBy($"doc_id")
  }

  /** Oracle: same vocabulary collapse, same pair enumeration. */
  val bpePairsSql: String =
    """WITH toks AS (
         SELECT unnest(string_split_regex(trim(text), ' +')) AS w
         FROM documents),
       words AS (
         SELECT w, CAST(count(*) AS BIGINT) AS f
         FROM toks WHERE length(w) > 0 GROUP BY w),
       pairs AS (
         SELECT unnest([w[i:i+1] for i in range(1, len(w))]) AS pair, f
         FROM words WHERE length(w) >= 2)
       SELECT pair, CAST(sum(f) AS BIGINT) AS freq
       FROM pairs GROUP BY pair
       ORDER BY freq DESC, pair LIMIT 50"""

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003 — the MOSS device): hash every character `k`-gram,
    * slide a window of `w` consecutive hashes, keep each window's
    * MINIMUM — the selected set is position-stable, so any two
    * documents sharing a substring of length ≥ w+k−1 are GUARANTEED
    * to share a fingerprint (the local-min property rolling/md5
    * whole-doc fingerprints lack: one edited byte changes those
    * entirely, while winnowing fingerprints away from the edit
    * survive). Density is ~2/(w+1) of all grams — the tunable
    * storage/recall dial.
    *
    * Plan: pure map-side — gram hashes, window minima, and the
    * distinct-selection census are all codegen'd array transforms
    * inside one projection; no shuffle, no explode, nothing leaves
    * the row until the final per-doc summary. Hash parity with the
    * oracle via the md5-prefix device (48-bit: Σ over ≤10³ selected
    * stays far under BIGINT).
    */
  def winnowing(spark: SparkSession, dir: String, k: Int = 8,
      w: Int = 4): DataFrame =
    winnowingOf(Tables.documents(spark, dir), k, w)

  /** Winnowing core over any (doc_id, text) frame — see
    * [[winnowing]] for the selection contract.
    */
  def winnowingOf(docs: DataFrame, k: Int, w: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", lower(trim($"text")).as("t"))
      .select($"doc_id",
        expr(s"""transform(sequence(1, greatest(length(t) - ${k - 1}, 0)),
                 i -> CAST(conv(substring(md5(substring(t, i, $k)), 1, 12),
                                16, 10) AS BIGINT))""").as("hs"))
      .select($"doc_id", size($"hs").cast("long").as("n_grams"),
        expr(s"""array_distinct(transform(
                   sequence(1, greatest(size(hs) - ${w - 1}, 0)),
                   j -> array_min(slice(hs, j, $w))))""").as("fps"))
      .select($"doc_id", $"n_grams",
        size($"fps").cast("long").as("n_fps"),
        coalesce(expr("array_min(fps)"), lit(0L)).as("fp_min"),
        coalesce(expr("aggregate(fps, 0L, (a, x) -> a + x)"), lit(0L))
          .as("fp_sum"))
      .orderBy($"doc_id")
  }

  def winnowingSql(k: Int = 8, w: Int = 4): String =
    s"""WITH d AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
       g AS (
         SELECT doc_id,
                list_transform(
                  range(1, greatest(length(t) - ${k - 1}, 0) + 1),
                  i -> ('0x' || substr(md5(substr(t, i::INTEGER, $k)), 1, 12))
                       ::BIGINT) AS hs
         FROM d),
       s AS (
         SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
                list_distinct(list_transform(
                  range(1, greatest(len(hs) - ${w - 1}, 0) + 1),
                  j -> list_min(hs[j:j+${w - 1}]))) AS fps
         FROM g)
       SELECT doc_id, n_grams, CAST(len(fps) AS BIGINT) AS n_fps,
              CAST(coalesce(list_min(fps), 0) AS BIGINT) AS fp_min,
              CAST(coalesce(list_sum(fps), 0) AS BIGINT) AS fp_sum
       FROM s ORDER BY doc_id"""

  /** Per-source unigram Shannon entropy (nats) + type/token ratio —
    * the lexical-diversity profile a mixture designer reads before
    * weighting sources (a low-entropy source is boilerplate/templated
    * text; a TTR near 1 is ID-like noise). Uses the identity
    * H = ln N − (Σ c·ln c)/N so the shuffle moves ONE (count) row
    * per distinct (source, token) — and each c·ln c term is
    * quantized to integer micro-nats (`round(c·ln c·10⁶)` as BIGINT,
    * the same summation-order-proof device as unigramXent/bigramXent)
    * so the sum is exact regardless of partition merge order; only
    * the final display division is fp. Scale shape:
    * explode → two partial-agg'd groupBys, vocabulary-sized
    * exchanges, no windows, no joins.
    */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame =
    tokenEntropyOf(Tables.documents(spark, dir))

  /** Entropy core over any (source, text) frame — see
    * [[tokenEntropy]] for the arithmetic contract.
    */
  def tokenEntropyOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"source", explode(split(trim($"text"), " ")).as("raw"))
      .select($"source", trim($"raw").as("token"))
      .filter(length($"token") > 0)
      .groupBy($"source", $"token").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(round($"c".cast("double") * log($"c".cast("double"))
          * lit(1000000.0)).cast("long")).as("clnc_micro"))
      .select($"source", $"n_tokens", $"n_types",
        round($"n_types".cast("double") / $"n_tokens".cast("double"), 4)
          .as("ttr"),
        round(log($"n_tokens".cast("double"))
          - $"clnc_micro".cast("double")
            / ($"n_tokens".cast("double") * 1.0e6), 4).as("entropy_nats"))
      .orderBy($"source")
  }

  val tokenEntropySql: String =
    """WITH tok AS (
         SELECT source,
                unnest(list_filter(
                  list_transform(string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS token
         FROM documents),
       c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
             FROM tok GROUP BY 1, 2),
       a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                    CAST(count(*) AS BIGINT) AS n_types,
                    CAST(sum(CAST(round(CAST(c AS DOUBLE)
                          * ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
                      AS BIGINT) AS clnc_micro
             FROM c GROUP BY 1)
       SELECT source, n_tokens, n_types,
              round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
                AS ttr,
              round(ln(CAST(n_tokens AS DOUBLE))
                    - CAST(clnc_micro AS DOUBLE)
                      / (CAST(n_tokens AS DOUBLE) * 1000000), 4)
                AS entropy_nats
       FROM a ORDER BY source"""

  /** Good–Turing frequency-of-frequencies census + smoothed mass
    * estimates per source (Good 1953, Biometrika 40; the Gale/Sampson
    * "Simple Good-Turing" 1995 presentation) — the vocabulary-mass
    * readout a mixture designer uses to answer "how much of this
    * source's token mass is singletons, and what's the probability
    * the NEXT token is unseen?". Emits the spectrum N₁…N₅ (types
    * seen exactly r times), the leave-one-out unseen-mass estimate
    * p₀ = N₁/N, and the Turing-adjusted counts
    * r* = (r+1)·N_{r+1}/N_r for r = 1, 2.
    *
    * Exactness device: the spectrum is pure integer counting off the
    * (source, token, c) aggregate; p₀ and r* are integer-division
    * micro/ppm units (`N₁·10⁶ div N`, `(r+1)·N_{r+1}·10⁶ div N_r`,
    * 0-guarded) — no fp anywhere, hash-exact by construction.
    *
    * Scale shape: explode → two partial-agg'd groupBys (token counts,
    * then count-of-counts) — vocabulary-sized then spectrum-sized
    * exchanges, no windows, no joins. The same shape as
    * [[tokenEntropyOf]] minus the logs.
    */
  def goodTuring(spark: SparkSession, dir: String): DataFrame =
    goodTuringOf(Tables.documents(spark, dir))

  def goodTuringOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select($"source", explode(split(trim($"text"), " ")).as("raw"))
      .select($"source", trim($"raw").as("token"))
      .filter(length($"token") > 0)
      .groupBy($"source", $"token").agg(count(lit(1)).as("c"))
    counts.groupBy($"source")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"c" === 2, 1L).otherwise(0L)).as("n2"),
        sum(when($"c" === 3, 1L).otherwise(0L)).as("n3"),
        sum(when($"c" === 4, 1L).otherwise(0L)).as("n4"),
        sum(when($"c" === 5, 1L).otherwise(0L)).as("n5"))
      .select($"source", $"n_tokens", $"n_types",
        $"n1", $"n2", $"n3", $"n4", $"n5",
        expr("(n1 * 1000000L) div n_tokens").as("p0_ppm"),
        when($"n1" > 0, expr("(2L * n2 * 1000000L) div n1"))
          .otherwise(0L).as("r1_star_micro"),
        when($"n2" > 0, expr("(3L * n3 * 1000000L) div n2"))
          .otherwise(0L).as("r2_star_micro"))
      .orderBy($"source")
  }

  val goodTuringSql: String =
    """WITH tok AS (
         SELECT source,
                unnest(list_filter(
                  list_transform(string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS token
         FROM documents),
       c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
             FROM tok GROUP BY 1, 2),
       s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                    CAST(count(*) AS BIGINT) AS n_types,
                    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                    CAST(sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
                    CAST(sum(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
                    CAST(sum(CASE WHEN c = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n5
             FROM c GROUP BY 1)
       SELECT source, n_tokens, n_types, n1, n2, n3, n4, n5,
              (n1 * 1000000) // n_tokens AS p0_ppm,
              CASE WHEN n1 > 0 THEN (2 * n2 * 1000000) // n1
                   ELSE 0 END AS r1_star_micro,
              CASE WHEN n2 > 0 THEN (3 * n3 * 1000000) // n2
                   ELSE 0 END AS r2_star_micro
       FROM s ORDER BY source"""

  /** Pairwise Jensen–Shannon divergence between per-source unigram
    * token distributions — the symmetric, bounded (≤ ln 2) distance
    * a mixture designer reads before weighting sources: two crawls
    * whose JSD ≈ 0 are redundant; a source far from every other adds
    * diversity. Computed WITHOUT a full outer join: tokens private to
    * one side contribute exactly ½·p·ln2 each, so their total is
    * ½ln2·(1 − common_mass) per side — one exact integer (the common
    * tokens' count sum) per pair recovers it. Only COMMON tokens need
    * the real term ½[p·ln(2p/(p+q)) + q·ln(2q/(p+q))], each quantized
    * to integer nano-nats before the sum (the unigramXent
    * summation-order device, 10⁹ here since terms are ≤ ln2·p), so
    * the pair aggregate is an exact BIGINT and the one fp combination
    * is pinned in the final projection.
    *
    * Scale shape: the corpus collapses to the (source, token) count
    * table first (partial-agg'd); the pair frame is that table
    * self-joined on TOKEN (postings-keyed shuffle, never broadcast —
    * the vocabulary grows with the corpus), fanning each token to
    * C(sources_with_it, 2) pairs — Σ bounded by |pairs|·|V|, never
    * corpus². Totals per source ride a broadcast (|sources| rows).
    */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame =
    jsDivergenceOf(Tables.documents(spark, dir))

  /** JSD core over any (source, text) frame — see [[jsDivergence]]
    * for the arithmetic contract.
    */
  def jsDivergenceOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select($"source", explode(split(trim($"text"), " ")).as("raw"))
      .select($"source", trim($"raw").as("token"))
      .filter(length($"token") > 0)
      .groupBy($"source", $"token").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy($"source").agg(sum($"c").as("n"))
    val sided = counts.join(broadcast(totals), "source")
    val l = sided.select($"token", $"source".as("s1"),
      $"c".as("c1"), $"n".as("n1"))
    val r = sided.select($"token", $"source".as("s2"),
      $"c".as("c2"), $"n".as("n2"))
    val common = l.join(r, Seq("token")).filter($"s1" < $"s2")
      .withColumn("p", $"c1".cast("double") / $"n1".cast("double"))
      .withColumn("q", $"c2".cast("double") / $"n2".cast("double"))
      // ½[p ln(2p/(p+q)) + q ln(2q/(p+q))] per common token, in
      // integer nano-nats — identical expression in the oracle
      .withColumn("t_nano", round(
        (lit(0.5) * ($"p" * log(lit(2.0) * $"p" / ($"p" + $"q"))
          + $"q" * log(lit(2.0) * $"q" / ($"p" + $"q"))))
          * lit(1.0e9)).cast("long"))
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("nc"), sum($"c1").as("scc1"),
        sum($"c2").as("scc2"), sum($"t_nano").as("tns"))
    // the pair UNIVERSE comes from the totals frame, not the join:
    // a pair with zero shared tokens must still report jsd = ln 2,
    // not vanish (the all-private-mass case is the maximum, and the
    // row-set must not depend on the data)
    val universe = totals.select($"source".as("s1"), $"n".as("n1"))
      .crossJoin(totals.select($"source".as("s2"), $"n".as("n2")))
      .filter($"s1" < $"s2")
    universe.join(common, Seq("s1", "s2"), "left")
      .select($"s1", $"s2",
        coalesce($"nc", lit(0L)).as("n_common_types"),
        coalesce($"scc1", lit(0L)).as("cc1"),
        coalesce($"scc2", lit(0L)).as("cc2"),
        $"n1", $"n2", coalesce($"tns", lit(0L)).as("t_nano_sum"))
      .select($"s1", $"s2", $"n_common_types",
        round(lit(0.5 * math.log(2.0)) *
            (lit(2.0) - $"cc1".cast("double") / $"n1".cast("double")
              - $"cc2".cast("double") / $"n2".cast("double"))
            + $"t_nano_sum".cast("double") / lit(1.0e9),
          6).as("jsd"))
      .orderBy($"s1", $"s2")
  }

  val jsDivergenceSql: String =
    """WITH tok AS (
         SELECT source,
                unnest(list_filter(
                  list_transform(string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS token
         FROM documents),
       c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
             FROM tok GROUP BY 1, 2),
       n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
       sided AS (SELECT c.source, c.token, c.c, n.n
                 FROM c JOIN n ON n.source = c.source),
       p AS (
         SELECT l.source AS s1, r.source AS s2,
                CAST(l.c AS DOUBLE) / CAST(l.n AS DOUBLE) AS p,
                CAST(r.c AS DOUBLE) / CAST(r.n AS DOUBLE) AS q,
                l.c AS c1, r.c AS c2
         FROM sided l JOIN sided r ON l.token = r.token
         WHERE l.source < r.source),
       a AS (
         SELECT s1, s2, CAST(count(*) AS BIGINT) AS nc,
                CAST(sum(c1) AS BIGINT) AS scc1,
                CAST(sum(c2) AS BIGINT) AS scc2,
                CAST(sum(CAST(round(
                  0.5 * (p * ln(2.0 * p / (p + q)) + q * ln(2.0 * q / (p + q)))
                  * 1000000000) AS BIGINT)) AS BIGINT) AS t_nano_sum
         FROM p GROUP BY 1, 2),
       u AS (
         SELECT l.source AS s1, r.source AS s2, l.n AS n1, r.n AS n2
         FROM n l JOIN n r ON l.source < r.source),
       g AS (
         SELECT u.s1, u.s2,
                CAST(coalesce(a.nc, 0) AS BIGINT) AS n_common_types,
                CAST(coalesce(a.scc1, 0) AS BIGINT) AS cc1,
                CAST(coalesce(a.scc2, 0) AS BIGINT) AS cc2,
                u.n1, u.n2, CAST(coalesce(a.t_nano_sum, 0) AS BIGINT)
                  AS t_nano_sum
         FROM u LEFT JOIN a ON a.s1 = u.s1 AND a.s2 = u.s2)
       SELECT s1, s2, n_common_types,
              round(0.5 * ln(2.0)
                    * (2.0 - CAST(cc1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                           - CAST(cc2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                    + CAST(t_nano_sum AS DOUBLE) / 1000000000, 6) AS jsd
       FROM g ORDER BY s1, s2"""

  /** Per-document cross-entropy under the corpus UNIGRAM language
    * model — the CCNet-style (Wenzek 2020) perplexity quality
    * signal, with the corpus itself as the LM: H(d) = (1/|d|)
    * Σ_{t∈d} ln(N / c_t), where c_t is t's corpus count and N the
    * corpus token total. A low-H doc is made of common words
    * (boilerplate reads LOW, so the useful band is the middle — same
    * read as CCNet's head/middle/tail split); a high-H doc is
    * rare-token noise. No held-out model to ship: every term's count
    * comes from the corpus, so c_t ≥ 1 and the score is total.
    *
    * Exactness device: per-TERM cost `round(ln(N/c_t)·10⁶)` in
    * integer micro-nats (the BM25/QL summation-order-proof device),
    * so `h_micro = Σ tf·cost` is an exact BIGINT and only the final
    * display division is fp. Scale shape: tf per (doc, token) is the
    * corpus-sized groupBy every token operator budgets; term costs
    * are vocabulary-sized and join by token (postings-keyed shuffle,
    * never broadcast — the vocabulary grows with the corpus); the
    * per-doc sum reuses the doc_id partitioning.
    */
  def unigramXent(spark: SparkSession, dir: String): DataFrame =
    unigramXentOf(Tables.documents(spark, dir))

  /** Cross-entropy core over any (doc_id, text) frame — see
    * [[unigramXent]] for the arithmetic contract.
    */
  def unigramXentOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs
      .select($"doc_id", explode(split(trim($"text"), " ")).as("raw"))
      .select($"doc_id", trim($"raw").as("token"))
      .filter(length($"token") > 0)
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val coll = tf.groupBy($"token").agg(sum($"tf").as("ct"))
    val nTot = coll.agg(sum($"ct").as("n_coll"))
    val cost = coll.crossJoin(broadcast(nTot))
      .select($"token", round(log($"n_coll".cast("double") /
        $"ct".cast("double")) * lit(1000000.0)).cast("long").as("cost"))
    tf.join(cost, "token")
      .groupBy($"doc_id")
      .agg(sum($"tf").as("dl"), sum($"tf" * $"cost").as("h_micro"))
      .select($"doc_id", $"dl", $"h_micro",
        round($"h_micro".cast("double") /
          ($"dl".cast("double") * 1.0e6), 4).as("xent_nats"))
      .orderBy($"doc_id")
  }

  val unigramXentSql: String =
    """WITH tok AS (
         SELECT doc_id,
                unnest(list_filter(
                  list_transform(string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS token
         FROM documents),
       tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              FROM tok GROUP BY 1, 2),
       coll AS (SELECT token, CAST(sum(tf) AS BIGINT) AS ct
                FROM tf GROUP BY 1),
       n AS (SELECT CAST(sum(ct) AS BIGINT) AS n_coll FROM coll),
       cost AS (
         SELECT token,
                CAST(round(ln(CAST(n_coll AS DOUBLE) / CAST(ct AS DOUBLE))
                           * 1000000.0) AS BIGINT) AS cost
         FROM coll, n),
       agg AS (
         SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl,
                CAST(sum(tf * cost) AS BIGINT) AS h_micro
         FROM tf JOIN cost USING (token) GROUP BY 1)
       SELECT doc_id, dl, h_micro,
              round(CAST(h_micro AS DOUBLE)
                    / (CAST(dl AS DOUBLE) * 1000000.0), 4) AS xent_nats
       FROM agg ORDER BY doc_id"""

  def bigramXent(spark: SparkSession, dir: String): DataFrame =
    bigramXentOf(Tables.documents(spark, dir))

  /** Per-document cross-entropy under the corpus BIGRAM LM with
    * Laplace smoothing — the conditional-probability step above
    * [[unigramXentOf]] (the CCNet/KenLM quality-signal family:
    * P(w|w′) = (c₂(w′,w)+1)/(c₁(w′)+V)): a document of common words
    * in UNCOMMON order now scores high where the unigram model
    * cannot see it. Per-bigram cost is quantized ONCE to integer
    * micro-nats — round((ln(c₁+V) − ln(c₂+1))·10⁶) — so the per-doc
    * sum is exact BIGINT on any merge order and the single display
    * division is pinned.
    *
    * Scale shape: adjacency comes from a doc-partitioned lead (no
    * join), the cost table is DISTINCT-BIGRAM-sized and JOINED by
    * (w1, w2) — never broadcast, never corpus²; V rides as a one-row
    * broadcast. Docs with < 2 tokens have no bigram and drop
    * (documented; the unigram gate covers them).
    */
  def bigramXentOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select($"doc_id", posexplode(expr(
        """filter(transform(split(trim(text), ' '), x -> trim(x)),
           x -> length(x) > 0)""")))
      .select($"doc_id", $"pos", $"col".as("w1"))
    val bg = toks
      .withColumn("w2", lead($"w1", 1).over(
        Window.partitionBy($"doc_id").orderBy($"pos")))
      .filter($"w2".isNotNull)
    val tf2 = bg.groupBy($"doc_id", $"w1", $"w2")
      .agg(count(lit(1)).as("tf"))
    val c2 = tf2.groupBy($"w1", $"w2").agg(sum($"tf").as("c2"))
    val c1 = c2.groupBy($"w1").agg(sum($"c2").as("c1"))
    val v = toks.agg(count_distinct($"w1").as("v"))
    val cost = c2.join(c1, "w1").crossJoin(broadcast(v))
      .select($"w1", $"w2",
        round((log(($"c1" + $"v").cast("double")) -
          log(($"c2" + 1L).cast("double"))) * lit(1000000.0))
          .cast("long").as("cost"))
    tf2.join(cost, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_bigrams"), sum($"tf" * $"cost").as("h_micro"))
      .select($"doc_id", $"n_bigrams", $"h_micro",
        round($"h_micro".cast("double") /
          ($"n_bigrams".cast("double") * 1.0e6), 4).as("xent_nats"))
      .orderBy($"doc_id")
  }

  val bigramXentSql: String =
    """WITH raw AS (
         SELECT doc_id, string_split(trim(text), ' ') AS arr FROM documents),
       toks AS (
         SELECT doc_id, w1, pos FROM (
           SELECT doc_id,
                  unnest(list_transform(arr, x -> trim(x))) AS w1,
                  unnest(range(0, len(arr))) AS pos
           FROM raw) z
         WHERE length(w1) > 0),
       bg AS (
         SELECT doc_id, w1,
                lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
         FROM toks),
       tf2 AS (
         SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf
         FROM bg WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
       c2 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2
              FROM tf2 GROUP BY 1, 2),
       c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
       v AS (SELECT CAST(count(DISTINCT w1) AS BIGINT) AS v FROM toks),
       cost AS (
         SELECT c2.w1, c2.w2,
                CAST(round((ln(CAST(c1.c1 + v.v AS DOUBLE))
                            - ln(CAST(c2.c2 + 1 AS DOUBLE)))
                           * 1000000.0) AS BIGINT) AS cost
         FROM c2 JOIN c1 ON c1.w1 = c2.w1, v),
       agg AS (
         SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
                CAST(sum(tf * cost) AS BIGINT) AS h_micro
         FROM tf2 JOIN cost ON tf2.w1 = cost.w1 AND tf2.w2 = cost.w2
         GROUP BY 1)
       SELECT doc_id, n_bigrams, h_micro,
              round(CAST(h_micro AS DOUBLE)
                    / (CAST(n_bigrams AS DOUBLE) * 1000000.0), 4)
                AS xent_nats
       FROM agg ORDER BY doc_id"""

  /** Heaps-law vocabulary growth curve + exponent (Heaps 1978,
    * V(n) ≈ K·n^β): distinct-type count V and token count N at ten
    * doc-id decile checkpoints, with β fit by log-log OLS — the
    * curve a corpus builder reads to extrapolate vocabulary (and
    * so tokenizer/embedding-table size) from a sample to the full
    * 100 TB crawl; β stalling toward 0 is also a template/
    * boilerplate alarm.
    *
    * No corpus-sized window anywhere: a global "tokens seen so far"
    * prefix would be an unpartitionable ordered scan, so the curve
    * is evaluated only at CHECKPOINTS — V(cut) counts tokens whose
    * FIRST doc (a vocabulary-sized min aggregate) is ≤ cut, N(cut)
    * sums per-doc lengths below the cut; both are ≤10× re-scans of
    * already-aggregated frames against ten broadcast cut rows. The
    * fit is exact-integer until the last division: x = round(ln N ·
    * 10⁶), y = round(ln V · 10⁶) are BIGINTs per checkpoint (the
    * micro-nat device), the five OLS moments are exact integer sums
    * over ≤10 rows (≲2·10¹⁶, far under 2⁶³), and β is ONE pinned fp
    * division rounded to 4.
    */
  def heapsCurve(spark: SparkSession, dir: String): DataFrame =
    heapsCurveOf(Tables.documents(spark, dir))

  /** Heaps core over any (doc_id, text) frame — see [[heapsCurve]]
    * for the arithmetic contract.
    */
  def heapsCurveOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs
      .select($"doc_id", explode(split(trim($"text"), " ")).as("raw"))
      .select($"doc_id", trim($"raw").as("token"))
      .filter(length($"token") > 0)
    val firstDoc = tok.groupBy($"token").agg(min($"doc_id").as("fd"))
    val perDoc = tok.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val cuts = docs.agg(max($"doc_id").as("max_id"))
      .select(explode(expr("sequence(1, 10)")).as("dec_i"), $"max_id")
      .select($"dec_i".cast("long").as("dec"),
        expr("(CAST(dec_i AS BIGINT) * max_id) div 10").as("cut"))
    val v = broadcast(cuts).join(firstDoc, $"fd" <= $"cut")
      .groupBy($"dec", $"cut").agg(count(lit(1)).as("v_types"))
    val n = broadcast(cuts.select($"dec".as("nd"), $"cut".as("nc")))
      .join(perDoc, $"doc_id" <= $"nc")
      .groupBy($"nd").agg(sum($"dl").as("n_tokens"))
    val curve = v.join(n, $"dec" === $"nd")
      .select($"dec", $"cut", $"n_tokens", $"v_types")
    val pts = curve.filter($"v_types" > 0L)
      .select(
        round(log($"n_tokens".cast("double")) * 1e6).cast("long").as("x"),
        round(log($"v_types".cast("double")) * 1e6).cast("long").as("y"))
    val beta = pts.agg(count(lit(1)).as("m"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"x" * $"x").as("sxx"),
        sum($"x" * $"y").as("sxy"))
      .select(round(
        ($"m" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"m" * $"sxx" - $"sx" * $"sx").cast("double"), 4).as("beta"))
    curve.crossJoin(broadcast(beta)).orderBy($"dec")
  }

  val heapsCurveSql: String =
    """WITH tok AS (
         SELECT doc_id,
                unnest(list_filter(
                  list_transform(string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS token
         FROM documents),
       fd AS (SELECT token, CAST(min(doc_id) AS BIGINT) AS fd
              FROM tok GROUP BY 1),
       pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
              FROM tok GROUP BY 1),
       cuts AS (
         SELECT CAST(dec AS BIGINT) AS dec,
                (dec * (SELECT max(doc_id) FROM documents)) // 10 AS cut
         FROM unnest(range(1, 11)) AS u(dec)),
       v AS (
         SELECT dec, cut, CAST(count(*) AS BIGINT) AS v_types
         FROM cuts JOIN fd ON fd.fd <= cuts.cut
         GROUP BY 1, 2),
       n AS (
         SELECT dec, CAST(sum(dl) AS BIGINT) AS n_tokens
         FROM cuts JOIN pd ON pd.doc_id <= cuts.cut
         GROUP BY 1),
       curve AS (
         SELECT v.dec, cut, n_tokens, v_types
         FROM v JOIN n ON v.dec = n.dec),
       pts AS (
         SELECT CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
                  AS x,
                CAST(round(ln(CAST(v_types AS DOUBLE)) * 1e6) AS BIGINT)
                  AS y
         FROM curve WHERE v_types > 0),
       fit AS (
         SELECT round(
             CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
             / CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE), 4)
           AS beta
         FROM pts)
       SELECT dec, cut, n_tokens, v_types, beta
       FROM curve, fit ORDER BY dec"""

  /** Harman S-stemmer (Harman 1991, "How effective is suffixing?"):
    * the three-rule conservative English stemmer — strong enough to
    * conflate plural/singular for retrieval, weak enough to never
    * mangle (the property the paper measured against Porter/Lovins).
    * Rules branch on the LONGEST matching suffix; an exception means
    * the word is left UNCHANGED (no cascade to a shorter rule):
    *   1. -ies → -y   unless -eies / -aies
    *   2. -es  → -e   unless -aes / -ees / -oes
    *   3. -s   → ∅    unless -us / -ss
    * Pure CASE/substring column algebra — codegen'd, restated
    * verbatim in the oracle.
    */
  /** SQL-text form shared by the Spark plan and the oracle — both
    * engines evaluate the same CASE over the same string functions.
    */
  def sStemSqlExpr(x: String): String =
    s"""CASE
          WHEN $x LIKE '%ies' THEN
            CASE WHEN $x LIKE '%eies' OR $x LIKE '%aies' THEN $x
                 ELSE substring($x, 1, length($x) - 3) || 'y' END
          WHEN $x LIKE '%es' THEN
            CASE WHEN $x LIKE '%aes' OR $x LIKE '%ees' OR $x LIKE '%oes'
                 THEN $x
                 ELSE substring($x, 1, length($x) - 1) END
          WHEN $x LIKE '%s' THEN
            CASE WHEN $x LIKE '%us' OR $x LIKE '%ss' THEN $x
                 ELSE substring($x, 1, length($x) - 1) END
          ELSE $x
        END"""

  /** Gate: stemmed-vocabulary census — per stem, how many surface
    * forms collapsed into it and the pooled collection frequency; the
    * normalization a retrieval index applies before posting (the
    * synthetic vocabulary happens to carry no plural variants, so
    * n_forms is 1 throughout there — the conflation behavior itself
    * is pinned by the spec's crafted plural corpus). The
    * corpus collapses to the surface vocabulary first (one
    * partial-agg'd shuffle); stemming is a per-row CASE on the
    * vocabulary frame.
    */
  def sStemVocabulary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.tokenRows(spark, dir)
      .groupBy($"token").agg(count(lit(1)).as("c"))
      .withColumn("stem", expr(sStemSqlExpr("lower(token)")))
      .groupBy($"stem")
      .agg(count(lit(1)).as("n_forms"), sum($"c").as("coll_freq"),
        min($"token").as("sample_form"))
      .orderBy($"stem")
  }

  val sStemVocabularySql: String = {
    val stem = sStemSqlExpr("lower(token)")
    s"""WITH tok AS (
         SELECT unnest(list_filter(
                  list_transform(string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS token
         FROM documents),
       vocab AS (
         SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
       stemmed AS (SELECT token, c, $stem AS stem FROM vocab)
       SELECT stem, CAST(count(*) AS BIGINT) AS n_forms,
              CAST(sum(c) AS BIGINT) AS coll_freq,
              min(token) AS sample_form
       FROM stemmed GROUP BY stem
       ORDER BY stem"""
  }

  /** Multinomial Naive-Bayes language-model scoring matrix — the
    * train/score loop of the classic NB classifier (Maron 1961;
    * McCallum/Nigam 1998 for the multinomial event model) run as a
    * pure dataflow: unigram models are TRAINED per language on the
    * even-doc_id half, then every odd-doc_id document is scored
    * under EVERY language model and the per-(true_lang, model_lang)
    * log-likelihood census comes out — the full confusion-structure
    * evidence without the argmax knife-edge (1-ulp log drift could
    * flip a near-tied argmax across engines; summed integer
    * micro-nats cannot drift at all).
    *
    * Exactness: per-(model, token) cost = round(ln((c+1)/(N+V))·10⁶)
    * — Laplace smoothing, BIGINT micro-nats (the unigramXent
    * device); doc log-lik = Σ tf·cost is exact whatever the merge
    * order. Scale: token-count frames only; the ×|langs| fan applies
    * to the EVAL token frame (broadcast lang models), never raw text.
    */
  def nbLogLik(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        explode(split(trim($"text"), " ")).as("raw"))
      .select($"doc_id", $"lang", trim($"raw").as("token"))
      .filter(length($"token") > 0)
    val counts = toks.filter($"doc_id" % 2 === 0)
      .groupBy($"lang".as("model_lang"), $"token")
      .agg(count(lit(1)).as("c"))
    val nLang = counts.groupBy($"model_lang").agg(sum($"c").as("n_lang"))
    val vocab = counts.select($"token").distinct()
      .agg(count(lit(1)).as("v"))
    val evalTf = toks.filter($"doc_id" % 2 === 1)
      .groupBy($"doc_id", $"lang".as("true_lang"), $"token")
      .agg(count(lit(1)).as("tf"))
    val scored = evalTf
      .crossJoin(broadcast(nLang.crossJoin(vocab)))
      .join(counts, Seq("model_lang", "token"), "left")
      .withColumn("cost_micro",
        round(log((coalesce($"c", lit(0L)) + lit(1L)).cast("double")
          / ($"n_lang" + $"v").cast("double")) * lit(1000000.0))
          .cast("long"))
    scored.groupBy($"doc_id", $"true_lang", $"model_lang")
      .agg(sum($"tf" * $"cost_micro").as("ll_micro"))
      .groupBy($"true_lang", $"model_lang")
      .agg(count(lit(1)).as("n_docs"), sum($"ll_micro").as("ll_sum_micro"))
      .select($"true_lang", $"model_lang", $"n_docs", $"ll_sum_micro",
        round($"ll_sum_micro".cast("double")
          / ($"n_docs".cast("double") * 1.0e6), 4).as("avg_ll_nats"))
      .orderBy($"true_lang", $"model_lang")
  }

  val nbLogLikSql: String =
    """WITH toks AS (
         SELECT doc_id, lang,
                unnest(list_filter(
                  list_transform(string_split(trim(text), ' '), x -> trim(x)),
                  x -> length(x) > 0)) AS token
         FROM documents),
       counts AS (
         SELECT lang AS model_lang, token, CAST(count(*) AS BIGINT) AS c
         FROM toks WHERE doc_id % 2 = 0 GROUP BY 1, 2),
       nl AS (SELECT model_lang, CAST(sum(c) AS BIGINT) AS n_lang
              FROM counts GROUP BY 1),
       vo AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
              FROM counts),
       ev AS (
         SELECT doc_id, lang AS true_lang, token,
                CAST(count(*) AS BIGINT) AS tf
         FROM toks WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
       scored AS (
         SELECT ev.doc_id, ev.true_lang, nl.model_lang, ev.tf,
                CAST(round(ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
                  / CAST(nl.n_lang + vo.v AS DOUBLE)) * 1000000)
                  AS BIGINT) AS cost_micro
         FROM ev CROSS JOIN nl CROSS JOIN vo
         LEFT JOIN counts c
           ON c.model_lang = nl.model_lang AND c.token = ev.token),
       per_doc AS (
         SELECT doc_id, true_lang, model_lang,
                CAST(sum(tf * cost_micro) AS BIGINT) AS ll_micro
         FROM scored GROUP BY 1, 2, 3)
       SELECT true_lang, model_lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(ll_micro) AS BIGINT) AS ll_sum_micro,
              round(CAST(sum(ll_micro) AS DOUBLE)
                / (CAST(count(*) AS DOUBLE) * 1000000), 4) AS avg_ll_nats
       FROM per_doc GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Cohen's κ for the langid classifier (Cohen 1960) — chance-
    * corrected agreement over the full gold × predicted confusion
    * matrix, the single-number honesty check precision/recall tables
    * miss (a degenerate majority-class predictor scores high
    * accuracy but κ ≈ 0). Held EXACT until the last division:
    * κ = (N·Σdiag − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k), all
    * BIGINT cross-multiplications over the |labels|²-sized cell
    * frame (the langIdEval aggregate — one corpus pass, metadata
    * after). The 'und' prediction class participates as a label with
    * an empty gold row, as it should.
    */
  def langIdKappa(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = langId(spark, dir)
      .join(Tables.documents(spark, dir).select($"doc_id", $"lang"),
        "doc_id")
      .groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val rowTot = cells.groupBy($"lang").agg(sum($"n").as("r"))
    val colTot = cells.groupBy($"pred_lang".as("lang"))
      .agg(sum($"n").as("c"))
    val pe = rowTot.join(colTot, Seq("lang"), "full")
      .agg(sum(coalesce($"r", lit(0L)) * coalesce($"c", lit(0L)))
        .as("pe_num"))
    val agg = cells.agg(sum($"n").as("n_tot"),
      sum(when($"lang" === $"pred_lang", $"n").otherwise(0L)).as("diag"))
    agg.crossJoin(broadcast(pe))
      .select($"n_tot", $"diag", $"pe_num",
        ($"n_tot" * $"diag" - $"pe_num").as("kappa_num"),
        ($"n_tot" * $"n_tot" - $"pe_num").as("kappa_den"),
        round(($"n_tot" * $"diag" - $"pe_num").cast("double")
          / ($"n_tot" * $"n_tot" - $"pe_num").cast("double"), 6)
          .as("kappa"))
  }

  val langIdKappaSql: String = {
    // the same langid prediction as the langIdEval oracle
    s"""WITH pred AS (${langIdSql}),
        cells AS (
          SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
          FROM (SELECT doc_id, pred_lang FROM pred) p
          JOIN documents d ON d.doc_id = p.doc_id
          GROUP BY 1, 2),
        rt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS r
               FROM cells GROUP BY 1),
        ct AS (SELECT pred_lang AS lang, CAST(sum(n) AS BIGINT) AS c
               FROM cells GROUP BY 1),
        pe AS (SELECT CAST(sum(coalesce(rt.r, 0) * coalesce(ct.c, 0))
                 AS BIGINT) AS pe_num
               FROM rt FULL JOIN ct USING (lang)),
        agg AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
                       CAST(sum(CASE WHEN lang = pred_lang THEN n
                                ELSE 0 END) AS BIGINT) AS diag
                FROM cells)
        SELECT n_tot, diag, pe_num,
               n_tot * diag - pe_num AS kappa_num,
               n_tot * n_tot - pe_num AS kappa_den,
               round(CAST(n_tot * diag - pe_num AS DOUBLE)
                 / CAST(n_tot * n_tot - pe_num AS DOUBLE), 6) AS kappa
        FROM agg CROSS JOIN pe"""
  }
}
