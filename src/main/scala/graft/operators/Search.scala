package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical search primitives over the document corpus: vocabulary
  * (Zipf) statistics and BM25 keyword retrieval (Robertson/Walker,
  * Okapi BM25). Both ride the shared codegen token path
  * ([[Dedup.tokenRows]]).
  *
  * Scale posture: vocabulary output is |vocab|-sized (orders smaller
  * than the corpus) behind two map-side-partial aggregations; BM25
  * filters the token stream to the query terms BEFORE its first
  * shuffle, so the exchanges carry matched postings, not the corpus.
  * Term/document-frequency tables are broadcast (they are
  * benchmark-query-sized).
  *
  * Cross-engine exactness: each (query, doc, term) BM25 contribution
  * is rational arithmetic over integers (tf, df, dl, N) and fixed
  * literals — identical IEEE doubles in both engines — converted to
  * integer micro-units before the per-doc sum, so summation order
  * can't flip a bit. The final score is a single exact integer
  * divided by 1e6: no round() call sits on a representability
  * boundary.
  */
object Search {

  // ── vocabulary / Zipf statistics ──────────────────────────────────

  /** Top-K tokens by collection frequency with document frequency —
    * the corpus-vocabulary profile (tokenizer audits, stop-list
    * construction, Zipf-curve checks). Two shuffles, both partial-
    * aggregated; the global rank window sees |vocab| rows only.
    */
  def vocabulary(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    import spark.implicits._
    val tf = Dedup.tokenRows(spark, dir)
      .groupBy($"token", $"doc_id").agg(count(lit(1)).as("c"))
    // window input = distinct tokens (vocabulary-sized): exempted in
    // WindowAuditSpec with that justification
    val w = Window.orderBy($"coll_freq".desc, $"token")
    tf.groupBy($"token")
      .agg(sum($"c").as("coll_freq"), count(lit(1)).as("doc_freq"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"rk", $"token", $"coll_freq", $"doc_freq")
  }

  /** Sketch-path vocabulary: collection-frequency top-K via the
    * ss_topk SpaceSaving aggregate (functions/HeavyHitters.scala) —
    * one pass, O(capacity) memory per partition, and the shuffle
    * moves one sketch per partition instead of one row per distinct
    * token. The exact [[vocabulary]] shuffles the full vocabulary,
    * which for a web-scale corpus (10⁸+ distinct tokens) is itself a
    * heavy exchange; the sketch caps that at `capacity` entries and
    * is exact (err = 0) whenever the distinct-token count stays under
    * capacity. No doc_freq (the sketch counts occurrences, not
    * postings) — columns (rk, token, est, err).
    */
  def vocabularyApprox(spark: SparkSession, dir: String, k: Int = 50,
      capacity: Int = 65536): DataFrame = {
    import spark.implicits._
    Dedup.tokenRows(spark, dir)
      .agg(call_function("ss_topk", $"token", lit(k), lit(capacity)).as("top"))
      .select(posexplode($"top").as(Seq("pos", "hh")))
      .select(($"pos" + 1).cast("long").as("rk"), $"hh.key".as("token"),
        $"hh.est".as("est"), $"hh.err".as("err"))
  }

  /** Gate `text_ss_topk`: [[vocabularyApprox]] in EXACT mode —
    * capacity ≥ the corpus's distinct-token count means the
    * SpaceSaving eviction never fires, so est = true collection
    * frequency and err = 0 for every entry (the sketch's exactness
    * contract, the same device `stream_heavy_hitters` uses), and the
    * result is oracle-able against the exact vocabulary counts. The
    * error-bound behavior under SMALL capacities is HeavyHittersSpec's
    * job; this gate pins the whole sketch path (update, partition
    * merge, trim, eval tie-breaks) value-for-value on the board.
    */
  def vocabularyApproxExact(spark: SparkSession, dir: String,
      k: Int = 100): DataFrame = {
    import spark.implicits._
    val distinct = Dedup.tokenRows(spark, dir)
      .select($"token").distinct().count()
    vocabularyApprox(spark, dir, k, capacity = distinct.toInt + 8)
  }

  /** Oracle: exact counts ranked by the sketch's eval order — est
    * desc, err asc (all zero here), token asc.
    */
  def vocabularyApproxExactSql(k: Int = 100): String =
    s"""WITH tok AS (
          SELECT unnest(list_filter(list_transform(string_split(trim(text), ' '),
                        x -> trim(x)), x -> length(x) > 0)) AS token
          FROM documents),
        v AS (SELECT token, CAST(count(*) AS BIGINT) AS est
              FROM tok GROUP BY 1)
        SELECT rk, token, est, CAST(0 AS BIGINT) AS err FROM (
          SELECT CAST(row_number() OVER (ORDER BY est DESC, token)
                      AS BIGINT) AS rk, *
          FROM v)
        WHERE rk <= $k"""

  def vocabularySql(k: Int = 50): String =
    s"""WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(list_transform(string_split(trim(text), ' '),
                        x -> trim(x)), x -> length(x) > 0)) AS token
          FROM documents),
        tf AS (SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
        v AS (SELECT token, CAST(sum(c) AS BIGINT) AS coll_freq,
                     CAST(count(*) AS BIGINT) AS doc_freq
              FROM tf GROUP BY 1)
        SELECT rk, token, coll_freq, doc_freq FROM (
          SELECT CAST(row_number() OVER (ORDER BY coll_freq DESC, token)
                      AS BIGINT) AS rk, *
          FROM v)
        WHERE rk <= $k"""

  /** Word burstiness census (Church & Gale 1995; Katz 1996): for
    * each vocabulary term, E[tf | tf > 0] = coll_freq/doc_freq — a
    * function word appears once nearly everywhere (burstiness ≈ 1),
    * a topical/content word concentrates repeat occurrences in the
    * few documents that are ABOUT it (burstiness ≫ 1). The signal
    * Zipf rank hides: two terms with equal collection frequency can
    * differ wildly in concentration, and burstiness is what
    * independence-assuming LMs (and naive dedup shingle weights) get
    * wrong. Exact integer ppm ratio off the same (token, doc)
    * partial-agg pass as [[vocabulary]]; top-k by TakeOrdered on the
    * vocabulary-sized frame (partial per-partition sort, no global
    * exchange of the vocabulary), full deterministic tie-break.
    */
  def burstiness(spark: SparkSession, dir: String, k: Int = 30,
      minDf: Long = 3L): DataFrame = {
    import spark.implicits._
    val tf = Dedup.tokenRows(spark, dir)
      .groupBy($"token", $"doc_id").agg(count(lit(1)).as("c"))
    tf.groupBy($"token")
      .agg(sum($"c").as("coll_freq"), count(lit(1)).as("doc_freq"))
      .filter($"doc_freq" >= minDf)
      .withColumn("burst_ppm", expr("(coll_freq * 1000000) div doc_freq"))
      .select($"token", $"coll_freq", $"doc_freq", $"burst_ppm")
      .orderBy($"burst_ppm".desc, $"coll_freq".desc, $"token")
      .limit(k)
  }

  def burstinessSql(k: Int = 30, minDf: Long = 3L): String =
    s"""WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(list_transform(string_split(trim(text), ' '),
                        x -> trim(x)), x -> length(x) > 0)) AS token
          FROM documents),
        tf AS (SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
        v AS (SELECT token, CAST(sum(c) AS BIGINT) AS coll_freq,
                     CAST(count(*) AS BIGINT) AS doc_freq
              FROM tf GROUP BY 1)
        SELECT token, coll_freq, doc_freq,
               (coll_freq * 1000000) // doc_freq AS burst_ppm
        FROM v WHERE doc_freq >= $minDf
        ORDER BY burst_ppm DESC, coll_freq DESC, token
        LIMIT $k"""

  /** Chao1 vocabulary-richness estimate per source (Chao,
    * Scand. J. Stat. 1984; bias-corrected form): how many distinct
    * tokens does a source REALLY have, given what one sample shows —
    * Ĉ = V + F₁(F₁−1)/(2(F₂+1)), where F₁/F₂ are the singleton/
    * doubleton counts of the frequency-of-frequencies spectrum (the
    * Good–Turing table read for richness instead of mass). The
    * coverage question Heaps' law fits asymptotically, answered
    * nonparametrically per source — the "how much vocabulary is the
    * crawl still missing" number for corpus planning. Exact integer
    * milli-units: Ĉ·1000 = V·1000 + (F₁(F₁−1)·1000) div (2(F₂+1)),
    * no fp anywhere.
    *
    * Scale shape: (source, token) counts → frequency spectrum — two
    * partial-agg'd vocabulary-sized groupBys, nothing else.
    */
  def chao1Richness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tf = Tables.documents(spark, dir)
      .select($"source", explode(Dedup.tokensCol($"text")).as("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("c"))
    tf.groupBy($"source")
      .agg(count(lit(1)).as("v"),
        sum(when($"c" === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when($"c" === 2L, 1L).otherwise(0L)).as("f2"))
      .select($"source", $"v", $"f1", $"f2",
        ($"v" * 1000L +
          expr("(f1 * (f1 - 1) * 1000) div (2 * (f2 + 1))"))
          .as("chao1_milli"))
      .orderBy($"source")
  }

  val chao1RichnessSql: String =
    """WITH tok AS (
         SELECT source,
                unnest(list_filter(list_transform(string_split(trim(text), ' '),
                       x -> trim(x)), x -> length(x) > 0)) AS token
         FROM documents),
       tf AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
              FROM tok GROUP BY 1, 2),
       spec AS (
         SELECT source, CAST(count(*) AS BIGINT) AS v,
                CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
         FROM tf GROUP BY 1)
       SELECT source, v, f1, f2,
              CAST(v * 1000 + (f1 * (f1 - 1) * 1000) // (2 * (f2 + 1))
                AS BIGINT) AS chao1_milli
       FROM spec ORDER BY source"""

  /** TextRank corpus keywords (Mihalcea & Tarau, EMNLP 2004):
    * PageRank over the word co-occurrence graph — a word matters
    * when it co-occurs with words that matter, the recursive signal
    * raw frequency (vocabulary) and tf-idf (docKeywords) don't
    * carry. Graph: adjacent surviving tokens (length ≥ 4, the
    * deterministic content-word stand-in for the paper's POS filter)
    * within a document, undirected, deduplicated. The ranking is
    * [[Graph.pageRankOf]] verbatim — the same integer micro-unit
    * fixpoint, so the oracle is the same 5-stage unrolled-CTE
    * aggregate chain (aggregate-only CTEs: linear re-evaluation
    * under DuckDB inlining, unlike the banned window-bearing class).
    *
    * Scale shape: the pair stream is one doc-partitioned lead window
    * over the postings frame (corpus-linear, never a self-join);
    * dedup + degree are vocabulary-sized partial aggregates; each
    * PageRank step shuffles scalar (word, rank) rows on the cached
    * src-partitioned edge list.
    */
  def textrankKeywords(spark: SparkSession, dir: String, iters: Int = 5,
      topK: Int = 20, minLen: Int = 4): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val adj = Dedup.tokenRows(spark, dir)
      .filter(length($"token") >= minLen)
      .withColumn("next", lead($"token", 1).over(w))
      .filter($"next".isNotNull && $"token" =!= $"next")
      .select(
        when($"token" < $"next", $"token").otherwise($"next").as("a"),
        when($"token" < $"next", $"next").otherwise($"token").as("b"))
      .distinct()
    val edges = adj.select($"a".as("src"), $"b".as("dst"))
      .unionByName(adj.select($"b".as("src"), $"a".as("dst")))
    Graph.pageRankOf(edges, iters, topK)
  }

  def textrankKeywordsSql(iters: Int = 5, topK: Int = 20,
      minLen: Int = 4): String = {
    val stages = (1 to iters).map { t =>
      s"""r$t AS (
            SELECT e.dst AS node,
                   CAST(150000 + (850 * sum(r.rank // d.outdeg)) // 1000
                        AS BIGINT) AS rank
            FROM r${t - 1} r
            JOIN deg d ON r.node = d.src
            JOIN edges e ON e.src = r.node
            GROUP BY e.dst)"""
    }.mkString(",\n        ")
    // the base CTEs are AS MATERIALIZED: the unrolled stages reference
    // edges/deg once per level, and DuckDB's CTE inlining would
    // re-evaluate the window-bearing adj pair stream at the chain's
    // multiplicity (the r12 markov defect class — the
    // EntryConsistencySpec lint is red without this)
    s"""WITH t AS MATERIALIZED (
          SELECT doc_id,
                 list_transform(string_split(trim(text), ' '),
                   x -> trim(x)) AS toks
          FROM documents),
        tok AS MATERIALIZED (
          SELECT doc_id, pos, token FROM (
            SELECT doc_id,
                   unnest(toks) AS token,
                   unnest(range(0, len(toks))) AS pos
            FROM t) z
          WHERE length(token) >= $minLen),
        adj AS MATERIALIZED (
          SELECT DISTINCT
                 CASE WHEN token < next THEN token ELSE next END AS a,
                 CASE WHEN token < next THEN next ELSE token END AS b
          FROM (
            SELECT token, lead(token) OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS next
            FROM tok) p
          WHERE next IS NOT NULL AND token <> next),
        edges AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM adj
          UNION ALL
          SELECT b AS src, a AS dst FROM adj),
        deg AS MATERIALIZED (
          SELECT src, CAST(count(*) AS BIGINT) AS outdeg
          FROM edges GROUP BY src),
        r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
        $stages
        SELECT node, rank FROM r$iters
        ORDER BY rank DESC, node LIMIT $topK"""
  }

  // ── BM25 keyword retrieval ────────────────────────────────────────

  /** Gate query workload: three keyword queries over the corpus
    * vocabulary.
    */
  val bm25Workload: Seq[(String, Seq[String])] = Seq(
    "q0" -> Seq("spark", "stream", "batch"),
    "q1" -> Seq("join", "merge"),
    "q2" -> Seq("customer", "window", "table"))

  /** BM25 top-k documents per query. k1/b are the textbook defaults;
    * idf uses the shifted-odds form (N − df + 0.5)/(df + 0.5) without
    * the log — log is monotone so per-TERM ordering is unchanged, and
    * dropping it keeps the pipeline transcendental-free, which is
    * what makes the DuckDB gate exact (ln differs by ulps across
    * libm implementations). Documented scoring variant, not an
    * accident.
    */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25TopKOf(spark, Tables.documents(spark, dir), bm25Workload, k)

  /** Same retrieval over any (doc_id, text) frame and workload — lets
    * specs assert ranking behavior on crafted corpora through the
    * real code path.
    */
  def bm25TopKOf(spark: SparkSession, docs: DataFrame,
      workload: Seq[(String, Seq[String])], k: Int): DataFrame = {
    import spark.implicits._
    val allTerms = workload.flatMap(_._2).distinct
    val queryTerms = workload
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "token")
    val docLen = docs
      .select($"doc_id", size(Dedup.tokensCol($"text")).cast("long").as("dl"))
    val stats = docLen.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    // codegen token path (same semantics as Dedup.tokenRows)
    val tf = docs
      .select($"doc_id", explode(split(trim($"text"), " ")).as("raw"))
      .select($"doc_id", trim($"raw").as("token"))
      .filter(length($"token") > 0)
      .filter($"token".isin(allTerms.map(lit): _*))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(queryTerms), "token")
      .join(broadcast(df_), "token")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", $"sum_dl".cast("double") / $"n_docs")
      .withColumn("idf",
        ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
      .withColumn("cu", round($"idf" *
          (($"tf" * lit(2.2)) /
            ($"tf" + lit(1.2) * (lit(1.0) - lit(0.75) +
              lit(0.75) * ($"dl".cast("double") / $"avgdl"))))
          * lit(1000000.0)).cast("long"))
    val w = Window.partitionBy($"query_id").orderBy($"su".desc, $"doc_id")
    contrib.groupBy($"query_id", $"doc_id").agg(sum($"cu").as("su"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"query_id", $"doc_id",
        ($"su".cast("double") / lit(1000000.0)).as("score"), $"rk")
  }

  def bm25TopKSql(k: Int = 10): String = {
    val qvals = bm25Workload
      .flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    s"""WITH q(query_id, token) AS (VALUES $qvals),
        t AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(trim(text), ' '),
                        x -> trim(x)), x -> length(x) > 0) AS toks
          FROM documents),
        dls AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(dl) AS BIGINT) AS sum_dl FROM dls),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
               WHERE token IN (SELECT token FROM q) GROUP BY 1, 2),
        dfs AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        contrib AS (
          SELECT q.query_id, tf.doc_id,
                 CAST(round(
                   ((s.n_docs - dfs.df + 0.5::DOUBLE) / (dfs.df + 0.5::DOUBLE))
                   * ((tf.tf * 2.2::DOUBLE) /
                      (tf.tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE +
                        0.75::DOUBLE * (dls.dl /
                          (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))))
                   * 1000000.0::DOUBLE) AS BIGINT) AS cu
          FROM tf JOIN q USING (token) JOIN dfs USING (token)
               JOIN dls USING (doc_id) CROSS JOIN stats s),
        scored AS (
          SELECT query_id, doc_id, CAST(sum(cu) AS BIGINT) AS su
          FROM contrib GROUP BY 1, 2)
        SELECT query_id, doc_id, CAST(su AS DOUBLE) / 1000000.0::DOUBLE AS score,
               rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY su DESC, doc_id) AS BIGINT) AS rk
          FROM scored)
        WHERE rk <= $k"""
  }

  // ── TF-IDF keyword extraction ─────────────────────────────────────

  /** #37e per-document keyword extraction: top-k tokens by
    * tf · shifted-odds-idf, the document-side dual of [[bm25TopK]]
    * (that ranks docs for a query; this surfaces each doc's most
    * distinctive terms — the tagging/routing/labeling primitive of a
    * curation pipeline). idf is the same transcendental-free
    * (N − df + 0.5)/(df + 0.5) shifted-odds weight as BM25, and for
    * the same reason: per-doc token ORDER under a fixed idf form is
    * what matters, and dropping the log keeps the DuckDB gate exact
    * where ln would differ by ulps across libm builds (documented
    * scoring variant, not an accident — the odds form upweights rare
    * terms more aggressively than log-idf).
    *
    * Shape at 100 TB: tf is one partial-agg'd shuffle on
    * (doc_id, token); df re-aggregates tf BY TOKEN (vocabulary-sized,
    * NOT broadcast — at corpus scale the vocabulary outgrows any
    * broadcast budget, so it joins back by token as a plain shuffle
    * join); the per-doc ranking window partitions on doc_id (max
    * partition = one doc's vocabulary). Document bodies never pass
    * the first exchange — only (doc_id, token, counts) triples move.
    */
  def docKeywords(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val tf = Dedup.tokenRows(spark, dir)
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"token")
    tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        $"tf" * (($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"doc_id", $"rk", $"token", round($"score", 4).as("score"))
  }

  def docKeywordsSql(k: Int = 3): String =
    s"""WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(list_transform(string_split(trim(text), ' '),
                        x -> trim(x)), x -> length(x) > 0)) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
               FROM tok GROUP BY 1, 2),
        v AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.token,
                 tf.tf * ((n.n_docs - v.df + 0.5) / (v.df + 0.5)) AS score
          FROM tf JOIN v USING (token) CROSS JOIN n)
        SELECT doc_id, CAST(rk AS BIGINT) AS rk, token,
               round(score, 4) AS score
        FROM (SELECT doc_id, token, score,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, token) AS rk
              FROM scored)
        WHERE rk <= $k"""

  // ── more-like-this: sparse TF-IDF inner-product retrieval ─────────

  /** Documents most similar to a query DOCUMENT (not a keyword set) —
    * the "more like this" primitive behind related-content panels and
    * query-by-example curation. Similarity is the sparse TF-IDF inner
    * product Σ_t (tf_q·idf_t)·(tf_d·idf_t): the idf enters squared
    * per matched term, with the same transcendental-free shifted-odds
    * idf as [[bm25TopK]] and the same micro-unit device — each
    * per-term contribution is ONE double expression both engines
    * evaluate identically, rounded to integer micro-units BEFORE the
    * per-doc sum, so accumulation order can't flip a bit. (Inner
    * product, not cosine: the sqrt norm would reintroduce
    * transcendentals; for a FIXED query doc the doc-side norm is the
    * only difference and the gate pins the documented variant.)
    *
    * Shape at 100 TB: the corpus reduces to (doc_id, token, tf)
    * postings (one partial-agg'd shuffle); the query doc's postings
    * are one document's vocabulary — broadcast; df joins back BY
    * TOKEN (vocabulary-sized, shuffle join, never broadcast — same
    * posture as [[docKeywords]]); top-k is an orderBy+limit =
    * TakeOrdered, never a full sort. Only postings move — document
    * bodies never pass an exchange.
    */
  def similarDocs(spark: SparkSession, dir: String, queryDoc: Long = 7L,
      k: Int = 10): DataFrame = {
    import spark.implicits._
    val tf = Dedup.tokenRows(spark, dir)
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val qtf = tf.filter($"doc_id" === queryDoc)
      .select($"token", $"tf".as("qtf"))
    tf.filter($"doc_id" =!= queryDoc)
      .join(broadcast(qtf), "token")
      .join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
      .withColumn("cu",
        round($"tf" * $"qtf" * $"idf" * $"idf" * lit(1000000.0)).cast("long"))
      .groupBy($"doc_id").agg(sum($"cu").as("su"))
      .select($"doc_id", ($"su".cast("double") / lit(1000000.0)).as("score"))
      .orderBy($"su".desc, $"doc_id")
      .limit(k)
  }

  def similarDocsSql(queryDoc: Long = 7L, k: Int = 10): String =
    s"""WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(list_transform(string_split(trim(text), ' '),
                        x -> trim(x)), x -> length(x) > 0)) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
               FROM tok GROUP BY 1, 2),
        v AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        q AS (SELECT token, tf AS qtf FROM tf WHERE doc_id = $queryDoc),
        contrib AS (
          SELECT tf.doc_id,
                 CAST(round(tf.tf * q.qtf
                   * ((n.n_docs - v.df + 0.5) / (v.df + 0.5))
                   * ((n.n_docs - v.df + 0.5) / (v.df + 0.5))
                   * 1000000.0) AS BIGINT) AS cu
          FROM tf JOIN q USING (token) JOIN v USING (token) CROSS JOIN n
          WHERE tf.doc_id <> $queryDoc),
        scored AS (
          SELECT doc_id, CAST(sum(cu) AS BIGINT) AS su
          FROM contrib GROUP BY 1)
        SELECT doc_id, CAST(su AS DOUBLE) / 1000000.0 AS score
        FROM scored ORDER BY su DESC, doc_id LIMIT $k"""

  /** Keyword-in-context snippets — the result-rendering step after
    * retrieval: for documents containing the term, the 1-based first
    * match position and an 80-char window starting 40 chars before
    * it. Pure per-row string ops (instr + substring, both engines
    * character-based 1-indexed) — zero shuffle, scan speed; composes
    * downstream of bm25TopK for hit highlighting.
    */
  def snippets(spark: SparkSession, dir: String, term: String = "data")
      : DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", instr($"text", term).cast("long").as("pos"), $"text")
      .filter($"pos" > 0)
      .select($"doc_id", $"pos",
        expr("substr(text, greatest(pos - 40, 1), 80)").as("snippet"))
      .orderBy($"doc_id")
  }

  val snippetsSql: String =
    """SELECT doc_id, pos, substr(text, greatest(pos - 40, 1), 80) AS snippet
       FROM (SELECT doc_id, CAST(strpos(text, 'data') AS BIGINT) AS pos, text
             FROM documents)
       WHERE pos > 0
       ORDER BY doc_id"""

  // ── Positional phrase search ──────────────────────────────────────

  /** Exact-phrase occurrences via positional-postings intersection —
    * the inverted-index phrase query: term i's postings are keyed on
    * their ANCHOR (pos − i), so an n-term phrase is an (n−1)-fold
    * equi-join on (doc_id, anchor) and adjacency never needs an
    * inequality. Each join input is the token stream FILTERED to one
    * literal term before any shuffle — exchanges carry that term's
    * postings (doc_id, anchor scalars), not the corpus; a planner
    * with postings statistics would reorder rarest-term-first, which
    * Catalyst's AQE approximates by broadcasting whichever side
    * lands small. Returns one row per occurrence (doc_id, anchor).
    */
  def phraseMatchesOf(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    import docs.sparkSession.implicits._
    val toks = Dedup.tokenRowsOf(docs)
    phrase.zipWithIndex.map { case (t, i) =>
      toks.filter($"token" === t)
        .select($"doc_id", ($"pos" - i).as("anchor"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "anchor")))
  }

  /** Gate workload: two phrases that occur in the corpus. */
  val phraseWorkload: Seq[Seq[String]] =
    Seq(Seq("table", "scan"), Seq("merge", "join"))

  /** Gate: per-phrase census of exact-phrase hits. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    phraseWorkload.map { p =>
      phraseMatchesOf(docs, p)
        .agg(count(lit(1)).as("n_hits"),
          countDistinct($"doc_id").as("n_docs"),
          coalesce(sum($"doc_id"), lit(0L)).as("doc_sum"))
        .select(lit(p.mkString(" ")).as("phrase"), $"n_hits", $"n_docs",
          $"doc_sum")
    }.reduce(_ unionByName _).orderBy($"phrase")
  }

  /** Oracle: the identical anchor-join per phrase over the same
    * tokenization (split positions BEFORE the empty-token filter, as
    * [[Dedup.tokenRowsOf]] numbers them).
    */
  val phraseSearchSql: String = {
    val per = phraseWorkload.map { p =>
      val joins = p.zipWithIndex.map { case (t, i) =>
        s"""(SELECT doc_id, pos - $i AS anchor FROM tok
             WHERE token = '$t') p$i"""
      }
      val from = joins.head +: joins.tail.zipWithIndex.map {
        case (j, k) =>
          s"JOIN $j ON p0.doc_id = p${k + 1}.doc_id AND p0.anchor = p${k + 1}.anchor"
      }
      s"""SELECT '${p.mkString(" ")}' AS phrase,
                 CAST(count(*) AS BIGINT) AS n_hits,
                 CAST(count(DISTINCT p0.doc_id) AS BIGINT) AS n_docs,
                 CAST(coalesce(sum(p0.doc_id), 0) AS BIGINT) AS doc_sum
          FROM ${from.mkString("\n")}"""
    }
    s"""WITH t AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks
          FROM documents),
        tok AS (
          SELECT doc_id, pos, token FROM (
            SELECT doc_id,
                   unnest(list_transform(toks, x -> trim(x))) AS token,
                   unnest(range(0, len(toks))) AS pos
            FROM t) z
          WHERE length(token) > 0)
        ${per.mkString("\nUNION ALL\n")}
        ORDER BY phrase"""
  }

  /** Spelling-correction candidate generation by the SymSpell delete
    * index (Garbe's symmetric-delete device, public since 2012): a
    * term and a query within edit distance 1 always share a string
    * in deletes₁(term) ∪ {term} ∩ deletes₁(query) ∪ {query}, so ONE
    * equi-join on delete variants replaces the edit-distance scan of
    * the whole vocabulary — candidate generation is O(postings per
    * variant), not O(|vocab|) per query, which is the property that
    * survives a 10⁸-term vocabulary. Candidates are then verified
    * with the exact levenshtein (both engines' builtin — identical
    * integer DP) and ranked by corpus frequency, the SymSpell
    * ranking rule. Queries here are the top terms with a planted
    * 3rd-character substitution — the error class the 1-delete
    * index is designed to catch (del at i on both sides meets in
    * the middle).
    */
  def spellCandidates(spark: SparkSession, dir: String,
      nQueries: Int = 30, k: Int = 3): DataFrame = {
    import spark.implicits._
    val vocab = vocabulary(spark, dir, k = 500)
      .select($"token".as("term"), $"coll_freq")
      .filter(length($"term") >= 4)
    val variants = expr(
      """array_union(array(s),
           transform(sequence(1, length(s)),
             i -> concat(substring(s, 1, i - 1), substring(s, i + 1))))""")
    val index = vocab.withColumn("s", $"term")
      .select($"term", $"coll_freq", explode(variants).as("variant"))
    val queries = vocab
      .orderBy($"coll_freq".desc, $"term").limit(nQueries)
      .select(concat(substring($"term", 1, 2), lit("q"),
        substring($"term", 4, 1000)).as("query"))
      .distinct()
    val qidx = queries.withColumn("s", $"query")
      .select($"query", explode(variants).as("variant"))
    val rk = Window.partitionBy($"query")
      .orderBy($"coll_freq".desc, $"term")
    qidx.join(index, "variant")
      .select($"query", $"term", $"coll_freq").distinct()
      .withColumn("dist", levenshtein($"query", $"term").cast("long"))
      .filter($"dist" <= 1)
      .withColumn("rn", row_number().over(rk))
      .filter($"rn" <= k)
      .select($"query", $"term", $"coll_freq", $"dist")
      .orderBy($"query", $"coll_freq".desc, $"term")
  }

  def spellCandidatesSql(nQueries: Int = 30, k: Int = 3): String =
    s"""WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(list_transform(string_split(trim(text), ' '),
                        x -> trim(x)), x -> length(x) > 0)) AS token
          FROM documents),
        tf AS (SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
        v0 AS (SELECT token AS term, CAST(sum(c) AS BIGINT) AS coll_freq
               FROM tf GROUP BY 1),
        v AS (SELECT term, coll_freq FROM (
                SELECT *, row_number() OVER (ORDER BY coll_freq DESC, term)
                       AS rk FROM v0) WHERE rk <= 500
              ) ,
        vocab AS (SELECT * FROM v WHERE length(term) >= 4),
        idx AS (
          SELECT term, coll_freq,
                 unnest(list_distinct(list_concat([term],
                   list_transform(range(1, length(term) + 1),
                     i -> term[1:i-1] || term[i+1:length(term)]))))
                   AS variant
          FROM vocab),
        q AS (
          SELECT DISTINCT term[1:2] || 'q' || term[4:length(term)] AS query
          FROM (SELECT term FROM vocab
                ORDER BY coll_freq DESC, term LIMIT $nQueries)),
        qidx AS (
          SELECT query,
                 unnest(list_distinct(list_concat([query],
                   list_transform(range(1, length(query) + 1),
                     i -> query[1:i-1] || query[i+1:length(query)]))))
                   AS variant
          FROM q),
        cand AS (
          SELECT DISTINCT query, term, coll_freq
          FROM qidx JOIN idx USING (variant)),
        scored AS (
          SELECT query, term, coll_freq,
                 CAST(levenshtein(query, term) AS BIGINT) AS dist
          FROM cand),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query
                   ORDER BY coll_freq DESC, term) AS rn
          FROM scored WHERE dist <= 1)
        SELECT query, term, coll_freq, dist FROM ranked
        WHERE rn <= $k
        ORDER BY query, coll_freq DESC, term"""

  /** Top-k adjacent-bigram PMI (Church/Hanks 1990) — the collocation
    * detector that separates lexicalized phrases ("et al") from
    * chance co-occurrence, with marginals taken over the bigram
    * table itself: pmi(a,b) = ln(c_ab·N / (c_a·c_b)) where c_a/c_b
    * are a's left-slot and b's right-slot totals and N = Σ c_ab.
    * Adjacency is pos+1 over [[Dedup.tokenRowsOf]]'s numbering
    * (dropped empties break adjacency — the `search_phrase`
    * contract), computed join-free as lead() per doc. Ranking is the
    * integer ppm score ⌊c_ab·N·10⁶ / (c_a·c_b)⌋ (monotone with pmi),
    * so the top-k cut is exact integer arithmetic in both engines
    * and the fp pmi column is display-only; the bound is
    * c_ab·N·10⁶ < 2⁶³, i.e. Σc·max c < 9.2·10¹², past which the
    * score needs the 128-bit path (DECIMAL) — document-scale
    * corpora at sf≤100 sit orders under it.
    *
    * Scale shape: one doc-partitioned window over the token stream
    * (the corpus-sized stage, same exchange the other token
    * operators reuse), then everything downstream is
    * distinct-bigram-sized: two marginal groupBys, a min-count
    * filter BEFORE the joins, and the global rank window runs on the
    * filtered aggregate (vocabulary-scale — exempted in
    * WindowAuditSpec with that justification).
    */
  def pmiBigrams(spark: SparkSession, dir: String, k: Int = 50,
      minCount: Long = 5L): DataFrame =
    pmiBigramsOf(Tables.documents(spark, dir), k, minCount)

  /** PMI core over any (doc_id, text) frame — see [[pmiBigrams]] for
    * the arithmetic contract.
    */
  def pmiBigramsOf(docs: DataFrame, k: Int, minCount: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = Dedup.tokenRowsOf(docs)
      .select($"doc_id", $"pos", $"token")
    val wd = Window.partitionBy($"doc_id").orderBy($"pos")
    val big = tok
      .withColumn("t2", lead($"token", 1).over(wd))
      .withColumn("p2", lead($"pos", 1).over(wd))
      .filter($"t2".isNotNull && $"p2" === $"pos" + 1)
      .groupBy($"token".as("t1"), $"t2")
      .agg(count(lit(1)).as("c_ab"))
    val nTot = big.agg(sum($"c_ab").as("n_big"))
    val leftM = big.groupBy($"t1").agg(sum($"c_ab").as("ca"))
    val rightM = big.groupBy($"t2").agg(sum($"c_ab").as("cb"))
    val wr = Window.orderBy($"score_ppm".desc, $"t1", $"t2")
    big.filter($"c_ab" >= minCount)
      .join(leftM, Seq("t1")).join(rightM, Seq("t2"))
      .crossJoin(broadcast(nTot))
      .withColumn("score_ppm",
        expr("(c_ab * n_big * 1000000) div (ca * cb)"))
      .withColumn("rk", row_number().over(wr).cast("long"))
      .filter($"rk" <= k)
      .select($"rk", $"t1", $"t2", $"c_ab", $"ca", $"cb", $"score_ppm",
        round(log(($"c_ab" * $"n_big").cast("double") /
          ($"ca" * $"cb").cast("double")), 4).as("pmi"))
  }

  def pmiBigramsSql(k: Int = 50, minCount: Long = 5L): String =
    s"""WITH t AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks
          FROM documents),
        tok AS (
          SELECT doc_id, pos, token FROM (
            SELECT doc_id,
                   unnest(list_transform(toks, x -> trim(x))) AS token,
                   unnest(range(0, len(toks))) AS pos
            FROM t) z
          WHERE length(token) > 0),
        big AS (
          SELECT l.token AS t1, r.token AS t2,
                 CAST(count(*) AS BIGINT) AS c_ab
          FROM tok l JOIN tok r
            ON l.doc_id = r.doc_id AND r.pos = l.pos + 1
          GROUP BY 1, 2),
        n AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_big FROM big),
        lm AS (SELECT t1, CAST(sum(c_ab) AS BIGINT) AS ca
               FROM big GROUP BY 1),
        rm AS (SELECT t2, CAST(sum(c_ab) AS BIGINT) AS cb
               FROM big GROUP BY 1),
        scored AS (
          SELECT big.t1 AS t1, big.t2 AS t2, c_ab, ca, cb,
                 CAST((c_ab * n_big * 1000000) // (ca * cb) AS BIGINT)
                   AS score_ppm,
                 round(ln(CAST(c_ab * n_big AS DOUBLE)
                          / CAST(ca * cb AS DOUBLE)), 4) AS pmi
          FROM big JOIN lm USING (t1) JOIN rm USING (t2), n
          WHERE c_ab >= $minCount),
        ranked AS (
          SELECT *, CAST(row_number() OVER
                   (ORDER BY score_ppm DESC, t1, t2) AS BIGINT) AS rk
          FROM scored)
        SELECT rk, t1, t2, c_ab, ca, cb, score_ppm, pmi
        FROM ranked WHERE rk <= $k"""

  /** Query-likelihood retrieval with Dirichlet smoothing (Ponte/Croft
    * 1998; Zhai/Lafferty 2001) — the language-modeling ranking family
    * next to [[bm25TopKOf]]'s probabilistic one, kept in the
    * rank-equivalent form that drops the doc-independent constant:
    * score(q,d) = Σ_{t∈q∩d} ln(1 + c_td·|C| / (μ·c_t))
    *            + |q|·ln(μ / (|d|+μ)).
    * Per-term contributions are rounded to integer MICRO-NATS before
    * the sum (BM25's summation-order-proof device), so the per-doc
    * score and the top-k cut are exact integer arithmetic; candidate
    * docs are those matching ≥1 term — the standard inverted-index
    * evaluation (unmatched docs differ only in the shared length
    * penalty and rank below any matcher of equal length).
    *
    * Scale shape: the token stream is filtered to the query terms
    * BEFORE any shuffle (postings-sized from the scan on), collection
    * stats and the workload ride as broadcasts, and the only
    * corpus-sized frames are the scan itself and the per-doc length
    * aggregate the BM25 path already budgets.
    */
  def queryLikelihoodTopK(spark: SparkSession, dir: String, k: Int = 10,
      mu: Long = 300L): DataFrame =
    queryLikelihoodOf(spark, Tables.documents(spark, dir), bm25Workload, k, mu)

  /** QL core over any (doc_id, text) frame and workload — see
    * [[queryLikelihoodTopK]] for the arithmetic contract.
    */
  def queryLikelihoodOf(spark: SparkSession, docs: DataFrame,
      workload: Seq[(String, Seq[String])], k: Int, mu: Long): DataFrame = {
    import spark.implicits._
    val allTerms = workload.flatMap(_._2).distinct
    val queryTerms = workload
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "token")
    val nqDf = workload.map { case (q, ts) => (q, ts.length.toLong) }
      .toDF("query_id", "nq")
    val docLen = docs
      .select($"doc_id", size(Dedup.tokensCol($"text")).cast("long").as("dl"))
    val nTot = docLen.agg(sum($"dl").as("n_coll"))
    val tokens = docs
      .select($"doc_id", explode(split(trim($"text"), " ")).as("raw"))
      .select($"doc_id", trim($"raw").as("token"))
      .filter(length($"token") > 0)
      .filter($"token".isin(allTerms.map(lit): _*))
    val coll = tokens.groupBy($"token").agg(count(lit(1)).as("ct"))
    val matched = tokens.groupBy($"doc_id", $"token")
      .agg(count(lit(1)).as("ctd"))
      .join(broadcast(queryTerms), "token")
      .join(broadcast(coll), "token")
      .crossJoin(broadcast(nTot))
      .withColumn("cu", round(log(lit(1.0) +
        ($"ctd" * $"n_coll").cast("double") /
          (lit(mu) * $"ct").cast("double")) * lit(1000000.0)).cast("long"))
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"cu").as("s1"), count(lit(1)).as("n_matched"))
    val w = Window.partitionBy($"query_id").orderBy($"su".desc, $"doc_id")
    matched
      .join(docLen, "doc_id")
      .join(broadcast(nqDf), "query_id")
      .withColumn("su", $"s1" +
        round(log(lit(mu).cast("double") /
          ($"dl" + lit(mu)).cast("double")) * lit(1000000.0)).cast("long")
          * $"nq")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"query_id", $"doc_id", $"n_matched",
        ($"su".cast("double") / lit(1000000.0)).as("score"), $"rk")
  }

  def queryLikelihoodSql(k: Int = 10, mu: Long = 300L): String = {
    val qvals = bm25Workload
      .flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    s"""WITH q(query_id, token) AS (VALUES $qvals),
        nq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS nq
               FROM q GROUP BY 1),
        t AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(trim(text), ' '),
                        x -> trim(x)), x -> length(x) > 0) AS toks
          FROM documents),
        dls AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
        n AS (SELECT CAST(sum(dl) AS BIGINT) AS n_coll FROM dls),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        ftok AS (SELECT * FROM tok
                 WHERE token IN (SELECT token FROM q)),
        coll AS (SELECT token, CAST(count(*) AS BIGINT) AS ct
                 FROM ftok GROUP BY 1),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS ctd
               FROM ftok GROUP BY 1, 2),
        m AS (
          SELECT q.query_id, tf.doc_id,
                 CAST(sum(CAST(round(ln(1.0 +
                     CAST(tf.ctd * n.n_coll AS DOUBLE)
                     / CAST($mu * coll.ct AS DOUBLE)) * 1000000.0)
                   AS BIGINT)) AS BIGINT) AS s1,
                 CAST(count(*) AS BIGINT) AS n_matched
          FROM tf JOIN q USING (token) JOIN coll USING (token), n
          GROUP BY 1, 2),
        sc AS (
          SELECT m.query_id, m.doc_id, n_matched,
                 CAST(m.s1 + CAST(round(ln(CAST($mu AS DOUBLE)
                       / CAST(dls.dl + $mu AS DOUBLE)) * 1000000.0)
                     AS BIGINT) * nq.nq AS BIGINT) AS su
          FROM m JOIN dls USING (doc_id) JOIN nq USING (query_id)),
        ranked AS (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY su DESC, doc_id) AS BIGINT) AS rk
          FROM sc)
        SELECT query_id, doc_id, n_matched,
               CAST(su AS DOUBLE) / 1000000.0 AS score, rk
        FROM ranked WHERE rk <= $k"""
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher SIGIR 2009) of
    * the repo's two retrieval families — [[bm25TopKOf]]
    * (probabilistic) and [[queryLikelihoodOf]] (language-model) —
    * the standard hybrid-retrieval combiner: score(d) =
    * Σ_systems 1/(κ + rank_s(d)) over the systems that returned d,
    * κ = 60 per the paper. RRF only reads RANKS, so it fuses
    * systems whose scores live on incomparable scales — exactly why
    * it is the default fusion for lexical+semantic stacks.
    *
    * Exactness device: each contribution is the integer
    * PARTS-PER-BILLION value `10⁹ div (κ + rank)` — ranks are exact
    * in both engines, so the fused score and the re-rank cut are
    * pure integer arithmetic; absent-from-a-list contributes 0 via
    * the outer join's coalesce, and `doc_id` breaks score ties.
    *
    * Scale shape: both retrieval DAGs share the postings-filtered
    * scan shape they already budget; the fusion itself joins two
    * top-k-sized frames (|queries|·k rows) — metadata-scale, one
    * broadcast-sized full-outer join and a rerank window over ≤2k
    * rows per query.
    */
  def rrfFusionTopK(spark: SparkSession, dir: String, k: Int = 10,
      kappa: Int = 60): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    rrfFusionOf(
      bm25TopKOf(spark, docs, bm25Workload, k),
      queryLikelihoodOf(spark, docs, bm25Workload, k, 300L), k, kappa)
  }

  /** RRF core over any two (query_id, doc_id, …, rk) ranked lists —
    * see [[rrfFusionTopK]] for the arithmetic contract.
    */
  def rrfFusionOf(sysA: DataFrame, sysB: DataFrame, k: Int,
      kappa: Int): DataFrame = {
    val spark = sysA.sparkSession
    import spark.implicits._
    val a = sysA.select($"query_id", $"doc_id", $"rk".as("rk_a"))
    val b = sysB.select($"query_id", $"doc_id", $"rk".as("rk_b"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"rrf_ppb".desc, $"doc_id")
    a.join(b, Seq("query_id", "doc_id"), "full_outer")
      .select($"query_id", $"doc_id",
        coalesce($"rk_a", lit(0L)).as("bm25_rk"),
        coalesce($"rk_b", lit(0L)).as("ql_rk"),
        (coalesce(expr(s"1000000000L div ($kappa + rk_a)"), lit(0L)) +
          coalesce(expr(s"1000000000L div ($kappa + rk_b)"), lit(0L)))
          .as("rrf_ppb"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
  }

  def rrfFusionSql(k: Int = 10, kappa: Int = 60): String =
    s"""WITH bm AS (SELECT query_id, doc_id, rk
          FROM (${bm25TopKSql(k)}) zbm),
        ql AS (SELECT query_id, doc_id, rk
          FROM (${queryLikelihoodSql(k)}) zql),
        f AS (
          SELECT coalesce(bm.query_id, ql.query_id) AS query_id,
                 coalesce(bm.doc_id, ql.doc_id) AS doc_id,
                 CAST(coalesce(bm.rk, 0) AS BIGINT) AS bm25_rk,
                 CAST(coalesce(ql.rk, 0) AS BIGINT) AS ql_rk,
                 CAST(coalesce(1000000000 // ($kappa + bm.rk), 0)
                    + coalesce(1000000000 // ($kappa + ql.rk), 0)
                    AS BIGINT) AS rrf_ppb
          FROM bm FULL OUTER JOIN ql
            ON bm.query_id = ql.query_id AND bm.doc_id = ql.doc_id),
        ranked AS (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY rrf_ppb DESC, doc_id) AS BIGINT) AS rk
          FROM f)
        SELECT query_id, doc_id, bm25_rk, ql_rk, rrf_ppb, rk
        FROM ranked WHERE rk <= $k"""

  /** RAKE stopword delimiter set — fixed and tiny by design (RAKE's
    * authors use a standard stopword list; the corpus here carries
    * function words from this set). Shared verbatim with the SQL
    * oracle.
    */
  val RakeStopwords: Seq[String] =
    Seq("a", "the", "of", "and", "or", "to", "in")

  /** RAKE keyphrase extraction (Rose, Engel, Cramer, Cowley 2010 —
    * "Rapid Automatic Keyword Extraction"): candidate phrases are
    * maximal stopword-free token runs (the gaps-and-islands trick:
    * island = rank-among-kept − rank-among-content); each word w
    * scores deg(w)/freq(w) where freq counts phrase occurrences
    * containing w and deg additionally credits the words it
    * co-occurs with (Σ phrase length over its occurrences); a
    * phrase scores the sum of its member word scores. Word scores
    * are integer MICRO units (deg·10⁶ div freq — both engines
    * truncate identically) so phrase scores are exact BIGINTs; the
    * final top-k is fully tie-broken (score, n_occurrences, phrase).
    * Phrases longer than `maxLen` are discarded (the rake-nltk
    * convention — unbounded runs are boilerplate, not keyphrases).
    *
    * Scale shape: two doc-keyed windows (high-cardinality partition
    * key) build the islands; phrase assembly is one groupBy with a
    * run-bounded sort_array buffer; word stats and the phrase-score
    * join move only (word, counts) and (phrase-occurrence, score)
    * rows. No corpus-sized window, no driver loops.
    */
  def rakeKeyphrases(spark: SparkSession, dir: String, maxLen: Int = 4,
      topK: Int = 20): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val kept = Dedup.tokenRows(spark, dir)
      .withColumn("rn", row_number().over(w))
    val content = kept.filter(!$"token".isin(RakeStopwords: _*))
      .withColumn("rn2", row_number().over(w))
      .withColumn("island", $"rn" - $"rn2")
    val occ = content.groupBy($"doc_id", $"island")
      .agg(count(lit(1)).as("len"),
        array_join(transform(sort_array(collect_list(
          struct($"rn", $"token"))), t => t.getField("token")), " ")
          .as("phrase"))
      .filter($"len" <= maxLen)
      .withColumn("occ_id", monotonically_increasing_id())
    val members = occ.select($"occ_id", $"len",
      explode(split($"phrase", " ")).as("token"))
    val wordScore = members.groupBy($"token")
      .agg(count(lit(1)).as("freq"), sum($"len").as("deg"))
      .select($"token", expr("(deg * 1000000L) div freq").as("w_micro"))
    val phraseScores = members
      .join(wordScore, "token")
      .groupBy($"occ_id").agg(sum($"w_micro").as("score_micro"))
      .join(occ.select($"occ_id", $"phrase"), "occ_id")
    phraseScores.groupBy($"phrase")
      .agg(count(lit(1)).as("n_occurrences"),
        min($"score_micro").as("score_micro"))
      .orderBy($"score_micro".desc, $"n_occurrences".desc, $"phrase")
      .limit(topK)
  }

  def rakeKeyphrasesSql(maxLen: Int = 4, topK: Int = 20): String = {
    val stop = RakeStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
          SELECT doc_id, pos, token FROM (
            SELECT doc_id, generate_subscripts(t, 1) AS pos,
                   unnest(t) AS token
            FROM (SELECT doc_id,
                    list_filter(list_transform(
                      string_split(trim(text), ' '), x -> trim(x)),
                      x -> length(x) > 0) AS t
                  FROM documents))),
        kept AS (
          SELECT doc_id, pos, token,
                 row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS rn
          FROM toks),
        content AS (
          SELECT doc_id, pos, token, rn,
                 row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS rn2
          FROM kept WHERE token NOT IN ($stop)),
        occ AS (
          SELECT doc_id, rn - rn2 AS island,
                 CAST(count(*) AS BIGINT) AS len,
                 string_agg(token, ' ' ORDER BY rn) AS phrase,
                 row_number() OVER (ORDER BY doc_id, rn - rn2) AS occ_id
          FROM content GROUP BY doc_id, rn - rn2
          HAVING count(*) <= $maxLen),
        members AS (
          SELECT occ_id, len, unnest(string_split(phrase, ' ')) AS token
          FROM occ),
        ws AS (
          SELECT token,
                 (CAST(sum(len) AS BIGINT) * 1000000)
                   // CAST(count(*) AS BIGINT) AS w_micro
          FROM members GROUP BY token),
        ps AS (
          SELECT m.occ_id, CAST(sum(ws.w_micro) AS BIGINT) AS score_micro
          FROM members m JOIN ws USING (token)
          GROUP BY m.occ_id)
        SELECT o.phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(min(ps.score_micro) AS BIGINT) AS score_micro
        FROM ps JOIN occ o USING (occ_id)
        GROUP BY o.phrase
        ORDER BY score_micro DESC, n_occurrences DESC, phrase
        LIMIT $topK"""
  }
}
