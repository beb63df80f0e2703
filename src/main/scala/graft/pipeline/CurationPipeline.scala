package graft.pipeline

import graft.Tables
import graft.operators.{Curation, Dedup, QualityModel, Sampling, Spans}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed pretraining-data curation job — the LLM-side
  * analogue of [[EtlJob]]: every stage is one of the individually
  * gated operators, chained the way a production corpus build runs
  * them (cheap rules first so each later, costlier stage sees a
  * smaller corpus):
  *
  *  1. Gopher rule battery        (zero-shuffle scan filter)
  *  2. model-based quality filter (hashed-BoW linear scorer,
  *                                 one doc-keyed partial-agg sum)
  *  3. per-language quantile band (histogram ranks, broadcast back)
  *  4. exact dedup, keep-first    (16-byte md5 keys shuffle)
  *  5. span-duplication cut       (gram-key window + per-doc agg)
  *  6. per-source token budget    (scalars-only source window)
  *  7. deterministic hash sample  (zero-shuffle md5 bucket)
  *
  * Stage outputs are survivor ID sets; the corpus flows through
  * LEFT SEMI joins on doc_id, so document text crosses the wire
  * only inside the operators that genuinely need it (exact-dedup's
  * grouping hashes text map-side; spans hash grams map-side — both
  * plan-audited in their own gates). The per-stage counts in
  * [[CurationPipeline.Report]] are the accounting every curation run
  * publishes; they cost one action per stage here — at production
  * scale you'd thread `observe` metrics through one materializing
  * write instead.
  */
object CurationPipeline {

  case class Report(input: Long, afterRules: Long, afterModel: Long,
      afterQuantile: Long, afterExact: Long, afterSpans: Long,
      afterBudget: Long, sampled: Long) {
    def stages: Seq[Long] =
      Seq(input, afterRules, afterModel, afterQuantile, afterExact,
        afterSpans, afterBudget, sampled)
  }

  /** The staged survivor chain, in order, as (stage name, frame) —
    * `stages.last._2` is the curated corpus. Exposed so callers that
    * need per-stage instrumentation (tools/CurationScale's wall-time
    * runs) can action each stage themselves.
    */
  def stages(spark: SparkSession, dir: String, maxDupPerMille: Long = 300,
      samplePerMille: Int = 800,
      budgetTokens: Long = 600,
      materialize: Boolean = false): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // materialize: checkpoint each survivor corpus so a caller that
    // actions EVERY stage (the curation_job gate's per-stage counts)
    // computes each operator once instead of re-deriving the whole
    // prefix chain per action — the cache-per-stage shape a real
    // multi-output curation run uses
    def m(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint(true) else df

    val rulesOk = Curation.gopherFilterOf(spark, docs)
      .filter($"keep" === 1L).select($"doc_id")
    val d1 = m(docs.join(rulesOk, Seq("doc_id"), "left_semi"))

    val modelOk = QualityModel.score(d1.select($"doc_id", $"text"))
      .filter($"keep" === 1L).select($"doc_id")
    val d2 = m(d1.join(modelOk, Seq("doc_id"), "left_semi"))

    val quantOk = Curation.quantileCutByOf(
      d2.select($"doc_id", $"lang",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens")),
      "lang", "n_tokens", loNum = 1, loDen = 10, hiNum = 9, hiDen = 10)
      .select($"doc_id")
    val d3 = m(d2.join(quantOk, Seq("doc_id"), "left_semi"))

    val exactOk = Dedup.exactByHash(d3, $"text", $"doc_id")
      .select($"keep_id".as("doc_id"))
    val d4 = m(d3.join(exactOk, Seq("doc_id"), "left_semi"))

    val spanOk = Spans.spanDedupOf(d4.select($"doc_id", $"source", $"text"))
      .filter($"dup_instances" * 1000L <= $"n_grams" * maxDupPerMille)
      .select($"doc_id")
    val d5 = m(d4.join(spanOk, Seq("doc_id"), "left_semi"))

    val budgetOk = Sampling.capTokensPerSource(
      d5.select($"doc_id", $"source",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens")),
      budgetTokens, salt = "curation-cap")
      .select($"doc_id")
    val d6 = m(d5.join(budgetOk, Seq("doc_id"), "left_semi"))

    val out = m(Sampling.hashSample(d6, $"doc_id", samplePerMille,
      salt = "curation"))
    Seq("input" -> docs, "rules" -> d1, "model" -> d2, "quantile" -> d3,
      "exact" -> d4, "spans" -> d5, "budget" -> d6, "sample" -> out)
  }

  /** Curate the documents table at `dir`. Returns the curated corpus
    * (full document rows) and the per-stage survivor counts.
    *
    * @param maxDupPerMille span-stage cut: drop docs whose duplicated
    *        gram instances exceed this per-mille of their grams
    *        (integer cross-multiplied — no fp boundary)
    * @param samplePerMille final deterministic downsample rate
    */
  def run(spark: SparkSession, dir: String, maxDupPerMille: Long = 300,
      samplePerMille: Int = 800,
      budgetTokens: Long = 600): (DataFrame, Report) = {
    val st = stages(spark, dir, maxDupPerMille, samplePerMille, budgetTokens)
    val counts = st.map(_._2.count())
    (st.last._2, Report(counts(0), counts(1), counts(2), counts(3),
      counts(4), counts(5), counts(6), counts(7)))
  }

  /** Gate `curation_job`: the COMPOSED pipeline board-verified
    * end-to-end (r14 verdict item 5) — every individually-gated stage
    * chained the production way, the full per-stage survivor
    * accounting riding as columns. The oracle ([[curationJobSql]])
    * replays the same chain as one DuckDB CTE, so a drift anywhere —
    * a stage whose threshold sees the wrong POPULATION (quantile
    * bands over the full corpus instead of the post-model corpus, a
    * budget cumsum admitting pre-dedup tokens), a wrong stage order,
    * a semi-join that duplicates — breaks either the id set or a
    * count column.
    */
  def curationJob(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = stages(spark, dir, materialize = true)
    val counts = st.map(_._2.count())
    val names = Seq("n_input", "n_rules", "n_model", "n_quantile",
      "n_exact", "n_spans", "n_budget", "n_sampled")
    names.zip(counts).foldLeft(st.last._2.select($"doc_id")) {
      case (df, (n, c)) => df.withColumn(n, lit(c))
    }.orderBy($"doc_id")
  }

  /** One CTE per stage; each stage's already-gated oracle SQL is
    * re-scoped from the raw documents table onto the previous stage's
    * survivor corpus (`FROM documents` → `FROM cK` — DuckDB allows a
    * WITH inside a derived table, so the stage oracles compose
    * verbatim and cannot drift from their single-stage gates).
    */
  def curationJobSql(maxDupPerMille: Long = 300, samplePerMille: Int = 800,
      budgetTokens: Long = 600): String = {
    def scoped(sql: String, corpus: String): String =
      sql.replace("FROM documents", s"FROM $corpus")
    s"""WITH
        g AS MATERIALIZED (SELECT doc_id FROM (${Curation.gopherFilterSql}) WHERE keep = 1),
        c1 AS MATERIALIZED (SELECT d.* FROM documents d JOIN g USING (doc_id)),
        q AS MATERIALIZED (SELECT doc_id
              FROM (${scoped(graft.operators.QualityModel.scoreDocumentsSql, "c1")})
              WHERE keep = 1),
        c2 AS MATERIALIZED (SELECT d.* FROM c1 d JOIN q USING (doc_id)),
        qt AS MATERIALIZED (SELECT doc_id FROM (${scoped(Curation.quantileCutByLangSql, "c2")})),
        c3 AS MATERIALIZED (SELECT d.* FROM c2 d JOIN qt USING (doc_id)),
        ex AS MATERIALIZED (SELECT doc_id FROM (${scoped(Dedup.exactSql, "c3")})),
        c4 AS MATERIALIZED (SELECT d.* FROM c3 d JOIN ex USING (doc_id)),
        sp AS MATERIALIZED (SELECT doc_id FROM (${scoped(Spans.spanDedupSql, "c4")})
               WHERE dup_instances * 1000 <= n_grams * $maxDupPerMille),
        c5 AS MATERIALIZED (SELECT d.* FROM c4 d JOIN sp USING (doc_id)),
        bt AS MATERIALIZED (SELECT doc_id, source,
                 CAST(len(list_filter(list_transform(
                   string_split(trim(text), ' '), x -> trim(x)),
                   x -> length(x) > 0)) AS BIGINT) AS n_tokens
               FROM c5),
        bc AS MATERIALIZED (SELECT doc_id,
                 CAST(sum(n_tokens) OVER (PARTITION BY source
                   ORDER BY ${graft.operators.Sampling.bucketSql("doc_id", "curation-cap")},
                            doc_id) AS BIGINT) AS cum_tokens
               FROM bt),
        c6 AS MATERIALIZED (SELECT d.* FROM c5 d
               JOIN (SELECT doc_id FROM bc WHERE cum_tokens <= $budgetTokens) bk
                 USING (doc_id)),
        c7 AS MATERIALIZED (SELECT doc_id FROM c6
               WHERE ${graft.operators.Sampling.bucketSql("doc_id", "curation")}
                       < $samplePerMille)
        SELECT doc_id,
               (SELECT count(*) FROM documents) AS n_input,
               (SELECT count(*) FROM c1) AS n_rules,
               (SELECT count(*) FROM c2) AS n_model,
               (SELECT count(*) FROM c3) AS n_quantile,
               (SELECT count(*) FROM c4) AS n_exact,
               (SELECT count(*) FROM c5) AS n_spans,
               (SELECT count(*) FROM c6) AS n_budget,
               (SELECT count(*) FROM c7) AS n_sampled
        FROM c7 ORDER BY doc_id"""
  }
}
