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
      budgetTokens: Long = 600): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)

    val rulesOk = Curation.gopherFilterOf(spark, docs)
      .filter($"keep" === 1L).select($"doc_id")
    val d1 = docs.join(rulesOk, Seq("doc_id"), "left_semi")

    val modelOk = QualityModel.score(d1.select($"doc_id", $"text"))
      .filter($"keep" === 1L).select($"doc_id")
    val d2 = d1.join(modelOk, Seq("doc_id"), "left_semi")

    val quantOk = Curation.quantileCutByOf(
      d2.select($"doc_id", $"lang",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens")),
      "lang", "n_tokens", loNum = 1, loDen = 10, hiNum = 9, hiDen = 10)
      .select($"doc_id")
    val d3 = d2.join(quantOk, Seq("doc_id"), "left_semi")

    val exactOk = Dedup.exactByHash(d3, $"text", $"doc_id")
      .select($"keep_id".as("doc_id"))
    val d4 = d3.join(exactOk, Seq("doc_id"), "left_semi")

    val spanOk = Spans.spanDedupOf(d4.select($"doc_id", $"source", $"text"))
      .filter($"dup_instances" * 1000L <= $"n_grams" * maxDupPerMille)
      .select($"doc_id")
    val d5 = d4.join(spanOk, Seq("doc_id"), "left_semi")

    val budgetOk = Sampling.capTokensPerSource(
      d5.select($"doc_id", $"source",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens")),
      budgetTokens, salt = "curation-cap")
      .select($"doc_id")
    val d6 = d5.join(budgetOk, Seq("doc_id"), "left_semi")

    val out = Sampling.hashSample(d6, $"doc_id", samplePerMille,
      salt = "curation")
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
}
