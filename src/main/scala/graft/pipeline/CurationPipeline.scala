package graft.pipeline

import graft.Tables
import graft.operators.{Curation, Dedup, Sampling, Spans}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed pretraining-data curation job — the LLM-side
  * analogue of [[EtlJob]]: every stage is one of the individually
  * gated operators, chained the way a production corpus build runs
  * them (cheap rules first so each later, costlier stage sees a
  * smaller corpus):
  *
  *  1. Gopher rule battery        (zero-shuffle scan filter)
  *  2. per-language quantile band (histogram ranks, broadcast back)
  *  3. exact dedup, keep-first    (16-byte md5 keys shuffle)
  *  4. span-duplication cut       (gram-key window + per-doc agg)
  *  5. deterministic hash sample  (zero-shuffle md5 bucket)
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

  case class Report(input: Long, afterRules: Long, afterQuantile: Long,
      afterExact: Long, afterSpans: Long, sampled: Long) {
    def stages: Seq[Long] =
      Seq(input, afterRules, afterQuantile, afterExact, afterSpans, sampled)
  }

  /** The staged survivor chain, in order, as (stage name, frame) —
    * `stages.last._2` is the curated corpus. Exposed so callers that
    * need per-stage instrumentation (tools/CurationScale's wall-time
    * runs) can action each stage themselves.
    */
  def stages(spark: SparkSession, dir: String, maxDupPerMille: Long = 300,
      samplePerMille: Int = 800): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)

    val rulesOk = Curation.gopherFilterOf(spark, docs)
      .filter($"keep" === 1L).select($"doc_id")
    val d1 = docs.join(rulesOk, Seq("doc_id"), "left_semi")

    val quantOk = Curation.quantileCutByOf(
      d1.select($"doc_id", $"lang",
        size(Dedup.tokensCol($"text")).cast("long").as("n_tokens")),
      "lang", "n_tokens", loNum = 1, loDen = 10, hiNum = 9, hiDen = 10)
      .select($"doc_id")
    val d2 = d1.join(quantOk, Seq("doc_id"), "left_semi")

    val exactOk = Dedup.exactByHash(d2, $"text", $"doc_id")
      .select($"keep_id".as("doc_id"))
    val d3 = d2.join(exactOk, Seq("doc_id"), "left_semi")

    val spanOk = Spans.spanDedupOf(d3.select($"doc_id", $"source", $"text"))
      .filter($"dup_instances" * 1000L <= $"n_grams" * maxDupPerMille)
      .select($"doc_id")
    val d4 = d3.join(spanOk, Seq("doc_id"), "left_semi")

    val out = Sampling.hashSample(d4, $"doc_id", samplePerMille,
      salt = "curation")
    Seq("input" -> docs, "rules" -> d1, "quantile" -> d2,
      "exact" -> d3, "spans" -> d4, "sample" -> out)
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
      samplePerMille: Int = 800): (DataFrame, Report) = {
    val st = stages(spark, dir, maxDupPerMille, samplePerMille)
    val counts = st.map(_._2.count())
    (st.last._2, Report(counts(0), counts(1), counts(2), counts(3),
      counts(4), counts(5)))
  }
}
