package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance over a
  * [[ManifestTable]] — the MV-refresh every warehouse offers for
  * distributive aggregates (COUNT/SUM per group; AVG derives from
  * them at read time). The state is ITSELF a reader-atomic
  * ManifestTable of |groups| rows, so a refresh is one atomic
  * commit, readers of the old state are never disturbed, and the
  * "which base version does this state reflect" watermark rides the
  * state commit's own `#batch=` marker — a crash between refresh
  * and any external bookkeeping cannot desynchronize them.
  *
  * Refresh cost shape: `refresh()` reads ONLY the segments appended
  * since the last reflected base version ([[ManifestTable.readSince]])
  * and folds their group-wise partial sums into the state —
  * O(|delta| + |groups|) per refresh, never a recompute of the
  * table. When the base history stopped being append-shaped (a
  * compaction / clustered rewrite / delete replaced segments —
  * readSince detects this and throws), refresh falls back to a full
  * recompute and re-baselines: correctness never depends on
  * append-only luck, the fallback is just the price of a rewrite.
  * Refreshing twice at the same base version is a no-op (the
  * watermark equality check), so replays are idempotent.
  */
class MaterializedAgg(base: ManifestTable, state: ManifestTable,
    groupCols: Seq[String], sumCols: Seq[String]) {
  require(groupCols.nonEmpty && sumCols.nonEmpty)

  private def partials(df: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The maintained aggregate as of the last refresh. */
  def read(): DataFrame = state.read()

  /** The base version the current state reflects, if any. */
  def reflectedVersion: Option[Long] = state.liveBatchId

  /** Bring the state up to the base's live version. Returns the mode
    * taken: "noop" (already current), "delta" (incremental merge of
    * appended segments only), or "full" (first build, or a rewrite
    * broke append containment).
    */
  def refresh(): String = {
    val baseV = base.versions.lastOption.getOrElse(
      throw new java.io.FileNotFoundException("base table has no committed version"))
    reflectedVersion match {
      case Some(v) if v == baseV => "noop"
      case Some(v) =>
        val delta =
          try Some(base.readSince(v))
          catch { case _: IllegalStateException => None }
        delta match {
          case Some(d) =>
            // state rows already carry the partial-sum schema, so the
            // merge is a union + re-sum over |groups| + |delta groups|
            // rows — the base table is never touched
            val reAggs = sum(col("n_rows")).as("n_rows") +:
              sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
            val merged = state.read().unionByName(partials(d))
              .groupBy(groupCols.map(col): _*)
              .agg(reAggs.head, reAggs.tail: _*)
              // the union reads the state's CURRENT segments lazily;
              // materialize before write() swaps them out underneath
              .localCheckpoint(true)
            state.write(merged, batchId = Some(baseV))
            "delta"
          case None =>
            state.write(partials(base.read()).localCheckpoint(true),
              batchId = Some(baseV))
            "full"
        }
      case None =>
        state.write(partials(base.read()).localCheckpoint(true),
          batchId = Some(baseV))
        "full"
    }
  }
}
