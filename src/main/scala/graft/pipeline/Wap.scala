package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Write-Audit-Publish — the lakehouse staging pattern (documented
  * publicly by Apache Iceberg as "WAP" and by Netflix's original
  * branch-audit workflow): a batch lands on a ZERO-COPY BRANCH of the
  * main table, the data-quality audit runs against the staged
  * snapshot, and only a clean audit merges the branch back — a dirty
  * batch never becomes readable from main, and the staged branch
  * stays on disk for inspection.
  *
  * Pure composition of gated primitives: [[ManifestTable.branchTo]]
  * (zero-copy fork, `lake_branch`), [[ManifestTable.append]] on the
  * branch, the caller's declarative audit (the
  * `validate_expectations` family), and
  * [[ManifestTable.mergeAppendsFrom]] (append-only merge with the
  * rewrite/delete divergence guards, `lake_branch_merge`). Everything
  * scale-relevant is inherited: the fork writes no data, the audit is
  * whatever aggregate the caller declares, the merge moves manifest
  * lines only.
  */
object Wap {

  /** @param main       the production table
    * @param batch      rows to stage
    * @param branchRoot where the staging branch lives
    * @param audit      staged-snapshot DataFrame → a frame with an
    *                   integer `n_violations` column (one row per
    *                   rule — the expectations shape)
    * @return (published, audit report collected). On a dirty audit
    *         main is untouched and the branch retains the staged
    *         batch for inspection.
    */
  def writeAuditPublish(main: ManifestTable, batch: DataFrame,
      branchRoot: String,
      audit: DataFrame => DataFrame): (Boolean, Seq[(String, Long)]) = {
    val v = main.currentVersion.getOrElse(
      throw new java.io.FileNotFoundException(
        s"WAP needs a committed main table"))
    val br = main.branchTo(branchRoot, v)
    br.append(batch)
    val report = audit(br.read()).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue)).toSeq
    val clean = report.forall(_._2 == 0L)
    if (clean) main.mergeAppendsFrom(br)
    (clean, report)
  }
}
