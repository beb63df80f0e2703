package graft.operators

import graft.Tables
import graft.pipeline.ManifestTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate-shaped lakehouse read path: z-order-cluster the documents
  * table into a fresh versioned ManifestTable (temp dir), then answer
  * a 2-D box query through readWhereAll's zone-map skipping. The
  * RESULT is layout-independent — exactly the rows a plain filter
  * over the source table returns — which is what lets a plain DuckDB
  * filter oracle hash-gate the whole write → manifest → skip → read
  * path (clustered staging, per-segment stats, segment pruning,
  * row-level residual filter). Skipping EFFECTIVENESS (that pruning
  * actually prunes) is ZorderSpec's job; this gate pins that skipping
  * never becomes filtering.
  */
object Lake {

  def zorderRead(spark: SparkSession, dir: String,
      idLo: Long = 100, idHi: Long = 399,
      chLo: Long = 150, chHi: Long = 400): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_gate")
        + "/documents")
    t.writeClustered(docs, Seq("doc_id", "n_chars"), nSegments = 8)
    t.readWhereAll(Seq(("doc_id", idLo.toDouble, idHi.toDouble),
        ("n_chars", chLo.toDouble, chHi.toDouble)))
      .select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def zorderReadSql(idLo: Long = 100, idHi: Long = 399,
      chLo: Long = 150, chHi: Long = 400): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id BETWEEN $idLo AND $idHi
          AND n_chars BETWEEN $chLo AND $chHi"""

  /** Bloom point-lookup gated end-to-end: land orders as 8 HASH-split
    * segments — every segment's o_orderkey [min, max] spans nearly
    * the whole key domain, so zone maps prune NOTHING and any
    * skipping must come from the per-segment Bloom sidecars — then
    * probe a fixed key set through readPoint and report a per-probe
    * census. The op itself requires the bloom to actually prune
    * (candidates < segments for every probe), so an all-pass filter
    * fails the gate instead of passing vacuously; the oracle is a
    * plain probe join — skipping must be invisible to the result.
    */
  def bloomRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one source materialization — the 8 segment writes below read
    // the checkpoint blocks, not 8 re-scans of the parquet
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .localCheckpoint(true)
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_bloom") + "/orders")
    // Stage the 8 hash-split segments CONCURRENTLY, publish them as
    // ONE atomic commit (guide §2.6 — independent jobs overlap, so
    // one write's task tail back-fills with the next write's tasks;
    // stage() is commit-free, so there is no optimistic-commit race
    // to lose). Identical table state to 8 appends — same 8 segments,
    // same per-segment stats and Bloom sidecars, one manifest —
    // but 1 source scan + 1 manifest cycle instead of 8 sequential
    // append lifecycles (scan + live-schema read + version commit
    // each). The r16 probe charged ~4 s of this gate's 8.5 s to that
    // driver-side parade (57 jobs, job wall only 4.6 s).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val segs = Await.result(Future.sequence((0 until 8).map { i =>
      Future(t.stage(orders.filter(pmod($"o_orderkey", lit(8L)) === i), 1L,
        statCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey")))
    }), Duration.Inf)
    t.commit(1L, segs, ownStaged = segs.map(_.dir))
    bloomProbes.foreach { k =>
      val cand = t.pointCandidates("o_orderkey", k).size
      require(cand < t.segmentCount,
        s"bloom pruned nothing for key $k: $cand of ${t.segmentCount} segments")
    }
    bloomProbes.map { k =>
        t.readPoint("o_orderkey", k)
          .select(lit(k).as("probe"), $"o_custkey",
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      }.reduce(_ unionByName _)
      .groupBy($"probe")
      .agg(count(lit(1)).as("n"), sum($"o_custkey").as("cust_sum"),
        sum($"cents").as("cents_sum"))
      .orderBy($"probe")
  }

  /** Present at every SF (orderkeys are dense from 0) + one absent. */
  private val bloomProbes = Seq(31L, 500L, 777L, 999L, 1300L, 999999999L)

  val bloomReadSql: String =
    s"""WITH probes(probe) AS (
          VALUES ${bloomProbes.map(k => s"($k)").mkString(", ")})
        SELECT CAST(probe AS BIGINT) AS probe,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM orders JOIN probes ON o_orderkey = probe
        GROUP BY 1 ORDER BY 1"""

  /** Incremental MV refresh gated end-to-end: maintain the per-lang
    * (count, char-sum) aggregate across an append stream, exercising
    * all three refresh modes — full build, delta merge (band 3's
    * segment is the only base data read), noop at an unchanged base,
    * and the full-recompute fallback after a compaction rewrite
    * breaks append containment. The modes are REQUIRED (a refresh
    * that silently full-recomputes every time fails the gate), and
    * the final state must equal the plain aggregate the oracle runs
    * — maintenance must be invisible to the result.
    */
  def mvRefreshRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val root = graft.util.Scratch.dir("graft_lake_mv")
    val t = new ManifestTable(spark, root + "/documents")
    val mv = new graft.pipeline.MaterializedAgg(t,
      new ManifestTable(spark, root + "/mv"),
      groupCols = Seq("lang"), sumCols = Seq("n_chars"))
    val bands = Seq((Long.MinValue, 150L), (150L, 300L), (300L, 450L),
      (450L, Long.MaxValue))
    def land(i: Int): Unit = {
      val (lo, hi) = bands(i)
      t.append(docs.filter($"n_chars" > lo && $"n_chars" <= hi))
    }
    land(0); land(1)
    require(mv.refresh() == "full", "first refresh must build")
    land(2)
    require(mv.refresh() == "delta", "append must refresh incrementally")
    require(mv.refresh() == "noop", "unchanged base must be a noop")
    t.compact()
    land(3)
    require(mv.refresh() == "full", "a rewrite must force re-baseline")
    mv.read()
      .select($"lang", $"n_rows".as("n_docs"),
        $"sum_n_chars".as("chars_sum"))
      .orderBy($"lang")
  }

  val mvRefreshReadSql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS chars_sum
       FROM documents GROUP BY 1 ORDER BY 1"""

  /** Gate-shaped time travel: commit the short-document slice as v1,
    * append the rest (v2 = the whole table), then read v1 back
    * through the manifest. The v1 snapshot is definitionally the
    * filter that built it, so a plain DuckDB filter hash-gates the
    * versioned write → commit → readVersion path — including that
    * the append did NOT leak v2 rows into the v1 snapshot.
    */
  def timeTravelRead(spark: SparkSession, dir: String,
      cut: Long = 300): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_tt")
        + "/documents")
    val v1 = t.write(docs.filter($"n_chars" <= cut))
    t.append(docs.filter($"n_chars" > cut))
    t.readVersion(v1).select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def timeTravelReadSql(cut: Long = 300): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE n_chars <= $cut"""

  /** Gate-shaped additive schema evolution: v1 lands WITHOUT the
    * lang column, the append introduces it, and the live read must
    * null-fill the pre-evolution rows — which is exactly a CASE
    * filter over the source, so a plain oracle hash-gates the
    * parquet footer-merge read path (including that no pre-evolution
    * row invents a value and no post-evolution row loses one).
    */
  def evolutionRead(spark: SparkSession, dir: String,
      cut: Long = 300): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_evo") + "/documents")
    t.write(docs.filter($"n_chars" <= cut).select($"doc_id", $"n_chars"))
    t.append(docs.filter($"n_chars" > cut)
      .select($"doc_id", $"n_chars", $"lang"))
    t.read().select($"doc_id", $"n_chars", $"lang")
  }

  def evolutionReadSql(cut: Long = 300): String =
    s"""SELECT doc_id, n_chars,
          CASE WHEN n_chars > $cut THEN lang ELSE NULL END AS lang
        FROM documents"""

  /** Gate-shaped zero-copy branch: main table gets two versions
    * (≤cut, then the rest appended); a branch forks at v1, receives
    * its OWN divergent append (the src1 slice of the rest), and is
    * read back. The result is definitionally snapshot ∪ branch-append
    * — a plain filter oracle — and the gate reads main's live
    * version too, verifying isolation by checksum columns: a branch
    * write that leaked into main (or a fork that missed/extra'd
    * segments) shifts `main_rows`/`main_chars` and hash-fails.
    */
  def branchRead(spark: SparkSession, dir: String,
      cut: Long = 300): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_branch") + "/documents")
    val v1 = t.write(docs.filter($"n_chars" <= cut))
    t.append(docs.filter($"n_chars" > cut))
    val br = t.branchTo(
      graft.util.Scratch.dir("graft_lake_branch_b") + "/documents", v1)
    br.append(docs.filter($"n_chars" > cut && $"source" === "src1"))
    val main = t.read().agg(count(lit(1)).as("main_rows"),
      sum($"n_chars").as("main_chars"))
    br.read().select($"doc_id", $"lang", $"source", $"n_chars")
      .crossJoin(broadcast(main))
  }

  /** Gate-shaped branch → merge round trip: fork at v1 (≤cut), give
    * the branch a divergent append (the src1 slice of the rest),
    * merge it back, and read MAIN. Result = everything main ever had
    * plus the branch delta — a filter oracle; the merged rows must
    * be re-owned by main, which the spec checks structurally.
    */
  def branchMergeRead(spark: SparkSession, dir: String,
      cut: Long = 300): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_merge") + "/documents")
    val v1 = t.write(docs.filter($"n_chars" <= cut))
    val br = t.branchTo(
      graft.util.Scratch.dir("graft_lake_merge_b") + "/documents", v1)
    br.append(docs.filter($"n_chars" > cut && $"source" === "src1"))
    t.mergeAppendsFrom(br)
    t.read().select($"doc_id", $"lang", $"source", $"n_chars")
  }

  /** Gate `lake_wap`: the Write-Audit-Publish composition
    * ([[graft.pipeline.Wap.writeAuditPublish]], SURVEY 13w)
    * board-verified end-to-end. Main starts as the click events; a
    * CLEAN batch (the view events) and a DIRTY batch (the error
    * events with a planted violation — event ids negated) each go
    * through the full stage→audit→publish lifecycle under the same
    * declarative rule (`no negative event_id`). The clean batch must
    * merge into main; the dirty batch must leave main untouched
    * while its staging branch retains the batch for inspection.
    * Result = main's live rows after both runs — a plain filter
    * oracle — with the three lifecycle verdicts riding as columns
    * (the lake_sorted_export device), so a WAP that publishes dirt,
    * blocks clean data, or loses the staged evidence hash-fails.
    */
  def wapRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.pipeline.Wap
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_wap") + "/events")
    t.write(ev.filter($"event_type" === "click"))
    def audit(staged: DataFrame): DataFrame =
      staged.agg(coalesce(sum(when($"event_id" < 0, 1L).otherwise(0L)),
          lit(0L)).as("n_violations"))
        .select(lit("nonneg_event_id").as("rule"), $"n_violations")
    val (cleanPub, _) = Wap.writeAuditPublish(t,
      ev.filter($"event_type" === "view"),
      graft.util.Scratch.dir("graft_lake_wap_clean") + "/events", audit)
    val dirty = ev.filter($"event_type" === "error")
      .withColumn("event_id", -$"event_id" - 1L)
    val dirtyRoot = graft.util.Scratch.dir("graft_lake_wap_dirty") + "/events"
    val (dirtyPub, dirtyReport) = Wap.writeAuditPublish(t, dirty,
      dirtyRoot, audit)
    // the staged branch must retain the dirty batch for inspection
    val stagedDirty = new ManifestTable(spark, dirtyRoot).read()
      .filter($"event_id" < 0).count()
    val nDirty = dirty.count()
    t.read().select($"event_id", $"user_id", $"event_type", $"value")
      .withColumn("clean_published", lit(cleanPub))
      .withColumn("dirty_published", lit(dirtyPub))
      .withColumn("dirty_staged", lit(stagedDirty == nDirty && nDirty > 0 &&
        dirtyReport == Seq(("nonneg_event_id", nDirty))))
      .orderBy($"event_id")
  }

  val wapReadSql: String =
    """SELECT event_id, user_id, event_type, value,
              TRUE AS clean_published, FALSE AS dirty_published,
              TRUE AS dirty_staged
       FROM events WHERE event_type IN ('click', 'view')
       ORDER BY event_id"""

  /** Gate `lake_check`: the Delta-style table-level CHECK constraint
    * lifecycle (SURVEY 13s) board-verified end-to-end. Main starts as
    * the click events; `event_id >= 0` is registered as a table
    * constraint (the live data satisfies it — registration itself
    * validates); a CLEAN batch (views) then lands through the
    * constraint gate, a DIRTY batch (errors with negated ids) must be
    * rejected WHOLE with nothing committed, and registering a
    * constraint the live data violates (`event_id < 0`, false for
    * every row) must itself be rejected without registering. Result =
    * main's live rows — a plain filter oracle — with the rejection
    * verdicts and the surviving constraint count riding as columns,
    * so a constraint gate that admits dirt, blocks clean data, or
    * silently registers a broken rule hash-fails.
    */
  def checkRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_check") + "/events")
    t.write(ev.filter($"event_type" === "click"))
    t.addCheck("event_id >= 0")
    t.append(ev.filter($"event_type" === "view")) // clean: must pass the gate
    val dirtyRejected = try {
      t.append(ev.filter($"event_type" === "error")
        .withColumn("event_id", -$"event_id" - 1L))
      false
    } catch { case _: IllegalArgumentException => true }
    val badCheckRejected = try {
      t.addCheck("event_id < 0") // every live row violates
      false
    } catch { case _: IllegalArgumentException => true }
    t.read().select($"event_id", $"user_id", $"event_type", $"value")
      .withColumn("n_checks", lit(t.checks.size.toLong))
      .withColumn("dirty_rejected", lit(dirtyRejected))
      .withColumn("bad_check_rejected", lit(badCheckRejected))
      .orderBy($"event_id")
  }

  val checkReadSql: String =
    """SELECT event_id, user_id, event_type, value,
              CAST(1 AS BIGINT) AS n_checks,
              TRUE AS dirty_rejected, TRUE AS bad_check_rejected
       FROM events WHERE event_type IN ('click', 'view')
       ORDER BY event_id"""

  /** Gate `lake_history`: the DESCRIBE HISTORY metadata census
    * (SURVEY lakehouse observability row) board-verified against
    * data-derived quantities instead of constants. A scripted
    * lifecycle — write(clicks) → append(views, batch 7) →
    * addCheck → MoR box delete — leaves four readable versions whose
    * (segments, delete files, checks, batch marker) census the
    * manifest must report exactly, and each version's ROW COUNT is
    * read back through [[ManifestTable.readVersion]] so the census is
    * pinned to the events table's own counts (a history that
    * misattributes a dv to the wrong version, drops the batch
    * marker, or lets the delete bleed across versions hash-fails).
    */
  def historyRead(spark: SparkSession, dir: String,
      delLo: Long = 0, delHi: Long = 500): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_history") + "/events")
    t.write(ev.filter($"event_type" === "click"), statCols = Seq("event_id"))
    t.append(ev.filter($"event_type" === "view"), batchId = Some(7L),
      statCols = Seq("event_id"))
    t.addCheck("event_id >= 0")
    t.deleteWhereMor(Seq(("event_id", delLo.toDouble, delHi.toDouble)),
      "event_id")
    // a box that matches nothing commits no version — fail loudly
    // naming the data precondition instead of hash-mismatching
    require(t.history.size == 4,
      s"lake_history: delete box [$delLo,$delHi] matched no click/view " +
        s"event_id — got ${t.history.size} versions, expected 4")
    val rows = t.history.map { h =>
      (h.version, h.segments.toLong, h.deleteFiles.toLong, h.checks.toLong,
        h.batchId, t.readVersion(h.version).count())
    }
    rows.toDF("version", "segments", "delete_files", "n_checks",
        "batch_id", "n_rows")
      .orderBy($"version")
  }

  def historyReadSql(delLo: Long = 0, delHi: Long = 500): String =
    s"""WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events
                   WHERE event_type = 'click'),
          cv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events
                 WHERE event_type IN ('click', 'view')),
          d AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events
                WHERE event_type IN ('click', 'view')
                  AND event_id BETWEEN $delLo AND $delHi)
        SELECT CAST(version AS BIGINT) AS version,
               CAST(segments AS BIGINT) AS segments,
               CAST(delete_files AS BIGINT) AS delete_files,
               CAST(n_checks AS BIGINT) AS n_checks,
               CAST(batch_id AS BIGINT) AS batch_id,
               CAST(n_rows AS BIGINT) AS n_rows
        FROM (
          SELECT 1 AS version, 1 AS segments, 0 AS delete_files,
                 0 AS n_checks, NULL AS batch_id,
                 (SELECT n FROM c) AS n_rows
          UNION ALL SELECT 2, 2, 0, 0, 7, (SELECT n FROM cv)
          UNION ALL SELECT 3, 2, 0, 1, NULL, (SELECT n FROM cv)
          UNION ALL SELECT 4, 2, 1, 1, NULL,
                 (SELECT n FROM cv) - (SELECT n FROM d))
        ORDER BY version"""

  def branchMergeReadSql(cut: Long = 300): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE n_chars <= $cut OR source = 'src1'"""

  def branchReadSql(cut: Long = 300): String =
    s"""WITH m AS (
          SELECT CAST(count(*) AS BIGINT) AS main_rows,
                 CAST(sum(n_chars) AS BIGINT) AS main_chars
          FROM documents)
        SELECT doc_id, lang, source, n_chars, main_rows, main_chars
        FROM documents, m
        WHERE n_chars <= $cut OR source = 'src1'"""

  /** The 4-batch append chain both remaining gates build on:
    * n_chars bands (≤150, 151–300, 301–450, >450) appended as
    * separate stat-tracked segments, so box predicates can prune /
    * carry whole segments. Returns (table, version after batch 1).
    */
  private def bandedTable(spark: SparkSession, dir: String,
      prefix: String): (ManifestTable, Long) = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir(prefix) + "/documents")
    val bands = Seq((Long.MinValue, 150L), (150L, 300L), (300L, 450L),
      (450L, Long.MaxValue))
    var v1 = 0L
    bands.zipWithIndex.foreach { case ((lo, hi), i) =>
      val v = t.append(docs.filter($"n_chars" > lo && $"n_chars" <= hi),
        statCols = Seq("n_chars"))
      if (i == 0) v1 = v
    }
    (t, v1)
  }

  /** Gate-shaped copy-on-write delete: append the four n_chars bands
    * as stat-tracked segments, box-delete [200, 400], read the new
    * version. The surviving rows are definitionally the complement
    * filter, so a plain oracle hash-gates stage → stats → write-side
    * pruning → rewrite → commit — including that carried-over
    * segments (bands 1 and 4, which the stats rule out) lost nothing.
    */
  def deleteRead(spark: SparkSession, dir: String,
      lo: Long = 200, hi: Long = 400): DataFrame = {
    import spark.implicits._
    val (t, _) = bandedTable(spark, dir, "graft_lake_del")
    t.deleteWhere(Seq(("n_chars", lo.toDouble, hi.toDouble)))
    t.read().select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def deleteReadSql(lo: Long = 200, hi: Long = 400): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE n_chars NOT BETWEEN $lo AND $hi"""

  /** Gate-shaped MERGE-ON-READ delete: same banded table, but the
    * [200, 400] box is deleted as an equality-delete file (doc_id
    * keys) with ZERO data rewrite — the gate asserts that in-line
    * (every pre-delete segment dir must still be listed live, and
    * exactly one delete file must exist). Then a slice of the
    * deleted rows (250, 300] is RE-APPENDED: the dv's version
    * horizon must not retro-delete the new segment, so those rows
    * come back — the sequence-scoping semantics pinned cross-engine.
    */
  def deleteMorRead(spark: SparkSession, dir: String,
      lo: Long = 200, hi: Long = 400): DataFrame = {
    import spark.implicits._
    val (t, _) = bandedTable(spark, dir, "graft_lake_mor")
    val segsBefore = t.overlappingSegments(
      Seq(("n_chars", Double.NegativeInfinity, Double.PositiveInfinity)))
      .map(_.dir.getName).toSet
    t.deleteWhereMor(Seq(("n_chars", lo.toDouble, hi.toDouble)), "doc_id")
    val segsAfter = t.overlappingSegments(
      Seq(("n_chars", Double.NegativeInfinity, Double.PositiveInfinity)))
      .map(_.dir.getName).toSet
    require(segsAfter == segsBefore && t.deleteFileCount == 1,
      s"MoR delete must rewrite nothing: before=$segsBefore " +
        s"after=$segsAfter dvs=${t.deleteFileCount}")
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    t.append(docs.filter($"n_chars" > 250 && $"n_chars" <= 300),
      statCols = Seq("n_chars"))
    t.read().select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def deleteMorReadSql(lo: Long = 200, hi: Long = 400): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE n_chars NOT BETWEEN $lo AND $hi
        UNION ALL
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE n_chars > 250 AND n_chars <= 300"""

  /** Gate-shaped merge-on-read UPSERT: the banded table takes ONE
    * atomic commit that replaces every (200, 300] doc (same doc_id,
    * source rewritten to 'upd') — matched keys replaced, no old
    * segment rewritten (asserted in-line, as in [[deleteMorRead]]).
    */
  def upsertMorRead(spark: SparkSession, dir: String,
      lo: Long = 200, hi: Long = 300): DataFrame = {
    import spark.implicits._
    val (t, _) = bandedTable(spark, dir, "graft_lake_ups")
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val before = t.overlappingSegments(
      Seq(("n_chars", Double.NegativeInfinity, Double.PositiveInfinity)))
      .map(_.dir.getName).toSet
    t.upsertMor(docs.filter($"n_chars" > lo && $"n_chars" <= hi)
        .withColumn("source", lit("upd")),
      "doc_id", statCols = Seq("n_chars"))
    val after = t.overlappingSegments(
      Seq(("n_chars", Double.NegativeInfinity, Double.PositiveInfinity)))
      .map(_.dir.getName).toSet
    require(before.subsetOf(after) && t.deleteFileCount == 1,
      s"MoR upsert must rewrite nothing: lost=${before -- after} " +
        s"dvs=${t.deleteFileCount}")
    t.read().select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def upsertMorReadSql(lo: Long = 200, hi: Long = 300): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE NOT (n_chars > $lo AND n_chars <= $hi)
        UNION ALL
        SELECT doc_id, lang, 'upd' AS source, n_chars FROM documents
        WHERE n_chars > $lo AND n_chars <= $hi"""

  /** Gate-shaped incremental consumption: same banded append chain,
    * then readSince(version of batch 1) — exactly the rows batches
    * 2–4 appended, i.e. everything above the first band's 150-char
    * cut (the boundary [[bandedTable]] fixes).
    */
  def incrementalRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (t, v1) = bandedTable(spark, dir, "graft_lake_inc")
    t.readSince(v1).select($"doc_id", $"lang", $"source", $"n_chars")
  }

  val incrementalReadSql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
       WHERE n_chars > 150"""

  /** Small-file compaction gated end-to-end: land the documents table
    * deliberately fragmented (64 files), run [[graft.pipeline.
    * Maintenance.compact]]'s atomic-swap rewrite, and answer a
    * filtered query from the compacted layout. The oracle is a plain
    * filter over the source table — compaction must be invisible to
    * every reader — and the op itself requires the file count to
    * actually DROP, so a compactor that silently no-ops fails the
    * gate rather than passing vacuously.
    */
  def compactionRead(spark: SparkSession, dir: String,
      minChars: Long = 250): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val path = graft.util.Scratch.dir("graft_lake_compact") + "/documents"
    docs.repartition(64).write.mode("overwrite").parquet(path)
    val (before, after) = graft.pipeline.Maintenance.compact(spark, path)
    require(after < before,
      s"compaction did not reduce files: $before -> $after")
    spark.read.parquet(path)
      .filter($"n_chars" >= minChars)
      .select($"doc_id", $"lang", $"source", $"n_chars")
  }

  def compactionReadSql(minChars: Long = 250): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE n_chars >= $minChars"""

  /** Hive-style partitioned sink gated end-to-end: land orders
    * partitioned by year, read back through a partition-pruned scan
    * (PlanAuditSpec pins the PartitionFilters entry — only the 1996
    * directory is touched), answer vs a plain filter oracle. The
    * year column round-trips through the directory NAME, so the gate
    * also proves partition-value encode/decode.
    */
  def partitionedRead(spark: SparkSession, dir: String, yr: Int = 1996)
      : DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .withColumn("yr", year($"o_orderdate"))
    val path = graft.util.Scratch.dir("graft_lake_part") + "/orders"
    o.write.mode("overwrite").partitionBy("yr").parquet(path)
    spark.read.parquet(path)
      .filter($"yr" === yr)
      .select($"o_orderkey", $"o_custkey",
        round($"o_totalprice", 2).as("price"))
      .orderBy($"o_orderkey")
  }

  def partitionedReadSql(yr: Int = 1996): String =
    s"""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders WHERE year(o_orderdate) = $yr
        ORDER BY o_orderkey"""

  /** Bucketed co-located join gated end-to-end: both sides land as
    * bucketBy(8, key)+sortBy managed tables, the join runs with ZERO
    * exchange (BucketingSpec's plan pin), and the aggregate matches
    * the plain-join oracle — layout invisible, shuffle eliminated.
    * Integer-cents revenue keeps the equality exact.
    */
  def bucketedJoinRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.sources.Bucketing.writeBucketed(
      Tables.orders(spark, dir).select($"o_custkey".as("custkey"),
        round($"o_totalprice" * 100).cast("long").as("cents")),
      "graft_gate_bkt_orders", "custkey", 8)
    graft.sources.Bucketing.writeBucketed(
      Tables.customer(spark, dir).select($"c_custkey".as("custkey"),
        $"c_mktsegment"),
      "graft_gate_bkt_customer", "custkey", 8)
    graft.sources.Bucketing.coLocatedJoin(spark,
        "graft_gate_bkt_orders", "graft_gate_bkt_customer", "custkey")
      .groupBy($"c_mktsegment".as("segment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"cents").cast("double") / 100.0, 2).as("revenue"))
      .orderBy($"segment")
  }

  val bucketedJoinReadSql: String =
    """SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_orders,
              round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                         AS DOUBLE) / 100.0, 2) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY 1 ORDER BY 1"""

  /** Gate-shaped DYNAMIC partition overwrite — the "rewrite one day
    * without clobbering the table" op every partitioned lake needs:
    * with partitionOverwriteMode=dynamic, an overwrite-mode write
    * replaces ONLY the partitions present in the incoming frame
    * (static mode — the default — would truncate the whole table
    * first, the classic data-loss foot-gun). The gate lands orders
    * partitioned by year, then overwrites just the 1997 partition
    * with a deterministically-restated slice (prices re-signed as
    * integer cents); the read-back must show 1997 restated and every
    * other year byte-identical — which is exactly a CASE-split
    * oracle.
    */
  def dynamicOverwriteRead(spark: SparkSession, dir: String,
      yr: Int = 1997): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        year($"o_orderdate").as("yr"))
    val path = graft.util.Scratch.dir("graft_lake_dynow") + "/orders"
    o.write.mode("overwrite").partitionBy("yr").parquet(path)
    val restated = o.filter($"yr" === yr)
      .withColumn("cents", -$"cents")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try restated.write.mode("overwrite").partitionBy("yr").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    spark.read.parquet(path)
      .select($"o_orderkey", $"o_custkey", $"cents", $"yr".cast("long").as("yr"))
      .orderBy($"o_orderkey")
  }

  def dynamicOverwriteReadSql(yr: Int = 1997): String =
    s"""SELECT o_orderkey, o_custkey,
          CASE WHEN year(o_orderdate) = $yr
               THEN -CAST(round(o_totalprice * 100) AS BIGINT)
               ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents,
          CAST(year(o_orderdate) AS BIGINT) AS yr
        FROM orders ORDER BY o_orderkey"""

  /** Gate-shaped VERSION DIFF — "what changed between v1 and v3": a
    * three-version history (write ≤cut → append mid-band → deleteWhere
    * a sub-box of v1's rows) is diffed by two anti-joins on the key:
    * rows in v3 not in v1 tagged `added`, rows in v1 not in v3 tagged
    * `removed`. This is the audit/CDC read a lakehouse must answer
    * when the consumer can't subscribe incrementally ([[ManifestTable
    * .readSince]] needs append-only history; the diff works across
    * REWRITES, at two-snapshot-scan cost). The result is
    * definitionally two band filters, so a plain oracle hash-gates
    * the whole history: a delete that leaked into the wrong version,
    * a carried-over segment double-read, or an anti-join slip all
    * shift the diff.
    */
  def versionDiffRead(spark: SparkSession, dir: String,
      cut: Long = 300): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_diff") + "/documents")
    val v1 = t.write(docs.filter($"n_chars" <= cut), statCols = Seq("n_chars"))
    t.append(docs.filter($"n_chars" > cut && $"n_chars" <= cut * 2),
      statCols = Seq("n_chars"))
    val v3 = t.deleteWhere(Seq(("n_chars", 0.0, (cut / 2).toDouble)))
    val a = t.readVersion(v1).select($"doc_id", $"n_chars")
    val b = t.readVersion(v3).select($"doc_id", $"n_chars")
    b.join(a.select($"doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("change", lit("added"))
      .unionByName(
        a.join(b.select($"doc_id"), Seq("doc_id"), "left_anti")
          .withColumn("change", lit("removed")))
      .orderBy($"change", $"doc_id")
  }

  def versionDiffReadSql(cut: Long = 300): String =
    s"""SELECT doc_id, n_chars, 'added' AS change FROM documents
        WHERE n_chars > $cut AND n_chars <= ${cut * 2}
        UNION ALL
        SELECT doc_id, n_chars, 'removed' FROM documents
        WHERE n_chars <= ${cut / 2}
        ORDER BY change, doc_id"""

  /** Gate-shaped RESTORE: three-version history (write ≤cut → append
    * mid-band → deleteWhere a sub-box), then roll back to v1 and read
    * the LIVE table. The live read after rollback is definitionally
    * v1's filter, so a plain oracle hash-gates the whole
    * rollback-as-new-commit path — the append must vanish from the
    * live view, the delete must un-happen, and history must have
    * grown (the gate requires a fourth version, i.e. rollback
    * committed forward rather than rewriting the past).
    */
  def rollbackRead(spark: SparkSession, dir: String,
      cut: Long = 300): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars")
    val t = new ManifestTable(spark,
      graft.util.Scratch.dir("graft_lake_rb") + "/documents")
    val v1 = t.write(docs.filter($"n_chars" <= cut), statCols = Seq("n_chars"))
    t.append(docs.filter($"n_chars" > cut && $"n_chars" <= cut * 2),
      statCols = Seq("n_chars"))
    val v3 = t.deleteWhere(Seq(("n_chars", 0.0, (cut / 2).toDouble)))
    val v4 = t.rollbackTo(v1)
    require(v4 > v3, s"rollback must commit FORWARD (v4=$v4, v3=$v3)")
    t.read().select($"doc_id", $"n_chars")
  }

  def rollbackReadSql(cut: Long = 300): String =
    s"""SELECT doc_id, n_chars FROM documents WHERE n_chars <= $cut"""
}
