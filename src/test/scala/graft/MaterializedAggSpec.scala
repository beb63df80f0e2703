package graft

import graft.pipeline.{ManifestTable, MaterializedAgg}
import org.apache.spark.sql.functions._

/** The maintained aggregate must equal a fresh recompute after EVERY
  * refresh, whichever mode the refresh took — incremental
  * maintenance is a plan change, never a semantics change.
  */
class MaterializedAggSpec extends SparkSpec {

  private def fresh(): (ManifestTable, MaterializedAgg) = {
    val root = java.nio.file.Files.createTempDirectory("mv_spec").toString
    val base = new ManifestTable(spark, root + "/base")
    val mv = new MaterializedAgg(base, new ManifestTable(spark, root + "/mv"),
      groupCols = Seq("g"), sumCols = Seq("x"))
    (base, mv)
  }

  private def stateOf(mv: MaterializedAgg): Map[String, (Long, Long)] =
    mv.read().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def recompute(base: ManifestTable): Map[String, (Long, Long)] =
    base.read().groupBy(col("g"))
      .agg(count(lit(1)), sum(col("x")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("refresh modes: full build → delta merge → noop → rewrite fallback; state ≡ recompute throughout") {
    import spark.implicits._
    val (base, mv) = fresh()
    base.append(Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("g", "x"))
    assert(mv.refresh() == "full")
    assert(stateOf(mv) == Map("a" -> (2L, 3L), "b" -> (1L, 10L)))
    assert(mv.reflectedVersion.contains(base.versions.last))

    // append: delta path, including a brand-new group
    base.append(Seq(("a", 4L), ("c", 7L)).toDF("g", "x"))
    assert(mv.refresh() == "delta")
    assert(stateOf(mv) == recompute(base))
    assert(stateOf(mv) == Map("a" -> (3L, 7L), "b" -> (1L, 10L),
      "c" -> (1L, 7L)))

    // unchanged base: noop, state version does not move
    val vBefore = mv.read().count() // force a read to prove liveness
    assert(mv.refresh() == "noop")
    assert(vBefore == mv.read().count())

    // compaction rewrites segments → append containment broken →
    // refresh must fall back to a full recompute, not miscount
    base.compact()
    base.append(Seq(("b", 5L)).toDF("g", "x"))
    assert(mv.refresh() == "full")
    assert(stateOf(mv) == recompute(base))
    assert(stateOf(mv)("b") == (2L, 15L))

    // and the delta path works again from the new baseline
    base.append(Seq(("c", 1L)).toDF("g", "x"))
    assert(mv.refresh() == "delta")
    assert(stateOf(mv) == recompute(base))
  }

  test("join-view IVM: incremental == full recompute on random splits; arms disjoint; empty deltas no-op") {
    import spark.implicits._
    import graft.pipeline.MaterializedJoin
    val rnd = new scala.util.Random(41)
    val a = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(60).toLong, rnd.nextInt(1000).toLong))
      .toDF("a_id", "k", "a_val")
    val b = (1 to 120).map(i =>
      (i.toLong, rnd.nextInt(60).toLong, rnd.nextInt(1000).toLong))
      .toDF("b_id", "k", "b_val")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "k", "a_val", "b_id", "b_val")
        .collect().map(_.toSeq).toSeq
        .sortBy(_.map(_.toString).mkString(","))
    val full = a.join(b, Seq("k"))
    for (seed <- 1 to 3) {
      val r2 = new scala.util.Random(seed)
      val (cutA, cutB) = (r2.nextInt(400).toLong, r2.nextInt(120).toLong)
      val v0 = a.filter($"a_id" <= cutA).join(b.filter($"b_id" <= cutB), Seq("k"))
      val inc = MaterializedJoin.refreshAppend(v0,
        a.filter($"a_id" <= cutA), b.filter($"b_id" <= cutB),
        a.filter($"a_id" > cutA), b.filter($"b_id" > cutB), Seq("k"))
      assert(canon(inc) == canon(full), s"seed $seed diverged")
      // disjoint arms: row COUNT also matches (no dedup pass ran)
      assert(inc.count() == full.count())
    }
    // empty deltas: refresh returns exactly the old view
    val empty = a.filter(lit(false))
    val emptyB = b.filter(lit(false))
    val v = a.join(b, Seq("k"))
    assert(canon(MaterializedJoin.refreshAppend(v, a, b, empty, emptyB,
      Seq("k"))) == canon(v))
  }
}
