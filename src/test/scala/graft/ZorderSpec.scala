package graft

import graft.pipeline.{ManifestTable, Zorder}
import org.apache.spark.sql.functions._

/** Z-order clustered writes: segment zone maps must prune on EVERY
  * clustered dimension, against the single-column-clustered control
  * where only the leading column prunes. Correctness first: a
  * skipping read returns exactly the rows a full-scan filter does.
  */
class ZorderSpec extends SparkSpec {

  private def freshTable(): ManifestTable =
    new ManifestTable(spark,
      java.nio.file.Files.createTempDirectory("zorder_tbl").toString + "/t")

  private lazy val li = Tables.lineitem(spark, SF)
    .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))

  // one z-ordered and one orderkey-only-clustered copy of the same
  // 6k-row lineitem slice, both at 16 segments with both columns
  // stat-tracked — built once for the whole suite
  private lazy val (zed, lin, okMid, pkBand) = {
    val z = freshTable(); val l = freshTable()
    z.writeClustered(li, Seq("l_orderkey", "l_partkey"), nSegments = 16)
    l.writeClustered(li, Seq("l_orderkey"), nSegments = 16,
      statCols = Seq("l_partkey"))
    val r = li.agg(min("l_orderkey"), max("l_orderkey")).head()
    val (okLo, okHi) = (r.getLong(0), r.getLong(1))
    val mid = okLo + (okHi - okLo) / 2
    val midBand = (mid.toDouble, (mid + (okHi - okLo) / 20).toDouble)
    // partkey domain is 0..199 → cells scale ×~5.1; 100..109 lands
    // inside one top-two-bit quadrant (cells 514..560). A band
    // straddling a major cell-bit boundary (e.g. 90..110 across cell
    // 512) legitimately touches both halves of the curve — the spec
    // measures pruning, not that the curve escapes its geometry.
    (z, l, midBand, (100.0, 109.0))
  }

  test("skipping reads are exact: same rows as a full-scan filter") {
    val preds = Seq(("l_orderkey", okMid._1, okMid._2),
      ("l_partkey", pkBand._1, pkBand._2))
    val expect = li.filter(col("l_orderkey").between(okMid._1, okMid._2) &&
      col("l_partkey").between(pkBand._1, pkBand._2)).count()
    assert(expect > 0, "box predicate selects nothing — bad test ranges")
    assert(zed.readWhereAll(preds).count() == expect)
    assert(lin.readWhereAll(preds).count() == expect)
    // single-predicate path too
    val expectPk = li.filter(col("l_partkey").between(pkBand._1, pkBand._2)).count()
    assert(zed.readWhere("l_partkey", pkBand._1, pkBand._2).count() == expectPk)
    assert(lin.readWhere("l_partkey", pkBand._1, pkBand._2).count() == expectPk)
  }

  test("non-leading-column predicate: z-order prunes, linear clustering cannot") {
    val preds = Seq(("l_partkey", pkBand._1, pkBand._2))
    val zHits = zed.overlappingSegments(preds).size
    val lHits = lin.overlappingSegments(preds).size
    assert(lHits == lin.segmentCount,
      s"orderkey-clustered table should be unprunable on partkey, hit $lHits")
    assert(zHits * 2 <= lHits,
      s"z-order hit $zHits of ${zed.segmentCount} — expected at most half of $lHits")
    assert(zHits <= 8, s"a one-quadrant band should stay within 8 of 16, hit $zHits")
  }

  test("leading-column predicate: both layouts prune") {
    val preds = Seq(("l_orderkey", okMid._1, okMid._2))
    assert(lin.overlappingSegments(preds).size * 4 <= lin.segmentCount,
      "linear clustering must prune its own leading column hard")
    assert(zed.overlappingSegments(preds).size < zed.segmentCount,
      "z-order must still prune on the first dimension")
  }

  test("box predicate on both dimensions prunes multiplicatively on z-order") {
    val preds = Seq(("l_orderkey", okMid._1, okMid._2),
      ("l_partkey", pkBand._1, pkBand._2))
    val zHits = zed.overlappingSegments(preds).size
    assert(zHits * 4 <= zed.segmentCount,
      s"2-d box hit $zHits of ${zed.segmentCount} z-ordered segments")
  }

  test("zvalue interleaves: cell-adjacent points get nearby z, far points far z") {
    import spark.implicits._
    val dims = Seq((col("x"), 0.0, 1024.0), (col("y"), 0.0, 1024.0))
    val z = Seq((0L, 0L), (1L, 1L), (1023L, 1023L))
      .toDF("x", "y").select(Zorder.zvalue(dims, bits = 10).as("z"))
      .collect().map(_.getLong(0))
    assert(z(0) == 0L)
    assert(z(1) == 3L)                 // bits (1,1) interleave to 0b11
    assert(z(2) == (1L << 20) - 1)     // max cell in both dims
  }

  test("clustered write survives merged quantile cuts on constant data") {
    import spark.implicits._
    // all-identical z-values: every cut collapses — one segment, valid table
    val flat = Seq.fill(100)((7L, 7L)).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
    val t = freshTable()
    t.writeClustered(flat, Seq("a", "b"), nSegments = 8)
    assert(t.read().count() == 100)
    assert(t.segmentCount == 1)
  }
}
