package graft

import graft.operators.SemDedup

/** SemDeDup against a from-scratch driver-side reference at the
  * smallest SF: same centroid stand-in, same fused-fold cosine
  * arithmetic, same tie-breaks — the operator's distributed plan must
  * reproduce the reference exactly.
  */
class SemDedupSpec extends SparkSpec {

  private val NLIST = 16
  private val TAU = 0.35

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("distributed result equals the driver-side reference") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, SF)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val cents = emb.filter(_._1 < NLIST)
    // assignment: argmax cosine, ties to the lowest cell id
    val cellOf = emb.map { case (id, v) =>
      val scored = cents.map { case (cid, c) => (cid, cos(v, c)) }
      val best = scored.map(_._2).max
      id -> scored.find(_._2 == best).get._1
    }.toMap
    val byCell = emb.groupBy { case (id, _) => cellOf(id) }
    val expected = byCell.toSeq.flatMap { case (cellId, members) =>
      val pairs = for {
        (ia, va) <- members; (ib, vb) <- members if ia < ib
        c = round4(cos(va, vb)) if c >= TAU
      } yield (ia, ib, c)
      pairs.groupBy(_._2).map { case (dropId, ps) =>
        (dropId, ps.map(_._1).min, cellId, ps.size.toLong,
          ps.map(_._3).max)
      }
    }.toSet
    val got = SemDedup.semanticDedup(spark, SF, NLIST, TAU).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got.nonEmpty, "spec corpus produced no semantic dups — tune TAU")
    assert(got == expected)
  }

  test("victims always outrank their keeper id and never self-pair") {
    val rows = SemDedup.semanticDedup(spark, SF, NLIST, TAU).collect()
    rows.foreach { r =>
      assert(r.getLong(0) > r.getLong(1), s"drop_id <= keep_id in $r")
      assert(r.getLong(3) >= 1L)
      assert(r.getDouble(4) >= TAU)
    }
  }
}
