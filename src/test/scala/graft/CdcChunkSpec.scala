package graft

import graft.operators.Dedup

class CdcChunkSpec extends SparkSpec {

  private def chunksOf(rows: Seq[(Long, String)]): Map[Long, Seq[String]] = {
    import spark.implicits._
    Dedup.cdcChunkRowsOf(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
  }

  test("chunks reassemble the normalized text; short docs are one chunk") {
    val doc = "The quick brown fox jumps over the lazy dog. " * 20
    val ch = chunksOf(Seq((1L, doc), (2L, "tiny")))
    assert(ch(1L).mkString("") ==
      doc.toLowerCase.replaceAll("\\s+", " ").trim)
    assert(ch(1L).size > 1, "a 900-char doc must cut somewhere")
    assert(ch(2L) == Seq("tiny"))
  }

  test("edit locality: a prefix edit leaves post-edit boundaries and chunks intact") {
    // aperiodic body: a periodic one would let fixed-width slabs
    // re-align by accident and spoil the control
    val base = (0 until 8).map(i =>
      s"sentence number $i speaks of alpha beta gamma delta epsilon " +
        s"zeta eta theta iota kappa lambda mu nu xi omicron pi rho " +
        s"sigma tau upsilon phi chi psi omega round ${i * 37 % 11}. ")
      .mkString
    val edited = "XYZZY PREFIX INSERTED 42! " + base
    val ch = chunksOf(Seq((1L, base), (2L, edited)))
    // every boundary decision depends only on its own 4-gram, so once
    // past the edit the cut positions realign: the edited doc must
    // share a long SUFFIX of the original's chunk sequence
    val a = ch(1L); val b = ch(2L)
    val sharedSuffix = a.reverse.zip(b.reverse).takeWhile(p => p._1 == p._2)
    assert(sharedSuffix.size >= a.size - 2,
      s"CDC locality broken: only ${sharedSuffix.size} of ${a.size} " +
        "trailing chunks survived a prefix edit")
    // the fixed-width control loses alignment: 32-char slabs of the
    // two normalized texts share (almost) nothing after the shift
    def slabs(s: String) = s.grouped(32).toSeq
    val na = base.toLowerCase.replaceAll("\\s+", " ").trim
    val nb = edited.toLowerCase.replaceAll("\\s+", " ").trim
    val fixedShared = slabs(na).toSet.intersect(slabs(nb).toSet)
    // directional claim (near-identical sentences still let a few
    // slabs coincide): CDC must preserve strictly more shared
    // content across the shift than fixed-width slabbing does
    assert(fixedShared.size < sharedSuffix.size,
      s"fixed-width kept ${fixedShared.size} vs CDC ${sharedSuffix.size}")
  }

  test("shared sentences across distinct docs surface in the dedup report") {
    import spark.implicits._
    val shared = "the contract renews automatically every year unless " +
      "cancelled in writing thirty days before the renewal date. " * 4
    val docs = Seq(
      (1L, "intro one. " + shared + " closing remarks alpha."),
      (2L, "different preamble text entirely here. " + shared + " bye."),
      (3L, "totally unrelated content about gardening and soil quality."))
    val rep = Dedup.cdcChunksOf(docs.toDF("doc_id", "text"), topK = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.nonEmpty, "shared sentence must produce shared chunks")
    assert(rep.forall(_._2 >= 2))
    // and the report is only about docs 1 and 2's overlap: every
    // shared fingerprint occurs at most once per doc here
    assert(rep.forall(r => r._3 >= r._2))
  }
}
