package graft

import graft.operators.Spans

/** Span-level duplication (Lee et al. 2022 shape): keep-first
  * instance ranking, within-doc repeats, short-doc completeness, and
  * the cross-source overlap matrix — all on hand-built corpora where
  * the expected counts are derivable by eye.
  */
class SpansSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def docs(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("duplicate doc: every gram of the later copy is a dup instance") {
    // 6 tokens → two 5-grams per doc; doc 2 repeats doc 1 verbatim
    val d = docs(
      (1L, "s1", "a b c d e f"),
      (2L, "s2", "a b c d e f"),
      (3L, "s1", "p q r s t u"))
    val r = Spans.spanDedupOf(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == (2L, 0L)) // corpus-first instances
    assert(r(2L) == (2L, 2L)) // both grams already seen in doc 1
    assert(r(3L) == (2L, 0L)) // unique content
  }

  test("within-doc repetition counts as duplication") {
    // "x y z w v" appears at pos 1 and pos 6 of the SAME doc: the
    // second instance is a dup even with no other doc involved
    val d = docs((1L, "s1", "x y z w v x y z w v"))
    val Array(row) = Spans.spanDedupOf(d).collect()
    assert(row.getLong(1) == 6L) // 10 tokens → 6 grams
    assert(row.getLong(2) == 1L) // exactly the pos-6 repeat
  }

  test("docs shorter than K surface with zero counts, not dropped") {
    val d = docs((1L, "s1", "too short"), (2L, "s1", "a b c d e f"))
    val r = Spans.spanDedupOf(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r(1L) == (0L, 0L, 0.0))
    assert(r(2L) == (2L, 0L, 0.0))
  }

  test("keep-first is corpus-global: smallest (doc_id, pos) wins") {
    // the shared gram sits at pos 2 of doc 1 and pos 1 of doc 2 —
    // doc 1 owns the first instance because doc_id orders first
    val d = docs(
      (1L, "s1", "z a b c d e"),
      (2L, "s1", "a b c d e q"))
    val r = Spans.spanDedupOf(d).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) == 0L)
    assert(r(2L) == 1L) // its pos-1 gram lost to doc 1's pos-2 instance
  }

  test("source overlap: identical sources have containment 1.0") {
    val d = docs(
      (1L, "sa", "a b c d e f g"), // 3 grams
      (2L, "sb", "a b c d e f g"), // same 3
      (3L, "sc", "m n o p q r"))   // 2 grams, disjoint
    val rows = Spans.sourceOverlapOf(d).collect()
    assert(rows.length == 1) // only (sa, sb) share anything
    val r = rows.head
    assert((r.getAs[String]("source_a"), r.getAs[String]("source_b")) == ("sa", "sb"))
    assert(r.getAs[Long]("grams_a") == 3L && r.getAs[Long]("grams_b") == 3L)
    assert(r.getAs[Long]("shared_grams") == 3L)
    assert(r.getAs[Double]("containment") == 1.0)
  }

  test("source overlap containment divides by the smaller gram set") {
    val d = docs(
      (1L, "sa", "a b c d e f g h i"), // 5 grams
      (2L, "sb", "a b c d e x"))       // 2 grams, 1 shared
    val Array(r) = Spans.sourceOverlapOf(d).collect()
    assert(r.getAs[Long]("shared_grams") == 1L)
    assert(r.getAs[Long]("grams_a") == 5L && r.getAs[Long]("grams_b") == 2L)
    assert(r.getAs[Double]("containment") == 0.5) // 1 / min(5, 2)
  }

  test("bitmask and pair-join overlap paths produce the identical matrix") {
    import org.apache.spark.sql.Row
    val d = Tables.documents(spark, SF)
    val srcs = d.select("source").distinct().orderBy("source")
      .collect().map(_.getString(0))
    def canon(rows: Array[Row]) =
      rows.map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(t => (t._1, t._2))
    val bit = canon(Spans.sourceOverlapBitmaskOf(d, srcs)
      .select("source_a", "source_b", "grams_a", "grams_b", "shared_grams", "containment")
      .collect())
    val pair = canon(Spans.sourceOverlapPairsOf(d)
      .select("source_a", "source_b", "grams_a", "grams_b", "shared_grams", "containment")
      .collect())
    assert(bit.nonEmpty && bit.sameElements(pair))
  }

  test("gate shape on the real corpus: some but not all instances dup") {
    val rows = SparkEntry.queries("dedup_spans")(spark, SF).collect()
    val total = rows.map(_.getLong(1)).sum
    val dups = rows.map(_.getLong(2)).sum
    assert(rows.length == 500)
    assert(dups > 0 && dups < total / 4,
      s"k=$dups dup of $total — K mis-tuned for the corpus")
  }
}
