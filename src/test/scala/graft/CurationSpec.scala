package graft

import graft.operators.Curation

/** Gopher-filter rule battery on boundary documents: every rule's
  * threshold is hit exactly from both sides, through the real
  * (integer cross-multiplied) code path.
  */
class CurationSpec extends SparkSpec {

  private def flags(text: String): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Curation.gopherFilterOf(spark, Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    (r.getAs[Long]("ok_len"), r.getAs[Long]("ok_wl"), r.getAs[Long]("ok_alpha"),
      r.getAs[Long]("ok_stop"), r.getAs[Long]("keep"))
  }

  private def words(w: String, n: Int): String = Seq.fill(n)(w).mkString(" ")

  test("ok_len boundary: 29 tokens fail, 30 pass") {
    // 'that' has mean length 4, no stop hits — isolate ok_len
    assert(flags(words("that", 29))._1 == 0L)
    assert(flags(words("that", 30))._1 == 1L)
  }

  test("ok_wl boundary: mean word length exactly 4 passes, below fails") {
    // 30 tokens of length 4 → mean exactly 4.0 (integer boundary)
    assert(flags(words("word", 30))._2 == 1L)
    // 29×4 + 1×3 chars → mean 115/30 < 4
    assert(flags(words("word", 29) + " abc")._2 == 0L)
    // length-11 tokens → mean > 10
    assert(flags(words("abcdefghijk", 30))._2 == 0L)
  }

  test("ok_alpha boundary: exactly 80% alphabetic passes, below fails") {
    // 24 alpha + 6 numeric of 30 → 0.8 exactly
    assert(flags(words("word", 24) + " " + words("1234", 6))._3 == 1L)
    // 23 alpha + 7 numeric → under
    assert(flags(words("word", 23) + " " + words("1234", 7))._3 == 0L)
  }

  test("ok_stop boundary: one stop word fails, two pass") {
    assert(flags(words("word", 29) + " the")._4 == 0L)
    assert(flags(words("word", 28) + " the of")._4 == 1L)
  }

  test("keep is the conjunction, and empty docs drop cleanly") {
    // 'words' (5 chars) keeps the mean ≥ 4 with the short stop words in
    val pass = flags(words("words", 28) + " the of")
    assert(pass == ((1L, 1L, 1L, 1L, 1L)))
    assert(flags("")._5 == 0L)
    assert(flags("   ")._5 == 0L)
  }

  test("gate output mixes keeps and drops on the corpus") {
    val byKeep = Curation.gopherFilter(spark, SF)
      .groupBy("keep").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKeep.getOrElse(1L, 0L) > 0, "no document kept")
    assert(byKeep.getOrElse(0L, 0L) > 0, "no document dropped")
  }
}
