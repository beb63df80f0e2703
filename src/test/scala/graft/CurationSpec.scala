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

  // ---- quantile cut ----

  private def cutOf(values: Seq[Long], loNum: Long, loDen: Long,
      hiNum: Long, hiDen: Long): Set[Long] = {
    import spark.implicits._
    val scored = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    Curation.quantileCutOf(scored, "v", loNum, loDen, hiNum, hiDen)
      .collect().map(_.getAs[Long]("id")).toSet
  }

  test("quantile cut thresholds at exact rank: ceil(q*n)-th smallest value") {
    // 10 values 1..10: p10 rank = ceil(1) = 1 → lo_val = 1;
    // p90 rank = ceil(9) = 9 → hi_val = 9 — drops only the max
    assert(cutOf(1L to 10L, 1, 10, 9, 10) == (0 to 8).map(_.toLong).toSet)
    // median-only band on an odd count: ceil(5·1/2) = rank 3 → value 3
    assert(cutOf(Seq(1L, 2L, 3L, 4L, 5L), 1, 2, 1, 2) == Set(2L))
  }

  test("quantile cut handles ties: a heavy value straddling the rank stays whole") {
    // 8 copies of 5 + 1 and 9: p10 picks 1? ceil(10·1/10)=1 → lo=1;
    // p90: ceil(9) → cum(5)=9 ≥ 9 → hi=5 — all the 5s kept, 9 cut
    val vals = Seq(1L) ++ Seq.fill(8)(5L) ++ Seq(9L)
    val kept = cutOf(vals, 1, 10, 9, 10)
    assert(kept.size == 9 && !kept.contains(9L))
  }

  test("approx quantile cut matches the exact cut on the corpus") {
    import spark.implicits._
    val scored = Tables.documents(spark, SF)
      .select($"doc_id",
        org.apache.spark.sql.functions.size(
          graft.operators.Dedup.tokensCol($"text")).cast("long").as("n_tokens"))
    val exact = Curation.quantileCutOf(scored, "n_tokens", 1, 10, 9, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Curation.quantileCutApproxOf(scored, "n_tokens", 0.1, 0.9)
      .collect().map(_.getLong(0)).toSet
    // tight-accuracy sketch on integer data: identical thresholds are
    // expected; tolerate only a hair of rank slack at the boundaries
    val sym = (exact diff approx) ++ (approx diff exact)
    assert(sym.size <= exact.size / 50,
      s"approx cut diverges from exact on ${sym.size} of ${exact.size} docs")
  }

  test("grouped cut: each group faces its own distribution") {
    import spark.implicits._
    // group a: 1..10 (p10=1, p90=9 → drops only 10)
    // group b: 101..105 (5 values: lo rank ceil(0.5)=1 → 101;
    //          hi rank ceil(4.5)=5 → 105 → keeps all)
    val scored = ((1L to 10L).map(v => ("a", v)) ++
      (101L to 105L).map(v => ("b", v)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val kept = Curation.quantileCutByOf(scored, "g", "v", 1, 10, 9, 10)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("v")))
    assert(kept.filter(_._1 == "a").map(_._2).toSet == (1L to 9L).toSet)
    assert(kept.filter(_._1 == "b").map(_._2).toSet == (101L to 105L).toSet)
  }

  test("winsorize clamps to the same band the cut drops, and every row survives") {
    import spark.implicits._
    // group a: 1..10 → band [1, 9]: the 10 clamps to 9;
    // group b: 101..105 → band [101, 105]: nothing clamps
    val scored = ((1L to 10L).map(v => ("a", v)) ++
      (101L to 105L).map(v => ("b", v)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val got = Curation.winsorizeByOf(scored, "g", "v", 1, 10, 9, 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: 10 docs, 0 clamped low (lo=1 keeps the 1), 1 clamped high,
    //    sum = 1+..+9 + 9 = 54; b: untouched, sum = 515
    assert(got("a") == ((10L, 0L, 1L, 54L)), s"a: ${got("a")}")
    assert(got("b") == ((5L, 0L, 0L, 515L)), s"b: ${got("b")}")
  }

  test("winsorize corpus reconciliation: survivors = corpus, clamp counts = cut drops") {
    import spark.implicits._
    val gate = SparkEntry.queries("text_winsorize")(spark, SF).collect()
    val total = gate.map(_.getLong(1)).sum
    val all = Tables.documents(spark, SF).count()
    assert(total == all, s"winsorize must keep every doc: $total vs $all")
    // per-lang: clamped_lo + clamped_hi == docs the per-lang CUT drops
    val cutKept = SparkEntry.queries("text_quantile_cut_lang")(spark, SF)
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLangAll = Tables.documents(spark, SF)
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    gate.foreach { r =>
      val (lang, n, lo, hi) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo + hi == byLangAll(lang) - cutKept(lang),
        s"$lang: clamped ${lo + hi} vs dropped ${byLangAll(lang) - cutKept(lang)}")
      assert(n == byLangAll(lang))
    }
  }

  test("grouped gate: per-lang cut differs from the global cut") {
    val global = SparkEntry.queries("text_quantile_cut")(spark, SF)
      .collect().map(_.getLong(0)).toSet
    val byLang = SparkEntry.queries("text_quantile_cut_lang")(spark, SF)
      .collect().map(_.getLong(0)).toSet
    assert(byLang.nonEmpty && byLang != global,
      "per-lang thresholds should move at least one boundary doc")
  }

  test("gate: both tails trimmed, bulk kept") {
    val all = Tables.documents(spark, SF).count()
    val kept = SparkEntry.queries("text_quantile_cut")(spark, SF).count()
    assert(kept < all, "nothing trimmed")
    assert(kept >= all * 7 / 10, s"cut too deep: $kept of $all")
  }

  test("quantile normalization: every doc maps to the global value at its within-source quantile") {
    import spark.implicits._
    import graft.operators.{Curation, QualityModel}
    val got = Curation.qnormScores(spark, SF).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
    assert(got.nonEmpty)
    // driver-side re-derivation from the raw scores
    val docs = Tables.documents(spark, SF)
    val s = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .select($"doc_id", $"source", $"score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val globalSorted = s.map(_._3).sorted
    val n = globalSorted.length.toLong
    val bySource = s.groupBy(_._2)
    val exp = bySource.toSeq.flatMap { case (src, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      val m = sorted.length.toLong
      sorted.zipWithIndex.map { case ((id, _, sc), i) =>
        val t = ((i + 1) * n + m - 1) / m
        id -> ((src, sc, globalSorted((t - 1).toInt)))
      }
    }
    assert(got.toMap == exp.toMap,
      s"first diffs: ${(got.toMap.toSet diff exp.toSet).take(3)}")
    // rank order is preserved within each source
    got.groupBy(_._2._1).foreach { case (_, rows) =>
      val byScore = rows.sortBy(r => (r._2._2, r._1)).map(_._2._3)
      assert(byScore.zip(byScore.tail).forall { case (a, b) => a <= b })
    }
  }
}
