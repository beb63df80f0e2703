package graft

import java.sql.Timestamp

import graft.operators.TextAnalysis
import graft.streaming.{EventStream, StreamEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class QualityContractSpec extends SparkSpec {

  test("quality scores stay inside [0,1] (weights sum to 1)") {
    import spark.implicits._
    val bad = TextAnalysis.quality(spark, SF)
      .filter($"quality" < 0.0 || $"quality" > 1.0)
      .count()
    assert(bad == 0)
    // and the score actually uses its range, not a constant
    val range = TextAnalysis.quality(spark, SF)
      .agg(max($"quality") - min($"quality")).collect()(0).getDouble(0)
    assert(range > 0.01)
  }

  test("readability matches a hand-computed Flesch fixture and guards empty docs") {
    import spark.implicits._
    // "The cat sat." — 3 words, 1 sentence, vowel groups e/a/a = 3:
    // flesch = 206.835 − 1.015·3 − 84.6·1 = 119.19; 9 letters of 12
    // chars → alpha 0.75. Plus a digit-heavy doc and an empty doc
    // (greatest(·,1) guards — no NaN, no ANSI throw).
    val tmp = java.nio.file.Files.createTempDirectory("read").toString
    Seq((1L, "The cat sat."), (2L, "a1b2 33!"), (3L, ""))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.readability(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("flesch") == 119.19, s"${got(1L)}")
    assert(got(1L).getAs[Double]("alpha_ratio") == 0.75, s"${got(1L)}")
    assert(got(2L).getAs[Double]("digit_ratio") == 0.5, s"${got(2L)}")
    assert(got(3L).getAs[Long]("n_words") == 0L &&
      !got(3L).getAs[Double]("flesch").isNaN, s"${got(3L)}")
  }

  test("empty and whitespace-only documents score without NaN or ANSI error") {
    import spark.implicits._
    // degenerate docs the synthetic testdata never contains — the
    // unguarded 0/0 was NaN, and round(NaN).cast(long) throws under ANSI
    val rows = TextAnalysis.qualityOf(spark,
        Seq((1L, ""), (2L, "   "), (3L, "the fox")).toDF("doc_id", "text"))
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (ratio, q) = (r.getAs[Double]("stop_ratio"), r.getAs[Double]("quality"))
      assert(!ratio.isNaN && !q.isNaN && q >= 0.0 && q <= 1.0)
    }
  }

  test("sessionize survives a straggler behind the watermark (dropped, not fatal)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(m: Long) = new Timestamp(1704067200000L + m * 60000L)
    val mem = MemoryStream[StreamEvent]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1 pushes the watermark far ahead (max ts 10h − 1h delay)
      mem.addData(Seq(StreamEvent(1, ts(600), 42, "click", 0.0)))
      q.processAllAvailable()
      // batch 2: a straggler 10h behind the watermark. Spark 4
      // filters late rows before flatMapGroupsWithState, so the row
      // is DROPPED (no state, no session) — and the operator's
      // timeout clamp keeps even a hypothetical unfiltered straggler
      // from killing the query
      mem.addData(Seq(StreamEvent(2, ts(0), 7, "click", 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(StreamEvent(3, ts(1200), 42, "click", 0.0)))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
    } finally q.stop()
    val users = spark.table("late_sessions")
      .collect().map(_.getLong(0)).toSet
    // the straggler never becomes a session; the healthy user's
    // gap-closed session did emit
    assert(!users.contains(7L))
    assert(users.contains(42L))
  }

  test("compression ratio: repetitive ≪ natural < random; bounded; deterministic; zero-length guarded") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "spark " * 400),                              // templated
      (2L, Tables.documents(spark, SF)                   // natural-ish
        .filter($"doc_id" === 0L).head().getString(1)),
      (3L, { val rnd = new scala.util.Random(42)         // seeded random
        (0 until 2000).map(_ => (rnd.nextInt(94) + 33).toChar).mkString }),
      (4L, ""))                                          // empty guard
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("cr").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.compressionRatio(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val rep = got(1L)._2; val nat = got(2L)._2; val rnd = got(3L)._2
    assert(rep < nat && nat < rnd,
      s"ordering broken: repetitive=$rep natural=$nat random=$rnd")
    assert(rep < 100000L, s"templated text should compress ≥10×: $rep")
    assert(got.values.forall { case (_, ppm) => ppm > 0 && ppm <= 1200000L })
    assert(got(4L)._2 == 1000000L, "empty doc must take the neutral ratio")
    // deterministic across runs (fixed Deflater level)
    val again = TextAnalysis.compressionRatio(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(again == got)
    // corpus-wide sanity at SF: every ratio in bounds, all docs present
    val corpus = TextAnalysis.compressionRatio(spark, SF).collect()
    assert(corpus.length.toLong == Tables.documents(spark, SF).count())
    assert(corpus.forall(r => r.getLong(3) > 0 && r.getLong(3) <= 1200000L))
  }

  test("langId eval metrics ≡ a scala confusion-matrix re-derivation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pairs = graft.operators.TextAnalysis.langId(spark, SF)
      .join(Tables.documents(spark, SF).select($"doc_id", $"lang"),
        "doc_id")
      .select($"lang", $"pred_lang")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val classes = pairs.map(_._1).distinct.sorted
    val got = graft.operators.TextAnalysis.langIdEval(spark, SF)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == classes.toSet)
    classes.foreach { c =>
      val goldN = pairs.count(_._1 == c).toLong
      val predN = pairs.count(_._2 == c).toLong
      val tp = pairs.count(p => p._1 == c && p._2 == c).toLong
      val p = if (predN == 0) 0L else tp * 1000000L / predN
      val r = tp * 1000000L / goldN
      val f1 = if (p + r == 0) 0L else 2 * p * r / (p + r)
      assert(got(c) == ((goldN, predN, tp, p, r, f1)), s"class $c: ${got(c)}")
    }
    // the harness is measuring a real (imperfect) classifier: some
    // class must fall short of perfect recall, none exceeds 10^6
    assert(got.values.forall(v => v._5 <= 1000000L && v._4 <= 1000000L))
    assert(got.values.exists(v => v._5 < 1000000L))
  }

  test("sentence census: hand-segmented fixtures — terminators attach, runs collapse, empties vanish") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One. Two sentences! Or three?"),
      (2L, "No terminator at all"),
      (3L, "Ellipsis wins... right?! Yes."),
      (4L, "..."), // pure punctuation: zero sentences, guarded zeros
      (5L, "  spaced.   out.  ")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.sentenceStatsOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: "One." "Two sentences!" "Or three?" → 3, mean (4+14+9)/3=9
    assert(got(1L) == ((3L, 9L, 14L)), s"${got(1L)}")
    // doc 2: one unterminated sentence of 20 chars
    assert(got(2L) == ((1L, 20L, 20L)))
    // doc 3: "Ellipsis wins..." (16) "right?!" (7) "Yes." (4) → mean 9
    assert(got(3L) == ((3L, 9L, 16L)), s"${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0L)))
    // doc 5: "spaced." "out." after trimming → mean (7+4)/2=5
    assert(got(5L) == ((2L, 5L, 7L)), s"${got(5L)}")
  }
}
