package graft

import graft.operators.{Dedup, Search}
import org.apache.spark.sql.functions._

/** Lexical search properties the exact gates can't express: BM25's
  * ranking behavior and the vocabulary's consistency invariants.
  */
class SearchSpec extends SparkSpec {

  test("vocabulary: ranks are contiguous, ordered, and frequency-consistent") {
    val v = Search.vocabulary(spark, SF, k = 20).orderBy("rk").collect()
    assert(v.nonEmpty)
    assert(v.map(_.getAs[Long]("rk")).toSeq == (1L to v.length).toSeq)
    val freqs = v.map(_.getAs[Long]("coll_freq")).toSeq
    assert(freqs == freqs.sorted.reverse, "coll_freq not non-increasing")
    assert(v.forall(r => r.getAs[Long]("coll_freq") >= r.getAs[Long]("doc_freq")),
      "a token can't appear in more docs than it has occurrences")
  }

  test("vocabulary totals reconcile with the raw token stream") {
    val total = Dedup.tokenRows(spark, SF).count()
    val vocabTotal = Search.vocabulary(spark, SF, k = 1000000)
      .agg(sum("coll_freq")).collect().head.getLong(0)
    assert(vocabTotal == total)
  }

  test("vocabularyApprox in exact mode reproduces the exact vocabulary") {
    // capacity ≥ distinct tokens ⇒ SpaceSaving is exact (err = 0) and
    // shares the (freq desc, token asc) tie-break
    val exact = Search.vocabulary(spark, SF, k = 20).orderBy("rk").collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[String]("token"),
        r.getAs[Long]("coll_freq")))
    val approx = Search.vocabularyApprox(spark, SF, k = 20).orderBy("rk")
      .collect()
    assert(approx.forall(_.getAs[Long]("err") == 0L),
      "sketch not exact despite capacity ≥ |vocab|")
    val got = approx.map(r => (r.getAs[Long]("rk"), r.getAs[String]("token"),
      r.getAs[Long]("est")))
    assert(got.toSeq == exact.toSeq)
  }

  test("keywords: per-doc ranks contiguous, scores ordered, rarity beats frequency") {
    import spark.implicits._
    val kw = graft.operators.Search.docKeywords(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(kw.nonEmpty)
    kw.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to rs.length).toSeq,
        s"doc $doc ranks not contiguous")
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sorted.reverse.toSeq,
        s"doc $doc scores not descending")
      assert(rs.map(_._3).distinct.length == rs.length,
        s"doc $doc repeated a keyword")
    }
    // formula consistency against an independent driver-side re-count:
    // score = tf · (N − df + ½)/(df + ½) with tf a positive integer —
    // recover tf from each emitted score and it must land on one
    val stream = graft.operators.Dedup.tokenRows(spark, SF)
      .select($"doc_id", $"token").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val df = stream.distinct.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nDocs = Tables.documents(spark, SF).count()
    kw.foreach { case (doc, rk, token, score) =>
      val idf = (nDocs - df(token) + 0.5) / (df(token) + 0.5)
      val tf = score / idf
      assert(math.abs(tf - math.rint(tf)) < 1e-3 && tf >= 0.999,
        s"doc $doc rk $rk '$token': score $score implies non-integer tf $tf")
    }
  }

  test("bm25: every hit contains a query term, ranks ordered by score") {
    val hits = Search.bm25TopK(spark, SF).collect()
    assert(hits.nonEmpty)
    val docs = graft.Tables.documents(spark, SF)
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val terms = Search.bm25Workload.toMap
    hits.foreach { r =>
      val q = r.getAs[String]("query_id")
      val d = r.getAs[Long]("doc_id")
      assert(docs(d).intersect(terms(q).toSet).nonEmpty,
        s"hit ($q, $d) shares no term with the query")
    }
    hits.groupBy(_.getAs[String]("query_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Long]("rk"))
      assert(byRank.map(_.getAs[Long]("rk")).toSeq == (1L to g.length).toSeq)
      val scores = byRank.map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sorted.reverse, "score not non-increasing in rank")
    }
  }

  test("bm25: more matched occurrences outrank fewer at equal length") {
    import spark.implicits._
    // same dl=4 everywhere; doc 1 has 2 'spark' hits, doc 2 has 1,
    // doc 3 none → expect 1 before 2, 3 absent
    val docs = Seq(
      (1L, "spark spark pad pad"),
      (2L, "spark pad pad pad"),
      (3L, "pad pad pad pad")).toDF("doc_id", "text")
    val hits = Search.bm25TopKOf(spark, docs, Seq("q" -> Seq("spark")), k = 10)
      .orderBy("rk").collect()
    assert(hits.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(hits(0).getAs[Double]("score") > hits(1).getAs[Double]("score"))
  }

  test("bm25: shorter doc outranks longer at equal term frequency") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark pad"),
      (2L, "spark pad pad pad pad pad pad pad")).toDF("doc_id", "text")
    val hits = Search.bm25TopKOf(spark, docs, Seq("q" -> Seq("spark")), k = 10)
      .orderBy("rk").collect()
    assert(hits.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
  }

  test("snippets: window clamps at the document start, centers elsewhere, skips non-matches") {
    import spark.implicits._
    val pad = "x" * 100
    val docs = Seq(
      (1L, "data right at the front " + pad), // pos 1 → clamped start
      (2L, pad + " data in the middle " + pad), // pos > 40 → 40-char lead
      (3L, "no match here at all"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("snip").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Search.snippets(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.keySet == Set(1L, 2L), s"wrong doc set: ${got.keySet}")
    assert(got(1L)._1 == 1L && got(1L)._2.startsWith("data right"),
      s"clamped snippet wrong: ${got(1L)}")
    val (pos2, snip2) = got(2L)
    assert(pos2 == 102L && snip2.length == 80 &&
      snip2.substring(40, 44) == "data", s"centered snippet wrong: $pos2 $snip2")
  }

  test("phrase search: order and adjacency required; repeated terms and multi-hits exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "x a b y"),        // hit at anchor 1
      (2L, "en", "a x b"),          // gap — no hit
      (3L, "en", "b a"),            // wrong order — no hit
      (4L, "en", "a b c a b"),      // two hits
      (5L, "en", "b b b"))          // 'b b' hits at anchors 0 and 1
      .toDF("doc_id", "lang", "text")
    def hits(p: String*) =
      Search.phraseMatchesOf(docs, p)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(hits("a", "b") == Set((1L, 1), (4L, 0), (4L, 3)),
      s"""got ${hits("a", "b")}""")
    assert(hits("b", "b") == Set((5L, 0), (5L, 1)))
    assert(hits("a", "b", "c") == Set((4L, 0)))
    assert(hits("c", "a") == Set((4L, 2)))
    assert(hits("a", "z").isEmpty)
  }

  test("similar-docs matches a scala TF-IDF inner-product re-derivation; query doc excluded") {
    val qid = 7L
    val docs = Tables.documents(spark, SF)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split(" ").map(_.trim).filter(_.nonEmpty))
    val n = docs.length.toLong
    val tf = docs.map { case (id, toks) =>
      id -> toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val df_ = tf.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val q = tf(qid)
    val expected = tf.view.filterKeys(_ != qid).map { case (id, m) =>
      val su = m.collect { case (t, c) if q.contains(t) =>
        val idf = (n - df_(t) + 0.5) / (df_(t) + 0.5)
        math.round((c * q(t)).toDouble * idf * idf * 1000000.0)
      }.sum
      id -> su
    }.toSeq.sortBy { case (id, su) => (-su, id) }.take(10)
      .map { case (id, su) => (id, su / 1000000.0) }
    val got = Search.similarDocs(spark, SF, queryDoc = qid)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected, s"got=$got expected=$expected")
    assert(!got.exists(_._1 == qid), "query doc must not rank itself")
  }

  test("BPE pair mining equals a brute-force corpus fold; vocabulary collapse doesn't change counts") {
    import spark.implicits._
    val texts = Tables.documents(spark, SF)
      .select($"text").collect().map(_.getString(0))
    val brute = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    texts.foreach { t =>
      t.trim.split(" +").filter(_.nonEmpty).foreach { w =>
        (0 until w.length - 1).foreach { i =>
          brute(w.substring(i, i + 2)) += 1L
        }
      }
    }
    val expected = brute.toSeq.sortBy { case (p, f) => (-f, p) }.take(50)
    val got = graft.operators.TextAnalysis.bpePairs(spark, SF)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(x => x._1 != x._2)}")
    // the top pair really is the next BPE merge: strictly ranked
    assert(got.head._2 >= got.last._2 && got.size == 50)
  }

  test("SymSpell candidates: every planted substitution recovers its source term at distance 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sources = graft.operators.Search.vocabulary(spark, SF, k = 500)
      .filter(length($"token") >= 4)
      .orderBy($"coll_freq".desc, $"token").limit(30)
      .select($"token").collect().map(_.getString(0))
    val got = graft.operators.Search.spellCandidates(spark, SF)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(3)))
    assert(got.nonEmpty)
    // (query = planted corruption, its source term, dist 1) is found
    // — except where the corruption IS another vocab term (dist 0
    // exists and may crowd the top-k, but the source is still there)
    sources.foreach { t =>
      val q = t.substring(0, 2) + "q" + t.substring(3)
      if (q != t)
        assert(got.exists(c => c._1 == q && c._2 == t && c._3 == 1L),
          s"source '$t' not recovered for query '$q'")
    }
    // verification really ran: no candidate sits past distance 1
    assert(got.forall(_._3 <= 1L))
  }

  test("tokenizer fertility: hand-counted multibyte fixture; bytes separate from chars") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // en: "ab cd, ef" → ws 3; bpe: ab|cd|,|ef = 4; chars 9; bytes 9
    // zh: "日本 語x" → ws 2; bpe lexer on lower: 日本|語 are [^a-z0-9 ]
    //     singles → 日|本|語|x = 4; chars 5; bytes = 3·3+1+1 = 11
    val docs = Seq(
      (1L, "ab cd, ef", "en", "s"),
      (2L, "日本 語x", "zh", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.tokenFertilityOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = got("en")
    assert((en.getLong(1), en.getLong(2), en.getLong(3), en.getLong(4),
      en.getLong(5)) == ((1L, 3L, 4L, 9L, 9L)), en.toString)
    assert(en.getDouble(6) == 1.3333 && en.getDouble(7) == 2.25)
    val zh = got("zh")
    assert((zh.getLong(2), zh.getLong(3), zh.getLong(4), zh.getLong(5)) ==
      ((2L, 4L, 5L, 11L)), zh.toString)
    assert(zh.getDouble(6) == 2.0 && zh.getDouble(7) == 2.75)
  }

  test("encoding census: planted replacement/control/mojibake chars counted exactly") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "clean ascii only", "en", "a"),
      (2L, "bad � decode � twice", "en", "a"),
      (3L, "ctrl\u0001here\u0002and\ttab stays", "en", "b"),
      (4L, "mojibake Ã© and â€œ marks", "en", "b"),
      (5L, "naïve café — true utf8", "en", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.encodingCensusOf(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // source a: 2 docs, no ctrl, 2 non-ascii (the two U+FFFD), 1
    // replacement doc, 0 mojibake
    assert(got("a") == ((2L, 0L, 2L, 1L, 0L)), got("a").toString)
    // source b: doc3 has TWO C0 controls (\t exempt), doc4 has
    // Ã/é/â/€/œ non-ascii (5) + doc5 ï/é/— (3); mojibake doc = doc4
    // (é in doc5 alone is legit utf-8, no Ã/â signature)
    assert(got("b") == ((3L, 2L, 8L, 0L, 1L)), got("b").toString)
  }

  test("JSD: identical sources at 0, disjoint at ln 2, hand fold on a shared-token pair") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    def jsd(docs: Seq[(Long, String, String)]): Map[(String, String), Double] =
      TextAnalysis.jsDivergenceOf(
        docs.toDF("doc_id", "text", "source"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
        .toMap
    // identical token distributions → 0 exactly (all terms ln 1)
    val same = jsd(Seq((1L, "a a b c", "s1"), (2L, "a a b c", "s2")))
    assert(same(("s1", "s2")) == 0.0)
    // disjoint vocabularies → the JSD maximum ln 2
    val disj = jsd(Seq((1L, "a b", "s1"), (2L, "c d", "s2")))
    assert(math.abs(disj(("s1", "s2")) - math.log(2.0)) < 1e-6)
    // hand fold: s1 = {a:2, b:1}, s2 = {a:1, c:1} — one common token
    val got = jsd(Seq((1L, "a a b", "s1"), (2L, "a c", "s2")))(("s1", "s2"))
    val (p, q) = (2.0 / 3.0, 1.0 / 2.0)
    val tNano = math.round(0.5 * (p * math.log(2 * p / (p + q))
      + q * math.log(2 * q / (p + q))) * 1e9)
    val want = math.floor((0.5 * math.log(2.0) * (2.0 - 2.0 / 3.0 - 1.0 / 2.0)
      + tNano / 1e9) * 1e6 + 0.5) / 1e6
    assert(got == want, s"got=$got want=$want")
    // symmetry of the construction: swapping source labels reverses
    // the (s1, s2) key but not the value
    val sw = jsd(Seq((1L, "a c", "s1"), (2L, "a a b", "s2")))(("s1", "s2"))
    assert(sw == got)
  }

  test("token entropy: uniform corpus gives H = ln k exactly; TTR reconciles") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // source u: 4 distinct tokens × 5 occurrences each → H = ln 4
    val docs = Seq(
      (1L, "a b c d a b c d a b", "en", "u"),
      (2L, "c d a b c d a b c d", "en", "u"),
      (3L, "x x x x", "en", "v")
    ).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.tokenEntropyOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val u = got("u")
    assert(u.getAs[Long]("n_tokens") == 20L)
    assert(u.getAs[Long]("n_types") == 4L)
    assert(u.getAs[Double]("ttr") == 0.2)
    assert(math.abs(u.getAs[Double]("entropy_nats") - math.log(4.0)) < 5e-5)
    val v = got("v")
    assert(v.getAs[Long]("n_tokens") == 4L)
    assert(v.getAs[Long]("n_types") == 1L)
    assert(v.getAs[Double]("ttr") == 0.25)
    assert(v.getAs[Double]("entropy_nats") == 0.0)
  }

  test("pmi bigrams match a hand fold; ppm ranking agrees with pmi order") {
    import spark.implicits._
    val texts = Seq(
      "x y x y x y a b",
      "a c a b x y a c",
      "x y a c b a c a")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong + 1, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
    val got = Search.pmiBigramsOf(docs, k = 100, minCount = 1L)
      .orderBy("rk").collect()
    val pairs = texts.flatMap { t => val w = t.split(" ").toSeq; w.zip(w.tail) }
    val cab = pairs.groupBy(identity).map { case (p, l) => p -> l.size.toLong }
    val n = pairs.size.toLong
    val ca = pairs.groupBy(_._1).map { case (a, l) => a -> l.size.toLong }
    val cb = pairs.groupBy(_._2).map { case (b, l) => b -> l.size.toLong }
    assert(got.length == cab.size)
    got.foreach { r =>
      val key = (r.getString(1), r.getString(2))
      assert(r.getAs[Long]("c_ab") == cab(key))
      assert(r.getAs[Long]("ca") == ca(key._1))
      assert(r.getAs[Long]("cb") == cb(key._2))
      assert(r.getAs[Long]("score_ppm") ==
        cab(key) * n * 1000000L / (ca(key._1) * cb(key._2)))
      val pmi = math.round(math.log(
        cab(key).toDouble * n / (ca(key._1) * cb(key._2))) * 10000) / 10000.0
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-9)
    }
    // rank order is (score_ppm desc, t1, t2) and agrees with pmi ordering
    val keys = got.map(r =>
      (-r.getAs[Long]("score_ppm"), r.getString(1), r.getString(2))).toSeq
    assert(keys == keys.sorted, "rank order broken")
    got.sliding(2).foreach {
      case Array(hi, lo) if hi.getAs[Long]("score_ppm") > lo.getAs[Long]("score_ppm") =>
        assert(hi.getAs[Double]("pmi") >= lo.getAs[Double]("pmi"),
          "ppm ranking disagreed with pmi")
      case _ => ()
    }
    // the perfect collocation tops the board
    assert((got.head.getString(1), got.head.getString(2)) == (("x", "y")))
  }

  test("query likelihood: hand fold exact; more tf outranks; shorter doc wins at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark pad pad pad", "en", "s"), // tf=3, dl=6
      (2L, "spark pad pad pad pad pad", "en", "s"),     // tf=1, dl=6
      (3L, "spark pad", "en", "s"),                     // tf=1, dl=2
      (4L, "pad pad pad pad pad pad", "en", "s")        // no match
    ).toDF("doc_id", "text", "lang", "source")
    val mu = 300L
    val got = Search.queryLikelihoodOf(spark, docs,
      Seq("q" -> Seq("spark")), k = 10, mu).orderBy("rk").collect()
    // more occurrences first, then the shorter of the equal-tf pair
    // (the Dirichlet length penalty), unmatched doc absent
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 2L))
    val nColl = 20L
    val ct = 5L
    def cu(ctd: Long) =
      math.round(math.log(1.0 + ctd.toDouble * nColl / (mu * ct)) * 1e6)
    def pen(dl: Long) =
      math.round(math.log(mu.toDouble / (dl + mu)) * 1e6)
    val su = Map(1L -> (cu(3) + pen(6)), 2L -> (cu(1) + pen(6)),
      3L -> (cu(1) + pen(2)))
    got.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(math.abs(r.getAs[Double]("score") - su(d) / 1e6) < 1e-12,
        s"doc $d: ${r.getAs[Double]("score")} vs ${su(d) / 1e6}")
      assert(r.getAs[Long]("n_matched") == 1L)
    }
  }

  test("rrf fusion: hand fold; both-lists doc outranks single-list; absent rank is 0") {
    import spark.implicits._
    val kappa = 60
    def ppb(rk: Long) = 1000000000L / (kappa + rk)
    // system A ranks docs 1,2,3; system B ranks 2,1,4 — docs 1 and 2
    // tie at ppb(1)+ppb(2), broken by doc_id; docs 3 and 4 are
    // single-list and must fall below both
    val a = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
      .toDF("query_id", "doc_id", "rk")
    val b = Seq(("q", 2L, 1L), ("q", 1L, 2L), ("q", 4L, 3L))
      .toDF("query_id", "doc_id", "rk")
    val got = Search.rrfFusionOf(a, b, k = 10, kappa).orderBy("rk").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L, 4L))
    val byDoc = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byDoc(1L).getAs[Long]("rrf_ppb") == ppb(1) + ppb(2))
    assert(byDoc(2L).getAs[Long]("rrf_ppb") == ppb(2) + ppb(1))
    assert(byDoc(3L).getAs[Long]("rrf_ppb") == ppb(3))
    assert(byDoc(3L).getAs[Long]("ql_rk") == 0L, "absent rank must be 0")
    assert(byDoc(4L).getAs[Long]("bm25_rk") == 0L)
    // both-lists docs outrank every single-list doc at these depths
    assert(byDoc(1L).getAs[Long]("rrf_ppb") > byDoc(3L).getAs[Long]("rrf_ppb"))
    // end-to-end over the corpus: every fused row carries at least
    // one real rank and the per-query ordering is (rrf desc, doc_id)
    val full = Search.rrfFusionTopK(spark, SF).collect()
    assert(full.nonEmpty)
    assert(full.forall(r =>
      r.getAs[Long]("bm25_rk") > 0 || r.getAs[Long]("ql_rk") > 0))
    full.groupBy(_.getString(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      val keys = sorted.map(r =>
        (-r.getAs[Long]("rrf_ppb"), r.getAs[Long]("doc_id"))).toSeq
      assert(keys == keys.sorted, "fused order broken")
    }
  }

  test("unigram cross-entropy: uniform corpus gives xent = ln k; rare tokens score higher") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 4 tokens × 5 occurrences each → every token costs ln(20/5) =
    // ln 4, so every doc's xent is exactly ln 4 regardless of length
    val uniform = Seq(
      (1L, "a b c d a b c d a b", "en", "u"),
      (2L, "c d a b c d a b c d", "en", "u"))
    val gotU = TextAnalysis.unigramXentOf(
        uniform.toDF("doc_id", "text", "lang", "source")).collect()
    gotU.foreach { r =>
      assert(math.abs(r.getAs[Double]("xent_nats") - math.log(4.0)) < 5e-5,
        s"doc ${r.getLong(0)}: ${r.getAs[Double]("xent_nats")}")
    }
    assert(gotU.map(r => r.getAs[Long]("dl")).toSeq == Seq(10L, 10L))
    // a doc of corpus-rare tokens must score above a doc of the
    // corpus-common token, and h_micro must equal the scala fold
    val skewed = Seq(
      (1L, "the the the the the the", "en", "s"),
      (2L, "zyx wvu tsr", "en", "s"))
    val gotS = TextAnalysis.unigramXentOf(
        skewed.toDF("doc_id", "text", "lang", "source")).collect()
      .map(r => r.getLong(0) -> r).toMap
    val n = 9L
    def cost(ct: Long) = math.round(math.log(n.toDouble / ct) * 1e6)
    assert(gotS(1L).getAs[Long]("h_micro") == 6 * cost(6))
    assert(gotS(2L).getAs[Long]("h_micro") == 3 * cost(1))
    assert(gotS(2L).getAs[Double]("xent_nats") >
      gotS(1L).getAs[Double]("xent_nats"))
  }

  test("bigram xent: ≡ scala fold on a crafted corpus; rare transitions score above common ones") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // doc 1 repeats the dominant transition a→b; doc 2 contains the
    // corpus-rare transitions b→b and b→a — it must score higher
    val docs = Seq(
      (1L, "a b a b a b", "en", "s"),
      (2L, "a b b a", "en", "s"),
      (3L, "a b a b", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.bigramXentOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // reference fold
    val toks = Map(1L -> Seq("a", "b", "a", "b", "a", "b"),
      2L -> Seq("a", "b", "b", "a"), 3L -> Seq("a", "b", "a", "b"))
    val allBg = toks.values.flatMap(t => t.zip(t.tail)).toSeq
    val c2 = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = allBg.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = toks.values.flatten.toSeq.distinct.length.toLong
    def cost(bg: (String, String)): Long =
      math.round((math.log((c1(bg._1) + v).toDouble) -
        math.log((c2(bg) + 1).toDouble)) * 1e6)
    toks.foreach { case (id, t) =>
      val bgs = t.zip(t.tail)
      val h = bgs.map(cost).sum
      assert(got(id)._1 == bgs.length.toLong, s"doc $id n_bigrams")
      assert(got(id)._2 == h, s"doc $id h_micro: ${got(id)._2} vs $h")
    }
    assert(got(2L)._3 > got(1L)._3,
      s"rare transitions must score above common: $got")
  }

  test("s-stemmer: the three Harman rules and their exceptions; crafted plurals conflate") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val cases = Seq(
      "queries" -> "query".replace("r", "r"), // -ies → -y
      "ladies" -> "lady",
      "eies" -> "eies", "aies" -> "aies",     // rule-1 exceptions hold
      "boxes" -> "boxe",                       // -es → -e (Harman, not Porter)
      "tables" -> "table",
      "goes" -> "goes", "sees" -> "sees",      // -oes / -ees exceptions
      "cats" -> "cat", "runs" -> "run",        // -s → ∅
      "bus" -> "bus", "class" -> "class",      // -us / -ss exceptions
      "dog" -> "dog")                          // untouched
    val got = cases.map(_._1).toDF("token")
      .select($"token",
        expr(TextAnalysis.sStemSqlExpr("lower(token)")).as("stem"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (t, w) =>
      assert(got(t) == w, s"stem($t) = ${got(t)}, want $w") }
    // crafted corpus: plural + singular surface forms pool under one
    // stem with summed frequency
    val docs = Seq((1L, "cats cat queries query boxes", "en", "s"),
      (2L, "cats tables table dog", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val tmp = java.nio.file.Files.createTempDirectory("stem").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val census = TextAnalysis.sStemVocabulary(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(census("cat") == ((2L, 3L)), s"${census("cat")}")   // cats×2 + cat×1, 2 forms
    assert(census("query") == ((2L, 2L)))
    assert(census("table") == ((2L, 2L)))
    assert(census("dog") == ((1L, 1L)))
  }

  test("heaps curve: all-distinct corpus fits beta = 1, constant corpus beta = 0; census by hand") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 10 docs (ids 1..10), 3 UNIQUE tokens each → V(cut) = N(cut) at
    // every checkpoint, so the log-log fit is exactly beta = 1
    val distinctDocs = (1 to 10).map(i =>
      (i.toLong, s"t${i}a t${i}b t${i}c", "en", "s"))
    val gotD = TextAnalysis.heapsCurveOf(
      distinctDocs.toDF("doc_id", "text", "lang", "source"))
      .orderBy("dec").collect()
    assert(gotD.length == 10)
    gotD.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == r.getAs[Long]("v_types"))
      assert(r.getAs[Double]("beta") == 1.0)
    }
    // decile cut d covers docs 1..d → N = 3d
    assert(gotD.map(_.getAs[Long]("n_tokens")).toSeq ==
      (1 to 10).map(_ * 3L))
    // constant corpus: V = 1 at every checkpoint → y ≡ 0 → beta = 0
    val constDocs = (1 to 10).map(i => (i.toLong, "x x x x", "en", "s"))
    val gotC = TextAnalysis.heapsCurveOf(
      constDocs.toDF("doc_id", "text", "lang", "source"))
      .orderBy("dec").collect()
    gotC.foreach { r =>
      assert(r.getAs[Long]("v_types") == 1L)
      assert(r.getAs[Double]("beta") == 0.0)
    }
    // real corpus: the curve is monotone in both N and V. The synthetic
    // corpus draws from a ~31-word pool, so V saturates at decile 1 and
    // beta = 0 exactly — the boilerplate alarm the operator documents.
    val real = TextAnalysis.heapsCurve(spark, SF).orderBy("dec").collect()
    val ns = real.map(_.getAs[Long]("n_tokens")).toSeq
    val vs = real.map(_.getAs[Long]("v_types")).toSeq
    assert(ns == ns.sorted && vs == vs.sorted, "curve must be monotone")
    val beta = real.head.getAs[Double]("beta")
    assert(beta >= 0.0 && beta <= 1.0, s"beta=$beta out of the Heaps band")
  }

  test("good-turing: crafted spectrum pins N_r, p0 = N1/N and r* = (r+1)N_{r+1}/N_r in integer units, N_r=0 guarded") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      // source u: counts a=2 b=1 c=1 → N=4, V=3, n1=2, n2=1
      (1L, "a a b c", "en", "u"),
      // source v: every type a singleton → r1* uses n2=0 → 0;
      // n1=0 branch on r1 guard exercised by w below
      (2L, "p q r", "en", "v"),
      // source w: one type seen 3 times → n1=0, n2=0 → both r* 0
      (3L, "z z z", "en", "w")
    ).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.goodTuringOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val u = got("u")
    assert(u.getAs[Long]("n_tokens") == 4L && u.getAs[Long]("n_types") == 3L)
    assert(u.getAs[Long]("n1") == 2L && u.getAs[Long]("n2") == 1L)
    assert(u.getAs[Long]("p0_ppm") == 500000L) // 2·10⁶ div 4
    assert(u.getAs[Long]("r1_star_micro") == 1000000L) // 2·1·10⁶ div 2
    assert(u.getAs[Long]("r2_star_micro") == 0L) // n3 = 0
    val v = got("v")
    assert(v.getAs[Long]("n1") == 3L && v.getAs[Long]("p0_ppm") == 1000000L)
    val w = got("w")
    assert(w.getAs[Long]("n1") == 0L && w.getAs[Long]("r1_star_micro") == 0L)
    assert(w.getAs[Long]("p0_ppm") == 0L)
  }

  test("rake: crafted phrases pin deg/freq scoring, occurrence merge, maxLen discard, tie-breaks") {
    import spark.implicits._
    import graft.operators.Search
    val docs = Seq(
      // "deep learning" twice + "neural nets" once, split on of/and
      (1L, "deep learning of deep learning and neural nets", "en", "s1"),
      // a 5-word stopword-free run -> discarded at maxLen=4
      (3L, "alpha beta gamma delta epsilon", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val tmp = java.nio.file.Files.createTempDirectory("rake").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Search.rakeKeyphrases(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // freq: deep 2, learning 2, neural 1, nets 1
    // deg:  deep 4, learning 4, neural 2, nets 2 -> every word 2e6
    // "deep learning" scores 4e6 with 2 occurrences and outranks the
    // equal-scoring "neural nets" on the occurrence tie-break;
    // the epsilon run never appears
    assert(got == Seq(("deep learning", 2L, 4000000L),
      ("neural nets", 1L, 4000000L)), s"got $got")
  }

  test("nb loglik: disjoint-vocabulary langs produce the exact hand-computed matrix, diagonal dominant") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (0L, "x x x", "aa", "s"), (1L, "x x", "aa", "s"),
      (2L, "y y y", "bb", "s"), (3L, "y y", "bb", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val tmp = java.nio.file.Files.createTempDirectory("nb").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.nbLogLik(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    def cost(c: Long, n: Long, v: Long): Long =
      math.round(math.log((c + 1).toDouble / (n + v).toDouble) * 1e6)
    // V = 2, each train model has N = 3
    val hit = cost(3, 3, 2)  // seen token
    val miss = cost(0, 3, 2) // unseen token
    assert(got(("aa", "aa")) == (1L, 2 * hit), s"got ${got(("aa", "aa"))}")
    assert(got(("aa", "bb")) == (1L, 2 * miss))
    assert(got(("bb", "aa")) == (1L, 2 * miss))
    assert(got(("bb", "bb")) == (1L, 2 * hit))
    assert(2 * hit > 2 * miss, "diagonal must dominate")
  }

  test("chao1: crafted frequency spectra fold by hand; no-singleton and all-singleton extremes") {
    import spark.implicits._
    import graft.operators.Search
    val tmp = java.nio.file.Files.createTempDirectory("chao").toString
    Seq(
      (1L, "aa bb cc cc", "en", "s1"),  // V=3 F1=2 F2=1
      (2L, "dd dd", "en", "s2"),        // V=1 F1=0 F2=1
      (3L, "ee ff", "en", "s3"))        // V=2 F1=2 F2=0
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Search.chao1Richness(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("s1") == ((3L, 2L, 1L, 3000L + 2000L / 4L)))
    assert(got("s2") == ((1L, 0L, 1L, 1000L))) // no singletons: Ĉ = V
    assert(got("s3") == ((2L, 2L, 0L, 2000L + 2000L / 2L)))
  }

  test("textrank: star word-graph matches an exact integer-iteration replay; the hub tops the board") {
    import spark.implicits._
    import graft.operators.Search
    val tmp = java.nio.file.Files.createTempDirectory("trank").toString
    // three docs each pairing 'alpha' with one distinct partner (and
    // a short stop token that the length filter removes): the word
    // graph is the star alpha-{beta, gamma, delta}
    Seq((1L, "alpha of beta", "en"), (2L, "alpha of gamma", "en"),
      (3L, "alpha of delta", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Search.textrankKeywords(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // exact replay of the integer fixpoint on the star
    val nodes = Seq("alpha", "beta", "gamma", "delta")
    val nbrs = Map("alpha" -> Seq("beta", "gamma", "delta"),
      "beta" -> Seq("alpha"), "gamma" -> Seq("alpha"),
      "delta" -> Seq("alpha"))
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      rank = nodes.map { n =>
        val in = nbrs(n).map(m => rank(m) / nbrs(m).length.toLong).sum
        n -> (150000L + (850L * in) / 1000L)
      }.toMap
    }
    val want = rank.toSeq.sortBy { case (n, r) => (-r, n) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    assert(got.head._1 == "alpha")
  }

  test("burstiness: a concentrated topical term outranks a spread function word of equal cf; the min-df floor excludes rare terms") {
    import spark.implicits._
    import graft.operators.Search
    val tmp = java.nio.file.Files.createTempDirectory("burst").toString
    // 'the': once in each of 6 docs (cf 6, df 6, burst 1e6);
    // 'zebra': 4+1+1 across 3 docs (cf 6, df 3, burst 2e6);
    // 'rare': twice in 2 docs only (df 2 < minDf 3 -> excluded)
    Seq(
      (1L, "the zebra zebra zebra zebra rare", "en"),
      (2L, "the zebra rare", "en"),
      (3L, "the zebra", "en"),
      (4L, "the", "en"),
      (5L, "the", "en"),
      (6L, "the", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Search.burstiness(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("zebra", 6L, 3L, 2000000L),
      ("the", 6L, 6L, 1000000L)), got.mkString(", "))
  }
}
