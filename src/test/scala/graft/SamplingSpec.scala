package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def ids(ratePerMille: Int, salt: String = ""): Set[Long] = {
    import spark.implicits._
    Sampling.hashSample(Tables.documents(spark, SF), $"doc_id",
        ratePerMille, salt)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
  }

  test("hash sampling is deterministic and nested by rate") {
    val s100a = ids(100)
    val s100b = ids(100)
    assert(s100a == s100b, "same rate+salt must give the identical sample")
    val s50 = ids(50)
    val s200 = ids(200)
    assert(s50.subsetOf(s100a) && s100a.subsetOf(s200),
      "lower-rate samples must nest inside higher-rate ones")
  }

  test("sample size tracks the rate and salts draw independently") {
    val n = Tables.documents(spark, SF).count().toDouble
    val s200 = ids(200)
    assert(math.abs(s200.size / n - 0.2) < 0.1,
      s"200 per-mille sample kept ${s200.size}/$n")
    val other = ids(200, salt = "v2")
    assert(other != s200, "a different salt must draw a different sample")
  }

  test("stratified rates hold per stratum") {
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
    val kept = Sampling.stratifiedSample(docs, $"doc_id", $"lang",
      Map("en" -> 1000), defaultPerMille = 0)
    // en fully kept, everything else fully dropped
    val langs = kept.select($"lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs == Set("en"))
    assert(kept.count() == docs.filter($"lang" === "en").count())
  }

  test("mixture sampling upweights rare sources and hits the target") {
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
    val rows = Sampling.sampleMixture(spark, SF, targetPerMille = 200)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("rate_pm"), r.getAs[Long]("n_kept")))
    assert(rows.map(_._2).sum == docs.count())
    // α = 0.5 ⇒ keep-rate ∝ n^-0.5: rarer sources get higher rates
    val byN = rows.sortBy(_._2)
    assert(byN.head._3 >= byN.last._3,
      s"rarest source rate ${byN.head._3}‰ < commonest ${byN.last._3}‰")
    // expected kept = Σ n_s·rate_s/1000 ≈ target (floor rounding only
    // loses < 1 doc per source)
    val expectedKept = rows.map(r => r._2 * r._3 / 1000.0).sum
    val target = docs.count() * 0.2
    assert(math.abs(expectedKept - target) <= rows.length,
      s"expected kept $expectedKept vs target $target")
    // n_kept re-derives from the same hash membership
    val rates = rows.map(r => r._1 -> r._3).toMap
    val kept = docs
      .withColumn("b", Sampling.bucket($"doc_id", "mix"))
      .collect()
      .count(r => r.getAs[Long]("b") < rates(r.getAs[String]("source")))
    assert(kept.toLong == rows.map(_._4).sum)
  }

  test("token-budget cap: within budget, prefix-contiguous, monotone in budget, no text shuffled") {
    import spark.implicits._
    def kept(b: Long) = Sampling.sampleTokenBudget(spark, SF, budgetTokens = b)
    val rows = kept(800).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every source's admitted total respects the budget, and cum is
    // consistent: per source, max(cum) == sum(n_tokens)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val maxCum = rs.map(_._4).max
      assert(maxCum <= 800, s"$src exceeded budget: $maxCum")
      assert(maxCum == rs.map(_._3).sum, s"$src cum inconsistent")
    }
    // the cap genuinely cut something on this corpus
    val total = Tables.documents(spark, SF).count()
    assert(rows.length < total, "budget did not bind — vacuous gate")
    // monotone: a bigger budget admits a superset
    val ids800 = rows.map(_._1).toSet
    val ids1200 = kept(1200).collect().map(_.getLong(0)).toSet
    assert(ids800.subsetOf(ids1200))
    // the window shuffle moves scalars only, never document text
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shuffles = kept(800).queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e.output }
      assert(shuffles.nonEmpty)
      shuffles.foreach(out => assert(!out.exists(_.name == "text"),
        s"document text in the budget-cap exchange: ${out.map(_.name)}"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("interleave: every prefix stays proportional on a 90/10 corpus; banded rank ≡ naive window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 900L).map(i => (i, "crawl")) ++
      (901L to 1000L).map(i => (i, "books"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8)).toDF("doc_id", "source")
    val order = Sampling.interleaveOrderOf(docs)
      .orderBy($"interleave_key", $"source", $"doc_id")
      .select($"source").collect().map(_.getString(0))
    assert(order.length == 1000)
    // systematic midpoints: any prefix of length L carries each
    // source within ±1 of its proportional share
    for (l <- Seq(10, 100, 333, 500, 1000)) {
      val books = order.take(l).count(_ == "books")
      assert(math.abs(books - l * 0.1) <= 1.0, s"prefix $l: books=$books")
    }
    // the banded rank is exactly the naive per-source window rank
    val naive = docs
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy($"source")
          .orderBy(Sampling.bucket($"doc_id", "ilv"), $"doc_id")))
      .withColumn("k", (lit(2L) * $"r" - 1L) *
        expr("1000000000000 div (2 * CASE WHEN source = 'crawl' " +
          "THEN 900 ELSE 100 END)"))
      .select($"doc_id", $"k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Sampling.interleaveOrderOf(docs)
      .select($"doc_id", $"interleave_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive)
  }

  test("unimax: capped prefix binds small sources at E·n, splits the rest evenly, exhausts the budget") {
    import spark.implicits._
    def alloc(sizes: Map[String, Long], b: Long, e: Long) = {
      val docs = sizes.toSeq.flatMap { case (s, n) =>
        Seq((s, 1L, ("tok " * n.toInt).trim)) } // n whitespace tokens
        .toDF("source", "doc_id", "text")
      Sampling.unimaxAllocationOf(docs, b, e).collect()
        .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    }
    // hand-traced: E=2, B=100 over [10, 20, 1000] → the two small
    // sources bind at 20/40, the giant splits the remaining 40 alone
    val g = alloc(Map("a" -> 10L, "b" -> 20L, "c" -> 1000L), 100L, 2L)
    assert(g == Map("a" -> ((1L, 20L)), "b" -> ((1L, 40L)),
      "c" -> ((0L, 40L))), g.toString)
    // budget below every cap → plain uniform split, floor division
    val u = alloc(Map("a" -> 100L, "b" -> 100L, "c" -> 100L), 31L, 5L)
    assert(u.values.toSeq == Seq((0L, 10L), (0L, 10L), (0L, 10L)))
    // budget above all caps → every source binds at E·n
    val c = alloc(Map("a" -> 10L, "b" -> 20L, "c" -> 30L), 10000L, 2L)
    assert(c == Map("a" -> ((1L, 20L)), "b" -> ((1L, 40L)),
      "c" -> ((1L, 60L))))
    // the allocation never over-spends and never exceeds a cap
    for ((m, b, e) <- Seq((Map("x" -> 7L, "y" -> 900L, "z" -> 35L), 200L, 3L),
        (Map("x" -> 1L, "y" -> 2L, "z" -> 3L, "w" -> 1000L), 50L, 4L))) {
      val a = alloc(m, b, e)
      assert(a.values.map(_._2).sum <= b)
      a.foreach { case (s, (_, al)) => assert(al <= e * m(s)) }
    }
  }

  test("token-budget cap: two-phase banding ≡ single global window on a 90%-skewed corpus") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one source holds 90% of the docs — the shape that serializes a
    // per-source window at 100 TB. parallelize (not a local Seq toDF)
    // so the frame genuinely distributes instead of constant-folding.
    val rows = (1L to 900L).map(i => (i, "crawl", 7L + i % 13)) ++
      (901L to 1000L).map(i => (i, "books", 5L + i % 11))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8))
      .toDF("doc_id", "source", "n_tokens")
    val budget = 2500L
    val got = Sampling.capTokensPerSource(docs, budget)
      .select($"doc_id", $"cum_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the reference semantics, computed the naive way: one global
    // running sum per source over the full admission order
    val wRef = Window.partitionBy($"source")
      .orderBy(Sampling.bucket($"doc_id", "cap"), $"doc_id")
    val ref = docs.withColumn("cum_tokens", sum($"n_tokens").over(wRef))
      .filter($"cum_tokens" <= budget)
      .select($"doc_id", $"cum_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ref.nonEmpty && ref.size < rows.size, "budget must bind")
    assert(got == ref,
      s"banded≠global: only-banded=${(got.toSet -- ref.toSet).take(5)} " +
        s"only-global=${(ref.toSet -- got.toSet).take(5)}")
  }

  test("fixed-count quota: exactly min(N, |source|) rows, banded ≡ global rank on a 90%-skewed corpus") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 900L).map(i => (i, "crawl")) ++
      (901L to 1000L).map(i => (i, "books")) ++
      (1001L to 1005L).map(i => (i, "tiny")) // smaller than the quota
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8)).toDF("doc_id", "source")
    val n = 50L
    val got = Sampling.sampleFixedPerSource(docs, n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exact counts: min(N, source size), ranks contiguous from 1
    val bySrc = got.groupBy(_._2)
    assert(bySrc("crawl").length == 50 && bySrc("books").length == 50 &&
      bySrc("tiny").length == 5, s"counts ${bySrc.view.mapValues(_.length).toMap}")
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"$src ranks not contiguous")
    }
    // banded two-phase ≡ the naive global window, row for row
    val wRef = Window.partitionBy($"source")
      .orderBy(Sampling.bucket($"doc_id", "quota"), $"doc_id")
    val ref = docs.withColumn("rank_in_source",
        row_number().over(wRef).cast("long"))
      .filter($"rank_in_source" <= n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.toSet == ref,
      s"only-banded=${(got.toSet -- ref).take(5)} only-global=${(ref -- got.toSet).take(5)}")
    // monotone: quota 20 is a prefix of quota 50 per source
    val small = Sampling.sampleFixedPerSource(docs, 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    small.foreach { case (id, rk) =>
      val inBig = got.find(_._1 == id)
      assert(inBig.exists(_._3 == rk), s"doc $id rank changed with quota")
    }
  }

  test("rate-based budget cap: windowless plan, rates integer-derived, kept tokens near budget") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val budget = 800L
    val kept = Sampling.sampleTokenBudgetRate(spark, SF, budget)
    val rows = kept.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // determinism: same call, same membership
    assert(kept.collect().map(_.getLong(0)).toSet == rows.map(_._1).toSet)
    // every source's rate is the integer formula and the kept-token
    // total lands near the budget (hash thinning is binomial; the
    // corpus carries ~1.1-1.6k tokens/source at 800 budget, so rates
    // sit mid-range and the slack below is generous)
    val totals = Tables.documents(spark, SF)
      .select($"doc_id", $"source",
        size(graft.operators.Dedup.tokensCol($"text")).cast("long").as("n_tokens"))
      .groupBy($"source").agg(sum($"n_tokens").as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val expectedRate = math.min(1000L, budget * 1000L / totals(src))
      assert(rs.head._4 == expectedRate, s"$src rate ${rs.head._4} != $expectedRate")
      val keptTokens = rs.map(_._3).sum
      assert(keptTokens <= 2 * budget && keptTokens >= budget / 4,
        s"$src kept $keptTokens tokens vs budget $budget — rate thinning broken")
    }
    // the whole point of the rate path: NO window anywhere in the plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val windows = kept.queryExecution.executedPlan
        .collect { case w: WindowExec => w }
      assert(windows.isEmpty, "rate path must not contain a window")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("rate-based cap keeps a zero-token source whole (NULL-division guard)") {
    import spark.implicits._
    // a source of empty docs: tot_tokens = 0 once made the integer div
    // NULL, so `bucket < NULL` silently dropped every doc; any rate
    // satisfies a zero-token budget, so the whole source must survive
    val docs = Seq(
      (1L, "empty", 0L), (2L, "empty", 0L), (3L, "empty", 0L),
      (4L, "real", 500L), (5L, "real", 600L))
      .toDF("doc_id", "source", "n_tokens")
    val kept = Sampling.capTokensPerSourceRate(docs, budgetTokens = 800L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val empties = kept.filter(_._2 == "empty")
    assert(empties.length == 3 && empties.forall(_._3 == 1000L),
      s"zero-token source not kept whole: ${kept.toSeq}")
    assert(kept.exists(_._2 == "real"), "real source vanished")
    // budget = 0: a zero-token source STILL satisfies the budget and
    // survives whole, while token-bearing sources get rate 0
    val keptZero = Sampling.capTokensPerSourceRate(docs, budgetTokens = 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(keptZero.count(_._2 == "empty") == 3 &&
      keptZero.forall(_._2 == "empty"),
      s"budget=0 must keep exactly the zero-token source: ${keptZero.toSeq}")
  }

  test("sampling stays a zero-shuffle scan filter") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Sampling.hashSample(
        Tables.documents(spark, SF), $"doc_id", 100)
        .queryExecution.executedPlan
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "hash sampling must not introduce an exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("train/val/test split: exhaustive, disjoint, deterministic, ~90/5/5, zero-shuffle") {
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
    val n = docs.count()
    val assign = Sampling.splitAssign(docs, $"doc_id")
      .select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // one label per doc (exhaustive + disjoint by construction, but
    // assert it survives refactors), only the three labels
    assert(assign.length.toLong == n)
    assert(assign.map(_._1).distinct.length == assign.length)
    assert(assign.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // deterministic: a second run assigns identically
    val again = Sampling.splitAssign(docs, $"doc_id")
      .select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(assign.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // band shares: md5 buckets are uniform-ish; at 500 docs allow
    // generous slack around 900/50/50 per-mille
    val census = assign.groupBy(_._2).view.mapValues(_.length).toMap
    assert(census.getOrElse("train", 0) > 0.8 * n &&
      census.getOrElse("train", 0) < 0.97 * n, s"census $census")
    // the split must not correlate with the sampling draw: the
    // salts differ, so the 100-per-mille sample hits all splits'
    // keyspace at roughly its global rate (loose bound)
    val sampled = Sampling.hashSample(docs, $"doc_id", 100)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val trainIds = assign.filter(_._2 == "train").map(_._1).toSet
    val inTrain = sampled.count(trainIds)
    assert(inTrain > 0 && inTrain < sampled.size,
      "sample membership must straddle split boundaries")
  }

  test("PPS systematic: banded selection ≡ global-cumsum re-derivation; pick count exact; giants always drawn") {
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
      .select($"doc_id", $"n_chars",
        Sampling.bucket($"doc_id", "pps").as("band"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ordered = docs.sortBy { case (id, _, band) => (band, id) }
    val bigW = ordered.map(_._2).sum
    val s = math.max(bigW / 50, 1L)
    var c = 0L
    val expected = ordered.flatMap { case (id, w, _) =>
      val (c0, c1) = (c, c + w); c = c1
      val picks = c1 / s - c0 / s
      if (picks > 0) Some(id -> (w, picks)) else None
    }.toMap
    val got = Sampling.samplePps(spark, SF)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"spark-only=${(got.toSet -- expected.toSet).take(3)} " +
      s"scala-only=${(expected.toSet -- got.toSet).take(3)}")
    // every stride position lands in exactly one interval
    assert(got.values.map(_._2).sum == bigW / s)
    // an interval at least one stride wide must contain a multiple
    docs.filter(_._2 >= s).foreach { case (id, _, _) =>
      assert(got.contains(id), s"giant unit $id not drawn") }
  }

  test("PPS systematic: the unit key is a parameter, not a hard-coded doc_id (r10 advice)") {
    import spark.implicits._
    // a frame whose key is named anything else must work, and with
    // the same key VALUES must reproduce the identical draw
    val renamed = Tables.documents(spark, SF)
      .select($"doc_id".as("unit_id"), $"n_chars")
    val got = Sampling.ppsSystematic(renamed, $"n_chars", n = 50L,
        key = $"unit_id")
      .select($"unit_id", $"weight", $"picks")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = Sampling.samplePps(spark, SF)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == base,
      s"renamed-key draw diverged: only-renamed=${(got.toSet -- base.toSet).take(3)}")
    // and the output keeps the caller's columns (no doc_id invented)
    assert(Sampling.ppsSystematic(renamed, $"n_chars", n = 50L,
      key = $"unit_id").columns.toSeq == Seq("unit_id", "n_chars", "weight", "picks"))
  }

  test("negative sampling: deterministic, self-free, ≤k per anchor, negatives are real docs, salt redraws") {
    import spark.implicits._
    val docs = Tables.documents(spark, SF).select($"doc_id")
    val ids = docs.collect().map(_.getLong(0)).toSet
    val a = Sampling.sampleNegatives(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Sampling.sampleNegatives(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b, "draw must be reproducible")
    assert(a.forall { case (anc, _, neg) => anc != neg }, "self-pair leaked")
    assert(a.forall { case (_, _, neg) => ids.contains(neg) },
      "negative is not a real doc")
    val perAnchor = a.groupBy(_._1).view.mapValues(_.size)
    assert(perAnchor.values.forall(_ <= 4))
    assert(perAnchor.values.sum > ids.size * 3,
      "self-skip should drop only a sliver of draws")
    // an independent salt draws a different set
    val c = Sampling.sampleNegatives(docs, k = 4, salt = "neg2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(c != a, "salt must redraw")
  }

  test("temporal split: embargo strictly separates train from test; counts partition the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gap = 24 * 3600L
    val rows = graft.operators.Sampling.temporalSplit(spark, SF)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.contains("train") && rows.contains("test"))
    val total = Tables.events(spark, SF).count()
    assert(rows.values.map(_._1).sum == total, "splits must partition")
    val (trHi, teLo) = (rows("train")._4, rows("test")._3)
    // the core promise: nothing within `gap` of the cutoff crosses it
    assert(teLo - trHi > gap,
      s"embargo violated: test starts ${teLo - trHi}s after train ends")
    rows.get("embargo").foreach { case (_, _, lo, hi) =>
      assert(lo > trHi && hi <= trHi + gap, s"embargo bounds [$lo,$hi]")
    }
    // the cutoff really is the ~80th per-mille point
    val frac = rows("train")._1.toDouble / total
    assert(frac >= 0.79 && frac <= 0.82, s"train fraction $frac")
  }

  test("kfold census: folds disjoint-exhaustive over 0..k-1, counts reconcile, md5 replica agrees") {
    import graft.operators.Sampling
    val rows = Sampling.kfoldCensus(spark, SF).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows.map(_._1).forall(f => f >= 0L && f < 5L))
    val total = Tables.documents(spark, SF).count()
    assert(rows.map(_._3).sum == total, "census drops or double-counts docs")
    // independent md5 replica of the fold assignment
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((id.toString + "fold").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16) % 1000
    }
    val docs = Tables.documents(spark, SF)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy { case (id, src) => (bucket(id) / 200, src) }
      .view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap ==
      expected.map { case ((f, s), n) => (f, s) -> n })
    intercept[IllegalArgumentException] {
      Sampling.kfoldCensus(spark, SF, k = 7)
    }
  }

  test("importance weights: 9:1 mix gives the exact uniform-target weights, cap binds, ESS reconciles") {
    import spark.implicits._
    import graft.operators.Sampling
    val docs = ((1L to 9L).map(i => (i, "big")) ++ Seq((10L, "rare")))
      .map { case (id, s) => (id, s"t$id", "en", s) }
      .toDF("doc_id", "text", "lang", "source")
    val tmp = java.nio.file.Files.createTempDirectory("iw").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Sampling.importanceWeights(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toMap
    // w = n_total*1e6 div (k*n): big = 10e6/18 = 555555, rare = 5e6
    assert(got("big") == ((9L, 555555L, 0L, got("big")._4)))
    assert(got("rare")._2 == 5000000L && got("rare")._3 == 0L)
    val sw = 9L * 555555L + 5000000L
    val sw2 = 9L * 555555L * 555555L + 5000000L * 5000000L
    val ess = math.rint(sw.toDouble * sw / sw2 * 100) / 100
    assert(math.abs(got("big")._4 - ess) < 1e-9, s"ess ${got("big")._4} vs $ess")
    // a tight cap binds and flags
    val capped = Sampling.importanceWeights(spark, tmp, capPpm = 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(capped("rare") == 1L && capped("big") == 0L)
  }

  test("neyman allocation: zero-variance strata get nothing, equal weights split evenly, remainders deal deterministically and sum to B") {
    import spark.implicits._
    import graft.operators.Sampling
    // moments run in HECTOCHAR units (n_chars div 100), so the
    // fixture speaks in multiples of 100 chars: A constant -> sigma 0
    // -> w 0; B and C: hectochar spread gives scaled variance 100
    // each -> w = round(sqrt(100)) = 10
    val docs = Seq(
      ("A", 1000L), ("A", 1000L), ("B", 500L), ("B", 1500L),
      ("C", 1000L), ("C", 2000L))
      .toDF("source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("ney").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val even = Sampling.neymanAllocation(spark, tmp, budget = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    assert(even("A") == ((0L, 0L, 0L)))
    assert(even("B") == ((10L, 50L, 50L)))
    assert(even("C") == ((10L, 50L, 50L)))
    // budget 5 over W=20: B and C floor to 2 with remainder 10 each;
    // the single leftover seat breaks the tie by source name -> B
    val odd = Sampling.neymanAllocation(spark, tmp, budget = 5L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(odd("A") == ((0L, 0L, 0L)))
    assert(odd("B") == ((2L, 10L, 3L)))
    assert(odd("C") == ((2L, 10L, 2L)))
    assert(odd.values.map(_._3).sum == 5L)
  }
}
