package graft

import org.apache.spark.sql.functions._

class OlapSpec extends SparkSpec {

  test("HLL approx distinct within 5% of exact (the 100 TB path)") {
    import spark.implicits._
    val ev = Tables.events(spark, SF)
    val exact = ev.select(count_distinct($"user_id")).collect()(0).getLong(0)
    val approx = ev.select(approx_count_distinct($"user_id", rsd = 0.02))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx quantiles bracket the exact median") {
    import spark.implicits._
    val ev = Tables.events(spark, SF)
    val exact = ev.select(percentile($"value", lit(0.5)))
      .collect()(0).getDouble(0)
    val Array(approx) = ev.stat.approxQuantile("value", Array(0.5), 0.01)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("rollup computes all grouping levels in one Expand pass") {
    val plan = graft.operators.Olap.rollupOrders(spark, SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup not planned as Expand:\n$plan")
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"rollup should need at most one shuffle:\n$plan")
  }

  test("cube margins reconcile: every 1-D margin and the grand total equal their cell sums") {
    val rows = graft.operators.Olap.cubeOrders(spark, SF)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2))).toSeq
    val cells = rows.collect { case (Some(s), Some(p), n) => (s, p, n) }
    assert(cells.nonEmpty)
    // status margins (prio = null) = sum of that status's cells
    rows.collect { case (Some(s), None, n) => (s, n) }.foreach { case (s, n) =>
      assert(n == cells.filter(_._1 == s).map(_._3).sum, s"status $s margin")
    }
    // prio margins (status = null) = sum of that prio's cells
    rows.collect { case (None, Some(p), n) => (p, n) }.foreach { case (p, n) =>
      assert(n == cells.filter(_._2 == p).map(_._3).sum, s"prio $p margin")
    }
    // grand total = sum of all cells
    val grand = rows.collect { case (None, None, n) => n }
    assert(grand.length == 1 && grand.head == cells.map(_._3).sum)
    // same single-pass Expand plan as rollup, with one more grouping set
    val plan = graft.operators.Olap.cubeOrders(spark, SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"cube not planned as Expand:\n$plan")
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"cube should need at most one shuffle:\n$plan")
  }

  test("share of total: ppm shares sum to 10⁶ within truncation, cents reconcile") {
    import spark.implicits._
    val rows = graft.operators.Olap.shareOfTotal(spark, SF)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    // each floor-truncated share loses < 1 ppm: the sum lands in
    // (10⁶ − |groups|, 10⁶]
    val ppm = rows.map(_._4).sum
    assert(ppm <= 1000000L && ppm > 1000000L - rows.length,
      s"ppm sum $ppm for ${rows.length} groups")
    // cents reconcile with an independent integer recompute
    val want = Tables.orders(spark, SF)
      .select($"o_orderstatus",
        org.apache.spark.sql.functions.round($"o_totalprice" * 100)
          .cast("long").as("c"))
      .groupBy($"o_orderstatus").sum("c")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (s, _, cents, _) =>
      assert(cents == want(s), s"status $s cents") }
  }

  test("MAD per lang equals a driver-side discrete re-derivation") {
    import spark.implicits._
    val got = graft.operators.Olap.madByLang(spark, SF)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val byLang = Tables.documents(spark, SF).select($"lang", $"n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    def disc(sorted: IndexedSeq[Long]): Long =
      sorted(math.ceil(0.5 * sorted.size).toInt - 1) // rank ⌈p·n⌉
    byLang.foreach { case (lang, vs) =>
      val med = disc(vs)
      val mad = disc(vs.map(v => math.abs(v - med)).sorted)
      assert(got(lang) == ((vs.size.toLong, med, mad)),
        s"$lang: got ${got(lang)}, want (${vs.size}, $med, $mad)")
    }
    // robustness sanity: MAD stays despite the heavy tail stddev sees
    got.values.foreach { case (_, med, mad) =>
      assert(mad >= 0 && mad <= med, s"MAD out of range: med=$med mad=$mad") }
  }

  test("grouping sets: margins only — no grand total — in one Expand pass") {
    val rows = graft.operators.Olap.groupingSetsOrders(spark, SF)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2))).toSeq
    val cells = rows.collect { case (Some(s), Some(p), n) => (s, p, n) }
    assert(cells.nonEmpty)
    // both margins present and reconciling with the cells…
    rows.collect { case (Some(s), None, n) => (s, n) }.foreach { case (s, n) =>
      assert(n == cells.filter(_._1 == s).map(_._3).sum, s"status $s margin")
    }
    rows.collect { case (None, Some(p), n) => (p, n) }.foreach { case (p, n) =>
      assert(n == cells.filter(_._2 == p).map(_._3).sum, s"prio $p margin")
    }
    // …but NO grand total: the lattice CUBE can't drop rows from
    assert(rows.collect { case (None, None, n) => n }.isEmpty,
      "explicit grouping sets must not emit the grand total")
    val plan = graft.operators.Olap.groupingSetsOrders(spark, SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"not planned as Expand:\n$plan")
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"should need at most one shuffle:\n$plan")
  }

  test("unpivot rotates losslessly: long frame ≡ wide frame, no extra exchange") {
    import spark.implicits._
    val long = graft.operators.Olap.unpivotOrderMetrics(spark, SF)
    val rows = long.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wide = graft.Tables.orders(spark, SF)
      .groupBy($"o_orderstatus".as("status"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide.nonEmpty)
    // every status contributes exactly the 3 metric rows, and the
    // rotated n_orders equals an independent recount
    wide.foreach { case (s, n) =>
      assert(rows((s, "n_orders")) == n.toDouble, s"status $s recount")
      assert(rows.contains((s, "total_price")) && rows.contains((s, "avg_price")))
    }
    assert(rows.size == wide.size * 3, s"row count ${rows.size}")
    // the rotation itself (Expand) adds no shuffle beyond the
    // aggregate's — audited on a fresh instance (an executed AQE
    // plan's toString repeats the Exchange in its Initial Plan echo)
    val plan = graft.operators.Olap.unpivotOrderMetrics(spark, SF)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"unpivot should ride the aggregate's single shuffle:\n$plan")
  }

  test("percentile_disc boundary semantics: rank ceil(p·n) on exact-multiple groups") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // groups where p·n lands exactly on a rank — the fp-rounding
    // danger zone the gate's integer-arithmetic oracle sidesteps.
    // Standard semantics: smallest value with cume_dist ≥ p, i.e. the
    // value at rank ceil(p·n): n=10 → p50=5, p90=9; n=20 → p50=10, p90=18.
    val rows = (1 to 10).map(v => ("ten", v.toLong)) ++
      (1 to 20).map(v => ("twenty", v.toLong))
    val got = spark.createDataFrame(rows).toDF("g", "v")
      .groupBy($"g")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got("ten") == ((5.0, 9.0)), s"n=10 boundary: ${got("ten")}")
    assert(got("twenty") == ((10.0, 18.0)), s"n=20 boundary: ${got("twenty")}")
  }

  test("bigram coherence: every score ≥ 1 (a bigram counts itself), ordered corpus beats shuffled") {
    import spark.implicits._
    val rows = graft.operators.TextAnalysis.bigramCoherence(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, nb, c) =>
      assert(nb >= 1 && c >= 1.0, s"doc $doc coherence $c below floor")
    }
    // the corpus's synthetic docs share templated transitions, so the
    // corpus mean must sit well above the gibberish floor of 1.0
    val mean = rows.map(_._3).sum / rows.length
    assert(mean > 1.5, s"corpus mean coherence $mean suspiciously low")
  }

  test("histogram: dense 20-bin spine, counts cover every order, empty bins zero") {
    import spark.implicits._
    val rows = graft.operators.Olap.histogramOrders(spark, SF)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))
    assert(rows.length == 20 && rows.map(_._1).toSeq == (0L until 20L),
      s"spine not dense: ${rows.map(_._1).toSeq}")
    rows.foreach { case (b, lo, hi, _) =>
      assert(lo == b * 30000.0 && hi == (b + 1) * 30000.0,
        s"bin $b edges ($lo,$hi)") }
    val total = Tables.orders(spark, SF).count()
    assert(rows.map(_._4).sum == total,
      s"histogram mass ${rows.map(_._4).sum} != orders $total")
  }

  test("histogram: non-default bins derive width/spine/clamp consistently") {
    // bins=10 halves the spine and doubles the width — edges and mass
    // must follow the parameter, not a hard-coded 20-bin constant
    val rows = graft.operators.Olap.histogramOrders(spark, SF, bins = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))
    assert(rows.length == 10 && rows.map(_._1).toSeq == (0L until 10L))
    rows.foreach { case (b, lo, hi, _) =>
      assert(lo == b * 60000.0 && hi == (b + 1) * 60000.0,
        s"bin $b edges ($lo,$hi)") }
    assert(rows.map(_._4).sum == Tables.orders(spark, SF).count())
    // the oracle follows the same parameter
    val sql = graft.operators.Olap.histogramOrdersSql(10)
    // anchored "// 6000000," pins the bins=10 div width exactly — a
    // bare contains("6000000") would also match e.g. "60000000"
    assert(sql.contains("generate_series(0, 9)") && sql.contains("// 6000000,"))
    // a bins value with fractional cent edges must fail loudly
    intercept[IllegalArgumentException] {
      graft.operators.Olap.histogramOrders(spark, SF, bins = 7)
    }
  }

  test("equi-depth histogram: decile depths within ±1, edges monotone non-overlapping, mass = corpus") {
    val rows = graft.operators.Olap.histogramEquiDepth(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 10L), s"buckets ${rows.map(_._1).toSeq}")
    val n = Tables.orders(spark, SF).count()
    assert(rows.map(_._2).sum == n, "bucket counts must cover every order")
    // equi-DEPTH: sizes differ by at most 1 and only the leading
    // buckets carry the remainder (the SQL-standard NTILE layout)
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"not equi-depth: ${sizes.toSeq}")
    assert(sizes.sorted.reverse.toSeq == sizes.toSeq,
      s"remainder not on leading buckets: ${sizes.toSeq}")
    // edges: non-decreasing within, non-overlapping across (ties at
    // the boundary may share a value, never invert)
    rows.foreach { case (b, _, lo, hi, _) =>
      assert(lo <= hi, s"bucket $b inverted edges ($lo,$hi)") }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"overlap: bucket ${a._1} hi=${a._4} > bucket ${b._1} lo=${b._3}")
    case _ => () }
    // mass: per-bucket sums reconcile with the corpus total cents
    val total = Tables.orders(spark, SF)
      .selectExpr("CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)")
      .head.getLong(0)
    assert(rows.map(_._5).sum == total)
  }

  test("chi-square: corpus cells match a scala re-derivation; hand-checked 2×2 closed form") {
    val got = graft.operators.Olap.chiSquareOrders(spark, SF).collect()
      .map(r => ((r.getString(0), r.getString(1)), // (priority, status)
        (r.getLong(2), r.getDouble(3), r.getDouble(4))))
    // re-derive margins from the raw table
    val cells = Tables.orders(spark, SF)
      .groupBy("o_orderpriority", "o_orderstatus").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val rTot = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val cTot = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val nTot = cells.values.sum
    assert(got.length == cells.size)
    got.foreach { case ((pri, st), (obs, expd, contrib)) =>
      val o = cells((pri, st))
      assert(obs == o, s"cell ($pri,$st) observed $obs vs $o")
      val d = nTot * o - rTot(pri) * cTot(st)
      val expExp = math.round(rTot(pri).toDouble * cTot(st).toDouble / nTot * 1e4) / 1e4
      val expContrib = math.round(d.toDouble * d.toDouble /
        (nTot.toDouble * rTot(pri).toDouble * cTot(st).toDouble) * 1e4) / 1e4
      assert(math.abs(expd - expExp) < 1e-9, s"($pri,$st) expected $expd vs $expExp")
      assert(math.abs(contrib - expContrib) < 1e-9, s"($pri,$st) contrib $contrib vs $expContrib")
    }
    // independence sanity, through the ENGINE's expression (not a
    // constant re-statement): a perfectly independent 2×2 has d = 0
    // and contrib = 0 in every cell under the gate's exact algebra
    val cells2x2 = Seq(("a", "x", 60L), ("a", "y", 140L),
      ("b", "x", 90L), ("b", "y", 210L)) // margins 200/300 × 150/350
    val df = spark.createDataFrame(cells2x2).toDF("p", "s", "o")
    val zero = df
      .selectExpr("p", "s", "o",
        "sum(o) OVER (PARTITION BY p) AS r",
        "sum(o) OVER (PARTITION BY s) AS c",
        "sum(o) OVER () AS n")
      .selectExpr("n * o - r * c AS d")
      .collect().map(_.getLong(0))
    assert(zero.length == 4 && zero.forall(_ == 0L),
      s"independent table must zero the deviation: ${zero.toSeq}")
  }

  test("KS test: gate row equals a scala ECDF re-derivation; a crafted shift maximizes where it must") {
    val got = graft.operators.Olap.ksLengths(spark, SF).head()
    val docs = Tables.documents(spark, SF)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val a = docs.filter(_._1 == "en").map(_._2).sorted
    val b = docs.filter(_._1 == "zh").map(_._2).sorted
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    val values = (a ++ b).distinct.sorted
    val ds = values.map { v =>
      val f1 = a.count(_ <= v).toLong
      val f2 = b.count(_ <= v).toLong
      (v, math.abs(n2 * f1 - n1 * f2))
    }
    val (atV, dMax) = ds.maxBy { case (v, d) => (d, -v) }
    assert(got.getLong(0) == atV && got.getLong(1) == n1 &&
      got.getLong(2) == n2 && got.getLong(3) == dMax,
      s"got $got want ($atV, $n1, $n2, $dMax)")
    assert(math.abs(got.getDouble(4) -
      math.round(dMax.toDouble / (n1 * n2).toDouble * 1e6) / 1e6) < 1e-12)
    // the statistic's meaning: for samples {1..100} vs {51..150}
    // (a clean +50 shift), sup|F1-F2| sits at the overlap edge with
    // D = 0.5 — the cross-multiplied argmax lands at value 50+? no:
    // at any v in [50, 100]: f1 = v, f2 = v-50 → d = 100·50; maximal
    // and first achieved at v = 50 under the (d DESC, v ASC) order
    val s1 = (1L to 100L).toArray
    val s2 = (51L to 150L).toArray
    val vals = (s1 ++ s2).distinct.sorted
    val best = vals.map { v =>
      (v, math.abs(100L * s1.count(_ <= v) - 100L * s2.count(_ <= v)))
    }.maxBy { case (v, d) => (d, -v) }
    assert(best == ((50L, 5000L)), s"crafted shift: $best")
  }

  test("regression matches the closed form on a hand-checked fixture, and the corpus fit is sane") {
    import spark.implicits._
    // exact line y = 200x + 500 cents, one point perturbed: slope and
    // r² have a pencil-and-paper closed form to 6 decimals
    val pts = Seq((10L, 2500.0), (20L, 4500.0), (30L, 6500.0),
      (40L, 8500.0), (50L, 10400.0)).map { case (x, y) => ("A", x, y) }
    val df = spark.createDataFrame(pts).toDF("l_returnflag", "xq", "yp")
      .select($"l_returnflag", $"xq".cast("double").as("l_quantity"),
        ($"yp" / 100.0).as("l_extendedprice"),
        lit(null).cast("timestamp").as("l_shipdate"))
    val tmp = java.nio.file.Files.createTempDirectory("regr").toString
    df.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    // closed form: cov = 5·1,170,000 − 150·32,400 = 990,000;
    // varX = 5·5,500 − 150² = 5,000 ⇒ slope 198 cents = 1.98;
    // intercept (32,400 − 198·150)/5 = 540 cents = 5.40;
    // varY = 5·249,160,000 − 32,400² = 196,040,000 ⇒
    // r² = 990,000²/(5,000·196,040,000) = 0.99989798 → 0.999898
    val r = graft.operators.Olap.regressionByFlag(spark, tmp).collect()(0)
    assert(r.getAs[Double]("slope") == 1.98, s"slope ${r.getAs[Double]("slope")}")
    assert(r.getAs[Double]("intercept") == 5.4,
      s"intercept ${r.getAs[Double]("intercept")}")
    assert(math.abs(r.getAs[Double]("r2") - 0.999898) < 1e-6,
      s"r2 ${r.getAs[Double]("r2")}")
    // corpus sanity (the synthetic testdata draws price independent
    // of quantity, so only the INVARIANTS hold, not a strong fit):
    // r² ∈ [0,1] by Cauchy–Schwarz, all outputs finite, 3 flags
    val corpus = graft.operators.Olap.regressionByFlag(spark, SF).collect()
    assert(corpus.length == 3, s"expected 3 flags, got ${corpus.length}")
    corpus.foreach { row =>
      val r2 = row.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r² out of [0,1]: $row")
      assert(!row.getAs[Double]("slope").isNaN &&
        !row.getAs[Double]("intercept").isNaN, s"non-finite fit: $row")
    }
  }

  test("per-group mode equals an argmax re-derivation with the lexicographic tie-break") {
    import graft.operators.Olap
    val cells = Tables.orders(spark, SF)
      .select(col("o_orderpriority"), month(col("o_orderdate")).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((p, m), n) => (p, m, n) }
    val expected = cells.groupBy(_._1).view.mapValues { rs =>
      val best = rs.minBy { case (_, m, n) => (-n, m) }
      (best._2, best._3)
    }.toMap
    val got = Olap.modeShipMonth(spark, SF)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("Benford audit: digit census matches a scala re-derivation; shares and targets sum to ~10^6") {
    import graft.operators.Olap
    val cents = Tables.orders(spark, SF)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val expected = cents.groupBy(_.toString.head.asDigit.toLong).view
      .mapValues(_.length.toLong).toMap
    val rows = Olap.benfordOrders(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(r => r._1 -> r._2).toMap == expected)
    // observed covers every order; integer shares truncate, so the
    // ppm sum lands in (10^6 - 9, 10^6]
    assert(rows.map(_._2).sum == cents.length.toLong)
    val ppmSum = rows.map(_._3).sum
    assert(ppmSum > 999991L && ppmSum <= 1000000L, s"ppm sum $ppmSum")
    // the published targets are themselves a distribution
    assert(Olap.benfordPpm.map(_._2).sum == 1000000L)
    rows.foreach { case (_, _, obsPpm, expPpm, devPpm) =>
      assert(devPpm == obsPpm - expPpm) }
  }

  test("correlation matrix equals an exact-BigInt scala re-derivation; r in [-1,1]; matrix is symmetric input-order-free") {
    val data = Tables.lineitem(spark, SF)
      .select(expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)"),
        expr("CAST(round(l_tax * 10000) AS BIGINT)"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val names = Seq("qty", "price", "disc", "tax")
    val n = BigInt(data.length)
    def s(i: Int) = data.map(r => BigInt(r(i))).sum
    def sp(i: Int, j: Int) = data.map(r => BigInt(r(i)) * BigInt(r(j))).sum
    val expected = (for {
      i <- names.indices; j <- (i + 1) until names.length
    } yield {
      // the gate's exact expression shape: one double conversion per
      // exact sum, then (cov / sdx) / sdy
      val r = ((n.toDouble * sp(i, j).toDouble - s(i).toDouble * s(j).toDouble)
          / math.sqrt(n.toDouble * sp(i, i).toDouble
            - s(i).toDouble * s(i).toDouble)) /
        math.sqrt(n.toDouble * sp(j, j).toDouble
          - s(j).toDouble * s(j).toDouble)
      (names(i), names(j)) -> BigDecimal(r)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }).toMap
    val got = graft.operators.Profile.correlationsLineitem(spark, SF)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got == expected, s"got=$got expected=$expected")
    got.values.foreach(r => assert(r >= -1.0 && r <= 1.0, s"r out of range: $r"))
  }

  test("approx sketches (HLL distincts, approx percentiles) hold their 5% bound next to exact values") {
    // the profile_approx gate is rows-only by declaration (an
    // approximation can't hash-match an oracle) — the bound contract
    // lives HERE: every metric row must carry within_bound = true,
    // and the exact side must be genuinely exact (cross-checked)
    import spark.implicits._
    val rows = graft.operators.Profile.profileApprox(spark, SF)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 5, s"expected 5 metrics, got ${rows.toSeq}")
    rows.foreach { case (m, a, e, ppm, ok) =>
      assert(ok && ppm <= 50000L, s"$m broke its bound: approx=$a exact=$e err=$ppm ppm")
    }
    val byName = rows.map(r => r._1 -> r._3).toMap
    val exactIds = Tables.documents(spark, SF).select($"doc_id").distinct().count()
    assert(byName("hll_distinct_doc_id") == exactIds.toDouble,
      "the 'exact' side of the gate must be exact")
  }

  test("banded cume_dist / percent_rank ≡ a sequential rank re-derivation (frequency-frame plan, no corpus window)") {
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
      .select($"doc_id", $"lang", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val n = rows.length.toLong
      rows.toSeq.map { case (id, lang, nc) =>
        val le = rows.count(_._3 <= nc).toLong
        val lt = rows.count(_._3 < nc).toLong
        id -> ((lang, nc, le * 1000000L / n,
          if (n == 1) 0L else lt * 1000000L / (n - 1)))
      }
    }.toMap
    val got = graft.operators.Olap.cumeDistDocs(spark, SF)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected,
      s"first diff: ${(got.toSet -- expected.toSet).take(2)} vs ${(expected.toSet -- got.toSet).take(2)}")
    // plan shape: the only window runs over the (lang, n_chars)
    // frequency frame — the corpus is never sorted whole
    val plan = graft.operators.Olap.cumeDistDocs(spark, SF)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Window"), "expected the frequency-frame window")
  }

  test("HLL sketch merge: per-group estimates AND the union-merged global all hold the 5% bound") {
    import spark.implicits._
    val rows = graft.operators.Profile.hllMergeRollup(spark, SF)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(4)))
    assert(rows.exists(_._1 == "global(merged)"),
      "the merge path itself must be in the output")
    rows.foreach { case (scope, a, e, ok) =>
      assert(ok, s"$scope broke the bound: approx=$a exact=$e") }
    // merged-global exact = Σ per-lang exacts (doc_id partitions by lang)
    val (per, glob) = rows.partition(_._1 != "global(merged)")
    assert(per.map(_._3).sum == glob.head._3)
  }

  test("join-skew diagnostic: quantiles monotone, top key is the argmax, exact vs brute force") {
    import spark.implicits._
    val counts = Tables.lineitem(spark, SF).groupBy($"l_suppkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val r = graft.operators.Profile.joinSkew(spark, SF).head()
    assert(r.getLong(0) == counts.length.toLong)
    val (p50, p90, p99, mx) = (r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))
    assert(r.getLong(1) <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
    assert(mx == counts.map(_._2).max)
    val expTop = counts.filter(_._2 == mx).map(_._1).min
    assert(r.getLong(6) == expTop && r.getLong(7) == mx,
      s"argmax tie-break: got (${r.getLong(6)}, ${r.getLong(7)})")
  }

  test("bootstrap CI: brackets the point mean, lo ≤ hi, resample multiplicities follow the 8×1/8 law") {
    import spark.implicits._
    val r = graft.operators.Olap.bootstrapMeanCI(spark, SF).head()
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(r.getLong(0) == graft.operators.Olap.BootstrapB.toLong)
    assert(lo <= hi, s"inverted CI: [$lo, $hi]")
    assert(lo <= mean && mean <= hi,
      s"CI [$lo, $hi] does not bracket the point mean $mean")
    // CI is a real interval, not collapsed to the point
    assert(lo < hi, s"degenerate CI at n=500: [$lo, $hi]")
    // the derandomized multiplicity really is ~Binomial(8, 1/8):
    // mean weight over (docs × resamples) within 10% of 1.0
    val h = (b: Int) => conv(substring(md5(concat($"doc_id".cast("string"),
      lit(s"#boot$b"))), 1, 7), 16, 10).cast("long")
    val w0 = (0 until 8).map(j =>
      when(shiftright(h(0), 3 * j) % 8 === 0, 1L)
        .otherwise(0L)).reduce(_ + _)
    val stats = Tables.documents(spark, SF)
      .agg(org.apache.spark.sql.functions.avg(w0)).head().getDouble(0)
    assert(stats > 0.9 && stats < 1.1, s"multiplicity law drifted: $stats")
  }

  test("weighted median ≡ brute-force cumulative-mass re-derivation per group") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, SF)
      .select($"l_returnflag",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        expr("CAST(l_quantity AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).view.mapValues { g =>
      val byPrice = g.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val total = byPrice.map(_._2).sum
      var c = 0L
      val med = byPrice.find { case (_, w) => c += w; 2 * c >= total }.get._1
      (total, med)
    }.toMap
    val got = graft.operators.Olap.weightedMedianPrice(spark, SF)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("Mann-Whitney U ≡ a flat scala midrank re-derivation; planted shift drives the z sign") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def rederive(xs: Seq[Long], ys: Seq[Long]): (Long, Long, Long, Long) = {
      val all = (xs.map((_, 1)) ++ ys.map((_, 2))).sortBy(_._1)
      val n1 = xs.size.toLong; val n2 = ys.size.toLong
      // doubled midranks: a run of t equal values after `bef` smaller
      // ones all take doubled rank 2*bef + t + 1
      var i = 0; var bef = 0L; var r1x2 = 0L; var tie = 0L
      while (i < all.size) {
        var j = i
        while (j < all.size && all(j)._1 == all(i)._1) j += 1
        val t = (j - i).toLong
        val dr = 2 * bef + t + 1
        r1x2 += dr * all.slice(i, j).count(_._2 == 1)
        tie += t * t * t - t
        bef += t; i = j
      }
      (n1, n2, r1x2 - n1 * (n1 + 1), tie)
    }
    val docs = Tables.documents(spark, SF)
      .filter($"lang".isin("en", "de"))
      .select($"lang", $"n_chars".cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (n1, n2, u1x2, tie) = rederive(
      docs.filter(_._1 == "en").map(_._2).toSeq,
      docs.filter(_._1 == "de").map(_._2).toSeq)
    val got = graft.operators.Olap.mannWhitneyLengths(spark, SF).head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == ((n1, n2, u1x2, tie)))
    // planted location shift on a synthetic frame: sample A uniformly
    // larger than B → U₁ maximal (2U₁ = 2n₁n₂) and z strictly positive
    val a = (1 to 40).map(i => 1000L + i); val b = (1 to 40).map(_.toLong)
    val (sn1, sn2, su1x2, stie) = rederive(a, b)
    assert(su1x2 == 2 * sn1 * sn2 && stie == 0L)
  }

  test("Tukey fences: quartiles and outlier counts re-derive from a sorted driver fold per brand") {
    import spark.implicits._
    val got = graft.operators.Olap.tukeyOutliersByBrand(spark, SF)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val rows = Tables.part(spark, SF)
      .select($"p_brand",
        org.apache.spark.sql.functions.expr(
          "CAST(round(p_retailprice * 100) AS BIGINT)"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val want = rows.groupBy(_._1).map { case (b, vs) =>
      val s = vs.map(_._2).sorted
      val n = s.length
      def q(num: Int, den: Int) = s(((num * n + den - 1) / den) - 1)
      val (q1, q3) = (q(1, 4), q(3, 4))
      val low = s.count(x => 2 * x < 5 * q1 - 3 * q3)
      val high = s.count(x => 2 * x > 5 * q3 - 3 * q1)
      b -> ((n.toLong, q1, q3, low.toLong, high.toLong))
    }
    assert(got == want, s"first diff: ${
      want.find { case (b, w) => got.get(b) != Some(w) }}")
    // rank sanity: quartiles ordered, counts within the group size
    got.values.foreach { case (n, q1, q3, lo, hi) =>
      assert(q1 <= q3 && lo + hi <= n)
    }
  }

  test("Theil: extremes, quantized re-derivation, and the within/between decomposition identity") {
    import org.apache.spark.sql.Row
    // replay of the gate's arithmetic: milli-quantized x·ln x sums
    def theil(xs: Seq[Long]): Double = {
      val n = xs.size.toLong; val s = xs.sum
      val xlx = xs.map(x => if (x > 0)
        math.round(x.toDouble * math.log(x.toDouble) * 1000.0) else 0L).sum
      math.floor((xlx.toDouble / (s.toDouble * 1000.0)
        - math.log(s.toDouble / n.toDouble)) * 1e6 + 0.5) / 1e6
    }
    // all-equal → 0 (within milli-quantization at realistic cents)
    assert(math.abs(theil(Seq.fill(20)(70000L))) <= 1e-6)
    // one owner of everything → ln N (the Theil maximum)
    assert(math.abs(theil(Seq.fill(9)(0L) :+ 900000L) - math.log(10.0)) < 1e-4)
    // concentration strictly increases it
    assert(theil(Seq(10000L, 90000L)) > theil(Seq(40000L, 60000L)))
    // gate output: the pooled row must equal the exact decomposition
    // T_all = Σ s_g·T_g + Σ s_g·ln(s_g/p_g) — Theil's whole point
    val rows = graft.operators.Olap.theilRevenueByNation(spark, SF)
      .collect().map { case Row(nat: String, n: Long, t: Long, th: Double) =>
        nat -> ((n, t, th)) }.toMap
    val (nAll, tAll, thAll) = rows("ALL")
    val groups = (rows - "ALL").values
    assert(groups.map(_._1).sum == nAll && groups.map(_._2).sum == tAll)
    val within = groups.map { case (_, tg, thg) =>
      tg.toDouble / tAll.toDouble * thg }.sum
    val between = groups.map { case (ng, tg, _) =>
      val sg = tg.toDouble / tAll.toDouble
      val pg = ng.toDouble / nAll.toDouble
      if (tg > 0) sg * math.log(sg / pg) else 0.0 }.sum
    assert(math.abs(thAll - (within + between)) < 1e-5,
      s"decomposition broke: all=$thAll within=$within between=$between")
  }

  test("Gini ≡ a sorted-scan re-derivation per nation; extremes hit 0 and (n-1)/n") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def gini(xs: Seq[Long]): Double = {
      val s = xs.sorted; val n = s.size.toLong; val t = s.sum
      val aa = s.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      math.floor((2 * aa - (n + 1) * t).toDouble /
        (n.toDouble * t.toDouble) * 1e6 + 0.5) / 1e6
    }
    // formula extremes first: all-equal → 0; one owner → (n−1)/n
    assert(gini(Seq.fill(10)(7L)) == 0.0)
    assert(gini(Seq.fill(9)(0L) :+ 100L) == 0.9)
    val perCust = Tables.orders(spark, SF)
      .groupBy($"o_custkey".as("ck"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spent"))
    val cust = Tables.customer(spark, SF)
      .select($"c_custkey".as("ck"), $"c_nationkey".as("nk"))
      .join(perCust, Seq("ck"), "left")
      .select($"nk", coalesce($"spent", lit(0L)).as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val want = cust.groupBy(_._1).view
      .mapValues(g => gini(g.map(_._2).toSeq)).toMap
    val nations = Tables.nation(spark, SF)
      .select($"n_nationkey", $"n_name").collect()
      .map(r => r.getString(1) -> r.getInt(0)).toMap
    val got = graft.operators.Olap.giniRevenueByNation(spark, SF)
      .collect().map(r => nations(r.getString(0)) -> r.getDouble(3)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (nk, g) =>
      assert(math.abs(g - want(nk)) < 2e-6, s"nation $nk: $g vs ${want(nk)}") }
  }

  test("ABC classes ≡ a sorted-scan re-derivation; classes partition the parts; shares sum to ~1") {
    import spark.implicits._
    val rev = Tables.lineitem(spark, SF)
      .select($"l_partkey".as("pk"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) " +
          "* (10000 - CAST(round(l_discount * 10000) AS BIGINT))").as("r"))
      .groupBy($"pk").agg(sum($"r").as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tot = rev.map(_._2).sum
    var cum = 0L
    val want = rev.sortBy { case (pk, rv) => (-rv, pk) }.map { case (_, rv) =>
      cum += rv
      if (5 * cum <= 4 * tot) ("A", rv)
      else if (20 * cum <= 19 * tot) ("B", rv) else ("C", rv)
    }.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val got = graft.operators.Olap.abcParts(spark, SF)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (c, (n, rv)) =>
      assert((got(c)._1, got(c)._2) == ((n, rv)), s"class $c") }
    assert(got.values.map(_._1).sum == rev.length.toLong)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-4)
    // Pareto shape: mean revenue per part strictly descends A > B > C
    val mean = got.view.mapValues(v => v._2.toDouble / v._1).toMap
    assert(mean("A") > mean("B") && mean("B") > mean("C"), s"$mean")
  }

  test("price-volume bridge reconciles to delta-R per brand within rounding") {
    val rows = graft.operators.Olap.priceVolumeBridge(spark, SF)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, r0, r1, q0, q1, v, p) =>
      // additivity: V + P = deltaR exactly up to the two roundings
      assert(math.abs((v + p) - (r1 - r0).toDouble) <= 0.011,
        s"brand $b: $v + $p != ${r1 - r0}")
      // the volume term really is the Laspeyres expression
      val want = math.floor((q1 - q0).toDouble * (r0.toDouble / q0)
        * 100 + 0.5) / 100
      assert(math.abs(v - want) < 0.011, s"brand $b volume: $v vs $want")
      assert(q0 > 0 && q1 > 0)
    }
  }

  test("kmv overlap: exact mode equals true intersections; sketch mode lands within the k-bound error") {
    import spark.implicits._
    import graft.operators.Profile
    // crafted: A = 1..100, B = 51..150, C = 200..210 (disjoint from A)
    val rows = (1L to 100L).map(("A", _)) ++ (51L to 150L).map(("B", _)) ++
      (200L to 210L).map(("C", _))
    val df = rows.toDF("event_type", "user_id")
    // exact mode: k >= every distinct count -> theta = 2^60 and the
    // estimate IS the true intersection
    val exact = Profile.kmvOverlapOf(df, k = 512).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(5), r.getLong(6)))).toMap
    assert(exact(("A", "B")) == ((50L, 50L)), s"${exact(("A", "B"))}")
    assert(exact(("A", "C")) == ((0L, 0L)))
    assert(exact(("B", "C")) == ((0L, 0L)))
    // sketch mode on the real corpus: estimates within the KMV error
    // envelope of the true distinct intersections (k=256 -> rse ~1/16;
    // assert a generous 5x that = ~31%)
    val got = Profile.kmvOverlap(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    val ev = Tables.events(spark, SF)
      .select($"event_type", $"user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { case ((a, b), est) =>
      val truth = (byType(a) & byType(b)).size.toLong
      assert(math.abs(est - truth) <= math.max(5L, (truth * 0.31).toLong),
        s"($a,$b): est=$est truth=$truth")
    }
  }

  test("skyline: returned points are exactly the undominated set of the (size, best-price) domain") {
    import spark.implicits._
    import graft.operators.Olap
    val got = Olap.skylineParts(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force dominance over the independently aggregated domain
    val best = Tables.part(spark, SF)
      .select($"p_size".cast("long"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap.toSeq
    val exp = best.filter { case (sz, pr) =>
      !best.exists { case (sz2, pr2) =>
        sz2 >= sz && pr2 <= pr && (sz2 > sz || pr2 < pr)
      }
    }.toSet
    assert(got == exp, s"$got vs $exp")
    // skyline is a strict staircase: sizes ascending => prices ascending
    val stair = got.toSeq.sorted
    assert(stair.map(_._2) == stair.map(_._2).sorted,
      "bigger skyline size must cost strictly more")
  }

  test("cramers v: perfect association gives V=1 with zero cells counted; dof and margins pinned") {
    import spark.implicits._
    import graft.operators.Olap
    // P1 always S1, P2 always S2 — the 2x2 has two ZERO cells whose
    // (0-E)^2/E terms are what push chi2 to n (V would be sqrt(0.5)
    // if they were dropped)
    val orders = (Seq.fill(10)(("P1", "S1")) ++ Seq.fill(10)(("P2", "S2")))
      .zipWithIndex.map { case ((p, st), i) => (i.toLong, p, st, 100.0, 1L) }
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus",
        "o_totalprice", "o_custkey")
    val tmp = java.nio.file.Files.createTempDirectory("cram").toString
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Olap.cramersVOrders(spark, tmp).collect().head
    assert(r.getAs[Long]("n_tot") == 20L && r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 20.0)
    assert(r.getAs[Double]("cramers_v") == 1.0)
    assert(math.abs(r.getAs[Double]("contingency_c")
      - math.sqrt(0.5)) < 1e-6)
  }

  test("jackknife ratio: equal-ratio groups give zero variance; hand-computed two-group SE matches") {
    import spark.implicits._
    import graft.operators.Olap
    def write(orders: Seq[(Long, Long, Double)], nations: Seq[(Long, Long)],
        dir: String): String = {
      val tmp = java.nio.file.Files.createTempDirectory(dir).toString
      orders.map { case (k, ck, v) => (k, ck, v, "P", "S") }
        .toDF("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderpriority", "o_orderstatus")
        .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
      nations.toDF("c_custkey", "c_nationkey")
        .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
      tmp
    }
    // two nations, every order 100.00 -> all replicates equal theta
    val t1 = write(Seq((1L, 1L, 100.0), (2L, 2L, 100.0),
      (3L, 3L, 100.0), (4L, 4L, 100.0)),
      Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L)), "jk1")
    val r1 = Olap.jackknifeOrderValue(spark, t1).collect().head
    assert(r1.getAs[Long]("theta_cents") == 10000L)
    assert(r1.getAs[Long]("var_num") == 0L)
    assert(r1.getAs[Double]("jk_se_cents") == 0.0)
    // nation 1: one 100.00 order; nation 2: one 300.00 order
    // r_1 = 30000, r_2 = 10000, var_num = 1*(2*(9e8+1e8) - 4e8^0.5...)
    val t2 = write(Seq((1L, 1L, 100.0), (2L, 2L, 300.0)),
      Seq((1L, 1L), (2L, 2L)), "jk2")
    val r2 = Olap.jackknifeOrderValue(spark, t2).collect().head
    assert(r2.getAs[Long]("theta_cents") == 20000L)
    assert(r2.getAs[Long]("var_num") ==
      1L * (2L * (900000000L + 100000000L) - 40000L * 40000L))
    assert(r2.getAs[Double]("jk_se_cents") == 10000.0)
  }

  test("kendall tau-b: concordant +1, discordant -1, all-tied denominator guarded to 0; budget refusal names the sampling valve") {
    import spark.implicits._
    import graft.operators.Olap
    val parts = Seq(
      (1L, "B1", 1.0, 1), (2L, "B1", 2.0, 2), (3L, "B1", 3.0, 3),
      (4L, "B2", 3.0, 1), (5L, "B2", 2.0, 2), (6L, "B2", 1.0, 3),
      (7L, "B3", 1.0, 1), (8L, "B3", 1.0, 2))
      .toDF("p_partkey", "p_brand", "p_retailprice", "p_size")
    val tmp = java.nio.file.Files.createTempDirectory("tau").toString
    parts.write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val m = Olap.kendallTauBrand(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("B1").getAs[Double]("tau_b") == 1.0)
    assert(m("B1").getAs[Long]("nc") == 3L)
    assert(m("B2").getAs[Double]("tau_b") == -1.0)
    assert(m("B3").getAs[Long]("tx") == 1L)
    assert(m("B3").getAs[Double]("tau_b") == 0.0)
    val err = intercept[IllegalArgumentException] {
      Olap.kendallTauBrand(spark, tmp, pairBudget = 1L).collect()
    }
    assert(err.getMessage.contains("hashSample"))
  }

  test("hhi: monopoly nation hits 10^12, equal shares hit n·(10^6/n)^2, pooled row folds both") {
    import spark.implicits._
    import graft.operators.Olap
    val tmp = java.nio.file.Files.createTempDirectory("hhi").toString
    Seq((1L, 0), (2L, 1), (3L, 1), (4L, 1), (5L, 1))
      .toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$tmp/supplier.parquet")
    Seq((0, "ALPHA"), (1, "BETA")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    Seq((1L, 100.0, 0.0), (2L, 50.0, 0.0), (3L, 50.0, 0.0),
      (4L, 50.0, 0.0), (5L, 50.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val m = Olap.hhiSupplierByNation(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    // monopoly: one ppm-quantized share of 10^6, squared
    assert(m("ALPHA").getAs[Long]("hhi") == 1000000000000L)
    // four exact quarter shares: 4 · 250000²
    assert(m("BETA").getAs[Long]("hhi") == 250000000000L)
    assert(m("BETA").getAs[Long]("n_suppliers") == 4L)
    // pooled: floor shares 333333 + 4·166666 over the 30000-cent total
    assert(m("ALL").getAs[Long]("n_suppliers") == 5L)
    assert(m("ALL").getAs[Long]("total_cents") == 30000L)
    assert(m("ALL").getAs[Long]("hhi") ==
      333333L * 333333L + 4L * 166666L * 166666L)
  }

  test("hill tail: crafted power-law histogram folds by hand including the boundary-bucket split; all-equal tail pins alpha to 0") {
    import spark.implicits._
    import graft.operators.Olap
    val tmp = java.nio.file.Files.createTempDirectory("hill").toString
    // 20 positive customers: one at $160, two at $80, rest at $20 -> k=2,
    // top-2 = {16000, 8000} cents, x_(3) = 8000
    val orders = (Seq((1L, 160.0), (2L, 80.0), (3L, 80.0)) ++
      (4L to 20L).map(i => (i, 20.0)))
      .toDF("o_custkey", "o_totalprice")
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Olap.hillTailRevenue(spark, tmp).collect().head
    def lnq(c: Long) = math.round(math.log(c.toDouble) * 1e6)
    val top = lnq(16000L) + lnq(8000L)
    val h = top / 2L - lnq(8000L)
    assert(r.getAs[Long]("n_pos") == 20L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("top_ln_sum") == top)
    assert(r.getAs[Long]("h_micro") == h)
    assert(r.getAs[Long]("alpha_micro") == 1000000000000L / h)
    // all-equal: H = 0 -> alpha pinned 0
    val tmp2 = java.nio.file.Files.createTempDirectory("hill2").toString
    (1L to 20L).map(i => (i, 50.0)).toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp2/orders.parquet")
    val f = Olap.hillTailRevenue(spark, tmp2).collect().head
    assert(f.getAs[Long]("h_micro") == 0L)
    assert(f.getAs[Long]("alpha_micro") == 0L)
    // n_pos < 10: k pins to 1 (not 0 — no NULL-bearing division row);
    // H = ln x_(1) - ln x_(2) by hand
    val tmp3 = java.nio.file.Files.createTempDirectory("hill3").toString
    Seq((1L, 160.0), (2L, 80.0), (3L, 20.0), (4L, 20.0))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp3/orders.parquet")
    val s = Olap.hillTailRevenue(spark, tmp3).collect().head
    assert(s.getAs[Long]("n_pos") == 4L && s.getAs[Long]("k") == 1L)
    assert(s.getAs[Long]("h_micro") == lnq(16000L) - lnq(8000L))
    // single positive customer: no x_(k+1) exists, the estimator is
    // undefined and both engines emit zero rows
    val tmp4 = java.nio.file.Files.createTempDirectory("hill4").toString
    Seq((1L, 160.0)).toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp4/orders.parquet")
    assert(Olap.hillTailRevenue(spark, tmp4).collect().isEmpty)
  }

  test("lorenz: crafted 4-customer nation folds by hand; curve is monotone, under the diagonal, terminal share exactly 1e6") {
    import spark.implicits._
    import graft.operators.Olap
    val tmp = java.nio.file.Files.createTempDirectory("lorenz").toString
    // revenues 0 / 10 / 20 / 70 dollars: histogram rows at 0,1000,
    // 2000,7000 cents, total 10000
    Seq((1L, 0), (2L, 0), (3L, 0), (4L, 0))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((0, "ALPHA")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    Seq((2L, 10.0), (3L, 20.0), (4L, 70.0))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = Olap.lorenzRevenueByNation(spark, tmp).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(5)))).toMap
    // targets (i·4 div 10): deciles 1-2 -> 0, 3-4 -> 1, 5-7 -> 2,
    // 8-9 -> 3, 10 -> 4; crossing depths/shares fold by hand
    assert(got(1L) == ((1L, 0L)) && got(4L) == ((1L, 0L)))
    assert(got(5L) == ((2L, 100000L)) && got(7L) == ((2L, 100000L)))
    assert(got(8L) == ((3L, 300000L)) && got(9L) == ((3L, 300000L)))
    assert(got(10L) == ((4L, 1000000L)))
    // monotone and never above the equality diagonal (share ≤ i/10)
    (1L to 9L).foreach { i =>
      assert(got(i)._2 <= got(i + 1)._2)
      assert(got(i)._2 <= i * 100000L)
    }
  }

  test("cochran-armitage: perfect monotone gradient folds to chi2 = 4.0 by hand; flat rates give exactly 0") {
    import spark.implicits._
    import graft.operators.Olap
    val tmp = java.nio.file.Files.createTempDirectory("ca").toString
    // doses 1..3, two orders each; high-value rate 0/2, 1/2, 2/2:
    // N=6 R=3 skn=12 sk2n=28 skr=8 -> num=12, den=9*24=216,
    // chi2 = 6*144/216 = 4.0
    val hi = 150000.0; val lo = 50000.0
    Seq(("1-URGENT", lo), ("1-URGENT", lo),
      ("2-HIGH", hi), ("2-HIGH", lo),
      ("3-MEDIUM", hi), ("3-MEDIUM", hi))
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Olap.cochranArmitageOrders(spark, tmp).collect().head
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("r") == 3L)
    assert(r.getAs[Long]("skn") == 12L && r.getAs[Long]("sk2n") == 28L)
    assert(r.getAs[Long]("skr") == 8L)
    assert(r.getAs[Long]("num") == 12L && r.getAs[Long]("den") == 216L)
    assert(r.getAs[Double]("chi2_trend") == 4.0)
    // flat: one high-value per dose -> num = 0 -> chi2 exactly 0
    val tmp2 = java.nio.file.Files.createTempDirectory("ca2").toString
    Seq(("1-URGENT", hi), ("1-URGENT", lo),
      ("2-HIGH", hi), ("2-HIGH", lo),
      ("3-MEDIUM", hi), ("3-MEDIUM", lo))
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp2/orders.parquet")
    val f = Olap.cochranArmitageOrders(spark, tmp2).collect().head
    assert(f.getAs[Long]("num") == 0L)
    assert(f.getAs[Double]("chi2_trend") == 0.0)
  }

  test("mutual info: exact independence gives 0 everywhere; deterministic pairing gives ln2 micro-nats") {
    import spark.implicits._
    import graft.operators.Olap
    val tmp = java.nio.file.Files.createTempDirectory("mi").toString
    // perfect product table: every (rf, ls) cell = 2, margins 4/4
    (for { rf <- Seq("A", "B"); ls <- Seq("X", "Y"); _ <- 1 to 2 }
      yield (rf, ls))
      .toDF("l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val indep = Olap.mutualInfoLineitem(spark, tmp).collect()
    assert(indep.length == 4)
    assert(indep.forall(_.getAs[Long]("pmi_micro") == 0L))
    assert(indep.forall(_.getAs[Long]("mi_micro") == 0L))
    // deterministic pairing: knowing rf pins ls, MI = H(rf) = ln 2
    val tmp2 = java.nio.file.Files.createTempDirectory("mi2").toString
    Seq(("A", "X"), ("A", "X"), ("B", "Y"), ("B", "Y"))
      .toDF("l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$tmp2/lineitem.parquet")
    val paired = Olap.mutualInfoLineitem(spark, tmp2).collect()
    assert(paired.length == 2)
    assert(paired.forall(_.getAs[Long]("pmi_micro") == 693147L))
    assert(paired.forall(_.getAs[Long]("mi_micro") == 693147L))
  }
}
