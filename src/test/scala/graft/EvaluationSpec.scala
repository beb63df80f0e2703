package graft

import graft.operators.{Evaluation, Olap, Events, QualityModel}
import org.apache.spark.sql.functions._

/** Scala re-derivations for the round-11 statistics wave: Spearman,
  * higher moments, peak census, and ROC AUC — each gate's number is
  * recomputed with a direct in-memory algorithm so the distributed
  * device (histogram windows, integer power sums, doubled midranks)
  * is checked against the textbook definition, not itself.
  */
class EvaluationSpec extends SparkSpec {

  private def midranks(xs: Seq[Long]): Map[Long, Double] = {
    val sorted = xs.sorted.zipWithIndex.map { case (v, i) => (v, i + 1.0) }
    sorted.groupBy(_._1).map { case (v, ps) =>
      v -> ps.map(_._2).sum / ps.length
    }
  }

  test("spearman matches a direct midrank computation per brand") {
    import spark.implicits._
    val gate = operators.Olap.spearmanBrand(spark, SF).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val rows = Tables.part(spark, SF)
      .select($"p_brand", expr("CAST(round(p_retailprice*100) AS BIGINT)"),
        $"p_size".cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (brand, rs) =>
      val rx = midranks(rs.map(_._2).toSeq)
      val ry = midranks(rs.map(_._3).toSeq)
      val x = rs.map(r => rx(r._2)); val y = rs.map(r => ry(r._3))
      val n = rs.length.toDouble
      val mx = x.sum / n; val my = y.sum / n
      val num = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val den = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum *
        y.map(b => (b - my) * (b - my)).sum)
      val rho = num / den
      val (gn, grho) = gate(brand)
      assert(gn == rs.length)
      assert(math.abs(grho - rho) < 1e-4, s"$brand: gate $grho direct $rho")
    }
  }

  test("spearman is exactly 1 on a planted monotone pair") {
    import spark.implicits._
    val df = Seq(("B", 10L, 1L), ("B", 20L, 2L), ("B", 30L, 3L),
      ("B", 40L, 4L)).toDF("p_brand", "price_c", "size_l")
    // re-derive through the same rank algebra the operator uses
    val rx = midranks(Seq(10L, 20L, 30L, 40L))
    assert(rx.values.toSeq.sorted == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("moments match a direct fold and flag planted asymmetry") {
    import spark.implicits._
    val gate = operators.Olap.momentsQuantity(spark, SF).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(6), r.getDouble(7)))
      .toMap
    val qs = Tables.lineitem(spark, SF)
      .select($"l_returnflag", expr("CAST(l_quantity AS BIGINT)")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    qs.groupBy(_._1).foreach { case (flag, rs) =>
      val x = rs.map(_._2.toDouble); val n = x.length.toDouble
      val mean = x.sum / n
      val m2 = x.map(v => (v - mean) * (v - mean)).sum / n
      val m3 = x.map(v => math.pow(v - mean, 3)).sum / n
      val m4 = x.map(v => math.pow(v - mean, 4)).sum / n
      val (gn, gSkew, gKurt) = gate(flag)
      assert(gn == rs.length)
      assert(math.abs(gSkew - m3 / (m2 * math.sqrt(m2))) < 1e-3,
        s"$flag skew")
      assert(math.abs(gKurt - (m4 / (m2 * m2) - 3.0)) < 1e-3, s"$flag kurt")
    }
    // uniform 1..50 quantity: skew ~ 0, kurtosis_ex ~ -1.2
    gate.values.foreach { case (_, sk, ku) =>
      assert(math.abs(sk) < 0.2, s"uniform-ish skew, got $sk")
      assert(ku < 0, s"platykurtic uniform, got $ku")
    }
  }

  test("peak hours are strict local maxima above the mean (scala scan)") {
    import spark.implicits._
    val gate = operators.Events.peakHours(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val filled = operators.Events.gapfillHourly(spark, SF)
      .orderBy($"h").collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = filled.map(_._2).sum
    val hrs = filled.length.toLong
    val direct = filled.sliding(3).collect {
      case Array((_, p), (h, n), (_, nx))
        if n > p && n > nx && n * hrs > total => (h, n)
    }.toMap
    assert(gate == direct, s"gate ${gate.size} peaks, direct ${direct.size}")
    assert(direct.nonEmpty, "spine should contain at least one peak")
  }

  test("auc matches direct pairwise comparison and hits 1.0 on a perfect separator") {
    import spark.implicits._
    val r = Evaluation.aucQualityVsEnglish(spark, SF).collect()(0)
    val (nPos, nNeg, u2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nPos > 0 && nNeg > 0)
    // direct pairwise on the full sf0.001 corpus
    val docs = Tables.documents(spark, SF)
    val scored = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score", when($"lang" === "en", 1L).otherwise(0L)).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == 0L).map(_._1)
    var wins2 = 0L
    for (p <- pos; q <- neg) {
      if (p > q) wins2 += 2 else if (p == q) wins2 += 1
    }
    assert(u2 == wins2, s"gate u2=$u2 pairwise=$wins2")
    assert(r.getDouble(3) ==
      math.rint(wins2.toDouble / (2.0 * pos.length * neg.length) * 1e6) / 1e6
      || math.abs(r.getDouble(3) -
        wins2.toDouble / (2.0 * pos.length * neg.length)) < 1e-6)
    // perfect separator sanity: all positives scored above all negatives
    val hist = Seq((1L, 1L, 0L), (2L, 0L, 1L)) // (score, pos, neg) reversed
    val perfect = {
      val ps = Seq(5L, 6L); val ns = Seq(1L, 2L)
      var w = 0L; for (a <- ps; b <- ns) if (a > b) w += 2
      w.toDouble / (2.0 * ps.length * ns.length)
    }
    assert(perfect == 1.0)
  }

  test("kruskal-wallis: doubled rank sums match a direct midrank fold; H agrees with the textbook statistic") {
    import spark.implicits._
    val gate = Olap.kruskalWallisLengths(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val rows = Tables.documents(spark, SF)
      .select($"lang", $"n_chars".cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val mr = midranks(rows.map(_._2).toSeq)
    val byLang = rows.groupBy(_._1)
    gate.foreach { case (lang, nG, rsumX2, nTotal, tieTerm) =>
      val xs = byLang(lang).map(_._2)
      assert(nG == xs.length, s"$lang n")
      val direct = xs.map(v => mr(v) * 2).sum
      assert(rsumX2.toDouble == direct, s"$lang 2R: $rsumX2 vs $direct")
      assert(nTotal == rows.length)
      val ties = rows.map(_._2).groupBy(identity).values
        .map(g => g.length.toLong).map(t => t * t * t - t).sum
      assert(tieTerm == ties)
    }
    // H from the gate's exact integers vs H from raw midranks
    val n = rows.length.toDouble
    val hGate = {
      val s = gate.map { case (_, nG, r2, _, _) =>
        (r2 / 2.0) * (r2 / 2.0) / nG }.sum
      val h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
      h / (1.0 - gate.head._5 / (n * n * n - n))
    }
    val hDirect = {
      val s = byLang.values.map { g =>
        val r = g.map(x => mr(x._2)).sum; r * r / g.length }.sum
      val h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
      val ties = rows.map(_._2).groupBy(identity).values
        .map(g => g.length.toLong).map(t => t * t * t - t).sum
      h / (1.0 - ties / (n * n * n - n))
    }
    assert(math.abs(hGate - hDirect) < 1e-9, s"$hGate vs $hDirect")
    assert(hGate >= 0.0)
  }

  test("calibration bins: masses re-add, bin means bracket the bin edges, fractions recompute") {
    import spark.implicits._
    val bins = Evaluation.calibrationBins(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val scored = QualityModel.score(Tables.documents(spark, SF))
      .join(Tables.documents(spark, SF).select($"doc_id", $"lang"), "doc_id")
      .select($"score".cast("long"),
        when($"lang" === "en", 1L).otherwise(0L)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bins.map(_._2).sum == scored.length, "total mass")
    assert(bins.map(_._4).sum == scored.count(_._2 == 1L), "total positives")
    val lo = scored.map(_._1).min; val hi = scored.map(_._1).max
    val direct = scored.groupBy { case (s, _) =>
      (s - lo) * 10 / (hi - lo + 1) }
    bins.foreach { case (b, nB, sSum, nPos) =>
      val g = direct(b)
      assert(nB == g.length && sSum == g.map(_._1).sum &&
        nPos == g.count(_._2 == 1L), s"bin $b")
    }
    // every score lands in [0, 9]
    assert(bins.map(_._1).forall(b => b >= 0L && b <= 9L))
  }

  test("PSI bins: identical populations report zero drift; a planted shift lights up; masses re-add") {
    import spark.implicits._
    import graft.operators.Profile
    def vdf(xs: Seq[Long]) = xs.toDF("v")
    val base = (1L to 1000L) ++ (1L to 1000L) // each value twice
    // identical populations: every bin matches, dev 0, PSI 0
    val same = Profile.psiBinsOf(vdf(base), vdf(base), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(same.length == 10)
    assert(same.forall { case (_, nb, nc, dev) => nb == nc && dev == 0L })
    assert(same.map(_._2).sum == base.length)
    // baseline deciles are exact here (1000 distinct values): 200 each
    assert(same.forall(_._2 == 200L), s"$same")
    def psi(rows: Seq[(Long, Long, Long)]): Double = {
      val nb = rows.map(_._2).sum.toDouble; val nc = rows.map(_._3).sum.toDouble
      rows.map { case (_, b, c) =>
        val p = math.max(b / nb, 1e-6); val q = math.max(c / nc, 1e-6)
        (p - q) * math.log(p / q)
      }.sum
    }
    // planted location shift of half the range
    val shifted = Profile.psiBinsOf(vdf(base), vdf(base.map(_ + 500L)), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val psiShift = psi(shifted.toSeq)
    val psiSame = psi(same.map(t => (t._1, t._2, t._3)).toSeq)
    assert(psiSame == 0.0)
    assert(psiShift > 1.0, s"planted shift PSI $psiShift should be large")
    // the shifted population drains the low deciles and floods the top
    assert(shifted.head._3 == 0L, "lowest bin empties under a +shift")
    assert(shifted.last._3 > shifted.last._2, "top bin overflows")
    // the gate itself: masses re-add to the two populations
    val gate = Profile.psiDocLengths(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, SF)
      .select(expr("CAST(substring(source, 4) AS INT) % 2 = 0")).collect()
      .map(_.getBoolean(0))
    assert(gate.map(_._2).sum == docs.count(identity).toLong)
    assert(gate.map(_._3).sum == docs.count(!_).toLong)
    // baseline deciles stay near N/10 (ties can nudge a bin)
    val nb10 = docs.count(identity).toLong / 10L
    assert(gate.forall { case (_, b, _) => math.abs(b - nb10) <= 3L },
      s"baseline deciles uneven: ${gate.toSeq}")
  }

  test("normal-equation OLS: betas re-solve from a driver-side fold; R2 in [0,1]") {
    import spark.implicits._
    val row = graft.operators.Evaluation.mlLinregNormal(spark, SF).head
    // independent re-solve: exact BigInt moments off the raw rows,
    // then Gaussian elimination in plain doubles
    val rows = Tables.lineitem(spark, SF)
      .select($"l_quantity".cast("long"),
        round($"l_discount" * 10000).cast("long"),
        round($"l_extendedprice" * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length.toDouble
    def s(f: ((Long, Long, Long)) => BigInt): Double =
      rows.map(f).sum.toDouble
    val (s1, s2) = (s(_._1.toLong), s(_._2.toLong))
    val (s11, s12, s22) = (s(r => BigInt(r._1) * r._1),
      s(r => BigInt(r._1) * r._2), s(r => BigInt(r._2) * r._2))
    val (s1y, s2y, sy) = (s(r => BigInt(r._1) * r._3),
      s(r => BigInt(r._2) * r._3), s(_._3.toLong))
    val a = Array(
      Array(n, s1, s2, sy), Array(s1, s11, s12, s1y),
      Array(s2, s12, s22, s2y))
    for (p <- 0 until 3; r <- 0 until 3 if r != p) {
      val f = a(r)(p) / a(p)(p)
      for (c <- 0 to 3) a(r)(c) -= f * a(p)(c)
    }
    val b = (0 until 3).map(i => a(i)(3) / a(i)(i) / 100.0)
    assert(math.abs(row.getAs[Double]("beta0") - b(0)) < 1e-4, s"$row vs $b")
    assert(math.abs(row.getAs[Double]("beta1") - b(1)) < 1e-4)
    assert(math.abs(row.getAs[Double]("beta2") - b(2)) < 1e-4)
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2=$r2")
    // planted exact-linear data: y_cents = 30000 + 200*x1 + 500*x2
    // recovers (300, 2, 5) in display dollars with r2 = 1 exactly
    val planted = (1 to 200).map { i =>
      val (x1, x2) = (i.toLong % 37L, (i * 7).toLong % 53L)
      (x1, x2, 30000L + 200L * x1 + 500L * x2)
    }
    val got = graft.operators.Evaluation.mlLinregNormalOf(
      planted.toDF("x1", "x2", "y")).head
    assert(got.getAs[Double]("beta0") == 300.0, got.toString)
    assert(got.getAs[Double]("beta1") == 2.0)
    assert(got.getAs[Double]("beta2") == 5.0)
    assert(got.getAs[Double]("r2") == 1.0)
  }

  test("cuped: re-derives from a driver fold; pooled adjusted variance never exceeds raw") {
    import spark.implicits._
    import graft.operators.{Analytics, Sampling}
    val row = Analytics.abCuped(spark, SF).head
    // driver re-derivation from raw purchases
    val p = Tables.events(spark, SF).filter($"event_type" === "purchase")
      .select($"user_id", expr("unix_micros(ts)"),
        expr("CAST(round(value * 1000000) AS BIGINT)"),
        Sampling.bucket($"user_id", "ab") % 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cut = (p.map(_._2).min + p.map(_._2).max) / 2
    val users = p.groupBy(_._1).map { case (u, rs) =>
      (u, rs.filter(_._2 < cut).map(_._3).sum,
        rs.filter(_._2 >= cut).map(_._3).sum, rs.head._4 == 0L)
    }.toSeq
    val n = users.length.toDouble
    val (sx, sy) = (users.map(_._2).sum.toDouble, users.map(_._3).sum.toDouble)
    val sxx = users.map(u => BigInt(u._2) * u._2).sum.toDouble
    val sxy = users.map(u => BigInt(u._2) * u._3).sum.toDouble
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getAs[Double]("theta") == math.rint(theta * 1e6) / 1e6)
    val adj = users.map(u =>
      (u._4, u._3, math.round(u._3.toDouble - theta * (u._2.toDouble - sx / n))))
    def tOf(vals: Seq[(Boolean, Long)]): Double = {
      val g1 = vals.filter(_._1).map(_._2); val g2 = vals.filterNot(_._1).map(_._2)
      def m(v: Seq[Long]) = v.sum.toDouble / v.length
      def vr(v: Seq[Long]) = {
        val nn = v.length.toDouble
        (nn * v.map(x => BigInt(x) * x).sum.toDouble -
          v.sum.toDouble * v.sum.toDouble) / (nn * (nn - 1.0))
      }
      (m(g1) - m(g2)) / math.sqrt(vr(g1) / g1.length + vr(g2) / g2.length)
    }
    val tRaw = tOf(adj.map(a => (a._1, a._2)))
    val tCuped = tOf(adj.map(a => (a._1, a._3)))
    assert(math.abs(row.getAs[Double]("t_raw") - tRaw) < 1e-3,
      s"${row.getAs[Double]("t_raw")} vs $tRaw")
    assert(math.abs(row.getAs[Double]("t_cuped") - tCuped) < 1e-3)
    // the pooled adjusted variance cannot exceed the raw variance
    // (theta is the OLS minimizer); allow quantization slack
    assert(row.getAs[Double]("var_ratio") <= 1.000001,
      s"var_ratio ${row.getAs[Double]("var_ratio")}")
    assert(row.getAs[Double]("var_ratio") > 0.0)
  }

  test("embedding drift: pairwise centroid cosines re-derive from a driver fold") {
    import spark.implicits._
    import graft.operators.Pca
    val got = Pca.embeddingDrift(spark, SF).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
        -> r.getDouble(2)).toMap
    assert(got.size == 45)
    val vecs = Tables.embeddings(spark, SF)
      .select($"label".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (l, v) => (l, v.map(x => math.round(x.toDouble * 1000))) }
    val sums = vecs.groupBy(_._1).view.mapValues { vs =>
      val d = vs.head._2.length
      (0 until d).map(i => vs.map(_._2(i)).sum).toArray
    }.toMap
    got.foreach { case ((a, b), cosGot) =>
      val (sa, sb) = (sums(a), sums(b))
      val dot = sa.zip(sb).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val na = sa.map(x => BigInt(x) * x).sum
      val nb = sb.map(x => BigInt(x) * x).sum
      val cos = math.rint(dot.toDouble /
        (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) * 1e6) / 1e6
      assert(cosGot == cos, s"($a,$b): $cosGot vs $cos")
    }
  }

  test("isotonic minimax fit == sequential PAV pooling; monotone; planted violator pools") {
    import spark.implicits._
    import graft.operators.Evaluation
    /** textbook PAV: pool adjacent violating blocks until monotone. */
    def pav(bins: Seq[(Long, Long, Long)]): Seq[Double] = {
      case class Block(n: Long, pos: Long, w: Int)
      var blocks = bins.map { case (_, n, p) => Block(n, p, 1) }.toList
      var changed = true
      while (changed) {
        changed = false
        val out = scala.collection.mutable.ListBuffer.empty[Block]
        blocks.foreach { b =>
          out += b
          while (out.length >= 2 && {
            val Seq(x, y) = out.takeRight(2).toSeq
            // x before y: violation when rate(x) > rate(y), compared
            // by exact cross-multiplication
            x.pos * y.n > y.pos * x.n
          }) {
            val y = out.remove(out.length - 1)
            val x = out.remove(out.length - 1)
            out += Block(x.n + y.n, x.pos + y.pos, x.w + y.w)
            changed = true
          }
        }
        blocks = out.toList
      }
      blocks.flatMap(b =>
        Seq.fill(b.w)(b.pos.toDouble / b.n.toDouble))
    }
    // planted: bins with a violation (0.8 then 0.2) must pool to 0.5
    val planted = Seq((0L, 10L, 1L), (1L, 10L, 8L), (2L, 10L, 2L),
      (3L, 10L, 9L))
    val gotP = Evaluation.isotonicOf(planted.toDF("bin", "n", "n_pos"))
      .orderBy("bin").collect().map(_.getDouble(3))
    val expP = pav(planted).map(x => math.rint(x * 1e6) / 1e6)
    assert(gotP.toSeq == expP, s"${gotP.toSeq} vs $expP")
    assert(gotP(1) == 0.5 && gotP(2) == 0.5, "violating pair must pool")
    // real gate: equals PAV on the same bins and is monotone
    val bins = Evaluation.calibrationBins(spark, SF)
      .select($"bin", $"n", $"n_pos").orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Evaluation.isotonicCalibration(spark, SF)
      .orderBy("bin").collect().map(_.getDouble(3)).toSeq
    val exp = pav(bins).map(x => math.rint(x * 1e6) / 1e6)
    assert(got == exp, s"$got vs $exp")
    assert(got.zip(got.tail).forall { case (a, b) => a <= b }, "not monotone")
  }

  test("pca moments re-derive from a driver fold; eigensolve satisfies trace and rank identities") {
    import spark.implicits._
    import graft.operators.Pca
    val rows = Pca.pcaMoments(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent fold over the same quantized corpus
    val vecs = Tables.embeddings(spark, SF).select($"embedding")
      .as[Array[Float]].collect()
      .map(_.map(x => math.round(x.toDouble * 1000)))
    val d = vecs.head.length
    val n = rows.find(r => r._1 == -1L && r._2 == -1L).get._3
    assert(n == vecs.length.toLong)
    val mp = rows.map(r => (r._1, r._2) -> r._3).toMap
    for (i <- 0 until d) {
      assert(mp((i.toLong, -1L)) == vecs.map(_(i)).sum, s"mean sum $i")
      for (j <- i until d)
        assert(mp((i.toLong, j.toLong)) ==
          vecs.map(v => v(i) * v(j)).sum, s"moment ($i,$j)")
    }
    // eigensolve: trace(C) == sum of eigenvalues; PSD up to numerics
    val ev = Pca.eigenvaluesFromMoments(rows.toSeq)
    assert(ev.length == d)
    val mean = (0 until d).map(i => mp((i.toLong, -1L)).toDouble / n)
    val trace = (0 until d).map(i =>
      mp((i.toLong, i.toLong)).toDouble / n - mean(i) * mean(i)).sum
    assert(math.abs(ev.sum - trace) < 1e-6 * math.abs(trace),
      s"trace ${trace} != eigensum ${ev.sum}")
    assert(ev.forall(_ > -1e-6), s"negative eigenvalue: ${ev.min}")
    // planted rank-1 data: rows (t, 2t) → exactly one nonzero
    // eigenvalue, 5·var(t·1000 quantized)
    val ts = (1 to 100).map(_.toDouble / 100.0)
    val planted = ts.map(t => Array(t.toFloat, (2 * t).toFloat))
      .toDF("embedding")
    val prows = Pca.pcaMomentsOf(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val pev = Pca.eigenvaluesFromMoments(prows)
    val q = ts.map(t => math.round(t * 1000).toDouble)
    val varQ = q.map(x => x * x).sum / q.length -
      math.pow(q.sum / q.length, 2)
    assert(math.abs(pev(0) - 5.0 * varQ) < 1e-6 * pev(0),
      s"top eigenvalue ${pev(0)} != ${5.0 * varQ}")
    assert(math.abs(pev(1)) < 1e-6 * pev(0), s"rank-1 data, ev2=${pev(1)}")
  }

  test("ndcg: perfect bm25 ordering hits 1.0 exactly; a length-penalized reversal pays the replayed discount") {
    import spark.implicits._
    val wl = Seq("q" -> Seq("apple"))
    def run(docs: Seq[(Long, String)]): Double =
      Evaluation.ndcgBm25Of(spark, docs.toDF("doc_id", "text"), wl, k = 10)
        .collect().map(r => r.getDouble(4)).head
    // tf and brevity agree → bm25 order ≡ relevance order → NDCG = 1
    val aligned = Seq((1L, "apple apple apple x"), (2L, "apple apple y z"),
      (3L, "apple y z w v"), (4L, "nothing relevant"))
    assert(run(aligned) == 1.0)
    // rel-3 doc buried in filler: bm25's length normalization ranks
    // the short rel-1 doc first — NDCG = (1·w1 + 7·w2)/(7·w1 + 1·w2)
    val filler = (1 to 50).map(i => s"f$i").mkString(" ")
    val reversed = Seq((1L, s"apple apple apple $filler"), (2L, "apple z"))
    val w1 = 1000000L
    val w2 = math.round(1e6 / (math.log(3.0) / math.log(2.0)))
    val want = math.floor((1 * w1 + 7 * w2).toDouble /
      (7 * w1 + 1 * w2).toDouble * 1e6 + 0.5) / 1e6
    val got = run(reversed)
    assert(got == want && got < 1.0, s"got=$got want=$want")
  }

  test("mrr/p@k/r@k: a short irrelevant doc outranks the buried relevant one — rank 2 reciprocal, integer ratios") {
    import spark.implicits._
    val wl = Seq("q" -> Seq("apple"))
    def run(docs: Seq[(Long, String)]) =
      Evaluation.mrrBm25Of(spark, docs.toDF("doc_id", "text"), wl, k = 10)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).head
    // tf-1 doc is NOT relevant (grade < 2) but its brevity wins bm25
    // rank 1; the relevant tf-2 doc is buried in filler at rank 2
    val filler = (1 to 30).map(i => s"f$i").mkString(" ")
    val buried = Seq((1L, "apple"), (2L, s"apple apple $filler"))
    assert(run(buried) == ((2L, 1L, 1L, 500000L, 100000L, 1000000L)),
      run(buried).toString)
    // recall denominator: 3 relevant docs, only top-ranked hits count
    val three = Seq((1L, "apple apple a"), (2L, "apple apple b"),
      (3L, "apple apple c"), (4L, "apple x"))
    val (fr, hits, nRel, rr, p, r) = run(three)
    assert(fr == 1L && hits == 3L && nRel == 3L && rr == 1000000L)
    assert(p == 300000L && r == 1000000L)
  }

  test("power/mde: SE and MDE re-derive from a driver fold over the same variant split") {
    import graft.operators.Analytics
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def variantA(u: Long): Boolean = {
      val hex = md.digest((u.toString + "ab").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16) % 1000 % 2 == 0
    }
    val xs = Tables.events(spark, SF)
      .filter($"event_type" === "purchase")
      .select($"user_id", expr("CAST(round(value * 1000000) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (a, b) = xs.partition { case (u, _) => variantA(u) }
    def mo(v: Array[(Long, Long)]) = {
      val n = v.length.toDouble
      val s = v.map(_._2).sum.toDouble
      val q = v.map(x => x._2 * x._2).sum.toDouble
      (n, s, (n * q - s * s) / (n * (n - 1.0)))
    }
    val (n1, s1, v1) = mo(a); val (n2, s2, v2) = mo(b)
    val se = math.sqrt(v1 / n1 + v2 / n2)
    val mean = (s1 + s2) / (n1 + n2)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = Analytics.abPowerMde(spark, SF).collect().head
    assert(got.getLong(0) == a.length.toLong && got.getLong(1) == b.length.toLong)
    assert(got.getDouble(2) == r4(mean / 1e6), s"pooled mean ${got.getDouble(2)}")
    assert(got.getDouble(3) == r4((1.959964 + 0.841621) * se / 1e6),
      s"mde_abs ${got.getDouble(3)}")
    assert(got.getDouble(4) == r6((1.959964 + 0.841621) * se / mean))
    // sanity: the MDE is positive and larger than zero lift
    assert(got.getDouble(3) > 0.0 && got.getDouble(4) > 0.0)
  }

  test("pr curve: points re-derive from a driver fold; endpoints pinned") {
    import graft.operators.Evaluation
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
    val scored = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score", ($"lang" === "en").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nPos = scored.map(_._2).sum
    val hist = scored.groupBy(_._1).view
      .mapValues(v => (v.map(_._2).sum, v.size - v.map(_._2).sum)).toMap
    var tp = 0L; var fp = 0L
    val want = hist.keys.toSeq.sorted.reverse.map { s =>
      val (p, q) = hist(s); tp += p; fp += q
      s -> ((tp, fp, tp * 1000000L / (tp + fp), tp * 1000000L / nPos))
    }
    val got = Evaluation.prCurveQualityVsEnglish(spark, SF)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.toSeq == want, s"first diff: ${
      got.zip(want).find(x => x._1 != x._2)}")
    // terminal recall is exactly 1e6; tp never decreases
    assert(got.last._2._4 == 1000000L)
    assert(got.map(_._2._1).sliding(2).forall(w => w.head <= w.last))
  }

  test("kaplan-meier: textbook hand fold with censoring; terminal full-event step reads exactly 0") {
    import graft.operators.Analytics
    import spark.implicits._
    def ts(h: Double) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        + (h * 3600 * 1000).toLong)
    // u1,u2: event at 1h; u5: event at 2.5h (floor → 2); u3: event at
    // 3h; u4: one purchase only → censored at the 3h horizon
    val ev = Seq(
      (1L, ts(0), "purchase"), (1L, ts(1), "purchase"),
      (2L, ts(0), "purchase"), (2L, ts(1), "purchase"),
      (3L, ts(0), "purchase"), (3L, ts(3), "purchase"),
      (4L, ts(0), "purchase"),
      (5L, ts(0), "purchase"), (5L, ts(2.5), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Analytics.survivalRepeatPurchaseOf(ev)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // replay the quantized arithmetic: S = exp(Σ round(ln((n−d)/n)·1e6)/1e6)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val s1 = math.round(math.log(3.0 / 5.0) * 1e6)
    val s2 = math.round(math.log(2.0 / 3.0) * 1e6)
    val s3 = math.round(math.log(1.0 / 2.0) * 1e6)
    assert(got(1L) == ((5L, 2L, 0L, r6(math.exp(s1 / 1e6)))), got(1L).toString)
    assert(got(2L) == ((3L, 1L, 0L, r6(math.exp((s1 + s2) / 1e6)))))
    assert(got(3L) == ((2L, 1L, 1L, r6(math.exp((s1 + s2 + s3) / 1e6)))))
    // the quantized curve sits on the textbook values 0.6 / 0.4 / 0.2
    assert(math.abs(got(1L)._4 - 0.6) < 1e-5 &&
      math.abs(got(2L)._4 - 0.4) < 1e-5 && math.abs(got(3L)._4 - 0.2) < 1e-5)
    // terminal step where everyone at risk events: survival exactly 0
    val all = Seq(
      (1L, ts(0), "purchase"), (1L, ts(2), "purchase"),
      (2L, ts(0), "purchase"), (2L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val term = Analytics.survivalRepeatPurchaseOf(all).collect()
    assert(term.length == 1 && term.head.getDouble(4) == 0.0)
  }

  test("markov attribution: single path credits the cut channel fully; parallel paths split by hand-folded removal effects") {
    import graft.operators.Analytics
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    def run(rows: Seq[(Long, java.sql.Timestamp, String, Long)]) =
      Analytics.markovAttributionOf(
        rows.toDF("user_id", "ts", "event_type", "event_id"),
        channels = Seq("a", "b"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // one path START→a→CONV: removing a kills every conversion;
    // b never appears, so its removal is a no-op
    val single = run(Seq(
      (1L, ts(0), "a", 1L), (1L, ts(10), "purchase", 2L)))
    assert(single("a") == ((1000000L, 0L, 1000000L, 1000000L)), single.toString)
    assert(single("b") == ((1000000L, 1000000L, 0L, 0L)))
    // parallel: 2×(START→a→CONV), 1×(START→b→CONV), 1×(START→b→NULL)
    // base = 0.5·1 + 0.5·0.5 = 0.75; cut a → 0.25; cut b → 0.5
    val par = run(Seq(
      (1L, ts(0), "a", 1L), (1L, ts(10), "purchase", 2L),
      (2L, ts(0), "a", 3L), (2L, ts(10), "purchase", 4L),
      (3L, ts(0), "b", 5L), (3L, ts(10), "purchase", 6L),
      (4L, ts(0), "b", 7L)))
    assert(par("a") == ((750000L, 250000L, 500000L,
      500000L * 1000000L / 750000L)), par.toString)
    assert(par("b") == ((750000L, 500000L, 250000L,
      250000L * 1000000L / 750000L)))
  }

  test("fellegi-sunter: milli-bit weights re-derive from m/u; every gate score is its agreement-pattern sum") {
    import graft.operators.EntityResolution
    // the weight table is the model: re-derive it from the literals
    val w = EntityResolution.fsWeights.map { case (f, a, d) => f -> ((a, d)) }.toMap
    def mb(x: Double) = math.round(math.log(x) / math.log(2.0) * 1000.0)
    assert(w("name") == ((mb(0.90 / 0.01), mb(0.10 / 0.99))))
    assert(w("brand") == ((mb(0.95 / 0.04), mb(0.05 / 0.96))))
    // agreement always outweighs disagreement on every field
    EntityResolution.fsWeights.foreach { case (f, a, d) =>
      assert(a > 0 && d < 0, s"$f: a=$a d=$d")
    }
    // gate rows: score ≡ the agreement-pattern sum, order respected
    val rows = EntityResolution.fellegiSunter(spark, SF).collect()
    assert(rows.nonEmpty)
    val Seq((_, nA, nD), (_, bA, bD), (_, tA, tD), (_, sA, sD)) =
      EntityResolution.fsWeights
    var prev = Long.MaxValue
    rows.foreach { r =>
      val want = (if (r.getLong(2) == 1L) nA else nD) +
        (if (r.getLong(3) == 1L) bA else bD) +
        (if (r.getLong(4) == 1L) tA else tD) +
        (if (r.getLong(5) == 1L) sA else sD)
      assert(r.getLong(6) == want, r.toString)
      assert(r.getLong(6) <= prev); prev = r.getLong(6)
    }
  }

  test("fellegi-sunter: refuses a crafted giant block past pairBudget, naming the valve") {
    import graft.operators.EntityResolution
    import spark.implicits._
    import org.apache.spark.sql.functions.substring_index
    // 100 records share the first token → sum C(|block|,2) = 4950
    val parts = (1L to 100L)
      .map(i => (i, s"mega item$i", "B1", "T1", 1L))
      .toDF("pk", "nm", "br", "tp", "sz")
    val ex = intercept[IllegalStateException] {
      EntityResolution.fellegiSunterOf(parts,
        substring_index($"nm", " ", 1), topK = 5, pairBudget = 100L)
    }
    assert(ex.getMessage.contains("4950"), ex.getMessage)
    assert(ex.getMessage.contains("fellegiSunterFine"), ex.getMessage)
    assert(ex.getMessage.contains("blockingKeySelect"), ex.getMessage)
    // the same frame under a budget that fits runs (composite key
    // splits nothing here — brand is constant — so budget must carry)
    assert(EntityResolution.fellegiSunterOf(parts,
      substring_index($"nm", " ", 1), topK = 5,
      pairBudget = 5000L).count() == 5L)
  }

  test("blocking-key select: crafted skew makes first-token lose to the soundex-brand composite") {
    import graft.operators.EntityResolution
    import spark.implicits._
    // giant first-token block ("mega", 40 records over 20 brands)
    // + two variant-spelling truth pairs first-token blocking MISSES
    // (robert/robart, walter/waltar — same soundex, same brand)
    val mega = (1L to 40L).map(i => (i, "mega item", s"b${i % 20}"))
    val vars = Seq(
      (101L, "robert plate", "B1"), (102L, "robart plate", "B1"),
      (103L, "walter crate", "B2"), (104L, "waltar crate", "B2"))
    val parts = (mega ++ vars).toDF("pk", "nm", "br")
    val rows = EntityResolution
      .blockingKeySelectOf(parts, threshold = 0.9, recallFloorPpm = 800000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(5), r.getLong(6)))).toMap
    // (key -> (cand_pairs, recall_ppm, chosen))
    assert(rows.keySet == Set("first_token", "soundex", "token_brand",
      "soundex_brand"))
    // first-token blocking misses both truth pairs → recall 0
    assert(rows("first_token")._2 == 0L, rows.toString)
    assert(rows("token_brand")._2 == 0L)
    // soundex keys retain both; the brand composite is ~36x cheaper
    assert(rows("soundex")._2 == 1000000L)
    assert(rows("soundex_brand")._2 == 1000000L)
    assert(rows("soundex_brand")._1 < rows("soundex")._1 / 30)
    // chosen = cheapest ABOVE the floor: soundex_brand — not
    // token_brand, the cheapest overall, which fails the floor
    assert(rows("soundex_brand")._3 == 1L, rows.toString)
    assert(rows.collect { case (k, (_, _, 1L)) => k }.toSeq ==
      Seq("soundex_brand"))
    // no key above the floor → highest recall wins
    val strict = EntityResolution
      .blockingKeySelectOf(parts, threshold = 0.9,
        recallFloorPpm = 1000001L)
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(strict("soundex") == 1L || strict("soundex_brand") == 1L,
      strict.toString)
  }

  test("did: recovers a planted lift exactly under parallel trends; zero-effect fixture reads 0") {
    import graft.operators.{Analytics, Sampling}
    import spark.implicits._
    // label users with the operator's OWN group assignment, then
    // plant group-specific post means on top of a common trend
    val users = (1L to 40L).toDF("user_id")
    val parity = users
      .select($"user_id", (Sampling.bucket($"user_id", "ab") % 2).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(parity.values.toSet == Set(0L, 1L), "need both groups")
    def events(liftPost: Double) = (1L to 40L).flatMap { u =>
      val treat = parity(u) == 1L
      Seq((u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          "purchase", 10.0),
        (u, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"),
          "purchase", 12.0 + (if (treat) liftPost else 0.0)))
    }.toDF("user_id", "ts", "event_type", "value")
    val lifted = Analytics.didPurchaseValueOf(events(1.5)).collect().head
    assert(lifted.getDouble(4) == 13.5 && lifted.getDouble(5) == 10.0 &&
      lifted.getDouble(6) == 12.0 && lifted.getDouble(7) == 10.0,
      lifted.toString)
    assert(lifted.getDouble(8) == 1.5)
    val flat = Analytics.didPurchaseValueOf(events(0.0)).collect().head
    assert(flat.getDouble(8) == 0.0)
  }

  test("bradley-terry: transitive dominance recovers the order; ties abstain; strengths normalize to mean 1e6") {
    import spark.implicits._
    import graft.operators.Analytics
    def ev(id: Long, u: Long, t: String, k: Int) =
      (0 until k).map(i => (id * 100 + i, (id * 100 + i) * 1000000000L,
        u, t, 0.0, "{}"))
    // 6 users each prefer A>B, B>C, A>C consistently; user 7 ties A=B
    val rows = (1L to 6L).flatMap { u =>
      ev(u * 10, u, "alpha", 3) ++ ev(u * 10 + 1, u, "beta", 2) ++
        ev(u * 10 + 2, u, "gamma", 1)
    } ++ ev(70, 7L, "alpha", 2) ++ ev(71, 7L, "beta", 2)
    val tmp = java.nio.file.Files.createTempDirectory("bt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Analytics.bradleyTerry(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq("alpha", "beta", "gamma"),
      s"order wrong: ${got.toSeq}")
    // wins: alpha 12 (6 over beta + 6 over gamma), beta 6, gamma 0;
    // the tied user contributes NO contest
    assert(got.map(_._2).toSeq == Seq(12L, 6L, 0L))
    assert(got.map(_._3).toSeq == Seq(12L, 12L, 12L))
    val ps = got.map(_._4)
    assert(ps(0) > ps(1) && ps(1) > ps(2))
    // normalization keeps the mean at 1e6 (within integer truncation)
    assert(math.abs(ps.sum - 3000000L) <= 3, s"sum ${ps.sum}")
  }

  test("cohen kappa: reconciles with a driver-side recompute off the langid confusion; bounded") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val cells = TextAnalysis.langId(spark, SF)
      .join(Tables.documents(spark, SF).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang", $"pred_lang").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = cells.map(_._3).sum
    val diag = cells.filter(c => c._1 == c._2).map(_._3).sum
    val labels = (cells.map(_._1) ++ cells.map(_._2)).distinct
    val pe = labels.map { l =>
      cells.filter(_._1 == l).map(_._3).sum *
        cells.filter(_._2 == l).map(_._3).sum
    }.sum
    val r = TextAnalysis.langIdKappa(spark, SF).collect().head
    assert(r.getAs[Long]("n_tot") == n && r.getAs[Long]("diag") == diag)
    assert(r.getAs[Long]("pe_num") == pe)
    assert(r.getAs[Long]("kappa_num") == n * diag - pe)
    val kappa = r.getAs[Double]("kappa")
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("mcnemar: cells reconcile with a scala fold of the paired predictions; chi2 follows the discordant cells only") {
    import graft.operators.{Evaluation, QualityModel, TextAnalysis}
    import graft.Tables
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
    val truth = docs.select($"doc_id", ($"lang" === "en").as("t"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val pa = TextAnalysis.langId(spark, SF)
      .select($"doc_id", ($"pred_lang" === "en").as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val pb = QualityModel.score(docs)
      .select($"doc_id", ($"keep" === 1L).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val ids = pb.keySet // scored docs only (tokenized) — join domain
    val cells = ids.toSeq.map { id =>
      (pa(id) == truth(id), pb(id) == truth(id)) }
    val (n11, n00, n10, n01) = (
      cells.count(c => c._1 && c._2).toLong,
      cells.count(c => !c._1 && !c._2).toLong,
      cells.count(c => c._1 && !c._2).toLong,
      cells.count(c => !c._1 && c._2).toLong)
    val r = Evaluation.mcnemarLangidVsQuality(spark, SF).collect().head
    assert(r.getAs[Long]("n") == ids.size.toLong)
    assert((r.getAs[Long]("n11"), r.getAs[Long]("n00"),
      r.getAs[Long]("n10"), r.getAs[Long]("n01")) == ((n11, n00, n10, n01)))
    val chi2 = if (n01 + n10 > 0)
      math.floor((n01 - n10).toDouble * (n01 - n10) / (n01 + n10) * 1e4 + 0.5) / 1e4
    else 0.0
    assert(r.getAs[Double]("chi2") == chi2)
  }

  test("wilson ci: bounds stay inside [0,1e6] and keep width at the extremes; ≡ scala fold over SF event types") {
    import graft.operators.Analytics
    import graft.Tables
    import spark.implicits._
    val zm = 1959964L
    val counts = Tables.events(spark, SF)
      .select($"event_type", (($"value" >= 50.0).cast("long")).as("hi"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"hi").as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = counts.sortBy(_._1).map { case (t, n, k) =>
      val z = zm.toDouble / 1e6
      val p = k.toDouble / n
      val den = 1.0 + z * z / n
      val ctr = p + z * z / (2.0 * n)
      val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      def r0(x: Double) = math.floor(x + 0.5).toLong
      (t, n, k, k * 1000000L / n,
        r0((ctr - half) / den * 1e6), r0((ctr + half) / den * 1e6))
    }
    val got = Analytics.wilsonCiByType(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == want.toSeq,
      s"first diff: ${got.zip(want).find(x => x._1 != x._2)}")
    got.foreach { case (t, n, k, p, lo, hi) =>
      assert(lo >= 0L && hi <= 1000000L && lo < hi, s"$t: [$lo,$hi]")
      assert(lo <= p && p <= hi, s"$t: p=$p outside [$lo,$hi]")
    }
  }

  test("ks separation: disjoint supports hit 1e6 at the boundary score; identical class distributions read 0") {
    import graft.operators.Evaluation
    import spark.implicits._
    // negatives at scores 1..3, positives at 5..7: full separation,
    // the max gap closes at the last all-negative score (3)
    val disjoint = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (5L, 1L), (6L, 1L), (7L, 1L)).toDF("score", "is_pos")
    val d = Evaluation.ksSeparationOf(disjoint).collect().head
    assert(d.getAs[Long]("ks_score") == 3L)
    assert(d.getAs[Long]("ks_ppm") == 1000000L)
    // identical distributions: every prefix has equal class mass
    val same = Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L))
      .toDF("score", "is_pos")
    val s = Evaluation.ksSeparationOf(same).collect().head
    assert(s.getAs[Long]("gap_scaled") == 0L)
    assert(s.getAs[Long]("ks_ppm") == 0L)
    // empty scored frame: zero rows, matching the oracle's empty
    // LIMIT-1 CTE (a global agg would emit one all-NULL row)
    assert(Evaluation.ksSeparationOf(same.limit(0)).collect().isEmpty)
  }

  test("shapley attribution: single-channel journeys reduce to observed counts, symmetric journeys split evenly, efficiency closes in 24ths") {
    import graft.operators.Analytics
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val tmp = java.nio.file.Files.createTempDirectory("shap").toString
    // users 1-3: click then purchase; user 4: view then purchase;
    // users 5-6: click AND view then purchase; user 7: click only,
    // no purchase (non-converter — must not contribute)
    val rows = Seq(
      (1L, "click"), (1L, "purchase"), (2L, "click"), (2L, "purchase"),
      (3L, "click"), (3L, "purchase"), (4L, "view"), (4L, "purchase"),
      (5L, "click"), (5L, "view"), (5L, "purchase"),
      (6L, "click"), (6L, "view"), (6L, "purchase"),
      (7L, "click")).zipWithIndex
      .map { case ((u, e), i) => (i.toLong, u, e, ts(i.toLong)) }
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Analytics.shapleyAttribution(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // hand Shapley over k=4, k!=24: the 3 click-only journeys add a
    // full marginal 3·24; the view-only journey 1·24; each symmetric
    // click+view journey splits 24 evenly (12 + 12)
    assert(got("click")._1 == 3L * 24L + 2L * 12L, got.toString)
    assert(got("view")._1 == 1L * 24L + 2L * 12L)
    assert(got("error")._1 == 0L && got("signup")._1 == 0L)
    // efficiency: Σφ·24 = 24·(v(full) − v(∅)) = 24·(6 − 0)
    assert(got.values.map(_._1).sum == 24L * 6L)
    // shares: click 96/144, view 48/144
    assert(got("click")._2 == 96L * 1000000L / 144L)
    assert(got("view")._2 == 48L * 1000000L / 144L)
    // channel names are spliced into generated CASE/VALUES text:
    // anything outside [A-Za-z0-9_.-]+ must be refused by name, on
    // BOTH the frame and the oracle builder
    val quoted = Seq("click", "o'brien")
    intercept[IllegalArgumentException] {
      Analytics.shapleyAttribution(spark, tmp, quoted)
    }
    intercept[IllegalArgumentException] {
      Analytics.shapleyAttributionSql(quoted)
    }
    intercept[IllegalArgumentException] {
      Analytics.shapleyAttributionSql(Seq("click", "click"))
    }
    // SAMPLED estimator on the same crafted lattice: deterministic
    // (fixed md5 permutation family — two runs bit-identical),
    // efficiency holds per permutation (Σ phi_sum = m·v(full) = m·6),
    // dummy channels read exactly 0 with se 0, and the active
    // channels' means land within 4·se of the exact Shapley values
    // (φ_click = 4, φ_view = 2 — from the 24ths above)
    val s1 = Analytics.shapleyAttributionSampled(spark, tmp, nPerms = 200)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(4), r.getLong(6)))).toMap
    val s2 = Analytics.shapleyAttributionSampled(spark, tmp, nPerms = 200)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(4), r.getLong(6)))).toMap
    assert(s1 == s2, "sampled shapley must be deterministic")
    assert(s1.values.map(_._1).sum == 200L * 6L, s1.toString)
    assert(s1("error") == ((0L, 0L, 0L)) && s1("signup") == ((0L, 0L, 0L)))
    def near(c: String, exactMicro: Long): Unit = {
      val (_, mean, se) = s1(c)
      assert(math.abs(mean - exactMicro) <= 4L * se + 1L,
        s"$c: mean=$mean exact=$exactMicro se=$se")
    }
    near("click", 4000000L)
    near("view", 2000000L)
  }

  test("brier decomposition: perfect separation closes Murphy's identity at brier 0; hand-fold on mixed cells") {
    import graft.operators.Evaluation
    import spark.implicits._
    // two score clusters, labels perfectly aligned: p ∈ {0, 1000},
    // obar_p ∈ {0, 1000}, o = 500 -> REL 0, RES = UNC = 250000,
    // BRIER = 0 - exact closure in the quantized arithmetic
    val sep = Seq((0L, 0L), (0L, 0L), (10L, 1L), (10L, 1L))
      .toDF("score", "o")
    val r = Evaluation.brierDecompositionOf(sep).collect().head
    assert(r.getAs[Long]("o_pm") == 500L)
    assert(r.getAs[Long]("brier_pm2") == 0L)
    assert(r.getAs[Long]("rel_pm2") == 0L)
    assert(r.getAs[Long]("res_pm2") == 250000L)
    assert(r.getAs[Long]("unc_pm2") == 250000L)
    // mixed cells, divisions exact: scores {0,0,10,10} labels
    // {0,1,0,1}: obar_p = 500 both bins, p = 0/1000.
    // brier = (2·(0-0)²+... per (p,o) cell) div 4:
    // cells (0,0):(0)², (0,1):(1000)², (1000,0):(1000)², (1000,1):0
    // -> (1e6+1e6)/4 = 500000; rel = (2·(0-500)²+2·(1000-500)²)/4
    // = 250000; res = 0; unc = 250000 -> identity: 500000 =
    // 250000 - 0 + 250000
    val mix = Seq((0L, 0L), (0L, 1L), (10L, 0L), (10L, 1L))
      .toDF("score", "o")
    val m = Evaluation.brierDecompositionOf(mix).collect().head
    assert(m.getAs[Long]("brier_pm2") == 500000L)
    assert(m.getAs[Long]("rel_pm2") == 250000L)
    assert(m.getAs[Long]("res_pm2") == 0L)
    assert(m.getAs[Long]("unc_pm2") == 250000L)
    // ≡ scala fold of the same quantized arithmetic on SF
    import graft.operators.QualityModel
    import graft.Tables
    val docs = Tables.documents(spark, SF)
    val rows = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score", ($"lang" === "en").cast("long").as("o"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val mn = rows.map(_._1).min; val mx = rows.map(_._1).max
    val cells = rows.groupBy { case (s, o) =>
      (if (mx > mn) (s - mn) * 1000 / (mx - mn) else 500L, o) }
      .map { case (k, v) => (k._1, k._2, v.length.toLong) }
    val bins = cells.groupBy(_._1).map { case (p, cs) =>
      val np = cs.map(_._3).sum
      val pos = cs.filter(_._2 == 1L).map(_._3).sum
      val brier = cs.map { case (_, o, n) =>
        n * (p - o * 1000L) * (p - o * 1000L) }.sum
      (p, np, pos, brier, 1000L * pos / np)
    }.toSeq
    val n = bins.map(_._2).sum; val nPos = bins.map(_._3).sum
    val oPm = 1000L * nPos / n
    val sf = Evaluation.brierDecompositionQuality(spark, SF).collect().head
    assert(sf.getAs[Long]("n") == n && sf.getAs[Long]("o_pm") == oPm)
    assert(sf.getAs[Long]("brier_pm2") == bins.map(_._4).sum / n)
    assert(sf.getAs[Long]("rel_pm2") ==
      bins.map(b => b._2 * (b._1 - b._5) * (b._1 - b._5)).sum / n)
    assert(sf.getAs[Long]("res_pm2") ==
      bins.map(b => b._2 * (b._5 - oPm) * (b._5 - oPm)).sum / n)
  }

  test("conformal: quantile and coverage reproduce a scala replay of the md5 split and the hand-ranked order statistic") {
    import graft.operators.Evaluation
    import spark.implicits._
    // deterministic md5 per-mille bucket, replayed bit-exact
    def bkt(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + "conformal").getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(7), 16) % 1000
    }
    val scored = (1L to 60L).map(i => (i, (i * 7) % 23))
    val (cal, tst) = scored.partition { case (id, _) => bkt(id) < 500 }
    val nCal = cal.length.toLong
    val sCal = cal.map(_._2).sum
    val resid = cal.map { case (_, s) => math.abs(s * nCal - sCal) }.sorted
    val qRank = math.min((9 * (nCal + 1) + 9) / 10, nCal)
    val q = resid((qRank - 1).toInt)
    val covered = tst.count { case (_, s) => math.abs(s * nCal - sCal) <= q }
    val r = Evaluation.conformalOf(scored.toDF("id", "score"))
      .collect().head
    assert(r.getAs[Long]("n_cal") == nCal)
    assert(r.getAs[Long]("n_test") == tst.length.toLong)
    assert(r.getAs[Long]("q_rank") == qRank)
    assert(r.getAs[Long]("q_scaled") == q)
    assert(r.getAs[Long]("covered") == covered.toLong)
    assert(r.getAs[Long]("coverage_ppm") ==
      covered.toLong * 1000000L / tst.length)
  }

  test("nelson-aalen: hand fold on the KM fixture — hazard steps are exact (d·1e6) div n and accumulate") {
    import graft.operators.Analytics
    import spark.implicits._
    def ts(h: Double) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        + (h * 3600 * 1000).toLong)
    // the KM spec's fixture: events at durations 1h (d=2 of n=5),
    // 2h (d=1 of n=3), 3h (d=1 of n=2, censor 1)
    val ev = Seq(
      (1L, ts(0), "purchase"), (1L, ts(1), "purchase"),
      (2L, ts(0), "purchase"), (2L, ts(1), "purchase"),
      (3L, ts(0), "purchase"), (3L, ts(3), "purchase"),
      (4L, ts(0), "purchase"),
      (5L, ts(0), "purchase"), (5L, ts(2.5), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Analytics.nelsonAalenRepeatPurchaseOf(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))).toMap
    val s1 = 2L * 1000000L / 5L // 400000
    val s2 = 1L * 1000000L / 3L // 333333
    val s3 = 1L * 1000000L / 2L // 500000
    assert(got(1L) == ((5L, 2L, s1, s1)), got(1L).toString)
    assert(got(2L) == ((3L, 1L, s2, s1 + s2)))
    assert(got(3L) == ((2L, 1L, s3, s1 + s2 + s3)))
    // exp(−Ĥ) ≥ KM survival pointwise (standard bracketing)
    val km = Analytics.survivalRepeatPurchaseOf(ev).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    got.foreach { case (t, (_, _, _, h)) =>
      assert(math.exp(-h / 1e6) >= km(t) - 1e-9, s"t=$t")
    }
  }

  test("log-rank: identical cohorts score chi2 exactly 0; a planted one-sided hazard folds to chi2 = 5.0 by hand") {
    import graft.operators.Analytics
    import spark.implicits._
    def ts(h: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * 3600000L)
    // mirrored cohorts: users 0/1 (even/odd) repeat at 2h; users 2/3
    // censor at the 2h horizon — every per-duration term has n1 = n0,
    // so E1 = d/2 exactly in micro units and O - E = 0
    val same = Seq(
      (0L, ts(0), "purchase"), (0L, ts(2), "purchase"),
      (1L, ts(0), "purchase"), (1L, ts(2), "purchase"),
      (2L, ts(0), "purchase"), (3L, ts(0), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r0 = Analytics.logRankRepeatPurchaseOf(same).collect().head
    assert(r0.getAs[Long]("n_group0") == 2L && r0.getAs[Long]("n_group1") == 2L)
    assert(r0.getAs[Long]("o1") * 1000000L == r0.getAs[Long]("e1_micro"))
    assert(r0.getAs[Double]("chi2") == 0.0)
    // planted hazard: all three odd users repeat at 1h, all three
    // even users never do (censored at the 1h horizon). One duration
    // row: d=3, n0=n1=3, n=6 -> E1 = 1.5, V = 3·3·3·3/(36·5) = 0.45,
    // chi2 = (3 - 1.5)² / 0.45 = 5.0 exactly in the micro arithmetic
    val gap = Seq(
      (0L, ts(0), "purchase"), (2L, ts(0), "purchase"), (4L, ts(0), "purchase"),
      (1L, ts(0), "purchase"), (1L, ts(1), "purchase"),
      (3L, ts(0), "purchase"), (3L, ts(1), "purchase"),
      (5L, ts(0), "purchase"), (5L, ts(1), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r1 = Analytics.logRankRepeatPurchaseOf(gap).collect().head
    assert(r1.getAs[Long]("o1") == 3L)
    assert(r1.getAs[Long]("e1_micro") == 1500000L)
    assert(r1.getAs[Long]("v_micro") == 450000L)
    assert(r1.getAs[Double]("chi2") == 5.0)
  }

  test("gains table: ≡ a collected scala fold of the score histogram; terminal decile covers everything") {
    import graft.operators.{Evaluation, QualityModel}
    import graft.Tables
    import spark.implicits._
    val docs = Tables.documents(spark, SF)
    val scored = QualityModel.score(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"score", ($"lang" === "en").cast("long").as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // fold the same statistic: histogram desc by score, first row
    // whose cum reaches (i·N) div 10
    val hist = scored.groupBy(_._1).map { case (s, rows) =>
      (s, rows.length.toLong, rows.map(_._2).sum) }
      .toSeq.sortBy(-_._1)
    val n = hist.map(_._2).sum
    val nPos = hist.map(_._3).sum
    val cum = hist.scanLeft((0L, 0L)) { case ((c, t), (_, cn, tp)) =>
      (c + cn, t + tp) }.tail
    val want = (1L to 10L).map { i =>
      val target = i * n / 10
      val (depth, tp) = cum.find(_._1 >= target).get
      (i, target, depth, tp, tp * 1000000L / nPos,
        math.floor(tp.toDouble * n / (depth.toDouble * nPos) * 1e6 + 0.5) / 1e6)
    }
    val got = Evaluation.gainsQualityVsEnglish(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == want,
      s"first diff: ${got.zip(want).find(x => x._1 != x._2)}")
    // terminal decile: the whole corpus, gain exactly 1e6, lift 1
    assert(got.last._3 == n && got.last._5 == 1000000L &&
      got.last._6 == 1.0)
  }
}
