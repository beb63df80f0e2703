package graft

import graft.operators.Recommend

class RecommendSpec extends SparkSpec {

  test("item-item cosine equals hand computation; repeated part in one order doesn't inflate") {
    import spark.implicits._
    // baskets: o1={1,2,3} o2={1,2} o3={1,2} o4={3} — plus part 1
    // repeated inside o1, which must not change anything
    val op = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 3L)).toDF("o", "p")
    // n1=3 n2=3 n3=2; co(1,2)=3 co(1,3)=1 co(2,3)=1
    def ppm(co: Long, n1: Long, n2: Long): Long =
      math.floor(1e6 * co / math.sqrt((n1 * n2).toDouble) + 0.5).toLong
    val got = Recommend.itemItemCfOf(op, nItems = 3, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = Seq(
      (1L, 2L, 3L, ppm(3, 3, 3)), (1L, 3L, 1L, ppm(1, 3, 2)),
      (2L, 1L, 3L, ppm(3, 3, 3)), (2L, 3L, 1L, ppm(1, 3, 2)),
      (3L, 1L, 1L, ppm(1, 2, 3)), (3L, 2L, 1L, ppm(1, 2, 3)))
    assert(got.toSeq == want, s"got=${got.toSeq} want=$want")
    // identical co-membership → cosine 10^6 exactly; symmetry holds
    assert(ppm(3, 3, 3) == 1000000L)
    val sym = got.map(r => (r._1, r._2) -> r._4).toMap
    sym.foreach { case ((a, b), v) =>
      assert(sym.get((b, a)).forall(_ == v), s"asymmetric $a,$b") }
  }

  test("top-k and query cuts: only the nItems most popular items emit rows, at most k each") {
    import spark.implicits._
    // part 9 is in every basket (most popular); parts 1..4 co-occur
    // with it once each
    val op = (1L to 4L).flatMap(o => Seq((o, 9L), (o, o))).toDF("o", "p")
    val out = Recommend.itemItemCfOf(op, nItems = 1, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).distinct.toSeq == Seq(9L))
    assert(out.length == 2 && out.map(_._2).toSeq == Seq(1L, 2L),
      s"got ${out.toSeq}") // equal cosines tie-break by neighbor id
  }

  test("coverage: ppm ratio reconciles, gini matches the pairwise re-derivation, bounds hold") {
    import graft.operators.Recommend
    val r = Recommend.coverage(spark, SF).collect().head
    val catalog = r.getLong(0); val nRec = r.getLong(1)
    assert(nRec > 0 && nRec <= 50, s"n_recommended $nRec outside (0, nItems*k]")
    assert(r.getLong(2) == nRec * 1000000L / catalog)
    // independent gini: exposure counts off the rec table itself
    val expo = Recommend.itemItemCf(spark, SF)
      .groupBy("neighbor").count().collect().map(_.getLong(1))
    val dsum = (for (a <- expo; b <- expo) yield math.abs(a - b)).sum
    val want = dsum.toDouble / (2.0 * expo.length * expo.sum)
    assert(math.abs(r.getDouble(3) - want) < 1e-6 + 1e-9)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
  }
}
