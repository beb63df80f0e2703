package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Integer-unit PageRank: the distributed iteration must equal a
  * sequential single-threaded re-derivation with the same integer
  * rules — any fp creep, merge-order dependence, or off-by-one in
  * the damping arithmetic breaks the equality.
  */
class GraphSpec extends SparkSpec {

  test("5-iteration ranks equal a sequential integer re-derivation on a crafted graph") {
    import spark.implicits._
    // path + triangle + star: mixed degrees so div truncation and
    // damping are both exercised asymmetrically
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L), // triangle 2-3-4 with tail 1
      (5L, 6L), (5L, 7L), (5L, 8L)) // star at 5
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = Graph.pageRankOf(
        spark.createDataFrame(
          spark.sparkContext.parallelize(edges, 4)).toDF("src", "dst"),
        iters = 5, topK = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((src, outs) <- adj; c = rank(src) / outs.length; dst <- outs)
        contrib(dst) += c
      rank = adj.keys.map(n => n -> (150000L + (850L * contrib(n)) / 1000L))
        .toMap
    }
    assert(got == rank, s"spark=$got sequential=$rank")
    // high-degree hub (5) must outrank its leaves, triangle nodes the tail
    assert(got(5L) > got(6L) && got(2L) > got(1L), s"ordering wrong: $got")
  }

  test("corpus ranks: every node keeps the damping floor; top-k fully tie-broken") {
    val rows = Graph.pageRank(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, r) =>
      assert(r >= 150000L, s"node $n below damping floor: $r") }
    // sorted by rank desc then node asc, no unordered ties
    assert(rows.sameElements(rows.sortBy { case (n, r) => (-r, n) }),
      s"top-k ordering not deterministic: ${rows.toSeq}")
  }
}
