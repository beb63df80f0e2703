package graft.tools

import graft.Graft
import graft.operators.{SemDedup, Similarity}
import org.apache.spark.sql.functions._

/** Scale probe for the coarse-quantizer path (SCALING.md): times
  * nearest_cells assignment over the full embeddings table and the
  * end-to-end SemDedup at each requested nlist. The point being
  * measured: after round 7's kernel, assignment cost is the
  * unavoidable corpus×nlist×dim flops — plan size and codegen no
  * longer cap nlist (the round-6 literal-argmax could not even
  * ANALYZE past nlist ≈ 10³).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.AnnScale <sfDir> <nlist,nlist,...>
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nlists = args.lift(1).getOrElse("1024,4096,16384")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Graft.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-ann-scale")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = graft.Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val n = emb.count()
    emb.select(Similarity.cellCol($"embedding",
      Similarity.firstCentroids(spark, dir, 16))).count() // warmup

    // cell balance = (cells_used, Σ cell²): the second is the pair
    // cost SemDedup's cell self-join actually pays, so it is the
    // number that says what a quantizer buys at scale
    def balance(cents: Array[(Long, Array[Float])]): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val r = emb
        .select(Similarity.cellCol($"embedding", cents).as("cell_id"))
        .groupBy($"cell_id").count()
        .agg(countDistinct($"cell_id"), sum($"count" * $"count")).head()
      (r.getLong(0), r.getLong(1), (System.nanoTime() - t0) / 1e9)
    }

    val rows = nlists.map { nlist =>
      val cents = Similarity.firstCentroids(spark, dir, nlist)
      val (cellCount, sumSq, tAssign) = balance(cents)
      val t1 = System.nanoTime()
      val victims = SemDedup.semanticDedup(spark, dir, nlist = nlist,
        tau = 0.9, centroids = Some(cents)).count()
      val tDedup = (System.nanoTime() - t1) / 1e9
      // trained spherical-k-means through the SAME assignment path —
      // quantifies what training buys over the first-n stand-in. A
      // ScaleGen'd corpus is copies of the base directions, so nlist
      // past the distinct-direction count is untrainable by
      // construction; that failure is recorded, not papered over.
      val trained =
        try {
          val tTrain0 = System.nanoTime()
          val tc = Similarity.kmeansCentroidsOf(emb, k = nlist,
            sampleMax = math.max(4096, 4 * nlist))
          val tTrain = (System.nanoTime() - tTrain0) / 1e9
          val (cu, sq, ta) = balance(tc)
          f""""trained":{"cells_used":$cu,"sum_cell_sq":$sq,"assign_sec":$ta%.2f,"train_sec":$tTrain%.2f}"""
        } catch {
          case e: IllegalArgumentException =>
            s""""trained":{"untrainable":"${e.getMessage.replace('"', '\'')}"}"""
        }
      f""""nlist_$nlist":{"cells_used":$cellCount,"sum_cell_sq":$sumSq,"assign_sec":$tAssign%.2f,"semdedup_sec":$tDedup%.2f,"victims":$victims,$trained}"""
    }
    println(s"""{"metric":"ann_scale","sf_dir":"$dir","vectors":$n,${rows.mkString(",")}}""")
    spark.stop()
  }
}
