package graft.tools

import graft.Graft
import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Optimization-round experiment bench for the Σ C(deg,2) wedge
  * aggregate that dominates graph_adamic_adar / graph_neighbor_jaccard
  * (guide §1: measure variants before changing the operator).
  *
  * Usage: runMain graft.tools.WedgeProbe <sfDir>
  */
object WedgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Graft.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "wedge-probe")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-60s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val edges = Graph.copurchaseEdges(spark, sfDir)
    val nb = time("edges repartition(src) checkpoint") {
      edges.repartition($"src").localCheckpoint(true)
    }
    println(s"edge rows: ${nb.count()}")
    val deg = nb.groupBy($"src").agg(count(lit(1)).as("deg"))
    val w = deg.agg(sum(expr("deg * (deg - 1) div 2"))).head.getLong(0)
    println(s"wedges: $w")

    def wedgeStream = nb.select($"src", $"dst".as("a"))
      .join(nb.select($"src", $"dst".as("b")), "src")
      .filter($"a" < $"b")
      .select(($"a" * lit(4294967296L) + $"b").as("pk"))

    // A: current shape — groupBy(pk) straight off the join
    time("A: groupBy(pk) [current]") {
      wedgeStream.groupBy($"pk").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    // B: more map tasks (smaller per-task agg maps)
    val nb256 = nb.repartition(256, $"src").localCheckpoint(true)
    def wedgeStream256 = nb256.select($"src", $"dst".as("a"))
      .join(nb256.select($"src", $"dst".as("b")), "src")
      .filter($"a" < $"b")
      .select(($"a" * lit(4294967296L) + $"b").as("pk"))
    time("B: 256 map partitions, groupBy(pk)") {
      wedgeStream256.groupBy($"pk").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    // C: explicit repartition(pk) then complete-mode agg, 32 parts
    time("C: repartition(32, pk) + agg") {
      wedgeStream.repartition(cpus.toInt, $"pk")
        .groupBy($"pk").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    // D: explicit repartition(pk) sized from the census (2M rows/task)
    val nOut = math.max(cpus.toInt, (w / 2000000L).toInt)
    time(s"D: repartition($nOut, pk) + agg") {
      wedgeStream.repartition(nOut, $"pk")
        .groupBy($"pk").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    // E: raw wedge stream cost (no agg) — floor for the join itself
    time("E: wedge stream noop (no agg)") {
      wedgeStream.write.format("noop").mode("overwrite").save()
    }
    // F: distinct-pair cardinality (approx — one pass, no exact agg)
    time("F: approx distinct pk") {
      println("  approx distinct pairs: " +
        wedgeStream.agg(approx_count_distinct($"pk").as("d")).head.getLong(0))
    }
    // G: sort-based aggregate — repartition(pk), sortWithinPartitions,
    // replaceHashWithSortAgg picks SortAggregate off the existing order
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg.enabled", "true")
    time("G: repartition(32, pk) + sortWithin + SortAggregate") {
      wedgeStream.repartition(cpus.toInt, $"pk")
        .sortWithinPartitions($"pk")
        .groupBy($"pk").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg.enabled", "false")
    spark.stop()
  }
}
