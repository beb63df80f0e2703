package graft.tools

import graft.{Graft, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the testdata layout: writes `<out>` as
  * `k` key-shifted copies of `<in>`, so scaling claims can be checked
  * with data instead of argument (sf0.1 ×10 ≈ sf1, ×100 ≈ sf10).
  *
  * Replication rules keep each operator's workload SHAPE honest
  * rather than exactly mimicking a generator at the larger SF:
  *  - fact tables (lineitem, orders) shift their order keys per copy
  *    — group/join cardinalities scale linearly, per-key densities
  *    stay fixed;
  *  - documents shift doc_id AND suffix every token with the copy
  *    index, so shingle/minhash workloads scale linearly instead of
  *    every doc gaining k-1 verbatim near-duplicates (which would
  *    quadratically inflate pair generation — a different workload,
  *    not a bigger one);
  *  - embeddings shift vec_id only (cosine throughput is
  *    magnitude-blind; ties across copies don't affect timing);
  *  - dimensions (customer, supplier, part, nation, region) and
  *    events copy through unchanged.
  *
  * Usage: runMain graft.tools.ScaleGen <inDir> <outDir> <k>
  */
object ScaleGen {

  /** k copies of df with `keys` shifted by copy*step (step = max+1);
    * keeps the `_copy` index column for per-copy rewrites.
    */
  private def shifted(spark: SparkSession, df: DataFrame, k: Int,
      keys: Seq[String]): DataFrame = {
    val steps = keys.map { c =>
      c -> (df.agg(max(col(c))).head.getLong(0) + 1L)
    }
    val copies = spark.range(0, k).withColumnRenamed("id", "_copy")
    steps.foldLeft(df.crossJoin(broadcast(copies))) { case (acc, (c, step)) =>
      acc.withColumn(c, col(c) + col("_copy") * step)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, kStr) = args
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Graft.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-scalegen")
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit =
      df.drop("_copy").write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    write(shifted(spark, Tables.lineitem(spark, inDir), k, Seq("l_orderkey")),
      "lineitem")
    write(shifted(spark, Tables.orders(spark, inDir), k, Seq("o_orderkey")),
      "orders")
    // per-copy token suffix — kills cross-copy shingle identity
    write(shifted(spark, Tables.documents(spark, inDir), k, Seq("doc_id"))
      .withColumn("text", regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1q"), col("_copy")))), "documents")
    write(shifted(spark, Tables.embeddings(spark, inDir), k, Seq("vec_id")),
      "embeddings")
    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      write(Tables(spark, inDir, t), t)
    }
    // events: raw copy (keep the original ns-timestamp file semantics
    // by round-tripping the raw schema, no Tables.events ts rewrite)
    write(spark.read.parquet(s"$inDir/events.parquet"), "events")
    spark.stop()
  }
}
