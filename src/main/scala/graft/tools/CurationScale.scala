package graft.tools

import graft.Graft
import graft.pipeline.CurationPipeline

/** Wall-clock instrumentation for the composed curation job at
  * ScaleGen'd scale factors (SCALING.md §Measured scale-up). Each
  * stage's survivor frame is counted separately; because stage N's
  * plan re-runs stages 1..N-1 (the chain is semi-join composition,
  * nothing cached — same as [[CurationPipeline.run]]'s accounting),
  * the printed `cum` seconds are cumulative-through-stage and the
  * marginal cost of stage N is cum(N) − cum(N−1). The `total` line
  * is a separate end-to-end pass over the final frame only — what a
  * production run that wrote the output once would pay.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.CurationScale <sfDir>
  */
object CurationScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.env("SPARK_GRAFT_SF_DIR"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Graft.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-curation-scale")
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES").foreach(v =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", v))
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM/codegen once so stage timings measure the operator
    CurationPipeline.stages(spark, dir).last._2.count()

    val timed = CurationPipeline.stages(spark, dir).map { case (name, df) =>
      val t0 = System.nanoTime()
      val n = df.count()
      (name, n, (System.nanoTime() - t0) / 1e9)
    }
    val t0 = System.nanoTime()
    val finalN = CurationPipeline.stages(spark, dir).last._2.count()
    val endToEnd = (System.nanoTime() - t0) / 1e9

    val stagesJson = timed.map { case (name, n, s) =>
      f""""$name":{"rows":$n,"cum_sec":$s%.2f}"""
    }.mkString(",")
    println(f"""{"metric":"curation_scale","sf_dir":"$dir","stages":{$stagesJson},"end_to_end_sec":$endToEnd%.2f,"final_rows":$finalN}""")
    spark.stop()
  }
}
