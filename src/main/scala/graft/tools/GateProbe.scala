package graft.tools

import graft.{Graft, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import scala.collection.mutable

/** Optimization-round instrument (guide §1): for each named gate,
  * dump `.explain("formatted")` to a file and time the gate with a
  * per-job/per-stage breakdown so wall time attributes to operators
  * instead of being one opaque number.
  *
  * Usage: runMain graft.tools.GateProbe <sfDir> <outDir> <gate>[,<gate>...]
  * Writes <outDir>/<gate>_plan.txt and prints per-job wall + stage
  * task-time totals.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val gates = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val shuffleParts = sys.env.get("SPARK_PROBE_SHUFFLE")
      .map(_.toInt).getOrElse(cpus.toInt)
    val spark = Graft.session(master = s"local[$cpus]",
      shufflePartitions = shuffleParts, appName = "graft-probe")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
      var stages: Int = 0, var taskTimeMs: Long = 0L, desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = JobRec(e.jobId, e.time,
            desc = Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""))
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val info = e.stageInfo
          stageToJob.get(info.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1
            j.taskTimeMs += info.taskMetrics.executorRunTime
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    gates.foreach { g =>
      val fn = SparkEntry.queries.getOrElse(g,
        throw new IllegalArgumentException(s"unknown gate $g"))
      // plan dump (lazy — no execution)
      val planTxt = try {
        fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      } catch { case t: Throwable => s"explain failed: $t" }
      java.nio.file.Files.write(outDir.resolve(s"${g}_plan.txt"),
        planTxt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // warm pass then timed pass, with job breakdown on the timed one
      spark.sparkContext.setJobDescription(s"$g warm")
      fn(spark, sfDir).count()
      spark.catalog.clearCache(); System.gc()
      jobs.synchronized { jobs.clear() }
      spark.sparkContext.setJobDescription(s"$g timed")
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"GATE $g%-32s total=$sec%8.3f s")
      jobs.synchronized {
        jobs.values.foreach { j =>
          val w = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
          println(f"  job ${j.id}%4d wall=$w%8.3f s stages=${j.stages}%3d taskTime=${j.taskTimeMs / 1e3}%8.2f s  ${j.desc}")
        }
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
