package graft.tools

import graft.Graft
import graft.operators.Events

/** Micro-benchmark for the SURVEY #26/#26b sessionization pair:
  * lag+cumsum windows vs native `session_window`
  * (UpdatingSessionsExec), with and without
  * `spark.sql.sessionWindow.merge.sessions.in.local.partition`
  * (partial session merge before the shuffle — the conf Spark offers
  * to cut the exchanged row count). Quantifies the measured
  * conclusion recorded in SCALING.md.
  *
  * Usage: runMain graft.tools.SessionWindowProbe [sfDir]
  */
object SessionWindowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session(master = "local[32]", shufflePartitions = 32,
      appName = "graft-session-probe")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${ts.tail.min}%.3f s  (passes ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    time("lag+cumsum")(Events.sessionize(spark, sfDir).count())
    time("session_window")(Events.sessionWindows(spark, sfDir).count())
    spark.conf.set(
      "spark.sql.sessionWindow.merge.sessions.in.local.partition", "true")
    time("session_window+localMerge")(Events.sessionWindows(spark, sfDir).count())
    spark.stop()
  }
}
