package graft.tools

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.LevBounded

/** Microbenchmark: custom banded LevBounded.compute vs the built-in
  * UTF8String.levenshteinDistance (unbounded and threshold forms) on
  * the PassJoin verify join's workload shape — 160-char keys, k=4,
  * ~95% far pairs / 5% near pairs. Pure JVM, no Spark session, so the
  * comparison is free of shuffle and scheduling noise.
  */
object LevMicro {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val n = 2000
    val len = 160
    val k = 4
    def randStr(): String =
      Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
    val base = Array.fill(n)(randStr())
    // 5% near pairs: mutate ≤ k positions of a copy
    val pairs: Array[(UTF8String, UTF8String)] = Array.tabulate(n) { i =>
      val a = base(i)
      val b =
        if (i % 20 == 0) {
          val chars = a.toCharArray
          (0 until 1 + rnd.nextInt(k)).foreach { _ =>
            chars(rnd.nextInt(len)) = ('a' + rnd.nextInt(26)).toChar
          }
          new String(chars)
        } else base((i + 1) % n)
      (UTF8String.fromString(a), UTF8String.fromString(b))
    }

    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach(_ => f) // warmup
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val s = f
        (System.nanoTime() - t0, s)
      }
      val best = times.map(_._1).min / 1e6
      println(f"$label%-28s min ${best}%8.2f ms  (checksum ${times.head._2})")
    }

    time("builtin unbounded") {
      var s = 0L; var i = 0
      while (i < n) { s += pairs(i)._1.levenshteinDistance(pairs(i)._2); i += 1 }
      s
    }
    time("builtin threshold k") {
      var s = 0L; var i = 0
      while (i < n) { s += pairs(i)._1.levenshteinDistance(pairs(i)._2, k); i += 1 }
      s
    }
    time("custom banded k") {
      var s = 0L; var i = 0
      while (i < n) { s += LevBounded.compute(pairs(i)._1, pairs(i)._2, k); i += 1 }
      s
    }
  }
}
