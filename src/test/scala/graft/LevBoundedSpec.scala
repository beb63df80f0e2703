package graft

import graft.functions.LevBounded
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Banded bounded-Levenshtein kernel: exactness vs the full-matrix
  * reference within the bound, the k+1 cap past it, and codegen
  * residency.
  */
class LevBoundedSpec extends SparkSpec {

  private def full(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  private def lb(a: String, b: String, k: Int): Int =
    LevBounded.compute(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("≡ full DP capped at k+1 over 3000 random pairs, k ∈ 0..6") {
    val rnd = new scala.util.Random(0xB0B5L)
    val alpha = "abcde"
    def s(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 3000) {
      val a = s(rnd.nextInt(60))
      val b = if (rnd.nextBoolean()) s(rnd.nextInt(60))
        else { // near-neighbor: splice at idx, clamp the replace count
          val idx = rnd.nextInt(a.length + 1)
          a.patch(idx, s(rnd.nextInt(4)),
            math.min(rnd.nextInt(3), a.length - idx))
        }
      val k = rnd.nextInt(7)
      val want = math.min(full(a, b), k + 1)
      assert(lb(a, b, k) == want, s"k=$k a='$a' b='$b'")
    }
  }

  test("edges: empty strings, equal strings, k=0, band-exit on distant pairs") {
    assert(lb("", "", 4) == 0)
    assert(lb("", "abc", 4) == 3)
    assert(lb("", "abcdef", 4) == 5) // capped
    assert(lb("same", "same", 0) == 0)
    assert(lb("same", "samx", 0) == 1) // cap at k+1=1
    assert(lb("aaaaaaaaaa", "bbbbbbbbbb", 3) == 4) // early band exit
    // accented BMP chars count 1, same as the built-in
    assert(lb("café", "cafe", 2) == 1)
  }

  test("agrees with Spark's builtin levenshtein on corpus prefixes, and stays in codegen") {
    import spark.implicits._
    val df = Tables.documents(spark, SF)
      .select($"doc_id", substring($"text", 1, 120).as("p"))
      .withColumn("q", concat(lit("xx"), expr("substr(p, 4)")))
      .select(
        call_function("lev_bounded", $"p", $"q", lit(6)).as("bounded"),
        least(levenshtein($"p", $"q"), lit(7)).as("builtin"))
    assert(df.filter($"bounded" =!= $"builtin").count() == 0)
    // the `*(n)` prefix marks a whole-stage-codegen stage; the
    // projection carrying levbounded must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("levbounded") && l.trim.startsWith("*(")),
      s"lev_bounded fell out of codegen:\n$plan")
  }
}
