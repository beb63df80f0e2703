package graft.tools
import org.apache.spark.sql.SparkSession
object AsofBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session(master = "local[32]",
      shufflePartitions = 32, appName = "asof-bench")
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      // warmup + 3 timed passes
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime; val n = f
        (System.nanoTime - t0) / 1e9 -> n
      }
      println(f"[asof-bench] $tag%-14s min=${ts.map(_._1).min}%.2f s  runs=${ts.map(t => f"${t._1}%.2f").mkString(",")}  rows=${ts.head._2}")
    }
    time("compositional") { graft.operators.AsOfJoin.eventsAsOfSignup(spark, dir).count() }
    time("native") { graft.operators.AsOfJoin.eventsAsOfSignupNative(spark, dir).count() }

    // synthetic x10-scale wide-left case: 8M probe rows with 10 extra
    // columns, 800k reference rows — the regime the union+window form
    // pays for (every right row padded to the wide left schema through
    // the exchange and the window)
    import org.apache.spark.sql.functions._
    val wideLeft = spark.range(8000000L).select(
      (col("id") % 100000L).as("k"), (col("id") * 37L % 1000000L).as("t"),
      col("id").as("id")
    ).withColumns((1 to 10).map(i => s"pad$i" -> (col("id") + i)).toMap)
      .localCheckpoint(true)
    val ref = spark.range(800000L).select(
      (col("id") % 100000L).as("k"), (col("id") * 53L % 1000000L).as("rt"),
      col("id").as("v")).localCheckpoint(true)
    def sumOf(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("asof_v")).head.getLong(0)
    var s1 = 0L; var s2 = 0L
    time("wide-compo") {
      s1 = sumOf(graft.operators.AsOfJoin.asOf(wideLeft, ref,
        Seq("k"), "t", "rt", Seq("v"))); 8000000L }
    time("wide-native") {
      s2 = sumOf(graft.operators.AsOfJoin.asOfNative(wideLeft, ref,
        Seq("k"), "t", "rt", Seq("v"))); 8000000L }
    require(s1 == s2, s"wide case disagrees: $s1 vs $s2")
    println(s"[asof-bench] wide sums agree: $s1")
    spark.stop()
  }
}
