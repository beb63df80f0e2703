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
  *  - events shift event/user ids and slide ts by 31 days per copy
  *    (longitudinal growth: k× the users, k× the calendar span,
  *    per-user density fixed);
  *  - dimensions (customer, supplier, part, nation, region) copy
  *    through unchanged.
  *
  * Usage: runMain graft.tools.ScaleGen <inDir> <outDir> <k>
  */
object ScaleGen {

  /** k copies of df with `keys` shifted by copy*step; keeps the
    * `_copy` index column for per-copy rewrites. `step` defaults to
    * max(key)+1 per key; pass it explicitly when two tables share a
    * key domain and must shift in lockstep.
    */
  private def shifted(spark: SparkSession, df: DataFrame, k: Int,
      keys: Seq[String], step: Option[Long] = None): DataFrame = {
    val steps = keys.map { c =>
      c -> step.getOrElse(df.agg(max(col(c))).head.getLong(0) + 1L)
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

    // A k-fold crossJoin inherits the tiny input's partition count, so
    // without a repartition the scaled table lands as 1-2 giant files
    // and downstream scans get ~bytes/128MB splits instead of cluster
    // parallelism — an unrealistic layout (real large tables are many
    // files) that throttles exactly the scan-bound queries the scaled
    // data exists to measure. Spread every scaled write across the
    // session's parallelism.
    val outParts = spark.sparkContext.defaultParallelism
    def write(df: DataFrame, name: String): Unit =
      df.drop("_copy").repartition(outParts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    // lineitem and orders share the orderkey domain: one shared step
    // (max over BOTH tables) keeps the join aligned in every copy —
    // per-table maxes would silently misalign copies >= 1 whenever an
    // order had no lineitems at the top of the key range.
    val li = Tables.lineitem(spark, inDir)
    val ord = Tables.orders(spark, inDir)
    val orderStep = math.max(
      li.agg(max(col("l_orderkey"))).head.getLong(0),
      ord.agg(max(col("o_orderkey"))).head.getLong(0)) + 1L
    write(shifted(spark, li, k, Seq("l_orderkey"), Some(orderStep)),
      "lineitem")
    write(shifted(spark, ord, k, Seq("o_orderkey"), Some(orderStep)),
      "orders")
    // per-copy token BIJECTION with stop words as fixed points: each
    // copy suffixes every non-stop token with its copy index. This
    // kills cross-copy shingle/gram identity (every shingle holds a
    // non-stop token except all-stop runs, which are rare and
    // bounded) while preserving exactly the DISCRETE statistics the
    // content-sensitive operators read — stop-word hits and token
    // counts (quantile cuts, most Gopher rules) and within-copy
    // duplicate structure (gram (t1..t5) maps to (f(t1)..f(t5)), so
    // exact/span dedup see the same within-copy workload the base SF
    // had). NOT preserved: mean word length grows by the suffix
    // (~2-3 chars, varying with the copy-index digit count), so
    // ok_wl-BOUNDARY docs can flip on scaled copies — scaled-run rule
    // selectivity is comparable to the base SF, not identical. The
    // round-6 every-token suffix broke stop-word matching and zeroed
    // the rule filter on scaled data — a different corpus, not a
    // bigger one.
    val stopAlt = graft.operators.Curation.stopWords.mkString("|")
    write(shifted(spark, Tables.documents(spark, inDir), k, Seq("doc_id"))
      .withColumn("text", regexp_replace(col("text"),
        lit("(?<=^|\\s)(?!(?:" + stopAlt + ")(?=\\s|$))(\\S+)"),
        concat(lit("$1q"), col("_copy"))))
      // keep n_chars consistent with the rewritten text (it was the
      // base copy's length before round 8 — stale on every copy >= 1)
      .withColumn("n_chars", length(col("text")).cast("long")), "documents")
    write(shifted(spark, Tables.embeddings(spark, inDir), k, Seq("vec_id")),
      "embeddings")
    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      write(Tables(spark, inDir, t), t)
    }
    // events (scaled since round 10; earlier receipts note "events
    // fixed"): copy c shifts event/user ids and slides ts by c×31
    // days — the longitudinal shape a real event log grows in.
    // Wall-clock span scales with k, so the calendar-bounded
    // operators (gap fill, sliding DAU, CUSUM) see a k-fold spine;
    // user-frame operators (funnel, stickiness, sessionize) see k×
    // the users at fixed per-user density; the distinct hour×user
    // pair frame scales k×. The raw schema round-trips (read via the
    // raw parquet reader, not Tables.events, so whichever physical
    // ts layout the source carries is preserved — a timestamp column
    // slides with to_timestamp arithmetic, an int64-nanos column
    // with integer arithmetic).
    val evRaw = spark.read.parquet(s"$inDir/events.parquet")
    val evCopies = spark.range(0, k).withColumnRenamed("id", "_copy")
    val evStep = evRaw.agg(max(col("event_id"))).head.getLong(0) + 1L
    val evUserStep = evRaw.agg(max(col("user_id"))).head.getLong(0) + 1L
    val evShifted = evRaw.crossJoin(broadcast(evCopies))
      .withColumn("event_id", col("event_id") + col("_copy") * evStep)
      .withColumn("user_id", col("user_id") + col("_copy") * evUserStep)
    val evSlid = evShifted.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // int64 nanos
        evShifted.withColumn("ts",
          col("ts") + col("_copy") * lit(31L * 86400 * 1000000000L))
      case _ =>
        evShifted.withColumn("ts",
          col("ts") + make_dt_interval(col("_copy") * 31, lit(0), lit(0),
            lit(0)))
    }
    write(evSlid, "events")
    spark.stop()
  }
}
