package graft

import java.nio.file.Files

import graft.pipeline.{DimensionalEtl, History}
import graft.sources.StarSchemaSink
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("history ledger is idempotent") {
    val dir = Files.createTempDirectory("graft_history").toString
    val h = new History(spark, s"$dir/ledger")
    assert(h.recordIfNew("batch_2024_01"))
    assert(!h.recordIfNew("batch_2024_01"))
    assert(h.recordIfNew("batch_2024_02"))
    assert(new History(spark, s"$dir/ledger").processed ==
      Set("batch_2024_01", "batch_2024_02"))
  }

  test("star-schema sink writes partitioned fact + dims, pruning works") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sink").toString
    val fact = Tables.orders(spark, SF)
      .withColumn("o_year", year($"o_orderdate"))
    val dims = Seq("customer" -> Tables.customer(spark, SF))
    val paths = StarSchemaSink.write(dir, ("orders", fact, Seq("o_year")), dims)
    val back = spark.read.parquet(paths("orders"))
    assert(back.count() == fact.count())
    // partition pruning: a year filter must prune, not scan-and-filter
    val pruned = back.filter($"o_year" === 1995)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == fact.filter($"o_year" === 1995).count())
    assert(!scan.contains("PushedFilters: [IsNotNull(o_year)"),
      "o_year reached data filters — it should be partition-pruned")
    assert(spark.read.parquet(paths("customer")).count() ==
      Tables.customer(spark, SF).count())
  }

  test("purge drops the named star tables and is idempotent (task.py:170)") {
    import graft.sources.ParquetSink
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_purge").toString
    val sink = new ParquetSink(dir)
    StarSchemaSink.writeTo(sink,
      fact = ("shows", Seq((1L, "a"), (2L, "b")).toDF("id", "title"), Nil),
      dims = Seq("personnel" -> Seq((1L, "x")).toDF("id", "name")))
    assert(new java.io.File(s"$dir/shows").exists())
    assert(new java.io.File(s"$dir/personnel").exists())
    // drops what exists, ignores what doesn't (history never written)
    StarSchemaSink.purge(sink, Seq("shows", "personnel", "history"))
    assert(!new java.io.File(s"$dir/shows").exists())
    assert(!new java.io.File(s"$dir/personnel").exists())
    StarSchemaSink.purge(sink, Seq("shows", "personnel", "history")) // replay-safe
  }

  test("compaction collapses a fragmented table without changing its data") {
    import graft.pipeline.Maintenance
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_frag").toString + "/t"
    val df = Tables.lineitem(spark, SF).select($"l_orderkey", $"l_quantity")
    df.repartition(40).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val sum0 = before.agg(sum($"l_quantity")).collect()(0).getDouble(0)
    val n0 = before.count()
    val (nBefore, nAfter) = Maintenance.compact(spark, dir)
    assert(nBefore == 40 && nAfter < 5, s"$nBefore -> $nAfter")
    val after = spark.read.parquet(dir)
    assert(after.count() == n0)
    assert(math.abs(after.agg(sum($"l_quantity")).collect()(0).getDouble(0) - sum0) < 1e-6)
  }

  test("end-to-end ETL job: builds the lake once, skips the replay") {
    import graft.pipeline.EtlJob
    val out = Files.createTempDirectory("graft_lake").toString
    val first = EtlJob.run(spark, SF, out, inputName = "batch_A")
    assert(!first.skipped)
    assert(first.tablesWritten.size == 3)
    assert(first.orphanOrders >= 0 && first.orphanCustomers >= 0)
    assert(first.topFemaleToken.nonEmpty && first.topMaleToken.nonEmpty)
    // written star is readable
    first.tablesWritten.foreach { p =>
      assert(spark.read.parquet(p).count() > 0)
    }
    // idempotency: the same input name is a no-op
    val replay = EtlJob.run(spark, SF, out, inputName = "batch_A")
    assert(replay.skipped)
  }

  test("dimensional ETL: surrogate keys dense, bridge joins back clean") {
    import spark.implicits._
    val dim = DimensionalEtl.tokenDim(spark, SF).cache()
    val n = dim.count()
    assert(dim.select("token_id").distinct().count() == n)
    assert(dim.agg(min($"token_id"), max($"token_id")).collect()(0)
      .toSeq == Seq(1L, n))
    val bridge = DimensionalEtl.bridge(spark, SF)
    // every bridge row resolves to a dim token
    assert(bridge.join(dim, "token_id").count() == bridge.count())
    dim.unpersist()
  }
}
