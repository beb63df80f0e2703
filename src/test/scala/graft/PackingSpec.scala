package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private lazy val packed = Packing.packSequences(spark, SF).cache()

  test("packing covers every document exactly once") {
    val n = Tables.documents(spark, SF).count()
    assert(packed.count() == n)
    assert(packed.select("doc_id").distinct().count() == n)
  }

  test("offsets are consistent: each doc starts where the previous ended (mod budget)") {
    import spark.implicits._
    // within a shard, tokens_before = seq_id * budget + seq_offset
    // must be the running sum of previous docs' n_tokens
    val bad = packed
      .withColumn("tokens_before", $"seq_id" * 256 + $"seq_offset")
      .withColumn("expected", coalesce(
        sum($"n_tokens").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"shard").orderBy($"doc_id")
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter($"tokens_before" =!= $"expected").count()
    assert(bad == 0)
  }

  test("sequences respect the token budget boundary semantics") {
    import spark.implicits._
    // every offset lies inside the budget, and some sequence holds
    // more than one doc (the packing actually packs)
    assert(packed.filter($"seq_offset" < 0 || $"seq_offset" >= 256).count() == 0)
    val multiDoc = packed.groupBy($"shard", $"seq_id")
      .agg(count(lit(1)).as("n")).filter($"n" > 1).count()
    assert(multiDoc > 0, "no sequence packs more than one doc — vacuous budget")
  }

  test("packing is reproducible at different parallelism") {
    val a = packed.collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // perturb the parallelism the packing COMPUTATION runs at (window
    // shuffle layout + scan splits), not just the output layout
    val (p0, b0) = (spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.get("spark.sql.files.maxPartitionBytes"))
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try {
      val b = Packing.packSequences(spark, SF)
        .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", p0)
      spark.conf.set("spark.sql.files.maxPartitionBytes", b0)
    }
  }

  test("JSONL shard export: token-balanced within one doc, exhaustive, round-trip loses nothing") {
    import spark.implicits._
    import graft.pipeline.TrainingExport
    val docs = Tables.documents(spark, SF)
      .select($"doc_id", $"text", $"lang", $"source")
    val n = 8
    val assigned = TrainingExport.shardAssignments(docs, n)
      .select($"doc_id", $"n_tokens", $"shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(assigned.map(_._1).distinct.length == assigned.length)
    assert(assigned.length.toLong == docs.count(), "assignment must be exhaustive")
    val perShard = assigned.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(perShard.keySet.subsetOf((0L until n).toSet), s"ids: ${perShard.keySet}")
    val total = assigned.map(_._2).sum
    val stride = (total + n - 1) / n
    val maxDoc = assigned.map(_._2).max
    // every shard within one document of the stride target
    perShard.foreach { case (s, t) =>
      assert(t <= stride + maxDoc, s"shard $s overweight: $t vs stride $stride")
    }
    // the written export round-trips: census ≡ assignment-side census
    val census = TrainingExport.exportJsonl(spark, SF, n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = assigned.groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (s, g) => (s, g.length.toLong, g.map(_._2).sum) }
    assert(census.map(c => (c._1, c._2, c._3)) == expected,
      s"round-trip drift: $census vs $expected")
  }
}
