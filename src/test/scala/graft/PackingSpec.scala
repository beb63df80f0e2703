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
}
