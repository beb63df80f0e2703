package graft.tools

import graft.Graft
import graft.operators.{Chunking, Packing}
import org.apache.spark.sql.functions._

/** Wall-clock instrumentation for the chunk→pack composition at
  * ScaleGen'd scale factors (SCALING.md §Measured scale-up) — the
  * context-window + sequence-assembly prep path a pretraining or RAG
  * pipeline runs last. Stage accounting mirrors [[CurationScale]]:
  * the pack pass re-runs chunking (semi-join composition, nothing
  * cached), so `pack_cum_sec` is cumulative-through-stage and the
  * marginal pack cost is pack_cum − chunk. Chunking is a zero-shuffle
  * per-row generator (PlanAuditSpec pins that); packing adds the one
  * shard shuffle of scalar (key, n_tokens) rows — so the composition
  * should scale like a scan plus one scalar exchange.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ChunkPackScale <sfDir>
  */
object ChunkPackScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.env("SPARK_GRAFT_SF_DIR"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = Graft.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-chunkpack-scale")
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES").foreach { v =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      spark.conf.set("spark.sql.files.openCostInBytes", "1m")
    }
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def chunks = Chunking.chunkDocuments(
      graft.Tables.documents(spark, dir), window = 64, stride = 48)
    def packed = Packing.packUnits(
      chunks.select($"doc_id", $"chunk_idx", $"n_tokens"),
      Seq("doc_id", "chunk_idx"), "n_tokens", budget = 256, shards = 32)

    packed.count() // JVM/codegen warmup — timings measure the operator

    val t0 = System.nanoTime()
    val nChunks = chunks.count()
    val tChunk = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val row = packed
      .agg(count(lit(1)), countDistinct($"shard", $"seq_id"),
        sum($"n_tokens")).head()
    val (nPacked, nSeqs, nTokens) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    val tPack = (System.nanoTime() - t1) / 1e9

    println(f"""{"metric":"chunkpack_scale","sf_dir":"$dir","chunks":$nChunks,"chunk_sec":$tChunk%.2f,"packed_units":$nPacked,"sequences":$nSeqs,"tokens":$nTokens,"pack_cum_sec":$tPack%.2f}""")
    spark.stop()
  }
}
