package graft

import graft.operators.{Chunking, Dedup}
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  private val W = 64
  private val S = 48

  test("every token is covered; consecutive chunks overlap by window − stride") {
    import spark.implicits._
    val docs = Tables.documents(spark, SF).select($"doc_id", $"text")
    val nTok = docs.select($"doc_id", size(Dedup.tokensCol($"text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Chunking.chunkDocuments(docs, W, S).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = nTok(id)
      val expect = (n - 1) / S + 1
      assert(cs.length == expect, s"doc $id: ${cs.length} chunks, want $expect")
      val byIdx = cs.sortBy(_._2)
      assert(byIdx.map(_._2).toSeq == (0L until expect.toLong), s"doc $id gaps")
      // chunk i covers tokens [i·stride, min(i·stride + window, n))
      byIdx.foreach { c =>
        val want = math.min(W.toLong, n - S * c._2)
        assert(c._3 == want, s"doc $id chunk ${c._2}: ${c._3}, want $want")
      }
      // coverage: the last chunk reaches the final token
      assert(S * (expect - 1) + byIdx.last._3 >= n, s"doc $id tail uncovered")
    }
  }

  test("chunks reassemble the document: stride-prefixes + final chunk = token stream") {
    import spark.implicits._
    val docs = Tables.documents(spark, SF).select($"doc_id", $"text").limit(50)
    val toks = docs.select($"doc_id", Dedup.tokensCol($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    val chunks = Chunking.chunkDocuments(docs, W, S).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
    chunks.foreach { case (id, cs) =>
      val ordered = cs.sortBy(_._2).map(_._3.split(" ").toSeq)
      val rebuilt = (ordered.dropRight(1).flatMap(_.take(S)) ++ ordered.last).toSeq
      assert(rebuilt == toks(id), s"doc $id does not reassemble")
    }
  }
}
