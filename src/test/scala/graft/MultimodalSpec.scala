package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode pipeline is deterministic and schema-complete") {
    val a = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, SF))
      .collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, SF))
      .collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.map(_.doc_id).sameElements(b.map(_.doc_id)))
    a.zip(b).foreach { case (x, y) =>
      assert(x.feature.sameElements(y.feature), s"doc ${x.doc_id} nondeterministic")
    }
  }

  test("features carry real metadata: sizes, frames, byte stats") {
    val rows = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, SF)).collect()
    rows.foreach { m =>
      assert(m.n_frames == m.n_bytes / 256 + 1)
      assert(m.mean_byte > 0 && m.mean_byte < 256)
      assert(m.feature.length == 8)
      assert(Set("png", "jpeg", "wav").contains(m.fmt))
    }
  }

  test("resize emits fixed-geometry payloads, deterministic, metadata consistent") {
    val a = Multimodal.resize(Multimodal.mediaTable(spark, SF), side = 8)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.resize(Multimodal.mediaTable(spark, SF), side = 8)
      .collect().sortBy(_.doc_id)
    assert(a.length == 500)
    a.foreach { m =>
      assert(m.payload.length == 64 && m.n_bytes == 64)
    }
    a.zip(b).foreach { case (x, y) =>
      assert(x.payload.sameElements(y.payload), s"doc ${x.doc_id}")
    }
  }

  test("payload column prunes away for metadata-only projections") {
    val scan = Multimodal.mediaTable(spark, SF)
      .select("doc_id", "fmt")
      .queryExecution.executedPlan.toString
    assert(!scan.contains("payload"), s"payload not pruned:\n$scan")
  }
}
