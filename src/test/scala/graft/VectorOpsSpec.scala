package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  test("native vec_dot matches the HOF fold bit-for-bit on real embeddings") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, SF)
    val diff = emb.select(
        Similarity.dotCol($"embedding", $"embedding").as("native"),
        Similarity.dotColHof($"embedding", $"embedding").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diff == 0)
  }

  test("native vec_cosine matches dot/norm composition on real embeddings") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, SF).limit(100)
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("ea"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("eb"))
    val rows = a.crossJoin(b).filter($"ia" < $"ib")
      .select(Similarity.cosineCol($"ea", $"eb").as("fused"),
        (Similarity.dotColHof($"ea", $"eb") /
          (sqrt(Similarity.dotColHof($"ea", $"ea")) *
            sqrt(Similarity.dotColHof($"eb", $"eb")))).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("kernels run inside whole-stage codegen") {
    import spark.implicits._
    val plan = Tables.embeddings(spark, SF)
      .select(Similarity.cosineCol($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }
}
