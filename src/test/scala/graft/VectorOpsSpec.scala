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

  test("length mismatch fails loudly instead of truncating") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Similarity.cosineCol($"a", $"b")).collect()
    }
    // root cause may be wrapped by Spark's executor exception chain
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause).toList)
    assert(messages(e).exists(m => m != null && m.contains("length mismatch")))
  }

  test("zero-norm cosine is 0.0, not NaN") {
    import spark.implicits._
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val c = df.select(Similarity.cosineCol($"a", $"b")).collect()(0).getDouble(0)
    assert(c == 0.0)
  }

  test("kernels run inside whole-stage codegen") {
    import spark.implicits._
    val plan = Tables.embeddings(spark, SF)
      .select(Similarity.cosineCol($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }
}
