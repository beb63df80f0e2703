package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Surrogate-key assignment. The reference does `range(1, n+1)` on the
  * driver (task.py:100) — fine for 7,787 rows, fatal at 100 TB. Two
  * distributed strategies:
  *
  *  - [[ordered]]: `row_number` over a global sort. Deterministic and
  *    oracle-reproducible, but funnels through one partition for the
  *    window — reserve it for POST-AGGREGATION dimensions (vocab,
  *    personnel) that are orders of magnitude smaller than the fact.
  *  - [[scalable]]: partition-offset `zipWithIndex` — one tiny O(P)
  *    count pass, then ids assigned partition-locally with no global
  *    shuffle. Ids are dense 1..N but ordering follows the incoming
  *    partitioning; pair with a prior `repartitionByRange` when a
  *    sorted id space is required.
  */
object SurrogateKey {

  def ordered(df: DataFrame, orderCol: String, idCol: String): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(col(orderCol))).cast(LongType))

  def scalable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
