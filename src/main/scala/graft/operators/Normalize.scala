package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-value column normalization — the reference's core transform
  * (task.py:74-139): split a delimited string column into rows, trim,
  * drop empties/nulls. Stays fully inside whole-stage codegen; the
  * explode is a generator, not a shuffle, so it scales linearly with
  * input splits.
  */
object Normalize {

  /** Split `col` on `delim`, explode to one row per element, trim,
    * and keep non-empty values under `as`. Null inputs drop (matching
    * pandas explode + dropna); use [[splitTrimExplodeOuter]] to keep
    * them.
    */
  def splitTrimExplode(df: DataFrame, col: Column, delim: String, as: String): DataFrame =
    df.withColumn(as, explode(split(col, delim)))
      .withColumn(as, trim(new Column(as)))
      .filter(length(new Column(as)) > 0)

  /** Null-preserving variant (explode_outer) for audit paths where a
    * row must survive even with no values.
    */
  def splitTrimExplodeOuter(df: DataFrame, col: Column, delim: String, as: String): DataFrame =
    df.withColumn(as, explode_outer(split(col, delim)))
      .withColumn(as, trim(new Column(as)))
}
