package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: dynamic time warping distance between
  * two integer series (Sakoe & Chiba 1978; the Berndt & Clifford 1994
  * time-series-mining formulation), with per-cell cost |aᵢ − bⱼ| and
  * the standard three moves. The result is an exact BIGINT — every
  * cell of the DP is a sum of absolute integer differences, so no
  * merge-order or fp concern exists and the spec can pin values by
  * hand.
  *
  * Why an expression and not an operator: the distributed work is
  * producing the SERIES (per-key aggregates — domain-sized); warping
  * two bounded curves is per-row compute, exactly what whole-stage
  * codegen wants inlined. A Scala UDF here would fall out of codegen
  * on the pairwise-join hot path; like JaroWinkler/LevBounded the
  * O(n·m) loop lives in a static helper the generated code calls
  * directly, with O(min) rolling-row memory.
  */
case class Dtw(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dtw requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(Dtw.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      s"${ev.value} = graft.functions.Dtw.compute($c1, $c2);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Dtw = copy(left = newLeft, right = newRight)
}

object Dtw {

  /** Static so generated code calls it without virtual dispatch.
    * Rolling single-row DP: prev(j) = best cost ending at (i−1, j).
    * Empty-vs-empty is 0; empty-vs-nonempty has no warping path —
    * the conventional Σ|b| against an implicit zero alignment is NOT
    * defined by DTW, so like the textbook we return Long.MaxValue
    * only never: callers aggregate non-empty series; we define it as
    * the sum of the other side's magnitudes to stay total and
    * monotone (documented, mirrored in the spec's reference fold).
    */
  def compute(ua: ArrayData, ub: ArrayData): Long = {
    val n = ua.numElements()
    val m = ub.numElements()
    if (n == 0 && m == 0) return 0L
    if (n == 0) { var s = 0L; var j = 0
      while (j < m) { s += math.abs(ub.getLong(j)); j += 1 }; return s }
    if (m == 0) { var s = 0L; var i = 0
      while (i < n) { s += math.abs(ua.getLong(i)); i += 1 }; return s }
    val prev = new Array[Long](m)
    val cur = new Array[Long](m)
    var j = 0
    var acc = 0L
    while (j < m) { // first row: only horizontal moves
      acc += math.abs(ua.getLong(0) - ub.getLong(j))
      prev(j) = acc
      j += 1
    }
    var i = 1
    while (i < n) {
      val ai = ua.getLong(i)
      cur(0) = prev(0) + math.abs(ai - ub.getLong(0))
      j = 1
      while (j < m) {
        val best = math.min(cur(j - 1), math.min(prev(j), prev(j - 1)))
        cur(j) = best + math.abs(ai - ub.getLong(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m)
      i += 1
    }
    prev(m - 1)
  }
}
