package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: BANDED (Ukkonen) Levenshtein distance
  * with threshold k — returns the exact distance when it is ≤ k and
  * k+1 otherwise. The DP visits only the 2k+1 diagonal band, O(k·n)
  * instead of the built-in `levenshtein`'s O(n·m) full matrix — at
  * the PassJoin verify join's k=4 over 160-char prefixes that is
  * ~18× less arithmetic per candidate pair, and a row whose band
  * minimum exceeds k exits before scanning the rest of the matrix
  * (the common case: most candidates are far apart). k is folded at
  * resolution time (a constant, like the PQ codebooks), and the heavy
  * loop lives in a static helper the generated code calls — the
  * expression stays inside whole-stage codegen (LevBoundedSpec pins
  * it).
  *
  * Distances are over java chars (UTF-16 units): identical to the
  * built-in / DuckDB code-point semantics for all BMP text (any
  * alphabet the corpus carries); supplementary-plane characters
  * would count as 2. The gate corpus is BMP-only.
  */
case class LevBounded(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 0, s"lev_bounded: k must be ≥ 0, got $k")

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lev_bounded requires (STRING, STRING), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(LevBounded.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      s"${ev.value} = graft.functions.LevBounded.compute($c1, $c2, $k);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LevBounded = copy(left = newLeft, right = newRight)
}

object LevBounded {

  /** Banded DP; exact for distances ≤ k, returns k+1 past the bound.
    * Static so generated code calls it without virtual dispatch.
    */
  def compute(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (math.abs(la - lb) > k) return k + 1
    val big = k + 1
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= k) j else big; j += 1 }
    var i = 1
    while (i <= la) {
      val from = math.max(1, i - k)
      val to = math.min(lb, i + k)
      cur(0) = if (i <= k) i else big
      if (from > 1) cur(from - 1) = big // left band edge
      var rowMin = cur(if (from > 1) from - 1 else 0)
      j = from
      while (j <= to) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > big) v = big
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (to < lb) cur(to + 1) = big // right band edge for next row
      if (rowMin > k) return k + 1 // band exhausted — cannot recover
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(lb), big)
  }
}
