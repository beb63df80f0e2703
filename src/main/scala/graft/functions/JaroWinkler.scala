package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity, the
  * entity-resolution staple for short identifier strings (names,
  * titles, SKUs). Spark ships levenshtein/soundex but no Jaro
  * family, and a Scala UDF would fall out of whole-stage codegen on
  * the candidate-join hot path — so, like lev_bounded, the heavy
  * loop lives in a static helper the generated code calls directly.
  *
  * Definition (the standard one, verified value-identical to the
  * DuckDB oracle function on known vectors and boundary probes):
  *   - matches m within window ⌊max(|a|,|b|)/2⌋−1, greedy
  *     first-unclaimed left-to-right;
  *   - transpositions t = ⌊mismatched matched positions / 2⌋;
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3; 0 if either side is
  *     empty or m = 0 (NOT 1 for two empties — both engines return 0);
  *   - winkler boost only above 0.7: jw = jaro + ℓ·0.1·(1−jaro)
  *     with ℓ = common prefix capped at 4.
  *
  * Comparisons are over java chars (UTF-16 units), identical to
  * DuckDB's code-point semantics for all BMP text — same contract as
  * lev_bounded (functions/LevBounded.scala).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (STRING, STRING), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(JaroWinkler.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      s"${ev.value} = graft.functions.JaroWinkler.compute($c1, $c2);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static so generated code calls it without virtual dispatch. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val c = a.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && b.charAt(j) == c) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatched positions between the two matched subsequences
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val pMax = math.min(4, math.min(la, lb))
    while (prefix < pMax && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
