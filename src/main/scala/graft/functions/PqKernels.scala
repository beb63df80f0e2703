package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels. The column-API PQ pipeline
  * materializes m·K sub-distance columns plus least/CASE argmin
  * chains per row — hundreds of fat expressions whose codegen cost
  * (and, past the 64KB method budget, interpreted-fallback plan
  * size) dominates the actual flops. These kernels compute the same
  * table / codes / ADC sum in tight primitive loops, one call per
  * row, so the corpus scan carries exactly one expression.
  *
  * Every fp op preserves the column formulation bit-for-bit —
  * sequential-fold dots, ds = sq/(nrm·nrm) + ‖c‖² − (2·dot)/nrm in
  * that association order, first-match argmin with Double.compare
  * `least` semantics, ascending-m ADC sum — so the generated DuckDB
  * oracles (Similarity.pqTopKSql and friends) stay hash-exact.
  * Cross-checked against the staged column form in SimilaritySpec.
  */
object PqKernels {

  /** [m][codes][sub] float books from a foldable nested-array
    * literal (builder-time conversion — the books are plan
    * constants, never a per-row child).
    */
  def parseBooks(v: Any): Seq[Seq[Seq[Float]]] = {
    val outer = v.asInstanceOf[ArrayData]
    (0 until outer.numElements()).map { mi =>
      val mid = outer.getArray(mi)
      (0 until mid.numElements()).map { j =>
        val inner = mid.getArray(j)
        (0 until inner.numElements()).map(inner.getFloat)
      }
    }
  }

  /** Σ aᵢ·bᵢ sequential double fold — same op order as VecDot. */
  @inline private def dotSlice(e: ArrayData, off: Int, c: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) {
      acc += e.getFloat(off + i).toDouble * c(i).toDouble
      i += 1
    }
    acc
  }

  final class Books(bk: Seq[Seq[Seq[Float]]]) extends Serializable {
    val m: Int = bk.length
    val codes: Int = bk.head.length
    val sub: Int = bk.head.head.length
    /** flat [m*codes] subvectors */
    val flat: Array[Array[Float]] =
      bk.flatMap(_.map(_.toArray)).toArray
    /** ‖c‖² per entry, left-folded over the floats in kernel order. */
    val c2: Array[Double] = flat.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
      acc
    }

    /** The m·codes sub-distance table of one embedding:
      * ds[mi*codes+j] = (sq_mi/(nrm·nrm) + c2) − ((2·dot(s_mi,c))/nrm).
      */
    def dtable(e: ArrayData): Array[Double] = {
      var n2 = 0.0
      val dim = e.numElements()
      var i = 0
      while (i < dim) {
        val v = e.getFloat(i).toDouble
        n2 += v * v
        i += 1
      }
      val nrm = math.sqrt(n2)
      val out = new Array[Double](m * codes)
      var mi = 0
      while (mi < m) {
        val off = mi * sub
        // sq_mi via the same slice fold
        var sq = 0.0
        var k = 0
        while (k < sub) {
          val v = e.getFloat(off + k).toDouble
          sq += v * v
          k += 1
        }
        var j = 0
        while (j < codes) {
          val idx = mi * codes + j
          out(idx) = (sq / (nrm * nrm) + c2(idx)) -
            ((2.0 * dotSlice(e, off, flat(idx))) / nrm)
          j += 1
        }
        mi += 1
      }
      out
    }

    /** First-match argmin per subspace over [[dtable]] — identical
      * to the least(...)-chain + ascending CASE selection (ties take
      * the smallest j; `<` keeps the earlier index, matching
      * Double.compare least semantics on non-NaN inputs).
      */
    def encode(e: ArrayData): Array[Int] = {
      val ds = dtable(e)
      val out = new Array[Int](m)
      var mi = 0
      while (mi < m) {
        var bestJ = 0
        var best = ds(mi * codes)
        var j = 1
        while (j < codes) {
          val d = ds(mi * codes + j)
          if (d < best) { best = d; bestJ = j }
          j += 1
        }
        out(mi) = bestJ
        mi += 1
      }
      out
    }
  }

  def dtableArray(books: Books, e: ArrayData): ArrayData =
    new GenericArrayData(books.dtable(e))

  def encodeArray(books: Books, e: ArrayData): ArrayData =
    new GenericArrayData(books.encode(e))

  /** ADC: Σ_m dtable[m*codes + code_m], ascending m (the
    * reduceLeft(+) order of the column form).
    */
  def adc(codesArr: ArrayData, dtab: ArrayData): Double = {
    val m = codesArr.numElements()
    val codes = dtab.numElements() / m
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      acc += dtab.getDouble(mi * codes + codesArr.getInt(mi))
      mi += 1
    }
    acc
  }
}

abstract class PqBookExpression extends UnaryExpression {
  def bookSeq: Seq[Seq[Seq[Float]]]
  @transient protected lazy val books = new PqKernels.Books(bookSeq)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.sql}")
  }
}

/** `pq_dtable(embedding, books) -> array<double>` (m·codes ADC
  * lookup table; the books argument is builder-extracted, not a
  * runtime child).
  */
case class PqDTable(child: Expression, bookSeq: Seq[Seq[Seq[Float]]])
    extends PqBookExpression {
  override def prettyName: String = "pq_dtable"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqKernels.dtableArray(books, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, classOf[PqKernels.Books].getName)
    nullSafeCodeGen(ctx, ev, c =>
      code"${ev.value} = graft.functions.PqKernels.dtableArray($ref, $c);".toString)
  }

  override protected def withNewChildInternal(newChild: Expression): PqDTable =
    copy(child = newChild)
}

/** `pq_encode(embedding, books) -> array<int>` (per-subspace argmin
  * codes).
  */
case class PqEncode(child: Expression, bookSeq: Seq[Seq[Seq[Float]]])
    extends PqBookExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqKernels.encodeArray(books, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, classOf[PqKernels.Books].getName)
    nullSafeCodeGen(ctx, ev, c =>
      code"${ev.value} = graft.functions.PqKernels.encodeArray($ref, $c);".toString)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc(codes array<int>, dtable array<double>) -> double`. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (ARRAY<INT>, ARRAY<DOUBLE>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      code"${ev.value} = graft.functions.PqKernels.adc($a, $b);".toString)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}
