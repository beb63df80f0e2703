package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native coarse-quantizer assignment kernel for the IVF family
  * (SemDedup / ivfTopK / ivfPqTopK).
  *
  * The previous formulation folded each centroid into the plan as a
  * 64-float literal array and computed one `vec_cosine` column per
  * centroid plus a greatest/CASE argmax chain. That is the right
  * zero-exchange shape, but the expression TREE is O(nlist·dim)
  * literals and O(nlist) chained CASE branches — Janino's constant
  * pool and 64 KB method budget kill codegen well before the
  * nlist ≈ 10⁴–10⁵ that SemDeDup (Abbas et al. 2023) prescribes for
  * web-scale corpora, and an interpreted fallback of that plan is
  * even worse. Here the whole codebook is ONE reference object on
  * the generated class (`ctx.addReferenceObj`, same device as
  * PqKernels' books), so the scan carries exactly one expression
  * regardless of nlist and the per-row cost is the unavoidable
  * nlist·dim flops in a tight primitive loop.
  *
  * Exactness contract (what keeps the DuckDB oracles hash-exact):
  * every cosine runs the identical IEEE ops in the identical order
  * as [[VecCosine]] — per-element double promotion, sequential
  * accumulation ascending i, denom = sqrt(‖a‖²)·sqrt(‖b‖²), zero
  * denom defined as cosine 0.0 — and selection orders by
  * (cos DESC, centroid id ASC), the same tie-break as the
  * row_number() the oracles use. The embedding's norm is folded once
  * per row and each centroid's norm once at construction; both folds
  * visit elements in the same ascending order as the fused
  * [[VecCosine]] loop, so the doubles agree bit-for-bit.
  */
object CellAssign {

  /** The quantizer: centroid vectors + their (strictly ascending)
    * cell ids + how many nearest cells to emit. Built once at
    * expression construction, shipped as a task-serialized reference
    * object — never a per-row child.
    */
  final class Cells(centSeq: Seq[Seq[Float]], idSeq: Seq[Long], val n: Int)
      extends Serializable {
    require(centSeq.nonEmpty, "nearest_cells: empty centroid set")
    require(centSeq.length == idSeq.length,
      s"nearest_cells: ${centSeq.length} centroids vs ${idSeq.length} ids")
    require(n >= 1, s"nearest_cells: n must be >= 1, got $n")
    // ascending ids make position-order ties == id-order ties, which
    // is the (cos DESC, cell_id ASC) contract the oracles re-derive
    require(idSeq.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "nearest_cells: centroid ids must be strictly ascending")

    val cents: Array[Array[Float]] = centSeq.map(_.toArray).toArray
    val ids: Array[Long] = idSeq.toArray
    /** ‖c‖² per centroid, left-folded ascending — the same op order
      * as the nb accumulator inside [[VecCosine]]'s fused loop.
      */
    val c2: Array[Double] = cents.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
      acc
    }

    /** Ids of the min(n, nlist) nearest centroids by
      * (cos DESC, id ASC). Partial insertion selection — O(nlist·n),
      * and n is 1 (assignment) or nprobe (queries), never nlist.
      */
    def nearest(e: ArrayData): ArrayData = {
      // one primitive copy up front: the nlist×dim hot loop then runs
      // over float[] (JIT-vectorizable) instead of nlist×dim virtual
      // ArrayData.getFloat calls — same elements, same op order, so
      // the doubles are unchanged
      val ev = e.toFloatArray()
      val dim = ev.length
      var na = 0.0
      var i = 0
      while (i < dim) {
        val v = ev(i).toDouble
        na += v * v
        i += 1
      }
      val sna = math.sqrt(na)
      val k = math.min(n, cents.length)
      val topCos = new Array[Double](k)
      val topPos = new Array[Int](k)
      var filled = 0

      // strict > : ties keep the earlier (lower-id) centroid.
      // Candidates MUST arrive in ascending ci for that to hold.
      def offer(cos: Double, ci: Int): Unit = {
        var idx = 0
        while (idx < filled && cos <= topCos(idx)) idx += 1
        if (idx < k) {
          var s = math.min(filled, k - 1)
          while (s > idx) {
            topCos(s) = topCos(s - 1); topPos(s) = topPos(s - 1)
            s -= 1
          }
          topCos(idx) = cos
          topPos(idx) = ci
          if (filled < k) filled += 1
        }
      }

      @inline def cosOf(dot: Double, ci: Int): Double = {
        val denom = sna * math.sqrt(c2(ci))
        if (denom == 0.0) 0.0 else dot / denom
      }

      // 4 centroids per pass: four INDEPENDENT accumulator chains —
      // each dot is still its own sequential ascending-j fold, so
      // every per-centroid double is bit-identical to the scalar
      // loop; the unroll only buys instruction-level parallelism the
      // strict-order chain otherwise forbids
      var ci = 0
      while (ci + 4 <= cents.length) {
        val c0 = cents(ci); val c1 = cents(ci + 1)
        val c2v = cents(ci + 2); val c3 = cents(ci + 3)
        if (c0.length != dim || c1.length != dim ||
            c2v.length != dim || c3.length != dim)
          throw VectorBinaryExpression.lengthMismatch("nearest_cells", dim, c0.length)
        var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
        var j = 0
        while (j < dim) {
          val v = ev(j).toDouble
          d0 += v * c0(j).toDouble
          d1 += v * c1(j).toDouble
          d2 += v * c2v(j).toDouble
          d3 += v * c3(j).toDouble
          j += 1
        }
        offer(cosOf(d0, ci), ci)
        offer(cosOf(d1, ci + 1), ci + 1)
        offer(cosOf(d2, ci + 2), ci + 2)
        offer(cosOf(d3, ci + 3), ci + 3)
        ci += 4
      }
      while (ci < cents.length) {
        val c = cents(ci)
        if (c.length != dim)
          throw VectorBinaryExpression.lengthMismatch("nearest_cells", dim, c.length)
        var dot = 0.0
        var j = 0
        while (j < dim) {
          dot += ev(j).toDouble * c(j).toDouble
          j += 1
        }
        offer(cosOf(dot, ci), ci)
        ci += 1
      }
      val out = new Array[Long](filled)
      var o = 0
      while (o < filled) { out(o) = ids(topPos(o)); o += 1 }
      new GenericArrayData(out)
    }
  }

  /** Codegen/eval entry point (generated code can only call public
    * static-reachable members).
    */
  def nearestArray(cells: Cells, e: ArrayData): ArrayData = cells.nearest(e)

  /** [nlist][dim] float centroids from a foldable nested-array
    * literal (builder-time conversion).
    */
  def parseCents(v: Any): Seq[Seq[Float]] = {
    val outer = v.asInstanceOf[ArrayData]
    (0 until outer.numElements()).map { ci =>
      val inner = outer.getArray(ci)
      (0 until inner.numElements()).map(inner.getFloat)
    }
  }

  def parseIds(v: Any): Seq[Long] = {
    val arr = v.asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(arr.getLong)
  }
}

/** `nearest_cells(embedding array<float>, centroids, ids, n) ->
  * array<bigint>` — ids of the n nearest centroids by
  * (cos DESC, id ASC). centroids/ids/n are builder-extracted
  * constants, not runtime children.
  */
case class NearestCells(child: Expression, centSeq: Seq[Seq[Float]],
    idSeq: Seq[Long], n: Int) extends UnaryExpression {
  override def prettyName: String = "nearest_cells"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val cells = new CellAssign.Cells(centSeq, idSeq, n)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CellAssign.nearestArray(cells, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cells", cells, classOf[CellAssign.Cells].getName)
    nullSafeCodeGen(ctx, ev, c =>
      code"${ev.value} = graft.functions.CellAssign.nearestArray($ref, $c);".toString)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}
