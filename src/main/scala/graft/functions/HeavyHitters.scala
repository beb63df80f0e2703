package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al. 2005) top-k heavy hitters as a native
  * Catalyst aggregate — the one-pass, bounded-memory answer to "what
  * are the most frequent keys in 100 TB" where an exact groupBy would
  * shuffle the full key space. The sketch holds `capacity` counters
  * (O(capacity) memory per partition regardless of input size), the
  * map-side partial aggregate streams each partition once, and the
  * shuffle moves one serialized sketch per partition instead of one
  * row per distinct key.
  *
  * Guarantees (the standard SpaceSaving bounds, preserved under the
  * mergeable-summaries merge of Agarwal et al. 2013):
  *  - est ≥ true_count          (never under-counts)
  *  - est − err ≤ true_count    (err bounds the over-count)
  *  - any key with true_count > N/capacity is present in the sketch.
  * With capacity ≥ the number of distinct keys nothing ever evicts,
  * err stays 0 and the result is EXACT — which is how the DuckDB
  * gate checks it; the error bounds are spec-checked under small
  * capacities.
  *
  * SQL: `ss_topk(key, k, capacity)` (k, capacity constant) → sorted
  * array<struct<key, est, err>> — est desc, err asc, key asc, length
  * ≤ k. Key type: BIGINT or STRING.
  */
case class SpaceSavingTopK(
    child: Expression,
    kExpr: Expression,
    capExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Buffer] {

  import SpaceSavingTopK.Buffer

  private lazy val k = kExpr.eval(null).asInstanceOf[Number].intValue()
  private lazy val capacity = capExpr.eval(null).asInstanceOf[Number].intValue()
  private lazy val isString = child.dataType == StringType

  override def children: Seq[Expression] = Seq(child, kExpr, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", child.dataType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType && child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ss_topk key must be BIGINT or STRING, got ${child.dataType.sql}")
    else if (!kExpr.foldable || !capExpr.foldable)
      TypeCheckResult.TypeCheckFailure("ss_topk k and capacity must be constants")
    else (kExpr.eval(null), capExpr.eval(null)) match {
      case (kv: Number, cv: Number) if kv.intValue() >= 1 && cv.intValue() >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (_: Number, _: Number) =>
        TypeCheckResult.TypeCheckFailure(
          "ss_topk k and capacity must be positive")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "ss_topk k and capacity must be numeric constants")
    }

  override def createAggregationBuffer(): Buffer = new Buffer

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may alias a reused scan buffer — copy to a JVM
      // String key; Long boxes are immutable already
      val key: Any = if (isString) v.asInstanceOf[UTF8String].toString else v
      buf.offer(key, 1L, 0L, capacity)
    }
    buf
  }

  /** Mergeable-summaries rule: pointwise sums, where a key absent
    * from a FULL sketch may have been evicted with count up to that
    * sketch's min — add (min, min) for it; a non-full sketch has
    * truly never seen the key (add nothing). Then trim to capacity.
    */
  override def merge(a: Buffer, b: Buffer): Buffer = {
    val minA = if (a.m.size >= capacity) a.minEst else 0L
    val minB = if (b.m.size >= capacity) b.minEst else 0L
    val out = new Buffer
    (a.m.keySet ++ b.m.keySet).foreach { key =>
      val (ca, ea) = a.m.getOrElse(key, (minA, minA))
      val (cb, eb) = b.m.getOrElse(key, (minB, minB))
      out.m.put(key, (ca + cb, ea + eb))
    }
    out.trim(capacity, SpaceSavingTopK.keyOrd(isString))
    out
  }

  override def eval(buf: Buffer): Any = {
    val ord = SpaceSavingTopK.keyOrd(isString)
    val top = buf.m.toSeq
      .sortWith { case ((k1, (c1, e1)), (k2, (c2, e2))) =>
        if (c1 != c2) c1 > c2
        else if (e1 != e2) e1 < e2
        else ord.lt(k1, k2)
      }
      .take(k)
    new GenericArrayData(top.map { case (key, (c, e)) =>
      val keyOut: Any = if (isString) UTF8String.fromString(key.asInstanceOf[String]) else key
      new GenericInternalRow(Array[Any](keyOut, c, e))
    })
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(isString)
    out.writeInt(buf.m.size)
    buf.m.foreach { case (key, (c, e)) =>
      if (isString) {
        // length-prefixed raw UTF-8, not writeUTF — modified-UTF-8
        // caps at 65535 bytes and long-text string keys exceed it
        val b = key.asInstanceOf[String]
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b)
      } else out.writeLong(key.asInstanceOf[Long])
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val str = in.readBoolean()
    val n = in.readInt()
    val buf = new Buffer
    var i = 0
    while (i < n) {
      val key: Any = if (str) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
      } else in.readLong()
      val c = in.readLong(); val e = in.readLong()
      buf.m.put(key, (c, e))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren(0), kExpr = newChildren(1), capExpr = newChildren(2))
  override def prettyName: String = "ss_topk"
}

object SpaceSavingTopK {

  /** counter map: key → (est, err). Kept deliberately dumb — a plain
    * hash map with an O(n) min scan on eviction. Eviction only
    * happens once the map is at capacity, and capacity is small by
    * construction (it IS the memory bound); a heap would save the
    * scan but complicate merge.
    */
  final class Buffer {
    val m: mutable.HashMap[Any, (Long, Long)] = mutable.HashMap.empty

    def minEst: Long = if (m.isEmpty) 0L else m.valuesIterator.map(_._1).min

    def offer(key: Any, inc: Long, err: Long, capacity: Int): Unit =
      m.get(key) match {
        case Some((c, e)) => m.update(key, (c + inc, e + err))
        case None if m.size < capacity => m.put(key, (inc, err))
        case None =>
          // evict the deterministic min (est asc, err desc puts the
          // most-certainly-small counter first, key order last)
          val (mk, (mc, _)) = m.minBy { case (k2, (c2, e2)) =>
            (c2, -e2, hashableKey(k2))
          }(Ordering.Tuple3(Ordering.Long, Ordering.Long, Ordering.String))
          m.remove(mk)
          m.put(key, (mc + inc, mc + err))
      }

    /** keep the `capacity` largest-est entries (deterministic ties). */
    def trim(capacity: Int, ord: Ordering[Any]): Unit =
      if (m.size > capacity) {
        val keep = m.toSeq.sortWith { case ((k1, (c1, e1)), (k2, (c2, e2))) =>
          if (c1 != c2) c1 > c2
          else if (e1 != e2) e1 < e2
          else ord.lt(k1, k2)
        }.take(capacity)
        m.clear(); keep.foreach { case (key, v) => m.put(key, v) }
      }

    private def hashableKey(k: Any): String = k match {
      case s: String => s
      case l: Long => f"$l%020d" // zero-padded: string order = numeric order for non-negatives
      case other => String.valueOf(other)
    }
  }

  def keyOrd(isString: Boolean): Ordering[Any] =
    if (isString) Ordering.by[Any, String](_.asInstanceOf[String])
    else Ordering.by[Any, Long](_.asInstanceOf[Long])
}
