package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import java.nio.ByteBuffer

/** Deterministic uniform sampling as a mergeable sketch: keep the `k` ids
  * with the smallest `splitmix64(id)` values (a bottom-k / KMV sketch).
  *
  * Why this shape for a 100 TB pipeline:
  *  - memory is O(k) per partial aggregate — never a collect_list of the
  *    partition;
  *  - partials merge associatively and commutatively, so the result is
  *    IDENTICAL under any partitioning / task order (spec-verified) —
  *    reproducible sampling for training-data splits;
  *  - the "randomness" is a fixed hash of the id, so re-running the job
  *    reselects the same sample (no seed plumbing).
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[Long, Long]] {

  require(k >= 1, s"bottom-k sample size must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expects a bigint id column, got ${child.dataType}")

  /** splitmix64 finalizer — a well-mixed deterministic 64-bit hash. */
  @inline private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  override def createAggregationBuffer(): java.util.TreeMap[Long, Long] =
    new java.util.TreeMap[Long, Long]()

  override def update(buf: java.util.TreeMap[Long, Long], input: InternalRow): java.util.TreeMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      val h = mix(id)
      if (buf.size < k) buf.put(h, id)
      else if (h < buf.lastKey) { buf.remove(buf.lastKey); buf.put(h, id) }
    }
    buf
  }

  override def merge(buf: java.util.TreeMap[Long, Long], other: java.util.TreeMap[Long, Long]): java.util.TreeMap[Long, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (buf.size < k) buf.put(e.getKey, e.getValue)
      else if (e.getKey < buf.lastKey) { buf.remove(buf.lastKey); buf.put(e.getKey, e.getValue) }
    }
    buf
  }

  /** Sampled ids ordered by their hash (stable, deterministic). */
  override def eval(buf: java.util.TreeMap[Long, Long]): Any =
    new GenericArrayData(buf.values().toArray(Array.empty[java.lang.Long]).map(_.longValue()))

  override def serialize(buf: java.util.TreeMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.forEach((h, v) => { bb.putLong(h); bb.putLong(v) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.put(bb.getLong, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object BottomKSample {
  /** Deterministic bottom-k sample of a bigint id column. */
  def bottom_k_sample(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      BottomKSample(GraftSqlBridge.expression(c), k).toAggregateExpression())
}
