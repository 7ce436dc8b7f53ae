package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** A self-contained Bloom filter as a (mergeable aggregate, probe
  * expression) PAIR — the crawl frontier's seen-set at 100 TB.
  *
  * Why graft owns this instead of a driver-side sketch: the filter is
  * BUILT distributed (per-partition partial bit arrays OR-merge — the
  * aggregate is associative/commutative like any partial agg), travels as
  * a 1-row binary column over a broadcast, and is PROBED inside
  * whole-stage codegen — the whole path stays declarative, nothing ever
  * collects to the driver. Both halves share one static kernel
  * ([[BloomKernel]]), so build and probe can never disagree on the
  * hashing scheme.
  *
  * Encoding: bytes[0..3] = k (number of probe hashes, big-endian),
  * bytes[4..] = the bit array; m = 8·(len−4) bits. The value hashed is a
  * 64-bit id — callers feed `xxhash64(url)` so string hashing rides
  * Spark's codegen'd built-in; the kernel derives k indexes by double
  * hashing (Kirsch-Mitzenmacher: g_i = h1 + i·h2 with h2 forced odd), the
  * standard construction with the standard FP guarantees.
  *
  * Sizing (caller-supplied, like any Bloom filter): m ≈ −n·ln(p)/ln(2)²,
  * k ≈ (m/n)·ln(2). `BloomFns.bloomParams` computes both from
  * (expectedItems, fpp).
  */
object BloomKernel {
  /** Second hash for double hashing — a finalizer mix of the input,
    * forced odd so every stride is a unit mod 2^64 (all k indexes
    * distinct with high probability).
    */
  def strideOf(h: Long): Long = {
    var x = h
    x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
    x = (x ^ (x >>> 29)) * 0xc4ceb9fe1a85ec53L
    (x ^ (x >>> 32)) | 1L
  }

  def set(bloom: Array[Byte], h: Long): Unit = {
    val k = ((bloom(0) & 0xff) << 24) | ((bloom(1) & 0xff) << 16) |
      ((bloom(2) & 0xff) << 8) | (bloom(3) & 0xff)
    val m = (bloom.length - 4).toLong * 8L
    val stride = strideOf(h)
    var i = 0
    var g = h
    while (i < k) {
      val idx = ((g % m) + m) % m
      bloom(4 + (idx >>> 3).toInt) = (bloom(4 + (idx >>> 3).toInt) | (1 << (idx & 7L).toInt)).toByte
      g += stride
      i += 1
    }
  }

  def probe(bloom: Array[Byte], h: Long): Boolean = {
    // malformed binaries (SQL users can pass any BinaryType): answer the
    // CONSERVATIVE "maybe" — downstream exact joins verify, so exactness
    // survives; crashing the query on a bad blob would not
    if (bloom.length < 5) return true
    val k = ((bloom(0) & 0xff) << 24) | ((bloom(1) & 0xff) << 16) |
      ((bloom(2) & 0xff) << 8) | (bloom(3) & 0xff)
    val m = (bloom.length - 4).toLong * 8L
    val stride = strideOf(h)
    var i = 0
    var g = h
    while (i < k) {
      val idx = ((g % m) + m) % m
      if ((bloom(4 + (idx >>> 3).toInt) & (1 << (idx & 7L).toInt)) == 0) return false
      g += stride
      i += 1
    }
    true
  }
}

/** Distributed Bloom-filter build: aggregates a bigint hash column into
  * the byte-array encoding above. Partials OR-merge, so the result is
  * identical under any partitioning.
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits >= 8 && numBits % 8 == 0, s"numBits must be a positive multiple of 8, got $numBits")
  require(numHashes >= 1 && numHashes <= 32, s"numHashes must be in [1,32], got $numHashes")
  require(numBits / 8 <= Int.MaxValue - 4, "bloom too large for one byte array")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expects a bigint hash column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = {
    val buf = new Array[Byte](4 + (numBits / 8).toInt)
    buf(0) = (numHashes >>> 24).toByte
    buf(1) = (numHashes >>> 16).toByte
    buf(2) = (numHashes >>> 8).toByte
    buf(3) = numHashes.toByte
    buf
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomKernel.set(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 4
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Probe: true if the bigint hash MAY be in the bloom (definitely-absent
  * is exact; present has the configured FP rate). Codegen'd through the
  * shared kernel.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"expects (bigint hash, binary bloom), got $l and $r")
    }

  override def nullSafeEval(h: Any, bloom: Any): Any =
    BloomKernel.probe(bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, bloom) =>
      s"${ev.value} = graft.functions.BloomKernel.probe($bloom, $h);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomFns {
  /** (numBits, numHashes) for an expected item count and FP rate — the
    * textbook optimum, bits rounded up to a byte multiple.
    */
  def bloomParams(expectedItems: Long, fpp: Double): (Long, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val m = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // one JVM byte array caps the filter at ~2 GB (~1.7e10 bits — ~1.8e9
    // items at fpp 0.01). Clamp instead of throwing: past the cap the
    // REALIZED fpp rises smoothly (more rows take the exact anti-join
    // path) but the result stays exact — a router must degrade, not die.
    val maxBits = (Int.MaxValue.toLong - 8) / 8 * 8 * 8
    val bits = math.min(((m + 7) / 8) * 8, maxBits)
    // k caps at the aggregate's [1,32] contract — a tiny fpp must degrade
    // (slightly higher realized fpp), not throw at plan time
    val k = math.min(32,
      math.max(1, math.round(bits.toDouble / expectedItems * math.log(2)).toInt))
    (bits, k)
  }

  /** Aggregate a bigint hash column into a Bloom filter sized for
    * (expectedItems, fpp).
    */
  def bloom_build(c: Column, expectedItems: Long, fpp: Double): Column = {
    val (bits, k) = bloomParams(expectedItems, fpp)
    GraftSqlBridge.column(
      BloomBuildAgg(GraftSqlBridge.expression(c), bits, k).toAggregateExpression())
  }

  /** True if the bigint hash may be in the bloom binary column. */
  def bloom_might_contain(hash: Column, bloom: Column): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(hash), GraftSqlBridge.expression(bloom)))
}
