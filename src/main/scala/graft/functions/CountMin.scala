package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min sketch frequency aggregate + probe, the heavy-hitter tier
  * of the sketch family (HyperLogLog counts distincts, this estimates
  * per-key frequencies).
  *
  * The sketch is d=4 rows x w=2048 int64 counters (64 KiB): update
  * increments one counter per row (independent xxhash64 seeds), merge is
  * elementwise addition — associative and commutative, so map-side
  * partial aggregation holds and a 100 TB frequency profile moves 64 KiB
  * per partition instead of a per-key count table. Estimates are
  * min-over-rows: always >= the true count, with overshoot ~ 2N/w per
  * row (probability bounds via the d independent rows). Deterministic
  * for fixed input (fixed seeds), so the test suite pins exact
  * reproducibility, the >= bound, and the error envelope; the DuckDB
  * oracle rebuilds the counter table bit-exactly by emulating
  * XXH64.hashLong in HUGEINT SQL (operators/CmsOracle.scala).
  */
case class CountMinAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import CountMin._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  // The probe (CountMinLookup) always hashes its key as LongType; a
  // sketch built over any other type would answer probes with
  // meaningless estimates and no error. Pin build == probe type at
  // analysis time.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"count_min expects a bigint key (the probe " +
            s"hashes as bigint; build and probe must hash identically), " +
            s"got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var r = 0
      while (r < D) {
        val i = r * W + idx(XxHash64Function.hash(v, child.dataType, Seed + r))
        buf(i) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) {
      b1(i) += b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(D * W * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](D * W)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression)
      : CountMinAgg = copy(child = newChild)
}

/** Probe: estimated frequency of a long key in the serialized sketch —
  * min over the d row counters the key hashes to. Codegen'd as one
  * static call so probe projections stay inside whole-stage codegen.
  */
case class CountMinLookup(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"count_min_lookup expects (binary, bigint), " +
            s"got $other")
    }

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CountMin.lookupLong(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (s, k) => s"graft.functions.CountMin.lookupLong($s, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CountMinLookup = copy(newLeft, newRight)
}

object CountMin {
  final val D = 4
  final val W = 2048 // power of two: index = hash & (W-1)
  final val Seed = 42L

  def idx(h: Long): Int = (h & (W - 1)).toInt

  /** Shared by interpreted eval and codegen (see SimHash64 for why a
    * static call beats inline emission).
    */
  def lookupLong(bytes: Array[Byte], key: Long): Long = {
    val lb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer()
    var est = Long.MaxValue
    var r = 0
    while (r < D) {
      val c = lb.get(r * W +
        idx(XxHash64Function.hash(key, LongType, Seed + r)))
      if (c < est) est = c
      r += 1
    }
    est
  }

  /** Column entry points. */
  def agg(key: Column): Column =
    Bridge.column(CountMinAgg(Bridge.expression(key)).toAggregateExpression())

  def lookup(sketch: Column, key: Column): Column =
    Bridge.column(CountMinLookup(Bridge.expression(sketch),
      Bridge.expression(key)))
}
