package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** HyperLogLog distinct-count sketch as a `TypedImperativeAggregate` —
  * the custom-aggregate tier of SURVEY.md §7.4 (a "novel sketch"
  * operator): a fixed 4 KiB register buffer per group, associative
  * elementwise-max merge, so partial aggregation and AQE work unchanged
  * and a 100 TB aggregation moves 4 KiB per group per partition instead
  * of the value set. p = 12 -> 4096 registers, standard error
  * 1.04/sqrt(4096) ~= 1.6%.
  *
  * Spark ships approx_count_distinct (HLL++, with bias tables); this
  * implementation exists to demonstrate the sketch-aggregate shape
  * end-to-end — xxhash64 -> register index from the top p bits, rank =
  * leading zeros of the remainder, harmonic-mean estimate with the
  * linear-counting small-range correction. Deterministic for fixed
  * input data (seed 42), so the test suite pins both the error bound
  * and exact reproducibility. FULLY oracle-checked since round 11: the
  * registers are hashLong-derived (rebuilt bit-exactly by
  * [[graft.operators.HllOracle]]'s HUGEINT XXH64 emulation) and the
  * estimate crosses the engine boundary through exact integer state
  * plus one deterministic int->double conversion and division.
  *
  * Three tiers share ONE register codec (companion helpers):
  *   - [[HyperLogLog]]  value stream -> estimate (the original);
  *   - [[HllSketch]]    value stream -> 4 KiB register BLOB — the
  *     pre-aggregation form a sketch TABLE stores per dimension cell;
  *   - [[HllMergeAgg]]  register BLOBs -> merged BLOB — re-aggregate
  *     stored sketches to any coarser grouping WITHOUT re-scanning the
  *     corpus (the materialized-view rollup pattern), with
  *     `HyperLogLog.estimate(col)` decoding a BLOB to the count.
  * Because update and merge are the same register algebra, a two-level
  * sketch->merge rollup is BIT-IDENTICAL to one direct pass (pinned in
  * OperatorExtensionsSpec).
  */
case class HyperLogLog(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  import HyperLogLog._

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) updateRegisters(buf, v, child.dataType)
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    mergeRegisters(b1, b2)

  override def eval(buf: Array[Byte]): Any = estimateRegisters(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HyperLogLog =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression)
      : HyperLogLog = copy(child = newChild)
}

/** Value stream -> raw 4 KiB register blob (BinaryType). */
case class HllSketch(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  import HyperLogLog._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) updateRegisters(buf, v, child.dataType)
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    mergeRegisters(b1, b2)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression)
      : HllSketch = copy(child = newChild)
}

/** Register-blob stream -> merged register blob: the rollup aggregate
  * over a stored sketch table. Rejects non-binary input at analysis and
  * wrong-width blobs loudly at runtime (a truncated sketch silently
  * merged would under-count forever).
  */
case class HllMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  import HyperLogLog._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_merge expects a sketch BINARY, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val sk = v.asInstanceOf[Array[Byte]]
      if (sk.length != M)
        throw new IllegalArgumentException(
          s"graft_hll_merge: sketch has ${sk.length} registers, expected $M")
      mergeRegisters(buf, sk)
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    mergeRegisters(b1, b2)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression)
      : HllMergeAgg = copy(child = newChild)
}

object HyperLogLog {
  private[functions] val P = 12
  private[functions] val M = 1 << P
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)
  // Alpha * m^2 * 2^53 as one double constant: the raw estimate is this
  // divided by the EXACT integer N = sum_j 2^(53 - M_j) (max register
  // rank is 53 at p=12). One constant, one int->double conversion, one
  // IEEE division — every step deterministic, so the DuckDB oracle
  // reproduces the estimate bit-for-bit (HllOracle embeds this
  // constant's exact decimal image).
  private[graft] val RawNum: Double =
    Alpha * M.toDouble * M.toDouble * 9007199254740992.0 // 2^53

  private[functions] def updateRegisters(buf: Array[Byte], v: Any,
      dt: DataType): Unit = {
    val h = XxHash64Function.hash(v, dt, 42L)
    val idx = (h >>> (64 - P)).toInt
    // rank of the first set bit in the remaining 64-P bits (1-based);
    // the OR'd sentinel caps the rank when those bits are all zero
    val rank =
      java.lang.Long.numberOfLeadingZeros((h << P) | (1L << (P - 1))) + 1
    if (rank > buf(idx)) buf(idx) = rank.toByte
  }

  private[functions] def mergeRegisters(b1: Array[Byte], b2: Array[Byte])
      : Array[Byte] = {
    var i = 0
    while (i < M) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  /** Harmonic-mean estimate with linear-counting small-range
    * correction; public (and StaticInvoke-codegen'd via [[estimate]])
    * so stored sketch blobs decode to counts.
    */
  def estimateRegisters(buf: Array[Byte]): Long = {
    // N = sum_j 2^(53 - M_j), held EXACTLY in two longs (ranks are
    // 0..53): `hi` carries the 2^12-scaled part, `lo` the sub-2^12
    // tail, so N = hi*2^12 + lo with hi <= 2^53 and lo < 2^24. The
    // double image of N is then built from two exactly-representable
    // halves with a SINGLE rounding add — the one floating-point step,
    // reproduced identically by the DuckDB oracle. (A naive running
    // double sum rounds at data-dependent points and is not portable.)
    var hi = 0L
    var lo = 0L
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = buf(i)
      if (r <= 41) hi += 1L << (41 - r) else lo += 1L << (53 - r)
      if (r == 0) zeros += 1
      i += 1
    }
    val nd = (hi + (lo >>> 12)).toDouble * 4096.0 + (lo & 4095L).toDouble
    val raw = RawNum / nd
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    // floor(x+0.5) == Math.round == DuckDB floor(x+0.5); the ln branch
    // is verified rounded-equal for every zeros in 1..4096 (HllOracleSpec)
    math.round(est)
  }

  // --- Column builders for the sketch-table tiers ---
  def sketch(c: Column): Column =
    Bridge.column(HllSketch(Bridge.expression(c)).toAggregateExpression())

  def mergeSketches(c: Column): Column =
    Bridge.column(HllMergeAgg(Bridge.expression(c)).toAggregateExpression())

  def estimate(c: Column): Column =
    Bridge.column(StaticInvoke(HyperLogLog.getClass, LongType,
      "estimateRegisters", Seq(Bridge.expression(c)),
      // null sketch (outer-join miss) -> null estimate; the output
      // column must therefore be declared nullable
      propagateNull = true, returnNullable = true))

  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_hll",
      args => new HyperLogLog(args(0)).toAggregateExpression())
}
