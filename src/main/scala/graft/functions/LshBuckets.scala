package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Multi-table random-hyperplane LSH bucket assignment: returns one
  * bucket id per hash table (`numTables` longs), where table t's bucket
  * packs the sign bits of `planesPerTable` hyperplane projections.
  *
  * Hyperplane component for plane id P (= t * planesPerTable + p), dim
  * i is the INTEGER `(md5_64("lsh|P|i") mod 2^16) - 2^15` — the
  * [[Md5Long]] oracle-portable basis (round-12 ask #3): `md5` is
  * bit-identical in every engine, and the projection runs as an EXACT
  * int64 dot over 2^20 fixed-point vector elements (`floor(x * 2^20)`,
  * the q_embed_quantize discipline), so the sign — and therefore every
  * bucket id — is reproducible in DuckDB SQL with no floating-point
  * summation-order hazard. Uniform integer components are a valid SRP
  * family (only the projection sign matters); no trained state to
  * ship.
  *
  * Multi-table is the recall lever single-table LSH lacks: a true
  * neighbor is found if it shares ANY table's bucket, so recall is
  * 1-(1-p^k)^L per neighbor instead of p^k. The per-row cost
  * (L * k * dims hash+multiply-adds) runs as one fused codegen'd loop —
  * the HOF spelling would interpret L * k lambda folds per row.
  */
case class LshBuckets(child: Expression, numTables: Int,
    planesPerTable: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets expects array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], numTables,
      planesPerTable)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.LshBuckets.compute($a, $numTables, $planesPerTable)")

  override protected def withNewChildInternal(
      newChild: Expression): LshBuckets = copy(child = newChild)
}

object LshBuckets {

  /** The hyperplane matrix is a pure function of (plane count, dims) —
    * hashing it per ROW would dominate the signature cost (plane*dim
    * hashes per vector). One deterministic build per executor, racy-but-
    * idempotent publish; per row is then plane*dim multiply-adds only.
    */
  @volatile private var cached: (Int, Int, Array[Array[Long]]) = null

  /** Integer plane component for (plane, dim): low 16 md5 bits,
    * centered — `(md5_64("lsh|P|i") mod 2^16) - 2^15`, i 0-based.
    * DuckDB image: `CAST(md5u('lsh|'||P||'|'||i) % 65536 AS BIGINT)
    * - 32768` (operators/XxhSql.md5u).
    */
  private[graft] def planeComponent(plane: Int, dim: Int): Long =
    (Md5Long.hash64(UTF8String.fromString(s"lsh|$plane|$dim"))
      & 0xFFFFL) - 32768L

  private def planeMatrix(numPlanes: Int, dims: Int): Array[Array[Long]] = {
    val c = cached
    if (c != null && c._1 == numPlanes && c._2 == dims) return c._3
    val m = Array.tabulate(numPlanes, dims)(planeComponent)
    cached = (numPlanes, dims, m)
    m
  }

  def compute(arr: ArrayData, numTables: Int,
      planesPerTable: Int): GenericArrayData = {
    val n = arr.numElements()
    val m = planeMatrix(numTables * planesPerTable, n)
    // 2^20 fixed-point elements (the q_embed_quantize discipline):
    // float -> double is exact, floor is deterministic, and the dot
    // stays far inside int64 (|q| ~ 2^21, |c| <= 2^15, 64 dims).
    val q = new Array[Long](n)
    var j = 0
    while (j < n) {
      q(j) = math.floor(arr.getFloat(j).toDouble * 1048576.0).toLong
      j += 1
    }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val row = m(t * planesPerTable + p)
        var dot = 0L
        var i = 0
        while (i < n) {
          dot += q(i) * row(i)
          i += 1
        }
        if (dot >= 0L) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point: `lsh_buckets(emb, L, k)`. */
  def apply(emb: Column, numTables: Int, planesPerTable: Int): Column =
    Bridge.column(LshBuckets(Bridge.expression(emb), numTables,
      planesPerTable))
}
