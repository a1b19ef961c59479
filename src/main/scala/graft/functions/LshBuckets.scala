package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Multi-table random-hyperplane LSH bucket assignment: returns one
  * bucket id per hash table (`numTables` longs), where table t's bucket
  * packs the sign bits of `planesPerTable` hyperplane projections.
  *
  * Hyperplane component for plane id P (= t * planesPerTable + p), dim
  * i is `xxhash64(P, i)` scaled to [-1, 1) — the same deterministic
  * pseudo-random construction as the SQL spelling it replaces
  * (xxhash64 chains hashInt(i, hashInt(P, seed=42))), reproducible on
  * any cluster with no trained state to ship.
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
  private final val Seed = 42L // Spark's xxhash64 default seed

  /** The hyperplane matrix is a pure function of (plane count, dims) —
    * hashing it per ROW would dominate the signature cost (plane*dim
    * hashes per vector). One deterministic build per executor, racy-but-
    * idempotent publish; per row is then plane*dim multiply-adds only.
    */
  @volatile private var cached: (Int, Int, Array[Array[Double]]) = null

  private def planeMatrix(numPlanes: Int, dims: Int): Array[Array[Double]] = {
    val c = cached
    if (c != null && c._1 == numPlanes && c._2 == dims) return c._3
    val m = Array.tabulate(numPlanes, dims) { (p, i) =>
      XXH64.hashInt(i, XXH64.hashInt(p, Seed)).toDouble /
        Long.MaxValue.toDouble
    }
    cached = (numPlanes, dims, m)
    m
  }

  def compute(arr: ArrayData, numTables: Int,
      planesPerTable: Int): GenericArrayData = {
    val n = arr.numElements()
    val m = planeMatrix(numTables * planesPerTable, n)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val row = m(t * planesPerTable + p)
        var dot = 0.0d
        var i = 0
        while (i < n) {
          dot += arr.getFloat(i).toDouble * row(i)
          i += 1
        }
        if (dot >= 0.0d) bucket |= 1L << p
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
