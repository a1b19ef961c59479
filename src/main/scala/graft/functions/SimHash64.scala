package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array, as one fused codegen'd loop.
  *
  * Semantics (identical to the SQL-HOF spelling it replaces, see
  * [[graft.operators.Dedup]]): bit i of the result is set iff
  * `sum over tokens t of (bit i of h(t) == 1 ? +1 : -1) > 0`, where
  * `h(t) = xxhash64(md5_long64(t))` — the oracle-portable basis
  * ([[Md5Long]], round 11): md5 is bit-identical cross-engine and the
  * seed-42 `hashLong` mix is reproduced in DuckDB by
  * [[graft.operators.XxhSql]], so the q_dedup_simhash oracle rebuilds
  * the signatures themselves. Bit-for-bit equal to
  * `transform(toks, t -> xxhash64(md5_long64(t)))` followed by the
  * aggregate/zip_with bit-count/pack chain (pinned in tests).
  *
  * Why native: Spark never compiles lambda higher-order functions —
  * `aggregate`/`zip_with`/`transform` run interpreted and allocate two
  * 64-element arrays PER TOKEN (the round-2 bench recorded 66.5 s for
  * this one query, ~49% of the run). Here the whole signature is one
  * pass over the tokens: the +-1 counters live in an `int[64]` local
  * that JIT keeps in cache, the inner loop unpacks the 64 hash bits
  * with a shift each — no per-token allocation, O(tokens * 64) plain
  * ALU ops, and whole-stage codegen keeps it inside the surrounding
  * stage.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hash(arr)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.SimHash64.hash($a)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(newChild)
}

object SimHash64 {
  private final val Seed = 42L // Spark's xxhash64 default seed

  /** Shared by interpreted eval and codegen (the loop is a plain static
    * call — megamorphic-free, JIT-compiled once — so emitting it inline
    * in doGenCode would buy nothing but code-cache pressure).
    */
  def hash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var t = 0
    while (t < n) {
      // split() never yields nulls; a null token hashes like xxhash64's
      // null (the seed passes through unchanged) for consistency.
      val h =
        if (arr.isNullAt(t)) Seed
        else XXH64.hashLong(Md5Long.hash64(arr.getUTF8String(t)), Seed)
      var i = 0
      while (i < 64) {
        counts(i) += (((h >>> i) & 1L).toInt << 1) - 1 // bit -> +1 / -1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Column-level entry point: `simhash64(tokens)`. */
  def apply(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}
