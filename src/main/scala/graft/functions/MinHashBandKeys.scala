package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash LSH band keys from a token array: one codegen'd pass
  * builds each sliding `shingleN`-gram, hashes it ONCE (md5-prefix-64
  * base then one seed-42 `hashLong` mix — [[Md5Long]], the
  * oracle-portable basis since round 11), derives the `numHashes`
  * per-hash values by re-seeding the gram hash with the hash index
  * (`hashLong(g, j)` — the standard one-string-hash + k cheap mixes
  * construction), keeps running minima, and folds each
  * `numHashes / bands` slice of the signature into a band key. Every
  * stage is 64-bit integer arithmetic DuckDB reproduces bit-exactly
  * (the q_dedup_minhash oracle rebuilds signatures, band keys, and the
  * candidate set itself).
  *
  * Replaces the round-2 HOF pipeline (`transform(sequence, j ->
  * array_min(transform(sh, s -> xxhash64(j, s))))` + banded slices),
  * which Spark evaluates interpreted: O(grams * hashes) lambda
  * invocations and a 32-hash pass over every shingle STRING per doc.
  * Here the string is hashed once per gram and the j-th hash is one
  * `hashLong` mix — ~32x less string hashing, zero interpreter
  * overhead, no intermediate arrays, and no `Det.let` CSE barriers
  * needed. Duplicate grams need no dedup: duplicates cannot change a
  * minimum.
  *
  * Candidate semantics are standard MinHash banding (P[band collision]
  * = jaccard^rows per band); the exact-Jaccard verification join after
  * candidate generation makes the final pairs independent of the hash
  * family, which the `q_dedup_minhash == q_dedup_ngram` test pins.
  */
case class MinHashBandKeys(child: Expression, shingleN: Int,
    numHashes: Int, bands: Int) extends UnaryExpression {

  require(numHashes % bands == 0, "numHashes must be a multiple of bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_keys expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[ArrayData], shingleN,
      numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.MinHashBandKeys.compute($a, $shingleN, $numHashes, $bands)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandKeys = copy(child = newChild)
}

object MinHashBandKeys {
  private final val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, shingleN: Int, numHashes: Int,
      bands: Int): GenericArrayData = {
    val minima = new Array[Long](numHashes)
    java.util.Arrays.fill(minima, Long.MaxValue)
    val count = toks.numElements() - shingleN + 1
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](shingleN)
      var k = 0
      while (k < shingleN) {
        parts(k) = if (toks.isNullAt(i + k)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(i + k)
        k += 1
      }
      val g = XXH64.hashLong(
        Md5Long.hash64(UTF8String.concatWs(Space, parts: _*)), Seed)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(g, j.toLong)
        if (h < minima(j)) minima(j) = h
        j += 1
      }
      i += 1
    }
    val rows = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = Seed
      var k = 0
      while (k < rows) {
        acc = XXH64.hashLong(minima(b * rows + k), acc)
        k += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point: `minhash_band_keys(tokens, n, H, B)`. */
  def apply(tokens: Column, shingleN: Int, numHashes: Int,
      bands: Int): Column =
    Bridge.column(MinHashBandKeys(Bridge.expression(tokens), shingleN,
      numHashes, bands))
}
