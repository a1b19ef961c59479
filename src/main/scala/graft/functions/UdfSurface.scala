package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The user-extension triad (SURVEY.md §2.C UDF plan): a typed
  * `Aggregator` (exact distinct count over a set buffer — the
  * demonstration shape; at 100 TB you'd swap the buffer for an HLL
  * sketch and keep the same Aggregator contract, or use the built-in
  * `approx_count_distinct`), and a scalar Scala UDF (slug
  * normalization). Generators are covered by the built-in
  * `explode`/`posexplode` usage in the query inventory — built-ins beat
  * custom `Generator`s when semantics allow (SURVEY.md §4.1).
  */
object UdfSurface {

  /** Typed Aggregator: exact COUNT(DISTINCT x) via a Set buffer.
    * Mergeable (set union) => correct under partial aggregation.
    */
  object DistinctLongAgg extends Aggregator[Long, Set[Long], Long] {
    override def zero: Set[Long] = Set.empty
    override def reduce(b: Set[Long], a: Long): Set[Long] = b + a
    override def merge(b1: Set[Long], b2: Set[Long]): Set[Long] = b1 ++ b2
    override def finish(r: Set[Long]): Long = r.size.toLong
    override def bufferEncoder: Encoder[Set[Long]] =
      Encoders.kryo[Set[Long]]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Scalar UDF body: slug-normalize a name (lowercase, non-alnum -> -).
    * Kept as a plain function so the SQL oracle can mirror it exactly.
    */
  val slugify: String => String = s =>
    s.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]+", "-")
      .stripPrefix("-").stripSuffix("-")
}
