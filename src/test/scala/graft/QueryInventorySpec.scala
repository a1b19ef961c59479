package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Inventory-level checks at sf0.001: every registered query runs and
  * returns rows; every oracle key has a query; cross-checks between
  * independent implementations of the same semantics (MinHash candidates
  * vs exact n-gram Jaccard pairs; streaming vs batch tumbling windows).
  */
class QueryInventorySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("oracle keys are a subset of query keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with empty results: $empties")
  }

  test("MinHash LSH candidates equal exact n-gram Jaccard pairs") {
    val lsh = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = SparkEntry.queries("q_dedup_ngram")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // LSH is a candidate filter + exact verification at the same 0.5
    // threshold, so on this corpus (planted near-dups at jac>0.9,
    // background <0.3) the two must agree exactly.
    assert(lsh.toSet == exact.toSet)
    assert(lsh.nonEmpty)
  }

  test("near-dup clusters equal union-find over the exact pair relation") {
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find with min-id roots — an independent algorithm
    // for the same components the iterative propagation computes
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = SparkEntry.queries("q_dedup_cluster")(spark, sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.nonEmpty)
    got.foreach { case (doc, cl) =>
      assert(cl == find(doc), s"doc $doc: got cluster $cl, want ${find(doc)}")
    }
  }

  test("streaming tumbling windows equal batch tumbling windows") {
    val stream = SparkEntry.queries("q_streaming_rate")(spark, sf)
      .select("hour_start", "event_type", "n").collect().toSet
    val batch = SparkEntry.queries("q_window_tumbling")(spark, sf)
      .select("hour_start", "event_type", "n").collect().toSet
    assert(stream == batch)
  }

  test("stateful streaming sessions equal batch session_window, " +
      "each emitted exactly once across a multi-batch replay") {
    // the replay is genuinely multi-batch (two time-split halves, the
    // watermark sentinel riding in the last), so mid-stream event-time
    // timeouts fire between batches
    val replay = new java.io.File(
      streaming.StatefulSession.replayDir(spark, sf))
    assert(replay.listFiles().count(_.getName.endsWith(".parquet")) >= 2)
    val rows = SparkEntry.queries("q_streaming_session")(spark, sf)
      .collect().map(_.toSeq)
    // closed sessions are append-mode emissions: exactly once each
    assert(rows.length == rows.toSet.size)
    val batch = SparkEntry.queries("q_window_session")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(rows.toSet == batch && rows.nonEmpty)
  }

  test("LSH ANN: exact scores, reproducible buckets, recall floor") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val vecs = Tables.table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def quant(a: Array[Float]): Array[Long] =
      a.map(x => math.floor(x.toDouble * 1048576.0).toLong)
    def cos(a: Long, b: Long): Double = {
      val qa = quant(vecs(a)); val qb = quant(vecs(b))
      val dot = qa.lazyZip(qb).map(_ * _).sum
      dot.toDouble / (math.sqrt(qa.map(x => x * x).sum.toDouble) *
        math.sqrt(qb.map(x => x * x).sum.toDouble))
    }
    // independent re-derivation of the multi-table random-hyperplane
    // buckets (L=8 tables x k=4 planes — the adaptive plane count
    // resolves to 4 for this 500-vector fixture): plane id P = t*k+p,
    // component for dim i chains hashInt(i, hashInt(P, seed=42))
    def buckets(v: Array[Float]): Seq[Long] =
      (0 until 8).map { t =>
        (0 until 4).map { p =>
          val h1 = XXH64.hashInt(t * 4 + p, 42L)
          val dot = v.zipWithIndex.map { case (x, i) =>
            x.toDouble * (XXH64.hashInt(i, h1).toDouble / Long.MaxValue.toDouble)
          }.sum
          if (dot >= 0.0) 1L << p else 0L
        }.sum
      }
    def collides(a: Array[Float], b: Array[Float]): Boolean =
      buckets(a).lazyZip(buckets(b)).exists(_ == _)
    val lsh = SparkEntry.queries("q_sim_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(lsh.nonEmpty)
    // every emitted score is the exact cosine of a real corpus pair,
    // bit-for-bit (LSH only prunes candidates, never alters scores)
    lsh.foreach { case (p, c, s, _) => assert(s == cos(p, c), s"($p,$c)") }
    // full-result equality with a from-scratch multi-table top-5
    val expected = (0L until 10L).flatMap { p =>
      vecs.keys.filter(c => c != p && collides(vecs(p), vecs(c)))
        .map(c => (p, c, cos(p, c))).toSeq
        .sortBy { case (_, c, s) => (-s, c) }.take(5).zipWithIndex
        .map { case ((pp, c, s), i) => (pp, c, s, (i + 1).toLong) }
    }.toSet
    assert(lsh.toSet == expected)
    // recall against the exact brute-force top-5 (the LSH bargain:
    // approximate, but must find a meaningful share of true neighbors)
    val brute = (0L until 10L).map { p =>
      p -> vecs.keys.filter(_ != p).map(c => (c, cos(p, c))).toSeq
        .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1).toSet
    }
    val lshByProbe = lsh.groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    val recall = brute.map { case (p, bs) =>
      (bs & lshByProbe.getOrElse(p, Set.empty[Long])).size }.sum.toDouble /
      brute.map(_._2.size).sum
    info(f"LSH recall vs brute-force top-5: $recall%.2f")
    // deterministic construction + fixed corpus => stable measure
    // (0.60 on this fixture); the floor leaves noise-free headroom
    assert(recall >= 0.4, s"recall $recall below floor")
  }

  test("simhash signatures: near-dup pairs have small hamming distance") {
    import org.apache.spark.sql.functions._
    val sig = SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .select("doc_id", "simhash")
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sf)
      .select("a_id", "b_id")
    val a = sig.withColumnRenamed("doc_id", "a_id")
      .withColumnRenamed("simhash", "sim_a")
    val b = sig.withColumnRenamed("doc_id", "b_id")
      .withColumnRenamed("simhash", "sim_b")
    val joined = pairs.join(a, "a_id").join(b, "b_id")
      .select(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("ham"))
      .collect().map(_.getInt(0))
    // planted near-dups (jaccard > 0.9) must land within 16 bits
    assert(joined.nonEmpty && joined.forall(_ <= 16),
      s"hamming distances: ${joined.toSeq}")
  }
}
