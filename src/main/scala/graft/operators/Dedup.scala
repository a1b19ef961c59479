package graft.operators

import graft.QueryModule
import graft.Det.lng
import graft.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at LLM-pipeline scale: MinHash+LSH and
  * SimHash over the `documents` table.
  *
  * MinHash+LSH (`q_dedup_minhash`): 3-token shingles -> 32 minhashes ->
  * 8 bands x 4 rows -> band key -> ONE shuffle groups the skinny band
  * stream into per-bucket posting lists whose i<j pairs are the
  * candidates -> exact Jaccard verification on the candidate set only
  * (signature pipeline fused into the native codegen'd
  * [[graft.functions.MinHashBandKeys]]). This is the 100 TB shape: the
  * only shuffles are the bucket grouping (keys ~uniform by construction
  * — hash output — so no skew) and the candidate distinct, and the
  * quadratic verification runs on the tiny candidate set, never all
  * pairs. Compare `q_dedup_ngram` (TextPipeline), the oracle-checked
  * exact all-pairs form of the same semantics.
  *
  * SimHash (`q_dedup_simhash`): 64-bit signature; bit i is the sign of
  * the sum over tokens of +-1 from bit i of xxhash64(token). Emitted with
  * four 16-bit band keys — near-dups (small Hamming distance) collide on
  * at least one band with high probability, giving the same
  * LSH-bucket-join scale path. No DuckDB oracle (xxhash64 is
  * Spark-specific); self-checked against the MinHash pairs in the test
  * suite.
  */
object Dedup extends QueryModule {

  private def toks: Column = TextPipeline.toks

  // 32 hashes in 8 bands of 4: P(no candidate | jac=0.9) ~= 2e-4, while
  // background pairs (jac < 0.3) produce < ~3% spurious candidates that
  // the exact-Jaccard verification then discards.
  // private[graft]: the streaming band-index twin MUST share these —
  // a retuning that only touched one copy would silently desync the
  // live index from its batch twin and oracle (one-definition rule,
  // same as postingPairs)
  private[graft] val NumHashes = 32
  private[graft] val Bands = 8
  private[graft] val ShingleLen = 3


  /** Min-label propagation to convergence over the symmetric near-dup
    * edge list; returns per-doc (cluster_id, n_members, is_canonical).
    */
  // private[operators]: TrainingMix.q_soft_dedup reuses the cluster
  // relation for 1/|cluster| down-weighting
  private[operators] def clusterLoop(s: SparkSession, d: String,
      pairs: DataFrame): DataFrame = {
      // Materialize the pair relation ONCE before symmetrizing: the
      // union's two legs are two consumers of the whole upstream
      // shingle/posting pipeline, and relying on Exchange reuse to
      // dedupe them is fragile (observed: the reuse stopped firing and
      // the query's cost doubled, 1.7s -> 3.4s at sf0.1). After the
      // checkpoint the second leg reads cached blocks, not the lineage.
      val p = pairs.select(col("a_id"), col("b_id")).localCheckpoint()
      // Loop-relation sizing: the iterative phase shuffles only the
      // skinny label/edge relations — orders of magnitude smaller than
      // the corpus the pair join above chews through. At the session's
      // 32 shuffle partitions each per-round job schedules 32
      // near-empty tasks and the loop is pure task-launch overhead, so
      // the loop relations are hash-repartitioned to 4 on their
      // join/agg keys HERE, inside the loop's own plan — never via the
      // session-global shuffle.partitions knob (a conf mutation is
      // visible to every concurrently-running query on the shared
      // session). localCheckpoint preserves outputPartitioning, so the
      // per-round join and aggregate see compatible hashpartitioning
      // and plan no further exchange. At fleet scale this sizing is
      // AQE coalescing (parallelismFirst keeps local[32] from
      // coalescing these tiny shuffles on its own).
      val LoopParts = 4
      // symmetric edge list: a narrow union over the checkpointed
      // blocks, repartitioned once on the probe key and re-read from
      // cached blocks by every iteration's join
      val edges = p
        .union(p.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        .repartition(LoopParts, col("a_id"))
        .localCheckpoint()
      var labels = table(s, d, "documents")
        .select(col("doc_id"), col("doc_id").as("cluster_id"))
        .repartition(LoopParts, col("doc_id"))
        .localCheckpoint()
      var converged = false
      var iter = 0
      // Convergence via the label-sum invariant: a step assigns each
      // node min(own, neighbors') — own label included — so labels are
      // pointwise non-increasing and the exact int64 label sum strictly
      // decreases until the fixpoint; equal sums mean zero changed
      // labels. One skinny aggregate over the (checkpointed) label
      // table replaces the join+filter existence check — one fewer
      // shuffle per round, and the driver still only ever sees a
      // scalar. DECIMAL(38,0) accumulation: an int64 sum would wrap
      // mod 2^64 (ANSI off), and a round whose true decrease is an
      // exact multiple of 2^64 — reachable at billions of docs with
      // large ids — would report converged with labels still moving.
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("cluster_id").cast("decimal(38,0)")))
          .head().getDecimal(0)
      var prevSum = labelSum(labels)
      while (!converged && iter < 25) {
        // each node adopts min(own label, neighbors' labels)
        val prop = labels.as("l")
          .join(edges.as("e"), col("l.doc_id") === col("e.a_id"))
          .select(col("e.b_id").as("doc_id"), col("l.cluster_id"))
        val next = labels.union(prop)
          .repartition(LoopParts, col("doc_id"))
          .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
          .localCheckpoint()
        val nextSum = labelSum(next)
        // value equality, not equals(): BigDecimal.equals is
        // scale-sensitive, so a future type tweak on either aggregate
        // would silently break the fixpoint test
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels = next
        iter += 1
      }
      // The cap is a runaway guard, not an accuracy knob: exiting through
      // it means some component's diameter exceeded the iteration budget
      // and the labels are WRONG. Fail loudly rather than return them —
      // a silently unconverged clustering would pass row-count checks.
      if (!converged)
        throw new IllegalStateException(
          s"q_dedup_cluster: label propagation not converged after $iter " +
            "iterations — component diameter exceeds the cap; raise it")
      val sizes = labels.repartition(LoopParts, col("cluster_id"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"))
      labels.repartition(LoopParts, col("cluster_id"))
        .join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("n_members"),
          (col("doc_id") === col("cluster_id")).as("is_canonical"))
        .orderBy("doc_id")
  }

  /** q_dedup_minhash's candidate-pair relation (banded MinHash bucket
    * collisions, distinct'd), exposed so the scale probe's census can
    * measure candidates vs qualifying output under skew — the same
    * self-adjudication the ssjoin census gives q_ssjoin_prefix
    * (round 16, r15 ask #4). The query itself consumes exactly this.
    */
  private[graft] def minhashCandidates(s: SparkSession,
      d: String): DataFrame = {
    // band keys in one fused codegen'd pass over the tokens (native
    // MinHashBandKeys — replaced the interpreted transform/array_min
    // HOF chain and its Det.let barriers in round 3)
    val bands = table(s, d, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.MinHashBandKeys(toks, ShingleLen, NumHashes,
          Bands)).as(Seq("band", "bkey")))
    // Candidate pairs by bucket posting list, NOT a band self-join:
    // group the skinny (band, bkey, doc_id) stream once, collect each
    // bucket's (sorted) occupants, emit the i<j pairs map-side — one
    // shuffle of the band stream instead of two join legs plus a
    // merge sort (the same single-shuffle shape ngramPairs uses).
    // LSH bucket sizes are ~geometric by construction (a bucket is a
    // 64-bit hash collision), so the per-bucket lists are small and
    // the i<j fan-out matches what the join would have produced
    // anyway. Pairs colliding in several bands distinct() BEFORE the
    // array fetch, as before.
    TextPipeline.postingPairs(
      graft.Tables.pinWidth(bands, col("band"), col("bkey"))
        .groupBy("band", "bkey")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) >= 2))
      .distinct()
  }

  /** Exact-Jaccard verification on a candidate pair relation — the
    * shared tail of q_dedup_minhash and q_minhash_delta: fetch the
    * per-doc shingle arrays (map-side, per-doc-distinct via array op —
    * no extra shuffle) for the few surviving pairs. Broadcast the
    * CANDIDATE side (genuinely small), stream the docs — never let
    * the planner broadcast the array-carrying docs relation. At
    * fleet scale with huge candidate sets this becomes a shuffle
    * join on doc_id instead.
    */
  private def jaccardVerify(s: SparkSession, d: String,
      cand: DataFrame): DataFrame = {
    val docs = table(s, d, "documents")
      .select(col("doc_id"), TextPipeline.shingles(toks).as("sh"))
    docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      .join(broadcast(cand), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
        .hint("shuffle_hash"), "b_id")
      // null-safe denominator: two gram-less docs (<3 tokens) share
      // identical all-MaxValue band keys and reach the verify with
      // empty shingle sets — under ANSI mode the raw 0/0 division
      // THROWS (and pre-ANSI its NaN would pass `>= 0.5` via Spark's
      // nan-safe compare). nullif-style guard makes jac NULL there,
      // which the filter drops — matching the DuckDB oracle's
      // omission of gram-less docs (ADVICE r11 #1)
      .select(col("a_id"), col("b_id"),
        graft.Det.let(
          size(array_union(col("a_sh"), col("b_sh")))) { un =>
          size(array_intersect(col("a_sh"), col("b_sh")))
            .cast("double") / when(un > 0, un)
        }.as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy("a_id", "b_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Canonical LSH candidate generation: the band self-join moves ONLY
    // (band, bkey, doc_id) — 24 bytes/row — never the shingle arrays;
    // pairs colliding in several bands are distinct()'d BEFORE the
    // arrays are fetched, so exact Jaccard runs once per unique
    // candidate. This is the shape that survives 100 TB: shuffle volume
    // is O(docs * bands), not O(docs * bands * doclen).
    "q_dedup_minhash" -> ((s, d) =>
      jaccardVerify(s, d, minhashCandidates(s, d))),

    // --- incremental minhash-index maintenance (round 17): the 100 TB
    // OPERATIONAL shape of q_dedup_minhash — a delta batch of new
    // documents (doc_id % 5 = 0, the same "new batch" convention
    // q_dedup_incremental established) joins an EXISTING band index
    // without re-pairing the corpus. The index side (base docs' band
    // keys — in production a MATERIALIZED table maintained across
    // batches, with deletions dropped as q_cdc_merge-style tombstones
    // before the probe) is NEVER self-joined and never grouped into
    // posting lists here; it is probed by a BROADCAST of the delta's
    // band keys (O(|delta|·bands) — the delta is small by definition,
    // that is what makes it a delta), so the per-batch cost is
    // O(delta), not O(corpus). Delta-internal pairs come from posting
    // lists over the delta stream alone. Together with the stored
    // base-only census this reproduces the from-scratch rebuild
    // EXACTLY — band keys are per-doc, so a merged-corpus bucket
    // collision is either base×base (already in the stored census),
    // delta×base (the probe), or delta×delta (the posting pass);
    // IncrementalDedupSpec asserts that equality. ---
    "q_minhash_delta" -> ((s, d) => {
      val isDelta = col("doc_id") % 5 === 0
      val bands = table(s, d, "documents")
        .select(col("doc_id"),
          posexplode(graft.functions.MinHashBandKeys(toks, ShingleLen, NumHashes,
            Bands)).as(Seq("band", "bkey")))
      val bDelta = bands.filter(isDelta)
      val bBase = bands.filter(!isDelta)
      // delta × index probe: the broadcast side is the DELTA (bounded
      // per batch); the index streams map-side underneath it
      val dbCand = bBase
        .join(broadcast(bDelta.select(col("band"), col("bkey"),
          col("doc_id").as("d_id"))), Seq("band", "bkey"))
        .select(least(col("doc_id"), col("d_id")).as("a_id"),
          greatest(col("doc_id"), col("d_id")).as("b_id"))
      // delta × delta: the posting-list idiom over the delta stream only
      val ddCand = TextPipeline.postingPairs(
        graft.Tables.pinWidth(bDelta, col("band"), col("bkey"))
          .groupBy("band", "bkey")
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
          .filter(size(col("ids")) >= 2))
      jaccardVerify(s, d, dbCand.union(ddCand).distinct())
    }),

    // --- transitive near-dup clustering: connected components over the
    // exact near-dup pair relation, by iterative min-label propagation.
    // Near-dup is not transitive (A~B, B~C !=> A~C), so a real pipeline
    // must CLUSTER the pair graph and keep one representative per
    // component — pair detection alone over-deletes or under-deletes.
    // Shape: the per-iteration step is one equi join (labels x edges) +
    // one min-aggregate, both shuffles on doc_id; the driver loop only
    // moves a convergence boolean (never data), the standard Spark
    // iterative-graph idiom (GraphX Pregel is this loop). Converges in
    // O(component diameter) rounds — near-dup clusters are shallow (a
    // dup cluster's diameter is small by construction), and
    // localCheckpoint truncates the growing lineage each round so plan
    // size stays O(1). Label = MIN doc_id of the component:
    // deterministic, order-independent, and directly the "keeper". ---
    // --- duplicate-family size distribution (the dedup REPORT a
    // curator reads before acting: is duplication a few mega-families
    // or a long tail of pairs? — the answer picks between canonical
    // selection and wholesale removal): same label-propagation loop
    // as q_dedup_cluster, then the cluster relation collapses to a
    // count-of-counts histogram — O(distinct sizes) output, with the
    // doc mass per size band. ---
    "q_dup_size_dist" -> ((s, d) => {
      val pairs = TextPipeline.ngramPairs(s, d)
        .select(col("a_id"), col("b_id"))
      val labels = clusterLoop(s, d, pairs)
      labels.groupBy("cluster_id")
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"))
        .orderBy("cluster_size")
    }),

    // --- memorization-risk matrix (round 12): duplication x length
    // interaction — verbatim memorization correlates with BOTH how
    // often a passage repeats and how long it is, so the risk review
    // reads a (dup-band x log2-length) grid, not either margin alone.
    // Same label-propagation clusters; the grid is a bounded
    // O(4 x log2(maxlen)) rollup with token mass and corpus share. ---
    "q_memorization_risk" -> ((s, d) => {
      val pairs = TextPipeline.ngramPairs(s, d)
        .select(col("a_id"), col("b_id"))
      val labels = clusterLoop(s, d, pairs).select(col("doc_id"),
        col("n_members"))
      val g = table(s, d, "documents")
        .select(col("doc_id"), lng(size(toks)).as("nt"))
        .join(labels, "doc_id")
        .select(
          when(col("n_members") === 1, "1_unique")
            .when(col("n_members") === 2, "2_pair")
            .when(col("n_members") <= 4, "3_small")
            .otherwise("4_family").as("dup_band"),
          (length(bin(col("nt"))) - 1).cast("long").as("len_log2"),
          col("nt"))
        .groupBy("dup_band", "len_log2")
        .agg(count(lit(1)).as("n_docs"),
          sum("nt").cast("long").as("tokens"))
      val tot = g.agg(sum("tokens").cast("long").as("t"))
      g.crossJoin(broadcast(tot))
        .select(col("dup_band"), col("len_log2"), col("n_docs"),
          col("tokens"),
          (col("tokens").cast("double") / col("t").cast("double"))
            .as("token_share"))
        .orderBy("dup_band", "len_log2")
    }),

    "q_dedup_cluster" -> ((s, d) => {
      val pairs = TextPipeline.ngramPairs(s, d)
        .select(col("a_id"), col("b_id"))
      // Loop-relation sizing lives inside clusterLoop itself (explicit
      // repartition on the join/agg keys), so no session conf is touched.
      clusterLoop(s, d, pairs)
    }),

    // --- transitive-bleed audit over the near-dup clusters (round
    // 14): per cluster-size, how much of each cluster is DIRECTLY
    // similar vs chained in through intermediates — edge_density =
    // direct pairs / C(n,2), bleed = its complement. This is the
    // number that decides whether connected-components dedup is safe
    // at a given τ: high bleed means clusters weld genuinely
    // dissimilar docs through chains, and the keep-one-per-cluster
    // policy silently drops non-duplicates (the classic transitive-
    // closure over-merge every fleet dedup postmortem rediscovers).
    // Work: the cached pair relation + the same label propagation the
    // cluster family shares; the direct-edge count is one join of the
    // O(pairs) relation against the label table; output is O(distinct
    // cluster sizes). Exact int64 counts, one terminal division per
    // band. ---
    "q_cluster_bleed" -> ((s, d) => {
      val pairs = TextPipeline.ngramPairs(s, d)
        .select(col("a_id"), col("b_id"))
      val cl = clusterLoop(s, d, pairs)
      // both endpoints of a pair share a cluster by construction, so
      // crediting the a-side label counts each direct edge once
      val direct = pairs
        .join(cl.select(col("doc_id").as("a_id"), col("cluster_id")),
          "a_id")
        .groupBy("cluster_id").agg(count(lit(1)).as("direct"))
      cl.groupBy("cluster_id").agg(max("n_members").as("n_members"))
        .filter(col("n_members") >= 2)
        .join(direct, Seq("cluster_id"), "left")
        .na.fill(0L, Seq("direct"))
        .groupBy("n_members")
        .agg(count(lit(1)).as("n_clusters"),
          sum("direct").as("n_direct_pairs"),
          sum(expr("n_members * (n_members - 1) div 2"))
            .as("n_possible_pairs"))
        .select(col("n_members"), col("n_clusters"),
          col("n_direct_pairs"), col("n_possible_pairs"),
          (col("n_direct_pairs").cast("double")
            / col("n_possible_pairs").cast("double"))
            .as("edge_density"),
          (lit(1.0) - col("n_direct_pairs").cast("double")
            / col("n_possible_pairs").cast("double")).as("bleed_share"))
        .orderBy("n_members")
    }),

    // --- quality-aware canonical selection per near-dup cluster: the
    // pass that decides which copy SURVIVES dedup. q_dedup_cluster's
    // min-id keeper is arbitrary; real pipelines keep the best copy
    // (longest text here — the usual proxy when near-dups are
    // truncations of each other). Same label-propagation clusters, then
    // ONE struct-extremum aggregate per cluster (max over (n_chars,
    // -doc_id) — deterministic ties, no row_number window over the
    // corpus). Output is O(clusters). ---
    "q_dedup_canonical" -> ((s, d) => {
      val pairs = TextPipeline.ngramPairs(s, d)
        .select(col("a_id"), col("b_id"))
      val labels = clusterLoop(s, d, pairs).select("doc_id", "cluster_id")
      labels
        .join(table(s, d, "documents").select(col("doc_id"),
          col("n_chars")), "doc_id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("n_chars"), (-col("doc_id")).as("neg_id")))
            .as("best"))
        .select(col("cluster_id"),
          (-col("best.neg_id")).as("canon_id"),
          col("n_members"),
          col("best.n_chars").as("canon_chars"))
        .orderBy("cluster_id")
    }),

    // --- blocked fuzzy dedup (edit distance): the entity-resolution
    // member of the dedup family — pairs whose 80-char prefixes are
    // within levenshtein 8 and whose lengths differ by <= 8. The scale
    // shape is BLOCKING, same discipline as q_join_range's banding: dock
    // each doc in a 32-char length band, replicate ONE side to its 3
    // adjacent bands (bounded explode, never a cross join), equi-join on
    // the band key. Replicate-width 32 > 2 x the 8-char length gate, so
    // every qualifying pair shares a band — blocking is result-invisible
    // and the oracle runs the clean all-pairs SQL. Two more scale knobs:
    // (1) the band key is SALTED — the base side docks at (band,
    // hash(id) % 8) and the probe replicates over the 8 salts, so one
    // hot length band spreads over 8 reducers instead of serializing
    // (bands are few and uneven; without salt, parallelism = band
    // count); (2) the DP is the THRESHOLDED levenshtein (banded
    // O(len x k), -1 past the threshold — no work wasted on distant
    // pairs). At fleet scale a second blocking key (simhash band,
    // q_dedup_simhash's) cuts within-band candidates further; the band
    // join shape is unchanged. ---
    "q_dedup_fuzzy" -> ((s, d) => {
      val salts = 8
      val docs = table(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          substring(col("text"), 1, 80).as("p"),
          expr("n_chars DIV 32").as("blk"))
      val probe = docs.select(col("doc_id").as("a_id"),
          col("n_chars").as("a_len"), col("p").as("a_p"),
          explode(array(col("blk") - 1, col("blk"), col("blk") + 1))
            .as("blk"))
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      val base = docs.select(col("doc_id").as("b_id"),
          col("n_chars").as("b_len"), col("p").as("b_p"), col("blk"),
          pmod(xxhash64(col("doc_id")), lit(salts)).as("salt"))
      // force the shuffle join: the exploded leg's row estimate lies
      // (see q_join_range) and broadcasting the corpus defeats banding
      probe.hint("shuffle_merge")
        .join(base.hint("shuffle_merge"), Seq("blk", "salt"))
        .filter(col("a_id") < col("b_id") &&
          abs(col("a_len") - col("b_len")) <= 8)
        .withColumn("lev", levenshtein(col("a_p"), col("b_p"), 8))
        .filter(col("lev") >= 0)
        .select(col("a_id"), col("b_id"), col("a_len"), col("b_len"),
          col("lev").cast("long").as("lev"))
        .orderBy("a_id", "b_id")
    }),

    // --- incremental dedup: a new ingest batch (doc_id % 5 == 0 plays
    // the incoming crawl) fuzzy-checked against the EXISTING corpus —
    // the shape every continuously-fed pipeline actually runs (full
    //-corpus dedup is the backfill; this is the steady state). Same
    // match predicate as q_dedup_fuzzy (|len diff| <= 8, prefix-80
    // levenshtein <= 8). The scale shape inverts the blocking: the
    // batch is small relative to the corpus, so its band-replicated
    // rows BROADCAST and the corpus streams through a map-side band
    // join — zero corpus shuffle, the corpus is read once and never
    // moved. (A batch too big to broadcast falls back to q_dedup_fuzzy's
    // banded+salted shuffle with the corpus docked once.) Novel docs
    // surface via the left join against the matched set; dup_of = min
    // matching corpus id, deterministic. ---
    "q_dedup_incremental" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          substring(col("text"), 1, 80).as("p"),
          expr("n_chars DIV 32").as("blk"))
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("c_id"), col("n_chars").as("c_len"),
          col("p").as("c_p"), col("blk"))
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val batchRep = batch.select(col("doc_id").as("b_id"),
        col("n_chars").as("b_len"), col("p").as("b_p"),
        explode(array(col("blk") - 1, col("blk"), col("blk") + 1))
          .as("blk"))
      // Size-gate the broadcast: ~100 B/replicated row x 3 bands means
      // 500k batch rows ~ 150 MB on the driver — past that the hint
      // would OOM rather than degrade, so fall back to the same
      // banded shuffle join q_dedup_fuzzy uses (corpus docked once).
      // The count scans one pushed-down column; negligible next to the
      // match join itself.
      val smallBatch = batch.count() <= 500000L
      val probe = if (smallBatch) broadcast(batchRep)
                  else batchRep.hint("shuffle_hash")
      val hits = corpus.join(probe, Seq("blk"))
        .filter(abs(col("c_len") - col("b_len")) <= 8 &&
          levenshtein(col("c_p"), col("b_p"), 8) >= 0)
        .groupBy("b_id").agg(min(col("c_id")).as("dup_of"))
      batch.select(col("doc_id"))
        .join(hits, col("doc_id") === col("b_id"), "left")
        .select(col("doc_id"), col("dup_of"),
          col("dup_of").isNull.as("is_novel"))
        .orderBy("doc_id")
    }),

    // One fused codegen'd pass per document: split (codegen'd) ->
    // SimHash64 native expression (functions/SimHash64.scala). Replaces
    // the round-2 aggregate/zip_with HOF chain that Spark evaluated
    // interpreted (66.5 s in BENCH_r02); signatures are bit-identical.
    "q_dedup_simhash" -> ((s, d) =>
      table(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.SimHash64(split(col("text"), " ")).as("simhash"))
        .select(col("doc_id"), col("simhash"),
          (shiftright(col("simhash"), 0).bitwiseAND(lit(0xFFFFL))).as("band0"),
          (shiftright(col("simhash"), 16).bitwiseAND(lit(0xFFFFL))).as("band1"),
          (shiftright(col("simhash"), 32).bitwiseAND(lit(0xFFFFL))).as("band2"),
          (shiftright(col("simhash"), 48).bitwiseAND(lit(0xFFFFL))).as("band3"))
        .orderBy("doc_id")),

    // --- dedup-cascade ledger (round 10): the three-stage funnel every
    // production pipeline runs — exact text dups, then shared-prefix
    // (template) dups among survivors, then near-dups among what's
    // left — with per-stage removal counts, the ledger that says
    // which stage earns its cost. Keepers are min-doc_id per group
    // (the house dedup decision); stage 3 removes any doc paired
    // with a smaller surviving partner (set-based, no iteration —
    // the transitive-cluster spelling is q_dedup_cluster; a cascade
    // ledger needs the cheap greedy rule both engines state
    // identically). Every relation is O(docs) or O(pairs). ---
    "q_dedup_cascade" -> ((s, d) => {
      val docs = table(s, d, "documents").select(col("doc_id"),
        col("text"))
      val k1 = docs.groupBy("text").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val k2 = docs.join(k1, "doc_id")
        .groupBy(md5(concat_ws(" ",
          slice(split(col("text"), " "), 1, 8))).as("pfx"))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val pairs = graft.operators.TextPipeline.ngramPairs(s, d)
        .select("a_id", "b_id")
      val removed3 = pairs
        .join(k2.withColumnRenamed("doc_id", "a_id"), "a_id")
        .join(k2.withColumnRenamed("doc_id", "b_id"), "b_id")
        .select(col("b_id").as("doc_id")).distinct()
      // Per-doc stage flags -> ONE aggregate -> explode into the 3-row
      // funnel: zero driver actions (the former spelling ran a 4-action
      // count ladder — four jobs for a 3-row report). The keeper sets
      // are skinny id relations, so the three flag joins broadcast; the
      // whole ledger is a single pass when the result is consumed.
      val flags = docs.select(col("doc_id"))
        .join(k1.withColumn("f1", lit(1L)), Seq("doc_id"), "left")
        .join(k2.withColumn("f2", lit(1L)), Seq("doc_id"), "left")
        .join(removed3.withColumn("f3", lit(1L)), Seq("doc_id"), "left")
      val cn = flags.agg(
        count(lit(1)).as("n0"),
        coalesce(sum("f1"), lit(0L)).as("n1"),
        coalesce(sum("f2"), lit(0L)).as("n2"),
        coalesce(sum("f3"), lit(0L)).as("r3"))
      cn.select(explode(array(
          struct(lit("1_exact").as("stage"), col("n0").as("n_in"),
            (col("n0") - col("n1")).as("n_removed"),
            col("n1").as("n_out")),
          struct(lit("2_prefix").as("stage"), col("n1").as("n_in"),
            (col("n1") - col("n2")).as("n_removed"),
            col("n2").as("n_out")),
          struct(lit("3_neardup").as("stage"), col("n2").as("n_in"),
            col("r3").as("n_removed"),
            (col("n2") - col("r3")).as("n_out")))).as("st"))
        .select(col("st.stage").as("stage"), col("st.n_in").as("n_in"),
          col("st.n_removed").as("n_removed"),
          col("st.n_out").as("n_out"))
        .orderBy("stage")
    }),

    // --- field-level survivorship (golden-record merge): the
    // entity-resolution step AFTER clustering — q_dedup_canonical
    // keeps one whole row; real MDM merges pick each FIELD from the
    // best-qualified member (longest text wins `source`, latest
    // record wins `lang`, identifiers take the stable minimum). Same
    // label-propagation clusters as q_dedup_cluster, then ONE
    // struct-extremum aggregate per rule (max over (n_chars, doc_id)
    // and (doc_id) — deterministic: doc_id is unique, so no tie ever
    // reaches a later struct field). Multi-member clusters only;
    // output is O(clusters), never a row_number window over the
    // corpus. ---
    "q_survivorship" -> ((s, d) => {
      val pairs = TextPipeline.ngramPairs(s, d)
        .select(col("a_id"), col("b_id"))
      val labels = clusterLoop(s, d, pairs).select("doc_id", "cluster_id")
      labels
        .join(table(s, d, "documents")
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars")), "doc_id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          min(col("doc_id")).as("survivor_id"),
          max(struct(col("n_chars"), col("doc_id"), col("source")))
            .as("longest"),
          max(struct(col("doc_id"), col("lang"))).as("latest"),
          sum(col("n_chars")).as("total_chars"))
        .filter(col("n_members") >= 2)
        .select(col("cluster_id"), col("n_members"), col("survivor_id"),
          col("longest.source").as("survivor_source"),
          col("latest.lang").as("survivor_lang"),
          col("longest.n_chars").as("longest_chars"),
          col("total_chars"))
        .orderBy("cluster_id")
    })
  )

  // xxhash64-based signatures (minhash, simhash) are engine-specific:
  // rows-only checks. The clustering query is hash-free — its oracle
  // re-derives the components with a recursive CTE over the same pair
  // relation (DuckDB's UNION-recursive fixpoint == our propagation
  // fixpoint: both compute min reachable id).
  override def oracle: Map[String, String] = Map(
    // round 11: the md5-prefix-64 hash rebase (functions/Md5Long) makes
    // the signatures themselves oracle-checkable — DuckDB rebuilds band
    // keys / sign bits bit-exactly via the HUGEINT XXH64 emulation
    "q_dedup_minhash" -> SigOracle.minhashSql,
    "q_minhash_delta" -> SigOracle.minhashSqlWhere(
      "(x.doc_id % 5 = 0 OR y.doc_id % 5 = 0)"),
    "q_dedup_simhash" -> SigOracle.simhashSql,

    "q_dedup_cascade" ->
      s"""WITH ${graft.operators.TextPipeline.ngramPairCte},
         |k1 AS (SELECT MIN(doc_id) AS doc_id FROM documents
         |       GROUP BY text),
         |k2 AS (SELECT MIN(d.doc_id) AS doc_id
         |       FROM documents d JOIN k1 USING (doc_id)
         |       GROUP BY md5(array_to_string(
         |         list_slice(string_split(d.text, ' '), 1, 8), ' '))),
         |r3 AS (SELECT DISTINCT p.b_id AS doc_id FROM p
         |       JOIN k2 a2 ON a2.doc_id = p.a_id
         |       JOIN k2 b2 ON b2.doc_id = p.b_id),
         |cn AS (SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n0,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM k1) AS n1,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM k2) AS n2,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM r3) AS r3n)
         |SELECT stage, n_in, n_removed, n_out FROM (
         |  SELECT '1_exact' AS stage, n0 AS n_in, n0 - n1 AS n_removed,
         |    n1 AS n_out FROM cn
         |  UNION ALL SELECT '2_prefix', n1, n1 - n2, n2 FROM cn
         |  UNION ALL SELECT '3_neardup', n2, r3n, n2 - r3n FROM cn)
         |ORDER BY stage""".stripMargin,

    // all-pairs spelling: the banded blocking must be result-invisible
    "q_dedup_fuzzy" ->
      """WITH d AS (SELECT doc_id, n_chars, substr(text, 1, 80) AS p
        |           FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       a.n_chars AS a_len, b.n_chars AS b_len,
        |       CAST(levenshtein(a.p, b.p) AS BIGINT) AS lev
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE abs(a.n_chars - b.n_chars) <= 8
        |  AND levenshtein(a.p, b.p) <= 8
        |ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, n_chars, substr(text, 1, 80) AS p
        |           FROM documents),
        |b AS (SELECT * FROM d WHERE doc_id % 5 = 0),
        |c AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
        |m AS (SELECT b.doc_id AS b_id, MIN(c.doc_id) AS dup_of
        |      FROM b JOIN c ON abs(b.n_chars - c.n_chars) <= 8
        |                   AND levenshtein(b.p, c.p) <= 8
        |      GROUP BY 1)
        |SELECT b.doc_id, m.dup_of, m.dup_of IS NULL AS is_novel
        |FROM b LEFT JOIN m ON m.b_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "q_dedup_canonical" ->
      s"""WITH RECURSIVE ${TextPipeline.ngramPairCte},
         |ed AS (SELECT a_id AS src, b_id AS dst FROM p
         |       UNION ALL
         |       SELECT b_id, a_id FROM p),
         |r AS (SELECT doc_id AS doc, doc_id AS reach FROM documents
         |      UNION
         |      SELECT r.doc, ed.dst FROM r JOIN ed ON ed.src = r.reach),
         |cl AS (SELECT doc AS doc_id, MIN(reach) AS cluster_id
         |       FROM r GROUP BY doc),
         |ranked AS (
         |  SELECT cl.cluster_id, cl.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY d.n_chars DESC, cl.doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY cl.cluster_id) AS n_members
         |  FROM cl JOIN documents d USING (doc_id))
         |SELECT cluster_id, doc_id AS canon_id,
         |  CAST(n_members AS BIGINT) AS n_members,
         |  n_chars AS canon_chars
         |FROM ranked WHERE rn = 1
         |ORDER BY cluster_id""".stripMargin,

    "q_survivorship" ->
      s"""WITH RECURSIVE ${TextPipeline.ngramPairCte},
         |ed AS (SELECT a_id AS src, b_id AS dst FROM p
         |       UNION ALL
         |       SELECT b_id, a_id FROM p),
         |r AS (SELECT doc_id AS doc, doc_id AS reach FROM documents
         |      UNION
         |      SELECT r.doc, ed.dst FROM r JOIN ed ON ed.src = r.reach),
         |cl AS (SELECT doc AS doc_id, MIN(reach) AS cluster_id
         |       FROM r GROUP BY doc),
         |j AS (SELECT cl.cluster_id, cl.doc_id, d.source, d.lang,
         |        d.n_chars
         |      FROM cl JOIN documents d USING (doc_id)),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |         CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
         |         CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |       FROM j GROUP BY 1 HAVING COUNT(*) >= 2),
         |lg AS (SELECT cluster_id, source, n_chars,
         |         row_number() OVER (PARTITION BY cluster_id
         |           ORDER BY n_chars DESC, doc_id DESC) AS rn
         |       FROM j),
         |lt AS (SELECT cluster_id, lang,
         |         row_number() OVER (PARTITION BY cluster_id
         |           ORDER BY doc_id DESC) AS rn
         |       FROM j)
         |SELECT sz.cluster_id, sz.n_members, sz.survivor_id,
         |  lg.source AS survivor_source, lt.lang AS survivor_lang,
         |  CAST(lg.n_chars AS BIGINT) AS longest_chars, sz.total_chars
         |FROM sz
         |JOIN lg ON lg.cluster_id = sz.cluster_id AND lg.rn = 1
         |JOIN lt ON lt.cluster_id = sz.cluster_id AND lt.rn = 1
         |ORDER BY sz.cluster_id""".stripMargin,

    "q_dup_size_dist" ->
      s"""WITH RECURSIVE ${TextPipeline.ngramPairCte},
         |ed AS (SELECT a_id AS src, b_id AS dst FROM p
         |       UNION ALL
         |       SELECT b_id, a_id FROM p),
         |r AS (SELECT doc_id AS doc, doc_id AS reach FROM documents
         |      UNION
         |      SELECT r.doc, ed.dst FROM r JOIN ed ON ed.src = r.reach),
         |cl AS (SELECT doc AS doc_id, MIN(reach) AS cluster_id
         |       FROM r GROUP BY doc),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT)
         |         AS cluster_size
         |       FROM cl GROUP BY cluster_id)
         |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
         |FROM sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    "q_memorization_risk" ->
      s"""WITH RECURSIVE ${TextPipeline.ngramPairCte},
         |ed3 AS (SELECT a_id AS src, b_id AS dst FROM p
         |        UNION ALL
         |        SELECT b_id, a_id FROM p),
         |rr3 AS (SELECT doc_id AS doc, doc_id AS reach FROM documents
         |        UNION
         |        SELECT rr3.doc, ed3.dst FROM rr3
         |        JOIN ed3 ON ed3.src = rr3.reach),
         |cl3 AS (SELECT doc AS doc_id, MIN(reach) AS cluster_id
         |        FROM rr3 GROUP BY doc),
         |sz3 AS (SELECT cluster_id, COUNT(*) AS n_members
         |        FROM cl3 GROUP BY cluster_id),
         |gr3 AS (SELECT CASE WHEN n_members = 1 THEN '1_unique'
         |               WHEN n_members = 2 THEN '2_pair'
         |               WHEN n_members <= 4 THEN '3_small'
         |               ELSE '4_family' END AS dup_band,
         |          CAST(length(bin(CAST(len(string_split(d.text, ' '))
         |            AS BIGINT))) - 1 AS BIGINT) AS len_log2,
         |          CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nt
         |        FROM documents d
         |        JOIN cl3 ON cl3.doc_id = d.doc_id
         |        JOIN sz3 USING (cluster_id)),
         |ag3 AS (SELECT dup_band, len_log2, COUNT(*) AS n_docs,
         |          CAST(SUM(nt) AS BIGINT) AS tokens
         |        FROM gr3 GROUP BY 1, 2),
         |tt4 AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t FROM ag3)
         |SELECT dup_band, len_log2, n_docs, tokens,
         |  CAST(tokens AS DOUBLE) / CAST(t AS DOUBLE) AS token_share
         |FROM ag3 CROSS JOIN tt4
         |ORDER BY dup_band, len_log2""".stripMargin,

    "q_cluster_bleed" ->
      s"""WITH RECURSIVE ${TextPipeline.ngramPairCte},
         |ed AS (SELECT a_id AS src, b_id AS dst FROM p
         |       UNION ALL
         |       SELECT b_id, a_id FROM p),
         |r AS (SELECT doc_id AS doc, doc_id AS reach FROM documents
         |      UNION
         |      SELECT r.doc, ed.dst FROM r JOIN ed ON ed.src = r.reach),
         |cl AS (SELECT doc AS doc_id, MIN(reach) AS cluster_id
         |       FROM r GROUP BY doc),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
         |       FROM cl GROUP BY cluster_id),
         |dc AS (SELECT cl.cluster_id, CAST(COUNT(*) AS BIGINT) AS direct
         |       FROM p JOIN cl ON cl.doc_id = p.a_id GROUP BY 1),
         |cs AS (SELECT sz.cluster_id, sz.n_members,
         |         COALESCE(dc.direct, 0) AS direct
         |       FROM sz LEFT JOIN dc USING (cluster_id)
         |       WHERE sz.n_members >= 2)
         |SELECT n_members, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(direct) AS BIGINT) AS n_direct_pairs,
         |  CAST(SUM(n_members * (n_members - 1) // 2) AS BIGINT)
         |    AS n_possible_pairs,
         |  CAST(SUM(direct) AS DOUBLE)
         |    / CAST(SUM(n_members * (n_members - 1) // 2) AS DOUBLE)
         |    AS edge_density,
         |  1.0 - CAST(SUM(direct) AS DOUBLE)
         |    / CAST(SUM(n_members * (n_members - 1) // 2) AS DOUBLE)
         |    AS bleed_share
         |FROM cs GROUP BY n_members ORDER BY n_members""".stripMargin,

    "q_dedup_cluster" ->
      s"""WITH RECURSIVE ${TextPipeline.ngramPairCte},
         |ed AS (SELECT a_id AS src, b_id AS dst FROM p
         |       UNION ALL
         |       SELECT b_id, a_id FROM p),
         |r AS (SELECT doc_id AS doc, doc_id AS reach FROM documents
         |      UNION
         |      SELECT r.doc, ed.dst FROM r JOIN ed ON ed.src = r.reach),
         |cl AS (SELECT doc AS doc_id, MIN(reach) AS cluster_id
         |       FROM r GROUP BY doc),
         |sz AS (SELECT cluster_id, COUNT(*) AS n_members
         |       FROM cl GROUP BY cluster_id)
         |SELECT cl.doc_id, cl.cluster_id, sz.n_members,
         |       cl.doc_id = cl.cluster_id AS is_canonical
         |FROM cl JOIN sz USING (cluster_id)
         |ORDER BY cl.doc_id""".stripMargin
  )
}
