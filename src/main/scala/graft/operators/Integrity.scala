package graft.operators

import graft.QueryModule
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Data-integrity / physical-layout operators (round 8, first block):
  * order-independent table checksums, range-partition boundary planning,
  * delta-encoding effectiveness audit, a portable Bloom-filter FPR audit,
  * and a temporal train/test split with an embargo gap. All five carry
  * full DuckDB oracles.
  *
  * Determinism: every digest is md5-derived (bit-identical across
  * engines); digest sums accumulate in DECIMAL(38,0) (exact,
  * order-independent — a plain BIGINT sum of 60-bit digests would
  * overflow silently on Spark and promote to HUGEINT on DuckDB);
  * varint sizes use the integer floor-log2 device (`length(bin(x))`,
  * identical on both engines); the only floating-point ops are terminal
  * divisions of exact integers.
  */
object Integrity extends QueryModule {

  /** 60-bit row digest: first 15 hex chars of md5 as a BIGINT. 15
    * nibbles = 60 bits, so the value is always non-negative and exact
    * in an int64 on both engines.
    */
  private def digest60(sCol: Column): Column =
    conv(substring(md5(sCol), 1, 15), 16, 10).cast("long")

  /** 12-bit position from a salted md5: 3 hex nibbles -> 0..4095,
    * decoded via the same base-16 conv on both engines.
    */
  private def pos12(salt: String, k: Column): Column =
    conv(substring(md5(concat(lit(salt), k.cast("string"))), 1, 3), 16, 10)
      .cast("long")

  private val D38 = DecimalType(38, 0)

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- GDPR/right-to-be-forgotten erasure ledger (round 13): run
      // the erasure (anti-join of the event stream against the
      // deletion-request set — here the deterministic user_id % 97
      // slice standing in for the request table) and publish the
      // per-type ledger a DPO audit reads: rows before, rows erased,
      // distinct users erased, rows after, and the RESIDUAL count of
      // deleted-user rows still present after the erasure — pinned to
      // zero by construction, which is exactly what the audit column
      // is for (a non-zero residual is the bug it exists to catch).
      // The deletion set is a broadcast anti-join at any scale; the
      // ledger is one conditional aggregate per side. ---
      "q_gdpr_erasure" -> ((s, d) => {
        val ev = table(s, d, "events")
          .select(col("event_type"), col("user_id"))
        val isDel = pmod(col("user_id"), lit(97L)) === 0
        val del = ev.filter(isDel).select("user_id").distinct()
        val retained = ev.join(broadcast(del), Seq("user_id"),
          "left_anti")
        val before = ev.groupBy("event_type")
          .agg(count(lit(1)).as("n_before"),
            sum(isDel.cast("long")).cast("long").as("n_erased"),
            countDistinct(when(isDel, col("user_id")))
              .cast("long").as("n_users_erased"))
        val after = retained.groupBy("event_type")
          .agg(count(lit(1)).as("n_after"),
            sum(isDel.cast("long")).cast("long").as("residual"))
        before.join(after, "event_type")
          .select(col("event_type"), col("n_before"), col("n_erased"),
            col("n_users_erased"), col("n_after"), col("residual"))
          .orderBy("event_type")
      }),

      // --- order-independent table checksum: the cross-system data
      // integrity primitive (did the copy/migration/compaction preserve
      // every row?). Each row folds its key+payload columns into a
      // 60-bit md5 digest; per l_returnflag slice the fingerprint is
      // (count, SUM(digest) in DECIMAL(38,0), MIN/MAX digest) —
      // addition is commutative, so the checksum is independent of row
      // order, partitioning, and engine, and two tables compare by
      // comparing 3 rows. Pure map-side scan + one tiny aggregate;
      // at 100 TB this is the cheapest possible full-content audit
      // (no sort, no join, no shuffle beyond 3 groups). The exact
      // DECIMAL(38,0) digest sum is SPLIT into hi/lo int64 columns
      // (div/mod 10^18) for the output: both halves are exact BIGINTs
      // on both engines, so no wide-decimal rendering ever reaches the
      // comparison layer (round-8 artifact flagged the D38 column). ---
      "q_table_checksum" -> ((s, d) => {
        val row = concat_ws("|",
          col("l_orderkey"), col("l_linenumber"),
          col("l_suppkey"), col("l_returnflag"))
        table(s, d, "lineitem")
          .select(col("l_returnflag"), digest60(row).as("dg"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("dg").cast(D38)).as("ck"),
            min("dg").as("dg_min"), max("dg").as("dg_max"))
          // `div` on the non-negative decimal is exact integral
          // division; lo = ck - hi*10^18 stays in [0, 10^18).
          .select(col("l_returnflag"), col("n"),
            expr("CAST(ck div 1000000000000000000 AS BIGINT)")
              .as("checksum_hi"),
            expr("CAST(ck - (ck div 1000000000000000000) * " +
              "CAST(1000000000000000000 AS DECIMAL(38,0)) AS BIGINT)")
              .as("checksum_lo"),
            col("dg_min"), col("dg_max"))
          .orderBy("l_returnflag")
      }),

      // --- range-partition boundary planning (the TeraSort split
      // computation): a deterministic md5 sample (the sample SIZE, not
      // the data size, bounds all downstream work, exactly why
      // global-sort planners sample) is ranked into 32 tiles and each
      // tile's max price becomes a partition upper bound. The gate
      // width DERIVES from the corpus count — keep rows whose 32-bit
      // md5 prefix is ≡ 0 mod 2^b with b = max(bitlen(n) − 13, 0), the
      // smallest power that holds the expected sample under 8192 rows
      // — so the single sample-sized ntile window stays bounded at ANY
      // corpus scale (the round-8 hardcoded 1/256 gate let the sample
      // grow linearly). The count pass is one cheap aggregate
      // broadcast into the map-side gate. The 65536-row TakeOrdered
      // between the gate and the window makes the sample bound
      // STRUCTURAL (the bounded-window plan sweep sees a reducer, not
      // prose): the expected sample is < 8192 with sd ~90, so a 65536
      // cap is 600+ sd out and never bites — and if it somehow did,
      // the cut is deterministic (full ordering key), not arbitrary.
      "q_range_bounds" -> ((s, d) => {
        val li = table(s, d, "lineitem")
        val n1 = li.agg(count(lit(1)).as("nn"))
        val h = conv(substring(md5(concat(lit("rb"),
          col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"))), 1, 8), 16, 10)
          .cast("long")
        val sample = li.crossJoin(broadcast(n1))
          .withColumn("b", greatest(length(bin(col("nn"))) - 13, lit(0)))
          .filter(h % expr("shiftleft(CAST(1 AS BIGINT), b)") === 0)
          .select(col("l_extendedprice").as("price"),
            col("l_orderkey"), col("l_linenumber"))
          .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
          .limit(65536)
        val w = Window.orderBy(col("price"), col("l_orderkey"),
          col("l_linenumber"))
        sample
          .withColumn("tile", ntile(32).over(w).cast("long"))
          .groupBy("tile")
          .agg(count(lit(1)).as("n"), max("price").as("upper_bound"))
          .orderBy("tile")
      }),

      // --- delta-encoding effectiveness audit (storage-layout
      // planning for a 100 TB event log): per event_type, consecutive
      // timestamp deltas (sorted by ts, event_id) are costed as LEB128
      // varints — ceil(bitlen/7) bytes, bitlen via the integer
      // floor-log2 device — and compared with the 8-byte raw encoding.
      // The window partitions by event_type (never global); everything
      // after the lag is a map-side projection + tiny aggregate. ---
      "q_delta_encode" -> ((s, d) => {
        val ev = table(s, d, "events")
          .select(col("event_type"), unix_micros(col("ts")).as("us"),
            col("event_id"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("us"), col("event_id"))
        // Column `/` is double division — floor keeps the varint size
        // in exact integer arithmetic (delta >= 0 here).
        val vbytes = when(col("delta") === 0, 1L)
          .otherwise(floor((length(bin(col("delta"))) + lit(6)) / lit(7)))
          .cast("long")
        ev.withColumn("delta", col("us") - lag("us", 1).over(w))
          .filter(col("delta").isNotNull)
          .select(col("event_type"), col("delta"), vbytes.as("vb"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_deltas"),
            max("delta").as("max_delta_us"),
            sum(col("vb")).as("delta_bytes"),
            (count(lit(1)) * 8).as("raw_bytes"))
          .withColumn("compression",
            col("raw_bytes").cast("double") / col("delta_bytes"))
          .orderBy("event_type")
      }),

      // --- Bloom-filter false-positive-rate audit with a PORTABLE
      // filter: k=3 positions per key from salted md5s into m=4096
      // bits, so filter construction is reproducible bit-for-bit on
      // any engine (unlike engine-native bloom_filter_agg, whose
      // layout is opaque). Build = even supplier keys; probes = all
      // part keys (mostly absent — the population that exposes FPR).
      // The filter is a DISTINCT position set (≤150 rows) broadcast
      // into the probe join; measured FPR comes out as one terminal
      // division of exact counts. The shape is what a runtime-filter
      // planner needs to validate a bloom push-down's selectivity. ---
      "q_bloom_audit" -> ((s, d) => {
        val build = table(s, d, "supplier")
          .filter(col("s_suppkey") % 2 === 0)
          .select(col("s_suppkey").as("bkey"))
        val js = Seq(1, 2, 3)
        def positions(k: Column): Column =
          array(js.map(j => pos12(s"bf$j-", k)): _*)
        val filterBits = build
          .select(explode(positions(col("bkey"))).as("pos")).distinct()
        val probes = table(s, d, "part")
          .select(col("p_partkey").as("pkey"))
        val probePos = probes
          .select(col("pkey"), explode(positions(col("pkey"))).as("pos"))
        val maybe = probePos.join(broadcast(filterBits), "pos")
          .groupBy("pkey").agg(count(lit(1)).as("hits"))
          .filter(col("hits") === 3).select(col("pkey"))
        val member = probes.join(build, probes("pkey") === build("bkey"),
          "left_semi")
        val nBits = filterBits.agg(count(lit(1)).as("bits_set"))
        val nProbe = probes.agg(count(lit(1)).as("n_probes"))
        val nMaybe = maybe.agg(count(lit(1)).as("n_maybe"))
        val nMember = member.agg(count(lit(1)).as("n_member"))
        nBits.crossJoin(nProbe).crossJoin(nMaybe).crossJoin(nMember)
          .select(col("bits_set"), col("n_probes"), col("n_maybe"),
            col("n_member"),
            (col("n_maybe") - col("n_member")).as("n_false_pos"),
            ((col("n_maybe") - col("n_member")).cast("double") /
              (col("n_probes") - col("n_member"))).as("fpr"))
      }),

      // --- Bloom sizing curve (round 10): the q_bloom_audit filter
      // re-measured at m ∈ {1024, 4096, 16384} bits — how observed FPR
      // falls as bits-per-key grow, the sizing table a runtime-filter
      // planner consults BEFORE committing a bloom push-down budget.
      // Positions come from 8 salted md5 nibbles mod m (portable: the
      // same base-16 conv on both engines; mod of a nonneg 32-bit
      // value agrees everywhere); each config's filter is a DISTINCT
      // (m, pos) set small enough to broadcast forever (≤ m bits);
      // probes fan out map-side over 3 salts × 3 configs; FPR is one
      // terminal division of exact counts per config. O(configs)
      // rows. ---
      "q_bloom_fpr_curve" -> ((s, d) => {
        val ms = Seq(1024L, 4096L, 16384L)
        val js = Seq(1, 2, 3)
        def pos32(salt: String, k: Column): Column =
          conv(substring(md5(concat(lit(salt), k.cast("string"))), 1, 8),
            16, 10).cast("long")
        def positions(k: Column, m: Long): Column =
          array(js.map(j => pos32(s"bf$j-", k) % m): _*)
        val build = table(s, d, "supplier")
          .filter(col("s_suppkey") % 2 === 0)
          .select(col("s_suppkey").as("bkey"))
        val probes = table(s, d, "part")
          .select(col("p_partkey").as("pkey"))
        val nMember = probes.join(build,
            probes("pkey") === build("bkey"), "left_semi")
          .agg(count(lit(1)).as("n_member"))
        val nProbe = probes.agg(count(lit(1)).as("n_probes"))
        val perConfig = ms.map { m =>
          val fbits = build
            .select(explode(positions(col("bkey"), m)).as("pos"))
            .distinct()
          val maybe = probes
            .select(col("pkey"), explode(positions(col("pkey"), m))
              .as("pos"))
            .join(broadcast(fbits), "pos")
            .groupBy("pkey").agg(count(lit(1)).as("hits"))
            .filter(col("hits") === 3)
          val bits = fbits.agg(count(lit(1)).as("bits_set"))
          val nMaybe = maybe.agg(count(lit(1)).as("n_maybe"))
          bits.crossJoin(nMaybe).select(lit(m).as("m_bits"),
            col("bits_set"), col("n_maybe"))
        }.reduce(_ unionByName _)
        perConfig.crossJoin(broadcast(nProbe))
          .crossJoin(broadcast(nMember))
          .select(col("m_bits"), col("bits_set"), col("n_maybe"),
            (col("n_maybe") - col("n_member")).as("n_false_pos"),
            ((col("n_maybe") - col("n_member")).cast("double") /
              (col("n_probes") - col("n_member"))).as("fpr"))
          .orderBy("m_bits")
      }),

      // --- column-encoding advisor (the ANALYZE pass a lakehouse
      // writer runs to pick dictionary vs RLE vs plain per column):
      // per column, distinct cardinality + adjacent-value runs
      // counted WITHIN order-key partitions (exactly what a writer
      // sees per row group — and what keeps the run windows
      // partitioned rather than a global sort). Numeric columns
      // quantize to int64 so no float ever renders to a string;
      // the advice thresholds are integer compares. ---
      "q_encoding_advise" -> ((s, d) => {
        val li = table(s, d, "lineitem")
        def colStats(name: String, v: Column): DataFrame = {
          val w = Window.partitionBy("l_orderkey")
            .orderBy(col("l_linenumber"), col("v"))
          li.select(col("l_orderkey"), col("l_linenumber"), v.as("v"))
            .withColumn("isrun",
              when(lag("v", 1).over(w).isNull ||
                lag("v", 1).over(w) =!= col("v"), 1L).otherwise(0L))
            .agg(count(lit(1)).as("n"),
              countDistinct("v").as("n_distinct"),
              sum("isrun").as("n_runs"))
            .select(lit(name).as("column"), col("n"), col("n_distinct"),
              col("n_runs"),
              (col("n").cast("double") / col("n_runs"))
                .as("avg_run_len"),
              when(col("n_distinct") <= 64, "dict")
                .when(col("n_runs") * 2 <= col("n"), "rle")
                .otherwise("plain").as("advise"))
        }
        colStats("l_returnflag", col("l_returnflag"))
          .unionByName(colStats("l_linestatus", col("l_linestatus")))
          .unionByName(colStats("l_quantity",
            round(col("l_quantity") * 100, 0).cast("long")
              .cast("string")))
          .unionByName(colStats("l_extendedprice",
            round(col("l_extendedprice") * 100, 0).cast("long")
              .cast("string")))
          .orderBy("column")
      }),

      // --- partition-size planner (the repartition advisor behind
      // every "small files" and "2 GB task" ticket): exact int64
      // byte estimate per table — 8 bytes per numeric/timestamp +
      // actual string lengths, summed exactly — then advised file
      // count = ceil(bytes / 128 MiB) in pure integer arithmetic.
      // One scan per table, 1-row outputs unioned. ---
      "q_partition_plan" -> ((s, d) => {
        val target = 134217728L
        def plan(name: String, bytesPerRow: Column): DataFrame =
          table(s, d, name)
            .agg(count(lit(1)).as("n_rows"),
              sum(bytesPerRow.cast("long")).as("est_bytes"))
            .select(lit(name).as("tbl"), col("n_rows"), col("est_bytes"),
              (col("est_bytes").cast("double") / col("n_rows"))
                .as("est_row_bytes"),
              // `div`, not `/`: the file count is exact integer
              // ceiling division, never an FP rounding
              expr(s"(est_bytes + $target - 1) div $target")
                .cast("long").as("advised_files"))
        plan("lineitem",
          lit(8L * 8) + length(col("l_returnflag"))
            + length(col("l_linestatus")))
          .unionByName(plan("orders",
            lit(8L * 4) + length(col("o_orderstatus"))
              + length(col("o_orderpriority"))))
          .unionByName(plan("customer",
            lit(8L * 3) + length(col("c_name"))
              + length(col("c_mktsegment"))))
          .orderBy("tbl")
      }),

      // --- temporal train/test split with an embargo gap: the
      // leakage-safe split for time-series training data (a random
      // split leaks future into past; the embargo absorbs label
      // horizons that straddle the cut). Cuts at 70% and 80% of the
      // observed span in exact integer microseconds; the two-row
      // bounds aggregate broadcasts into a map-side CASE, so the
      // split is one scan + one tiny aggregate at any scale. ---
      "q_temporal_split" -> ((s, d) => {
        val ev = table(s, d, "events")
          .select(col("event_type"), unix_micros(col("ts")).as("us"))
        val bounds = ev.agg(min("us").as("t0"), max("us").as("t1"))
        // `div`, not `/`: the cuts must be exact integer microseconds
        // (the oracle's `// 10`), never a double rounding away from it.
        val split = when(
          col("us") < col("t0") + expr("(t1 - t0) * 7 div 10"), "train")
          .when(col("us") < col("t0") + expr("(t1 - t0) * 8 div 10"),
            "embargo")
          .otherwise("test")
        ev.crossJoin(broadcast(bounds))
          .select(col("event_type"), split.as("split"))
          .groupBy("split", "event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("split", "event_type")
      }))

  override def oracle: Map[String, String] = Map(

    "q_gdpr_erasure" ->
      """WITH ev AS (SELECT event_type, user_id FROM events),
        |b AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_before,
        |    CAST(SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_erased,
        |    CAST(COUNT(DISTINCT CASE WHEN user_id % 97 = 0
        |      THEN user_id END) AS BIGINT) AS n_users_erased
        |  FROM ev GROUP BY event_type),
        |r AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_after,
        |    CAST(SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS residual
        |  FROM ev WHERE user_id % 97 <> 0 GROUP BY event_type)
        |SELECT event_type, n_before, n_erased, n_users_erased,
        |  n_after, residual
        |FROM b JOIN r USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "q_bloom_fpr_curve" -> {
      // single-line on purpose: this fragment is interpolated into a
      // stripMargin string below, and a continuation line starting
      // with "||" would lose its first pipe to that second strip
      def h(key: String): String =
        "CAST(list_sum([CAST(strpos('0123456789abcdef', " +
          s"substr(md5('bf' || CAST(j AS VARCHAR) || '-' || " +
          s"CAST($key AS VARCHAR)), i, 1)) - 1 AS BIGINT) " +
          "<< (4 * (8 - i)) for i in range(1, 9)]) AS BIGINT)"
      s"""WITH ms AS (SELECT m FROM (VALUES (1024), (4096), (16384))
         |    t(m)),
         |pos3 AS (SELECT j FROM (VALUES (1), (2), (3)) t(j)),
         |build AS (SELECT s_suppkey AS bkey FROM supplier
         |  WHERE s_suppkey % 2 = 0),
         |probes AS (SELECT p_partkey AS pkey FROM part),
         |fb AS (SELECT DISTINCT m, ${h("bkey")} % m AS pos
         |  FROM build CROSS JOIN pos3 CROSS JOIN ms),
         |pp AS (SELECT pkey, m, ${h("pkey")} % m AS pos
         |  FROM probes CROSS JOIN pos3 CROSS JOIN ms),
         |maybe AS (SELECT m, pkey FROM pp JOIN fb USING (m, pos)
         |  GROUP BY m, pkey HAVING COUNT(*) = 3),
         |bits AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS bits_set
         |  FROM fb GROUP BY m),
         |mb AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n_maybe
         |  FROM maybe GROUP BY m),
         |g AS (SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM probes
         |   WHERE pkey IN (SELECT bkey FROM build)) AS n_member)
         |SELECT CAST(m AS BIGINT) AS m_bits, bits_set,
         |  COALESCE(n_maybe, 0) AS n_maybe,
         |  COALESCE(n_maybe, 0) - n_member AS n_false_pos,
         |  CAST(COALESCE(n_maybe, 0) - n_member AS DOUBLE) /
         |    (n_probes - n_member) AS fpr
         |FROM bits LEFT JOIN mb USING (m) CROSS JOIN g
         |ORDER BY m_bits""".stripMargin
    },

    "q_table_checksum" ->
      """WITH r AS (SELECT l_returnflag,
        |  CAST(list_sum([CAST(strpos('0123456789abcdef',
        |        substr(md5(concat_ws('|', l_orderkey, l_linenumber,
        |          l_suppkey, l_returnflag)), i, 1)) - 1 AS BIGINT)
        |      << (4 * (15 - i)) for i in range(1, 16)]) AS BIGINT) AS dg
        |  FROM lineitem),
        |g AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(dg AS HUGEINT)) AS HUGEINT) AS ck,
        |    MIN(dg) AS dg_min, MAX(dg) AS dg_max
        |  FROM r GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(ck // 1000000000000000000 AS BIGINT) AS checksum_hi,
        |  CAST(ck % 1000000000000000000 AS BIGINT) AS checksum_lo,
        |  dg_min, dg_max
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "q_range_bounds" ->
      """WITH bb AS (SELECT greatest(length(bin(CAST(COUNT(*) AS BIGINT)))
        |    - 13, 0) AS b FROM lineitem),
        |s AS (SELECT l_extendedprice AS price, l_orderkey,
        |    l_linenumber FROM lineitem CROSS JOIN bb
        |  WHERE CAST(list_sum([CAST(strpos('0123456789abcdef',
        |        substr(md5('rb' || CAST(l_orderkey AS VARCHAR) || '-'
        |          || CAST(l_linenumber AS VARCHAR)), i, 1)) - 1 AS BIGINT)
        |      << (4 * (8 - i)) for i in range(1, 9)]) AS BIGINT)
        |    % (CAST(1 AS BIGINT) << b) = 0
        |  ORDER BY price, l_orderkey, l_linenumber LIMIT 65536),
        |t AS (SELECT price, CAST(ntile(32) OVER (ORDER BY price,
        |    l_orderkey, l_linenumber) AS BIGINT) AS tile FROM s)
        |SELECT tile, CAST(COUNT(*) AS BIGINT) AS n,
        |  MAX(price) AS upper_bound
        |FROM t GROUP BY tile ORDER BY tile""".stripMargin,

    "q_delta_encode" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id
        |  FROM events),
        |dl AS (SELECT event_type,
        |    us - lag(us) OVER (PARTITION BY event_type
        |      ORDER BY us, event_id) AS delta
        |  FROM e),
        |v AS (SELECT event_type, delta,
        |    CASE WHEN delta = 0 THEN 1
        |      ELSE CAST((length(bin(delta)) + 6) // 7 AS BIGINT)
        |    END AS vb
        |  FROM dl WHERE delta IS NOT NULL)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_deltas,
        |  MAX(delta) AS max_delta_us,
        |  CAST(SUM(vb) AS BIGINT) AS delta_bytes,
        |  CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
        |  CAST(COUNT(*) * 8 AS DOUBLE) / CAST(SUM(vb) AS DOUBLE)
        |    AS compression
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_bloom_audit" ->
      """WITH build AS (SELECT s_suppkey AS bkey FROM supplier
        |    WHERE s_suppkey % 2 = 0),
        |pos3 AS (SELECT j FROM (VALUES (1), (2), (3)) AS t(j)),
        |fbits AS (SELECT DISTINCT
        |    CAST(list_sum([CAST(strpos('0123456789abcdef',
        |          substr(md5('bf' || CAST(j AS VARCHAR) || '-'
        |            || CAST(bkey AS VARCHAR)), i, 1)) - 1 AS BIGINT)
        |        << (4 * (3 - i)) for i in range(1, 4)]) AS BIGINT)
        |      AS pos
        |  FROM build CROSS JOIN pos3),
        |probes AS (SELECT p_partkey AS pkey FROM part),
        |ppos AS (SELECT pkey,
        |    CAST(list_sum([CAST(strpos('0123456789abcdef',
        |          substr(md5('bf' || CAST(j AS VARCHAR) || '-'
        |            || CAST(pkey AS VARCHAR)), i, 1)) - 1 AS BIGINT)
        |        << (4 * (3 - i)) for i in range(1, 4)]) AS BIGINT)
        |      AS pos
        |  FROM probes CROSS JOIN pos3),
        |maybe AS (SELECT pkey FROM ppos JOIN fbits USING (pos)
        |  GROUP BY pkey HAVING COUNT(*) = 3),
        |mem AS (SELECT pkey FROM probes
        |  WHERE pkey IN (SELECT bkey FROM build)),
        |c AS (SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fbits) AS bits_set,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM maybe) AS n_maybe,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM mem) AS n_member)
        |SELECT bits_set, n_probes, n_maybe, n_member,
        |  n_maybe - n_member AS n_false_pos,
        |  CAST(n_maybe - n_member AS DOUBLE)
        |    / (n_probes - n_member) AS fpr
        |FROM c""".stripMargin,

    "q_encoding_advise" -> {
      def colSql(name: String, v: String): String =
        s"""SELECT '$name' AS "column", CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
           |  CAST(SUM(isrun) AS BIGINT) AS n_runs,
           |  CAST(COUNT(*) AS DOUBLE) / SUM(isrun) AS avg_run_len,
           |  CASE WHEN COUNT(DISTINCT v) <= 64 THEN 'dict'
           |       WHEN SUM(isrun) * 2 <= COUNT(*) THEN 'rle'
           |       ELSE 'plain' END AS advise
           |FROM (SELECT v, CASE WHEN lag(v) OVER w IS NULL
           |      OR lag(v) OVER w <> v THEN 1 ELSE 0 END AS isrun
           |  FROM (SELECT l_orderkey, l_linenumber, $v AS v
           |        FROM lineitem)
           |  WINDOW w AS (PARTITION BY l_orderkey
           |    ORDER BY l_linenumber, v))""".stripMargin
      Seq(
        colSql("l_returnflag", "l_returnflag"),
        colSql("l_linestatus", "l_linestatus"),
        colSql("l_quantity",
          "CAST(CAST(round(l_quantity * 100, 0) AS BIGINT) AS VARCHAR)"),
        colSql("l_extendedprice",
          "CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS VARCHAR)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    "q_partition_plan" -> {
      def planSql(name: String, bytes: String): String =
        s"""SELECT '$name' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM($bytes) AS BIGINT) AS est_bytes,
           |  CAST(SUM($bytes) AS DOUBLE) / COUNT(*) AS est_row_bytes,
           |  CAST((SUM($bytes) + 134217727) // 134217728 AS BIGINT)
           |    AS advised_files
           |FROM $name""".stripMargin
      Seq(
        planSql("lineitem",
          "64 + length(l_returnflag) + length(l_linestatus)"),
        planSql("orders",
          "32 + length(o_orderstatus) + length(o_orderpriority)"),
        planSql("customer",
          "24 + length(c_name) + length(c_mktsegment)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY tbl")
    },

    "q_temporal_split" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |b AS (SELECT MIN(us) AS t0, MAX(us) AS t1 FROM e),
        |s AS (SELECT event_type,
        |    CASE WHEN us < t0 + (t1 - t0) * 7 // 10 THEN 'train'
        |         WHEN us < t0 + (t1 - t0) * 8 // 10 THEN 'embargo'
        |         ELSE 'test' END AS split
        |  FROM e CROSS JOIN b)
        |SELECT split, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM s GROUP BY split, event_type
        |ORDER BY split, event_type""".stripMargin)
}
