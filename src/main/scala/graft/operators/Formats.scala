package graft.operators

import graft.Det._
import graft.QueryModule
import graft.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source/sink format surface beyond parquet: CSV and JSON text sources,
  * the ORC columnar source, and a partition-pruned parquet sink — the
  * formats a training-data pipeline actually ingests from (web-scraped
  * text ships as JSONL/CSV far more often than parquet) and the layout
  * it publishes to (date/key-partitioned directories).
  *
  * Each `q_source_*` query round-trips a driver table through the format
  * once (cached on tmpfs, fingerprint-keyed like the bucketed-join
  * tables) and then runs an aggregation over the re-read copy; the
  * DuckDB oracle runs the same aggregation over the ORIGINAL parquet, so
  * a hash match proves end-to-end type fidelity through the text format
  * (long/double/string survive: Spark prints doubles in shortest-
  * round-trip form, so re-parsing is bit-exact). The write is setup, not
  * the operator — Bench pre-warms it the way it pre-warms the bucketed
  * tables (write once, read forever is the fleet shape).
  */
object Formats extends QueryModule {

  /** Fill a fingerprint-keyed tmpfs cache directory exactly once, safely
    * under concurrent writers and dataset regeneration:
    *   - stale fingerprints (same `<prefix>_` name, different hash) are
    *     pruned before writing, so regenerated datasets don't accumulate
    *     dead copies in RAM-backed tmpfs;
    *   - the write lands in a dot-prefixed temp dir (excluded from the
    *     prune glob) and is atomically renamed into place, so a second
    *     JVM prewarming the same path concurrently either wins the rename
    *     or discards its temp copy — it can never observe a half-written
    *     directory with `_SUCCESS` missing-but-imminent.
    */
  private def fillCache(path: String)(write: String => Unit): String = {
    val dir = new java.io.File(path)
    // A complete cache has the _SUCCESS marker AND at least one data
    // file: tmpfs under memory pressure can evict files from a dir that
    // keeps its marker, and reading such a husk fails analysis ("unable
    // to infer schema") on every later query — treat it as absent.
    def complete(f: java.io.File): Boolean =
      new java.io.File(f, "_SUCCESS").exists() &&
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .exists(x => !x.getName.startsWith("_") && !x.getName.startsWith("."))
    if (!complete(dir)) {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
      val parent = dir.getParentFile
      parent.mkdirs()
      val prefix = dir.getName.substring(0, dir.getName.lastIndexOf('_') + 1)
      Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith(prefix) && f.getName != dir.getName)
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      val tmp = new java.io.File(parent,
        "." + dir.getName + ".tmp-" + ProcessHandle.current().pid())
      write(tmp.getAbsolutePath)
      if (!tmp.renameTo(dir)) {
        // Lost the fill race (or a crashed run left a partial target):
        // if the winner's copy is complete use it, else replace it.
        if (complete(dir))
          org.apache.commons.io.FileUtils.deleteQuietly(tmp)
        else {
          org.apache.commons.io.FileUtils.deleteQuietly(dir)
          if (!tmp.renameTo(dir))
            org.apache.commons.io.FileUtils.deleteQuietly(tmp)
        }
      }
    }
    path
  }

  /** One-time format round-trip of `name`, cached per (dataset, format)
    * on tmpfs; returns the written directory.
    */
  private[graft] def roundtrip(s: SparkSession, d: String, name: String,
      fmt: String, options: Map[String, String] = Map.empty): String =
    fillCache(
      s"${graft.Scratch.root}/graft_fmt/${name}_${fmt}_${Advanced.fingerprint(d, name)}") {
      tmp =>
        table(s, d, name).write.format(fmt).options(options)
          .mode("overwrite").save(tmp)
    }

  private[graft] val JsonTsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  private[graft] def csvDir(s: SparkSession, d: String): String =
    roundtrip(s, d, "customer", "csv", Map("header" -> "true"))
  private[graft] def jsonDir(s: SparkSession, d: String): String =
    roundtrip(s, d, "events", "json", Map("timestampFormat" -> JsonTsFmt))
  private[graft] def orcDir(s: SparkSession, d: String): String =
    roundtrip(s, d, "lineitem", "orc")

  /** Materialize all format round-trips once — Bench calls this before
    * timing so the queries measure the steady-state read, matching the
    * write-once/read-forever fleet shape (same rationale as the
    * bucketed-table prewarm).
    */
  private[graft] def prewarm(s: SparkSession, d: String): Unit = {
    csvDir(s, d); jsonDir(s, d); orcDir(s, d); partitionedOrders(s, d)
    evolvedOrders(s, d); logDir(s, d)
    ()
  }

  /** JSONL rendering of customer where an md5-gated ~1/16 of rows are
    * TRUNCATED mid-object — the corrupt-record ingestion fixture
    * (every large crawl delivery contains malformed lines; the gate
    * makes the corruption deterministic so the oracle can count it
    * from the clean table without parsing anything).
    */
  private[graft] def malformedDir(s: SparkSession, d: String): String =
    fillCache(s"${graft.Scratch.root}/graft_fmt/cust_badjson_${
      Advanced.fingerprint(d, "customer")}") { tmp =>
      val gate = substring(md5(concat(lit("bad"),
        col("c_custkey").cast("string"))), 1, 1) === "0"
      table(s, d, "customer")
        .select(when(gate,
            concat(lit("{\"c_custkey\": "),
              col("c_custkey").cast("string"),
              lit(", \"c_acctbal\": tru")))
          .otherwise(to_json(struct(col("c_custkey"), col("c_name"),
            col("c_acctbal")))).as("value"))
        .write.mode("overwrite").text(tmp)
    }

  /** Apache-combined-style access-log rendering of orders: the raw-TEXT
    * ingestion fixture (one line per order, written through the real
    * `text` sink). All embedded fields are integer/string-exact — the
    * synthetic status/bytes derive from int arithmetic, never a
    * double cast (Spark truncates double->long, DuckDB rounds).
    */
  private[graft] def logLine: org.apache.spark.sql.Column = format_string(
    "cust-%d - - [%s] \"GET /orders/%d HTTP/1.1\" %d %d",
    col("o_custkey"),
    date_format(col("o_orderdate"), "dd/MMM/yyyy:HH:mm:ss"),
    col("o_orderkey"),
    when(col("o_orderstatus") === "F", 200L)
      .when(col("o_orderstatus") === "O", 302L).otherwise(404L),
    pmod(col("o_orderkey") * 7, lit(100000L)))

  private[graft] def logDir(s: SparkSession, d: String): String =
    fillCache(
      s"${graft.Scratch.root}/graft_fmt/orders_log_${Advanced.fingerprint(d, "orders")}") {
      tmp =>
        table(s, d, "orders").select(logLine.as("value"))
          .write.mode("overwrite").text(tmp)
    }

  /** One-time two-epoch publish of `orders` where epoch 1's schema grew
    * a column (o_orderpriority) that epoch 0 lacks — the layout every
    * long-lived dataset ends up with after a schema migration. Hive-
    * style `epoch=N/` directories, cached on tmpfs.
    */
  private[graft] def evolvedOrders(s: SparkSession, d: String): String =
    fillCache(
      s"${graft.Scratch.root}/graft_fmt/orders_evo_${Advanced.fingerprint(d, "orders")}") {
      tmp =>
        val o = table(s, d, "orders")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$tmp/epoch=0")
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .write.mode("overwrite").parquet(s"$tmp/epoch=1")
        // top-level completion marker for fillCache's done-check (the
        // per-epoch writes leave theirs inside the epoch dirs)
        new java.io.File(tmp, "_SUCCESS").createNewFile()
        ()
    }

  /** One-time partitioned-parquet publish of `orders` by order year,
    * cached on tmpfs; returns the written directory. Hive-style
    * `o_year=YYYY/` directories — the layout partition pruning needs.
    */
  private[graft] def partitionedOrders(s: SparkSession, d: String): String =
    fillCache(
      s"${graft.Scratch.root}/graft_fmt/orders_part_${Advanced.fingerprint(d, "orders")}") {
      tmp =>
        table(s, d, "orders")
          .withColumn("o_year", year(col("o_orderdate")))
          .write.partitionBy("o_year")
          .mode("overwrite").parquet(tmp)
    }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- small-file compaction planner: bin-pack each source's
    // documents into ~2000-char output files in stable doc_id order —
    // the table-maintenance pass every 100 TB lake runs (billions of
    // tiny crawl files → fewer right-sized ones). The exclusive prefix
    // sum runs as a per-source window (partitioned, streams through the
    // frame — never a global sort); the bin id is integer division of
    // the prefix, so the plan is reproducible row-for-row, and the
    // per-bin rollup collapses map-side. At fleet scale the window
    // state is one running long per source partition. ---
    "q_compaction_plan" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, d, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("cum", sum("n_chars").over(w))
        .withColumn("bin", expr("(cum - n_chars) div 2000"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          min("doc_id").as("doc_lo"), max("doc_id").as("doc_hi"))
        .orderBy("source", "bin")
    }),

    // --- zone-map pruning audit: for the compaction plan's bins,
    // compute min/max zone maps on the clustering key (doc_id) and on
    // an uncorrelated column (n_chars), then how many bins two
    // predicates could SKIP — the data-skipping readout that tells a
    // lake operator whether a sort/Z-order pays before they run it
    // (companion to q_zorder_cluster). Everything reduces map-side to
    // the O(bins) zone-map relation; the actual matching row counts
    // ride the same aggregate pass as conditional sums, so the corpus
    // is scanned once. The clustered predicate skips most bins; the
    // uncorrelated one almost none — that asymmetry IS the result. ---
    "q_zonemap_prune" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val zm = table(s, d, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("cum", sum("n_chars").over(w))
        .withColumn("bin", expr("(cum - n_chars) div 2000"))
        .groupBy("source", "bin")
        .agg(min("doc_id").as("id_lo"), max("doc_id").as("id_hi"),
          max("n_chars").as("len_hi"),
          sum(col("doc_id").between(10, 30).cast("long")).as("rows_id"),
          sum((col("n_chars") > 400).cast("long")).as("rows_len"))
      zm.groupBy("source")
        .agg(count(lit(1)).as("n_bins"),
          sum((col("id_hi") < 10 || col("id_lo") > 30).cast("long"))
            .as("skip_id"),
          sum((col("len_hi") <= 400).cast("long")).as("skip_len"),
          sum("rows_id").as("rows_id"), sum("rows_len").as("rows_len"))
        .orderBy("source")
    }),

    // --- snapshot-retention planner: which daily snapshots does the
    // lake's expiry policy keep, and how many bytes does expiry
    // reclaim? Policy = the standard two-rule ladder: keep the trailing
    // 7 days unconditionally, plus the first snapshot of each ISO week
    // as a long-horizon anchor. One aggregate pass reduces the corpus
    // to the O(days) snapshot relation (count + payload-byte proxy);
    // recency rank and week-anchor flags are windows over that
    // time-sized relation (days, not data — the same defense as the
    // hour spines), with the anchor window partitioned by week. The
    // decision column is pure integer logic, so the plan is
    // reproducible; reclaimable bytes fold in the same pass. ---
    "q_retention_expiry" -> ((s, d) => {
      val snaps = table(s, d, "events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_rows"),
          sum(length(col("props")).cast("long")).as("bytes"))
        .withColumn("wk", date_format(
          date_trunc("week", col("day")), "yyyy-MM-dd"))
      val wRecent = Window.orderBy(col("day").desc)
      val wAnchor = Window.partitionBy("wk").orderBy(col("day"))
      snaps
        .withColumn("recency", row_number().over(wRecent).cast("long"))
        .withColumn("wk_rank", row_number().over(wAnchor).cast("long"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day_s"),
          col("n_rows"), col("bytes"), col("recency"),
          when(col("recency") <= 7, "keep_recent")
            .when(col("wk_rank") === 1, "keep_anchor")
            .otherwise("expire").as("action"),
          when(col("recency") > 7 && col("wk_rank") =!= 1, col("bytes"))
            .otherwise(0L).as("reclaim_bytes"))
        .orderBy("day_s")
    }),

    // --- CSV source: schema-explicit read (never inferSchema at scale —
    // inference is a full extra pass over the data) ---
    // --- raw-text log parsing: orders rendered as access-log lines
    // through the real `text` sink, read back with the text SOURCE, and
    // re-structured map-side with regexp_extract — the canonical
    // 100 TB "parse the crawl/server logs" ETL shape (splittable line
    // scan, zero shuffle until the consumer aggregates). IDENTITY
    // oracle: the DuckDB twin renders the same printf line from the
    // base table and must parse back the same fields — so the format
    // string, the date rendering, and the regex dialect are all pinned
    // cross-engine. ---
    "q_log_parse" -> ((s, d) => {
      val path = logDir(s, d)
      val req = "\" ([0-9]+) ([0-9]+)$"
      s.read.text(path)
        .select(
          regexp_extract(col("value"), "/orders/([0-9]+)", 1).cast("long")
            .as("o_orderkey"),
          regexp_extract(col("value"), "^cust-([0-9]+)", 1).cast("long")
            .as("o_custkey"),
          regexp_extract(col("value"), "\\[([^\\]]+)\\]", 1).as("log_ts"),
          regexp_extract(col("value"), req, 1).cast("long").as("status"),
          regexp_extract(col("value"), req, 2).cast("long").as("bytes"))
        .orderBy("o_orderkey")
    }),

    "q_source_csv" -> ((s, d) => {
      val path = roundtrip(s, d, "customer", "csv",
        Map("header" -> "true"))
      val cust = s.read.schema(table(s, d, "customer").schema)
        .option("header", "true").csv(path)
      val n = table(s, d, "nation")
      cust.join(broadcast(n), cust("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"), sumd(col("c_acctbal")).as("bal"))
        .orderBy("n_name")
    }),

    // --- JSON (JSONL) source: the de-facto web-corpus interchange
    // format. timestampFormat pinned to explicit micros on BOTH sides:
    // the default write pattern ([.SSS]) silently truncates to millis,
    // which a round-trip fidelity check exists to catch ---
    "q_source_json" -> ((s, d) => {
      val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
      val path = roundtrip(s, d, "events", "json",
        Map("timestampFormat" -> tsFmt))
      val ev = s.read.schema(table(s, d, "events").schema)
        .option("timestampFormat", tsFmt).json(path)
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sumd(col("value")).as("total"),
          fmtTs(max(col("ts"))).as("last_ts"))
        .orderBy("event_type")
    }),

    // --- schema evolution across parquet epochs: mergeSchema unions the
    // two epochs' schemas at planning time, epoch-0 rows surface the
    // migrated-in column as NULL, and the Hive-style epoch= directory
    // name materializes as a partition column — the read path every
    // long-lived dataset needs after a schema migration, proven
    // end-to-end by hash-matching an aggregate that touches the
    // backfilled nulls, the survivor column, and the discovered
    // partition key. (mergeSchema costs one footer read per file at
    // planning, nothing at execution — at fleet scale you pin the
    // merged schema in a catalog instead; the execution plan is
    // identical.) ---
    // --- PERMISSIVE malformed-JSONL ingestion (the corrupt-record
    // machinery every crawl loader needs: bad lines must be COUNTED
    // and quarantined, never abort the job and never silently drop):
    // the reader parses with a fixed schema + _corrupt capture
    // column; the report is one conditional-aggregate pass — rows,
    // corrupt rows, corrupt share, and the balance sum over the
    // clean rows only. The oracle reproduces every number from the
    // clean table via the same md5 gate — no JSON parsing at all,
    // which is exactly why the corruption is hash-gated. ---
    "q_source_malformed" -> ((s, d) => {
      val path = malformedDir(s, d)
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType),
        StructField("_corrupt", StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L))
            .as("n_corrupt"),
          sum(when(col("_corrupt").isNull, 1L).otherwise(0L))
            .as("n_good"),
          sum(when(col("_corrupt").isNull, dec(col("c_acctbal")))
            .otherwise(lit(0).cast(D))).cast("double")
            .as("good_bal"))
        .withColumn("corrupt_share",
          col("n_corrupt").cast("double") / col("n_rows"))
    }),

    "q_source_evolved" -> ((s, d) => {
      val path = evolvedOrders(s, d)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("epoch").cast("long").as("epoch"),
          coalesce(col("o_orderpriority"), lit("unknown")).as("prio"))
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("rev"))
        .orderBy("epoch", "prio")
    }),

    // --- ORC source: the other columnar format Spark ships natively ---
    "q_source_orc" -> ((s, d) => {
      val path = roundtrip(s, d, "lineitem", "orc")
      s.read.orc(path)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // --- partitioned sink + partition pruning: orders published as
    // o_year=YYYY/ directories; the year filter prunes to ONE partition
    // directory at planning time (PlanQualitySpec pins PartitionFilters
    // in the scan) — at fleet scale this is reading 1/7th of the table
    // because the other 6/7ths were never listed, the single highest-
    // leverage scan optimization there is. ---
    "q_sink_partitioned" -> ((s, d) => {
      val path = partitionedOrders(s, d)
      s.read.parquet(path)
        .filter(col("o_year") === 1995)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("rev"))
        .orderBy("o_orderpriority")
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_zonemap_prune" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents),
        |zm AS (
        |  SELECT source, (cum - n_chars) // 2000 AS bin,
        |    MIN(doc_id) AS id_lo, MAX(doc_id) AS id_hi,
        |    MAX(n_chars) AS len_hi,
        |    SUM(CASE WHEN doc_id BETWEEN 10 AND 30 THEN 1 ELSE 0 END)
        |      AS rows_id,
        |    SUM(CASE WHEN n_chars > 400 THEN 1 ELSE 0 END) AS rows_len
        |  FROM c GROUP BY 1, 2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bins,
        |  CAST(SUM(CASE WHEN id_hi < 10 OR id_lo > 30 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS skip_id,
        |  CAST(SUM(CASE WHEN len_hi <= 400 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS skip_len,
        |  CAST(SUM(rows_id) AS BIGINT) AS rows_id,
        |  CAST(SUM(rows_len) AS BIGINT) AS rows_len
        |FROM zm GROUP BY source ORDER BY source""".stripMargin,

    "q_retention_expiry" ->
      """WITH snaps AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(length(props)) AS BIGINT) AS bytes
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT day, n_rows, bytes,
        |    CAST(row_number() OVER (ORDER BY day DESC) AS BIGINT)
        |      AS recency,
        |    CAST(row_number() OVER (PARTITION BY date_trunc('week', day)
        |      ORDER BY day) AS BIGINT) AS wk_rank
        |  FROM snaps)
        |SELECT strftime(day, '%Y-%m-%d') AS day_s, n_rows, bytes, recency,
        |  CASE WHEN recency <= 7 THEN 'keep_recent'
        |       WHEN wk_rank = 1 THEN 'keep_anchor'
        |       ELSE 'expire' END AS action,
        |  CASE WHEN recency > 7 AND wk_rank <> 1 THEN bytes
        |       ELSE 0 END AS reclaim_bytes
        |FROM r ORDER BY day_s""".stripMargin,

    "q_compaction_plan" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents)
        |-- cum is a windowed SUM(BIGINT) -> HUGEINT in DuckDB, and // keeps
        |-- the width; cast back so bin hashes as the BIGINT Spark emits
        |SELECT source, CAST((cum - n_chars) // 2000 AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(doc_id) AS doc_lo, MAX(doc_id) AS doc_hi
        |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,

    // The oracle counts the md5-gated corruption from the CLEAN table —
    // the gate is the ground truth the reader's corrupt-record capture
    // must reproduce.
    "q_source_malformed" ->
      """WITH g AS (SELECT c_acctbal,
        |    substr(md5('bad' || CAST(c_custkey AS VARCHAR)), 1, 1) = '0'
        |      AS bad
        |  FROM customer)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_corrupt,
        |  CAST(SUM(CASE WHEN bad THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_good,
        |  CAST(SUM(CASE WHEN bad THEN CAST(0 AS DECIMAL(18,4))
        |    ELSE CAST(c_acctbal AS DECIMAL(18,4)) END) AS DOUBLE)
        |    AS good_bal,
        |  CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS corrupt_share
        |FROM g""".stripMargin,

    "q_source_evolved" ->
      s"""SELECT CAST(o_orderkey % 2 AS BIGINT) AS epoch,
         |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
         |       ELSE 'unknown' END AS prio,
         |  COUNT(*) AS n, ${S("o_totalprice")} AS rev
         |FROM orders GROUP BY 1, 2 ORDER BY epoch, prio""".stripMargin,

    "q_log_parse" ->
      """WITH l AS (SELECT printf(
        |    'cust-%d - - [%s] "GET /orders/%d HTTP/1.1" %d %d',
        |    o_custkey,
        |    strftime(o_orderdate, '%d/%b/%Y:%H:%M:%S'),
        |    o_orderkey,
        |    CASE o_orderstatus WHEN 'F' THEN 200 WHEN 'O' THEN 302
        |      ELSE 404 END,
        |    (o_orderkey * 7) % 100000) AS value
        |  FROM orders)
        |SELECT
        |  CAST(regexp_extract(value, '/orders/([0-9]+)', 1) AS BIGINT)
        |    AS o_orderkey,
        |  CAST(regexp_extract(value, '^cust-([0-9]+)', 1) AS BIGINT)
        |    AS o_custkey,
        |  regexp_extract(value, '\[([^\]]+)\]', 1) AS log_ts,
        |  CAST(regexp_extract(value, '" ([0-9]+) ([0-9]+)$', 1)
        |    AS BIGINT) AS status,
        |  CAST(regexp_extract(value, '" ([0-9]+) ([0-9]+)$', 2)
        |    AS BIGINT) AS bytes
        |FROM l ORDER BY o_orderkey""".stripMargin,

    "q_source_csv" ->
      s"""SELECT n_name, COUNT(*) AS n_cust, ${S("c_acctbal")} AS bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_source_json" ->
      s"""SELECT event_type, COUNT(*) AS n, ${S("value")} AS total,
         |  ${FT("MAX(ts)")} AS last_ts
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_source_orc" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${S("l_quantity")} AS qty
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_sink_partitioned" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  ${S("o_totalprice")} AS rev
         |FROM orders WHERE year(o_orderdate) = 1995
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
