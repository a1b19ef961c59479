package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Record-matching operators (round 9): perceptual-hash near-dup
  * detection over the multimodal corpus (banded hamming blocking — the
  * pHash/aHash image-dedup shape) and Fellegi-Sunter match/unmatch
  * weight estimation (the probabilistic record-linkage scoring model).
  * Both carry full DuckDB oracles.
  *
  * Determinism: digests are md5-derived (4-nibble base-16 decode, the
  * Integrity.pos12 idiom); weights use exact integer/decimal floors of
  * the likelihood ratio (the floor-log2 device), so no libm is in any
  * score path.
  */
object Matching extends QueryModule {

  private val D38 = DecimalType(38, 0)

  /** 15-bit region digest: salt j + token -> first 4 md5 nibbles mod
    * 2^15 (exact base-16 decode on both engines).
    */
  private def digest15(j: Int, tok: Column): Column =
    conv(substring(md5(concat(lit(s"ph$j|"), tok)), 1, 4), 16, 10)
      .cast("long") % 32768

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

      // --- perceptual-hash near-dup pairs over the media corpus (the
      // image-dedup pass of a multimodal pipeline, with the codec
      // stubbed exactly as in Multimodal: payload = text bytes): each
      // payload reduces to a 60-bit phash built from FOUR robust region
      // digests (min / tercile / max of the sorted distinct token set —
      // a stand-in for the 4 quadrant intensity digests a real pHash
      // computes; local edits leave most probes unchanged). Near-dups =
      // pairs differing in AT MOST ONE region. Banding is EXACT by
      // pigeonhole: <=1 differing region leaves >=3 of the 4 bands
      // identical, so candidates from per-band posting lists (df-capped
      // like ngramPairs; cap mirrored in the oracle) have full recall,
      // then the verify stage recomputes region-diff count and the
      // bit-level hamming distance (bit_count of the xor — the
      // primitive a production phash store serves). ONE shuffle for
      // posting lists; candidate joins move 8-byte ids. ---
      "q_dedup_phash" -> ((s, d) =>
        phashPairs(s, d)
          .filter(col("n_diff") <= 1)
          .select(col("a_id"), col("b_id"), col("n_diff"),
            col("ham_bits"))
          .orderBy("a_id", "b_id")),

      // --- hamming-radius tuning curve over the same banded phash
      // store (round 14): per region-diff level r = 0..3, the pair
      // counts and bit-level hamming profile — the sweep that picks
      // the dedup radius before committing to a threshold, exactly
      // like q_lsh_curve picks bands. The 4-band pigeonhole makes the
      // candidate set EXACT for every r <= 3 (r differing regions
      // leave 4−r >= 1 identical bands), so the curve is a complete
      // census of the detectable radii, not a sample. Same single
      // posting shuffle as q_dedup_phash; the rollup adds a 4-row
      // aggregate + a window over those 4 rows. ---
      "q_phash_radius" -> ((s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy("n_diff")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        phashPairs(s, d)
          .groupBy("n_diff")
          .agg(count(lit(1)).as("n_pairs"),
            min("ham_bits").as("min_ham"),
            max("ham_bits").as("max_ham"),
            sum("ham_bits").as("sum_ham"))
          .select(col("n_diff"), col("n_pairs"),
            sum("n_pairs").over(w).as("cum_pairs"),
            col("min_ham"), col("max_ham"),
            (col("sum_ham").cast("double") / col("n_pairs"))
              .as("avg_ham"))
          .orderBy("n_diff")
      })) ++ moreQueries

  /** DuckDB twin of [[phashPairs]] — the `v` relation (a_id, b_id,
    * n_diff, ham_bits) both phash oracles read.
    */
  private lazy val phashCte: String = {
    def dig(j: Int): String =
      s"""CAST(list_sum([CAST(strpos('0123456789abcdef',
         |      substr(md5('ph$j|' || tk[CAST(1 + ((len(tk) - 1) * $j)
         |        // 3 AS BIGINT)]), i, 1)) - 1 AS BIGINT)
         |    << (4 * (4 - i)) for i in range(1, 5)]) % 32768
         |  AS BIGINT)""".stripMargin
    s"""tks AS (SELECT doc_id,
       |    list_sort(list_distinct(string_split(text, ' '))) AS tk
       |  FROM documents),
       |dd AS (SELECT doc_id, ${dig(0)} AS d0, ${dig(1)} AS d1,
       |    ${dig(2)} AS d2, ${dig(3)} AS d3 FROM tks),
       |dp AS (SELECT *, d0 + d1 * 32768 + d2 * 1073741824
       |    + d3 * 35184372088832 AS phash FROM dd),
       |b AS (SELECT doc_id, j,
       |    CASE j WHEN 0 THEN d0 WHEN 1 THEN d1 WHEN 2 THEN d2
       |      ELSE d3 END AS dv
       |  FROM dp CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(j)),
       |g AS (SELECT j, dv, COUNT(*) AS c FROM b GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM b x JOIN b y ON x.j = y.j AND x.dv = y.dv
       |    AND x.doc_id < y.doc_id
       |  JOIN g ON g.j = x.j AND g.dv = x.dv AND g.c <= 50),
       |v AS (SELECT a_id, b_id,
       |    CAST((da.d0 <> db.d0)::INT + (da.d1 <> db.d1)::INT
       |      + (da.d2 <> db.d2)::INT + (da.d3 <> db.d3)::INT
       |      AS BIGINT) AS n_diff,
       |    CAST(bit_count(xor(da.phash, db.phash)) AS BIGINT)
       |      AS ham_bits
       |  FROM cand JOIN dp da ON da.doc_id = a_id
       |  JOIN dp db ON db.doc_id = b_id)""".stripMargin
  }

  /** The banded-phash candidate relation with exact region-diff and
    * bit-hamming verification — shared by `q_dedup_phash` (≤1-region
    * gate) and `q_phash_radius` (the full detectable-radius curve).
    */
  private def phashPairs(s: SparkSession, d: String): DataFrame = {
        val dig = table(s, d, "documents")
          .select(col("doc_id"), let(
            sort_array(array_distinct(split(col("text"), " ")))) { tk =>
            val n = size(tk)
            struct((0 until 4).map { j =>
              digest15(j, element_at(tk,
                (lit(1) + ((n - 1) * j).cast("long") / lit(3))
                  .cast("int"))).as(s"d$j")
            }: _*)
          }.as("ds"))
          .select(col("doc_id"), col("ds.d0"), col("ds.d1"),
            col("ds.d2"), col("ds.d3"))
          .withColumn("phash",
            col("d0") + col("d1") * 32768L +
              col("d2") * 1073741824L + col("d3") * 35184372088832L)
        val bands = dig.select(col("doc_id"),
          posexplode(array(col("d0"), col("d1"), col("d2"), col("d3")))
            .as(Seq("j", "dv")))
        val cand = bands.groupBy("j", "dv")
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
          .filter(size(col("ids")).between(2, 50))
          .select(posexplode(col("ids")).as(Seq("i", "a_id")), col("ids"))
          .select(col("a_id"), col("i"),
            posexplode(col("ids")).as(Seq("k", "b_id")))
          .filter(col("i") < col("k"))
          .select("a_id", "b_id").distinct()
        val da = dig.select(col("doc_id").as("a_id"),
          col("d0").as("a0"), col("d1").as("a1"), col("d2").as("a2"),
          col("d3").as("a3"), col("phash").as("pa"))
        val db = dig.select(col("doc_id").as("b_id"),
          col("d0").as("b0"), col("d1").as("b1"), col("d2").as("b2"),
          col("d3").as("b3"), col("phash").as("pb"))
        cand.join(da, "a_id").join(db, "b_id")
          .withColumn("n_diff",
            (col("a0") =!= col("b0")).cast("long") +
              (col("a1") =!= col("b1")).cast("long") +
              (col("a2") =!= col("b2")).cast("long") +
              (col("a3") =!= col("b3")).cast("long"))
          .select(col("a_id"), col("b_id"), col("n_diff"),
            expr("CAST(bit_count(pa ^ pb) AS BIGINT)").as("ham_bits"))
  }

  private def moreQueries
      : Map[String, (SparkSession, String) => DataFrame] = Map(

      // --- sparse tf-idf cosine near-dup pairs (the classic IR
      // text-similarity dedup, complementing the dense-embedding and
      // minhash spellings): weights are tf · idf_bits with the integer
      // floor-log2 idf (zero libm — common tokens with df > N/2 weight
      // 0 exactly as idf intends), the candidate relation comes from
      // df-capped posting lists (2..50, mirrored in the oracle — the
      // cap bounds Σ|list|² AND matches the idf intuition that viral
      // tokens carry no signal), dot products and norms stay exact
      // int64, and the cosine is one sqrt-division per surviving pair.
      // ONE posting shuffle + one pair rollup; ids and 8-byte weights
      // are all that move. ---
      "q_dedup_tfidf" -> ((s, d) => {
        val docs = table(s, d, "documents")
        val nDocs = docs.agg(count(lit(1)).as("nd"))
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
          .filter(col("df").between(2, 50))
        val w = tf.join(df, "t")
          .crossJoin(broadcast(nDocs))
          .select(col("doc_id"), col("t"),
            (col("tf") *
              (length(bin(floor(col("nd").cast("double") /
                col("df").cast("double")).cast("long"))) - 1)
                .cast("long")).as("w"))
          .filter(col("w") > 0)
        val norms = w.groupBy("doc_id")
          .agg(sum(col("w") * col("w")).as("nn"))
        val pairs = w.select(col("t"), col("doc_id").as("a_id"),
            col("w").as("wa"))
          .join(w.select(col("t"), col("doc_id").as("b_id"),
            col("w").as("wb")).hint("shuffle_hash"), "t")
          .filter(col("a_id") < col("b_id"))
          .groupBy("a_id", "b_id")
          .agg(sum(col("wa") * col("wb")).as("dot"))
        pairs
          .join(norms.select(col("doc_id").as("a_id"),
            col("nn").as("na")), "a_id")
          .join(norms.select(col("doc_id").as("b_id"),
            col("nn").as("nb")), "b_id")
          .withColumn("cos", col("dot").cast("double") /
            (sqrt(col("na").cast("double")) *
              sqrt(col("nb").cast("double"))))
          .filter(col("cos") >= 0.6)
          .select(col("a_id"), col("b_id"), col("dot"), col("cos"))
          .orderBy("a_id", "b_id")
      }),

      // --- Fellegi-Sunter weight estimation: the m (agreement given
      // match) and u (agreement given non-match) probabilities per
      // field, and the log2 agreement/disagreement weights every
      // probabilistic linker scores candidate pairs with. Matched pairs
      // come from a deterministically corrupted second view (md5-gated
      // field noise — the labeled-pairs stand-in); u is the standard
      // value-frequency estimate P(two random records agree) =
      // sum(count_v^2)/n^2 from one histogram per field. All moments
      // are exact (DECIMAL(38,0) for the squared sums — n^2 leaves
      // int64 at fleet row counts); the weights are exact integer
      // floor-log2 of the decimal likelihood ratios; m and u are
      // terminal divisions. One scan + one O(values) histogram per
      // field; output is 3 rows. ---
      "q_fs_weights" -> ((s, d) => {
        val base = table(s, d, "customer")
        def gate(salt: String): Column =
          substring(md5(concat(lit(salt),
            col("c_custkey").cast("string"))), 1, 1) === "0"
        def corrupt(salt: String, orig: Column, alt: Column): Column =
          when(gate(salt), alt).otherwise(orig)
        // the three compared fields and their corrupted twins
        val fields = Seq(
          ("segment", col("c_mktsegment"),
            corrupt("fsseg", col("c_mktsegment"),
              concat(lit("SEG"),
                (conv(substring(md5(concat(lit("fsv"),
                  col("c_custkey").cast("string"))), 1, 2), 16, 10)
                  .cast("long") % 5).cast("string")))),
          ("nation", col("c_nationkey").cast("string"),
            corrupt("fsnat", col("c_nationkey").cast("string"),
              (conv(substring(md5(concat(lit("fsn"),
                col("c_custkey").cast("string"))), 1, 2), 16, 10)
                .cast("long") % 25).cast("string"))),
          ("bal_band", floor(col("c_acctbal") / 1000).cast("string"),
            corrupt("fsbal", floor(col("c_acctbal") / 1000).cast("string"),
              (conv(substring(md5(concat(lit("fsb"),
                col("c_custkey").cast("string"))), 1, 2), 16, 10)
                .cast("long") % 12 - 1).cast("string"))))
        fields.map { case (name, a, b) =>
          val m1 = base.agg(count(lit(1)).as("n"),
            sum((a === b).cast("long")).as("ma"))
          val hist = base.groupBy(a.as("v")).agg(count(lit(1)).as("c"))
          // cast BEFORE the square: a long*long product wraps at fleet
          // counts while DECIMAL(38,0)*long cannot (the oracle's
          // HUGEINT promotion)
          val su1 = hist.agg(
            sum(col("c").cast(D38) * col("c")).as("su"))
          m1.crossJoin(broadcast(su1))
            .select(lit(name).as("field"), col("n"), col("ma"),
              col("su"))
            // exact decimal floors of m/u and (1-m)/(1-u); weights are
            // their bit lengths - 1 (floor log2), disagreement negated
            .selectExpr("field", "n", "ma AS n_agree",
              "CAST(ma AS DOUBLE) / n AS m",
              "CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS u",
              "CAST(length(bin(CAST(" +
                "(CAST(ma AS DECIMAL(38,0)) * n) div su AS BIGINT))) - 1 " +
                "AS BIGINT) AS w_agree_bits",
              "CAST(-(length(bin(CAST(" +
                "(CAST(n AS DECIMAL(38,0)) * n - su) div " +
                "(CAST(n - ma AS DECIMAL(38,0)) * n) AS BIGINT))) - 1) " +
                "AS BIGINT) AS w_disagree_bits")
        }.reduce(_ unionByName _).orderBy("field")
      }))

  override def oracle: Map[String, String] = Map(

    "q_dedup_phash" ->
      s"""WITH $phashCte
         |SELECT a_id, b_id, n_diff, ham_bits FROM v
         |WHERE n_diff <= 1 ORDER BY a_id, b_id""".stripMargin,

    "q_phash_radius" ->
      s"""WITH $phashCte,
         |r AS (SELECT n_diff, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(MIN(ham_bits) AS BIGINT) AS min_ham,
         |    CAST(MAX(ham_bits) AS BIGINT) AS max_ham,
         |    CAST(SUM(ham_bits) AS BIGINT) AS sum_ham
         |  FROM v GROUP BY 1)
         |SELECT n_diff, n_pairs,
         |  CAST(SUM(n_pairs) OVER (ORDER BY n_diff
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum_pairs,
         |  min_ham, max_ham,
         |  CAST(sum_ham AS DOUBLE) / n_pairs AS avg_ham
         |FROM r ORDER BY n_diff""".stripMargin,

    "q_dedup_tfidf" ->
      """WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        |tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |        FROM documents)
        |  GROUP BY doc_id, t),
        |df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        |  GROUP BY t HAVING COUNT(*) BETWEEN 2 AND 50),
        |w AS (SELECT doc_id, t,
        |    tf * CAST(length(bin(nd // df)) - 1 AS BIGINT) AS w
        |  FROM tf JOIN df USING (t) CROSS JOIN nd
        |  WHERE tf * CAST(length(bin(nd // df)) - 1 AS BIGINT) > 0),
        |nrm AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS nn
        |  FROM w GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(SUM(a.w * b.w) AS BIGINT) AS dot
        |  FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |c AS (SELECT a_id, b_id, dot,
        |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
        |      sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM p JOIN nrm na ON na.doc_id = a_id
        |  JOIN nrm nb ON nb.doc_id = b_id)
        |SELECT a_id, b_id, dot, cos FROM c
        |WHERE cos >= 0.6 ORDER BY a_id, b_id""".stripMargin,

    "q_fs_weights" -> {
      def nib2(salt: String): String =
        s"""CAST(list_sum([CAST(strpos('0123456789abcdef',
           |      substr(md5('$salt' || CAST(c_custkey AS VARCHAR)), i, 1))
           |      - 1 AS BIGINT)
           |    << (4 * (2 - i)) for i in range(1, 3)]) AS BIGINT)""".stripMargin
      def gate(salt: String): String =
        s"substr(md5('$salt' || CAST(c_custkey AS VARCHAR)), 1, 1) = '0'"
      def field(name: String, a: String, alt: String, gsalt: String)
          : String =
        s"""SELECT '$name' AS field, n, ma AS n_agree,
           |  CAST(ma AS DOUBLE) / n AS m,
           |  CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS u,
           |  CAST(length(bin(CAST(
           |    CAST(ma AS HUGEINT) * n // su AS BIGINT))) - 1
           |    AS BIGINT) AS w_agree_bits,
           |  CAST(-(length(bin(CAST(
           |    (CAST(n AS HUGEINT) * n - su) //
           |    (CAST(n - ma AS HUGEINT) * n) AS BIGINT))) - 1)
           |    AS BIGINT) AS w_disagree_bits
           |FROM
           |  (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |     CAST(SUM(CASE WHEN $a =
           |       (CASE WHEN $gsalt THEN $alt ELSE $a END)
           |       THEN 1 ELSE 0 END) AS BIGINT) AS ma
           |   FROM customer)
           |  CROSS JOIN
           |  (SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS su
           |   FROM (SELECT $a AS v, COUNT(*) AS c FROM customer
           |         GROUP BY 1))""".stripMargin
      Seq(
        field("segment", "c_mktsegment",
          s"'SEG' || CAST(${nib2("fsv")} % 5 AS VARCHAR)", gate("fsseg")),
        field("nation", "CAST(c_nationkey AS VARCHAR)",
          s"CAST(${nib2("fsn")} % 25 AS VARCHAR)", gate("fsnat")),
        field("bal_band", "CAST(CAST(floor(c_acctbal / 1000) AS BIGINT)" +
          " AS VARCHAR)",
          s"CAST(${nib2("fsb")} % 12 - 1 AS VARCHAR)", gate("fsbal")))
        .mkString("", "\nUNION ALL\n", "\nORDER BY field")
    })
}
