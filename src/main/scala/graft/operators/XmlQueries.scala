package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, to_json}

import graft.QueryModule
import graft.sources.ArchiveXmlSource
import graft.xml.XmlToParquetJob
import graft.xml.XmlToParquetJob.Config

/** The reference engine's own surface as registered queries: XSD-typed
  * XML conversion (flagship `q_xml_shape`), XPath include/exclude subtree
  * projection, file-info metadata injection, and zip / tar.gz container
  * ingestion — driven by the self-authored bookOrder fixture (same XSD
  * construct family as the reference's golden pair; see
  * src/main/resources/graft/fixtures/). The conversion queries carry no
  * SQL oracles (DuckDB has no XSD-typed XML reader): the driver records
  * rows-only checks, and the golden-output parity assertions live in the
  * ScalaTest suite. The scalar xpath/codec queries DO carry oracles —
  * identity projections the XML round-trip must reproduce exactly.
  */
object XmlQueries extends QueryModule {

  private[graft] def resourceText(name: String): String = resource(name)

  private def resource(name: String): String =
    new String(getClass.getResourceAsStream(s"/graft/fixtures/$name")
      .readAllBytes(), StandardCharsets.UTF_8)

  lazy val xsd: String = resource("bookOrder.xsd")

  /** Fixture workspace: the XML, a zip and a tar.gz each holding two
    * member documents (container sources S4/S5).
    */
  lazy val fixtureDir: Path = {
    val dir = Files.createTempDirectory("graft_xml_fixtures")
    val xml = resource("bookOrder.xml")
    Files.writeString(dir.resolve("bookOrder.xml"), xml)

    val zip = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(dir.resolve("books.zip")))
    Seq("order1.xml", "order2.xml").foreach { n =>
      zip.putNextEntry(new java.util.zip.ZipEntry(n))
      zip.write(xml.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    zip.close()

    val tar = new TarArchiveOutputStream(new GzipCompressorOutputStream(
      Files.newOutputStream(dir.resolve("books.tar.gz"))))
    Seq("order1.xml", "order2.xml").foreach { n =>
      val bytes = xml.getBytes(StandardCharsets.UTF_8)
      val e = new TarArchiveEntry(n)
      e.setSize(bytes.length.toLong)
      tar.putArchiveEntry(e)
      tar.write(bytes)
      tar.closeArchiveEntry()
    }
    tar.close()
    dir
  }

  private def xmlPath: String = fixtureDir.resolve("bookOrder.xml").toString

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // flagship conversion: 1 document -> 1 row, root-wrapped struct.
    // Registered as the flattened JSON rendering (presentation only —
    // the nested-struct API is golden-tested in XmlConversionSpec), so
    // the COMPLETE converted content pins against a golden-value
    // oracle: rows+schema+hash instead of the old rows-only check.
    "q_xml_shape" -> ((s, _) => flatten(
      XmlToParquetJob.read(s, xsd, Seq(xmlPath)))),

    // XPath include: only /bookOrder/books/book (+ root attrs) survive
    "q_xml_include" -> ((s, _) => flatten(
      XmlToParquetJob.read(s, xsd, Seq(xmlPath),
        Config(includes = Seq("/bookOrder/books/book"))))),

    // XPath exclude: note + books subtrees removed
    "q_xml_exclude" -> ((s, _) => flatten(
      XmlToParquetJob.read(s, xsd, Seq(xmlPath),
        Config(excludes = Seq("/bookOrder/note", "/bookOrder/books"))))),

    // file-info metadata column from Spark's hidden _metadata struct;
    // the registered projection keeps the deterministic fields (name,
    // size — mtime is the temp file's creation instant, asserted
    // non-null in the golden tests instead) so the row pins to a
    // golden-content oracle
    "q_xml_fileinfo" -> ((s, _) => {
      val df = XmlToParquetJob.read(s, xsd, Seq(xmlPath),
        Config(fileInfo = true))
      flatten(df.withColumn("file_info",
        struct(col("file_info.name"), col("file_info.size"))))
    }),

    // container sources: one row per archive member. The registered
    // projection is fully DETERMINISTIC — the only run-varying field
    // (the fixture workspace temp path inside file_info.archive) is
    // reduced to its basename — so the complete nested member content
    // pins against a golden-value oracle (rows+schema+hash), the same
    // identity-oracle discipline as q_xpath_scalar: any conversion
    // drift in any field hash-mismatches.
    "q_xml_zip" -> ((s, _) => flattenDet(
      ArchiveXmlSource.read(s, xsd,
        Seq(fixtureDir.resolve("books.zip").toString),
        Config(fileInfo = true)))),
    "q_xml_targz" -> ((s, _) => flattenDet(
      ArchiveXmlSource.read(s, xsd,
        Seq(fixtureDir.resolve("books.tar.gz").toString),
        Config(fileInfo = true)))),

    // --- scalar XPath extraction (xpath_long/string/double) over
    // per-row XML documents — the row-level sibling of the file-level
    // include/exclude projection above. The XML is built deterministically
    // from the order row and the xpath functions extract the fields
    // back, so the ORACLE is the identity projection: any extraction
    // bug (wrong node, lost precision in the double round-trip, entity
    // mishandling) hash-mismatches against the original columns.
    // Purely map-side; codegen keeps the build+extract in one stage. ---
    "q_xpath_scalar" -> ((s, d) =>
      graft.Tables.table(s, d, "orders")
        .withColumn("xml", org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("<o><k>"), col("o_orderkey"),
          org.apache.spark.sql.functions.lit("</k><st>"),
          col("o_orderstatus"),
          org.apache.spark.sql.functions.lit("</st><p>"),
          col("o_totalprice"),
          org.apache.spark.sql.functions.lit("</p></o>")))
        .select(col("o_orderkey"),
          org.apache.spark.sql.functions
            .expr("xpath_long(xml, '/o/k')").as("k_x"),
          org.apache.spark.sql.functions
            .expr("xpath_string(xml, '/o/st')").as("st_x"),
          org.apache.spark.sql.functions
            .expr("xpath_double(xml, '/o/p')").as("p_x"))
        .orderBy("o_orderkey")),

    // --- structured round-trip through Spark's XML codec: struct ->
    // to_xml -> from_xml -> fields. Same identity-oracle discipline:
    // the codec must preserve long/string fields exactly or the hash
    // diverges from the plain projection. ---
    "q_xml_roundtrip" -> ((s, d) =>
      graft.Tables.table(s, d, "orders")
        .withColumn("xml", org.apache.spark.sql.functions
          .expr("to_xml(struct(o_orderkey AS k, o_orderstatus AS st))"))
        .withColumn("rt", org.apache.spark.sql.functions
          .expr("from_xml(xml, 'k BIGINT, st STRING')"))
        .select(col("o_orderkey"), col("rt.k").as("rt_k"),
          col("rt.st").as("rt_st"))
        .orderBy("o_orderkey"))
  )

  /** Driver-compare-friendly rendering: the verify harness sorts result
    * columns with pandas, which cannot order struct (dict) cells — so the
    * registered query flattens each row to one deterministic JSON string.
    * The nested-struct API itself stays as-is (and is golden-tested in
    * XmlConversionSpec); this is presentation only.
    */
  private def flatten(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("doc_json"))
      .orderBy("doc_json")

  /** flatten, with the run-varying archive path reduced to its basename
    * so container conversions render identically on every run (and can
    * therefore carry a full golden-content oracle).
    */
  private def flattenDet(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.regexp_extract
    flatten(df.withColumn("file_info",
      struct(col("file_info.name"), col("file_info.size"),
        regexp_extract(col("file_info.archive"), "[^/]+$", 0)
          .as("archive"))))
  }

  /** Full golden document content for the conversion oracles: every
    * field the XSD-typed conversion emits for one bookOrder.xml,
    * rendered exactly as the registered queries' to_json does. Any
    * drift in parsing, shaping, typing, or metadata hash-mismatches.
    */
  private val addresses: String =
    """"shipTo":{"shipTo@country":"FR","name":"Ada Lovelace",""" +
      """"street":"12 Rue Verte","city":"Lyon","zip":69001.0},""" +
      """"billTo":{"billTo@country":"FR","name":"Blaise Pascal",""" +
      """"street":"8 Quai Noir","city":"Paris","zip":75001.0}"""

  private val booksJson: String =
    """"books":{"book":[""" +
      """{"book@isbn":"321-QL","title":"Relational Algebra in Practice",""" +
      """"copies":2,"price":54.99,"note":"gift wrap"},""" +
      """{"book@isbn":"654-ZT","title":"Streams and Tables","copies":1,""" +
      """"price":89.5,"shipDate":"2005-04-01 00:00:00.000"}]}"""

  private val docCore: String =
    """{"bookOrder@orderDate":"2005-03-14 00:00:00.000",""" +
      addresses + ""","note":"Leave parcel with concierge",""" + booksJson +
      "}"

  private def memberJson(name: String, archive: String): String =
    s"""{"bookOrder":$docCore,"file_info":{"name":"$name","size":774,""" +
      s""""archive":"$archive"}}"""

  private def goldenOracle(rows: Seq[String]): String =
    rows.map(r => s"  ('$r')")
      .mkString("SELECT doc_json FROM (VALUES\n", ",\n",
        ") AS t(doc_json)\nORDER BY doc_json")

  private def containerOracle(archive: String): String =
    goldenOracle(Seq(memberJson("order1.xml", archive),
      memberJson("order2.xml", archive)))

  override def oracle: Map[String, String] = Map(
    // golden-content oracles: the fixtures are static, so the complete
    // converted content of every conversion variant pins to literal
    // values (rows+schema+hash, not rows-only)
    "q_xml_shape" -> goldenOracle(Seq(s"""{"bookOrder":$docCore}""")),
    "q_xml_include" -> goldenOracle(Seq(
      """{"bookOrder":{"bookOrder@orderDate":"2005-03-14 00:00:00.000",""" +
        booksJson + "}}")),
    "q_xml_exclude" -> goldenOracle(Seq(
      """{"bookOrder":{"bookOrder@orderDate":"2005-03-14 00:00:00.000",""" +
        addresses + "}}")),
    "q_xml_fileinfo" -> goldenOracle(Seq(
      s"""{"bookOrder":$docCore,""" +
        """"file_info":{"name":"bookOrder.xml","size":774}}""")),
    "q_xml_zip" -> containerOracle("books.zip"),
    "q_xml_targz" -> containerOracle("books.tar.gz"),
    // identity oracles: the XML build+extract must reproduce the
    // original columns bit-for-bit (see the query-side comments)
    "q_xpath_scalar" ->
      """SELECT o_orderkey, o_orderkey AS k_x, o_orderstatus AS st_x,
        |  o_totalprice AS p_x
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_xml_roundtrip" ->
      """SELECT o_orderkey, o_orderkey AS rt_k, o_orderstatus AS rt_st
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}
