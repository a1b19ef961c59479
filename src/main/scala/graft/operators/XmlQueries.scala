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
    // flagship conversion: 1 document -> 1 row, root-wrapped struct
    "q_xml_shape" -> ((s, _) =>
      XmlToParquetJob.read(s, xsd, Seq(xmlPath))),

    // XPath include: only /bookOrder/books/book (+ root attrs) survive
    "q_xml_include" -> ((s, _) =>
      XmlToParquetJob.read(s, xsd, Seq(xmlPath),
        Config(includes = Seq("/bookOrder/books/book")))),

    // XPath exclude: note + books subtrees removed
    "q_xml_exclude" -> ((s, _) =>
      XmlToParquetJob.read(s, xsd, Seq(xmlPath),
        Config(excludes = Seq("/bookOrder/note", "/bookOrder/books")))),

    // file-info metadata column from Spark's hidden _metadata struct
    "q_xml_fileinfo" -> ((s, _) => flatten(
      XmlToParquetJob.read(s, xsd, Seq(xmlPath), Config(fileInfo = true)))),

    // container sources: one row per archive member
    "q_xml_zip" -> ((s, _) => flatten(
      ArchiveXmlSource.read(s, xsd,
        Seq(fixtureDir.resolve("books.zip").toString),
        Config(fileInfo = true)))),
    "q_xml_targz" -> ((s, _) => flatten(
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

  override def oracle: Map[String, String] = Map(
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
