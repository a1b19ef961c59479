package graft.xml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reproduces the reference converter's record shaping on top of Spark's
  * native XML source (reference: NestedParqConverter,
  * convert_xml_to_parquet.py:50-144, rules catalogued in SURVEY.md §1.4):
  *
  *   1. attributes become sibling fields named `<element>@<attr>`
  *      (Spark's XML source emits them as `_<attr>`; we rename), placed
  *      before child elements like the reference's output;
  *   2. simple content with attributes collapses into the parent level:
  *      a `<child>` value field plus `<child>@<attr>` fields
  *      (Spark emits a struct with `_VALUE`);
  *   3. repeated elements stay arrays (`list<struct>` / `list<scalar>`);
  *   4. type coercions match the reference's observed output lattice
  *      (convert_xml_to_parquet.py:41-46, README golden output):
  *      xs:decimal -> double, integer-family -> int64, xs:date /
  *      xs:dateTime -> "yyyy-MM-dd HH:mm:ss.SSS" strings;
  *   5. XPath include/exclude prune subtrees (xml_to_parquet.py:19-28)
  *      — expressed as nested projections so Catalyst pushes them into
  *      the scan (nested schema pruning), the Spark-native analog of the
  *      reference's prune-during-parse;
  *   6. the record nests under the root element name (one top-level
  *      struct column, one row per document).
  *
  * The reference's inert `*` wildcard (SURVEY.md §2.A quirks) is treated
  * as the evident intent: a trailing wildcard component behaves like its
  * parent path.
  */
object XmlShaper {

  /** Reference datetime rendering (README.md:120: "1999-10-20 00:00:00.000"). */
  val DateFormat = "yyyy-MM-dd HH:mm:ss.SSS"

  private def coerce(c: Column, dt: DataType): Column = dt match {
    case d: DecimalType if d.scale == 0 => c.cast(LongType)
    case _: DecimalType => c.cast(DoubleType)
    case _: DateType | _: TimestampType => date_format(c, DateFormat)
    case _ => c
  }

  private def isAttr(name: String): Boolean =
    name.startsWith("_") && name != "_VALUE"

  /** Shape the content struct of element `elemName`. */
  def shapeStruct(elemName: String, st: StructType, src: Column): Column = {
    val (attrs, elems) = st.fields.toSeq.partition(f => isAttr(f.name))
    val attrCols = attrs.map(f =>
      coerce(src.getField(f.name), f.dataType)
        .as(s"$elemName@${f.name.stripPrefix("_")}"))
    val elemCols =
      elems.flatMap(f => shapeField(f.name, f.dataType, src.getField(f.name)))
    struct(attrCols ++ elemCols: _*)
  }

  private def shapeField(name: String, dt: DataType, src: Column): Seq[Column] =
    dt match {
      // simple content + attributes -> sibling `name@attr` fields, then the
      // value field, in that order (the reference builds the attrs dict
      // first and merges `{child@attr: ..., child: text}`,
      // convert_xml_to_parquet.py:93-118)
      case st: StructType if st.fieldNames.contains("_VALUE") =>
        val value = coerce(src.getField("_VALUE"), st("_VALUE").dataType).as(name)
        val attrs = st.fields.toSeq.filter(f => isAttr(f.name))
        attrs.map(f => coerce(src.getField(f.name), f.dataType)
          .as(s"$name@${f.name.stripPrefix("_")}")) :+ value
      case st: StructType =>
        Seq(shapeStruct(name, st, src).as(name))
      // repeated simple content with attributes -> list<struct>
      case ArrayType(st: StructType, _) if st.fieldNames.contains("_VALUE") =>
        Seq(transform(src, x => {
          val value = coerce(x.getField("_VALUE"), st("_VALUE").dataType).as(name)
          val attrs = st.fields.toSeq.filter(f => isAttr(f.name))
          struct(attrs.map(f => coerce(x.getField(f.name), f.dataType)
            .as(s"$name@${f.name.stripPrefix("_")}")) :+ value: _*)
        }).as(name))
      case ArrayType(st: StructType, _) =>
        Seq(transform(src, x => shapeStruct(name, st, x)).as(name))
      case ArrayType(et, _) =>
        Seq(transform(src, x => coerce(x, et)).as(name))
      case _ => Seq(coerce(src, dt).as(name))
    }

  // ---------------------------------------------------------------------
  // XPath include / exclude subtree pruning
  // ---------------------------------------------------------------------

  /** Trie over element-path components (arrays are transparent, matching
    * the reference where repeated elements are addressed by their path).
    */
  final case class PathTree(children: Map[String, PathTree]) {
    def isLeaf: Boolean = children.isEmpty
  }

  object PathTree {
    /** Build from absolute `/root/a/b` paths; the root component is
      * dropped (tolerated if absent); `*` components are dropped
      * (reference quirk: the documented wildcard is inert — a plain
      * include already keeps its whole subtree).
      */
    def from(rootName: String, paths: Seq[String]): PathTree =
      paths
        .map(_.split("/").toList.filter(p => p.nonEmpty && p != "*"))
        .map {
          case `rootName` :: rest => rest
          case other => other
        }
        .foldLeft(PathTree(Map.empty))(insert)

    private def insert(t: PathTree, path: List[String]): PathTree = path match {
      case Nil => t
      case h :: rest =>
        val updated = (t.children.get(h), rest) match {
          case (_, Nil) => PathTree(Map.empty) // terminal: keep whole subtree
          case (Some(c), _) if c.isLeaf => c   // shorter path already covers it
          case (Some(c), _) => insert(c, rest)
          case (None, _) => insert(PathTree(Map.empty), rest)
        }
        PathTree(t.children + (h -> updated))
    }
  }

  /** Include: keep only subtrees on the include paths, plus the attribute
    * fields of every retained ancestor (reference behavior: the README
    * include example keeps the root's attributes).
    */
  def applyInclude(src: Column, dt: DataType, tree: PathTree): Column =
    if (tree.isLeaf) src
    else dt match {
      case st: StructType =>
        val kept = st.fields.toSeq.flatMap { f =>
          if (isAttr(f.name) || f.name == "_VALUE")
            Some(src.getField(f.name).as(f.name))
          else
            tree.children.get(f.name).map(sub =>
              applyInclude(src.getField(f.name), f.dataType, sub).as(f.name))
        }
        struct(kept: _*)
      case ArrayType(st: StructType, _) =>
        transform(src, x => applyInclude(x, st, tree))
      case _ => src
    }

  /** Would an exclude of `tree` leave anything of a value of type `dt`? */
  private def keepsAnything(dt: DataType, tree: PathTree): Boolean =
    if (tree.isLeaf) false
    else dt match {
      case st: StructType =>
        st.fields.exists(f => tree.children.get(f.name) match {
          case None => true
          case Some(sub) => keepsAnything(f.dataType, sub)
        })
      case ArrayType(st: StructType, _) => keepsAnything(st, tree)
      case _ => true
    }

  /** Exclude: drop subtrees matched by terminal path components. A struct
    * whose fields are all dropped is dropped itself (reference rule 7:
    * falsy children are omitted, convert_xml_to_parquet.py:108).
    */
  def applyExclude(src: Column, dt: DataType, tree: PathTree): Option[Column] =
    if (tree.isLeaf) None
    else dt match {
      case st: StructType =>
        val kept = st.fields.toSeq.flatMap { f =>
          tree.children.get(f.name) match {
            case None => Some(src.getField(f.name).as(f.name))
            case Some(sub) if keepsAnything(f.dataType, sub) =>
              applyExclude(src.getField(f.name), f.dataType, sub)
                .map(_.as(f.name))
            case Some(_) => None
          }
        }
        if (kept.isEmpty) None else Some(struct(kept: _*))
      case ArrayType(st: StructType, _) =>
        if (keepsAnything(st, tree))
          Some(transform(src, x => applyExclude(x, st, tree).get))
        else None
      case _ => Some(src)
    }

  /** Full shaping pipeline over a parsed XML DataFrame (rowTag = root):
    * include-prune -> exclude-prune -> shape -> wrap under root name.
    * Non-`keep` columns (e.g. an injected file-info column) pass through.
    */
  def shapeDocument(parsed: DataFrame, rootName: String,
      includes: Seq[String] = Nil, excludes: Seq[String] = Nil,
      passThrough: Seq[String] = Nil): DataFrame = {
    val docFields =
      parsed.schema.fieldNames.filterNot(passThrough.contains).toSeq
    val wrapped = parsed.select(
      struct(docFields.map(col): _*).as("__doc") +: passThrough.map(col): _*)

    val afterInc =
      if (includes.isEmpty) wrapped
      else {
        val tree = PathTree.from(rootName, includes)
        wrapped.select(
          applyInclude(col("__doc"), wrapped.schema("__doc").dataType, tree)
            .as("__doc") +: passThrough.map(col): _*)
      }
    val afterExc =
      if (excludes.isEmpty) afterInc
      else {
        val tree = PathTree.from(rootName, excludes)
        val pruned = applyExclude(col("__doc"),
          afterInc.schema("__doc").dataType, tree).getOrElse(
          throw new IllegalArgumentException(
            s"exclude paths $excludes would drop the entire document"))
        afterInc.select(pruned.as("__doc") +: passThrough.map(col): _*)
      }

    val docType = afterExc.schema("__doc").dataType.asInstanceOf[StructType]
    afterExc.select(
      shapeStruct(rootName, docType, col("__doc")).as(rootName) +:
        passThrough.map(col): _*)
  }
}
