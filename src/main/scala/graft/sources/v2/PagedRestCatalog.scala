package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal V2 [[TableCatalog]] over a directory of paged-REST
  * collections — the piece that lifts the `graft-rest` connector from
  * path-addressed reads/writes to CATALOG-ADDRESSED SQL, including the
  * row-level commands ([[PagedRestRowLevelOperation]]):
  *
  * {{{
  *   spark.sql.catalog.rest      = graft.sources.v2.PagedRestCatalog
  *   spark.sql.catalog.rest.root = /path/to/collections
  *
  *   MERGE INTO rest.state t USING updates s ON t.id = s.id
  *     WHEN MATCHED AND s.value < 0 THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Identifier mapping is pure filesystem layout: table
  * `rest.ns1.ns2.tbl` lives at `<root>/ns1/ns2/tbl` (a directory of
  * `page-<i>.json` + `meta.json`, exactly what [[PagedRestWriter]]
  * publishes). The catalog holds NO state of its own — the collection
  * directories ARE the catalog, so a metastore service is unnecessary
  * and two sessions pointed at the same root see the same tables (the
  * same property the reference's warehouse relies on, reproduced for
  * the connector surface). All tables carry the connector's fixed
  * envelope schema; alter is refused, rename is the filesystem rename.
  */
class PagedRestCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _
  private var pageSize: Int = 100

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"catalog $name requires option 'root' (collections directory)"))
    pageSize = options.getInt("pageSize", 100)
  }
  override def name(): String = catalogName

  private def dirFor(ident: Identifier): Path =
    Paths.get((root +: ident.namespace.toSeq :+ ident.name()).mkString("/"))

  private def tableOpts(ident: Identifier): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(Map(
      "pages" -> dirFor(ident).toString,
      "pageSize" -> pageSize.toString).asJava)

  /** A collection exists iff its directory holds an envelope to probe —
    * a bare directory is not a table (it could be a namespace level). */
  override def tableExists(ident: Identifier): Boolean = {
    val d = dirFor(ident)
    Files.exists(d.resolve("meta.json")) || Files.exists(d.resolve("page-0.json"))
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new PagedRestTable(tableOpts(ident))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = Paths.get((root +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(ns)) Array.empty
    else {
      val listing = Files.list(ns)
      try listing.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          (Files.exists(p.resolve("meta.json")) ||
            Files.exists(p.resolve("page-0.json"))))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
      finally listing.close()
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty, "graft-rest collections are not partitioned")
    // the connector's schema is fixed by the envelope format; an empty
    // requested schema (CREATE TABLE without columns) defaults to it
    require(schema.isEmpty ||
      schema.fieldNames.sorted.sameElements(PagedRestV2.Schema.fieldNames.sorted),
      s"graft-rest tables carry the fixed envelope schema " +
        s"${PagedRestV2.Schema.simpleString}; got ${schema.simpleString}")
    val d = dirFor(ident)
    Files.createDirectories(d)
    // an empty published collection: total 0, no pages
    Files.write(d.resolve("meta.json"),
      s"""{"total": 0, "page_size": $pageSize}"""
        .getBytes(StandardCharsets.UTF_8))
    new PagedRestTable(tableOpts(ident))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-rest tables carry the fixed envelope schema; ALTER is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val d = dirFor(ident)
    val listing = Files.walk(d)
    try listing.iterator().asScala.toSeq.reverseIterator
      .foreach(Files.deleteIfExists(_))
    finally listing.close()
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(dirFor(newIdent).getParent)
    Files.move(dirFor(oldIdent), dirFor(newIdent))
  }
}
