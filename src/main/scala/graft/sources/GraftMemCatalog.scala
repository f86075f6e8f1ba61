package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 `TableCatalog` over the [[GraftMemRegistry]] — the reference's
  * `Catalog` (`catalog.rs:20-23`, name → table lookup at
  * `catalog.rs:60-65`) surfaced at the SQL layer: after
  * `spark.sql.catalog.graftcat = graft.sources.GraftMemCatalog`, any
  * registered memory table is addressable as `graftcat.<name>` in plain
  * SQL, and the full pushdown stack (column pruning, filters,
  * aggregates, SPJ partitioning) applies because `loadTable` returns
  * the same [[GraftMemTable]] the DataFrame path uses. Read-only by
  * design — the reference's catalog only registers sources built
  * elsewhere (`catalog.rs:27-57`); create/alter/drop throw.
  */
class GraftMemCatalog extends CatalogPlugin with TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catalogName = name }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftMemRegistry.tableNames
      .map(n => Identifier.of(namespace, n)).toArray

  override def loadTable(ident: Identifier): Table =
    new GraftMemTable(ident.name())

  override def tableExists(ident: Identifier): Boolean =
    GraftMemRegistry.tableNames.contains(ident.name())

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft-mem catalog is read-only (register via GraftMemRegistry)")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft-mem catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft-mem catalog is read-only")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft-mem catalog is read-only")
}
