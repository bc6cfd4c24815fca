package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark `TableCatalog` plugin exposing GFWB-backed tables BY NAME to
  * plain SQL — the last integration tier for the custom connector: after
  *
  * {{{
  *   spark.sql.catalog.graft       = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.sfdir = /root/testdata/sf0.01
  * }}}
  *
  * `SELECT … FROM graft.default.orders_fwb` resolves through this catalog
  * to the [[FwbTable]] (reads get footer-skip + pruning, writes get the
  * two-phase commit) with no `format(...).load(...)` plumbing in user
  * code. The catalog is read-only-DDL: tables are defined by the
  * connector fixture, `CREATE/ALTER/DROP` fail loudly — the governed-lake
  * posture where table definitions belong to the platform, not ad-hoc
  * DDL. At 100 TB this is how an engine ships: the catalog carries the
  * table→layout mapping; queries never mention paths.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var sfDir: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    sfDir = options.get("sfdir")
    require(sfDir != null, s"catalog $name requires spark.sql.catalog.$name.sfdir")
  }

  override def name(): String = catalogName

  private val Namespace = Array("default")
  private val TableName = "orders_fwb"

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespace.sameElements(Namespace)) throw new NoSuchNamespaceException(namespace)
    Array(Identifier.of(Namespace, TableName))
  }

  override def loadTable(ident: Identifier): Table = {
    if (!ident.namespace.sameElements(Namespace) || ident.name != TableName)
      throw new NoSuchTableException(ident.namespace.toSeq :+ ident.name)
    // fixture materializes once per process; the catalog owns the mapping
    // from the logical name to the physical GFWB layout
    new FwbTable(FwbFormat.writeFixture(SparkSession.active, sfDir))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only DDL")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only DDL")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only DDL")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only DDL")

  override def listNamespaces(): Array[Array[String]] = Array(Namespace)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) Array(Namespace)
    else if (namespace.sameElements(Namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  }
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespace.sameElements(Namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(Namespace)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only DDL")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only DDL")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only DDL")
}
