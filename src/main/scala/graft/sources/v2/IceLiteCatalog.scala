package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.icelite.IceCatalog

/** SQL catalog plugin over an IceLite warehouse: configure
  * `spark.sql.catalog.<name>=graft.sources.v2.IceLiteCatalog` and
  * `spark.sql.catalog.<name>.warehouse=<dir>`, then address tables as
  * `<name>.<namespace>.<table>` in plain SQL — `SELECT * FROM
  * icelite.lake.events_t`, `SHOW TABLES IN icelite.lake`, `CREATE TABLE`,
  * `DROP TABLE`.
  *
  * Reads go through the same pushdown-capable scan as
  * `spark.read.format("icelite")` ([[IceLiteV2.buildTable]]); `INSERT INTO`
  * / `df.writeTo(...).append()` run the distributed two-phase append in
  * [[IceLiteWriteBuilder]] (staging dir + driver-side snapshot commit). DDL
  * delegates to [[graft.icelite.IceCatalog]], which maps the reference's
  * catalog surface (D1-D7). Upsert/replace stay on the table API — the
  * component's write modes.
  */
class IceLiteCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def cat: IceCatalog = new IceCatalog(SparkSession.active, warehouse)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse is required"))
  }

  override def name(): String = catalogName

  // -- tables -----------------------------------------------------------------

  private def nsOf(ident: Identifier): String = {
    require(ident.namespace().length == 1,
      s"icelite uses single-level namespaces, got ${ident.namespace().mkString(".")}")
    ident.namespace()(0)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 1 || !cat.namespaceExists(namespace(0)))
      throw new NoSuchNamespaceException(namespace.toSeq)
    cat.listTables(namespace(0)).map(t => Identifier.of(namespace, t)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val (meta, fs) = IceLiteV2.loadMeta(warehouse, nsOf(ident), ident.name())
    IceLiteV2.buildTable(warehouse, meta, fs, snapshotId = None)
  }

  /** SQL time travel: `SELECT … FROM <cat>.<ns>.<tbl> VERSION AS OF <id>` —
    * the version string is a snapshot id, resolving to the same pinned scan
    * as the `snapshotId` read option (`ex/src/component.py:38` semantics).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    require(version.toLongOption.isDefined,
      s"icelite versions are snapshot ids; got '$version' for ${ident.name()} " +
        "(use `list_snapshots` to enumerate them)")
    val (meta, fs) = IceLiteV2.loadMeta(warehouse, nsOf(ident), ident.name())
    IceLiteV2.buildTable(warehouse, meta, fs, snapshotId = Some(version))
  }

  /** `TIMESTAMP AS OF`: micros since epoch — pin to the latest snapshot
    * committed at or before the timestamp.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val (meta, fs) = IceLiteV2.loadMeta(warehouse, nsOf(ident), ident.name())
    val tsMs = timestampMicros / 1000L
    val snap = meta.snapshots.filter(_.timestampMs <= tsMs)
      .sortBy(_.snapshotId).lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot of ${ident.name()} at or before timestamp $tsMs ms"))
    IceLiteV2.buildTable(warehouse, meta, fs,
      snapshotId = Some(snap.snapshotId.toString))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "icelite SQL catalog creates unpartitioned tables; use IceCatalog.createTable for partitionBy")
    cat.createTable(nsOf(ident), ident.name(), schema)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "icelite tables evolve by replace() only (reference semantics)")

  override def dropTable(ident: Identifier): Boolean =
    cat.tableExists(nsOf(ident), ident.name()) &&
      cat.dropTable(nsOf(ident), ident.name())

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("icelite does not support rename")

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 && cat.tableExists(nsOf(ident), ident.name())

  // -- namespaces -------------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    cat.listNamespaces().map(ns => Array(ns)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespace.length == 1 && cat.namespaceExists(namespace(0))) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (namespace.length != 1 || !cat.namespaceExists(namespace(0)))
      throw new NoSuchNamespaceException(namespace.toSeq)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1, "icelite uses single-level namespaces")
    if (cat.namespaceExists(namespace(0)))
      throw new NamespaceAlreadyExistsException(namespace)
    cat.createNamespace(namespace(0))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("icelite namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (namespace.length != 1 || !cat.namespaceExists(namespace(0))) false
    else {
      if (!cascade && cat.listTables(namespace(0)).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace(0)} is not empty (use CASCADE)")
      val p = new org.apache.hadoop.fs.Path(warehouse, namespace(0))
      p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }
}
