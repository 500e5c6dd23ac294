package graft.sources.colf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-addressed DSv2 catalog: the bridge that lets PURE SQL reach colf
  * tables and their snapshots — `option("versionAsOf", n)` has a Scala
  * surface only, but Spark's `VERSION AS OF` / `TIMESTAMP AS OF` clauses
  * resolve exclusively through `TableCatalog.loadTable(ident, version |
  * timestamp)`, so SQL time travel needs a registered catalog.
  *
  * Register once per session:
  * {{{
  *   spark.conf.set("spark.sql.catalog.colf", classOf[ColfCatalog].getName)
  *   spark.sql("SELECT count(*) FROM colf.`/data/events` VERSION AS OF 1")
  *   spark.sql("SELECT * FROM colf.`/data/events` TIMESTAMP AS OF '2026-01-01'")
  * }}}
  *
  * Tables are addressed BY PATH (the same `catalog.`/abs/path`` shape
  * other manifest-versioned formats use): the identifier's name is the
  * table directory, there are no namespaces and no metastore state, so
  * every DDL mutation (CREATE/ALTER/DROP/RENAME) is rejected loudly —
  * writes go through `df.write.format("colf").save(path)` as before.
  * A loaded table is a plain [[ColfTable]]: scans, pushdown, absorption,
  * DPP, and the streaming source all behave identically to
  * `spark.read.format("colf").load(path)`.
  */
class ColfCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = "colf"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** The identifier IS the path: `colf.`/abs/path``. A namespaced or
    * non-path identifier means the user expected a metastore — fail with
    * the addressing rule, not a confusing "table not found".
    */
  private def pathOf(ident: Identifier): String = {
    if (ident.namespace().nonEmpty || !ident.name().contains('/'))
      throw new IllegalArgumentException(
        s"colf catalog addresses tables by path: use $catalogName.`/abs/table/dir` " +
          s"(got ${(ident.namespace() :+ ident.name()).mkString(".")})")
    ident.name()
  }

  /** Load through the SAME provider entry points the DataFrame path uses
    * (inferSchema → getTable), so catalog-resolved tables can never skew
    * from `spark.read.format("colf")` ones — except `mergeSchema`, which
    * is ALWAYS on here: a catalog table is the union schema of its files
    * (how every manifest-backed table format behaves), so SQL readers see
    * late-added columns and, critically, row-level DML rewrites carry
    * every column a replaced file stores. Without it a MERGE matching a
    * row in an evolved file would rewrite that file through the first
    * file's narrower schema and silently null the late columns (the
    * rewrite guard in [[ColfWrite]] now also refuses that, loudly). The
    * bare path API keeps the reference-compatible head-file default.
    */
  private def tableFor(path: String, extra: Map[String, String]): Table = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", path)
    opts.put("mergeSchema", "true")
    extra.foreach { case (k, v) => opts.put(k, v) }
    val provider = new ColfDataSource()
    provider.getTable(provider.inferSchema(new CaseInsensitiveStringMap(opts)),
      Array.empty[Transform], opts)
  }

  override def loadTable(ident: Identifier): Table =
    tableFor(pathOf(ident), Map.empty)

  /** `VERSION AS OF n` → the manifest snapshot `option("versionAsOf", n)`
    * pins. Non-numeric versions and unversioned tables fail loudly (the
    * latter inside snapshot resolution, naming the available versions).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = scala.util.Try(version.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"colf: VERSION AS OF takes a numeric snapshot version, got '$version'"))
    tableFor(pathOf(ident), Map("versionAsOf" -> v.toString))
  }

  /** `TIMESTAMP AS OF t` → the newest snapshot committed at or before t
    * (manifest commit mtimes; `timestamp` arrives in microseconds).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    val root = new Path(path)
    val fs = root.getFileSystem(ColfUtil.driverHadoopConf())
    val v = ColfVersions.versionAt(fs, root, timestamp / 1000L)
    tableFor(path, Map("versionAsOf" -> v.toString))
  }

  /** Only an addressing/not-found failure means "no table" — a transient
    * FS/auth/IO error must PROPAGATE, or callers would treat an
    * unreachable filesystem as an absent table and, e.g., proceed to
    * create over it.
    */
  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true }
    catch { case _: IllegalArgumentException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no namespace to enumerate

  private def unsupported(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"colf catalog is path-addressed and stateless: $op is not supported — " +
        "write with df.write.format(\"colf\").save(path)")

  /** Maintenance procedures: `CALL colf.compact('/t', target_mb => 256)`,
    * `vacuum`, `vacuum_versions`, `enable_versioning` — the operational
    * surface from pure SQL, one-row results carrying the same counts the
    * Scala API returns. Unknown names fail with the available list.
    */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system")),
      s"colf procedures live at $catalogName.<name> (or $catalogName.system.<name>), " +
        s"got namespace ${ident.namespace().mkString(".")}")
    ColfProcedures.all.getOrElse(ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"colf: unknown procedure '${ident.name()}' — available: " +
          ColfProcedures.all.keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    ColfProcedures.all.keys.toSeq.sorted
      .map(Identifier.of(Array.empty[String], _)).toArray

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = unsupported("CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    unsupported("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = unsupported("DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    unsupported("RENAME TABLE")
}
