package graft.sources.colf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
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
  * table directory, there are no namespaces and no metastore state —
  * DDL (CREATE/ALTER/DROP/RENAME TABLE, see the section below) records
  * its state in the table's OWN manifest ([[ColfVersions.TableMeta]]),
  * so the catalog itself stays stateless. A loaded table is a plain
  * [[ColfTable]]: scans, pushdown, absorption, DPP, and the streaming
  * source all behave identically to
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
    // RENAME TO `catalog`.`path` arrives UNRESOLVED (RenameTableExec
    // passes the parsed multipart as-is), so tolerate our own catalog
    // name as a leading namespace segment
    val ns = ident.namespace() match {
      case Array(c) if c.equalsIgnoreCase(catalogName) => Array.empty[String]
      case other                                       => other
    }
    if (ns.nonEmpty || !ident.name().contains('/'))
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
    // persisted table properties (CREATE ... TBLPROPERTIES / ALTER SET —
    // most importantly dmlMode) resolve into the table's options, so a
    // merge-on-read table IS merge-on-read in every session; per-call
    // extras (version pins) always win, and addressing keys can't be
    // smuggled in via properties
    val root = new Path(path)
    val fs = root.getFileSystem(ColfUtil.driverHadoopConf())
    if (fs.exists(root) && fs.getFileStatus(root).isDirectory)
      ColfVersions.tableMeta(fs, root).foreach(_.props.foreach { case (k, v) =>
        if (!k.equalsIgnoreCase("path") && !k.equalsIgnoreCase("paths"))
          opts.put(k, v)
      })
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
      s"colf catalog is path-addressed: $op is not supported")

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

  // ----------------------------------------------------------------- DDL
  //
  // DDL state lives in the table's own manifest (ColfVersions.TableMeta:
  // declared fields + partition columns in the version-file header), so a
  // "catalog table" needs no metastore — CREATE writes version 1 with an
  // empty file set and the declared shape, every data commit carries the
  // declaration forward, and each ALTER is one more manifest commit
  // through the same first-committer-wins claim loop as writes. Schema
  // changes therefore version and time-travel with the data: reading
  // `VERSION AS OF 3` shows the columns as declared at commit 3.

  private def fsFor(path: String) = {
    val root = new Path(path)
    (root.getFileSystem(ColfUtil.driverHadoopConf()), root)
  }

  /** `CREATE TABLE colf.`/abs/dir`` (cols…) PARTITIONED BY (…)`: commits
    * manifest version 1 — empty file set, declared schema — so the table
    * exists, typed, before any row is written. Identity partitioning
    * only (hive k=v layout is the format's physical partitioning; there
    * are no bucket/days/hours transforms to map it to). CTAS works: Spark
    * creates, then INSERTs through [[ColfTable.newWriteBuilder]], whose
    * commit appends version 2.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = pathOf(ident)
    val (fs, root) = fsFor(path)
    // every declared type must be storable (int32/float64/utf8) — fail at
    // CREATE, not at first INSERT
    val fields = ColfUtil.colfFields(schema)
    val parts = partitions.toSeq.map { t =>
      require(t.name() == "identity" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1,
        s"colf: only identity PARTITIONED BY columns are supported (hive " +
          s"k=v layout), got transform ${t.describe()}")
      val c = t.references()(0).fieldNames()(0)
      require(schema.fieldNames.contains(c),
        s"colf: partition column '$c' is not in the table schema")
      c
    }
    require(parts.size < fields.size,
      "colf: PARTITIONED BY cannot cover every column (data files would " +
        "hold no columns)")
    if (ColfVersions.enabled(fs, root) ||
        ColfVersions.listDataFiles(fs, root).nonEmpty)
      throw new TableAlreadyExistsException(ident)
    val meta = ColfVersions.TableMeta(fields, parts,
      props = ColfDdl.userProps(properties))
    // two racing CREATEs: the claim loop's loser must FAIL (a retry would
    // commit the second declaration as version 2 over the winner's table)
    ColfVersions.append(fs, root, _ => Seq.empty, maxRetries = 0,
      metaUpdate = (_, _) => Some(meta), op = "create")
    tableFor(path, Map.empty)
  }

  /** `ALTER TABLE … ADD/DROP COLUMN / ALTER COLUMN … DROP NOT NULL`: one
    * manifest commit flipping the declared schema; no data file is read
    * or written. Works on any versioned table — one never created via
    * DDL first ADOPTS its current shape (union of live file schemas +
    * layout partition columns) as the declaration, then applies the
    * changes. Unversioned tables have no place to durably record a
    * declaration: enable versioning first.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    val (fs, root) = fsFor(path)
    if (!fs.exists(root)) throw new NoSuchTableException(ident)
    if (!ColfVersions.enabled(fs, root))
      throw new UnsupportedOperationException(
        s"colf: ALTER TABLE records the declared schema in the table's " +
          s"manifest, but $path is not versioned — run " +
          s"CALL $catalogName.enable_versioning('$path') first")
    ColfVersions.append(fs, root, basis => basis.map(_._2).getOrElse(Seq.empty),
      metaUpdate = (cur, entries) => {
        val basisMeta = cur.getOrElse(ColfDdl.adoptMeta(fs, root, entries))
        Some(changes.foldLeft(basisMeta)(ColfDdl.applyChange(fs, root, entries)))
      }, op = "alter")
    tableFor(path, Map.empty)
  }

  /** DROP TABLE: deletes the table directory — but only after verifying
    * the path actually IS a colf table (manifests or .colf files); a
    * path-addressed catalog must never recursively delete an arbitrary
    * directory a user mistyped.
    */
  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    val (fs, root) = fsFor(path)
    if (!fs.exists(root)) return false
    if (!ColfVersions.enabled(fs, root) &&
        ColfVersions.listDataFiles(fs, root).isEmpty)
      throw new IllegalArgumentException(
        s"colf: $path has no colf manifests or data files — refusing to " +
          "delete a directory that is not a colf table")
    fs.delete(root, true)
  }

  /** RENAME TABLE: one directory rename. Manifests store relative paths
    * and embedded commit timestamps precisely so a table is relocatable —
    * every snapshot, deletion vector, and TIMESTAMP AS OF resolves
    * identically at the new path.
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val (fs, src) = fsFor(pathOf(oldIdent))
    val dst = new Path(pathOf(newIdent))
    require(dst.getFileSystem(ColfUtil.driverHadoopConf()).getUri == fs.getUri,
      "colf: RENAME TABLE cannot move a table across filesystems")
    if (!fs.exists(src)) throw new NoSuchTableException(oldIdent)
    if (!ColfVersions.enabled(fs, src) &&
        ColfVersions.listDataFiles(fs, src).isEmpty)
      throw new IllegalArgumentException(
        s"colf: ${src} has no colf manifests or data files — refusing to " +
          "rename a directory that is not a colf table")
    if (fs.exists(dst)) throw new TableAlreadyExistsException(newIdent)
    val parent = dst.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"colf: rename $src -> $dst failed")
  }
}
