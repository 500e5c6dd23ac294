package graft.sources.colf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationInfo, WriterCommitMessage}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Delta-based (merge-on-read) row-level operations: SQL `MERGE INTO`,
  * `UPDATE`, and `DELETE FROM` that never rewrite a data file. Spark's
  * `SupportsDelta` machinery hands this connector per-row operations
  * keyed by the `(_file, _pos)` row identity; deletes accumulate into
  * position-delete files ([[ColfDeletes]]), updates split into delete +
  * insert (`representUpdateAsDeleteAndInsert`), and the commit is one
  * manifest append that repoints each touched entry at its merged
  * deletion vector — data-file bytes are untouched, old snapshots keep
  * reading the old vectors, and compaction folds everything back into
  * clean files.
  *
  * Cost shape vs copy-on-write ([[ColfRowLevelOperation]]): CoW writes
  * O(size of every file containing a match); this path writes O(rows
  * changed) + one manifest append. At 100 TB with frequent small DML,
  * that difference is the whole ballgame — and the reason every
  * manifest-based table format grew position deletes.
  *
  * Requires a VERSIONED table: the manifest is the only place a DV
  * reference can live (an unversioned directory listing cannot express
  * "this file, minus these rows"). Enforced loudly at write build.
  *
  * Concurrency (first committer wins, validated inside the manifest
  * claim loop): a file this operation deletes from must still be live in
  * the commit basis with the SAME size/mtime/DV it had when the
  * operation's scan planned — a concurrent compaction/rewrite (DV-vs-
  * rewrite) or another row-level commit against the same file (DV-vs-DV)
  * aborts this commit with `ConcurrentModificationException` rather than
  * silently double-applying or losing either side. Commits touching
  * DISJOINT files merge cleanly through the ordinary optimistic retry.
  */
class ColfDeltaOperation(paths: Seq[String], fullSchema: StructType,
    layoutPartitionCols: Seq[String], info: RowLevelOperationInfo,
    names: ColfNames = ColfNames.Identity)
    extends RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta {
  // `fullSchema`/`layoutPartitionCols` arrive LOGICAL; the scan/write
  // translate to physical at their boundaries ([[ColfNames]]).

  /** Scan-time snapshot of the planned file set (path, size, mtime, dv):
    * the conflict-validation basis the commit compares against. Same
    * driver-side volatile protocol as the CoW operation.
    */
  @volatile private[colf] var scannedRefs: Seq[ColfFileRef] = null

  override def command(): RowLevelOperation.Command = info.command()

  override def description(): String =
    s"colf merge-on-read ${info.command()} on ${paths.mkString(",")}"

  /** Row identity = (file path, ordinal within file) — exactly what a
    * position-delete records.
    */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(ColfUtil.FileMetaCol),
      Expressions.column(ColfUtil.PosMetaCol))

  /** UPDATE arrives as delete + insert: the two halves commit atomically
    * (one manifest append), and the writer needs no third code path.
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  /** Unlike the group-based scan, this one may accept filter pushdown:
    * only MATCHING rows are needed (nothing is rewritten), so pruning
    * files by the condition is sound. Pushed filters are used for file
    * pruning but all remain residual — Spark re-evaluates them row-level,
    * which is always correct and costs nothing extra here.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
        with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
      private var required: StructType = fullSchema
      private var pushed: Array[Filter] = Array.empty      // physical
      private var pushedLog: Array[Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val pairs = filters.toSeq
          .flatMap(f => names.physFilter(f).map(p => f -> p))
          .filter(p => ColfPrune.prunable(p._2))
        pushed = pairs.map(_._2).toArray
        pushedLog = pairs.map(_._1).toArray
        filters // everything stays residual
      }
      override def pushedFilters(): Array[Filter] = pushedLog
      override def build(): Scan =
        new ColfDeltaScan(ColfDeltaOperation.this, paths,
          names.physSchema(fullSchema), names.physSchema(required),
          pushed.toSeq, names)
    }

  override def newWriteBuilder(lwi: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = {
        require(paths.size == 1,
          s"colf merge-on-read write requires exactly one table path, got $paths")
        val root = new Path(paths.head)
        val fs = root.getFileSystem(ColfUtil.driverHadoopConf())
        require(ColfVersions.enabled(fs, root),
          s"colf: merge-on-read DML needs a VERSIONED table (the manifest " +
            s"carries the deletion-vector references) but ${paths.head} has no " +
            "manifests — enable with CALL colf.enable_versioning(...) or " +
            "option(\"manifest\",\"true\") on a write, or use dmlMode copy-on-write")
        ColfUtil.colfFields(lwi.schema())
        new ColfDeltaWrite(paths.head, names.physSchema(lwi.schema()),
          lwi.queryId(), layoutPartitionCols.map(names.phys),
          ColfDeltaOperation.this)
      }
    }
}

/** The merge-on-read read: a plain [[ColfScan]] over the latest state
  * (mergeSchema on — evolved files read null-extended; a delete never
  * loses their extra columns because the file is not rewritten) that
  * RECORDS its final planned file set for commit-time conflict
  * validation. Inherits runtime-filter pruning, so a MERGE's matched-
  * files pre-pass still narrows the scan.
  */
private[colf] class ColfDeltaScan(op: ColfDeltaOperation, paths: Seq[String],
    fullSchema: StructType, required: StructType, filters: Seq[Filter],
    names: ColfNames = ColfNames.Identity)
    extends ColfScan(paths, fullSchema, required, mergeSchema = true,
      filters = filters, names = names) {

  override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val refs = plannedRefs
    op.scannedRefs = refs
    ColfUtil.binPack(refs)
  }

  override def description(): String =
    super.description() + " (merge-on-read: deletes become position-delete files)"
}

/** One task's delete set for one data file: the file's absolute path, a
  * partial (task-written, unreferenced) DV holding this task's positions
  * for it, and the position count. The driver merges partials per file.
  */
private[colf] case class ColfDeltaCommitMessage(inner: ColfCommitMessage,
    deletes: Seq[(String, String, Long)]) extends WriterCommitMessage

class ColfDeltaWrite(dir: String, schema: StructType, queryId: String,
    partitionBy: Seq[String], op: ColfDeltaOperation)
    extends DeltaWrite with DeltaBatchWrite {

  override def toBatch: DeltaBatchWrite = this

  override def description(): String = s"colf merge-on-read write to $dir"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val conf = ColfUtil.driverHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) fs.mkdirs(root)
    new ColfDeltaWriterFactory(dir, schema, queryId,
      new org.apache.spark.util.SerializableConfiguration(conf), partitionBy)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = ColfUtil.driverHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val scanned = op.scannedRefs
    if (scanned == null)
      throw new IllegalStateException(
        "colf: merge-on-read write committed before its scan planned — " +
          "cannot validate the touched file set")
    val scannedByRel: Map[String, ColfFileRef] =
      scanned.map(r => ColfVersions.relativize(fs, root, new Path(r.path)) -> r).toMap

    val msgs = messages.toSeq.collect { case m: ColfDeltaCommitMessage => m }
    val insertPairs = msgs.flatMap(_.inner.files)
    val facts = msgs.flatMap(_.inner.facts).toMap
    // task partials per touched data file (relative paths)
    val partialsByRel: Map[String, Seq[String]] = msgs.flatMap(_.deletes)
      .groupBy { case (abs, _, _) => ColfVersions.relativize(fs, root, new Path(abs)) }
      .map { case (rel, ds) => rel -> ds.map(_._2) }

    // The schema-narrowing guard the CoW path enforces, adapted: a DELETE
    // never loses an evolved file's extra columns (the file survives),
    // but an UPDATE's re-inserted rows are written through the table
    // schema — extra columns of the OLD row would silently vanish from
    // the new one. Same remedy, same loud message.
    if (op.command() != RowLevelOperation.Command.DELETE) {
      val wc = (schema.fields.map(_.name) ++ partitionBy)
        .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      partialsByRel.keys.foreach { rel =>
        val ref = scannedByRel.get(rel)
        val hdr = ref.flatMap(r =>
          try Some(ColfHeaderCache.get(r, conf)) catch { case _: java.io.IOException => None })
        val extras = hdr.toSeq.flatMap(_.schema.fields.map(_.name))
          .filterNot(n => wc(n.toLowerCase(java.util.Locale.ROOT)))
        if (extras.nonEmpty)
          throw new IllegalStateException(
            s"colf: merge-on-read UPDATE would DROP column(s) ${extras.mkString(", ")} " +
              s"stored in $rel but absent from the table schema — the table has " +
              "evolved; load it with option(\"mergeSchema\", \"true\") (or add " +
              "mergeSchema 'true' to the DDL table's OPTIONS) so updated rows " +
              "carry every column")
      }
    }

    // 1) inserts: rename temps into place (parallel), exactly like the
    //    batch write — invisible to readers until the manifest flips
    ColfHeaderCache.mapParallel(insertPairs) { case (tmp, fin) =>
      val src = new Path(tmp)
      val dst = new Path(fin)
      if (fs.exists(dst)) fs.delete(dst, false)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"colf delta commit: rename $src -> $dst failed")
    }

    // 2) one manifest append: repoint touched entries at merged DVs, drop
    //    fully-deleted entries, add insert entries. Validation re-runs
    //    against every observed basis inside the optimistic claim loop.
    ColfVersions.append(fs, root, op = "dml.mor", compute = { basis =>
      val prev = basis.map(_._2).getOrElse(
        throw new IllegalStateException(
          s"colf: $dir lost its manifests mid-operation — merge-on-read " +
            "requires a versioned table"))
      val byRel = prev.map(e => e.relPath -> e).toMap
      val replaced: Map[String, Option[ColfVersions.Entry]] =
        partialsByRel.map { case (rel, partials) =>
          val entry = byRel.getOrElse(rel,
            throw new java.util.ConcurrentModificationException(
              s"colf: merge-on-read commit conflict at $dir — $rel was removed " +
                "or rewritten by a concurrent commit; re-run against the new state"))
          val ref = scannedByRel.getOrElse(rel,
            throw new IllegalStateException(
              s"colf: delete positions for $rel, which the operation's scan " +
                "never planned — internal error"))
          val scanDvRel =
            if (ref.dvPath == null) null
            else ColfVersions.relativize(fs, root, new Path(ref.dvPath))
          if (entry.size != ref.size || entry.mtime != ref.mtime ||
              entry.dv != scanDvRel)
            throw new java.util.ConcurrentModificationException(
              s"colf: merge-on-read commit conflict at $dir — $rel changed " +
                "since this operation's scan (concurrent row-level commit or " +
                "in-place rewrite); re-run against the new state")
          val existing =
            if (entry.dv == null) Array.empty[Long]
            else ColfDeletes.read(fs, root, entry.dv)
          val fresh = partials.iterator
            .map(p => ColfDeletes.read(fs, root, p))
            .foldLeft(Array.empty[Long])(ColfDeletes.union)
          val merged = ColfDeletes.union(existing, fresh)
          val totalRows =
            if (entry.numRows >= 0) entry.numRows
            else ColfHeaderCache.get(
              ColfVersions.toRefs(fs, root, Seq(entry)).head, conf).schema.numRows
          require(merged.isEmpty || merged.last < totalRows,
            s"colf: delete position ${merged.last} out of range for $rel " +
              s"($totalRows rows) — internal error")
          // every row masked → the entry (and its DV) leaves the manifest
          if (merged.length == totalRows) rel -> None
          else rel -> Some(entry.copy(
            dv = ColfDeletes.write(fs, root, merged), dvRows = merged.length.toLong))
        }
      prev.flatMap(e => replaced.get(e.relPath) match {
        case Some(repl) => repl // touched: merged entry, or dropped
        case None       => Some(e)
      }) ++ insertEntries(fs, root, insertPairs, facts)
    })

    // 3) partials are unreferenced scratch — clean them eagerly (a crash
    //    here merely leaves vacuumable orphans)
    ColfHeaderCache.mapParallel(partialsByRel.values.flatten.toSeq)(p =>
      fs.delete(new Path(root, p), false))
  }

  private def insertEntries(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      pairs: Seq[(String, String)],
      facts: Map[String, ColfFileFacts]): Seq[ColfVersions.Entry] = {
    // a pure DELETE has an empty write schema and no insert files; the
    // partition columns then resolve against nothing (same filter as the
    // task-side writer)
    val partPos = partitionBy.filter(schema.fieldNames.contains)
      .map(schema.fieldIndex).toSet
    val fileFields: Seq[ColfField] = ColfUtil.colfFields(StructType(
      schema.fields.zipWithIndex.collect { case (f, i) if !partPos(i) => f }))
    ColfHeaderCache.mapParallel(pairs) { case (_, fin) =>
      val p = new Path(fin)
      val st = fs.getFileStatus(p)
      val f = facts.get(fin)
      ColfVersions.Entry(ColfVersions.relativize(fs, root, p), st.getLen,
        st.getModificationTime, fileFields,
        f.map(_.numRows).getOrElse(-1L), f.map(_.stats).orNull)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = ColfUtil.driverHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    messages.foreach {
      case m: ColfDeltaCommitMessage =>
        m.inner.files.foreach { case (tmp, _) =>
          val p = new Path(tmp)
          if (fs.exists(p)) fs.delete(p, false)
        }
        m.deletes.foreach { case (_, partial, _) =>
          val p = new Path(root, partial)
          if (fs.exists(p)) fs.delete(p, false)
        }
      case _ => ()
    }
  }
}

class ColfDeltaWriterFactory(dir: String, schema: StructType, queryId: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    partitionBy: Seq[String]) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new ColfDeltaRowWriter(dir, schema, queryId, partitionId, taskId, conf, partitionBy)
}

/** Task-side half of merge-on-read DML: inserts stream through an
  * ordinary [[ColfDataWriter]] (rolling caps, hive partition routing —
  * suppressing the zero-row placeholder file a pure DELETE would
  * otherwise emit), deletes accumulate per data file and serialize as
  * one PARTIAL deletion vector per (task, file) at commit. Partials are
  * unreferenced by any manifest; the driver merges and publishes them.
  * Memory: positions of rows THIS task deletes, 8 bytes each — bounded
  * by the task's share of matched rows, the same order as the rows it
  * already buffered to produce them.
  */
private[colf] class ColfDeltaRowWriter(dir: String, schema: StructType,
    queryId: String, partitionId: Int, taskId: Long,
    conf: org.apache.spark.util.SerializableConfiguration,
    partitionBy: Seq[String]) extends DeltaWriter[InternalRow] {

  // A pure DELETE's write schema is EMPTY (no rows will ever be
  // inserted) — the inner writer must not resolve partition columns
  // against it. Insert-carrying commands (UPDATE/MERGE) always receive
  // the full table schema, so the intersection is exactly partitionBy.
  private val effectivePartitionBy = partitionBy.filter(schema.fieldNames.contains)

  private val inner = new ColfDataWriter(dir, schema, queryId, partitionId, taskId,
    ColfWrite.DefaultMaxRowsPerFile, ColfWrite.DefaultMaxBytesPerFile,
    ColfCodec.DefaultCompressionLevel, conf, None, effectivePartitionBy,
    allowEmptyFile = false)

  private val deletes =
    new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Long]]()

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString
    val pos = id.getLong(1)
    var buf = deletes.get(file)
    if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[Long]; deletes.put(file, buf) }
    buf += pos
  }

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    // unreachable under representUpdateAsDeleteAndInsert — kept total
    delete(metadata, id)
    insert(row)
  }

  override def insert(row: InternalRow): Unit = inner.write(row)

  override def commit(): WriterCommitMessage = {
    val innerMsg = inner.commit().asInstanceOf[ColfCommitMessage]
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    val parts = Seq.newBuilder[(String, String, Long)]
    deletes.forEach { (file, buf) =>
      val sorted = buf.toArray.distinct.sorted
      val rel = ColfDeletes.write(fs, root, sorted, prefix = "pd")
      parts += ((file, rel, sorted.length.toLong))
    }
    ColfDeltaCommitMessage(innerMsg, parts.result())
  }

  override def abort(): Unit = inner.abort()

  override def close(): Unit = inner.close()
}
