package graft.sources.colf

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Stream position over an append-only .colf directory: everything at or
  * before `mtime` is consumed — except that files SHARING the boundary
  * millisecond are tracked by name (`names`), so two files committed in
  * the same clock tick can straddle a batch boundary without loss or
  * duplication. Serialized into the checkpoint as JSON.
  */
case class ColfSourceOffset(mtime: Long, names: Seq[String]) extends Offset {
  override def json(): String = {
    val quoted = names.map(ColfSchema.quote).mkString("[", ",", "]")
    s"""{"mtime":$mtime,"names":$quoted}"""
  }
}

object ColfSourceOffset {
  private val mapper = new ObjectMapper()
  val Initial: ColfSourceOffset = ColfSourceOffset(Long.MinValue, Nil)

  def fromJson(json: String): ColfSourceOffset = {
    val root = mapper.readTree(json)
    val names = root.get("names")
    ColfSourceOffset(root.get("mtime").asLong(),
      (0 until names.size()).map(names.get(_).asText()))
  }
}

/** Micro-batch streaming SOURCE over a colf directory
  * (`readStream.format("colf")`).
  *
  * Contract: the directory is APPEND-ONLY — files become visible by
  * atomic rename with a fresh name and a then-current mtime (exactly what
  * both our batch writer and streaming sink produce). Each micro batch is
  * "files that appeared since the last offset", discovered by directory
  * listing; a file is read exactly once. Rewriting a file in place (a
  * newer mtime under an old name) violates the contract and would
  * re-emit it.
  *
  * Pushed stats filters prune each batch's files the same way batch scans
  * prune (`ColfPrune`); readers are the same zero-copy columnar readers.
  */
class ColfMicroBatchStream(paths: Seq[String], required: StructType,
    mergeSchema: Boolean, filters: Seq[Filter], conf: Configuration,
    maxFilesPerTrigger: Option[Int] = None, maxRowsPerTrigger: Option[Long] = None,
    absorbed: Seq[Filter] = Seq.empty, fullSchema: StructType = StructType(Nil))
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow snapshot: batches drain up to the files present
    * when the trigger fired (in capped increments), then the query stops —
    * later arrivals wait for the next run.
    */
  @volatile private var availableNowTarget: Option[ColfSourceOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestOffset().asInstanceOf[ColfSourceOffset])

  override def reportLatestOffset(): Offset = latestOffset()

  /** Live view, with the merge-on-read guard: the stream's contract is
    * append-only FILES, but a deletion vector ([[ColfDeletes]]) mutates a
    * file's logical content in place — rows this stream may have already
    * emitted become deleted with no retraction to send. There is no
    * sound way to represent that in an append-only source, so ANY DV in
    * the view fails the stream loudly (even one on a not-yet-consumed
    * file: its vector could grow after consumption just as silently).
    * Fold deletes away with compaction, or diff snapshots in batch
    * ([[ColfMaintenance.diffVersions]] emits added/removed rows).
    */
  private def list(): Seq[ColfFileRef] = {
    val refs = ColfUtil.resolveFileRefs(paths, conf)
    val dvd = refs.filter(_.dvPath != null)
    if (dvd.nonEmpty)
      throw new IllegalStateException(
        s"colf stream: ${paths.mkString(",")} carries deletion vectors on " +
          s"${dvd.length} file(s) (merge-on-read DML ran against it) — an " +
          "append-only stream cannot retract already-emitted rows. Compact " +
          "the table to fold the deletes, or use ColfMaintenance.diffVersions " +
          "for batch change capture with removals")
    refs
  }

  /** Strictly after `o`: a later millisecond, or an unseen name within
    * the boundary millisecond. Boundary names are probed as a Set — a
    * capped catch-up through one large same-mtime cohort (coarse-mtime
    * filesystems) makes the boundary list as large as the cohort, and a
    * linear `contains` per listed file would go quadratic on the driver.
    * The offset itself shrinks back to the new boundary's files as soon
    * as the stream crosses into a later millisecond.
    */
  private def isAfter(r: ColfFileRef, o: ColfSourceOffset, names: Set[String]): Boolean =
    r.mtime > o.mtime || (r.mtime == o.mtime && !names.contains(r.path))

  override def initialOffset(): Offset = ColfSourceOffset.Initial

  override def latestOffset(): Offset = {
    val refs = list()
    if (refs.isEmpty) ColfSourceOffset.Initial
    else {
      val maxM = refs.map(_.mtime).max
      ColfSourceOffset(maxM, refs.filter(_.mtime == maxM).map(_.path))
    }
  }

  /** Admission control (`option("maxFilesPerTrigger", n)` /
    * `option("maxRowsPerTrigger", n)`): cap each micro batch. Without a
    * cap, a stream started against a year of backlog ingests the WHOLE
    * directory as one batch — caps turn catch-up into bounded,
    * checkpointed increments. The row cap admits whole files until their
    * header row counts reach n (headers are free via the cache — the
    * format makes row-based rate control exact without opening data
    * blocks). Files admit in (mtime, path) order; when the cut lands
    * inside a boundary millisecond, the offset's name list keeps the
    * already-covered files so the remainder (and only the remainder)
    * admits next batch.
    */
  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxRowsPerTrigger.map(ReadLimit.maxRows).toSeq
    limits match {
      case Seq()  => ReadLimit.allAvailable()
      case Seq(l) => l
      case many   => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** Most-restrictive prefix of `fresh` under the limit (whole files;
    * always ≥1 file when any is available so the stream progresses).
    */
  private def admit(fresh: Seq[ColfFileRef], limit: ReadLimit): Seq[ColfFileRef] = limit match {
    case m: ReadMaxFiles => fresh.take(m.maxFiles())
    case m: ReadMaxRows =>
      // row counts come from the manifest when recorded (zero I/O — the
      // versioned-table stream never opens a header to admit); otherwise
      // headers fetch in parallel CHUNKS ahead of the row-count walk — a
      // cold-cache catch-up admitting ~1000 files must not serialize one
      // blocking header RPC at a time on the driver
      val taken = Seq.newBuilder[ColfFileRef]
      var acc = 0L
      var n = 0
      var i = 0
      while (i < fresh.length && acc < m.maxRows()) {
        val chunk = fresh.slice(i, math.min(i + 64, fresh.length))
        val headers = ColfHeaderCache.getAllPlanning(chunk, conf)
        var j = 0
        while (j < chunk.length && acc < m.maxRows()) {
          taken += chunk(j); n += 1
          acc += headers(j).schema.numRows
          j += 1
        }
        i += chunk.length
      }
      if (n == 0) fresh.take(1) else taken.result()
    case c: CompositeReadLimit =>
      c.getReadLimits.foldLeft(fresh)((acc, l) => admit(acc, l))
    case _ => fresh
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ColfSourceOffset]
    val sNames = s.names.toSet
    val fresh0 = list().filter(isAfter(_, s, sNames))
    val fresh = (availableNowTarget match {
      case Some(t) =>
        val tNames = t.names.toSet
        fresh0.filter(r => !isAfter(r, t, tNames))
      case None => fresh0
    }).sortBy(r => (r.mtime, r.path))
    val admitted = admit(fresh, limit)
    if (admitted.isEmpty) s
    else {
      val maxM = admitted.last.mtime
      val atBoundary = admitted.filter(_.mtime == maxM).map(_.path)
      val carried = if (maxM == s.mtime) s.names ++ atBoundary else atBoundary
      ColfSourceOffset(maxM, carried)
    }
  }

  override def deserializeOffset(json: String): Offset = ColfSourceOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ColfSourceOffset]
    val e = end.asInstanceOf[ColfSourceOffset]
    val sNames = s.names.toSet
    val eNames = e.names.toSet
    val batch0 = list().filter(r => isAfter(r, s, sNames) && !isAfter(r, e, eNames))
    // Absorbed partition filters are not re-evaluated by Spark, so their
    // file-level application must be exact — undecidable fails loudly
    // (see ColfScan.absorbedRefs; new files must keep the layout shape).
    val batch =
      if (absorbed.isEmpty) batch0
      else batch0.filter { r =>
        val tv = ColfUtil.typedPartValues(r, fullSchema)
        absorbed.forall(f => ColfPartitions.evalExact(tv, f).getOrElse(
          throw new IllegalStateException(
            s"colf stream: absorbed partition filter $f undecidable for ${r.path}")))
      }
    val pruned =
      if (filters.isEmpty) batch
      else ColfPrune.pruneRefs(batch, filters, conf) // manifest-first tiering
    ColfUtil.binPack(pruned)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ColfPartitionReaderFactory(required, mergeSchema, new SerializableConfiguration(conf),
      fileMetaEnabled = !fullSchema.fieldNames.contains(ColfUtil.FileMetaCol),
      posMetaEnabled = !fullSchema.fieldNames.contains(ColfUtil.PosMetaCol))

  override def commit(end: Offset): Unit = () // nothing to clean up
  override def stop(): Unit = ()
}
