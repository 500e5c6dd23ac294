package graft.sources.colf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side table observability as LOGICAL PLANS — the bodies of the
  * `colf_files` / `colf_versions` table-valued functions. Everything here
  * is metadata a query PLANNER already pays for (listing or manifest +
  * cached headers): materializing it as rows costs one planning pass, no
  * data blocks. The result is a LocalRelation, so downstream SQL
  * (filters, aggregates, joins against these) is ordinary Catalyst.
  */
object ColfInfo {

  /** One row per live data file: path, partition dir ('' when flat),
    * size, mtime, and the header's exact row count — the SQL form of the
    * `ColfTools stats` CLI and of what file pruning sees.
    */
  def filesPlan(path: String): LogicalPlan = {
    val conf = ColfUtil.driverHadoopConf()
    val refs = ColfUtil.resolveFileRefs(Seq(path), conf)
    // manifest-recorded facts answer without opening files (same counts)
    val headers = ColfHeaderCache.getAllPlanning(refs, conf)
    val rows = refs.lazyZip(headers).map { (r, h) =>
      val rel = r.partValues.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("/")
      InternalRow(UTF8String.fromString(r.path), UTF8String.fromString(rel),
        r.size, r.mtime, h.schema.numRows)
    }.toSeq
    LocalRelation(Seq(
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("partition", StringType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("mtime", LongType, nullable = false)(),
      AttributeReference("num_rows", LongType, nullable = false)()), rows)
  }

  /** One row per retained snapshot — the DESCRIBE-HISTORY surface:
    * version, the committing OPERATION ("append", "overwrite",
    * "dml.mor", "create", "alter", … — "commit" for pre-op manifests),
    * file count, total bytes, live row count (-1 when some file's count
    * is unrecorded), and the commit time ([[ColfVersions.commitTime]] —
    * the ts EMBEDDED in the manifest, so history survives a table
    * copy/relocation; mtime fallback for pre-ts manifests). Fails
    * loudly on an unversioned table, naming the opt-in.
    */
  def versionsPlan(path: String): LogicalPlan = {
    val root = new Path(path)
    val fs = root.getFileSystem(ColfUtil.driverHadoopConf())
    val versions = ColfVersions.listVersions(fs, root)
    require(versions.nonEmpty,
      s"colf_versions: $path is not a versioned table " +
        "(enable with option(\"manifest\", \"true\") on a write)")
    val rows = versions.map { v =>
      val entries = ColfVersions.read(fs, root, v)
      val numRows =
        if (entries.exists(_.numRows < 0)) -1L
        else entries.map(e => e.numRows - e.dvRows).sum
      InternalRow(v,
        org.apache.spark.unsafe.types.UTF8String.fromString(
          ColfVersions.commitOp(fs, root, v)),
        entries.length.toLong, entries.map(_.size).sum, numRows,
        ColfVersions.commitTime(fs, root, v))
    }
    LocalRelation(Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("operation", StringType, nullable = false)(),
      AttributeReference("num_files", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("num_rows", LongType, nullable = false)(),
      AttributeReference("committed_at", LongType, nullable = false)()), rows)
  }
}
