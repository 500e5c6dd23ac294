package graft.sources.colf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL stored procedures for table maintenance — the DSv2
  * `ProcedureCatalog` surface, so operational tasks are reachable from
  * pure SQL exactly like the DML and time-travel surfaces:
  *
  * {{{
  *   CALL colf.compact('/data/events')
  *   CALL colf.compact('/data/events', target_mb => 256, sort_by => 'k')
  *   CALL colf.vacuum('/data/events')
  *   CALL colf.vacuum_versions('/data/events', retain_last => 5)
  *   CALL colf.enable_versioning('/data/events')
  * }}}
  *
  * Each procedure returns its outcome as a one-row result (the same
  * counts the Scala API returns), so operators can assert on effects in
  * SQL pipelines. All are side-effecting driver actions, declared
  * non-deterministic so nothing caches or re-runs them speculatively.
  */
private[graft] object ColfProcedures {

  /** One procedure: fixed output schema, body over the coerced argument
    * row (argument order == `params` order; defaults already applied by
    * Spark's analyzer from the declared `defaultValue` SQL).
    */
  private def proc(nm: String, desc: String, params: Array[ProcedureParameter],
      out: StructType)(body: InternalRow => Array[Any]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = nm
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = nm
        override def description(): String = desc
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val row: InternalRow = new GenericInternalRow(body(input))
          val scan: Scan = new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = out
          }
          java.util.Collections.singletonList(scan).iterator()
        }
      }
    }

  private def p(name: String, tpe: DataType): ProcedureParameter =
    ProcedureParameter.in(name, tpe).build()
  private def pd(name: String, tpe: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, tpe).defaultValue(default).build()

  val all: Map[String, UnboundProcedure] = Seq(
    proc("compact",
      "rewrite a colf table into ~target_mb part files (per partition " +
        "directory on hive layouts); sort_by re-clusters within partitions",
      Array(p("path", StringType), pd("target_mb", IntegerType, "128"),
        pd("sort_by", StringType, "''")),
      StructType(Seq(StructField("files_before", IntegerType, nullable = false),
        StructField("files_after", IntegerType, nullable = false)))) { in =>
      val sortBy = in.getUTF8String(2).toString
      val (b, a) = ColfMaintenance.compact(SparkSession.active,
        in.getUTF8String(0).toString, in.getInt(1).toLong << 20,
        if (sortBy.isEmpty) Seq.empty else sortBy.split(",").map(_.trim).toSeq)
      Array(b, a)
    },
    proc("vacuum",
      "delete orphaned .colf.tmp files older than grace_minutes",
      Array(p("path", StringType), pd("grace_minutes", IntegerType, "1440")),
      StructType(Seq(StructField("temps_seen", IntegerType, nullable = false),
        StructField("temps_deleted", IntegerType, nullable = false)))) { in =>
      val (s, d) = ColfMaintenance.vacuum(SparkSession.active,
        in.getUTF8String(0).toString, in.getInt(1) * 60000L)
      Array(s, d)
    },
    proc("vacuum_versions",
      "prune manifest versions to the last retain_last and delete data " +
        "files referenced only by pruned versions (grace_minutes protects " +
        "in-flight commits); older_than_days >= 0 additionally RETAINS " +
        "every version committed within that window (time-based expiry)",
      Array(p("path", StringType), pd("retain_last", IntegerType, "2"),
        pd("grace_minutes", IntegerType, "1440"),
        pd("older_than_days", DoubleType, "-1.0")),
      StructType(Seq(StructField("data_files_deleted", IntegerType, nullable = false),
        StructField("versions_pruned", IntegerType, nullable = false)))) { in =>
      val days = in.getDouble(3)
      val cutoff =
        if (days < 0) Long.MaxValue
        else System.currentTimeMillis() - (days * 86400000L).toLong
      val (f, v) = ColfMaintenance.vacuumVersions(SparkSession.active,
        in.getUTF8String(0).toString, in.getInt(1), in.getInt(2) * 60000L, cutoff)
      Array(f, v)
    },
    proc("enable_versioning",
      "turn snapshot versioning on for an existing table (v1 = current listing)",
      Array(p("path", StringType)),
      StructType(Seq(StructField("version", LongType, nullable = false)))) { in =>
      Array(ColfMaintenance.enableVersioning(SparkSession.active,
        in.getUTF8String(0).toString))
    },
    proc("rewrite_manifests",
      "rewrite the latest version's metadata into fresh segments (fold " +
        "tombstones, drop partially-dead segment references) without " +
        "touching data files; vacuum_versions reclaims the old segments",
      Array(p("path", StringType)),
      StructType(Seq(StructField("version", LongType, nullable = false)))) { in =>
      Array(ColfMaintenance.rewriteManifests(SparkSession.active,
        in.getUTF8String(0).toString))
    }
  ).map(u => u.name() -> u).toMap
}
