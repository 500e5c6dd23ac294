package graft.sources.colf

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DSv2 write path: each task buffers its partition's columns, then emits
  * one `part-<pid>-<tid>.colf` file. The format's header carries absolute
  * block offsets and precedes all data (SPEC.md:14,21), so sizes must be
  * known before the first data byte — hence buffer-then-write per task,
  * exactly the constraint the reference writer works under
  * (writer.py:174-210). A directory of part files is the scale-out layout;
  * the reader unions them (one InputPartition each).
  */
class ColfWriteBuilder(paths: Seq[String], info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateMode = false

  override def truncate(): WriteBuilder = { truncateMode = true; this }

  override def build(): Write = {
    require(paths.size == 1, s"colf write requires exactly one output path, got $paths")
    // Validate the schema up front — fail at planning, not mid-job.
    ColfUtil.colfFields(info.schema())
    new ColfWrite(paths.head, info.schema(), truncateMode)
  }
}

class ColfWrite(dir: String, schema: StructType, truncate: Boolean)
    extends Write with BatchWrite {

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // Driver-side setup: ensure the directory exists; clear it for
    // mode("overwrite") (TRUNCATE capability).
    val path = new Path(dir)
    val fs = path.getFileSystem(new Configuration())
    if (!fs.exists(path)) fs.mkdirs(path)
    else if (truncate) {
      fs.listStatus(path).foreach { st =>
        if (st.isFile && st.getPath.getName.endsWith(".colf")) fs.delete(st.getPath, false)
      }
    }
    new ColfDataWriterFactory(dir, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    messages.foreach {
      case ColfCommitMessage(Some(file)) =>
        val p = new Path(file)
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.delete(p, false)
      case _ => ()
    }
  }
}

case class ColfCommitMessage(file: Option[String]) extends WriterCommitMessage

class ColfDataWriterFactory(dir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ColfDataWriter(dir, schema, partitionId, taskId)
}

class ColfDataWriter(dir: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val fields = ColfUtil.colfFields(schema)
  private val builders: IndexedSeq[ColfCodec.ColumnBuilder] =
    fields.map(f => ColfCodec.builderFor(f.tpe))
  private val ncols = fields.length

  override def write(record: InternalRow): Unit = {
    var c = 0
    while (c < ncols) {
      if (record.isNullAt(c)) builders(c).appendNull()
      else builders(c) match {
        case b: ColfCodec.IntColumnBuilder    => b.append(record.getInt(c))
        case b: ColfCodec.DoubleColumnBuilder => b.append(record.getDouble(c))
        case b: ColfCodec.StringColumnBuilder =>
          b.append(record.getUTF8String(c).getBytes)
      }
      c += 1
    }
  }

  override def commit(): WriterCommitMessage = {
    val rows = if (builders.isEmpty) 0 else builders.head.count
    // Empty partitions emit no file — except partition 0, so an all-empty
    // DataFrame still round-trips its schema (fixing the reference's own
    // zero-row writer bug, writer.py:153-154 / SURVEY.md §5).
    if (rows == 0 && partitionId != 0) return ColfCommitMessage(None)
    val file = new Path(dir, f"part-$partitionId%05d-$taskId.colf")
    val fs = file.getFileSystem(new Configuration())
    val out = fs.create(file, true)
    try ColfCodec.writeFile(out, fields, builders)
    finally out.close()
    ColfCommitMessage(Some(file.toString))
  }

  override def abort(): Unit = ()

  override def close(): Unit = ()
}
