package graft.sources.colf

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.collection.immutable.ArraySeq

/** COLF's closed three-type system (reference: writer.py:17-19, SPEC.md:42).
  * int32=1, float64=2, utf8=3; no other types exist in the format.
  */
sealed abstract class ColfType(val code: Int, val name: String) extends Serializable
object ColfType {
  case object Int32 extends ColfType(1, "int32")
  case object Float64 extends ColfType(2, "float64")
  case object Utf8 extends ColfType(3, "utf8")

  val all: Seq[ColfType] = Seq(Int32, Float64, Utf8)

  def fromName(s: String): ColfType =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"Unknown COLF type name: $s"))
  def fromCode(c: Int): ColfType =
    all.find(_.code == c).getOrElse(
      throw new IllegalArgumentException(s"Unknown COLF type code: $c"))
}

/** One column in the schema JSON (reference: SPEC.md:25-33). */
final case class ColfField(name: String, tpe: ColfType, nullable: Boolean)
    extends Serializable

/** The header's human-readable schema JSON:
  * {"num_rows": N, "columns": [{"name","type","nullable"}...]}
  * (reference: writer.py:171, SPEC.md:25-33).
  */
final case class ColfSchema(numRows: Long, fields: IndexedSeq[ColfField])
    extends Serializable {
  def fieldIndex(name: String): Int = {
    val i = fields.indexWhere(_.name == name)
    if (i < 0)
      throw new IllegalArgumentException(
        s"Column '$name' not found in file (columns: ${fields.map(_.name).mkString(", ")})")
    i
  }

  def toJson: String = {
    val sb = new StringBuilder
    sb.append("{\"num_rows\": ").append(numRows).append(", \"columns\": [")
    var first = true
    fields.foreach { f =>
      if (!first) sb.append(", ")
      first = false
      sb.append("{\"name\": ").append(ColfSchema.quote(f.name))
        .append(", \"type\": \"").append(f.tpe.name)
        .append("\", \"nullable\": ").append(f.nullable).append("}")
    }
    sb.append("]}")
    sb.toString
  }
}

object ColfSchema {
  private val mapper = new ObjectMapper()

  private[colf] def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def fromJson(json: String): ColfSchema = {
    val root: JsonNode = mapper.readTree(json)
    val numRows = root.get("num_rows").asLong()
    val cols = root.get("columns")
    val fields = (0 until cols.size()).map { i =>
      val c = cols.get(i)
      ColfField(
        c.get("name").asText(),
        ColfType.fromName(c.get("type").asText()),
        c.get("nullable").asBoolean())
    }
    ColfSchema(numRows, ArraySeq.unsafeWrapArray(fields.toArray))
  }
}

/** Per-column 25-byte metadata entry: absolute offset of the compressed
  * block, compressed/uncompressed sizes, has-nulls flag
  * (reference: SPEC.md:13-17, writer.py:197-203, reader.py:76-89).
  */
final case class ColfColumnMeta(
    offset: Long, compSize: Long, uncompSize: Long, hasNulls: Boolean)
    extends Serializable

final case class ColfHeader(
    version: Int,
    littleEndian: Boolean,
    schema: ColfSchema,
    metas: IndexedSeq[ColfColumnMeta],
    /** Absolute offset where column blocks start (= 10 + headerSize). */
    dataStart: Long)
    extends Serializable
