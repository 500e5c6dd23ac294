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

/** Optional per-column statistics for data skipping, carried as EXTRA KEYS
  * inside each column object of the header schema JSON. The reference
  * reader parses that JSON with `json.loads` and reads only the keys it
  * knows (reader.py:66-72), so stats-bearing files stay byte-readable by
  * `reference/reader.py` — no sidecar files to lose, no footer to seek.
  *
  * `min`/`max` are typed by the column: Int (int32), Double (float64) or
  * String (utf8), always over NON-NULL values only. Bounds may be absent
  * when unavailable (zero non-null rows, a float column containing
  * NaN/±Inf — not JSON-encodable and NaN breaks ordering — or a string
  * max longer than the truncation cap). A string `min` may be a TRUNCATED
  * PREFIX of the true minimum — still a valid lower bound in binary
  * (UTF8String) order; a string `max` is only written when exact.
  */
final case class ColfColStats(nullCount: Long, min: Option[Any], max: Option[Any])
    extends Serializable

/** The header's human-readable schema JSON:
  * {"num_rows": N, "columns": [{"name","type","nullable"}...]}
  * (reference: writer.py:171, SPEC.md:25-33), plus optional per-column
  * stats keys (`null_count`/`min`/`max`) written by our writer only.
  */
final case class ColfSchema(numRows: Long, fields: IndexedSeq[ColfField],
    stats: Map[String, ColfColStats] = Map.empty)
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
        .append("\", \"nullable\": ").append(f.nullable)
      stats.get(f.name).foreach { st =>
        sb.append(", \"null_count\": ").append(st.nullCount)
        st.min.foreach(v => sb.append(", \"min\": ").append(ColfSchema.statJson(v)))
        st.max.foreach(v => sb.append(", \"max\": ").append(ColfSchema.statJson(v)))
      }
      sb.append("}")
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

  /** JSON encoding of a typed stat bound. Doubles use Java's shortest
    * round-trip rendering (a valid JSON number; NaN/Inf never reach here —
    * the builders drop stats for such columns).
    */
  private[colf] def statJson(v: Any): String = v match {
    case i: Int    => i.toString
    case d: Double => java.lang.Double.toString(d)
    case s: String => quote(s)
    case other => throw new IllegalArgumentException(s"unsupported stat type: $other")
  }

  def fromJson(json: String): ColfSchema = {
    val root: JsonNode = mapper.readTree(json)
    val numRows = root.get("num_rows").asLong()
    val cols = root.get("columns")
    val stats = Map.newBuilder[String, ColfColStats]
    val fields = (0 until cols.size()).map { i =>
      val c = cols.get(i)
      val f = ColfField(
        c.get("name").asText(),
        ColfType.fromName(c.get("type").asText()),
        c.get("nullable").asBoolean())
      if (c.has("null_count")) {
        def bound(key: String): Option[Any] =
          if (!c.has(key)) None
          else Some(f.tpe match {
            case ColfType.Int32   => c.get(key).asInt()
            case ColfType.Float64 => c.get(key).asDouble()
            case ColfType.Utf8    => c.get(key).asText()
          })
        stats += f.name -> ColfColStats(c.get("null_count").asLong(), bound("min"), bound("max"))
      }
      f
    }
    ColfSchema(numRows, ArraySeq.unsafeWrapArray(fields.toArray), stats.result())
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
