package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.immutable.ArraySeq

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.colf._

class ColfCodecSpec extends AnyFunSuite {

  private def roundtrip(
      fields: IndexedSeq[ColfField],
      columns: IndexedSeq[IndexedSeq[Option[Any]]]): (ColfHeader, IndexedSeq[ColfCodec.DecodedColumn]) = {
    val builders = fields.map(f => ColfCodec.builderFor(f.tpe))
    val n = if (columns.isEmpty) 0 else columns.head.length
    for (r <- 0 until n; c <- fields.indices) {
      columns(c)(r) match {
        case None => builders(c).appendNull()
        case Some(v) => (builders(c), v) match {
          case (b: ColfCodec.IntColumnBuilder, i: Int)       => b.append(i)
          case (b: ColfCodec.DoubleColumnBuilder, d: Double) => b.append(d)
          case (b: ColfCodec.StringColumnBuilder, s: String) => b.append(s)
          case other => fail(s"bad pair $other")
        }
      }
    }
    val out = new ByteArrayOutputStream()
    ColfCodec.writeFile(out, fields, builders)
    val in = new ByteArrayInputStream(out.toByteArray)
    val header = ColfCodec.readHeader(in)
    val bytes = out.toByteArray
    val decoded = fields.indices.map { c =>
      val m = header.metas(c)
      if (m.compSize == 0) ColfCodec.allNullColumn(fields(c).tpe, n)
      else {
        val comp = bytes.slice(m.offset.toInt, (m.offset + m.compSize).toInt)
        ColfCodec.decodeColumn(
          ColfCodec.decompress(comp, m.uncompSize.toInt), fields(c).tpe, n, m.hasNulls)
      }
    }
    (header, decoded)
  }

  private def str(col: ColfCodec.DecodedColumn, i: Int): String =
    new String(col.strBlob, col.strStarts(i), col.strEnds(i) - col.strStarts(i),
      StandardCharsets.UTF_8)

  test("basic int/double/string roundtrip with nulls") {
    val fields = ArraySeq(
      ColfField("i", ColfType.Int32, nullable = true),
      ColfField("d", ColfType.Float64, nullable = true),
      ColfField("s", ColfType.Utf8, nullable = true))
    val cols = ArraySeq[IndexedSeq[Option[Any]]](
      ArraySeq(Some(1), None, Some(-2147483648), Some(2147483647)),
      ArraySeq(Some(1.5), Some(Double.NaN), None, Some(-0.0)),
      ArraySeq(Some("a"), Some(""), None, Some("日本語 🎉")))
    val (header, dec) = roundtrip(fields, cols)
    assert(header.schema.numRows == 4)
    assert(dec(0).ints.toSeq == Seq(1, 0, -2147483648, 2147483647))
    assert(dec(0).isNullAt(1) && !dec(0).isNullAt(0))
    assert(dec(1).doubles(0) == 1.5 && dec(1).doubles(1).isNaN && dec(1).isNullAt(2))
    assert(java.lang.Double.doubleToRawLongBits(dec(1).doubles(3)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(str(dec(2), 0) == "a")
    assert(str(dec(2), 1) == "")        // empty string ≠ null in our writer
    assert(dec(2).isNullAt(2))
    assert(str(dec(2), 3) == "日本語 🎉")
  }

  test("empty table (0 rows) roundtrips — fixes reference writer bug") {
    val fields = ArraySeq(
      ColfField("a", ColfType.Int32, nullable = true),
      ColfField("b", ColfType.Utf8, nullable = true))
    val (header, dec) = roundtrip(fields, ArraySeq(ArraySeq(), ArraySeq()))
    assert(header.schema.numRows == 0)
    assert(header.schema.fields.map(_.name) == Seq("a", "b"))
    assert(dec(0).numRows == 0)
  }

  test("null bitmap is LSB-first within each byte") {
    // rows 0 and 3 null → bitmap byte 0b00001001 = 9 (SPEC.md:45)
    val b = new ColfCodec.IntColumnBuilder
    b.appendNull(); b.append(1); b.append(2); b.appendNull(); b.append(3)
    val p = b.payload()
    assert(p(0) == 1.toByte) // dtype int32
    assert(p(1) == 1.toByte) // hasNulls
    assert(p(2) == 9.toByte)
  }

  test("fuzz: 200 seeded random tables roundtrip") {
    val rnd = new scala.util.Random(42)
    val specials = Seq("héllo", "日本語", "a\nb", "c,d", " pad ")
    def cell(t: ColfType): Option[Any] = t match {
      case ColfType.Int32 =>
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt())
      case ColfType.Float64 => rnd.nextInt(6) match {
        case 0 => None
        case 1 => Some(Double.NaN)
        case _ => Some((rnd.nextDouble() - 0.5) * 2e12)
      }
      case ColfType.Utf8 => rnd.nextInt(7) match {
        case 0 => None
        case 1 => Some("")
        case 2 => Some(specials(rnd.nextInt(specials.length)))
        case _ => Some(rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
      }
    }
    for (_ <- 1 to 200) {
      val types = IndexedSeq.fill(1 + rnd.nextInt(5))(
        IndexedSeq(ColfType.Int32, ColfType.Float64, ColfType.Utf8)(rnd.nextInt(3)))
      val n = rnd.nextInt(51)
      val cols: IndexedSeq[IndexedSeq[Option[Any]]] =
        types.map(t => IndexedSeq.fill(n)(cell(t)))
      val fields = ArraySeq.from(types.zipWithIndex.map { case (t, i) =>
        ColfField(s"c$i", t, nullable = true) })
      val (header, dec) = roundtrip(fields, cols)
      assert(header.schema.numRows == n)
      for (c <- types.indices; r <- 0 until n) {
        val col = dec(c)
        cols(c)(r) match {
          case None => assert(col.isNullAt(r))
          case Some(v: Int)    => assert(!col.isNullAt(r) && col.ints(r) == v)
          case Some(v: Double) =>
            assert(!col.isNullAt(r) &&
              (col.doubles(r) == v || (col.doubles(r).isNaN && v.isNaN)))
          case Some(v: String) => assert(!col.isNullAt(r) && str(col, r) == v)
          case other => fail(s"unexpected $other")
        }
      }
    }
  }

  // ---- golden files written by the reference implementation ----

  private def goldenBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing golden fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def decodeGolden(name: String): (ColfHeader, IndexedSeq[ColfCodec.DecodedColumn]) = {
    val bytes = goldenBytes(name)
    val header = ColfCodec.readHeader(new ByteArrayInputStream(bytes))
    val n = header.schema.numRows.toInt
    val dec = header.schema.fields.indices.map { c =>
      val m = header.metas(c)
      if (m.compSize == 0) ColfCodec.allNullColumn(header.schema.fields(c).tpe, n)
      else ColfCodec.decodeColumn(
        ColfCodec.decompress(
          bytes.slice(m.offset.toInt, (m.offset + m.compSize).toInt),
          m.uncompSize.toInt),
        header.schema.fields(c).tpe, n, m.hasNulls)
    }
    (header, dec)
  }

  test("golden: reference-written nulls.colf decodes (null offsets = 0 style)") {
    val (header, dec) = decodeGolden("nulls.colf")
    assert(header.schema.fields.map(f => (f.name, f.tpe.name, f.nullable)) ==
      Seq(("id", "int32", false), ("maybe", "utf8", true)))
    assert(header.schema.numRows == 3)
    assert(dec(0).ints.toSeq == Seq(1, 2, 3))
    assert(dec(1).isNullAt(0) && !dec(1).isNullAt(1) && dec(1).isNullAt(2))
    assert(str(dec(1), 1) == "hello")
  }

  test("golden: mix.colf — mixed types with scattered nulls") {
    val (header, dec) = decodeGolden("mix.colf")
    assert(header.schema.fields.map(f => (f.name, f.tpe.name)) ==
      Seq(("i", "int32"), ("f", "float64"), ("s", "utf8")))
    assert(dec(0).ints(0) == 1 && dec(0).ints(1) == 2 && dec(0).isNullAt(2))
    assert(dec(1).doubles(0) == 1.5 && dec(1).isNullAt(1) && dec(1).doubles(2) == 3.1415)
    assert(Seq(str(dec(2), 0), str(dec(2), 1), str(dec(2), 2)) == Seq("a", "b", "c"))
  }

  test("golden: edge.colf — whitespace→null, NaN value, signs, unicode") {
    val (header, dec) = decodeGolden("edge.colf")
    val byName = header.schema.fields.map(_.name).zipWithIndex.toMap
    val ws = dec(byName("ws"))
    assert(ws.isNullAt(0))               // "  " → NULL
    assert(str(ws, 1) == "x ")           // trailing space preserved
    assert(str(ws, 2) == " y")           // leading space preserved
    val sci = dec(byName("sci"))
    assert(sci.doubles(0) == 1000.0 && sci.doubles(1).isNaN && sci.doubles(2) == 2.5)
    val sign = dec(byName("sign"))
    assert(sign.ints.toSeq == Seq(-5, 3, 7))
    val bool = dec(byName("bool"))
    assert(bool.tpe == ColfType.Utf8 && str(bool, 0) == "True")
    val uni = dec(byName("uni"))
    assert(str(uni, 1) == "日本語テキスト")
  }

  test("golden: sample_medium.colf decodes all 10k rows") {
    val (header, dec) = decodeGolden("sample_medium.colf")
    assert(header.schema.numRows == 10000)
    assert(dec(0).ints.length == 10000)
  }
}
