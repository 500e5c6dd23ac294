package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.sources._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAllNoShrink

import graft.sources.colf._

/** SOUNDNESS of stats-based file pruning: whenever `ColfPrune.mayMatch`
  * says a file can be skipped, NO row in that file satisfies the filter
  * under Spark's predicate semantics (nan-safe double compare where
  * -0.0 == 0.0 and NaN sorts largest; binary UTF8 string order; null
  * never matches a value predicate). A pruning bug silently DROPS rows —
  * residual filters cannot resurrect a skipped file — so this property
  * sweeps generated columns (edge values included) and generated filters
  * through the REAL write path: builder → file bytes → header parse, so
  * the stats also round-trip their JSON encoding every case.
  */
object ColfPruneProps extends Properties("ColfPrune") {

  // Pure in-memory cases (~µs each): run deep, with a replayable seed.
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    PropsConfig.soundness(p, 3000)

  // ---- column generators (Option = SQL NULL)

  private val genInts: Gen[List[Option[Int]]] =
    Gen.listOfN(12, Gen.frequency(
      1 -> Gen.const(None),
      5 -> Gen.oneOf(Gen.choose(-100, 100), Gen.oneOf(Int.MinValue, Int.MaxValue, 0, -1))
        .map(Some(_))))

  private val genDoubles: Gen[List[Option[Double]]] =
    Gen.listOfN(12, Gen.frequency(
      1 -> Gen.const(None),
      5 -> Gen.oneOf(
        Gen.choose(-50.0, 50.0),
        Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
          Double.NegativeInfinity, 1.0 / 3.0)).map(Some(_))))

  private val genStrs: Gen[List[Option[String]]] =
    Gen.listOfN(12, Gen.frequency(
      1 -> Gen.const(None),
      5 -> Gen.oneOf(
        Gen.asciiPrintableStr.map(_.take(8)),
        Gen.oneOf("", "aa", "zz", "日本語", "🎉", "b" * 80, "\u0001ctl")).map(Some(_))))

  // ---- filter generators, biased toward the column's own values

  private def pick[T](vs: List[Option[T]], fallback: Gen[T]): Gen[T] = {
    val present = vs.flatten
    if (present.isEmpty) fallback else Gen.frequency(3 -> Gen.oneOf(present), 1 -> fallback)
  }

  private def genLeaf(attr: String, value: Gen[Any]): Gen[Filter] = Gen.oneOf(
    value.map(EqualTo(attr, _)),
    value.map(GreaterThan(attr, _)),
    value.map(GreaterThanOrEqual(attr, _)),
    value.map(LessThan(attr, _)),
    value.map(LessThanOrEqual(attr, _)),
    Gen.listOfN(3, value).map(vs => In(attr, vs.toArray)),
    Gen.const(IsNull(attr)),
    Gen.const(IsNotNull(attr)))

  private def genFilter(attr: String, value: Gen[Any], extra: Seq[Gen[Filter]] = Nil): Gen[Filter] = {
    val gens = Seq(genLeaf(attr, value)) ++ extra
    val leaf = Gen.choose(0, gens.length - 1).flatMap(gens(_))
    Gen.frequency(
      3 -> leaf,
      1 -> Gen.zip(leaf, leaf).map { case (a, b) => And(a, b) },
      1 -> Gen.zip(leaf, leaf).map { case (a, b) => Or(a, b) })
  }

  // ---- Spark predicate semantics, re-implemented for the reference side

  /** nan-safe compare: -0.0 == 0.0, NaN greater than everything. */
  private def cmpD(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1
    else {
      val xn = java.lang.Double.isNaN(x)
      val yn = java.lang.Double.isNaN(y)
      if (xn == yn) 0 else if (xn) 1 else -1
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Int)       => Integer.compare(x, y)
    case (x: Double, y: Double) => cmpD(x, y)
    case (x: String, y: String) => UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
    case other                  => sys.error(s"uncomparable $other")
  }

  private def evalFilter(f: Filter, v: Option[Any]): Boolean = f match {
    case And(l, r)                => evalFilter(l, v) && evalFilter(r, v)
    case Or(l, r)                 => evalFilter(l, v) || evalFilter(r, v)
    case IsNull(_)                => v.isEmpty
    case IsNotNull(_)             => v.isDefined
    case EqualTo(_, x)            => v.exists(cmp(_, x) == 0)
    case EqualNullSafe(_, null)   => v.isEmpty
    case EqualNullSafe(_, x)      => v.exists(cmp(_, x) == 0)
    case GreaterThan(_, x)        => v.exists(cmp(_, x) > 0)
    case GreaterThanOrEqual(_, x) => v.exists(cmp(_, x) >= 0)
    case LessThan(_, x)           => v.exists(cmp(_, x) < 0)
    case LessThanOrEqual(_, x)    => v.exists(cmp(_, x) <= 0)
    case In(_, xs)                => v.exists(a => xs.exists(x => x != null && cmp(a, x) == 0))
    case StringStartsWith(_, p)   => v.exists(_.asInstanceOf[String].startsWith(p))
    case other                    => sys.error(s"unexpected filter $other")
  }

  // ---- write a one-column file for real, parse its header back

  private def headerFor(tpe: ColfType, vs: List[Option[Any]]): ColfHeader = {
    val b = ColfCodec.builderFor(tpe)
    vs.foreach {
      case None            => b.appendNull()
      case Some(x: Int)    => b.asInstanceOf[ColfCodec.IntColumnBuilder].append(x)
      case Some(x: Double) => b.asInstanceOf[ColfCodec.DoubleColumnBuilder].append(x)
      case Some(x: String) => b.asInstanceOf[ColfCodec.StringColumnBuilder].append(x)
      case other           => sys.error(s"bad cell $other")
    }
    val bos = new ByteArrayOutputStream()
    ColfCodec.writeFile(bos, IndexedSeq(ColfField("c", tpe, true)), IndexedSeq(b))
    ColfCodec.readHeader(new ByteArrayInputStream(bos.toByteArray))
  }

  private def sound(tpe: ColfType, vs: List[Option[Any]], f: Filter): Prop = {
    val header = headerFor(tpe, vs)
    val pruned = !ColfPrune.mayMatch(header, Seq(f))
    val matching = vs.count(evalFilter(f, _))
    Prop(!pruned || matching == 0) :|
      s"pruned a file with $matching matching rows; filter=$f values=$vs stats=${header.schema.stats}"
  }

  property("int: pruned files contain no matching row") =
    forAllNoShrink(genInts.flatMap(vs =>
      genFilter("c", pick[Int](vs, Gen.choose(-120, 120)).map(_.asInstanceOf[Any]))
        .map(f => (vs, f)))) { case (vs, f) =>
      sound(ColfType.Int32, vs.map(_.map(x => x: Any)), f)
    }

  property("double: pruned files contain no matching row (NaN/Inf/-0.0 safe)") =
    forAllNoShrink(genDoubles.flatMap(vs =>
      genFilter("c", pick[Double](vs,
        Gen.oneOf(Gen.choose(-60.0, 60.0), Gen.oneOf(0.0, -0.0, Double.NaN)))
        .map(_.asInstanceOf[Any]))
        .map(f => (vs, f)))) { case (vs, f) =>
      sound(ColfType.Float64, vs.map(_.map(x => x: Any)), f)
    }

  property("string: pruned files contain no matching row (truncated bounds safe)") =
    forAllNoShrink(genStrs.flatMap { vs =>
      val value = pick[String](vs, Gen.asciiPrintableStr.map(_.take(6))).map(_.asInstanceOf[Any])
      val prefix = Gen.oneOf(Gen.const(""), Gen.asciiPrintableStr.map(_.take(2)),
        pick[String](vs, Gen.const("q")).map(_.take(3)))
        .map(p => StringStartsWith("c", p): Filter)
      genFilter("c", value, Seq(prefix)).map(f => (vs, f))
    }) { case (vs, f) =>
      sound(ColfType.Utf8, vs.map(_.map(x => x: Any)), f)
    }
}
