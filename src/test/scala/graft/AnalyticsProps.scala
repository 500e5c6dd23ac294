package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.operators.Analytics

/** Property sweep for the sequence/basket/interval analytics: on random
  * small event logs (few users, few types, colliding timestamps — the
  * adversarial shape for ordering bugs) each operator must equal a naive
  * in-memory reference EXACTLY, doubles included: the operators promise
  * bit-determinism (fixed-order IEEE math over exact decimal/integer
  * inputs), so the reference can replay the same expression trees.
  * Values are generated as exact 2-dp amounts (cents/100) — the
  * operators' documented metric contract — so DECIMAL(14,2) casts are
  * rounding-free on both sides.
  */
object AnalyticsProps extends Properties("AnalyticsW3") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    PropsConfig.soundness(p, 10)

  private lazy val spark = SparkTest.session

  private case class Ev(u: Long, et: String, tus: Long, eid: Long, cents: Long) {
    def v: Double = cents / 100.0
  }

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 4L)
      et <- Gen.oneOf("a", "b", "c")
      // timestamps collide on purpose; spread over ~3 days so day/second
      // arithmetic sees nontrivial values
      tus <- Gen.choose(0L, 3L * 86400000000L)
      cents <- Gen.choose(0L, 50000L)
    } yield (u, et, tus, cents))
  } yield rows.zipWithIndex.map { case ((u, et, tus, c), i) => Ev(u, et, tus, i.toLong, c) }

  private def toDF(evs: List[Ev]) = {
    import spark.implicits._
    evs.map(e => (e.u, e.et, e.tus, e.eid, e.v)).toDF("u", "et", "tus", "eid", "v")
      .repartition(5)
  }

  /** Canonical-bit view of a double: bit-level equality is the operators'
    * actual promise, and NaN==NaN pitfalls in tuple Sets disappear. */
  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def ordered(evs: List[Ev]): Map[Long, List[Ev]] =
    evs.groupBy(_.u).view.mapValues(_.sortBy(e => (e.tus, e.eid))).toMap

  property("transitions == naive ordered pair counts") = forAllNoShrink(genEvents) { evs =>
    val pairs = ordered(evs).values.toList.flatMap(_.sliding(2).collect {
      case List(a, b) => (a.et, b.et)
    })
    val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTot = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expected = cnt.map { case ((f, t), n) =>
      (f, t, n, bits(n.toDouble / fromTot(f))) }.toSet
    val got = Analytics.transitions(toDF(evs), col("u"), col("et"), col("tus"), col("eid"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), bits(r.getDouble(3)))).toSet
    got == expected
  }

  property("scd2 == naive next-change intervals") = forAllNoShrink(genEvents) { evs =>
    val expected = ordered(evs).values.toList.flatMap { es =>
      es.zip(es.drop(1).map(n => Option(n.tus)) :+ None).map { case (e, vt) =>
        (e.u, e.tus, vt, vt.isEmpty, e.et) }
    }.toSet
    val got = Analytics.scd2(toDF(evs), col("u"), col("tus"), col("eid"),
        Seq("et" -> col("et"))).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3),
        r.getString(4))).toSet
    got == expected
  }

  property("topPaths == naive count-then-total-order cut") = forAllNoShrink(
    genEvents, Gen.choose(1, 4), Gen.choose(1, 5)) { (evs, maxLen, k) =>
    val counted = ordered(evs).values.toList
      .map(_.take(maxLen).map(_.et).mkString(">"))
      .groupBy(identity).view.mapValues(_.size.toLong).toList
    val expected = counted.sortBy { case (p, n) => (-n, p) }.take(k)
      .zipWithIndex.map { case ((p, n), i) => (p, n, i + 1) }.toSet
    val got = Analytics.topPaths(toDF(evs), col("u"), col("et"), col("tus"),
        col("eid"), maxLen, k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    got == expected
  }

  property("timeWeightedAvg == naive exact-decimal reference") = forAllNoShrink(genEvents) { evs =>
    val expected = ordered(evs).toList.flatMap { case (u, es) =>
      val ints = es.zip(es.drop(1)).map { case (a, b) =>
        (BigDecimal(a.cents, 2), (b.tus - a.tus) / 1000000L) }
      if (ints.isEmpty) None
      else {
        val durTot = ints.map(_._2).sum
        val vdur = ints.map { case (v, d) => v * BigDecimal(d) }.sum.toDouble
        // all-sub-second keys floor durTot to 0: the operator guards the
        // ANSI 0.0-divisor throw with NULL twap; mirror it here
        val twap = if (durTot == 0L) Long.MinValue else bits(vdur / durTot.toDouble)
        Some((u, ints.size.toLong, durTot, bits(vdur), twap))
      }
    }.toSet
    val got = Analytics.timeWeightedAvg(toDF(evs), col("u"), col("tus"),
        col("eid"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), bits(r.getDouble(3)),
        if (r.isNullAt(4)) Long.MinValue else bits(r.getDouble(4)))).toSet
    got == expected
  }

  property("cusumDaily == naive scaled-deviation prefix sums") = forAllNoShrink(genEvents) { evs =>
    val expected = evs.groupBy(_.et).toList.flatMap { case (g, es) =>
      val daily = es.groupBy(_.tus / 86400000000L).view.mapValues { rs =>
        (rs.size.toLong, rs.map(r => BigDecimal(r.cents, 2)).sum) }.toList.sortBy(_._1)
      val nG = daily.map(_._2._1).sum
      val sG = daily.map(_._2._2).sum
      daily.scanLeft((0L, 0L, BigDecimal(0))) { case ((_, _, acc), (day, (nD, sD))) =>
        (day, nD, acc + (sD * BigDecimal(nG) - sG * BigDecimal(nD)))
      }.drop(1).map { case (day, nD, cus) => (g, day, nD, bits(cus.toDouble)) }
    }.toSet
    val got = Analytics.cusumDaily(toDF(evs), col("et"), col("tus"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        bits(r.getDouble(3)))).toSet
    got == expected
  }

  property("attributionLinear == naive horizon scan") = forAllNoShrink(
    genEvents, Gen.choose(0L, 86400000000L)) { (evs, horizon) =>
    val expected = evs.filter(_.et == "a").flatMap { c =>
      val touches = evs.filter(t => t.et == "b" && t.u == c.u &&
        t.tus < c.tus && t.tus >= c.tus - horizon)
      touches.map(t => (c.u, c.eid, t.eid, touches.size.toLong,
        bits(BigDecimal(c.cents, 2).toDouble / touches.size)))
    }.toSet
    val got = Analytics.attributionLinear(toDF(evs), col("u"), col("et"),
        col("tus"), col("eid"), col("v"), "a", "b", horizon)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), bits(r.getDouble(4)))).toSet
    got == expected
  }
}
