package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.operators.Sampling

/** Property sweep for the windowed rate cap and the temporal split: on
  * random colliding-timestamp event sets, each must equal a naive
  * in-memory reference exactly — the cap's kept set is a pure function
  * of the data (strict (ts, tie) order), and the split's integral cutoff
  * arithmetic is replayed verbatim.
  */
object SamplingWindowProps extends Properties("SamplingWindow") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    PropsConfig.soundness(p, 10)

  private lazy val spark = SparkTest.session

  private case class Ev(k: Long, tus: Long, eid: Long)

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 50)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 4L)
      tus <- Gen.choose(0L, 500L)
    } yield (k, tus))
  } yield rows.zipWithIndex.map { case ((k, t), i) => Ev(k, t, i.toLong) }

  private def toDF(evs: List[Ev]) = {
    import spark.implicits._
    evs.map(e => (e.k, e.tus, e.eid)).toDF("k", "tus", "eid").repartition(5)
  }

  property("capPerKeyWindow == naive per-(key,bucket) ordered prefix") = forAllNoShrink(
    genEvents, Gen.choose(1L, 100L), Gen.choose(1, 4)) { (evs, window, n) =>
    val expected = evs.groupBy(e => (e.k, e.tus / window)).toList.flatMap {
      case ((_, bucket), es) =>
        es.sortBy(e => (e.tus, e.eid)).zipWithIndex.take(n).map {
          case (e, i) => (e.k, e.tus, e.eid, bucket, i + 1)
        }
    }.toSet
    val got = Sampling.capPerKeyWindow(toDF(evs), col("k"), col("tus"),
        col("eid"), window, n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    got == expected
  }

  property("temporalSplit == naive integral cutoff") = forAllNoShrink(
    genEvents.suchThat(_.nonEmpty), Gen.choose(0, 1000), Gen.choose(0L, 200L)) {
    (evs, permille, embargo) =>
    val (lo, hi) = (evs.map(_.tus).min, evs.map(_.tus).max)
    val cut = lo + ((hi - lo) * permille) / 1000
    val expected = evs.flatMap { e =>
      if (e.tus < cut) Some((e.eid, "train"))
      else if (e.tus >= cut + embargo) Some((e.eid, "eval"))
      else None
    }.toSet
    val got = Sampling.temporalSplit(toDF(evs), col("tus"), permille, embargo)
      .select("eid", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    got == expected
  }
}
