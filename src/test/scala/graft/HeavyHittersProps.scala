package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.functions.{MgBuf, MisraGries}

/** Pure-JVM property sweep of the Misra–Gries summary (no Spark): the
  * n/(capacity+1) lower-bound guarantee must hold for EVERY element
  * under arbitrary stream contents, arbitrary capacities, and arbitrary
  * split-points merged in arbitrary order — the exact conditions Spark's
  * partial aggregation creates. Complements HeavyHittersSpec's
  * Spark-level tests with thousands of adversarial cases per run.
  */
object HeavyHittersProps extends Properties("MisraGries") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    PropsConfig.soundness(p, 200)

  /** Small alphabets force collisions and decrement churn. */
  private val genStream: Gen[List[String]] = for {
    alphabet <- Gen.choose(2, 12)
    n <- Gen.choose(0, 400)
    xs <- Gen.listOfN(n, Gen.choose(0, alphabet - 1).map(i => s"t$i"))
  } yield xs

  private val genCase: Gen[(List[String], Int, List[Int])] = for {
    xs <- genStream
    cap <- Gen.choose(1, 8)
    nSplits <- Gen.choose(0, 4)
    splits <- Gen.listOfN(nSplits, Gen.choose(0, math.max(0, xs.length)))
  } yield (xs, cap, splits.sorted)

  private def summarize(mg: MisraGries, xs: Seq[String], splits: Seq[Int]): MgBuf = {
    val bounds = (0 +: splits :+ xs.length).distinct.sorted
    val chunks = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
    chunks.map(c => c.foldLeft(mg.zero)(mg.reduce)).foldLeft(mg.zero)(mg.merge)
  }

  property("lower-bound + superset guarantee under arbitrary splits") =
    forAllNoShrink(genCase) { case (xs, cap, splits) =>
      val mg = new MisraGries(cap)
      val buf = summarize(mg, xs, splits)
      val exact = xs.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val n = xs.length.toLong
      val bound = n.toDouble / (cap + 1)
      val sizeOk = buf.counts.size <= cap
      val boundsOk = buf.counts.forall { case (t, est) =>
        est >= 1 && est <= exact(t) && est >= exact(t) - bound - 1e-9
      }
      val supersetOk = exact.forall { case (t, f) =>
        f <= bound || buf.counts.contains(t)
      }
      sizeOk && boundsOk && supersetOk
    }

  property("merge order never weakens the guarantee (left vs right fold)") =
    forAllNoShrink(genCase) { case (xs, cap, splits) =>
      val mg = new MisraGries(cap)
      val bounds = (0 +: splits :+ xs.length).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
        .map(c => c.foldLeft(mg.zero)(mg.reduce))
      val l = chunks.foldLeft(mg.zero)(mg.merge)
      val r = chunks.foldRight(mg.zero)((a, b) => mg.merge(a, b))
      val exact = xs.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val bound = xs.length.toDouble / (cap + 1)
      Seq(l, r).forall { buf =>
        buf.counts.size <= cap &&
          buf.counts.forall { case (t, est) => est <= exact(t) } &&
          exact.forall { case (t, f) => f <= bound || buf.counts.contains(t) }
      }
    }
}
