package graft

import org.scalacheck.Test
import org.scalacheck.rng.Seed

/** Shared ScalaCheck configuration for the SOUNDNESS property suites.
  *
  * These properties guard paths where a bug silently returns wrong rows
  * (absorbed filters are never re-checked; pruned files never re-read),
  * and their counterexamples can be rare — the round-5 evalExact NULL
  * bug needed a 1/8-weighted null probe under a depth-2 Not, ~1/340 per
  * case, so a 100-iteration run was green ~75% of the time while a real
  * wrong-results bug sat underneath. Two fixes here:
  *
  *  - iterations high enough that such a counterexample is near-certain
  *    (2000+ cases ⇒ miss probability < 0.3%), and
  *  - the initial seed is PRINTED at suite start and pinnable via
  *    `-Dgraft.scalacheck.seed=<base64>`, so any red run reproduces
  *    exactly instead of flaking back to green on re-run.
  */
object PropsConfig {

  /** The run's initial seed: pinned from the system property when given,
    * else random — but always printed so a failure is replayable.
    */
  lazy val seed: Seed = {
    val s = sys.props.get("graft.scalacheck.seed") match {
      case Some(b64) => Seed.fromBase64(b64).fold(
        e => throw new IllegalArgumentException(s"bad graft.scalacheck.seed: $e"),
        identity)
      case None => Seed.random()
    }
    println(s"[graft-props] scalacheck seed=${s.toBase64} " +
      "(replay a failure with -Dgraft.scalacheck.seed=<that value>)")
    s
  }

  /** `-Dgraft.scalacheck.iters.mult=N` scales every suite's iteration
    * count N× for one-off deep sweeps — no code edit, normal gate cost
    * unchanged at the default 1.
    */
  private lazy val mult: Int =
    sys.props.get("graft.scalacheck.iters.mult").map(_.toInt).getOrElse(1)

  def soundness(p: Test.Parameters, iters: Int): Test.Parameters =
    p.withMinSuccessfulTests(iters * mult).withInitialSeed(seed)
}
