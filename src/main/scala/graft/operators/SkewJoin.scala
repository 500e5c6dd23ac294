package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for the join AQE can't save: both sides too
  * large to broadcast AND a handful of keys carrying a disproportionate
  * share of BOTH sides (AQE's OptimizeSkewedJoin splits a skewed partition
  * of ONE side; when the matching build side's partition is also huge,
  * every split still re-reads it).
  *
  * Classic salting: the probe side's key gains a deterministic salt in
  * [0, factor); the build side is replicated `factor` times, once per salt
  * value. The join key becomes (key, salt), spreading each hot key over
  * `factor` reducers. Cost: build side shuffles `factor`×, so pick the
  * smallest factor that flattens the skew.
  *
  * The salt is derived by hashing the probe row's columns (not a random
  * number), so results are deterministic and retries/speculative tasks
  * produce identical output.
  */
object SkewJoin {

  /** Probe side + deterministic salt in [0, factor): the hash of the WHOLE
    * row (not the join key — salting the key's hash would send each hot
    * key to one salt again).
    */
  private[graft] def saltProbe(probe: DataFrame, factor: Int): DataFrame =
    probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(factor.toLong)).cast("int"))

  /** Build side replicated once per salt value — the visible, deliberate
    * cost of salting: `factor`× the build rows through the shuffle.
    */
  private[graft] def replicateBuild(build: DataFrame, factor: Int): DataFrame =
    build.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))

  /** Inner equi-join `probe.key == build.key` with salt-spread hot keys.
    * Column sets must be disjoint apart from the join key names being
    * distinct (`probeKey` vs `buildKey`).
    */
  def saltedInnerJoin(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column, factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val salted = saltProbe(probe, factor)
    val replicated = replicateBuild(build, factor)
    salted.join(replicated,
        probeKey === buildKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** [[saltedInnerJoin]] with the factor DERIVED from the probe side's
    * measured distribution — ceil(max/p99) from
    * [[Profile.joinKeySkew]], capped at `maxFactor` (build-side
    * replication is the real cost; past ~64 salts the shuffle blowup
    * outweighs any flattening). The sibling of the corpus-derived ANN
    * auto-planners (`AutoPlanes`/`AutoCoarseBits`): the user states the
    * intent ("join these, key may be hot"), the data picks the knob.
    * A benign distribution derives factor 1 = a plain join with zero
    * replication. One extra bounded pass over the probe keys (a keyed
    * count + a window over the count table) buys the decision; results
    * are identical to the explicit-factor form by construction.
    */
  def autoSaltedInnerJoin(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column, maxFactor: Int = 64): DataFrame = {
    require(maxFactor >= 1, s"maxFactor must be >= 1, got $maxFactor")
    val row = Profile.joinKeySkew(probe, probeKey).head()
    val suggested = if (row.isNullAt(7)) 1L else row.getLong(7)
    val factor = math.min(math.max(suggested, 1L), maxFactor.toLong).toInt
    saltedInnerJoin(probe, build, probeKey, buildKey, factor)
  }
}
