package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (the `Aggregator` UDAF surface): exact first and
  * second moments of a 2-dp money column.
  *
  * The buffer carries decimal-scaled integer sums (cents and squared
  * cents), so merges are exact integer additions — associative and
  * commutative, immune to partial-aggregation order, and the final
  * variance is one deterministic double expression. BigInt backing means
  * no overflow at any corpus size.
  *
  * Output: (n, sum, variance_population) with sum/variance as doubles
  * derived from the exact integer state.
  */
object ExactMoments extends Aggregator[Double, (Long, BigInt, BigInt), (Long, Double, Double)] {

  private val Scale = 100L // 2-dp fixed point

  override def zero: (Long, BigInt, BigInt) = (0L, BigInt(0), BigInt(0))

  override def reduce(b: (Long, BigInt, BigInt), x: Double): (Long, BigInt, BigInt) = {
    val cents = BigInt(math.round(x * Scale))
    (b._1 + 1, b._2 + cents, b._3 + cents * cents)
  }

  override def merge(a: (Long, BigInt, BigInt), b: (Long, BigInt, BigInt)): (Long, BigInt, BigInt) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)

  override def finish(r: (Long, BigInt, BigInt)): (Long, Double, Double) = {
    if (r._1 == 0) (0L, 0.0, 0.0)
    else {
      val n = r._1.toDouble
      // single correctly-rounded conversion from the exact fixed-point
      // value (scale shift, not a double division) — identical to casting
      // the exact DECIMAL sum to double in any IEEE engine
      val sum = new java.math.BigDecimal(r._2.bigInteger, 2).doubleValue()
      val sumSq = new java.math.BigDecimal(r._3.bigInteger, 4).doubleValue()
      // population variance, fixed expression order for cross-engine parity
      (r._1, sum, sumSq / n - (sum / n) * (sum / n))
    }
  }

  override def bufferEncoder: Encoder[(Long, BigInt, BigInt)] = Encoders.kryo
  override def outputEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
}
