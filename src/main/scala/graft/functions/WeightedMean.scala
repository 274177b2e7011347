package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted-mean input: value + weight, pre-cast to exact decimals
  * by the caller.
  */
case class WeightedIn(v: java.math.BigDecimal, w: java.math.BigDecimal)

/** Weighted-mean buffer: Σ(v·w) and Σ(w), both exact. */
case class WeightedAcc(num: java.math.BigDecimal, den: java.math.BigDecimal)

/** Typed UDAF surface (SURVEY §2.11 — the reference has no UDAF; the
  * Spark engine owns `Aggregator[IN, BUF, OUT]` directly): exact
  * weighted mean, Σ(v·w) / Σ(w).
  *
  * Determinism: both running sums are java.math.BigDecimal — exact,
  * associative, commutative — so partial aggregation (map-side
  * combine) and any merge order produce the identical buffer; doubles
  * appear only in the final single division of two exact values
  * (correctly-rounded IEEE ops, bit-identical everywhere). Callers
  * should pass inputs already cast to an exact decimal type (e.g.
  * DECIMAL(12,2)) so the engine-boundary double→decimal rounding
  * happens once, in Catalyst, in the documented oracle-parity way.
  *
  * Scale shape: an Aggregator compiles to a regular Spark aggregate
  * with partial + final phases — only per-group (num, den) buffers
  * shuffle, never rows.
  */
object WeightedMean extends Aggregator[WeightedIn, WeightedAcc, Double] {

  type In = WeightedIn
  type Acc = WeightedAcc

  private val Z = java.math.BigDecimal.ZERO

  override def zero: WeightedAcc = WeightedAcc(Z, Z)

  override def reduce(b: WeightedAcc, a: WeightedIn): WeightedAcc =
    if (a.v == null || a.w == null) b
    else WeightedAcc(b.num.add(a.v.multiply(a.w)), b.den.add(a.w))

  override def merge(x: WeightedAcc, y: WeightedAcc): WeightedAcc =
    WeightedAcc(x.num.add(y.num), x.den.add(y.den))

  override def finish(b: WeightedAcc): Double =
    if (b.den.signum == 0) Double.NaN
    else b.num.doubleValue / b.den.doubleValue

  override def bufferEncoder: Encoder[WeightedAcc] = Encoders.product[WeightedAcc]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
