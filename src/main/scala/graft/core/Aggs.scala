package graft.core

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Aggregators for monoid folds with no exact Spark builtin
  * (SURVEY.md §4.2 item 5). Each is exposed as a Column combinator so the
  * operator catalog stays a uniform `Column => Column` surface; these are the
  * only non-codegen aggregates in the engine and none sit on an iterative
  * hot path.
  */
object Aggs {

  /** Exact product fold (reference `times` monoid, `operator/monoid.py`):
    * plain FP multiplication in the aggregation buffer — bit-exact per IEEE
    * rounding, unlike the `exp(sum(log(abs)))` recipe whose last-bits drift
    * accumulates with group size. */
  // Input type is java.lang.Double, NOT Double: with Encoders.scalaDouble a
  // SQL NULL deserializes to 0.0 and silently poisons the fold (a group
  // [2.0, null, 3.0] would yield 0.0 instead of 6.0 — ADVICE r3). Boxed
  // input + an explicit null skip matches the null-skipping contract of
  // every builtin aggregate (sum/min/max) and the reference's
  // missing-value semantics.
  private object ProductAgg extends Aggregator[java.lang.Double, Double, Double] {
    def zero: Double = 1.0
    def reduce(b: Double, a: java.lang.Double): Double =
      if (a == null) b else b * a
    def merge(b1: Double, b2: Double): Double = b1 * b2
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private lazy val productUdaf = udaf(ProductAgg, Encoders.DOUBLE)

  /** product over a group; missing (null) on empty input — the Aggregator's
    * zero would otherwise surface as 1.0 and break the reduce-of-empty =
    * empty-scalar contract. */
  def product(c: Column): Column =
    when(count(c) > 0, productUdaf(c.cast("double")))

  /** streaming log-sum-exp buffer: running max `m` and the shifted sum
    * `s = Σ exp(x - m)`, so nothing ever overflows (numpy's logaddexp
    * recipe, which the reference aggregator inherits — `agg.py:382-404`). */
  final case class LseBuf(m: Double, s: Double)

  // boxed input + null skip for the same reason as ProductAgg (a null would
  // otherwise count as exp(0) = 1 in the shifted sum)
  private object LogSumExpAgg extends Aggregator[java.lang.Double, LseBuf, Double] {
    def zero: LseBuf = LseBuf(Double.NegativeInfinity, 0.0)
    def reduce(b: LseBuf, xx: java.lang.Double): LseBuf =
      if (xx == null) b
      else {
        val x = xx.doubleValue()
        if (b.s == 0.0) LseBuf(x, 1.0)
        else if (x <= b.m) LseBuf(b.m, b.s + math.exp(x - b.m))
        else LseBuf(x, b.s * math.exp(b.m - x) + 1.0)
      }
    def merge(a: LseBuf, b: LseBuf): LseBuf =
      if (a.s == 0.0) b
      else if (b.s == 0.0) a
      else if (a.m >= b.m) LseBuf(a.m, a.s + b.s * math.exp(b.m - a.m))
      else LseBuf(b.m, b.s + a.s * math.exp(a.m - b.m))
    def finish(r: LseBuf): Double = r.m + math.log(r.s)
    def bufferEncoder: Encoder[LseBuf] = Encoders.product[LseBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private lazy val lseUdaf = udaf(LogSumExpAgg, Encoders.DOUBLE)

  /** log(Σ exp(x)) — overflow-safe for inputs ≳710 where the naive
    * `log(sum(exp))` saturates to +inf. */
  def logSumExp(c: Column): Column =
    when(count(c) > 0, lseUdaf(c.cast("double")))

  private val ln2 = math.log(2.0)

  /** log2(Σ 2^x) = logSumExp(x·ln2) / ln2. */
  def logSumExp2(c: Column): Column =
    when(count(c) > 0, lseUdaf(c.cast("double") * ln2) / ln2)

  // boxed input + null skip, same contract as ProductAgg; identity 0
  // (gcd(0, x) = |x|) so the buffer needs no presence flag
  private object GcdAgg extends Aggregator[java.lang.Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: java.lang.Long): Long =
      if (a == null) b else graft.functions.MathBinary.gcd(b, a.longValue())
    def merge(a: Long, b: Long): Long = graft.functions.MathBinary.gcd(a, b)
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  private lazy val gcdUdaf = udaf(GcdAgg, Encoders.LONG)

  /** gcd fold over a group (reference `monoid/numpy.py` gcd); missing on
    * empty input like every reduce. */
  def gcd(c: Column): Column =
    when(count(c) > 0, gcdUdaf(c.cast("long")))
}
