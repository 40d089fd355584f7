package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Operator registry: named scalar/aggregate operators mirroring the
  * reference catalog (python-graphblas `graphblas/core/operator/` modules,
  * see SURVEY.md §2.6). Every operator is a Catalyst `Column` combinator so
  * the whole kernel layer stays inside whole-stage codegen — no UDFs on the
  * hot path.
  *
  * Reference: unary catalog `graphblas/core/operator/unary.py:144-169`,
  * binary `operator/binary.py:421-460`, monoid `operator/monoid.py:239-255`,
  * semiring `operator/semiring.py:185-218`.
  */
final case class UnaryOp(name: String, f: Column => Column) {
  def apply(c: Column): Column = f(c)
}

final case class BinaryOp(name: String, f: (Column, Column) => Column) {
  def apply(a: Column, b: Column): Column = f(a, b)
}

/** Monoid = associative+commutative BinaryOp with identity; carries the
  * Spark aggregate expression used for semiring reduction / reduce_*.
  * Reference: `graphblas/core/operator/monoid.py:239-255` (identities baked
  * into SuiteSparse; we declare them explicitly for `allow_empty=False` and
  * `power(0)`).
  */
final case class Monoid(name: String, binop: BinaryOp, identity: Column, agg: Column => Column) {
  def apply(a: Column, b: Column): Column = binop(a, b)
}

/** Semiring = (add monoid ⊕, multiply binop ⊗). The reference names these
  * `{monoid}_{binaryop}` (`operator/semiring.py:185-218`); kernels use them
  * in `mxm/mxv/vxm` as join(⊗ on matching inner index) + groupBy(⊕).
  */
final case class Semiring(name: String, add: Monoid, mult: BinaryOp)

object Ops {
  // ---- unary (reference `operator/unary.py`; all map to codegen'd
  //      org.apache.spark.sql.functions) ----
  val identityOp = UnaryOp("identity", c => c)
  val ainv  = UnaryOp("ainv", c => -c)
  val minv  = UnaryOp("minv", c => lit(1.0) / c)
  val absOp = UnaryOp("abs", abs)
  val lnot  = UnaryOp("lnot", c => !c.cast("boolean"))
  val one   = UnaryOp("one", c => when(c.isNotNull, lit(1.0)))
  val sqrtOp = UnaryOp("sqrt", sqrt)
  val logOp = UnaryOp("log", log)
  val expOp = UnaryOp("exp", exp)
  val sigNum = UnaryOp("signum", signum)
  val ceilOp = UnaryOp("ceil", c => ceil(c).cast("double"))
  val floorOp = UnaryOp("floor", c => floor(c).cast("double"))

  // ---- binary (reference `operator/binary.py:421-460`) ----
  val first  = BinaryOp("first", (a, _) => a)
  val second = BinaryOp("second", (_, b) => b)
  val pair   = BinaryOp("pair", (_, _) => lit(1.0))
  // `any` is "pick either"; we make it deterministic as `first`
  // (documented divergence, SURVEY.md §7.4).
  val anyOp  = BinaryOp("any", (a, _) => a)
  val plus   = BinaryOp("plus", _ + _)
  val minus  = BinaryOp("minus", _ - _)
  val rminus = BinaryOp("rminus", (a, b) => b - a)
  val times  = BinaryOp("times", _ * _)
  val truediv = BinaryOp("truediv", _ / _)
  val rdiv   = BinaryOp("rdiv", (a, b) => b / a)
  val minBin = BinaryOp("min", least(_, _))
  val maxBin = BinaryOp("max", greatest(_, _))
  val powOp  = BinaryOp("pow", pow)
  val eq     = BinaryOp("eq", _ === _)
  val ne     = BinaryOp("ne", _ =!= _)
  val gt     = BinaryOp("gt", _ > _)
  val lt     = BinaryOp("lt", _ < _)
  val ge     = BinaryOp("ge", _ >= _)
  val le     = BinaryOp("le", _ <= _)
  val lor    = BinaryOp("lor", (a, b) => a.cast("boolean") || b.cast("boolean"))
  val land   = BinaryOp("land", (a, b) => a.cast("boolean") && b.cast("boolean"))
  val lxor   = BinaryOp("lxor", (a, b) => a.cast("boolean") =!= b.cast("boolean"))

  // ---- monoids (reference `operator/monoid.py:239-255`) ----
  val plusMonoid  = Monoid("plus", plus, lit(0.0), sum)
  val minMonoid   = Monoid("min", minBin, lit(Double.PositiveInfinity), min)
  val maxMonoid   = Monoid("max", maxBin, lit(Double.NegativeInfinity), max)
  val lorMonoid   = Monoid("lor", lor, lit(false), c => bool_or(c.cast("boolean")))
  val landMonoid  = Monoid("land", land, lit(true), c => bool_and(c.cast("boolean")))
  val minLongMonoid = Monoid("min_long", minBin, lit(Long.MaxValue), min)
  // `times` monoid: product has no Spark builtin; exact for positive inputs
  // via exp(sum(log)); sign/zeros handled explicitly.
  val timesMonoid = Monoid("times", times, lit(1.0), { c =>
    val anyZero = max(when(c === 0, 1).otherwise(0)) === 1
    val negCnt  = sum(when(c < 0, 1L).otherwise(0L))
    val mag     = exp(sum(log(abs(c))))
    when(anyZero, lit(0.0))
      .otherwise(when(negCnt % 2 === 0, mag).otherwise(-mag))
  })

  // ---- semirings we must have (SURVEY.md §2.6) ----
  val plusTimes  = Semiring("plus_times", plusMonoid, times)
  val plusSecond = Semiring("plus_second", plusMonoid, second)
  val plusFirst  = Semiring("plus_first", plusMonoid, first)
  val plusPair   = Semiring("plus_pair", plusMonoid, pair)
  val minSecond  = Semiring("min_second", minMonoid, second)
  val minFirst   = Semiring("min_first", minMonoid, first)
  val minPlus    = Semiring("min_plus", minMonoid, plus)
  val maxSecond  = Semiring("max_second", maxMonoid, second)
  val lorLand    = Semiring("lor_land", lorMonoid, land)
}
