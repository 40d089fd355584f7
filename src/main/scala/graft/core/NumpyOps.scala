package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{MathBinary, MathUnary}

/** The reference's numpy compatibility namespaces (`graphblas/unary/numpy.py`,
  * `graphblas/binary/numpy.py`): mostly ALIASES of the core catalog under
  * numpy spelling, plus a handful of genuinely distinct kernels —
  * deg2rad/rad2deg, rint (half-even), signbit, spacing (signed ulp), square,
  * nextafter, fmax/fmin (NaN-IGNORING extrema, unlike max/min which
  * propagate), gcd/lcm, float_power, and the binary logaddexp/logaddexp2.
  * The bit-exact ones (spacing/rint/signbit/nextafter/fmax/fmin/gcd/lcm) run
  * through the `graft.functions.MathUnary/MathBinary` codegen expressions;
  * the rest are flat Column algebra. All are resolvable BY NAME like the
  * reference (`binary.numpy.gcd` ↔ `NumpyOps.binary("gcd")`) and usable
  * anywhere a catalog op is (apply/ewise/semiring ⊗). */
object NumpyOps {

  private val ln2 = math.log(2.0)

  // ---- distinct unaries (unary/numpy.py:30-60) ----
  val deg2rad = UnaryOp("deg2rad", radians)
  val rad2deg = UnaryOp("rad2deg", degrees)
  /** numpy.rint: round half to EVEN (banker's), unlike `round` (half away). */
  val rintOp = UnaryOp("rint", c => MathUnary("rint", c.cast("double")))
  /** sign BIT (true for -0.0 and negative NaN), not sign value. */
  val signbitOp = UnaryOp("signbit", c => MathUnary("signbit", c.cast("double")))
  /** signed distance to the adjacent representable double away from zero. */
  val spacingOp = UnaryOp("spacing", c => MathUnary("spacing", c.cast("double")))
  val squareOp = UnaryOp("square", c => c * c)

  // ---- distinct binaries (binary/numpy.py:38-76) ----
  val nextafterOp = BinaryOp("nextafter",
    (a, b) => MathBinary("nextafter", a.cast("double"), b.cast("double")))
  /** NaN-ignoring extrema: fmax(x, NaN) = x; NaN only when both are NaN. */
  val fmaxOp = BinaryOp("fmax",
    (a, b) => MathBinary("fmax", a.cast("double"), b.cast("double")))
  val fminOp = BinaryOp("fmin",
    (a, b) => MathBinary("fmin", a.cast("double"), b.cast("double")))
  /** non-negative gcd/lcm on BIGINT (numpy int64 convention). */
  val gcdOp = BinaryOp("gcd",
    (a, b) => MathBinary("gcd", a.cast("long"), b.cast("long")))
  val lcmOp = BinaryOp("lcm",
    (a, b) => MathBinary("lcm", a.cast("long"), b.cast("long")))
  /** numpy float_power: always promotes to float64 before the pow. */
  val floatPower = BinaryOp("float_power",
    (a, b) => pow(a.cast("double"), b.cast("double")))
  /** ln(e^a + e^b), max-shifted (same stability recipe as the logaddexp
    * AGGREGATOR in core/Aggs.scala); the a==b branch also pins the
    * ±Inf-equal cases (|Inf−Inf| would be NaN). */
  val logaddexpOp = BinaryOp("logaddexp", (a, b) =>
    when(a === b, a + ln2)
      .otherwise(greatest(a, b) + log1p(exp(-abs(a - b)))))
  /** log2(2^a + 2^b). */
  val logaddexp2Op = BinaryOp("logaddexp2", (a, b) =>
    when(a === b, a + 1.0)
      .otherwise(greatest(a, b) + log1p(pow(2.0, -abs(a - b))) / ln2))
  /** numpy left_shift/right_shift: sign-aware wrappers over bshift. */
  val leftShift = BinaryOp("left_shift", (a, b) => Ops.bshift(a, b))
  val rightShift = BinaryOp("right_shift", (a, b) => Ops.bshift(a, -b))

  // ---- numpy monoids (monoid/numpy.py: the distinct ones are gcd, fmax,
  //      fmin, hypot, logaddexp, logaddexp2) ----
  /** gcd is associative+commutative with identity 0 (gcd(0,x) = |x|). */
  val gcdMonoid = Monoid("gcd", gcdOp, lit(0L), Aggs.gcd)
  /** fmax/fmin identities are NaN (fmax(NaN, x) = x). Spark's min already
    * ignores NaN (NaN sorts greatest) so fmin reduces natively; max would
    * PROPAGATE NaN, so fmax's fast aggregate nulls NaN out first and falls
    * back to max(c) (= NaN) only when the whole group is NaN. */
  val fmaxMonoid = Monoid("fmax", fmaxOp, lit(Double.NaN),
    c => coalesce(max(when(isnan(c), lit(null)).otherwise(c)), max(c)))
  val fminMonoid = Monoid("fmin", fminOp, lit(Double.NaN), c => min(c))
  /** hypot chains to the Euclidean norm: hypot(hypot(a,b),c) = √(a²+b²+c²);
    * identity 0. Fast aggregate = the catalog's `hypot` aggregator. */
  val hypotMonoid = Monoid("hypot", Ops.hypotOp, lit(0.0),
    c => sqrt(sum(c * c)))
  val logaddexpMonoid = Monoid("logaddexp", logaddexpOp,
    lit(Double.NegativeInfinity), Aggs.logSumExp)
  val logaddexp2Monoid = Monoid("logaddexp2", logaddexp2Op,
    lit(Double.NegativeInfinity), Aggs.logSumExp2)

  val monoid: Map[String, Monoid] = Seq(
    gcdMonoid, fmaxMonoid, fminMonoid, hypotMonoid,
    logaddexpMonoid, logaddexp2Monoid)
    .map(m => m.name -> m).toMap ++ Map(
    "add" -> Ops.plusMonoid, "multiply" -> Ops.timesMonoid,
    "maximum" -> Ops.maxMonoid, "minimum" -> Ops.minMonoid,
    "logical_and" -> Ops.landMonoid, "logical_or" -> Ops.lorMonoid,
    "logical_xor" -> Ops.lxorMonoid, "equal" -> Ops.eqMonoid,
    "bitwise_and" -> Ops.bandMonoid, "bitwise_or" -> Ops.borMonoid,
    "bitwise_xor" -> Ops.bxorMonoid)

  /** Name-resolvable registry, aliases included (the reference exposes the
    * full numpy spelling set; aliases map to the SAME op objects so dtype
    * rules stay single-sourced). */
  val unary: Map[String, UnaryOp] = Seq(
    deg2rad, rad2deg, rintOp, signbitOp, spacingOp, squareOp)
    .map(u => u.name -> u).toMap ++ Map(
    "radians" -> deg2rad, "degrees" -> rad2deg,
    "absolute" -> Ops.absOp, "fabs" -> Ops.absOp,
    "negative" -> Ops.ainv, "positive" -> Ops.identityOp,
    "reciprocal" -> Ops.minv, "invert" -> Ops.bnot, "bitwise_not" -> Ops.bnot,
    "logical_not" -> Ops.lnot, "sign" -> Ops.sigNum,
    "arccos" -> Ops.acosOp, "arccosh" -> Ops.acoshOp,
    "arcsin" -> Ops.asinOp, "arcsinh" -> Ops.asinhOp,
    "arctan" -> Ops.atanOp, "arctanh" -> Ops.atanhOp,
    "conjugate" -> Ops.conjOp)

  val binary: Map[String, BinaryOp] = Seq(
    nextafterOp, fmaxOp, fminOp, gcdOp, lcmOp, floatPower,
    logaddexpOp, logaddexp2Op, leftShift, rightShift)
    .map(b => b.name -> b).toMap ++ Map(
    "add" -> Ops.plus, "subtract" -> Ops.minus, "multiply" -> Ops.times,
    "divide" -> Ops.truediv, "true_divide" -> Ops.truediv,
    "floor_divide" -> Ops.floordiv, "mod" -> Ops.remainder,
    "power" -> Ops.powOp, "arctan2" -> Ops.atan2Op,
    "maximum" -> Ops.maxBin, "minimum" -> Ops.minBin,
    "bitwise_and" -> Ops.band, "bitwise_or" -> Ops.bor,
    "bitwise_xor" -> Ops.bxor,
    "greater" -> Ops.gt, "greater_equal" -> Ops.ge,
    "less" -> Ops.lt, "less_equal" -> Ops.le,
    "equal" -> Ops.eq, "not_equal" -> Ops.ne,
    "logical_and" -> Ops.land, "logical_or" -> Ops.lor,
    "logical_xor" -> Ops.lxor)
}
