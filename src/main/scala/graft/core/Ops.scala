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

/** `indexForm`, when present, is the index-aware 6-argument evaluation of a
  * theta-bound IndexBinaryOp (`IndexBinaryOp.bound`): kernels prefer it over
  * the plain (a, b) form, passing their join/output key columns. Carried ON
  * the op (not in a global registry) so bound ops are plain garbage-collected
  * values with no name-collision or unbounded-registry concerns. */
final case class BinaryOp(
    name: String, f: (Column, Column) => Column,
    indexForm: Option[(Column, Column, Column, Column, Column, Column) => Column]
      = None) {
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

/** IndexUnaryOp / SelectOp (`operator/indexunary.py:94-110`,
  * `operator/select.py`): f(value, i, j, thunk) → Column. Used by
  * `apply(indexunaryop)` (projection) and `select(selectop)` (predicate —
  * boolean-valued entries of this catalog). For vectors, j == i. */
final case class IndexUnaryOp(name: String, f: (Column, Column, Column, Column) => Column) {
  def apply(v: Column, i: Column, j: Column, thunk: Column): Column = f(v, i, j, thunk)
}

/** User-defined IndexBinaryOp (`operator/indexbinary.py:231`,
  * `docs/user_guide/operators.rst:225-255`): the two-input analogue of
  * IndexUnaryOp — `f(x, ix, jx, y, iy, jy, theta)` sees both values AND
  * both elements' row/column indices plus a bound thunk. There are no
  * built-ins; users register their own by name (`Ops.registerIndexBinary`)
  * and bind a theta (`bound`) to get a regular BinaryOp usable in
  * ewise_mult or as a semiring ⊗ for mxm/mxv/vxm
  * (`Semiring._build_from_bound_indexbinary`, `semiring.py:277`).
  *
  * In our join-form kernels the four index columns are the join/output keys,
  * so index access is free: kernels evaluate the bound op's `indexForm`
  * (carried on the BinaryOp) with their key columns — the same wiring
  * positional binaries use. Vector operands take (i, 0) coordinates (an n×1
  * column), matching the positional-semiring convention, in EVERY kernel —
  * ewise and matvec alike. */
final case class IndexBinaryOp(
    name: String,
    f: (Column, Column, Column, Column, Column, Column, Column) => Column) {
  /** Bind theta → a BinaryOp carrying the index-aware form. Kernels
    * (ewise_mult/add/union, mxm/mxv/vxm) evaluate `indexForm` with real key
    * columns; the plain (a, b) application evaluates with NULL indices and
    * is only meaningful for value-only functions. */
  def bound(theta: Column): BinaryOp = {
    val nul = lit(null).cast("long")
    BinaryOp(s"$name#bound", (a, b) => f(a, nul, nul, b, nul, nul, theta),
      indexForm = Some((va, ia, ja, vb, ib, jb) => f(va, ia, ja, vb, ib, jb, theta)))
  }
}

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
  // trig / hyperbolic (`unary.py:144-169`)
  val sinOp = UnaryOp("sin", sin);   val cosOp = UnaryOp("cos", cos)
  val tanOp = UnaryOp("tan", tan)
  val asinOp = UnaryOp("asin", asin); val acosOp = UnaryOp("acos", acos)
  val atanOp = UnaryOp("atan", atan)
  val sinhOp = UnaryOp("sinh", sinh); val coshOp = UnaryOp("cosh", cosh)
  val tanhOp = UnaryOp("tanh", tanh)
  val asinhOp = UnaryOp("asinh", c => log(c + sqrt(c * c + 1.0)))
  val acoshOp = UnaryOp("acosh", c => log(c + sqrt(c * c - 1.0)))
  val atanhOp = UnaryOp("atanh", c => lit(0.5) * log((lit(1.0) + c) / (lit(1.0) - c)))
  // logs / exps / roots
  val log2Op  = UnaryOp("log2", log2)
  val log10Op = UnaryOp("log10", log10)
  val log1pOp = UnaryOp("log1p", log1p)
  val exp2Op  = UnaryOp("exp2", c => pow(lit(2.0), c))
  val expm1Op = UnaryOp("expm1", expm1)
  val cbrtOp  = UnaryOp("cbrt", cbrt)
  val roundOp = UnaryOp("round", c => round(c, 0))
  // trunc toward zero (C semantics)
  val truncOp = UnaryOp("trunc", c => signum(c) * floor(abs(c)))
  // float classification
  val isnanOp = UnaryOp("isnan", isnan)
  val isinfOp = UnaryOp("isinf",
    c => c === Double.PositiveInfinity || c === Double.NegativeInfinity)
  val isfiniteOp = UnaryOp("isfinite",
    c => !(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity))
  // bitwise complement (integral dtypes)
  val bnot = UnaryOp("bnot", bitwise_not)

  // ---- SS-extension unaries erf/erfc/lgamma/tgamma/frexpe/frexpx
  //      (`operator/base.py:25-29`): no Spark builtins — closed-form Column
  //      expressions (VERDICT r3 item 8). erf/erfc: Abramowitz-Stegun 7.1.26
  //      (|err| ≤ 1.5e-7; tolerance-tested in OpCatalogSpec); lgamma/tgamma:
  //      Lanczos g=7 series (~1e-13 relative); frexpe/frexpx: exact via
  //      floor(log2) plus one correction step. All stay inside whole-stage
  //      codegen — flat arithmetic, no UDFs. ----
  /** A-S 7.1.26 computes erfc(x) = poly(t)·e^{−x²} directly for x ≥ 0 —
    * using it for erfc (not 1−erf) keeps large-x tail precision. */
  private def erfcPos(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t
    poly * exp(-x * x)
  }
  val erfOp  = UnaryOp("erf", c =>
    when(c >= 0, lit(1.0) - erfcPos(c)).otherwise(erfcPos(-c) - 1.0))
  val erfcOp = UnaryOp("erfc", c =>
    when(c >= 0, erfcPos(c)).otherwise(lit(2.0) - erfcPos(-c)))

  // Lanczos g=7 n=9 coefficients (public classic constants)
  private val lanczosC = Seq(0.99999999999980993, 676.5203681218851,
    -1259.1392167224028, 771.32342877765313, -176.61502916214059,
    12.507343278686905, -0.13857109526572012, 9.9843695780195716e-6,
    1.5056327351493116e-7)
  /** log Γ(z) for z ≥ 0.5 (Lanczos) */
  private def lgammaPos(z: Column): Column = {
    val zm = z - 1.0
    val a = lanczosC.zipWithIndex.tail.foldLeft(lit(lanczosC.head)) {
      case (acc, (ci, i)) => acc + lit(ci) / (zm + i)
    }
    val t = zm + 7.5
    lit(0.5 * math.log(2 * math.Pi)) + (zm + 0.5) * log(t) - t + log(a)
  }
  val lgammaOp = UnaryOp("lgamma", c =>
    when(c >= 0.5, lgammaPos(c))
      // reflection: lgamma(x) = log|π / sin(πx)| − lgamma(1−x)
      .otherwise(log(abs(lit(math.Pi) / sin(lit(math.Pi) * c))) -
        lgammaPos(lit(1.0) - c)))
  val tgammaOp = UnaryOp("tgamma", c =>
    when(c >= 0.5, exp(lgammaPos(c)))
      // reflection form keeps the SIGN: Γ(x) = π / (sin(πx) · Γ(1−x))
      .otherwise(lit(math.Pi) /
        (sin(lit(math.Pi) * c) * exp(lgammaPos(lit(1.0) - c)))))

  /** x·2^(−e), safe past the normal exponent range (two-step so neither the
    * scale factor nor the intermediate overflows/flushes for |e| ≤ 1074). */
  private def frexpScale(c: Column, e: Column): Column =
    when(e > 500, (c * lit(math.pow(2.0, -500))) * pow(lit(2.0), -(e - 500)))
      .when(e < -500, (c * lit(math.pow(2.0, 500))) * pow(lit(2.0), -(e + 500)))
      .otherwise(c * pow(lit(2.0), -e))
  /** frexp exponent: x = m·2^e, |m| ∈ [0.5, 1). floor(log2)+1 with one
    * correction step absorbing log2's off-by-ulp at power-of-two inputs. */
  private def frexpE(c: Column): Column = {
    val e0 = floor(log2(abs(c))) + 1
    val m0 = frexpScale(c, e0)
    when(abs(m0) >= 1.0, e0 + 1).when(abs(m0) < 0.5, e0 - 1).otherwise(e0)
  }
  // C frexp contract: x = 0 → (m = 0, e = 0); ±inf/NaN → (m = x, e = 0
  // — "unspecified" in C, pinned to 0 here)
  val frexpeOp = UnaryOp("frexpe", c =>
    when(c === 0.0 || isnan(c) || abs(c) === Double.PositiveInfinity, lit(0L))
      .otherwise(frexpE(c).cast("long")))
  val frexpxOp = UnaryOp("frexpx", c =>
    when(c === 0.0 || isnan(c) || abs(c) === Double.PositiveInfinity, c)
      .otherwise(frexpScale(c, frexpE(c))))

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
  val lxnor  = BinaryOp("lxnor", (a, b) => a.cast("boolean") === b.cast("boolean"))
  // integer division contracts pinned in Types (`operator/binary.py:849-861`)
  val cdiv     = BinaryOp("cdiv", Types.cdiv)
  val floordiv = BinaryOp("floordiv", Types.floordiv)
  val fmod      = BinaryOp("fmod", (a, b) => a % b)           // C fmod: sign of dividend
  val remainder = BinaryOp("remainder", Types.floormod)       // numpy: sign of divisor
  // bitwise (`operator/binary.py:421-460` bor/band/bxor/bxnor, bget/bset/bclr/bshift)
  val bor   = BinaryOp("bor", _ bitwiseOR _)
  val band  = BinaryOp("band", _ bitwiseAND _)
  val bxor  = BinaryOp("bxor", _ bitwiseXOR _)
  val bxnor = BinaryOp("bxnor", (a, b) => bitwise_not(a bitwiseXOR b))
  // bit-position ops: second arg is the bit index (shift amount must be a
  // Column → SQL shiftleft/shiftright via call_function)
  private def shl(a: Column, n: Column): Column = call_function("shiftleft", a, n.cast("int"))
  private def shr(a: Column, n: Column): Column = call_function("shiftright", a, n.cast("int"))
  val bget = BinaryOp("bget", (a, b) => shr(a, b).bitwiseAND(lit(1L)))
  val bset = BinaryOp("bset", (a, b) => a.bitwiseOR(shl(lit(1L), b)))
  val bclr = BinaryOp("bclr", (a, b) => a.bitwiseAND(bitwise_not(shl(lit(1L), b))))
  val bshift = BinaryOp("bshift", (a, b) =>
    when(b >= 0, shl(a, b)).otherwise(shr(a, -b)))
  // float pairs
  val atan2Op  = BinaryOp("atan2", atan2(_, _))
  // scaled hypot (the classic overflow-free form): sqrt(a²+b²) saturates at
  // |a| ≈ 1e154; max·sqrt(1+(min/max)²) is exact to rounding over the full
  // FP64 range
  val hypotOp  = BinaryOp("hypot", (a, b) => {
    val mx = greatest(abs(a), abs(b))
    val mn = least(abs(a), abs(b))
    // IEEE/C99: hypot(±inf, y) = +inf for ANY y including NaN — the scaled
    // form alone would compute inf/inf = NaN there (ADVICE r3). The guard
    // tests |a|/|b| directly (not mx): Spark orders NaN above +inf, so
    // mx === inf is false for (inf, NaN).
    when(abs(a) === Double.PositiveInfinity || abs(b) === Double.PositiveInfinity,
        lit(Double.PositiveInfinity))
      .when(mx === 0.0, lit(0.0))
      .otherwise(mx * sqrt(lit(1.0) + (mn / mx) * (mn / mx)))
  })
  val ldexpOp  = BinaryOp("ldexp", (a, b) => a * pow(lit(2.0), b))
  val copysign = BinaryOp("copysign",
    (a, b) => when(b < 0, -abs(a)).otherwise(abs(a)))
  val absfirst  = BinaryOp("absfirst", (a, _) => abs(a))
  val abssecond = BinaryOp("abssecond", (_, b) => abs(b))
  val rpow      = BinaryOp("rpow", (a, b) => pow(b, a))

  // ---- positional binaries (reference `operator/base.py:38-47`:
  //      firsti/firstj/secondi/secondj and the +1 variants; all INT64) ----
  // The "value" of a positional op is an operand INDEX, not an operand value,
  // so the (a, b) value lambda is a placeholder: semiring kernels
  // (mxm/mxv/vxm) resolve the real column through `positionalMult` — in our
  // join form the index IS a join/output key column, so evaluation is free.
  private def posBin(name: String) =
    BinaryOp(name, (_, _) => lit(null).cast("long"))
  val firsti   = posBin("firsti");  val firsti1  = posBin("firsti1")
  val firstj   = posBin("firstj");  val firstj1  = posBin("firstj1")
  val secondi  = posBin("secondi"); val secondi1 = posBin("secondi1")
  val secondj  = posBin("secondj"); val secondj1 = posBin("secondj1")
  val positionalBinaries: Seq[BinaryOp] =
    Seq(firsti, firsti1, firstj, firstj1, secondi, secondi1, secondj, secondj1)

  /** index-column resolution for positional ⊗ inside a semiring product
    * (reference positional semirings, `operator/semiring.py:185-218`):
    * firsti/firstj read the row/col index of the FIRST operand's element,
    * secondi/secondj of the second; `*1` adds 1. Kernels pass the four index
    * columns of their join — mxm A(i,k)⊗B(k,j) passes (i,k,k,j); mxv
    * A(i,k)⊗v(k) passes (i,k,k,0) (a GraphBLAS vector is an n×1 column, so
    * its element (k) sits at row k, col 0); vxm v(k)⊗A(k,j) passes
    * (k,0,k,j). */
  val positionalMult: Map[String, (Column, Column, Column, Column) => Column] = Map(
    "firsti"   -> ((ia, _, _, _) => ia),
    "firsti1"  -> ((ia, _, _, _) => ia + 1L),
    "firstj"   -> ((_, ja, _, _) => ja),
    "firstj1"  -> ((_, ja, _, _) => ja + 1L),
    "secondi"  -> ((_, _, ib, _) => ib),
    "secondi1" -> ((_, _, ib, _) => ib + 1L),
    "secondj"  -> ((_, _, _, jb) => jb),
    "secondj1" -> ((_, _, _, jb) => jb + 1L))

  // ---- complex ops (FC32/FC64 — optional in the reference too, gated by
  //      `dtypes.py:15` _supports_complex; value = struct(re, im),
  //      `dtypes.py:423-457`). The reference reuses the names plus/times
  //      with per-dtype typed variants; our ops are untyped Column
  //      combinators, so the complex variants carry explicit c-names
  //      (documented divergence). ----
  /** complex constructor/accessors over struct(re, im) values */
  object Cx {
    def apply(re: Column, im: Column): Column = struct(re.as("re"), im.as("im"))
    def re(c: Column): Column = c("re")
    def im(c: Column): Column = c("im")
  }
  val cmplxOp = BinaryOp("cmplx", (a, b) => Cx(a, b)) // binary.cmplx: (re, im) → complex
  val conjOp  = UnaryOp("conj", c => Cx(Cx.re(c), -Cx.im(c)))
  val crealOp = UnaryOp("creal", Cx.re)
  val cimagOp = UnaryOp("cimag", Cx.im)
  val cabsOp  = UnaryOp("cabs", c => hypotOp(Cx.re(c), Cx.im(c)))
  val cplus   = BinaryOp("cplus", (a, b) =>
    Cx(Cx.re(a) + Cx.re(b), Cx.im(a) + Cx.im(b)))
  val cminus  = BinaryOp("cminus", (a, b) =>
    Cx(Cx.re(a) - Cx.re(b), Cx.im(a) - Cx.im(b)))
  val ctimes  = BinaryOp("ctimes", (a, b) =>
    Cx(Cx.re(a) * Cx.re(b) - Cx.im(a) * Cx.im(b),
       Cx.re(a) * Cx.im(b) + Cx.im(a) * Cx.re(b)))
  /** complex true division a·conj(b)/|b|² — named `ctruediv` because the
    * reference's `cdiv` is its C-STYLE INTEGER division (truncate toward
    * zero, `operator/binary.py`), already in this catalog. Textbook
    * formula, not Smith's scaled variant: component magnitudes near
    * sqrt(DBL_MAX) overflow the |b|² term — acceptable for the analytics
    * domain here and documented, matching the exactness notes on the other
    * c-ops. */
  val ctruediv = BinaryOp("ctruediv", (a, b) => {
    val den = Cx.re(b) * Cx.re(b) + Cx.im(b) * Cx.im(b)
    Cx((Cx.re(a) * Cx.re(b) + Cx.im(a) * Cx.im(b)) / den,
       (Cx.im(a) * Cx.re(b) - Cx.re(a) * Cx.im(b)) / den)
  })
  /** complex exp/log/sqrt (principal branches, C99 semantics on the
    * branch cut: csqrt(-1+0i) = +i) */
  val cexpOp = UnaryOp("cexp", c =>
    Cx(exp(Cx.re(c)) * cos(Cx.im(c)), exp(Cx.re(c)) * sin(Cx.im(c))))
  val clogOp = UnaryOp("clog", c =>
    Cx(log(hypotOp(Cx.re(c), Cx.im(c))), atan2(Cx.im(c), Cx.re(c))))
  val csqrtOp = UnaryOp("csqrt", c => {
    val r = hypotOp(Cx.re(c), Cx.im(c))
    Cx(sqrt((r + Cx.re(c)) / 2),
       when(Cx.im(c) < 0, lit(-1.0)).otherwise(lit(1.0))
         * sqrt((r - Cx.re(c)) / 2))
  })
  /** complex plus monoid — componentwise sums in one aggregate */
  val cplusMonoid = Monoid("cplus", cplus, Cx(lit(0.0), lit(0.0)),
    c => Cx(sum(Cx.re(c)), sum(Cx.im(c))))

  // ---- monoids (reference `operator/monoid.py:239-255`) ----
  val plusMonoid  = Monoid("plus", plus, lit(0.0), sum)
  val minMonoid   = Monoid("min", minBin, lit(Double.PositiveInfinity), min)
  val maxMonoid   = Monoid("max", maxBin, lit(Double.NegativeInfinity), max)
  val lorMonoid   = Monoid("lor", lor, lit(false), c => bool_or(c.cast("boolean")))
  val landMonoid  = Monoid("land", land, lit(true), c => bool_and(c.cast("boolean")))
  val minLongMonoid = Monoid("min_long", minBin, lit(Long.MaxValue), min)
  // `times` monoid: product has no Spark builtin; exact FP multiplication via
  // a typed Aggregator (Aggs.product) — the earlier exp(sum(log(abs))) recipe
  // drifted in the last bits for any zero-free group (SURVEY §4.2 item 5).
  val timesMonoid = Monoid("times", times, lit(1.0), Aggs.product)

  // bitwise monoids (`monoid.py:239-255`): identities are the respective
  // absorbing-free elements (0 for or/xor, all-ones for and/xnor)
  val borMonoid  = Monoid("bor", bor, lit(0L), bit_or)
  val bandMonoid = Monoid("band", band, lit(-1L), bit_and)
  val bxorMonoid = Monoid("bxor", bxor, lit(0L), bit_xor)
  // xnor-fold of n items = xor of all, complemented when n is even
  // (x XNOR y = NOT(x XOR y); the complements cancel pairwise)
  val bxnorMonoid = Monoid("bxnor", bxnor, lit(-1L),
    c => when(count(c) % 2 === 0, bitwise_not(bit_xor(c))).otherwise(bit_xor(c)))
  // logical xor fold = parity of trues; lxnor/eq fold = its complement when
  // item count is even (same cancellation as bxnor)
  val lxorMonoid = Monoid("lxor", lxor, lit(false),
    c => pmod(sum(when(c.cast("boolean"), 1L).otherwise(0L)), lit(2L)) === 1)
  val lxnorMonoid = Monoid("lxnor", lxnor, lit(true),
    c => (pmod(sum(when(c.cast("boolean"), 1L).otherwise(0L)), lit(2L)) === 1) ===
      (count(c) % 2 === 1))
  /** eq monoid = lxnor on BOOL (`monoid.py` eq) */
  val eqMonoid = Monoid("eq", BinaryOp("eq_bool",
    (a, b) => a.cast("boolean") === b.cast("boolean")), lit(true), lxnorMonoid.agg)
  /** `any` monoid: "pick either" — deterministic as MIN for both the pairwise
    * fold and the aggregate, so fold-vs-agg agree (documented divergence,
    * SURVEY.md §7.4; the reference allows any element, `monoid.py` ANY).
    * No meaningful identity exists ("any of nothing"); reduceOrIdentity of an
    * empty collection therefore yields null/missing by contract. */
  val anyMonoid = Monoid("any", minBin, lit(null).cast("double"), min)

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

  // ---- named registries (the reference resolves ops by name through its
  //      registry machinery, `operator/base.py:704-830`; these maps are our
  //      equivalent and drive the op/dtype conformance test) ----
  val unaries: Map[String, UnaryOp] = Seq(
    identityOp, ainv, minv, absOp, lnot, one, sqrtOp, logOp, expOp, sigNum,
    ceilOp, floorOp, sinOp, cosOp, tanOp, asinOp, acosOp, atanOp, sinhOp,
    coshOp, tanhOp, asinhOp, acoshOp, atanhOp, log2Op, log10Op, log1pOp,
    exp2Op, expm1Op, cbrtOp, roundOp, truncOp, isnanOp, isinfOp, isfiniteOp,
    bnot, conjOp, crealOp, cimagOp, cabsOp, cexpOp, clogOp, csqrtOp,
    erfOp, erfcOp, lgammaOp, tgammaOp, frexpeOp, frexpxOp)
    .map(u => u.name -> u).toMap

  val binaries: Map[String, BinaryOp] = (Seq(
    first, second, pair, anyOp, plus, minus, rminus, times, truediv, rdiv,
    minBin, maxBin, powOp, eq, ne, gt, lt, ge, le, lor, land, lxor, lxnor,
    cdiv, floordiv, fmod, remainder, bor, band, bxor, bxnor, bget, bset,
    bclr, bshift, atan2Op, hypotOp, ldexpOp, copysign, absfirst, abssecond,
    rpow, cmplxOp, cplus, cminus, ctimes, ctruediv) ++ positionalBinaries)
    .map(b => b.name -> b).toMap

  val monoids: Map[String, Monoid] = Seq(
    plusMonoid, minMonoid, maxMonoid, lorMonoid, landMonoid, timesMonoid,
    minLongMonoid, borMonoid, bandMonoid, bxorMonoid, bxnorMonoid,
    lxorMonoid, lxnorMonoid, eqMonoid, anyMonoid, cplusMonoid)
    .map(m => m.name -> m).toMap

  /** the ~20 named IndexUnary/Select ops (`operator/indexunary.py:94-110`;
    * positional rowindex/colindex coerce to INT64 per
    * `operator/binary.py:865-877`) */
  val indexUnaries: Map[String, IndexUnaryOp] = Seq(
    IndexUnaryOp("rowindex", (_, i, _, t) => i + t),
    IndexUnaryOp("colindex", (_, _, j, t) => j + t),
    IndexUnaryOp("diagindex", (_, i, j, t) => j - i + t),
    IndexUnaryOp("tril", (_, i, j, t) => j <= i + t),
    IndexUnaryOp("triu", (_, i, j, t) => j >= i + t),
    IndexUnaryOp("diag", (_, i, j, t) => j - i === t),
    IndexUnaryOp("offdiag", (_, i, j, t) => j - i =!= t),
    IndexUnaryOp("colle", (_, _, j, t) => j <= t),
    IndexUnaryOp("colgt", (_, _, j, t) => j > t),
    IndexUnaryOp("rowle", (_, i, _, t) => i <= t),
    IndexUnaryOp("rowgt", (_, i, _, t) => i > t),
    IndexUnaryOp("indexle", (_, i, _, t) => i <= t),
    IndexUnaryOp("indexgt", (_, i, _, t) => i > t),
    IndexUnaryOp("valueeq", (v, _, _, t) => v === t),
    IndexUnaryOp("valuene", (v, _, _, t) => v =!= t),
    IndexUnaryOp("valuelt", (v, _, _, t) => v < t),
    IndexUnaryOp("valuele", (v, _, _, t) => v <= t),
    IndexUnaryOp("valuegt", (v, _, _, t) => v > t),
    IndexUnaryOp("valuege", (v, _, _, t) => v >= t)
  ).map(o => o.name -> o).toMap

  // ---- IndexBinaryOp registry (`operator/indexbinary.py:231` register_new;
  //      all user-defined, none built in) ----
  private val indexBinariesReg =
    new scala.collection.concurrent.TrieMap[String, IndexBinaryOp]()
  /** register_new: atomic — a duplicate name fails rather than silently
    * overwriting (same contract as Types.registerRecord). */
  def registerIndexBinary(op: IndexBinaryOp): IndexBinaryOp = {
    require(indexBinariesReg.putIfAbsent(op.name, op).isEmpty,
      s"IndexBinaryOp ${op.name} already registered")
    op
  }
  def indexBinary(name: String): IndexBinaryOp = indexBinariesReg(name)

  /** full `{monoid}_{binaryop}` semiring catalog (`semiring.py:185-218`
    * builds these combinatorially; dtype validity is checked at use, as in
    * the reference's per-dtype typed variants). */
  lazy val semirings: Map[String, Semiring] = (for {
    (mn, m) <- monoids.toSeq
    (bn, b) <- binaries.toSeq
  } yield s"${mn}_$bn" -> Semiring(s"${mn}_$bn", m, b)).toMap

  def semiring(name: String): Semiring = semirings(name)
}
