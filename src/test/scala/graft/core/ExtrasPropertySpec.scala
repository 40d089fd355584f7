package graft.core

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.core.Extras._

/** ScalaCheck guards for the Extras / mask-algebra / index-op surfaces not
  * yet randomized by KernelPropertySpec: every distributed result is
  * compared against an independent driver-side Map re-evaluation of the
  * reference semantics (vector.py / matrix.py / mask.py / core/ss
  * citations inline). Tiny fixtures (≤ 8×8) — these pin SEMANTICS; the
  * scale behavior of the same operators is pinned by PlanSpec + the Q
  * fixtures. */
object ExtrasPropertySpec extends Properties("Extras") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  val N = 6L
  val genCoo: Gen[Map[(Long, Long), Double]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, N - 1); j <- Gen.chooseNum(0L, N - 1)
      v <- Gen.chooseNum(1, 8)
    } yield ((i, j), v.toDouble))
  val genVec: Gen[Map[Long, Double]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, N - 1); v <- Gen.chooseNum(1, 8)
    } yield (i, v.toDouble))

  def toM(m: Map[(Long, Long), Double]): GrbMatrix =
    GrbMatrix.fromCoo(spark, m.toSeq.map { case ((i, j), v) => (i, j, v) },
      GrbShape(N, N))
  def toV(m: Map[Long, Double]): GrbVector =
    GrbVector.fromPairs(spark, m.toSeq, N)
  def collect(m: GrbMatrix): Map[(Long, Long), Double] =
    m.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  def collectV(v: GrbVector): Map[Long, Double] =
    v.df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  // ewise_union (matrix.py:2043): op over the UNION with per-side fill
  // defaults; minus is non-commutative so fill/operand order mistakes fail
  property("ewise_union(minus, fills) == driver union with per-side defaults") =
    forAll(genCoo, genCoo) { (a, b) =>
      val want = (a.keySet ++ b.keySet).map { k =>
        k -> (a.getOrElse(k, 10.0) - b.getOrElse(k, -10.0))
      }.toMap
      collect(toM(a).ewiseUnion(toM(b), Ops.minus, lit(10.0), lit(-10.0))) == want
    }

  // reposition (matrix.py:2764 / vector.py:1789): shift indices, clip range
  property("reposition == driver shift-and-clip (matrix + vector)") =
    forAll(genCoo, genVec, Gen.chooseNum(-6L, 6L), Gen.chooseNum(-6L, 6L)) {
      (a, u, roff, coff) =>
        val wantM = a.map { case ((i, j), v) => ((i + roff, j + coff), v) }
          .filter { case ((i, j), _) => i >= 0 && i < N && j >= 0 && j < N }
        val wantV = u.map { case (i, v) => (i + roff, v) }
          .filter { case (i, _) => i >= 0 && i < N }
        collect(toM(a).reposition(roff, coff)) == wantM &&
          collectV(toV(u).reposition(roff)) == wantV
    }

  // mask __and__ / __or__ (mask.py:86,113): all four complement combos,
  // verified by FILTERING a universe relation — the only observable a mask
  // has — against driver set algebra over the same universe
  property("mask and/or: 4 complement combos each == driver set algebra") =
    forAll(genVec, Gen.containerOf[Set, Long](Gen.chooseNum(0L, N - 1)),
      Gen.containerOf[Set, Long](Gen.chooseNum(0L, N - 1))) { (univ, ka, kb) =>
      import spark.implicits._
      val uDf = univ.toSeq.toDF("id", "v")
      def mk(s: Set[Long], c: Boolean) =
        GrbMask(s.toSeq.map(Tuple1(_)).toDF("id"), complement = c)
      def applied(m: GrbMask): Set[Long] =
        Kernels.maskFilter(uDf, m, Seq("id")).collect().map(_.getLong(0)).toSet
      def eff(s: Set[Long], c: Boolean): Long => Boolean =
        if (c) k => !s.contains(k) else s.contains
      (for {
        ca <- Seq(false, true); cb <- Seq(false, true)
      } yield {
        val (ia, ib) = (eff(ka, ca), eff(kb, cb))
        val andWant = univ.keySet.filter(k => ia(k) && ib(k))
        val orWant  = univ.keySet.filter(k => ia(k) || ib(k))
        applied(GrbMask.and(mk(ka, ca), mk(kb, cb), Seq("id"))) == andWant &&
          applied(GrbMask.or(mk(ka, ca), mk(kb, cb), Seq("id"))) == orWant
      }).forall(identity)
    }

  // select(named op, thunk) + applyIndexOp (matrix.py:2500, vector.py:1536):
  // the whole positional/value catalog vs a driver closure table
  property("select/applyIndexOp: named catalog == driver (v,i,j,thunk) eval") =
    forAll(genCoo, Gen.chooseNum(-3L, 3L)) { (a, thunk) =>
      val selOps: Map[String, (Double, Long, Long) => Boolean] = Map(
        "tril"    -> ((_, i, j) => j <= i + thunk),
        "triu"    -> ((_, i, j) => j >= i + thunk),
        "diag"    -> ((_, i, j) => j - i == thunk),
        "offdiag" -> ((_, i, j) => j - i != thunk),
        "rowle"   -> ((_, i, _) => i <= thunk),
        "colgt"   -> ((_, _, j) => j > thunk),
        "valuegt" -> ((v, _, _) => v > thunk),
        "valuele" -> ((v, _, _) => v <= thunk))
      val applyOps: Map[String, (Double, Long, Long) => Double] = Map(
        "rowindex"  -> ((_, i, _) => (i + thunk).toDouble),
        "colindex"  -> ((_, _, j) => (j + thunk).toDouble),
        "diagindex" -> ((_, i, j) => (j - i + thunk).toDouble))
      val m = toM(a)
      selOps.forall { case (name, f) =>
        collect(m.select(Ops.indexUnaries(name), lit(thunk))) ==
          a.filter { case ((i, j), v) => f(v, i, j) }
      } && applyOps.forall { case (name, f) =>
        val got = m.applyIndexOp(Ops.indexUnaries(name), lit(thunk)).df
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toDouble).toMap
        got == a.map { case ((i, j), v) => ((i, j), f(v, i, j)) }
      }
    }

  // setdiag(values, k, mask, accum) (matrix.py:2905): off-diagonal
  // untouched; on-diagonal merged per accum / overwritten where present,
  // mask-scoped (inside mask take the new diagonal state, outside keep old)
  property("setdiag(values,k,mask,accum) == driver diagonal-region write") =
    forAll(genCoo, genVec, Gen.chooseNum(-4L, 4L), Gen.oneOf(true, false),
      Gen.option(Gen.containerOf[Set, Long](Gen.chooseNum(0L, N - 1)))) {
      (a, u, k, withAccum, maskRows) =>
        val diagNew = u.map { case (i, v) => ((i, i + k), v) }
          .filter { case ((i, j), _) => i >= 0 && i < N && j >= 0 && j < N }
        val onDiag  = a.filter { case ((i, j), _) => j - i == k }
        val offDiag = a.filter { case ((i, j), _) => j - i != k }
        val inMask: ((Long, Long)) => Boolean = maskRows match {
          case Some(rows) => { case (i, _) => rows.contains(i) }
          case None       => _ => true
        }
        val newState =
          if (withAccum)
            (onDiag.keySet ++ diagNew.keySet).map { c =>
              c -> ((onDiag.get(c), diagNew.get(c)) match {
                case (Some(x), Some(y)) => x + y
                case (Some(x), None)    => x
                case (None, Some(y))    => y
                case _                  => 0.0
              })
            }.toMap
          else onDiag ++ diagNew
        val wantDiag = newState.filter { case (c, _) => inMask(c) } ++
          onDiag.filter { case (c, _) => !inMask(c) }
        val mask = maskRows.map(rows => GrbMask(
          { import spark.implicits._
            rows.toSeq.map(i => (i, i + k)).toDF("src", "dst") }))
        val got = collect(toM(a).setdiag(toV(u), k, mask,
          if (withAccum) Some(Ops.plus) else None))
        got == offDiag ++ wantDiag
    }

  // isequal / isclose (matrix.py ~isequal, vector.py): exact structural+value
  // equality; isclose honors relTol with the max-magnitude denominator
  property("isequal == map equality; isclose tolerates < relTol, not > relTol") =
    forAll(genVec, genVec) { (a, b) =>
      val va = toV(a); val vb = toV(b)
      val closeUnder = toV(a.map { case (k, v) => k -> v * (1 + 1e-9) })
      val farOver    = toV(a.map { case (k, v) => k -> v * (1 + 1e-5) })
      va.isequal(vb) == (a == b) &&
        va.isequal(va) &&
        va.isclose(closeUnder, relTol = 1e-7) &&
        (a.isEmpty || !va.isclose(farOver, relTol = 1e-7))
    }

  // ss.flatten / ss.reshape (core/ss/matrix.py:3706,3732): row-major
  // linearization, inverse round trip through a different legal shape
  property("flatten == driver i*ncols+j; reshape round-trips via 2×18/12×3") =
    forAll(genCoo) { a =>
      val m = toM(a)
      val wantFlat = a.map { case ((i, j), v) => (i * N + j) -> v }
      collectV(m.flatten()) == wantFlat &&
        collect(m.reshape(2, 18).reshape(N, N)) == a &&
        collect(m.reshape(12, 3).reshape(N, N)) == a
    }

  // ss.split / ss.concat (core/ss/matrix.py:280, ss/_core.py:72): ragged
  // tile decomposition then block concat is the identity, and each tile
  // carries exactly its index-range cells rebased to tile-local coords
  property("split → concat round-trips for ragged chunk sizes") =
    forAll(genCoo, Gen.chooseNum(1L, 6L), Gen.chooseNum(1L, 6L)) { (a, rc, cc) =>
      val m = toM(a)
      val tiles = m.split(rc, cc)
      val tileOk = tiles.forall { case ((ti, tj), t) =>
        collect(t) == a.collect {
          case ((i, j), v)
            if i >= ti * rc && i < (ti + 1) * rc &&
               j >= tj * cc && j < (tj + 1) * cc =>
            ((i - ti * rc, j - tj * cc), v)
        }
      }
      tileOk && collect(Extras.concat(tiles, rc, cc)) == a &&
        Extras.concat(tiles, rc, cc).shape == GrbShape(N, N)
    }
}
