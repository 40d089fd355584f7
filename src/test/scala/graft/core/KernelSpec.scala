package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Per-operator unit tests on the reference's own fixtures:
  * the canonical 7×7 matrix A and size-7 vector v
  * (`/root/reference/graphblas/tests/test_matrix.py:34-55`), and the
  * ewise micro-vectors of `docs/user_guide/operators.rst:341-358`
  * (the missing-vs-zero contract). Expected outputs are computed with naive
  * driver-side Scala over Maps — an independent oracle for the distributed
  * kernels.
  */
class KernelSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // 7×7 fixture A (test_matrix.py:34-49)
  val aCoo: Seq[(Long, Long, Double)] = Seq(
    (3, 0, 3), (0, 1, 2), (3, 2, 3), (5, 2, 1), (6, 2, 5), (0, 3, 3),
    (6, 3, 7), (1, 4, 8), (6, 4, 3), (2, 5, 1), (4, 5, 7), (1, 6, 4)
  ).map { case (r, c, v) => (r.toLong, c.toLong, v.toDouble) }
  val aMap: Map[(Long, Long), Double] = aCoo.map { case (r, c, v) => (r, c) -> v }.toMap

  // size-7 fixture v (test_matrix.py:52-55)
  val vPairs: Seq[(Long, Double)] = Seq((1L, 1.0), (3L, 1.0), (4L, 2.0), (6L, 0.0))
  val vMap: Map[Long, Double] = vPairs.toMap

  def matA: GrbMatrix = GrbMatrix.fromCoo(spark, aCoo, GrbShape(7, 7))
  def vecV: GrbVector = GrbVector.fromPairs(spark, vPairs, 7)

  def collectV(v: GrbVector): Map[Long, Double] =
    v.df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  def collectM(m: GrbMatrix): Map[(Long, Long), Double] =
    m.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("mxv plus_times matches naive SpMV (GrB_mxv, matrix.py:2203)") {
    val got = collectV(matA.mxv(vecV, Ops.plusTimes))
    val want = (0L until 7).flatMap { i =>
      val terms = (0L until 7).flatMap(j => for {
        a <- aMap.get((i, j)); x <- vMap.get(j)
      } yield a * x)
      if (terms.isEmpty) None else Some(i -> terms.sum)
    }.toMap
    assert(got == want)
    assert(!got.contains(5L)) // row 5 only hits col 2, v(2) missing → absent
  }

  test("mxm plus_times matches naive triple loop (GrB_mxm, matrix.py:2264)") {
    val got = collectM(matA.mxm(matA, Ops.plusTimes))
    val want = (for {
      i <- 0L until 7; j <- 0L until 7
      terms = (0L until 7).flatMap(k =>
        for { a <- aMap.get((i, k)); b <- aMap.get((k, j)) } yield a * b)
      if terms.nonEmpty
    } yield (i, j) -> terms.sum).toMap
    assert(got == want)
  }

  test("mxm with structural mask == unmasked then filtered (mask pushdown)") {
    val mask = matA.structureMask()
    val masked = collectM(matA.mxm(matA, Ops.plusTimes, Some(mask)))
    val unmasked = collectM(matA.mxm(matA, Ops.plusTimes))
    assert(masked == unmasked.filter { case (k, _) => aMap.contains(k) })
  }

  test("masked mxv == unmasked then filtered (mask below the agg)") {
    val mask = GrbMask(Seq(0L, 3L, 6L).toDF("id"))
    val masked = collectV(matA.mxv(vecV, Ops.plusTimes, Some(mask)))
    val unmasked = collectV(matA.mxv(vecV, Ops.plusTimes))
    assert(masked == unmasked.filter { case (k, _) => Set(0L, 3L, 6L)(k) })
    val comp = collectV(matA.mxv(vecV, Ops.plusTimes, Some(~mask)))
    assert(comp == unmasked.filter { case (k, _) => !Set(0L, 3L, 6L)(k) })
  }

  test("matrix extract with input_mask pre-filters the INPUT (base.py:356)") {
    val rowMap = (0L until 7).map(i => (i, i)).toDF("old", "new")
    val inMask = GrbMask(Seq((0L, 1L), (3L, 0L), (1L, 4L)).toDF("src", "dst"))
    val got = collectM(matA.extract(rowMap, rowMap, GrbShape(7, 7),
      inputMask = Some(inMask)))
    assert(got == aMap.filter { case (k, _) => Set((0L, 1L), (3L, 0L), (1L, 4L))(k) })
  }

  test("full setdiag(values, k, mask, accum) (matrix.py:2905)") {
    import Extras._
    // A has (0,1)=2 on diagonal k=1; write u = {0→10, 2→20} onto k=1
    val u = GrbVector.fromPairs(spark, Seq((0L, 10.0), (2L, 20.0)), 7)
    // no accum: present values overwrite, absent diagonal cells kept
    val plain = collectM(matA.setdiag(u, 1L, None, None))
    assert(plain((0L, 1L)) == 10.0 && plain((2L, 3L)) == 20.0)
    assert(plain.filterNot(k => Set((0L, 1L), (2L, 3L))(k._1)) ==
      aMap.filterNot(k => Set((0L, 1L), (2L, 3L))(k._1)))
    // accum=plus: overlap combines ((0,1): 2+10), new inserts
    val acc = collectM(matA.setdiag(u, 1L, None, Some(Ops.plus)))
    assert(acc((0L, 1L)) == 12.0 && acc((2L, 3L)) == 20.0)
    // mask scopes the diagonal writes: only (0,1) writable
    val mask = GrbMask(Seq((0L, 1L)).toDF("src", "dst"))
    val msk = collectM(matA.setdiag(u, 1L, Some(mask), None))
    assert(msk((0L, 1L)) == 10.0 && !msk.contains((2L, 3L)))
  }

  test("transpose is index swap (matrix.py:3825)") {
    assert(collectM(matA.transpose) == aMap.map { case ((i, j), v) => (j, i) -> v })
  }

  test("vxm == transpose-mxv orientation (vector.py:1309)") {
    val got = collectV(vecV.vxm(matA, Ops.plusTimes))
    val want = collectV(matA.transpose.mxv(vecV, Ops.plusTimes))
    assert(got == want)
  }

  // ewise micro-vectors (operators.rst:341-358): missing-vs-zero contract
  val ew1 = Seq((0L, 1.0), (2L, 2.0), (3L, 3.5), (5L, 9.0))
  val ew2 = Seq((0L, 7.0), (1L, 5.2), (3L, 3.0), (5L, 2.5))

  test("ewise_mult is intersection (operations.rst:156)") {
    val a = GrbVector.fromPairs(spark, ew1, 6)
    val b = GrbVector.fromPairs(spark, ew2, 6)
    assert(collectV(a.ewiseMult(b, Ops.times)) ==
      Map(0L -> 7.0, 3L -> 10.5, 5L -> 22.5))
  }

  test("ewise_add is union; singletons pass through UNCHANGED for non-commutative ops (operations.rst:236-247)") {
    val a = GrbVector.fromPairs(spark, ew1, 6)
    val b = GrbVector.fromPairs(spark, ew2, 6)
    val got = collectV(a.ewiseAdd(b, Ops.minus))
    // overlaps subtracted; singletons NOT negated (the spec quirk)
    assert(got == Map(0L -> -6.0, 1L -> 5.2, 2L -> 2.0, 3L -> 0.5, 5L -> 6.5))
  }

  test("ewise_union fills per-side defaults (matrix.py:2043)") {
    val a = GrbVector.fromPairs(spark, ew1, 6)
    val b = GrbVector.fromPairs(spark, ew2, 6)
    val got = collectV(a.ewiseUnion(b, Ops.minus, lit(0.0), lit(0.0)))
    assert(got == Map(0L -> -6.0, 1L -> -5.2, 2L -> 2.0, 3L -> 0.5, 5L -> 6.5))
  }

  test("apply / select / reduce family") {
    assert(collectV(vecV.apply(Ops.ainv)) ==
      vMap.map { case (k, v) => k -> -v })
    assert(collectV(vecV.select((v, _) => v > 0.5)) ==
      vMap.filter(_._2 > 0.5))
    // select on matrix: tril (indexunary.py:101)
    assert(collectM(matA.select((_, i, j) => j < i)) ==
      aMap.filter { case ((i, j), _) => j < i })
    assert(matA.reduceScalar(Ops.plusMonoid) == Some(aCoo.map(_._3).sum))
    assert(collectV(matA.reduceRowwise(Ops.maxMonoid)) ==
      aMap.groupBy(_._1._1).map { case (i, m) => i -> m.values.max })
    // empty reduce → None (Scalar is_empty, scalar.py:317)
    assert(vecV.select((v, _) => v > 100.0).reduce(Ops.plusMonoid).isEmpty)
  }

  test("monoid reduce: times monoid handles zeros and signs") {
    val v = GrbVector.fromPairs(spark, Seq((0L, 2.0), (1L, -3.0), (2L, 4.0)), 4)
    val got = v.reduce(Ops.timesMonoid).get.asInstanceOf[Double]
    assert(math.abs(got - -24.0) < 1e-9)
    val withZero = GrbVector.fromPairs(spark, Seq((0L, 2.0), (1L, 0.0)), 4)
    assert(withZero.reduce(Ops.timesMonoid).get.asInstanceOf[Double] == 0.0)
  }

  test("write clause: mask + accum + replace semantics (fundamentals.rst:14-38)") {
    val c = Seq((0L, 10.0), (1L, 10.0), (2L, 10.0)).toDF("id", "v")
    val t = Seq((1L, 1.0), (3L, 1.0)).toDF("id", "v")
    val mask = GrbMask(Seq(Tuple1(1L), Tuple1(2L)).toDF("id"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // no accum: inside mask C := T (2 deleted — T absent there); outside kept
    assert(m(Kernels.write(c, t, Seq("id"), Some(mask))) ==
      Map(0L -> 10.0, 1L -> 1.0))
    // accum plus: overlap combined, outside-mask untouched
    assert(m(Kernels.write(c, t, Seq("id"), Some(mask), Some(Ops.plus))) ==
      Map(0L -> 10.0, 1L -> 11.0, 2L -> 10.0))
    // replace: outside-mask old values dropped
    assert(m(Kernels.write(c, t, Seq("id"), Some(mask), Some(Ops.plus), replace = true)) ==
      Map(1L -> 11.0, 2L -> 10.0))
    // complemented mask: write region = NOT {1,2} → 0 deleted (T absent
    // there), 3 written; {1,2} keep old values
    assert(m(Kernels.write(c, t, Seq("id"), Some(GrbMask(mask.keys, complement = true)))) ==
      Map(1L -> 10.0, 2L -> 10.0, 3L -> 1.0))
  }

  test("mask combination recipes and/or incl. complements (mask.py:86,113)") {
    val ka = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("id")
    val kb = Seq(Tuple1(2L), Tuple1(3L), Tuple1(4L)).toDF("id")
    val universe = Seq(0L, 1L, 2L, 3L, 4L, 5L).map(i => (i, 1.0)).toDF("id", "v")
    def keysOf(m: GrbMask): Set[Long] =
      Kernels.maskFilter(universe, m, Seq("id")).collect().map(_.getLong(0)).toSet
    assert(keysOf(GrbMask.and(GrbMask(ka), GrbMask(kb), Seq("id"))) == Set(2L, 3L))
    assert(keysOf(GrbMask.or(GrbMask(ka), GrbMask(kb), Seq("id"))) == Set(1L, 2L, 3L, 4L))
    assert(keysOf(GrbMask.and(GrbMask(ka), ~GrbMask(kb), Seq("id"))) == Set(1L))
    assert(keysOf(GrbMask.and(~GrbMask(ka), ~GrbMask(kb), Seq("id"))) == Set(0L, 5L))
    assert(keysOf(GrbMask.or(~GrbMask(ka), GrbMask(kb), Seq("id"))) == Set(0L, 2L, 3L, 4L, 5L))
  }

  test("extract with index remap (GrB_Matrix_extract, operations.rst:352-420)") {
    // A[[1,3,6], [2,4]] → 3×2 with dense remap
    val rowMap = Seq((1L, 0L), (3L, 1L), (6L, 2L)).toDF("old", "new")
    val colMap = Seq((2L, 0L), (4L, 1L)).toDF("old", "new")
    val got = collectM(matA.extract(rowMap, colMap, GrbShape(3, 2)))
    assert(got == Map((0L, 1L) -> 8.0, (2L, 0L) -> 5.0, (2L, 1L) -> 3.0, (1L, 0L) -> 3.0))
  }

  test("scatter-assign reduces duplicate targets by accum (FastSV Reduce_assign)") {
    val base = GrbVector.fromPairs(spark, Seq((0L, 5.0), (1L, 5.0)), 3)
    val u = GrbVector.fromPairs(spark, Seq((0L, 3.0), (1L, 7.0), (2L, 1.0)), 3)
    // targets: 0→1, 1→1 (duplicate!), 2→2 ; min-dedup then min-merge
    val targets = Seq((0L, 1L), (1L, 1L), (2L, 2L)).toDF("id", "target")
    val got = collectV(base.scatterAssign(targets, u, min, Ops.minBin))
    assert(got == Map(0L -> 5.0, 1L -> 3.0, 2L -> 1.0))
  }

  test("diag / reposition / kronecker index arithmetic") {
    assert(collectV(matA.diag(1)) ==
      aMap.collect { case ((i, j), v) if j == i + 1 => i -> v })
    val rep = collectM(matA.reposition(1, 0))
    assert(rep == aMap.collect { case ((i, j), v) if i + 1 < 7 => (i + 1, j) -> v })
    val tiny = GrbMatrix.fromCoo(spark, Seq((0L, 1L, 2.0), (1L, 0L, 3.0)), GrbShape(2, 2))
    val kron = collectM(tiny.kronecker(tiny, Ops.times))
    assert(kron == Map((0L, 3L) -> 4.0, (1L, 2L) -> 6.0, (2L, 1L) -> 6.0, (3L, 0L) -> 9.0))
  }

  test("kernels are dtype-generic: INT64 values stay integral (dtypes.py:329)") {
    // the reference fixture is INT64; run the same kernels on LongType
    val li = aCoo.map { case (r, c, v) => (r, c, v.toLong) }.toDF("src", "dst", "v")
    val m = GrbMatrix(li, GrbShape(7, 7))
    val prod = m.mxm(m, Ops.plusTimes)
    assert(prod.df.schema("v").dataType == org.apache.spark.sql.types.LongType)
    val got = prod.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (for {
      i <- 0L until 7L; j <- 0L until 7L
      terms = (0L until 7L).flatMap(k =>
        for { a <- aMap.get((i, k)); b <- aMap.get((k, j)) } yield (a * b).toLong)
      if terms.nonEmpty
    } yield (i, j) -> terms.sum).toMap
    assert(got == want)
  }

  test("UDT-style record values: ewise over struct columns (dtypes.py:165 register_new)") {
    // reference UDTs map to StructType values (SURVEY.md §1.2); a custom
    // BinaryOp over the struct fields exercises the same kernel path
    val a = Seq((0L, (1.0, 2.0)), (2L, (3.0, 4.0))).toDF("id", "v")
    val b = Seq((0L, (10.0, 20.0)), (3L, (5.0, 6.0))).toDF("id", "v")
    val addRec = BinaryOp("addRec", (x, y) =>
      struct((x.getField("_1") + y.getField("_1")).as("_1"),
             (x.getField("_2") + y.getField("_2")).as("_2")))
    val got = Kernels.ewiseAddDF(a, b, Seq("id"), addRec)
      .collect().map(r => r.getLong(0) -> (r.getStruct(1).getDouble(0), r.getStruct(1).getDouble(1)))
      .toMap
    assert(got == Map(0L -> ((11.0, 22.0)), 2L -> ((3.0, 4.0)), 3L -> ((5.0, 6.0))))
  }

  // ---- general assign (matrix.py:3116-3295, operations.rst:424-540),
  //      mirroring test_matrix.py's assign families ----

  test("matrix assign C[rows, cols] << A replaces the region (no accum)") {
    val a2 = GrbMatrix.fromCoo(spark, Seq((0L, 0L, 100.0), (1L, 1L, 200.0)), GrbShape(2, 2))
    val rowMap = Seq((0L, 0L), (1L, 3L)).toDF("idx", "target")
    val colMap = Seq((0L, 1L), (1L, 4L)).toDF("idx", "target")
    val got = collectM(matA.assign(rowMap, colMap, a2))
    // region {0,3}×{1,4}: old (0,1)=2 deleted; mapped (0,1)=100, (3,4)=200
    val want = aMap - ((0L, 1L)) + ((0L, 1L) -> 100.0) + ((3L, 4L) -> 200.0)
    assert(got == want)
  }

  test("matrix assign with accum=plus merges region overlaps") {
    val a2 = GrbMatrix.fromCoo(spark, Seq((0L, 0L, 100.0), (1L, 1L, 200.0)), GrbShape(2, 2))
    val rowMap = Seq((0L, 0L), (1L, 3L)).toDF("idx", "target")
    val colMap = Seq((0L, 1L), (1L, 4L)).toDF("idx", "target")
    val got = collectM(matA.assign(rowMap, colMap, a2, accum = Some(Ops.plus)))
    val want = aMap + ((0L, 1L) -> 102.0) + ((3L, 4L) -> 200.0)
    assert(got == want)
  }

  test("vector scalar assign with and without mask (GrB_Vector_assign_Scalar)") {
    val targets = Seq(1L, 2L).toDF("target")
    val got = collectV(vecV.assignScalar(targets, lit(10.0)))
    assert(got == vMap + (1L -> 10.0) + (2L -> 10.0))
    val mask = GrbMask(Seq(1L).toDF("id"))
    val masked = collectV(vecV.assignScalar(targets, lit(10.0), mask = Some(mask)))
    assert(masked == vMap + (1L -> 10.0)) // id 2 outside mask: untouched (missing)
  }

  test("row assign C[i, :] << u replaces the row (GrB_Row_assign)") {
    val u = GrbVector.fromPairs(spark, Seq((2L, 9.0)), 7)
    val got = collectM(matA.assignRow(0, u))
    val want = aMap - ((0L, 1L)) - ((0L, 3L)) + ((0L, 2L) -> 9.0)
    assert(got == want)
  }

  test("power(0) is the semiring identity diagonal (matrix.py:2840)") {
    import Extras._
    val got = collectM(matA.power(0, Ops.plusTimes))
    assert(got == (0L until 7L).map(i => (i, i) -> 1.0).toMap)
    // and I @ A == A under the semiring
    val prod = collectM(matA.power(0, Ops.plusTimes).mxm(matA, Ops.plusTimes))
    assert(prod == aMap)
  }

  test("matrix ewise_union fills per-side defaults (matrix.py:2043)") {
    val b = GrbMatrix.fromCoo(spark, Seq((0L, 1L, 5.0), (6L, 6L, 2.0)), GrbShape(7, 7))
    val got = collectM(matA.ewiseUnion(b, Ops.minus, lit(0.0), lit(0.0)))
    val want = (aMap.keySet ++ Set((6L, 6L))).map { k =>
      k -> (aMap.getOrElse(k, 0.0) - (if (k == (0L, 1L)) 5.0 else if (k == (6L, 6L)) 2.0 else 0.0))
    }.toMap
    assert(got == want)
  }

  test("dup(mask=) and input_mask on extract (matrix.py:683, base.py:356)") {
    val m = GrbMask(Seq((3L, 0L), (0L, 1L)).toDF("src", "dst"))
    assert(collectM(matA.dup(m)) == Map((3L, 0L) -> 3.0, (0L, 1L) -> 2.0))
    // vector extract with input_mask: mask applied to the INPUT before remap
    val im = GrbMask(Seq(1L, 4L).toDF("id"))
    val remap = Seq((1L, 0L), (3L, 1L), (4L, 2L)).toDF("old", "new")
    val got = collectV(vecV.extract(remap, 3, inputMask = Some(im)))
    assert(got == Map(0L -> 1.0, 2L -> 2.0)) // id 3 masked out of the input
  }

  test("Vector.diag(k) builds the diagonal matrix and round-trips with " +
    "Matrix.diag (vector.py:605, ss.build_diag core/ss/matrix.py:252)") {
    // k = 0 / super- / sub-diagonal placements per GxB_Matrix_diag
    assert(collectM(vecV.diag(0)) == vMap.map { case (i, x) => (i, i) -> x })
    assert(collectM(vecV.diag(2)) == vMap.map { case (i, x) => (i, i + 2) -> x })
    assert(collectM(vecV.diag(-2)) == vMap.map { case (i, x) => (i + 2, i) -> x })
    // shape: (size+|k|)-square
    assert(vecV.diag(2).shape == GrbShape(9, 9))
    // round trip diag ∘ build_diag = identity for every k sign
    Seq(-2L, 0L, 2L).foreach { k =>
      assert(collectV(vecV.diag(k).diag(k)) == vMap, s"k=$k")
    }
  }

  test("IndexBinaryOp: registered, theta-bound, used in ewise_mult and as a " +
    "semiring multiplier (operator/indexbinary.py:231, operators.rst:225-255)") {
    // the docs' own example: discounted_sum(x,...,y,..., theta) = (x+y)·theta
    val ds = Ops.registerIndexBinary(IndexBinaryOp("discounted_sum",
      (x, _, _, y, _, _, theta) => (x + y) * theta))
    assert(Ops.indexBinary("discounted_sum") eq ds)
    intercept[IllegalArgumentException] {
      Ops.registerIndexBinary(IndexBinaryOp("discounted_sum",
        (x, _, _, _, _, _, _) => x)) // duplicate names must fail, not overwrite
    }
    val bound = ds.bound(lit(0.5))
    // C << A.ewise_mult(A, binop): (a+a)·0.5 = a on the intersection
    assert(collectM(matA.ewiseMult(matA, bound)) == aMap)
    // D << A.mxm(A, semiring(plus, binop)): ⊗ = (a+b)·0.5
    val sr = Semiring("plus_discounted", Ops.plusMonoid, bound)
    val got = collectM(matA.mxm(matA, sr))
    val want = (for {
      i <- 0L until 7; j <- 0L until 7
      terms = (0L until 7).flatMap(k =>
        for { a <- aMap.get((i, k)); b <- aMap.get((k, j)) } yield (a + b) * 0.5)
      if terms.nonEmpty
    } yield (i, j) -> terms.sum).toMap
    assert(got == want)
    // an INDEX-using op pins the kernels' index resolution: ⊗ evaluates with
    // mxm coordinates (ix=i, jx=k, iy=k, jy=j), exactly the positional wiring
    val posOp = IndexBinaryOp("ix_jy_probe",
      (_, ix, _, _, _, jy, theta) => ix * theta + jy)
    val boundPos = posOp.bound(lit(100.0)) // FP theta → FP64 results
    val gotPos = collectM(matA.mxm(matA, Semiring("min_ixjy", Ops.minMonoid, boundPos)))
    val wantPos = (for {
      i <- 0L until 7; j <- 0L until 7
      terms = (0L until 7).flatMap(k =>
        for { _ <- aMap.get((i, k)); _ <- aMap.get((k, j)) } yield (i * 100 + j).toDouble)
      if terms.nonEmpty
    } yield (i, j) -> terms.min).toMap
    assert(gotPos.map { case (k, v) => k -> v } == wantPos)
    // ewise_mult with an index-using op: both sides share (i, j) keys
    val ewPos = collectM(matA.ewiseMult(matA, boundPos))
    assert(ewPos == aMap.map { case ((i, j), _) => (i, j) -> (i * 100 + j).toDouble })
    // ewise_add: overlaps combine index-aware; singletons pass through
    val b = GrbMatrix.fromCoo(spark, Seq((0L, 1L, 5.0), (6L, 6L, 2.0)), GrbShape(7, 7))
    val ea = collectM(matA.ewiseAdd(b, boundPos))
    assert(ea((0L, 1L)) == 1.0) // overlap at (0,1) → 0·100 + 1
    assert(ea((6L, 6L)) == 2.0 && ea((3L, 0L)) == 3.0) // singletons unchanged
  }

  test("matrix reduce with allow_empty=False folds empty to the identity " +
    "(matrix.py:2712)") {
    val empty = GrbMatrix.fromCoo(spark, Seq.empty, GrbShape(7, 7))
    assert(empty.reduceScalar(Ops.plusMonoid).isEmpty)
    assert(empty.reduceScalarOrIdentity(Ops.plusMonoid) == 0.0)
    assert(empty.reduceScalarOrIdentity(Ops.timesMonoid) == 1.0)
    assert(matA.reduceScalarOrIdentity(Ops.plusMonoid) == aMap.values.sum)
  }

  test("compactifyPartitioned matches the global-window compactify exactly") {
    import Extras._
    val v = GrbVector(Seq((5L, 1.0), (17L, 2.0), (2L, 3.0), (900L, 4.0),
      (44L, 5.0), (999L, 6.0)).toDF("id", "v"), 1000)
    val want = collectV(v.compactify())
    Seq(1, 4, 8, 64).foreach { b =>
      assert(collectV(v.compactifyPartitioned(b)) == want, s"buckets=$b")
    }
  }

  test("isclose-style comparator: mxv at two partitionings agrees to 1e-6") {
    val a = matA
    val r1 = collectV(a.mxv(vecV, Ops.plusTimes))
    val r2 = collectV(GrbMatrix(a.df.repartition(7), a.shape).mxv(vecV, Ops.plusTimes))
    assert(r1.keySet == r2.keySet)
    r1.foreach { case (k, x) =>
      assert(math.abs(x - r2(k)) <= 1e-6 * math.max(math.abs(x), math.abs(r2(k))) + 1e-12)
    }
  }
}
