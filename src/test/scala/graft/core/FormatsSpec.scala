package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import Extras._

/** Construction/format family + ss.* utilities (SURVEY.md §2.1/§2.5/§2.7). */
class FormatsSpec extends AnyFunSuite with SparkTest {

  val coo: Seq[(Long, Long, Double)] = Seq(
    (3, 0, 3), (0, 1, 2), (3, 2, 3), (5, 2, 1), (6, 2, 5), (0, 3, 3),
    (6, 3, 7), (1, 4, 8), (6, 4, 3), (2, 5, 1), (4, 5, 7), (1, 6, 4)
  ).map { case (r, c, v) => (r.toLong, c.toLong, v.toDouble) }

  def matA: GrbMatrix = GrbMatrix.fromCoo(spark, coo, GrbShape(7, 7))

  def collectM(m: GrbMatrix): Map[(Long, Long), Double] =
    m.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("CSR-bucket round trip: to_csr → from_csr == identity") {
    val back = Formats.fromCsrBuckets(Formats.toCsrBuckets(matA.df))
    assert(collectM(GrbMatrix(back, GrbShape(7, 7))) == collectM(matA))
  }

  test("CSC-bucket round trip: to_csc → from_csc == identity (matrix.py:1119)") {
    val packed = Formats.toCscBuckets(matA.df)
    assert(packed.columns.toSeq == Seq("dst", "srcs", "vals"))
    val back = Formats.fromCscBuckets(packed)
    assert(collectM(GrbMatrix(back, GrbShape(7, 7))) == collectM(matA))
  }

  test("dense round trip with missing sentinel (from_dense/to_dense)") {
    val dense = Formats.toDense(matA, fill = -1.0)
    val back = Formats.fromDense(spark, dense.map(_.toSeq).toSeq, missing = Some(-1.0))
    assert(back.isequal(matA))
  }

  test("from_dicts / to_dicts / to_coo") {
    val d = Map(0L -> Map(1L -> 2.0), 2L -> Map(0L -> 5.0))
    val m = Formats.fromDicts(spark, d, GrbShape(3, 3))
    assert(Formats.toCoo(m) == Seq((0L, 1L, 2.0), (2L, 0L, 5.0)))
    assert(Formats.toDicts(m) == d)
  }

  test("vector from_dense/to_dense/from_dict round trips; reduce allow_empty") {
    val v = Formats.fromDenseVector(spark, Seq(1.0, -9.0, 3.0, -9.0), missing = Some(-9.0))
    assert(v.nvals == 2 && v.size == 4)
    assert(Formats.toDenseVector(v, fill = -9.0).toSeq == Seq(1.0, -9.0, 3.0, -9.0))
    val v2 = Formats.fromDictVector(spark, Map(0L -> 1.0, 2L -> 3.0), 4)
    import Extras._
    assert(v.isequal(v2))
    // allow_empty=False: empty vector folds to the monoid identity
    val empty = Formats.fromDictVector(spark, Map.empty, 4)
    assert(empty.reduce(Ops.plusMonoid).isEmpty)
    assert(empty.reduceOrIdentity(Ops.plusMonoid) == 0.0)
    assert(empty.reduceOrIdentity(Ops.minMonoid) == Double.PositiveInfinity)
  }

  test("ss.sort returns (values, permutation) (core/ss/matrix.py:3983)") {
    // row 6 of A: dsts (2,3,4) values (5,7,3) → sorted asc (3,5,7),
    // permutation (4,2,3)
    val (vals, perm) = matA.sortRowwise(asc = true)
    val row6v = vals.df.filter(col("src") === 6).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val row6p = perm.df.filter(col("src") === 6).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(row6v == Map(0L -> 3.0, 1L -> 5.0, 2L -> 7.0))
    assert(row6p == Map(0L -> 4L, 1L -> 2L, 2L -> 3L))
    // vector form
    val v = Formats.fromDictVector(spark, Map(0L -> 5.0, 3L -> 1.0, 9L -> 3.0), 10)
    val (sv, sp) = v.sortValues(asc = true)
    assert(Formats.toDenseVector(sv, fill = -1.0).take(3).toSeq == Seq(1.0, 3.0, 5.0))
    assert(sp.df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 3L, 1L -> 9L, 2L -> 0L))
  }

  test("record dtype (UDT): registration, CSR round trip, generic exports") {
    import org.apache.spark.sql.types.{LongType, DoubleType, StructType}
    import spark.implicits._
    // registration path (reference dtypes.py:165 register_new)
    val rec = Types.registerRecord("PointTest",
      Seq("x" -> LongType, "y" -> DoubleType))
    assert(Types.lookup("PointTest").spark.isInstanceOf[StructType])
    assert(Types.unify(rec, rec) == rec)
    intercept[IllegalArgumentException](Types.unify(rec, Types.FP64))
    // a struct-valued matrix flows through the (schema-agnostic) format
    // kernels unchanged
    val m = GrbMatrix(Seq((0L, 1L, 2L, 0.5), (1L, 0L, 3L, 1.5))
      .toDF("src", "dst", "x", "y")
      .select(col("src"), col("dst"), struct(col("x"), col("y")).as("v")),
      GrbShape(2, 2))
    val back = GrbMatrix(
      Formats.fromCsrBuckets(Formats.toCsrBuckets(m.df)), m.shape)
    assert(back.isequal(m))
    // de-Doubled driver conveniences: Any-typed exports + element get
    val cooAny = Formats.toCooAny(m)
    assert(cooAny.map { case (i, j, _) => (i, j) } == Seq((0L, 1L), (1L, 0L)))
    assert(cooAny.head._3.asInstanceOf[org.apache.spark.sql.Row].getLong(0) == 2L)
    val dense = Formats.toDenseAny(m)
    assert(dense(0)(1) != null && dense(0)(0) == null)
    assert(m.get(1, 0).exists(_.isInstanceOf[org.apache.spark.sql.Row]))
    // numeric conveniences now accept any numeric dtype, not only FP64
    val intM = GrbMatrix(Seq((0L, 0L, 7L)).toDF("src", "dst", "v"), GrbShape(1, 1))
    assert(Formats.toDense(intM)(0)(0) == 7.0)
  }

  test("MatrixMarket round trip, incl. symmetric + pattern parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm")
    val p = s"$dir/a.mtx"
    Formats.mmwrite(matA, p)
    assert(Formats.mmread(spark, p).isequal(matA))
    val sym = s"$dir/sym.mtx"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(sym),
      "%%MatrixMarket matrix coordinate pattern symmetric\n3 3 2\n2 1\n3 2\n")
    val got = collectM(Formats.mmread(spark, sym))
    assert(got == Map((1L, 0L) -> 1.0, (0L, 1L) -> 1.0, (2L, 1L) -> 1.0, (1L, 2L) -> 1.0))
  }

  test("isequal / isclose semantics (matrix.py:373,417)") {
    assert(matA.isequal(matA))
    val perturbed = GrbMatrix(matA.df.select(col("src"), col("dst"),
      (col("v") * (1 + 1e-9)).as("v")), matA.shape)
    assert(!matA.isequal(perturbed))
    assert(matA.isclose(perturbed, relTol = 1e-7))
    assert(!matA.isclose(perturbed, relTol = 1e-12))
    // structure mismatch is never close
    val missingOne = GrbMatrix(matA.df.limit(11), matA.shape)
    assert(!matA.isclose(missingOne))
  }

  test("power by repeated squaring == chained mxm (matrix.py:2840)") {
    val p3 = matA.power(3, Ops.plusTimes)
    val chained = matA.mxm(matA, Ops.plusTimes).mxm(matA, Ops.plusTimes)
    assert(GrbMatrix(p3.df, p3.shape).isequal(GrbMatrix(chained.df, chained.shape)))
  }

  test("selectK / compactify / scanRowwise / setdiag") {
    val top2 = matA.selectK(2, largest = true)
    val want = coo.groupBy(_._1).flatMap { case (_, es) =>
      es.sortBy(e => (-e._3, e._2)).take(2)
    }.map { case (i, j, v) => (i, j) -> v }.toMap
    assert(collectM(top2) == want)

    val compacted = matA.compactify()
    assert(collectM(compacted).keys.groupBy(_._1).forall { case (_, ks) =>
      ks.map(_._2).toSeq.sorted == (0L until ks.size) })

    val scanned = collectM(matA.scanRowwise())
    assert(scanned((6L, 2L)) == 5.0 && scanned((6L, 3L)) == 12.0 && scanned((6L, 4L)) == 15.0)

    val withDiag = matA.setdiag(lit(9.0))
    val dm = collectM(withDiag)
    (0L until 7L).foreach(i => assert(dm((i, i)) == 9.0))
    assert(dm((0L, 1L)) == 2.0) // off-diagonal untouched
  }

  test("head: first n stored elements in index order (ss/vector.py:32, ss/matrix.py:44)") {
    // matrix: first 4 in (src, dst) order
    val mh = collectM(matA.head(4))
    assert(mh == coo.sortBy(e => (e._1, e._2)).take(4)
      .map { case (i, j, v) => (i, j) -> v }.toMap)
    // n >= nvals returns everything (reference short-circuits to to_coo)
    assert(collectM(matA.head(1000)) == collectM(matA))
    // vector: first 3 smallest ids
    val v = GrbVector(spark.createDataFrame(Seq(
      (9L, 1.0), (2L, 2.0), (5L, 3.0), (7L, 4.0))).toDF("id", "v"), 16)
    assert(v.head(3).df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((2L, 2.0), (5L, 3.0), (7L, 4.0)))
    // unsorted head still returns exactly n stored elements of the input
    val un = v.head(3, sort = false).df.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(un.size == 3 && un.subsetOf(
      Set((9L, 1.0), (2L, 2.0), (5L, 3.0), (7L, 4.0))))
  }

  test("flatten / reshape round trip (ss.flatten/reshape)") {
    val flat = matA.flatten()
    assert(flat.size == 49)
    val got = flat.df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == collectM(matA).map { case ((i, j), v) => (i * 7 + j) -> v })
    // reshape 7x7 -> 49x1 -> back
    val tall = matA.reshape(49, 1)
    assert(tall.shape == GrbShape(49, 1))
    assert(tall.reshape(7, 7).isequal(matA))
  }

  test("split / concat round trip (ss.split/concat)") {
    val tiles = matA.split(4, 4)
    assert(tiles.size == 4)
    val back = Extras.concat(tiles, 4, 4)
    assert(back.isequal(matA))
    assert(back.shape == GrbShape(7, 7))
  }

  test("aggregator catalog values (agg.py recipes)") {
    val v = GrbVector.fromPairs(spark, Seq((0L, 3.0), (1L, 4.0), (5L, 0.0)), 7)
    def ag(n: String) = v.aggregate(n).get
    assert(ag("sum") == 7.0)
    assert(ag("count") == 3L)
    assert(ag("count_nonzero") == 2L)
    assert(ag("count_zero") == 1L)
    assert(ag("sum_of_squares") == 25.0)
    assert(ag("hypot") == 5.0)
    assert(ag("L1norm") == 7.0)
    assert(ag("Linfnorm") == 4.0)
    assert(ag("peak_to_peak") == 4.0)
    assert(math.abs(ag("mean").asInstanceOf[Double] - 7.0 / 3) < 1e-12)
    assert(math.abs(ag("root_mean_square").asInstanceOf[Double] - math.sqrt(25.0 / 3)) < 1e-12)
    assert(ag("argmax") == 1L)  // id of max value 4.0
    assert(ag("argmin") == 5L)  // id of min value 0.0
    // band/bor monoid reductions under their aggregator names: 3&4&0 / 3|4|0
    assert(ag("bitwise_all") == 0L)
    assert(ag("bitwise_any") == 7L)
    assert(ag("first_index") == 0L && ag("last_index") == 5L)
  }
}
