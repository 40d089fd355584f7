package graft.core

import org.scalacheck.{Gen, Properties, Prop, Test}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** ScalaCheck properties on tiny random COO matrices (SURVEY.md §5):
  * distributed kernels vs naive driver-side algebra. */
object KernelPropertySpec extends Properties("Kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  val genCoo: Gen[Map[(Long, Long), Double]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 5L); j <- Gen.chooseNum(0L, 5L)
      v <- Gen.chooseNum(-4, 4)
    } yield ((i, j), v.toDouble))

  def toM(m: Map[(Long, Long), Double]): GrbMatrix =
    GrbMatrix.fromCoo(spark, m.toSeq.map { case ((i, j), v) => (i, j, v) }, GrbShape(6, 6))

  def collect(m: GrbMatrix): Map[(Long, Long), Double] =
    m.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  property("mxm plus_times == naive sparse product") = forAll(genCoo, genCoo) { (a, b) =>
    val want = (for {
      i <- 0L until 6L; j <- 0L until 6L
      terms = (0L until 6L).flatMap(k =>
        for { x <- a.get((i, k)); y <- b.get((k, j)) } yield x * y)
      if terms.nonEmpty
    } yield (i, j) -> terms.sum).toMap
    collect(toM(a).mxm(toM(b), Ops.plusTimes)) == want
  }

  property("ewise_add plus commutative; structure = union") = forAll(genCoo, genCoo) { (a, b) =>
    val ab = collect(toM(a).ewiseAdd(toM(b), Ops.plus))
    val ba = collect(toM(b).ewiseAdd(toM(a), Ops.plus))
    ab == ba && ab.keySet == (a.keySet ++ b.keySet)
  }

  property("ewise_mult structure = intersection") = forAll(genCoo, genCoo) { (a, b) =>
    collect(toM(a).ewiseMult(toM(b), Ops.times)).keySet ==
      (a.keySet intersect b.keySet)
  }

  property("mask semi+anti partitions the input") = forAll(genCoo, genCoo) { (a, b) =>
    val m = toM(b).structureMask()
    val inside = collect(GrbMatrix(
      Kernels.maskFilter(toM(a).df, m, Seq("src", "dst")), GrbShape(6, 6)))
    val outside = collect(GrbMatrix(
      Kernels.maskFilter(toM(a).df, GrbMask(m.keys, complement = true),
        Seq("src", "dst")), GrbShape(6, 6)))
    inside.keySet.intersect(outside.keySet).isEmpty && (inside ++ outside) == a
  }

  property("assign(no accum) replaces the region; accum=plus merges it") =
    forAll(genCoo, genCoo) { (a, b0) =>
      // map b into the region rows {0,2,4} × cols {1,3,5}
      val rowT = Map(0L -> 0L, 1L -> 2L, 2L -> 4L)
      val colT = Map(0L -> 1L, 1L -> 3L, 2L -> 5L)
      val b = b0.collect { case ((i, j), v) if i < 3 && j < 3 => (i, j) -> v }
      import spark.implicits._
      val rm = rowT.toSeq.toDF("idx", "target")
      val cm = colT.toSeq.toDF("idx", "target")
      val bm = GrbMatrix.fromCoo(spark,
        b.toSeq.map { case ((i, j), v) => (i, j, v) }, GrbShape(3, 3))
      val mapped = b.map { case ((i, j), v) => (rowT(i), colT(j)) -> v }
      val region = for (r <- rowT.values; c <- colT.values) yield (r, c)
      val wantReplace = a.view.filterKeys(!region.toSet.contains(_)).toMap ++ mapped
      val wantAccum = a ++ mapped.map { case (k, v) => k -> (a.getOrElse(k, 0.0) + v) }
      collect(toM(a).assign(rm, cm, bm)) == wantReplace &&
        collect(toM(a).assign(rm, cm, bm, accum = Some(Ops.plus))) == wantAccum
    }

  property("Vector.diag(k).diag(k) round-trips for any k in [-6, 6]") =
    forAll(Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 5L); v <- Gen.chooseNum(-4, 4)
    } yield (i, v.toDouble)), Gen.chooseNum(-6L, 6L)) { (m, k) =>
      val v = GrbVector.fromPairs(spark, m.toSeq, 6)
      v.diag(k).diag(k).df.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap == m
    }

  property("frexpe/frexpx: exact reconstruction with |m| in [0.5,1)") = {
    import org.apache.spark.sql.functions.lit
    // exercise the full double range incl. subnormals and near-power-of-2
    val genD = Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6).suchThat(_ != 0.0),
      Gen.chooseNum(-300, 300).map(e => math.pow(2.0, e)),
      Gen.chooseNum(1, 52).map(b => java.lang.Double.MIN_VALUE * (1L << b)))
    forAll(genD) { x =>
      val r = spark.range(1).select(
        Ops.unaries("frexpx")(lit(x)).as("m"),
        Ops.unaries("frexpe")(lit(x)).as("e")).collect()(0)
      val (m, e) = (r.getDouble(0), r.getLong(1))
      math.abs(m) >= 0.5 && math.abs(m) < 1.0 && Math.scalb(m, e.toInt) == x
    }
  }

  property("extract-of-assign returns the assigned block") =
    forAll(genCoo) { b0 =>
      import spark.implicits._
      val b = b0.collect { case ((i, j), v) if i < 3 && j < 3 => (i, j) -> v }
      val rm = Seq((0L, 0L), (1L, 2L), (2L, 4L)).toDF("idx", "target")
      val cm = Seq((0L, 1L), (1L, 3L), (2L, 5L)).toDF("idx", "target")
      val bm = GrbMatrix.fromCoo(spark,
        b.toSeq.map { case ((i, j), v) => (i, j, v) }, GrbShape(3, 3))
      val empty = GrbMatrix.fromCoo(spark, Seq.empty, GrbShape(6, 6))
      val assigned = empty.assign(rm, cm, bm)
      // extract with the inverse maps (old → new) recovers b exactly
      val rInv = Seq((0L, 0L), (2L, 1L), (4L, 2L)).toDF("old", "new")
      val cInv = Seq((1L, 0L), (3L, 1L), (5L, 2L)).toDF("old", "new")
      collect(assigned.extract(rInv, cInv, GrbShape(3, 3), smallMaps = true)) == b
    }

  property("Boruvka full drain == driver Kruskal under the (w, lo, hi) order") =
    // generate i < j directly (dependent choose) — a `if i != j` filter here
    // compounds across Gen.mapOf's elements and exhausts ScalaCheck's
    // discard budget on large maps (observed: "gave up after 7 passed")
    forAll(Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 8L); j <- Gen.chooseNum(i + 1, 9L)
      w <- Gen.chooseNum(1L, 4L) // small range forces repeated weights
    } yield ((i, j), w))) { und0 =>
      import spark.implicits._
      val und = und0.toSeq.map { case ((a, b), w) => (a, b, w) }
      und.isEmpty || {
        val sym = (und ++ und.map(t => (t._2, t._1, t._3))).toDF("src", "dst", "w")
        val got = graft.algos.Boruvka.run(spark, sym, 3, maxRounds = 8)
          .forest.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val parent = scala.collection.mutable.Map(
          (0L to 9L).map(i => i -> i): _*)
        def find(x: Long): Long =
          if (parent(x) == x) x
          else { parent(x) = find(parent(x)); parent(x) }
        val want = scala.collection.mutable.Set.empty[(Long, Long, Long)]
        und.sortBy(t => (t._3, t._1, t._2)).foreach { case (a, b, w) =>
          if (find(a) != find(b)) { parent(find(a)) = find(b); want += ((a, b, w)) }
        }
        got == want.toSet
      }
    }

  property("maximal matching: endpoint-disjoint and maximal on random graphs") =
    forAll(Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 8L); j <- Gen.chooseNum(i + 1, 9L)
    } yield ((i, j), ()))) { und0 =>
      import spark.implicits._
      val und = und0.keys.toSeq
      und.isEmpty || {
        val sym = (und ++ und.map(e => (e._2, e._1))).toDF("src", "dst")
        val got = graft.algos.Matching.run(spark, sym, 3, maxRounds = 32)
          .matching.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val eps = got.toSeq.flatMap(e => Seq(e._1, e._2))
        val epSet = eps.toSet
        // disjoint (no endpoint repeats) AND maximal (every live edge blocked)
        eps.distinct.size == eps.size &&
          und.forall { case (u, v) => got((u, v)) || epSet(u) || epSet(v) }
      }
    }

  property("KTruss(k=3) fixpoint == driver peel on random graphs") =
    forAll(Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 8L); j <- Gen.chooseNum(i + 1, 9L)
    } yield ((i, j), ()))) { und0 =>
      import spark.implicits._
      val und = und0.keys.toSeq
      und.isEmpty || {
        val sym = (und ++ und.map(e => (e._2, e._1))).toDF("src", "dst")
        val got = graft.algos.KTruss.run(spark, sym, 3, 3, maxRounds = 32)
          .truss.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        // driver peel: keep edges on >= k-2 = 1 triangle, to fixpoint
        var edges = und.toSet
        var stable = false
        var sup = Map.empty[(Long, Long), Int]
        while (!stable) {
          val nbr = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
            .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
          sup = edges.iterator.map { case (u, v) =>
            (u, v) -> (nbr(u) & nbr(v)).size
          }.toMap
          val kept = edges.filter(e => sup(e) >= 1)
          stable = kept == edges
          edges = kept
        }
        val want = edges.flatMap { case (u, v) =>
          Seq((u, v) -> sup((u, v)).toLong, (v, u) -> sup((u, v)).toLong)
        }.toMap
        got == want
      }
    }

  property("triangle centrality of a clique is 1 everywhere") =
    forAll(Gen.chooseNum(3, 6)) { n =>
      import spark.implicits._
      val es = for { u <- 0 until n; v <- 0 until n if u != v }
        yield (u.toLong, v.toLong)
      val got = graft.algos.TriangleCentrality.run(es.toDF("src", "dst"), 3)
        .collect().map(_.getDouble(1))
      got.length == n && got.forall(_ == 1.0)
    }

  /** naive sparse plus_times product on the driver (the mxm property's
    * oracle, factored for reuse by the power property) */
  private def naiveProduct(a: Map[(Long, Long), Double],
                           b: Map[(Long, Long), Double]): Map[(Long, Long), Double] =
    (for {
      i <- 0L until 6L; j <- 0L until 6L
      terms = (0L until 6L).flatMap(k =>
        for { x <- a.get((i, k)); y <- b.get((k, j)) } yield x * y)
      if terms.nonEmpty
    } yield (i, j) -> terms.sum).toMap

  property("power(n) == n-fold naive plus_times product; power(0) = I") =
    forAll(genCoo, Gen.chooseNum(0, 3)) { (a, n) =>
      import Extras._
      val want =
        if (n == 0) (0L until 6L).map(i => (i, i) -> 1.0).toMap
        else (1 until n).foldLeft(a)((acc, _) => naiveProduct(acc, a))
      collect(toM(a).power(n, Ops.plusTimes)) == want
    }

  property("kronecker(times) == driver block-index arithmetic") =
    forAll(genCoo, genCoo) { (a, b) =>
      val want = (for {
        ((i1, j1), v1) <- a.toSeq; ((i2, j2), v2) <- b.toSeq
      } yield ((i1 * 6 + i2, j1 * 6 + j2), v1 * v2)).toMap
      val k = toM(a).kronecker(toM(b), Ops.times)
      collect(k) == want && k.shape == GrbShape(36, 36)
    }

  property("selectK(2, largest) == driver per-row top-2 with (v desc, dst) ties") =
    forAll(genCoo) { a =>
      import Extras._
      val want = a.toSeq.groupBy(_._1._1).flatMap { case (_, row) =>
        row.sortBy { case ((_, j), v) => (-v, j) }.take(2)
      }
      collect(toM(a).selectK(2, largest = true)) == want.toMap
    }

  property("sortRowwise == driver (values, permutation) pair") =
    forAll(genCoo) { a =>
      import Extras._
      val (vals, perm) = toM(a).sortRowwise(asc = true)
      val want = a.toSeq.groupBy(_._1._1).toSeq.flatMap { case (i, row) =>
        row.sortBy { case ((_, j), v) => (v, j) }.zipWithIndex.map {
          case (((_, j), v), p) => ((i, p.toLong), v, j) }
      }
      // the permutation matrix carries LONG source indices, not doubles
      val permGot = perm.df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      collect(vals) == want.map { case (k, v, _) => k -> v }.toMap &&
        permGot == want.map { case (k, _, j) => k -> j }.toMap
    }

  property("compactify == driver dense squeeze keeping dst order") =
    forAll(genCoo) { a =>
      import Extras._
      val want = a.toSeq.groupBy(_._1._1).flatMap { case (i, row) =>
        row.sortBy(_._1._2).zipWithIndex.map {
          case ((_, v), p) => (i, p.toLong) -> v }
      }
      collect(toM(a).compactify()) == want.toMap
    }

  property("scanRowwise(sum) == driver running prefix sums in dst order") =
    forAll(genCoo) { a =>
      import Extras._
      val want = a.toSeq.groupBy(_._1._1).flatMap { case (_, row) =>
        val sorted = row.sortBy(_._1._2)
        sorted.zip(sorted.scanLeft(0.0)(_ + _._2).tail)
          .map { case (((ij, _)), s) => ij -> s }
      }
      collect(toM(a).scanRowwise()) == want.toMap
    }

  property("reduce row/col/scalar (plus) == driver sums; transpose swaps") =
    forAll(genCoo) { a =>
      val m = toM(a)
      val rows = m.reduceRowwise(Ops.plusMonoid).df.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val cols = m.reduceColumnwise(Ops.plusMonoid).df.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val sc = m.reduceScalar(Ops.plusMonoid).map(_.asInstanceOf[Double])
      val wantRows = a.toSeq.groupBy(_._1._1)
        .map { case (i, g) => i -> g.map(_._2).sum }
      val wantCols = a.toSeq.groupBy(_._1._2)
        .map { case (j, g) => j -> g.map(_._2).sum }
      val wantSc = if (a.isEmpty) None else Some(a.values.sum)
      val t = collect(m.transpose)
      rows == wantRows && cols == wantCols &&
        ((sc, wantSc) match {
          case (None, None) => true
          case (Some(x), Some(y)) => math.abs(x - y) <= 1e-12
          case _ => false
        }) &&
        t == a.map { case ((i, j), v) => ((j, i), v) }
    }

  /** The write clause `C(mask, accum, replace) << T` over every
    * (complement × replace × accum ∈ {none, plus, minus}) combination —
    * 12 combos per random (C, T, mask) draw — against a driver-side Map
    * simulation of the reference spec (`fundamentals.rst:14-38`,
    * `base.py:338-514`): Z = accum ? C ⊕_op T : T (overlaps combined
    * old-op-new, singletons pass through); result = Z inside the write
    * region, old C outside it unless replace. `minus` is in the accum set
    * deliberately — it is non-commutative, so a swapped ewiseAddDF
    * argument order (T ⊕ C) fails the guard where plus cannot. */
  property("write clause: 12 (complement × replace × accum) combos == driver spec") = {
    import spark.implicits._
    val genVec: Gen[Map[Long, Double]] =
      Gen.mapOf(for {
        i <- Gen.chooseNum(0L, 7L); v <- Gen.chooseNum(-4, 4)
      } yield (i, v.toDouble))
    val genKeys: Gen[Set[Long]] = Gen.containerOf[Set, Long](Gen.chooseNum(0L, 7L))
    def df(m: Map[Long, Double]) = m.toSeq.toDF("id", "v")
    forAll(genVec, genVec, genKeys) { (c, t, mk) =>
      val accums: Seq[(Option[BinaryOp], Option[(Double, Double) => Double])] =
        Seq((None, None),
          (Some(Ops.plus), Some((x: Double, y: Double) => x + y)),
          (Some(Ops.minus), Some((x: Double, y: Double) => x - y)))
      (for {
        complement <- Seq(false, true)
        replace <- Seq(false, true)
        (accum, accumF) <- accums
      } yield {
        val z: Map[Long, Double] = accumF match {
          case None => t
          case Some(f) =>
            (c.keySet ++ t.keySet).map { k =>
              k -> ((c.get(k), t.get(k)) match {
                case (Some(x), Some(y)) => f(x, y)
                case (Some(x), None)    => x
                case (None, Some(y))    => y
                case _                  => 0.0 // unreachable: k drawn from the union
              })
            }.toMap
        }
        val region: Long => Boolean =
          if (complement) k => !mk.contains(k) else mk.contains
        val want = z.filter { case (k, _) => region(k) } ++
          (if (replace) Map.empty[Long, Double]
           else c.filter { case (k, _) => !region(k) })
        val got = Kernels.write(df(c), df(t), Seq("id"),
            Some(GrbMask(mk.toSeq.map(Tuple1(_)).toDF("id"), complement)),
            accum, replace)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        got == want
      }).forall(identity)
    }
  }
}
