package graft.algos

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** ScalaCheck guards for the two heaviest directed-graph operators: the
  * distributed trim+color+mark SCC and the bow-tie decomposition built on
  * it, each checked against a driver-side transitive-closure simulation on
  * random digraphs (same convention as the k-truss / Borůvka / matching
  * properties in KernelPropertySpec: tiny vertex universe, exhaustible on
  * the driver, distributed result must match EXACTLY). */
object AlgoPropertySpec extends Properties("AlgoProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  // random directed edge sets over a 7-vertex universe; self-loops kept
  // (a self-loop survives trim on both sides and must still resolve to a
  // singleton SCC through the color+mark rounds)
  val genEdges: Gen[Set[(Long, Long)]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 6L); j <- Gen.chooseNum(0L, 6L)
    } yield ((i, j), ())).map(_.keySet)

  /** reachability closure by saturation: (a, b) ∈ result iff a →+ b */
  private def closure(es: Set[(Long, Long)]): Set[(Long, Long)] = {
    var r = es
    var grown = true
    while (grown) {
      val next = r ++ (for ((a, b) <- r; (c, d) <- r if b == c) yield (a, d))
      grown = next.size != r.size
      r = next
    }
    r
  }

  /** u ~ v iff mutual reachability (or u = v); component id = min member —
    * the id convention SCC.run documents */
  private def driverScc(vs: Seq[Long],
                        reach: Set[(Long, Long)]): Map[Long, Long] =
    vs.map { v =>
      val cls = vs.filter(u => u == v || (reach((v, u)) && reach((u, v))))
      v -> cls.min
    }.toMap

  property("SCC == driver mutual-reachability components on random digraphs") =
    forAll(genEdges) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val vs = (es.map(_._1) ++ es.map(_._2)).toSeq.distinct.sorted
        val want = driverScc(vs, closure(es))
        val got = SCC.run(spark, es.toSeq.toDF("src", "dst"),
            numPartitions = 4).components
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want
      }
    }

  // undirected (symmetric, loop-free) edge sets over the same universe —
  // built without a generator filter (a `if i != j` guard discards, and a
  // run with an unlucky discard streak trips ScalaCheck's give-up ratio)
  val genUndirected: Gen[Set[(Long, Long)]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 6L); j0 <- Gen.chooseNum(0L, 5L)
      j = if (j0 >= i) j0 + 1 else j0
    } yield ((math.min(i, j), math.max(i, j)), ())).map(_.keySet)

  private def sym(es: Set[(Long, Long)]): Seq[(Long, Long)] =
    (es ++ es.map { case (a, b) => (b, a) }).toSeq

  property("FastSV CC == driver union-find over range(n) incl. isolated ids") =
    forAll(genUndirected) { es =>
      import spark.implicits._
      val n = 7L
      // driver union-find, component id = min member (the FastSV convention)
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n.toInt).map(v => v.toLong -> find(v).toLong).toMap
      val edgesDf =
        if (es.isEmpty) spark.range(0).select(col("id").as("src"), col("id").as("dst"))
        else sym(es).toDF("src", "dst")
      val got = ConnectedComponents.run(spark, edgesDf, n, numPartitions = 4)
        .components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }

  property("k-core(k=2) == driver peel: same vertex set, same in-core degrees") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        // driver peel on the simple undirected graph
        var live = es
        var stable = false
        while (!stable) {
          val deg = live.toSeq.flatMap { case (a, b) => Seq(a, b) }
            .groupBy(identity).map { case (v, g) => (v, g.size) }
          val keep = deg.filter(_._2 >= 2).keySet
          val next = live.filter { case (a, b) => keep(a) && keep(b) }
          stable = next == live
          live = next
        }
        val want = live.toSeq.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
        val got = KCore.run(spark, sym(es).toDF("src", "dst"), k = 2,
            numPartitions = 4).core
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want.toMap
      }
    }

  property("MIS is independent and maximal on random graphs") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val res = MIS.run(spark, sym(es).toDF("src", "dst"), numPartitions = 4)
        val got = res.mis.collect().map(_.getLong(0)).toSet
        res.release()
        val vs = es.flatMap { case (a, b) => Seq(a, b) }
        val adj = (v: Long) => es.collect {
          case (a, b) if a == v => b
          case (a, b) if b == v => a
        }
        val independent = !es.exists { case (a, b) => got(a) && got(b) }
        val maximal = vs.forall(v => got(v) || adj(v).exists(got))
        independent && maximal
      }
    }

  property("Jones-Plassmann coloring is proper and total on random graphs") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val got = Coloring.run(spark, sym(es).toDF("src", "dst"),
            numPartitions = 4).colors
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val vs = es.flatMap { case (a, b) => Seq(a, b) }
        val total = vs.forall(got.contains)
        val proper = !es.exists { case (a, b) => got.get(a) == got.get(b) }
        total && proper
      }
    }

  property("BFS levels == driver frontier expansion from source 0") =
    forAll(genEdges) { es =>
      import spark.implicits._
      // driver BFS over the directed edge list; source 0 always level 0,
      // present even when absent from the edge set (the engine's contract)
      var want = Map(0L -> 0L)
      var frontier = Set(0L)
      var depth = 0L
      while (frontier.nonEmpty) {
        depth += 1
        frontier = es.collect {
          case (a, b) if frontier(a) && !want.contains(b) => b
        }
        want ++= frontier.map(_ -> depth)
      }
      val edgesDf =
        if (es.isEmpty) spark.range(0).select(col("id").as("src"), col("id").as("dst"))
        else es.toSeq.toDF("src", "dst")
      val got = BFS.levels(spark, edgesDf, source = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }

  // weighted directed edges: integer weights 1..5 (exact in FP, so the
  // distributed min_plus relaxation must equal the driver Bellman–Ford
  // bit-for-bit)
  val genWeighted: Gen[Map[(Long, Long), Double]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 6L); j <- Gen.chooseNum(0L, 6L)
      w <- Gen.chooseNum(1, 5)
    } yield ((i, j), w.toDouble))

  property("SSSP min_plus == driver Bellman-Ford on random weighted digraphs") =
    forAll(genWeighted) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val vs = es.keySet.flatMap { case (a, b) => Seq(a, b) }
        var want = Map(0L -> 0.0)
        var changed = true
        while (changed) {
          changed = false
          es.foreach { case ((a, b), w) =>
            want.get(a).foreach { da =>
              if (want.get(b).forall(_ > da + w)) { want += b -> (da + w); changed = true }
            }
          }
        }
        val got = SSSP.run(spark,
            es.toSeq.map { case ((a, b), w) => (a, b, w) }.toDF("src", "dst", "w"),
            source = 0L, numPartitions = 4)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        got == want
      }
    }

  property("mode-LPA(3 rounds) == driver synchronous simulation") =
    forAll(genUndirected) { es =>
      import spark.implicits._
      val n = 7L
      // driver sync LPA: adopt the most frequent neighbor label, ties to
      // the smallest label, keep own label when isolated
      val nbrs = (0L until n).map(v => v -> es.collect {
        case (a, b) if a == v => b
        case (a, b) if b == v => a
      }).toMap
      var lbl = (0L until n).map(v => v -> v).toMap
      for (_ <- 1 to 3) {
        lbl = (0L until n).map { v =>
          val votes = nbrs(v).toSeq.map(lbl).groupBy(identity)
            .map { case (l, g) => (l, g.size) }
          v -> (if (votes.isEmpty) lbl(v)
                else votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1)
        }.toMap
      }
      val edgesDf =
        if (es.isEmpty) spark.range(0).select(col("id").as("src"), col("id").as("dst"))
        else sym(es).toDF("src", "dst")
      val got = LabelPropagation.run(spark, edgesDf, n, numPartitions = 4,
          maxIter = 3).labels
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == lbl
    }

  property("Betweenness(all sources) == driver Brandes to 1e-9") =
    forAll(genEdges) { es0 =>
      val es = es0.filter { case (a, b) => a != b } // self-loops never lie on a shortest path
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val vs = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.distinct.sorted
        val out = (v: Long) => es.collect { case (a, b) if a == v => b }
        val bc = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
        vs.foreach { s =>
          // forward BFS with path counts
          val dist = scala.collection.mutable.Map(s -> 0L)
          val sigma = scala.collection.mutable.Map(s -> 1.0).withDefaultValue(0.0)
          var order = Vector(s)
          var frontier = Set(s)
          var d = 0L
          while (frontier.nonEmpty) {
            d += 1
            val next = scala.collection.mutable.Set.empty[Long]
            frontier.foreach { v =>
              out(v).foreach { w =>
                if (!dist.contains(w)) next += w
              }
            }
            next.foreach { w => dist(w) = d; order :+= w }
            frontier.foreach { v =>
              out(v).foreach { w => if (dist(w) == d) sigma(w) += sigma(v) }
            }
            frontier = next.toSet
          }
          // backward δ sweep in reverse BFS order
          val delta = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
          order.reverse.foreach { w =>
            es.foreach { case (v, ww) =>
              if (ww == w && dist.contains(v) && dist(v) + 1 == dist(w))
                delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
            }
          }
          vs.foreach { v => if (v != s) bc(v) += delta(v) }
        }
        val want = bc.toMap.filter(_._2 > 0.0)
        val got = Betweenness.run(spark, es.toSeq.toDF("src", "dst"), sources = vs)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        got.keySet == want.keySet &&
          want.forall { case (v, x) => math.abs(got(v) - x) <= 1e-9 }
      }
    }

  property("PageRank(10 iters) == driver recurrence to 1e-12 on random digraphs") =
    forAll(genEdges) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val n = 7L
        val damping = 0.85
        val teleport = (1.0 - damping) / n
        // driver simulation of the engine's exact pagerank_3f recurrence:
        // dense teleport completion, contributions v*damping/deg along
        // out-edges, NO sink redistribution (sinks drop their mass)
        val deg = es.toSeq.groupBy(_._1).map { case (v, g) => (v, g.size) }
        var r = (0L until n).map(v => v -> 1.0 / n).toMap
        for (_ <- 1 to 10) {
          val gathered = es.toSeq
            .map { case (u, v) => v -> r(u) * damping / deg(u) }
            .groupBy(_._1).map { case (v, g) => (v, g.map(_._2).sum) }
          r = (0L until n).map(v => v -> (teleport + gathered.getOrElse(v, 0.0))).toMap
        }
        val adj = graft.graph.Adjacency.build(es.toSeq.toDF("src", "dst"),
          numVertices = n, numPartitions = 4)
        val got = PageRank.run(spark, adj, damping = damping, tol = 0.0,
            maxIter = 10).scores
          .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
        adj.unpersist()
        got.keySet == r.keySet &&
          r.forall { case (v, x) => math.abs(got(v) - x) <= 1e-12 }
      }
    }

  property("Eigenvector(4 iters) == driver power iteration on (I + At) to 1e-12") =
    forAll(genEdges) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val n = 7
        // driver simulation of the engine's exact recurrence: x ← x + Aᵀx
        // unnormalized, one L2 division at the very end
        var x = Array.fill(n)(1.0 / n)
        for (_ <- 1 to 4) {
          val nx = x.clone()
          es.foreach { case (u, v) => nx(v.toInt) += x(u.toInt) }
          x = nx
        }
        val norm = math.sqrt(x.map(a => a * a).sum)
        val want = x.map(_ / norm)
        val adj = graft.graph.Adjacency.build(es.toSeq.toDF("src", "dst"),
          numVertices = n.toLong, numPartitions = 4)
        val got = Eigenvector.run(spark, adj, maxIter = 4).scores
          .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
        adj.unpersist()
        got.keySet == (0L until n).toSet &&
          (0 until n).forall(v => math.abs(got(v.toLong) - want(v)) <= 1e-12)
      }
    }

  property("Katz(6 iters, a=0.25, b=1) == driver recurrence to 1e-12") =
    forAll(genEdges) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val n = 7
        val alpha = 0.25
        // driver simulation: v ← β + α·Σ_{u→v} v(u), dense β completion
        var x = Array.fill(n)(1.0)
        for (_ <- 1 to 6) {
          val nx = Array.fill(n)(1.0)
          es.foreach { case (u, v) => nx(v.toInt) += alpha * x(u.toInt) }
          x = nx
        }
        val adj = graft.graph.Adjacency.build(es.toSeq.toDF("src", "dst"),
          numVertices = n.toLong, numPartitions = 4)
        val got = Katz.run(spark, adj, alpha = alpha, beta = 1.0, tol = 0.0,
            maxIter = 6).scores
          .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
        adj.unpersist()
        got.keySet == (0L until n).toSet &&
          (0 until n).forall(v => math.abs(got(v.toLong) - x(v)) <= 1e-12)
      }
    }

  property("HITS(3 iters) == driver sim; hubs iff out-edges, auths iff in-edges") =
    forAll(genEdges) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val n = 7
        // dense driver sim of the per-round L2-normalized hub/authority
        // recurrence (zeros stand in for the engine's structural absences)
        var h = Array.fill(n)(1.0 / math.sqrt(n.toDouble))
        var a = Array.fill(n)(0.0)
        for (_ <- 1 to 3) {
          a = Array.fill(n)(0.0)
          es.foreach { case (u, v) => a(v.toInt) += h(u.toInt) }
          val an = math.sqrt(a.map(z => z * z).sum)
          a = a.map(_ / an)
          h = Array.fill(n)(0.0)
          es.foreach { case (u, v) => h(u.toInt) += a(v.toInt) }
          val hn = math.sqrt(h.map(z => z * z).sum)
          h = h.map(_ / hn)
        }
        val e = es.toSeq.toDF("src", "dst")
        val adjOut = graft.graph.Adjacency.build(e, n.toLong, 4)
        val adjIn = graft.graph.Adjacency.build(
          e.select(col("dst").as("src"), col("src").as("dst")), n.toLong, 4)
        val rows = HITS.run(spark, adjOut, adjIn, maxIter = 3).scores
          .collect().map(r => (r.getLong(0),
            Option(r.get(1)).map(_.asInstanceOf[Double]),
            Option(r.get(2)).map(_.asInstanceOf[Double]))).toList
        adjOut.unpersist(); adjIn.unpersist()
        val hubs = rows.collect { case (id, Some(x), _) => id -> x }.toMap
        val auths = rows.collect { case (id, _, Some(x)) => id -> x }.toMap
        val outV = es.map(_._1)
        val inV = es.map(_._2)
        hubs.keySet == outV && auths.keySet == inV &&
          hubs.forall { case (v, x) => math.abs(x - h(v.toInt)) <= 1e-12 } &&
          auths.forall { case (v, x) => math.abs(x - a(v.toInt)) <= 1e-12 }
      }
    }

  property("BowTie == driver core/in/out/other classification") =
    forAll(genEdges) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val vs = (es.map(_._1) ++ es.map(_._2)).toSeq.distinct.sorted
        val reach = closure(es)
        val scc = driverScc(vs, reach)
        // giant SCC, ties to the smaller scc id — BowTie.run's tie-break
        val coreId = scc.values.groupBy(identity)
          .map { case (id, g) => (id, g.size) }
          .toSeq.sortBy { case (id, n) => (-n, id) }.head._1
        val core = vs.filter(v => scc(v) == coreId).toSet
        val want = vs.map { v =>
          v -> (if (core(v)) "core"
                else if (core.exists(c => reach((v, c)))) "in"
                else if (core.exists(c => reach((c, v)))) "out"
                else "other")
        }.toMap
        val got = BowTie.run(spark, es.toSeq.toDF("src", "dst"),
            numPartitions = 4).classes
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        got == want
      }
    }

  /** BFS distances from one source over the directed edge set */
  private def dists(es: Set[(Long, Long)], s: Long): Map[Long, Long] = {
    var d = Map(s -> 0L)
    var frontier = Set(s)
    var depth = 0L
    while (frontier.nonEmpty) {
      depth += 1
      frontier = es.collect {
        case (a, b) if frontier(a) && !d.contains(b) => b
      }
      d ++= frontier.map(_ -> depth)
    }
    d
  }

  property("MSBFS harmonic(all sources) == driver sum of inverse distances") =
    forAll(genEdges) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val srcs = 0L until 7L
        val all = srcs.map(s => s -> dists(es, s)).toMap
        val want = (0L until 7L).flatMap { v =>
          val terms = srcs.flatMap(s => all(s).get(v).filter(_ > 0))
          if (terms.isEmpty) None else Some(v -> terms.map(1.0 / _).sum)
        }.toMap
        val got = MSBFS.harmonic(spark, es.toSeq.toDF("src", "dst"), srcs)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        got.keySet == want.keySet &&
          want.forall { case (v, x) => math.abs(got(v) - x) <= 1e-12 }
      }
    }

  property("MSBFS eccentricity(all sources) == driver max BFS level") =
    forAll(genEdges) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val srcs = 0L until 7L
        val want = srcs.map(s => s -> dists(es, s).values.max).toMap
        val got = MSBFS.eccentricity(spark, es.toSeq.toDF("src", "dst"), srcs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want
      }
    }

  property("PersonalizedPageRank(8 iters, seeds {0,3}) == driver recurrence to 1e-12") =
    forAll(genEdges) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val n = 7L
        val damping = 0.85
        val seeds = Set(0L, 3L)
        val tp = (v: Long) => if (seeds(v)) (1.0 - damping) / 2 else 0.0
        val deg = es.toSeq.groupBy(_._1).map { case (v, g) => (v, g.size) }
        var r = (0L until n).map(v => v -> (if (seeds(v)) 0.5 else 0.0)).toMap
        for (_ <- 1 to 8) {
          val gathered = es.toSeq
            .map { case (u, v) => v -> r(u) * damping / deg(u) }
            .groupBy(_._1).map { case (v, g) => (v, g.map(_._2).sum) }
          r = (0L until n).map(v => v -> (tp(v) + gathered.getOrElse(v, 0.0))).toMap
        }
        val adj = graft.graph.Adjacency.build(es.toSeq.toDF("src", "dst"),
          numVertices = n, numPartitions = 4)
        val got = PersonalizedPageRank.run(spark, adj,
            Seq(0L, 3L).toDF("id"), damping = damping, tol = 0.0,
            maxIter = 8).scores
          .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
        adj.unpersist()
        got.keySet == r.keySet &&
          r.forall { case (v, x) => math.abs(got(v) - x) <= 1e-12 }
      }
    }

  property("AdamicAdar == driver common-neighbor inverse-log sum, non-adjacent pairs only") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val nb = sym(es).groupBy(_._1).map { case (v, g) => (v, g.map(_._2).toSet) }
        val deg = nb.map { case (v, s) => (v, s.size) }
        val vs = nb.keySet.toSeq.sorted
        val want = (for {
          u <- vs; v <- vs if u < v && !es((u, v))
          cn = nb(u) intersect nb(v) if cn.nonEmpty
        } yield ((u, v), cn.toSeq.map(w => 1.0 / math.log(deg(w).toDouble)).sum)).toMap
        val got = LinkPrediction.adamicAdar(sym(es).toDF("src", "dst"))
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        got.keySet == want.keySet &&
          want.forall { case (p, x) => math.abs(got(p) - x) <= 1e-12 }
      }
    }

  property("Jaccard link prediction == driver cn / (du + dv - cn)") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val nb = sym(es).groupBy(_._1).map { case (v, g) => (v, g.map(_._2).toSet) }
        val deg = nb.map { case (v, s) => (v, s.size.toLong) }
        val vs = nb.keySet.toSeq.sorted
        val want = (for {
          u <- vs; v <- vs if u < v && !es((u, v))
          cn = (nb(u) intersect nb(v)).size.toLong if cn > 0
        } yield ((u, v), cn.toDouble / (deg(u) + deg(v) - cn))).toMap
        val got = LinkPrediction.jaccard(sym(es).toDF("src", "dst"))
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        got.keySet == want.keySet &&
          want.forall { case (p, x) => math.abs(got(p) - x) <= 1e-12 }
      }
    }

  property("TriangleCentrality == driver (3 at - 2 tt + t) / 3 tg formula") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val nb = sym(es).groupBy(_._1).map { case (v, g) => (v, g.map(_._2).toSet) }
        val tris = for {
          (a, b) <- es; (b2, c) <- es if b2 == b && es((a, c))
        } yield (a, b, c)
        val t = nb.keys.map { v =>
          v -> tris.count { case (a, b, c) => a == v || b == v || c == v }.toLong
        }.toMap
        val triEdges: Set[(Long, Long)] = tris.flatMap { case (a, b, c) =>
          Seq((a, b), (b, a), (a, c), (c, a), (b, c), (c, b)) }
        val tg = tris.size.toLong
        val want = nb.map { case (v, nv) =>
          val at = nv.toSeq.map(t).sum
          val tt = triEdges.toSeq.collect { case (u, v2) if v2 == v => t(u) }.sum
          (v, if (tg == 0) 0.0
              else {
                val num = (3 * at - 2 * tt + t(v)).toDouble
                java.math.BigDecimal.valueOf(num / (3.0 * tg))
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              })
        }
        val got = TriangleCentrality.run(sym(es).toDF("src", "dst"),
            numPartitions = 4)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        got.keySet == want.keySet &&
          want.forall { case (v, x) => math.abs(got(v) - x) <= 1e-9 }
      }
    }
}
