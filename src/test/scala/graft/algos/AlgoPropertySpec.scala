package graft.algos

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
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
}
