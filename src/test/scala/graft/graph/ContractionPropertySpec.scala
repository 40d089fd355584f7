package graft.graph

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** ScalaCheck guards for quotient-graph contraction: the join-based
  * `contract` and the projection-form `contractBy` must agree with each
  * other and with a driver group-pair count on random multigraph edge
  * lists, with and without self-loop dropping. */
object ContractionPropertySpec extends Properties("ContractionProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  // edge LISTS (parallel edges kept — contraction counts multiplicity)
  val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 30)
    es <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 8L), Gen.chooseNum(0L, 8L)))
  } yield es

  private def driver(es: List[(Long, Long)],
                     drop: Boolean): Map[(Long, Long), Long] =
    es.map { case (a, b) => (a % 3, b % 3) }
      .filter { case (ga, gb) => !drop || ga != gb }
      .groupBy(identity).map { case (p, g) => (p, g.size.toLong) }

  property("contractBy(id mod 3) == driver group-pair counts, both self-loop modes") =
    forAll(genEdges) { es =>
      import spark.implicits._
      val e = es.toDF("src", "dst")
      Seq(true, false).forall { drop =>
        val got = Contraction.contractBy(e, _ % 3, dropSelfLoops = drop)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
        got == driver(es, drop)
      }
    }

  property("contract(groups table) == contractBy(same function)") =
    forAll(genEdges) { es =>
      import spark.implicits._
      val e = es.toDF("src", "dst")
      val vs = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      val groups = vs.map(v => (v, v % 3)).toDF("id", "grp")
      Seq(true, false).forall { drop =>
        val a = Contraction.contract(e, groups, dropSelfLoops = drop)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
        a == driver(es, drop)
      }
    }
}
