package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Ckpt, CkptState}
import graft.pipeline.Sampling

/** `matching` is backed by the per-round winner cache blocks; call
  * `release()` once the result is consumed (collected/written) so
  * long-lived sessions can free them — until then `matching` stays valid
  * (ADVICE r4: the states used to be unreachable from the caller). */
final case class MatchingResult(matching: DataFrame, rounds: Int,
                                private val states: Seq[CkptState] = Nil) {
  def release(): Unit = states.foreach(_.release())
}

/** Maximal matching — the edge analogue of Luby's MIS (Israeli & Itai 1986;
  * a classic GraphBLAS demo kernel, cf. LAGraph's MaximalMatching): per
  * round, every live canonical edge whose salted priority beats ALL edges
  * sharing either endpoint joins the matching; its two endpoints (and all
  * their edges) leave the graph. Selected edges are pairwise non-adjacent
  * by construction — two edges sharing endpoint x would both have to BE
  * x's unique minimum. Expected O(log n) rounds.
  *
  * Determinism mirrors [[MIS]]: round r's edge priority is
  * `(u%M·A + v%M·B) mod M` with the two per-round salted multipliers
  * A = saltedMultiplier(2r−1), B = saltedMultiplier(2r), compared as the
  * tuple (p, u, v) so hash ties cannot select adjacent edges or diverge
  * between engines — a pure function of the edge set, bit-reproducible at
  * any parallelism and replayable by an unrolled SQL oracle. A
  * bounded-round run is the deterministic R-round operator (the live edge
  * set only shrinks — the KTruss/MIS monotone argument).
  *
  * Per round (2 materializations): one endpoint-min hash aggregation over
  * the 2·|E_live| exploded endpoint rows, the both-endpoints-min filter,
  * and a two-sided anti-join removal of matched endpoints. Winner states
  * accumulate and union ONCE at the end (the MIS winners trick).
  *
  * Output: (src, dst, round) per matched canonical edge.
  */
object Matching {

  def run(spark: SparkSession, edgesSym: DataFrame, numPartitions: Int,
          maxRounds: Int = 16): MatchingResult = {
    val M = Sampling.M
    var (e, nE) = Ckpt.materializeWithCount(
      edgesSym.filter(col("src") < col("dst")).select(col("src"), col("dst"))
        .repartition(numPartitions, col("src")))
    val winners = List.newBuilder[(CkptState, Int)]
    var rounds = 0
    while (nE > 0 && rounds < maxRounds) {
      rounds += 1
      val a = Sampling.saltedMultiplier(2L * rounds - 1)
      val b = Sampling.saltedMultiplier(2L * rounds)
      // (p, u, v): p < 2M fits long comfortably; the id pair breaks ties
      val p = ((col("src") % M) * a % M + (col("dst") % M) * b % M) % M
      val withK = e.df.select(col("src"), col("dst"),
        struct(p.as("p"), col("src").as("s"), col("dst").as("t")).as("k"))
      val ends = withK.select(col("src").as("v"), col("k"))
        .unionByName(withK.select(col("dst").as("v"), col("k")))
      val mins = ends.groupBy("v").agg(min(col("k")).as("mk"))
      val sel = Ckpt.materialize(withK
        .join(mins.select(col("v").as("src"), col("mk").as("mu")), "src")
        .join(mins.select(col("v").as("dst"), col("mk").as("mv")), "dst")
        .filter(col("k") === col("mu") && col("k") === col("mv"))
        .select(col("src"), col("dst")))
      val matched = sel.df.select(col("src").as("v"))
        .unionByName(sel.df.select(col("dst").as("v")))
      val (newE, n) = Ckpt.materializeWithCount(
        e.df.join(matched.select(col("v").as("src")), Seq("src"), "left_anti")
          .join(matched.select(col("v").as("dst")), Seq("dst"), "left_anti")
          .repartition(numPartitions, col("src")))
      winners += ((sel, rounds))
      e.release()
      e = newE
      nE = n
    }
    e.release()
    val ws = winners.result()
    val out = ws.map { case (c, r) =>
      c.df.select(col("src"), col("dst"), lit(r.toLong).as("round"))
    }.reduceOption(_.unionByName(_)).getOrElse(
      { import spark.implicits._
        Seq.empty[(Long, Long, Long)].toDF("src", "dst", "round") })
    MatchingResult(out, rounds, ws.map(_._1))
  }
}
