package graft.algos

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Ckpt, CkptState}
import graft.pipeline.Sampling

/** `mis` is backed by the per-round winner cache blocks; call `release()`
  * once the result is consumed so long-lived sessions can free them —
  * until then `mis` stays valid (same contract as [[MatchingResult]]). */
final case class MISResult(mis: DataFrame, rounds: Int,
                           private val states: Seq[CkptState] = Nil) {
  def release(): Unit = states.foreach(_.release())
}

/** Maximal independent set — Luby's algorithm (Luby 1986; the GraphBLAS
  * showcase kernel, e.g. LAGraph MIS): per round, every remaining vertex
  * whose priority beats ALL its remaining neighbors' joins the set; it and
  * its neighborhood leave the graph. Expected O(log n) rounds.
  *
  * Determinism: round r's priority is the salted multiplicative hash
  * `(v % M) · A_r mod M` (`Sampling.saltedMultiplier(r)` — a fresh
  * multiplier per round is Luby's re-randomization), compared as the pair
  * (priority, id) so hash ties cannot deadlock adjacent vertices or
  * diverge between engines; the whole run is a pure function of the edge
  * set, reproducible at any parallelism and replayable by an unrolled SQL
  * oracle (row-tuple comparison) — a bounded-round run is the
  * deterministic R-round operator by the same monotone-shrink argument as
  * KTruss/KCore.
  *
  * Per round (3 jobs): one (dst-priority) min hash-aggregation over the
  * live edge set + the beats-all filter; one anti-join removal of winners
  * ∪ their neighborhoods; one live-edge refilter. The live relations only
  * ever shrink, so late rounds are nearly free; loop state lives in flat
  * Ckpt rewraps.
  *
  * Output: (id, round) — every MIS vertex with the round that admitted it.
  */
object MIS {

  def run(spark: SparkSession, edgesSym: DataFrame, numPartitions: Int,
          maxRounds: Int = 16): MISResult = {
    val M = Sampling.M
    var (rem, nRem) = Ckpt.materializeWithCount(
      edgesSym.select(col("src").as("id"))
        .distinct().repartition(numPartitions, col("id")))
    // PACKED priority key when every vertex id fits 32 bits: the
    // (priority, id) pair folds into ONE long `p·2³² + id` whose ordering
    // is exactly the lexicographic tuple order (p < M = 2³¹−1, so the pack
    // tops out at 2⁶³−1 — no overflow). A long min runs in the codegen
    // HashAggregate; the struct form falls back to ObjectHashAggregate
    // (no whole-stage codegen) and stays as the >32-bit-id path. Same
    // winners either way — the one-off max probe rides the flat rem scan.
    val packedIds = nRem > 0 && {
      val r = rem.df.agg(min(col("id")), max(col("id"))).collect()(0)
      !r.isNullAt(0) && r.getLong(0) >= 0 && r.getLong(1) < (1L << 32)
    }
    var e = Ckpt.materialize(edgesSym.select(col("src"), col("dst"))
      .repartition(numPartitions, col("src")))
    // per-round winner states accumulate (their blocks back the returned
    // DataFrame — total size = |MIS|, tiny next to the edge set — and are
    // handed to the caller via MISResult.release()) and union ONCE at the
    // end — 3 jobs/round (cand, rem+fused count, edges) instead of 5: the
    // per-round mis-union job and the separate rem count measured ~35% of
    // wall time on the sf0.1 fixture
    val winners = List.newBuilder[(CkptState, Int)]
    var rounds = 0
    while (nRem > 0 && rounds < maxRounds) {
      rounds += 1
      val mult = Sampling.saltedMultiplier(rounds)
      def pk(c: Column): Column =
        if (packedIds) (c % M * mult % M) * (1L << 32) + c
        else struct((c % M * mult % M).as("p"), c.as("t"))
      // min neighbor (priority, id) per live vertex; vertices with no live
      // neighbors have no row -> isNull -> they win unconditionally
      val nbrMin = e.df.select(col("src").as("id"), pk(col("dst")).as("k"))
        .groupBy("id").agg(min(col("k")).as("mk"))
      val cand = Ckpt.materialize(rem.df.join(nbrMin, Seq("id"), "left")
        .filter(col("mk").isNull || pk(col("id")) < col("mk"))
        .select(col("id")))
      val removed = cand.df.unionByName(
        e.df.join(cand.df.withColumnRenamed("id", "cid"),
          col("src") === col("cid")).select(col("dst").as("id")))
      val (newRem, n) = Ckpt.materializeWithCount(
        rem.df.join(removed, Seq("id"), "left_anti")
          .repartition(numPartitions, col("id")))
      // live-edge shrink as DELTA anti-joins against this round's removed
      // set (e's endpoints are all in rem inductively, so dropping removed
      // ≡ keeping newRem): the build side is the small per-round delta —
      // AQE broadcasts it and the (big) edge state is never re-shuffled
      // (the KCore drop-side discipline). dst anti FIRST, src anti LAST:
      // the materialized edge state then carries hash(src) partitioning,
      // so next round's neighbor-min groupBy AND the winner-neighborhood
      // join stay exchange-free
      val newE = Ckpt.materialize(
        e.df.join(removed.select(col("id").as("dst")), Seq("dst"), "left_anti")
          .join(removed.select(col("id").as("src")), Seq("src"), "left_anti")
          .select(col("src"), col("dst")))
      winners += ((cand, rounds))
      rem.release(); e.release()
      rem = newRem
      e = newE
      nRem = n
    }
    rem.release(); e.release()
    val ws = winners.result()
    val mis = ws.map { case (c, r) =>
      c.df.select(col("id"), lit(r.toLong).as("round"))
    }.reduceOption(_.unionByName(_)).getOrElse(
      { import spark.implicits._; Seq.empty[(Long, Long)].toDF("id", "round") })
    MISResult(mis, rounds, ws.map(_._1))
  }
}
