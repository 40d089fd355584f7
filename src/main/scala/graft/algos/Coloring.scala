package graft.algos

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Ckpt, CkptState}
import graft.pipeline.Sampling

final case class ColoringResult(colors: DataFrame, rounds: Int)

/** Distributed greedy graph coloring — Jones–Plassmann (Jones & Plassmann
  * 1993; the other classic Luby-style GraphBLAS kernel beside MIS): per
  * round, every UNCOLORED vertex whose salted priority beats all its
  * uncolored neighbors' takes the smallest color absent from its
  * already-colored neighborhood. Expected O(log n / log log n)-ish rounds on
  * bounded-degree graphs; each vertex ends with color ≤ its degree, so the
  * palette never exceeds Δ+1.
  *
  * Determinism mirrors MIS: round r's priority is the salted multiplicative
  * hash `(v % M) · A_r mod M` compared as the (priority, id) pair — the same
  * Sampling.saltedMultiplier stream, so the whole run is a pure function of
  * the edge set, bit-reproducible at any parallelism and replayable by an
  * unrolled SQL oracle. A bounded-round run is the deterministic R-round
  * operator (the uncolored set only shrinks), like MIS/KCore/KTruss.
  *
  * Per round: the MIS-style beats-all candidate filter over live edges; one
  * neighbor-color semi-computation (original edges, candidate side semi-
  * filtered, colored side joined by id — NEVER an all-pairs anything); the
  * smallest-absent-color pick as a skinny (cand × round) explode anti-joined
  * against neighbor colors (≤ r candidate-rows each, r bounded); then the
  * same live-set shrink as MIS. Per-round colored deltas accumulate and
  * union ONCE at the end (the MIS winners trick — no growing loop plan).
  *
  * Output: (id, color) for every vertex colored within maxRounds.
  */
object Coloring {

  def run(spark: SparkSession, edgesSym: DataFrame, numPartitions: Int,
          maxRounds: Int = 16): ColoringResult = {
    val M = Sampling.M
    val e0 = Ckpt.materialize(edgesSym.select(col("src"), col("dst"))
      .repartition(numPartitions, col("src")))
    val (rem0, nRem0) = Ckpt.materializeWithCount(
      e0.df.select(col("src").as("id"))
        .distinct().repartition(numPartitions, col("id")))
    // PACKED priority key when every vertex id fits 32 bits (the MIS
    // discipline, same probe): (priority, id) folds into ONE long
    // `p·2³² + id` whose ordering is exactly the lexicographic tuple order
    // (p < M = 2³¹−1 ⇒ no overflow). The neighbor-min aggregation then runs
    // as a codegen HashAggregate over 8-byte keys instead of an
    // ObjectHashAggregate over structs; the struct path stays for wider ids.
    val packedIds = nRem0 > 0 && {
      val r = rem0.df.agg(min(col("id")), max(col("id"))).collect()(0)
      !r.isNullAt(0) && r.getLong(0) >= 0 && r.getLong(1) < (1L << 32)
    }
    // `rem` lives as a DERIVED plan — rem0 minus the union of per-round
    // pick states (all flat scans) — instead of a re-materialized state:
    // saves one materialization + count job per round. The loop exit rides
    // the pick count: while any vertex is uncolored, the global
    // (priority, id)-minimum uncolored vertex beats all its uncolored
    // neighbors, so cand (= pick) is nonempty — pick count 0 ⟺ rem empty.
    var nColored = 0L
    var e = e0 // live (uncolored-to-uncolored) edges; round 0 = all
    val picks = List.newBuilder[CkptState]
    var coloredSoFar = List.empty[DataFrame]
    var rounds = 0
    while (nColored < nRem0 && rounds < maxRounds) {
      rounds += 1
      val rem = coloredSoFar.map(_.select(col("id")))
        .reduceOption(_.unionByName(_))
        .fold(rem0.df)(c => rem0.df.join(c, Seq("id"), "left_anti"))
      val mult = Sampling.saltedMultiplier(rounds)
      def pk(c: Column): Column =
        if (packedIds) (c % M * mult % M) * (1L << 32) + c
        else struct((c % M * mult % M).as("p"), c.as("t"))
      val nbrMin = e.df.select(col("src").as("id"), pk(col("dst")).as("k"))
        .groupBy("id").agg(min(col("k")).as("mk"))
      val cand = Ckpt.materialize(rem.join(nbrMin, Seq("id"), "left")
        .filter(col("mk").isNull || pk(col("id")) < col("mk"))
        .select(col("id")))
      // smallest color ∉ colored-neighbor palette; colors seen so far are
      // < rounds-1, so the candidate explode over [0, rounds) always finds
      // one — |cand|·rounds skinny rows, never an unbounded domain
      // smallest color ∉ colored-neighbor palette as an array MEX: collect
      // the (≤ rounds-1 distinct) neighbor colors per candidate and take
      // min(sequence(0, rounds-1) ∖ set) — nonempty because colors seen so
      // far are < rounds-1. Replaces the former candidate × [0, rounds)
      // explode anti-joined against neighbor colors: same value, but ONE
      // aggregation on the neighbor-color rows instead of an explode + an
      // (id, k)-keyed anti-join + a regroup — ~2 exchanges fewer per round.
      // The arrays are ≤ rounds elements, so the interpreted array ops are
      // O(rounds²) on candidate rows only, never data-sized.
      val palette = sequence(lit(0L), lit(rounds.toLong - 1))
      val nc =
        if (coloredSoFar.isEmpty) null
        else e0.df
          .join(cand.df.withColumnRenamed("id", "cid"), col("src") === col("cid"))
          .join(coloredSoFar.reduce(_.unionByName(_))
            .withColumnRenamed("id", "nid"), col("dst") === col("nid"))
          .groupBy(col("cid").as("id"))
          .agg(collect_set(col("color")).as("ks"))
      val (pick, nPicked) = Ckpt.materializeWithCount(
        if (nc == null) cand.df.select(col("id"), lit(0L).as("color"))
        else cand.df.join(nc, Seq("id"), "left")
          .select(col("id"),
            when(col("ks").isNull, lit(0L))
              .otherwise(array_min(array_except(palette, col("ks"))))
              .as("color")))
      picks += pick
      coloredSoFar ::= pick.df
      val removedIds = cand.df
      // live-edge shrink as DELTA anti-joins against this round's colored
      // set (e's endpoints are all uncolored inductively, so dropping cand
      // ≡ keeping the uncolored survivors): the join's build side is the
      // small per-round delta — AQE broadcasts it and the (big) edge state
      // is never re-shuffled (the KCore drop-side discipline). dst anti
      // first, src anti last: either join strategy leaves the materialized
      // state hash(src)-partitioned, so next round's neighbor-min groupBy
      // is exchange-free
      val newE = Ckpt.materialize(
        e.df.join(removedIds.select(col("id").as("dst")), Seq("dst"), "left_anti")
          .join(removedIds.select(col("id").as("src")), Seq("src"), "left_anti")
          .select(col("src"), col("dst")))
      cand.release()
      if (e ne e0) e.release()
      e = newE
      nColored += nPicked
    }
    rem0.release()
    if (e ne e0) e.release()
    // e0 and the picks stay materialized: their blocks back the returned
    // frame (total size |V| + |E|-partitioned scan state, session-scoped)
    val out = picks.result().map(_.df)
      .reduceOption(_.unionByName(_)).getOrElse(
        { import spark.implicits._; Seq.empty[(Long, Long)].toDF("id", "color") })
    ColoringResult(out, rounds)
  }
}
