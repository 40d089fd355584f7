package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Ckpt, CkptState}

/** Deterministic random-walk corpus generation — the graph-sampling stage of
  * DeepWalk/node2vec-style embedding training (Perozzi et al., KDD'14): one
  * fixed-length walk per start vertex, emitted as (walk, step, id) rows ready
  * to feed a skip-gram trainer.
  *
  * The next-hop choice is pseudo-random but REPRODUCIBLE: walker w at vertex
  * u on step t moves to the out-neighbor minimizing a mixed-congruential
  * score `h(w,t,u,dst)` built from pure 64-bit integer arithmetic (ties → min
  * dst). Determinism is a first-class property at 100 TB — the same corpus
  * regenerates bit-identically on any cluster size, resumed run, or engine
  * (the score is plain modular arithmetic, so the DuckDB oracle replays the
  * exact walks), unlike `rand()`-seeded sampling which is partition-layout
  * dependent. The per-(w,t) multiplier mix decorrelates consecutive steps, so
  * walk diversity matches uniform sampling for corpus purposes.
  *
  * Scale shape: each step is ONE gather join against the pre-partitioned,
  * pre-sorted edge relation (zero-exchange on the edge side — the BFS/MSBFS
  * plan) followed by a min-struct hash aggregation on walk id; no window
  * sort, no per-vertex neighbor arrays materialized. Walkers that reach a
  * sink (no out-edge) simply stop — their walks are shorter, as in the
  * reference DeepWalk formulation.
  */
object RandomWalk {

  private val M = 2147483647L // 2^31 - 1: keeps every mixed term < 2^63

  /** cross-engine next-hop score: identical semantics in Spark and DuckDB
    * (positive BIGINT multiply/add/mod only — no engine hash). Each id is
    * reduced mod M BEFORE the multiply, as in Sampling.hashBucket: (M−1) ·
    * 2654435761 < 2^63, so the arithmetic never overflows for ANY 64-bit
    * vertex/walk id (a raw `walk * 2654435761` wraps negative in Spark and
    * raises in DuckDB once ids exceed ~3.5e9). */
  private def score(walk: org.apache.spark.sql.Column,
                    u: org.apache.spark.sql.Column,
                    dst: org.apache.spark.sql.Column, t: Int) =
    ((walk % M) * lit(2654435761L) % M + (u % M) * lit(40503L) % M +
      (dst % M) * lit(69069L) % M + lit(t * 1013904223L % M)) % M

  /** One `walkLength`-step walk from every distinct source vertex.
    * Output: (walk, step, id) — walk = start vertex, step 0..walkLength. */
  def corpus(spark: SparkSession, edges: DataFrame, walkLength: Int,
             numPartitions: Int): DataFrame = {
    val e = edges.repartition(numPartitions, col("src"))
      .sortWithinPartitions("src").persist()
    e.count()
    val starts = e.select(col("src").as("walk")).distinct()
    // ONE job per step: the alive count is fused into the materialization
    // (was a second job per step), and the final re-materialization of the
    // already-flat union is gone — the per-step states back the returned
    // union directly (the MIS winners discipline; total size = the corpus).
    val (f0, n0) = Ckpt.materializeWithCount(
      starts.select(col("walk"), lit(0L).as("step"), col("walk").as("id")))
    var frontier = f0
    var corpus = frontier.df
    val states = scala.collection.mutable.ListBuffer[CkptState](frontier)
    var t = 0
    var alive = n0
    while (alive > 0 && t < walkLength) {
      t += 1
      val (next, n) = Ckpt.materializeWithCount(
        e.join(frontier.df.select(col("walk"), col("id")),
            e("src") === col("id"))
          .select(col("walk"),
            struct(score(col("walk"), col("id"), e("dst"), t).as("h"),
              e("dst").as("dst")).as("hd"))
          .groupBy("walk")
          .agg(min(col("hd")).as("m"))
          .select(col("walk"), lit(t.toLong).as("step"),
            col("m.dst").as("id")))
      alive = n
      if (n > 0) corpus = corpus.unionByName(next.df)
      states += next
      frontier = next
    }
    e.unpersist()
    corpus
  }
}
