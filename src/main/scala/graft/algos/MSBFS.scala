package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Ckpt, CkptState}

/** Multi-source BFS with a packed 64-bit frontier: up to 64 independent BFS
  * traversals ride ONE wave — the GraphBLAS boolean n×k matrix BFS
  * (`lor_land` semiring over an n×k frontier, reference
  * `notebooks/Example B.1` generalized to a matrix frontier) with the k
  * frontier columns packed into a single long column. The ⊕ = lor of the
  * semiring becomes one `bit_or` hash aggregation per wave, and the
  * structural-complement mask (`~visited`) becomes `gathered & ~visited`
  * bit arithmetic — so k traversals cost ONE gather join per level instead
  * of k, the entire point of batching BFS at web scale (the edge relation
  * is scanned once per level regardless of source count).
  *
  * Per level (2 jobs): frontier ⋈ edges on src (edges persisted
  * pre-partitioned+sorted on src, zero-exchange on the edge side) →
  * `bit_or` partial/final agg on dst → left-join visited for the complement
  * mask; newly-set bits are decoded to (id, source, level) rows by a
  * broadcast theta-join against the ≤64-row source map (codegen bit test,
  * no per-bit row blowup for unset bits).
  *
  * Output: (source, id, level) — exact shortest hop counts from each
  * source, one row per reached (source, vertex) pair.
  */
object MSBFS {

  def levels(spark: SparkSession, edges: DataFrame, sources: Seq[Long],
             maxDepth: Int = 64, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    require(sources.nonEmpty && sources.size <= 64,
      s"1..64 sources per packed wave, got ${sources.size}")
    require(sources.distinct.size == sources.size, "sources must be distinct")
    // input-sized edge cache when numPartitions > 0 (the SparkEntry.gparts
    // discipline — see BFS.levels); aggregation exchanges keep the session
    // parallelism so partial aggregation survives
    val e = (if (numPartitions > 0) edges.repartition(numPartitions, col("src"))
             else edges.repartition(col("src")))
      .sortWithinPartitions("src").persist()
    e.count()
    // bit index -> source vertex (tiny, broadcast into every decode join)
    val srcMap = broadcast(
      sources.zipWithIndex.map { case (v, i) => (i, v) }.toDF("sidx", "source"))
    // ONE job per level (was 4: next + count + visited + levels
    // materializations): the frontier count comes fused from the next-wave
    // materialization; `visited` is the bit_or re-aggregation of the UNION
    // of per-level flat states (same shuffle volume the old per-level
    // newVisited materialization paid, minus its separate job); decoded
    // per-level rows accumulate as derived plans over those states and
    // union ONCE at the end (the MIS winners trick).
    val seed = Ckpt.materialize(
      sources.zipWithIndex.map { case (v, i) => (v, 1L << i) }.toDF("id", "mask"))
    var visitedPlan = seed.df // union of per-level (id, mask) flat states
    val levelsOut = List.newBuilder[DataFrame]
    levelsOut += sources.map(v => (v, v, 0L)).toDF("source", "id", "level")
    var frontier = seed.df // (id, mask): level-0 frontier = the sources
    var depth = 0L
    var frontierSize = sources.size.toLong
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      // one wave: gather = A'(lor_land) over the packed frontier, then the
      // complement mask as bit arithmetic on the visited join
      val visitedAgg = visitedPlan.groupBy("id")
        .agg(expr("bit_or(mask)").as("mask"))
      val (next, n) = Ckpt.materializeWithCount(
        e.join(frontier.select(col("id"), col("mask").as("fmask")),
            e("src") === col("id"))
          .groupBy(e("dst").as("gid"))
          .agg(expr("bit_or(fmask)").as("gmask"))
          .join(visitedAgg, col("gid") === visitedAgg("id"), "left")
          .select(col("gid").as("id"),
            col("gmask").bitwiseAND(
              bitwise_not(coalesce(col("mask"), lit(0L)))).as("mask"))
          .filter(col("mask") =!= 0L))
      frontierSize = n
      if (n > 0) {
        val d = depth
        levelsOut += next.df.join(srcMap,
            expr("(shiftright(mask, CAST(sidx AS INT)) & 1) = 1"))
          .select(col("source"), col("id"), lit(d).as("level"))
        visitedPlan = visitedPlan.unionByName(next.df)
        frontier = next.df
      } else next.release()
    }
    e.unpersist()
    // per-level states stay materialized — their blocks back the result
    levelsOut.result().reduce(_.unionByName(_))
  }

  /** Seed-sampled harmonic centrality (Boldi–Vigna, "Axioms for
    * centrality" — the HyperBall estimand): H_S(v) = Σ_{s∈S, d(s,v)>0}
    * 1/d(s,v) over a fixed source sample S. At web scale the exact
    * all-sources sum is replaced by a sampled one; this operator computes
    * the exact per-sample term — one packed MSBFS wave per ≤64 sources,
    * then a single hash aggregation over the (source, id, level) rows.
    * Unreached (s,v) pairs contribute 0 (the reason harmonic, not
    * closeness, is the web-graph centrality of choice: it handles
    * disconnectedness without an ∞). */
  def harmonic(spark: SparkSession, edges: DataFrame, sources: Seq[Long],
               maxDepth: Int = 64, numPartitions: Int = 0): DataFrame =
    levels(spark, edges, sources, maxDepth, numPartitions)
      .filter(col("level") > 0)
      .groupBy("id")
      .agg(sum(lit(1.0) / col("level")).as("harmonic"))

  /** Per-source eccentricity within the BFS radius: max level reached from
    * each source over its reachable set — the pseudo-diameter sampling
    * primitive (max over sampled sources lower-bounds the graph diameter).
    * Pure integer max over the shared packed wave; no float aggregation. */
  def eccentricity(spark: SparkSession, edges: DataFrame, sources: Seq[Long],
                   maxDepth: Int = 64, numPartitions: Int = 0): DataFrame =
    levels(spark, edges, sources, maxDepth, numPartitions)
      .groupBy("source").agg(max(col("level")).as("eccentricity"))
}
