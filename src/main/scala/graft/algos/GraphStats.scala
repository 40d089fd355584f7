package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Ckpt

/** Whole-graph structural statistics a web-link-graph pipeline reports
  * alongside the reference's algorithm suite: local clustering coefficient
  * (triangle recipe re-used per corner — reference
  * `/root/reference/graphblas/core/matrix.py` masked `plus_pair` square, cf.
  * TriangleCount), degree assortativity, edge reciprocity, and a log2-binned
  * degree histogram.
  *
  * Scale notes: every operator here is one or two hash aggregations over the
  * edge list plus (for lcc) the degree-ORIENTED triangle enumeration whose
  * wedge fan-out is bounded by O(√E) per vertex — no all-pairs joins, no
  * driver-side iteration, nothing keyed on an unbounded value domain.
  */
object GraphStats {

  /** Per-vertex local clustering coefficient over a symmetric, deduplicated,
    * loop-free edge set: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), 0 where
    * deg < 2. Triangles are enumerated once at their (deg,id)-min corner
    * (KTruss.orientedTriangles) and scattered to all three corners — the
    * per-corner count is exact, not the oriented one.
    * Output (id, deg, lcc), lcc rounded to 6 decimals. */
  def localClustering(edgesSym: DataFrame, numPartitions: Int): DataFrame = {
    // the symmetric input feeds three plan branches (degrees + the two
    // branches inside orientedTriangles) — scan it once
    val e = edgesSym.select(col("src"), col("dst")).persist()
    e.count()
    try {
      val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .select(col("src").as("id"), col("deg"))
      val (tri, o) = KTruss.orientedTriangles(e, numPartitions)
      // one Generate over the materialized triangle rows beats three
      // unionAll branches that would each re-run the close join
      val corners = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("tri"))
      val out = Ckpt.materialize(
        deg.join(corners, Seq("id"), "left")
          .select(col("id"), col("deg"),
            when(col("deg") < 2, lit(0.0)).otherwise(
              round(coalesce(col("tri"), lit(0L)) * 2.0
                / (col("deg") * (col("deg") - 1)), 6)).as("lcc")))
      o.release()
      out.df // |V| rows — blocks back the returned frame, released with the session
    } finally e.unpersist(false)
  }

  /** Degree assortativity: Pearson r of (deg(src), deg(dst)) over the
    * directed-symmetric edge list. Computed from EXACT integer moment sums
    * (degrees are longs; the five sums fit int64 far past these fixtures)
    * combined in ONE closed-form double expression — bit-stable across
    * partitionings, unlike a floating corr() whose accumulation order is
    * partition-dependent. Output a single (assortativity) row, 6 decimals. */
  def assortativity(edgesSym: DataFrame): DataFrame = {
    val deg = edgesSym.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    val xy = edgesSym
      .join(deg.select(col("id").as("src"), col("deg").as("x")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("y")), "dst")
    xy.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(round(
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
        6).as("assortativity"))
  }

  /** Reciprocity of a DIRECTED edge set: |{(u,v) : (v,u) ∈ E}| / |E|.
    * One semi-join on the reversed set + two scalar counts. */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    e.count()
    try {
      val rev = e.select(col("dst").as("src"), col("src").as("dst"))
      val m = e.agg(count(lit(1)).as("m"))
      val r = e.join(rev, Seq("src", "dst"), "left_semi")
        .agg(count(lit(1)).as("r"))
      // two single-row frames — the cross join is 1×1
      m.crossJoin(r)
        .select(round(col("r").cast("double") / col("m"), 6).as("reciprocity"))
    } finally e.unpersist(false)
  }

  /** Log2-binned out-degree histogram: bucket = floor(log2(deg)) + 1,
    * computed EXACTLY as the bit length of the binary string (no floating
    * log at power-of-two boundaries). Output (bucket, n_vertices). */
  def degreeHistogram(edges: DataFrame): DataFrame =
    edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .groupBy(length(bin(col("deg"))).as("bucket"))
      .agg(count(lit(1)).as("n_vertices"))

  /** Newman modularity of a vertex partition (Newman & Girvan 2004) over a
    * SYMMETRIC, deduplicated, loop-free edge set — the standard "did the
    * community algorithm find real structure" score for LPA/CC output:
    * Q = Σ_c [ W_c/2m − (D_c/2m)² ], with W_c the directed-symmetric edge
    * count inside community c, D_c its total degree, 2m = |edges|.
    *
    * Like assortativity above, Q is combined from EXACT integer aggregates
    * (Sw = Σ_c W_c via one filtered count; Sd2 = Σ_c D_c² — fits int64 while
    * Σ_c D_c² < 9·10^18, i.e. until a single community's degree mass passes
    * ~3·10^9; past that, recompute with dc cast to double) in ONE closed-form
    * double expression, so the result is bit-stable across partitionings.
    * `labels`: (id, label) covering every edge endpoint. Output a single
    * (modularity) row rounded to 9 decimals. */
  def modularity(edgesSym: DataFrame, labels: DataFrame): DataFrame = {
    val l = labels.select(col("id"), col("label"))
    val deg = edgesSym.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    val sd2 = deg.join(l, "id")
      .groupBy("label").agg(sum(col("deg")).as("dc"))
      .agg(sum(col("dc") * col("dc")).as("sd2"))
    val swm = edgesSym
      .join(l.select(col("id").as("src"), col("label").as("cs")), "src")
      .join(l.select(col("id").as("dst"), col("label").as("cd")), "dst")
      .agg(count(lit(1)).as("two_m"),
        count_if(col("cs") === col("cd")).as("sw"))
    // two single-row frames — the cross join is 1×1
    swm.crossJoin(sd2).select(round(
      col("sw").cast("double") / col("two_m")
        - col("sd2").cast("double")
          / (col("two_m").cast("double") * col("two_m")),
      9).as("modularity"))
  }
}
