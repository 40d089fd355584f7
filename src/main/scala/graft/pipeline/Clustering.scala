package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Ckpt

/** Embedding-space clustering for corpus curation: Lloyd's k-means with
  * driver-held centroids, plus SemDeDup-style semantic near-duplicate
  * pruning built on it (cluster first, then prune cosine-similar pairs
  * WITHIN clusters only — the cross-cluster quadratic term never exists;
  * cf. Abbas et al. 2023, "SemDeDup").
  *
  * Scale shape (the classic one — Spark MLlib's KMeans is built the same
  * way): per Lloyd round the corpus is scanned against a BROADCAST centroid
  * table (k×dim doubles as plan literals), and the centroid update is one
  * (cluster, pos) hash aggregation whose k×dim result — not the corpus —
  * is collected to the driver. Nothing quadratic, nothing keyed on an
  * unbounded domain, iteration state lives in k×dim driver doubles.
  *
  * Determinism contract (the driver compares runs at different thread
  * counts bit-for-bit): every value that crosses an aggregation boundary is
  * first quantized to a dyadic rational q/2^24 (exact in FP64), so centroid
  * numerators are INTEGER sums — order-independent under Spark's unordered
  * partial aggregation — and each centroid double is a pure function of row
  * content, never of partition layout. Initial centroids are the k lowest
  * vec_ids (the same deterministic bootstrap as Similarity.annTopKIvf's
  * coarse quantizer); a sampled k-means++ table slots in unchanged.
  */
object Clustering {

  /** 2^24: quantization denominator. floor(x·2^24)/2^24 is exact in FP64
    * for |x| < 2^27, and fine-grained far below any embedding's meaningful
    * precision (float32 has 24 mantissa bits). */
  private val Q = 16777216.0

  /** One flat projection quantizing the float embedding to exact dyadic
    * rationals (see object doc) — a native codegen expression: this runs
    * over the full corpus once per Lloyd scan, and the composable
    * `transform` HOF evaluates interpreted (see QuantizeArray's Scaladoc;
    * agreement with the composed form is pinned in ClusteringSpec). */
  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      graft.functions.QuantizeArray(col("embedding")).as("xq"))

  /** Nearest-centroid hard assignment: argmin_c ‖x−c‖² = argmin_c
    * (c·c − 2·x·c) — the x·x term is cluster-independent and dropped. c·c is
    * a driver-side sequential sum over the centroid array, the same
    * left-to-right order the oracle's list_dot_product uses. Ties break to
    * the lowest cluster id via lexicographic struct ordering. */
  private def assign(xq: DataFrame,
                     cents: Array[(Long, Array[Double])]): DataFrame = {
    val scored = cents.map { case (cid, cent) =>
      var cc = 0.0
      var i = 0
      while (i < cent.length) { cc += cent(i) * cent(i); i += 1 }
      struct(
        (lit(cc) - Similarity.dot(col("xq"), typedlit(cent.toSeq)) * 2.0)
          .as("score"),
        lit(cid).as("cluster"))
    }
    // Spark's least() needs ≥2 args; a lone surviving cluster (every other
    // one emptied) degenerates to a constant assignment
    val best =
      if (scored.length == 1) scored(0)
      else least(scored.toIndexedSeq: _*)
    xq.withColumn("cluster", best.getField("cluster"))
  }

  /** Lloyd's k-means over k clusters; returns the final hard assignment
    * (vec_id, cluster). `iters` counts ASSIGNMENT rounds — centroids update
    * between rounds (iters−1 updates), so iters=1 is the pure
    * nearest-initial-centroid assignment (exactly annTopKIvf's rn=1 coarse
    * assignment). Clusters that lose every member simply vanish from the
    * centroid table (no re-seeding), matching the oracle. */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    require(k >= 2, "k-means needs k >= 2")
    require(iters >= 1, "k-means needs iters >= 1")
    val xq = quantized(emb).persist()
    xq.count()
    try {
      // the k LOWEST ids, not `vec_id < k`: sparse/offset id spaces (a
      // filtered corpus) must still seed k centroids. orderBy+limit is a
      // TakeOrderedAndProject — no global sort
      var cents: Array[(Long, Array[Double])] = xq.orderBy(col("vec_id"))
        .limit(k).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1)
      require(cents.nonEmpty, "k-means needs a non-empty corpus")
      for (_ <- 1 until iters) {
        // the repartition is a compute barrier (see Dedup.simhash / the
        // verify-skill note): without it CollapseProject folds the k-way
        // dot-product `least` into the Project ABOVE the posexplode and
        // re-evaluates it once per generated (pos, v) row — dim× the work
        val sums = assign(xq, cents)
          .select(col("vec_id"), col("cluster"), col("xq"))
          .repartition(col("vec_id"))
          .select(col("cluster"), posexplode(col("xq")))
          // v·2^24 recovers the quantized INTEGER exactly (v is q/2^24)
          .groupBy(col("cluster"), col("pos"))
          .agg(sum((col("col") * Q).cast("long")).as("s"),
            count(lit(1)).as("n"))
          .collect()
        cents = sums.groupBy(_.getLong(0)).toArray.map { case (c, rows) =>
          val dim = rows.map(_.getInt(1)).max + 1
          val arr = new Array[Double](dim)
          rows.foreach(r =>
            arr(r.getInt(1)) = r.getLong(2).toDouble / (r.getLong(3) * Q))
          c -> arr
        }.sortBy(_._1)
      }
      // final assignment as a FRESH lazy plan over emb (the persisted xq is
      // released below; one extra corpus scan when the caller evaluates)
      assign(quantized(emb), cents).select(col("vec_id"), col("cluster"))
    } finally xq.unpersist(false)
  }

  /** SemDeDup-style semantic near-duplicate pruning: k-means-cluster the
    * embeddings, then inside each cluster drop every vector with a
    * SMALLER-id neighbor at cosine ≥ threshold (a well-defined one-pass
    * rule — no order-dependent greedy chain). The pair join is per-cluster,
    * so the quadratic term is bounded by cluster occupancy, exactly like the
    * LSH/IVF candidate joins. Output one row per vector:
    * (vec_id, cluster, is_kept 0/1). */
  def semanticDedup(emb: DataFrame, k: Int = 8, iters: Int = 2,
                    threshold: Double = 0.35): DataFrame = {
    // materialized once — the assignment feeds BOTH pair-join sides and the
    // final output join (Spark recomputes fan-out branches otherwise);
    // |V|-row state, released with the session like localClustering's
    val a = Ckpt.materialize(kmeansAssign(emb, k, iters)).df
    val withC = emb.join(a, "vec_id")
    val l = withC.select(col("cluster"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val r = withC.select(col("cluster"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    val dropped = l.join(r, "cluster").filter(col("va") > col("vb"))
      .filter(round(Similarity.cosine(col("ea"), col("eb")), 6)
        >= threshold)
      .select(col("va").as("vec_id")).distinct()
    a.join(dropped.withColumn("d", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        (coalesce(col("d"), lit(0L)) === 0L).cast("long").as("is_kept"))
  }
}
