package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH bucketing as the scale path (candidates only meet inside a bucket, so
  * the quadratic term is per-bucket, not corpus-wide).
  *
  * Dot products are pure `aggregate`/`zip_with` Column expressions (codegen,
  * no UDF). Hyperplanes are generated from deterministic integer arithmetic
  * so the oracle SQL can reproduce them exactly.
  */
object Similarity {

  /** Native codegen dot product (graft.functions.DotProduct): the
    * `aggregate`/`zip_with` composition is a HigherOrderFunction chain that
    * Spark evaluates interpreted — too slow for the innermost loop of the
    * candidate joins (see DotProduct's Scaladoc). */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  def norm(a: Column): Column = sqrt(graft.functions.DotProduct(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each query vector (vec_id < nQueries)
    * rank all other vectors. Output: (query_id, cand_id, sim, rank).
    * The query side is broadcast; the corpus is scanned once. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val sims = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qe"), col("ce")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component j∈[0,nBits), k∈[0,dim):
    * ((j*dim + k) * 2654435761 mod 1000) / 1000 - 0.5 */
  private def planeComponent(j: Int, k: Column): Column =
    (pmod((lit(j.toLong) * 64L + k.cast("long")) * 2654435761L % 2147483647L,
      lit(1000L)).cast("double") / 1000.0) - 0.5

  /** Random-hyperplane LSH bucket id (nBits sign bits) per vector — the
    * scale path for ANN: vectors sharing a bucket are the only candidate
    * pairs. Output: (vec_id, bucket). */
  def lshBuckets(emb: DataFrame, nBits: Int = 8): DataFrame = {
    val bits = (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, k) => x.cast("double") * planeComponent(j, k)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    emb.select(col("vec_id"), bits.reduce(_ + _).as("bucket"))
  }

  /** Bucket count for a target average occupancy: 2^nBits ≈ N / targetOcc.
    * Fixed nBits makes the per-bucket pair join Θ(N²/2^nBits) — quadratic
    * again at scale; deriving nBits from the corpus size bounds expected
    * bucket occupancy (and so per-bucket join work) as N grows. */
  def adaptiveBits(n: Long, targetOcc: Int = 64): Int =
    math.max(1, math.ceil(math.log(n.toDouble / targetOcc) / math.log(2.0)).toInt)

  /** Scale path: ANN with bucket count derived from the corpus size (one
    * count job, then the bucketed join). */
  def annTopKAdaptive(emb: DataFrame, k: Int = 10, targetOcc: Int = 64): DataFrame =
    annTopK(emb, adaptiveBits(emb.count(), targetOcc), k)

  /** Embedding-cosine similar-pair mining (the embedding near-dup shape):
    * candidate pairs only within adaptive LSH buckets, exact cosine
    * thresholded. The quadratic term is per-bucket with bounded occupancy. */
  def cosineSimPairs(emb: DataFrame, threshold: Double, targetOcc: Int = 64): DataFrame = {
    val nBits = adaptiveBits(emb.count(), targetOcc)
    val withB = emb.join(lshBuckets(emb, nBits), "vec_id")
    val l = withB.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val r = withB.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    l.join(r, "bucket").filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("ea"), col("eb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Multi-probe bucketed ANN: each query probes its OWN bucket plus every
    * hamming-1 bucket (one hyperplane sign flipped) — recovering most of the
    * recall single-probe loses at hyperplane boundaries (a near-neighbor
    * lands one bit away with probability ≈ θ/π per plane) for ~(nBits+1)×
    * the probe-side join volume. Candidates still only meet inside buckets,
    * never all-pairs, and each (query, cand) pair arises from exactly one
    * probe (the probe set has distinct buckets), so no dedup is needed.
    * The probe explode is SKINNY (query_id, bucket) — embeddings join in
    * afterwards by id, so no array is copied per generated row. */
  def annTopKMultiProbe(emb: DataFrame, k: Int = 10, targetOcc: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nBits = adaptiveBits(emb.count(), targetOcc)
    val b = lshBuckets(emb, nBits)
    val probeBuckets = col("bucket") +:
      (0 until nBits).map(j => col("bucket").bitwiseXOR(lit(1L << j)))
    val probes = b.select(col("vec_id").as("query_id"),
      explode(array(probeBuckets: _*)).as("bucket"))
    val cands = probes
      .join(b.select(col("bucket"), col("vec_id").as("cand_id")), "bucket")
      .filter(col("query_id") =!= col("cand_id"))
    val qe = emb.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val ce = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val sims = cands.join(qe, "query_id").join(ce, "cand_id")
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qe"), col("ce")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  /** IVF-style ANN (inverted-file index, the other classic scale path
    * besides hashing): a coarse quantizer of `nlist` centroids partitions
    * the corpus into inverted lists (each vector is ASSIGNED to its nearest
    * centroid); a query probes only its `nprobe` nearest centroids' lists
    * and ranks exact cosine within them — candidate volume is explicitly
    * ~nprobe/nlist of the corpus, and recall degrades with distance to a
    * centroid-cell boundary rather than per-hyperplane (complementary
    * failure mode to LSH).
    *
    * The quantizer here is DETERMINISTIC — the embeddings of the `nlist`
    * lowest vec_ids — so the DuckDB oracle reproduces the index exactly; a
    * k-means-trained centroid table slots into the same plan unchanged
    * (sampling the corpus is the standard quantizer bootstrap).
    *
    * Plan shape at scale: the centroid table is broadcast (nlist rows);
    * assignment/probe selection is a skinny (vec_id, list_id, csim) window
    * — embeddings are NOT carried through the shuffle, they re-join by id;
    * candidates meet through the list_id equi-join only. The quantizer
    * subtree feeds BOTH sides of the probe⋈assign join and is therefore
    * computed twice (Spark self-joins recompute; same shape as annTopK's
    * bucket self-join) — ~2·nlist dots per vector, cheap next to the
    * candidate ranking; persist it if nlist is very large. nprobe = nlist
    * degenerates to exhaustive search (the structural correctness pin in
    * DedupSimSpec). Output: (query_id, cand_id, sim, rank) like annTopK. */
  def annTopKIvf(emb: DataFrame, nlist: Int = 16, nprobe: Int = 2,
                 k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the nlist LOWEST ids, not `vec_id < nlist`: sparse/offset id spaces
    // (a filtered corpus) must still seed nlist centroids — same bootstrap
    // as Clustering.kmeansAssign. orderBy+limit plans as a
    // TakeOrderedAndProject (top-nlist per partition, no global sort), and
    // the result is broadcast below anyway.
    val cents = emb.orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id").as("list_id"), col("embedding").as("cent"))
    // skinny centroid ranking: (vec_id, list_id, csim) only
    val ranked = emb.join(broadcast(cents))
      .select(col("vec_id"), col("list_id"),
        round(cosine(col("embedding"), col("cent")), 6).as("csim"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("list_id"))
    val pr = ranked.withColumn("_rn", row_number().over(wAssign))
    val assign = pr.filter(col("_rn") === 1)
      .select(col("list_id"), col("vec_id").as("cand_id"))
    val probes = pr.filter(col("_rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("list_id"))
    // each (query, cand) pair arises at most once: a candidate lives in
    // exactly ONE inverted list — no dedup needed
    val sims = probes.join(assign, "list_id")
      .filter(col("query_id") =!= col("cand_id"))
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id")
      .join(emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce")), "cand_id")
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qe"), col("ce")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  /** Bucketed ANN: exact cosine, but only within LSH buckets. */
  def annTopK(emb: DataFrame, nBits: Int = 8, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = lshBuckets(emb, nBits)
    val withB = emb.join(b, "vec_id")
    val l = withB.select(col("bucket"), col("vec_id").as("query_id"), col("embedding").as("qe"))
    val r = withB.select(col("bucket"), col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val sims = l.join(r, "bucket").filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qe"), col("ce")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }
}
