package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling & dataset splitting — the reproducibility
  * primitives of a training-data pipeline. Spark's own `df.sample(seed)`
  * and `rand(seed)` are PARTITION-LAYOUT dependent: the same row draws a
  * different variate when the file splits, cluster size, or upstream
  * shuffle change, so a "fixed" train/val split silently drifts across
  * reruns at scale. These ops instead hash a stable key column with the
  * same pure positive-BIGINT mixed-congruential arithmetic as
  * `algos.RandomWalk` — the decision is a function of the ROW, not the
  * layout: reproducible on any cluster size, resumable, and exactly
  * replayable by the DuckDB oracle (and by any other engine a consumer
  * audits the split with).
  */
object Sampling {

  val M = 2147483647L // 2^31 - 1

  /** exact integer thresholds for cumulative fractions — public so oracle
    * SQL is generated from the SAME longs the operator compares against */
  def thresholds(fractions: Seq[Double]): Seq[Long] =
    fractions.scanLeft(0.0)(_ + _).tail.map(c => (c * M).toLong)

  /** uniform-ish bucket in [0, M) from a non-negative integer key. `salt`
    * selects a DIFFERENT multiplier (not an additive shift, which would
    * only rotate the threshold window and leave two salted samples ~fully
    * overlapped): multiplicative hashes with distinct multipliers mod the
    * prime M are near-independent on any key sequence. */
  def saltedMultiplier(salt: Long): Long = {
    val a = (2654435761L + (salt % M) * 40503L) % M
    require(a != 0, s"degenerate salt $salt")
    a
  }

  def hashBucket(key: Column, salt: Long = 0L): Column =
    (key % M) * lit(saltedMultiplier(salt)) % M

  /** keep each row with probability ≈ p (exact threshold floor(p·M)),
    * decided by the key hash — deterministic Bernoulli sampling */
  def bernoulli(df: DataFrame, key: Column, p: Double,
                salt: Long = 0L): DataFrame = {
    require(p >= 0 && p <= 1)
    df.filter(hashBucket(key, salt) < lit((p * M).toLong))
  }

  /** assign every row a split label by hash-threshold fractions (e.g.
    * train 0.8 / val 0.1 / test 0.1). Fractions are converted to exact
    * integer thresholds driver-side, so both engines compare against the
    * same BIGINT literals. */
  def split(df: DataFrame, key: Column, fractions: Seq[(String, Double)],
            salt: Long = 0L): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val h = hashBucket(key, salt)
    val cum = thresholds(fractions.map(_._2))
    val expr = fractions.init.zip(cum.init).foldRight(
      lit(fractions.last._1)) { case (((name, _), thr), elseE) =>
      when(h < thr, name).otherwise(elseE)
    }
    df.withColumn("split", expr)
  }

  /** deterministic fixed-SIZE sample: the n rows with the smallest
    * (hash, key) — a reproducible stand-in for reservoir sampling whose
    * membership is again a pure function of the rows, not the layout or
    * arrival order. Scale shape: per-partition top-n + driver merge of
    * n·parts candidates (TakeOrderedAndProject), no global sort — fine for
    * the n ≤ ~10⁶ a sample means; key is the tiebreak so hash collisions
    * cannot make the cut set ambiguous. */
  def topN(df: DataFrame, key: Column, n: Int, salt: Long = 0L): DataFrame = {
    require(n >= 0)
    df.orderBy(hashBucket(key, salt).asc, key.asc).limit(n)
  }

  /** per-group Bernoulli STRATIFIED sampling: each row's keep decision uses
    * its group's rate (groups absent from `rates` use `default`). The
    * balanced-corpus primitive — e.g. downweight the dominant language. */
  def stratified(df: DataFrame, key: Column, group: Column,
                 rates: Seq[(String, Double)], default: Double = 1.0,
                 salt: Long = 0L): DataFrame = {
    require((default +: rates.map(_._2)).forall(p => p >= 0 && p <= 1))
    val thr = rates.foldRight(lit((default * M).toLong)) {
      case ((g, p), elseE) => when(group === g, lit((p * M).toLong))
        .otherwise(elseE)
    }
    df.filter(hashBucket(key, salt) < thr)
  }

  /** cap every group's contribution at ≈`cap` rows (in expectation): keep
    * rate_g = min(1, cap/n_g) computed with exact integer arithmetic
    * (`cap·M div n_g` — cap·M < 2⁵³ keeps the product well inside BIGINT,
    * and integer div matches the oracle's `//` exactly, where a
    * floor-of-double-division could round across an integer boundary once
    * n_g is large). The α→0 end of temperature-mixing resampling
    * (XLM-R-style corpus rebalancing) with a deterministic, layout-free
    * decision. Group counts are one hash-agg over the input; the rate join
    * is on the (small, bounded-by-#groups) count relation — AQE broadcasts
    * it. */
  def capPerGroup(df: DataFrame, key: Column, group: Column, cap: Long,
                  salt: Long = 0L): DataFrame = {
    require(cap >= 0 && cap * M > 0, s"cap $cap overflows cap*M")
    val counts = df.groupBy(group.as("_g")).agg(count(lit(1)).as("_n"))
    df.join(counts, group === col("_g"))
      .filter(hashBucket(key, salt) <
        least(expr(s"${cap * M} div _n"), lit(M)))
      .drop("_g", "_n")
  }
}
