package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Comparison, power, and the `ss.*` positional utilities
  * (SURVEY.md §2.2/§2.5/§2.7) as extension methods over the core types. */
object Extras {

  /** Aggregator catalog (reference `graphblas/core/operator/agg.py`):
    * monoid folds, semiring recipes, and composite/finalized aggregators,
    * all as single Catalyst aggregate expressions. */
  val aggregators: Map[String, Column => Column] = Map(
    "sum" -> (sum(_)),
    "prod" -> (c => Ops.timesMonoid.agg(c)),
    "all" -> (c => bool_and(c.cast("boolean"))),
    "any" -> (c => bool_or(c.cast("boolean"))),
    "min" -> (min(_)),
    "max" -> (max(_)),
    "any_value" -> (first(_)),
    // band/bor monoid reductions under their aggregator names (`agg.py:354-355`)
    "bitwise_all" -> (c => bit_and(c.cast("long"))),
    "bitwise_any" -> (c => bit_or(c.cast("long"))),
    "count" -> (c => count(c)),
    "count_nonzero" -> (c => count(when(c =!= 0, 1))),
    "count_zero" -> (c => count(when(c === 0, 1))),
    "sum_of_squares" -> (c => sum(c * c)),
    "sum_of_inverses" -> (c => sum(lit(1.0) / c)),
    // 1 if any element, null (= missing) on empty — reference agg.exists
    // (`agg.py:359-380`), matching the None-on-empty convention of aggregate()
    "exists" -> (c => when(count(c) > 0, lit(1))),
    "hypot" -> (c => sqrt(sum(c * c))),
    // max-shifted streaming logsumexp (Aggs) — the naive log(sum(exp))
    // saturates to +inf for any input ≳710 (the reference inherits numpy's
    // stable recipe, `agg.py:382-404`)
    "logaddexp" -> Aggs.logSumExp,
    "logaddexp2" -> Aggs.logSumExp2,
    "L0norm" -> (c => count(when(c =!= 0, 1)).cast("double")),
    "L1norm" -> (c => sum(abs(c))),
    "L2norm" -> (c => sqrt(sum(c * c))),
    "Linfnorm" -> (c => max(abs(c))),
    "mean" -> (avg(_)),
    "peak_to_peak" -> (c => max(c) - min(c)),
    "varp" -> (var_pop(_)),
    "vars" -> (var_samp(_)),
    "stdp" -> (stddev_pop(_)),
    "stds" -> (stddev_samp(_)),
    "geometric_mean" -> (c => exp(avg(log(c)))),
    "harmonic_mean" -> (c => count(c).cast("double") / sum(lit(1.0) / c)),
    "root_mean_square" -> (c => sqrt(avg(c * c))),
    // positional (reference ss.argmin/argmax/first/last, agg.py:533-733):
    // min_by/max_by and first/last over a defined sort
    "argmin" -> (c => min_by(col(Names.ID), c)),
    "argmax" -> (c => max_by(col(Names.ID), c)),
    "first" -> (c => min_by(c, col(Names.ID))),
    "last" -> (c => max_by(c, col(Names.ID))),
    "first_index" -> (_ => min(col(Names.ID))),
    "last_index" -> (_ => max(col(Names.ID))))

  implicit final class MatrixExtras(private val m: GrbMatrix) extends AnyVal {
    import Names._

    /** whole-collection equality incl. structure (`matrix.py:373`) */
    def isequal(other: GrbMatrix): Boolean =
      m.shape == other.shape && isCloseCount(other, exact = true) == 0

    /** isclose (`matrix.py:417-461`): same structure AND
      * |a-b| <= max(rel*max(|a|,|b|), abs) per element */
    def isclose(other: GrbMatrix, relTol: Double = 1e-7, absTol: Double = 0.0): Boolean =
      m.shape == other.shape &&
        isCloseCount(other, exact = false, relTol, absTol) == 0

    private def isCloseCount(other: GrbMatrix, exact: Boolean,
                             relTol: Double = 0, absTol: Double = 0): Long = {
      val a = m.df.select(col(SRC), col(DST), col(V).as("_va"), lit(true).as("_pa"))
      val b = other.df.select(col(SRC), col(DST), col(V).as("_vb"), lit(true).as("_pb"))
      val j = a.join(b, Seq(SRC, DST), "full_outer")
      val bad =
        if (exact) j.filter(col("_pa").isNull || col("_pb").isNull || col("_va") =!= col("_vb"))
        else j.filter(col("_pa").isNull || col("_pb").isNull ||
          abs(col("_va") - col("_vb")) >
            greatest(lit(relTol) * greatest(abs(col("_va")), abs(col("_vb"))), lit(absTol)))
      bad.limit(1).count()
    }

    /** power(n) by repeated squaring (`matrix.py:2840`). power(0) is the
      * semiring's identity diagonal I (I ⊗-absorbs: I @ A = A); `one` is the
      * ⊗-identity value — 1.0 for times/pair, 0.0 for plus (min_plus), etc.
      * State re-materialized between squarings to keep plans flat. */
    def power(n: Int, s: Semiring, one: Column = lit(1.0)): GrbMatrix = {
      require(n >= 0, "power requires n >= 0")
      require(m.shape.nrows == m.shape.ncols, "power needs a square matrix")
      if (n == 0) {
        val spark = m.df.sparkSession
        return GrbMatrix(
          spark.range(m.shape.nrows)
            .select(col("id").as(SRC), col("id").as(DST), one.as(V)),
          m.shape)
      }
      var result: Option[GrbMatrix] = None
      var base = m
      var k = n
      while (k > 0) {
        if ((k & 1) == 1)
          result = Some(result.fold(base)(r => GrbMatrix(
            Ckpt.materialize(r.mxm(base, s).df).df, r.shape)))
        k >>= 1
        if (k > 0) base = GrbMatrix(Ckpt.materialize(base.mxm(base, s).df).df, base.shape)
      }
      result.get
    }

    /** ss.selectk (`core/ss/matrix.py:3806`): k largest/smallest per row,
      * deterministic tie-break on dst. */
    def selectK(k: Int, largest: Boolean = true): GrbMatrix = {
      val ord = if (largest) Seq(col(V).desc, col(DST)) else Seq(col(V).asc, col(DST))
      val w = Window.partitionBy(SRC).orderBy(ord: _*)
      GrbMatrix(m.df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= k).drop("_rn"), m.shape)
    }

    /** ss.sort (`core/ss/matrix.py:3983` GxB_Matrix_sort): per-row sort of
      * stored values, returning BOTH the sorted-values matrix (dense column
      * positions 0..k-1 per row) and the PERMUTATION matrix (at each dense
      * position, the source column index of that element) — the reference's
      * (values, permutation) pair. Ties break on dst for determinism. */
    def sortRowwise(asc: Boolean = true): (GrbMatrix, GrbMatrix) = {
      val ord = if (asc) Seq(col(V).asc, col(DST)) else Seq(col(V).desc, col(DST))
      val w = Window.partitionBy(SRC).orderBy(ord: _*)
      val ranked = m.df.withColumn("_p", (row_number().over(w) - 1).cast("long"))
      (GrbMatrix(ranked.select(col(SRC), col("_p").as(DST), col(V)), m.shape),
        GrbMatrix(ranked.select(col(SRC), col("_p").as(DST),
          col(DST).cast("long").as(V)), m.shape))
    }

    /** ss.head for matrices (`core/ss/matrix.py:44`): first n stored
      * elements in (row, col) order when sort=true — TakeOrderedAndProject,
      * no full sort; sort=false is a plain limit (order unguaranteed, as
      * the reference documents). */
    def head(n: Int, sort: Boolean = true): GrbMatrix =
      if (sort) GrbMatrix(m.df.orderBy(col(SRC), col(DST)).limit(n), m.shape)
      else GrbMatrix(m.df.limit(n), m.shape)

    /** ss.compactify (`core/ss/matrix.py:3869`): per-row squeeze of column
      * indices to dense 0..k-1 keeping dst order. */
    def compactify(): GrbMatrix = {
      val w = Window.partitionBy(SRC).orderBy(DST)
      GrbMatrix(m.df.withColumn("_rn", (row_number().over(w) - 1).cast("long"))
        .select(col(SRC), col("_rn").as(DST), col(V)), m.shape)
    }

    /** ss.scan along rows (`core/ss/prefix_scan.py`): running monoid fold
      * over each row in dst order — a Catalyst window frame replaces the
      * reference's log-depth blocked algorithm. */
    def scanRowwise(agg: Column => Column = sum): GrbMatrix = {
      val w = Window.partitionBy(SRC).orderBy(DST)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      GrbMatrix(m.df.select(col(SRC), col(DST), agg(col(V)).over(w).as(V)), m.shape)
    }

    /** setdiag (`matrix.py:2905`): write value s on the k-th diagonal
      * (merge semantics: overwrite existing, insert missing). */
    def setdiag(s: Column, k: Long = 0): GrbMatrix = {
      val n = math.min(m.shape.nrows, m.shape.ncols - k).max(0)
      val spark = m.df.sparkSession
      val diag = spark.range(n).select(col("id").as(SRC), (col("id") + k).as(DST), s.as(V))
        .filter(col(DST) >= 0 && col(DST) < m.shape.ncols)
      GrbMatrix(
        m.df.join(diag.select(SRC, DST), Seq(SRC, DST), "left_anti").unionByName(diag),
        m.shape)
    }

    /** full setdiag(values, k, mask, accum) (`matrix.py:2905`): write a
      * VECTOR onto the k-th diagonal through the standard write clause —
      * the off-diagonal region is untouched; on the diagonal, `values[i]`
      * lands at (i, i+k), merged per accum, scoped by the (diagonal-key)
      * mask; diagonal cells not covered by `values` are kept (no-accum
      * writes overwrite only where values is present, matching the
      * reference's ewise construction of the new diagonal). */
    def setdiag(values: GrbVector, k: Long, mask: Option[GrbMask],
                accum: Option[BinaryOp]): GrbMatrix = {
      val diagNew = values.df
        .select(col(ID).as(SRC), (col(ID) + k).as(DST), col(V))
        .filter(col(SRC) >= 0 && col(SRC) < m.shape.nrows &&
                col(DST) >= 0 && col(DST) < m.shape.ncols)
      val onDiag  = m.df.filter(col(DST) - col(SRC) === k)
      val offDiag = m.df.filter(col(DST) - col(SRC) =!= k)
      val merged = accum match {
        case Some(_) => Kernels.write(onDiag, diagNew, Seq(SRC, DST), mask, accum)
        case None =>
          // no accum: present `values` cells overwrite, absent ones keep C's
          val overwritten = onDiag
            .join(diagNew.select(SRC, DST), Seq(SRC, DST), "left_anti")
            .unionByName(diagNew)
          mask.fold(overwritten) { mk =>
            Kernels.maskFilter(overwritten, mk, Seq(SRC, DST))
              .unionByName(Kernels.maskFilter(onDiag, ~mk, Seq(SRC, DST)))
          }
      }
      GrbMatrix(offDiag.unionByName(merged), m.shape)
    }

    /** ss.flatten (`core/ss/matrix.py:3706`): row-major linearization
      * i*ncols+j → Vector of size nrows*ncols. */
    def flatten(): GrbVector =
      GrbVector(m.df.select((col(SRC) * m.shape.ncols + col(DST)).as(ID), col(V)),
        m.shape.nrows * m.shape.ncols)

    /** ss.reshape (`core/ss/matrix.py:3732`): inverse of flatten for a new
      * shape (row-major). */
    def reshape(nrows: Long, ncols: Long): GrbMatrix = {
      require(nrows * ncols == m.shape.nrows * m.shape.ncols, "size must match")
      val lin = col(SRC) * m.shape.ncols + col(DST)
      // integral divide: Column `/` on longs is FP division, which is inexact
      // above 2^53 — go through decimal(38,0), exact over the full long range
      val src = ((lin.cast("decimal(38,0)") - pmod(lin, lit(ncols))) / ncols)
        .cast("long")
      GrbMatrix(m.df.select(src.as(SRC), pmod(lin, lit(ncols)).as(DST), col(V)),
        GrbShape(nrows, ncols))
    }

    /** ss.split (`core/ss/matrix.py:280`): tile decomposition by index range. */
    def split(rowChunk: Long, colChunk: Long): Map[(Long, Long), GrbMatrix] = {
      val tiles = for {
        i <- 0L until (m.shape.nrows + rowChunk - 1) / rowChunk
        j <- 0L until (m.shape.ncols + colChunk - 1) / colChunk
      } yield (i, j)
      tiles.map { case (ti, tj) =>
        (ti, tj) -> GrbMatrix(
          m.df.filter(col(SRC) >= ti * rowChunk && col(SRC) < (ti + 1) * rowChunk &&
            col(DST) >= tj * colChunk && col(DST) < (tj + 1) * colChunk)
            .select((col(SRC) - ti * rowChunk).as(SRC), (col(DST) - tj * colChunk).as(DST), col(V)),
          GrbShape(math.min(rowChunk, m.shape.nrows - ti * rowChunk),
            math.min(colChunk, m.shape.ncols - tj * colChunk)))
      }.toMap
    }
  }

  /** ss.concat (`gb.ss.concat`, `ss/_core.py:72`): block concat of tiles. */
  def concat(tiles: Map[(Long, Long), GrbMatrix], rowChunk: Long, colChunk: Long): GrbMatrix = {
    import Names._
    val parts = tiles.map { case ((ti, tj), t) =>
      t.df.select((col(SRC) + ti * rowChunk).as(SRC), (col(DST) + tj * colChunk).as(DST), col(V))
    }
    val nrows = tiles.keys.map(_._1).max * rowChunk +
      tiles(tiles.keys.maxBy(_._1)).shape.nrows
    val ncols = tiles.keys.map(_._2).max * colChunk +
      tiles(tiles.keys.maxBy(_._2)).shape.ncols
    GrbMatrix(parts.reduce(_ unionByName _), GrbShape(nrows, ncols))
  }

  implicit final class VectorExtras(private val v: GrbVector) extends AnyVal {
    import Names._

    def isequal(other: GrbVector): Boolean = {
      val a = v.df.select(col(ID), col(V).as("_va"), lit(true).as("_pa"))
      val b = other.df.select(col(ID), col(V).as("_vb"), lit(true).as("_pb"))
      v.size == other.size &&
        a.join(b, Seq(ID), "full_outer")
          .filter(col("_pa").isNull || col("_pb").isNull || col("_va") =!= col("_vb"))
          .limit(1).count() == 0
    }

    def isclose(other: GrbVector, relTol: Double = 1e-7, absTol: Double = 0.0): Boolean = {
      val a = v.df.select(col(ID), col(V).as("_va"), lit(true).as("_pa"))
      val b = other.df.select(col(ID), col(V).as("_vb"), lit(true).as("_pb"))
      v.size == other.size &&
        a.join(b, Seq(ID), "full_outer")
          .filter(col("_pa").isNull || col("_pb").isNull ||
            abs(col("_va") - col("_vb")) >
              greatest(lit(relTol) * greatest(abs(col("_va")), abs(col("_vb"))), lit(absTol)))
          .limit(1).count() == 0
    }

    /** aggregate with a named Aggregator from the catalog */
    def aggregate(name: String): Option[Any] = {
      val r = v.df.agg(aggregators(name)(col(V)).as("r")).collect()(0)
      if (r.isNullAt(0)) None else Some(r.get(0))
    }

    /** ss.selectk for vectors (`core/ss/vector.py:1403`): k largest/smallest
      * stored elements, deterministic tie-break on id. One global top-k —
      * Spark runs sort+limit as per-partition top-k then a k-row merge. */
    def selectK(k: Int, largest: Boolean = true): GrbVector = {
      val ord = if (largest) Seq(col(V).desc, col(ID)) else Seq(col(V).asc, col(ID))
      v.copy(df = v.df.orderBy(ord: _*).limit(k))
    }

    /** ss.sort for vectors (`core/ss/vector.py:1559`): sorted values at
      * dense indices 0..k-1 plus the permutation (original ids). Single
      * window partition — driver-fixture scale only, like scan. */
    def sortValues(asc: Boolean = true): (GrbVector, GrbVector) = {
      val ord = if (asc) Seq(col(V).asc, col(ID)) else Seq(col(V).desc, col(ID))
      val w = Window.orderBy(ord: _*)
      val ranked = v.df.withColumn("_p", (row_number().over(w) - 1).cast("long"))
      (v.copy(df = ranked.select(col("_p").as(ID), col(V))),
        v.copy(df = ranked.select(col("_p").as(ID), col(ID).cast("long").as(V))))
    }

    /** ss.compactify for vectors (`core/ss/vector.py:1453`): squeeze stored
      * indices to dense 0..nvals-1 keeping id order. Single window partition
      * — driver-fixture scale only, like sortValues/scan (VERDICT r3 item 4);
      * use `compactifyPartitioned` for distributed data. */
    def compactify(): GrbVector = {
      val w = Window.orderBy(ID)
      v.copy(df = v.df.withColumn("_rn", (row_number().over(w) - 1).cast("long"))
        .select(col("_rn").as(ID), col(V)))
    }

    /** Scale path for compactify: ids are range-bucketed by value (order-
      * preserving across buckets), ranked LOCALLY per bucket, and shifted by
      * an exclusive prefix-sum of bucket counts — the global sort becomes
      * `buckets` parallel window partitions plus one buckets-row side
      * relation (broadcast). Result is identical to compactify() for any
      * bucket count. */
    def compactifyPartitioned(buckets: Int = 64): GrbVector = {
      val withB = v.df.withColumn("_b", least(lit((buckets - 1).toLong),
        floor(col(ID).cast("double") * buckets / v.size).cast("long")))
      val wLocal = Window.partitionBy("_b").orderBy(ID)
      // exclusive prefix of bucket counts: `buckets` rows — the only global
      // window runs over this tiny relation, not the data
      val wOff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
      val offsets = withB.groupBy("_b").agg(count(lit(1)).as("_c"))
        .select(col("_b"), coalesce(sum("_c").over(wOff), lit(0L)).as("_off"))
      v.copy(df = withB
        .withColumn("_rn", (row_number().over(wLocal) - 1).cast("long"))
        .join(broadcast(offsets), Seq("_b"))
        .select((col("_off") + col("_rn")).as(ID), col(V)))
    }

    /** ss.head for vectors (`core/ss/vector.py:32`): first n stored
      * elements. sort=true is the deterministic contract (the n smallest
      * ids) and plans as TakeOrderedAndProject — per-partition top-n plus
      * an n-row driver merge, never a full sort; sort=false matches the
      * reference's "order not guaranteed" and is a plain limit. */
    def head(n: Int, sort: Boolean = true): GrbVector =
      if (sort) v.copy(df = v.df.orderBy(col(ID)).limit(n))
      else v.copy(df = v.df.limit(n))

    /** ss.scan for vectors (`core/ss/prefix_scan.py`): running fold in id
      * order. Single window partition — driver-fixture scale only; use the
      * matrix rowwise scan for partitioned data. */
    def scan(agg: Column => Column = sum): GrbVector = {
      val w = Window.orderBy(ID)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      v.copy(df = v.df.select(col(ID), agg(col(V)).over(w).as(V)))
    }

    /** apply(indexunaryop, thunk) for vectors (`vector.py:1380` IndexOp
      * variant): expression over (v, i). */
    def applyIndexed(f: (Column, Column) => Column): GrbVector =
      v.copy(df = v.df.select(col(ID), f(col(V), col(ID)).as(V)))
  }
}
