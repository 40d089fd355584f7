package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Construction / format-interchange family (SURVEY.md §2.1):
  * the reference's from_csr/from_csc/from_dense/from_dicts/to_coo and the
  * ss.import/export formats collapse, Spark-side, to conversions between
  * the edge-list DataFrame and the packed CSR-bucket layout, plus small
  * driver-side conveniences for tests.
  */
object Formats {

  /** from_csr (`matrix.py:1071`): packed rows (src, dsts[], vals[]) → COO.
    * posexplode keeps the within-row position so values line up. */
  def fromCsrBuckets(packed: DataFrame): DataFrame =
    packed.select(col("src"), posexplode(arrays_zip(col("dsts"), col("vals"))))
      .select(col("src"), col("col.dsts").as("dst"), col("col.vals").as("v"))

  /** to_csr (`matrix.py:1647`): COO → packed rows, dsts sorted per src. */
  def toCsrBuckets(coo: DataFrame): DataFrame =
    coo.groupBy("src")
      .agg(sort_array(collect_list(struct(col("dst"), col("v")))).as("_z"))
      .select(col("src"), col("_z.dst").as("dsts"), col("_z.v").as("vals"))

  /** from_csc (`matrix.py:1119`): packed columns (dst, srcs[], vals[]) → COO.
    * A CSC bucket is the CSR bucket of the transpose — same packed layout
    * keyed on dst (transpose is a free column swap, SURVEY.md §1.4). */
  def fromCscBuckets(packed: DataFrame): DataFrame =
    fromCsrBuckets(packed.select(col("dst").as("src"),
      col("srcs").as("dsts"), col("vals")))
      .select(col("dst").as("src"), col("src").as("dst"), col("v"))

  /** to_csc (`matrix.py:1695`): COO → packed columns, srcs sorted per dst. */
  def toCscBuckets(coo: DataFrame): DataFrame =
    toCsrBuckets(coo.select(col("dst").as("src"), col("src").as("dst"), col("v")))
      .select(col("src").as("dst"), col("dsts").as("srcs"), col("vals"))

  /** from_dense (`matrix.py:1398`): local 2-D array (row-major) with an
    * optional missing sentinel → sparse COO DataFrame. Driver-side (test
    * fixtures only). */
  def fromDense(spark: SparkSession, rows: Seq[Seq[Double]],
                missing: Option[Double] = None): GrbMatrix = {
    val triples = for {
      (r, i) <- rows.zipWithIndex
      (v, j) <- r.zipWithIndex
      if !missing.contains(v)
    } yield (i.toLong, j.toLong, v)
    GrbMatrix.fromCoo(spark, triples, GrbShape(rows.size, if (rows.isEmpty) 0 else rows.head.size))
  }

  /** numeric driver-side coercion — any numeric dtype, not just FP64 (the
    * r2 getDouble conveniences threw on INT64/FP32 collections). */
  private[core] def asDouble(v: Any): Double = v match {
    case d: Double => d
    case n: Number => n.doubleValue
    case b: Boolean => if (b) 1.0 else 0.0
    case other => throw new IllegalArgumentException(
      s"not a numeric value: $other (${other.getClass}); use the *Rows/Any export for record dtypes")
  }

  /** to_dense (`matrix.py:1461`): driver-side export for small fixtures;
    * dtype-generic for numerics (asDouble). */
  def toDense(m: GrbMatrix, fill: Double = 0.0): Array[Array[Double]] = {
    val out = Array.fill(m.shape.nrows.toInt, m.shape.ncols.toInt)(fill)
    m.df.collect().foreach(r => out(r.getLong(0).toInt)(r.getLong(1).toInt) = asDouble(r.get(2)))
    out
  }

  /** dtype-agnostic dense export (records/UDTs included): missing = null. */
  def toDenseAny(m: GrbMatrix): Array[Array[Any]] = {
    val out = Array.fill[Any](m.shape.nrows.toInt, m.shape.ncols.toInt)(null)
    m.df.collect().foreach(r => out(r.getLong(0).toInt)(r.getLong(1).toInt) = r.get(2))
    out
  }

  /** from_dicts (`matrix.py:1519`): {row → {col → val}} convenience. */
  def fromDicts(spark: SparkSession, d: Map[Long, Map[Long, Double]],
                shape: GrbShape): GrbMatrix =
    GrbMatrix.fromCoo(spark,
      d.toSeq.flatMap { case (i, m) => m.toSeq.map { case (j, v) => (i, j, v) } }, shape)

  /** to_coo sorted export (`matrix.py:525`); numeric dtype-generic. */
  def toCoo(m: GrbMatrix): Seq[(Long, Long, Double)] =
    m.df.orderBy("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), asDouble(r.get(2)))).toSeq

  /** dtype-agnostic sorted COO export (records/UDTs included). */
  def toCooAny(m: GrbMatrix): Seq[(Long, Long, Any)] =
    m.df.orderBy("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSeq

  /** Vector.from_dense (`vector.py:849`): local array with optional missing
    * sentinel → sparse vector. Driver-side (test fixtures only). */
  def fromDenseVector(spark: SparkSession, values: Seq[Double],
                      missing: Option[Double] = None): GrbVector = {
    val pairs = values.zipWithIndex.collect {
      case (v, i) if !missing.contains(v) => (i.toLong, v)
    }
    GrbVector.fromPairs(spark, pairs, values.size.toLong)
  }

  /** Vector.to_dense (`vector.py` dense export) with fill for missing;
    * numeric dtype-generic. */
  def toDenseVector(v: GrbVector, fill: Double = 0.0): Array[Double] = {
    val out = Array.fill(v.size.toInt)(fill)
    v.df.collect().foreach(r => out(r.getLong(0).toInt) = asDouble(r.get(1)))
    out
  }

  /** Vector.from_dict (`vector.py:2051`). */
  def fromDictVector(spark: SparkSession, d: Map[Long, Double], size: Long): GrbVector =
    GrbVector.fromPairs(spark, d.toSeq, size)

  /** Matrix.to_dicts (`matrix.py:1801`): {row → {col → val}} export;
    * numeric dtype-generic. */
  def toDicts(m: GrbMatrix): Map[Long, Map[Long, Double]] =
    m.df.collect()
      .map(r => (r.getLong(0), r.getLong(1), asDouble(r.get(2))))
      .groupBy(_._1)
      .map { case (i, xs) => i -> xs.map(x => x._2 -> x._3).toMap }

  /** Matrix Market coordinate-format reader (`io/_matrixmarket.py:8`) —
    * plain-text parse for small parity fixtures; general/symmetric,
    * real/integer/pattern fields. 1-based indices → 0-based. */
  def mmread(spark: SparkSession, path: String): GrbMatrix = {
    val lines = scala.io.Source.fromFile(path).getLines()
      .map(_.trim).filter(l => l.nonEmpty).toSeq
    val header = lines.head.toLowerCase
    require(header.startsWith("%%matrixmarket matrix coordinate"),
      s"unsupported MatrixMarket header: $header")
    val symmetric = header.contains("symmetric")
    val pattern = header.contains("pattern")
    val body = lines.filterNot(_.startsWith("%"))
    val Array(nr, nc, _) = body.head.split("\\s+").map(_.toLong)
    val triples = body.tail.flatMap { l =>
      val p = l.split("\\s+")
      val (i, j) = (p(0).toLong - 1, p(1).toLong - 1)
      val v = if (pattern) 1.0 else p(2).toDouble
      if (symmetric && i != j) Seq((i, j, v), (j, i, v)) else Seq((i, j, v))
    }
    GrbMatrix.fromCoo(spark, triples, GrbShape(nr, nc))
  }

  /** Matrix Market writer (`io/_matrixmarket.py:98`), general/real. */
  def mmwrite(m: GrbMatrix, path: String): Unit = {
    val triples = toCoo(m)
    val sb = new StringBuilder
    sb.append("%%MatrixMarket matrix coordinate real general\n")
    sb.append(s"${m.shape.nrows} ${m.shape.ncols} ${triples.size}\n")
    triples.foreach { case (i, j, v) => sb.append(s"${i + 1} ${j + 1} $v\n") }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }
}
