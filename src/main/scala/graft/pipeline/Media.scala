package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The actual codec step is STUBBED
  * (no image/audio libraries in this container) behind a deterministic fake
  * that derives "features" from the raw bytes — but the Spark-side shape is
  * real: schema contracts, per-partition batched processing via
  * mapPartitions (the Scala analogue of mapInPandas batching), and
  * codegen-friendly metadata projections.
  */
object Media {

  /** Pure-Column metadata projection over a binary payload column:
    * byte length + md5 — stays inside whole-stage codegen. */
  def metadata(df: DataFrame, binCol: String, keyCol: String): DataFrame =
    df.select(col(keyCol), length(col(binCol)).as("n_bytes"),
      md5(col(binCol)).as("content_md5"))

  val decodedSchema: StructType = new StructType()
    .add("key", LongType, false)
    .add("n_bytes", IntegerType, false)
    .add("fake_width", IntegerType, false)
    .add("fake_height", IntegerType, false)
    .add("fake_mean_luma", DoubleType, false)

  /** STUB DECODE (clearly marked): a real deployment would decode the image/
    * audio payload here with a native library, batched per partition. The
    * fake derives deterministic pseudo-features from the bytes so tests can
    * assert the full distributed plumbing (schema, partitioning, batch
    * shape) end to end. */
  def decodeStub(df: DataFrame, binCol: String, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(keyCol).cast("long"), col(binCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val key = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // === STUB: replace with real codec call ===
        val w = 160 + (if (bytes.length > 0) (bytes(0) & 0xff) else 0)
        val h = 90 + (if (bytes.length > 1) (bytes(1) & 0xff) else 0)
        var s = 0L; var i = 0
        while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
        val luma = if (bytes.length == 0) 0.0 else s.toDouble / bytes.length / 255.0
        Row(key, bytes.length, w, h, math.rint(luma * 1e6) / 1e6)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
