package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed per partition via
  * mapPartitions (the Scala analogue of mapInPandas batching).
  *
  * Two tiers:
  *  - UNCOMPRESSED container formats (RIFF/WAVE PCM16 audio, P6 PPM images)
  *    get REAL decoders below — header parsing and sample/pixel feature
  *    extraction are pure byte arithmetic, no codec library needed, and the
  *    oracle queries recompute the features from the payload-generating
  *    arithmetic, so the parsers themselves are hash-checked end to end.
  *  - COMPRESSED codecs (jpeg/mp3/h264) still go through `decodeStub` —
  *    those need native libraries this container doesn't ship; the stub
  *    keeps the distributed plumbing (schema, batching, partitioning) real
  *    and clearly marks the codec call site.
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

  // ---- REAL uncompressed-format decoders (no codec libs needed) ----

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Deterministic RIFF/WAVE PCM16 mono payload per key: sample i =
    * ((key·131 + i·7919) mod 65536) − 32768 — pure row arithmetic, so the
    * oracle can recompute every decoded feature without touching bytes. */
  def synthesizeWav(df: DataFrame, keyCol: String, nSamples: Int = 64,
                    sampleRate: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    val schema = new StructType()
      .add("key", LongType, false).add("wav", BinaryType, false)
    val rdd = df.select(col(keyCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val key = r.getLong(0)
        val dataLen = nSamples * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1) // PCM, mono
          .putInt(sampleRate).putInt(sampleRate * 2)
          .putShort(2).putShort(16) // block align, bits
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < nSamples) {
          bb.putShort((((key * 131 + i.toLong * 7919) % 65536) - 32768).toShort)
          i += 1
        }
        Row(key, bb.array())
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val wavSchema: StructType = new StructType()
    .add("key", LongType, false)
    .add("sample_rate", LongType, false)
    .add("n_channels", LongType, false)
    .add("n_samples", LongType, false)
    .add("rms", DoubleType, false)

  /** REAL WAV decode: walks the RIFF chunk list, parses the PCM fmt header
    * (rate/channels/bits little-endian), and computes RMS amplitude over
    * the int16 samples — the standard audio-quality/silence filter of a
    * multimodal pipeline. Malformed payloads (bad magic, non-PCM16, missing
    * chunks) are DROPPED, the usual corpus-hygiene behavior. */
  def decodeWav(df: DataFrame, binCol: String, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(keyCol).cast("long"), col(binCol)).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val key = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") None
          else {
            var o = 12
            var rate = -1L; var ch = -1L; var bits = -1
            var dataOff = -1; var dataLen = 0
            while (o + 8 <= b.length) {
              // chunk size stays a Long (le32 is unsigned 0..2^32-1): a
              // crafted/corrupt size near 2^32 must not wrap negative and
              // stall or walk o backwards — the cursor advance below is
              // monotone (+>=8) in Long, then clamped to b.length, so the
              // walk always terminates and a damaged chunk just truncates
              // the payload (malformed rows are DROPPED, per the contract)
              val id = tag(b, o); val szL = le32(b, o + 4)
              if (id == "fmt " && o + 8 + 16 <= b.length) {
                val fmt = le16(b, o + 8)
                ch = le16(b, o + 10).toLong
                rate = le32(b, o + 12)
                bits = le16(b, o + 22)
                if (fmt != 1) rate = -1 // non-PCM -> reject
              } else if (id == "data") {
                dataOff = o + 8
                dataLen = math.min(szL, (b.length - dataOff).toLong).toInt
              }
              val next = o.toLong + 8L + szL + (szL & 1L) // word-aligned
              o = if (next > b.length) b.length else next.toInt
            }
            if (rate <= 0 || ch <= 0 || bits != 16 || dataOff < 0) None
            else {
              val n = dataLen / 2
              var ss = 0.0; var i = 0
              while (i < n) {
                val s = le16(b, dataOff + 2 * i).toShort.toDouble
                ss += s * s; i += 1
              }
              // unrounded: callers round with Spark's round() so the oracle
              // reproduces the exact same rounding convention
              val rms = if (n == 0) 0.0 else math.sqrt(ss / n)
              Some(Row(key, rate, ch, n.toLong, rms))
            }
          }
        }
      }
    spark.createDataFrame(rdd, wavSchema)
  }

  /** Deterministic P6 PPM payload per key: pixel byte k =
    * (key·37 + k·101) mod 256 over w·h RGB triplets. */
  def synthesizePpm(df: DataFrame, keyCol: String, w: Int = 16,
                    h: Int = 9): DataFrame = {
    val spark = df.sparkSession
    val schema = new StructType()
      .add("key", LongType, false).add("ppm", BinaryType, false)
    val rdd = df.select(col(keyCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val key = r.getLong(0)
        val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
        val px = new Array[Byte](w * h * 3)
        var k = 0
        while (k < px.length) {
          px(k) = (((key * 37 + k.toLong * 101) % 256) & 0xff).toByte
          k += 1
        }
        Row(key, header ++ px)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val ppmSchema: StructType = new StructType()
    .add("key", LongType, false)
    .add("width", LongType, false)
    .add("height", LongType, false)
    .add("mean_r", DoubleType, false)
    .add("mean_g", DoubleType, false)
    .add("mean_b", DoubleType, false)

  /** REAL PPM (P6) decode: parses the ASCII header (magic, dimensions,
    * maxval — whitespace/comment tolerant) and computes per-channel mean
    * intensities over the binary RGB payload. Malformed payloads DROPPED. */
  def decodePpm(df: DataFrame, binCol: String, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(keyCol).cast("long"), col(binCol)).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val key = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          var o = 0
          def skipWs(): Unit = {
            var go = true
            while (go && o < b.length) {
              val c = b(o).toChar
              if (c == '#') while (o < b.length && b(o).toChar != '\n') o += 1
              else if (c.isWhitespace) o += 1
              else go = false
            }
          }
          def int(): Option[Int] = {
            skipWs()
            val s = o
            while (o < b.length && b(o).toChar.isDigit) o += 1
            // cap at 9 digits: anything longer cannot be a sane dimension
            // and would throw NumberFormatException inside the task (the
            // contract is DROP malformed payloads, never fail the job)
            if (o == s || o - s > 9) None
            else Some(new String(b, s, o - s, "US-ASCII").toInt)
          }
          if (b.length < 2 || b(0) != 'P' || b(1) != '6') None
          else {
            o = 2
            (for { w <- int(); h <- int(); mx <- int() } yield (w, h, mx)) match {
              case Some((w, h, 255)) if w > 0 && h > 0 =>
                // exactly ONE whitespace byte after maxval, per the netpbm
                // P6 spec (a \r\n here means the raster starts with \n —
                // such text-mode-written files are malformed and get the
                // usual drop-or-truncate treatment)
                o += 1
                // dims are individually <= 999999999 (9-digit cap above) so
                // w*h needs Long; after the length check n*3 <= b.length
                // fits Int again
                val nL = w.toLong * h
                if ((b.length - o).toLong < nL * 3) None
                else {
                  val n = nL.toInt
                  var sr = 0L; var sg = 0L; var sb = 0L; var k = 0
                  while (k < n) {
                    sr += b(o + 3 * k) & 0xff
                    sg += b(o + 3 * k + 1) & 0xff
                    sb += b(o + 3 * k + 2) & 0xff
                    k += 1
                  }
                  // unrounded (see decodeWav note)
                  def m(s: Long) = s.toDouble / n
                  Some(Row(key, w.toLong, h.toLong, m(sr), m(sg), m(sb)))
                }
              case _ => None
            }
          }
        }
      }
    spark.createDataFrame(rdd, ppmSchema)
  }

  /** STUB DECODE (clearly marked): a real deployment would decode COMPRESSED
    * image/audio payloads here with a native library, batched per partition.
    * The fake derives deterministic pseudo-features from the bytes so tests
    * can assert the full distributed plumbing (schema, partitioning, batch
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
