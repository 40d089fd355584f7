package graft.pipeline

/** Pure-JVM baseline JPEG codec, written from the public JPEG standard
  * (ITU-T T.81 / ISO 10918-1): marker parsing, DQT/DHT/SOF0/SOS/DRI,
  * canonical Huffman entropy decode with DC prediction and byte
  * de-stuffing, restart-marker handling, dequantization + de-zigzag,
  * double-precision separable IDCT, per-component sample planes with
  * replication upsampling, and YCbCr→RGB. Supported: 8-bit baseline and
  * extended sequential Huffman (SOF0/SOF1), 1 or 3 components, any
  * sampling factors. Progressive (SOF2), arithmetic coding, 12-bit and
  * hierarchical modes are out of tier and rejected (DROPPED by callers).
  *
  * The encoder half writes the restricted fixture class whose lossy chain
  * is EXACT: block-constant grayscale with DC quantizer 8, where
  * DC = 8·(v−128) quantizes to the integer v−128 and every AC
  * coefficient is exactly zero — so the DuckDB oracle can recompute the
  * decoded means from pure arithmetic even though JPEG is lossy in
  * general. The general decode path (full AC, real quant tables, 4:2:0
  * color) is cross-checked against the JDK's independent ImageIO JPEG
  * codec in tests.
  */
private[graft] object Jpeg {

  // zigzag index -> natural (row-major) index
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var i = 0; var x = 0; var y = 0; var up = true
    while (i < 64) {
      z(i) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      i += 1
    }
    z
  }

  // IDCT basis: cosTab(u)(x) = C(u)/2 * cos((2x+1)uπ/16)
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // canonical code tables per T.81 Annex C
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        if (counts(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += counts(len - 1); k += counts(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def symbol(len: Int, code: Int): Int = symbols(valPtr(len) + code - minCode(len))
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var sawMarker = false   // hit a non-stuffed marker inside entropy data
    var marker = 0
    def align(): Unit = { acc = 0; n = 0 }
    /** read one bit; -1 on marker/EOF */
    def bit(): Int = {
      if (n == 0) {
        if (sawMarker || pos >= b.length) return -1
        var byte = b(pos) & 0xff; pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) { sawMarker = true; return -1 }
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed 0xFF data byte
          else { sawMarker = true; marker = next; pos += 1; return -1 }
        }
        acc = byte; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { val bt = bit(); if (bt < 0) return -1; v = (v << 1) | bt; i += 1 }
      v
    }
    def decodeHuff(h: Huff): Int = {
      var code = 0; var len = 1
      while (len <= 16) {
        val bt = bit(); if (bt < 0) return -1
        code = (code << 1) | bt
        if (code <= h.maxCode(len)) return h.symbol(len, code)
        len += 1
      }
      -1
    }
  }

  /** EXTEND per T.81 F.2.2.1: map the t low bits to a signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode; returns (width, height, nComponents, meanR, meanG, meanB)
    * with gray mapped to equal channels. None on malformed/out-of-tier. */
  def decode(b: Array[Byte]): Option[(Long, Long, Long, Double, Double, Double)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var o = 2
    val qt = Array.ofDim[Int](4, 64)        // natural order
    val qtSeen = new Array[Boolean](4)
    val dcH = new Array[Huff](4); val acH = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var sofSeen = false

    def u16(p: Int): Int = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

    while (o + 4 <= b.length) {
      if ((b(o) & 0xff) != 0xff) return None
      var m = b(o + 1) & 0xff; o += 2
      while (m == 0xff && o < b.length) { m = b(o) & 0xff; o += 1 } // fill bytes
      if (m == 0xd9) return None // EOI before any scan completed
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        // standalone markers: no length
      } else {
        if (o + 2 > b.length) return None
        val len = u16(o)
        if (len < 2 || o + len > b.length) return None
        val p0 = o + 2; val p1 = o + len
        m match {
          case 0xdb => // DQT
            var p = p0
            while (p < p1) {
              val pq = (b(p) & 0xf0) >> 4; val tq = b(p) & 0x0f; p += 1
              if (tq > 3 || pq > 1) return None
              // bound the table read against the DECLARED segment length
              // (ADVICE r5: a short declared length walked past p1)
              if (p + (if (pq == 0) 64 else 128) > p1) return None
              var i = 0
              while (i < 64) {
                val q = if (pq == 0) { val v = b(p) & 0xff; p += 1; v }
                        else { val v = u16(p); p += 2; v }
                if (q <= 0) return None
                qt(tq)(Zigzag(i)) = q
                i += 1
              }
              qtSeen(tq) = true
            }
          case 0xc4 => // DHT
            var p = p0
            while (p < p1) {
              val tc = (b(p) & 0xf0) >> 4; val th = b(p) & 0x0f; p += 1
              if (tc > 1 || th > 3 || p + 16 > p1) return None
              val counts = Array.tabulate(16)(i => b(p + i) & 0xff)
              p += 16
              val total = counts.sum
              if (total > 256 || p + total > p1) return None
              val syms = Array.tabulate(total)(i => b(p + i) & 0xff)
              p += total
              val hf = new Huff(counts, syms)
              if (tc == 0) dcH(th) = hf else acH(th) = hf
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            if (sofSeen) return None
            if (p0 + 6 > p1) return None // header must fit the declared len
            val prec = b(p0) & 0xff
            h = u16(p0 + 1); w = u16(p0 + 3)
            val nc = b(p0 + 5) & 0xff
            if (p0 + 6 + 3 * nc > p1) return None // component table too
            if (prec != 8 || w <= 0 || h <= 0 || w.toLong * h > (1L << 26) ||
                (nc != 1 && nc != 3)) return None
            comps = Array.tabulate(nc) { i =>
              val q = p0 + 6 + 3 * i
              val hv = b(q + 1) & 0xff
              val c = Comp(b(q) & 0xff, (hv >> 4) & 0xf, hv & 0xf, b(q + 2) & 0xf)
              if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) return None
              c
            }
            sofSeen = true
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive/lossless/arithmetic: out of tier
          case 0xdd => // DRI
            restartInterval = u16(p0)
          case 0xda => // SOS — entropy-coded scan follows
            if (!sofSeen) return None
            if (p0 + 1 > p1) return None
            val ns = b(p0) & 0xff
            if (ns != comps.length) return None // non-interleaved: out of tier
            if (p0 + 1 + 2 * ns > p1) return None // per-scan table must fit
            val scanDc = new Array[Huff](ns); val scanAc = new Array[Huff](ns)
            var p = p0 + 1
            var i = 0
            while (i < ns) {
              val cid = b(p) & 0xff; val tt = b(p + 1) & 0xff; p += 2
              val ci = comps.indexWhere(_.id == cid)
              if (ci != i) return None // components must appear in SOF order
              scanDc(i) = dcH((tt >> 4) & 0xf); scanAc(i) = acH(tt & 0xf)
              if (scanDc(i) == null || scanAc(i) == null) return None
              i += 1
            }
            comps.foreach(c => if (!qtSeen(c.tq)) return None)
            return decodeScan(b, p1, w, h, comps, qt, scanDc, scanAc,
              restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        o = p1
      }
    }
    None // no SOS reached
  }

  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int,
                         comps: Array[Comp], qt: Array[Array[Int]],
                         dcT: Array[Huff], acT: Array[Huff],
                         restartInterval: Int
                        ): Option[(Long, Long, Long, Double, Double, Double)] = {
    val nc = comps.length
    val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component sample planes at sampled resolution (MCU-padded)
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = Array.tabulate(nc)(i => new Array[Byte](planeW(i) * planeH(i)))
    val dcPred = new Array[Int](nc)
    val coef = new Array[Int](64)     // natural order, dequantized
    val tmp = new Array[Double](64)
    val rd = new BitReader(b, start)
    var mcu = 0
    val nMcu = mcusX * mcusY
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align, expect RSTn, reset DC predictions
        rd.align()
        if (!rd.sawMarker) { // marker not yet consumed by the bit reader
          // require an actual RSTn (0xD0-0xD7) — a DNL/EOI landing here is
          // a corrupt stream and must DROP, not silently misdecode
          if (rd.pos + 2 > b.length || (b(rd.pos) & 0xff) != 0xff ||
              (b(rd.pos + 1) & 0xf8) != 0xd0) return None
          rd.pos += 2
        } else rd.sawMarker = false
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // --- entropy-decode one block into coef (natural order) ---
            java.util.Arrays.fill(coef, 0)
            val q = qt(c.tq)
            val t = rd.decodeHuff(dcT(ci)); if (t < 0 || t > 11) return None
            val diffBits = rd.bits(t); if (diffBits < 0) return None
            dcPred(ci) += extend(diffBits, t)
            coef(0) = dcPred(ci) * q(0)
            var k = 1
            var eob = false
            while (!eob && k < 64) {
              val rs = rd.decodeHuff(acT(ci)); if (rs < 0) return None
              val run = (rs >> 4) & 0xf; val size = rs & 0xf
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true        // EOB
              } else {
                k += run
                if (k > 63) return None
                val vb = rd.bits(size); if (vb < 0) return None
                coef(Zigzag(k)) = extend(vb, size) * q(Zigzag(k))
                k += 1
              }
            }
            // --- separable IDCT (rows then columns) + level shift ---
            var y0 = 0
            while (y0 < 8) { // 1D over rows: tmp(y,x) = Σu coef(y,u)·cos(u,x)
              var x0 = 0
              while (x0 < 8) {
                var s = 0.0; var u = 0
                while (u < 8) { s += coef(y0 * 8 + u) * CosTab(u)(x0); u += 1 }
                tmp(y0 * 8 + x0) = s
                x0 += 1
              }
              y0 += 1
            }
            val plane = planes(ci)
            val px0 = (mx * c.h + bx) * 8; val py0 = (my * c.v + by) * 8
            var x1 = 0
            while (x1 < 8) { // 1D over columns + store
              var y1 = 0
              while (y1 < 8) {
                var s = 0.0; var v = 0
                while (v < 8) { s += tmp(v * 8 + x1) * CosTab(v)(y1); v += 1 }
                val sample = math.round(s + 128.0).toInt
                val cl = if (sample < 0) 0 else if (sample > 255) 255 else sample
                plane((py0 + y1) * planeW(ci) + (px0 + x1)) = cl.toByte
                y1 += 1
              }
              x1 += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // ---- feature extraction: replication upsampling + color transform ----
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    val nPix = w.toLong * h
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (nc == 1) {
          val g = planes(0)(y * planeW(0) + x) & 0xff
          sr += g; sg += g; sb += g
        } else {
          def samp(i: Int): Int = {
            val sx = x * comps(i).h / hmax; val sy = y * comps(i).v / vmax
            planes(i)(sy * planeW(i) + sx) & 0xff
          }
          val yy = samp(0).toDouble
          val cb = samp(1) - 128.0; val cr = samp(2) - 128.0
          def cl(v: Double): Int = { val r = math.round(v).toInt
            if (r < 0) 0 else if (r > 255) 255 else r }
          sr += cl(yy + 1.402 * cr)
          sg += cl(yy - 0.344136 * cb - 0.714136 * cr)
          sb += cl(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Some((w.toLong, h.toLong, nc.toLong, sr / nPix, sg / nPix, sb / nPix))
  }

  // ------------------------- fixture encoder -------------------------

  /** Encode a block-constant grayscale baseline JPEG whose lossy chain is
    * exact (see object doc): `blocks` holds one 0..255 value per 8×8 block,
    * row-major over (w/8)×(h/8); w and h must be multiples of 8. With
    * `restartInterval` > 0 a DRI segment and RSTn markers are emitted, so
    * fixtures exercise the restart path too. */
  def encodeGrayBlocks(w: Int, h: Int, blocks: Array[Int],
                       restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0)
    val bw = w / 8; val bh = h / 8
    require(blocks.length == bw * bh)
    val out = new java.io.ByteArrayOutputStream()
    def mk(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    mk(0xd8) // SOI
    mk(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT, 8-bit, table 0
    for (_ <- 0 until 64) out.write(8)         // flat q=8: DC exact
    mk(0xc0); u16(2 + 6 + 3) // SOF0
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // DC table: categories 0..11 as 12 four-bit canonical codes
    mk(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00)
    val dcCounts = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcCounts.foreach(out.write)
    (0 until 12).foreach(out.write)
    // AC table: single length-1 code for EOB (0x00)
    mk(0xc4); u16(2 + 1 + 16 + 1); out.write(0x10)
    val acCounts = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acCounts.foreach(out.write)
    out.write(0x00)
    if (restartInterval > 0) { mk(0xdd); u16(4); u16(restartInterval) }
    mk(0xda); u16(2 + 1 + 2 + 3) // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // entropy data: category-4 canonical DC codes are the values 0..11
    var acc = 0L; var nAcc = 0
    val body = new java.io.ByteArrayOutputStream()
    def putBits(v: Int, k: Int): Unit = {
      var i = k - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nAcc += 1
        if (nAcc == 8) {
          val byte = (acc & 0xff).toInt
          body.write(byte)
          if (byte == 0xff) body.write(0x00) // stuff
          nAcc = 0; acc = 0
        }
        i -= 1
      }
    }
    def flushAligned(): Unit = {
      if (nAcc > 0) { // pad with 1s per spec
        val pad = 8 - nAcc
        putBits((1 << pad) - 1, pad)
      }
    }
    var pred = 0
    var i = 0
    while (i < blocks.length) {
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        flushAligned()
        body.write(0xff); body.write(0xd0 + ((i / restartInterval - 1) % 8))
        pred = 0
      }
      val dc = (blocks(i) & 0xff) - 128
      val diff = dc - pred; pred = dc
      var t = 0; var a = math.abs(diff)
      while (a > 0) { t += 1; a >>= 1 }
      putBits(t, 4) // category: canonical code == value at length 4
      if (t > 0) putBits(if (diff > 0) diff else diff + (1 << t) - 1, t)
      putBits(0, 1) // EOB: the single length-1 AC code
      i += 1
    }
    flushAligned()
    val eb = body.toByteArray
    out.write(eb, 0, eb.length)
    mk(0xd9) // EOI
    out.toByteArray
  }
}
