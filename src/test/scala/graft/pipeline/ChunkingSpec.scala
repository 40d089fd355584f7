package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class ChunkingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def mkDocs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** driver re-implementation of the chunk contract */
  private def driverChunks(text: String, w: Int, s: Int): Seq[Seq[String]] = {
    val toks = text.trim.split(" +", -1).toSeq
    val extra = math.max(0, toks.length - w)
    val n = 1 + (extra + s - 1) / s
    (0 until n).map(i => toks.slice(i * s, i * s + w))
  }

  test("chunkWindows: coverage, overlap, truncation vs driver fold") {
    val texts = Seq(
      (1 to 25).map(i => s"t$i").mkString(" "), // 25 toks: 3 chunks at w=10,s=8
      (1 to 10).map(i => s"u$i").mkString(" "), // exactly one window
      (1 to 11).map(i => s"v$i").mkString(" "), // one past the window
      "solo",                                   // single token
      "  padded   tokens  here  ")              // ragged whitespace
    val got = Chunking.chunkWindows(mkDocs(texts), window = 10, stride = 8)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(r =>
        (r.getLong(2), r.getString(3))).toSeq).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = driverChunks(t, 10, 8)
      val rows = got(i.toLong)
      assert(rows.length == want.length, s"doc $i chunk count")
      want.zip(rows).foreach { case (wToks, (n, h)) =>
        assert(n == wToks.length.toLong, s"doc $i chunk token count")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(wToks.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(h == md, s"doc $i chunk hash")
      }
    }
    // every token of the 25-token doc appears in >= 1 chunk, consecutive
    // chunks share exactly window - stride = 2 tokens
    val c0 = driverChunks(texts.head, 10, 8)
    assert(c0.flatten.toSet == (1 to 25).map(i => s"t$i").toSet)
    assert(c0.sliding(2).forall {
      case Seq(a, b) => a.takeRight(2) == b.take(2); case _ => true
    })
  }

  test("chunkWindows: layout-independent and non-overlapping when stride == window") {
    val texts = (0 until 40).map(d => (1 to (d % 13) * 3 + 1).map(i => s"w$d-$i").mkString(" "))
    val a = Chunking.chunkWindows(mkDocs(texts), 7, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sorted
    val b = Chunking.chunkWindows(mkDocs(texts).repartition(11), 7, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sorted
    assert(a.sameElements(b))
    // stride == window: chunk token counts sum to the doc token count
    val sums = a.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(sums(i.toLong) == t.trim.split(" +").length.toLong)
    }
  }

  test("packSequences: stream offsets are a contiguous chop per bin") {
    val texts = (0 until 60).map(d => (1 to (d * 7) % 23 + 1).map(i => s"x$i").mkString(" "))
    val budget = 16L
    val rows = Chunking.packSequences(mkDocs(texts), budget, nBins = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 60)
    // per bin in doc_id order the offsets reconstruct an exact concat stream
    rows.groupBy(_._2).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._1).foreach { case (_, _, nt, pf, pl, off) =>
        assert(pf == cum / budget, "pack_first is the start-offset pack")
        assert(off == cum % budget, "offset inside first pack")
        val end = cum + nt
        assert(pl == math.max(cum, end - 1) / budget, "pack_last covers the doc end")
        assert(pl >= pf && pl <= pf + nt / budget + 1)
        cum = end
      }
    }
    // layout independence: packing never depends on partitioning
    val b = Chunking.packSequences(mkDocs(texts).repartition(13), budget, 4)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5))).sorted
    assert(rows.map(r => (r._1, r._4, r._5, r._6)).sorted.sameElements(b))
  }

  test("packManifest: full packs sum to the budget, slices are contiguous and cover each doc") {
    val texts = (0 until 80).map(d => (1 to (d * 11) % 29 + 1).map(i => s"y$i").mkString(" "))
    val budget = 16L
    val rows = Chunking.packManifest(mkDocs(texts), budget, nBins = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per-doc: slices contiguous from 0 and summing to the token count
    rows.groupBy(_._3).foreach { case (doc, rs) =>
      val bySeq = rs.sortBy(_._2) // pack_id order
      val nTok = texts(doc.toInt).trim.split(" +").length.toLong
      assert(bySeq.map(_._5).sum == nTok, s"doc $doc slice sum")
      var at = 0L
      bySeq.foreach { case (_, _, _, from, n) =>
        assert(from == at, s"doc $doc slice contiguity"); at += n
      }
    }
    // per-pack: every pack except each bin's last holds exactly `budget`
    val byBin = rows.groupBy(_._1)
    byBin.foreach { case (bin, rs) =>
      val lastPack = rs.map(_._2).max
      rs.groupBy(_._2).foreach { case (pack, slices) =>
        val tot = slices.map(_._5).sum
        if (pack < lastPack) assert(tot == budget, s"bin $bin pack $pack holds $tot")
        else assert(tot <= budget)
      }
    }
    // manifest agrees with packSequences' per-doc pack range
    val seq = Chunking.packSequences(mkDocs(texts), budget, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    rows.groupBy(_._3).foreach { case (doc, rs) =>
      val (pf, pl) = seq(doc)
      assert(rs.map(_._2).min == pf && rs.map(_._2).max == pl, s"doc $doc range")
    }
  }

  test("packSequences: a doc longer than the budget spans packs; bins partition docs") {
    val texts = Seq(
      (1 to 50).map(i => s"a$i").mkString(" "), // 50 toks >> budget 16
      "b1 b2 b3",
      (1 to 20).map(i => s"c$i").mkString(" "))
    val rows = Chunking.packSequences(mkDocs(texts), budget = 16L, nBins = 1)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
    // doc0: toks [0,50) -> packs 0..3, offset 0
    assert(rows(0) == ((0L, 3L, 0L)))
    // doc1: toks [50,53) -> pack 3, offset 2
    assert(rows(1) == ((3L, 3L, 2L)))
    // doc2: toks [53,73) -> packs 3..4, offset 5
    assert(rows(2) == ((3L, 4L, 5L)))
  }
}
