package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** ScalaCheck guards for the four native Catalyst expressions — the only
  * hand-written codegen in the engine, so the one place a Java-emission bug
  * could silently diverge from the interpreted semantics. Each property
  * drives the WHOLE-STAGE-CODEGEN path (DataFrame select + collect) against
  * an independent driver-side re-evaluation, bit-for-bit for doubles
  * (doubleToLongBits, so NaN payloads and signed zeros count), over random
  * IEEE bit patterns — which cover NaNs, ±Inf, subnormals, and ±0 with far
  * better density than any hand-picked fixture. */
object ExpressionPropertySpec extends Properties("ExpressionProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  /** uniformly random 64-bit patterns: ~1/2048 are ±Inf/NaN, ~1/2 negative,
    * subnormals included — the full IEEE surface */
  val genBits: Gen[Double] =
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Double.longBitsToDouble)
  /** mix in exact specials at higher rate than the bit prior gives them */
  val genDouble: Gen[Double] = Gen.frequency(
    6 -> genBits,
    1 -> Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, -Double.MinPositiveValue,
      0.5, -0.5, 1.5, 2.5, -2.5, 1e308, -1e308))

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  property("MathUnary spacing/rint/signbit == JDK driver, bit-identical, codegen path") =
    forAll(Gen.listOfN(24, genDouble)) { xs =>
      import spark.implicits._
      val rows = xs.toDF("v").select(
        col("v"),
        MathUnary("spacing", col("v")).as("sp"),
        MathUnary("rint", col("v")).as("ri"),
        MathUnary("signbit", col("v")).as("sb")).collect()
      rows.forall { r =>
        val v = r.getDouble(0)
        bits(r.getDouble(1)) == bits(java.lang.Math.copySign(java.lang.Math.ulp(v), v)) &&
          bits(r.getDouble(2)) == bits(java.lang.Math.rint(v)) &&
          r.getBoolean(3) == ((java.lang.Double.doubleToRawLongBits(v) >>> 63) == 1L)
      }
    }

  property("MathBinary nextafter/fmax/fmin == driver (numpy NaN-ignoring min/max), bit-identical") =
    forAll(Gen.listOfN(24, Gen.zip(genDouble, genDouble))) { ps =>
      import spark.implicits._
      val rows = ps.toDF("a", "b").select(
        col("a"), col("b"),
        MathBinary("nextafter", col("a"), col("b")).as("na"),
        MathBinary("fmax", col("a"), col("b")).as("fx"),
        MathBinary("fmin", col("a"), col("b")).as("fn")).collect()
      rows.forall { r =>
        val (a, b) = (r.getDouble(0), r.getDouble(1))
        def fmax = if (a.isNaN) b else if (b.isNaN) a else math.max(a, b)
        def fmin = if (a.isNaN) b else if (b.isNaN) a else math.min(a, b)
        bits(r.getDouble(2)) == bits(java.lang.Math.nextAfter(a, b)) &&
          bits(r.getDouble(3)) == bits(fmax) && bits(r.getDouble(4)) == bits(fmin)
      }
    }

  property("MathBinary gcd == BigInt.gcd on the full non-MinValue long range") =
    forAll(Gen.listOfN(24, Gen.zip(
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue),
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)))) { ps =>
      import spark.implicits._
      val rows = ps.toDF("a", "b")
        .select(col("a"), col("b"), MathBinary("gcd", col("a"), col("b")).as("g"))
        .collect()
      rows.forall { r =>
        // |a|,|b| <= MaxValue here, so BigInt gcd fits a Long exactly
        r.getLong(2) == BigInt(r.getLong(0)).gcd(BigInt(r.getLong(1))).toLong
      }
    }

  property("MathBinary lcm == |a/g*b| (exact in BigInt) on bounded operands") =
    forAll(Gen.listOfN(24, Gen.zip(
      Gen.chooseNum(-1048576L, 1048576L), Gen.chooseNum(-1048576L, 1048576L)))) { ps =>
      import spark.implicits._
      val rows = ps.toDF("a", "b")
        .select(col("a"), col("b"), MathBinary("lcm", col("a"), col("b")).as("l"))
        .collect()
      rows.forall { r =>
        val (a, b) = (BigInt(r.getLong(0)), BigInt(r.getLong(1)))
        val g = a.gcd(b)
        val want = if (g == BigInt(0)) BigInt(0) else (a / g * b).abs
        r.getLong(2) == want.toLong // <= 2^40: exact
      }
    }

  val genFloatArr: Gen[Array[Float]] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e4f, 1e4f)).map(_.toArray))
  val genDoubleArr: Gen[Array[Double]] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e4, 1e4)).map(_.toArray))

  property("DotProduct == driver left-fold over min-length prefix, bit-identical, float×double") =
    forAll(Gen.listOfN(8, Gen.zip(genFloatArr, genDoubleArr))) { ps =>
      import spark.implicits._
      val rows = ps.toDF("af", "bd").select(
        col("af"), col("bd"),
        DotProduct(col("af"), col("bd")).as("fd"),
        DotProduct(col("bd"), col("af")).as("df"),
        DotProduct(col("af"), col("af")).as("ff"),
        DotProduct(col("bd"), col("bd")).as("dd")).collect()
      rows.forall { r =>
        val af = r.getSeq[Float](0).toArray
        val bd = r.getSeq[Double](1).toArray
        // same accumulation order as the kernel: sequential += over prefix
        def fold(xs: Array[Double], ys: Array[Double]): Double = {
          var s = 0.0; var i = 0
          val n = math.min(xs.length, ys.length)
          while (i < n) { s += xs(i) * ys(i); i += 1 }
          s
        }
        val afd = af.map(_.toDouble)
        bits(r.getDouble(2)) == bits(fold(afd, bd)) &&
          bits(r.getDouble(3)) == bits(fold(bd, afd)) &&
          bits(r.getDouble(4)) == bits(fold(afd, afd)) &&
          bits(r.getDouble(5)) == bits(fold(bd, bd))
      }
    }

  property("QuantizeArray == floor(v·2^24)/2^24 per element, bit-identical, float and double") =
    forAll(Gen.listOfN(8, Gen.zip(genFloatArr, genDoubleArr))) { ps =>
      import spark.implicits._
      val Q = 16777216.0
      val rows = ps.toDF("af", "bd").select(
        col("af"), col("bd"),
        QuantizeArray(col("af")).as("qf"),
        QuantizeArray(col("bd")).as("qd")).collect()
      rows.forall { r =>
        val wantF = r.getSeq[Float](0).map(v => math.floor(v.toDouble * Q) / Q)
        val wantD = r.getSeq[Double](1).map(v => math.floor(v * Q) / Q)
        r.getSeq[Double](2).map(bits) == wantF.map(bits) &&
          r.getSeq[Double](3).map(bits) == wantD.map(bits)
      }
    }

  /** random text over a unicode-ish alphabet: ASCII letters both cases,
    * digits, space, punctuation, and some multi-byte codepoints — the
    * byte-scan histogram must still equal a driver char-level recount */
  val genText: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaChar, 2 -> Gen.const(' '), 1 -> Gen.numChar,
      1 -> Gen.oneOf('!', '.', ',', 'é', 'ß', '中', 'ß', 'Z', 'Q')))
  } yield cs.mkString

  property("CharEntropy == driver a-z+space histogram entropy after toLowerCase, 0 ulp") =
    forAll(Gen.listOfN(16, genText)) { ts =>
      import spark.implicits._
      def driver(s: String): Double = {
        val low = org.apache.spark.unsafe.types.UTF8String.fromString(s)
          .toLowerCase.toString
        val counts = new Array[Long](27)
        low.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
          if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
          else if (b == ' ') counts(26) += 1
        }
        val total = counts.sum.toDouble
        if (total <= 0.0) 0.0
        else {
          var h = 0.0
          counts.foreach { c =>
            if (c > 0) {
              val p = c / total
              h += -p * (StrictMath.log(p) / StrictMath.log(2.0))
            }
          }
          h
        }
      }
      val rows = ts.toDF("t")
        .select(col("t"), CharEntropy(col("t")).as("h")).collect()
      rows.forall(r => bits(r.getDouble(1)) == bits(driver(r.getString(0))))
    }

  // ---- UnicodeNormalize (NFC / strip-accents canonicalization) ----

  /** random text mixing ASCII, precomposed Latin accents, decomposed
    * base+combining-mark pairs, and non-Latin (Greek/CJK) passthrough */
  val genUniText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("á", "é", "ñ", "ö", "ü", "ç", "Å"),
    2 -> Gen.oneOf("á", "è", "ñ", "ö", "ů"),
    1 -> Gen.oneOf("α", "ß", "ø", "中", " "))).map(_.mkString)

  property("UnicodeNormalize NFC: codegen == java.text.Normalizer, composes decomposed pairs, idempotent, ASCII identity") =
    forAll(Gen.listOfN(12, genUniText)) { ts =>
      import spark.implicits._
      val rows = ts.toDF("t")
        .select(col("t"), UnicodeNorm.nfc(col("t")).as("n")).collect()
      rows.forall { r =>
        val (t, n) = (r.getString(0), r.getString(1))
        n == java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC) &&
          java.text.Normalizer.isNormalized(n, java.text.Normalizer.Form.NFC) &&
          // canonical equivalence preserved: NFD(out) == NFD(in)
          java.text.Normalizer.normalize(n, java.text.Normalizer.Form.NFD) ==
            java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD) &&
          (!t.forall(_ < 0x80) || n == t)
      }
    }

  property("UnicodeNormalize strip-accents: drops every Mn mark, keeps base letters, fixed known pairs") =
    forAll(Gen.listOfN(12, genUniText)) { ts =>
      import spark.implicits._
      val known = Seq("á" -> "a", "á" -> "a", "ñ" -> "n", "ö" -> "o",
        "Å" -> "A", "ø" -> "ø", "ß" -> "ß", "中" -> "中")
      val rows = (ts ++ known.map(_._1)).toDF("t")
        .select(col("t"), UnicodeNorm.stripAccents(col("t")).as("n")).collect()
      val knownOk = known.forall { case (in, want) =>
        rows.find(_.getString(0) == in).exists(_.getString(1) == want)
      }
      knownOk && rows.forall { r =>
        val (t, n) = (r.getString(0), r.getString(1))
        // no nonspacing marks survive, and the non-mark codepoint sequence
        // of NFD(t) is exactly what remains
        val nfd = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD)
        val expect = nfd.codePoints().toArray
          .filter(Character.getType(_) != Character.NON_SPACING_MARK)
        n.codePoints().toArray.sameElements(expect) &&
          (!t.forall(_ < 0x80) || n == t)
      }
    }
}
