package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The one-pass codegen entropy expression vs the composable
  * replace-and-diff formulation it replaces (same values, both eval paths,
  * including multibyte inputs where byte-counting must not miscount). */
class CharEntropySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  /** the 27-scan formulation charEntropy used before the native expression */
  private def composedEntropy(textCol: org.apache.spark.sql.Column) = {
    val t = lower(textCol)
    val counts = graft.pipeline.TextOps.entropyChars.map { c =>
      (length(t) - length(replace(t, lit(c.toString), lit("")))).cast("double")
    }
    val total = counts.reduce(_ + _)
    val terms = counts.map { cnt =>
      when(cnt > 0.0, -(cnt / total) * log2(cnt / total)).otherwise(lit(0.0))
    }
    when(total > 0.0, terms.reduce(_ + _)).otherwise(lit(0.0))
  }

  test("graft_char_entropy agrees with the replace-and-diff form on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs.select(
      CharEntropy(col("text")).as("fast"),
      composedEntropy(col("text")).as("slow"))
      .filter(abs(col("fast") - col("slow")) > 1e-12)
    assert(bad.count() === 0)
  }

  test("graft_char_entropy: multibyte text counts only ASCII universe bytes") {
    // é (2 bytes), 中 (3 bytes), emoji (4 bytes) must contribute nothing;
    // 'a' and ' ' still count — byte-scan equals char-scan on UTF-8
    val df = Seq((1L, "aéa 中😀a")).toDF("doc_id", "text")
    val got = df.select(CharEntropy(col("text")),
      composedEntropy(col("text"))).collect()(0)
    // counts: a=3, space=1 -> H = 3/4,1/4 distribution
    val expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25)) / math.log(2.0)
    assert(math.abs(got.getDouble(0) - expected) < 1e-12)
    assert(math.abs(got.getDouble(0) - got.getDouble(1)) < 1e-12)
    // null propagates null at the expression level
    assert(df.select(CharEntropy(lit(null).cast("string"))).collect()(0).isNullAt(0))
  }
}
