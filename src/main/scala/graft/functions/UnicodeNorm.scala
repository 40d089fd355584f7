package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Unicode text normalization — the canonicalization step
  * in front of every text-dedup key (exact dedup, shingling, fingerprints):
  * visually-identical strings must hash identically, so NFC composition and
  * accent stripping run BEFORE hashing at corpus scale.
  *
  * Why a custom Expression (SURVEY §7.3 escalation ladder): Spark has no
  * built-in Unicode normalizer, and a Scala UDF would break whole-stage
  * codegen on the hottest scan of a text pipeline. One static call per row
  * keeps the row loop codegen'd; `java.text.Normalizer` (JDK, ICU-derived
  * NFC/NFD tables) does the per-string work, mirroring how DuckDB's
  * `nfc_normalize`/`strip_accents` wrap utf8proc.
  *
  * Modes:
  *  - NFC: canonical composition (é as e+◌́ → precomposed é).
  *  - STRIP_ACCENTS: NFD decomposition, then drop nonspacing marks (Mn),
  *    the utf8proc `strip_accents` contract (á→a, ñ→n; ø/ß unchanged —
  *    they are not combining sequences).
  * ASCII fast path: both modes return the input unchanged when every byte
  * is < 0x80 (no allocation, the overwhelmingly common web-text case).
  */
case class UnicodeNormalize(child: Expression, mode: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unicode_norm requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.compute(input.asInstanceOf[UTF8String], mode)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.compute($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String =
    if (mode == UnicodeNorm.ModeNfc) "graft_nfc" else "graft_strip_accents"
}

object UnicodeNorm {
  val ModeNfc = 0
  val ModeStripAccents = 1

  import org.apache.spark.sql.{Column, GraftSqlShims}

  /** NFC canonical composition as a codegen Column. */
  def nfc(text: Column): Column =
    GraftSqlShims.column(
      UnicodeNormalize(GraftSqlShims.expressionOf(text), ModeNfc))

  /** utf8proc-contract accent stripping (NFD + drop Mn) as a codegen
    * Column. */
  def stripAccents(text: Column): Column =
    GraftSqlShims.column(
      UnicodeNormalize(GraftSqlShims.expressionOf(text), ModeStripAccents))

  /** static forwarder callable from generated Java */
  def compute(s: UTF8String, mode: Int): UTF8String = {
    // ASCII fast path: NFC and accent-stripping are identity on ASCII
    val nb = s.numBytes()
    val base = s.getBaseObject; val off = s.getBaseOffset
    var i = 0L; var ascii = true
    while (ascii && i < nb) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x80) != 0)
        ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    val out =
      if (mode == ModeNfc)
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      else {
        val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(nfd.length)
        var k = 0
        while (k < nfd.length) {
          val cp = nfd.codePointAt(k)
          if (Character.getType(cp) != Character.NON_SPACING_MARK)
            sb.appendCodePoint(cp)
          k += Character.charCount(cp)
        }
        sb.toString
      }
    UTF8String.fromString(out)
  }
}
