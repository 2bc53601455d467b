package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus text canonicalization as one codegen'd primitive:
  * Unicode NFC composition, C0/DEL control characters mapped to spaces,
  * space runs collapsed, and edges trimmed — the standard pre-dedup /
  * pre-tokenize cleanup a training-data pipeline runs over every document
  * (raw crawl text mixes decomposed accents, tabs, control bytes).
  *
  * Exactly equivalent to the SQL chain
  * `trim(regexp_replace(regexp_replace(nfc_normalize(s),
  * '[\x00-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g'))` (the DuckDB oracle
  * formulation), but fused into a single pass with one output allocation
  * instead of three regex traversals per row — on a 100 TB corpus this
  * runs once per document on the scan's hot path, so it must stay inside
  * whole-stage codegen (it does: static call, no boxing).
  *
  * Determinism: NFC is a deterministic Unicode-spec mapping — any
  * conformant implementation (java.text.Normalizer here, DuckDB's
  * normalizer on the oracle side) produces identical codepoints, so the
  * cross-engine hash compare holds without float-style quantization.
  */
final case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** Static entry shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false // a space run seen after at least one kept char
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      // C0 controls and DEL become spaces; then spaces collapse + trim.
      if (c < 0x20 || c == 0x7f || c == ' ') {
        if (sb.length > 0) pendingSpace = true // leading run: drop (trim)
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing run never flushed (trim)
  }
}
