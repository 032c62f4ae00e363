package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (`graft_nfc`).
  *
  * Web-crawl corpora mix composed and decomposed forms of the same
  * grapheme ("é" as U+00E9 vs "e"+U+0301); every downstream text
  * operator that keys on string bytes — exact dedup digests, shingle
  * hashes, token counts, contamination probes — silently treats the
  * two as different documents unless ingestion canonicalizes first.
  * NFC is the standard canonical form, so this expression is the
  * first stage of the text pipeline at 100 TB.
  *
  * Spark has no normalization builtin, and a Scala UDF would break
  * whole-stage codegen around the hottest full-corpus map. This is
  * the "custom Catalyst Expression beats UDF" rung: the generated
  * code is one static call that stays inside the fused stage, with
  * two zero-copy fast paths ([[NfcNormalize.nfc]]) — pure-ASCII
  * documents (the vast majority of a web corpus; checked in O(n)
  * bytes without decoding) and already-normalized strings (ICU
  * quick-check via [[java.text.Normalizer.isNormalized]]) return the
  * input UTF8String unchanged; only true denormalized stragglers pay
  * the String round-trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and generated code
    * (one call site keeps the two paths identical by construction). */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s // NFC is the identity on ASCII
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd Unicode NFKC compatibility folding (`graft_nfkc`).
  *
  * Real web corpora carry COMPATIBILITY variants NFC leaves alone:
  * fullwidth ASCII from CJK pages ("ＡＢＣ１２３" → "ABC123"),
  * ligatures ("ﬁ" → "fi"), superscripts ("x²" → "x2"), circled
  * digits, the Kelvin sign. A dedup or contamination probe keyed on
  * NFC bytes still sees a fullwidth spam mirror as a distinct
  * document; NFKC folds the compatibility class down to the canonical
  * form first. It is LOSSY by design (formatting distinctions are
  * erased), so it is an OPTIONAL pre-stage of the normalization
  * pipeline — run it for matching keys, not for the stored text.
  *
  * Same architecture as [[NfcNormalize]]: one static call shared by
  * interpreted eval and generated code, ASCII and already-NFKC
  * zero-copy fast paths (NFKC is the identity on ASCII — compatibility
  * decompositions only touch non-ASCII codepoints). No DuckDB oracle
  * exists (`nfc_normalize` is canonical-only), so the contract is
  * spec-locked three ways in CodegenSuite: interpreted ≡ codegen ≡
  * java.text.Normalizer. */
case class NfkcFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfkc"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    NfkcFold.nfkc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfkcFold.nfkc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfkcFold =
    copy(child = newChild)
}

object NfkcFold {
  /** Static entry point shared by interpreted eval and generated code
    * (one call site keeps the two paths identical by construction). */
  def nfkc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s // NFKC is the identity on ASCII
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }
}

object StringFunctions {
  /** Column-level NFC normalization backed by the codegen'd
    * [[NfcNormalize]]. */
  def nfc(c: Column): Column =
    Shims.column(NfcNormalize(Shims.expression(c)))

  /** Column-level NFKC compatibility folding backed by the codegen'd
    * [[NfkcFold]]. */
  def nfkc(c: Column): Column =
    Shims.column(NfkcFold(Shims.expression(c)))
}
