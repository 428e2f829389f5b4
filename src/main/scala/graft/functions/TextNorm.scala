package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Catalyst expression.
  *
  * Training corpora mix composed ("é" U+00E9) and decomposed ("e" + U+0301)
  * spellings of the same text; every downstream dedup / fingerprint /
  * tokenize step sees them as different bytes unless the pipeline
  * canonicalizes first. Spark's built-in functions have no normalizer, so
  * this is the textbook case for a custom Expression over a UDF: the
  * generated code calls `java.text.Normalizer` directly inside whole-stage
  * codegen — no boxing, no closure dispatch, and the JDK fast-path check
  * (`isNormalized`) makes already-NFC input (the overwhelming majority of a
  * real corpus) a near-no-op.
  *
  * Matches DuckDB's `nfc_normalize`, which the oracle uses.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string arg, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(NfcNormalize.nfc(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NfcNormalize.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static helper the generated code calls: fast-path already-normalized
    * strings (the common case in a real corpus) without re-materializing.
    */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}
