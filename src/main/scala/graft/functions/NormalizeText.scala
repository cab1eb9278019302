package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, StringType}

/** Native Catalyst expression: Unicode NFC normalization.
  *
  * Corpus preprocessing 101 — the same text arrives with accents composed
  * (`é` = U+00E9) or decomposed (`e` + U+0301) depending on the source;
  * without canonicalization, exact dedup (q40), shingle hashing (q41/q43),
  * and tokenization all treat equal strings as different. NFC is the
  * canonical-composition form DuckDB exposes as `nfc_normalize`, so the
  * oracle checks byte-identical normalization.
  *
  * SURVEY.md §2.10 extension-point order: native `Expression` with
  * `doGenCode` (a Scala UDF would serialize each row's string through a
  * lambda; this stays inside whole-stage codegen and calls the JDK's
  * `java.text.Normalizer` directly). Strings already in NFC — the common
  * case by far — are detected with the quick-check and returned without
  * allocating.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  import org.apache.spark.sql.graftglue.Bridge

  /** Static entry shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry: `NormalizeText(col)`. */
  def apply(c: Column): Column = Bridge.column(NormalizeText(Bridge.expression(c)))
}
