package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization as a native codegen'd expression — the
  * canonicalization step text-dedup pipelines run BEFORE hashing: the
  * same visible string can arrive precomposed ("é") or decomposed
  * ("e" + U+0301) depending on the upstream crawler/OS, and exact or
  * MinHash dedup treats the two as different documents unless both are
  * normalized to one form first.
  *
  * Codegen fast path: `Normalizer.isNormalized` is a cheap scan using
  * the same quick-check tables as ICU, and real corpora are
  * overwhelmingly already-NFC — in that case the input UTF8String is
  * returned as-is, no allocation, no transcode. Only the rare
  * denormalized row pays for `String` materialization + recompose.
  *
  * NFC (not NFKC) deliberately: it is the form DuckDB's
  * `nfc_normalize` implements, so the operation is oracle-checkable
  * across engines; compatibility folding (NFKC's ligature/width
  * collapses) is a lossier policy choice layered on top when wanted.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |${ev.value} =
         |  java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
