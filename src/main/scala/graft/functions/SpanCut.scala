package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native span-splice: cut the token positions covered by any of the
  * given `[s_lo, s_hi)` spans out of a token array, returning
  * `struct(n_kept, clean_text)` in ONE compiled pass — the hot-path
  * projection of the duplicated-span REMOVAL
  * ([[graft.operators.TextAnalysis]] `dupSpansApply`).
  *
  * Exists because the higher-order-function formulation —
  * `transform(filter(transform(...)))` with a per-token
  * `exists(spans, ...)` — is `CodegenFallback`: every token runs an
  * interpreted lambda chain that is O(spans) per token. This
  * expression sweeps tokens and the `s_lo`-sorted span list together
  * (O(tokens + spans) per doc, compiled), computing the IDENTICAL
  * keep set: a token at index i is dropped iff some span covers i.
  * Spans may OVERLAP (islands closer than the 8-token gram window
  * produce overlapping spans) — coverage is their union, which is
  * exactly what the per-token `exists` computed.
  *
  * Contract: `tokens` is `array<string>`, `spans` is
  * `array<struct<s_lo: long, s_hi: long>>` sorted ascending by
  * `s_lo` (the caller's `sort_array(collect_list(...))` order; the
  * sweep's correctness needs only the `s_lo` order). An EMPTY span
  * array keeps every token — the caller maps the left-join's null to
  * `array()`. `n_kept` counts kept positions (null tokens included,
  * as `size` did); `clean_text` single-space-joins the kept tokens
  * skipping nulls (as `concat_ws` did). Null tokens cannot occur for
  * the tokenizer's output; the contract just pins HOF-equivalence.
  */
case class SpanCut(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = SpanCut.structType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_span_cut"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
            ArrayType(StructType(Array(a, b)), _))
          if a.dataType == LongType && b.dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<struct<long, long>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SpanCut.cut(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SpanCut.cut($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCut =
    copy(left = newLeft, right = newRight)
}

object SpanCut {

  val structType: StructType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  /** Static helper invoked from generated code: one merged sweep of
    * tokens and the s_lo-sorted spans. `maxEnd` carries the largest
    * `s_hi` among spans whose `s_lo` has been passed, so overlapping
    * spans union correctly without a per-token scan. */
  def cut(tokens: ArrayData, spans: ArrayData): GenericInternalRow = {
    val t = tokens.numElements()
    val m = spans.numElements()
    val kept = new Array[UTF8String](t)
    var nKept = 0
    var nText = 0
    var p = 0
    var maxEnd = Long.MinValue
    var i = 0
    while (i < t) {
      while (p < m && spans.getStruct(p, 2).getLong(0) <= i) {
        val hi = spans.getStruct(p, 2).getLong(1)
        if (hi > maxEnd) maxEnd = hi
        p += 1
      }
      if (i >= maxEnd) { // not covered by any span seen so far
        if (!tokens.isNullAt(i)) {
          kept(nText) = tokens.getUTF8String(i)
          nText += 1
        }
        nKept += 1 // size() counted null elements too
      }
      i += 1
    }
    val text =
      if (nText == 0) UTF8String.EMPTY_UTF8
      else UTF8String.concatWs(Space,
        java.util.Arrays.copyOfRange(kept, 0, nText): _*)
    new GenericInternalRow(Array[Any](nKept.toLong, text))
  }

  /** Column-level entry point. */
  def span_cut(tokens: Column, spans: Column): Column =
    Shim.column(SpanCut(Shim.expression(tokens), Shim.expression(spans)))
}
