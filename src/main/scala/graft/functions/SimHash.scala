package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full 60-bit SimHash sketch of a
  * token array in ONE per-row pass — fingerprint each token with the
  * fused double-prime rolling hash ([[RollingHash.hash2]]) and
  * majority-vote each of the 60 bits over all token OCCURRENCES.
  *
  * Bit-identical to the explode → `rolling_hash2` → 60-sum-aggregate
  * formulation (and its DuckDB oracle spelling), but the plan is a
  * map-only projection: no token explosion (one row per token
  * occurrence — ~300× the document count), no 60-buffer hash
  * aggregate, no shuffle. At 100 TB that turns the sketch stage of the
  * near-dup pipeline from the dominant shuffle into a free rider on
  * the document scan. Codegen'd (`doGenCode` emits a static call), so
  * it stays inside whole-stage codegen like [[RollingHash2]].
  *
  * Docs with EMPTY token arrays return null — the aggregate
  * formulation drops them (explode emits no rows), so returning a
  * sketch for them would silently diverge from the oracle.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash60"

  // SQL-reachable via GraftExtensions: reject anything but
  // array<string> at analysis time — getUTF8String on, say, an
  // array<bigint> would reinterpret the long as an (offset, size)
  // pair and read unchecked garbage, not throw
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      // array() / array(null, ...): every element is null, which the
      // eval handles without ever reading an element as a string
      case ArrayType(org.apache.spark.sql.types.NullType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash.simhash60Boxed(input.asInstanceOf[ArrayData]) // null for empty arrays

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val box = ctx.freshName("simhashBox")
      s"""
        Long $box = graft.functions.SimHash.simhash60Boxed($c);
        if ($box == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $box.longValue();
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash {

  /** Static helper invoked from generated code: one pass over the
    * array, int[60] vote counters, bit b set iff its vote is positive.
    * Null for empty arrays (see [[SimHash60]]). A null ELEMENT votes
    * -1 on every bit — exactly what the aggregate formulation does:
    * rolling_hash2(null) is a null fp, the `when((fp>>b)&1 = 1, 1)
    * .otherwise(-1)` vote treats the null condition as false, and the
    * row still contributes -1 to all 60 sums. */
  def simhash60Boxed(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 60) { votes(b) -= 1; b += 1 }
      } else {
        val fp = RollingHash.hash2(arr.getUTF8String(i).asInstanceOf[UTF8String])
        var b = 0
        while (b < 60) {
          if (((fp >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }

  /** Column-level entry point over an array<string> column. */
  def simhash60(c: Column): Column =
    Shim.column(SimHash60(Shim.expression(c)))
}
