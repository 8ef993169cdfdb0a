package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native codegen'd vector arithmetic.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`,
  * `transform`) are `CodegenFallback`: every element evaluation runs
  * interpreted with a boxed lambda call, which makes them the hot-path
  * cost of the similarity/dedup stack (a 64-dim dot product is 64
  * interpreter round-trips per row pair). These expressions emit a
  * tight primitive loop over `ArrayData.getDouble` instead, staying
  * inside whole-stage codegen.
  *
  * Fold order is strictly left-to-right — IDENTICAL to the
  * `aggregate(zip_with(...))` formulation they replace and to DuckDB's
  * `list_sum(list_transform(...))` — so every oracle-checked value is
  * bit-for-bit unchanged. Null semantics also match that formulation:
  * a null ARRAY input, a null element, or mismatched lengths (which
  * zip_with pads with nulls) all yield a null result — never a silent
  * partial value.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // can yield null even for non-null inputs (length mismatch / null
  // element), so nullable must not be derived from the children —
  // otherwise codegen folds ev.isNull into a literal
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  // SQL-reachable via GraftExtensions: reject anything but
  // array<double> at analysis time — ArrayData.getDouble on an
  // array<float> would silently read garbage, not throw
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += $a.getDouble($i) * $b.getDouble($i);
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance `sum((a_i - b_i)^2)`, same contract as
  * [[DotProduct]]: left-to-right fold, codegen'd primitive loop. */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // see DotProduct.nullable
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq"

  // SQL-reachable via GraftExtensions: reject anything but
  // array<double> at analysis time — ArrayData.getDouble on an
  // array<float> would silently read garbage, not throw
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $d = $a.getDouble($i) - $b.getDouble($i);
            $acc += $d * $d;
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

/** PQ asymmetric-distance lookup-sum: `left` is a candidate's code
  * array (array<int>, the 1-based codeword per subspace — row_number
  * assigns them), `right` a per-query lookup table flattened sub-major
  * (array<long>, scale-9 fixed-point subspace distances, PqK entries
  * per subspace ordered by code). Computes
  * `Σ_sub lut[sub*PqK + code_sub - 1]` in exact long arithmetic and
  * returns `BigDecimal(sum, 9).doubleValue()` — bit-identical to the
  * `SUM(DECIMAL(27,9)).cast(double)` grouped aggregate it replaces
  * (decimal sums of scale-9 values ARE scaled-long sums, and Spark's
  * `Decimal.toDouble` is `BigDecimal.doubleValue`).
  *
  * This is what makes ADC search MAP-ONLY: instead of exploding codes
  * to (vec, sub) rows, joining the LUT on (sub, code) and re-grouping
  * by (query, vec) — an exchange carrying Q×N rows at 10^9 vectors —
  * one codegen'd fold per (candidate × query) row computes the whole
  * distance in-place, and only the ≤k-per-query top-k aggregation ever
  * shuffles. The round-5 wide-layout fold lost its A/B because decimal
  * `aggregate` HOFs run interpreted; this native loop is why the
  * map-only shape now wins (A/B in [[graft.operators.Similarity]]).
  *
  * Null contract matches [[DotProduct]]: null arrays, null elements, a
  * LUT length that is not a multiple of the code count, or an
  * out-of-range code yield null — never a silent partial sum. */
case class PqAdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // see DotProduct.nullable
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<long>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val nSub = codes.numElements()
    if (nSub == 0 || lut.numElements() % nSub != 0) return null
    val k = lut.numElements() / nSub
    var acc = 0L
    var i = 0
    while (i < nSub) {
      if (codes.isNullAt(i)) return null
      val code = codes.getInt(i)
      if (code < 1 || code > k) return null
      val idx = i * k + code - 1
      if (lut.isNullAt(idx)) return null
      acc += lut.getLong(idx)
      i += 1
    }
    java.math.BigDecimal.valueOf(acc, 9).doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nSub = ctx.freshName("nSub")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val code = ctx.freshName("code")
      val idx = ctx.freshName("idx")
      s"""
        int $nSub = $a.numElements();
        if ($nSub == 0 || $b.numElements() % $nSub != 0) { ${ev.isNull} = true; } else {
          int $k = $b.numElements() / $nSub;
          long $acc = 0L;
          for (int $i = 0; $i < $nSub; $i++) {
            if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
            int $code = $a.getInt($i);
            if ($code < 1 || $code > $k) { ${ev.isNull} = true; break; }
            int $idx = $i * $k + $code - 1;
            if ($b.isNullAt($idx)) { ${ev.isNull} = true; break; }
            $acc += $b.getLong($idx);
          }
          if (!${ev.isNull}) {
            ${ev.value} = java.math.BigDecimal.valueOf($acc, 9).doubleValue();
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcSum =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    Shim.column(L2Sq(Shim.expression(a), Shim.expression(b)))
  def pqAdcSum(codes: Column, lut: Column): Column =
    Shim.column(PqAdcSum(Shim.expression(codes), Shim.expression(lut)))
}
