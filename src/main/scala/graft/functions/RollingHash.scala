package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash of a string —
  * the document-fingerprinting primitive (SURVEY.md §2.3 / the
  * training-data-pipeline track). `h = fold(h * prime + char) mod
  * 1e9+7` over UTF-16 code units.
  *
  * Implemented as a codegen'd `UnaryExpression` rather than a Scala UDF
  * so it stays inside whole-stage codegen (no serialization boundary,
  * no boxing per row): `doGenCode` emits a static call on the raw
  * `UTF8String`. The same fold is expressible in ANSI SQL
  * (`list_reduce` over codepoints), which is what the DuckDB oracle
  * uses — identical for ASCII/BMP text.
  */
case class RollingHash(child: Expression, prime: Long = 31L)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String], prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c, ${prime}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Fused double-prime rolling hash: `h31 + h131 * Mod` (the ~2^60
  * fingerprint used by the SimHash/MinHash pipelines) computed in ONE
  * scan of the string instead of two separate [[RollingHash]]
  * evaluations — the token/shingle fingerprint is the hottest
  * per-character loop in the dedup stack. Value is bit-identical to
  * the two-expression formulation (and its DuckDB oracle spelling). */
case class RollingHash2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash2(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash2($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash2 =
    copy(child = newChild)
}

object RollingHash {
  val Mod: Long = 1000000007L
  // the fused-fingerprint primes (hash2 = hashP1 + hashP2 * Mod); the
  // Dedup oracle SQL derives its spelling from these same constants
  val P1: Long = 31L
  val P2: Long = 131L

  /** Static helper invoked from generated code. ASCII fast path reads
    * the UTF8String's bytes directly (no per-row String allocation in
    * the codegen hot loop); non-ASCII falls back to a UTF-16 decode so
    * the result always equals the charAt fold. */
  def hash(s: UTF8String, prime: Long): Long = {
    val n = s.numBytes
    var h = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) return hashViaString(s, prime) // non-ASCII byte
      h = (h * prime + b) % Mod
      i += 1
    }
    h
  }

  private def hashViaString(s: UTF8String, prime: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * prime + str.charAt(i)) % Mod
      i += 1
    }
    h
  }

  /** Fused h31 + h131*Mod in one scan; see [[RollingHash2]]. */
  def hash2(s: UTF8String): Long = {
    val n = s.numBytes
    var h31 = 0L
    var h131 = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) return hash2ViaString(s) // non-ASCII byte
      h31 = (h31 * P1 + b) % Mod
      h131 = (h131 * P2 + b) % Mod
      i += 1
    }
    h31 + h131 * Mod
  }

  private def hash2ViaString(s: UTF8String): Long = {
    val str = s.toString
    var h31 = 0L
    var h131 = 0L
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      h31 = (h31 * P1 + c) % Mod
      h131 = (h131 * P2 + c) % Mod
      i += 1
    }
    h31 + h131 * Mod
  }

  /** DuckDB spelling of [[hash]] for a NON-EMPTY string expression —
    * kept next to the Scala implementation so an oracle and the
    * expression cannot drift (empty-string callers must guard with
    * their own CASE, as `llm_fingerprint` does). */
  def fpSql(v: String, prime: Long): String =
    s"""list_reduce(list_prepend(0::BIGINT,
          list_transform(string_split($v, ''), ch -> unicode(ch)::BIGINT)),
        (acc, ch) -> (acc * $prime + ch) % $Mod)"""

  /** DuckDB spelling of [[hash2]] (fused fp = hP1 + hP2 · Mod). */
  def fp2Sql(v: String): String = s"${fpSql(v, P1)} + ${fpSql(v, P2)} * $Mod"

  /** Column-level entry point; input is cast to string if needed. */
  def rolling_hash(c: Column, prime: Long = 31L): Column =
    Shim.column(RollingHash(Cast(Shim.expression(c), StringType), prime))

  /** Column-level fused double-prime fingerprint. */
  def rolling_hash2(c: Column): Column =
    Shim.column(RollingHash2(Cast(Shim.expression(c), StringType)))
}
