package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern substring scan: count ALL (including
  * overlapping) occurrences of every blocklist pattern in one compiled
  * pass over the text — `struct(n_hits, n_patterns)` per row.
  *
  * The 100 TB shape this exists for: content blocklists in a
  * training-data pipeline run to thousands of phrases. N separate
  * `contains`/`regexp` probes scan the corpus N times (or drive one
  * scan with an O(N)-per-position alternation); the Aho–Corasick
  * automaton (Aho & Corasick 1975) matches the WHOLE dictionary in
  * O(bytes) per document with O(1) per-byte work — goto/fail arrays
  * over the byte alphabet, failure links closed over outputs so a
  * state's hit count and pattern set already include every pattern
  * that ends at a suffix of the current position. The automaton is
  * built ONCE on the driver from the pattern list (size: states x 256
  * ints, the standard dense-byte Snort/ClamAV layout — a few MB for
  * thousands of phrases) and ships to executors as part of the
  * expression; matching is byte-exact over UTF-8, which is sound for
  * literal patterns because UTF-8 is self-synchronizing.
  *
  * `n_hits` counts every (position, pattern) match pair; `n_patterns`
  * counts DISTINCT patterns present (per-row seen flags, reused via a
  * thread-local to stay allocation-free per row). Patterns must be
  * non-empty and duplicate-free — the builder enforces both loudly.
  */
case class BlocklistScan(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "graft_blocklist_scan: empty pattern list")

  override def dataType: DataType = BlocklistScan.structType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_blocklist_scan"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${t.catalogString}")
    }

  @transient private lazy val automaton = BlocklistScan.build(patterns)

  override protected def nullSafeEval(t: Any): Any =
    BlocklistScan.scan(automaton, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val auto = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[BlocklistScan.Automaton].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BlocklistScan.scan($auto, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BlocklistScan = copy(child = newChild)
}

object BlocklistScan {

  val structType: StructType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_patterns", LongType, nullable = false)))

  /** Dense-byte Aho–Corasick with failure-closed outputs: `next` is the
    * goto-with-fallback DFA transition table (states x 256), `hits` the
    * number of patterns ending at each state INCLUDING its failure
    * chain, `pats` those patterns' ids (for the distinct count). */
  final class Automaton(
      val next: Array[Array[Int]],
      val hits: Array[Int],
      val pats: Array[Array[Int]],
      val nPatterns: Int) extends Serializable

  def build(patterns: Seq[String]): Automaton = {
    require(patterns.forall(_.nonEmpty),
      "graft_blocklist_scan: empty pattern")
    require(patterns.distinct.size == patterns.size,
      "graft_blocklist_scan: duplicate patterns")
    val byteSeqs = patterns.map(_.getBytes("UTF-8"))
    // trie
    var states = 1
    val maxStates = byteSeqs.map(_.length).sum + 1
    val goto = Array.fill(maxStates)(Array.fill(256)(-1))
    val ends = Array.fill(maxStates)(List.empty[Int])
    for ((bs, pid) <- byteSeqs.zipWithIndex) {
      var s = 0
      for (b <- bs) {
        val c = b & 0xff
        if (goto(s)(c) < 0) { goto(s)(c) = states; states += 1 }
        s = goto(s)(c)
      }
      ends(s) ::= pid
    }
    // BFS failure links; convert goto to a full DFA in place
    val fail = new Array[Int](states)
    val queue = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      val t = goto(0)(c)
      if (t < 0) goto(0)(c) = 0
      else { fail(t) = 0; queue += t }
    }
    val patsClosed = Array.fill(states)(List.empty[Int])
    for (s <- 0 until states) patsClosed(s) = ends(s)
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      patsClosed(s) = patsClosed(s) ::: patsClosed(fail(s))
      for (c <- 0 until 256) {
        val t = goto(s)(c)
        if (t < 0) goto(s)(c) = goto(fail(s))(c)
        else { fail(t) = goto(fail(s))(c); queue += t }
      }
    }
    new Automaton(
      goto.take(states),
      patsClosed.take(states).map(_.size),
      patsClosed.take(states).map(_.toArray),
      patterns.size)
  }

  // per-thread seen flags so the distinct-pattern count allocates
  // nothing per row (expressions are evaluated single-threaded per task)
  private val seenTL = new ThreadLocal[(Array[Boolean], Array[Int])]

  /** Static helper invoked from generated code: one DFA pass. */
  def scan(a: Automaton, text: UTF8String): GenericInternalRow = {
    var tl = seenTL.get()
    if (tl == null || tl._1.length < a.nPatterns) {
      tl = (new Array[Boolean](a.nPatterns), new Array[Int](a.nPatterns))
      seenTL.set(tl)
    }
    val (seen, touched) = tl
    val bytes = text.getBytes
    var s = 0
    var nHits = 0L
    var nTouched = 0
    var i = 0
    while (i < bytes.length) {
      s = a.next(s)(bytes(i) & 0xff)
      val h = a.hits(s)
      if (h > 0) {
        nHits += h
        val ps = a.pats(s)
        var j = 0
        while (j < ps.length) {
          val p = ps(j)
          if (!seen(p)) { seen(p) = true; touched(nTouched) = p; nTouched += 1 }
          j += 1
        }
      }
      i += 1
    }
    var j = 0
    while (j < nTouched) { seen(touched(j)) = false; j += 1 } // reset
    new GenericInternalRow(Array[Any](nHits, nTouched.toLong))
  }

  /** Column-level entry point. */
  def blocklist_scan(text: Column, patterns: Seq[String]): Column =
    Shim.column(BlocklistScan(Shim.expression(text), patterns))
}
