package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer/output of the Misra–Gries summary: parallel arrays of at most
  * `cap` (term, count) counters. A flat Product of arrays encodes to
  * Tungsten array data — the shuffle carries a compact bounded row per
  * partial aggregate, never the full term distribution. */
final case class MG(terms: Array[String], counts: Array[Long])

/** Mergeable Misra–Gries heavy-hitters summary as a typed `Aggregator`.
  *
  * Classic guarantee (Misra & Gries 1982), preserved under arbitrary
  * merge trees (Agarwal et al., "Mergeable Summaries", PODS 2012): with
  * `cap` counters, every term whose true frequency exceeds N/(cap+1)
  * is guaranteed present in the summary, and each retained count
  * undercounts by at most N/(cap+1). The summary itself depends on
  * partitioning/merge order, so it is NOT directly oracle-checkable —
  * the heavy-hitters query uses it only as a candidate filter and
  * re-counts candidates exactly, making the final answer deterministic
  * and value-checked (a lost heavy hitter would hash-mismatch the
  * oracle).
  *
  * Scale shape: this runs as map-side partial aggregation, so each
  * partition contributes at most `cap` counters to the shuffle — the
  * frequent-items pattern for a 100 TB corpus where the raw
  * per-partition vocabularies would not fit a reducer.
  *
  * reduce() is O(cap) linear scan per token; cap is small (≤ a few
  * hundred) by construction, and the scan beats hash-map boxing at
  * these sizes, mirroring [[TopKAggregator]]'s linear insert.
  */
final class MisraGriesAggregator(cap: Int) extends Aggregator[String, MG, MG] {
  require(cap > 0, s"cap must be positive, got $cap")

  override def zero: MG = MG(Array.empty[String], Array.emptyLongArray)

  override def reduce(buf: MG, term: String): MG = {
    val n = buf.terms.length
    var i = 0
    while (i < n) {
      if (buf.terms(i) == term) { buf.counts(i) += 1; return buf }
      i += 1
    }
    if (n < cap) {
      MG(buf.terms :+ term, buf.counts :+ 1L)
    } else {
      // full and term absent: decrement every counter (the new term's
      // implicit count of 1 cancels against the same decrement), drop
      // zeros — the standard MG eviction step
      decrementAndCompact(buf, 1L)
    }
  }

  override def merge(b1: MG, b2: MG): MG = {
    if (b2.terms.isEmpty) return b1
    if (b1.terms.isEmpty) return b2
    // sum counters over the union of terms
    val idx = new java.util.HashMap[String, Integer](b1.terms.length * 2)
    var i = 0
    while (i < b1.terms.length) { idx.put(b1.terms(i), i); i += 1 }
    val extraT = Array.newBuilder[String]
    val extraC = Array.newBuilder[Long]
    var j = 0
    while (j < b2.terms.length) {
      val at = idx.get(b2.terms(j))
      if (at != null) b1.counts(at) += b2.counts(j)
      else { extraT += b2.terms(j); extraC += b2.counts(j) }
      j += 1
    }
    val merged = MG(b1.terms ++ extraT.result(), b1.counts ++ extraC.result())
    if (merged.terms.length <= cap) merged
    else {
      // subtract the (cap+1)-th largest count from all counters and
      // keep the strictly-positive ones — the mergeable-summaries
      // reduction (at most cap survive by construction)
      val sorted = merged.counts.clone()
      java.util.Arrays.sort(sorted)
      val kth = sorted(sorted.length - (cap + 1))
      decrementAndCompact(merged, kth)
    }
  }

  private def decrementAndCompact(buf: MG, by: Long): MG = {
    var keep = 0
    var i = 0
    while (i < buf.counts.length) {
      if (buf.counts(i) > by) keep += 1
      i += 1
    }
    val ts = new Array[String](keep)
    val cs = new Array[Long](keep)
    var o = 0
    i = 0
    while (i < buf.counts.length) {
      if (buf.counts(i) > by) { ts(o) = buf.terms(i); cs(o) = buf.counts(i) - by; o += 1 }
      i += 1
    }
    MG(ts, cs)
  }

  override def finish(buf: MG): MG = buf

  override def bufferEncoder: Encoder[MG] = Encoders.product[MG]
  override def outputEncoder: Encoder[MG] = Encoders.product[MG]
}
