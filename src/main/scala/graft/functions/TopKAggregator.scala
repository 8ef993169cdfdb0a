package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k as an `Aggregator` — the UDAF surface the
  * reference lacks entirely (SURVEY.md §2.2), and the scale path for
  * per-key ranking: a window `row_number` must shuffle and sort EVERY
  * row of a group, while this aggregator keeps a bounded k-element
  * buffer per group on the map side, so the shuffle carries at most
  * k rows per key regardless of group size.
  *
  * Ordering: score descending, id ascending as the deterministic
  * tiebreak (matching the window-variant queries and their oracles).
  *
  * Input rows are (score, id); the buffer is a best-first list capped
  * at k (k is small by construction — top-3/top-10 — so linear insert
  * beats heap bookkeeping).
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    insert(buf, in)

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    b2.foldLeft(b1)(insert)

  private def insert(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] = {
    if (buf.sizeIs >= k && better(buf.last, in)) buf
    else {
      val (front, back) = buf.span(better(_, in))
      (front ::: in :: back).take(k)
    }
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
}
