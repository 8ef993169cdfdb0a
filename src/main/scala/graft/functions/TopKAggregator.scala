package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer/output of the top-k aggregator: parallel arrays sorted
  * best-first (score desc, id asc). A flat Product of primitive arrays
  * encodes to Tungsten `UnsafeArrayData` — the shuffle carries compact
  * binary rows that Catalyst can size and compare, unlike an opaque
  * Kryo blob. */
final case class TopK(scores: Array[Double], ids: Array[Long])

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
  * The buffer is a best-first pair of parallel arrays capped at k
  * (k is small by construction — top-3/top-10 — so linear insert
  * beats heap bookkeeping).
  */
final class TopKAggregator(k: Int) extends Aggregator[(Double, Long), TopK, TopK] {
  require(k > 0, s"k must be positive, got $k")

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: TopK = TopK(Array.emptyDoubleArray, Array.emptyLongArray)

  override def reduce(buf: TopK, in: (Double, Long)): TopK =
    insert(buf, in._1, in._2)

  override def merge(b1: TopK, b2: TopK): TopK = {
    var acc = b1
    var i = 0
    while (i < b2.scores.length) {
      acc = insert(acc, b2.scores(i), b2.ids(i))
      i += 1
    }
    acc
  }

  private def insert(buf: TopK, s: Double, id: Long): TopK = {
    val n = buf.scores.length
    if (n >= k && better(buf.scores(n - 1), buf.ids(n - 1), s, id)) return buf
    var pos = 0
    while (pos < n && better(buf.scores(pos), buf.ids(pos), s, id)) pos += 1
    val m = math.min(n + 1, k)
    val ss = new Array[Double](m)
    val ii = new Array[Long](m)
    System.arraycopy(buf.scores, 0, ss, 0, pos)
    System.arraycopy(buf.ids, 0, ii, 0, pos)
    ss(pos) = s
    ii(pos) = id
    val rest = m - pos - 1
    System.arraycopy(buf.scores, pos, ss, pos + 1, rest)
    System.arraycopy(buf.ids, pos, ii, pos + 1, rest)
    TopK(ss, ii)
  }

  override def finish(buf: TopK): TopK = buf

  override def bufferEncoder: Encoder[TopK] = Encoders.product[TopK]
  override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
}
