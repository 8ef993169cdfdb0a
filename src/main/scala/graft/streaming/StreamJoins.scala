package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with event-time interval conditions (SURVEY.md
  * §2.2 event-time family): correlate two live streams — e.g. file-drop
  * notifications against manifest records, or impressions against
  * conversions — without ever materializing either side.
  *
  * Scale design: Spark keeps BOTH sides' unmatched rows in the state
  * store until they can no longer join. That state is bounded only when
  * (a) both inputs carry a watermark and (b) the join condition bounds
  * the two event times against each other — then rows older than
  * `watermark + interval` are evicted every micro-batch. This helper
  * enforces both by construction, so a query built from it cannot
  * silently accumulate unbounded join state on a 1000-executor cluster.
  * The equality keys shuffle-partition both streams identically
  * (hash-partitioned symmetric join), so each task joins co-located
  * state — no broadcast, no driver involvement.
  *
  * Outer variants emit the null-padded row only once the watermark
  * proves no match can arrive — the streaming analog of the batch outer
  * join's "no match exists" certainty.
  */
object StreamJoins {

  /** Join `left` and `right` on equality `keys` with `right`'s event
    * time constrained to `[left - lower, left + upper]`. Both sides get
    * `delay` watermarks. `joinType`: inner, left_outer, right_outer, or
    * full_outer (outer types require exactly this watermark + interval
    * shape, which is why the helper owns it).
    *
    * The joined sides keep their `l`/`r` aliases, and the key columns
    * appear on BOTH (an expression-condition join does not merge them):
    * select `col("l.k")` / `col("r.k")` to disambiguate. For outer
    * types, read the key from the side that is always present (left for
    * left_outer, right for right_outer) or coalesce the two.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      delay: String,
      lower: String,
      upper: String,
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equality key")
    val l = left.withWatermark(leftTimeCol, delay).as("l")
    val r = right.withWatermark(rightTimeCol, delay).as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond =
      col(s"r.$rightTimeCol") >= col(s"l.$leftTimeCol") - expr(s"INTERVAL $lower") &&
        col(s"r.$rightTimeCol") <= col(s"l.$leftTimeCol") + expr(s"INTERVAL $upper")
    l.join(r, keyCond && timeCond, joinType)
  }
}
