package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins. When one join key dominates (the
  * celebrity-user / null-bucket problem), all its rows land in one
  * shuffle partition and a single task runs for hours. Salting splits
  * each hot key into `nSalts` sub-keys: the big side gets a
  * deterministic salt derived from its row content, the small side is
  * replicated once per salt value, and the join key becomes
  * (key, salt) — spreading the hot key over `nSalts` tasks while
  * preserving exact join semantics (each big-side row matches exactly
  * one replica).
  *
  * AQE's skew-join splitting handles moderate skew automatically; the
  * explicit salt is for the pathological single-key case AQE can't
  * subdivide (one key bigger than a partition), and for pre-AQE
  * engines. Salt count trades small-side duplication for parallelism.
  */
object Salting {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join of a skewed `big` side against a `small` side on
    * `key`, salted `nSalts` ways. Result equals `big.join(small, key)`
    * for ANY salt assignment (each big row matches exactly one replica).
    *
    * The salt is `rand(seed)`-based rather than a content hash: the
    * canonical skew case is millions of byte-identical rows under one
    * hot key (null-bucket/default rows), which a content hash would all
    * map to the SAME salt, defeating the spread. `rand` is seeded per
    * partition, so recomputation of a partition from a deterministic
    * source (file scans) reproduces the same salts.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, nSalts: Int,
      seed: Long = 42L): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = big.withColumn(SaltCol,
      floor(rand(seed) * nSalts).cast("long"))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }
}
