package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins. When one join key dominates (the
  * celebrity-user / null-bucket problem), all its rows land in one
  * shuffle partition and a single task runs for hours. Salting splits
  * each hot key into `nSalts` sub-keys: the big side gets a salt, the
  * small side is replicated once per salt value, and the join key
  * becomes (key, salt) — spreading the hot key over `nSalts` tasks
  * while preserving exact join semantics (each big-side row matches
  * exactly one replica).
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
    * The DEFAULT salt is a content hash of the whole row — fully
    * deterministic, so a recomputed task under retry assigns the same
    * salts and the join stays exact for any input (aggregates,
    * repartition outputs, caches), not just file scans. The one case a
    * content hash cannot spread is millions of byte-IDENTICAL rows
    * under the hot key; for that workload pass an explicit `salt`
    * such as `floor(rand(seed) * nSalts)` — but only over a
    * deterministic source (a file scan), because rand re-draws on
    * task retry and can silently duplicate/drop rows otherwise
    * (the SPARK-23207 class of hazard). */
  /** The deterministic content-hash salt [[saltedJoin]] applies to the
    * big side by default, exposed so tests/diagnostics can measure the
    * per-(key, salt) spread the join will actually shuffle with. */
  def defaultSalt(big: DataFrame, nSalts: Int): Column =
    pmod(xxhash64(big.columns.map(col): _*).cast("long"), lit(nSalts.toLong))

  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, nSalts: Int,
      salt: Option[Column] = None): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val saltExpr = salt.map(c => pmod(c.cast("long"), lit(nSalts.toLong)))
      .getOrElse(defaultSalt(big, nSalts))
    val salted = big.withColumn(SaltCol, saltExpr)
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }
}
