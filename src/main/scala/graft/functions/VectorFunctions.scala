package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding math over `array<double>` columns — no UDFs, no
  * serialization boundary. The reductions (dot, norm², L2²) are native
  * codegen'd Catalyst expressions ([[VectorExprs]]): Spark's built-in
  * higher-order functions are CodegenFallback (interpreted, boxed per
  * element), which made them the hot-path cost of the similarity
  * stack. Fold order is strictly left-to-right, identical to the HOF
  * formulation and DuckDB's `list_sum`, so oracle values are
  * bit-for-bit unchanged.
  */
object VectorFunctions {

  /** array<float> → array<double>, element-wise. */
  def toDoubleArray(c: Column): Column = transform(c, _.cast("double"))

  /** Left-to-right dot product (codegen'd primitive loop). */
  def dot(a: Column, b: Column): Column = VectorExprs.dot(a, b)

  def normSq(a: Column): Column = VectorExprs.dot(a, a)

  /** Squared L2 distance (codegen'd primitive loop). */
  def l2sq(a: Column, b: Column): Column = VectorExprs.l2sq(a, b)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Component i of deterministic pseudo-random hyperplane j: a
    * splitmix64-style avalanche mix of the flat index mapped into
    * [-0.5, 0.5). No RNG state — reproducible anywhere, stable across
    * runs/partitions. The full-avalanche finalizer matters: a single
    * Knuth multiply on sequential indices yields CORRELATED planes,
    * which silently wrecks multi-band LSH recall (observed: 98% instead
    * of ~1-1e-11 on planted near-duplicates). */
  def planeComponent(j: Int, i: Int, dim: Int): Double = {
    var z = (j.toLong * dim + i) * 0x9E3779B97F4A7C15L
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  /** Sign-bit LSH bucket over `nPlanes` deterministic hyperplanes
    * (Charikar-style random-hyperplane LSH): bucket = integer formed by
    * the sign bits of the plane dot products. Planes are literal arrays
    * folded into the plan, so the whole bucket computation codegens into
    * the scan stage — no shuffle until the bucket groupBy.
    *
    * `base` selects which planes to use (plane ids `base..base+nPlanes-1`)
    * so multi-table LSH banding can derive independent bucket families
    * from the same deterministic stream.
    */
  def lshBucket(emb: Column, nPlanes: Int, dim: Int, base: Int = 0): Column =
    (0 until nPlanes).map { j =>
      val p = array((0 until dim).map(i => lit(planeComponent(base + j, i, dim))): _*)
      when(dot(emb, p) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
