package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack, Tables}

/** Data-layout operators: multi-dimensional (Z-order) clustering for
  * scan pruning. A 100 TB table queried by more than one key cannot be
  * sorted to help them all — rank-normalizing each key, interleaving
  * the rank bits onto a space-filling curve, and range-partitioning on
  * the curve position gives every file/bucket a BOUNDED min-max
  * envelope in EVERY interleaved dimension, so per-file column
  * statistics prune scans on any of them (the mechanism behind
  * Delta/Iceberg `OPTIMIZE ZORDER`, which likewise interleaves
  * per-column range-partition ids, not raw values — raw interleaving
  * degenerates to a single-key sort when the dimensions' bit widths
  * differ, exactly what rank normalization prevents).
  *
  * All three rank passes ride [[Relational.globalNtile]] (range
  * repartition + rank-as-projection, ZERO post-sort shuffles each), so
  * the layout job pays only the range shuffles a clustering rewrite
  * must pay, and the curve arithmetic is pure integer div/mod —
  * identical in both engines. LayoutSpec quantifies the pruning claim:
  * Z-buckets bound both key dimensions at once where a single-key sort
  * leaves the other dimension's envelope at full width.
  */
object Layout extends QueryPack {

  /** Rank levels per dimension (2^RankBits); 4 bits × 2 dims = an
    * 8-bit curve, plenty for 16 output buckets. A production rewrite
    * raises levels with the file count — the plan shape is invariant. */
  private val RankBits = 4
  private val Levels = 1 << RankBits

  /** Z-buckets produced (= files a layout rewrite would emit). */
  private val NBuckets = 16

  /** z = Σ_i aBit_i·4^i + 2·Σ_i bBit_i·4^i — bit interleaving of two
    * already-normalized non-negative ints, written as div/mod/multiply
    * by literals so ONE generator yields both the Spark (`div`) and
    * DuckDB (`//`) spellings (no engine-specific shift operators to
    * drift). */
  private[operators] def zExpr(a: String, b: String, bits: Int, div: String): String =
    (0 until bits).map { i =>
      val p = 1L << i
      val w = 1L << (2 * i)
      s"((($a $div $p) % 2) * $w) + ((($b $div $p) % 2) * ${w * 2})"
    }.mkString("(", " + ", ")")

  override val queries: Map[String, QueryDef] = Map(

    // ── Z-order layout census: rank-normalize both keys, bucket by
    //    curve position, prove the per-bucket envelope of BOTH keys ──
    // Output is the file-level metadata a lakehouse keeps (row count +
    // per-column min/max per file): small envelopes in both l_partkey
    // and l_suppkey are exactly what lets a filter on EITHER key skip
    // most buckets. DuckDB re-derives the rank normalization, the
    // curve, and every bucket assignment via its own ntile, so the
    // whole mechanism is value-checked end to end.
    "q_zorder_layout" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        // (l_orderkey, l_linenumber) is NOT unique in these tables, so
        // every rank pass sorts on a key set that determines the full
        // row content (plus the prior pass's rank): rows still tied are
        // then IDENTICAL tuples, interchangeable under any engine's
        // tie order — the ntile assignments stay deterministic where it
        // matters. (z ties need no rank tiebreak: the interleave is
        // injective, so equal z implies equal ranks.)
        val base = Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
        val pkRanked = Relational.globalNtile(s, base, Levels,
            Seq($"l_partkey", $"l_orderkey", $"l_linenumber", $"l_suppkey"))
          .withColumnRenamed("tile", "pk_rank")
        val skRanked = Relational.globalNtile(s, pkRanked, Levels,
            Seq($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey", $"pk_rank"))
          .withColumnRenamed("tile", "sk_rank")
        val curved = skRanked.withColumn("z",
          expr(zExpr("(pk_rank - 1)", "(sk_rank - 1)", RankBits, "div")))
        Relational.globalNtile(s, curved, NBuckets,
            Seq($"z", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"))
          .groupBy($"tile")
          .agg(count(lit(1)).as("n"),
            min($"l_partkey").as("min_pk"), max($"l_partkey").as("max_pk"),
            min($"l_suppkey").as("min_sk"), max($"l_suppkey").as("max_sk"))
          .select($"tile".as("bucket"), $"n",
            $"min_pk", $"max_pk", $"min_sk", $"max_sk")
          .orderBy($"bucket")
      },
      oracle = Some(s"""
        WITH t AS (
          SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
            CAST(ntile($Levels) OVER (
              ORDER BY l_partkey, l_orderkey, l_linenumber, l_suppkey) AS BIGINT)
              AS pk_rank
          FROM lineitem),
        t2 AS (
          SELECT *,
            CAST(ntile($Levels) OVER (
              ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, pk_rank)
              AS BIGINT) AS sk_rank
          FROM t),
        zt AS (
          SELECT *, ${zExpr("(pk_rank - 1)", "(sk_rank - 1)", RankBits, "//")} AS z
          FROM t2),
        r AS (
          SELECT l_partkey, l_suppkey,
                 ntile($NBuckets) OVER (
                   ORDER BY z, l_orderkey, l_linenumber, l_partkey, l_suppkey)
                   AS bucket
          FROM zt)
        SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
               MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
               MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk
        FROM r
        GROUP BY bucket
        ORDER BY bucket"""),
      headline = true),
  )
}
