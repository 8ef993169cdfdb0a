package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the shuffle-elimination strategy for
  * repeated fact-fact joins at 100 TB: write both tables bucketed (and
  * sorted) by the join key once; every subsequent equi-join on that key
  * reads co-located buckets and sort-merge-joins them with NO exchange
  * on either side. At cluster scale this converts the dominant cost of
  * a lineitem⋈orders-shaped join (two full shuffles) into a pure scan.
  *
  * Uses the session catalog's managed tables (`bucketBy` requires
  * `saveAsTable`); the bucket count should be sized so one bucket of
  * the larger table fits an executor core's working set (e.g. 2048
  * buckets for a 10 TB fact at ~5 GB/bucket).
  */
object Bucketing {

  /** Write `df` as a managed bucketed+sorted table. The pre-write
    * `repartition(buckets, key)` uses the same murmur3 hash as the
    * bucketing, so each bucket lands in exactly ONE file — without it
    * every input task writes into every bucket (inputPartitions ×
    * buckets small files), and Spark only reports the bucketed scan's
    * sort order when buckets are single-file, so multi-file buckets
    * silently re-sort both sides of every "co-located" join.
    *
    * Note `SaveMode.Overwrite` on a managed table is drop-then-recreate
    * — NOT atomic: a failed write leaves no table. A serving pipeline
    * should write to a versioned name and swap with ALTER/rename (the
    * same generation pattern as `ingest.GenSwap`). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key. When both sides
    * are bucketed with the same bucket count on `key`, the plan is a
    * sort-merge join with zero shuffle exchanges (verify with
    * `.explain` / the BucketingSpec assertion). */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
