package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loader for the driver-generated parquet tables
  * (see /root/repo/TESTDATA.md). Schemas are fixed and known; we never
  * infer beyond the parquet footer. The `events` face pins a contract
  * every consumer relies on: `ts` is an epoch-NANOSECOND Long. The
  * driver has shipped the column physically as both INT64
  * TIMESTAMP(NANOS) (readable only via the
  * `spark.sql.legacy.parquet.nanosAsLong` flag, already a nanos Long)
  * and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ under UTC); `events`
  * normalizes either encoding to the nanos-Long contract at the scan,
  * so consumers derive coarser units themselves (`ts div 1000` → µs,
  * `div 1000000` → ms) and the DuckDB oracles keep reading the same
  * instants via `epoch_us(ts)`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Map whatever physical encoding `ts` arrived in onto the
    * epoch-nanos-Long contract. The cast through TimestampType is
    * numerically lossless: the session timezone is pinned to UTC
    * (Tuning), so an NTZ wall-clock maps to the same instant DuckDB's
    * `epoch_us` reports for the naive value.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    df.schema("ts").dataType match {
      case LongType => df // legacy TIMESTAMP(NANOS) via nanosAsLong
      case _ =>
        df.withColumn("ts", (expr("unix_micros(cast(ts AS timestamp))") * 1000L).cast(LongType))
    }
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
