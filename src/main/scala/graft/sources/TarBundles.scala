package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.Tar

/** WebDataset-style bundle source: a directory of `.tar` shards read
  * as one DataFrame of members — (archive, name, mtime, size, data).
  *
  * The reading side of [[graft.operators.Tar]]: multimodal training
  * corpora ship as tar shards of side-by-side sample files
  * (`000123.jpg` + `000123.txt` + …), consumed SEQUENTIALLY — which
  * is exactly the access pattern Spark's `binaryFile` source + a
  * per-shard decode gives for free:
  *
  *  - one task per shard (tar is not splittable — shard SIZE, not
  *    count, sets parallelism, the gzip-shard contract from
  *    [[JsonlCorpus]]);
  *  - the decode walks each archive once in the executor
  *    (`flatMap` over typed rows — the mapInPandas batch shape, no
  *    shuffle at all);
  *  - `pathGlobFilter` prunes shards at LISTING time, before any
  *    byte is read.
  *
  * Malformed archives fail loudly via the codec's checksum-verified
  * requires — a half-written shard never yields silently shifted
  * members. TarBundlesSpec roundtrips shards written by
  * [[Tar.encode]] AND by the system tar.
  */
object TarBundles {

  final case class Member(
      archive: String, name: String, mtime: Long, size: Long,
      data: Array[Byte])

  /** All members of every `*.tar` under `path` (recursive). */
  def members(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        Tar.decode(bytes).map(e =>
          Member(p, e.name, e.mtime, e.data.length.toLong, e.data))
      }
      .toDF()
  }
}
