package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Hadoop-FS twin of [[graft.ingest.GenSwap]] — the same two-generation
  * publish protocol (target / old staging / tmp, crash-recoverable at
  * every step), expressed through `FileSystem` so state can live on
  * WHATEVER filesystem the path names: the incremental-drain watermark
  * rides the artifact root (`spark.graft.artifactsRoot`), which on a
  * cluster is `hdfs://`/`s3a://` shared storage — a `java.io.File`
  * swap there would silently resolve against the driver's LOCAL disk
  * and desynchronize the watermark from the bins it guards (the same
  * class of bug the artifacts-root conf closed for the index tier).
  * `GenSwap` itself stays byte-identical for the local-only ingest
  * state it serves.
  *
  * Semantics mirrored 1:1: a generation is readable when it holds a
  * parquet part; `publish` stages the old target before the rename so
  * a crash mid-publish leaves either the old or the new generation
  * readable, never neither.
  */
private[graft] object FsSwap {

  private def hasParts(conf: Configuration, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** The current readable generation: the target if present, else the
    * staged old generation (recovery after a crash mid-publish). */
  def readable(conf: Configuration, target: String,
      old: String): Option[String] =
    if (hasParts(conf, target)) Some(target)
    else if (hasParts(conf, old)) Some(old)
    else None

  /** Publish `tmp` as `target`. The old target is staged at `old` only
    * when it exists; a staged generation from a previous crash is kept
    * until the publish completes.
    *
    * SINGLE-PUBLISHER contract (like [[graft.ingest.GenSwap]]): the
    * stage-then-rename pair is atomic only against CRASHES, not against
    * a concurrent publisher — two drains publishing the same target
    * could interleave the two renames and leave the staged old
    * generation as the readable one. Callers (the nightly/streaming
    * compaction drains) must ensure one publisher per stateDir at a
    * time; concurrent EXECUTION is fine, concurrent PUBLISH is not. */
  def publish(conf: Configuration, tmp: String, target: String,
      old: String): Unit = {
    val targetP = new Path(target)
    val oldP = new Path(old)
    val fs = targetP.getFileSystem(conf)
    if (fs.exists(targetP)) {
      if (fs.exists(oldP)) fs.delete(oldP, true)
      if (!fs.rename(targetP, oldP))
        throw new java.io.IOException(s"cannot stage $target -> $old")
    }
    if (!fs.rename(new Path(tmp), targetP))
      throw new java.io.IOException(s"cannot publish $tmp -> $target")
    if (fs.exists(oldP)) fs.delete(oldP, true)
    ()
  }
}
