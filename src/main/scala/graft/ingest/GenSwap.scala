package graft.ingest

import java.io.File

import org.apache.commons.io.FileUtils

/** Crash-safe directory generation swap for the parquet spools (poll
  * state, carry-over buffer). The previous generation is staged aside —
  * never deleted — until the new one is published, and every rename is
  * checked, so at any crash point at least one complete generation is
  * readable; readers fall back to the staged `.old` generation. At
  * worst a crash re-serves/re-fetches a generation (at-least-once),
  * never loses one.
  */
private[graft] object GenSwap {

  def hasParts(dir: String): Boolean =
    Option(new File(dir).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))

  /** The current readable generation: the target if present, else the
    * staged old generation (recovery after a crash mid-publish). */
  def readable(target: String, old: String): Option[String] =
    if (hasParts(target)) Some(target)
    else if (hasParts(old)) Some(old)
    else None

  /** Publish `tmp` as `target`. The old target is staged at `old` only
    * when it exists; a staged generation from a previous crash is kept
    * until the publish completes. */
  def publish(tmp: String, target: String, old: String): Unit = {
    val targetF = new File(target)
    val oldF = new File(old)
    if (targetF.exists()) {
      if (oldF.exists()) FileUtils.deleteDirectory(oldF)
      if (!targetF.renameTo(oldF))
        throw new java.io.IOException(s"cannot stage $target -> $old")
    }
    if (!new File(tmp).renameTo(targetF))
      throw new java.io.IOException(s"cannot publish $tmp -> $target")
    if (oldF.exists()) FileUtils.deleteDirectory(oldF)
  }
}
