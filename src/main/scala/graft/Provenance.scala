package graft

/** Build/version provenance (SURVEY.md §2 #21; reference
  * `GitRepositoryState.scala:4-17` reads a generated git.properties).
  * Reads the optional `graft-build.properties` classpath resource,
  * falling back to manifest-less defaults — same contract: a one-line
  * summary loggable at connector start.
  */
object Provenance {
  private val props: java.util.Properties = {
    val p = new java.util.Properties()
    val in = getClass.getResourceAsStream("/graft-build.properties")
    if (in != null) try p.load(in) finally in.close()
    p
  }

  def name: String = props.getProperty("name", "kafkaconnectftpspark")
  def version: String = props.getProperty("version", "0.1.0")
  def builtAt: String = props.getProperty("builtAt", "unknown")

  def summary: String = s"$name $version (built $builtAt)"
}
