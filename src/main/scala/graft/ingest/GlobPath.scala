package graft.ingest

/** Glob handling with the reference's semantics
  * (`/root/reference/src/main/scala/.../FtpFileLister.scala:20-25`):
  * a pattern is a glob iff it contains one of `* ? [ {`; matching is
  * per path segment — `*` and `?` never cross a `/`; a monitored
  * directory path ending in `/` implies a trailing `*`
  * (`FtpMonitor.scala:19-21`).
  */
object GlobPath {
  private val GlobChars = Set('*', '?', '[', '{')

  def isGlob(pattern: String): Boolean = pattern.exists(GlobChars.contains)

  /** Expand the implicit-glob rule: a trailing slash implies a trailing star. */
  def normalize(pattern: String): String =
    if (pattern.endsWith("/")) pattern + "*" else pattern

  /** Translate a glob into an anchored Java/RE2-compatible regex.
    * Only uses constructs with identical semantics in java.util.regex
    * and RE2 (DuckDB), so the same string works as a SQL oracle. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    val g = normalize(glob)
    while (i < g.length) {
      g.charAt(i) match {
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case '[' =>
          // char class: pass through, translating leading ! to ^
          sb.append('[')
          i += 1
          if (i < g.length && (g.charAt(i) == '!' || g.charAt(i) == '^')) {
            sb.append('^'); i += 1
          }
          while (i < g.length && g.charAt(i) != ']') {
            sb.append(g.charAt(i)); i += 1
          }
          sb.append(']')
        case '{' =>
          // alternation {a,b,c} -> (a|b|c); an unbalanced '{' is literal
          val close = g.indexOf('}', i)
          if (close < 0) sb.append("\\{")
          else {
            val body = g.substring(i + 1, close)
            sb.append(body.split(',').map(java.util.regex.Pattern.quote)
              .mkString("(", "|", ")"))
            i = close
          }
        case c if "\\.[]{}()<>+-=!$|^".contains(c) => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  def matches(glob: String, path: String): Boolean =
    path.matches(globToRegex(glob))

  /** Segments before the first glob segment can be used as a literal
    * listing prefix — the pruning trick of `FtpFileLister.scala:28-52`:
    * never descend into directories that can't match. */
  def literalPrefix(glob: String): String = {
    val segs = normalize(glob).split("/", -1)
    segs.takeWhile(s => !isGlob(s)).mkString("/")
  }
}
