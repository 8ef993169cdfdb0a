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

  /** Translate a glob into an anchored Java/RE2-compatible regex,
    * replicating java.nio `PathMatcher("glob:...")` — the engine the
    * reference delegates to (`FtpFileLister.scala:20-23`): wildcards
    * are live INSIDE `{}` groups (each member is itself a glob), groups
    * cannot nest, and malformed constructs (unclosed `[`/`{`, `/` in a
    * character class) fail fast instead of silently matching nothing.
    * Only uses constructs with identical semantics in java.util.regex
    * and RE2 (DuckDB), so the same string works as a SQL oracle. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    var inGroup = false
    val g = normalize(glob)
    while (i < g.length) {
      g.charAt(i) match {
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case '[' =>
          // char class: translate leading ! to ^, keep ranges, reject
          // the path separator (NIO: "explicit name separator in class")
          sb.append('[')
          i += 1
          if (i < g.length && (g.charAt(i) == '!' || g.charAt(i) == '^')) {
            sb.append('^'); i += 1
          }
          var closed = false
          val start = i
          while (i < g.length && !closed) {
            g.charAt(i) match {
              case ']' if i > start => closed = true
              case '/' => throw new IllegalArgumentException(
                s"'/' inside character class in glob: $glob")
              case c =>
                if (c == '\\' || c == '[' || c == '&') sb.append('\\')
                sb.append(c)
                i += 1
            }
          }
          if (!closed) throw new IllegalArgumentException(
            s"unclosed character class in glob: $glob")
          sb.append(']')
        case '{' =>
          if (inGroup) throw new IllegalArgumentException(
            s"nested group in glob: $glob")
          inGroup = true
          sb.append('(')
        case ',' if inGroup => sb.append('|')
        case '}' if inGroup =>
          inGroup = false
          sb.append(')')
        case '\\' =>
          // NIO PathMatcher semantics: backslash ESCAPES the next
          // character (glob a\*b matches the literal name "a*b") — it
          // is not a literal backslash
          i += 1
          if (i >= g.length) throw new IllegalArgumentException(
            s"trailing escape in glob: $glob")
          val c = g.charAt(i)
          if ("\\.[]{}()<>+-=!$|^*?&".contains(c)) sb.append('\\')
          sb.append(c)
        case c if ".]}()<>+-=!$|^".contains(c) => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    if (inGroup) throw new IllegalArgumentException(s"unclosed group in glob: $glob")
    sb.append('$').toString
  }

  // one compiled Pattern per distinct glob (globs come from config — a
  // handful — while matches() runs per listed path)
  private val compiled =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  def matches(glob: String, path: String): Boolean =
    compiled.computeIfAbsent(glob,
      g => java.util.regex.Pattern.compile(globToRegex(g))).matcher(path).matches()

  /** Segments before the first glob segment can be used as a literal
    * listing prefix — the pruning trick of `FtpFileLister.scala:28-52`:
    * never descend into directories that can't match. */
  def literalPrefix(glob: String): String = {
    val segs = normalize(glob).split("/", -1)
    segs.takeWhile(s => !isGlob(s)).mkString("/")
  }
}
