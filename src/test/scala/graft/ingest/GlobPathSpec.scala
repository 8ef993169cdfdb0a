package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Glob semantics from the reference's FtpFileListerTest
  * (/root/reference/src/test/scala/.../FtpFileListerTest.scala:42-79):
  * the "dir?/path/star.txt" tree matches the right leaves, star never
  * crosses a slash, and the glob-char set is star, ?, [, {.
  */
class GlobPathSpec extends AnyFunSuite with Matchers {

  test("glob char detection matches the reference set") {
    GlobPath.isGlob("/a/path/file.txt") shouldBe false
    GlobPath.isGlob("/a/*/file.txt") shouldBe true
    GlobPath.isGlob("/a/dir?/f") shouldBe true
    GlobPath.isGlob("/a/[ab]/f") shouldBe true
    GlobPath.isGlob("/a/{x,y}/f") shouldBe true
  }

  test("trailing slash implies trailing star (FtpMonitor.scala:19-21)") {
    GlobPath.normalize("/tails/") shouldBe "/tails/*"
    GlobPath.normalize("/tails/*") shouldBe "/tails/*"
  }

  test("reference glob tree: /a/dir?/path/*.txt") {
    val g = "/a/dir?/path/*.txt"
    GlobPath.matches(g, "/a/dira/path/file1.txt") shouldBe true
    GlobPath.matches(g, "/a/dirb/path/file3.txt") shouldBe true
    GlobPath.matches(g, "/a/dirb/path/file4.csv") shouldBe false // extension
    GlobPath.matches(g, "/a/dirb/nopath/file2.txt") shouldBe false // wrong dir
    GlobPath.matches(g, "/a/dirxx/path/file1.txt") shouldBe false // ? is one char
  }

  test("star does not cross path segments") {
    GlobPath.matches("/a/*.txt", "/a/b/c.txt") shouldBe false
    GlobPath.matches("/a/*.txt", "/a/c.txt") shouldBe true
  }

  test("alternation and char classes") {
    GlobPath.matches("/d/{x,y}/f", "/d/x/f") shouldBe true
    GlobPath.matches("/d/{x,y}/f", "/d/z/f") shouldBe false
    GlobPath.matches("/d/[ab]0", "/d/a0") shouldBe true
    GlobPath.matches("/d/[!ab]0", "/d/c0") shouldBe true
    GlobPath.matches("/d/[!ab]0", "/d/a0") shouldBe false
  }

  test("wildcards inside groups are live, like NIO glob (the reference's engine)") {
    // java.nio PathMatcher("glob:{app*,sys*}.log") matches app1.log
    GlobPath.matches("/logs/{app*,sys*}.log", "/logs/app1.log") shouldBe true
    GlobPath.matches("/logs/{app*,sys*}.log", "/logs/sys.log") shouldBe true
    GlobPath.matches("/logs/{app*,sys*}.log", "/logs/kernel.log") shouldBe false
    GlobPath.matches("/d/{a[0-9],b?}.csv", "/d/a7.csv") shouldBe true
    GlobPath.matches("/d/{a[0-9],b?}.csv", "/d/bz.csv") shouldBe true
    GlobPath.matches("/d/{a[0-9],b?}.csv", "/d/ax.csv") shouldBe false
  }

  test("malformed globs fail fast, like NIO, instead of silently matching nothing") {
    intercept[IllegalArgumentException](GlobPath.globToRegex("/d/a[bc"))
    intercept[IllegalArgumentException](GlobPath.globToRegex("/d/{a,b"))
    intercept[IllegalArgumentException](GlobPath.globToRegex("/d/{a,{b,c}}"))
    intercept[IllegalArgumentException](GlobPath.globToRegex("/d/a[x/]b"))
  }

  test("backslash escapes the next character, like NIO's PathMatcher") {
    // a\*b matches the literal name "a*b", never a wildcard expansion
    GlobPath.matches("/d/a\\*b", "/d/a*b") shouldBe true
    GlobPath.matches("/d/a\\*b", "/d/axxb") shouldBe false
    GlobPath.matches("/d/a\\?b", "/d/a?b") shouldBe true
    GlobPath.matches("/d/a\\?b", "/d/axb") shouldBe false
    // escaped backslash is a literal backslash
    GlobPath.matches("/d/a\\\\b", "/d/a\\b") shouldBe true
    // a trailing bare escape is malformed, like NIO
    intercept[IllegalArgumentException](GlobPath.globToRegex("/d/a\\"))
  }

  test("regex metacharacters in literals are escaped") {
    GlobPath.matches("/d/a.b", "/d/a.b") shouldBe true
    GlobPath.matches("/d/a.b", "/d/axb") shouldBe false
    GlobPath.matches("/d/a+b", "/d/a+b") shouldBe true
  }

  test("literal prefix for pruned descent") {
    GlobPath.literalPrefix("/a/dir?/path/*.txt") shouldBe "/a"
    GlobPath.literalPrefix("/a/b/c.txt") shouldBe "/a/b/c.txt"
    GlobPath.literalPrefix("/tails/") shouldBe "/tails"
  }
}
