package graft.functions

/** Jaro-Winkler string similarity (Jaro 1989; Winkler 1990) — the
  * record-linkage community's standard name-matching score, pure
  * Scala. Match window ⌊max(l1,l2)/2⌋−1, transpositions = half the
  * out-of-order matches, Winkler prefix boost p = 0.1 over the first
  * 4 characters above the 0.7 boost threshold — the exact textbook
  * constants, which is the point: `dedup_jaro_winkler`'s oracle is
  * DuckDB's OWN independent C++ implementation, so the hash-match is
  * a cross-IMPLEMENTATION proof, not a replay of our arithmetic.
  */
object JaroWinkler {

  def jaro(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val (l1, l2) = (s1.length, s2.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    (m.toDouble / l1 + m.toDouble / l2 +
      (m - half).toDouble / m) / 3.0
  }

  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) j
    else {
      var l = 0
      val max = math.min(4, math.min(s1.length, s2.length))
      while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }
}
