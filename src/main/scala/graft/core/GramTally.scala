package graft.core

/** Per-DOCUMENT word-n-gram repetition masses — the doc-local kernel behind
  * `TextAnalysis.ngramRepetitionFractions`. Both Gopher repetition families
  * are document-scoped statistics (counts never cross documents), so they
  * need NO exchange at all: this tally runs inside the per-doc map with the
  * whole token array in hand and emits nine final covered masses. Memory is
  * O(tokens of one document) per task — the same bound the tokenizer's own
  * token array already imposes.
  *
  * Pinned semantics (identical to the exchange-based single-family
  * operators, property-tested against them):
  *   - occurrences counted at EVERY sliding position (overlapping); gram
  *     string = tokens joined by one space; gram length = CODEPOINTS
  *     (token codepoint counts + n-1 separators)
  *   - top family (n=2..4): covered = maxCount × length of the winning
  *     gram, ties at the max broken by the lexicographically smallest gram
  *     in UTF-8 BYTE order (Spark's UTF8String and DuckDB's binary
  *     collation both compare UTF-8 bytes; Java String.compareTo compares
  *     UTF-16 units and diverges on astral chars — never use it here)
  *   - dup family (n=5..10): covered = sum over grams occurring >= 2 times
  *     of count × length
  *
  * Gram identity is the FNV-1a-style combine of two independent murmur2
  * passes per token (64-bit) — the same accepted collision trade as the
  * hashed exchanges elsewhere; within a single document a colliding pair is
  * astronomically unlikely, and the tie-break path re-extracts the actual
  * strings for winning classes only.
  */
object GramTally {
  val TopNs: Array[Int] = Array(2, 3, 4)
  val DupNs: Array[Int] = Array(5, 6, 7, 8, 9, 10)

  /** Covered masses for one document's tokens: indices 0..2 = top-{2,3,4}
    * covered (maxCnt × winnerLen), 3..8 = dup-{5..10} covered (duplicated
    * mass). A family with fewer than n tokens stays 0.
    */
  def coveredMasses(toks: Array[String]): Array[Long] = {
    val res = new Array[Long](9)
    if (toks.length < 2) return res
    val tokHash = new Array[Long](toks.length)
    // prefix sums of codepoint token lengths: gram length at (i, n) is
    // prefLen(i+n) - prefLen(i) + n - 1 — O(1), no per-position loop
    val prefLen = new Array[Int](toks.length + 1)
    var k = 0
    while (k < toks.length) {
      tokHash(k) = (Murmur2.hashString(toks(k), 0x9747b28c).toLong << 32) |
        (Murmur2.hashString(toks(k), 0x5bd1e995).toLong & 0xffffffffL)
      prefLen(k + 1) = prefLen(k) + toks(k).codePointCount(0, toks(k).length)
      k += 1
    }
    // open-addressed (hash -> count, maxLen) tally, sized once for the
    // largest family (n=2 has toks.length-1 positions) and reset per n;
    // cnt==0 marks an empty slot so key 0 needs no sentinel
    var cap = 4
    while (cap < (toks.length - 1) * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Int](cap)
    val lens = new Array[Int](cap)

    def positionHash(i: Int, n: Int): Long = {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        h = (h ^ tokHash(i + j)) * 0x100000001b3L
        j += 1
      }
      h
    }
    def positionLen(i: Int, n: Int): Int = prefLen(i + n) - prefLen(i) + n - 1
    def slotOf(h: Long): Int = {
      var idx = ((h ^ (h >>> 32)).toInt) & mask
      while (cnts(idx) != 0 && keys(idx) != h) idx = (idx + 1) & mask
      idx
    }
    // lexicographic comparison of the grams at positions a and b in
    // CODE-POINT (== UTF-8 byte) order, walking token chars with a virtual
    // ' ' separator — no gram string is ever built. UTF-16 unit order
    // diverges from code-point order only between surrogates and
    // [U+E000, U+FFFF]; cpKey re-ranks exactly those ranges.
    def cpKey(c: Char): Int =
      if (c < 0xd800) c else if (c >= 0xe000) c - 0x800 else c + 0x2000
    def gramCompare(a: Int, b: Int, n: Int): Int = {
      var j = 0
      while (j < n) {
        val x = toks(a + j); val y = toks(b + j)
        val m = math.min(x.length, y.length)
        var i = 0
        while (i < m) {
          val cx = x.charAt(i); val cy = y.charAt(i)
          if (cx != cy) return cpKey(cx) - cpKey(cy)
          i += 1
        }
        if (x.length != y.length) {
          // the shorter token is followed by ' ' (0x20) or gram end, both
          // below any token char (tokens never contain the ws class, and
          // remaining control chars compare naturally via cpKey)
          return if (j == n - 1) x.length - y.length
          else if (x.length < y.length) 0x20 - cpKey(y.charAt(x.length))
          else cpKey(x.charAt(y.length)) - 0x20
        }
        j += 1
      }
      0
    }

    var n = 2
    while (n <= 10) {
      if (toks.length >= n) {
        java.util.Arrays.fill(cnts, 0)
        val nPos = toks.length - n + 1
        var i = 0
        while (i < nPos) {
          val h = positionHash(i, n)
          val len = positionLen(i, n)
          val idx = slotOf(h)
          if (cnts(idx) == 0) { keys(idx) = h; lens(idx) = len; cnts(idx) = 1 }
          else { cnts(idx) += 1; if (len > lens(idx)) lens(idx) = len }
          i += 1
        }
        if (n <= 4) {
          // max count, then the smallest and largest lengths among the
          // tied-at-max classes: equal -> the tie-break cannot change
          // covered; else re-extract the tied classes' STRINGS and apply
          // the pinned UTF-8-lexicographic tie-break
          var maxCnt = 0
          var minLen = Int.MaxValue
          var maxLen = 0
          var s = 0
          while (s < cap) {
            if (cnts(s) != 0) {
              if (cnts(s) > maxCnt) { maxCnt = cnts(s); minLen = lens(s); maxLen = lens(s) }
              else if (cnts(s) == maxCnt) {
                if (lens(s) < minLen) minLen = lens(s)
                if (lens(s) > maxLen) maxLen = lens(s)
              }
            }
            s += 1
          }
          val winnerLen =
            if (minLen == maxLen) minLen
            else {
              var best = -1
              var i2 = 0
              while (i2 < nPos) {
                if (cnts(slotOf(positionHash(i2, n))) == maxCnt &&
                    (best < 0 || gramCompare(i2, best, n) < 0)) best = i2
                i2 += 1
              }
              positionLen(best, n)
            }
          res(n - 2) = maxCnt.toLong * winnerLen
        } else {
          var dup = 0L
          var s = 0
          while (s < cap) {
            if (cnts(s) >= 2) dup += cnts(s).toLong * lens(s)
            s += 1
          }
          res(n - 2) = dup
        }
      }
      n += 1
    }
    res
  }
}
