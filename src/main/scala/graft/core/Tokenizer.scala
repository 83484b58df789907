package graft.core

import scala.collection.mutable.ArrayBuffer

/** Tokenizer with the reference's byte-level semantics (SURVEY.md Q7):
  *
  *   - split on C whitespace (space, \t, \n, \v, \f, \r — what `fscanf("%s")`
  *     skips in the C locale; /root/reference/src/MPI/io_interface.c:119-141)
  *   - ASCII-lowercase A-Z
  *   - keep only [a-z0-9]; every other char (punctuation, chars >= 0x80) is
  *     dropped in place (/root/reference/src/MPI/utils.c:43-63)
  *   - tokens that become empty after stripping are skipped
  *
  * So "Don't Stop-Me now!" -> ["dont", "stopme", "now"]; "C++" -> ["c"].
  * Deliberate divergence from the reference: no 1023-byte token truncation
  * (the reference's fixed `fscanf` buffer is UB on longer tokens and
  * unreachable through our table-based ingest).
  *
  * Non-ASCII note: the reference processes raw bytes; we process UTF-16
  * chars. For ASCII content (our corpora) the two are identical. For
  * non-ASCII, we drop any char > 0x7F, which matches the reference's
  * behavior of dropping all bytes >= 0x80.
  */
object Tokenizer {

  @inline private def isCWhitespace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  @inline private def keep(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Tokenize `content` into normalized tokens. Single pass, no regex. */
  def tokenize(content: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String]()
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    val n = content.length
    while (i < n) {
      val c0 = content.charAt(i)
      if (isCWhitespace(c0)) {
        if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      } else {
        val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        if (keep(c)) sb.append(c)
      }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out
  }

  /** Single-pass fused tokenize+join: the normalized tokens joined by a
    * single 0x20 (the exact byte layout the reference hashes a shingle
    * over, SURVEY.md Q8) plus token start/end offsets — WITHOUT
    * materializing per-token Strings. This is the signature kernel's hot
    * path; the per-token String variant ([[tokenize]]) allocates ~2x more
    * garbage, which measurably throttles 32 concurrent kernel threads.
    *
    * starts(i) = index of token i in the joined string; ends(i) = one past
    * its last char. Shingle i of size k covers [starts(i), ends(i+k-1)).
    */
  def joinedTokens(content: String): (String, Array[Int], Array[Int]) = {
    val sb = new java.lang.StringBuilder(content.length)
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    val n = content.length
    var inTok = false
    var tokStart = 0
    while (i < n) {
      val c0 = content.charAt(i)
      if (isCWhitespace(c0)) {
        if (inTok) {
          if (sb.length > tokStart) { starts += tokStart; ends += sb.length }
          else sb.setLength(tokStart - (if (tokStart > 0) 1 else 0)) // undo separator for empty token
          inTok = false
        }
      } else {
        if (!inTok) {
          tokStart = if (sb.length > 0) { sb.append(' '); sb.length } else 0
          inTok = true
        }
        val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        if (keep(c)) sb.append(c)
      }
      i += 1
    }
    if (inTok) {
      if (sb.length > tokStart) { starts += tokStart; ends += sb.length }
      else sb.setLength(tokStart - (if (tokStart > 0) 1 else 0))
    }
    (sb.toString, starts.toArray, ends.toArray)
  }

  /** Tokens joined by a single 0x20 plus the start offset of each token
    * inside the joined string (array-of-Strings entry point; see
    * [[joinedTokens]] for the fused hot path).
    */
  def joinedWithOffsets(tokens: ArrayBuffer[String]): (String, Array[Int]) = {
    val starts = new Array[Int](tokens.length)
    var total = 0
    var i = 0
    while (i < tokens.length) {
      starts(i) = total + i // i separator spaces precede token i
      total += tokens(i).length
      i += 1
    }
    val sb = new java.lang.StringBuilder(total + math.max(0, tokens.length - 1))
    i = 0
    while (i < tokens.length) {
      if (i > 0) sb.append(' ')
      sb.append(tokens(i))
      i += 1
    }
    (sb.toString, starts)
  }
}
