package graft.core

/** MurmurHash2 (32-bit), bit-compatible with the reference engine's hash
  * (see /root/reference/src/MPI/utils.c:5-41 — constants m=0x5bd1e995, r=24;
  * the doc comment there claims MurmurHash3 but the body is MurmurHash2).
  *
  * Implemented from the public-domain MurmurHash2 algorithm (Austin Appleby):
  * little-endian 4-byte words, 1..3-byte tail mixed per byte, final avalanche.
  * All arithmetic is wrapping 32-bit; Scala `Int` multiplication and XOR wrap
  * identically to C `uint32_t`, and `>>>` gives the logical (unsigned) shift.
  *
  * Golden vectors (FIXTURES.md §2) pin this implementation, e.g.
  * murmur2("the quick brown", seed=13) == 3138408474 (as unsigned).
  *
  * The string variants read `char & 0xFF` per position — for the ASCII-only
  * strings produced by [[Tokenizer]] this equals the C byte stream and avoids
  * allocating a byte array per (shingle × hash-seed) evaluation in the hot
  * signature loop.
  */
object Murmur2 {
  private final val M = 0x5bd1e995
  private final val R = 24

  /** Hash `len` bytes of `data` with `seed`. Result is the u32 bit pattern
    * in an Int (compare with java.lang.Integer.compareUnsigned).
    */
  def hashBytes(data: Array[Byte], len: Int, seed: Int): Int = {
    var h = seed ^ len
    var i = 0
    val n4 = len - (len & 3)
    while (i < n4) {
      var k = (data(i) & 0xff) |
        ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) |
        ((data(i + 3) & 0xff) << 24)
      k *= M
      k ^= k >>> R
      k *= M
      h *= M
      h ^= k
      i += 4
    }
    val rem = len & 3
    if (rem >= 3) h ^= (data(n4 + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(n4 + 1) & 0xff) << 8
    if (rem >= 1) { h ^= (data(n4) & 0xff); h *= M }
    h ^= h >>> 13
    h *= M
    h ^= h >>> 15
    h
  }

  def hashBytes(data: Array[Byte], seed: Int): Int =
    hashBytes(data, data.length, seed)

  /** Hash the char range [from, until) of `s`, treating each char as one
    * byte (`& 0xFF`). Exact for ASCII content (the tokenizer guarantees
    * [a-z0-9 ] only). Zero-allocation: used per (shingle, seed) in the
    * signature kernel where the shingle is a substring view of the joined
    * token string.
    */
  def hashRange(s: String, from: Int, until: Int, seed: Int): Int = {
    val len = until - from
    var h = seed ^ len
    var i = from
    val n4 = from + (len - (len & 3))
    while (i < n4) {
      var k = (s.charAt(i) & 0xff) |
        ((s.charAt(i + 1) & 0xff) << 8) |
        ((s.charAt(i + 2) & 0xff) << 16) |
        ((s.charAt(i + 3) & 0xff) << 24)
      k *= M
      k ^= k >>> R
      k *= M
      h *= M
      h ^= k
      i += 4
    }
    val rem = len & 3
    if (rem >= 3) h ^= (s.charAt(n4 + 2) & 0xff) << 16
    if (rem >= 2) h ^= (s.charAt(n4 + 1) & 0xff) << 8
    if (rem >= 1) { h ^= (s.charAt(n4) & 0xff); h *= M }
    h ^= h >>> 13
    h *= M
    h ^= h >>> 15
    h
  }

  def hashString(s: String, seed: Int): Int = hashRange(s, 0, s.length, seed)

  /** Unsigned value as Long, for tests/debug printing. */
  def asUnsigned(h: Int): Long = h & 0xffffffffL
}
