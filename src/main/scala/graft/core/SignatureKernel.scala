package graft.core

/** The fused per-document compute kernel: tokenize -> shingle -> MinHash
  * signature -> XOR band fold, one pass, preallocated arrays. This is the
  * hard-correctness core; every semantic quirk is pinned by SURVEY.md §2.3
  * and FIXTURES.md golden data:
  *
  *   - hash family: hash k of a shingle uses seed `seed * k` as a WRAPPING
  *     Int multiply (/root/reference/src/MPI/minhash.c:182) — k=0 always
  *     uses seed 0 regardless of the configured seed (Q2)
  *   - min-update is UNSIGNED 32-bit comparison
  *     (/root/reference/src/MPI/minhash.c:183-184) (Q1/§1.2)
  *   - a document with fewer than shingleSize tokens yields zero shingles;
  *     its signature stays all-0xFFFFFFFF, so all such docs are mutual
  *     perfect duplicates (Q3) — preserved, not "fixed"
  *   - band j is the positional XOR of signature rows [j*r, (j+1)*r)
  *     (/root/reference/src/MPI/minhash.c:205-215) (Q4)
  *   - duplicate shingles collapse implicitly (min is idempotent), so the
  *     signature is a function of the shingle *set* (Q12)
  *
  * Pure Scala, no Spark imports: callable from `mapPartitions`, unit tests,
  * and property tests alike.
  */
object SignatureKernel {

  /** Signature + bands for one document. Arrays are freshly allocated per
    * call (they become the row values); all scratch state is local.
    */
  def compute(content: String, cfg: MinHashConfig): (Array[Int], Array[Int]) = {
    val sig = new Array[Int](cfg.signatureSize)
    java.util.Arrays.fill(sig, 0xffffffff) // UINT32_MAX init
    val (joined, starts, ends) = Tokenizer.joinedTokens(content)
    val k = cfg.shingleSize
    val nShingles = starts.length - k + 1
    if (nShingles > 0) {
      var s = 0
      while (s < nShingles) {
        val from = starts(s)
        val until = ends(s + k - 1)
        var j = 0
        while (j < cfg.signatureSize) {
          val h = Murmur2.hashRange(joined, from, until, cfg.seed * j)
          if (java.lang.Integer.compareUnsigned(h, sig(j)) < 0) sig(j) = h
          j += 1
        }
        s += 1
      }
    }
    (sig, bandsOf(sig, cfg))
  }

  /** XOR band fold of an existing signature (Q4). */
  def bandsOf(sig: Array[Int], cfg: MinHashConfig): Array[Int] = {
    val bands = new Array[Int](cfg.nBands)
    var b = 0
    while (b < cfg.nBands) {
      var acc = 0
      var r = b * cfg.nBandRows
      val end = r + cfg.nBandRows
      while (r < end) { acc ^= sig(r); r += 1 }
      bands(b) = acc
      b += 1
    }
    bands
  }

  /** Positional signature agreement — the reference's similarity estimate
    * (/root/reference/src/MPI/utils.c:79-87, Q6). Computed in double;
    * golden comparison rounds to 4 decimals at the output boundary only.
    */
  def signatureSimilarity(s1: Array[Int], s2: Array[Int]): Double = {
    var eq = 0
    var i = 0
    while (i < s1.length) {
      if (s1(i) == s2(i)) eq += 1
      i += 1
    }
    eq.toDouble / s1.length
  }

  /** Distinct shingle hashes of a document (single fixed seed = cfg.seed),
    * sorted by UNSIGNED value. This is the input to the exact-Jaccard
    * verification stage (the hook the reference ships but never calls:
    * /root/reference/src/MPI/utils.c:65-77, O15b). Deduplicated per Q12.
    */
  def shingleHashSet(content: String, cfg: MinHashConfig): Array[Int] = {
    val (joined, starts, ends) = Tokenizer.joinedTokens(content)
    val k = cfg.shingleSize
    val nShingles = starts.length - k + 1
    if (nShingles <= 0) return Array.emptyIntArray
    val set = new java.util.TreeSet[Integer](new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int =
        java.lang.Integer.compareUnsigned(a, b)
    })
    var s = 0
    while (s < nShingles) {
      set.add(Murmur2.hashRange(joined, starts(s), ends(s + k - 1), cfg.seed))
      s += 1
    }
    val out = new Array[Int](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Exact Jaccard of two unsigned-sorted distinct hash arrays:
    * |A ∩ B| / |A ∪ B|, linear merge scan. Both-empty => 1.0 (two docs with
    * zero shingles are identical under the reference's Q3 semantics).
    */
  def exactJaccard(a: Array[Int], b: Array[Int]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Integer.compareUnsigned(a(i), b(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }
}
