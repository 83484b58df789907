package graft.core

/** Streaming intra-bucket pair emitter: the scale-critical core of LSH
  * candidate generation.
  *
  * Input: rows (band_idx, band_hash, doc_id) sorted by exactly that order
  * within a partition, where each (band_idx, band_hash) group is entirely
  * inside one partition (guaranteed by repartition on those keys).
  *
  * Output, per group of size B:
  *   - B <= cap:  the full clique, (doc_i, doc_j) for all i < j — the
  *     reference's candidate semantics (/root/reference/src/MPI/utils.c:89-96)
  *   - B > cap:   hub-star pairs (hub = min doc_id, which is first in sort
  *     order): (hub, member) for every other member — cluster-preserving
  *     skew armor: output linear in B instead of B², and NOTHING is
  *     buffered (the tail of the group streams through)
  *
  * Memory bound: at most cap+1 doc ids are ever held (parity mode
  * cap=Int.MaxValue buffers whole groups — small-scale/golden-test use
  * only). This replaces a 4-shuffle join tree (bucket stats + join-back +
  * self-join) with a single repartition+sort — at 10^12 files the candidate
  * stage is one shuffle of the exploded band rows and nothing else.
  */
object BucketPairs {

  /** rows: (band_idx, band_hash, doc_id) sorted ascending. */
  def emit(rows: Iterator[(Int, Int, Long)], cap: Int): Iterator[(Long, Long)] = {
    val it = rows.buffered
    new Iterator[Iterator[(Long, Long)]] {
      override def hasNext: Boolean = it.hasNext
      override def next(): Iterator[(Long, Long)] = {
        val (bIdx, bHash, first) = it.next()
        // buffer up to cap+1 members of this group
        val buf = new scala.collection.mutable.ArrayBuffer[Long](16)
        buf += first
        var overflow = false
        while (!overflow && it.hasNext && it.head._1 == bIdx && it.head._2 == bHash) {
          if (buf.length < cap) buf += it.next()._3
          else overflow = true
        }
        if (!overflow) cliquePairs(buf)
        else {
          val hub = buf(0) // min doc_id: rows sorted by doc_id within group
          val buffered = buf.iterator.drop(1).map(m => (hub, m))
          val streamed = new Iterator[(Long, Long)] {
            override def hasNext: Boolean =
              it.hasNext && it.head._1 == bIdx && it.head._2 == bHash
            override def next(): (Long, Long) = (hub, it.next()._3)
          }
          buffered ++ streamed
        }
      }
    }.flatten
  }

  /** Second-pass emitter for salted full-clique generation. Input rows
    * (band_idx, band_hash, ci, cj, doc_id, chunk) sorted by the first five
    * fields, each (band_idx, band_hash, ci, cj) group fully inside one
    * partition. A group with ci == cj holds one chunk -> emit its clique;
    * ci != cj holds two chunks -> emit only cross-chunk pairs (normalized
    * doc1 < doc2). Memory: at most 2 chunks of ids.
    */
  def emitChunkPairs(rows: Iterator[(Int, Int, Int, Int, Long, Int)]): Iterator[(Long, Long)] = {
    val it = rows.buffered
    new Iterator[Iterator[(Long, Long)]] {
      override def hasNext: Boolean = it.hasNext
      override def next(): Iterator[(Long, Long)] = {
        val (bi, bh, ci, cj, d0, c0) = it.next()
        val left = new scala.collection.mutable.ArrayBuffer[Long](16)
        val right = new scala.collection.mutable.ArrayBuffer[Long](16)
        @inline def add(doc: Long, chunk: Int): Unit =
          if (chunk == ci) left += doc else right += doc
        add(d0, c0)
        while (it.hasNext && {
            val h = it.head; h._1 == bi && h._2 == bh && h._3 == ci && h._4 == cj
          }) {
          val (_, _, _, _, d, c) = it.next()
          add(d, c)
        }
        if (ci == cj) cliquePairs(left)
        else
          for (a <- left.iterator; b <- right.iterator)
            yield if (a < b) (a, b) else (b, a)
      }
    }.flatten
  }

  private def cliquePairs(members: scala.collection.mutable.ArrayBuffer[Long]): Iterator[(Long, Long)] =
    new Iterator[(Long, Long)] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = j < members.length
      override def next(): (Long, Long) = {
        val p = (members(i), members(j))
        j += 1
        if (j >= members.length) { i += 1; j = i + 1 }
        p
      }
    }
}
