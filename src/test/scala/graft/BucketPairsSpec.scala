package graft

import graft.core.BucketPairs
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

/** Property tests for the streaming bucket pair emitter. */
class BucketPairsSpec extends AnyFunSuite {

  private def brute(groups: Seq[(Int, Int, Seq[Long])], cap: Int): Set[(Long, Long)] =
    groups.flatMap { case (_, _, members) =>
      val m = members.sorted
      if (m.length <= cap) for (i <- m.indices; j <- (i + 1) until m.length) yield (m(i), m(j))
      else m.tail.map(x => (m.head, x))
    }.toSet

  private def rows(groups: Seq[(Int, Int, Seq[Long])]): Iterator[(Int, Int, Long)] =
    groups
      .sortBy(g => (g._1, g._2))
      .iterator
      .flatMap { case (bi, bh, ms) => ms.sorted.map(m => (bi, bh, m)) }

  test("clique mode matches brute force triangular enumeration") {
    val gs = Seq((0, 5, Seq(3L, 1L, 7L)), (0, 9, Seq(2L)), (1, 5, Seq(10L, 11L, 12L, 13L)))
    assert(BucketPairs.emit(rows(gs), Int.MaxValue).toSet == brute(gs, Int.MaxValue))
    assert(BucketPairs.emit(rows(gs), Int.MaxValue).size == 3 + 0 + 6)
  }

  test("star mode: oversized group emits hub-star only, hub = min doc") {
    val gs = Seq((0, 1, Seq(5L, 2L, 9L, 7L, 4L)))
    val got = BucketPairs.emit(rows(gs), 3).toSet
    assert(got == Set((2L, 4L), (2L, 5L), (2L, 7L), (2L, 9L)))
  }

  test("boundary: group size exactly cap stays clique; cap+1 goes star") {
    val g3 = Seq((0, 1, Seq(1L, 2L, 3L)))
    assert(BucketPairs.emit(rows(g3), 3).size == 3) // clique of 3
    val g4 = Seq((0, 1, Seq(1L, 2L, 3L, 4L)))
    assert(BucketPairs.emit(rows(g4), 3).toSet == Set((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("property: emitted set == brute force for random group layouts") {
    val genGroups: Gen[List[(Int, Int, Seq[Long])]] = Gen
      .listOfN(8, for {
        bi <- Gen.choose(0, 3)
        bh <- Gen.choose(0, 3)
        n <- Gen.choose(0, 12)
        ms <- Gen.listOfN(n, Gen.choose(0L, 1000L))
      } yield (bi, bh, ms.distinct))
      .map(_.groupBy(g => (g._1, g._2)).map { case ((bi, bh), gs) =>
        (bi, bh, gs.flatMap(_._3).distinct.toSeq)
      }.toList)
    val prop = forAll(genGroups, Gen.choose(1, 6)) { (gs, cap) =>
      val nonEmpty = gs.filter(_._3.nonEmpty)
      BucketPairs.emit(rows(nonEmpty), cap).toSet == brute(nonEmpty, cap)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(200))
    assert(res.passed, res.status.toString)
  }

  test("emitChunkPairs: salted chunk-pair groups reproduce the exact clique") {
    val prop = forAll(Gen.choose(1, 40), Gen.choose(1, 5)) { (nMembers, s) =>
      val members = (0L until nMembers.toLong).map(d => d * 7 + 1)
      val chunkOf = members.map(d => d -> (d % s).toInt).toMap
      // replicate each member to every chunk-pair group containing it
      val rows = (for {
        d <- members
        other <- 0 until s
      } yield {
        val ci = math.min(chunkOf(d), other)
        val cj = math.max(chunkOf(d), other)
        (0, 99, ci, cj, d, chunkOf(d))
      }).sortBy(r => (r._3, r._4, r._5))
      val got = BucketPairs.emitChunkPairs(rows.iterator).toSet
      val want = (for {
        i <- members.indices; j <- (i + 1) until members.length
      } yield {
        val a = members(i); val b = members(j)
        (math.min(a, b), math.max(a, b))
      }).toSet
      got == want
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(200))
    assert(res.passed, res.status.toString)
  }

  test("streaming: oversized group does not buffer beyond cap") {
    // 1M-member group through a cap of 4 — must not OOM or materialize
    val n = 1000000
    val it = Iterator.range(0, n).map(i => (0, 1, i.toLong))
    var count = 0L
    var first = -1L
    BucketPairs.emit(it, 4).foreach { case (h, _) => if (first < 0) first = h; count += 1 }
    assert(first == 0L && count == n - 1)
  }
}
