package graft

import graft.sources.CorpusGen

/** Corpus generator invariants: purity, determinism under parallelism, and
  * the planted dup structure the pipeline tests rely on.
  */
class CorpusSpec extends SparkSpec {

  test("fileAt is pure: same (i, seed) -> same file") {
    val a = CorpusGen.fileAt(123L, 42L, 1000)
    val b = CorpusGen.fileAt(123L, 42L, 1000)
    assert(a == b)
    val c = CorpusGen.fileAt(123L, 43L, 1000)
    assert(a != c)
  }

  test("planted structure: exact dups clone an earlier unique body; tiny files < 3 tokens") {
    val n = 200L
    val files = (0L until n).map(i => i -> CorpusGen.fileAt(i, 42L, n)).toMap
    val exactDup = files.collect { case (i, f) if f.path.startsWith("vendor/copy_") => i -> f }
    assert(exactDup.nonEmpty)
    exactDup.foreach { case (i, f) =>
      val blockStart = i - (i % 20)
      val base = if (blockStart >= 20) blockStart - 20 + 6 else blockStart + 6
      val baseFile = files(base)
      assert(baseFile.path.startsWith("src/file_"), s"base of $i should be unique kind")
      assert(f.content == baseFile.content, s"copy $i != base $base")
    }
    val tiny = files.values.filter(_.path.contains("empty_"))
    assert(tiny.nonEmpty)
    tiny.foreach(f => assert(f.content.split(" ").length < 3))
    val licenses = files.values.filter(_.path.startsWith("LICENSE"))
    assert(licenses.map(_.content).toSet.size == 1, "license clones must be identical")
  }

  test("withDocIds: identical (natural key -> doc_id) mapping at any parallelism") {
    val src = CorpusGen.sourceFiles(spark, 500)
    def mapping(parts: Int): Map[(String, String, String), Long] =
      CorpusGen.withDocIds(src.repartition(parts))
        .select("repo", "path", "commit", "doc_id")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
        .toMap
    val m2 = mapping(2)
    val m9 = mapping(9)
    assert(m2 == m9)
    // contiguous, zero-based, ordered by natural key
    assert(m2.values.toSeq.sorted == (0L until 500L))
    val byKey = m2.toSeq.sortBy(_._1)
    assert(byKey.map(_._2) == (0L until 500L))
  }

  test("sourceFilesWithIds: doc_id == generator index, content matches fileAt") {
    val df = CorpusGen.sourceFilesWithIds(spark, 100)
      .select("doc_id", "content").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(df.keySet == (0L until 100L).toSet)
    (0L until 100L).foreach { i =>
      assert(df(i) == CorpusGen.fileAt(i, 42L, 100).content)
    }
  }
}
