package graft

import graft.core.MinHashConfig
import graft.operators.{ConnectedComponents, MinHashPipeline}
import graft.sources.CorpusGen

/** End-to-end golden tests against the reference binary's committed output
  * (FIXTURES.md §4): the Spark pipeline must reproduce the reference's
  * results.csv rows exactly (after canonical (doc1,doc2) sort and 4-dp
  * rounding) at two configs, including the Q3 all-MAX quirk row 6,7 and the
  * *absence* of non-candidate rows at threshold 0.0.
  */
class GoldenPipelineSpec extends SparkSpec {

  private lazy val docs = CorpusGen.goldenCorpus(spark)

  private def lines(cfg: MinHashConfig): Seq[String] =
    MinHashPipeline.goldenLines(MinHashPipeline.run(docs, cfg), cfg)

  test("config A, threshold 0.0 — matches reference results.csv (FIXTURES §4.1)") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.0)
    assert(
      lines(cfg) == Seq(
        "0,1,1.0000",
        "0,2,0.7500",
        "1,2,0.7500",
        "3,4,0.9062",
        "6,7,1.0000"
      )
    )
  }

  test("config A, threshold 0.8 — threshold is >= on the estimate (FIXTURES §4.2)") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    assert(lines(cfg) == Seq("0,1,1.0000", "3,4,0.9062", "6,7,1.0000"))
  }

  test("config B — shingle 2 / sig 32 / rows 2 / seed 7 (FIXTURES §4.3)") {
    val cfg = MinHashConfig(shingleSize = 2, signatureSize = 32, nBandRows = 2, seed = 7, threshold = 0.0)
    assert(
      lines(cfg) == Seq(
        "0,1,1.0000",
        "0,2,0.6875",
        "1,2,0.6875",
        "3,4,0.9375"
      )
    )
  }

  test("clusters at threshold 0.8 match FIXTURES §4.4 union-find oracle") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val pairs = MinHashPipeline.run(docs, cfg)
    val clusters = ConnectedComponents
      .cluster(pairs, docs.selectExpr("doc_id"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(clusters == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  test("clusters at threshold 0.0: {0,1,2},{3,4},{6,7},{5} (FIXTURES §4.4)") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.0)
    val pairs = MinHashPipeline.run(docs, cfg)
    val clusters = ConnectedComponents
      .cluster(pairs, docs.selectExpr("doc_id"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(clusters == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  test("star-capped skew mode preserves clusters (hub-star vs full clique)") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.0)
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF().cache()
    val full = MinHashPipeline.pairs(MinHashPipeline.candidates(sigs, None), sigs, cfg)
    val star = MinHashPipeline.pairs(MinHashPipeline.candidates(sigs, Some(1)), sigs, cfg)
    val cFull = ConnectedComponents.cluster(full, docs.selectExpr("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cStar = ConnectedComponents.cluster(star, docs.selectExpr("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cFull == cStar)
    sigs.unpersist()
  }

  test("salted full-clique path == streaming path (saltChunkSize forcing splits)") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.0)
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF().cache()
    val plain = MinHashPipeline.candidates(sigs, None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = MinHashPipeline.candidates(sigs, None, saltChunkSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain == salted)
    sigs.unpersist()
  }

  test("textdir source (reference-native <id>.txt layout) == in-memory corpus") {
    val dir = java.nio.file.Files.createTempDirectory("golden_txt")
    CorpusGen.goldenDocs.foreach { case (id, content) =>
      java.nio.file.Files.write(dir.resolve(s"$id.txt"), content.getBytes("UTF-8"))
    }
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.0)
    val fromTxt = Main.readDocs(spark, s"textdir:$dir", "doc_id", "content")
    val a = MinHashPipeline.goldenLines(MinHashPipeline.run(fromTxt, cfg), cfg)
    val b = MinHashPipeline.goldenLines(MinHashPipeline.run(docs, cfg), cfg)
    assert(a == b)

    // offset replay: files named <id+1>.txt (the reference's --offset 1
    // layout) ingested with idOffset=1 give 0-BASED internal ids, and the
    // CSV/golden boundary re-adds the offset EXACTLY ONCE — the golden
    // lines must match the reference's offset ids, not double-apply
    val dirOff = java.nio.file.Files.createTempDirectory("golden_txt_off")
    CorpusGen.goldenDocs.foreach { case (id, content) =>
      java.nio.file.Files.write(dirOff.resolve(s"${id + 1}.txt"), content.getBytes("UTF-8"))
    }
    val cfgOff = cfg.copy(docOffset = 1L)
    val fromOff = Main.readDocs(spark, s"textdir:$dirOff", "doc_id", "content", idOffset = 1L)
    assert(fromOff.orderBy("doc_id").select("doc_id").collect().map(_.getLong(0)).toSeq
      == CorpusGen.goldenDocs.map(_._1).sorted.toSeq) // 0-based internally
    val aOff = MinHashPipeline.goldenLines(MinHashPipeline.run(fromOff, cfgOff), cfgOff)
    // same pairs as the 0-offset run, every id shifted by exactly +1
    val shifted = b.map { line =>
      val p = line.split(",")
      s"${p(0).toLong + 1},${p(1).toLong + 1},${p(2)}"
    }
    assert(aOff.sorted == shifted.sorted)
  }

  test("derive-ids ingest: id-less input_hint table gets stable natural-key doc_ids") {
    // the BASELINE input_hint shape has NO id column
    val dir = java.nio.file.Files.createTempDirectory("idless").toString
    CorpusGen.sourceFiles(spark, 100).write.mode("overwrite").parquet(dir)
    val a = Main.readDocs(spark, dir, "doc_id", "content", deriveIds = true)
    val b = Main.readDocs(spark, dir, "doc_id", "content", deriveIds = true)
    val rowsA = a.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val rowsB = b.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rowsA.length == 100)
    assert(rowsA.map(_._1).toSeq == (0L until 100L)) // dense, zero-based
    assert(rowsA.toSeq == rowsB.toSeq) // stable across reads
  }

  test("writeReferenceCsv: header + %.4f HALF_EVEN rows, sorted, one file") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.0)
    val out = java.nio.file.Files.createTempDirectory("pairs_csv").toString + "/csv"
    val pairs = MinHashPipeline.run(docs, cfg)
    MinHashPipeline.writeReferenceCsv(pairs, out, cfg)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1, files.mkString(","))
    val lines = scala.io.Source.fromFile(files.head).getLines().toVector
    assert(lines.head == "doc1,doc2,similarity")
    assert(lines.drop(1) == MinHashPipeline.goldenLines(pairs, cfg).toVector)
  }

  test("exact-Jaccard verification stage: dups 1.0, disjoint docs ~0, Q3 pair 1.0") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.0)
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF()
    val cands = MinHashPipeline.candidates(sigs)
    val j = MinHashPipeline
      .exactJaccardPairs(cands, docs, cfg)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(j((0L, 1L)) == 1.0)
    assert(j((6L, 7L)) == 1.0) // both empty shingle sets (Q3 semantics)
    assert(j((0L, 2L)) > 0.5 && j((0L, 2L)) < 1.0)
  }

  test("jsonl source: plain + gzip + derive-ids all yield the same corpus") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_src")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    val plain = CorpusGen.goldenDocs.map { case (id, text) =>
      s"""{"doc_id": $id, "content": "${esc(text)}"}"""
    }.mkString("\n")
    java.nio.file.Files.write(dir.resolve("part0.jsonl"), plain.getBytes("UTF-8"))
    val a = Main.readDocs(spark, s"jsonl:$dir", "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == CorpusGen.goldenDocs.toMap)

    // gzip decompresses by extension through the same source
    val gzDir = java.nio.file.Files.createTempDirectory("jsonl_gz")
    val gzOut = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gzDir.resolve("part0.jsonl.gz")))
    gzOut.write(plain.getBytes("UTF-8")); gzOut.close()
    val b = Main.readDocs(spark, s"jsonl:$gzDir", "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b == a)

    // id-less input_hint shape via --derive-ids: stable natural-key ids
    val hintDir = java.nio.file.Files.createTempDirectory("jsonl_hint")
    val hint = CorpusGen.goldenDocs.map { case (id, text) =>
      s"""{"repo": "r${id % 2}", "path": "p$id", "commit": "c", "lang": "x", "content": "${esc(text)}"}"""
    }.mkString("\n")
    java.nio.file.Files.write(hintDir.resolve("part0.jsonl"), hint.getBytes("UTF-8"))
    val c = Main.readDocs(spark, s"jsonl:$hintDir", "doc_id", "content", deriveIds = true)
    assert(c.count() == CorpusGen.goldenDocs.length)
    assert(c.select("doc_id").distinct().count() == CorpusGen.goldenDocs.length)
    // deterministic: same ids on a re-read
    val c2 = Main.readDocs(spark, s"jsonl:$hintDir", "doc_id", "content", deriveIds = true)
    assert(c.orderBy("doc_id").collect().toSeq == c2.orderBy("doc_id").collect().toSeq)

    // fail-fast: a well-formed row MISSING the id field must raise, not
    // become a silently colliding null id
    val badDir = java.nio.file.Files.createTempDirectory("jsonl_bad")
    java.nio.file.Files.write(badDir.resolve("part0.jsonl"),
      "{\"doc_id\": 1, \"content\": \"ok\"}\n{\"content\": \"no id here\"}".getBytes("UTF-8"))
    val e = intercept[Exception] {
      Main.readDocs(spark, s"jsonl:$badDir", "doc_id", "content").collect()
    }
    assert(e.getMessage.contains("jsonl ingest") ||
      Option(e.getCause).exists(_.getMessage.contains("jsonl ingest")), e.toString)
    // ...and a derive-ids corpus with no natural keys (wrong column names)
    val badHint = java.nio.file.Files.createTempDirectory("jsonl_badhint")
    java.nio.file.Files.write(badHint.resolve("part0.jsonl"),
      "{\"repository\": \"r\", \"content\": \"misnamed key columns\"}".getBytes("UTF-8"))
    val e2 = intercept[Exception] {
      Main.readDocs(spark, s"jsonl:$badHint", "doc_id", "content", deriveIds = true).collect()
    }
    assert(e2.getMessage.contains("natural key") ||
      Option(e2.getCause).exists(_.getMessage.contains("natural key")), e2.toString)
  }

  test("textdir ingest fails fast on non-canonical file names") {
    // "007.txt" would silently collide with "7.txt" (both cast to id 7) and
    // a >18-digit name would cast to a null id — both must be rejected, not
    // ingested
    for (bad <- Seq("007.txt", "9999999999999999999999.txt", "v2_123.txt")) {
      val dir = java.nio.file.Files.createTempDirectory("bad_txt")
      java.nio.file.Files.write(dir.resolve("3.txt"), "fine".getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve(bad), "bad".getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException] {
        Main.readDocs(spark, s"textdir:$dir", "doc_id", "content")
      }
      assert(e.getMessage.contains(bad), e.getMessage)
    }
  }
}
