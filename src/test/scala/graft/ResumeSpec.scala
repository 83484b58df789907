package graft

import graft.core.MinHashConfig
import graft.plans.CheckpointedPipeline
import graft.sources.CorpusGen
import org.apache.spark.sql.functions._

/** Checkpoint/resume contract (north-star): kill-and-rerun resumes from the
  * last committed stage with byte-identical results and no recompute of
  * completed stages (proven via the _metrics lineage table and stage log).
  */
class ResumeSpec extends SparkSpec {

  private val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.5)

  test("rerun skips committed stages; mid-pipeline delete resumes from there") {
    val work = java.nio.file.Files.createTempDirectory("graft_resume").toString
    val docs = CorpusGen.withDocIds(CorpusGen.sourceFiles(spark, 300)).cache()

    val p1 = new CheckpointedPipeline(spark, cfg, work)
    val (c1, log1) = p1.run(docs)
    val clusters1 = c1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(log1.computed.toSeq == Seq("signatures", "candidates", "pairs", "clusters"))

    // full rerun: everything resumed
    val (c2, log2) = new CheckpointedPipeline(spark, cfg, work).run(docs)
    assert(log2.computed.isEmpty && log2.skipped.size == 4)
    assert(c2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == clusters1)

    // the clusters stage table is the durable copy — the per-iteration CC
    // scratch dir must be gone once the stage committed (no stale label
    // tables accumulating across reruns)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$work/_cc_scratch")))

    // simulate failure after 'candidates': later stages gone
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/pairs"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/clusters"), true)
    val (c3, log3) = new CheckpointedPipeline(spark, cfg, work).run(docs)
    assert(log3.skipped.toSeq == Seq("signatures", "candidates"))
    assert(log3.computed.toSeq == Seq("pairs", "clusters"))
    assert(c3.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == clusters1)

    // _metrics has per-partition lineage rows for every stage
    val m = new CheckpointedPipeline(spark, cfg, work).metrics
    assert(m.select("stage").distinct().count() == 4)
    assert(m.columns.toSet == Set("stage", "partition_id", "rows", "input_fingerprint", "config", "ts_ns"))

    // threshold-only change recomputes pairs+clusters but resumes sigs+cands
    val cfg2 = cfg.copy(threshold = 0.9)
    val (_, log4) = new CheckpointedPipeline(spark, cfg2, work).run(docs)
    assert(log4.skipped.toSeq == Seq("signatures", "candidates"))
    assert(log4.computed.toSeq == Seq("pairs", "clusters"))

    // switching BACK to the original threshold must recompute pairs too —
    // the pairs table currently holds threshold-0.9 content (this is the
    // overwritten-stage case the per-table tag exists for)
    val (_, logBack) = new CheckpointedPipeline(spark, cfg, work).run(docs)
    assert(logBack.computed.toSeq == Seq("pairs", "clusters"))

    // enabling the exact-Jaccard verification stage computes ONLY it
    val (_, logJ) = new CheckpointedPipeline(spark, cfg, work, None, verifyExactJaccard = true).run(docs)
    assert(logJ.computed.toSeq == Seq("jaccard"))
    assert(logJ.skipped.toSeq == Seq("signatures", "candidates", "pairs", "clusters"))
    val jac = spark.read.parquet(s"$work/jaccard")
    assert(jac.columns.toSet == Set("doc1", "doc2", "jaccard"))
    assert(jac.count() > 0)

    // input change invalidates everything (fingerprint mismatch)
    val docs2 = CorpusGen.withDocIds(CorpusGen.sourceFiles(spark, 301))
    val (_, log5) = new CheckpointedPipeline(spark, cfg, work).run(docs2)
    assert(log5.computed.toSeq == Seq("signatures", "candidates", "pairs", "clusters"))

    docs.unpersist()
  }

  test("dedup_corpus stage: representatives only, resumable like any stage") {
    val work = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val docs = CorpusGen.withDocIds(CorpusGen.sourceFiles(spark, 200)).cache()
    val p = new CheckpointedPipeline(spark, cfg, work, emitDedupCorpus = true)
    val (clusters, log1) = p.run(docs)
    assert(log1.computed.contains("dedup_corpus"))
    val kept = spark.read.parquet(s"$work/dedup_corpus")
    val nClusters = clusters.select("cluster_id").distinct().count()
    assert(kept.count() == nClusters, s"${kept.count()} vs $nClusters clusters")
    // representatives ARE cluster ids
    val repIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val clusterIds = clusters.select("cluster_id").distinct().collect().map(_.getLong(0)).toSet
    assert(repIds == clusterIds)
    // resumes with everything else
    val (_, log2) = new CheckpointedPipeline(spark, cfg, work, emitDedupCorpus = true).run(docs)
    assert(log2.computed.isEmpty && log2.skipped.contains("dedup_corpus"))
    docs.unpersist()
  }

  test("metadata fingerprint: file-backed input resumes without a data pass; rewrite invalidates") {
    val work = java.nio.file.Files.createTempDirectory("graft_meta_fp").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft_meta_in").toString
    CorpusGen.withDocIds(CorpusGen.sourceFiles(spark, 200))
      .write.mode("overwrite").parquet(inDir)
    def docs = spark.read.parquet(inDir)

    val p = new CheckpointedPipeline(spark, cfg, work)
    // file-backed input -> metadata-level fingerprint (no content scan)
    assert(p.fingerprint(docs).startsWith("files="), p.fingerprint(docs))
    // ...and the content level stays available on demand
    assert(new CheckpointedPipeline(spark, cfg, work, contentFingerprint = true)
      .fingerprint(docs).startsWith("n="))

    val (_, log1) = p.run(docs)
    assert(log1.computed.size == 4)
    val (_, log2) = new CheckpointedPipeline(spark, cfg, work).run(docs)
    assert(log2.computed.isEmpty && log2.skipped.size == 4, log2.toString)

    // rewriting the input (different content => different sizes/files)
    // invalidates every stage through the metadata fingerprint alone
    CorpusGen.withDocIds(CorpusGen.sourceFiles(spark, 201))
      .write.mode("overwrite").parquet(inDir)
    val (_, log3) = new CheckpointedPipeline(spark, cfg, work).run(docs)
    assert(log3.computed.size == 4, log3.toString)
  }

  test("pipeline output invariant under shuffle-partition count (reference report-check)") {
    val docs = CorpusGen.goldenCorpus(spark)
    val cfgA = MinHashConfig(3, 64, 4, 13, 0.0)
    def runAt(parts: Int): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try graft.operators.MinHashPipeline.goldenLines(
        graft.operators.MinHashPipeline.run(docs.repartition(parts), cfgA), cfgA)
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(runAt(2) == runAt(7))
  }

  test("ingest sha256 invariant: parquet rows match .txt corpus (input_hint)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_txt")
    CorpusGen.goldenDocs.foreach { case (id, content) =>
      java.nio.file.Files.write(dir.resolve(s"$id.txt"), content.getBytes("UTF-8"))
    }
    val table = CorpusGen.goldenCorpus(spark).withColumnRenamed("content", "content")
    assert(CorpusGen.ingestShaMismatches(table, dir.toString) == 0)
    // and that a corrupted row IS detected
    val bad = CorpusGen.goldenCorpus(spark)
      .withColumn("content", when(col("doc_id") === 3, lit("tampered")).otherwise(col("content")))
    assert(CorpusGen.ingestShaMismatches(bad, dir.toString) == 1)
  }
}
