package graft

import graft.core.MinHashConfig
import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._

/** Streaming ingest + incremental dedup: new micro-batches are signed once
  * (exactly-once via the stream checkpoint), deduped within the batch AND
  * against the accumulated history table.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("two-batch ingest: intra-batch pair, cross-batch pair, no re-signing") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val input = java.nio.file.Files.createTempDirectory("stream_in").toString
    val work = java.nio.file.Files.createTempDirectory("stream_work").toString

    val textA = "the quick brown fox jumps over the lazy dog while rain falls on the hills"
    val textB = "completely different content about spark structured streaming micro batches and state"

    // batch 1: docs 0,1 duplicates; doc 2 unique
    Seq((0L, textA), (1L, textA), (2L, textB))
      .toDF("doc_id", "content").coalesce(1)
      .write.mode("append").parquet(input)
    val q1 = StreamingDedup.start(spark, input, work, cfg)
    q1.awaitTermination()

    val pairs1 = spark.read.parquet(s"$work/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs1 == Set((0L, 1L)))
    assert(spark.read.parquet(s"$work/signatures").count() == 3)

    // batch 2: doc 10 duplicates doc 0 (history), doc 11 unique
    Seq((10L, textA), (11L, "some very unique text about nothing else in particular today"))
      .toDF("doc_id", "content").coalesce(1)
      .write.mode("append").parquet(input)
    val q2 = StreamingDedup.start(spark, input, work, cfg)
    q2.awaitTermination()

    val pairs2 = spark.read.parquet(s"$work/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2.contains((0L, 10L)), pairs2.toString)
    assert(pairs2.contains((1L, 10L)), pairs2.toString)
    // exactly-once: 5 docs signed once each
    val sigCount = spark.read.parquet(s"$work/signatures").groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    assert(sigCount == 0)
    assert(spark.read.parquet(s"$work/signatures").count() == 5)

    // restart with no new data: nothing recomputed, nothing duplicated
    val q3 = StreamingDedup.start(spark, input, work, cfg)
    q3.awaitTermination()
    assert(spark.read.parquet(s"$work/signatures").count() == 5)
    assert(spark.read.parquet(s"$work/pairs").collect().length == pairs2.size)

    // bands table: computed once per doc, never re-kerneled — 5 docs x
    // (64/4 = 16) bands, partitioned by bh_prefix for pruned history scans
    val bands = spark.read.parquet(s"$work/bands")
    assert(bands.count() == 5 * 16, bands.count())
    assert(bands.columns.contains("bh_prefix") && bands.columns.contains("batch_id"))

    // foreachBatch is at-least-once: a REPLAY of an already-committed batch
    // must be a no-op (idempotent per-batchId overwrite, not append)
    val lastBatch = spark.read.parquet(s"$work/signatures")
      .agg(max("batch_id")).head().getInt(0).toLong
    val replay = Seq((10L, textA), (11L, "some very unique text about nothing else in particular today"))
      .toDF("doc_id", "content")
    val before = (
      spark.read.parquet(s"$work/pairs").count(),
      spark.read.parquet(s"$work/signatures").count(),
      spark.read.parquet(s"$work/bands").count())
    StreamingDedup.processBatch(spark, replay, lastBatch, work, cfg)
    val after = (
      spark.read.parquet(s"$work/pairs").count(),
      spark.read.parquet(s"$work/signatures").count(),
      spark.read.parquet(s"$work/bands").count())
    assert(before == after, s"replay changed tables: $before -> $after")
    val dupSigs = spark.read.parquet(s"$work/signatures").groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    assert(dupSigs == 0)
  }

  test("history scan is pruned to the batch's band-hash prefixes") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_prune").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"document number $salt with plenty of words to shingle over and over " * 3)
    // batch 0: 40 history docs
    StreamingDedup.processBatch(spark, (0L until 40L).map(i => mk(i, i.toInt)).toDF("doc_id", "content"), 0L, work, cfg)
    // batch 1: ONE doc -> its bands touch at most 16 of the 64 prefixes;
    // the pruned history read must skip the rest (partition pruning)
    val one = Seq(mk(1000L, 7)).toDF("doc_id", "content")
    StreamingDedup.processBatch(spark, one, 1L, work, cfg)
    // correctness: the near-dup of history doc 7 was found cross-history
    val pairs = spark.read.parquet(s"$work/pairs")
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 1000L)), pairs.toString)
    // file hygiene: a batch writes a FEW range-sorted files, not one dir
    // per prefix (64 dirs/batch was a measured small-file explosion)
    val files = new java.io.File(s"$work/bands/batch_id=0").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.length <= 4, s"expected <= 4 band files per batch, got ${files.length}")
    // prune-ability: a REALISTIC prefix set (a batch touches 20-30 of 64)
    // must still reach the scan as an In filter — Spark's default
    // inFilterThreshold (10) would demote it to a useless 0..63 range;
    // processBatch raises the threshold for exactly this reason
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
      StreamingDedup.NumBandPrefixes.toString)
    val manyPrefixes = (0 until 25).map(i => (i * 7) % 64) // scattered, > 10 values
    val pruned = spark.read.parquet(s"$work/bands")
      .filter(col("bh_prefix").isin(manyPrefixes: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(bh_prefix"), plan)

    // signatures side: the similarity join-back must NOT scan+shuffle the
    // whole history signature table. Drive the exact production read
    // (prunedHistorySignatures) with batch 1's real candidate set {7, 1000}:
    //   - scanned-to-joined rows << history rows (1 of 40 here)
    //   - the prefix In filter reaches the parquet scan
    import spark.implicits._
    val candIds = Seq(7L, 1000L).toDF("doc_id")
    val docPrefixes = Seq((7L % 64).toInt, (1000L % 64).toInt).distinct
    val histSigs = StreamingDedup.prunedHistorySignatures(
      spark, s"$work/signatures", 1L, candIds, docPrefixes)
    val histTotal = spark.read.parquet(s"$work/signatures")
      .filter(col("batch_id") =!= 1L).count()
    assert(histTotal == 40L, histTotal)
    assert(histSigs.count() == 1L, "prune must reduce the join-back to candidates only")
    val sigPlan = histSigs.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*did_prefix".r.findFirstIn(sigPlan).isDefined, sigPlan)
  }

  test("compact and processBatch fence each other out (no mid-scan FileNotFound)") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_lock").toString
    val one = Seq((1L, "locking fence probe text with enough words to shingle " * 3))
      .toDF("doc_id", "content")
    StreamingDedup.processBatch(spark, one, 0L, work, cfg)

    // a (stale or live) compact lock blocks ingest fast
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    val compactLock = new org.apache.hadoop.fs.Path(s"$work/bands/_compact_lock")
    fs.create(compactLock, false).close()
    val e1 = intercept[IllegalStateException] {
      StreamingDedup.processBatch(spark, one, 1L, work, cfg)
    }
    assert(e1.getMessage.contains("compaction in progress"), e1.getMessage)
    fs.delete(compactLock, false)

    // an ingest lock blocks compact fast
    val ingestLock = new org.apache.hadoop.fs.Path(s"$work/bands/_ingest_lock")
    fs.create(ingestLock, false).close()
    val e2 = intercept[IllegalStateException] {
      StreamingDedup.compact(spark, work)
    }
    assert(e2.getMessage.contains("ingest in progress"), e2.getMessage)
    fs.delete(ingestLock, false)

    // a DIFFERENT batch's leftover ingest lock blocks a new batch...
    val o1 = fs.create(ingestLock, false)
    o1.write("processBatch(99)".getBytes("UTF-8")); o1.close()
    val e2b = intercept[IllegalStateException] {
      StreamingDedup.processBatch(spark, one, 1L, work, cfg)
    }
    assert(e2b.getMessage.contains("processBatch(99)"), e2b.getMessage)
    // ...a FRESH same-batch lock is also fenced (the holder could be a
    // live-but-stalled zombie — the lease hasn't expired)...
    fs.delete(ingestLock, false)
    val o2 = fs.create(ingestLock, false)
    o2.write("processBatch(1)".getBytes("UTF-8")); o2.close()
    val e2c = intercept[IllegalStateException] {
      StreamingDedup.processBatch(spark, one, 1L, work, cfg)
    }
    assert(e2c.getMessage.contains("self-heal"), e2c.getMessage)
    // ...but once older than the takeover lease (crash + stream replay of
    // that batchId), it is taken over — the restart self-heals
    val stale = System.currentTimeMillis() - StreamingDedup.LockTakeoverLeaseMs - 60000L
    fs.setTimes(ingestLock, stale, stale)
    StreamingDedup.processBatch(spark, one, 1L, work, cfg) // must not throw
    assert(!fs.exists(ingestLock))

    // normal operation takes AND releases both locks
    StreamingDedup.processBatch(spark, one, 1L, work, cfg)
    StreamingDedup.compact(spark, work)
    assert(!fs.exists(compactLock) && !fs.exists(ingestLock))
    // and double-compaction (crash leftovers) self-reports instead of racing
    fs.create(compactLock, false).close()
    val e3 = intercept[IllegalStateException] { StreamingDedup.compact(spark, work) }
    assert(e3.getMessage.contains("lock"), e3.getMessage)
    fs.delete(compactLock, false)
  }

  test("lock takeover is serialized through a per-generation claim file") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_claim").toString
    val one = Seq((1L, "claim fence probe text with enough words to shingle " * 3))
      .toDF("doc_id", "content")
    StreamingDedup.processBatch(spark, one, 0L, work, cfg)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    val ingestLock = new org.apache.hadoop.fs.Path(s"$work/bands/_ingest_lock")

    // a stale same-identity corpse, but a PEER already holds the takeover
    // claim for that generation -> this replay must back off (it must NOT
    // delete the lock out from under the claim holder)
    val o = fs.create(ingestLock, false)
    o.write("processBatch(1)".getBytes("UTF-8")); o.close()
    val stale = System.currentTimeMillis() - StreamingDedup.LockTakeoverLeaseMs - 60000L
    fs.setTimes(ingestLock, stale, stale)
    val claim = new org.apache.hadoop.fs.Path(s"$work/bands/._ingest_lock.claim.$stale")
    fs.create(claim, false).close() // fresh claim = live claimant
    val e = intercept[IllegalStateException] {
      StreamingDedup.processBatch(spark, one, 1L, work, cfg)
    }
    assert(e.getMessage.contains("raced"), e.getMessage)
    assert(fs.exists(ingestLock), "the corpse must survive a raced takeover")
    assert(fs.exists(claim), "a FRESH peer claim must not be healed away")

    // a STALE claim (its holder crashed mid-takeover) is healed on the
    // next attempt (still fail-fast), and the attempt after that succeeds
    fs.setTimes(claim, stale, stale)
    intercept[IllegalStateException] {
      StreamingDedup.processBatch(spark, one, 1L, work, cfg)
    }
    assert(!fs.exists(claim), "stale claim should have been healed")
    StreamingDedup.processBatch(spark, one, 1L, work, cfg) // must not throw
    assert(!fs.exists(ingestLock))

    // an ORPHANED claim (claimant crashed between deleting the corpse and
    // re-creating the lock: claim present, NO lock) is swept by the next
    // successful acquirer once past the lease; a fresh one is left alone
    val orphanStale = new org.apache.hadoop.fs.Path(s"$work/bands/._ingest_lock.claim.123")
    val orphanFresh = new org.apache.hadoop.fs.Path(s"$work/bands/._ingest_lock.claim.456")
    fs.create(orphanStale, false).close()
    fs.setTimes(orphanStale, stale, stale)
    fs.create(orphanFresh, false).close()
    StreamingDedup.processBatch(spark, one, 1L, work, cfg)
    assert(!fs.exists(orphanStale), "stale orphaned claim should be swept on acquire")
    assert(fs.exists(orphanFresh), "a fresh claim (live peer) must survive the sweep")
    fs.delete(orphanFresh, false)
  }

  test("compact merges ALL batch dirs (bands+signatures+pairs) into one sorted gen each; dedup still works") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_compact").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"compact probe text number $salt with enough words to shingle repeatedly " * 3)
    // batch 3 plants a dup of batch 0's doc 2 so the PAIRS table is non-empty
    (0 until 5).foreach { b =>
      val rows = (0 until 10).map(i => mk(b * 100L + i, if (b == 3 && i == 0) 2 else b * 100 + i))
      StreamingDedup.processBatch(spark, rows.toDF("doc_id", "content"), b.toLong, work, cfg)
    }
    def gens(table: String) = new java.io.File(s"$work/$table").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    val beforeBands = spark.read.parquet(s"$work/bands")
      .select("doc_id", "band_idx", "band_hash").collect().toSet
    val beforeSigs = spark.read.parquet(s"$work/signatures")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val beforePairs = spark.read.parquet(s"$work/pairs")
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(beforePairs.nonEmpty, "planted cross-batch dup should have produced a pair")
    assert(gens("signatures").size == 5 && gens("pairs").size == 5)

    StreamingDedup.compact(spark, work)
    // every table collapses to ONE consolidated generation — the O(batches)
    // file-count term is gone for signatures and pairs too
    assert(gens("bands") == Seq("batch_id=-1"), gens("bands").mkString(","))
    assert(gens("signatures") == Seq("batch_id=-1"), gens("signatures").mkString(","))
    assert(gens("pairs") == Seq("batch_id=-1"), gens("pairs").mkString(","))
    assert(spark.read.parquet(s"$work/bands")
      .select("doc_id", "band_idx", "band_hash").collect().toSet == beforeBands)
    assert(spark.read.parquet(s"$work/signatures")
      .select("doc_id").collect().map(_.getLong(0)).toSet == beforeSigs)
    assert(spark.read.parquet(s"$work/pairs")
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet == beforePairs)
    // compacted signatures keep the did_prefix prune column, recomputed
    val badPrefix = spark.read.parquet(s"$work/signatures")
      .filter(col("did_prefix").isNull ||
        col("did_prefix") =!= pmod(col("doc_id"), lit(StreamingDedup.NumDocPrefixes.toLong)).cast("int"))
      .count()
    assert(badPrefix == 0L)
    // compact is idempotent
    StreamingDedup.compact(spark, work)
    assert(spark.read.parquet(s"$work/bands").count() == beforeBands.size)
    assert(spark.read.parquet(s"$work/signatures").count() == beforeSigs.size)
    // and a post-compaction batch still finds its cross-history dup (the
    // signature join-back now reads ONLY the consolidated generation)
    StreamingDedup.processBatch(spark,
      Seq(mk(9999L, 103)).toDF("doc_id", "content"), 5L, work, cfg)
    val pairs = spark.read.parquet(s"$work/pairs")
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((103L, 9999L)), pairs.toString)
  }

  test("compact heals pre-upgrade signature rows (null did_prefix recomputed)") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_compact_migrate").toString
    val textA = "the quick brown fox jumps over the lazy dog while rain falls on the hills"
    // pre-upgrade signature dir: NO did_prefix column
    val sigs0 = graft.operators.MinHashPipeline.signatures(
      Seq((0L, textA)).toDF("doc_id", "content"), cfg).toDF()
    sigs0.coalesce(1).write.parquet(s"$work/signatures/batch_id=0")
    graft.operators.MinHashPipeline.bandBuckets(sigs0)
      .withColumn("bh_prefix", pmod(col("band_hash"), lit(StreamingDedup.NumBandPrefixes)))
      .select("doc_id", "band_idx", "band_hash", "bh_prefix")
      .coalesce(1).write.parquet(s"$work/bands/batch_id=0")
    // legacy processBatch wrote pairs too — compact folds only batches
    // sink-complete across ALL tables, so the pairs dir must exist
    Seq.empty[(Long, Long, Double)].toDF("doc1", "doc2", "similarity")
      .coalesce(1).write.parquet(s"$work/pairs/batch_id=0")
    // current-layout batch alongside it -> mixed schema
    StreamingDedup.processBatch(spark,
      Seq((5L, "some very unique text about nothing else in particular today"))
        .toDF("doc_id", "content"), 1L, work, cfg)

    StreamingDedup.compact(spark, work)
    val sigs = spark.read.parquet(s"$work/signatures")
    assert(sigs.count() == 2L)
    assert(sigs.filter(col("did_prefix").isNull).count() == 0L,
      "compaction must heal pre-upgrade rows into the pruned layout")
    // the healed history still yields the cross-history dup of doc 0
    StreamingDedup.processBatch(spark,
      Seq((10L, textA)).toDF("doc_id", "content"), 2L, work, cfg)
    val got = spark.read.parquet(s"$work/pairs")
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 10L)), got.toString)
  }

  test("replay of a FOLDED batch is a no-op; incomplete batches are never folded") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_fold_replay").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"fold replay probe text number $salt with enough words to shingle " * 3)
    (0 until 3).foreach { b =>
      val rows = (0 until 8).map(i => mk(b * 100L + i, if (b == 2 && i == 0) 1 else b * 100 + i))
      StreamingDedup.processBatch(spark, rows.toDF("doc_id", "content"), b.toLong, work, cfg)
    }
    StreamingDedup.compact(spark, work)
    def snapshot() = (
      spark.read.parquet(s"$work/signatures").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq,
      spark.read.parquet(s"$work/bands").count(),
      spark.read.parquet(s"$work/pairs").select("doc1", "doc2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    val before = snapshot()
    // replay batch 2 (same data, same id — the stream's at-least-once case):
    // folded => strict no-op, NO duplicate rows, no batch_id=2 dir revival
    StreamingDedup.processBatch(spark,
      (0 until 8).map(i => mk(200L + i, if (i == 0) 1 else 200 + i)).toDF("doc_id", "content"),
      2L, work, cfg)
    assert(snapshot() == before, "folded-batch replay must not change any table")
    val dirs = new java.io.File(s"$work/signatures").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch_id=")).toSeq
    assert(dirs == Seq("batch_id=-1"), dirs.mkString(","))
    val dupSigs = spark.read.parquet(s"$work/signatures")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dupSigs == 0L)

    // a folded batchId carrying NEW doc ids is NOT a replay (a reset stream
    // checkpoint reusing the workDir) — the veto must detect the missing
    // docs and fail loudly instead of silently dropping them
    val eFresh = intercept[IllegalStateException] {
      StreamingDedup.processBatch(spark,
        Seq(mk(55555L, 7)).toDF("doc_id", "content"), 2L, work, cfg)
    }
    assert(eFresh.getMessage.contains("NOT a replay"), eFresh.getMessage)
    // and the failed veto released its lock (next call may proceed)
    val fs0 = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    assert(!fs0.exists(new org.apache.hadoop.fs.Path(s"$work/bands/_ingest_lock")))

    // a NEW batch (id above the manifest) still processes normally
    StreamingDedup.processBatch(spark,
      Seq(mk(999L, 1)).toDF("doc_id", "content"), 3L, work, cfg)
    val pairs = spark.read.parquet(s"$work/pairs")
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 999L)) && pairs.contains((200L, 999L)), pairs.toString)

    // an INCOMPLETE batch (missing _SUCCESS in one table) is NOT folded:
    // its dirs survive compaction and its replay repairs it
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/signatures/batch_id=3/_SUCCESS"), false)
    StreamingDedup.compact(spark, work)
    val sigDirs = new java.io.File(s"$work/signatures").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(sigDirs.contains("batch_id=3"), sigDirs.mkString(","))
    // bands/pairs for batch 3 must ALSO have been left (all-or-nothing fold)
    assert(new java.io.File(s"$work/bands/batch_id=3").isDirectory)
    assert(new java.io.File(s"$work/pairs/batch_id=3").isDirectory)
    // the repairing replay proceeds (3 > manifest) and restores _SUCCESS
    StreamingDedup.processBatch(spark,
      Seq(mk(999L, 1)).toDF("doc_id", "content"), 3L, work, cfg)
    assert(new java.io.File(s"$work/signatures/batch_id=3/_SUCCESS").isFile)
    val dupSigs2 = spark.read.parquet(s"$work/signatures")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dupSigs2 == 0L)
  }

  test("clusterSnapshot: batch-CC-identical labels over the streaming tables") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_snapshot").toString
    val textA = "the quick brown fox jumps over the lazy dog while rain falls on the hills"
    val textB = "completely different content about spark structured streaming micro batches and state"
    StreamingDedup.processBatch(spark,
      Seq((0L, textA), (1L, textA), (2L, textB)).toDF("doc_id", "content"), 0L, work, cfg)
    StreamingDedup.processBatch(spark,
      Seq((10L, textA), (11L, "some very unique text about nothing else here")).toDF("doc_id", "content"),
      1L, work, cfg)
    val snap = StreamingDedup.clusterSnapshot(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // {0,1,10} one component labeled by its min; 2 and 11 singletons
    assert(snap == Map(0L -> 0L, 1L -> 0L, 10L -> 0L, 2L -> 2L, 11L -> 11L), snap.toString)
    // durable + re-runnable; works after compaction too
    StreamingDedup.compact(spark, work)
    val snap2 = StreamingDedup.clusterSnapshot(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap2 == snap)
    // fence: ingest in progress blocks the snapshot fast
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    val ingestLock = new org.apache.hadoop.fs.Path(s"$work/bands/_ingest_lock")
    fs.create(ingestLock, false).close()
    val e = intercept[IllegalStateException] { StreamingDedup.clusterSnapshot(spark, work) }
    assert(e.getMessage.contains("ingest in progress"), e.getMessage)
    fs.delete(ingestLock, false)
  }

  test("updateClusters: incremental labels == full snapshot across merges, compaction, replays") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_inc_cc").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"incremental cluster probe text $salt with plenty of words to shingle " * 3)
    def fullRecompute(): Map[Long, Long] = {
      // ground truth: batch CC over ALL pairs + docs, computed out-of-band
      val pairs = spark.read.parquet(s"$work/pairs").select("doc1", "doc2")
      val docs = spark.read.parquet(s"$work/signatures").select("doc_id").dropDuplicates("doc_id")
      graft.operators.ConnectedComponents.cluster(pairs, docs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    def incremental(): Map[Long, Long] =
      StreamingDedup.updateClusters(spark, work)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch 0: docs 10,11 dups (salt 1); 12 unique. First call = full build.
    StreamingDedup.processBatch(spark,
      Seq(mk(10L, 1), mk(11L, 1), mk(12L, 2)).toDF("doc_id", "content"), 0L, work, cfg)
    assert(incremental() == fullRecompute())

    // batch 1: 20 dups 12 (merges {12,20}); 21 singleton — INCREMENTAL path
    StreamingDedup.processBatch(spark,
      Seq(mk(20L, 2), mk(21L, 3)).toDF("doc_id", "content"), 1L, work, cfg)
    val inc1 = incremental()
    assert(inc1 == fullRecompute())
    assert(inc1(20L) == 12L && inc1(21L) == 21L, inc1.toString)

    // batch 2: doc 5 dups salt 1 — its id is SMALLER than the existing
    // component min, so the whole {10,11} component must RELABEL to 5
    StreamingDedup.processBatch(spark,
      Seq(mk(5L, 1)).toDF("doc_id", "content"), 2L, work, cfg)
    val inc2 = incremental()
    assert(inc2 == fullRecompute())
    assert(inc2(10L) == 5L && inc2(11L) == 5L && inc2(5L) == 5L, inc2.toString)

    // batch 3: a cross-component BRIDGE (salt-1 text also near salt... use
    // two docs: 30 dups salt 2 AND 31 dups salt 3 — merges {12,20} & {21}
    // stay separate; then 32 bridges nothing new)
    StreamingDedup.processBatch(spark,
      Seq(mk(30L, 2), mk(31L, 3)).toDF("doc_id", "content"), 3L, work, cfg)
    assert(incremental() == fullRecompute())

    // idempotent: calling again with nothing new changes nothing
    val again = incremental()
    assert(again == fullRecompute())

    // compaction folds ONLY incorporated batches; post-compaction the
    // incremental path still matches ground truth after a further batch
    StreamingDedup.compact(spark, work)
    StreamingDedup.processBatch(spark,
      Seq(mk(40L, 1)).toDF("doc_id", "content"), 4L, work, cfg)
    val inc4 = incremental()
    assert(inc4 == fullRecompute())
    assert(inc4(40L) == 5L, inc4.toString)

    // simulated crash between table rename and meta write: stale meta makes
    // the next update RE-incorporate batch 4 — must be a no-op
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    val meta = new org.apache.hadoop.fs.Path(s"$work/clusters/_incorporated")
    val o = fs.create(meta, true); o.write("3".getBytes("UTF-8")); o.close()
    assert(incremental() == inc4)
  }

  test("compact does not fold batches the cluster maintenance has not incorporated") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_fold_gate").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"fold gate probe text $salt with plenty of words to shingle " * 3)
    StreamingDedup.processBatch(spark, Seq(mk(1L, 1)).toDF("doc_id", "content"), 0L, work, cfg)
    StreamingDedup.processBatch(spark, Seq(mk(2L, 2)).toDF("doc_id", "content"), 1L, work, cfg)
    StreamingDedup.updateClusters(spark, work) // incorporates batches 0,1
    StreamingDedup.processBatch(spark, Seq(mk(3L, 3)).toDF("doc_id", "content"), 2L, work, cfg)
    StreamingDedup.compact(spark, work)
    // batch 2 (unincorporated) must keep its dirs; batches 0,1 fold
    def gens(t: String) = new java.io.File(s"$work/$t").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    Seq("pairs", "signatures", "bands").foreach { t =>
      assert(gens(t).contains("batch_id=2"), s"$t: ${gens(t).mkString(",")}")
      assert(!gens(t).contains("batch_id=0") && !gens(t).contains("batch_id=1"),
        s"$t: ${gens(t).mkString(",")}")
    }
    // after incorporation the next compact folds it (into the existing gen)
    StreamingDedup.updateClusters(spark, work)
    StreamingDedup.compact(spark, work)
    Seq("pairs", "signatures", "bands").foreach { t =>
      assert(!gens(t).contains("batch_id=2"), s"$t: ${gens(t).mkString(",")}")
    }
  }

  test("self-maintaining stream: maintainEvery runs clusters+compact between batches") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val input = java.nio.file.Files.createTempDirectory("stream_maint_in").toString
    val work = java.nio.file.Files.createTempDirectory("stream_maint_work").toString
    val textA = "the quick brown fox jumps over the lazy dog while rain falls on the hills"
    Seq((0L, textA), (1L, textA)).toDF("doc_id", "content")
      .coalesce(1).write.mode("append").parquet(input)
    val q1 = StreamingDedup.start(spark, input, work, cfg, maintainEvery = Some(1))
    q1.awaitTermination()
    // maintenance ran: clusters table exists with correct labels
    val labels = spark.read.parquet(s"$work/clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(0L -> 0L, 1L -> 0L), labels.toString)
    // a second drop keeps maintaining incrementally (cross-history dup)
    Seq((10L, textA)).toDF("doc_id", "content")
      .coalesce(1).write.mode("append").parquet(input)
    val q2 = StreamingDedup.start(spark, input, work, cfg, maintainEvery = Some(1))
    q2.awaitTermination()
    val labels2 = spark.read.parquet(s"$work/clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels2 == Map(0L -> 0L, 1L -> 0L, 10L -> 0L), labels2.toString)
  }

  test("updateClusters parity under randomized batch sequences (seeded)") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val rnd = new scala.util.Random(7) // deterministic
    (0 until 2).foreach { trial =>
      val work = java.nio.file.Files.createTempDirectory(s"stream_rand_cc_$trial").toString
      var nextId = 100L * trial
      val pool = scala.collection.mutable.ArrayBuffer[String]()
      (0 until 5).foreach { b =>
        val rows = (0 until (3 + rnd.nextInt(4))).map { _ =>
          val id = nextId; nextId += 1
          val text =
            if (pool.nonEmpty && rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
            else {
              val t = s"random clause ${rnd.nextInt(1 << 20)} with several more words to shingle over " * 3
              pool += t; t
            }
          (id, text)
        }
        StreamingDedup.processBatch(spark, rows.toDF("doc_id", "content"), b.toLong, work, cfg)
        if (rnd.nextBoolean()) StreamingDedup.updateClusters(spark, work)
        if (b == 2 && rnd.nextBoolean()) StreamingDedup.compact(spark, work)
      }
      val inc = StreamingDedup.updateClusters(spark, work)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = graft.operators.ConnectedComponents.cluster(
          spark.read.parquet(s"$work/pairs").select("doc1", "doc2"),
          spark.read.parquet(s"$work/signatures").select("doc_id").dropDuplicates("doc_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc == full, s"trial $trial: incremental labels diverged from full CC")
    }
  }

  test("fold-intent journal: a compact crash between per-table folds does not strand a batch") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_fold_crash").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"fold crash probe text $salt with plenty of words to shingle " * 3)
    // two batches with a cross-batch dup so the pairs table matters
    StreamingDedup.processBatch(spark,
      Seq(mk(1L, 1), mk(2L, 2)).toDF("doc_id", "content"), 0L, work, cfg)
    StreamingDedup.processBatch(spark,
      Seq(mk(10L, 1)).toDF("doc_id", "content"), 1L, work, cfg)

    // SIMULATED mid-compact crash: bands folded (batch dirs gone), pairs +
    // signatures untouched, intent left behind — the exact stranding shape
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    val intent = new org.apache.hadoop.fs.Path(s"$work/bands/_fold_intent")
    val o = fs.create(intent, false); o.write("0,1".getBytes("UTF-8")); o.close()
    val bandRows = spark.read.parquet(s"$work/bands")
      .select("doc_id", "band_idx", "band_hash", "bh_prefix")
    bandRows.write.parquet(s"$work/_crash_staging") // outside the read root
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$work/_crash_staging"),
      new org.apache.hadoop.fs.Path(s"$work/bands/batch_id=-1")))
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/bands/batch_id=0"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/bands/batch_id=1"), true)

    // a snapshot sees the FULL pair/doc sets (intent ids count as complete)
    val snap = StreamingDedup.clusterSnapshot(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap == Map(1L -> 1L, 2L -> 2L, 10L -> 1L), snap.toString)

    // the next compact re-admits the intent ids and folds their surviving
    // pairs/signatures dirs; nothing is stranded and the intent is cleared
    StreamingDedup.compact(spark, work)
    def gens(t: String) = Option(new java.io.File(s"$work/$t").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("batch_id=")).toSeq.sorted
    Seq("pairs", "signatures").foreach { t =>
      assert(gens(t).forall(_.startsWith("batch_id=-")), s"$t: ${gens(t).mkString(",")}")
    }
    assert(!fs.exists(intent))
    // and the data survived the recovery end-to-end
    val sigDocs = spark.read.parquet(s"$work/signatures")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigDocs == Set(1L, 2L, 10L), sigDocs.toString)
    val pairSet = spark.read.parquet(s"$work/pairs")
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((1L, 10L)), pairSet.toString)
  }

  test("updateClusters append-only tick: existing label files are untouched (O(new docs) write)") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_append_only").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"append only tick probe text $salt with plenty of words to shingle " * 3)
    StreamingDedup.processBatch(spark,
      Seq(mk(10L, 1), mk(11L, 1), mk(12L, 2)).toDF("doc_id", "content"), 0L, work, cfg)
    StreamingDedup.updateClusters(spark, work)
    def labelFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$work/clusters"))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = labelFiles()
    assert(before.nonEmpty)
    // batch of UNIQUE docs: no pairs, no merges -> remap is empty, the tick
    // must APPEND new labels without rewriting (or even touching) any
    // existing file — the bounded-write contract for the trickle case
    StreamingDedup.processBatch(spark,
      Seq(mk(20L, 3), mk(21L, 4)).toDF("doc_id", "content"), 1L, work, cfg)
    val labels = StreamingDedup.updateClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(10L -> 10L, 11L -> 10L, 12L -> 12L, 20L -> 20L, 21L -> 21L),
      labels.toString)
    val after = labelFiles()
    before.foreach { case (path, mtime) =>
      assert(after.get(path).contains(mtime), s"pre-existing label file rewritten: $path")
    }
    assert(after.size > before.size, "no new label files appended")
  }

  test("updateClusters heals a crashed remap apply (marker + dual rows) exactly") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_crash_apply").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"crashed apply probe text $salt with plenty of words to shingle " * 3)
    StreamingDedup.processBatch(spark,
      Seq(mk(10L, 1), mk(11L, 1), mk(12L, 2)).toDF("doc_id", "content"), 0L, work, cfg)
    StreamingDedup.updateClusters(spark, work) // labels: {10,11}->10, 12->12
    // batch 1: doc 5 dups salt 1 — a real update would remap {10,11} -> 5
    StreamingDedup.processBatch(spark,
      Seq(mk(5L, 1)).toDF("doc_id", "content"), 1L, work, cfg)
    // SIMULATED crash mid-apply, after the append phase: marker present,
    // the new cluster's dir holds the appended rows, the old dir still
    // holds the stale ones (dual rows for 10 and 11), watermark NOT
    // advanced. This is exactly the state phase 1 leaves behind.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$work/clusters/_apply_in_progress")
    val o = fs.create(marker, false); o.write("10".getBytes("UTF-8")); o.close()
    val tmp = s"$work/_test_append"
    Seq((10L, 5L), (11L, 5L), (5L, 5L)).toDF("doc_id", "cluster_id")
      .coalesce(1).write.parquet(tmp)
    val destDir = new org.apache.hadoop.fs.Path(s"$work/clusters/cp=5")
    fs.mkdirs(destDir)
    fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*")).foreach { f =>
      require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(destDir, f.getPath.getName)))
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    spark.catalog.refreshByPath(s"$work/clusters")
    // readClusters under the marker resolves dual rows by MIN (the new root)
    val viewed = StreamingDedup.readClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viewed == Map(10L -> 5L, 11L -> 5L, 12L -> 12L, 5L -> 5L), viewed.toString)
    // the next maintenance tick heals the files, re-incorporates batch 1,
    // and lands on exactly the full-CC labels; the marker is gone
    val healed = StreamingDedup.updateClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = graft.operators.ConnectedComponents.cluster(
        spark.read.parquet(s"$work/pairs").select("doc1", "doc2"),
        spark.read.parquet(s"$work/signatures").select("doc_id").dropDuplicates("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(healed == full, s"$healed vs $full")
    assert(healed == Map(10L -> 5L, 11L -> 5L, 12L -> 12L, 5L -> 5L), healed.toString)
    assert(!fs.exists(marker))
    // one row per doc again (duals converged)
    val dupRows = spark.read.parquet(s"$work/clusters")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dupRows == 0L)
  }

  test("bootstrap from a batch run: streamed batches dedup against seeded history; labels parity") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val mk = (id: Long, salt: Int) =>
      (id, s"bootstrap parity probe text $salt with plenty of words to shingle " * 3)
    val histDocs = Seq(mk(10L, 1), mk(11L, 1), mk(12L, 2), mk(13L, 3))
    val b1 = Seq(mk(20L, 1))            // dups a seeded cluster
    val b2 = Seq(mk(21L, 2), mk(22L, 9)) // dups a seeded singleton + a new unique
    // completed BATCH run over the history corpus
    val histDF = histDocs.toDF("doc_id", "content")
    val batchSigs = graft.operators.MinHashPipeline.signatures(histDF, cfg).toDF()
    val batchPairs = graft.operators.MinHashPipeline.run(histDF, cfg)
    val work = java.nio.file.Files.createTempDirectory("stream_bootstrap").toString
    StreamingDedup.bootstrap(spark, work, batchSigs, batchPairs)
    spark.catalog.clearCache() // run() caches its signatures
    // seeded generation refuses to be clobbered once streamed batches exist
    StreamingDedup.processBatch(spark, b1.toDF("doc_id", "content"), 0L, work, cfg)
    intercept[IllegalStateException] {
      StreamingDedup.bootstrap(spark, work, batchSigs, batchPairs)
    }
    StreamingDedup.processBatch(spark, b2.toDF("doc_id", "content"), 1L, work, cfg)
    val seededLabels = StreamingDedup.updateClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // from-scratch stream over the SAME corpus (history as batch 0)
    val work2 = java.nio.file.Files.createTempDirectory("stream_scratch").toString
    StreamingDedup.processBatch(spark, histDF, 0L, work2, cfg)
    StreamingDedup.processBatch(spark, b1.toDF("doc_id", "content"), 1L, work2, cfg)
    StreamingDedup.processBatch(spark, b2.toDF("doc_id", "content"), 2L, work2, cfg)
    val scratchLabels = StreamingDedup.updateClusters(spark, work2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seededLabels == scratchLabels, s"$seededLabels vs $scratchLabels")
    assert(seededLabels(20L) == seededLabels(10L) && seededLabels(21L) == seededLabels(12L),
      seededLabels.toString)
    assert(seededLabels(22L) == 22L, seededLabels.toString)
    // pair SETS agree too (cross-history pairs found against the seeded bands)
    def pairSet(w: String) = spark.read.parquet(s"$w/pairs")
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(work) == pairSet(work2), s"${pairSet(work)} vs ${pairSet(work2)}")
    // maintenance over the seeded layout: compact folds the generation +
    // batches and a post-compact batch still dedups against history
    StreamingDedup.compact(spark, work)
    StreamingDedup.processBatch(spark, Seq(mk(30L, 3)).toDF("doc_id", "content"), 2L, work, cfg)
    val after = StreamingDedup.updateClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after(30L) == after(13L), after.toString)
  }

  test("readClusters under the marker salvages a complete removal stage (no doc vanishes)") {
    // The one crash window where the TABLE alone is incomplete (ADVICE r5):
    // phase-2 deleted an affected old-root dir but crashed before renaming
    // its stage copy in — the dir's keep-rows exist ONLY in the removal
    // stage. readClusters must union a _SUCCESS-complete stage into the
    // min-resolve instead of silently returning labels missing those docs.
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_crash_removal").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"removal stage probe text $salt with plenty of words to shingle " * 3)
    // doc 26 shares cp dir 10 (26 % 16) with cluster 10's rows but is NOT
    // part of the merge — it is the keep-row the crash strands in the stage
    StreamingDedup.processBatch(spark,
      Seq(mk(10L, 1), mk(11L, 1), mk(12L, 2), mk(26L, 3)).toDF("doc_id", "content"),
      0L, work, cfg)
    StreamingDedup.updateClusters(spark, work) // {10,11}->10, 12->12, 26->26
    StreamingDedup.processBatch(spark,
      Seq(mk(5L, 1)).toDF("doc_id", "content"), 1L, work, cfg) // merges {5,10,11}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$work/clusters/_apply_in_progress")
    val o = fs.create(marker, false); o.write("10".getBytes("UTF-8")); o.close()
    // append phase done: new-root dir holds the moved+new rows
    val tmp = s"$work/_test_append"
    Seq((10L, 5L), (11L, 5L), (5L, 5L)).toDF("doc_id", "cluster_id")
      .coalesce(1).write.parquet(tmp)
    val destDir = new org.apache.hadoop.fs.Path(s"$work/clusters/cp=5")
    fs.mkdirs(destDir)
    fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*")).foreach { f =>
      require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(destDir, f.getPath.getName)))
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    // removal stage COMPLETE (root _SUCCESS), old dir already deleted:
    // doc 26's only row now lives in the stage
    val stage = new org.apache.hadoop.fs.Path(s"$work/_labels_removal_stage")
    val tmp2 = s"$work/_test_stage"
    Seq((26L, 26L)).toDF("doc_id", "cluster_id").coalesce(1).write.parquet(tmp2)
    val stageDir = new org.apache.hadoop.fs.Path(stage, "cp=10")
    fs.mkdirs(stageDir)
    fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp2/part-*")).foreach { f =>
      require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(stageDir, f.getPath.getName)))
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp2), true)
    fs.create(new org.apache.hadoop.fs.Path(stage, "_SUCCESS"), true).close()
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/clusters/cp=10"), true)
    spark.catalog.refreshByPath(s"$work/clusters")
    // readClusters recovers doc 26 from the stage and min-resolves the rest
    val viewed = StreamingDedup.readClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viewed == Map(5L -> 5L, 10L -> 5L, 11L -> 5L, 12L -> 12L, 26L -> 26L),
      viewed.toString)
    // the heal converges the files to exactly the full-CC labels
    val healed = StreamingDedup.updateClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(healed == Map(5L -> 5L, 10L -> 5L, 11L -> 5L, 12L -> 12L, 26L -> 26L),
      healed.toString)
    assert(!fs.exists(marker))
    assert(!fs.exists(stage))
  }

  test("updateClusters migrates a pre-partitioned-layout (flat) clusters table") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_flat_migrate").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"flat layout probe text $salt with plenty of words to shingle " * 3)
    StreamingDedup.processBatch(spark,
      Seq(mk(10L, 1), mk(11L, 1), mk(12L, 2)).toDF("doc_id", "content"), 0L, work, cfg)
    // simulate a PRE-v2 workDir: labels as flat parquet files (no cp dirs)
    // with the watermark file, exactly what an old clusterSnapshot wrote
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    Seq((10L, 10L), (11L, 10L), (12L, 12L)).toDF("doc_id", "cluster_id")
      .coalesce(1).write.parquet(s"$work/clusters")
    val meta = new org.apache.hadoop.fs.Path(s"$work/clusters/_incorporated")
    val o = fs.create(meta, true); o.write("0".getBytes("UTF-8")); o.close()
    assert(new java.io.File(s"$work/clusters").listFiles()
      .exists(f => f.getName.startsWith("part-")))
    // new batch merges {10,11} with smaller id 5 — exercises the remap
    // apply right after the migration rewrite
    StreamingDedup.processBatch(spark,
      Seq(mk(5L, 1)).toDF("doc_id", "content"), 1L, work, cfg)
    val labels = StreamingDedup.updateClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(10L -> 5L, 11L -> 5L, 12L -> 12L, 5L -> 5L), labels.toString)
    // layout upgraded: cp dirs present, no flat part files at the root
    val rootFiles = new java.io.File(s"$work/clusters").listFiles()
    assert(rootFiles.exists(f => f.isDirectory && f.getName.startsWith("cp=")))
    assert(!rootFiles.exists(f => f.isFile && f.getName.startsWith("part-")))
  }

  test("labels-table fold: one generation, labels and watermark preserved") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_labels_fold").toString
    val mk = (id: Long, salt: Int) =>
      (id, s"labels fold probe text $salt with plenty of words to shingle " * 3)
    // three append-only ticks accumulate one file per touched cp dir each
    (0 until 3).foreach { b =>
      StreamingDedup.processBatch(spark,
        Seq(mk(10L * b + 1, b), mk(10L * b + 2, 100 + b)).toDF("doc_id", "content"),
        b.toLong, work, cfg)
      StreamingDedup.updateClusters(spark, work)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(work), spark.sparkContext.hadoopConfiguration)
    def labelFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$work/clusters")).filter(_.getName.endsWith(".parquet"))
    }
    val before = StreamingDedup.readClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wmBefore = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$work/clusters/_incorporated")), "UTF-8").trim
    assert(labelFiles().size >= 3)
    // ceiling 0 forces the fold regardless of count
    StreamingDedup.maybeCompactClusterFiles(spark, fs, work, ceiling = 0)
    spark.catalog.refreshByPath(s"$work/clusters")
    val after = StreamingDedup.readClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wmAfter = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$work/clusters/_incorporated")), "UTF-8").trim
    assert(after == before, s"$after vs $before")
    assert(wmAfter == wmBefore, s"watermark changed: $wmBefore -> $wmAfter")
    // folded: at most one file per cp dir (the fold range-partitions)
    val perDir = labelFiles().groupBy(_.getParentFile.getName)
    assert(perDir.values.forall(_.size <= 2), perDir.view.mapValues(_.size).toMap.toString)
    // next maintenance tick still works on the folded table
    StreamingDedup.processBatch(spark,
      Seq(mk(91L, 0)).toDF("doc_id", "content"), 3L, work, cfg) // dups batch 0's salt
    val labels = StreamingDedup.updateClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(91L) == labels(1L), labels.toString)
  }

  test("CLI --stream path (Main.runStream): ingests, maintains, reports counts") {
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val input = java.nio.file.Files.createTempDirectory("stream_cli_in").toString
    val work = java.nio.file.Files.createTempDirectory("stream_cli_work").toString
    val textA = "the quick brown fox jumps over the lazy dog while rain falls on the hills"
    val textB = "completely different content about spark structured streaming micro batches and state"
    Seq((0L, textA), (1L, textA), (2L, textB)).toDF("doc_id", "content")
      .coalesce(1).write.mode("append").parquet(input)
    val json = Main.runStream(spark, input, work, cfg,
      maintainEvery = Some(1), starCap = None)
    assert(json.contains("\"docs\":3") && json.contains("\"clusters\":2"), json)
    // second drop through the same CLI path: checkpoint resumes, the
    // cross-history dup lands in the existing cluster
    Seq((10L, textA)).toDF("doc_id", "content")
      .coalesce(1).write.mode("append").parquet(input)
    val json2 = Main.runStream(spark, input, work, cfg,
      maintainEvery = None, starCap = Some(64))
    assert(json2.contains("\"docs\":4") && json2.contains("\"clusters\":2"), json2)
    val labels = StreamingDedup.readClusters(spark, work)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 10L -> 0L), labels.toString)
  }

  test("pre-upgrade signature batches (no did_prefix column) still join cross-history") {
    // MIGRATION: a workDir whose signature dirs were written before the
    // did_prefix prune column existed must not silently lose those docs
    // from the history-similarity join (recall would die silently)
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 64, nBandRows = 4, seed = 13, threshold = 0.8)
    val work = java.nio.file.Files.createTempDirectory("stream_migrate").toString
    val textA = "the quick brown fox jumps over the lazy dog while rain falls on the hills"
    val textB = "completely different content about spark structured streaming micro batches and state"

    // batch 0 in the PRE-UPGRADE layout: signatures without did_prefix
    val docs0 = Seq((0L, textA), (1L, textB)).toDF("doc_id", "content")
    val sigs0 = graft.operators.MinHashPipeline.signatures(docs0, cfg).toDF()
    sigs0.coalesce(1).write.parquet(s"$work/signatures/batch_id=0")
    graft.operators.MinHashPipeline.bandBuckets(sigs0)
      .withColumn("bh_prefix", pmod(col("band_hash"), lit(StreamingDedup.NumBandPrefixes)))
      .select("doc_id", "band_idx", "band_hash", "bh_prefix")
      .coalesce(1).write.parquet(s"$work/bands/batch_id=0")

    // batch 1 in the CURRENT layout -> the history is mixed-schema
    StreamingDedup.processBatch(spark,
      Seq((5L, "some very unique text about nothing else in particular today"))
        .toDF("doc_id", "content"), 1L, work, cfg)

    // batch 2 duplicates the pre-upgrade doc 0: the cross-history pair must
    // surface whichever file Spark samples the signature schema from
    StreamingDedup.processBatch(spark,
      Seq((10L, textA)).toDF("doc_id", "content"), 2L, work, cfg)
    val got = spark.read.parquet(s"$work/pairs")
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 10L)), got.toString)
    assert(!got.contains((1L, 10L)), got.toString) // different text stays distinct
  }
}
