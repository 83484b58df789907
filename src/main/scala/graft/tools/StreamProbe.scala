package graft.tools

import graft.core.MinHashConfig
import graft.sources.CorpusGen
import org.apache.spark.sql.SparkSession

/** Measures StreamingDedup per-batch cost as history grows — the evidence
  * for the O(batch + matched buckets) claim: with a constant batch size,
  * per-batch wall time must stay FLAT while accumulated history grows
  * linearly (the pre-fix design re-kerneled the whole history per batch,
  * i.e. linear growth per batch / quadratic total).
  *
  * Prints one line per batch: batch id, input rows, duration ms.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator
      .setRootLevel(org.apache.logging.log4j.Level.ERROR)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nBatches = args.headOption.map(_.toInt).getOrElse(12)
    val perBatch = args.lift(1).map(_.toLong).getOrElse(5000L)
    val input = java.nio.file.Files.createTempDirectory("probe_in").toString
    val work = java.nio.file.Files.createTempDirectory("probe_work").toString
    // one file per intended micro-batch (maxFilesPerTrigger=1 below is
    // implied by writing + draining one file at a time)
    val cfg = MinHashConfig(shingleSize = 3, signatureSize = 128, nBandRows = 4,
      seed = 13, threshold = 0.8)

    // NOT a StreamingQueryListener: listener-bus delivery is async, so the
    // last batches' events could land after the loop (or racy += could drop
    // them), skewing exactly the second-half average the probe exists to
    // measure. recentProgress on the terminated query is synchronous.
    val durations = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(0) // 0 = never
    (0 until nBatches).foreach { b =>
      // unique-kind docs ONLY (doc_id % 20 >= 6): the full synth corpus
      // plants license clones identical ACROSS batches — a true dup clique
      // whose per-batch pair output grows linearly by design, which would
      // mask the table-scan growth this probe isolates
      CorpusGen.sourceFilesWithIds(spark, perBatch, seed = 1000L + b)
        .filter($"doc_id" % 20 >= 6)
        .select(($"doc_id" + b * perBatch).as("doc_id"), $"content")
        .coalesce(1).write.mode("append").parquet(input)
      val q = graft.streaming.StreamingDedup.start(spark, input, work, cfg)
      q.awaitTermination()
      q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
        durations += ((p.batchId, p.numInputRows, p.batchDuration))
      }
      // never compact the FINAL batch: the prune-evidence block below
      // identifies "the last batch" by its signatures batch_id dir, which
      // compaction (now covering signatures too) would fold away
      if (compactEvery > 0 && (b + 1) % compactEvery == 0 && b < nBatches - 1)
        graft.streaming.StreamingDedup.compact(spark, work)
    }
    durations.foreach { case (id, rows, ms) =>
      println(f"batch=$id%3d rows=$rows%7d ms=$ms%6d")
    }
    // file-count evidence: with compactEvery=N the counts must stay flat
    // (O(1) generations per table) instead of growing one dir per batch
    Seq("bands", "signatures", "pairs").foreach { t =>
      val files = Option(new java.io.File(s"$work/$t").listFiles()).getOrElse(Array.empty)
        .flatMap(d => if (d.isDirectory) d.listFiles() else Array(d))
        .count(_.getName.endsWith(".parquet"))
      val dirs = Option(new java.io.File(s"$work/$t").listFiles()).getOrElse(Array.empty)
        .count(d => d.isDirectory && d.getName.startsWith("batch_id="))
      println(s"table=$t generations=$dirs parquet_files=$files")
    }
    val ms = durations.map(_._3.toDouble)
    if (ms.length >= 6) {
      val firstHalf = ms.slice(1, ms.length / 2).sum / (ms.length / 2 - 1)
      val secondHalf = ms.drop(ms.length / 2).sum / (ms.length - ms.length / 2)
      println(f"avg_first_half=$firstHalf%.0f ms avg_second_half=$secondHalf%.0f ms ratio=${secondHalf / firstHalf}%.2f")
    }

    // signature-prune evidence: replay the LAST batch's candidate discovery
    // against its prior history and count how many history signature rows
    // the pruned production read (prunedHistorySignatures) actually joins —
    // must be << the history signature count (the old code joined ALL of it).
    // Batch membership comes from the last batch's signatures batch_id dir,
    // which exists ONLY because the loop above never compacts the final
    // batch — compact() folds signatures (and bands/pairs) into negative
    // consolidated generations, after which max(batch_id) would be -1 and
    // this block would silently compare history against itself. Keep the
    // `b < nBatches - 1` guard if touching the loop.
    import org.apache.spark.sql.functions._
    val lastBatch = spark.read.parquet(s"$work/signatures")
      .agg(max("batch_id")).head().getInt(0).toLong
    val lastDocs = spark.read.parquet(s"$work/signatures")
      .filter($"batch_id" === lastBatch).select("doc_id")
    val allBands = spark.read.parquet(s"$work/bands")
    val batchBands = allBands.join(broadcast(lastDocs), Seq("doc_id"), "left_semi")
    val histBands = allBands.join(broadcast(lastDocs), Seq("doc_id"), "left_anti")
    val cands = histBands.alias("h")
      .join(broadcast(batchBands.alias("b")),
        col("h.band_idx") === col("b.band_idx") &&
          col("h.band_hash") === col("b.band_hash") &&
          col("h.doc_id") =!= col("b.doc_id"))
      .select(col("h.doc_id").as("doc_id")).distinct()
      .union(batchBands.select("doc_id").distinct()).distinct()
    val prefixes = cands
      .select(pmod($"doc_id", lit(graft.streaming.StreamingDedup.NumDocPrefixes.toLong))
        .cast("int").as("p")).distinct().collect().map(_.getInt(0)).toSeq
    val prunedRows =
      if (prefixes.isEmpty) 0L
      else graft.streaming.StreamingDedup.prunedHistorySignatures(
        spark, s"$work/signatures", lastBatch, cands, prefixes).count()
    val histRows = spark.read.parquet(s"$work/signatures")
      .filter($"batch_id" =!= lastBatch).count()
    println(f"sig_prune: history_rows=$histRows%d joined_rows=$prunedRows%d " +
      f"fraction=${if (histRows == 0) 0.0 else prunedRows.toDouble / histRows}%.4f")
    assert(histRows == 0 || prunedRows <= histRows / 2,
      s"signature prune ineffective: $prunedRows of $histRows history rows joined")

    // cluster-maintenance evidence: full snapshot cost over the whole
    // accumulated history vs the incremental update for ONE new batch —
    // the O(all pairs) vs O(new pairs + labels pass) claim, measured
    val tSnap0 = System.nanoTime()
    graft.streaming.StreamingDedup.clusterSnapshot(spark, work)
    val snapSec = (System.nanoTime() - tSnap0) / 1e9
    val extraId = nBatches.toLong
    CorpusGen.sourceFilesWithIds(spark, perBatch, seed = 5000L)
      .filter($"doc_id" % 20 >= 6)
      .select(($"doc_id" + extraId * perBatch).as("doc_id"), $"content")
      .coalesce(1).write.mode("append").parquet(input)
    val q2 = graft.streaming.StreamingDedup.start(spark, input, work, cfg)
    q2.awaitTermination()
    val wallInc0 = System.currentTimeMillis()
    val tInc0 = System.nanoTime()
    graft.streaming.StreamingDedup.updateClusters(spark, work)
    val incSec = (System.nanoTime() - tInc0) / 1e9
    println(f"clusters: full_snapshot=$snapSec%.1fs incremental_update=$incSec%.1fs " +
      f"speedup=${snapSec / math.max(0.001, incSec)}%.1fx")

    // bounded-write evidence: the extra batch is all-unique docs, so the
    // incremental tick merges nothing — it must APPEND O(new docs) label
    // bytes, not rewrite the table (files touched during the update vs the
    // whole cp-partitioned table)
    def labelFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$work/clusters"))
        .filter(f => f.getName.endsWith(".parquet"))
    }
    val all = labelFiles()
    val tableBytes = all.map(_.length).sum
    val writtenBytes = all.filter(_.lastModified() >= wallInc0).map(_.length).sum
    println(f"labels_write: table_bytes=$tableBytes%d written_bytes=$writtenBytes%d " +
      f"fraction=${if (tableBytes == 0) 0.0 else writtenBytes.toDouble / tableBytes}%.4f")
    assert(tableBytes == 0 || writtenBytes <= tableBytes / 2,
      s"no-merge maintenance tick rewrote the labels table: $writtenBytes of $tableBytes bytes")
    spark.stop()
  }
}
