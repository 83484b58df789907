package graft.plans

import graft.core.MinHashConfig
import graft.operators.{ConnectedComponents, MinHashPipeline}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable staged execution of the dedup pipeline with per-partition
  * lineage + row-count metrics — the north-star's checkpoint contract.
  *
  * "Iceberg emulation" (SURVEY.md §1.4 — no Iceberg runtime in
  * /opt/spark/jars): each stage is an append-only Parquet table under
  * `workDir/<stage>/`, committed atomically by Spark's _SUCCESS marker; the
  * `_metrics` table carries (stage, partition_id, rows, input_fingerprint,
  * config, ts_ns) rows appended per completed stage. On a rerun, a stage
  * whose table exists with _SUCCESS AND whose recorded (fingerprint, config)
  * match the current run is read back instead of recomputed — the job
  * resumes mid-pipeline after failure.
  */
class CheckpointedPipeline(
    spark: SparkSession,
    cfg: MinHashConfig,
    workDir: String,
    starCapBucketSize: Option[Int] = None,
    verifyExactJaccard: Boolean = false,
    contentFingerprint: Boolean = false,
    emitDedupCorpus: Boolean = false,
    candidatePartitions: Option[Int] = None
) {
  import CheckpointedPipeline._

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(workDir),
    spark.sparkContext.hadoopConfiguration
  )

  private def stagePath(stage: String) = s"$workDir/$stage"
  private def metricsPath = s"$workDir/_metrics"

  /** Input fingerprint for resume. Two levels:
    *
    *   - METADATA (default, file-backed inputs): crc over the sorted
    *     (path, length, mtime) of the input files — the Iceberg
    *     snapshot-id analog. Driver-side file stats only; at 100 TB this
    *     costs a directory listing, NOT a full data pass per run (the old
    *     content scan re-read the entire input even when every stage
    *     resumed).
    *   - CONTENT (`contentFingerprint = true`, and the automatic fallback
    *     for non-file inputs like the synthetic corpus): row count + sum
    *     of a 32-bit content hash. Order-insensitive, one full pass.
    */
  def fingerprint(docs: DataFrame): String = {
    val files = docs.inputFiles
    if (files.nonEmpty && !contentFingerprint) {
      // plan hash first: two reads of the SAME files that project different
      // source columns (--text-col body vs title) are different inputs —
      // file stats alone cannot see that, the canonicalized analyzed plan
      // can. Without it a rerun with a changed projection would silently
      // resume stages computed from the old column.
      // crc of the canonicalized plan STRING (exprIds normalized): stable
      // across JVM restarts, unlike object hashCodes of relation nodes
      val planCrc = new java.util.zip.CRC32
      planCrc.update(docs.queryExecution.analyzed.canonicalized.toString.getBytes("UTF-8"))
      val planHash = planCrc.getValue
      // file stats via one listStatus per parent DIRECTORY (batched RPCs),
      // not one getFileStatus per file — 10^6 input files must cost
      // thousands of listing calls, not millions of point lookups
      val conf = spark.sparkContext.hadoopConfiguration
      val crc = new java.util.zip.CRC32
      val parents = files.map(f => new org.apache.hadoop.fs.Path(f).getParent).distinct
      val statByPath: Map[String, (Long, Long)] = parents.iterator.flatMap { parent =>
        parent.getFileSystem(conf).listStatus(parent).iterator
          .map(st => st.getPath.toUri.getPath ->
            ((st.getLen, st.getModificationTime)))
      }.toMap
      files.sorted.foreach { f =>
        val key = new org.apache.hadoop.fs.Path(f).toUri.getPath
        val (len, mtime) = statByPath.getOrElse(key, (-1L, -1L))
        crc.update(s"$f:$len:$mtime;".getBytes("UTF-8"))
      }
      s"files=${files.length};plan=$planHash;meta=${crc.getValue}"
    } else {
      val row = docs
        .agg(count(lit(1)).as("n"), sum(crc32(col("content").cast("string"))).as("h"))
        .head()
      s"n=${row.getLong(0)};h=${row.get(1)}"
    }
  }

  /** Per-stage config tag: a stage is only invalidated by the parameters it
    * actually depends on (a threshold-only change must not recompute
    * signatures/candidates).
    */
  private def configTag(stage: String): String = {
    val sig = s"sh=${cfg.shingleSize};sig=${cfg.signatureSize};r=${cfg.nBandRows};seed=${cfg.seed}"
    stage match {
      case "signatures" => sig
      case "candidates" => s"$sig;cap=${starCapBucketSize.getOrElse(-1)}"
      case _            => s"$sig;cap=${starCapBucketSize.getOrElse(-1)};thr=${cfg.threshold}"
    }
  }

  private def committed(stage: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"${stagePath(stage)}/_SUCCESS"))

  /** The tag identifies the CURRENT contents of a stage table (fingerprint
    * + stage-relevant config). Checking the _metrics history instead would
    * be wrong: a stage overwritten under config B still has config-A rows
    * in the history, and a resume under config A must NOT reuse the
    * config-B table.
    */
  private def tagPath(stage: String) = new org.apache.hadoop.fs.Path(s"${stagePath(stage)}/_graft_tag")

  private def writeTag(stage: String, fp: String): Unit = {
    val out = fs.create(tagPath(stage), true)
    out.write(s"$fp|${configTag(stage)}".getBytes("UTF-8"))
    out.close()
  }

  private def tagMatches(stage: String, fp: String): Boolean = {
    if (!fs.exists(tagPath(stage))) return false
    val in = fs.open(tagPath(stage))
    val content = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    content == s"$fp|${configTag(stage)}"
  }

  private def appendMetrics(stage: String, df: DataFrame, fp: String): Unit = {
    val ts = System.nanoTime()
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("stage", lit(stage))
      .withColumn("input_fingerprint", lit(fp))
      .withColumn("config", lit(configTag(stage)))
      .withColumn("ts_ns", lit(ts))
      .select("stage", "partition_id", "rows", "input_fingerprint", "config", "ts_ns")
      .write
      .mode(SaveMode.Append)
      .parquet(metricsPath)
  }

  /** Run (or resume) one stage: if its table is committed with matching
    * metrics, read it back; otherwise compute, write, and record metrics.
    */
  private def stage(name: String, fp: String, executed: StageLog)(compute: => DataFrame): DataFrame = {
    if (committed(name) && tagMatches(name, fp)) {
      executed.skipped += name
      spark.read.parquet(stagePath(name))
    } else {
      val df = compute
      df.write.mode(SaveMode.Overwrite).parquet(stagePath(name))
      val written = spark.read.parquet(stagePath(name))
      // lineage first, tag last: a tag implies table + metrics both durable
      // (a crash in between leaves no tag -> the stage recomputes, safe)
      appendMetrics(name, written, fp)
      writeTag(name, fp)
      executed.computed += name
      written
    }
  }

  /** Full staged run. Returns the clusters table and the stage log
    * (which stages were computed vs resumed).
    */
  def run(docs: DataFrame): (DataFrame, StageLog) = {
    val log = new StageLog
    val fp = fingerprint(docs)
    val sigs = stage("signatures", fp, log) {
      MinHashPipeline.signatures(docs, cfg).toDF()
    }
    val cands = stage("candidates", fp, log) {
      MinHashPipeline.candidates(sigs, starCapBucketSize,
        candidatePartitions = candidatePartitions)
    }
    val pairs = stage("pairs", fp, log) {
      MinHashPipeline.pairs(cands, sigs, cfg)
    }
    // optional north-star verification stage: exact Jaccard over distinct
    // shingle-hash sets for every candidate pair (the reference's dead-code
    // array_similarity semantics, O15b)
    if (verifyExactJaccard) {
      stage("jaccard", fp, log) {
        MinHashPipeline.exactJaccardPairs(cands, docs, cfg)
      }
    }
    val clusters = stage("clusters", fp, log) {
      // durable per-iteration labels under the work dir: on a real cluster
      // a lost executor re-reads parquet instead of killing the stage
      // (the `_`-prefixed scratch dir is invisible to parquet readers)
      ConnectedComponents.cluster(pairs, docs.select(col("doc_id")),
        reliableCheckpointDir = Some(s"$workDir/_cc_scratch"))
    }
    // the clusters stage table is the durable copy — drop the per-iteration
    // scratch once the stage is committed (it would otherwise accumulate
    // stale label tables across reruns with different inputs)
    fs.delete(new org.apache.hadoop.fs.Path(s"$workDir/_cc_scratch"), true)
    // optional end-product stage: the deduplicated corpus itself (one
    // representative document per cluster)
    if (emitDedupCorpus) {
      stage("dedup_corpus", fp, log) {
        graft.operators.Dedup.keepRepresentatives(docs, clusters)
      }
    }
    (clusters, log)
  }

  def metrics: DataFrame = spark.read.parquet(metricsPath)
}

object CheckpointedPipeline {
  final class StageLog {
    val computed = scala.collection.mutable.ArrayBuffer[String]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    override def toString =
      s"computed=${computed.mkString("[", ",", "]")} resumed=${skipped.mkString("[", ",", "]")}"
  }
}
