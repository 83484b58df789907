package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reusable stage-table protocol behind every resumable pipeline in the
  * engine (the reference dedup pipeline via [[CheckpointedPipeline]], the
  * composed cleaning recipe via `CleanPipeline.runCheckpointed`).
  *
  * "Iceberg emulation" (SURVEY.md §1.4 — no Iceberg runtime in
  * /opt/spark/jars): each stage is a Parquet table under
  * `workDir/<stage>/`, committed atomically by Spark's _SUCCESS marker,
  * tagged by a `_graft_tag` file holding the full identity of its contents
  * (input fingerprint + the config parameters the stage depends on). On a
  * rerun, a stage whose table is committed AND whose tag matches the
  * current run is read back instead of recomputed — the job resumes
  * mid-pipeline after failure. The `_metrics` table accumulates
  * (stage, partition_id, rows, input_fingerprint, config, ts_ns) lineage
  * rows appended per completed stage.
  *
  * Tag-vs-history rationale (inherited from CheckpointedPipeline): the tag
  * identifies the CURRENT contents of a stage table. Checking the _metrics
  * history instead would be wrong — a stage overwritten under config B
  * still has config-A rows in the history, and a resume under config A
  * must NOT reuse the config-B table.
  */
class StageStore(spark: SparkSession, workDir: String) {
  import CheckpointedPipeline.StageLog

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(workDir), spark.sparkContext.hadoopConfiguration)

  def stagePath(stage: String): String = s"$workDir/$stage"
  private def metricsPath = s"$workDir/_metrics"

  private def committed(stage: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"${stagePath(stage)}/_SUCCESS"))

  private def tagPath(stage: String) =
    new org.apache.hadoop.fs.Path(s"${stagePath(stage)}/_graft_tag")

  private def writeTag(stage: String, tag: String): Unit = {
    val out = fs.create(tagPath(stage), true)
    out.write(tag.getBytes("UTF-8"))
    out.close()
  }

  private def tagMatches(stage: String, tag: String): Boolean = {
    if (!fs.exists(tagPath(stage))) return false
    val in = fs.open(tagPath(stage))
    val content = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    content == tag
  }

  private def appendMetrics(stage: String, df: DataFrame, fp: String, config: String): Unit = {
    val ts = System.nanoTime()
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("stage", lit(stage))
      .withColumn("input_fingerprint", lit(fp))
      .withColumn("config", lit(config))
      .withColumn("ts_ns", lit(ts))
      .select("stage", "partition_id", "rows", "input_fingerprint", "config", "ts_ns")
      .write
      .mode(SaveMode.Append)
      .parquet(metricsPath)
  }

  /** Run (or resume) one stage. `fp` and `config` together form the tag
    * (written as `"$fp|$config"`, the historical on-disk format): if the
    * stage table is committed with a matching tag, read it back; otherwise
    * evaluate `compute`, write the table, record lineage metrics, and tag
    * it. Tag is written LAST — a crash in between leaves no tag, so the
    * stage recomputes (safe).
    */
  def stage(name: String, fp: String, config: String, executed: StageLog)
           (compute: => DataFrame): DataFrame = {
    val tag = s"$fp|$config"
    if (committed(name) && tagMatches(name, tag)) {
      executed.skipped += name
      spark.read.parquet(stagePath(name))
    } else {
      val df = compute
      df.write.mode(SaveMode.Overwrite).parquet(stagePath(name))
      val written = spark.read.parquet(stagePath(name))
      // lineage first, tag last: a tag implies table + metrics both durable
      appendMetrics(name, written, fp, config)
      writeTag(name, tag)
      executed.computed += name
      written
    }
  }

  def metrics: DataFrame = spark.read.parquet(metricsPath)

  /** A scalar input-row count cached in the `_metrics` lineage, keyed by
    * the input fingerprint (stage = `name`, partition_id = -1). The input
    * frame is the one frame with no committed stage table behind it — on a
    * fully-resumed run, re-counting it would re-execute the whole input
    * subtree (a synth-corpus or projection pass) just for a metadata
    * number. Compute once per fingerprint, read back ever after. The count
    * is a function of the input identity alone, so the lookup ignores
    * `config` (recorded for lineage only).
    */
  def cachedInputCount(name: String, fp: String, config: String)
                      (compute: => Long): Long = {
    val existing =
      try spark.read.parquet(metricsPath)
        .filter(col("stage") === name && col("input_fingerprint") === fp)
        .orderBy(col("ts_ns").desc)
        .select("rows").head(1).headOption.map(_.getLong(0))
      catch { case _: org.apache.spark.sql.AnalysisException => None } // no metrics yet
    existing.getOrElse {
      val n = compute
      val ts = System.nanoTime()
      import spark.implicits._
      Seq((name, -1, n, fp, config, ts))
        .toDF("stage", "partition_id", "rows", "input_fingerprint", "config", "ts_ns")
        .write.mode(SaveMode.Append).parquet(metricsPath)
      n
    }
  }

  /** Drop a scratch directory under the workDir (per-iteration label tables
    * etc. whose durable copy lives in a committed stage).
    */
  def deleteScratch(name: String): Unit = {
    fs.delete(new org.apache.hadoop.fs.Path(s"$workDir/$name"), true)
    ()
  }
}

object StageStore {

  /** Input fingerprint for resume (shared by every resumable pipeline).
    * Two levels:
    *
    *   - METADATA (default, file-backed inputs): crc over the sorted
    *     (path, length, mtime) of the input files — the Iceberg
    *     snapshot-id analog — PLUS a crc of the canonicalized analyzed
    *     plan (two reads of the SAME files projecting different source
    *     columns are different inputs; file stats alone cannot see that).
    *     Driver-side file stats only; at 100 TB this costs a directory
    *     listing, NOT a full data pass per run.
    *   - CONTENT (`forceContent = true`, and the automatic fallback for
    *     non-file inputs like the synthetic corpus): row count + sum of a
    *     32-bit hash over the ENTIRE row serialized as JSON (field names
    *     included). Order-insensitive, one full pass. Hashing only a
    *     content column here would be the same bug the plan-crc exists
    *     for on the metadata path: a rerun with re-assigned ids (e.g. a
    *     different --offset) or a changed projection would present
    *     identical texts and silently resume stage tables keyed by the
    *     OLD ids — fatal when downstream stages (splits, shards) are pure
    *     functions of the id.
    */
  def fingerprint(spark: SparkSession, docs: DataFrame,
                  forceContent: Boolean = false): String = {
    val files = docs.inputFiles
    if (files.nonEmpty && !forceContent) {
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
        .agg(count(lit(1)).as("n"),
          sum(crc32(to_json(struct(docs.columns.map(col): _*)))).as("h"))
        .head()
      s"n=${row.getLong(0)};h=${row.get(1)}"
    }
  }
}
