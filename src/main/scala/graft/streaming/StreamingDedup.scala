package graft.streaming

import graft.core.MinHashConfig
import graft.operators.MinHashPipeline
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming ingest + incremental near-dup detection.
  *
  * The batch pipeline answers "find all dup pairs in a corpus"; a training
  * -data lakehouse also needs the incremental question: as new files land,
  * which of them duplicate something already ingested? This runs as a
  * Structured Streaming job:
  *
  *   readStream(parquet dir of (doc_id, content))
  *     -> foreachBatch:
  *          1. fused signature kernel over the micro-batch (narrow)
  *          2. append batch signatures to the signatures table
  *          3. LSH bucket join of the BATCH's bands against the
  *             accumulated signatures table -> new dup pairs
  *          4. similarity >= threshold -> append to the pairs table
  *
  * Exactly-once bookkeeping comes from the streaming checkpoint (source
  * offsets) — on restart, already-processed input files are not re-signed.
  * The join in step 3 only shuffles the micro-batch's bands plus the
  * matching buckets of the history table; history never re-shuffles fully
  * because the bucket join prunes on the batch's (band_idx, band_hash) set
  * (broadcast when the batch is small).
  */
object StreamingDedup {

  val inputSchema: StructType = new StructType()
    .add("doc_id", "long")
    .add("content", "string")

  /** Start the streaming dedup job. Tables live under `workDir`:
    * signatures/ (append-only), pairs/ (append-only). Returns the query;
    * callers drive it with processAllAvailable() (tests) or awaitTermination.
    */
  def start(spark: SparkSession, inputDir: String, workDir: String,
            cfg: MinHashConfig): StreamingQuery = {
    val sigPath = s"$workDir/signatures"
    val pairsPath = s"$workDir/pairs"

    val stream = spark.readStream
      .schema(inputSchema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inputDir)

    stream.writeStream
      .option("checkpointLocation", s"$workDir/_stream_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sigs = MinHashPipeline.signatures(batch, cfg).toDF().cache()
        try {
          // dedupe WITHIN the batch (full pipeline on the micro-batch)...
          val intraPairs = MinHashPipeline.pairs(
            MinHashPipeline.candidates(sigs, starCapBucketSize = Some(1024)), sigs, cfg)

          // ...and against history: batch bands join the accumulated table.
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(workDir), spark.sparkContext.hadoopConfiguration)
          val crossPairs =
            if (fs.exists(new org.apache.hadoop.fs.Path(s"$sigPath/_SUCCESS")) ||
              fs.globStatus(new org.apache.hadoop.fs.Path(s"$sigPath/*.parquet")) != null &&
                fs.globStatus(new org.apache.hadoop.fs.Path(s"$sigPath/*.parquet")).nonEmpty) {
              val history = spark.read.parquet(sigPath)
              val bBands = MinHashPipeline.bandBuckets(sigs)
              val hBands = MinHashPipeline.bandBuckets(history)
              val cands = hBands.alias("h")
                .join(broadcast(bBands.alias("b")),
                  col("h.band_idx") === col("b.band_idx") &&
                    col("h.band_hash") === col("b.band_hash") &&
                    col("h.doc_id") =!= col("b.doc_id"))
                .select(
                  least(col("h.doc_id"), col("b.doc_id")).as("doc1"),
                  greatest(col("h.doc_id"), col("b.doc_id")).as("doc2"))
                .distinct()
              val allSigs = history.union(sigs)
              MinHashPipeline.pairs(cands, allSigs, cfg)
            } else spark.emptyDataFrame
              .withColumn("doc1", lit(0L)).withColumn("doc2", lit(0L))
              .withColumn("similarity", lit(0.0)).limit(0)
              .select("doc1", "doc2", "similarity")

          intraPairs.union(crossPairs).distinct()
            .write.mode(SaveMode.Append).parquet(pairsPath)
          sigs.write.mode(SaveMode.Append).parquet(sigPath)
        } finally sigs.unpersist()
        ()
      }
      .start()
  }
}
