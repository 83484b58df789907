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
  }
}
