package graft

import graft.streaming.StreamingStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("ingestRates: event-time windows aggregate; watermark drops late rows") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, String)]
    val rates = StreamingStats.ingestRates(
      ms.toDF.toDF("event_time", "lang", "text"), "1 minute", "1 minute")
    val q = rates.writeStream.format("memory").queryName("rates")
      .outputMode("append").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:30")

    ms.addData((ts(0), "en", "hello"), (ts(0), "en", "world!"), (ts(1), "de", "abc"))
    q.processAllAvailable()
    // advance the watermark past both windows so append mode finalizes them
    ms.addData((ts(10), "en", "later"))
    q.processAllAvailable()
    val out1 = spark.table("rates").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out1.contains(("2026-01-01 10:00:00.0", "en", 2L, 11L)), out1.mkString(","))
    assert(out1.contains(("2026-01-01 10:01:00.0", "de", 1L, 3L)), out1.mkString(","))

    // a row for the finalized 10:00 window is LATE (watermark ~10:09) and
    // must be dropped by the watermark, not re-emitted or merged
    ms.addData((ts(0), "en", "too late to count"))
    ms.addData((ts(20), "en", "flush"))
    q.processAllAvailable()
    val rows1000 = spark.table("rates").collect()
      .filter(_.getTimestamp(0).toString == "2026-01-01 10:00:00.0")
    assert(rows1000.length == 1 && rows1000.head.getLong(3) == 2L, rows1000.mkString(","))
    q.stop()
  }

  test("fingerprintDedup: formatting-variant duplicates flagged across batches with the original id") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingStats.fingerprintDedup(ms.toDS())
      .writeStream.format("memory").queryName("fpdedup").outputMode("append").start()

    ms.addData((1L, "the quick brown fox"), (2L, "unrelated text here"))
    q.processAllAvailable()
    // batch 2: doc 3 is a formatting-variant dup of doc 1 (case/punct/ws
    // differ; token stream identical) — state must survive the batch gap
    ms.addData((3L, "THE  Quick,, BROWN fox!!"), (4L, "brand new content"))
    q.processAllAvailable()

    val out = spark.table("fpdedup").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(out(1L) == ((false, 1L)), out.toString)
    assert(out(2L) == ((false, 2L)), out.toString)
    assert(out(3L) == ((true, 1L)), out.toString)
    assert(out(4L) == ((false, 4L)), out.toString)
    q.stop()
  }

  test("fingerprintDedup under the RocksDB state store provider (the 10^12-scale conf)") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (key, provider) = StreamingStats.RocksDBProviderConf
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, provider)
    try {
      val ms = MemoryStream[(Long, String)]
      val q = StreamingStats.fingerprintDedup(ms.toDS())
        .writeStream.format("memory").queryName("fpdedup_rocks").outputMode("append").start()
      ms.addData((1L, "the quick brown fox"), (2L, "unrelated text here"))
      q.processAllAvailable()
      ms.addData((3L, "THE  Quick,, BROWN fox!!"))
      q.processAllAvailable()
      // cross-batch state survived under RocksDB: doc 3 dups doc 1
      val out = spark.table("fpdedup_rocks").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
      assert(out(3L) == ((true, 1L)), out.toString)
      // the query really ran on RocksDB (not a silently-ignored conf)
      val progress = q.recentProgress.flatMap(_.stateOperators).lastOption
      assert(progress.exists(_.customMetrics.containsKey("rocksdbFilesCopied")),
        progress.map(_.customMetrics.toString).getOrElse("no state operator progress"))
      q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
