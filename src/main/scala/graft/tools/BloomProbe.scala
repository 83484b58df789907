package graft.tools

import graft.operators.Dedup
import graft.sources.CorpusGen
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measures the bloom-gated decontamination path against the exact
  * operator in the regime it exists for: a benchmark gram set too big to
  * broadcast as a join hash relation (forced here via
  * maxBroadcastGrams=0), where ngramContainment must shuffle EVERY corpus
  * gram and ngramContainmentBloom shuffles only bloom HITS.
  *
  * Gram size is 8 — the realistic decontamination shape (published
  * decontamination recipes overlap on 8-13 grams, where cross-corpus
  * collisions are rare). At n=3 over the synth generator's 37-keyword
  * soup nearly every keyword-only gram is hot on both sides, the join is
  * many-to-many explosive, and BOTH arms time pair emission rather than
  * gram pruning (measured: 5 s/arm at 100k docs, runaway at 500k).
  *
  * Evidence reported per arm: wall seconds AND total shuffle-write bytes
  * (SparkListener over stage task metrics) — bytes are the scale-faithful
  * currency: wall time on a 32-core box with an in-memory shuffle of a
  * few hundred MB can't show what a 1000-executor network exchange pays.
  * Arms are interleaved min-of-N; row equality is asserted every rep.
  *
  * Args: [nDocs=100000] [reps=3] — benchmark = disjoint-seed corpus of
  * nDocs/25 plus a planted contaminated slice; boilerplate clones dropped
  * on both sides (decontamination runs after boiler-strip in a real
  * recipe).
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator
      .setRootLevel(org.apache.logging.log4j.Level.ERROR)
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val docs = CorpusGen.withDocIds(CorpusGen.sourceFiles(spark, n))
      .selectExpr("doc_id", "content as text")
      .filter(!col("text").startsWith("Licensed under the Apache"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // corpus untimed
    // prime stride (a round one lands every pick on a 50-file repo
    // boundary = a license doc) + unique-body filter: the plant must be
    // real contaminated CONTENT, not boilerplate or sub-gram tiny docs
    val bench = CorpusGen.withDocIds(CorpusGen.sourceFiles(spark, n / 25, seed = 777L))
      .selectExpr("doc_id", "content as text")
      .filter(!col("text").startsWith("Licensed under the Apache"))
      .union(docs.filter(col("doc_id") % 997 === 0 && col("text").startsWith("module m"))
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    require(bench.filter(col("doc_id") >= 10000000L).count() > 0, "empty planted slice")

    def run(f: => org.apache.spark.sql.DataFrame): (Double, Long, Long, Long) = {
      Thread.sleep(1000) // drain async listener events from the previous arm
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val out = f
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // cheap order-invariant content check: sums over the id columns
      val sums = out.agg(
        org.apache.spark.sql.functions.sum("doc_id"),
        org.apache.spark.sql.functions.sum("bench_id")).head()
      Thread.sleep(1000)
      val bytes = shuffleBytes.get() - b0
      spark.catalog.clearCache()
      docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      bench.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bench.count()
      (sec, rows, sums.getLong(0) + sums.getLong(1), bytes)
    }
    var exactT = List.empty[Double]
    var bloomT = List.empty[Double]
    var i = 0
    while (i < reps) {
      val (te, re, se, be) = run(Dedup.ngramContainment(
        docs, bench, n = 8, minContainment = 0.5, maxBroadcastGrams = 0L))
      val (tb, rb, sb, bb) = run(Dedup.ngramContainmentBloom(
        docs, bench, n = 8, minContainment = 0.5))
      require(re == rb && se == sb, s"parity broke: exact=($re,$se) bloom=($rb,$sb)")
      exactT ::= te; bloomT ::= tb
      println(f"rep $i: exact_shuffle=$te%.2f s (${be / 1048576.0}%.1f MiB shuffled)  " +
        f"bloom=$tb%.2f s (${bb / 1048576.0}%.1f MiB shuffled)  rows=$re")
      i += 1
    }
    println(f"min-of-$reps: exact_shuffle=${exactT.min}%.2f s  bloom=${bloomT.min}%.2f s  " +
      f"ratio=${exactT.min / bloomT.min}%.2f")
    spark.stop()
  }
}
