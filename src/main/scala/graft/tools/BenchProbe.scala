package graft.tools

import graft.core.MinHashConfig
import graft.operators.{ConnectedComponents, MinHashPipeline}
import graft.sources.CorpusGen
import graft.operators.ConnectedComponents
import org.apache.spark.sql.SparkSession

/** Scratch profiler: per-stage wall time of the dedup job at a given core
  * count. Usage: runMain graft.tools.BenchProbe <cores> <nFiles>
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.buffer.pageSize", "8m")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIR", "/tmp"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        println(f"[stage] id=${sc.stageInfo.stageId}%3d tasks=${sc.stageInfo.numTasks}%3d " +
          f"run=${m.executorRunTime / 1000.0}%7.1fs gc=${m.jvmGCTime / 1000.0}%6.1fs " +
          f"cpu=${m.executorCpuTime / 1e9}%7.1fs wall=${(sc.stageInfo.completionTime.getOrElse(0L) - sc.stageInfo.submissionTime.getOrElse(0L)) / 1000.0}%6.1fs")
      }
    })
    val cfg = MinHashConfig(3, 200, 4, 13, 0.8)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // JIT warm at small scale
    {
      val wdocs = CorpusGen.sourceFilesWithIds(spark, 50000).select("doc_id", "content")
      val wsigs = MinHashPipeline.signatures(wdocs, cfg).toDF().persist()
      val wp = MinHashPipeline.pairs(MinHashPipeline.candidates(wsigs, Some(256)), wsigs, cfg).persist()
      ConnectedComponents.cluster(wp, wdocs.select("doc_id")).count()
      wsigs.unpersist(); wp.unpersist()
    }
    val docs = timed("scan") {
      val path = s"/tmp/graft_bench_corpus_$n"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        CorpusGen.sourceFilesWithIds(spark, n).select("doc_id", "content")
          .repartition(64).write.mode("overwrite").parquet(path)
      }
      val d = spark.read.parquet(path).persist()
      d.count(); d
    }
    val sigs = timed("signatures") {
      val mode = sys.env.getOrElse("SIGMODE", "persist")
      if (mode == "parquet") {
        MinHashPipeline.signatures(docs, cfg).toDF().write.mode("overwrite").parquet("/tmp/probe_sigs")
        spark.read.parquet("/tmp/probe_sigs")
      } else if (mode == "disk") {
        val s = MinHashPipeline.signatures(docs, cfg).toDF().persist(org.apache.spark.storage.StorageLevel.DISK_ONLY); s.count(); s
      } else {
        val s = MinHashPipeline.signatures(docs, cfg).toDF().persist(); s.count(); s
      }
    }
    (1 to 3).foreach { i =>
      timed(s"cand-$i")(println("n=" + MinHashPipeline.candidates(sigs, Some(256)).count()))
    }
    val cands = timed("candidates") {
      val c = MinHashPipeline.candidates(sigs, Some(256)).persist(); c.count(); c
    }
    val pairs = timed("pairs") {
      val p = MinHashPipeline.pairs(cands, sigs, cfg).persist(); p.count(); p
    }
    timed("cluster") {
      ConnectedComponents.cluster(pairs, docs.select("doc_id")).count()
    }
    spark.stop()
  }
}
