package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates Bench's exact conditions for the ANN headline queries only
  * (local[32], shuffle.partitions=32, one untimed warm pass at sf0.001,
  * min-of-3 at SPARK_GRAFT_SF_DIR) — fast feedback for lshTopK tuning
  * without paying the full Bench scaling protocol.
  */
object AnnBenchProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator
      .setRootLevel(org.apache.logging.log4j.Level.ERROR)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("ANN_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          println(f"[stage] id=${sc.stageInfo.stageId}%3d tasks=${sc.stageInfo.numTasks}%3d " +
            f"in=${m.inputMetrics.recordsRead}%9d shout=${m.shuffleWriteMetrics.recordsWritten}%9d " +
            f"cpu=${m.executorCpuTime / 1e9}%6.2fs wall=${(sc.stageInfo.completionTime.getOrElse(0L) - sc.stageInfo.submissionTime.getOrElse(0L)) / 1000.0}%6.2fs " +
            sc.stageInfo.name.takeWhile(_ != '\n').take(50))
        }
      })
    val names =
      if (args.nonEmpty) args.toSeq else Seq("q_ann_topk", "q_ann_lsh", "q_ann_ivf")
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
    }
    spark.catalog.clearCache()
    names.foreach { n =>
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      println(f"$n%-12s min=${secs.min}%.2f s runs=${secs.map(s => f"$s%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
