package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch microbenchmark: plain shuffle/groupBy cost in this sandbox. */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.buffer.pageSize", sys.env.getOrElse("PAGE", "64m"))
      .config("spark.memory.offHeap.enabled", sys.env.getOrElse("OFFHEAP", "false"))
      .config("spark.memory.offHeap.size", "24g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        println(f"[stage] id=${sc.stageInfo.stageId}%3d tasks=${sc.stageInfo.numTasks}%3d " +
          f"run=${m.executorRunTime / 1000.0}%7.1fs gc=${m.jvmGCTime / 1000.0}%6.1fs " +
          f"cpu=${m.executorCpuTime / 1e9}%7.1fs spillMem=${m.memoryBytesSpilled / 1e6}%8.1fMB " +
          f"spillDisk=${m.diskBytesSpilled / 1e6}%8.1fMB wall=${(sc.stageInfo.completionTime.getOrElse(0L) - sc.stageInfo.submissionTime.getOrElse(0L)) / 1000.0}%6.1fs " +
          sc.stageInfo.name.take(40))
      }
    })
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val df = spark.range(6400000L).select(
      (col("id") % 32).cast("int").as("k1"),
      (col("id") * 2654435761L % 5000000L).as("k2"),
      col("id").as("v")).persist()
    println("n=" + df.count())
    timed("pure repartition")(df.repartition(col("k2")).count())
    timed("pure repartition 2nd")(df.repartition(col("k2")).count())
    timed("mapPartitions noop")(df.select("v").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .mapPartitions(it => Iterator.single(it.size))(org.apache.spark.sql.Encoders.scalaInt).count())
    timed("groupBy hi-card")(df.groupBy("k1", "k2").agg(count(lit(1)), min("v")).count())
    timed("groupBy hi-card 2nd")(df.groupBy("k1", "k2").agg(count(lit(1)), min("v")).count())
    timed("groupBy lo-card")(df.groupBy("k1").count().count())
    val agg = df.groupBy("k1", "k2").agg(count(lit(1)).as("n"), min("v").as("hub"))
    timed("join back")(df.join(agg, Seq("k1", "k2")).count())
    spark.stop()
  }
}
