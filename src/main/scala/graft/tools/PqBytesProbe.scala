package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the PQ shuffle-byte claim: pqTopK's candidate join carries
  * m ints per NEIGHBOR row where ivfTopK ships the full dim-double
  * vector. Runs both at the same IVF config over a deterministic
  * synthetic embedding corpus and reports total shuffle write bytes +
  * wall per operator (SparkListener task metrics).
  * Usage: runMain graft.tools.PqBytesProbe [nVecs] [dim]
  */
object PqBytesProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val written = new java.util.concurrent.atomic.AtomicLong()
    val read = new java.util.concurrent.atomic.AtomicLong()
    val detail = sys.env.get("STAGE_DETAIL").contains("1")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        val r = sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        written.addAndGet(w)
        read.addAndGet(r)
        if (detail && (w > 1048576 || r > 1048576))
          println(f"[stage] id=${sc.stageInfo.stageId}%4d w=${w / 1048576.0}%8.1f r=${r / 1048576.0}%8.1f " +
            sc.stageInfo.name.take(60))
        ()
      }
    })

    // deterministic gaussian-ish embeddings (seeded per id in the task)
    val emb = spark.range(n)
      .as[Long]
      .mapPartitions(_.map { id =>
        val rng = new java.util.Random(id * 6364136223846793005L + 1442695040888963407L)
        (id, Array.fill(dim)(rng.nextGaussian().toFloat))
      })
      .toDF("vec_id", "embedding")
      .repartition(64)
      .persist()
    println(s"[probe] corpus n=${emb.count()} dim=$dim")

    def measure(name: String)(f: => Long): Unit = {
      // NO clearCache: the operators' internal vecBase caches share one
      // logical plan, so every path reuses the same materialized corpus
      // cache (warmed below) and the listener counts only the operator's
      // OWN exchanges, not cache-rebuild scan traffic
      Thread.sleep(2000) // settle listener events from the previous run
      written.set(0L); read.set(0L)
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      println(f"[probe] $name%-8s rows=$rows%10d wall=$sec%7.2f s " +
        f"shufWrite=${written.get() / 1048576.0}%9.1f MiB shufRead=${read.get() / 1048576.0}%9.1f MiB")
    }

    val (c, p) = (64, 4)
    // warm JIT/codegen at tiny scale, then warm the SHARED full-size
    // corpus base cache (one materialization serves every measured path)
    Similarity.ivfTopK(emb.limit(500), k = 5, nCentroids = 8, nProbe = 2).count()
    Similarity.pqTopK(emb.limit(500), k = 5, nCentroids = 8, nProbe = 2).count()
    spark.catalog.clearCache()
    Similarity.ivfTopK(emb, k = 5, nCentroids = c, nProbe = p).count()

    measure("ivf")(Similarity.ivfTopK(emb, k = 5, nCentroids = c, nProbe = p).count())
    measure("pq")(Similarity.pqTopK(emb, k = 5, nCentroids = c, nProbe = p).count())

    // SERVING regime: a 1k query batch over the same index — PQ's home
    // turf (the shortlist join-back is tiny; the corpus-side exchange
    // carries codes instead of vectors)
    val q = emb.filter(col("vec_id") < 1000).persist()
    println(s"[probe] query batch = ${q.count()}")
    measure("ivf-srv")(Similarity.ivfTopK(emb, k = 5, nCentroids = c, nProbe = p,
      queries = Some(q)).count())
    measure("pq-srv")(Similarity.pqTopK(emb, k = 5, nCentroids = c, nProbe = p,
      queries = Some(q)).count())
    spark.stop()
  }
}
