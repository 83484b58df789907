package graft.tools

import graft.operators.Multimodal
import graft.sources.CorpusGen
import org.apache.spark.sql.SparkSession

/** Throughput of the three perceptual fingerprint kernels (image aHash,
  * audio Goertzel, video key-frame) plus the pair join, on synthesized
  * assets — the per-modality cost datum for sizing a real ingest: the
  * kernels are narrow (payload never leaves the executor), so these
  * numbers scale linearly with executors.
  *
  * Args: [nDocs=30000] — assets split ~evenly across modalities by id%3.
  */
object MmHashProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator
      .setRootLevel(org.apache.logging.log4j.Level.ERROR)
    val n = args.headOption.map(_.toLong).getOrElse(30000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val assets = Multimodal.synthesizeAssets(
        CorpusGen.withDocIds(CorpusGen.sourceFiles(spark, n))
          .selectExpr("doc_id", "content as text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAssets = assets.count() // synthesis untimed

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s $rows%8d rows  $sec%7.2f s  ${rows / sec}%9.0f rows/s")
      spark.catalog.clearCache()
      assets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      assets.count()
    }
    println(s"assets: $nAssets over ${n} docs")
    time("image_hash") { Multimodal.imageHashes(assets).toDF().count() }
    time("audio_hash") { Multimodal.audioHashes(assets).toDF().count() }
    time("video_hash") { Multimodal.videoHashes(assets).toDF().count() }
    time("image_pairs") { Multimodal.imageNearDupPairs(assets, maxHamming = 3).count() }
    spark.stop()
  }
}
