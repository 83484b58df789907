package graft.tools

import graft.core.MinHashConfig
import graft.operators.MinHashPipeline
import graft.sources.CorpusGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the candidates stage internals. */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val cap = 256
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.buffer.pageSize", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = MinHashConfig(3, 128, 4, 13, 0.8)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = CorpusGen.sourceFilesWithIds(spark, n).select("doc_id", "content")
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF().persist()
    println("[probe] sigs " + sigs.count())
    val buckets = sigs.select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash"))).persist()
    timed("buckets")(println("[probe] n=" + buckets.count()))
    val stats = buckets.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bucket_n"), min("doc_id").as("hub")).persist()
    timed("stats")(println("[probe] n=" + stats.count()))
    val tagged = buckets.join(stats, Seq("band_idx", "band_hash")).persist()
    timed("tagged")(println("[probe] n=" + tagged.count()))
    val small = tagged.filter(col("bucket_n") <= cap)
    val a = small.alias("a"); val b = small.alias("b")
    val clique = a.join(b,
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2")).persist()
    timed("clique")(println("[probe] n=" + clique.count()))
    val star = tagged.filter(col("bucket_n") > cap && col("doc_id") =!= col("hub"))
      .select(col("hub").as("doc1"), col("doc_id").as("doc2")).persist()
    timed("star")(println("[probe] n=" + star.count()))
    timed("distinct")(println("[probe] n=" + clique.union(star).distinct().count()))
    spark.stop()
  }
}
