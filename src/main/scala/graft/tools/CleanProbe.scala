package graft.tools

import graft.functions.TextAnalysis
import graft.operators.Dedup
import graft.sources.CorpusGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: which CleanPipeline stage dominates, isolated —
  * strip / redact / quality / sha2 — each as a count over the same synth
  * corpus. Informs the pipeline's stage-cost documentation.
  */
object CleanProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val docs = CorpusGen.sourceFilesWithIds(spark, n)
      .select(col("doc_id"), col("content").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("materialize corpus")(docs.count())

    timed("baseline scan (length sum)")(
      docs.agg(sum(length(col("text")))).collect())
    val stripped = timed("stripBoilerplateLines")(
      Dedup.stripBoilerplateLines(docs, 1000L))
    timed("redactPii over stripped")(
      stripped.select(TextAnalysis.redactPii(col("clean_text")).as("t"))
        .agg(sum(length(col("t")))).collect())
    timed("quality cols over stripped")(
      TextAnalysis.withQualityColumns(
          stripped.select(col("doc_id"), col("clean_text").as("text")))
        .filter(col("n_tokens") >= 5 && col("punct_ratio") <= 0.5)
        .count())
    timed("redact+quality (fused)")(
      TextAnalysis.withQualityColumns(
          stripped.select(col("doc_id"),
            TextAnalysis.redactPii(col("clean_text")).as("text")))
        .filter(col("n_tokens") >= 5 && col("punct_ratio") <= 0.5)
        .count())
    timed("sha2 groupBy over stripped")(
      stripped.groupBy(sha2(col("clean_text"), 256)).count().count())
    spark.stop()
  }
}
