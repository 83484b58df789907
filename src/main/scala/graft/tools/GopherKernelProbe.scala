package graft.tools

import graft.functions.TextAnalysis
import graft.sources.CorpusGen
import org.apache.spark.sql.SparkSession

/** Isolated timing for the Gopher repetition kernels — the e2e CLI number
  * is dominated by JVM start + corpus gen + the other five stages and the
  * sandbox's load noise swamps a ±10 s delta, so the hashed-exchange claim
  * is measured here directly: the one-pass gate kernel
  * (ngramRepetitionFractions, dup family hashed) vs the two string-keyed
  * operators it replaces in the recipe, same docs, min-of-N each,
  * interleaved so slow-box minutes hit both arms alike.
  */
object GopherKernelProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator
      .setRootLevel(org.apache.logging.log4j.Level.ERROR)
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = CorpusGen.withDocIds(CorpusGen.sourceFiles(spark, n))
      .selectExpr("doc_id", "content as text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // corpus untimed

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val rows = f
      require(rows > 0); (System.nanoTime() - t0) / 1e9
    }
    def onePass(): Double = time(TextAnalysis.ngramRepetitionFractions(docs).count())
    def separate(): Double = time(
      TextAnalysis.topNgramCharFractions(docs).count() +
        TextAnalysis.dupNgramCharFractions(docs).count())
    // warm both shapes once (codegen/JIT), then interleave measured reps
    onePass(); separate()
    val pairs = (1 to reps).map(_ => (onePass(), separate()))
    val one = pairs.map(_._1).min
    val sep = pairs.map(_._2).min
    println(f"docs=$n one_pass_hashed=$one%.2fs separate_string_ops=$sep%.2fs " +
      f"ratio=${one / sep}%.2f  (runs: ${pairs.map(p => f"${p._1}%.1f/${p._2}%.1f").mkString(", ")})")
    spark.stop()
  }
}
