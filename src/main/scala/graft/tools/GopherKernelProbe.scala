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
    // force the VALUES, not count(): a count() over the string ops' tail
    // (left join against a distinct-keyed groupBy + pivot) lets Catalyst
    // eliminate the entire gram pipeline, timing a no-op
    def forceAll(df: org.apache.spark.sql.DataFrame): Long = {
      val vals = df.columns.drop(1).map(c => org.apache.spark.sql.functions.sum(c))
      df.agg(vals.head, vals.tail: _*).collect()
      df.count()
    }
    def onePass(): Double = time(forceAll(TextAnalysis.ngramRepetitionFractions(docs)))
    def separate(): Double = time(
      forceAll(TextAnalysis.topNgramCharFractions(docs)) +
        forceAll(TextAnalysis.dupNgramCharFractions(docs)))
    if (args.lift(2).contains("micro")) {
      // single-thread GramTally on the driver: isolates the doc-local
      // kernel's own cost from Spark plumbing (encoders, scheduling)
      val texts = docs.limit(5000).collect().map(_.getString(1))
      val tokss = texts.map(t => graft.operators.Dedup.WsPattern.split(
        graft.functions.TextAnalysis.wsClassTrim(if (t == null) "" else t)))
      println(s"micro docs=${tokss.length} avg_toks=${tokss.map(_.length).sum / tokss.length}")
      println("plan: " + TextAnalysis.ngramRepetitionFractions(docs)
        .queryExecution.executedPlan.toString.replace("\n", "\nplan: "))
      (1 to reps + 1).foreach { r =>
        val t0 = System.nanoTime()
        var acc = 0L
        tokss.foreach(ts => if (ts.length >= 2) acc += graft.core.GramTally.coveredMasses(ts)(0))
        println(f"micro rep=$r sec=${(System.nanoTime() - t0) / 1e9}%.3f acc=$acc")
      }
      spark.stop(); return
    }
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
