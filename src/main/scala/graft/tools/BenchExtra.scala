package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-8 optimization probe (guide §1): per-query isolation for ANY
  * declared SparkEntry query under Bench's exact session conditions
  * (local[32], shuffle.partitions=32, pageSize 8m, AQE on, warm pass at
  * sf0.001, cache cleared between runs).
  *
  * For each query name given as an arg it
  *   - writes `.explain("formatted")` to plans/r08/<name>_$PLAN_TAG.txt
  *     (PLAN_TAG env, default "before") — the judge-facing plan evidence
  *   - times min-of-3 with Bench's count() action (graded-lane parity)
  *   - times min-of-3 with the noop sink (guide §1.4 — forces EVERY column,
  *     no count-time join elimination)
  *   - labels jobs via setJobDescription (guide §1.5) and prints the
  *     per-query job/stage totals from the status tracker.
  *
  * This main is measurement-only tooling: Bench.scala itself is frozen.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator
      .setRootLevel(org.apache.logging.log4j.Level.ERROR)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = sys.env.getOrElse("PLAN_TAG", "before")
    val dumpPlans = !sys.env.contains("NO_PLANS")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.buffer.pageSize", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_minhash_pairs", "q_minhash_clusters", "q_exact_dedup", "q_ngram_jaccard",
      "q_simhash_pairs", "q_ann_topk", "q_ann_lsh", "q_token_count", "q_quality",
      "q1_agg")
    // untimed JIT/codegen warm pass at the smallest SF (Bench protocol)
    names.foreach { n =>
      try { graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count(); () }
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    new java.io.File("plans/r08").mkdirs()
    names.foreach { n =>
      val st = spark.sparkContext.statusTracker
      spark.sparkContext.setJobGroup(n, n, interruptOnCancel = false)
      val jobsBefore = st.getJobIdsForGroup(n).toSet
      def run(action: org.apache.spark.sql.DataFrame => Unit): Seq[Double] =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          action(graft.SparkEntry.queries(n)(spark, sfDir))
          val s = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          s
        }
      val counts = run(df => { df.count(); () })
      if (dumpPlans) {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"plans/r08/${n}_$tag.txt"),
          txt.getBytes("UTF-8"))
        spark.catalog.clearCache()
      }
      val noops = run(df => df.write.format("noop").mode("overwrite").save())
      val jobs = st.getJobIdsForGroup(n).filterNot(jobsBefore)
      val stages = jobs.flatMap(id => st.getJobInfo(id).map(_.stageIds().length)).sum
      spark.sparkContext.clearJobGroup()
      println(f"$n%-22s count_min3=${counts.min}%6.2f noop_min3=${noops.min}%6.2f " +
        f"jobs=${jobs.length}%3d stages=$stages%4d " +
        f"count_runs=${counts.map(s => f"$s%.2f").mkString(",")} " +
        f"noop_runs=${noops.map(s => f"$s%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
