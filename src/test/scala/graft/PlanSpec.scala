package graft

import graft.core.MinHashConfig
import graft.operators.MinHashPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan assertions: the plans we ship are the plans we designed.
  * Catches regressions like a filter that stops reaching the parquet scan,
  * a broadcast that silently becomes a shuffle join, or an extra exchange
  * sneaking into the signature (narrow) stage.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("filter + projection push down to the parquet scan") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "en")
      .select("doc_id", "n_chars")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), plan)
    // pruned read schema: only the referenced columns, never `text`
    assert(plan.contains("doc_id") && plan.contains("n_chars"))
    assert(!plan.split("ReadSchema")(1).split("\n")(0).contains("text"), plan)
  }

  test("signature stage is narrow: no exchange between scan and kernel") {
    val cfg = MinHashConfig(3, 32, 4, 13, 0.0)
    // already-parallel input (the production case: many files/partitions):
    // the kernel must stay exchange-free
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("content"))
      .repartition(spark.sparkContext.defaultParallelism)
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF()
    val planStr = sigs.queryExecution.executedPlan.toString
    // exactly the one explicit repartition above — Spread must not add more
    assert(planStr.split("Exchange ").length - 1 == 1, planStr)
  }

  test("signature stage spreads a single-partition source before the kernel") {
    // a one-file input would otherwise serialize the CPU-heavy kernel on a
    // single task (measured: the dominant bench cost at small SFs) — Spread
    // round-robins it to default parallelism
    val cfg = MinHashConfig(3, 32, 4, 13, 0.0)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("content"))
    assert(docs.rdd.getNumPartitions == 1) // precondition: tiny single file
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF()
    val planStr = sigs.queryExecution.executedPlan.toString
    assert(planStr.contains("Exchange RoundRobinPartitioning"), planStr)
    assert(sigs.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("candidates stage has exactly the designed shuffles (repartition + distinct)") {
    val cfg = MinHashConfig(3, 32, 4, 13, 0.0)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("content"))
    // cache boundary isolates the candidate stage: the counted plan reads
    // the signatures from InMemoryRelation, so input-spreading exchanges
    // upstream of the kernel don't leak into this stage's count
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF().cache()
    try {
      sigs.count()
      val cands = MinHashPipeline.candidates(sigs, Some(256))
      // count only ABOVE the cache boundary: the InMemoryRelation printout
      // embeds its own (already-executed) build plan, whose exchanges are
      // not part of this stage
      val planStr = cands.queryExecution.executedPlan.toString
        .split("InMemoryRelation")(0)
      // one repartition(band keys) + the distinct's exchange = 2
      assert(planStr.split("Exchange ").length - 1 == 2, planStr)
    } finally { sigs.unpersist(); () }
  }

  test("candidate-stage shuffle width override lands in the exchange") {
    val cfg = MinHashConfig(3, 32, 4, 13, 0.0)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("content"))
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF().cache()
    try {
      sigs.count()
      // star-cap branch (full plan string is safe to scan: the cached
      // signatures subtree has only a RoundRobin exchange, no band keys)
      val p1 = MinHashPipeline.candidates(sigs, Some(256), candidatePartitions = Some(7))
        .queryExecution.executedPlan.toString
      assert("hashpartitioning\\(band_idx[^)]*, 7\\)".r.findFirstIn(p1).isDefined, p1)
      // parity (salted full-clique) branch: both its bucket shuffles take it
      val p2 = MinHashPipeline.candidates(sigs, None, candidatePartitions = Some(7))
        .queryExecution.executedPlan.toString
      assert("hashpartitioning\\(band_idx[^)]*, 7\\)".r.findAllIn(p2).size >= 2, p2)
    } finally { sigs.unpersist(); () }
  }

  test("small-dimension join broadcasts (orders x customer)") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment").count()
    assert(formatted(joined).contains("BroadcastHashJoin"), formatted(joined))
  }

  test("pair similarity uses the codegen'd agreement expr, no interpreted lambda") {
    val cfg = MinHashConfig(3, 32, 4, 13, 0.3)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("content"))
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF()
    val pairs = MinHashPipeline.pairs(MinHashPipeline.candidates(sigs), sigs, cfg)
    val planStr = pairs.queryExecution.optimizedPlan.toString
    assert(planStr.contains("graft_agree"), planStr)
    assert(!planStr.toLowerCase.contains("lambdafunction"), planStr)
  }

  test("quality/lang-id columns have no interpreted higher-order lambdas") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = graft.functions.TextAnalysis.withLangId(
      graft.functions.TextAnalysis.withQualityColumns(docs))
    val planStr = q.queryExecution.optimizedPlan.toString
    assert(!planStr.toLowerCase.contains("lambdafunction"), planStr)
    assert(planStr.contains("graft_vocab_count") && planStr.contains("graft_sum_lengths"), planStr)
    // and the projection stays inside whole-stage codegen (no fallback)
    val phys = formatted(q.select("doc_id", "stopword_ratio", "mean_token_len", "lang_pred"))
    assert(phys.contains("* Project"), phys)
  }

  test("repetition/quality operators: typed kernels, no interpreted lambdas") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(
      "top_ngram" -> graft.functions.TextAnalysis.topNgramCharFractions(docs),
      "dup_ngram" -> graft.functions.TextAnalysis.dupNgramCharFractions(docs),
      "gopher_quality" -> graft.functions.TextAnalysis.gopherQualitySignals(docs)
    ).foreach { case (name, q) =>
      val planStr = q.queryExecution.optimizedPlan.toString
      assert(!planStr.toLowerCase.contains("lambdafunction"), s"$name: $planStr")
    }
  }

  test("ANN rerank plans carry no Window sort (TopKAgg partial-agg shape)") {
    // a row_number().over(Window) rerank shuffles AND SORTS every scored
    // candidate row per query partition — all three ANN variants must
    // rerank through the map-side TopKAgg instead (lshTopK since r3,
    // ivfTopK r5, bruteForceTopK r6)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    Seq(
      "ivf" -> graft.operators.Similarity.ivfTopK(emb, k = 5, nCentroids = 8, nProbe = 4),
      "lsh" -> graft.operators.Similarity.lshTopK(emb, k = 5, dim = 64),
      "brute" -> graft.operators.Similarity.bruteForceTopK(
        emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 4), k = 5)
    ).foreach { case (name, q) =>
      val planStr = q.queryExecution.optimizedPlan.toString
      assert(!planStr.contains("Window"), s"$name rerank fell back to a Window: $planStr")
      assert(planStr.contains("TopKAgg"), s"$name: expected the TopKAgg rerank: $planStr")
    }
    spark.catalog.clearCache() // sketch/base persists from plan construction
  }

  test("self-joined kernel subtrees are cached: kernel appears once") {
    import org.apache.spark.sql.catalyst.plans.logical.SerializeFromObject
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val checks: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "ngram" -> graft.operators.Dedup.ngramJaccardPairs(docs, 3, 0.2, maxGramDocFreq = Some(1000)),
      "simhash" -> graft.operators.Dedup.simHashPairs(docs),
      "substring" -> graft.operators.Dedup.substringDupPairs(docs, 12),
      "ann_lsh" -> graft.operators.Similarity.lshTopK(
        spark.read.parquet(s"$sf/embeddings.parquet"), k = 5, dim = 64)
    )
    checks.foreach { case (name, df) =>
      // withCachedData = analyzed plan after cache substitution; the typed
      // SOURCE kernel (SerializeFromObject over the raw scan) must live only
      // INSIDE InMemoryRelation leaves, never inline (inline = recomputed
      // per self-join side). A SerializeFromObject whose subtree reads FROM
      // a cache is a post-cache emitter (substring-dup's streaming pair
      // emitters) — single-consumer by construction, allowed.
      val cached = df.queryExecution.withCachedData
      val inlineKernels = cached.collect {
        case s: SerializeFromObject
            if s.collectFirst { case r: InMemoryRelation => r }.isEmpty => s
      }
      val cacheScans = cached.collect { case r: InMemoryRelation => r }
      assert(inlineKernels.isEmpty, s"$name: un-cached kernel inlined ${inlineKernels.size}x")
      assert(cacheScans.nonEmpty, s"$name: expected cached kernel subtree")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("custom dot expression participates in whole-stage codegen") {
    // input must be a plain array<double> attribute: a higher-order
    // `transform` feeding it is itself CodegenFallback and would break WSCG
    // regardless of our expression (which is why pipeline stages materialize
    // vectors via typed maps first)
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v.map(_.toDouble)) }
      .toDF("id", "v")
    val df = e.filter(graft.functions.VectorExprs.dotD(col("v"), col("v")) > lit(0.6))
    val plan = formatted(df)
    // formatted mode marks codegen'd nodes with '*' and 'codegen id'
    assert(plan.contains("* Filter"), plan)
    assert(plan.contains("codegen id"), plan)
    assert(df.count() > 0)
  }

  test("Spread is the identity on exchange-bearing plans and probes without a job") {
    // Under AQE, probing partition count with .rdd on a plan that contains
    // an exchange MATERIALIZES the upstream shuffle stages (runs the map
    // jobs) at construction time, and the real query then runs them again.
    // Spread must therefore return exchange-bearing plans untouched and
    // never launch a job while deciding.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("content"))
    val shuffled = docs.groupBy("doc_id").agg(first(col("content")).as("content"))
    val target = spark.sparkContext.defaultParallelism
    val explicit = docs.repartition(target)
    spark.sparkContext.addSparkListener(listener)
    val (out, outExplicit) =
      try {
        val o = (graft.operators.Spread(shuffled), graft.operators.Spread(explicit))
        drainListenerBus() // a probe job's events would be on the bus by now
        o
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() == 0, s"Spread probe launched ${jobs.get()} job(s)")
    // an explicit caller repartition is never second-guessed (and never
    // probed)
    assert(outExplicit eq explicit)
    // a SMALL shuffle-bearing frame gets spread (AQE would coalesce its
    // output to 1-2 partitions and starve the downstream kernel) — decided
    // from the logical size estimate, without running the aggregate
    assert(out ne shuffled)
    assert(out.rdd.getNumPartitions == target)
  }

  /** Deterministic listener-bus drain (the bus is async): call the
    * private[spark] LiveListenerBus.waitUntilEmpty() via reflection, with
    * a sleep fallback if the internal API moves.
    */
  private def drainListenerBus(): Unit =
    try {
      val m = spark.sparkContext.getClass.getMethods.find(_.getName == "listenerBus").get
      val bus = m.invoke(spark.sparkContext)
      bus.getClass.getMethods
        .find(w => w.getName == "waitUntilEmpty" && w.getParameterCount == 0)
        .map(_.invoke(bus))
        .getOrElse(Thread.sleep(500))
      ()
    } catch { case _: Exception => Thread.sleep(500) }
}
