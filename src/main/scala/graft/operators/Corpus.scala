package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-management operators a training-data pipeline needs after dedup:
  * deterministic dataset splitting and token-budget sharding. Both are
  * pure Column / two-pass algebra — no rand(), no driver loops, no global
  * window — so they hold at 10^12 documents.
  */
object Corpus {

  /** Modulus / multiplier of the split hash: a Knuth-style multiplicative
    * mix computed as modular arithmetic so it NEVER overflows a signed
    * 64-bit value under ANSI mode — ((id mod M) * (A mod M)) mod M stays
    * under 2^63 for M ~ 1e9 — and is expressible identically in any SQL
    * dialect (the DuckDB oracle replays it digit-for-digit).
    */
  val SplitModulus = 1000000007L
  val SplitMultiplier = 2654435761L % SplitModulus // Knuth's 2^32/phi

  /** The (0..9999) stratification bucket of a doc id: deterministic,
    * uniform-ish under the multiplicative mix, and stable across runs,
    * partitionings and cluster sizes — reproducible dataset membership is
    * a data-lineage requirement, which is why this is NOT rand(seed)
    * (rand is per-partition-seeded: membership would change with the
    * input's partition layout).
    */
  /** The full-resolution (0..SplitModulus-1) deterministic mix behind
    * [[splitBucket]] — also the sampling priority of [[quotaSample]],
    * where 10000 buckets would tie too often to rank within a group.
    */
  def mixHash(id: Column, seed: Long): Column =
    pmod((pmod(id, lit(SplitModulus)) + lit(seed % SplitModulus)) * lit(SplitMultiplier),
      lit(SplitModulus))

  def splitBucket(id: Column, seed: Long): Column =
    mixHash(id, seed) % lit(10000L)

  /** Deterministic train/validation/test (… any number of ways) split:
    * `weights` maps split name -> nonnegative weight; each doc gets the
    * split whose cumulative weight interval contains its bucket. Returns
    * docs + a `split` column. One narrow projection — no shuffle, no rand.
    */
  def split(docs: DataFrame, weights: Seq[(String, Double)], seed: Long = 13L,
            idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) && weights.map(_._2).sum > 0,
      s"weights must be nonnegative and sum > 0: $weights")
    require(seed >= 0, s"seed must be nonnegative (SQL % is sign-following): $seed")
    val total = weights.map(_._2).sum
    // integer bucket thresholds (cumulative, scaled to 10000); the LAST
    // split absorbs the rounding remainder so every bucket lands somewhere
    val cuts = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * 10000)
    }.tail.dropRight(1) :+ 10000L
    // a positive weight must own at least one bucket at the 1/10000
    // resolution — a silently empty split is a data-lineage landmine
    // compare in BUCKET space (0..9999): cumulative round-half-up can push
    // a cut past 10000, where cut-space comparison would pass for an
    // interval that contains no reachable bucket
    weights.zipWithIndex.foreach { case ((name, w), i) =>
      val lo = math.min(if (i == 0) 0L else cuts(i - 1), 10000L)
      val hi = math.min(cuts(i), 10000L)
      require(w == 0 || hi > lo,
        s"split '$name' (weight $w of $total) rounds to an empty interval at " +
          "1/10000 bucket resolution — raise the weight or merge splits")
    }
    val bucket = splitBucket(col(idCol).cast("long"), seed)
    // innermost arm is unreachable for any valid bucket (< 10000 always
    // matches the last cut) — it fires exactly when the id is NULL (or not
    // castable to long): membership must FAIL loudly, never silently
    // default into the last (usually held-out) split
    val expr = weights.map(_._1).zip(cuts).reverse
      .foldLeft(raise_error(
          lit(s"Corpus.split: null or non-integral $idCol — reproducible " +
            "membership requires a concrete id")): Column) { case (acc, (name, cut)) =>
        when(bucket < lit(cut), lit(name)).otherwise(acc)
      }
    docs.withColumn("split", expr)
  }

  /** Deterministic per-group quota sample — corpus balancing: keep at most
    * `cap` docs per `groupCol` value (language, domain, source…), chosen by
    * ascending [[mixHash]] priority (tie → min id). Like [[split]] this is
    * NOT rand(): membership is a pure function of (id, seed), so it is
    * stable across runs, partition layouts and cluster sizes, and the
    * DuckDB oracle replays the integer mix digit-for-digit.
    *
    * Scale shape: one hash-partitioned sort per group (the canonical
    * distributed top-N; row_number over a PARTITIONED window — not the
    * single-task global window the sharp-edge note bans). A pathologically
    * hot group sorts more data on one key but spills, never OOMs; the
    * output is exact, not approximate. NULL group values form their own
    * group; a NULL id fails loudly (same data-lineage rationale as
    * [[split]] — silent membership of an id-less doc is a landmine).
    */
  def quotaSample(docs: DataFrame, groupCol: String, cap: Int, seed: Long = 13L,
                  idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    require(seed >= 0, s"seed must be nonnegative (SQL % is sign-following): $seed")
    val id = col(idCol).cast("long")
    val prio = when(id.isNull,
        raise_error(lit(s"Corpus.quotaSample: null or non-integral $idCol — " +
          "reproducible membership requires a concrete id")))
      .otherwise(mixHash(id, seed))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(prio.asc, col(idCol).asc)
    docs
      .withColumn("_qs_rank", row_number().over(w))
      .filter(col("_qs_rank") <= lit(cap))
      .drop("_qs_rank")
  }

  /** Per-group corpus profile — the data-card numbers a production run
    * publishes next to a release (and the first sanity read after a 100 TB
    * ingest): doc count, whitespace-token totals and extremes, code-point
    * char total, and the exact distinct-content count per group
    * (lang × source by default).
    *
    * Scale shape: one map-side-combinable groupBy on the group key; the
    * distinct-content count rides Spark's two-phase count(DISTINCT) over
    * the 256-bit digest — the shuffle carries one row per (group, digest),
    * never text. All measures are integer/exact (no approx sketches), so
    * the whole table replays in DuckDB (q_corpus_profile).
    */
  def profile(docs: DataFrame, groupCols: Seq[String] = Seq("lang", "source"),
              textCol: String = "text"): DataFrame = {
    require(groupCols.nonEmpty, "profile needs at least one group column")
    val t = coalesce(col(textCol).cast("string"), lit(""))
    val gs = groupCols.map(col)
    docs
      .select(gs :+
        graft.functions.TextAnalysis.tokenCountWs(t).cast("long").as("_tk") :+
        length(t).cast("long").as("_ch") :+
        sha2(t, 256).as("_dg"): _*)
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_tk").as("total_tokens"),
        min("_tk").as("min_tokens"),
        max("_tk").as("max_tokens"),
        sum("_ch").as("total_chars"),
        countDistinct(col("_dg")).as("n_distinct_texts"))
  }

  /** Token-budget sharding: assign each doc (in ascending `idCol` order) to
    * the shard whose running token total its FIRST token falls into —
    * shard_id = floor(exclusive-prefix-sum(n_tokens) / tokensPerShard).
    * Packing a corpus into ~equal-token shards is how training data is
    * materialized for tokenizer/loader pipelines.
    *
    * Scale shape: a naive `sum(...) over (order by id)` window has an
    * EMPTY partition spec — Spark executes it as a single task holding the
    * whole corpus (and warns so). This is instead the classic distributed
    * two-pass prefix sum: range-partition by id, per-partition running sum
    * (narrow), plus a broadcast vector of per-partition offsets (one tiny
    * aggregate — #partitions rows — is the only thing collected). Output
    * is invariant to the partition count: boundaries shift, the global
    * cumulative sum does not.
    *
    * @return (idCol, n_tokens, shard_id)
    */
  def tokenShards(docs: DataFrame, tokensPerShard: Long,
                  idCol: String = "doc_id", tokensCol: String = "n_tokens"): DataFrame = {
    require(tokensPerShard > 0, s"tokensPerShard must be positive: $tokensPerShard")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = docs
      .select(col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("n"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .select(col("id"), col("n"), spark_partition_id().as("pid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-partition totals -> exclusive per-partition offsets
      // (bounded collect: one row per partition; range partitions are
      // ordered by id, so ascending pid IS ascending id range)
      val totals = parts.groupBy("pid").agg(sum("n").as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val maxPid = if (totals.isEmpty) -1 else totals.keys.max
      val offsets = new Array[Long](maxPid + 2)
      var pid = 0
      while (pid <= maxPid) {
        offsets(pid + 1) = offsets(pid) + totals.getOrElse(pid, 0L)
        pid += 1
      }
      // pass 2: narrow per-partition running sum + the partition's offset
      val out = parts
        .as[(Long, Long, Int)]
        .mapPartitions { it =>
          var cum = 0L
          var init = false // explicit flag: a negative running value must
                           // NOT re-trigger initialization mid-partition
          it.map { case (id, n, p) =>
            if (!init) { cum = offsets(p); init = true }
            require(n >= 0, s"tokenShards: negative token count $n for id $id " +
              "— prefix-sum sharding is undefined on negative sizes")
            val start = cum
            cum += n
            (id, n, start / tokensPerShard)
          }
        }
        .toDF("id", "n", "shard_id")
        .select(col("id").as(idCol), col("n").as(tokensCol), col("shard_id"))
      // materialize into the cache BEFORE releasing the input: a later
      // recompute could resample the range boundaries, invalidating the
      // captured per-partition offsets. Cache lifetime is CALLER-owned
      // (the repo-wide operator contract): unpersist the returned frame /
      // clearCache when done.
      out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      out
    } finally {
      parts.unpersist()
      ()
    }
  }
}
