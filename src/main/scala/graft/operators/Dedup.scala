package graft.operators

import graft.core.{Murmur2, Tokenizer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The deduplication operator family a training-data pipeline needs, beyond
  * the flagship MinHash/LSH pipeline (MinHashPipeline):
  *
  *   - exact dedup (content-hash groupBy)
  *   - SimHash near-dup (64-bit, Hamming-banded candidate join)
  *   - n-gram Jaccard near-dup (explode + equi-join; SQL-expressible, so
  *     DuckDB-oracle-verifiable end to end)
  *
  * Embedding-cosine near-dup lives in Similarity (shared LSH machinery).
  * All shuffles are key-partitioned equi-joins/groupBys — no cross joins.
  *
  * CACHE LIFETIME CONTRACT (applies to simHashPairs, ngramJaccardPairs,
  * substringDupPairs, ngramContainment — same as MinHashPipeline.run): each
  * persists its kernel output because the lazy result frame consumes it
  * from several join sides; the operator cannot unpersist without
  * recomputing, so the CALLER owns the release — unpersist after the
  * terminal action, or spark.catalog.clearCache() between queries (Verify
  * and the specs do). A long-lived session calling these repeatedly without
  * clearing pins one kernel table per call.
  */
object Dedup {

  /** Precompiled whitespace splitter for the gram kernels (String.split
    * would recompile the regex once per document).
    */
  private[graft] val WsPattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  /** Exact duplicate groups by content hash. Single map-side-combinable
    * groupBy; at 100 TB this is the cheapest possible dedup pass
    * (shuffle carries 1 row per distinct text per partition, not the text —
    * we group on the 256-bit digest, never on the raw content).
    */
  def exactDupGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col(idCol)).as("rep_id")
      )

  /** Survivors of exact dedup: the min-id representative per distinct text.
    * Groups on the digest, not the text, so the shuffle key is 32 bytes
    * regardless of document size.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** The deduped corpus: keep exactly one representative document per
    * cluster — the end product a training-data pipeline actually feeds
    * downstream (pairs/clusters are diagnostics; this is the data).
    * Representative = the doc whose id IS the cluster_id (the component
    * min, so the choice is deterministic and join-free to identify).
    *
    * Scale shape: one broadcast-able-or-shuffled equi-join of the corpus
    * against the (doc_id == cluster_id) representative ids; no
    * per-cluster aggregation over document payloads.
    */
  def keepRepresentatives(docs: DataFrame, clusters: DataFrame,
                          idCol: String = "doc_id"): DataFrame = {
    val reps = clusters
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id").as(idCol))
    docs.join(reps, Seq(idCol), "left_semi")
  }

  /** Quality-aware cluster representatives: per-member labels with an
    * `is_rep` flag marking the HIGHEST-`score` member of each cluster
    * (ties → min doc_id), instead of [[keepRepresentatives]]' arbitrary
    * min-label root. This is what a production training-data pipeline
    * actually wants from near-dup collapse: keep the best copy (longest,
    * cleanest), not whichever copy got the smallest id.
    *
    * `clusters` is a (doc_id, cluster_id) labels table (ConnectedComponents
    * output); docs absent from it survive as their own singleton cluster.
    * NULL scores rank below every non-NULL score (an all-NULL cluster still
    * elects its min-id member via the null-safe `<=>` against a NULL max).
    *
    * Scale shape: the score Column — typically an expensive regex-heavy
    * quality derivation — is evaluated ONCE into a persisted frame (it is
    * consumed from three join sides; the self-join sharp edge otherwise
    * re-runs it per side). Everything downstream is cluster_id-keyed
    * equi-joins and aggs whose right sides are one-row-per-cluster; no
    * windows, no cross joins, payloads never shuffled. Caller owns the
    * cache release (same contract as the pair operators above).
    */
  def bestPerClusterLabels(docs: DataFrame, clusters: DataFrame, score: Column,
                           idCol: String = "doc_id"): DataFrame =
    electBest(clusterScoreLabels(docs, clusters, score, idCol).persist())

  /** The UNPERSISTED (doc_id, cluster_id, score) member frame behind
    * [[bestPerClusterLabels]] — callers that must own the cache lifetime
    * (CleanPipeline's stage hygiene) persist this themselves and feed
    * [[electBest]].
    */
  private[graft] def clusterScoreLabels(docs: DataFrame, clusters: DataFrame,
                                        score: Column, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), score.as("score"))
      .join(clusters.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))

  /** Representative election over a (persisted) [[clusterScoreLabels]]
    * frame: max score per cluster, null-safe tie filter, min doc_id.
    */
  private[graft] def electBest(labeled: DataFrame): DataFrame = {
    val best = labeled.groupBy("cluster_id").agg(max(col("score")).as("_best"))
    val reps = labeled
      .join(best, Seq("cluster_id"))
      .filter(col("score") <=> col("_best"))
      .groupBy("cluster_id")
      .agg(min(col("doc_id")).as("_rep"))
    labeled
      .join(reps, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("score"),
        (col("doc_id") === col("_rep")).cast("int").as("is_rep"))
  }

  /** The deduped corpus under quality-aware selection: one highest-scoring
    * document per near-dup cluster (see [[bestPerClusterLabels]]). Same
    * output contract as [[keepRepresentatives]] — the surviving docs with
    * all their columns — so the two are drop-in alternatives.
    */
  def keepBestPerCluster(docs: DataFrame, clusters: DataFrame, score: Column,
                         idCol: String = "doc_id"): DataFrame = {
    val repIds = bestPerClusterLabels(docs, clusters, score, idCol)
      .filter(col("is_rep") === 1)
      .select(col("doc_id").as(idCol))
    docs.join(repIds, Seq(idCol), "left_semi")
  }

  /** 64-bit SimHash over the normalized token stream: per token, a 64-bit
    * hash (two murmur2 passes, seeds s and s+0x9e3779b9) votes ±1 per bit;
    * the sign vector is the fingerprint. Near-dups differ in few bits.
    */
  def simHash64(text: String, seed: Int): Long = {
    val votes = new Array[Int](64)
    val toks = Tokenizer.tokenize(if (text == null) "" else text)
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      val lo = Murmur2.hashString(t, seed)
      val hi = Murmur2.hashString(t, seed + 0x9e3779b9)
      val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      ti += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simHashes(docs: DataFrame, seed: Int = 13, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Spread(docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, simHash64(t, seed)) })
      .toDF(idCol, "simhash")
  }

  /** SimHash near-dup candidate pairs at Hamming distance <= maxHamming
    * (< 16), via the standard block-permutation trick: split the 64-bit
    * fingerprint into 4 16-bit blocks; any pair within distance 3 shares at
    * least one exact block (pigeonhole), so an equi-join per block finds all
    * candidates with zero cross join; exact Hamming check filters.
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3, seed: Int = 13,
                   idCol: String = "doc_id", textCol: String = "text",
                   starCapGroupSize: Option[Int] = None): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole guarantees recall only for maxHamming <= 3")
    // persisted: the hash table feeds the block explode AND both hash
    // join-backs — un-persisted, the simHash kernel would run per consumer
    // (CLAUDE.md sharp edge). Note: simhash 0 (empty/token-less docs) stays
    // IN pairing here — empty docs being mutual dups mirrors the reference's
    // Q3 all-MAX semantics for text; skew from that class is handled by the
    // salted chunks (exact) or the opt-in starCapGroupSize (hub-star).
    val sh = simHashes(docs, seed, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hammingPairs64(sh, maxHamming, nBlocks = 4, idCol = idCol, hashCol = "simhash",
      starCapGroupSize = starCapGroupSize)
  }

  /** All pairs of 64-bit fingerprints within Hamming distance `maxHamming`,
    * via the block-permutation pigeonhole: split the hash into `nBlocks`
    * equal blocks; any pair within distance < nBlocks shares at least one
    * exact block, so an equi-join per block finds every candidate with
    * zero cross join; exact `bit_count(xor)` filters. The fingerprint-
    * agnostic core behind [[simHashPairs]] (text) and
    * Multimodal.image/audio/videoNearDupPairs (perceptual hashes).
    *
    * Skew armor (round 7 closed the r6 scale gap; round 8 made it lazy and
    * single-exchange): a class of B IDENTICAL fingerprints
    * (blank/monochrome images, silence audio, empty docs) is B block-join
    * hits on ONE (block_idx, block_val) key per block — a raw self-join
    * generates its B²/2 rows in one task. Pair generation therefore rides
    * the same machinery as MinHashPipeline.candidates:
    *   - default (`starCapGroupSize = None`): DATA-ROUTED exact pairs in
    *     one exchange — the block table is repartitioned on the group key
    *     once, group sizes derive in-partition (no second exchange, no
    *     eager decision job — r7 ran a blocking two-job proof at frame
    *     construction), and each group routes by its own size: <= chunk
    *     streams its clique from the sorted emitter (per-task output
    *     bounded by saltChunkSize² structurally), > chunk replicates to
    *     s = ceil(B/chunk) hash-salted chunk-PAIR groups that emit across
    *     many tasks (BucketPairs.emitChunkPairs; the mega exchange carries
    *     only mega-group rows and is empty on healthy corpora). The two
    *     routes partition the exact pair set (the exhaustive-Hamming
    *     DuckDB oracles replay this contract verbatim); only the per-group
    *     ROUTE changes with the data. The output volume itself stays
    *     quadratic per identical-fingerprint class BY CONTRACT — cap it
    *     semantically with `starCapGroupSize` or drop degenerate
    *     fingerprints upstream (Multimodal's near-dup operators exclude
    *     the undecodable sentinel 0 for exactly this reason).
    *   - `starCapGroupSize = Some(cap)`: block groups larger than cap emit
    *     hub-star pairs only (hub = min id) — cluster-preserving linear
    *     output, the production profile for dedup-survivor selection
    *     (exactly MinHashPipeline's star-cap contract).
    * Candidate ids-only through the pair shuffle; hashes join back once per
    * side for the exact Hamming filter (the lshTopK ids-only lesson).
    *
    * The input frame feeds the block explode AND both hash join-backs —
    * the CALLER persists it (repo-wide kernel-cache contract; simHashPairs
    * does).
    */
  def hammingPairs64(hashes: DataFrame, maxHamming: Int, nBlocks: Int = 4,
                     idCol: String = "doc_id",
                     hashCol: String = "simhash",
                     starCapGroupSize: Option[Int] = None,
                     saltChunkSize: Int = 4096): DataFrame = {
    require(nBlocks > 1 && 64 % nBlocks == 0,
      "nBlocks must divide 64 and be >= 2 (block values must fit the two-int emitter key)")
    require(maxHamming < nBlocks,
      s"$nBlocks-block pigeonhole guarantees recall only for maxHamming < $nBlocks")
    require(saltChunkSize > 1, "saltChunkSize must exceed 1")
    val spark = hashes.sparkSession
    import spark.implicits._
    val bw = 64 / nBlocks
    val mask = (1L << bw) - 1L
    // emitter key = (block_idx, block_val truncated to int) — injective for
    // bw <= 32 (nBlocks >= 2, required above)
    val blocks = hashes.select(
        col(idCol).cast("long").as("doc_id"),
        posexplode(
          array((0 until nBlocks).map(b =>
            shiftright(col(hashCol), b * bw).bitwiseAND(lit(mask))): _*)
        ).as(Seq("block_idx", "block_val")))
      .select(col("block_idx").cast("int"), col("block_val").cast("int"),
        col("doc_id"))
    val candIds = starCapGroupSize match {
      case Some(cap) =>
        blocks.repartition(col("block_idx"), col("block_val"))
          .as[(Int, Int, Long)]
          .sortWithinPartitions("block_idx", "block_val", "doc_id")
          .mapPartitions(rows => graft.core.BucketPairs.emit(rows, cap))
          .toDF("doc1", "doc2")
      case None =>
        // Data-routed pair generation (round 8, replacing round 7's eager
        // two-job adaptive decision with a LAZY broadcast route — building
        // the frame runs no job again, EntrySpec's plan-only contract holds
        // for the Hamming family). The (block_idx, block_val) key space is
        // BOUNDED: nBlocks × 2^(64/nBlocks) keys (nBlocks ≥ 4 — required
        // just below — gives ≤ 2^18 keys at any corpus size), so the
        // oversized-group key set is always broadcastable. The group-size
        // aggregate (partial-agg combined, its exchange carries only
        // distinct keys) feeds a broadcast of the > saltChunkSize keys;
        // the codegen'd raw self-join then runs over only the anti-joined
        // (proven-small) rows — its largest per-key task is bounded by
        // saltChunkSize² pairs STRUCTURALLY, no proof job, no
        // decision-vs-pair-job read race on an un-persisted input — while
        // ONLY the mega-group rows (not the whole table as in r7) take the
        // chunk-salted pass: members replicate to their s = ceil(B/chunk)
        // chunk-PAIR groups (ci, cj) whose exchange spreads a B²/2 clique
        // over s² tasks, <= 2 chunks of ids buffered per task. On healthy
        // corpora the mega side is EMPTY and AQE's empty-relation
        // propagation collapses that whole branch at runtime. The two
        // routes partition the exact pair set (SkewSpec asserts it vs
        // brute force; the exhaustive-Hamming DuckDB oracles replay the
        // contract). Measured (HammingProbe, sf0.1): raw join 0.7 s vs
        // 1.1-1.5 s for any emitter-based pass; r7's eager decision job
        // alone was 0.3-0.6 s.
        require(bw <= 16,
          "hammingPairs64 exact mode routes skew via a broadcast of the " +
            "bounded (block_idx, block_val) key space — nBlocks must be >= 4")
        val megaSizes = broadcast(
          blocks.groupBy("block_idx", "block_val").agg(count(lit(1)).as("bn"))
            .filter(col("bn") > saltChunkSize))
        val small = blocks.join(megaSizes.select("block_idx", "block_val"),
          Seq("block_idx", "block_val"), "left_anti")
        val smallPairs = small.as("l").join(small.as("r"), Seq("block_idx", "block_val"))
          .filter(col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("doc1"), col("r.doc_id").as("doc2"))
        val megaPairs = blocks.join(megaSizes, Seq("block_idx", "block_val"))
          .withColumn("s", ceil(col("bn").cast("double") / saltChunkSize).cast("int"))
          .withColumn("chunk", pmod(xxhash64(col("doc_id")), col("s")).cast("int"))
          .select(col("block_idx"), col("block_val"), col("doc_id"), col("s"), col("chunk"))
          .as[(Int, Int, Long, Int, Int)]
          .flatMap { case (bi, bv, doc, sN, chunk) =>
            // replicate to every chunk-pair group containing this chunk
            (0 until sN).iterator.map { other =>
              (bi, bv, math.min(chunk, other), math.max(chunk, other), doc, chunk)
            }
          }
          .toDF("block_idx", "block_val", "ci", "cj", "doc_id", "chunk")
          .repartition(col("block_idx"), col("block_val"), col("ci"), col("cj"))
          .sortWithinPartitions("block_idx", "block_val", "ci", "cj", "doc_id")
          .as[(Int, Int, Int, Int, Long, Int)]
          .mapPartitions(rows => graft.core.BucketPairs.emitChunkPairs(rows))
          .toDF("doc1", "doc2")
        smallPairs.union(megaPairs)
    }
    val h1 = hashes.select(col(idCol).cast("long").as("doc1"), col(hashCol).as("_h1"))
    val h2 = hashes.select(col(idCol).cast("long").as("doc2"), col(hashCol).as("_h2"))
    candIds
      .distinct()
      .join(h1, "doc1")
      .join(h2, "doc2")
      .select(col("doc1"), col("doc2"),
        bit_count(col("_h1").bitwiseXOR(col("_h2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Substring-duplication pairs (the suffix-array-style third dedup family
    * alongside MinHash and SimHash): two docs are substring-dups when they
    * share at least one run of `minTokens` consecutive normalized tokens.
    * Instead of building a distributed suffix array, each doc emits one
    * 64-bit Rabin–Karp rolling hash per token window (O(tokens) total via
    * the rolling update, not O(tokens × window)); window-hash equi-join +
    * count of shared windows. The window length plays the suffix-array LCP
    * threshold role; false positives (hash collisions at 64 bits) are
    * negligible and can be re-verified by the exact-Jaccard stage.
    *
    * Returns the distinct (doc1, doc2) pair set (the DEFAULT,
    * `existsMode = true`: the production gate needs only pairhood) — or
    * (doc1, doc2, n_shared_windows) with `existsMode = false`,
    * n_shared_windows counting DISTINCT window hashes present in both
    * docs, for callers that demand the exact shared-window relation.
    *
    * Skew shape: pair generation reuses the salted-clique machinery of
    * MinHashPipeline's parity mode (the 64-bit window hash split into the
    * streaming emitters' two-int key). Window groups up to `saltChunkSize`
    * stream their exact clique from the sorted pass (memory O(group), no
    * self-join); larger groups are split into hash-salted chunks whose
    * chunk-PAIR groups emit across many tasks — a window at a raised cap
    * no longer lands its whole ~wdf²/2 output on one key's task. Each
    * shared window still emits every pair exactly once (within-chunk
    * cliques + cross-chunk products partition the clique), so the count
    * mode's per-pair relation is exact. The output volume itself remains
    * quadratic per window by contract — the doc-freq cap IS the pair
    * budget (default 100 ≈ 5k pairs per hot window); raise it only with a
    * measured budget, or pre-drop boilerplate with exact dedup first.
    */
  def substringDupPairs(docs: DataFrame, minTokens: Int,
                        idCol: String = "doc_id", textCol: String = "text",
                        maxWindowDocFreq: Int = 100,
                        existsMode: Boolean = true,
                        saltChunkSize: Int = 2048): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the window hash is emitted pre-split into two ints: the streaming
    // emitters key on (Int, Int), and a Column-side long->int cast would
    // throw under ANSI (CLAUDE.md: hash arithmetic stays in kernels)
    val windows = Spread(docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = Tokenizer.tokenize(if (text == null) "" else text)
        val hashes = rollingWindowHashes(toks, minTokens)
        if (hashes.isEmpty) Iterator.empty
        else {
          // distinct within the doc: the pair contract counts DISTINCT
          // shared window hashes
          val out = new scala.collection.mutable.LinkedHashSet[Long]
          hashes.foreach(out += _)
          out.iterator.map(wh => ((wh >>> 32).toInt, wh.toInt, id))
        }
      }
      .toDF("whi", "wlo", "doc_id")
      // pre-partitioned by the window key, then persisted: the doc-freq
      // agg and both emitter passes are window-keyed — one shuffle
      // building the cache serves all consumers
      .repartition(col("whi"), col("wlo"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hot-window cap: a window shared by >maxWindowDocFreq docs (boilerplate)
    // adds candidates quadratically but no discrimination — standard drop.
    // groupBy reuses the cache's partitioning (no second exchange).
    val sizes = windows.groupBy("whi", "wlo").agg(count(lit(1)).as("wdf"))
      .filter(col("wdf") <= maxWindowDocFreq)
    val small = windows
      .join(sizes.filter(col("wdf") <= saltChunkSize), Seq("whi", "wlo"), "left_semi")
      .select(col("whi"), col("wlo"), col("doc_id"))
      .repartition(col("whi"), col("wlo"))
      .sortWithinPartitions("whi", "wlo", "doc_id")
      .as[(Int, Int, Long)]
      .mapPartitions(rows => graft.core.BucketPairs.emit(rows, Int.MaxValue))
      .toDF("doc1", "doc2")
    val big = windows
      .join(sizes.filter(col("wdf") > saltChunkSize), Seq("whi", "wlo"))
      .withColumn("s", ceil(col("wdf").cast("double") / saltChunkSize).cast("int"))
      .withColumn("chunk", pmod(xxhash64(col("doc_id")), col("s")).cast("int"))
      .select(col("whi"), col("wlo"), col("doc_id"), col("s"), col("chunk"))
      .as[(Int, Int, Long, Int, Int)]
      .flatMap { case (whi, wlo, doc, s, chunk) =>
        (0 until s).iterator.map { other =>
          (whi, wlo, math.min(chunk, other), math.max(chunk, other), doc, chunk)
        }
      }
      .toDF("whi", "wlo", "ci", "cj", "doc_id", "chunk")
      .repartition(col("whi"), col("wlo"), col("ci"), col("cj"))
      .sortWithinPartitions("whi", "wlo", "ci", "cj", "doc_id")
      .as[(Int, Int, Int, Int, Long, Int)]
      .mapPartitions(rows => graft.core.BucketPairs.emitChunkPairs(rows))
      .toDF("doc1", "doc2")
    val joined = small.union(big)
    if (existsMode) joined.distinct()
    else joined.groupBy("doc1", "doc2").agg(count(lit(1)).as("n_shared_windows"))
  }

  /** Benchmark decontamination: for every (training doc, benchmark doc)
    * pair, the CONTAINMENT of the benchmark doc's word n-grams in the
    * training doc — |grams(bench) ∩ grams(doc)| / |grams(bench)|. A
    * training doc with high containment of any benchmark doc leaks eval
    * data and must be dropped before training. Asymmetric by design
    * (Jaccard under-flags when the training doc is much longer than the
    * benchmark item — the common case).
    *
    * Scale shape: grams of both sides equi-join on the gram (benchmark
    * side is small by definition — broadcast-able); one groupBy(pair);
    * per-row IEEE division, so the result is DuckDB-oracle-comparable.
    *
    * The broadcast hint is SIZE-GATED, not unconditional: a caller passing
    * an oversized "benchmark" frame must degrade to a plain shuffle
    * equi-join (AQE decides), not OOM the driver materializing the gram
    * table as a broadcast relation. The gate's count() doubles as the
    * materialization of the persisted gram kernel (one extra job, no extra
    * pass). Cache lifetime is CALLER-owned: clearCache()/unpersist when done.
    */
  def ngramContainment(docs: DataFrame, benchmark: DataFrame, n: Int,
                       minContainment: Double,
                       idCol: String = "doc_id", textCol: String = "text",
                       maxBroadcastGrams: Long = 1000000L): DataFrame = {
    val docGrams = gramRows(docs, n, idCol, textCol).toDF("doc_id", "gram")
    val benchGrams = gramRows(benchmark, n, idCol, textCol).toDF("bench_id", "gram")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hintable = benchGrams.count() <= maxBroadcastGrams
    def hinted(df: DataFrame): DataFrame = if (hintable) broadcast(df) else df
    val benchSizes = benchGrams.groupBy("bench_id").agg(count(lit(1)).as("n_bench_grams"))
    val inter = docGrams
      .join(hinted(benchGrams), "gram")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(hinted(benchSizes), "bench_id")
      .withColumn("containment",
        col("n_inter").cast("double") / col("n_bench_grams").cast("double"))
      .filter(col("containment") >= minContainment)
      .select("doc_id", "bench_id", "containment")
  }

  /** Bloom-gated decontamination — same output contract as
    * [[ngramContainment]] (bit-identical rows; the spec asserts it), built
    * for the regime where the benchmark gram set is too big to broadcast
    * as a join hash relation but its BLOOM is not.
    *
    * Why: ngramContainment's good case broadcasts (gram -> bench_id) —
    * full gram STRINGS plus ids. Past the broadcast threshold (~10M grams)
    * it degrades to shuffling EVERY corpus gram, which at 100 TB is the
    * whole corpus re-keyed by gram. A Bloom filter over the same gram set
    * is ~1.2 bytes/gram at 1% fpp (10M grams ≈ 12 MB — broadcastable two
    * orders of magnitude past the hash-relation limit), and Bloom
    * membership has NO false negatives, so gating the corpus-side gram
    * kernel on `mightContain` before the join drops every miss doc-locally:
    * only HIT grams (true hits + ~fpp false positives) enter the exchange,
    * and the exact equi-join against the benchmark grams then kills the
    * false positives. Net shuffle: O(hits), not O(corpus grams).
    *
    * The bloom itself is built with one distributed pass
    * (`df.stat.bloomFilter`) sized from the exact benchmark gram count.
    * Cache lifetime contract as ngramContainment: caller releases.
    */
  def ngramContainmentBloom(docs: DataFrame, benchmark: DataFrame, n: Int,
                            minContainment: Double,
                            idCol: String = "doc_id", textCol: String = "text",
                            fpp: Double = 0.01): DataFrame =
    ngramContainmentBloomWithHandle(docs, benchmark, n, minContainment,
      idCol, textCol, fpp)._1

  /** [[ngramContainmentBloom]] plus the internal benchmark-gram cache
    * handle, for pipeline callers that must release it after their
    * terminal action instead of clearCache()-ing the whole session
    * (CleanPipeline's decontam stage does). The handle is None only for
    * an empty benchmark.
    */
  def ngramContainmentBloomWithHandle(docs: DataFrame, benchmark: DataFrame,
                                      n: Int, minContainment: Double,
                                      idCol: String = "doc_id",
                                      textCol: String = "text",
                                      fpp: Double = 0.01)
      : (DataFrame, Option[DataFrame]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val benchGrams = gramRows(benchmark, n, idCol, textCol).toDF("bench_id", "gram")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBench = benchGrams.count()
    if (nBench == 0L) {
      benchGrams.unpersist()
      return (spark.emptyDataset[(Long, Long, Double)]
        .toDF("doc_id", "bench_id", "containment"), None)
    }
    // one distributed pass over the persisted gram table; put/test go
    // through the same UTF-8 byte path (putBinary/mightContainString)
    val bloom = spark.sparkContext.broadcast(
      benchGrams.stat.bloomFilter("gram", nBench, fpp))
    val hitGrams = gramRows(docs, n, idCol, textCol)
      .filter(t => bloom.value.mightContainString(t._2))
      .toDF("doc_id", "gram")
    val benchSizes = benchGrams.groupBy("bench_id").agg(count(lit(1)).as("n_bench_grams"))
    // exact verify: false positives fail this join; no broadcast hint —
    // the hit relation is O(true hits) and AQE picks the side
    val inter = hitGrams
      .join(benchGrams, "gram")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_inter"))
    (inter
      .join(benchSizes, "bench_id")
      .withColumn("containment",
        col("n_inter").cast("double") / col("n_bench_grams").cast("double"))
      .filter(col("containment") >= minContainment)
      .select("doc_id", "bench_id", "containment"), Some(benchGrams))
  }

  /** Distinct word n-grams per doc as a typed Dataset — the shared kernel
    * behind ngramJaccardPairs and ngramContainment (LinkedHashSet dedupe,
    * precompiled whitespace split; higher-order Column lambdas would run
    * interpreted here).
    */
  /** FNV-1a 64 over the gram's characters with a single space between
    * tokens — exactly the hash of the string gramRows would build, without
    * materializing it. Internal join key for [[ngramJaccardPairs]]: two
    * DISTINCT grams colliding at 64 bits would merge their posting lists
    * (the substringDupPairs false-positive budget, ~m²/2^65 for m distinct
    * grams — negligible at any tested corpus; OperatorsSpec pins equality
    * with the string-keyed formulation on randomized corpora, so a
    * collision on a test corpus fails loudly).
    */
  private[graft] def gramHash(toks: Array[String], i: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = 0
    while (j < n) {
      if (j > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
      val t = toks(i + j)
      var k = 0
      while (k < t.length) { h ^= t.charAt(k).toLong; h *= 0x100000001b3L; k += 1 }
      j += 1
    }
    h
  }

  /** (doc_id, gram_hash) rows, DISTINCT hashes per doc — the hashed-key
    * twin of [[gramRows]] (sorted-array dedup, no string building, no
    * boxing): 16-byte fixed rows through the gram exchange instead of
    * ~30-40-byte string rows, and long-keyed hash aggs/joins downstream.
    */
  private def gramHashRows(docs: DataFrame, n: Int, idCol: String, textCol: String) = {
    val spark = docs.sparkSession
    import spark.implicits._
    Spread(docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = if (text == null) "" else text.trim
        if (t.isEmpty) Iterator.empty
        else {
          val toks = Dedup.WsPattern.split(t)
          if (toks.length < n) Iterator.empty
          else {
            val hs = new Array[Long](toks.length - n + 1)
            var i = 0
            while (i + n <= toks.length) { hs(i) = gramHash(toks, i, n); i += 1 }
            java.util.Arrays.sort(hs)
            new Iterator[(Long, Long)] {
              private var k = 0
              def hasNext: Boolean = k < hs.length
              def next(): (Long, Long) = {
                val v = hs(k); k += 1
                while (k < hs.length && hs(k) == v) k += 1 // skip duplicates
                (id, v)
              }
            }
          }
        }
      }
  }

  private def gramRows(docs: DataFrame, n: Int, idCol: String, textCol: String) = {
    val spark = docs.sparkSession
    import spark.implicits._
    Spread(docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = if (text == null) "" else text.trim
        if (t.isEmpty) Iterator.empty
        else {
          val toks = Dedup.WsPattern.split(t)
          if (toks.length < n) Iterator.empty
          else {
            val set = new scala.collection.mutable.LinkedHashSet[String]
            var i = 0
            while (i + n <= toks.length) {
              val sb = new java.lang.StringBuilder
              var j = 0
              while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
              set += sb.toString
              i += 1
            }
            set.iterator.map(g => (id, g))
          }
        }
      }
  }

  /** Word n-gram Jaccard near-dup pairs — the SQL-expressible dedup variant
    * (the DuckDB oracle runs the identical relational plan):
    * distinct n-grams per doc -> equi-join on the n-gram -> pair
    * intersection counts -> |A∩B| / (|A|+|B|-|A∩B|) >= minJaccard.
    *
    * Shuffle profile: one groupBy(gram) join keyed on the gram (hot grams =
    * skew; at production scale drop grams with doc-frequency above a cap —
    * they contribute candidates, not discrimination), one groupBy(pair).
    * The per-row division is exact IEEE in both engines, so results
    * hash-match the oracle.
    *
    * Round 8: the internal join/agg key is the 64-bit [[gramHash]] of the
    * gram, not the gram string — 16-byte fixed rows through the gram
    * exchange (measured ~2x the string-keyed kernel at 50k docs) with
    * identical output absent a 64-bit collision between distinct grams
    * (the stated substringDupPairs-style false-positive budget; the
    * string-keyed formulation is kept under `hashedGrams = false` and
    * OperatorsSpec pins the two equal on randomized corpora).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
                        idCol: String = "doc_id", textCol: String = "text",
                        maxGramDocFreq: Option[Int] = None,
                        hashedGrams: Boolean = true): DataFrame = {
    // typed kernel for gram construction (gramRows): Spark's higher-order
    // transform/sequence/slice lambdas evaluate interpreted per element —
    // a plain sliding window over the split tokens is ~10x faster and
    // byte-identical (both sides split on whitespace runs of the trimmed
    // text; the corpus is single-space separated)
    val gramSrc =
      if (hashedGrams) gramHashRows(docs, n, idCol, textCol).toDF("doc_id", "gram")
      else gramRows(docs, n, idCol, textCol).toDF("doc_id", "gram")
    val grams = gramSrc
      // PRE-PARTITIONED BY THE JOIN KEY before the persist: the doc-freq
      // agg, its semi-join, and the a/b self-join are all gram-keyed — a
      // cache already hash-partitioned on gram satisfies every one of those
      // distributions, collapsing three gram shuffles of the full gram
      // table into the single one that builds the cache (InMemoryRelation
      // preserves its child's outputPartitioning).
      .repartition(col("gram"))
      // persisted: with a doc-freq cap the gram kernel feeds the df agg +
      // the semi-join; without it, the sizes agg + both join sides. Either
      // way an un-persisted subtree re-runs the flatMap kernel 3-4x
      // (CLAUDE.md sharp edge; measured the dominant cost of this operator).
      // ONLY grams is persisted — `filtered` below is a join off this cache
      // whose a/b sides are identical subtrees (ReuseExchange collapses
      // them); double-caching grams AND filtered would pin ~2x the operator
      // footprint for the session lifetime.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val filtered = maxGramDocFreq match {
      case Some(cap) =>
        val df = grams.groupBy("gram").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
        grams.join(df.select("gram"), "gram")
      case None => grams
    }
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val a = filtered.alias("a")
    val b = filtered.alias("b")
    val inter = a
      .join(b, col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n_grams", "n1"), "doc1")
      .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n_grams", "n2"), "doc2")
      .withColumn(
        "jaccard",
        col("n_inter").cast("double") / (col("n1") + col("n2") - col("n_inter")).cast("double")
      )
      .filter(col("jaccard") >= minJaccard)
      .select("doc1", "doc2", "jaccard")
  }

  /** C4-style duplicate-SPAN removal: any run of `minTokens` consecutive
    * whitespace tokens that appears (as a rolling-hashed window) in more
    * than `maxSpanDocFreq` DISTINCT documents is excised from every
    * document; overlapping flagged windows merge into one span. This is
    * the REWRITING counterpart of [[substringDupPairs]] (which only
    * reports pairs): C4's dedup removes the duplicated span itself and
    * keeps the surrounding unique text.
    *
    * Text is whitespace-normalized on reassembly (tokens re-joined with
    * single spaces) — the standard C4 behavior; tokens keep their case
    * and punctuation (the oracle-replayable class-trim + `\s+` split
    * shared with [[removeExactDuplicateSpans]], not the normalizing
    * Tokenizer) — so the q_span_dedup oracle can replay windows, the
    * doc-frequency cut and reassembly by exact window STRING in DuckDB
    * (string classes == 64-bit rolling-hash classes absent collisions,
    * the operator's own stated false-positive budget).
    *
    * Scale shape: narrow window kernel (Spread), one (hash) groupBy for
    * document frequency, one equi-join of windows against the (tiny —
    * above-cut only) flagged set, one (doc) groupBy collecting flagged
    * starts, then a narrow typed reassembly; no all-pairs work anywhere.
    * Docs whose every token is covered come back with empty clean_text
    * (kept, unlike stripBoilerplateLines' dropped all-boiler docs — span
    * removal is a rewrite, not a filter).
    *
    * @return (idCol, clean_text, n_tokens, n_tokens_removed)
    */
  def removeDuplicateSpans(docs: DataFrame, minTokens: Int, maxSpanDocFreq: Int,
                           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(minTokens >= 2, s"minTokens must be >= 2: $minTokens")
    val base = Spread(docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // window kernel: one rolling 64-bit hash per token window, WITH the
      // start offset (unlike substringDupPairs we need positions back);
      // shared recurrence via rollingWindowHashes — the two operators'
      // notion of "duplicate span" must never drift apart
      val windows = base
        .flatMap { case (id, text) =>
          val hashes = rollingWindowHashes(exactSpanToks(text), minTokens)
          Iterator.range(0, hashes.length).map(s => (id, s, hashes(s)))
        }
        .toDF("doc_id", "start", "window_hash")
        // pre-partitioned on the join key, then persisted: the doc-freq
        // distinct/agg and the flagged equi-join are all window_hash-keyed
        // — one cache-building shuffle serves them (the gram/window
        // kernels' identical note)
        .repartition(col("window_hash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val flagged = windows.select("doc_id", "window_hash").distinct()
          .groupBy("window_hash").agg(count(lit(1)).as("wdf"))
          .filter(col("wdf") > maxSpanDocFreq)
          .select("window_hash")
        val flaggedStarts = windows
          .join(flagged, "window_hash")
          .groupBy("doc_id")
          .agg(sort_array(collect_list(col("start"))).as("starts"))
        val out = base.toDF("doc_id", "text")
          .join(flaggedStarts, Seq("doc_id"), "left")
          .select(col("doc_id"), col("text"), coalesce(col("starts"), array()).as("starts"))
          .as[(Long, String, Seq[Int])]
          .mapPartitions(_.map { case (id, text, starts) =>
            val toks = exactSpanToks(text)
            val keep = new Array[Boolean](toks.length)
            java.util.Arrays.fill(keep, true)
            starts.foreach { s =>
              var i = s
              val end = math.min(toks.length, s + minTokens)
              while (i < end) { keep(i) = false; i += 1 }
            }
            val kept = new StringBuilder
            var removed = 0
            var i = 0
            while (i < toks.length) {
              if (keep(i)) {
                if (kept.nonEmpty) kept.append(' ')
                kept.append(toks(i))
              } else removed += 1
              i += 1
            }
            (id, kept.toString, toks.length.toLong, removed.toLong)
          })
          .toDF("doc_id", "clean_text", "n_tokens", "n_tokens_removed")
          .select(col("doc_id").as(idCol), col("clean_text"),
            col("n_tokens"), col("n_tokens_removed"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count() // materialize before releasing the internal caches
        out
      } finally { windows.unpersist(); () }
    } finally { base.unpersist(); () }
  }

  /** EXACT corpus-wide duplicate-span removal — the suffix-array-substring
    * dedup of the north rule (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"), re-derived for Spark's execution
    * model: every token window of exactly `windowTokens` that occurs MORE
    * THAN ONCE anywhere in the corpus is excised from every occurrence
    * EXCEPT the first (global (doc_id, start) order), by EXACT string
    * equality — no hash-collision false positives, unlike
    * [[removeDuplicateSpans]]'s doc-frequency/rolling-hash contract (which
    * stays the cheap boilerplate path; this is the exactness path).
    *
    * Algorithm — hash-group THEN verify, not prefix-doubling: a suffix
    * array via prefix doubling costs O(log windowTokens) GLOBAL sort/rank
    * rounds over every token position (the classic shared-memory
    * formulation); in Spark that is ~4·log L exchanges of (doc, pos, rank)
    * rows. Instead:
    *
    *   1. one narrow kernel emits the 64-bit Rabin–Karp window hash per
    *      position (shared [[rollingWindowHashes]] recurrence) — the ONLY
    *      full-corpus exchange carries 8-byte keys, never window text
    *   2. hash classes with >= 2 members are CANDIDATES (map-side
    *      combinable count); candidate positions join back to their docs
    *      and re-extract the actual window strings — string bytes are paid
    *      only for repeated-or-colliding windows, a vanishing corpus
    *      fraction
    *   3. exact classes = group by (hash, window string); the class
    *      minimum (doc_id, start) is the kept occurrence, every other
    *      member marks its tokens for excision
    *   4. marked positions merge per doc (overlaps coalesce) and a typed
    *      kernel reassembles the surviving tokens
    *
    * This is exact end-to-end: a 64-bit collision only costs a few extra
    * verified strings in step 2, never a wrong excision. Tokenization is
    * the ORACLE-REPLAYABLE convention (explicit 6-char class trim + split,
    * the TextAnalysis/wsClassTrim contract) — q_exact_spans hash-matches
    * the whole operator against DuckDB, including the keep-first choice.
    * Docs with < windowTokens tokens pass through untouched; a fully-
    * duplicated doc can come back with empty clean_text (rewrite, not a
    * filter — the [[removeDuplicateSpans]] convention).
    *
    * @return (idCol, clean_text, n_tokens, n_tokens_removed)
    */
  def removeExactDuplicateSpans(docs: DataFrame, windowTokens: Int,
                                idCol: String = "doc_id",
                                textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(windowTokens >= 2, s"windowTokens must be >= 2: $windowTokens")
    val L = windowTokens
    val basePersisted = Spread(
        docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // PLAN-SIZE HYGIENE: the stages below reference the input from several
    // places (window kernel, candidate re-extraction, reassembly) whose
    // frames then join each other — each reference re-embeds the input's
    // ANALYZED plan in every downstream explain string, multiplicatively.
    // A caller-supplied input that itself carries a big self-joined plan
    // (the cleaning recipe's gopher-gated survivors) blew a 2 GB plan
    // string OOM inside AQE's plan-change logging. Cut the lineage at the
    // materialized cache: .rdd reads THROUGH the cache (safe here — the
    // count below has already materialized any upstream exchange), and
    // downstream plans see a compact scan instead of the whole recipe.
    basePersisted.count()
    val base = spark.createDataFrame(
      basePersisted.toDF("doc_id", "text").rdd,
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string"))
    try {
      // 1: (doc, start, h) — the 8-byte-key exchange
      val windows = base
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val hs = rollingWindowHashes(exactSpanToks(text), L)
          Iterator.range(0, hs.length).map(s => (id, s, hs(s)))
        }
        .toDF("doc_id", "start", "h")
        .repartition(col("h")) // one shuffle serves the count AND the semi-join
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // 2: candidate classes (>= 2 members) -> re-extract REAL strings
        val hot = windows.groupBy("h").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 2).select("h")
        val candStarts = windows.join(hot, "h")
          .groupBy("doc_id").agg(sort_array(collect_list(struct(col("start"), col("h")))).as("cands"))
        val verified = base.toDF("doc_id", "text")
          .join(candStarts, "doc_id") // inner: docs without candidates drop here
          .as[(Long, String, Seq[(Int, Long)])]
          .flatMap { case (id, text, cands) =>
            val ts = exactSpanToks(text)
            cands.iterator.map { case (s, h) =>
              val sb = new java.lang.StringBuilder
              var j = s
              while (j < s + L) { if (j > s) sb.append(' '); sb.append(ts(j)); j += 1 }
              (h, sb.toString, id, s)
            }
          }
          .toDF("h", "w", "doc_id", "start")
        // 3: exact classes; keeper = min (doc_id, start); the rest excise.
        // NO collect_list of occurrences: a boilerplate window repeated 10^6
        // times corpus-wide would build its whole occurrence list on one
        // key — aggregate the class (count + min, both map-side-combinable)
        // and JOIN members back instead, which distributes the hot class.
        val classes = verified
          .groupBy("h", "w")
          .agg(count(lit(1)).as("cnt"),
            min(struct(col("doc_id"), col("start"))).as("keep"))
          .filter(col("cnt") >= 2) // hash collisions can leave singleton exact classes
          .select("h", "w", "keep")
        val removable = verified.join(classes, Seq("h", "w"))
          .filter(struct(col("doc_id"), col("start")) =!= col("keep"))
          .select("doc_id", "start")
        // 4: marked token indices per doc (distinct merges overlaps), then
        // typed reassembly. The per-doc list is bounded by the doc's own
        // token count — per-doc state, never corpus-wide.
        val marked = removable
          .select(col("doc_id"), explode(sequence(col("start"), col("start") + lit(L - 1))).as("i"))
          .distinct()
          .groupBy("doc_id").agg(sort_array(collect_list(col("i"))).as("cut"))
        val out = base.toDF("doc_id", "text")
          .join(marked, Seq("doc_id"), "left")
          .select(col("doc_id"), col("text"), coalesce(col("cut"), array()).as("cut"))
          .as[(Long, String, Seq[Int])]
          .mapPartitions(_.map { case (id, text, cut) =>
            val ts = exactSpanToks(text)
            val cutSet = cut.toSet
            val kept = new StringBuilder
            var removed = 0
            var i = 0
            while (i < ts.length) {
              if (cutSet.contains(i)) removed += 1
              else {
                if (kept.nonEmpty) kept.append(' ')
                kept.append(ts(i))
              }
              i += 1
            }
            (id, kept.toString, ts.length.toLong, removed.toLong)
          })
          .toDF("doc_id", "clean_text", "n_tokens", "n_tokens_removed")
          .select(col("doc_id").as(idCol), col("clean_text"),
            col("n_tokens"), col("n_tokens_removed"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count() // materialize before releasing the internal caches
        out
      } finally { windows.unpersist(); () }
    } finally { basePersisted.unpersist(); () }
  }

  /** ORACLE-REPLAYABLE token split shared by BOTH span operators
    * ([[removeExactDuplicateSpans]] and [[removeDuplicateSpans]] — round 6
    * aligned the latter off Java `String.trim`, whose <=0x20 stripping
    * cannot be replayed in DuckDB): explicit 6-char class trim
    * (TextAnalysis.wsClassTrim <-> DuckDB two-arg trim) + the `\s+` split.
    * Object-level (not a local def) so executor closures reference the
    * module statically instead of capturing it (Dedup is not Serializable).
    */
  private def exactSpanToks(text: String): Array[String] = {
    val t = graft.functions.TextAnalysis.wsClassTrim(if (text == null) "" else text)
    if (t.isEmpty) Array.empty[String] else WsPattern.split(t)
  }

  /** One rolling 64-bit Rabin–Karp hash per token window start (shared by
    * [[substringDupPairs]] and [[removeDuplicateSpans]] — a drift between
    * their hash schemes would silently change what counts as a duplicate
    * span). h(w..w+L) = Σ tokHash(i)·B^(L-1-(i-w)) in wrapping arithmetic;
    * per-token hashes are murmur2 forced odd so a zero token can't
    * annihilate the polynomial. Empty when the doc has < minTokens tokens.
    */
  private[operators] def rollingWindowHashes(toks: scala.collection.IndexedSeq[String],
                                             minTokens: Int): Array[Long] = {
    if (toks.length < minTokens) return Array.emptyLongArray
    val B = 1000003L
    var bPow = 1L // B^(L-1)
    var i = 1
    while (i < minTokens) { bPow *= B; i += 1 }
    val tokHash = Array.tabulate(toks.length)(j =>
      (Murmur2.hashString(toks(j), 1315423911.toInt) & 0xffffffffL) | 1L)
    val out = new Array[Long](toks.length - minTokens + 1)
    var h = 0L
    var w = 0
    while (w < minTokens) { h = h * B + tokHash(w); w += 1 }
    out(0) = h
    var start = 1
    while (start + minTokens <= toks.length) {
      h = (h - tokHash(start - 1) * bPow) * B + tokHash(start + minTokens - 1)
      out(start) = h
      start += 1
    }
    out
  }

  /** C4-style boilerplate-LINE removal (line-level dedup across the
    * corpus): a line that appears verbatim in more than `maxLineDocFreq`
    * DISTINCT documents (nav bars, cookie banners, license headers) is
    * dropped from every document; lines shorter than `minLineLen` after
    * trimming are never considered boilerplate (blank lines,
    * separators stay). Documents whose every line is boilerplate drop out
    * of the result entirely.
    *
    * Scale shape: explode lines (narrow), one distinct + groupBy on the
    * line for document frequency (the line df table is tiny — only lines
    * above the cut survive the filter — so the join back is
    * broadcast-able; AQE decides), re-assemble with
    * sort_array + GetArrayStructFields + array_join — ALL native codegen
    * expressions, no higher-order lambdas (CLAUDE.md sharp edge; a
    * `transform(x -> x.line)` here would interpret per line).
    *
    * @return (idCol, clean_text)
    */
  def stripBoilerplateLines(docs: DataFrame, maxLineDocFreq: Long,
                            minLineLen: Int = 10,
                            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val idc = col(idCol).cast("long")
    // a null / non-integral id would silently merge EVERY document's lines
    // into one null-id group at the reassembly groupBy, destroying all
    // document boundaries — fail loudly instead (the Corpus.split
    // convention)
    val safeId = when(idc.isNotNull, idc)
      .otherwise(raise_error(lit(
        s"stripBoilerplateLines: null or non-integral $idCol — per-document " +
          "reassembly requires a concrete id")).cast("long"))
    // Spread first: a one-file corpus would serialize the scan + split +
    // explode on a single task (CLAUDE.md sharp edge). Persisted because
    // it feeds BOTH the doc-frequency aggregate and the join-back side —
    // but the internal cache is RELEASED before returning; the returned
    // (persisted, materialized) frame is the single CALLER-owned handle.
    val lines = Spread(docs.select(safeId.as("doc_id"), col(textCol).cast("string").as("t")))
      .select(col("doc_id"), posexplode(split(col("t"), "\n")).as(Seq("pos", "line")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val eligible = length(trim(col("line"))) >= minLineLen
      val boiler = lines.filter(eligible)
        .select("doc_id", "line").distinct()
        .groupBy("line").agg(count(lit(1)).as("ldf"))
        .filter(col("ldf") > maxLineDocFreq)
        .select(col("line"), lit(true).as("_boiler"))
      val out = lines
        .join(boiler, Seq("line"), "left")
        // a non-null _boiler implies the line was eligible (boiler is
        // built from eligible lines only): keep = simply "not flagged"
        .filter(col("_boiler").isNull)
        .groupBy("doc_id")
        .agg(array_join(
          sort_array(collect_list(struct(col("pos"), col("line")))).getField("line"),
          "\n").as("clean_text"))
        .select(col("doc_id").as(idCol), col("clean_text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count() // materialize before releasing the internal lines cache
      out
    } finally { lines.unpersist(); () }
  }
}
