package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * All dot products run through the codegen'd [[graft.functions.DotProductD]]
  * expression (sequential IEEE fold — bit-identical to an ordered-fold
  * oracle such as DuckDB's list_dot_product). The LSH sketch is a typed
  * mapPartitions kernel; hyperplanes are derived from the seed inside each
  * task, never plan literals.
  */
object Similarity {

  // Codegen'd custom expression — Spark's higher-order aggregate/zip_with
  // lambdas evaluate interpreted (no doGenCode), ~50x slower per pair when
  // reranking millions of ANN candidates. Bit-identical results (same
  // ordered IEEE fold).
  private def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dotD(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  // native array cast, NOT transform(c, _.cast("double")): higher-order
  // transform evaluates its lambda interpreted per element; Cast over
  // ArrayType is codegen'd and bit-identical (float→double widening)
  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Deterministic pseudo-random hyperplane matrix (nTables*bandBits × dim),
    * regenerated identically inside every task — NEVER a plan literal (a
    * 96×64 literal matrix is ~6k Catalyst nodes; every optimizer/AQE pass
    * re-walks it, measured minutes of driver CPU on a 500-row input).
    */
  private def planes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes) { i =>
      val rng = new java.util.Random(seed * 1000003L + i)
      Array.fill(dim)(rng.nextGaussian())
    }

  /** Per-vector bucket ids: bucket t folds the signs of hyperplanes
    * [t*bandBits, (t+1)*bandBits) into a bandBits-bit integer. Pure JVM
    * kernel, called from a typed map.
    */
  private[operators] def bucketsOf(vec: Array[Double], pl: Array[Array[Double]],
                                   nTables: Int, bandBits: Int): Array[Long] = {
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var acc = 0L
      var b = 0
      while (b < bandBits) {
        val p = pl(t * bandBits + b)
        var d = 0.0
        var i = 0
        while (i < vec.length) { d += vec(i) * p(i); i += 1 }
        acc = acc * 2 + (if (d >= 0) 1L else 0L)
        b += 1
      }
      out(t) = acc
      t += 1
    }
    out
  }

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself). Baseline and rerank primitive.
    *
    * Scale shape: the query batch is broadcast (small by definition); the
    * corpus side streams through a broadcast nested-loop scan — no shuffle
    * of the corpus; one window per query partition for top-k. For
    * corpus×corpus all-pairs use the LSH variant instead.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), asDouble(col(vecCol)).as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn(
        "cosine",
        dot(col("q_vec"), col("nbr_vec")) / (norm(col("q_vec")) * norm(col("nbr_vec")))
      )
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id").asc) // deterministic tie-break
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cosine")
  }

  /** PERSISTED (vid, vec, buckets) sketch table: the kernel output feeds the
    * two candidate-join sides AND the vector join-backs — un-persisted, the
    * hyperplane kernel would re-run once per consumer (CLAUDE.md sharp
    * edge). The sketch runs as a narrow typed map (hyperplanes rebuilt per
    * task from the seed — cheaper than broadcasting for these sizes).
    */
  private def sketchRows(corpus: DataFrame, dim: Int, nTables: Int, bandBits: Int,
                         seed: Long, idCol: String, vecCol: String): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .select(col(idCol).cast("long").as("vid"), asDouble(col(vecCol)).as("vec"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val pl = planes(dim, nTables * bandBits, seed)
        it.map { case (vid, vec) => (vid, vec, bucketsOf(vec, pl, nTables, bandBits)) }
      }
      .toDF("vid", "vec", "buckets")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** ids-only (vid, table_idx, bucket) LSH bucket rows off the sketch. */
  private def bucketIds(sketch: DataFrame): DataFrame =
    sketch.select(col("vid"), posexplode(col("buckets")).as(Seq("table_idx", "bucket")))

  /** Multiprobe expansion of the PROBE side: each bucket row additionally
    * probes every bucket at Hamming distance 1 (flip each of the bandBits
    * sign bits). One probe row fans to bandBits+1 rows, but each table's
    * buckets can be 2^bandBits-fold smaller for the same recall, so total
    * candidate volume DROPS — the standard multiprobe trade.
    */
  private def multiProbeIds(exploded: DataFrame, bandBits: Int): DataFrame =
    exploded.select(
      col("vid"), col("table_idx"),
      explode(array(
        (Seq(col("bucket")) ++
          (0 until bandBits).map(b => col("bucket").bitwiseXOR(lit(1L << b)))): _*
      )).as("bucket"))

  /** LSH-bucketed ANN: candidates = vectors sharing at least one of
    * `nTables` hyperplane-sketch buckets (bandBits bits each), then exact
    * cosine rerank and per-query top-k. Recall tunes with nTables/bandBits;
    * the shuffle is an equi-join on (table_idx, bucket) — never a cross
    * join, so it survives a 10^9-vector corpus.
    *
    * Defaults tuned by sweep (graft.tools.RecallProbe): multiprobe
    * (16, 8, mp) measures recall@5 = 0.847 @ sf0.001 / 0.893 @ sf0.1 —
    * equal to the best non-multiprobe config (24, 5) but ~1.7x faster and
    * with 2^3-fold smaller buckets, which is what survives corpus growth
    * (candidate volume per vector ~ nTables × (1+bandBits) × n / 2^bandBits).
    * At larger corpus scale raise bandBits and nTables together.
    */
  def lshTopK(corpus: DataFrame, k: Int, dim: Int, nTables: Int = 16, bandBits: Int = 8,
              seed: Long = 42L, multiProbe: Boolean = true,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sketch = sketchRows(corpus, dim, nTables, bandBits, seed, idCol, vecCol)
    val exploded = bucketIds(sketch)
    // candidate pairs carry IDS ONLY through the bucket join + distinct —
    // shuffling the vector payloads through dropDuplicates costs ~1000x the
    // bytes (measured 108 s -> ~2 s on 2k vectors / 1M candidate rows).
    // Vectors join back once per side afterwards, off the persisted sketch.
    val a = (if (multiProbe) multiProbeIds(exploded, bandBits) else exploded).alias("a")
    val b = exploded.alias("b")
    val candIds = a
      .join(
        b,
        col("a.table_idx") === col("b.table_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vid") =!= col("b.vid")
      )
      .select(col("a.vid").as("query_id"), col("b.vid").as("nbr_id"))
      .distinct()
    val vecs = sketch.select(col("vid"), col("vec"))
    val scored = candIds
      .join(vecs.select(col("vid").as("query_id"), col("vec").as("q_vec")), "query_id")
      .join(vecs.select(col("vid").as("nbr_id"), col("vec").as("nbr_vec")), "nbr_id")
      .withColumn(
        "cosine",
        dot(col("q_vec"), col("nbr_vec")) / (norm(col("q_vec")) * norm(col("nbr_vec")))
      )
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cosine")
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nCentroids`
    * deterministic centroids (unit-normalized sample of the corpus, chosen
    * by hash order so the "index build" is one tiny collect); every vector
    * is assigned to its nearest centroid list; a query probes its `nProbe`
    * nearest centroids and reranks exactly within those lists.
    *
    * Scale shape: centroids are a driver-side array baked into the task
    * closures (they are small BY DESIGN — sqrt(n)-ish); the only shuffle is
    * the equi-join on centroid_id. Complements the hyperplane-LSH variant:
    * IVF adapts to the data distribution (clustered embeddings), LSH is
    * distribution-free.
    */
  def ivfTopK(corpus: DataFrame, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus
      .select(col(idCol).cast("long").as("vid"), asDouble(col(vecCol)).as("vec"))
      .as[(Long, Array[Double])]
    // deterministic centroid sample: smallest nCentroids ids by a hash of
    // the id (≈ uniform random, reproducible, one small collect)
    val centroids: Array[Array[Double]] = base
      .map { case (vid, v) => (graft.core.Murmur2.hashString(vid.toString, 7) & 0xffffffffL, v) }
      .toDF("h", "v").orderBy("h").limit(nCentroids)
      .select("v").as[Array[Double]].collect()
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v else v.map(_ / n)
      }

    require(centroids.nonEmpty, "ivfTopK: empty corpus (no centroids)")

    def nearestCentroids(v: Array[Double], m: Int): Array[Int] = {
      val nv = math.sqrt(v.map(x => x * x).sum)
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < v.length) { d += v(j) * c(j); j += 1 }
        (if (nv == 0) 0.0 else d / nv, i)
      }
      scored.sortBy { case (s, i) => (-s, i) }.take(m).map(_._2)
    }

    val assigned = base
      .mapPartitions(_.map { case (vid, v) => (vid, v, nearestCentroids(v, 1)(0)) })
      .toDF("nbr_id", "nbr_vec", "centroid_id")
    val probes = base
      .mapPartitions(_.flatMap { case (vid, v) =>
        nearestCentroids(v, nProbe).iterator.map(c => (vid, v, c))
      })
      .toDF("query_id", "q_vec", "centroid_id")
    val scored = probes
      .join(assigned, "centroid_id")
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn(
        "cosine",
        dot(col("q_vec"), col("nbr_vec")) / (norm(col("q_vec")) * norm(col("nbr_vec")))
      )
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cosine")
  }

  /** Driver-side exact cosine-threshold pairs over a small collected vector
    * set — the oracle for recall tests and probes (RecallProbe,
    * OperatorsSpec). O(n²); zero-norm vectors never match.
    */
  def exactCosinePairsLocal(vecs: Array[(Long, Array[Double])],
                            minCosine: Double): Set[(Long, Long)] = {
    val out = scala.collection.mutable.Set[(Long, Long)]()
    val sorted = vecs.sortBy(_._1)
    for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
      val (ia, va) = sorted(i); val (ib, vb) = sorted(j)
      var d = 0.0; var na = 0.0; var nb = 0.0; var k = 0
      while (k < va.length) { d += va(k) * vb(k); na += va(k) * va(k); nb += vb(k) * vb(k); k += 1 }
      if (na > 0 && nb > 0 && d / (math.sqrt(na) * math.sqrt(nb)) >= minCosine)
        out += ((ia, ib))
    }
    out.toSet
  }

  /** Embedding-cosine near-duplicate pairs: all (i < j) pairs with cosine >=
    * minCosine, found through the LSH candidate join (not a cross join).
    */
  def embeddingNearDupPairs(corpus: DataFrame, minCosine: Double, dim: Int,
                            nTables: Int = 12, bandBits: Int = 8, seed: Long = 42L,
                            multiProbe: Boolean = true,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sketch = sketchRows(corpus, dim, nTables, bandBits, seed, idCol, vecCol)
    val exploded = bucketIds(sketch)
    // multiprobe matters MORE here than for top-k: near-dup thresholds like
    // cosine 0.4 are far pairs (per-hyperplane agreement ~0.63), where exact
    // bucket collision is rare (p^bits) — measured recall 0.20 without
    // multiprobe vs 0.94 with, at identical table count (RecallProbe)
    val a = (if (multiProbe) multiProbeIds(exploded, bandBits) else exploded).alias("a")
    val b = exploded.alias("b")
    val candIds = a
      .join(
        b,
        col("a.table_idx") === col("b.table_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vid") < col("b.vid")
      )
      .select(col("a.vid").as("doc1"), col("b.vid").as("doc2"))
      .distinct()
    val vecs = sketch.select(col("vid"), col("vec"))
    candIds
      .join(vecs.select(col("vid").as("doc1"), col("vec").as("v1")), "doc1")
      .join(vecs.select(col("vid").as("doc2"), col("vec").as("v2")), "doc2")
      .withColumn("cosine", dot(col("v1"), col("v2")) / (norm(col("v1")) * norm(col("v2"))))
      .filter(col("cosine") >= minCosine)
      .select("doc1", "doc2", "cosine")
  }
}
