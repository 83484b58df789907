package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: LSH-ANN recall@5 vs brute force across
  * (nTables, bandBits) on the sf0.001 embeddings. Informs the production
  * defaults + the OperatorsSpec recall assertion.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val bf = Similarity.bruteForceTopK(e, e, k = 5)
      .select("query_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for {
      (nTables, bandBits, mp, nProbes) <- Seq(
        (24, 5, false, 0), (32, 5, false, 0), // probe-free baselines
        (16, 8, true, 8), // r2 default: blind Hamming-1 (all flips)
        (16, 8, true, 6), (20, 8, true, 5),
        (24, 8, true, 4), (24, 8, true, 5))
    } {
      val t0 = System.nanoTime()
      val lsh = Similarity.lshTopK(e, k = 5, dim = 64, nTables = nTables,
          bandBits = bandBits, multiProbe = mp, nProbes = nProbes)
        .select("query_id", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"nTables=$nTables%2d bandBits=$bandBits%2d mp=$mp%5s T=$nProbes%2d recall=${(bf intersect lsh).size.toDouble / bf.size}%.3f sec=$sec%.1f")
    }
    // IVF recall vs (nProbe, lloydIters)
    for ((nProbe, iters) <- Seq((8, 0), (8, 2), (8, 4), (10, 2), (10, 4), (12, 2), (16, 2))) {
      val t0 = System.nanoTime()
      val ivf = Similarity.ivfTopK(e, k = 5, nCentroids = 16, nProbe = nProbe,
          lloydIters = iters)
        .select("query_id", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"ivf nProbe=$nProbe%2d/16 lloyd=$iters%d recall=${(bf intersect ivf).size.toDouble / bf.size}%.3f sec=$sec%.1f")
    }
    // embedding near-dup pair recall: exact threshold pairs vs LSH-candidate pairs
    import spark.implicits._
    val vecs = e.select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val exact = Similarity.exactCosinePairsLocal(vecs, 0.4)
    for ((nt, bb) <- Seq((12, 8), (8, 8), (16, 10))) {
      val got = Similarity.embeddingNearDupPairs(e, minCosine = 0.4, dim = 64,
          nTables = nt, bandBits = bb)
        .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      println(f"neardup nt=$nt bb=$bb exact=${exact.size} found=${got.size} recall=${(exact intersect got).size.toDouble / math.max(1, exact.size)}%.3f")
    }
    spark.stop()
  }
}
