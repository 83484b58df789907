package graft

import graft.core.MinHashConfig
import graft.operators.{ConnectedComponents, MinHashPipeline}
import org.apache.spark.sql.functions._

/** Skew armor under a deliberately hostile corpus: one identical-content
  * clique of 1,000 docs inside a 3,000-doc corpus (the license/boilerplate
  * mega-bucket, SURVEY.md Q3-adjacent skew case).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val cliqueN = 1000
  private val cfg = MinHashConfig(shingleSize = 3, signatureSize = 32, nBandRows = 4, seed = 13, threshold = 0.8)

  private lazy val docs = {
    val license = "licensed under the apache license version two you may not use " +
      "this file except in compliance with the license you may obtain a copy"
    val rows = (0 until cliqueN).map(i => (i.toLong, license)) ++
      (cliqueN until 3000).map { i =>
        val rng = new java.util.Random(i)
        val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
          "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
        (i.toLong, (0 until 60).map(_ => words(rng.nextInt(words.length)) + rng.nextInt(1000)).mkString(" "))
      }
    rows.toDF("doc_id", "content").repartition(8).cache()
  }

  test("star-cap mode: linear pair count, full clique still one cluster") {
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF().cache()
    val cands = MinHashPipeline.candidates(sigs, starCapBucketSize = Some(64))
    val cliqueCands = cands.filter(col("doc1") < cliqueN && col("doc2") < cliqueN)
    // star mode: the mega-bucket contributes (n-1) hub pairs, not C(n,2)
    assert(cliqueCands.count() == (cliqueN - 1).toLong)
    val pairs = MinHashPipeline.pairs(cands, sigs, cfg)
    val clusters = ConnectedComponents.cluster(pairs, docs.select("doc_id"))
    val licenseClusters = clusters.filter(col("doc_id") < cliqueN)
      .select("cluster_id").distinct().count()
    assert(licenseClusters == 1)
    sigs.unpersist()
  }

  test("salted parity mode: exact C(n,2) clique pairs, distributed generation") {
    val sigs = MinHashPipeline.signatures(docs, cfg).toDF().cache()
    val cands = MinHashPipeline.candidates(sigs, None, saltChunkSize = 128)
    val cliquePairs = cands.filter(col("doc1") < cliqueN && col("doc2") < cliqueN).count()
    assert(cliquePairs == cliqueN.toLong * (cliqueN - 1) / 2)
    sigs.unpersist()
  }
}
