package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: wall time of the simhash pair path at sf0.1, fused
  * chunk-salted pair gen (round-7 skew armor) vs the round-6 raw
  * self-join shape, min-of-3 each. Measures whether the armor costs
  * wall time in the common no-mega-group case.
  * Usage: runMain graft.tools.HammingProbe /root/testdata/sf0.1
  */
object HammingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // r6 shape: raw block self-join + doc1<doc2 + distinct + hash join-back
    def rawSelfJoin(): Long = {
      val sh = Dedup.simHashes(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bw = 16
      val mask = (1L << bw) - 1L
      val blocks = sh.select(
          col("doc_id").cast("long").as("doc_id"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("simhash"), b * bw).bitwiseAND(lit(mask))): _*)
          ).as(Seq("block_idx", "block_val")))
      val cand = blocks.as("a").join(blocks.as("b"),
          Seq("block_idx", "block_val"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .distinct()
      val h1 = sh.select(col("doc_id").cast("long").as("doc1"), col("simhash").as("_h1"))
      val h2 = sh.select(col("doc_id").cast("long").as("doc2"), col("simhash").as("_h2"))
      val n = cand.join(h1, "doc1").join(h2, "doc2")
        .select(col("doc1"), col("doc2"),
          bit_count(col("_h1").bitwiseXOR(col("_h2"))).as("hamming"))
        .filter(col("hamming") <= 3)
        .count()
      sh.unpersist()
      n
    }

    def fused(): Long = {
      val r = Dedup.simHashPairs(docs, maxHamming = 3).count()
      spark.catalog.clearCache()
      r
    }

    def timed(name: String, reps: Int)(f: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name%-10s $s%6.2f s  rows=$n")
        s
      }
      println(f"[probe] $name%-10s min=${times.min}%6.2f med=${times.sorted.apply(times.size / 2)}%6.2f")
    }

    // warm both paths once at tiny scale via a limit
    val tiny = docs.limit(50).cache(); tiny.count()
    Dedup.simHashPairs(tiny, maxHamming = 3).count()
    spark.catalog.clearCache()

    def pureEmit(): Long = {
      val r = Dedup.simHashPairs(docs, maxHamming = 3,
        starCapGroupSize = Some(Int.MaxValue)).count()
      spark.catalog.clearCache()
      r
    }

    timed("adaptive", 3)(fused())
    timed("rawjoin", 3)(rawSelfJoin())
    timed("pureemit", 3)(pureEmit())

    // the decision job alone, over a WARM kernel cache: what the adaptive
    // default adds on top of the raw join at this scale
    {
      val sh = Dedup.simHashes(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sh.count() // materialize the cache outside the timed region
      val bw = 16
      val mask = (1L << bw) - 1L
      val blocks = sh.select(
          col("doc_id").cast("long").as("doc_id"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("simhash"), b * bw).bitwiseAND(lit(mask))): _*)
          ).as(Seq("block_idx", "block_val")))
      timed("decision", 3) {
        val mega = !blocks.groupBy("block_idx", "block_val")
          .agg(count(lit(1)).as("bn")).filter(col("bn") > 4096).isEmpty
        if (mega) 1L else 0L
      }
      sh.unpersist()
    }
    spark.stop()
  }
}
