package graft

import graft.functions.{TextExprs, VectorExprs}
import org.apache.spark.sql.functions._

/** The custom codegen'd expressions must be value-identical to the
  * higher-order-lambda formulations they replaced (which stay here as the
  * executable spec — they're correct, just interpreted/slow).
  */
class ExprSpec extends SparkSpec {

  test("ArrayAgreeI == aggregate(zip_with) positional agreement") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      val n = 1 + rng.nextInt(64)
      val a = Array.fill(n)(rng.nextInt(4) - 2)
      val b = Array.fill(n)(rng.nextInt(4) - 2)
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(
      VectorExprs.agreeI(col("a"), col("b")).as("fast"),
      aggregate(
        zip_with(col("a"), col("b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v
      ).as("slow")
    ).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }

  test("ArrayAgreeI: length mismatch and null arrays -> null") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1, 2)), Some(Array(1, 2, 3))),
      (None: Option[Array[Int]], Some(Array(1)))
    ).toDF("a", "b")
    val out = df.select(VectorExprs.agreeI(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)), out.mkString(","))
  }

  test("CountInVocab == size(filter(isInCollection)) incl. lowercase mode") {
    import spark.implicits._
    val vocab = Seq("the", "a", "of", "und")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = split(trim(col("text")), "\\s+")
    val got = docs.select(
      TextExprs.vocabCount(toks, vocab, lowercase = true).as("fast"),
      size(filter(toks, w => lower(w).isInCollection(vocab))).as("slow")
    ).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
    // mixed-case sanity without lowering
    val df2 = Seq(Array("The", "the", "THE", "of")).toDF("t")
    val r2 = df2.select(
      TextExprs.vocabCount(col("t"), vocab).as("exact"),
      TextExprs.vocabCount(col("t"), vocab, lowercase = true).as("lower")
    ).head()
    assert(r2.getInt(0) == 2 && r2.getInt(1) == 4, r2)
  }

  test("SumCharLengths == aggregate(0L, acc + length(w))") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = split(trim(col("text")), "\\s+")
    val got = docs.select(
      TextExprs.sumCharLengths(toks).as("fast"),
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)).as("slow")
    ).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("U64Fold(int/long arrays) == JVM twin; golden values; null -> null") {
    import graft.functions.U64Fold
    import spark.implicits._
    // golden pins (hand-derivable): empty = offset; [0] = offset*P;
    // negative ints fold as unsigned 32-bit
    assert(U64Fold.foldInts(Array.empty) == 1469598103934665603L)
    assert(U64Fold.foldInts(Array(0)) == 1469598103934665603L * 1000003L)
    assert(U64Fold.foldInts(Array(-1)) ==
      1469598103934665603L * 1000003L + 0xffffffffL)
    assert(U64Fold.foldLongs(Array(-1L)) ==
      1469598103934665603L * 1000003L - 1L)
    val rng = new scala.util.Random(11)
    val ints = Seq.tabulate(100) { i =>
      (i.toLong, Array.fill(rng.nextInt(130))(rng.nextInt()))
    }
    val gotI = ints.toDF("id", "a")
      .select(col("id"), VectorExprs.u64Fold(col("a")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ints.foreach { case (id, a) => assert(gotI(id) == U64Fold.foldInts(a)) }
    val longs = Seq.tabulate(100) { i =>
      (i.toLong, Array.fill(rng.nextInt(40))(rng.nextLong()))
    }
    val gotL = longs.toDF("id", "a")
      .select(col("id"), VectorExprs.u64Fold(col("a")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    longs.foreach { case (id, a) => assert(gotL(id) == U64Fold.foldLongs(a)) }
    val nullRow = Seq((1L, None: Option[Array[Int]])).toDF("id", "a")
      .select(VectorExprs.u64Fold(col("a"))).head()
    assert(nullRow.isNullAt(0))
  }
}
