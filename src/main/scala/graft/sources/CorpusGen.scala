package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code corpus generator.
  *
  * Produces the input table the engine is specified against
  * (BASELINE.json input_hint): `(repo, path, commit, lang, content)`, with
  * planted duplicate structure that exercises every hard case:
  *
  *   - exact duplicates (vendored identical files across repos)
  *   - near duplicates (small tail edits — same file at a later "commit")
  *   - boilerplate/license clones (the mega-skew LSH bucket)
  *   - sub-shingle-size files (the Q3 all-0xFFFFFFFF bucket)
  *   - unique files (the bulk)
  *
  * Determinism: content is a pure function of (seed, file index) via a
  * per-row java.util.Random seeded with a splitmix-style mix — generation
  * is distributed (spark.range -> mapPartitions-ish select over id) and
  * reproducible at any partition count. doc_id is assigned as
  * row_number() over (repo, path, commit) - 1 (SURVEY.md §1.1).
  */
object CorpusGen {

  private val keywords = Array(
    "def", "val", "var", "class", "object", "import", "return", "match",
    "case", "if", "else", "while", "for", "new", "extends", "override",
    "private", "final", "map", "filter", "reduce", "fold", "apply",
    "index", "buffer", "stream", "batch", "shuffle", "partition", "hash",
    "join", "sort", "merge", "scan", "query", "plan", "row", "column"
  )

  private val license = (
    "Licensed under the Apache License Version 2 0 you may not use this " +
      "file except in compliance with the License You may obtain a copy " +
      "of the License at http www apache org licenses LICENSE 2 0 Unless " +
      "required by applicable law or agreed to in writing software " +
      "distributed under the License is distributed on an AS IS BASIS " +
      "WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND either express or implied"
  )

  final case class SourceFile(repo: String, path: String, commit: String, lang: String, content: String)

  /** Content of file `i` under `seed` — pure and stable. */
  def fileAt(i: Long, seed: Long, nFiles: Long): SourceFile = {
    val rng = new java.util.Random(mix(seed ^ i))
    val repo = f"org/repo-${(i % math.max(1, nFiles / 50)).toInt}%04d"
    val langs = Array("scala", "java", "py", "go", "c")
    val lang = langs(rng.nextInt(langs.length))
    val kind = i % 20 match {
      case 0 | 1            => "license"   // 10%: boilerplate clones (skew bucket)
      case 2                => "tiny"      // 5%: < shingle_size tokens (Q3)
      case 3                => "exact_dup" // 5%: exact dup of a base file
      case 4 | 5            => "near_dup"  // 10%: near dup of a base file
      case _                => "unique"
    }
    val commit = f"${mix(seed ^ (i * 31 + 7))}%040x".takeRight(40)
    // clones must point at an index whose OWN file is unique-kind
    // (i % 20 >= 6), otherwise the planted "dup" duplicates nothing:
    // the previous block's first unique slot, or this block's for block 0.
    def cloneBase: Long = {
      val blockStart = i - (i % 20)
      if (blockStart >= 20) blockStart - 20 + 6 else blockStart + 6
    }
    kind match {
      case "license" =>
        SourceFile(repo, s"LICENSE-${i % 3}.txt", commit, "txt", license)
      case "tiny" =>
        SourceFile(repo, s"src/empty_$i.$lang", commit, lang, if (rng.nextBoolean()) "x" else "x y")
      case "exact_dup" =>
        SourceFile(repo, s"vendor/copy_$i.$lang", commit, lang, uniqueBody(cloneBase, seed))
      case "near_dup" =>
        val base = uniqueBody(cloneBase, seed)
        // tail edit: replace the last ~3 tokens — near-dup at high Jaccard
        val toks = base.split(" ")
        val edited = (toks.dropRight(3) ++ Array("patched", s"rev$i", "end")).mkString(" ")
        SourceFile(repo, s"src/edit_$i.$lang", commit, lang, edited)
      case _ =>
        SourceFile(repo, s"src/file_$i.$lang", commit, lang, uniqueBody(i, seed))
    }
  }

  /** Body of the "unique" file family member at index i (also the clone base
    * for exact/near dups). ~120 tokens of keyword soup + distinguishing ids.
    */
  private def uniqueBody(i: Long, seed: Long): String = {
    val base = if (i < 0) 0L else i
    val rng = new java.util.Random(mix(seed ^ (base * 1000003L + 17)))
    val n = 80 + rng.nextInt(80)
    val sb = new StringBuilder
    sb.append(s"module m$base begin ")
    var t = 0
    while (t < n) {
      sb.append(keywords(rng.nextInt(keywords.length)))
      if (t % 11 == 5) sb.append(s" id${rng.nextInt(5000)}")
      sb.append(' ')
      t += 1
    }
    sb.append(s"end module m$base")
    sb.toString
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Distributed deterministic generation of the source_files table. */
  def sourceFiles(spark: SparkSession, nFiles: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark
      .range(0, nFiles)
      .as[Long]
      .map(i => fileAt(i, seed, nFiles))
      .toDF()
  }

  /** source_files + derived doc_id (stable natural-key ordering, §1.1).
    *
    * Scalable row-numbering: range-partition + sort by the natural key,
    * then zipWithIndex (one extra count job to learn per-partition offsets —
    * no global single-partition window, which would serialize the corpus
    * through one task at 10^12 rows). RDD use here is the documented
    * "forced" exception: Spark has no distributed row_number without a
    * global Window.
    */
  def withDocIds(sourceFiles: DataFrame): DataFrame = {
    val spark = sourceFiles.sparkSession
    val sorted = sourceFiles
      .repartitionByRange(col("repo"), col("path"), col("commit"))
      .sortWithinPartitions("repo", "path", "commit")
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, nullable = false)
    )
    val rows = sorted.rdd
      .zipWithIndex()
      .map { case (row, idx) => org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx) }
    spark.createDataFrame(rows, schema)
  }

  /** Fast path for the synthetic corpus: the generator index IS a stable
    * unique id, so benchmarks skip the natural-key sort entirely.
    */
  def sourceFilesWithIds(spark: SparkSession, nFiles: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark
      .range(0, nFiles)
      .as[Long]
      .map(i => (i, fileAt(i, seed, nFiles)))
      .toDF("doc_id", "file")
      .select(col("doc_id"), col("file.repo").as("repo"), col("file.path").as("path"),
        col("file.commit").as("commit"), col("file.lang").as("lang"),
        col("file.content").as("content"))
  }

  /** The FIXTURES.md §4 golden 8-doc corpus, exactly. */
  def goldenDocs: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the " +
      "green hills and birds sing in tall trees near the old stone bridge"
    val words = base.split(" ")
    val d3 = "Completely different content about database systems and query " +
      "optimization with hash joins and sort merge aggregation pipelines " +
      "running on distributed clusters every day"
    Seq(
      0L -> words.mkString(" "),
      1L -> words.mkString(" "),
      2L -> (words.dropRight(4) ++ Seq("beside", "a", "calm", "river")).mkString(" "),
      3L -> d3,
      4L -> (d3.split(" ").dropRight(1) :+ "night").mkString(" "),
      5L -> ("unique text alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"),
      6L -> "short doc",
      7L -> "another short"
    )
  }

  def goldenCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    goldenDocs.toDF("doc_id", "content")
  }

  /** Ingest invariant (BASELINE.json input_hint): per-row sha256(content)
    * equality between the table and a reference corpus of `<i>.txt` files.
    * Returns the number of mismatching rows (0 = invariant holds).
    */
  def ingestShaMismatches(table: DataFrame, txtDir: String): Long = {
    val spark = table.sparkSession
    import spark.implicits._
    val dir = new java.io.File(txtDir)
    val fileShas = dir
      .listFiles()
      .filter(_.getName.endsWith(".txt"))
      .map { f =>
        val id = f.getName.stripSuffix(".txt").toLong
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val sha = java.security.MessageDigest
          .getInstance("SHA-256")
          .digest(bytes)
          .map("%02x".format(_))
          .mkString
        (id, sha)
      }
      .toSeq
      .toDF("doc_id", "file_sha")
    table
      .withColumn("row_sha", sha2(col("content"), 256))
      .join(fileShas, "doc_id")
      .filter(col("row_sha") =!= col("file_sha"))
      .count()
  }
}
