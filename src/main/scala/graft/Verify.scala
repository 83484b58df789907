package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.buffer.pageSize", "8m") // G1 humongous-alloc fix, see BENCHMARKS.md
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // On failure: delete the (possibly partial/stale) dir and leave a
    // _FAILED.json marker — the driver's q* glob then finds no parquet and
    // reports the query as broken instead of comparing stale bits.
    def failed(dir: String, name: String, e: Throwable): Unit = {
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      val d = new java.io.File(dir)
      if (d.exists()) rm(d)
      d.mkdirs()
      Files.writeString(Paths.get(s"$dir/_FAILED.json"),
        s"""{"query":"$name","error":${"\"" + e.toString.replace("\\", "\\\\")
          .replace("\"", "\\\"").replaceAll("[\\x00-\\x1f]", " ") + "\""}}""")
    }
    // Array-bearing replay substrates first: the driver never compares the
    // _artifact_* dirs (its pandas sort cannot hash ndarray cells), but the
    // scalar digest queries' oracles read them via @GRAFT_OUT@.
    SparkEntry.artifacts.foreach { case (name, fn) =>
      val dir = s"$outDir/_artifact_$name"
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(dir)
      catch { case e: Throwable => failed(dir, s"_artifact_$name", e) }
      finally spark.catalog.clearCache()
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable => failed(s"$outDir/$name", name, e) }
      // operators persist their self-joined kernel subtrees; drop them
      // between queries so 25 queries don't accumulate cached tables
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // @GRAFT_OUT@ lets an oracle read a query's OWN committed output (the
    // q_clean_tail pattern: recompute the SQL-expressible tail over the
    // Spark-produced survivor set) — spliced here because only Verify
    // knows the driver's output dir
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("@GRAFT_OUT@", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
