package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Structured-Streaming ingest telemetry + stateful fingerprint dedup —
  * the watermark/windowed-agg and custom-state (mapGroupsWithState)
  * counterparts to StreamingDedup's foreachBatch LSH path.
  *
  * Both operators take a STREAMING DataFrame (readStream source) and return
  * a streaming result the caller sinks; both also work on batch frames for
  * testing the plan shape.
  */
object StreamingStats {

  /** Session conf that swaps the default HDFS-backed state store for
    * RocksDB — the provider for state that outgrows executor heap (true
    * 10^12-doc fingerprint dedup keeps one (long, long) PER DISTINCT
    * FINGERPRINT; RocksDB spills it to local SSD with incremental
    * checkpointing instead of materializing the full map on-heap).
    * rocksdbjni ships in /opt/spark/jars. Set BEFORE the query starts:
    *
    *   StreamingStats.RocksDBProviderConf match { case (k, v) => spark.conf.set(k, v) }
    *
    * The provider is fixed per checkpoint location at first start; changing
    * it later requires a fresh checkpoint dir.
    */
  val RocksDBProviderConf: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Event-time windowed ingest rates with a watermark: per (window, lang)
    * doc and byte counts. The watermark bounds state: windows older than
    * `lateness` past the max seen event time are finalized and dropped from
    * the store, so state size is O(active windows), not O(stream lifetime)
    * — the thing that matters on a month-long 100 TB ingest.
    *
    * Input columns: event_time (timestamp), lang (string), text (string).
    */
  def ingestRates(docs: DataFrame, windowLen: String = "1 minute",
                  lateness: String = "2 minutes"): DataFrame =
    docs
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowLen), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("n_chars")
      )
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("lang"), col("n_docs"), col("n_chars"))

  /** Per-key dedup state: the first doc that carried this fingerprint. */
  final case class FpState(first_doc_id: Long, n_seen: Long)

  /** Output row: every doc tagged as original or duplicate-of-first. */
  final case class FpVerdict(doc_id: Long, fingerprint: Long,
                             is_dup: Boolean, first_doc_id: Long)

  /** Stateful exact-dedup over a stream via mapGroupsWithState: keyed by
    * the 64-bit token-stream fingerprint (TextAnalysis.fingerprint64 —
    * formatting-invariant), state = first doc seen per fingerprint,
    * surviving across micro-batches through the state store. Each batch's
    * docs are emitted tagged is_dup + the original's id.
    *
    * Scale shape: state is one (long, long) per DISTINCT fingerprint —
    * compact enough for the HDFS-backed store; at true 10^12 scale swap in
    * the RocksDB provider via [[RocksDBProviderConf]] (config, not code —
    * StreamingStatsSpec runs this operator under both providers).
    * Watermark-less NoTimeout is deliberate: exact dedup never expires
    * originals.
    */
  def fingerprintDedup(docs: Dataset[(Long, String)]): Dataset[FpVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    docs
      .map { case (id, text) =>
        val fp = graft.functions.TextAnalysis.fingerprint64(
          graft.core.Tokenizer.tokenize(if (text == null) "" else text).iterator)
        (fp, id)
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[FpState, FpVerdict](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (fp: Long, rows: Iterator[(Long, Long)], state: GroupState[FpState]) =>
          val ids = rows.map(_._2).toArray.sorted
          val prior = state.getOption
          val first = prior.map(_.first_doc_id).getOrElse(ids.head)
          state.update(FpState(first, prior.map(_.n_seen).getOrElse(0L) + ids.length))
          ids.iterator.map(id => FpVerdict(id, fp, id != first, first))
      }
  }
}
