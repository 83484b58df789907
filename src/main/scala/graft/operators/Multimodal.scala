package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample run as narrow typed mapPartitions batches.
  *
  * STUB BOUNDARY: this container ships no image/audio codecs, so
  * [[StubCodec.decode]] is a clearly-marked deterministic fake (it
  * synthesizes "pixels" from the payload bytes). Everything around it — the
  * schema, the binary column handling, the partition-batched UDF shape, the
  * feature vectors it feeds into Similarity — is real and tested; swapping
  * in a real codec changes only the body of `decode`.
  */
object Multimodal {

  /** Typed media row: the lakehouse-side schema for multimodal assets. */
  final case class MediaAsset(
      asset_id: Long,
      modality: String, // "image" | "audio" | "video"
      mime: String,
      width: Int,       // 0 where not applicable
      height: Int,
      duration_ms: Long,
      payload: Array[Byte]
  )

  final case class MediaFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Long,
      byte_entropy: Double,
      histogram: Array[Double], // 16-bin byte histogram (the "features")
      thumb_w: Int,
      thumb_h: Int
  )

  /** Deterministic fake codec. A real deployment replaces `decode` with an
    * actual image/audio decode (??? boundary); the Spark-side contract
    * (bytes in, fixed-shape features out, pure per-row) is what matters.
    */
  object StubCodec {
    /** STUB: "decodes" a payload into a byte stream. Real impl: ??? */
    def decode(payload: Array[Byte]): Array[Byte] = payload

    def histogram16(bytes: Array[Byte]): Array[Double] = {
      val h = new Array[Double](16)
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1.0; i += 1 }
      if (bytes.length > 0) { var j = 0; while (j < 16) { h(j) /= bytes.length; j += 1 } }
      h
    }

    def entropy(hist: Array[Double]): Double = {
      var e = 0.0
      var i = 0
      while (i < hist.length) {
        if (hist(i) > 0) e -= hist(i) * math.log(hist(i)) / math.log(2)
        i += 1
      }
      e
    }

    /** STUB resize: computes the target thumbnail box (aspect-preserving,
      * max side `maxSide`) without touching pixels. Real impl: ???
      */
    def thumbBox(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      if (w <= 0 || h <= 0) (0, 0)
      else if (w >= h) (maxSide, math.max(1, h * maxSide / w))
      else (math.max(1, w * maxSide / h), maxSide)
    }
  }

  /** Synthesize a deterministic media-asset table from any (id, text) table
    * — payload bytes are a pure function of the text. Lets the multimodal
    * path run in this codec-less sandbox with real binary columns.
    */
  def synthesizeAssets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = (if (text == null) "" else text).getBytes("UTF-8")
        val modality = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val mime = modality match {
          case "image" => "image/png"; case "audio" => "audio/wav"; case _ => "video/mp4"
        }
        val w = if (modality == "image" || modality == "video") 64 + (id % 13).toInt * 32 else 0
        val h = if (w > 0) 48 + (id % 7).toInt * 32 else 0
        val dur = if (modality != "image") 1000L + (id % 60) * 500L else 0L
        MediaAsset(id, modality, mime, w, h, dur, bytes)
      })
  }

  /** Feature extraction: decode (stub) + 16-bin byte histogram + entropy +
    * thumbnail box, batched per partition. This is the operator shape a
    * real pipeline uses for CLIP-style embedding extraction: narrow, no
    * shuffle, binary payload never leaves the executor.
    */
  def extractFeatures(assets: Dataset[MediaAsset], thumbMaxSide: Int = 256): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val decoded = StubCodec.decode(a.payload)
      val hist = StubCodec.histogram16(decoded)
      val (tw, th) = StubCodec.thumbBox(a.width, a.height, thumbMaxSide)
      MediaFeatures(a.asset_id, a.modality, decoded.length.toLong, StubCodec.entropy(hist), hist, tw, th)
    })
  }

  /** Frame sampling plan for video assets: every `everyMs` ms, capped at
    * `maxFrames` — emits (asset_id, frame_idx, ts_ms) rows via a sequence
    * expression (no UDF). The actual pixel grab is the ??? codec boundary.
    */
  def sampleFramePlan(assets: DataFrame, everyMs: Long = 1000L, maxFrames: Int = 32): DataFrame =
    assets
      .filter(col("modality") === "video" && col("duration_ms") > 0)
      .select(
        col("asset_id"),
        posexplode(
          slice(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)), 1, maxFrames)
        ).as(Seq("frame_idx", "ts_ms"))
      )
}
