package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample run as narrow typed mapPartitions batches.
  *
  * CODEC BOUNDARY: images are REAL — synthesizeAssets encodes actual PNGs
  * and [[Codec.decode]] decodes actual pixels via `javax.imageio` (ships in
  * the JDK). Audio/video stay clearly-marked deterministic stubs (this
  * container ships no audio/video codecs); everything around them — the
  * schema, the binary column handling, the partition-batched kernel shape,
  * the feature vectors feeding Similarity — is real and tested, and
  * swapping in a real codec changes only the body of `decode`.
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
      histogram: Array[Double], // 16-bin histogram over decoded bytes
      thumb_w: Int,
      thumb_h: Int
  )

  /** The decode boundary. Images: real `javax.imageio` PNG decode to
    * RGB-interleaved pixel bytes. Audio/video: STUB passthrough (no codec
    * in this container) — a real deployment swaps only this arm.
    */
  object Codec {
    def decode(modality: String, payload: Array[Byte]): Array[Byte] = modality match {
      case "image" =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) Array.emptyByteArray
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Byte](w * h * 3)
          val row = new Array[Int](w)
          var idx = 0
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val rgb = row(x)
              out(idx) = ((rgb >> 16) & 0xff).toByte
              out(idx + 1) = ((rgb >> 8) & 0xff).toByte
              out(idx + 2) = (rgb & 0xff).toByte
              idx += 3
              x += 1
            }
            y += 1
          }
          out
        }
      case _ => payload // STUB: no audio/video codec ships with the JDK
    }

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

    /** Thumbnail target box (aspect-preserving, max side `maxSide`). */
    def thumbBox(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      if (w <= 0 || h <= 0) (0, 0)
      else if (w >= h) (maxSide, math.max(1, h * maxSide / w))
      else (math.max(1, w * maxSide / h), maxSide)
    }

    /** REAL aspect-preserving image resize (bilinear, JDK Graphics2D):
      * PNG bytes in, thumbnail PNG bytes out. Empty on undecodable input.
      */
    def resizePng(payload: Array[Byte], maxSide: Int): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) Array.emptyByteArray
      else {
        val (tw, th) = thumbBox(img.getWidth, img.getHeight, maxSide)
        if (tw == 0 || th == 0) Array.emptyByteArray
        else {
          val out = new java.awt.image.BufferedImage(tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, tw, th, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      }
    }

    /** Deterministic REAL PNG: pixels are a pure function of the seed
      * bytes (cycled over RGB channels), encoded with the JDK PNG writer.
      */
    def synthesizePng(w: Int, h: Int, seedBytes: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val src = if (seedBytes.nonEmpty) seedBytes else Array[Byte](0)
      val n = src.length
      var p = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = src(p % n) & 0xff
          val g = src((p + 1) % n) & 0xff
          val b = src((p + 2) % n) & 0xff
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          p += 3
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Synthesize a deterministic media-asset table from any (id, text) table
    * — image payloads are REAL PNGs (pixels a pure function of the text),
    * audio/video payloads are the raw text bytes behind the stub arm. Lets
    * the multimodal path run end-to-end in this sandbox with real binary
    * columns and a real decode.
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
        val payload =
          if (modality == "image") Codec.synthesizePng(w, h, bytes) else bytes
        MediaAsset(id, modality, mime, w, h, dur, payload)
      })
  }

  /** Feature extraction: decode (REAL for images) + 16-bin byte histogram
    * + entropy + thumbnail box, batched per partition. This is the operator
    * shape a real pipeline uses for CLIP-style embedding extraction:
    * narrow, no shuffle, binary payload never leaves the executor.
    */
  def extractFeatures(assets: Dataset[MediaAsset], thumbMaxSide: Int = 256): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val decoded = Codec.decode(a.modality, a.payload)
      val hist = Codec.histogram16(decoded)
      val (tw, th) = Codec.thumbBox(a.width, a.height, thumbMaxSide)
      MediaFeatures(a.asset_id, a.modality, decoded.length.toLong, Codec.entropy(hist), hist, tw, th)
    })
  }

  /** Row of the thumbnails table. */
  final case class Thumbnail(asset_id: Long, thumb_png: Array[Byte], thumb_w: Int, thumb_h: Int)

  /** REAL thumbnail generation for image assets: decode + bilinear resize +
    * PNG re-encode, batched per partition (narrow, no shuffle; payloads
    * never leave the executor). Non-image assets are filtered out.
    */
  def thumbnails(assets: Dataset[MediaAsset], maxSide: Int = 256): Dataset[Thumbnail] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .filter(_.modality == "image")
      .mapPartitions(_.flatMap { a =>
        val png = Codec.resizePng(a.payload, maxSide)
        if (png.isEmpty) Iterator.empty
        else {
          val (tw, th) = Codec.thumbBox(a.width, a.height, maxSide)
          Iterator.single(Thumbnail(a.asset_id, png, tw, th))
        }
      })
  }

  /** Frame sampling plan for video assets: every `everyMs` ms, capped at
    * `maxFrames` — emits (asset_id, frame_idx, ts_ms) rows via a sequence
    * expression (no UDF). The actual pixel grab is the stub codec boundary.
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
