package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample run as narrow typed mapPartitions batches.
  *
  * CODEC BOUNDARY: images are REAL — synthesizeAssets encodes actual PNGs
  * and [[Codec.decode]] decodes actual pixels via `javax.imageio` (ships in
  * the JDK). Audio is REAL too — payloads are actual RIFF/WAVE 16-bit PCM
  * files written and parsed via `javax.sound.sampled` (also JDK), with
  * decode, DSP features (RMS, zero-crossing rate) and linear resampling
  * (the audio analog of thumbnails). Video is REAL as well: payloads are
  * actual YUV4MPEG2 (.y4m) streams — the standard UNCOMPRESSED video
  * container (ffmpeg/mplayer-compatible: ASCII stream header, `FRAME`
  * markers, planar 4:2:0 YUV) — written and parsed by [[Codec.encodeY4m]]/
  * [[Codec.decodeY4m]], with real frame grabs (YUV->RGB->PNG via the image
  * path), per-frame luma statistics, a temporal-motion measure and frame-rate resampling.
  * Compressed codecs (H.264 etc.) would swap in at the same boundary; the
  * container round trip, pixel math and every operator around it are real.
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
    * RGB-interleaved pixel bytes. Audio: real `javax.sound.sampled` WAV
    * decode to raw PCM sample bytes. Video: real YUV4MPEG2 parse to the
    * concatenated raw planar YUV frame bytes.
    */
  object Codec {
    def decode(modality: String, payload: Array[Byte]): Array[Byte] = modality match {
      case "audio" =>
        try decodeWavPcm(payload)
        catch { case _: Exception => Array.emptyByteArray } // not a WAV
      case "video" =>
        try {
          val v = decodeY4m(payload)
          val out = new Array[Byte](v.frames.map(_.length).sum)
          var off = 0
          v.frames.foreach { f =>
            System.arraycopy(f, 0, out, off, f.length); off += f.length
          }
          out
        } catch { case _: Exception => Array.emptyByteArray } // not a Y4M
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
      case _ => Array.emptyByteArray // unknown modality
    }

    /** A decoded YUV4MPEG2 stream: planar 4:2:0 frames (Y w×h, then U and V
      * each (w/2)×(h/2) — frame size w·h·3/2).
      */
    final case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                              frames: IndexedSeq[Array[Byte]]) {
      def durationMs: Long =
        if (fpsNum == 0) 0L else frames.length.toLong * 1000L * fpsDen / fpsNum
    }

    /** REAL Y4M (YUV4MPEG2) encode: the standard uncompressed video
      * container — one ASCII stream header (`YUV4MPEG2 W.. H.. F..:..
      * Ip A1:1 C420`), then per frame an ASCII `FRAME` marker followed by
      * raw planar 4:2:0 YUV. The output plays in ffmpeg/mplayer as-is.
      * Dims must be even (4:2:0 subsampling).
      */
    def encodeY4m(frames: Seq[Array[Byte]], w: Int, h: Int,
                  fpsNum: Int, fpsDen: Int = 1): Array[Byte] = {
      require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, s"C420 needs even dims, got ${w}x$h")
      val frameBytes = w * h * 3 / 2
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420\n".getBytes("US-ASCII"))
      frames.foreach { f =>
        require(f.length == frameBytes, s"frame has ${f.length} bytes, want $frameBytes")
        bos.write("FRAME\n".getBytes("US-ASCII"))
        bos.write(f)
      }
      bos.toByteArray
    }

    /** REAL Y4M parse (the inverse of [[encodeY4m]]); throws on anything
      * that is not a C420 YUV4MPEG2 stream.
      */
    def decodeY4m(payload: Array[Byte]): Y4mVideo = {
      var i = 0
      while (i < payload.length && payload(i) != '\n') i += 1
      require(i < payload.length, "no Y4M header line")
      val header = new String(payload, 0, i, "US-ASCII")
      val parts = header.split(" ")
      require(parts.nonEmpty && parts(0) == "YUV4MPEG2", s"not a Y4M stream: $header")
      var w = 0; var h = 0; var fn = 25; var fd = 1; var chroma = "420"
      parts.iterator.drop(1).filter(_.nonEmpty).foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'F' =>
            val a = p.substring(1).split(":"); fn = a(0).toInt; fd = a(1).toInt
          case 'C' => chroma = p.substring(1)
          case _   => () // interlacing/aspect/extension params: irrelevant here
        }
      }
      require(w > 0 && h > 0, s"bad dims in Y4M header: $header")
      require(chroma.startsWith("420"),
        s"unsupported chroma C$chroma (this pipeline writes C420)")
      val frameBytes = w * h * 3 / 2
      val frames = scala.collection.immutable.IndexedSeq.newBuilder[Array[Byte]]
      var pos = i + 1
      while (pos < payload.length) {
        var e = pos
        while (e < payload.length && payload(e) != '\n') e += 1
        val marker = new String(payload, pos, e - pos, "US-ASCII")
        require(marker.startsWith("FRAME"), s"bad Y4M frame marker: $marker")
        pos = e + 1
        require(pos + frameBytes <= payload.length, "truncated Y4M frame")
        frames += java.util.Arrays.copyOfRange(payload, pos, pos + frameBytes)
        pos += frameBytes
      }
      Y4mVideo(w, h, fn, fd, frames.result())
    }

    /** Deterministic REAL Y4M: each frame's luma is a diagonal gradient
      * whose phase advances per frame (genuine inter-frame motion, keyed by
      * the seed bytes), chroma planes rotate slowly — the video analog of
      * [[synthesizePng]]/[[synthesizeWav]].
      */
    def synthesizeY4m(w: Int, h: Int, nFrames: Int, fpsNum: Int,
                      seedBytes: Array[Byte]): Array[Byte] = {
      val src = if (seedBytes.nonEmpty) seedBytes else Array[Byte](0)
      def sb(i: Int): Int = src(i % src.length) & 0xff
      // per-frame luma phase advance; min 2 keeps mean |ΔY| >= ~2/255 ≈
      // 0.016, so the motion measure is >0.01 for EVERY seed (step=1 would
      // measure ~0.008 on seeds whose first byte ≡ 0 mod 7)
      val step = 2 + sb(0) % 7
      val frames = (0 until nFrames).map { f =>
        val fr = new Array[Byte](w * h * 3 / 2)
        var idx = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            fr(idx) = ((x * 2 + y * 3 + f * step + sb(1)) & 0xff).toByte
            idx += 1
            x += 1
          }
          y += 1
        }
        java.util.Arrays.fill(fr, w * h, w * h + w * h / 4, ((sb(2) + f) & 0xff).toByte)
        java.util.Arrays.fill(fr, w * h + w * h / 4, fr.length, ((sb(3) + 2 * f) & 0xff).toByte)
        fr
      }
      encodeY4m(frames, w, h, fpsNum)
    }

    /** REAL video frame-rate resampling (the video analog of
      * [[resampleWav]]): Y4M bytes in, Y4M bytes out at `targetFps`, frames
      * chosen by nearest-source-frame sampling on the target timeline
      * (duplicating on upsample, dropping on downsample — production would
      * motion-interpolate; the container round trip and timeline math are
      * identical). Duration is preserved to the frame tick.
      */
    def resampleY4m(payload: Array[Byte], targetFps: Int): Array[Byte] = {
      require(targetFps > 0, s"targetFps must be positive: $targetFps")
      val v = decodeY4m(payload)
      if (v.frames.isEmpty || (v.fpsNum == targetFps && v.fpsDen == 1))
        return encodeY4m(v.frames, v.width, v.height, targetFps)
      val n = math.max(1, (v.durationMs * targetFps / 1000L).toInt)
      val frames = (0 until n).map { i =>
        val src = math.min(v.frames.length - 1,
          (i.toLong * v.fpsNum / (targetFps.toLong * v.fpsDen)).toInt)
        v.frames(src)
      }
      encodeY4m(frames, v.width, v.height, targetFps)
    }

    /** One REAL frame grab: planar 4:2:0 YUV -> RGB (BT.601 full-range
      * integer math) -> PNG bytes via the image path.
      */
    def frameToPng(v: Y4mVideo, frameIdx: Int): Array[Byte] = {
      val f = v.frames(frameIdx)
      val w = v.width
      val h = v.height
      val cw = w / 2
      val uOff = w * h
      val vOff = uOff + cw * (h / 2)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      def clamp(x: Int): Int = if (x < 0) 0 else if (x > 255) 255 else x
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = f(y * w + x) & 0xff
          val ci = (y / 2) * cw + (x / 2)
          val u = (f(uOff + ci) & 0xff) - 128
          val vv = (f(vOff + ci) & 0xff) - 128
          val r = clamp(yy + ((91881 * vv) >> 16))
          val g = clamp(yy - ((22554 * u + 46802 * vv) >> 16))
          val b = clamp(yy + ((116130 * u) >> 16))
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** The 16-bit mono PCM format every synthesized/processed WAV uses. */
    private def pcmFormat(sampleRate: Int): javax.sound.sampled.AudioFormat =
      new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
        /*signed=*/ true, /*bigEndian=*/ false)

    /** REAL WAV encode: 16-bit signed little-endian mono PCM samples ->
      * RIFF/WAVE bytes via the JDK's `javax.sound.sampled` writer.
      */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), pcmFormat(sampleRate), samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** REAL WAV parse via the JDK reader: (sampleRate, 16-bit LE mono PCM
      * samples). Throws on non-WAV input.
      */
    def decodeWav(payload: Array[Byte]): (Int, Array[Short]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"unsupported WAV shape: $fmt (this pipeline writes 16-bit LE mono)")
        val raw = ais.readAllBytes()
        val out = new Array[Short]((raw.length / 2).toInt)
        var i = 0
        while (i < out.length) {
          out(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
          i += 1
        }
        (fmt.getSampleRate.toInt, out)
      } finally ais.close()
    }

    /** Raw PCM byte stream of a WAV (the audio `decode` analog of pixel
      * bytes — feeds the shared histogram/entropy features).
      */
    def decodeWavPcm(payload: Array[Byte]): Array[Byte] = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try ais.readAllBytes() finally ais.close()
    }

    /** Deterministic REAL WAV: a two-tone signal whose frequencies and
      * amplitudes are a pure function of the seed bytes — the audio analog
      * of [[synthesizePng]].
      */
    def synthesizeWav(durationMs: Long, sampleRate: Int, seedBytes: Array[Byte]): Array[Byte] = {
      val src = if (seedBytes.nonEmpty) seedBytes else Array[Byte](0)
      def sb(i: Int): Int = src(i % src.length) & 0xff
      val f1 = 110.0 + sb(0) * 4.0  // 110..1130 Hz
      val f2 = 55.0 + sb(1) * 2.0
      val a1 = 0.35 + (sb(2) / 255.0) * 0.3
      val a2 = 0.1 + (sb(3) / 255.0) * 0.2
      val n = (durationMs * sampleRate / 1000L).toInt
      val samples = new Array[Short](n)
      val w1 = 2.0 * math.Pi * f1 / sampleRate
      val w2 = 2.0 * math.Pi * f2 / sampleRate
      var i = 0
      while (i < n) {
        val v = a1 * math.sin(w1 * i) + a2 * math.sin(w2 * i)
        samples(i) = math.max(-32768, math.min(32767, math.round(v * 32767))).toShort
        i += 1
      }
      encodeWav(samples, sampleRate)
    }

    /** REAL linear resampling (the audio analog of the bilinear image
      * resize): WAV bytes in at any of our PCM rates, WAV bytes out at
      * `targetRate`. Linear interpolation between neighboring samples —
      * production would use a windowed-sinc filter; the operator shape
      * (narrow per-partition batch, payload never leaves the executor) is
      * identical.
      */
    def resampleWav(payload: Array[Byte], targetRate: Int): Array[Byte] = {
      val (rate, in) = decodeWav(payload)
      if (rate == targetRate || in.isEmpty) return encodeWav(in, targetRate)
      val outLen = math.max(1, (in.length.toLong * targetRate / rate).toInt)
      val out = new Array[Short](outLen)
      val step = rate.toDouble / targetRate
      var i = 0
      while (i < outLen) {
        val pos = i * step
        val i0 = math.min(in.length - 1, pos.toInt)
        val i1 = math.min(in.length - 1, i0 + 1)
        val frac = pos - i0
        out(i) = math.round(in(i0) * (1.0 - frac) + in(i1) * frac).toShort
        i += 1
      }
      encodeWav(out, targetRate)
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

    /** 64-bit perceptual average hash (aHash) of an encoded image: real
      * decode, bilinear downscale to 8x8, integer luma
      * ((299r+587g+114b)/1000 — no IEEE in the fingerprint), threshold
      * strictly above the integer mean; bit (y*8+x). Near-identical
      * images land within small Hamming distance; undecodable input
      * hashes to 0 (gated out by the caller's modality filter — all-dark
      * real images also hash to 0 and would pair, by design: aHash has no
      * discrimination inside uniform images).
      */
    def aHash64(payload: Array[Byte]): Long = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return 0L
      val small = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 8, 8, null)
      } finally g.dispose()
      val luma = new Array[Int](64)
      var sum = 0L
      var i = 0
      while (i < 64) {
        val rgb = small.getRGB(i % 8, i / 8)
        val r = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff; val b = rgb & 0xff
        luma(i) = (299 * r + 587 * gg + 114 * b) / 1000
        sum += luma(i)
        i += 1
      }
      val mean = sum / 64
      var out = 0L
      i = 0
      while (i < 64) { if (luma(i) > mean) out |= (1L << i); i += 1 }
      out
    }

    /** 64 log-spaced probe frequencies for [[audioHash64]], 55..1600 Hz —
      * covers the synthesized two-tone range and stays below Nyquist for
      * every PCM rate >= 3200 Hz, so a RESAMPLED copy keeps its bands.
      */
    private[operators] val AudioHashBands: Array[Double] =
      Array.tabulate(64)(k => 55.0 * math.pow(1600.0 / 55.0, k / 63.0))

    /** 64-bit perceptual audio fingerprint: real WAV decode, Goertzel
      * power at 64 log-spaced physical frequencies over the whole clip,
      * per-sample-count normalization, bit = band power strictly above the
      * mean band power. Frequency-domain on purpose: it is invariant to
      * duration and to resampling (the two edits a re-ingested copy
      * actually has), where a windowed time-energy hash is degenerate on
      * stationary signals. Undecodable / sub-64-sample input hashes to 0.
      */
    def audioHash64(payload: Array[Byte]): Long = {
      val (pcm, rate) =
        try {
          val ais0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          // canonicalize to 16-bit signed little-endian MONO PCM (ADVICE
          // r6): the Goertzel loop below reads exactly that layout, and a
          // stereo / 8-bit / big-endian / compressed stream would otherwise
          // decode silently into a garbage fingerprint instead of the
          // documented undecodable -> 0. Already-canonical input (every
          // synthesized WAV) passes through untouched — bit-identical
          // hashes for the committed goldens; unconvertible encodings throw
          // into the catch -> 0L.
          val f0 = ais0.getFormat
          val canonical =
            f0.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              f0.getSampleSizeInBits == 16 && f0.getChannels == 1 && !f0.isBigEndian
          val ais =
            if (canonical) ais0
            else javax.sound.sampled.AudioSystem.getAudioInputStream(
              new javax.sound.sampled.AudioFormat(f0.getSampleRate, 16, 1, true, false),
              ais0)
          try (ais.readAllBytes(), ais.getFormat.getSampleRate.toDouble)
          finally { ais.close(); ais0.close() }
        } catch { case _: Exception => return 0L }
      val n = pcm.length / 2
      if (n < 64 || rate <= 0) return 0L
      val powers = new Array[Double](64)
      var k = 0
      while (k < 64) {
        // Goertzel at band frequency fk (skip bands at/above Nyquist —
        // they stay 0 and land below the mean, never spuriously set)
        val fk = AudioHashBands(k)
        if (fk < rate / 2.0) {
          val w = 2.0 * math.Pi * fk / rate
          val coeff = 2.0 * math.cos(w)
          var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
          var i = 0
          while (i < n) {
            // 16-bit little-endian PCM
            val sample = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toDouble
            s0 = sample + coeff * s1 - s2
            s2 = s1; s1 = s0
            i += 1
          }
          powers(k) = (s1 * s1 + s2 * s2 - coeff * s1 * s2) / (n.toDouble * n.toDouble)
        }
        k += 1
      }
      // MEAN threshold on purpose (a median cut was measured 20-bit
      // duration-UNstable: the mid-ranked bands are leakage skirts whose
      // ordering churns with the sample count). The mean cut keeps only
      // strong peaks -> a sparse peak-position code: identical content 0,
      // duration/rate edits <= a few bits, distinct tone sets disjoint
      // peak clusters. Hamming here measures PEAK overlap — clips whose
      // tones sit within a band step are perceptually close and DO pair;
      // that is the semantics, not a collision.
      var mean = 0.0
      k = 0
      while (k < 64) { mean += powers(k); k += 1 }
      mean /= 64.0
      var out = 0L
      k = 0
      while (k < 64) { if (powers(k) > mean) out |= (1L << k); k += 1 }
      out
    }

    /** 64-bit perceptual video fingerprint — the key-frame hash a
      * production tier starts with: real Y4M parse, grab the frame at the
      * temporal MIDPOINT (an fps-resampled copy keeps timeline content,
      * so frame-at-normalized-time is edit-stable where a fixed frame
      * index is not), real YUV->RGB render, then [[aHash64]] it.
      * Undecodable / empty video hashes to 0.
      */
    def videoHash64(payload: Array[Byte]): Long = {
      val v = try decodeY4m(payload) catch { case _: Exception => return 0L }
      if (v.frames.isEmpty || v.fpsNum == 0) return 0L
      aHash64(frameToPng(v, (v.frames.length - 1) / 2))
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

  /** Sample rate of synthesized audio assets (kept low so test corpora
    * stay small; the codec path is rate-agnostic).
    */
  val SynthSampleRate = 4000

  /** Frame rate of synthesized video assets: 4 fps (one frame per 250 ms)
    * keeps uncompressed Y4M payloads KB-sized; the codec path is
    * rate-agnostic. With the duration formula (a multiple of 500 ms) the
    * frame count is exactly duration_ms/250.
    */
  val SynthVideoFps = 4

  /** Synthesize a deterministic media-asset table from any (id, text) table
    * — image payloads are REAL PNGs (pixels a pure function of the text),
    * audio payloads are REAL WAVs (a two-tone signal keyed by the text),
    * video payloads are REAL YUV4MPEG2 streams (a moving gradient keyed by
    * the text; small even dims, since every frame ships uncompressed).
    * Lets the multimodal path run end-to-end in this sandbox with real
    * binary columns and real decodes.
    */
  def synthesizeAssets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Spread(docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = (if (text == null) "" else text).getBytes("UTF-8")
        val modality = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val mime = modality match {
          case "image" => "image/png"; case "audio" => "audio/wav"
          case _       => "video/x-yuv4mpeg"
        }
        // image dims drive the thumbnail oracle; video dims stay small and
        // EVEN (uncompressed 4:2:0 frames) — both pure functions of the id
        val (w, h) = modality match {
          case "image" => (64 + (id % 13).toInt * 32, 48 + (id % 7).toInt * 32)
          case "video" => (48 + (id % 4).toInt * 16, 32 + (id % 3).toInt * 16)
          case _       => (0, 0)
        }
        // audio/video: duration of the ACTUAL generated container (WAV
        // 0.2-1.7 s, Y4M 1-30.5 s at 4 fps) — both multiples of the frame/
        // sample tick, so the decoded duration recovers them exactly
        val dur = modality match {
          case "audio" => 200L + (id % 16) * 100L
          case "video" => 1000L + (id % 60) * 500L
          case _       => 0L
        }
        val payload = modality match {
          case "image" => Codec.synthesizePng(w, h, bytes)
          case "audio" => Codec.synthesizeWav(dur, SynthSampleRate, bytes)
          case _ =>
            Codec.synthesizeY4m(w, h, (dur * SynthVideoFps / 1000L).toInt,
              SynthVideoFps, bytes)
        }
        MediaAsset(id, modality, mime, w, h, dur, payload)
      })
  }

  /** Row of the audio-features table (REAL DSP over decoded PCM). */
  final case class AudioFeatures(
      asset_id: Long,
      sample_rate: Int,
      n_samples: Long,
      duration_ms: Long,
      rms: Double, // root-mean-square amplitude, normalized to [0,1]
      zcr: Double  // zero-crossing rate, crossings per sample
  )

  /** REAL audio feature extraction: WAV decode (javax.sound.sampled) +
    * RMS + zero-crossing rate, batched per partition — narrow, no shuffle,
    * payload never leaves the executor (same operator shape as
    * [[extractFeatures]] / a Whisper-style embedding pass). Non-audio and
    * undecodable assets are filtered out.
    */
  def audioFeatures(assets: Dataset[MediaAsset]): Dataset[AudioFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .filter(_.modality == "audio")
      .mapPartitions(_.flatMap { a =>
        try {
          val (rate, s) = Codec.decodeWav(a.payload)
          var sumSq = 0.0
          var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i) / 32768.0
            sumSq += v * v
            if (i > 0 && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
            i += 1
          }
          val n = s.length
          Iterator.single(AudioFeatures(a.asset_id, rate, n.toLong,
            if (rate == 0) 0L else n.toLong * 1000L / rate,
            if (n == 0) 0.0 else math.sqrt(sumSq / n),
            if (n <= 1) 0.0 else zc.toDouble / (n - 1)))
        } catch { case _: Exception => Iterator.empty }
      })
  }

  /** Row of the resampled-audio table. */
  final case class ResampledAudio(asset_id: Long, wav: Array[Byte], sample_rate: Int)

  /** REAL audio resampling to a uniform rate (the audio analog of
    * [[thumbnails]]): models normalize sample rates before feature
    * extraction exactly like they normalize image sizes.
    */
  def resampleAudio(assets: Dataset[MediaAsset], targetRate: Int = 16000): Dataset[ResampledAudio] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .filter(_.modality == "audio")
      .mapPartitions(_.flatMap { a =>
        try Iterator.single(ResampledAudio(a.asset_id, Codec.resampleWav(a.payload, targetRate), targetRate))
        catch { case _: Exception => Iterator.empty }
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

  /** Row of the perceptual-hash table. */
  final case class ImageHash(asset_id: Long, phash: Long)

  /** 64-bit perceptual hash per IMAGE asset (real decode + [[Codec.aHash64]];
    * narrow per-partition batch, payloads never leave the executor).
    * Non-image assets are filtered out.
    */
  def imageHashes(assets: Dataset[MediaAsset]): Dataset[ImageHash] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .filter(_.modality == "image")
      .mapPartitions(_.map(a => ImageHash(a.asset_id, Codec.aHash64(a.payload))))
  }

  /** Perceptual near-duplicate IMAGE pairs: aHash fingerprints joined by
    * Dedup.hammingPairs64's block-pigeonhole (zero cross join — the image
    * analog of SimHash text dedup; a training pipeline dedups re-encoded /
    * resized copies of the same picture this way). Output
    * (asset1, asset2, hamming), asset1 < asset2.
    *
    * Cache contract as simHashPairs: the hash table feeds both self-join
    * sides and is persisted here; the CALLER releases (clearCache or via
    * the returned frame's lineage after the terminal action).
    */
  def imageNearDupPairs(assets: Dataset[MediaAsset], maxHamming: Int = 3,
                        nBlocks: Int = 4,
                        excludeUndecodable: Boolean = true,
                        starCapGroupSize: Option[Int] = None): DataFrame = {
    val h0 = imageHashes(assets).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sentinel-0 exclusion (r6 verdict, decided ON): Codec.aHash64 maps
    // undecodable payloads to 0, and monochrome frames hash to 0
    // legitimately — at corpus scale that class is a quadratic mega-clique
    // of pairs that are "similar" only in being degenerate, so the near-dup
    // operator drops them BEFORE pairing (the completeness/fingerprint
    // tables keep every asset; only pairing skips the sentinel). The DuckDB
    // pair oracles carry the identical `<> 0` predicate.
    val h = if (excludeUndecodable) h0.filter(col("phash") =!= 0L) else h0
    Dedup.hammingPairs64(h, maxHamming, nBlocks, idCol = "asset_id",
        hashCol = "phash", starCapGroupSize = starCapGroupSize)
      .select(col("doc1").as("asset1"), col("doc2").as("asset2"), col("hamming"))
  }

  /** Row of the audio-fingerprint table. */
  final case class AudioHash(asset_id: Long, ahash: Long)

  /** 64-bit perceptual fingerprint per AUDIO asset (real decode +
    * [[Codec.audioHash64]]; narrow, payloads never leave the executor).
    */
  def audioHashes(assets: Dataset[MediaAsset]): Dataset[AudioHash] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .filter(_.modality == "audio")
      .mapPartitions(_.map(a => AudioHash(a.asset_id, Codec.audioHash64(a.payload))))
  }

  /** Perceptual near-duplicate AUDIO pairs — the audio member of the
    * cross-modality dedup family (images: [[imageNearDupPairs]]); same
    * Dedup.hammingPairs64 block-pigeonhole, same cache contract.
    * The spectral fingerprint pairs re-ingested copies that differ in
    * duration or sample rate. Output (asset1, asset2, hamming).
    */
  def audioNearDupPairs(assets: Dataset[MediaAsset], maxHamming: Int = 3,
                        nBlocks: Int = 4,
                        excludeUndecodable: Boolean = true,
                        starCapGroupSize: Option[Int] = None): DataFrame = {
    val h0 = audioHashes(assets).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sentinel-0 exclusion as imageNearDupPairs (undecodable WAVs + silence
    // both land on 0 — the degenerate mega-clique stays out of pairing)
    val h = if (excludeUndecodable) h0.filter(col("ahash") =!= 0L) else h0
    Dedup.hammingPairs64(h, maxHamming, nBlocks, idCol = "asset_id",
        hashCol = "ahash", starCapGroupSize = starCapGroupSize)
      .select(col("doc1").as("asset1"), col("doc2").as("asset2"), col("hamming"))
  }

  /** Row of the video-fingerprint table. */
  final case class VideoHash(asset_id: Long, vhash: Long)

  /** 64-bit key-frame fingerprint per VIDEO asset ([[Codec.videoHash64]];
    * narrow, payloads never leave the executor).
    */
  def videoHashes(assets: Dataset[MediaAsset]): Dataset[VideoHash] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .filter(_.modality == "video")
      .mapPartitions(_.map(a => VideoHash(a.asset_id, Codec.videoHash64(a.payload))))
  }

  /** Perceptual near-duplicate VIDEO pairs — completes the cross-modality
    * dedup family (images / audio / video all over the same
    * Dedup.hammingPairs64 block-pigeonhole; same cache contract).
    * Output (asset1, asset2, hamming).
    */
  def videoNearDupPairs(assets: Dataset[MediaAsset], maxHamming: Int = 3,
                        nBlocks: Int = 4,
                        excludeUndecodable: Boolean = true,
                        starCapGroupSize: Option[Int] = None): DataFrame = {
    val h0 = videoHashes(assets).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sentinel-0 exclusion as imageNearDupPairs (unparseable streams +
    // monochrome key frames)
    val h = if (excludeUndecodable) h0.filter(col("vhash") =!= 0L) else h0
    Dedup.hammingPairs64(h, maxHamming, nBlocks, idCol = "asset_id",
        hashCol = "vhash", starCapGroupSize = starCapGroupSize)
      .select(col("doc1").as("asset1"), col("doc2").as("asset2"), col("hamming"))
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
    * expression (no UDF, no payload touch). [[sampleFrames]] executes this
    * plan with real pixel grabs; the metadata-only plan stays useful for
    * costing/scheduling a sample pass without reading payload bytes.
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

  /** Row of the resampled-video table. */
  final case class ResampledVideo(asset_id: Long, y4m: Array[Byte], fps: Int,
                                  n_frames: Int)

  /** REAL video frame-rate normalization (the video analog of
    * [[resampleAudio]]): models normalize frame rates before frame
    * sampling exactly like they normalize sample rates and image sizes.
    * Narrow per-partition batch; payloads never leave the executor.
    * Undecodable assets are skipped.
    */
  def resampleVideo(assets: Dataset[MediaAsset], targetFps: Int = 8): Dataset[ResampledVideo] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .filter(_.modality == "video")
      .mapPartitions(_.flatMap { a =>
        try {
          val out = Codec.resampleY4m(a.payload, targetFps)
          Iterator.single(ResampledVideo(a.asset_id, out, targetFps,
            Codec.decodeY4m(out).frames.length))
        } catch { case _: Exception => Iterator.empty }
      })
  }

  /** Row of the sampled-frames table: one REAL decoded frame per sampled
    * timestamp, re-encoded as PNG (ready for the image feature path).
    */
  final case class VideoFrame(asset_id: Long, frame_idx: Int, ts_ms: Long,
                              frame_png: Array[Byte])

  /** REAL frame sampling: decode each video's Y4M stream ONCE per asset,
    * grab the frame at every `everyMs` timestamp (same schedule as
    * [[sampleFramePlan]], capped at `maxFrames`), convert YUV->RGB->PNG.
    * Narrow per-partition batch; payloads never leave the executor — the
    * operator shape of a real decode+CLIP-ingest pass. Undecodable assets
    * are skipped.
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long = 1000L,
                   maxFrames: Int = 32): Dataset[VideoFrame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .filter(_.modality == "video")
      .mapPartitions(_.flatMap { a =>
        try {
          val v = Codec.decodeY4m(a.payload)
          if (v.frames.isEmpty || v.fpsNum == 0) Iterator.empty
          else {
            val dur = v.durationMs
            Iterator.range(0, maxFrames)
              .map(i => (i, i * everyMs))
              .takeWhile { case (_, ts) => ts < dur }
              .map { case (i, ts) =>
                val fi = math.min(v.frames.length - 1,
                  (ts * v.fpsNum / (1000L * v.fpsDen)).toInt)
                VideoFrame(a.asset_id, i, ts, Codec.frameToPng(v, fi))
              }
          }
        } catch { case _: Exception => Iterator.empty }
      })
  }

  /** Row of the video-features table (REAL container parse + pixel DSP). */
  final case class VideoFeatures(
      asset_id: Long,
      width: Int,
      height: Int,
      fps: Int,
      n_frames: Long,
      duration_ms: Long, // recovered from the container: n_frames/fps
      mean_luma: Double, // mean Y value over all frames, normalized [0,1]
      motion: Double     // mean |ΔY| between consecutive frames, [0,1]
  )

  /** REAL video feature extraction: Y4M parse + per-frame luma mean + a
    * temporal-motion measure (mean absolute luma difference between
    * consecutive frames — the scene-cut / static-content signal). Batched
    * per partition; narrow, no shuffle. Undecodable assets are skipped.
    */
  def videoFeatures(assets: Dataset[MediaAsset]): Dataset[VideoFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .filter(_.modality == "video")
      .mapPartitions(_.flatMap { a =>
        try {
          val v = Codec.decodeY4m(a.payload)
          val lumaLen = v.width * v.height
          var lumaSum = 0.0
          var diffSum = 0.0
          var f = 0
          while (f < v.frames.length) {
            val cur = v.frames(f)
            val prev = if (f > 0) v.frames(f - 1) else null
            var i = 0
            while (i < lumaLen) {
              lumaSum += (cur(i) & 0xff)
              if (prev != null) diffSum += math.abs((cur(i) & 0xff) - (prev(i) & 0xff))
              i += 1
            }
            f += 1
          }
          val n = v.frames.length
          Iterator.single(VideoFeatures(
            a.asset_id, v.width, v.height,
            if (v.fpsDen == 0) 0 else v.fpsNum / v.fpsDen,
            n.toLong, v.durationMs,
            if (n == 0) 0.0 else lumaSum / (n.toLong * lumaLen) / 255.0,
            if (n <= 1) 0.0 else diffSum / ((n - 1).toLong * lumaLen) / 255.0))
        } catch { case _: Exception => Iterator.empty }
      })
  }

  // --------------------------------------------------------------------
  // End-to-end modality dedup (r6 verdict #8): assets -> per-modality
  // perceptual fingerprints -> hammingPairs64 -> connected components ->
  // representatives, drivable from the CLI (--modality-dedup) with the
  // CleanPipeline stage protocol (committed tagged tables, resumable).
  // --------------------------------------------------------------------

  /** All three perceptual fingerprint families as ONE frame
    * (asset_id, modality, fp64). The branches filter DISJOINT modalities,
    * so each asset decodes exactly once across the union; `assets` feeds
    * all three branches — the CALLER persists it (repo cache contract).
    */
  def modalityFingerprints(assets: Dataset[MediaAsset]): DataFrame =
    imageHashes(assets).toDF()
      .select(col("asset_id"), lit("image").as("modality"), col("phash").as("fp64"))
      .union(audioHashes(assets).toDF()
        .select(col("asset_id"), lit("audio").as("modality"), col("ahash").as("fp64")))
      .union(videoHashes(assets).toDF()
        .select(col("asset_id"), lit("video").as("modality"), col("vhash").as("fp64")))

  /** Near-dup pairs across the whole asset corpus, SCOPED per modality
    * (an image must never pair with an audio clip on a coincidental block
    * collision): one hammingPairs64 run per modality, unioned with the
    * modality carried. Sentinel-0 exclusion + skew armor as the
    * per-modality operators. `fps` feeds each modality subframe three
    * times — the CALLER persists it.
    */
  def modalityNearDupPairs(fps: DataFrame, maxHamming: Int = 3,
                           excludeUndecodable: Boolean = true,
                           starCapGroupSize: Option[Int] = None): DataFrame = {
    val base = if (excludeUndecodable) fps.filter(col("fp64") =!= 0L) else fps
    Seq("image", "audio", "video")
      .map { m =>
        Dedup.hammingPairs64(base.filter(col("modality") === m), maxHamming,
            idCol = "asset_id", hashCol = "fp64",
            starCapGroupSize = starCapGroupSize)
          .select(col("doc1").as("asset1"), col("doc2").as("asset2"),
            col("hamming"), lit(m).as("modality"))
      }
      .reduce(_ union _)
  }

  /** Min-label cluster per fingerprinted asset over [[modalityNearDupPairs]]
    * output (singletons keep their own id) — the recipe's mm_clusters stage
    * body, shared verbatim with SparkEntry's q_mm_clusters query.
    */
  def modalityClusters(fps: DataFrame, pairs: DataFrame): DataFrame =
    ConnectedComponents.cluster(
        pairs.select(col("asset1").as("doc1"), col("asset2").as("doc2")),
        fps.select(col("asset_id").as("doc_id")))
      .select(col("doc_id").as("asset_id"), col("cluster_id"))

  /** Cluster representatives: the min-label root keeps its fingerprint row
    * (cluster_id IS the component min; singletons keep their own id) — the
    * recipe's mm_corpus stage body, shared with q_mm_dedup_corpus.
    */
  def modalityRepresentatives(fps: DataFrame, clusters: DataFrame): DataFrame =
    clusters.filter(col("asset_id") === col("cluster_id"))
      .select("asset_id")
      .join(fps, "asset_id")

  /** Stage counts for [[dedupCheckpointed]]'s CLI JSON line. */
  final case class ModalityDedupCounts(assets: Long, pairs: Long,
                                       clusters: Long, survivors: Long)

  /** RESUMABLE end-to-end modality dedup over a (doc_id, text) table:
    * four committed StageStore tables under `workDir` —
    *
    *   mm_fingerprints (asset_id, modality, fp64)
    *   mm_pairs        (asset1, asset2, hamming, modality)
    *   mm_clusters     (asset_id, cluster_id)   [min-label CC]
    *   mm_corpus       (asset_id, modality, fp64)  [cluster representatives]
    *
    * each tagged by input fingerprint + config (the CleanPipeline
    * protocol): a rerun resumes at the first uncommitted/stale stage; each
    * stage computes from the PREVIOUS COMMITTED table, never from a
    * recomputed kernel. Asset payloads here come from the deterministic
    * synthesis boundary (synthesizeAssets — real PNG/WAV/Y4M bytes derived
    * from the text); a production deployment swaps a real media-bytes scan
    * in at that one call.
    */
  def dedupCheckpointed(spark: org.apache.spark.sql.SparkSession,
                        docs: DataFrame, workDir: String,
                        maxHamming: Int = 3,
                        starCapGroupSize: Option[Int] = None,
                        contentFingerprint: Boolean = false)
      : (DataFrame, ModalityDedupCounts, graft.plans.CheckpointedPipeline.StageLog) = {
    import graft.plans.{CheckpointedPipeline, StageStore}
    val store = new StageStore(spark, workDir)
    val log = new CheckpointedPipeline.StageLog
    val fp = StageStore.fingerprint(spark, docs, contentFingerprint)
    val cfgStr = s"mm;ham=$maxHamming;cap=${starCapGroupSize.getOrElse(0)}"
    import spark.implicits._
    var scratch: List[DataFrame] = Nil // caches built inside stage closures
    val fps = store.stage("mm_fingerprints", fp, cfgStr, log) {
      val assets = synthesizeAssets(docs).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      scratch ::= assets
      modalityFingerprints(assets.as[MediaAsset])
    }
    val pairs = store.stage("mm_pairs", fp, cfgStr, log) {
      val f = fps.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      scratch ::= f
      modalityNearDupPairs(f, maxHamming, starCapGroupSize = starCapGroupSize)
    }
    val clusters = store.stage("mm_clusters", fp, cfgStr, log) {
      modalityClusters(fps, pairs)
    }
    val survivors = store.stage("mm_corpus", fp, cfgStr, log) {
      modalityRepresentatives(fps, clusters)
    }
    scratch.foreach { c => c.unpersist(); () }
    val counts = ModalityDedupCounts(
      assets = fps.count(), pairs = pairs.count(),
      clusters = clusters.select("cluster_id").distinct().count(),
      survivors = survivors.count())
    (survivors, counts, log)
  }
}
