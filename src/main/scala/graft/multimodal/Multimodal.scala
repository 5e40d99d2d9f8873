package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded per-partition in batches.
  *
  * The payloads are REAL image containers — P6 PPM and 24-bit BMP,
  * both public formats simple enough to encode/decode with no codec
  * library — generated deterministically from the documents corpus.
  * `decode` sniffs the magic bytes and parses the actual header
  * (dimensions from the container, not trusted metadata), then
  * extracts byte-level channel features from the pixel data. Heavier
  * codecs (JPEG audio/video) would slot into the same mapPartitions
  * batch shape with a per-partition codec context.
  */
object Multimodal {

  /** A media object: opaque bytes + declared container format. */
  case class MediaRecord(doc_id: Long, format: String, payload: Array[Byte])

  /** Decoded features with the shape a real pipeline carries. */
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           feature: Array[Float])

  // ---- encoders (used to build the corpus view and by specs) ----------

  /** Binary P6 PPM: ASCII header, then w*h RGB byte triplets. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  /** Real JPEG / PNG via the JDK's own codec (javax.imageio — public
    * API, no extra dependency): the production-crawl formats, next to
    * the hand-parsed PPM/BMP that prove the container plumbing.
    * `format` is an ImageIO writer name ("png", "jpg"). */
  def encodeImageIo(w: Int, h: Int, rgb: Array[Byte], format: String): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  private def isPng(b: Array[Byte]) =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isJpeg(b: Array[Byte]) =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  /** Minimal 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows
    * padded to 4 bytes, BGR order). */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val rowSize = (w * 3 + 3) / 4 * 4
    val imageSize = rowSize * h
    val fileSize = 54 + imageSize
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel data offset
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) {
      for (x <- 0 until w) {
        val p = (y * w + x) * 3
        out.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR
      }
      for (_ <- 0 until rowSize - w * 3) out.put(0.toByte)
    }
    out.array()
  }

  /** Nearest-neighbor resize of a decodable single-image payload,
    * re-encoded in its own container format — the standard image
    * normalization step before feature extraction. Pure per-record
    * compute (runs inside the same mapPartitions batch as decode);
    * undecodable payloads pass through unchanged, like a real codec
    * pipeline quarantines bad records instead of dying. */
  def resize(m: MediaRecord, w2: Int, h2: Int): MediaRecord = {
    require(w2 > 0 && h2 > 0, s"target dims must be positive: ${w2}x$h2")
    val b = m.payload
    val decoded = decodeBytes(m)
    if (decoded.width <= 0 || decoded.height <= 0) return m
    val (w, h) = (decoded.width, decoded.height)
    if (isPng(b) || isJpeg(b)) {
      // ImageIO containers resize through the codec itself: decode,
      // nearest-neighbor sample, re-encode in the same format.
      val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
                catch { case _: Exception => null }
      if (img == null) return m
      val rgb = new Array[Byte](w2 * h2 * 3)
      for (y2 <- 0 until h2; x2 <- 0 until w2) {
        val px = img.getRGB(x2 * w / w2, y2 * h / h2)
        val p = (y2 * w2 + x2) * 3
        rgb(p) = ((px >> 16) & 0xff).toByte
        rgb(p + 1) = ((px >> 8) & 0xff).toByte
        rgb(p + 2) = (px & 0xff).toByte
      }
      return m.copy(payload = encodeImageIo(w2, h2, rgb, if (isPng(b)) "png" else "jpg"))
    }
    // locate the pixel reader for the source container
    val isPpm = b.length >= 2 && b(0) == 'P' && b(1) == '6'
    def srcPixel(x: Int, y: Int): (Int, Int, Int) =
      if (isPpm) {
        var i = 2
        def skip(): Unit = {
          while (i < b.length && (b(i).toChar.isWhitespace || b(i) == '#')) {
            if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1 else i += 1
          }
          while (i < b.length && b(i).toChar.isDigit) i += 1
        }
        skip(); skip(); skip(); i += 1 // w, h, maxval, single whitespace
        val off = i + (y * w + x) * 3
        ((b(off) & 0xff), (b(off + 1) & 0xff), (b(off + 2) & 0xff))
      } else {
        val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val dataOffset = buf.getInt(10)
        val rowSize = (w * 3 + 3) / 4 * 4
        val off = dataOffset + (h - 1 - y) * rowSize + x * 3
        ((b(off + 2) & 0xff), (b(off + 1) & 0xff), (b(off) & 0xff))
      }
    // A truncated payload can carry a valid header (decodeBytes caps its
    // feature read via `avail`, so width/height come back positive) yet be
    // missing pixel bytes — quarantine it like decodeBytes does instead of
    // letting srcPixel read past the array and kill the task.
    try {
      val rgb = new Array[Byte](w2 * h2 * 3)
      for (y2 <- 0 until h2; x2 <- 0 until w2) {
        val (r, g, bl) = srcPixel(x2 * w / w2, y2 * h / h2)
        val p = (y2 * w2 + x2) * 3
        rgb(p) = r.toByte; rgb(p + 1) = g.toByte; rgb(p + 2) = bl.toByte
      }
      val payload = if (isPpm) encodePpm(w2, h2, rgb) else encodeBmp(w2, h2, rgb)
      m.copy(payload = payload)
    } catch { case _: IndexOutOfBoundsException => m }
  }

  /** Resize a media corpus per-partition (same batch shape as decode). */
  def resizeAll(media: Dataset[MediaRecord], w2: Int, h2: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(resize(_, w2, h2)))
  }

  /** Minimal multi-frame container (a stand-in for video): magic
    * "GFV1", big-endian frame count, then length-prefixed frames, each
    * itself a complete single-image payload (PPM here). Public-format
    * thinking: the container carries opaque per-frame payloads, like
    * any boxed media format. */
  def encodeFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val out = java.nio.ByteBuffer.allocate(total)
    out.put("GFV1".getBytes("US-ASCII")).putInt(frames.length)
    frames.foreach { f => out.putInt(f.length); out.put(f) }
    out.array()
  }

  /** Frame-sampled decode of a GFV1 container: parse the header, walk
    * the frame table, and fully decode only every `everyK`-th frame —
    * the standard way video becomes training images without paying for
    * every frame. Features = per-channel means over the SAMPLED frames
    * only; width/height from the first sampled frame. */
  def decodeFramesSampled(m: MediaRecord, everyK: Int): MediaFeatures = {
    val b = m.payload
    def zero = MediaFeatures(m.doc_id, m.format, b.length.toLong, 0, 0, 0,
      Array.fill(4)(0.0f))
    if (b.length < 8 || new String(b.take(4), "US-ASCII") != "GFV1") return zero
    try {
      val buf = java.nio.ByteBuffer.wrap(b)
      buf.position(4)
      val n = buf.getInt()
      var i = 0
      val sampled = scala.collection.mutable.ListBuffer.empty[MediaFeatures]
      while (i < n && buf.remaining() >= 4) {
        val len = buf.getInt()
        val take = math.min(len, buf.remaining())
        if (i % everyK == 0) {
          val frame = new Array[Byte](take)
          buf.get(frame)
          sampled += decodeBytes(MediaRecord(m.doc_id, "frame", frame))
        } else buf.position(buf.position() + take)
        i += 1
      }
      if (sampled.isEmpty) zero.copy(n_frames = n)
      else {
        val head = sampled.head
        val feat = Array.tabulate(4)(j =>
          (sampled.map(_.feature(j).toDouble).sum / sampled.length).toFloat)
        MediaFeatures(m.doc_id, m.format, b.length.toLong,
          head.width, head.height, n, feat)
      }
    } catch { case _: Exception => zero }
  }

  // ---- audio (PCM WAV) -------------------------------------------------

  /** An audio object: opaque bytes, typed separately from images
    * because its decoded features are a different shape. */
  case class AudioRecord(doc_id: Long, payload: Array[Byte])

  /** Decoded audio features: container facts + signal statistics. */
  case class AudioFeatures(doc_id: Long, n_bytes: Long, sample_rate: Int,
                           n_channels: Int, n_samples: Long,
                           rms: Float, peak: Float, zcr: Float)

  /** Minimal canonical PCM WAV (RIFF): 44-byte header, 16-bit LE
    * interleaved samples — straight from the public RIFF/WAVE spec. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0, "interleaved frames")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort).putShort(16) // block align, bits
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Parse a WAV payload by walking its RIFF chunks (fmt then data —
    * any other chunks are skipped, like real files have). Truncated
    * data is read as far as it goes; corrupt headers quarantine to
    * zeros, never a task failure. Features: RMS and peak of the
    * normalized signal, zero-crossing rate — the standard cheap audio
    * quality/voice-activity signals. */
  def decodeWavBytes(m: AudioRecord): AudioFeatures = {
    val b = m.payload
    def zero = AudioFeatures(m.doc_id, b.length.toLong, 0, 0, 0L, 0f, 0f, 0f)
    if (b.length < 12 || new String(b.take(4), "US-ASCII") != "RIFF" ||
      new String(b.slice(8, 12), "US-ASCII") != "WAVE") return zero
    try {
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var rate = 0; var channels = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length) {
        val id = new String(b.slice(pos, pos + 4), "US-ASCII")
        val len = buf.getInt(pos + 4)
        if (id == "fmt " && pos + 24 <= b.length) {
          channels = buf.getShort(pos + 10)
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
        } else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (rate <= 0 || channels <= 0 || bits != 16 || dataOff < 0) return zero
      val avail = math.min(dataLen, b.length - dataOff) / 2
      var (sumSq, peak, crossings) = (0.0, 0.0, 0L)
      var prevNeg = false
      for (i <- 0 until avail) {
        val s = buf.getShort(dataOff + i * 2) / 32768.0
        sumSq += s * s
        if (math.abs(s) > peak) peak = math.abs(s)
        val neg = s < 0
        if (i > 0 && neg != prevNeg) crossings += 1
        prevNeg = neg
      }
      val n = avail / channels
      AudioFeatures(m.doc_id, b.length.toLong, rate, channels, n.toLong,
        if (avail > 0) math.sqrt(sumSq / avail).toFloat else 0f,
        peak.toFloat,
        if (avail > 1) (crossings.toDouble / (avail - 1)).toFloat else 0f)
    } catch { case _: IndexOutOfBoundsException => zero }
  }

  /** Decode an audio corpus per-partition (same batch shape as the
    * image decode — a real codec would open its context once here). */
  def decodeAudio(audio: Dataset[AudioRecord]): Dataset[AudioFeatures] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(_.map(decodeWavBytes))
  }

  /** Decimate-by-k resample re-encoded as a valid WAV at rate/k — the
    * audio analog of the image resize (every k-th FRAME kept, so
    * channel interleaving survives). Undecodable or non-16-bit
    * payloads pass through unchanged, mirroring resize's quarantine
    * contract. */
  def resampleWav(m: AudioRecord, k: Int): AudioRecord = {
    require(k >= 1, "decimation factor must be >= 1")
    val b = m.payload
    if (b.length < 12 || new String(b.take(4), "US-ASCII") != "RIFF" ||
      new String(b.slice(8, 12), "US-ASCII") != "WAVE") return m
    try {
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var rate = 0; var channels = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length) {
        val id = new String(b.slice(pos, pos + 4), "US-ASCII")
        val len = buf.getInt(pos + 4)
        if (id == "fmt " && pos + 24 <= b.length) {
          channels = buf.getShort(pos + 10)
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
        } else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1)
      }
      if (rate <= 0 || channels <= 0 || bits != 16 || dataOff < 0) return m
      val avail = math.min(dataLen, b.length - dataOff) / 2
      val frames = avail / channels
      val kept = Array.newBuilder[Short]
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < channels) {
          kept += buf.getShort(dataOff + (f * channels + c) * 2)
          c += 1
        }
        f += k
      }
      AudioRecord(m.doc_id, encodeWav(rate / k, channels, kept.result()))
    } catch { case _: IndexOutOfBoundsException => m }
  }

  /** Resample an audio corpus per-partition (batch shape as above). */
  def resampleAll(audio: Dataset[AudioRecord], k: Int): Dataset[AudioRecord] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(_.map(resampleWav(_, k)))
  }

  /** Audio view over documents: REAL WAV payloads whose samples derive
    * deterministically from the text bytes (sample rate and channel
    * count vary by doc_id so the decode paths all get exercised). */
  def audioView(spark: SparkSession, dir: String): Dataset[AudioRecord] = {
    import spark.implicits._
    t(spark, dir, "documents").select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val rate = 8000 * (1 + (id % 3).toInt)
        val channels = 1 + (id % 2).toInt
        val seed = text.getBytes("UTF-8")
        val samples = Array.tabulate(channels * (64 + (id % 64).toInt)) { i =>
          val v = if (seed.isEmpty) (id + i).toInt else seed(i % seed.length).toInt
          (v * 257).toShort // spread byte values over the 16-bit range
        }
        AudioRecord(id, encodeWav(rate, channels, samples))
      }
  }

  // ---- decoder ---------------------------------------------------------

  /** Parse a payload by its magic bytes. Returns the container's REAL
    * dimensions plus 4 byte-level features (mean R/G/B of the pixel
    * data present, aspect ratio). Corrupt or unknown payloads are
    * routine for a real codec: they decode to (0, 0) dims and zero
    * features rather than crashing the task. */
  def decodeBytes(m: MediaRecord): MediaFeatures = {
    val b = m.payload
    def zero = MediaFeatures(m.doc_id, m.format, b.length.toLong, 0, 0, 0,
      Array.fill(4)(0.0f))
    def features(w: Int, h: Int, pixelAt: Int => (Int, Int, Int),
                 nPix: Int): Array[Float] = {
      if (nPix <= 0 || w <= 0 || h <= 0) return Array.fill(4)(0.0f)
      var (r, g, bl) = (0L, 0L, 0L)
      for (i <- 0 until nPix) {
        val (pr, pg, pb) = pixelAt(i); r += pr; g += pg; bl += pb
      }
      Array((r.toDouble / nPix / 255.0).toFloat, (g.toDouble / nPix / 255.0).toFloat,
        (bl.toDouble / nPix / 255.0).toFloat, (w.toDouble / h).toFloat)
    }
    try {
      if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
        // PPM: ASCII ints (w, h, maxval) separated by whitespace or
        // #-comments, then ONE whitespace byte before binary pixels
        var i = 2
        def nextInt(): Int = {
          while (i < b.length && (b(i).toChar.isWhitespace || b(i) == '#')) {
            if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
            else i += 1
          }
          var v = 0
          while (i < b.length && b(i).toChar.isDigit) { v = v * 10 + (b(i) - '0'); i += 1 }
          v
        }
        val w = nextInt(); val h = nextInt(); nextInt() // maxval
        i += 1 // the single whitespace after maxval
        val avail = math.min(w * h, (b.length - i) / 3)
        val base = i
        MediaFeatures(m.doc_id, "ppm", b.length.toLong, w, h, 1,
          features(w, h, p => ((b(base + p * 3) & 0xff),
            (b(base + p * 3 + 1) & 0xff), (b(base + p * 3 + 2) & 0xff)), avail))
      } else if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') {
        val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val dataOffset = buf.getInt(10)
        val w = buf.getInt(18)
        val h = buf.getInt(22)
        val bpp = buf.getShort(28)
        if (bpp != 24 || w <= 0 || h <= 0) zero
        else {
          val rowSize = (w * 3 + 3) / 4 * 4
          def pixelAt(p: Int): (Int, Int, Int) = {
            val (x, y) = (p % w, p / w)
            val off = dataOffset + (h - 1 - y) * rowSize + x * 3 // bottom-up, BGR
            ((b(off + 2) & 0xff), (b(off + 1) & 0xff), (b(off) & 0xff))
          }
          val nPix = math.min(w * h,
            math.max(0, (b.length - dataOffset) / rowSize * w))
          MediaFeatures(m.doc_id, "bmp", b.length.toLong, w, h, 1,
            features(w, h, pixelAt, nPix))
        }
      } else if (isPng(b) || isJpeg(b)) {
        // real-codec path: the JDK's ImageIO (public API). A corrupt or
        // truncated payload returns null or throws — both quarantine to
        // zeros exactly like the hand-parsed formats.
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
                  catch { case _: Exception => null }
        if (img == null) zero
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          def pixelAt(p: Int): (Int, Int, Int) = {
            val px = img.getRGB(p % w, p / w)
            ((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
          }
          MediaFeatures(m.doc_id, if (isPng(b)) "png" else "jpg",
            b.length.toLong, w, h, 1, features(w, h, pixelAt, w * h))
        }
      } else zero
    } catch { case _: IndexOutOfBoundsException => zero }
  }

  /** Decode a media corpus per-partition — one iterator pass, no
    * per-row setup; a heavier codec would open its context once per
    * partition here. */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec context would be opened once per partition here
      it.map(decodeBytes)
    }
  }

  /** Media view over documents: REAL binary images whose dimensions
    * derive from doc_id and whose pixel bytes derive from the text —
    * deterministic, so every downstream check is reproducible. Format
    * rotates PPM/BMP/PNG/JPEG per doc (the latter two through the
    * JDK's real ImageIO codec). */
  def mediaView(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    // every media consumer pays a per-row codec ENCODE right here (and
    // usually a decode just above) — the heaviest per-row work in the
    // repo — so the one-row-group text scan must not serialize it on a
    // single task; layout-adaptive spread (no-op at production layouts)
    graft.Tables.docsSpread(spark, dir).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val (w, h, rgb) = mediaPixels(id, text)
        (id % 4).toInt match {
          case 0 => MediaRecord(id, "ppm", encodePpm(w, h, rgb))
          case 1 => MediaRecord(id, "bmp", encodeBmp(w, h, rgb))
          case 2 => MediaRecord(id, "png", encodeImageIo(w, h, rgb, "png"))
          case _ => MediaRecord(id, "jpg", encodeImageIo(w, h, rgb, "jpg"))
        }
      }
  }

  /** The deterministic pixel grid behind the media view: dimensions
    * derive from doc_id, pixel bytes tile the text. Factored out so
    * the recall probe can re-encode the SAME pixels through a second
    * codec. */
  private[graft] def mediaPixels(id: Long, text: String): (Int, Int, Array[Byte]) = {
    val w = 4 + (id % 12).toInt
    val h = 4 + ((id / 3) % 12).toInt
    val seed = text.getBytes("UTF-8")
    (w, h, Array.tabulate(w * h * 3)(i =>
      if (seed.isEmpty) (id + i).toByte else seed(i % seed.length)))
  }

  /** Frames per synthetic container and the aHash-hamming cut above
    * which consecutive frames read as a scene change. */
  private val N_FRAMES = 6
  private val SCENE_CUT = 10

  /** Deterministic multi-frame container view: per doc, a GFV1
    * container of N_FRAMES PPM frames where frames within a scene are
    * identical and alternate scenes INVERT the pixel grid (aHash of an
    * inverted image is the near-complement, so scene boundaries land
    * far above the hamming cut by construction while within-scene
    * distance is exactly 0). Scene length derives from doc_id, so
    * every container's true cut positions are known. */
  def framesView(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    t(spark, dir, "documents").select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val sceneLen = 2 + (id % 2).toInt
        val (w, h, rgb) = mediaPixels(id, text)
        val frames = (0 until N_FRAMES).map { f =>
          val inverted = (f / sceneLen) % 2 == 1
          val px = if (inverted) rgb.map(b => (255 - (b & 0xff)).toByte) else rgb
          encodePpm(w, h, px)
        }
        MediaRecord(id, "gfv", encodeFrames(frames))
      }
  }

  /** Scene-change detection over frame containers: decode every
    * frame, aHash it, and flag consecutive-frame hamming above the
    * cut — the standard shot-boundary heuristic from the public
    * video-processing literature, and the sampling anchor a video
    * curation pipeline keyframes on. One mapPartitions decode pass
    * (codec work — the justified slot), per-container output only.
    * Rows-only by §4 policy like the rest of the codec family;
    * MultimodalSpec pins the detected cuts against the containers'
    * KNOWN scene boundaries. */
  def qSceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    framesView(spark, dir).map { m =>
      val buf = java.nio.ByteBuffer.wrap(m.payload)
      val magic = new Array[Byte](4); buf.get(magic)
      val n = buf.getInt
      val hashes = (0 until n).map { _ =>
        val len = buf.getInt
        val frame = new Array[Byte](len)
        buf.get(frame)
        aHash64(MediaRecord(m.doc_id, "ppm", frame))
      }
      val cuts = hashes.sliding(2).zipWithIndex.collect {
        case (Seq(Some(a), Some(b)), i)
          if java.lang.Long.bitCount(a ^ b) > SCENE_CUT => i + 1
      }.toSeq
      (m.doc_id, n.toLong, cuts.length.toLong,
        cuts.headOption.map(_.toLong).getOrElse(-1L))
    }.toDF("doc_id", "n_frames", "n_cuts", "first_cut_frame")
  }

  /** Oracled metadata query: the SQL-expressible half of the pipeline
    * (declared format + content identity). The binary payload sizes
    * and dimensions live in the decode path, verified by spec. */
  def qMeta(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("ppm"))
        .when(pmod(col("doc_id"), lit(4)) === 1, lit("bmp"))
        .when(pmod(col("doc_id"), lit(4)) === 2, lit("png"))
        .otherwise(lit("jpg")).as("format"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_text_bytes"),
      graft.dedup.Dedup.contentHash(col("text")).as("content_hash"))

  /** Average-hash (aHash) perceptual fingerprint: decode, grayscale,
    * block-average onto an 8x8 grid, emit 64 bits of "cell above the
    * image mean" — the classic public perceptual-dedup hash (pHash
    * family): identical images collide exactly, re-encodes and small
    * edits land within a few bits of hamming. PPM parses directly;
    * BMP/PNG/JPEG go through the JDK's real ImageIO codec. Corrupt or
    * unreadable payloads return None — a DISTINCT quarantine signal,
    * not a hash value: a legitimately flat image (no cell above the
    * mean) also hashes to 0L, and a 0L quarantine sentinel would merge
    * unreadable files with blank images in every downstream consumer
    * (ADVICE r8). */
  def aHash64(m: MediaRecord): Option[Long] = {
    val gray: Option[(Int, Int, (Int, Int) => Int)] =
      if (m.payload.length >= 2 && m.payload(0) == 'P' && m.payload(1) == '6') {
        // minimal P6 parser: 3 ASCII ints, one whitespace, raw RGB
        val b = m.payload
        var i = 2
        def nextInt(): Int = {
          while (i < b.length && b(i).toChar.isWhitespace) i += 1
          var v = 0
          while (i < b.length && b(i).toChar.isDigit) { v = v * 10 + (b(i) - '0'); i += 1 }
          v
        }
        val w = nextInt(); val h = nextInt(); nextInt(); i += 1
        val base = i
        if (w <= 0 || h <= 0 || base + w * h * 3 > b.length) None
        else Some((w, h, (x: Int, y: Int) => {
          val o = base + (y * w + x) * 3
          ((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)) / 3
        }))
      } else {
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        catch { case _: Throwable => null }
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else Some((img.getWidth, img.getHeight, (x: Int, y: Int) => {
          val p = img.getRGB(x, y)
          (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        }))
      }
    gray match {
      case None => None
      case Some((w, h, at)) =>
        // block-average each of the 8x8 cells over its pixel block
        val cells = Array.tabulate(64) { c =>
          val (cx, cy) = (c % 8, c / 8)
          val (x0, x1) = (cx * w / 8, math.max(cx * w / 8 + 1, (cx + 1) * w / 8))
          val (y0, y1) = (cy * h / 8, math.max(cy * h / 8 + 1, (cy + 1) * h / 8))
          var s = 0L; var n = 0
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) { s += at(x, y); n += 1; x += 1 }
            y += 1
          }
          if (n == 0) 0.0 else s.toDouble / n
        }
        val mean = cells.sum / 64.0
        Some(cells.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
          if (v > mean) acc | (1L << i) else acc
        })
    }
  }

  /** Perceptual-hash image dedup over the media corpus: group by the
    * 64-bit aHash, keep the lowest id — the image-side twin of
    * dedup_exact, catching byte-identical AND re-encoded copies (the
    * same pixels through PPM vs BMP vs PNG collide on aHash where a
    * byte hash sees four different files; JPEG's lossy quantization
    * lands within a few hamming bits — pair it with the hamming
    * expression for near-dup gates). Rows-only by §4 policy (the
    * codec decode is library behavior, not SQL-expressible);
    * MultimodalSpec pins the semantics. One mapPartitions decode pass
    * + one partial-aggregated groupBy on the 64-bit key. */
  def qPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaView(spark, dir)
      .map { m => val oh = aHash64(m); (m.doc_id, oh.isDefined, oh.getOrElse(0L)) }
      .toDF("doc_id", "decoded", "phash")
      // quarantined (undecodable) rows group ALONE on their own id: an
      // unreadable file must never merge with a legitimately flat
      // image whose hash happens to be the old 0L sentinel (ADVICE r8)
      .withColumn("gk", when(col("decoded"), col("phash")).otherwise(col("doc_id")))
      .groupBy("decoded", "gk")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_images"))
      .select(col("decoded"), col("gk").as("phash"), col("keep_id"), col("n_images"))
  }

  /** The decoded aHash fingerprint table (quarantined payloads
    * dropped — an unreadable image has no meaningful hamming distance
    * to anything). One mapPartitions decode pass. */
  private def phashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaView(spark, dir)
      .flatMap(m => aHash64(m).map(ph => (m.doc_id, ph)))
      .toDF("doc_id", "phash")
  }

  // ---- staged perceptual-hash indexes (once per JVM+dir) ---------------

  /** The staged-index discipline (SURVEY #112, same shape as
    * Dedup.stagedFrame): a production pipeline computes perceptual
    * hashes AT INGEST and stores them beside the media; the gate and
    * its recall report run on the stored fingerprints, not on a fresh
    * codec decode of the whole corpus per query. Deterministic
    * derivations only, so staging cannot change results; the dirs are
    * JVM-scoped temp parquet (deleted on exit), the local stand-in for
    * the DFS index path. */
  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedFrame(spark: SparkSession, key: String)
                         (derive: => DataFrame): DataFrame = {
    val path = staged.computeIfAbsent(key, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft-staged")
      p.toFile.deleteOnExit()
      derive.write.mode("overwrite").parquet(p.toString)
      p.toString
    })
    spark.read.parquet(path)
  }

  /** The corpus aHash fingerprints, staged. */
  private def stagedPhashes(spark: SparkSession, dir: String): DataFrame =
    stagedFrame(spark, s"phash:$dir")(phashes(spark, dir))

  /** Per-hash 8x8-bit band entries: band index 0..7 plus that byte of
    * the fingerprint — two near-dup images (hamming <= 8 over 64
    * bits) agree on at least one whole byte whenever their flipped
    * bits don't cover all 8 bands, the Manku-style pigeonhole argument
    * the VERIFIED text gate (#114) measured at 0.96+ recall where the
    * single 16-bit prefix probe scored 0.022 (#113). */
  private def phashBands(h: DataFrame): DataFrame =
    h.select(col("doc_id"), col("phash"),
      explode(array((0 until 8).map(i => struct(lit(i).as("band"),
        shiftright(col("phash"), i * 8).bitwiseAND(lit(255L)).as("bv"))): _*)).as("e"))
      .select(col("doc_id"), col("phash"),
        col("e.band").as("band"), col("e.bv").as("bv"))

  /** Near-duplicate IMAGE pairs: aHash fingerprints banded 8x8-bit
    * ANY-BAND, candidates from an in-bucket SORTED NEIGHBORHOOD (each
    * member vs its 3 sort-order predecessors — bounded fan-out like
    * the keeper star, but hamming-close candidates; see pairsOfHashes
    * for why the star's verified recall measured 0.54), then VERIFIED
    * by hamming distance <= 8 via the codegen'd bit_count(xor) — the
    * image twin of dedup_simhash_pairs, upgraded from the round-8
    * single-16-bit-prefix probe whose recall the gate-recall operator
    * measured at 0.022 for the text gate; the recall report below
    * pins this layout's END-TO-END recall on the image corpus.
    * Rows-only (the hash rides codec decodes); spec proves a JPEG
    * re-encode pairs with its lossless siblings. */
  def qPhashPairs(spark: SparkSession, dir: String,
                  maxHamming: Int = 8): DataFrame =
    // the fingerprint table feeds three plan branches; reading the
    // STAGED parquet (computed once per JVM+dir) replaces both the
    // per-branch codec decode and the old localCheckpoint
    pairsOfHashes(stagedPhashes(spark, dir), maxHamming)

  /** The band → in-bucket sorted neighborhood → verify pipeline over
    * any (doc_id, phash) fingerprint table — factored out so
    * qPhashRecall measures the EXACT pair generation qPhashPairs ships,
    * not just raw bucket collision. Candidates pair each bucket member
    * with its `window` PREDECESSORS in (phash, doc_id) sort order
    * inside the (band, byte) bucket — the sorted-neighborhood
    * discipline (dedup_sorted_neighborhood), bounded fan-out
    * window × 8 bands per doc. This replaced the round-10 per-bucket
    * keeper star after the recall report measured the star's VERIFIED
    * family recall at 0.54: the bucket min is often > maxHamming from
    * both members of a genuine pair, so the verify killed the only
    * edges linking them; sort-order neighbors share the bucket byte
    * AND sort close precisely when their remaining bits agree, which
    * is what survives the hamming verify (measured 0.97 family recall
    * on the JPEG drift truth set vs 1.0 bucket-collision bound).
    * Caller materializes `h` (it feeds three plan branches). */
  private def pairsOfHashes(h: DataFrame, maxHamming: Int,
                            window: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bv").orderBy("phash", "doc_id")
    // one window evaluation, predecessors packed into an array and
    // exploded in a SEPARATE projection (a generator may not contain
    // window expressions, and a per-k union would re-run the window
    // sort per branch)
    val pairs = phashBands(h)
      .select(col("doc_id"), array((1 to window).map(k =>
        lag(col("doc_id"), k).over(w)): _*).as("__ps"))
      .select(col("doc_id"), explode(col("__ps")).as("__p"))
      .filter(col("__p").isNotNull)
      .select(least(col("doc_id"), col("__p")).as("ia"),
        greatest(col("doc_id"), col("__p")).as("ib"))
      .distinct()
    pairs
      .join(h.select(col("doc_id").as("ia"), col("phash").as("pa")), "ia")
      .join(h.select(col("doc_id").as("ib"), col("phash").as("pb")), "ib")
      .select(col("ia"), col("ib"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).as("hd"))
      .filter(col("hd") <= maxHamming)
  }

  /** Image-gate recall report (the #113 pattern on the image side).
    * The truth population is the REALISTIC near-dup image case: for
    * every document, its image's pixels re-encoded through the lossy
    * JPEG codec — aHash drift of a re-encode is a few bits (the aHash
    * spec pins <= 8), exactly what a perceptual gate exists to catch.
    * (Cross-document pairs are NOT near-dup images on this corpus:
    * dimensions derive from doc_id, so even exact-dup texts render at
    * different sizes and hash ~32 bits apart — measured; a truth
    * built on text candidates is empty at hd <= 8.) Against the
    * hd <= maxHamming truth pairs, the report measures three recalls:
    * the round-8 single 16-bit prefix probe and the 8x8-bit any-band
    * BUCKET-COLLISION recall (upper bounds — pigeonhole guarantees
    * any-band co-buckets every hd <= 7 pair, while the prefix probe
    * misses every pair whose drift touches the top two bytes), plus
    * `recall_pipeline`, the recall of the pipeline qPhashPairs
    * ACTUALLY SHIPS (round-10 ADVICE): the same pairsOfHashes call —
    * per-bucket keeper star + hamming verify — run over the combined
    * lossless+jpeg fingerprint table, a truth pair counted caught when
    * its two variants land in the same connected family of the
    * verified edges (what the downstream dedup consumer sees; the
    * keeper star links bucket-mates through the bucket min, so family
    * membership, not direct pairing, is the operative notion).
    * One mapPartitions encode+hash pass, linear in corpus size;
    * rows-only (codec-derived), spec pins recall >= 0.9 for both the
    * any-band bound and the shipped pipeline. */
  def qPhashRecall(spark: SparkSession, dir: String,
                   maxHamming: Int = 8): DataFrame = {
    import spark.implicits._
    // truth pair per document: the LOSSLESS encode of its pixels vs
    // their lossy JPEG re-encode — every pair carries genuine codec
    // drift. (Using each doc's own corpus container would make the
    // jpg quarter's pair byte-identical — hd 0, trivially caught by
    // every scheme — inflating both recall figures.)
    val hp = t(spark, dir, "documents").select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val (w, h, rgb) = mediaPixels(id, text)
          for {
            ha <- aHash64(MediaRecord(id, "ppm", encodePpm(w, h, rgb)))
            hb <- aHash64(MediaRecord(id, "jpg", encodeImageIo(w, h, rgb, "jpg")))
          } yield (id, ha, hb)
        }
      }
      .toDF("doc_id", "pa", "pb")
    // the dual-codec encode+hash pass and the family labels are
    // deterministic derived indexes: staged once per (JVM, dir) like
    // the fingerprint table itself — truth, the combined table and the
    // final agg then read parquet instead of re-decoding the corpus
    val hpStaged = stagedFrame(spark, s"phashtruth:$dir")(hp)
    val truth = hpStaged
      .withColumn("hd", bit_count(col("pa").bitwiseXOR(col("pb"))))
      .filter(col("hd") <= maxHamming)
    def anyBand8: org.apache.spark.sql.Column = (0 until 8).map(i =>
      shiftright(col("pa"), i * 8).bitwiseAND(lit(255L)) ===
        shiftright(col("pb"), i * 8).bitwiseAND(lit(255L))).reduce(_ || _)
    // The shipped pipeline, end to end: run pairsOfHashes over the
    // 2-rows-per-doc combined fingerprint table (id*2 = lossless,
    // id*2+1 = jpeg re-encode), then connected families over its
    // verified edges; a truth pair is caught when both variants share
    // a family label. The converged labels are themselves a
    // deterministic derived index — staged.
    val fams = stagedFrame(spark, s"phashfam:$dir:$maxHamming") {
      val combined = hpStaged
        .select((col("doc_id") * 2).as("doc_id"), col("pa").as("phash"))
        .union(hpStaged.select((col("doc_id") * 2 + 1).as("doc_id"),
          col("pb").as("phash")))
      graft.dedup.Dedup.labelPropagateConverged(
        pairsOfHashes(combined, maxHamming).select("ia", "ib"))
    }
    val caught = truth.select((col("doc_id") * 2).as("na"),
        (col("doc_id") * 2 + 1).as("nb"))
      .join(fams.select(col("doc_id").as("na"), col("cluster_id").as("ca")), Seq("na"))
      .join(fams.select(col("doc_id").as("nb"), col("cluster_id").as("cb")), Seq("nb"))
      .filter(col("ca") === col("cb"))
      .count()
    truth.agg(
      count(lit(1)).as("n_true_pairs"),
      sum(when(shiftright(col("pa"), 48) === shiftright(col("pb"), 48), 1L)
        .otherwise(0L)).as("n_prefix16"),
      sum(when(anyBand8, 1L).otherwise(0L)).as("n_band8x8"))
      .withColumn("n_pipeline", lit(caught))
      .withColumn("recall_prefix16",
        round(col("n_prefix16").cast("double") / col("n_true_pairs"), 6))
      .withColumn("recall_band8x8",
        round(col("n_band8x8").cast("double") / col("n_true_pairs"), 6))
      .withColumn("recall_pipeline",
        round(col("n_pipeline").cast("double") / col("n_true_pairs"), 6))
  }

  // ---- voice-activity detection -----------------------------------------

  /** Per-doc VAD report: frame counts, voiced fraction, longest run. */
  case class VadReport(doc_id: Long, n_frames: Long, n_voiced: Long,
      voiced_frac: Double, longest_run: Long)

  /** Raw 16-bit samples of a WAV payload (chunk walk as in
    * [[decodeWavBytes]]); None on anything malformed. */
  private[multimodal] def wavSamples(b: Array[Byte]): Option[Array[Short]] = {
    if (b.length < 12 || new String(b.take(4), "US-ASCII") != "RIFF" ||
      new String(b.slice(8, 12), "US-ASCII") != "WAVE") return None
    try {
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12; var bits = 0; var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length) {
        val id = new String(b.slice(pos, pos + 4), "US-ASCII")
        val len = buf.getInt(pos + 4)
        if (id == "fmt " && pos + 24 <= b.length) bits = buf.getShort(pos + 22)
        else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1)
      }
      if (bits != 16 || dataOff < 0) return None
      val n = math.min(dataLen, b.length - dataOff) / 2
      Some(Array.tabulate(n)(i => buf.getShort(dataOff + i * 2)))
    } catch { case _: Throwable => None }
  }

  /** Segmented audio view with KNOWN voice-activity ground truth: 8
    * segments x 400 samples (8 kHz mono), segment j carries a square
    * tone iff bit j of doc_id is set, silence otherwise — so every
    * frame's voiced/silent state is exactly derivable from the id
    * (the Pii/C4Rules/Encoding injected-ground-truth pattern). */
  def vadAudioView(spark: SparkSession, dir: String): Dataset[AudioRecord] = {
    import spark.implicits._
    t(spark, dir, "documents").select("doc_id").as[Long].map { id =>
      val samples = Array.tabulate(8 * 400) { i =>
        val seg = i / 400
        if (((id >> seg) & 1L) == 1L) (if (i % 8 < 4) 6000 else -6000).toShort
        else 0.toShort
      }
      AudioRecord(id, encodeWav(8000, 1, samples))
    }
  }

  /** Energy-threshold voice-activity detection — the first pass an
    * audio curation pipeline runs to drop silence and measure speech
    * density before any model sees the clip: 80-sample (10 ms) frames,
    * a frame is voiced iff its mean |amplitude| exceeds 1000 raw
    * units. ALL frame math is exact integer (sums of |s16| over fixed
    * frames; the threshold compare is sum > 1000*80 cross-multiplied),
    * voiced_frac is the exact HALF_UP 6-dp division. One mapPartitions
    * decode pass, per-doc output, zero shuffle — rows-only per the §4
    * codec policy (no SQL engine parses RIFF/WAVE). */
  def qAudioVad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val FRAME = 80
    val THRESH = 1000L
    vadAudioView(spark, dir).mapPartitions(_.map { a =>
      val s = wavSamples(a.payload).getOrElse(Array.empty[Short])
      val nFrames = s.length / FRAME
      var voiced = 0L; var run = 0L; var best = 0L
      var f = 0
      while (f < nFrames) {
        var sum = 0L; var i = f * FRAME
        val end = i + FRAME
        while (i < end) { sum += math.abs(s(i).toLong); i += 1 }
        if (sum > THRESH * FRAME) {
          voiced += 1; run += 1; if (run > best) best = run
        } else run = 0
        f += 1
      }
      val frac =
        if (nFrames > 0)
          ((2L * voiced * 1000000L + nFrames) / (2L * nFrames)).toDouble / 1e6
        else 0.0
      VadReport(a.doc_id, nFrames.toLong, voiced, frac, best)
    }).toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_audio_vad" -> (qAudioVad _),
    "multimodal_meta" -> (qMeta _),
    "multimodal_phash_dedup" -> (qPhashDedup _),
    "multimodal_scene_cuts" -> (qSceneCuts _),
    "multimodal_phash_pairs" -> ((s: SparkSession, d: String) => qPhashPairs(s, d)),
    "multimodal_phash_recall" -> ((s: SparkSession, d: String) => qPhashRecall(s, d)))

  val oracleSql: Map[String, String] = Map(
    "multimodal_meta" ->
      s"""SELECT doc_id,
         |  CASE doc_id % 4 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
         |    WHEN 2 THEN 'png' ELSE 'jpg' END AS format,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_text_bytes,
         |  ${graft.dedup.Dedup.contentHashSql("text")} AS content_hash
         |FROM documents""".stripMargin)
}
