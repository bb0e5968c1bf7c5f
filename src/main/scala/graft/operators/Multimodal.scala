package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` columns with typed metadata, and the expensive
  * per-item work (decode, feature extraction, resize, frame sampling)
  * runs batched inside `mapPartitions` — the Scala counterpart of a
  * Pandas-UDF/`mapInPandas` stage: executors stream row batches through
  * a codec without ever collecting to the driver.
  *
  * The codecs are REAL for the formats a JVM can parse without native
  * libraries — binary PPM (P6) images, 16-bit PCM WAV audio, and a
  * simple concatenated-frame video container — decode, resize, feature
  * extraction, and frame sampling all operate on actual pixel/sample
  * data. Formats that need native decoders (JPEG/MP4/...) would slot in
  * behind the same [[Codecs]] functions; a payload that fails to parse
  * flows through the `ok = false` failure path instead of killing the
  * task — the behavior a 100 TB ingest needs for corrupt inputs.
  */
object Multimodal {

  /** A media item: opaque payload + typed metadata (FIXTURES-style). */
  final case class MediaItem(
      mediaId: Long,
      kind: String,          // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      durationMs: Long)

  /** Decoded/feature-extracted record. */
  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      featureDim: Int,
      features: Array[Float],
      ok: Boolean)

  /** A sampled, decoded video frame (RGB bytes of a real frame). */
  final case class Frame(mediaId: Long, frameIndex: Int, ptsMs: Long, pixels: Array[Byte])

  // ------------------------------------------------------------------
  // Codecs (pure JVM)
  // ------------------------------------------------------------------

  object Codecs {

    // --- PPM (P6): "P6\n<w> <h>\n255\n" + w*h*3 RGB bytes ---

    def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
      val header = s"P6\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** Decode P6 PPM to (width, height, rgb). None on malformed input. */
    def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      try {
        if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
        var i = 2
        val fields = new Array[Int](3) // w, h, maxval
        var f = 0
        while (f < 3) {
          while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
          if (i < bytes.length && bytes(i) == '#') { // comment line
            while (i < bytes.length && bytes(i) != '\n') i += 1
          } else {
            var v = 0
            val start = i
            while (i < bytes.length && bytes(i).toChar.isDigit) { v = v * 10 + (bytes(i) - '0'); i += 1 }
            if (i == start) return None
            fields(f) = v
            f += 1
          }
        }
        i += 1 // single whitespace after maxval
        val (w, h, maxval) = (fields(0), fields(1), fields(2))
        if (w <= 0 || h <= 0 || maxval != 255 || bytes.length - i < w * h * 3) return None
        Some((w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3)))
      } catch { case _: Throwable => None }
    }

    /** Nearest-neighbor resize of packed RGB. */
    def resizeNearest(w: Int, h: Int, rgb: Array[Byte], tw: Int, th: Int): Array[Byte] = {
      val out = new Array[Byte](tw * th * 3)
      var y = 0
      while (y < th) {
        val sy = y * h / th
        var x = 0
        while (x < tw) {
          val sx = x * w / tw
          val s = (sy * w + sx) * 3
          val d = (y * tw + x) * 3
          out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Image features: per-channel means, grayscale std, 8-bin grayscale
      * histogram (normalized) = 12 values. */
    def imageFeatures(w: Int, h: Int, rgb: Array[Byte]): Array[Float] = {
      val n = w * h
      var sr = 0L; var sg = 0L; var sb = 0L
      var sumGray = 0.0; var sumGray2 = 0.0
      val hist = new Array[Int](8)
      var i = 0
      while (i < n) {
        val r = rgb(i * 3) & 0xff
        val g = rgb(i * 3 + 1) & 0xff
        val b = rgb(i * 3 + 2) & 0xff
        sr += r; sg += g; sb += b
        val gray = 0.299 * r + 0.587 * g + 0.114 * b
        sumGray += gray; sumGray2 += gray * gray
        hist((gray / 32.0).toInt.min(7)) += 1
        i += 1
      }
      val meanGray = sumGray / n
      val varGray = math.max(sumGray2 / n - meanGray * meanGray, 0.0)
      Array(
        (sr.toDouble / n / 255.0).toFloat,
        (sg.toDouble / n / 255.0).toFloat,
        (sb.toDouble / n / 255.0).toFloat,
        (math.sqrt(varGray) / 255.0).toFloat) ++
        hist.map(c => c.toFloat / n)
    }

    /** 64-bit average hash (aHash): nearest-resize to 8×8, integer luma
      * per cell, bit i set iff cell i's luma exceeds the floor-mean —
      * the standard perceptual fingerprint (same family as pHash/dHash)
      * in ALL-INTEGER arithmetic, so bit-stable across platforms.
      * Near-duplicate images differ in a few bits; unrelated images in
      * ~32. */
    def averageHash64(w: Int, h: Int, rgb: Array[Byte]): Long = {
      val small = resizeNearest(w, h, rgb, 8, 8)
      val luma = new Array[Long](64)
      var sum = 0L
      var i = 0
      while (i < 64) {
        val r = small(i * 3) & 0xff
        val g = small(i * 3 + 1) & 0xff
        val b = small(i * 3 + 2) & 0xff
        luma(i) = (299L * r + 587L * g + 114L * b) / 1000L
        sum += luma(i)
        i += 1
      }
      val mean = sum / 64L
      var hash = 0L
      i = 0
      while (i < 64) {
        if (luma(i) > mean) hash |= (1L << i)
        i += 1
      }
      hash
    }

    /** 64-bit DCT perceptual hash (pHash, the production member of the
      * aHash/dHash/pHash family): nearest-resize to 32×32, integer
      * luma, separable 2-D DCT-II over the 32×32 grid keeping the
      * low-frequency 8×8 block, bit i set iff AC coefficient i exceeds
      * the block's lower-median AC value (DC excluded — it carries only
      * global brightness; its bit stays 0). All cosines come from
      * `StrictMath` (fdlibm-pinned — `Math.cos` may use platform
      * intrinsics and drift a ulp across machines) and the double
      * accumulation order is fixed, so the hash is bit-stable across
      * platforms and partitionings. Sign-vs-median structure is
      * invariant to positive luma scaling, so brightness/contrast
      * edits that move every aHash cell survive here. */
    def perceptualHash64(w: Int, h: Int, rgb: Array[Byte]): Long = {
      val small = resizeNearest(w, h, rgb, 32, 32)
      val luma = new Array[Double](32 * 32)
      var i = 0
      while (i < 32 * 32) {
        val r = small(i * 3) & 0xff
        val g = small(i * 3 + 1) & 0xff
        val b = small(i * 3 + 2) & 0xff
        luma(i) = (299L * r + 587L * g + 114L * b).toDouble / 1000.0
        i += 1
      }
      val cosTab = Array.tabulate(8, 32)((u, x) =>
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 64.0))
      // rows: 32 rows × first 8 frequencies
      val rowT = new Array[Double](32 * 8)
      var y = 0
      while (y < 32) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var x = 0
          while (x < 32) { s += luma(y * 32 + x) * cosTab(u)(x); x += 1 }
          rowT(y * 8 + u) = s
          u += 1
        }
        y += 1
      }
      // columns: the 8×8 low-frequency block
      val coef = new Array[Double](64)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var yy = 0
          while (yy < 32) { s += rowT(yy * 8 + u) * cosTab(v)(yy); yy += 1 }
          coef(v * 8 + u) = s
          u += 1
        }
        v += 1
      }
      val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
      java.util.Arrays.sort(ac)
      val med = ac((ac.length + 1) / 2 - 1) // lower median of the 63 AC terms
      var hash = 0L
      i = 1
      while (i < 64) {
        if (coef(i) > med) hash |= (1L << i)
        i += 1
      }
      hash
    }

    // --- WAV: RIFF/WAVE, PCM 16-bit mono ---

    def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
      buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      buf.putShort(1).putShort(1) // PCM, mono
      buf.putInt(sampleRate).putInt(sampleRate * 2)
      buf.putShort(2).putShort(16) // block align, bits
      buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** Decode PCM-16 mono WAV to (sampleRate, samples). None if malformed. */
    def decodeWavPcm16(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
      try {
        if (bytes.length < 44) return None
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val riff = new Array[Byte](4); buf.get(riff)
        if (new String(riff, StandardCharsets.US_ASCII) != "RIFF") return None
        buf.getInt // chunk size
        val wave = new Array[Byte](4); buf.get(wave)
        if (new String(wave, StandardCharsets.US_ASCII) != "WAVE") return None
        var sampleRate = 0
        var samples: Array[Short] = null
        while (buf.remaining() >= 8 && samples == null) {
          val id = new Array[Byte](4); buf.get(id)
          val size = buf.getInt
          new String(id, StandardCharsets.US_ASCII) match {
            case "fmt " =>
              val fmt = buf.getShort; val channels = buf.getShort
              sampleRate = buf.getInt
              buf.getInt; buf.getShort
              val bits = buf.getShort
              if (fmt != 1 || channels != 1 || bits != 16) return None
              buf.position(buf.position() + (size - 16))
            case "data" =>
              val n = size / 2
              if (buf.remaining() < size) return None
              val out = new Array[Short](n)
              var i = 0
              while (i < n) { out(i) = buf.getShort; i += 1 }
              samples = out
            case _ => buf.position(buf.position() + size)
          }
        }
        if (sampleRate == 0 || samples == null) None else Some((sampleRate, samples))
      } catch { case _: Throwable => None }
    }

    /** Audio features: RMS, zero-crossing rate, and 4 Goertzel band
      * energies (250/500/1000/2000 Hz), normalized = 6 values. */
    def audioFeatures(sampleRate: Int, samples: Array[Short]): Array[Float] = {
      val n = samples.length
      if (n == 0) return new Array[Float](6)
      var sum2 = 0.0
      var crossings = 0
      var i = 0
      while (i < n) {
        val s = samples(i) / 32768.0
        sum2 += s * s
        if (i > 0 && (samples(i) >= 0) != (samples(i - 1) >= 0)) crossings += 1
        i += 1
      }
      val rms = math.sqrt(sum2 / n)
      val zcr = crossings.toDouble / n
      val bands = Array(250.0, 500.0, 1000.0, 2000.0).map { f =>
        // Goertzel power at frequency f
        val k = 2.0 * math.Pi * f / sampleRate
        val coeff = 2.0 * math.cos(k)
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
        var j = 0
        while (j < n) {
          s0 = samples(j) / 32768.0 + coeff * s1 - s2
          s2 = s1; s1 = s0
          j += 1
        }
        val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
        (math.sqrt(math.max(power, 0.0)) / n).toFloat
      }
      Array(rms.toFloat, zcr.toFloat) ++ bands
    }

    /** 64-bit audio fingerprint: 65 equal time windows, integer energy
      * Σ|s| per window, bit i set iff window i+1's energy exceeds window
      * i's — the delta-sign scheme (the shape of Shazam/Chromaprint
      * fingerprints, reduced to one word). ALL-INTEGER, so bit-stable
      * across platforms; robust to small amplitude noise (energy deltas
      * dominate), flipped by re-ordering or different audio. */
    def audioFingerprint64(samples: Array[Short]): Long = {
      val n = samples.length
      if (n < 65) return 0L
      val energy = new Array[Long](65)
      var w = 0
      while (w < 65) {
        val from = (w.toLong * n / 65).toInt
        val until = ((w + 1).toLong * n / 65).toInt
        var e = 0L
        var i = from
        while (i < until) { e += math.abs(samples(i).toLong); i += 1 }
        energy(w) = e
        w += 1
      }
      var hash = 0L
      var b = 0
      while (b < 64) {
        if (energy(b + 1) > energy(b)) hash |= (1L << b)
        b += 1
      }
      hash
    }

    // --- video: "GVID" container = magic + frameCount + w + h + PPM-less
    //     packed RGB frames (a stand-in for a real container; the frame
    //     payloads and sampling math are real) ---

    def encodeVideo(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val frameLen = w * h * 3
      require(frames.forall(_.length == frameLen))
      val buf = ByteBuffer.allocate(16 + frames.length * frameLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("GVID".getBytes(StandardCharsets.US_ASCII))
      buf.putInt(frames.length).putInt(w).putInt(h)
      frames.foreach(buf.put)
      buf.array()
    }

    def decodeVideoHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes.length < 16) return None
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](4); buf.get(magic)
      if (new String(magic, StandardCharsets.US_ASCII) != "GVID") return None
      val (n, w, h) = (buf.getInt, buf.getInt, buf.getInt)
      if (n <= 0 || w <= 0 || h <= 0 || bytes.length < 16 + n.toLong * w * h * 3) None
      else Some((n, w, h))
    }

    def decodeVideoFrame(bytes: Array[Byte], frameIndex: Int): Option[(Int, Int, Array[Byte])] =
      decodeVideoHeader(bytes).flatMap { case (n, w, h) =>
        if (frameIndex < 0 || frameIndex >= n) None
        else {
          val frameLen = w * h * 3
          val off = 16 + frameIndex * frameLen
          Some((w, h, java.util.Arrays.copyOfRange(bytes, off, off + frameLen)))
        }
      }
  }

  // ------------------------------------------------------------------
  // Synthetic corpus (real encoded payloads)
  // ------------------------------------------------------------------

  /** Deterministic synthetic media table with REAL payloads: PPM images
    * (gradient + seeded noise), PCM WAV audio (sine + noise), and GVID
    * video (moving gradient frames, 1 frame/second). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(i)
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val w = 16 + (i % 4).toInt * 4
      val h = 16
      kind match {
        case "image" =>
          MediaItem(i, kind, Codecs.encodePpm(w, h, syntheticRgb(w, h, rnd, 0)), w, h, 0L)
        case "audio" =>
          val sr = 8000
          val seconds = 1 + (i % 3).toInt
          val freq = 200.0 + (i % 10) * 100.0
          val samples = Array.tabulate(sr * seconds) { t =>
            val v = 0.5 * math.sin(2 * math.Pi * freq * t / sr) + 0.05 * rnd.nextGaussian()
            (v * 32767).max(-32768).min(32767).toShort
          }
          MediaItem(i, kind, Codecs.encodeWavPcm16(sr, samples), 0, 0, seconds * 1000L)
        case _ =>
          val frames = (1 + i % 30).toInt
          val payload = Codecs.encodeVideo(w, h, (0 until frames).map(f => syntheticRgb(w, h, rnd, f)))
          MediaItem(i, kind, payload, w, h, frames * 1000L)
      }
    }
  }

  private def syntheticRgb(w: Int, h: Int, rnd: scala.util.Random, phase: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        rgb(p) = (((x + phase) * 255 / w) & 0xff).toByte
        rgb(p + 1) = ((y * 255 / h) & 0xff).toByte
        rgb(p + 2) = (rnd.nextInt(256) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    rgb
  }

  // ------------------------------------------------------------------
  // Batched operators (the mapInPandas shape)
  // ------------------------------------------------------------------

  /** Batched decode + feature extraction: rows stream through the codec
    * per partition; decode failures flow to `ok = false` rows. Features
    * are padded/truncated to `dim`. */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 64): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val decoded: Option[Array[Float]] = m.kind match {
          case "image" =>
            Codecs.decodePpm(m.bytes).map { case (w, h, rgb) => Codecs.imageFeatures(w, h, rgb) }
          case "audio" =>
            Codecs.decodeWavPcm16(m.bytes).map { case (sr, s) => Codecs.audioFeatures(sr, s) }
          case "video" =>
            Codecs.decodeVideoFrame(m.bytes, 0).map { case (w, h, rgb) =>
              Codecs.imageFeatures(w, h, rgb) :+ (m.durationMs / 1000.0f)
            }
          case _ => None
        }
        decoded match {
          case Some(f) => MediaFeatures(m.mediaId, m.kind, dim, java.util.Arrays.copyOf(f, dim), ok = true)
          case None => MediaFeatures(m.mediaId, m.kind, dim, new Array[Float](dim), ok = false)
        }
      }
    }
  }

  /** Resize image payloads to `tw`x`th` (nearest neighbor), re-encoded as
    * PPM; non-images and undecodable payloads pass through unchanged. */
  def resizeImages(items: Dataset[MediaItem], tw: Int, th: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map {
        case m if m.kind == "image" =>
          Codecs.decodePpm(m.bytes) match {
            case Some((w, h, rgb)) =>
              m.copy(bytes = Codecs.encodePpm(tw, th, Codecs.resizeNearest(w, h, rgb, tw, th)),
                width = tw, height = th)
            case None => m
          }
        case m => m
      }
    }
  }

  /** Frame sampling for video rows: decode the frame nearest each
    * `everyMs` timestamp, one output row per sampled frame. */
  def sampleFrames(items: Dataset[MediaItem], everyMs: Long = 5000L): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      Codecs.decodeVideoHeader(m.bytes) match {
        case None => Iterator.empty
        case Some((frameCount, _, _)) =>
          val n = math.max(1, (m.durationMs / everyMs).toInt)
          (0 until n).iterator.flatMap { s =>
            val ptsMs = s * everyMs
            val idx = math.min(((ptsMs.toDouble / m.durationMs) * frameCount).toInt, frameCount - 1)
            Codecs.decodeVideoFrame(m.bytes, idx).map { case (_, _, rgb) =>
              Frame(m.mediaId, idx, ptsMs, rgb)
            }
          }
      }
    }
  }

  /** Per-image perceptual hash rows (mediaId, ahash) — undecodable or
    * non-image rows are dropped. One decode pass in the scan stage. */
  def imageAHash(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "image").flatMap { m =>
      Codecs.decodePpm(m.bytes).map { case (w, h, rgb) =>
        (m.mediaId, Codecs.averageHash64(w, h, rgb))
      }
    }.toDF("id", "ahash")
  }

  /** Per-image DCT perceptual hash rows ([[Codecs.perceptualHash64]]);
    * the column is named `ahash` so [[bandedHammingPairs]]' 4×16-band
    * engine applies unchanged. */
  def imagePHash(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "image").flatMap { m =>
      Codecs.decodePpm(m.bytes).map { case (w, h, rgb) =>
        (m.mediaId, Codecs.perceptualHash64(w, h, rgb))
      }
    }.toDF("id", "ahash")
  }

  /** Image near-duplicate pairs by DCT perceptual hash — same banded
    * engine and pigeonhole-recall argument as [[imageNearDups]], with
    * pHash's robustness to global brightness/contrast edits (which move
    * every aHash cell's luma but not the DCT sign structure). */
  def imagePHashDups(items: Dataset[MediaItem], maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(imagePHash(items), maxHamming)

  /** Per-audio fingerprint rows ([[Codecs.audioFingerprint64]]). */
  def audioFingerprint(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "audio").flatMap { m =>
      Codecs.decodeWavPcm16(m.bytes).map { case (_, samples) =>
        (m.mediaId, Codecs.audioFingerprint64(samples))
      }
    }.toDF("id", "ahash")
  }

  /** Per-video thumbnail hash: aHash of frame 0 — the cheap "same clip,
    * different container" screen. */
  def videoThumbHash(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      Codecs.decodeVideoFrame(m.bytes, 0).map { case (w, h, rgb) =>
        (m.mediaId, Codecs.averageHash64(w, h, rgb))
      }
    }.toDF("id", "ahash")
  }

  /** Banded Hamming candidate pairs + exact popcount verify over ANY
    * (id, ahash) fingerprint table — the shared engine behind
    * [[imageNearDups]] / [[audioNearDups]] / [[videoThumbDups]] (the
    * SimHash banding math reused across modalities). 4 × 16-bit bands:
    * Hamming ≤ 3 cannot touch all four (pigeonhole) → perfect recall up
    * to maxHamming 3; candidates are 4 equi-joins over 10-byte rows,
    * never an all-pairs compare. */
  def bandedHammingPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16 banding guarantees recall only up to Hamming 3")
    val banded = hashes.select(col("id"), col("ahash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("ahash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("ahash"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Audio near-duplicate pairs by delta-sign fingerprint Hamming. */
  def audioNearDups(items: Dataset[MediaItem], maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(audioFingerprint(items), maxHamming)

  /** Video near-duplicate pairs by thumbnail aHash Hamming. */
  def videoThumbDups(items: Dataset[MediaItem], maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(videoThumbHash(items), maxHamming)

  /** Per-video sampled-frame perceptual hash set: one (id, fhash) row
    * per distinct aHash among frames sampled every `everyMs` — the
    * content signature [[videoContentDups]] compares. One decode pass;
    * at 100 TB the corpus reduces to |videos|·(duration/everyMs) 16-byte
    * rows and the pixels never shuffle. */
  def videoFrameHashes(items: Dataset[MediaItem], everyMs: Long = 1000L): DataFrame = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      Codecs.decodeVideoHeader(m.bytes) match {
        case None => Iterator.empty
        case Some((frameCount, _, _)) =>
          val n = math.max(1, (m.durationMs / everyMs).toInt)
          (0 until n).iterator.flatMap { s =>
            val ptsMs = s * everyMs
            val idx = math.min(((ptsMs.toDouble / m.durationMs) * frameCount).toInt,
              frameCount - 1)
            Codecs.decodeVideoFrame(m.bytes, idx).map { case (fw, fh, rgb) =>
              (m.mediaId, Codecs.averageHash64(fw, fh, rgb))
            }
          }
      }
    }.toDF("id", "fhash").distinct()
  }

  /** Content-based video near-dup: pairs sharing at least `minShared`
    * sampled-frame hashes — catches the TRIMMED/re-cut copy the
    * thumbnail screen misses (a clip missing its first frames has a
    * different frame 0 but nearly the same frame SET). Set overlap on
    * exact 64-bit frame hashes: one equi-join on fhash (never pixels),
    * count per pair — the `sourceOverlap` digest-join shape applied to
    * frames, so cost is driven by hash collisions (≈ true shared
    * content), not by |videos|². */
  def videoContentDups(items: Dataset[MediaItem], everyMs: Long = 1000L,
      minShared: Int = 1): DataFrame = {
    require(minShared >= 1, "minShared must be positive")
    val fh = videoFrameHashes(items, everyMs)
    fh.as("a").join(fh.as("b"),
        col("a.fhash") === col("b.fhash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  /** Image near-duplicate pairs by perceptual hash: Hamming(aHash) ≤
    * `maxHamming` — the image-modality member of the dedup family
    * (exact → MinHash text → SimHash → embedding-cosine → THIS).
    *
    * Scale path is the SimHash banding argument verbatim: the 64-bit
    * hash splits into 4 × 16-bit bands; ≤ 3 differing bits cannot touch
    * all 4 bands (pigeonhole), so same-band-value candidates have
    * perfect recall at maxHamming ≤ 3, and the verify is one codegen'd
    * `bit_count(a ^ b)`. No all-pairs compare anywhere: candidates come
    * from 4 band-key equi-joins (one shuffle of 4×|images| 10-byte
    * rows), duplicates collapsed before the popcount. */
  def imageNearDups(items: Dataset[MediaItem], maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(imageAHash(items), maxHamming)

  /** Metadata-only projection (never deserializes payloads — column
    * pruning keeps the binary out of the scan entirely). */
  def metadataSummary(items: Dataset[MediaItem]): DataFrame =
    items.toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("bytes"))).as("total_bytes"),
        avg(col("durationMs")).as("avg_duration_ms"))
      .orderBy("kind")
}
