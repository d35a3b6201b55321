package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column plumbing: image/audio/video as opaque BINARY payloads
  * with typed metadata, plus a decode/feature-extract stage.
  *
  * All three modalities decode through REAL JDK codecs: PNG via
  * javax.imageio, WAV via javax.sound.sampled, and video via the
  * javax.imageio multi-frame GIF reader (the one multi-frame container
  * the JDK can both write and read — it stands in for the video container
  * a production pipeline would decode via FFI). The deterministic
  * byte-derived STUB survives only as the corrupt-payload fallback, so a
  * payload no codec can parse is data, not a crash.
  *
  * Scale posture: payloads never pass through a shuffle here — decode is a
  * narrow mapPartitions directly over the scan; metadata-only queries
  * (count by modality, size stats) prune the payload column entirely at the
  * parquet reader.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta_source", StringType)))

  /** Synthesize a deterministic media table from `documents`: payload =
    * UTF-8 bytes of the text (stand-in for real image/audio bytes),
    * modality round-robins by doc_id.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("meta_source"))

  /** Deterministic image dimensions for the synthetic PNG payloads — the
    * fixture contract the DuckDB oracle re-derives from doc_id.
    */
  def imageDims(mediaId: Long): (Int, Int) =
    ((4 + mediaId % 16).toInt, (4 + (mediaId / 16) % 16).toInt)

  /** Encode a real PNG for a media id: dims from `imageDims`, deterministic
    * pixel pattern. Runs through javax.imageio — an actual codec, so the
    * decode side exercises a real header parse, not a stub.
    */
  private def encodePng(mediaId: Long): Array[Byte] = {
    val (w, h) = imageDims(mediaId)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((x * 31 + y * 7 + mediaId) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic audio parameters for the synthetic WAV payloads — the
    * fixture contract the DuckDB oracle re-derives from doc_id: sample
    * rate cycles four standard PCM rates, frame count spans 64..319.
    */
  def audioParams(mediaId: Long): (Int, Int) =
    (Seq(8000, 11025, 16000, 22050)((mediaId % 4).toInt),
      (64 + mediaId % 256).toInt)

  /** Encode a real WAV (PCM 16-bit mono) for a media id: rate/frames from
    * `audioParams`, a deterministic sine payload. Runs through
    * javax.sound.sampled — an actual audio codec in the JDK, so the decode
    * side exercises a real RIFF/fmt-chunk parse, not a stub.
    */
  private def encodeWav(mediaId: Long): Array[Byte] = {
    val (rate, nFrames) = audioParams(mediaId)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (math.sin(2 * math.Pi * (220.0 + mediaId % 110) * i / rate) * 12000).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic video parameters for the synthetic multi-frame GIF
    * payloads — the fixture contract the DuckDB oracle re-derives from
    * doc_id: (n_frames 2..8, width 6..15, height 6..15).
    */
  def videoParams(mediaId: Long): (Int, Int, Int) =
    ((2 + mediaId % 7).toInt, (6 + mediaId % 10).toInt, (6 + (mediaId / 10) % 10).toInt)

  /** Encode a real multi-frame (animated) GIF for a media id: frame count
    * and dims from `videoParams`, deterministic per-frame pixel pattern.
    * Runs through javax.imageio's GIF sequence writer — an actual
    * multi-frame container codec in the JDK, so the decode side exercises
    * a real header + frame enumeration, not a stub. (GIF is the one
    * multi-frame format the JDK can both write and read; it stands in for
    * the video container a production pipeline would decode via FFI.)
    */
  private def encodeGif(mediaId: Long): Array[Byte] = {
    val (nFrames, w, h) = videoParams(mediaId)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = ((x * 31 + y * 7 + f * 53 + mediaId) % 256).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Media table with REAL payloads for all three modalities: image rows
    * carry a valid PNG (javax.imageio), audio rows a valid WAV
    * (javax.sound.sampled), video rows a valid multi-frame GIF
    * (javax.imageio sequence writer). Narrow: payloads are generated in
    * place, never shuffled.
    */
  def withRealMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val base = fromDocuments(docs)
    val out = base.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getString(1) match {
          case "image" => encodePng(id)
          case "audio" => encodeWav(id)
          case _ => encodeGif(id)
        }
        Row(id, r.getString(1), payload, r.getString(3))
      }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Decode video (multi-frame GIF) payloads with the real codec: frame
    * count from the reader's frame enumeration, dims from frame 0. Narrow
    * mapPartitions over the scan; non-decodable payloads surface as NULL
    * fields rather than a crash.
    */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      lazy val gifReader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rows.map { r =>
        val meta = gifMetaFast(gifReader, r.getAs[Array[Byte]]("payload"))
        if (meta == null) Row(r.getLong(0), null, null, null)
        else Row(r.getLong(0), meta._1, meta._2, meta._3)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** (n_frames, width, height) of a GIF payload, or null if no reader can
    * parse it (NonFatal: corrupt files are data, not crashes).
    */
  private def decodeGifMeta(payload: Array[Byte]): (Int, Int, Int) =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) null
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          (reader.getNumImages(true), reader.getWidth(0), reader.getHeight(0))
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Same metadata via a caller-POOLED GIF reader (one per partition, like
    * `extractFeatures`' PNG reader): the per-row `getImageReaders` SPI
    * registry scan + reader construction is the residual decode-meta
    * jitter the round-11 pin chased. Returns null on anything the GIF
    * codec can't parse — callers fall back to the generic per-row path so
    * a foreign-codec payload still decodes exactly as before.
    */
  private def gifMetaPooled(reader: javax.imageio.ImageReader,
                            payload: Array[Byte]): (Int, Int, Int) =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        // seekForwardOnly must stay FALSE: getNumImages(allowSearch=true)
        // throws IllegalStateException against a forward-only input (the
        // round-12 review caught the PNG pooling's (true, true) pattern
        // copy-pasted here, which made every row fall through to the slow
        // per-row SPI path). ignoreMetadata=true is still safe.
        reader.setInput(iis, false, true)
        (reader.getNumImages(true), reader.getWidth(0), reader.getHeight(0))
      } finally { reader.setInput(null); iis.close() }
    } catch { case scala.util.control.NonFatal(_) => null }

  private def gifMetaFast(reader: javax.imageio.ImageReader,
                          payload: Array[Byte]): (Int, Int, Int) = {
    val m = gifMetaPooled(reader, payload)
    if (m != null) m else decodeGifMeta(payload)
  }

  /** Decode audio payloads with the real codec (javax.sound.sampled):
    * parses the WAV header for true sample rate / frame count / channels.
    * Narrow mapPartitions over the scan; non-decodable payloads surface as
    * NULL fields rather than a crash.
    */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", LongType),
      StructField("channels", IntegerType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val meta = try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
          val f = ais.getFormat
          (f.getSampleRate.toInt, ais.getFrameLength, f.getChannels)
        } catch { case _: Exception => null }
        if (meta == null) Row(r.getLong(0), null, null, null)
        else Row(r.getLong(0), meta._1, meta._2, meta._3)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Decode image payloads with the real codec (javax.imageio): parses the
    * PNG header/IDAT for true width × height. Narrow mapPartitions over the
    * scan; non-decodable payloads surface as NULL dims rather than a crash
    * (a 100 TB corpus always contains corrupt files).
    */
  def decodeImageDims(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        // NonFatal, not just IOException: ImageIO readers throw runtime
        // exceptions (IllegalArgument, ArrayIndexOutOfBounds, NegativeArray
        // Size) on payloads with a valid magic number but malformed body —
        // those are corrupt DATA, not crashes.
        val img = try {
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row(r.getLong(0), null, null)
        else Row(r.getLong(0), img.getWidth, img.getHeight)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Perceptual (average) hash of image payloads from REAL pixel decode —
    * the image-dedup primitive (near-identical images collide; aHash is
    * the simplest of the pHash family). To keep the hash cross-engine
    * exact, the usual area-resample is replaced by a fixed 6×10 POINT
    * GRID: sample gray at (⌊gx·w/6⌋, ⌊gy·h/10⌋), bit j = gy·6+gx set iff
    * 60·g_j > Σg — all integer arithmetic, so the DuckDB twin re-derives
    * the identical 60-bit hash from the synthesis contract while Spark
    * computes it from the DECODED PNG bytes. The mean-threshold makes
    * the hash invariant to uniform brightness shifts (60·(g+c) >
    * Σg+60·c ⇔ 60·g > Σg) — the fixture's same-dims images are exactly
    * such shifts (mod-256 wraparound aside), which is what the pairs
    * query surfaces. 60 bits on purpose: the hash drops straight into
    * the simhashPairs60 pigeonhole banding for hamming-≤2 pair
    * generation at scale.
    */
  /** The 6×10-grid mean-threshold hash of one decoded frame — shared by
    * the image and video tiers so the two modalities can never drift.
    */
  private def gridAHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth.toLong
    val h = img.getHeight.toLong
    val g = new Array[Long](60)
    var j = 0
    var gy = 0
    while (gy < 10) {
      var gx = 0
      while (gx < 6) {
        val x = ((gx * w) / 6).toInt
        val y = ((gy * h) / 10).toInt
        g(j) = (img.getRGB(x, y) & 0xff).toLong
        j += 1; gx += 1
      }
      gy += 1
    }
    val tot = g.sum
    var hash = 0L
    j = 0
    while (j < 60) {
      if (60L * g(j) > tot) hash |= 1L << j
      j += 1
    }
    hash
  }

  /** Orthonormal DCT-II basis b(u)(x) = α(u)·cos((2x+1)uπ/16), computed
    * ONCE driver-side: the Spark hash folds these exact doubles, and the
    * oracle receives the same values as shortest-decimal literals — so
    * cos() never runs inside either engine and there is no libm hazard.
    */
  val dctBasis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val a = if (u == 0) math.sqrt(1.0 / 8.0) else math.sqrt(2.0 / 8.0)
    a * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** The 15 low-frequency (u, v) pairs of the 4×4 DCT block minus the DC
    * term, with bit index k = v·4 + u − 1 — shared with the oracle.
    */
  val phashPairs: Seq[(Int, Int, Int)] =
    for (v <- 0 to 3; u <- 0 to 3 if !(u == 0 && v == 0))
      yield (u, v, v * 4 + u - 1)

  /** DCT low-frequency perceptual hash (the pHash family, miniature:
    * 8×8 gray grid → 8×8 DCT-II → 4×4 low block minus DC → median
    * threshold → 15 bits). Robust to uniform brightness AND contrast
    * changes (both shift/scale every low-frequency coefficient together,
    * and the median moves with them), where aHash only survives
    * brightness. Deterministic: integer grid, fixed-order double folds
    * against the driver-computed basis, median = the 8th smallest
    * coefficient, strict > at the threshold.
    */
  private[graft] def gridPHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth.toLong
    val h = img.getHeight.toLong
    val g = new Array[Double](64)
    var j = 0
    while (j < 64) {
      val gx = j % 8
      val gy = j / 8
      val x = ((gx * w) / 8).toInt
      val y = ((gy * h) / 8).toInt
      g(j) = (img.getRGB(x, y) & 0xff).toDouble
      j += 1
    }
    // stab(6) collapses summation-tree noise (DuckDB's list_sum is not a
    // strict left fold) BEFORE the median/threshold comparisons — the
    // same reason every cosine in the repo is stab'd
    val coefs = phashPairs.map { case (u, v, _) =>
      var acc = 0.0
      var jj = 0
      while (jj < 64) {
        acc += (g(jj) * dctBasis(u)(jj % 8)) * dctBasis(v)(jj / 8)
        jj += 1
      }
      graft.functions.Stable.stab6(acc)
    }.toArray
    val sorted = coefs.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(7)
    var hash = 0L
    phashPairs.zipWithIndex.foreach { case ((_, _, k), i) =>
      if (coefs(i) > med) hash |= 1L << k
    }
    hash
  }

  def decodeImagePHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val img = try {
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row(r.getLong(0), null)
        else Row(r.getLong(0), gridPHash(img))
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Near-dup image pairs at hamming ≤ 1 over the 15-bit pHash by
    * single-bit-flip pigeonhole blocking: every image emits its hash
    * plus the 15 one-bit-flipped variants as join keys, so two hashes
    * within hamming 1 share at least one key and the candidate stage is
    * a pure EQUI-join (16 keys/image — constant blowup; no banding
    * machinery needed at this hash width). Exact bit_count verify +
    * distinct on the (a < b) pairs.
    */
  def phashPairs1(hashes: DataFrame): DataFrame = {
    val keys = hashes.filter(col("phash").isNotNull)
      .select(col("media_id"), col("phash"),
        explode(typedLit((-1 until 15).toList)).as("k"))
      .select(col("media_id"), col("phash"),
        when(col("k") === -1, col("phash"))
          .otherwise(expr("phash ^ shiftleft(CAST(1 AS BIGINT), k)")).as("key"))
    keys.as("a").join(keys.as("b"),
        col("a.key") === col("b.key") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("doc_a"), col("b.media_id").as("doc_b"),
        expr("bit_count(a.phash ^ b.phash)").cast("long").as("hamming"))
      .filter(col("hamming") <= 1)
      .distinct()
  }

  /** 60-bit PCM sign fingerprint from REAL audio decode: bit i (of
    * samples 1..60) is set iff the decoded 16-bit sample is strictly
    * positive. The sign structure of a waveform is its coarsest
    * content signature — amplitude-invariant (any gain > 0 preserves
    * it), and two clips whose rate-normalized pitch is close differ in
    * only a few sign bits, so the fingerprint drops straight into the
    * simhashPairs60 pigeonhole machinery for near-dup blocking. The
    * fixture's synthesis contract makes each bit EXACTLY re-derivable
    * by integer arithmetic — sign(sin(2π·f·i/rate)) is decided by
    * (f·i) mod rate vs rate/2, with |sin|·12000 ≥ 3.4 whenever the
    * residue is nonzero — so the oracle replays the fingerprint with
    * no floating point at all (MultimodalQueries.audioFpCte).
    */
  /** All three audio decoders below read raw frames as 16-bit mono
    * little-endian signed PCM; a VALID WAV in any other layout (stereo,
    * 8-bit, big-endian, float) would decode into a silently wrong
    * signature rather than fail, so the frame format is checked up front
    * and a mismatch surfaces as the null row every corrupt-payload path
    * already uses (round-14 advice).
    */
  private def isPcm16MonoLe(f: javax.sound.sampled.AudioFormat): Boolean =
    f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
      f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian

  def decodeAudioSignFp(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fp", LongType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val fp = try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
          val buf = new Array[Byte](2 * 61) // samples 0..60, 16-bit mono LE
          var off = 0
          var n = 0
          while (isPcm16MonoLe(ais.getFormat) && off < buf.length && n >= 0) {
            n = ais.read(buf, off, buf.length - off)
            if (n > 0) off += n
          }
          if (off < buf.length) null
          else {
            var bits = 0L
            var i = 1
            while (i <= 60) {
              val s = ((buf(2 * i + 1).toInt << 8) | (buf(2 * i) & 0xff)).toShort
              bits = (bits << 1) | (if (s > 0) 1L else 0L)
              i += 1
            }
            java.lang.Long.valueOf(bits)
          }
        } catch { case scala.util.control.NonFatal(_) => null }
        Row(r.getLong(0), fp)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** ABSOLUTE-pitch variant of the sign fingerprint: the PCM is first
    * nearest-neighbor resampled to a common 22050 Hz grid (src index
    * (i·rate)/22050, integer division — still pure integer arithmetic
    * for the oracle), so bit i traces sin's sign at a fixed WALL-CLOCK
    * instant instead of a fixed sample ordinal. Two clips with the same
    * frequency at DIFFERENT sample rates now collide (the rate-relative
    * tier's documented blind spot, SURVEY §2.9); truncation of the
    * source index flips only bits near crossings, which the hamming-2
    * verify absorbs.
    */
  def decodeAudioSignFpCommon(media: DataFrame,
                              commonRate: Int = 22050): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fp", LongType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val fp = try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
          val rate = ais.getFormat.getSampleRate.toInt
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var bits = 0L
          var i = 1
          var ok = isPcm16MonoLe(ais.getFormat)
          while (i <= 60 && ok) {
            val src = (i.toLong * rate / commonRate).toInt
            if (src >= n) ok = false
            else {
              val s = ((bytes(2 * src + 1).toInt << 8) | (bytes(2 * src) & 0xff)).toShort
              bits = (bits << 1) | (if (s > 0) 1L else 0L)
            }
            i += 1
          }
          if (!ok) null else java.lang.Long.valueOf(bits)
        } catch { case scala.util.control.NonFatal(_) => null }
        Row(r.getLong(0), fp)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Zero-crossing-rate pitch estimate over the FULL decoded PCM stream
    * (the sign fingerprint reads 60 samples; this walks every frame):
    * zcr counts strict sign flips between consecutive samples, and
    * pitch ≈ zcr·rate / (2·(n−1)) — the classic time-domain pitch
    * detector. Same exactness argument as the fingerprint: each
    * sample's sign is decided by an integer residue, so the oracle
    * replays zcr and the rounded pitch with no trig; meanwhile Spark
    * derives them from the REAL decoded bytes, so a codec bug anywhere
    * in the stream (not just the head) hash-fails.
    */
  def decodeAudioZcr(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", LongType),
      StructField("zcr", LongType),
      StructField("pitch_hz", LongType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val res = try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
          val rate = ais.getFormat.getSampleRate.toInt
          if (!isPcm16MonoLe(ais.getFormat)) null
          else {
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            var zcr = 0L
            var prev = 0
            var i = 0
            while (i < n) {
              val s = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
              if (prev * s < 0) zcr += 1
              if (s != 0) prev = s else prev = 0
              i += 1
            }
            val pitch = math.floor(zcr.toDouble * rate / (2.0 * (n - 1)) + 0.5).toLong
            (n.toLong, zcr, pitch)
          }
        } catch { case scala.util.control.NonFatal(_) => null }
        if (res == null) Row(r.getLong(0), null, null, null)
        else Row(r.getLong(0), res._1, res._2, res._3)
      }
    }
    spark.createDataFrame(out, schema)
  }

  // ==================== SPECTRAL AUDIO TIER (round 15) ====================

  /** Integer-DFT window / bin-count / resample-grid constants for the
    * spectral fingerprint. 256 samples on the 22050 Hz common grid give
    * 86.1 Hz bins; bins 1..24 span 86-2067 Hz — the fundamental AND the
    * discriminating 3rd harmonic of every fixture frequency.
    */
  val SpecWindow = 256
  val SpecBins = 24
  val SpecCommonRate = 22050
  val SpecShift = 524288L // 2^19 post-sum down-shift; keeps E = R^2+I^2 in BIGINT

  /** Shared 256-entry cosine table for the fixed-point DFT:
    * specCos(j) = round(2^14 * cos(2*pi*j/256)). Computed ONCE here from
    * libm and baked VERBATIM into the DuckDB oracle as literals
    * (MultimodalQueries.spectralCtab), so both engines fold identical
    * integers — the transform is integer-exact by construction, closing
    * SURVEY §2.9's "no FFT in the oracle's integer-exact reach" with a
    * fixed-point DFT instead of a float FFT. sin rides the same table by
    * the quarter-period shift: sin(2*pi*j/256) = cos(2*pi*(j+192)/256).
    */
  lazy val specCos: Array[Long] = Array.tabulate(SpecWindow)(j =>
    Math.round(16384.0 * Math.cos(2 * Math.PI * j / SpecWindow)))

  /** Synthesis contract of the SPECTRAL fixture (one clip per audio
    * doc_id, id1 = doc_id/3, g = id1%12): frequency 220/392/564 Hz by
    * g%3 — spaced >= 2 DFT bins so distinct fundamentals never alias —
    * waveform TRIANGLE (g/3 even) or SQUARE (odd), rate 11025/22050 by
    * g/6, n = 256+id1%64 frames. tri and sq at the same (f, rate) have
    * IDENTICAL sample signs everywhere (both are sign(t) of the same
    * integer triangle phase; sq is 12000*sign(t), tri is
    * floorDiv(12000*t, rate) whose sign matches since the fixture's
    * nonzero |t| stays above rate/12000) — the planted equal-sign /
    * different-spectrum blind spot the sign tiers provably cannot see
    * and this tier exists to catch: tri falls off 1/k^2 in harmonics,
    * sq 1/k, so band energies differ at 3f.
    */
  def spectralParams(mediaId: Long): (Int, Boolean, Int, Int) = {
    val id1 = mediaId / 3
    val g = (id1 % 12).toInt
    (Seq(220, 392, 564)(g % 3), (g / 3) % 2 == 1,
      if ((g / 6) % 2 == 0) 11025 else 22050, (256 + id1 % 64).toInt)
  }

  /** Integer-exact sample i of a spectral-fixture clip: t is the integer
    * triangle |((4*f*i) mod 4r) - 2r| - r in [-r, r]; triangle clips scale
    * it to amplitude 12000 by floor division, squares take 12000*sign(t).
    */
  def spectralSample(f: Int, i: Int, rate: Int, sq: Boolean): Int = {
    val m = (4L * f * i) % (4L * rate)
    val t = Math.abs(m - 2L * rate) - rate
    val v = if (sq) 12000L * rate * java.lang.Long.signum(t) else 12000L * t
    Math.floorDiv(v, rate.toLong).toInt
  }

  private def encodeWavSpectral(mediaId: Long): Array[Byte] = {
    val (f, sq, rate, n) = spectralParams(mediaId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = spectralSample(f, i, rate, sq)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The spectral fixture as a real-WAV media table (media_id, payload)
    * over the audio doc population — same narrow generate-in-place shape
    * as withRealMedia.
    */
  def withSpectralMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val out = docs.filter(col("doc_id") % 3 === 1).select("doc_id")
      .rdd.mapPartitions(_.map { r =>
        Row(r.getLong(0), encodeWavSpectral(r.getLong(0)))
      })
    spark.createDataFrame(out, schema)
  }

  /** Spectral fingerprint from REAL audio decode — the production
    * technique the sign tiers approximate (Chromaprint/Shazam family,
    * in fixed point): decode PCM, nearest-neighbor resample SpecWindow
    * samples onto the common 22050 Hz grid (the abs tier's integer index
    * map), then a fixed-point DFT with the shared specCos table:
    * R_k = floorDiv(sum_i y_i*cos[(k*i)%256], 2^19), I_k likewise with
    * the +192 quarter shift, E_k = R^2 + I^2. Every step is integer
    * arithmetic both engines replay exactly. Outputs per clip:
    *   fp   — 24 bits, bit k set iff 16*E_k > max(E) (significant-band
    *          profile; max-relative so it is gain- and length-robust),
    *   dom  — dominant bin (argmax E, ties to the lower bin),
    *   prof — the normalized integer energy profile (E_k*1024)/sum(E),
    *          space-joined: the exact-verify feature for the pair stage.
    * Null row when the payload is corrupt, non-PCM16LE-mono, or too
    * short for the resample window (src index past the clip).
    */
  def decodeAudioSpectral(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fp", LongType),
      StructField("dom", LongType),
      StructField("prof", StringType)))
    val w = SpecWindow
    val nb = SpecBins
    val common = SpecCommonRate
    val shiftD = SpecShift
    val ctab = specCos
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val res = try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
          val rate = ais.getFormat.getSampleRate.toInt
          if (!isPcm16MonoLe(ais.getFormat)) null
          else {
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            if (((w - 1).toLong * rate / common).toInt >= n) null
            else {
              val y = new Array[Long](w)
              var i = 0
              while (i < w) {
                val src = (i.toLong * rate / common).toInt
                y(i) = ((bytes(2 * src + 1).toInt << 8) | (bytes(2 * src) & 0xff)).toShort.toLong
                i += 1
              }
              val e = new Array[Long](nb)
              var k = 1
              while (k <= nb) {
                var re = 0L
                var im = 0L
                var j = 0
                while (j < w) {
                  val y_j = y(j)
                  re += y_j * ctab((k * j) % 256)
                  im += y_j * ctab((k * j + 192) % 256)
                  j += 1
                }
                val rq = Math.floorDiv(re, shiftD)
                val iq = Math.floorDiv(im, shiftD)
                e(k - 1) = rq * rq + iq * iq
                // contract bound: keeps prof's e*1024 far inside Long and
                // the oracle's HUGEINT path value-identical
                require(e(k - 1) < (1L << 40),
                  s"spectral energy out of contract bound: ${e(k - 1)}")
                k += 1
              }
              val mx = e.max
              val tot = e.sum
              var fp = 0L
              var dom = -1
              var kk = 0
              while (kk < nb) {
                if (16L * e(kk) > mx) fp |= 1L << kk
                if (dom < 0 && e(kk) == mx) dom = kk + 1
                kk += 1
              }
              val prof = e.map(x => (x * 1024L) / tot).mkString(" ")
              (fp, dom.toLong, prof)
            }
          }
        } catch { case scala.util.control.NonFatal(_) => null }
        if (res == null) Row(r.getLong(0), null, null, null)
        else Row(r.getLong(0), res._1, res._2, res._3)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Spectral near-dup pairs: single-bit-flip pigeonhole over the 24-bit
    * significant-band fingerprint (hamming <= 1 — each clip emits 25
    * equi-join keys, the phashPairs1 shape), then the EXACT verify on the
    * normalized energy profiles: L1 distance <= maxL1. The fixture's
    * measured margins (BASELINE.md): same-content cross-rate pairs sit at
    * hamming <= 1 / L1 <= 100; the planted equal-sign tri-vs-sq partners
    * at hamming >= 2 / L1 >= 184; distinct fundamentals at L1 >= 1500.
    */
  def spectralPairs(sp: DataFrame, maxL1: Long = 160): DataFrame = {
    val clean = sp.filter(col("fp").isNotNull)
    val keys = clean
      .select(col("media_id"), col("fp"),
        explode(typedLit((-1 until SpecBins).toList)).as("k"))
      .select(col("media_id"), col("fp"),
        when(col("k") === -1, col("fp"))
          .otherwise(expr("fp ^ shiftleft(CAST(1 AS BIGINT), k)")).as("key"))
    // dedupe candidates BEFORE the profile verify: two clips within
    // hamming 1 share up to 25 of their flip keys, and evaluating the
    // interpreted 24-element L1 fold per DUPLICATE (not per pair) was a
    // measured 25x blowup (112 s → 4 s at sf0.1). The key join carries
    // only (id, fp); profiles join once per surviving pair.
    val cand = keys.as("a").join(keys.as("b"),
        col("a.key") === col("b.key") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("doc_a"), col("b.media_id").as("doc_b"),
        expr("bit_count(a.fp ^ b.fp)").cast("long").as("hamming"))
      .filter(col("hamming") <= 1)
      .distinct()
    val prof = clean.select(col("media_id"),
      transform(split(col("prof"), " "), x => x.cast("long")).as("pv"))
    cand
      .join(prof.as("pa"), col("doc_a") === col("pa.media_id"))
      .join(prof.as("pb"), col("doc_b") === col("pb.media_id"))
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        aggregate(zip_with(col("pa.pv"), col("pb.pv"), (x, y) => abs(x - y)),
          lit(0L), (acc, x) => acc + x).as("l1"))
      .filter(col("l1") <= maxL1)
  }

  // ===================== MP4 METADATA TIER (round 15) =====================

  /** Synthesis contract of the mp4 fixture (video doc population):
    * timescale 600·(1+id%4), duration timescale·(1+id%30) ticks,
    * 1+id%3 tracks, dims (160+16·(id%20)) × (120+16·((id/20)%20)).
    * The payload is a MINIMAL VALID mp4 box tree — ftyp, a free box of
    * id-dependent size, then moov(mvhd, free, trak(tkhd)×n) — all
    * big-endian integer fields per ISO/IEC 14496-12. The free boxes make
    * every interesting field sit at an id-DEPENDENT offset, so only a
    * real size-driven box walk (not a fixed-offset peek) can decode it.
    * Full A/V decode needs an FFI codec this container doesn't ship
    * (SURVEY §2.9); the metadata walk is pure integer byte parsing and
    * therefore oracle-able.
    */
  def mp4Params(mediaId: Long): (Int, Int, Int, Int, Int) = {
    val ts = (600 * (1 + mediaId % 4)).toInt
    val dur = (ts * (1 + mediaId % 30)).toInt
    ((ts), dur, (1 + mediaId % 3).toInt,
      (160 + 16 * (mediaId % 20)).toInt, (120 + 16 * ((mediaId / 20) % 20)).toInt)
  }

  /** Per-track contract shared by BOTH container fixtures (round 16):
    * odd track positions are VIDEO (track 1 always — the whole-file dims
    * queries stay well-defined), even positions AUDIO; codec, channel
    * count, and sample rate are id formulas the oracle re-derives.
    * Returns (isAudio, fourcc, channels, sampleRate) — the webm twin
    * maps the fourcc through `webmCodecId`.
    */
  def mp4TrackParams(mediaId: Long, t: Int): (Boolean, String, Int, Int) = {
    val isAudio = t % 2 == 0
    val codec =
      if (isAudio) Seq("mp4a", "Opus")(((mediaId / 7 + t) % 2).toInt)
      else Seq("avc1", "hev1", "av01")(((mediaId / 3 + t) % 3).toInt)
    (isAudio, codec,
      (1 + (mediaId + t) % 2).toInt,
      Seq(8000, 16000, 22050, 44100, 48000)(((mediaId / 5 + t) % 5).toInt))
  }

  /** The Matroska CodecID for the same track slot — same selector
    * formulas, Matroska namespace strings.
    */
  def webmCodecId(mediaId: Long, t: Int): String =
    if (t % 2 == 0) Seq("A_OPUS", "A_VORBIS")(((mediaId / 7 + t) % 2).toInt)
    else Seq("V_VP8", "V_VP9", "V_AV1")(((mediaId / 3 + t) % 3).toInt)

  private def encodeMp4(mediaId: Long): Array[Byte] = {
    val (ts, dur, nTracks, w, h) = mp4Params(mediaId)
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    def box(typ: String, payload: Array[Byte]): Unit = {
      o.writeInt(8 + payload.length)
      o.writeBytes(typ)
      o.write(payload)
    }
    def payload(body: java.io.DataOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(b)
      body(d)
      b.toByteArray
    }
    val identityMatrix = payload { d =>
      d.writeInt(0x00010000); d.writeInt(0); d.writeInt(0)
      d.writeInt(0); d.writeInt(0x00010000); d.writeInt(0)
      d.writeInt(0); d.writeInt(0); d.writeInt(0x40000000)
    }
    box("ftyp", payload { d =>
      d.writeBytes("isom"); d.writeInt(0x200); d.writeBytes("isom")
    })
    box("free", new Array[Byte]((mediaId % 32).toInt))
    val mvhd = payload { d =>
      d.writeInt(0) // version 0 + flags
      d.writeInt(0); d.writeInt(0) // ctime, mtime
      d.writeInt(ts); d.writeInt(dur)
      d.writeInt(0x00010000) // rate 1.0
      d.writeShort(0x0100); d.writeShort(0) // volume, reserved
      d.writeLong(0L) // reserved
      d.write(identityMatrix)
      (1 to 6).foreach(_ => d.writeInt(0)) // pre_defined
      d.writeInt(nTracks + 1) // next_track_ID
    }
    val traks = (1 to nTracks).map { t =>
      payload { d =>
        val tkhd = payload { td =>
          td.writeInt(7) // version 0, flags enabled|in_movie|in_preview
          td.writeInt(0); td.writeInt(0) // ctime, mtime
          td.writeInt(t) // track_ID
          td.writeInt(0) // reserved
          td.writeInt(dur)
          td.writeLong(0L) // reserved
          td.writeShort(0); td.writeShort(0) // layer, alternate_group
          td.writeShort(0); td.writeShort(0) // volume, reserved
          td.write(identityMatrix)
          td.writeInt(w << 16); td.writeInt(h << 16) // 16.16 fixed
        }
        d.writeInt(8 + tkhd.length); d.writeBytes("tkhd"); d.write(tkhd)
        // round 16: per-track media box — handler type (mdia/hdlr) and
        // codec sample entry (minf/stbl/stsd) per mp4TrackParams; an
        // id-dependent free box inside minf keeps offsets id-dependent
        val (isAudio, codec, ch, rate) = mp4TrackParams(mediaId, t)
        val hdlr = payload { hd =>
          hd.writeInt(0) // version/flags
          hd.writeInt(0) // pre_defined
          hd.writeBytes(if (isAudio) "soun" else "vide")
          hd.writeInt(0); hd.writeInt(0); hd.writeInt(0) // reserved
          hd.writeByte(0) // empty name
        }
        val stsd = payload { sd =>
          sd.writeInt(0) // version/flags
          sd.writeInt(1) // entry_count
          val entry =
            if (isAudio) payload { e => // AudioSampleEntry, 14496-12 §12.2.3
              e.write(new Array[Byte](6)); e.writeShort(1) // reserved, dri
              e.writeLong(0L) // reserved
              e.writeShort(ch); e.writeShort(16) // channelcount, samplesize
              e.writeInt(0) // pre_defined + reserved
              e.writeInt(rate << 16) // samplerate 16.16
            }
            else payload { e => // VisualSampleEntry, 14496-12 §12.1.3
              e.write(new Array[Byte](6)); e.writeShort(1) // reserved, dri
              e.write(new Array[Byte](16)) // pre_defined/reserved
              e.writeShort(w); e.writeShort(h)
              e.writeInt(0x00480000); e.writeInt(0x00480000) // 72 dpi
              e.writeInt(0) // reserved
              e.writeShort(1) // frame_count
              e.write(new Array[Byte](32)) // compressorname
              e.writeShort(24); e.writeShort(-1) // depth, pre_defined
            }
          sd.writeInt(8 + entry.length); sd.writeBytes(codec); sd.write(entry)
        }
        val stbl = payload { sb =>
          sb.writeInt(8 + stsd.length); sb.writeBytes("stsd"); sb.write(stsd)
        }
        val minf = payload { mf =>
          val innerFree = new Array[Byte](((mediaId / 16) % 20).toInt)
          mf.writeInt(8 + innerFree.length); mf.writeBytes("free"); mf.write(innerFree)
          mf.writeInt(8 + stbl.length); mf.writeBytes("stbl"); mf.write(stbl)
        }
        val mdia = payload { md =>
          md.writeInt(8 + hdlr.length); md.writeBytes("hdlr"); md.write(hdlr)
          md.writeInt(8 + minf.length); md.writeBytes("minf"); md.write(minf)
        }
        d.writeInt(8 + mdia.length); d.writeBytes("mdia"); d.write(mdia)
      }
    }
    val moov = payload { d =>
      d.writeInt(8 + mvhd.length); d.writeBytes("mvhd"); d.write(mvhd)
      val innerFree = new Array[Byte](((mediaId / 32) % 24).toInt)
      d.writeInt(8 + innerFree.length); d.writeBytes("free"); d.write(innerFree)
      traks.foreach { tk =>
        d.writeInt(8 + tk.length); d.writeBytes("trak"); d.write(tk)
      }
    }
    box("moov", moov)
    bos.toByteArray
  }

  /** The mp4 fixture as a media table (media_id, payload) over the video
    * doc population — generate-in-place, never shuffled.
    */
  def withMp4Media(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val out = docs.filter(col("doc_id") % 3 === 2).select("doc_id")
      .rdd.mapPartitions(_.map(r => Row(r.getLong(0), encodeMp4(r.getLong(0)))))
    spark.createDataFrame(out, schema)
  }

  /** mp4 metadata via a REAL size-driven box walk: top-level boxes are
    * enumerated by their 32-bit big-endian size fields, container boxes
    * (moov, trak) recurse, mvhd yields timescale/duration, each tkhd
    * counts a track and contributes its 16.16 dims (max across tracks).
    * Malformed trees (size < 8, box past its parent, truncated header,
    * or no mvhd) surface as the null row — corrupt files are data.
    */
  def decodeMp4Meta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("timescale", IntegerType),
      StructField("duration", IntegerType),
      StructField("n_tracks", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val buf = r.getAs[Array[Byte]]("payload")
        def be32(off: Int): Long =
          ((buf(off) & 0xffL) << 24) | ((buf(off + 1) & 0xffL) << 16) |
            ((buf(off + 2) & 0xffL) << 8) | (buf(off + 3) & 0xffL)
        var ts, dur = -1L
        var nTracks = 0
        var w, h = 0L
        var ok = true
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (ok && off < end) {
            if (off + 8 > end) { ok = false }
            else {
              val size = be32(off)
              val typ = new String(buf, off + 4, 4, "US-ASCII")
              if (size < 8 || off + size > end) ok = false
              else {
                typ match {
                  case "moov" | "trak" => walk(off + 8, off + size.toInt)
                  case "mvhd" if size >= 8 + 24 =>
                    ts = be32(off + 20); dur = be32(off + 24)
                  case "tkhd" if size >= 8 + 84 =>
                    nTracks += 1
                    w = math.max(w, be32(off + 84) >> 16)
                    h = math.max(h, be32(off + 88) >> 16)
                  case _ => ()
                }
                off += size.toInt
              }
            }
          }
        }
        try walk(0, buf.length)
        catch { case scala.util.control.NonFatal(_) => ok = false }
        if (!ok || ts < 0)
          Row(r.getLong(0), null, null, null, null, null)
        else Row(r.getLong(0), ts.toInt, dur.toInt, nTracks, w.toInt, h.toInt)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Per-TRACK mp4 metadata (round 16) — what a curation pipeline
    * filters on before spending decode: handler type from mdia/hdlr,
    * codec fourcc from the first stsd sample entry, audio channel
    * count / 16.16 sample rate from the AudioSampleEntry, video dims
    * from the VisualSampleEntry (per 14496-12 §8.4.3 / §12.1–12.2).
    * One output row per trak; a malformed tree yields the single null
    * row — corrupt files are data.
    */
  def decodeMp4Tracks(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("track_id", IntegerType),
      StructField("handler", StringType),
      StructField("codec", StringType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val mediaId = r.getLong(0)
        val buf = r.getAs[Array[Byte]]("payload")
        def be32(off: Int): Long =
          ((buf(off) & 0xffL) << 24) | ((buf(off + 1) & 0xffL) << 16) |
            ((buf(off + 2) & 0xffL) << 8) | (buf(off + 3) & 0xffL)
        def be16(off: Int): Int = ((buf(off) & 0xff) << 8) | (buf(off + 1) & 0xff)
        var ok = true
        val tracks = scala.collection.mutable.ArrayBuffer
          .empty[(Int, String, String, Integer, Integer, Integer, Integer)]
        // per-trak working state; the first stsd entry's offset/size are
        // BUFFERED and resolved after the trak walk completes — ISO BMFF
        // does not mandate hdlr-before-minf box order, so audio/video
        // fields must not depend on having seen the handler first
        var trkId = -1
        var handler: String = null
        var codec: String = null
        var ch, rate, tw, th: Integer = null
        var entryOff, entrySz = -1
        def walk(start: Int, end: Int, in: String): Unit = {
          var off = start
          while (ok && off < end) {
            if (off + 8 > end) { ok = false }
            else {
              val size = be32(off)
              val typ = new String(buf, off + 4, 4, "US-ASCII")
              if (size < 8 || off + size > end) ok = false
              else {
                typ match {
                  case "moov" | "mdia" | "minf" | "stbl" =>
                    walk(off + 8, off + size.toInt, typ)
                  case "trak" =>
                    trkId = -1; handler = null; codec = null
                    ch = null; rate = null; tw = null; th = null
                    entryOff = -1; entrySz = -1
                    walk(off + 8, off + size.toInt, typ)
                    if (ok) {
                      // resolve the buffered sample entry now that the whole
                      // trak (hdlr included, wherever it sat) has been walked
                      if (entryOff >= 0) {
                        if (handler == "soun" && entrySz >= 36) {
                          ch = Integer.valueOf(be16(entryOff + 24))
                          rate = Integer.valueOf((be32(entryOff + 32) >> 16).toInt)
                        } else if (handler == "vide" && entrySz >= 36) {
                          tw = Integer.valueOf(be16(entryOff + 32))
                          th = Integer.valueOf(be16(entryOff + 34))
                        }
                      }
                      tracks += ((trkId, handler, codec, ch, rate, tw, th))
                    }
                  case "tkhd" if size >= 8 + 16 =>
                    trkId = be32(off + 20).toInt
                  case "hdlr" if in == "mdia" && size >= 8 + 12 =>
                    handler = new String(buf, off + 16, 4, "US-ASCII")
                  case "stsd" if size >= 8 + 16 =>
                    // verflags(4) count(4), then the first sample entry
                    val e = off + 16
                    val esz = be32(e)
                    if (esz < 16 || e + esz > off + size) ok = false
                    else {
                      codec = new String(buf, e + 4, 4, "US-ASCII")
                      entryOff = e; entrySz = esz.toInt
                    }
                  case _ => ()
                }
                off += size.toInt
              }
            }
          }
        }
        try walk(0, buf.length, "")
        catch { case scala.util.control.NonFatal(_) => ok = false }
        if (!ok || tracks.isEmpty)
          Seq(Row(mediaId, null, null, null, null, null, null, null))
        else tracks.map { case (id, hd, cc, c, sr, w0, h0) =>
          Row(mediaId, id, hd, cc, c, sr, w0, h0)
        }
      }
    }
    spark.createDataFrame(out, schema)
  }

  // ==================== WEBM/EBML METADATA TIER (round 15) ====================

  /** Synthesis contract of the webm fixture (video doc population, the
    * mp4 fixture's sibling — the other half of §2.9's "real corpora are
    * mp4/webm"): TimestampScale 100000·(1+id%5) ns, Duration
    * 1000·(1+id%25) ticks (written as an IEEE-754 float64 with an
    * integral value — the Matroska Duration element IS a float),
    * 1+(id/5)%3 tracks, dims (320+8·(id%40)) × (240+8·((id/40)%25)).
    * The payload is a minimal VALID EBML tree per RFC 8794 / the
    * Matroska spec — EBMLHeader(DocType "webm"), Segment(Void,
    * Info(TimestampScale, Duration), Tracks(TrackEntry(TrackNumber,
    * TrackType, Void, Video(PixelWidth, PixelHeight))×n)) — with two
    * deliberate parser-forcing devices: Void elements of id-dependent
    * size shift every field to an id-dependent offset (the mp4 free-box
    * trick), and size VINTs are written at id-dependent WIDTHS (minimal
    * or one byte wider), so only a parser that truly decodes the
    * variable-length-integer marker bits — EBML's defining wire
    * feature, and what makes this tier a different parse from the
    * fixed-width ISO-BMFF walk — can track element boundaries.
    */
  def webmParams(mediaId: Long): (Int, Int, Int, Int, Int) = {
    ((100000 * (1 + mediaId % 5)).toInt, (1000 * (1 + mediaId % 25)).toInt,
      (1 + (mediaId / 5) % 3).toInt,
      (320 + 8 * (mediaId % 40)).toInt, (240 + 8 * ((mediaId / 40) % 25)).toInt)
  }

  /** VINT with an explicit width: marker bit in the first byte, value
    * big-endian below it. width must fit the value (< 2^(7·width) − 1).
    */
  private def vint(v: Long, width: Int): Array[Byte] = {
    require(width >= 1 && width <= 8 && v >= 0 && v < (1L << (7 * width)) - 1,
      s"vint width $width cannot carry $v")
    val out = new Array[Byte](width)
    var x = v | (1L << (7 * width)) // the marker bit
    var i = width - 1
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  private def encodeWebm(mediaId: Long): Array[Byte] = {
    val (tsScale, dur, nTracks, w, h) = webmParams(mediaId)
    // size VINTs one byte wider than minimal when the id says so — the
    // device that forces real marker-bit decoding
    val pad = (mediaId % 2).toInt
    def minWidth(v: Long): Int = {
      var k = 1
      while (v >= (1L << (7 * k)) - 1) k += 1
      k
    }
    def el(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] =
      idBytes ++ vint(payload.length.toLong, minWidth(payload.length.toLong) + pad) ++ payload
    def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    def uintBytes(v: Long): Array[Byte] = {
      var k = 1
      while (k < 8 && (v >> (8 * k)) != 0) k += 1
      Array.tabulate(k)(i => ((v >> (8 * (k - 1 - i))) & 0xff).toByte)
    }
    def f64(v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      Array.tabulate(8)(i => ((bits >> (8 * (7 - i))) & 0xff).toByte)
    }
    val header = el(id(0x1a, 0x45, 0xdf, 0xa3),
      el(id(0x42, 0x86), uintBytes(1)) ++          // EBMLVersion
        el(id(0x42, 0x82), "webm".getBytes("US-ASCII")) ++ // DocType
        el(id(0x42, 0x87), uintBytes(4)))          // DocTypeVersion
    val info = el(id(0x15, 0x49, 0xa9, 0x66),
      el(id(0x2a, 0xd7, 0xb1), uintBytes(tsScale.toLong)) ++
        el(id(0x44, 0x89), f64(dur.toDouble)))
    val tracks = el(id(0x16, 0x54, 0xae, 0x6b),
      (1 to nTracks).map { t =>
        // round 16: even slots are AUDIO tracks (TrackType 2, Audio
        // element with SamplingFrequency float + Channels uint), odd
        // slots VIDEO as before; every track carries a CodecID string
        val (isAudio, _, ch, rate) = mp4TrackParams(mediaId, t)
        val media =
          if (isAudio)
            el(id(0xe1),                            // Audio
              el(id(0xb5), f64(rate.toDouble)) ++   // SamplingFrequency
                el(id(0x9f), uintBytes(ch.toLong))) // Channels
          else
            el(id(0xe0),                            // Video
              el(id(0xb0), uintBytes(w.toLong)) ++
                el(id(0xba), uintBytes(h.toLong)))
        el(id(0xae),
          el(id(0xd7), uintBytes(t.toLong)) ++      // TrackNumber
            el(id(0x83), uintBytes(if (isAudio) 2L else 1L)) ++ // TrackType
            el(id(0x86), webmCodecId(mediaId, t).getBytes("US-ASCII")) ++ // CodecID
            el(id(0xec), new Array[Byte](((mediaId / 2) % 24).toInt)) ++ // Void
            media)
      }.reduce(_ ++ _))
    val segment = el(id(0x18, 0x53, 0x80, 0x67),
      el(id(0xec), new Array[Byte]((mediaId % 32).toInt)) ++ // Void
        info ++ tracks)
    header ++ segment
  }

  /** The webm fixture as a media table (media_id, payload) over the
    * video doc population — generate-in-place, never shuffled.
    */
  def withWebmMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val out = docs.filter(col("doc_id") % 3 === 2).select("doc_id")
      .rdd.mapPartitions(_.map(r => Row(r.getLong(0), encodeWebm(r.getLong(0)))))
    spark.createDataFrame(out, schema)
  }

  /** webm metadata via a REAL EBML walk: element IDs read by their
    * leading-zero-determined width (raw bytes kept, per RFC 8794), sizes
    * decoded as marker-stripped VINTs of ANY width, containers (Segment,
    * Info, Tracks, TrackEntry, Video) recursed, TimestampScale /
    * PixelWidth / PixelHeight read as big-endian uints, Duration as an
    * IEEE-754 float32/float64 truncated to ticks. Malformed trees
    * (truncated VINT, element past its parent, an all-zero ID/size
    * byte, no Info) surface as the null row — corrupt files are data.
    */
  def decodeWebmMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("timescale", IntegerType),
      StructField("duration", IntegerType),
      StructField("n_tracks", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val buf = r.getAs[Array[Byte]]("payload")
        var ts, dur = -1L
        var nTracks = 0
        var w, h = 0L
        var ok = true
        var sawInfo = false
        // (value, next-offset). For IDs the marker bit is KEPT (EBML ids
        // are compared with it, per RFC 8794 §5); for sizes it is
        // STRIPPED. An all-zero lead byte or a VINT running past `end`
        // poisons the parse.
        def readVint(off: Int, end: Int, keepMarker: Boolean): (Long, Int) = {
          if (!ok || off >= end) { ok = false; (0L, end) }
          else {
            val b0 = buf(off) & 0xff
            if (b0 == 0) { ok = false; (0L, end) }
            else {
              val width = java.lang.Integer.numberOfLeadingZeros(b0) - 23 // 1..8
              if (off + width > end) { ok = false; (0L, end) }
              else {
                var v = if (keepMarker) b0.toLong
                        else b0.toLong & ((0x80 >> (width - 1)) - 1)
                var i = 1
                while (i < width) { v = (v << 8) | (buf(off + i) & 0xffL); i += 1 }
                (v, off + width)
              }
            }
          }
        }
        // EBML uints are 0..8 octets (RFC 8794 §7.1); a wider payload is
        // malformed and poisons the parse rather than wrapping through
        // the Long shift.
        def beUint(off: Int, len: Int): Long = {
          if (len > 8) { ok = false; 0L }
          else {
            var v = 0L
            var i = 0
            while (i < len) { v = (v << 8) | (buf(off + i) & 0xffL); i += 1 }
            v
          }
        }
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (ok && off < end) {
            val (eid, o1) = readVint(off, end, keepMarker = true)
            val (sz, o2) = readVint(o1, end, keepMarker = false)
            if (!ok || o2 + sz > end || sz > Int.MaxValue) ok = false
            else {
              val pEnd = o2 + sz.toInt
              eid match {
                case 0x18538067L | 0x1654AE6BL | 0xAEL | 0xE0L => // Segment/Tracks/TrackEntry/Video
                  if (eid == 0xAEL) nTracks += 1
                  walk(o2, pEnd)
                case 0x1549A966L => sawInfo = true; walk(o2, pEnd) // Info
                case 0x2AD7B1L => ts = beUint(o2, sz.toInt) // TimestampScale
                case 0x4489L => // Duration: float32 or float64 per spec
                  if (sz == 8L)
                    dur = java.lang.Double.longBitsToDouble(beUint(o2, 8)).toLong
                  else if (sz == 4L)
                    dur = java.lang.Float.intBitsToFloat(beUint(o2, 4).toInt).toLong
                  else ok = false
                case 0xB0L => w = math.max(w, beUint(o2, sz.toInt)) // PixelWidth
                case 0xBAL => h = math.max(h, beUint(o2, sz.toInt)) // PixelHeight
                case _ => () // EBMLHeader internals, Void, unknown: skip
              }
              off = pEnd
            }
          }
        }
        try walk(0, buf.length)
        catch { case scala.util.control.NonFatal(_) => ok = false }
        // a well-formed foreign file may still carry >32-bit values; the
        // Int schema cannot represent them, so they take the null row
        // (out-of-model, not silently wrapped) — same contract as corrupt
        if (!ok || !sawInfo || ts < 0 || dur < 0 ||
            ts > Int.MaxValue || dur > Int.MaxValue ||
            w > Int.MaxValue || h > Int.MaxValue)
          Row(r.getLong(0), null, null, null, null, null)
        else Row(r.getLong(0), ts.toInt, dur.toInt, nTracks, w.toInt, h.toInt)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Per-TRACK webm metadata (round 16) — the EBML twin of
    * decodeMp4Tracks: TrackNumber/TrackType uints, the CodecID string,
    * Audio(SamplingFrequency float, Channels uint) for audio tracks,
    * Video(PixelWidth, PixelHeight) for video tracks. One row per
    * TrackEntry; malformed trees or out-of-Int values yield the single
    * null row — corrupt files are data.
    */
  def decodeWebmTracks(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("track_num", IntegerType),
      StructField("track_type", IntegerType),
      StructField("codec_id", StringType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val mediaId = r.getLong(0)
        val buf = r.getAs[Array[Byte]]("payload")
        var ok = true
        val tracks = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, String, Long, Long, Long, Long)]
        var tn, tt, ch, rate, w, h = -1L
        var codec: String = null
        def readVint(off: Int, end: Int, keepMarker: Boolean): (Long, Int) = {
          if (!ok || off >= end) { ok = false; (0L, end) }
          else {
            val b0 = buf(off) & 0xff
            if (b0 == 0) { ok = false; (0L, end) }
            else {
              val width = java.lang.Integer.numberOfLeadingZeros(b0) - 23
              if (off + width > end) { ok = false; (0L, end) }
              else {
                var v = if (keepMarker) b0.toLong
                        else b0.toLong & ((0x80 >> (width - 1)) - 1)
                var i = 1
                while (i < width) { v = (v << 8) | (buf(off + i) & 0xffL); i += 1 }
                (v, off + width)
              }
            }
          }
        }
        def beUint(off: Int, len: Int): Long = {
          if (len > 8) { ok = false; 0L }
          else {
            var v = 0L
            var i = 0
            while (i < len) { v = (v << 8) | (buf(off + i) & 0xffL); i += 1 }
            v
          }
        }
        def fl(off: Int, len: Int): Double =
          if (len == 8) java.lang.Double.longBitsToDouble(beUint(off, 8))
          else if (len == 4) java.lang.Float.intBitsToFloat(beUint(off, 4).toInt).toDouble
          else { ok = false; 0.0 }
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (ok && off < end) {
            val (eid, o1) = readVint(off, end, keepMarker = true)
            val (sz, o2) = readVint(o1, end, keepMarker = false)
            if (!ok || o2 + sz > end || sz > Int.MaxValue) ok = false
            else {
              val pEnd = o2 + sz.toInt
              eid match {
                case 0x18538067L | 0x1654AE6BL | 0xE0L | 0xE1L => // Segment/Tracks/Video/Audio
                  walk(o2, pEnd)
                case 0xAEL => // TrackEntry: fresh state, then emit
                  tn = -1; tt = -1; ch = -1; rate = -1; w = -1; h = -1
                  codec = null
                  walk(o2, pEnd)
                  if (ok) tracks += ((tn, tt, codec, ch, rate, w, h))
                case 0xD7L => tn = beUint(o2, sz.toInt) // TrackNumber
                case 0x83L => tt = beUint(o2, sz.toInt) // TrackType
                case 0x86L => // CodecID
                  codec = new String(buf, o2, sz.toInt, "US-ASCII")
                case 0xB5L => rate = fl(o2, sz.toInt).toLong // SamplingFrequency
                case 0x9FL => ch = beUint(o2, sz.toInt) // Channels
                case 0xB0L => w = beUint(o2, sz.toInt) // PixelWidth
                case 0xBAL => h = beUint(o2, sz.toInt) // PixelHeight
                case _ => ()
              }
              off = pEnd
            }
          }
        }
        try walk(0, buf.length)
        catch { case scala.util.control.NonFatal(_) => ok = false }
        def asInt(v: Long): Integer =
          if (v < 0 || v > Int.MaxValue) null else Integer.valueOf(v.toInt)
        val wide = tracks.exists(t =>
          t._1 > Int.MaxValue || t._2 > Int.MaxValue || t._4 > Int.MaxValue ||
            t._5 > Int.MaxValue || t._6 > Int.MaxValue || t._7 > Int.MaxValue)
        if (!ok || wide || tracks.isEmpty)
          Seq(Row(mediaId, null, null, null, null, null, null, null))
        else tracks.map { case (n, t, cc, c, sr, w0, h0) =>
          Row(mediaId, asInt(n), asInt(t), cc, asInt(c), asInt(sr),
            asInt(w0), asInt(h0))
        }
      }
    }
    spark.createDataFrame(out, schema)
  }

  // ------------------------------------------------------------------
  // JPEG tier (round 16): the format real crawled corpora are
  // overwhelmingly made of, and the one real-decode gap javax.imageio
  // closes in-box. Lossy codec, so the gates split honestly:
  //  - marker STRUCTURE + dims: deterministic, hash-gated (a real
  //    JFIF/marker walk, the mp4/webm discipline);
  //  - flat-color payloads: the DCT of a uniform block is exact and the
  //    gray YCbCr round-trip is integer-exact (measured over all 256
  //    grays, JpegSpec pins it), so decoded PIXELS hash-gate;
  //  - textured payloads: decode error is codec arithmetic with no SQL
  //    twin — the gate is a bounded-error claim (within_tol) whose
  //    measured distribution JpegSpec pins (the emb_pq_error pattern).

  /** Deterministic JPEG fixture contract per image doc (doc_id%3==0):
    * (width 8..16, height 8..16, flat?) — flat payloads are uniform gray
    * (id%256) written at quality 1.0; textured payloads carry the PNG
    * tier's gradient pattern at quality 0.75 in one of THREE variants
    * ([[jpegVariant]], round 17): 0 = baseline gray, 1 = baseline COLOR
    * (per-channel gradients — real 4:2:0 chroma subsampling does real
    * damage), 2 = PROGRESSIVE color (SOF2 multi-scan).
    */
  def jpegParams(mediaId: Long): (Int, Int, Boolean) =
    ((8 + mediaId % 9).toInt, (8 + (mediaId / 9) % 9).toInt,
      (mediaId / 3) % 2 == 0)

  /** Textured-population variant: 0 gray / 1 color / 2 progressive
    * (flat payloads are always variant 0 — the pixel-exact gate needs
    * uniform gray).
    */
  def jpegVariant(mediaId: Long): Int =
    if ((mediaId / 3) % 2 == 0) 0 else ((mediaId / 3) / 2 % 3).toInt

  /** Per-channel source pattern of a textured payload. Gray variants
    * repeat the r-channel gradient on all three channels.
    */
  def jpegRgb(mediaId: Long, x: Int, y: Int): (Int, Int, Int) = {
    val r = ((x * 31 + y * 7 + mediaId) % 256).toInt
    if (jpegVariant(mediaId) == 0) (r, r, r)
    else (r, ((x * 13 + y * 17 + mediaId * 3) % 256).toInt,
      ((x * 7 + y * 29 + mediaId * 5) % 256).toInt)
  }

  private def encodeJpeg(mediaId: Long): Array[Byte] = {
    val (w, h, flat) = jpegParams(mediaId)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g0 = (mediaId % 256).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = if (flat) (g0 << 16) | (g0 << 8) | g0
        else {
          val (r, g, b) = jpegRgb(mediaId, x, y)
          (r << 16) | (g << 8) | b
        }
        img.setRGB(x, y, px)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(if (flat) 1.0f else 0.75f)
    if (jpegVariant(mediaId) == 2)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** The JPEG fixture as a media table (media_id, payload) over the
    * image doc population — generate-in-place, never shuffled.
    */
  def withJpegMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val out = docs.filter(col("doc_id") % 3 === 0).select("doc_id")
      .rdd.mapPartitions(_.map(r => Row(r.getLong(0), encodeJpeg(r.getLong(0)))))
    spark.createDataFrame(out, schema)
  }

  /** JPEG metadata via a REAL marker walk (ITU T.81 §B) over the WHOLE
    * stream, SOI to EOI: frame dims and component count from the SOF
    * segment, quantization/Huffman TABLE counts parsed from inside the
    * DQT/DHT segments (a segment may carry several tables — counting
    * segments would be wrong), APP0/JFIF presence, and since round 18
    * the SCAN count — each SOS is followed by the entropy-coded-segment
    * skip (T.81 §B.1.1.5: inside a scan, 0xFF is followed by a 0x00
    * stuffing byte or an RST marker; the first 0xFF + other byte is the
    * next true marker), so a PROGRESSIVE stream's between-scan DHT
    * tables are counted and n_scans reports its scan script length.
    * Malformed streams (no SOI, truncated segment, a fill-byte-less
    * stray, no SOF, no EOI) surface as the null row — corrupt files are
    * data.
    */
  def decodeJpegMarkers(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_components", IntegerType),
      StructField("n_dqt", IntegerType),
      StructField("n_dht", IntegerType),
      StructField("sof_marker", IntegerType),
      StructField("n_app0", IntegerType),
      StructField("n_scans", IntegerType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]]("payload")
        var ok = b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
        var w, h, nc, sof = -1
        var nDqt, nDht, nApp0, nScans = 0
        var i = 2
        var done = false
        def u8(o: Int): Int = b(o) & 0xff
        def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
        try {
          while (ok && !done) {
            // T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
            // fill bytes — skip them so spec-valid foreign streams parse.
            while (i + 1 < b.length && u8(i) == 0xff && u8(i + 1) == 0xff) i += 1
            if (i + 2 > b.length || u8(i) != 0xff) ok = false
            else if (u8(i + 1) == 0xd9) done = true // EOI: standalone, ends the stream
            else if (i + 4 > b.length) ok = false
            else {
              val m = u8(i + 1)
              val len = u16(i + 2)
              val end = i + 2 + len
              if (len < 2 || end > b.length) ok = false
              else {
                m match {
                  case 0xdb => // DQT: tables are 1 + 64·(1+precision) bytes
                    var off = i + 4
                    while (ok && off < end) {
                      val pq = (u8(off) & 0xf0) >> 4
                      off += 1 + (if (pq == 0) 64 else 128)
                      if (off > end) ok = false else nDqt += 1
                    }
                  case 0xc4 => // DHT: 17-byte header + Σ code counts —
                    // the 17 header bytes must fit inside the segment
                    // BEFORE being read, else a short len yields garbage
                    // counts instead of the contractual null row
                    var off = i + 4
                    while (ok && off < end) {
                      if (off + 17 > end) ok = false
                      else {
                        var tot = 0
                        var k = 1
                        while (k <= 16) { tot += u8(off + k); k += 1 }
                        off += 17 + tot
                        if (off > end) ok = false else nDht += 1
                      }
                    }
                  case 0xe0 => nApp0 += 1
                  case 0xda => nScans += 1 // SOS: skip the scan's entropy data below
                  case mm if mm >= 0xc0 && mm <= 0xcf && mm != 0xc8 && mm != 0xcc =>
                    // SOF payload is ≥ 6 bytes (precision, h, w, nc)
                    if (len < 8) ok = false
                    else { sof = mm; h = u16(i + 5); w = u16(i + 7); nc = u8(i + 9) }
                  case _ => () // APPn, COM, others: skip
                }
                i = end
                if (ok && m == 0xda) {
                  // entropy-coded-segment skip: 0xFF 0x00 is a stuffing
                  // pair, 0xFF 0xD0-0xD7 a restart marker (both stay in
                  // the scan); the first other 0xFF-pair is the next
                  // marker — a truncated scan (no terminating marker)
                  // is the null row
                  var scanning = true
                  while (ok && scanning) {
                    if (i + 1 >= b.length) { ok = false; scanning = false }
                    else if (u8(i) == 0xff) {
                      val nm = u8(i + 1)
                      if (nm == 0x00 || (nm >= 0xd0 && nm <= 0xd7)) i += 2
                      else scanning = false
                    } else i += 1
                  }
                }
              }
            }
          }
        } catch { case scala.util.control.NonFatal(_) => ok = false }
        if (!ok || !done || sof < 0 || nScans < 1)
          Row(r.getLong(0), null, null, null, null, null, null, null, null)
        else Row(r.getLong(0), w, h, nc, nDqt, nDht, sof, nApp0, nScans)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Decoded-PIXEL gate through the lossy codec, on the payloads where
    * lossy is exact: flat-color JPEGs decode to their source gray
    * bit-exactly (uniform blocks have only a DC coefficient and the gray
    * YCbCr round trip is integer-exact — JpegSpec measures this over all
    * 256 grays). (media_id, gray = decoded pixel(0,0) gray value or null
    * if channels disagree, uniform = all pixels equal it).
    */
  def decodeJpegFlat(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("gray", IntegerType),
      StructField("uniform", BooleanType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val img = try {
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row(r.getLong(0), null, null)
        else {
          val p0 = img.getRGB(0, 0)
          val g = p0 & 0xff
          val chansAgree = ((p0 >> 16) & 0xff) == g && ((p0 >> 8) & 0xff) == g
          var uniform = chansAgree
          var y = 0
          while (uniform && y < img.getHeight) {
            var x = 0
            while (uniform && x < img.getWidth) {
              if (img.getRGB(x, y) != p0) uniform = false
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), if (chansAgree) g else null, uniform)
        }
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** The JPEG decode-error honesty card, split by what 4:2:0 can and
    * cannot damage: re-derive each textured payload's SOURCE pattern
    * from the synthesis contract ([[jpegRgb]] — gray, color, or
    * progressive-color per [[jpegVariant]]), decode the real bytes, and
    * claim TWO bounds per image. `within_tol` bounds the LUMA error
    * (integer BT.601 (77r+150g+29b)>>8) at `tol` — luma keeps full
    * resolution under 4:2:0, so the bound stays tight for every variant
    * (measured max 44 gray / 43 color / 43 progressive; JpegSpec pins
    * nonzero). `chroma_within_tol` bounds the raw per-channel RGB error
    * at `chromaTol` — on adversarial per-channel gradients the 2×2
    * chroma average is the dominant loss (measured max 210 baseline /
    * 229 progressive, vs 44 on gray), which is exactly the honest story
    * of a subsampled codec. The errors are codec arithmetic with no SQL
    * twin, so the GATE is the bounds; distributions are JpegSpec-pinned.
    * (media_id, n_px, within_tol, chroma_within_tol).
    */
  def decodeJpegError(media: DataFrame, tol: Int = 64,
                      chromaTol: Int = 240): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_px", LongType),
      StructField("within_tol", BooleanType),
      StructField("chroma_within_tol", BooleanType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img = try {
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row(id, null, null, null)
        else {
          def luma(r0: Int, g0: Int, b0: Int): Int = (77 * r0 + 150 * g0 + 29 * b0) >> 8
          var maxLuma = 0
          var maxRgb = 0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val (wr, wg, wb) = jpegRgb(id, x, y)
              val px = img.getRGB(x, y)
              val gr = (px >> 16) & 0xff
              val gg = (px >> 8) & 0xff
              val gb = px & 0xff
              val eRgb = math.max(math.abs(wr - gr),
                math.max(math.abs(wg - gg), math.abs(wb - gb)))
              if (eRgb > maxRgb) maxRgb = eRgb
              val eL = math.abs(luma(wr, wg, wb) - luma(gr, gg, gb))
              if (eL > maxLuma) maxLuma = eL
              x += 1
            }
            y += 1
          }
          Row(id, (img.getWidth.toLong * img.getHeight),
            maxLuma <= tol, maxRgb <= chromaTol)
        }
      }
    }
    spark.createDataFrame(out, schema)
  }

  def decodeImageAHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val img = try {
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row(r.getLong(0), null)
        else Row(r.getLong(0), gridAHash(img))
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Per-frame perceptual hashes of video payloads — the video
    * fingerprint sequence (near-dup videos share most frame hashes;
    * scene cuts show as hash jumps). REAL GIF decode per frame, same
    * gridAHash as the image tier; GifPixelProbe locks the codec round
    * trip pixel-exact, which is what lets the DuckDB twin re-derive
    * every frame hash from the synthesis contract.
    */
  /** Scene-cut detection over the per-frame fingerprint sequence: each
    * consecutive-frame transition scored by hash hamming distance, cuts
    * flagged at `tau` bits (adjacent frames of one shot share most of
    * their perceptual hash; a cut rewrites it). One per-video window
    * (partitions bounded by frames-per-video, never corpus size) over
    * the REAL decoded frame hashes.
    */
  def videoSceneCuts(frameHashes: DataFrame, tau: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame")
    frameHashes
      .withColumn("prev", lag(col("ahash"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("media_id"), col("frame"),
        bit_count(col("prev").bitwiseXOR(col("ahash"))).cast("long").as("hamming"))
      .withColumn("is_cut", col("hamming") >= tau)
  }

  def decodeVideoFrameHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame", IntegerType, nullable = false),
      StructField("ahash", LongType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        // Frames decoded so far survive a mid-decode failure, and the
        // failure itself lands as one null-hash row (the image tier's
        // corrupt-payload convention) — round 11 returned Iterator.empty
        // on ANY exception, silently vanishing the whole media AND leaking
        // the ImageInputStream's disk-cache temp file (no close on either
        // path). Stream and reader now release in finally.
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        var iis: javax.imageio.stream.ImageInputStream = null
        var rdr: javax.imageio.ImageReader = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) buf += Row(id, 0, null)
          else {
            rdr = readers.next()
            rdr.setInput(iis)
            val n = rdr.getNumImages(true)
            var f = 0
            while (f < n) { buf += Row(id, f, gridAHash(rdr.read(f))); f += 1 }
          }
        } catch {
          case scala.util.control.NonFatal(_) => buf += Row(id, buf.length, null)
        } finally {
          if (rdr != null) rdr.dispose()
          if (iis != null)
            try iis.close() catch { case _: java.io.IOException => () }
        }
        buf.iterator
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Video-level near-dup from per-frame fingerprints: directed frame-set
    * containment C(A→B) = |H_A ∩ H_B| / |H_A| ≥ `minContainment` over
    * DISTINCT frame hashes — the text containment semantics on the video
    * fingerprint. Candidates come from an equi-join on the hash value (an
    * inverted index over frame hashes), so work is Σ bucket² over
    * hash-collision groups, never corpus². `fh` is the
    * `decodeVideoFrameHashes` output (media_id, frame, ahash).
    */
  def videoNearDup(fh0: DataFrame, minContainment: Double = 0.8): DataFrame = {
    // drop the corrupt-frame null-hash marker rows decodeVideoFrameHashes
    // emits: a null can never equi-join, so leaving it in would only
    // inflate n_h and deflate every containment of a partly-corrupt video
    val fh = fh0.filter(col("ahash").isNotNull)
      .select(col("media_id"), col("ahash")).distinct()
    val sizes = fh.groupBy("media_id").agg(count(lit(1)).as("n_h"))
    val shared = fh.as("a").join(fh.as("b"),
        col("a.ahash") === col("b.ahash") &&
          col("a.media_id") =!= col("b.media_id"))
      .groupBy(col("a.media_id").as("vid_a"), col("b.media_id").as("vid_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared.join(sizes.withColumnRenamed("media_id", "vid_a"), "vid_a")
      .select(col("vid_a"), col("vid_b"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_h")).as("containment"))
      .filter(col("containment") >= minContainment)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", LongType),
    StructField("checksum", LongType)))

  /** STUB decoder: a real implementation would parse the codec header and
    * decode frames/samples here (e.g. via javax.imageio / an FFI codec).
    * This stub derives width/height/checksum deterministically from the
    * payload bytes so the batch shape, schema, and partitioning are tested
    * for real while the codec is faked.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = checksum * 31 + (payload(i) & 0xff); i += 1 }
    val w = 64 + (math.abs(checksum % 1024)).toInt
    val h = 64 + (math.abs((checksum / 1024) % 1024)).toInt
    (w, h, checksum)
  }

  /** Decode/feature-extract over the payload column. Narrow (no shuffle):
    * runs per input partition, processing rows in a streaming iterator.
    * ALL THREE modalities route through real JDK codecs: image via
    * javax.imageio (width/height from the actual PNG), audio via
    * javax.sound.sampled (sample rate / frame count from the actual WAV
    * header), video via the javax.imageio multi-frame reader (frame count
    * + frame-0 dims from the actual GIF container). A payload its codec
    * can't parse falls back to the deterministic stub — corrupt files are
    * data, not crashes.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "modality", "payload").rdd.mapPartitions { rows =>
      // ONE PNG reader per partition (one thread — ImageReader isn't
      // thread-safe but needs no cross-row state beyond reset()): the
      // per-row ImageIO.read path pays an SPI registry scan + reader
      // construction + a FULL pixel decode per image, when the features
      // only need header dims. getWidth/getHeight on a reusable reader
      // parse the IHDR chunk alone. Non-PNG or header-corrupt payloads
      // fall through to the generic full-decode path, then the stub —
      // the synthesis contract is PNG, but a foreign codec's payload
      // still decodes exactly as before.
      lazy val pngReader =
        javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      lazy val gifReader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      def pngHeaderDims(payload: Array[Byte]): (Int, Int) =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            pngReader.setInput(iis, true, true)
            (pngReader.getWidth(0), pngReader.getHeight(0))
          } finally { pngReader.setInput(null); iis.close() }
        } catch { case scala.util.control.NonFatal(_) => null }
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        def byteChecksum: Long = {
          var checksum = 0L
          var i = 0
          while (i < payload.length) { checksum = checksum * 31 + (payload(i) & 0xff); i += 1 }
          checksum
        }
        val row = r.getString(1) match {
          case "image" =>
            val dims = pngHeaderDims(payload) match {
              case null => // NonFatal: malformed-body payloads throw runtime exceptions
                val img =
                  try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
                  catch { case scala.util.control.NonFatal(_) => null }
                if (img == null) null else (img.getWidth, img.getHeight)
              case d => d
            }
            if (dims == null) null
            else Row(r.getLong(0), r.getString(1), payload.length.toLong,
              dims._1, dims._2, null, null, byteChecksum)
          case "audio" =>
            val meta = try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              (ais.getFormat.getSampleRate.toInt, ais.getFrameLength)
            } catch { case _: Exception => null }
            if (meta == null) null
            else Row(r.getLong(0), r.getString(1), payload.length.toLong,
              null, null, meta._1, meta._2, byteChecksum)
          case "video" =>
            val meta = gifMetaFast(gifReader, payload)
            if (meta == null) null
            // n_frames rides the frame-count column; width/height = frame dims
            else Row(r.getLong(0), r.getString(1), payload.length.toLong,
              meta._2, meta._3, null, meta._1.toLong, byteChecksum)
          case _ => null
        }
        if (row != null) row
        else {
          val (w, h, c) = decodeStub(payload)
          Row(r.getLong(0), r.getString(1), payload.length.toLong, w, h, null, null, c)
        }
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("target_w", IntegerType),
    StructField("target_h", IntegerType),
    StructField("resized", BinaryType)))

  /** Resize. Image payloads go through the REAL codec path: javax.imageio
    * decode → Graphics2D nearest-neighbor rescale (deterministic — no
    * filter kernels whose rounding could differ) → PNG re-encode, binary
    * in → binary out, narrow, per-partition. Video payloads (multi-frame
    * GIF) decode the same way — ImageIO.read returns frame 0, so a video
    * row resizes its POSTER FRAME (per-frame resize composes
    * sampleFrames with this same rescale). Payloads no codec can parse
    * (audio/corrupt) keep the deterministic STUB bytes (a slice/pad
    * sized targetW·targetH/64).
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val n = math.max(1, targetW * targetH / 64)
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        val img = // NonFatal: malformed-body payloads throw runtime exceptions
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          catch { case scala.util.control.NonFatal(_) => null }
        val resized = if (img != null) {
          val dst = new java.awt.image.BufferedImage(targetW, targetH,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          bos.toByteArray
        } else
          Array.tabulate[Byte](n)(i => if (p.isEmpty) 0 else p(i % p.length))
        Row(r.getLong(0), targetW, targetH, resized)
      }
    }
    spark.createDataFrame(out, resizedSchema)
  }

  /** Frame sampling: decode every `stride`-th frame of each video payload
    * through the REAL multi-frame reader (javax.imageio over the GIF
    * container) and emit a checksum over the frame's decoded pixels — the
    * explode shape (one input row → N frame rows, no shuffle) a video
    * pipeline needs, with an actual per-frame decode behind it. A payload
    * no reader can parse falls back to the deterministic byte-window stub
    * (1 pseudo-frame per 16 payload bytes) — corrupt files are data, not
    * crashes.
    */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType),
      StructField("frame_checksum", LongType)))
    val out = media.filter(col("modality") === "video")
      .select("media_id", "payload").rdd.mapPartitions { rows =>
        rows.flatMap { r =>
          val p = r.getAs[Array[Byte]]("payload")
          val real = try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(p))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) null
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                (0 until n by stride).map { i =>
                  val img = reader.read(i)
                  var cs = 0L
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      cs = cs * 31 + (img.getRGB(x, y) & 0xffffff)
                      x += 1
                    }
                    y += 1
                  }
                  Row(r.getLong(0), i, cs)
                }
              } finally reader.dispose()
            }
          } catch { case scala.util.control.NonFatal(_) => null }
          if (real != null) real.iterator
          else {
            val nFrames = math.max(1, p.length / 16)
            (0 until nFrames by stride).iterator.map { i =>
              var cs = 0L
              var j = i * 16
              while (j < math.min(p.length, (i + 1) * 16)) { cs = cs * 31 + (p(j) & 0xff); j += 1 }
              Row(r.getLong(0), i, cs)
            }
          }
        }
      }
    spark.createDataFrame(out, schema)
  }
}
