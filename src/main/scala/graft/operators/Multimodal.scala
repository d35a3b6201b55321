package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column plumbing: image/audio/video as opaque BINARY payloads
  * with typed metadata, plus a decode/feature-extract stage.
  *
  * The Spark-side mechanics are real — schema, partition-preserving
  * mapPartitions with batched iteration, typed output schema. The decode
  * itself is a clearly-marked DETERMINISTIC STUB (this container has no
  * image/audio codecs): it derives pseudo-features from payload bytes, so
  * tests are reproducible and the plumbing is exercised end-to-end.
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

  /** Media table with REAL image and audio payloads: like fromDocuments,
    * but image rows carry a valid PNG (javax.imageio) and audio rows a
    * valid WAV (javax.sound.sampled); video stays a text-byte stand-in —
    * no video codec ships with the JDK. Narrow: payloads are generated in
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
          case _ => r.getAs[Array[Byte]]("payload")
        }
        Row(id, r.getString(1), payload, r.getString(3))
      }
    }
    spark.createDataFrame(out, mediaSchema)
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
    * Image payloads go through the REAL image codec (javax.imageio — width
    * and height parsed from the actual PNG) and audio payloads through the
    * REAL audio codec (javax.sound.sampled — sample rate and frame count
    * parsed from the actual WAV header); video falls back to the
    * deterministic stub (no video codec in the JDK). A payload its codec
    * can't parse falls back to the stub too — corrupt files are data, not
    * crashes.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "modality", "payload").rdd.mapPartitions { rows =>
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
            val img = // NonFatal: malformed-body payloads throw runtime exceptions
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) null
            else Row(r.getLong(0), r.getString(1), payload.length.toLong,
              img.getWidth, img.getHeight, null, null, byteChecksum)
          case "audio" =>
            val meta = try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              (ais.getFormat.getSampleRate.toInt, ais.getFrameLength)
            } catch { case _: Exception => null }
            if (meta == null) null
            else Row(r.getLong(0), r.getString(1), payload.length.toLong,
              null, null, meta._1, meta._2, byteChecksum)
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
    * in → binary out, narrow, per-partition. Payloads no image codec can
    * parse (video/audio/corrupt) keep the deterministic STUB bytes (a
    * slice/pad sized targetW·targetH/64) — for video a real pipeline
    * resizes per decoded frame, and no video codec ships with the JDK.
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

  /** STUB frame sampling: a real implementation seeks the container's
    * keyframe index and decodes every `stride`-th frame. The stub derives a
    * deterministic frame count from payload length (1 frame per 16 bytes)
    * and emits every `stride`-th index with a per-frame checksum — the
    * explode shape (one input row → N frame rows, no shuffle) is the real
    * contract a video pipeline needs.
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
          val nFrames = math.max(1, p.length / 16)
          (0 until nFrames by stride).iterator.map { i =>
            var cs = 0L
            var j = i * 16
            while (j < math.min(p.length, (i + 1) * 16)) { cs = cs * 31 + (p(j) & 0xff); j += 1 }
            Row(r.getLong(0), i, cs)
          }
        }
      }
    spark.createDataFrame(out, schema)
  }
}
