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

  /** Media table with REAL image payloads: like fromDocuments, but image-
    * modality rows carry a valid PNG (encoded per-partition via
    * javax.imageio; audio/video stay text-byte stand-ins — no audio/video
    * codecs in this container). Narrow: payloads are generated in place,
    * never shuffled.
    */
  def withRealImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val base = fromDocuments(docs)
    val out = base.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (r.getString(1) == "image") encodePng(id)
          else r.getAs[Array[Byte]]("payload")
        Row(id, r.getString(1), payload, r.getString(3))
      }
    }
    spark.createDataFrame(out, mediaSchema)
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
        val img = try {
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        } catch { case _: java.io.IOException => null }
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
    * Image payloads go through the REAL codec (javax.imageio — width and
    * height are parsed from the actual PNG); other modalities fall back to
    * the deterministic stub (no audio/video codecs in this container).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "modality", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val img = if (r.getString(1) == "image") {
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case _: java.io.IOException => null }
        } else null
        val (w, h, c) =
          if (img != null) {
            var checksum = 0L
            var i = 0
            while (i < payload.length) { checksum = checksum * 31 + (payload(i) & 0xff); i += 1 }
            (img.getWidth, img.getHeight, checksum)
          } else decodeStub(payload)
        Row(r.getLong(0), r.getString(1), payload.length.toLong, w, h, c)
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("target_w", IntegerType),
    StructField("target_h", IntegerType),
    StructField("resized", BinaryType)))

  /** STUB resize: a real implementation decodes, rescales (e.g. Lanczos),
    * and re-encodes to `targetW × targetH`. The stub emits a deterministic
    * byte slice/pad of the payload sized targetW·targetH/64 so output size
    * scales with target dims. Plumbing (binary in → binary out, narrow,
    * per-partition) is the real shape.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val n = math.max(1, targetW * targetH / 64)
    val out = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        val resized = Array.tabulate[Byte](n)(i => if (p.isEmpty) 0 else p(i % p.length))
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
