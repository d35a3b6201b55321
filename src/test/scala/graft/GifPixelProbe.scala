package graft

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Probe: does the GIF encode/decode round trip preserve the synthesis
  * contract's exact gray values? (Gates whether a video frame hash can
  * be oracled pixel-exactly.)
  */
class GifPixelProbe extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("GIF frames decode to the exact synthesis gray values") {
    val d = Tables.documents(spark, TestSpark.sf0001).limit(30)
    val media = Multimodal.withRealMedia(d).filter(col("modality") === "video")
    val rows = media.select("media_id", "payload").collect()
    assert(rows.nonEmpty)
    var bad = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      val rdr = javax.imageio.ImageIO.getImageReaders(iis).next()
      rdr.setInput(iis)
      val n = rdr.getNumImages(true)
      for (f <- 0 until n) {
        val img = rdr.read(f)
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val got = img.getRGB(x, y) & 0xff
          val want = ((x * 31 + y * 7 + f * 53 + id) % 256).toInt
          if (got != want) bad += 1
        }
      }
      rdr.dispose()
    }
    info(s"mismatched pixels: $bad")
    assert(bad == 0, s"$bad pixels differ — GIF round trip is not exact")
  }
}
