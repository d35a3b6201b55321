package graft

import org.apache.spark.sql.SparkSession

/** Measures the JDK ImageIO encoder's JPEG stream-structure constants
  * per fixture variant — the numbers multimodal_jpeg_meta's oracle
  * literals pin. These are IMPLEMENTATION DETAILS of the JRE's JPEG
  * writer (table emission, progressive scan script), not derivable from
  * any contract: a JDK vendor/version change can move them, and this
  * sweep is how the new constants are measured and the oracle re-pinned
  * (see the BASELINE.md round-18 note).
  *
  * Usage: sbt "runMain graft.JpegMetaSweep [nIds]"
  * Prints the distinct (variant -> n_components, n_dqt, n_dht, sof,
  * n_scans) combinations and their frequencies; the oracle is only
  * pinnable if each variant collapses to ONE combination.
  */
object JpegMetaSweep {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("jpeg-meta-sweep")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val docs = (0L until n).map(q => (3 * q, "x", "s"))
      .toDF("doc_id", "text", "source")
    val media = graft.operators.Multimodal.withJpegMedia(docs)
    val meta = graft.operators.Multimodal.decodeJpegMarkers(media)
    val rows = meta.collect()
    // a rejected stream yields null structure fields — report it as the
    // diagnostic this tool exists for, not an NPE from inside groupBy
    val bad = rows.filter(r => (3 to 8).exists(r.isNullAt))
    require(bad.isEmpty, s"${bad.length} streams rejected by the marker walk " +
      s"(first: media_id ${bad.head.get(0)}) — this JDK's writer emits a " +
      "structure the walk cannot parse; fix the walk before re-pinning")
    val out = rows.groupBy { r =>
      val v = graft.operators.Multimodal.jpegVariant(r.getLong(0))
      (v, r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(8))
    }.map { case ((v, nc, dqt, dht, sof, scans), rs) =>
      (v, nc, dqt, dht, sof, scans, rs.length)
    }.toSeq.sorted
    println("variant n_components n_dqt n_dht sof n_scans count")
    out.foreach { case (v, nc, dqt, dht, sof, scans, c) =>
      println(s"$v $nc $dqt $dht $sof $scans $c")
    }
    val perVariant = out.groupBy(_._1).map { case (v, g) => v -> g.size }
    require(perVariant.values.forall(_ == 1),
      s"a variant is NOT constant: $perVariant — the oracle cannot pin literals")
    println("OK: every variant collapses to one structure")
    spark.stop()
  }
}
