package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the salted within-cell join (SemDedup
  * .pairsFromSalted): plants a DEGENERATE clustering — a configurable
  * fraction of all vectors collapsing into one k-means cell, the
  * boilerplate-heavy-corpus failure mode — and times the plain cell-keyed
  * self-join against the triangle-salt decomposition at several widths.
  * The plain join schedules the giant cell as (at most) one shuffle
  * partition's task; the salt splits it into salt·(salt+1)/2 blocks.
  *
  * `sbt "runMain graft.SaltProbe [nVecs] [headFrac%] [dim]"` — defaults
  * 20000 / 60 / 8. Prints one JSON line with per-variant wall-clock and
  * the (identical) pair counts. Results recorded in BASELINE.md.
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val headPct = args.lift(1).map(_.toInt).getOrElse(60)
    val dim = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Deterministic synthesis: headPct% of vectors cluster tightly around
    // e0 (pairwise cosine ≈ 1 — one k-means cell), the rest spread over
    // the remaining axes so the other cells stay small. Knuth-hash jitter
    // keeps the head vectors distinct without separating them.
    val emb = spark.range(n.toLong).select(col("id").as("vec_id"),
      when(col("id") % 100 < headPct,
        concat(array(lit(1.0f)),
          transform(sequence(lit(1), lit(dim - 1)),
            i => (pmod(col("id") * 2654435761L * i, lit(1000L)).cast("float") / 1e6f))))
        .otherwise(
          transform(sequence(lit(0), lit(dim - 1)),
            i => when(pmod(col("id"), lit(dim.toLong)) === i.cast("long"), 1.0f)
              .otherwise(pmod(col("id") * 40503L * (i + 1), lit(1000L)).cast("float") / 1e4f)))
        .as("embedding")).localCheckpoint()

    val asg = graft.operators.SemDedup.cells(emb, 8, 3).localCheckpoint()
    val p = graft.operators.Similarity.prepared(emb).localCheckpoint()
    val cellSizes = asg.groupBy("cell").count()
      .orderBy(desc("count")).collect().map(r => (r.getInt(0), r.getLong(1)))
    val tau = 0.9999

    def time(label: String, salt: Int): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val cnt =
        if (salt <= 0) graft.operators.SemDedup.pairsFrom(asg, p, tau).count()
        else graft.operators.SemDedup.pairsFromSalted(asg, p, tau, salt).count()
      (label, (System.nanoTime() - t0) / 1e9, cnt)
    }
    val runs = Seq(time("plain", 0), time("salt4", 4), time("salt16", 16), time("salt32", 32))
    require(runs.map(_._3).distinct.size == 1,
      s"variants disagree on pair count: $runs")
    // the round-16 routing signal + decision, printed beside the timings
    // so BASELINE.md's margin table is one probe run per fixture
    val prof = graft.operators.SemDedup.cellProfile(asg)
    val rj = runs.map { case (l, t, _) => f""""$l":$t%.2f""" }.mkString(",")
    val cs = cellSizes.map { case (c, s) => s""""$c":$s""" }.mkString("{", ",", "}")
    println(f"""{"n":$n,"head_pct":$headPct,"dim":$dim,"pairs":${runs.head._3},"cell_sizes":$cs,"head_cand_share":${prof.headCandShare}%.4f,"routed_salted":${graft.operators.SemDedup.useSaltedTier(prof)},"sec":{$rj}}""")
    spark.stop()
  }
}
