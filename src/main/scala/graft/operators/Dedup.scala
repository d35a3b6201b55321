package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for a large-scale training-data pipeline: exact,
  * n-gram Jaccard, MinHash+LSH, and SimHash. (Embedding-cosine near-dup
  * lives in Similarity.scala.)
  *
  * Scale posture: exact dedup is a single hash aggregate on a digest (never
  * group by the raw 100 KB text at 100 TB — group by its MD5). MinHash-LSH
  * is the scale path for near-dup: cost is O(docs × shingles) for signatures
  * plus a self-join on (band, band_hash) buckets whose size LSH keeps small;
  * the exact-Jaccard verify runs only on candidate pairs. The all-pairs
  * n-gram Jaccard here is the *oracle/verify* path — quadratic candidate
  * generation via the shingle inverted index, fine at test SF, and exactly
  * what LSH approximates.
  *
  * Hash-function choice: MD5 via `functions.md5` — not because MD5 is fast
  * (xxhash64 is faster) but because the DuckDB oracle computes the identical
  * digest, making even the LSH bucketing byte-for-byte checkable. Swapping
  * in xxhash64 is a one-line change flagged for the bench path.
  */
object Dedup {

  /** doc → distinct n-word shingles. Computed array-side (transform over
    * sequence) so no per-token window/shuffle is needed.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val arr = TextOps.splitWords(TextOps.normalize(col("text")))
    val sh = transform(
      sequence(lit(0), size(col("arr")) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(col("arr"), i + k + 1)): _*))
    docs.select(col("doc_id"), arr.as("arr"))
      .filter(size(col("arr")) >= n)
      .select(col("doc_id"), explode(sh).as("shingle"))
      .distinct()
  }

  /** Exact duplicate groups: group by content digest, keep the minimum
    * doc_id as canonical representative.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** 60-bit numeric key of a shingle (md5 hex prefix, same slice the
    * oracle computes). The Jaccard-verify self-joins shuffle and compare
    * these 8-byte keys instead of ~20-char strings; a 60-bit collision
    * (≈1e-13 per doc pair at corpus shingle counts) could at worst
    * overcount one intersection element — identically in both engines.
    */
  def shingleKey(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** All-pairs n-gram Jaccard >= threshold via shingle inverted index:
    * |A∩B| from a self-join on shingle, |A∪B| = |A|+|B|-|A∩B|.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val sh = shingles(docs, n)
      .select(col("doc_id"), shingleKey(col("shingle")).as("shk")).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shk") === col("b.shk") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    val j = col("n_common").cast("double") /
      (col("sa.n_sh") + col("sb.n_sh") - col("n_common"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), j.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** One MinHash signature component: min over shingles of a 60-bit slice
    * (15 hex chars) of md5(seed || ":" || shingle), as a BIGINT.
    *
    * Two design points, both bench-driven:
    *  - BIGINT, not the digest string: a string min forces SortAggregate
    *    (Tungsten's mutable aggregation buffer holds only fixed-width
    *    primitives); the numeric min stays in HashAggregate.
    *  - TWO independent permutation keys per digest (chars 1-15 and
    *    17-31 — disjoint slices of a uniform hash are independent), so n
    *    signature components cost n/2 md5 evaluations — md5 is the hot
    *    expression of the whole LSH plan and is kept only because the
    *    DuckDB oracle computes the identical digest.
    */
  private def minhashCol(i: Int): Column = {
    val digest = md5(concat(lit(s"${i / 2}:"), col("shingle")))
    val start = if (i % 2 == 0) 1 else 17
    min(conv(substring(digest, start, 15), 16, 10).cast("long")).as(s"h$i")
  }

  /** MinHash signatures: one row per doc, `numHashes` BIGINT columns. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame =
    sh.groupBy("doc_id").agg(minhashCol(0), (1 until numHashes).map(minhashCol): _*)

  /** MinHash-LSH candidate pairs, verified with exact Jaccard.
    *
    * bands × rowsPerBand signature; docs sharing any band hash become
    * candidates; candidates below `threshold` exact-Jaccard are dropped.
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, bands: Int = 3,
                      rowsPerBand: Int = 4, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(docs, n).cache()
    val sig = minhashSignatures(sh, bands * rowsPerBand)
    // All band hashes in ONE projection + explode — a union of per-band
    // selects would re-run the signature aggregation once per band.
    val bandStructs = array((0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"h$i").cast("string"))
      struct(lit(b).as("band"),
        md5(concat_ws(":", cols: _*)).as("bh"))
    }: _*)
    val bandRows = sig.select(col("doc_id"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = bandRows.as("a").join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact-Jaccard verify on the (small) candidate set — numeric keys
    val shk = sh.select(col("doc_id"), shingleKey(col("shingle")).as("shk"))
    val sizes = shk.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand.join(shk.as("a"), col("doc_a") === col("a.doc_id"))
      .join(shk.as("b"),
        col("doc_b") === col("b.doc_id") && col("a.shk") === col("b.shk"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    val j = col("n_common").cast("double") /
      (col("sa.n_sh") + col("sb.n_sh") - col("n_common"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), j.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over near-duplicate pairs — the step that turns
    * pairwise similarity into an actionable dedup decision: every doc in a
    * component keeps the component's minimum doc_id as its canonical
    * representative.
    *
    * Min-label propagation with a driver convergence loop: each iteration
    * is one join + one aggregate; iterations = component diameter (near-dup
    * clusters are shallow — a handful of rounds in practice). This is the
    * standard large-graph CC shape (what GraphX/Pregel run internally);
    * each round's state is re-cached and the previous round unpersisted.
    * Returns (doc_id, keep_id) for every doc that appears in a pair.
    */
  def clusters(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).cache()
    var changed = 1L
    while (changed > 0) {
      val prop = sym.join(labels, sym("dst") === labels("node"))
        .select(sym("src").as("node"), col("label"))
      val next = labels.unionAll(prop)
        .groupBy("node").agg(min("label").as("label")).cache()
      changed = next.as("n")
        .join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next
    }
    sym.unpersist()
    labels.select(col("node").as("doc_id"), col("label").as("keep_id"))
  }

  /** 16-bit SimHash per document. Bit j of the hash of token w is bit 3 of
    * the j-th hex nibble of md5(w) (i.e. nibble >= 8) — a fixed, engine-
    * portable projection of the digest. Each bit's sign is the tf-weighted
    * majority vote. Returns (doc_id, simhash BIGINT).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = Search.tokens(docs).groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val nib = col("h").substr(col("j") + 1, lit(1))
    val bitRows = toks
      .select(col("doc_id"), col("tf"), md5(col("word")).as("h"))
      .select(col("doc_id"), col("tf"), explode(sequence(lit(0), lit(15))).as("j"),
        col("h"))
      .select(col("doc_id"), col("j"),
        (when(nib.isin("8", "9", "a", "b", "c", "d", "e", "f"), col("tf"))
          .otherwise(-col("tf"))).as("vote"))
    bitRows.groupBy("doc_id", "j").agg(sum("vote").as("v"))
      .groupBy("doc_id")
      .agg(sum(when(col("v") > 0, pow(lit(2.0), col("j")).cast("long")).otherwise(0L))
        .as("simhash"))
  }
}
