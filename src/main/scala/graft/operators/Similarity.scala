package graft.operators

import graft.functions.{ArrayMeanAgg, Stable}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graftglue, Column, DataFrame}

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine top-k — embarrassingly parallel (broadcast
  * the query set, scan the corpus once, per-partition heaps via
  * TakeOrderedAndProject / window rank). The scale path is IVF: partition
  * vectors into coarse cells, route each query to its nearest centroid(s),
  * and brute-force only inside probed cells — at 100 TB this turns a full
  * scan per query into a 1/K-th scan, and cells can be written as parquet
  * partitions so probing becomes partition pruning.
  *
  * All arithmetic is promoted FLOAT→DOUBLE before accumulation, folded
  * left-to-right by `aggregate` (deterministic), and cosine values are
  * collapsed with Stable.stab so the DuckDB oracle hash-matches.
  */
object Similarity {

  /** Element-wise double-promoted copy of an ARRAY<FLOAT> column. */
  def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Left-fold dot product of two ARRAY<DOUBLE> columns — the codegen'd
    * ArrayDot expression, fold-order-identical to the interpreted
    * `aggregate(zip_with(...))` formulation it replaces (see ArrayDot doc).
    */
  def dot(a: Column, b: Column): Column =
    graftglue.column(graft.functions.ArrayDot(graftglue.expression(a), graftglue.expression(b)))

  /** L2 norm of an ARRAY<DOUBLE> column (same fold order as acc + x*x). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** stab(6)-stabilized element-wise mean of ARRAY<DOUBLE> groups — the
    * k-means centroid update (see ArrayMeanAgg).
    */
  private val arrayMean = udaf(new ArrayMeanAgg(6),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())

  /** (vec_id, e ARRAY<DOUBLE>, nrm) from an embeddings table. */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))

  /** Stabilized cosine between prepared sides a/b (columns e, nrm). */
  def cosine(digits: Int = 6): Column =
    Stable.stab(dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")), digits)

  /** Semantic decontamination: corpus vectors whose max cosine against
    * any EVAL vector reaches `threshold` — the embedding-space sibling of
    * the n-gram decontaminate family (an eval answer paraphrased into
    * training data has no shingle overlap but a near-identical
    * embedding). Eval sets are bounded by construction (benchmark suites
    * are thousands of rows, not corpora), so the right scale shape is the
    * knn_pq_batch contract: broadcast the eval side and stream the corpus
    * through ONE narrow pass — a bounded-side BroadcastNestedLoopJoin,
    * linear in the corpus, no shuffle until the per-vector max (which is
    * a partial-aggregating groupBy on vec_id, already co-partitioned with
    * nothing — one exchange of |corpus| skinny rows).
    *
    * `evalBound` marks vec_id < evalBound as the eval suite (the
    * text_decontaminate convention); output is the contamination list
    * (vec_id, max_cos) at stab(6).
    */
  def evalContamination(embeddings: DataFrame, evalBound: Long,
                        threshold: Double): DataFrame = {
    val p = prepared(embeddings)
    contaminationAgainst(p.filter(col("vec_id") >= evalBound),
      p.filter(col("vec_id") < evalBound), threshold)
  }

  /** The contamination core, on prepared sides: corpus rows (vec_id, e,
    * nrm) whose max stab(6) cosine against any eval row reaches the
    * threshold. Per-vector and stateless — each verdict depends only on
    * the vector and the (fixed) eval set — which is what makes the
    * streaming twin (VectorStreams.contaminationIngest) exactly equal to
    * the batch gate on any prefix.
    */
  def contaminationAgainst(corpus: DataFrame, evalSet: DataFrame,
                           threshold: Double): DataFrame = {
    val ev = evalSet.select(col("e").as("ee"), col("nrm").as("enrm"))
    corpus.crossJoin(broadcast(ev))
      .select(col("vec_id"),
        Stable.stab(dot(col("e"), col("ee")) / (col("nrm") * col("enrm")), 6).as("cos"))
      .groupBy("vec_id").agg(max("cos").as("max_cos"))
      .filter(col("max_cos") >= threshold)
  }

  /** Near-duplicate pairs: all (a < b) with cosine >= threshold. O(n²) —
    * the exact-verify twin; the scale path is cosinePairsLsh below.
    */
  def cosinePairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val p = prepared(embeddings)
    p.as("a").join(p.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine().as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Deterministic Rademacher hyperplanes for sign-bit LSH: w(j)(i) = ±1
    * from the parity of a 60-bit slice of md5("j:i") — the exact digest
    * arithmetic the DuckDB oracle replays, so both engines derive
    * bit-identical planes. Metadata-scale (nBits×dim doubles), computed
    * driver-side once and embedded as plan literals.
    */
  def hyperplanes(nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (j, i0) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$j:${i0 + 1}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0 else -1.0
    }

  /** Sign-bit band rows (vec_id, band, bh): bh packs rowsPerBand sign bits
    * of hyperplane projections. ±1 weights make each product an exact sign
    * flip of an exactly-representable double, so the left-fold projection
    * is bitwise identical across engines — the `>= 0` comparison never
    * sits on a rounding boundary and needs no stabilizer.
    *
    * The planes ride as a broadcast TABLE (nBits rows), not as plan
    * literals: a crossJoin + one codegen'd ArrayDot + a map-side-combined
    * hash aggregate keeps the plan O(1) in nBits — embedding 1024
    * projections as 1024 literal-array expressions made the optimizer and
    * codegen the dominant cost (measured ~20 s/run at sf0.1 vs ~1 s for
    * this shape).
    */
  private def signBandRows(p: DataFrame, planes: Array[Array[Double]],
                           rowsPerBand: Int): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val w = planes.toSeq.zipWithIndex.map { case (arr, j) => (j, arr.toSeq) }
      .toDF("j", "w")
    // explode a literal j-range (narrow), then equi-join the broadcast
    // plane table — a BroadcastHashJoin, so the whole plan stays free of
    // nested-loop joins (a crossJoin here would plan as BNLJ)
    p.select(col("vec_id"), col("e"),
        explode(typedLit(planes.indices.toList)).as("j"))
      .join(broadcast(w), "j")
      .select(col("vec_id"), (col("j") / rowsPerBand).cast("int").as("band"),
        when(dot(col("e"), col("w")) >= 0,
          expr(s"shiftleft(1, j % $rowsPerBand)")).otherwise(lit(0))
          .as("bit"))
      .groupBy("vec_id", "band").agg(sum("bit").as("bh"))
  }

  /** Blocked near-duplicate pairs — the scale path for cosinePairs: docs
    * sharing any (band, bh) sign-bucket become candidates (a shuffle
    * EQUI-join, never a nested loop), then exact cosine keeps candidates
    * over the threshold. Same candidates→verify shape as the text
    * MinHash-LSH path. At 128 bands × 8 bits (1024 planes, measured
    * against the exact twin) the bucket join carries EVERY true pair at
    * the 0.45 working threshold on both test corpora — recall 1.0 with
    * ~2.4× fewer comparisons. cos 0.45 ≈ bit-agreement 0.65 is an
    * intrinsically hard LSH regime, hence the wide-OR banding and modest
    * reduction; at a production near-dup threshold (cos ≥ 0.9, agreement
    * 0.86) the same 8-bit bands hit per-band collision 0.29, so a handful
    * of bands give recall ~1 and the reduction is orders of magnitude.
    * The plan stays linear-scan + equi-join at any corpus size.
    */
  def cosinePairsLsh(embeddings: DataFrame, threshold: Double,
                     nBits: Int = 1024, rowsPerBand: Int = 8,
                     dim: Int = 64): DataFrame =
    cosinePairsLshFrom(embeddings,
      embeddingBands(embeddings, nBits, rowsPerBand, dim), threshold)

  /** The (vec_id, band, bh) LSH sketch of an embeddings table — a pure
    * corpus function a pipeline persists next to the vectors (it's the
    * expensive stage: nBits projections per vector).
    */
  def embeddingBands(embeddings: DataFrame, nBits: Int = 1024,
                     rowsPerBand: Int = 8, dim: Int = 64): DataFrame =
    signBandRows(prepared(embeddings).select("vec_id", "e"),
      hyperplanes(nBits, dim), rowsPerBand)

  /** Candidates from a (pre-built) band-row sketch, exact-cosine verified
    * against the vectors.
    */
  def cosinePairsLshFrom(embeddings: DataFrame, br: DataFrame,
                         threshold: Double): DataFrame = {
    val p = prepared(embeddings)
    val cand = br.as("x").join(br.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    cand.join(p.as("a"), col("vec_a") === col("a.vec_id"))
      .join(p.as("b"), col("vec_b") === col("b.vec_id"))
      .select(col("vec_a"), col("vec_b"), cosine().as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-bucketed ANN top-k — the sign-bit scale path beside IVF: a corpus
    * vector is a candidate iff it shares at least one (band, bh) sign-bucket
    * with the query in the pre-built sketch `br`; exact cosine then ranks
    * candidates and row_number keeps k. The query-side band rows (nQueries ×
    * bands — metadata-scale) broadcast into an equi-join against the corpus
    * sketch, so the plan is broadcast-join + distinct + two vec_id
    * equi-joins: linear in the corpus at any size, no nested loop anywhere,
    * and only candidate vectors ever reach the ArrayDot cosine. Unlike IVF
    * there is no routing step to keep consistent with the layout — the
    * sketch is a pure corpus function, so streamed appends need no
    * centroid-generation discipline. Deterministic end-to-end (md5-parity
    * planes), hence SQL-oracle-able, unlike the kmeans tier.
    */
  def knnLshFrom(embeddings: DataFrame, br: DataFrame, nQueries: Int,
                 k: Int): DataFrame = {
    val p = prepared(embeddings)
    val cand = broadcast(br.filter(col("vec_id") < nQueries)).as("x")
      .join(br.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("neighbor_id"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    cand
      .join(broadcast(p.filter(col("vec_id") < nQueries)).as("a"),
        col("query_id") === col("a.vec_id"))
      .join(p.as("b"), col("neighbor_id") === col("b.vec_id"))
      .select(col("query_id"), col("neighbor_id"), cosine().as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Brute-force top-k: for each query vector (vec_id < nQueries), the k
    * nearest other vectors by cosine. The tiny query side is broadcast; the
    * corpus side streams.
    */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val p = prepared(embeddings)
    val q = p.filter(col("vec_id") < nQueries)
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(q).as("a")
      .join(p.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        cosine().as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Offline ANN quality evaluation — recall of an approximate tier
    * against the exact ground truth, per query: |approx ∩ exact| / |exact|
    * over (query_id, neighbor_id) id sets. The offline job every ANN
    * deployment runs per index build (`search_eval`'s role, for vectors).
    * Both inputs are (|queries|·k)-row top-k tables, so the left join and
    * rollup here are metadata-sized regardless of corpus scale — the cost
    * lives in producing the inputs, which stay one composed plan each.
    */
  def annRecall(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select("query_id", "neighbor_id")
      .join(approx.select(col("query_id"), col("neighbor_id"), lit(1L).as("h")),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("h"), lit(0L))).as("n_hit"),
        count(lit(1)).as("k_eval"))
      .select(col("query_id"), col("n_hit"), col("k_eval"),
        (col("n_hit").cast("double") / col("k_eval")).as("recall"))

  /** IVF centroids: per-label mean vector, element-stabilized. Uses the
    * `label` column as the coarse partitioner (stand-in for k-means cells —
    * the routing/probing mechanics are identical).
    * Returns (label, i (1-based), c).
    */
  def ivfCentroids(embeddings: DataFrame): DataFrame =
    embeddings.select(col("label"), posexplode(toDouble(col("embedding"))))
      .groupBy(col("label"), (col("pos") + 1).as("i"))
      .agg(Stable.stab(avg("col"), 6).as("c"))

  /** Embedding-quality QA: each vector's cosine to its own label's
    * centroid, bottom-k per label — the mislabeled/outlier candidates a
    * pipeline reviews before training on the labels. Centroids are the
    * same stab(6)-collapsed per-dim averages the IVF tiers pin
    * cross-engine ([[ivfCentroids]]), reassembled into per-label arrays
    * (labels-count rows, broadcast), so the affinity pass is one
    * ROW-LOCAL ArrayDot over the corpus — one explode aggregate + one
    * broadcast join, nothing quadratic, and WindowGroupLimit prunes the
    * per-label bottom-k. cos(v, mean) needs no count: the centroid IS
    * the mean, joined whole.
    */
  def labelOutliers(embeddings: DataFrame, k: Int): DataFrame = {
    val cent = ivfCentroids(embeddings)
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        s => s.getField("c")).as("cv"))
    val p = prepared(embeddings)
    val w = Window.partitionBy("label").orderBy(asc("cos"), asc("vec_id"))
    embeddings.select(col("vec_id"), col("label")).join(p, "vec_id")
      .join(broadcast(cent), "label")
      .select(col("label"), col("vec_id"),
        Stable.stab(dot(col("e"), col("cv")) /
          (col("nrm") * norm(col("cv"))), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("label", "rn", "vec_id", "cos")
  }

  /** Persist the IVF layout: embeddings written as parquet partitioned by
    * cell label, centroids alongside. At scale, probing a cell is then
    * partition pruning at file-listing time — the ANN twin of
    * Search.buildIndex. Both tables materialize under one DirSwap marker
    * scope, so a crashed (re)build can never leave a mixed or partial
    * generation (same discipline as VectorStreams.retrainIndex).
    */
  def buildIvfIndex(embeddings: DataFrame, indexDir: String): Unit =
    DirSwap.swap(indexDir, Seq(
      "cells" -> { out =>
        // batch=base: the cells table is batch-keyed (BatchCommit) so the
        // streaming ingest's writes are replay-idempotent; the build is the
        // base generation (named, so no stream's numeric id collides)
        embeddings.write.partitionBy("label").parquet(s"$out/batch=base")
        DirSwap.markComplete(out)
      },
      "centroids" -> { out => ivfCentroids(embeddings).write.parquet(out) }))

  /** Committed-batches view of a batch-keyed cells table (build writes
    * batch=base, each streaming micro-batch its own numeric id — see
    * VectorStreams.vectorIngest). Partition pruning on the cell/label
    * column still applies per batch dir.
    */
  def cellsTable(spark: org.apache.spark.sql.SparkSession, indexDir: String): DataFrame =
    BatchCommit.readCommitted(spark, s"$indexDir/cells").getOrElse(
      throw new IllegalStateException(s"$indexDir/cells has no committed batches"))

  /** Query the persisted IVF index: route each query vector to its
    * `nprobe` nearest centroids (tiny centroid table, driver-side per
    * query), then scan ONLY the probed cell partitions — `label IN (...)`
    * prunes every other cell's files. Same cosine/top-k semantics as
    * ivfTopK at nprobe=1; larger nprobe trades a proportionally larger
    * pruned scan for recall near cell boundaries (cells partition the
    * corpus, so each neighbor is still scored at most once — its label
    * matches at most one of a query's probe rows, no dedup needed).
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                     queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    val cent = spark.read.parquet(s"$indexDir/centroids")
    val q = prepared(queries)
    val qd = broadcast(q)
      .select(col("vec_id").as("query_id"), posexplode(col("e")).as(Seq("pos", "qe")))
      .join(broadcast(cent), (col("pos") + 1) === col("i"))
      .groupBy("query_id", "label")
      .agg(Stable.stab(sum(col("qe") * col("c")), 6).as("qdot"))
    val probes = qd.withColumn("rn",
        row_number().over(Window.partitionBy("query_id").orderBy(desc("qdot"), asc("label"))))
      .filter(col("rn") <= nprobe).select("query_id", "label")
    val probed = probes.select("label").distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ |queries|×nprobe cells — metadata-scale
    // carry `label` through preparation instead of joining back a second
    // (unpruned!) cells scan to recover it — one pruned scan, no join
    val cells = cellsTable(spark, indexDir)
      .filter(col("label").isin(probed: _*))
      .select(col("vec_id"), toDouble(col("embedding")).as("e"), col("label"))
      .withColumn("nrm", norm(col("e")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(q.join(probes.withColumnRenamed("label", "probe_label"),
        col("vec_id") === col("query_id"))).as("a")
      .join(cells.as("b"),
        col("b.label") === col("probe_label") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("query_id"), col("probe_label"), col("b.vec_id").as("neighbor_id"),
        cosine().as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  // ---------------------------------------------------------------------
  // Learned IVF cells: Lloyd k-means as DataFrame ops (replaces the
  // `label` column stand-in — real coarse quantization, same routing and
  // pruning mechanics).
  // ---------------------------------------------------------------------

  /** Row-local argmin over the k centroids, inlined as literal-array
    * expressions: for each centroid, d = c·c − 2e·c (the e·e term is
    * constant per vector and dropped; c·c is folded driver-side in the
    * same left-to-right order ArrayDot uses, so the value is
    * bit-identical to the in-plan form), then array_min over (d, cell)
    * structs — lexicographic, so the argmin is deterministic (min
    * distance, then min cell on ties). k×dim doubles of literals is
    * metadata-scale (nothing like the 1024-plane case where literal
    * embedding made the optimizer the bottleneck); in exchange the
    * assignment is a NARROW projection — the previous crossJoin-by-k +
    * groupBy(vec_id) formulation shuffled the whole k×-exploded corpus
    * once per call (and once per Lloyd round).
    *
    * The distance is stab(6)-collapsed before the argmin (the SemDedup
    * gate discipline): cc folds driver-side left-to-right — the same
    * order as DuckDB's `list_sum(list_transform(c, x -> x*x))` — and the
    * e·c dot folds in index order in both engines, so the quantized d
    * agrees bit-for-bit and the oracle re-derives the same winning cell
    * (ties fall through to the lower cell id in both).
    */
  private def argminCell(e: Column, cent: Seq[(Int, Seq[Double])]): Column =
    array_min(array(cent.map { case (cell, c) =>
      val cc = c.foldLeft(0.0)((a, x) => a + x * x)
      struct(Stable.stab(lit(cc) - lit(2.0) * dot(e, typedLit(c)), 6).as("d"),
        lit(cell).as("cell"))
    }: _*))

  /** Assign each vector in `p` (vec_id, e) to its nearest centroid in
    * `cent` (cell, c) by squared euclidean distance. The centroid table
    * is k rows — collected here (metadata-bounded, the same k×dim the
    * trainer itself collects every round) and inlined, so the assignment
    * plan is one narrow projection with zero joins and zero shuffles.
    */
  def kmeansAssign(p: DataFrame, cent: DataFrame): DataFrame = {
    val cs = cent.select("cell", "c").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    p.select(col("vec_id"), argminCell(col("e"), cs).getField("cell").as("cell"))
  }

  /** Lloyd k-means over the embedding column: k deterministic md5-sampled
    * seeds, then `iters` rounds of assign + per-dimension mean — every step
    * a DataFrame op (the corpus is never collected; per-round state is the
    * k×dim centroid table, localCheckpoint'ed so loop plans stay O(1) —
    * see Dedup.clusters for why caching alone doesn't cut planner time).
    * Centroid means are floor-stabilized so results don't wobble with
    * aggregation order. A cell that loses all members drops out (standard
    * Lloyd behavior; routing simply never probes it).
    * Returns (cell INT 0..k-1, c ARRAY<DOUBLE>).
    *
    * GATED (round 11): every round is value-identical to a DuckDB SQL
    * unroll — md5-ordered seeds, stab(6) squared-euclid argmin (ties to
    * the lower cell), stab(6) per-dim means — the discipline SemDedup.model
    * proved for cosine Lloyd, applied to the serving trainer. The early
    * stop is safe under a fixed-round SQL twin: a converged round is a
    * fixed point (assignment and update are both deterministic functions),
    * so the oracle running all `iters` rounds lands on the same centroids.
    */
  def kmeansCentroids(embeddings: DataFrame, k: Int, iters: Int): DataFrame =
    kmeansCentroidsPrepared(prepared(embeddings).select("vec_id", "e"), k, iters)

  /** Same trainer over an already-prepared (vec_id, e ARRAY<DOUBLE>) table —
    * the entry point for retraining from a persisted index layout, whose
    * cells store `e` directly (no float column to re-promote).
    */
  def kmeansCentroidsPrepared(prep: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = prep.sparkSession
    import spark.implicits._
    // Round-18 loop tightening (see Spread.tight): a tiny single-split
    // prep pinned to SinglePartition makes each Lloyd round's k-row mean
    // aggregate exchange-free — one job per round instead of the AQE
    // map/reduce stage pair. Guard keeps the partitioned path at scale.
    // (Every caller passes a scan/projection, so the partition probe is
    // plan-only.)
    val p = graft.operators.Spread.tight(prep)
    // Seeds: first k vectors in (md5(vec_id), vec_id) order — a
    // deterministic uniform sample DuckDB re-derives exactly (the SemDedup
    // seed rule; md5 hex compares identically as a binary string in both
    // engines). TakeOrdered k, no full sort; k×dim doubles is the only
    // thing this trainer ever collects, and it collects it anyway for the
    // convergence check.
    val hashOrd = Seq(md5(col("vec_id").cast("string")), col("vec_id"))
    var cent: Seq[(Int, Seq[Double])] = p.orderBy(hashOrd: _*).limit(k)
      .select(col("e")).collect().map(_.getSeq[Double](0))
      .zipWithIndex.map { case (e, i) => (i, e) }.toSeq
    // Per round, ONE action: the collect that pulls the k×dim means to the
    // driver both materializes the round (the next round's plan starts
    // from a LocalRelation — O(1) lineage, no localCheckpoint job) and is
    // the convergence snapshot (stabilized means make converged centroids
    // bit-identical, so equality is an exact early stop).
    var prev: Seq[(Int, Seq[Double])] = null
    var i = 0
    while (i < iters && cent != prev) {
      prev = cent
      // assignment is the inlined row-local argmin (argminCell): the
      // previous crossJoin-by-k + groupBy(vec_id) form shuffled the
      // k×-exploded corpus every round; this is a narrow projection, so
      // the ONLY per-round shuffle is the k-row mean aggregate below
      val asg = p.select(
        argminCell(col("e"), cent).getField("cell").as("cell"), col("e"))
      // centroid update: one typed array-sum aggregate per cell. The
      // DataFrame formulation (posexplode → per-(cell,pos) avg →
      // collect_list/array_sort reassembly) blew each vector into dim rows
      // and paid two extra shuffles per round; ArrayMeanAgg carries the
      // whole mean in one buffer and applies the same stab(·,6) in finish,
      // so the exact-equality convergence stop is unchanged.
      cent = asg.groupBy("cell").agg(arrayMean(col("e")).as("c"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
        .sortBy(_._1)
      i += 1
    }
    cent.toDF("cell", "c")
  }

  /** Route queries (query_id, e) to their `nprobe` nearest k-means cells.
    * The routing distance is stab(6)-collapsed like the assignment's, so
    * the probe set is oracle-re-derivable (ties to the lower cell id).
    */
  private def kmeansProbes(q: DataFrame, cent: DataFrame, nprobe: Int): DataFrame = {
    val scored = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("cell"),
        Stable.stab(dot(col("c"), col("c")) - lit(2.0) * dot(col("e"), col("c")), 6).as("d"))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(asc("d"), asc("cell"))))
      .filter(col("rn") <= nprobe).select("query_id", "cell")
  }

  /** ANN over learned k-means cells: train centroids, assign the corpus,
    * route each query (vec_id < nQueries) to its `nprobe` nearest cells,
    * exact cosine top-k inside probed cells only. Cells partition the
    * corpus, so each neighbor is scored at most once — no dedup needed.
    */
  def knnIvfKmeans(embeddings: DataFrame, nQueries: Int, k: Int,
                   kCells: Int = 8, iters: Int = 5, nprobe: Int = 2): DataFrame = {
    val p = prepared(embeddings)
    val cent = kmeansCentroids(embeddings, kCells, iters)
    val cells = p.join(kmeansAssign(p.select("vec_id", "e"), cent), "vec_id")
    val q = p.filter(col("vec_id") < nQueries)
      .withColumnRenamed("vec_id", "query_id")
    val qside = q.join(kmeansProbes(q.select("query_id", "e"), cent, nprobe), "query_id")
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(qside).as("a")
      .join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.query_id") =!= col("b.vec_id"))
      .select(col("a.query_id"), col("a.cell").as("probe_cell"),
        col("b.vec_id").as("neighbor_id"), cosine().as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Persist the k-means IVF layout: corpus written as parquet partitioned
    * by learned cell, centroid arrays alongside — probing a cell is then
    * partition pruning at file-listing time (same mechanics as
    * buildIvfIndex, with learned cells instead of the label column).
    */
  def buildKmeansIvfIndex(embeddings: DataFrame, indexDir: String,
                          kCells: Int = 8, iters: Int = 5): Unit = {
    val p = prepared(embeddings)
    val cent = kmeansCentroids(embeddings, kCells, iters)
    DirSwap.swap(indexDir, Seq(
      "cells" -> { out =>
        p.join(kmeansAssign(p.select("vec_id", "e"), cent), "vec_id")
          .write.partitionBy("cell").parquet(s"$out/batch=base")
        DirSwap.markComplete(out) // content in batch=base (see buildIvfIndex)
      },
      // the trainer already collected cent as a LocalRelation
      "centroids" -> { out => cent.write.parquet(out) }))
  }

  /** Query the persisted k-means IVF index. The probed cell set (≤
    * queries × nprobe — metadata-scale) is collected only to drive
    * `cell IN (...)` partition pruning on the cells scan.
    */
  def knnIvfKmeansIndexed(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                          queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val cent = spark.read.parquet(s"$indexDir/centroids")
    val q = prepared(queries).withColumnRenamed("vec_id", "query_id")
    val probes = kmeansProbes(q.select("query_id", "e"), cent, nprobe)
    val probed = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ |queries|×nprobe cells — metadata-scale
    val cells = cellsTable(spark, indexDir)
      .filter(col("cell").isin(probed: _*))
    val qside = q.join(probes, "query_id")
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(qside).as("a")
      .join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.query_id") =!= col("b.vec_id"))
      .select(col("a.query_id"), col("a.cell").as("probe_cell"),
        col("b.vec_id").as("neighbor_id"), cosine().as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  // ---------------------------------------------------------------------
  // Product quantization (PQ): the memory-compression ANN tier. A 100 TB
  // embedding corpus at 64 float32 dims is 25 TB of vectors; PQ codes at
  // m=8 subspaces × 16 codes are 8 NIBBLES' worth of information (stored
  // as 8 small ints — 16-64× less than the floats), and approximate
  // scoring reads ONLY the code table. The classic two-stage query:
  // asymmetric-distance (ADC) shortlist over codes, exact re-rank of the
  // shortlist against the full vectors — so reported cosines are EXACT
  // and approximation affects recall only, never the scores.
  // ---------------------------------------------------------------------

  /** Per-subspace PQ codebooks: the j-th codebook is a k-means over the
    * corpus's j-th dim/m-dimensional subvector slice (the same
    * DataFrame-native trainer as the IVF tier, run m times). Returned
    * driver-side: m × kCodes × dim/m doubles — metadata-scale, the same
    * class of collect as every centroid table here (the trainer collects
    * it anyway for its convergence check).
    */
  def pqCodebooks(prep: DataFrame, m: Int, kCodes: Int,
                  iters: Int): Seq[Seq[(Int, Seq[Double])]] = {
    // dim from one row — a LIMIT-1 job at train/index-build time
    val dim = prep.select(size(col("e")).as("d")).limit(1).collect()(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).map { j =>
      kmeansCentroidsPrepared(
          prep.select(col("vec_id"), slice(col("e"), j * sub + 1, sub).as("e")),
          kCodes, iters)
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    }
  }

  /** Encode each vector as its m per-subspace nearest-code ids — a NARROW
    * projection (the inlined argmin per subspace; no join, no shuffle),
    * exactly the assignment shape of the k-means tier.
    */
  def pqEncode(prep: DataFrame, cbs: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    val m = cbs.length
    val sub = cbs.head.head._2.length
    val codes = array((0 until m).map { j =>
      argminCell(slice(col("e"), j * sub + 1, sub), cbs(j)).getField("cell")
    }: _*)
    prep.select(col("vec_id"), codes.as("codes"))
  }

  /** PQ ANN top-k with exact re-rank. Stage 1 scores every corpus CODE row
    * against each query's ADC lookup table (lut[j·kCodes + code] =
    * q_subⱼ · c_{j,code}, built driver-side per query — nQueries × m ×
    * kCodes doubles, metadata-bounded) with one codegen'd `aggregate`
    * over the m codes, normalizes by the stored vector norm, and keeps
    * the top `shortlist`·k per query; stage 2 re-ranks the shortlist with
    * EXACT cosines against the full vectors (broadcast-joined — the
    * shortlist is query-count-sized). Scan cost of stage 1 is the code
    * table, not the vectors — the whole point at corpus scale.
    */
  def knnPq(embeddings: DataFrame, nQueries: Int, k: Int,
            m: Int = 8, kCodes: Int = 16, iters: Int = 5,
            shortlist: Int = 10): DataFrame = {
    val p = prepared(embeddings)
    val prepCut = p.select("vec_id", "e")
    val cbs = pqCodebooks(prepCut, m, kCodes, iters)
    val codes = pqEncode(prepCut, cbs)
      .join(p.select("vec_id", "nrm"), "vec_id")
    knnPqFromCodes(embeddings, codes, cbs, nQueries, k, shortlist)
  }

  /** Codebooks ⇄ rows (j, code, c) — the persistence format. Training is
    * deterministic (hash-seeded, stab'd means), so codebook and code
    * tables rebuilt independently from the same corpus always agree.
    */
  /** PQ reconstruction card — the emb_sq8_error sibling for the product
    * quantizer: per vector, the L2 error and cosine between the original
    * and its codebook reconstruction (each subspace's assigned centroid,
    * concatenated). THE "is m×k codes enough for this corpus" QA number
    * next to the ADC serving tiers. Per-subspace terms are row-local
    * ArrayDot folds against the broadcast codebook; the per-vector
    * rollup sums m=8 doubles (stab(6) absorbs reassociation noise, the
    * adc_cos discipline).
    */
  def pqReconError(embeddings: DataFrame,
                   cbs: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    val p = prepared(embeddings)
    val sub = cbs.head.head._2.length
    val cbDf = pqCodebooksToDf(p.sparkSession, cbs)
    val diff = zip_with(col("es"), col("c"), (a, b) => a - b)
    val terms = pqEncode(p.select("vec_id", "e"), cbs)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("j", "code")))
      .join(p, "vec_id")
      .withColumn("es", slice(col("e"), col("j") * sub + 1, lit(sub)))
      .join(broadcast(cbDf), Seq("j", "code"))
      .select(col("vec_id"), col("nrm"),
        dot(diff, diff).as("sq"), dot(col("es"), col("c")).as("dt"),
        dot(col("c"), col("c")).as("rn2"))
    terms.groupBy("vec_id").agg(
        first("nrm").as("nrm"), sum("sq").as("ssq"),
        sum("dt").as("sdt"), sum("rn2").as("srn"))
      .select(col("vec_id"),
        Stable.stab(sqrt(col("ssq")), 6).as("l2_err"),
        Stable.stab(col("sdt") / (col("nrm") * sqrt(col("srn"))), 6).as("cos"))
  }

  def pqCodebooksToDf(spark: org.apache.spark.sql.SparkSession,
                      cbs: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    import spark.implicits._
    cbs.zipWithIndex.flatMap { case (cb, j) =>
      cb.map { case (code, c) => (j, code, c) }
    }.toDF("j", "code", "c")
  }

  def pqCodebooksFromDf(df: DataFrame): Seq[Seq[(Int, Seq[Double])]] =
    df.select("j", "code", "c").collect() // m × kCodes rows — metadata-scale
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(r => (r.getInt(1), r.getSeq[Double](2))).toSeq.sortBy(_._1))

  /** Persist the PQ layout as an index dir under one DirSwap marker scope:
    * `codebooks` (j, code, c) and the batch-keyed `codes` table (vec_id,
    * codes, nrm — batch=base; streaming ingest adds its own committed
    * batch dirs, see VectorStreams.pqIngest). Same crash-recoverable
    * build/maintenance discipline as the IVF layouts.
    */
  def buildPqIndex(embeddings: DataFrame, indexDir: String,
                   m: Int = 8, kCodes: Int = 16, iters: Int = 5): Unit = {
    val p = prepared(embeddings)
    val cbs = pqCodebooks(p.select("vec_id", "e"), m, kCodes, iters)
    DirSwap.swap(indexDir, Seq(
      "codes" -> { out =>
        pqEncode(p.select("vec_id", "e"), cbs)
          .join(p.select("vec_id", "nrm"), "vec_id")
          .write.parquet(s"$out/batch=base")
        DirSwap.markComplete(out)
      },
      // the trainer collected cbs driver-side; this write reads nothing live
      "codebooks" -> { out =>
        pqCodebooksToDf(embeddings.sparkSession, cbs).write.parquet(out)
      }))
  }

  /** Committed-batches view of the PQ code table. */
  def pqCodesTable(spark: org.apache.spark.sql.SparkSession, indexDir: String): DataFrame =
    BatchCommit.readCommitted(spark, s"$indexDir/codes").getOrElse(
      throw new IllegalStateException(s"$indexDir/codes has no committed batches"))

  /** The PQ query against the persisted index. `embeddings` supplies the
    * query vectors and the exact re-rank side only — at corpus scale the
    * shortlist's full-vector reads are a pruned point-lookup against the
    * source table, never a second full scan; stage 1 reads codes alone.
    */
  def knnPqIndexed(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                   embeddings: DataFrame, nQueries: Int, k: Int,
                   shortlist: Int = 10): DataFrame =
    knnPqFromCodes(embeddings, pqCodesTable(spark, indexDir),
      pqCodebooksFromDf(spark.read.parquet(s"$indexDir/codebooks")),
      nQueries, k, shortlist)

  /** The PQ query against prebuilt (codes, codebooks) — what a deployment
    * runs against the persisted index (training amortized per corpus).
    */
  def knnPqFromCodes(embeddings: DataFrame, codes: DataFrame,
                     cbs: Seq[Seq[(Int, Seq[Double])]],
                     nQueries: Int, k: Int, shortlist: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val m = cbs.length
    val kCodes = cbs.map(_.map(_._1).max).max + 1
    val sub = cbs.head.head._2.length
    val p = prepared(embeddings)
    // query vectors to the driver: nQueries rows — the same metadata-bounded
    // collect the probe-routing tiers make; LUTs are pure driver arithmetic
    val qvecs = p.filter(col("vec_id") < nQueries)
      .select("vec_id", "e").as[(Long, Seq[Double])].collect()
    val luts = qvecs.map { case (qid, qe) =>
      val lut = new Array[Double](m * kCodes)
      for (j <- 0 until m; (code, c) <- cbs(j)) {
        var d = 0.0
        var i = 0
        while (i < sub) { d += qe(j * sub + i) * c(i); i += 1 }
        lut(j * kCodes + code) = d
      }
      (qid, lut.toSeq)
    }.toSeq
    val lutDf = luts.toDF("query_id", "lut")
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc +
        element_at(col("lut"), j * kCodes + element_at(col("codes"), j + 1) + 1))
    val w = Window.partitionBy("query_id").orderBy(desc("adc_cos"), asc("neighbor_id"))
    val short = codes.crossJoin(broadcast(lutDf))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        // stab(6): LUT entries and the m-term fold are order-identical
        // across engines, so the quantized ADC score — and with it the
        // shortlist membership — is oracle-re-derivable
        Stable.stab(adc / col("nrm"), 6).as("adc_cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= shortlist * k)
      .select("query_id", "neighbor_id")
    // exact re-rank: true cosines for shortlist rows only
    val wx = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(short.join(p.withColumnRenamed("vec_id", "query_id"), "query_id")).as("a")
      .join(p.as("b"), col("neighbor_id") === col("b.vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        Stable.stab(dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .withColumn("rank", row_number().over(wx).cast("long"))
      .filter(col("rank") <= k)
  }

  // ---------------------------------------------------------------------
  // Batch ANN routing — the corpus×corpus shape. The serving tiers above
  // collect the query vectors (and probed cell ids) driver-side: correct
  // and metadata-bounded for tens of queries, wrong for the one ANN
  // pattern an LLM-data pipeline runs at FULL scale, a million-row query
  // table joined against the corpus (semantic dedup, cross-corpus
  // linking). These variants route a query TABLE with ZERO driver
  // collects: centroids/codebooks ride as broadcast tables, routing and
  // LUT construction stay in-plan, and plan construction runs no Spark
  // job (spec-pinned) — so the whole thing composes into a larger lazy
  // plan like any other operator.
  // ---------------------------------------------------------------------

  /** In-plan probe routing shared by every batch tier: score each query
    * against the broadcast per-label centroid table, keep the `nprobe`
    * best labels. ONE definition — the serving/batch bit-identity pins
    * and the shared IVF oracle rest on all tiers computing exactly this
    * arithmetic, so it must not fork per tier. Returns
    * (query_id, label).
    */
  private def labelProbesInPlan(q: DataFrame, cent: DataFrame,
                                nprobe: Int): DataFrame =
    q.select(col("query_id"), posexplode(col("e")).as(Seq("pos", "qe")))
      .join(broadcast(cent), (col("pos") + 1) === col("i"))
      .groupBy("query_id", "label")
      .agg(Stable.stab(sum(col("qe") * col("c")), 6).as("qdot"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("query_id").orderBy(desc("qdot"), asc("label"))))
      .filter(col("rn") <= nprobe)
      .select("query_id", "label")

  /** In-plan per-query ADC lookup tables shared by the batch PQ tiers —
    * fold order identical to the driver-built LUTs (the knn_pq_batch ==
    * knn_pq equality spec rests on this single definition). Returns
    * (query_id, lut ARRAY<DOUBLE> of m·kCodes entries).
    */
  private def pqLutsInPlan(q: DataFrame, codebooks: DataFrame,
                           m: Int, kCodes: Int): DataFrame =
    q.select(col("query_id"), col("e"),
        explode(sequence(lit(0), lit(m - 1))).as("j"))
      .join(broadcast(codebooks.select("j", "code", "c")), "j")
      .select(col("query_id"),
        (col("j") * kCodes + col("code")).as("idx"),
        dot(slice(col("e"), col("j") * size(col("c")) + 1, size(col("c"))),
          col("c")).as("d"))
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(struct(col("idx"), col("d")))),
        s => s.getField("d")).as("lut"))

  /** The ADC accumulation over a row's m codes against the joined lut. */
  private def adcExpr(m: Int, kCodes: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc +
        element_at(col("lut"), j * kCodes + element_at(col("codes"), j + 1) + 1))

  /** Label-IVF ANN over a query TABLE (vec_id, embedding), zero driver
    * collects: per-label centroids aggregate in-plan, each query routes
    * to its `nprobe` best cells through a broadcast centroid join, and
    * candidates come from an EQUI-join of the routed query side against
    * the label-keyed corpus — at a million queries the join shuffles by
    * cell instead of broadcasting, which is exactly the right shape (the
    * serving twin `ivfTopKIndexed` instead collects probed cell ids to
    * drive partition pruning — better for tens of queries, impossible
    * for a table). Same cosine/top-k/tie-break semantics as ivfTopK, so
    * the same SQL oracle gates it.
    */
  def ivfTopKBatch(embeddings: DataFrame, queries: DataFrame, k: Int,
                   nprobe: Int = 2): DataFrame = {
    val p = prepared(embeddings)
    val cent = ivfCentroids(embeddings)
    val q = prepared(queries).withColumnRenamed("vec_id", "query_id")
    val probes = labelProbesInPlan(q, cent, nprobe)
      .withColumnRenamed("label", "probe_label")
    val cells = embeddings.select(col("vec_id"), col("label")).join(p, "vec_id")
    val qside = q.join(probes, "query_id")
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    qside.as("a")
      .join(cells.as("b"),
        col("b.label") === col("probe_label") && col("a.query_id") =!= col("b.vec_id"))
      .select(col("query_id"), col("probe_label"), col("b.vec_id").as("neighbor_id"),
        cosine().as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** PQ ANN over a query TABLE, zero driver collects: the ADC lookup
    * tables are built IN-PLAN — each query explodes over the m subspace
    * ids, equi-joins the broadcast codebook rows (j, code, c) (a
    * BroadcastHashJoin, same trick as the LSH plane table), computes the
    * subvector·centroid dot with the codegen'd ArrayDot over a slice
    * (subspace width = size(c), read per row — nothing structural is
    * collected), and reassembles per-query LUT arrays with an
    * array_sort'd collect_list (idx is unique per query, so the sort
    * makes the assembly deterministic). The ADC scoring and exact re-rank
    * stages are IDENTICAL expressions to knnPqFromCodes — identical fold
    * orders, so the batch path returns bit-identical rows to the serving
    * path (spec-pinned). `m`/`kCodes` are index-structure constants, the
    * same ones the build fixed.
    *
    * Scale notes: the LUT side grows with the query table (m·kCodes
    * doubles per query) — the broadcast hint on it fits serving and
    * thousands-of-queries batches; for a corpus-sized query table drop
    * the hint and let the ADC stage shuffle, or IVF-route first
    * (ivfTopKBatch) and ADC within cells. The brute ADC×queries product
    * is inherent to un-routed PQ, not to this formulation.
    */
  def knnPqBatchFromCodes(embeddings: DataFrame, queries: DataFrame,
                          codes: DataFrame, codebooks: DataFrame,
                          m: Int = 8, kCodes: Int = 16,
                          k: Int = 5, shortlist: Int = 10): DataFrame = {
    val p = prepared(embeddings)
    val q = prepared(queries).withColumnRenamed("vec_id", "query_id")
    val luts = pqLutsInPlan(q, codebooks, m, kCodes)
    val w = Window.partitionBy("query_id").orderBy(desc("adc_cos"), asc("neighbor_id"))
    val short = codes.crossJoin(broadcast(luts))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Stable.stab(adcExpr(m, kCodes) / col("nrm"), 6).as("adc_cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= shortlist * k)
      .select("query_id", "neighbor_id")
    val wx = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    short.join(q, "query_id").as("a")
      .join(p.as("b"), col("neighbor_id") === col("b.vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        Stable.stab(dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .withColumn("rank", row_number().over(wx).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ — the production composition (FAISS's default shape): coarse
    * cells bound WHICH codes are scored, PQ codes bound WHAT a score
    * costs. Each query routes to its `nprobe` nearest cells (in-plan,
    * broadcast centroid join), and the ADC stage becomes an EQUI-JOIN of
    * the routed (query, lut, cell) side against the cell-keyed code
    * table — the un-routed PQ tier's cross-join disappears entirely, so
    * this is the one ANN tier with bounded candidates AND no
    * nested-loop anywhere (PlanShapeSpec-locked). At corpus scale the
    * code table is partitioned by cell, so the join side prunes like
    * every other IVF scan; cells partition the corpus, so no candidate
    * is scored twice. Exact-cosine re-rank as in every PQ tier —
    * approximation affects recall only, never reported scores. Zero
    * driver collects, same as the other batch routers.
    *
    * `codes` must carry the cell column (vec_id, codes, nrm, label) — a
    * deployment stores it in the code table at encode time; the
    * registered query derives it with one metadata join.
    */
  def knnIvfPqBatchFromCodes(embeddings: DataFrame, queries: DataFrame,
                             codes: DataFrame, codebooks: DataFrame,
                             m: Int = 8, kCodes: Int = 16,
                             k: Int = 5, nprobe: Int = 2,
                             shortlist: Int = 10): DataFrame = {
    val p = prepared(embeddings)
    val q = prepared(queries).withColumnRenamed("vec_id", "query_id")
    val probes = labelProbesInPlan(q, ivfCentroids(embeddings), nprobe)
    val luts = pqLutsInPlan(q, codebooks, m, kCodes)
    // the routed query side: (query_id, lut, label) — ≤ nQueries×nprobe
    // rows; the ADC stage is an equi-join on the probed cell
    val qside = luts.join(probes, "query_id")
    val w = Window.partitionBy("query_id").orderBy(desc("adc_cos"), asc("neighbor_id"))
    val short = codes.join(broadcast(qside), "label")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Stable.stab(adcExpr(m, kCodes) / col("nrm"), 6).as("adc_cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= shortlist * k)
      .select("query_id", "neighbor_id")
    val wx = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    short.join(q, "query_id").as("a")
      .join(p.as("b"), col("neighbor_id") === col("b.vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        Stable.stab(dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .withColumn("rank", row_number().over(wx).cast("long"))
      .filter(col("rank") <= k)
  }

  /** The batch PQ query against a persisted index dir — reads the
    * codebook table as a DataFrame (never collected; contrast
    * knnPqIndexed, which collects it to build LUTs driver-side).
    */
  def knnPqBatch(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                 embeddings: DataFrame, queries: DataFrame,
                 m: Int = 8, kCodes: Int = 16,
                 k: Int = 5, shortlist: Int = 10): DataFrame =
    knnPqBatchFromCodes(embeddings, queries, pqCodesTable(spark, indexDir),
      spark.read.parquet(s"$indexDir/codebooks"), m, kCodes, k, shortlist)

  /** IVF probe-1 ANN: route each query (vec_id < nQueries) to its best
    * centroid by dot product, then brute-force cosine top-k inside that
    * cell only.
    */
  def ivfTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val p = prepared(embeddings)
    val q = p.filter(col("vec_id") < nQueries)
    val cent = ivfCentroids(embeddings)
    // query × centroid-element dot products
    val qd = broadcast(q)
      .select(col("vec_id").as("query_id"), posexplode(col("e")).as(Seq("pos", "qe")))
      .join(broadcast(cent), (col("pos") + 1) === col("i"))
      .groupBy("query_id", "label")
      .agg(Stable.stab(sum(col("qe") * col("c")), 6).as("qdot"))
    val best = qd.withColumn("rn",
        row_number().over(Window.partitionBy("query_id").orderBy(desc("qdot"), asc("label"))))
      .filter(col("rn") === 1).select("query_id", "label")
    val cell = embeddings.select(col("vec_id"), col("label"))
      .join(p, "vec_id")
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(q.join(embeddings.select("vec_id", "label"), "vec_id")
        .join(best.withColumnRenamed("label", "probe_label"), col("vec_id") === col("query_id")))
      .as("a")
      .join(cell.as("b"),
        col("b.label") === col("probe_label") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("query_id"), col("probe_label"), col("b.vec_id").as("neighbor_id"),
        cosine().as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
