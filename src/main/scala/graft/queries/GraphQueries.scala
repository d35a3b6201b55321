package graft.queries

import graft.GraftQuery
import graft.operators.Graph
import graft.sources.Tables

/** Graph analytics over a deterministic synthetic link graph — iterative
  * computation under the same value-identical DuckDB gate as everything
  * else (the oracle unrolls the rounds as CTEs with the same stab/decimal
  * arithmetic, so 5 rounds of PageRank hash-match bit for bit).
  */
object GraphQueries {

  /** DuckDB twin of Graph.syntheticEdges(outDeg = 3) + per-src degrees. */
  val edgeCtes: String =
    """nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |e0 AS (
      |  SELECT d.doc_id AS src,
      |    CAST(CONCAT('0x', substr(md5('e:' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 12)) AS BIGINT)
      |      % (SELECT count(*) FROM documents) AS dst
      |  FROM documents d, range(0, 3) t(j)),
      |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src),
      |e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src))""".stripMargin

  /** One unrolled PageRank round: stab(12) per-edge contributions summed
    * as exact DECIMAL, stab(12) on the damped update — mirroring
    * Graph.pageRank's arithmetic operation for operation.
    */
  private def roundCte(k: Int): String =
    s"""r$k AS (
       |  SELECT d.doc_id,
       |    floor((0.15/(SELECT n FROM nn) + 0.85 * COALESCE(c.s, 0.0))*1000000000000.0+0.5)/1000000000000.0 AS pr
       |  FROM documents d LEFT JOIN (
       |    SELECT e.dst AS doc_id,
       |      CAST(sum(CAST(floor(r.pr/e.deg*1000000000000.0+0.5)/1000000000000.0 AS DECIMAL(28,12))) AS DOUBLE) AS s
       |    FROM e JOIN r${k - 1} r ON r.doc_id = e.src GROUP BY e.dst) c
       |  ON c.doc_id = d.doc_id)""".stripMargin

  def pageRankOracle(iters: Int): String =
    s"""WITH $edgeCtes,
       |r0 AS (SELECT doc_id, 1.0/(SELECT n FROM nn) AS pr FROM documents),
       |${(1 to iters).map(roundCte).mkString(",\n")}
       |SELECT doc_id, pr FROM r$iters ORDER BY pr DESC, doc_id LIMIT 20""".stripMargin

  def all: Seq[GraftQuery] = Seq(

    // 5-round PageRank, top-20: the iterative-analytics shape — per
    // round one src equi-join + one dst hash aggregate, linear in
    // edges, no collect — under a full hash gate (see Graph.pageRank on
    // why the rounds are bit-stable cross-engine).
    GraftQuery("graph_pagerank",
      (s, d) => {
        import org.apache.spark.sql.functions._
        // tight: a single-split docs scan pinned to SinglePartition lets
        // the whole 5-round unrolled plan run exchange-free (measured 21
        // AQE stage jobs for 0.4 s of summed task time before); the
        // guard keeps the shuffled rounds at scale (see Spread.tight)
        val docs = graft.operators.Spread.tight(Tables.documents(s, d))
        Graph.pageRank(docs, Graph.syntheticEdges(docs), 5)
          .orderBy(desc("pr"), asc("doc_id")).limit(20)
      },
      Some(pageRankOracle(5))),

    // Connected components over block-local edges (components bounded by
    // the block size — see Graph.blockEdges on why the recursive-CTE
    // oracle needs that): the same label-propagation operator the dedup
    // clusters ride (Dedup.clusters — iterate-to-convergence min-label,
    // localCheckpoint per round), against the same recursive label
    // closure the dedup oracle uses.
    GraftQuery("graph_components",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val e = Graph.blockEdges(Tables.documents(s, d))
        val pairs = e.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("doc_a"),
            greatest(col("src"), col("dst")).as("doc_b")).distinct()
        graft.operators.Dedup.clusters(pairs)
          .select(col("doc_id"), col("keep_id").as("component"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH RECURSIVE eb AS (
           |  SELECT d.doc_id AS src,
           |    d.doc_id - d.doc_id % 10 +
           |      CAST(CONCAT('0x', substr(md5('b:' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 12)) AS BIGINT) % 10 AS dst
           |  FROM documents d, range(0, 2) t(j)),
           |p AS (
           |  SELECT DISTINCT least(src, dst) AS doc_a, greatest(src, dst) AS doc_b
           |  FROM eb WHERE src <> dst),
           |${DedupQueries.ccCtes}
           |SELECT node AS doc_id, min(label) AS component
           |FROM lbl GROUP BY node ORDER BY doc_id""".stripMargin)),

    // Synchronous label-propagation communities over the block-local
    // graph — 6 deterministic rounds (modal neighbor label, ties to the
    // smallest; see Graph.labelPropagation on how the published
    // random-tie/async algorithm is made hash-gatable). The oracle
    // unrolls the rounds; each round's modal pick is the same
    // (count DESC, label ASC) rule as the Spark min(struct) aggregate.
    GraftQuery("graph_labelprop",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Graph.labelPropagation(docs, Graph.blockEdges(docs), 6)
          .orderBy("doc_id")
      },
      Some {
        val rounds = (1 to 6).map { r =>
          s"""c$r AS (
             |  SELECT nb.v, l.lab, count(*) AS c
             |  FROM nb JOIN l${r - 1} l ON l.v = nb.u GROUP BY nb.v, l.lab),
             |k$r AS (
             |  SELECT v, lab FROM (
             |    SELECT v, lab, row_number() OVER (PARTITION BY v ORDER BY c DESC, lab ASC) AS rn
             |    FROM c$r) WHERE rn = 1),
             |l$r AS MATERIALIZED (
             |  SELECT l.v, COALESCE(k.lab, l.lab) AS lab
             |  FROM l${r - 1} l LEFT JOIN k$r k ON k.v = l.v)""".stripMargin
        }.mkString(",\n")
        s"""WITH eb AS (
           |  SELECT d.doc_id AS src,
           |    d.doc_id - d.doc_id % 10 +
           |      CAST(CONCAT('0x', substr(md5('b:' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 12)) AS BIGINT) % 10 AS dst
           |  FROM documents d, range(0, 2) t(j)),
           |p AS (
           |  SELECT DISTINCT least(src, dst) AS doc_a, greatest(src, dst) AS doc_b
           |  FROM eb WHERE src <> dst),
           |nb AS (SELECT doc_a AS v, doc_b AS u FROM p
           |       UNION ALL SELECT doc_b AS v, doc_a AS u FROM p),
           |l0 AS (SELECT doc_id AS v, doc_id AS lab FROM documents),
           |$rounds
           |SELECT v AS doc_id, lab AS label FROM l6 ORDER BY doc_id""".stripMargin
      }),

    // Exact triangle count (ordered-wedge join, integer arithmetic — no
    // numeric stabilization anywhere in the gate).
    GraftQuery("graph_triangles",
      (s, d) => Graph.triangleCount(Graph.syntheticEdges(Tables.documents(s, d))),
      Some(
        s"""WITH $edgeCtes,
           |und AS (
           |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |  FROM e0 WHERE src <> dst),
           |w AS (
           |  SELECT x.a, x.b, y.b AS c
           |  FROM und x JOIN und y ON y.a = x.b)
           |SELECT count(*) AS n_triangles
           |FROM w JOIN und z ON z.a = w.a AND z.b = w.c""".stripMargin)),

    // Link prediction — top-20 non-edges by common-successor Jaccard.
    // Candidates come from the shared-neighbor equi-join (Σ indeg²
    // bounded, the structural analogue of LSH banding); existing edges
    // anti-joined away; small-integer division is engine-exact.
    GraftQuery("graph_linkpred",
      (s, d) => Graph.linkPrediction(
        Graph.syntheticEdges(Tables.documents(s, d)), 20),
      Some(
        s"""WITH $edgeCtes,
           |ed AS (SELECT DISTINCT src, dst FROM e0),
           |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
           |cand AS (
           |  SELECT a.src AS u, b.src AS v, count(*) AS common
           |  FROM ed a JOIN ed b ON a.dst = b.dst AND a.src < b.src
           |  GROUP BY a.src, b.src),
           |sc AS (
           |  SELECT c.u, c.v, CAST(c.common AS BIGINT) AS common,
           |    CAST(c.common AS DOUBLE) / (du.deg + dv.deg - c.common) AS jaccard
           |  FROM cand c JOIN dg du ON du.src = c.u JOIN dg dv ON dv.src = c.v
           |  WHERE NOT EXISTS (SELECT 1 FROM ed WHERE src = c.u AND dst = c.v)
           |    AND NOT EXISTS (SELECT 1 FROM ed WHERE src = c.v AND dst = c.u))
           |SELECT u, v, common, jaccard FROM sc
           |ORDER BY jaccard DESC, u, v LIMIT 20""".stripMargin))
  )
}
