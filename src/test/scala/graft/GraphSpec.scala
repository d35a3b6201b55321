package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("syntheticEdges: outDeg per node, targets in range, deterministic") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val n = docs.count()
    val e = Graph.syntheticEdges(docs, 3).as[(Long, Long)].collect().toSeq
    assert(e.length == 3 * n)
    assert(e.forall { case (s, d) => s >= 0 && s < n && d >= 0 && d < n })
    assert(e.sorted == Graph.syntheticEdges(docs, 3).as[(Long, Long)].collect().toSeq.sorted)
  }

  test("triangleCount: K3/K4 exact, direction/duplicates/self-loops ignored") {
    import spark.implicits._
    def cnt(edges: Seq[(Long, Long)]): Long =
      graft.operators.Graph.triangleCount(edges.toDF("src", "dst"))
        .as[Long].head()
    assert(cnt(Seq(0L -> 1L, 1L -> 2L, 2L -> 0L)) == 1)           // K3
    assert(cnt(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 2L,
      1L -> 3L, 2L -> 3L)) == 4)                                  // K4: C(4,3)
    // reversed duplicates, parallel edges, self-loops change nothing
    assert(cnt(Seq(0L -> 1L, 1L -> 0L, 1L -> 2L, 1L -> 2L,
      2L -> 0L, 2L -> 2L)) == 1)
    assert(cnt(Seq(0L -> 1L, 1L -> 2L)) == 0)                     // open wedge
  }

  test("blockEdges + components: edges stay in-block, labels are component minima") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val e = graft.operators.Graph.blockEdges(docs).as[(Long, Long)].collect()
    assert(e.forall { case (s, d) => s / 10 == d / 10 }) // never crosses a block
    val pairs = graft.operators.Graph.blockEdges(docs)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("doc_a"),
        greatest(col("src"), col("dst")).as("doc_b")).distinct()
    val comp = graft.operators.Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    // the component id IS the minimum member (label propagation invariant),
    // and every edge joins two nodes of the same component
    val byComp = comp.groupBy(_._2)
    assert(byComp.forall { case (label, m) => m.keys.min == label })
    val prs = pairs.as[(Long, Long)].collect()
    assert(prs.forall { case (a, b) => comp(a) == comp(b) })
    assert(byComp.size > 1) // blocks split into multiple components
  }

  test("pageRank: mass conserved, uniform graph stays uniform, sink concentration ranks first") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val n = docs.count()
    val pr = Graph.pageRank(docs, Graph.syntheticEdges(docs), 5)
      .as[(Long, Double)].collect().toSeq
    assert(pr.length == n)
    assert(pr.forall(_._2 > 0))
    // probability mass conserved up to the per-round stab(12) quantization
    assert(math.abs(pr.map(_._2).sum - 1.0) < 1e-6)
    // a ring (uniform in/out degree 1) is the PageRank fixed point: every
    // node keeps exactly 1/N through every round
    val ring = spark.range(10).select(col("id").as("doc_id"))
    val ringEdges = ring.select(col("doc_id").as("src"),
      ((col("doc_id") + 1) % 10).as("dst"))
    val rpr = Graph.pageRank(ring, ringEdges, 5).as[(Long, Double)].collect()
    assert(rpr.forall(x => math.abs(x._2 - 0.1) < 1e-9))
    // a star (all nodes -> node 0) concentrates rank on the hub
    val star = spark.range(10).select(col("id").as("doc_id"))
    val starEdges = star.select(col("doc_id").as("src"), lit(0L).as("dst"))
    val spr = Graph.pageRank(star, starEdges, 5).as[(Long, Double)].collect()
      .sortBy(-_._2)
    assert(spr.head._1 == 0L)
    assert(spr.head._2 > 0.5) // the hub holds most of the mass
  }

  test("pageRank dangling mass: leaked without the option, conserved with it") {
    import spark.implicits._
    // a chain 0→1→2→3 where 3 is a SINK (no out-edges): the classic
    // formulation leaks 3's damped mass every round
    val docs = spark.range(4).select(col("id").as("doc_id"))
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L).toDF("src", "dst")
    val leaky = Graph.pageRank(docs, edges, 5).as[(Long, Double)].collect()
    assert(leaky.map(_._2).sum < 0.99) // mass visibly lost through the sink
    val kept = Graph.pageRank(docs, edges, 5, redistributeDangling = true)
      .as[(Long, Double)].collect()
    // Σ pr = 1 up to the per-round stab(12) quantization
    assert(math.abs(kept.map(_._2).sum - 1.0) < 1e-6)
    // redistribution must not change a graph with no dangling nodes: the
    // ring's fixed point is identical under both forms
    val ring = spark.range(10).select(col("id").as("doc_id"))
    val ringEdges = ring.select(col("doc_id").as("src"),
      ((col("doc_id") + 1) % 10).as("dst"))
    val a = Graph.pageRank(ring, ringEdges, 3).as[(Long, Double)].collect().sortBy(_._1)
    val b = Graph.pageRank(ring, ringEdges, 3, redistributeDangling = true)
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("labelPropagation: labels stay in-component, refine components, deterministic") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val edges = Graph.blockEdges(docs)
    val lpa = Graph.labelPropagation(docs, edges, 6)
    // block-local edges ⇒ components ⊆ blocks ⇒ every LPA label (always
    // a node id reachable through edges) stays inside the node's block
    val crossBlock = lpa.filter(expr("label DIV 10 <> doc_id DIV 10")).count()
    assert(crossBlock == 0L, "a label escaped its block — labels crossed an edge cut")
    // LPA never merges components, so it yields at least as many groups
    val pairs = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("doc_a"),
        greatest(col("src"), col("dst")).as("doc_b")).distinct()
    val nComponents = graft.operators.Dedup.clusters(pairs)
      .select("keep_id").distinct().count()
    val nCommunities = lpa.select("label").distinct().count()
    assert(nCommunities >= nComponents,
      s"$nCommunities communities < $nComponents components")
    // fixed-round synchronous LPA is run-to-run deterministic
    val again = Graph.labelPropagation(docs, edges, 6)
    assert(lpa.exceptAll(again).count() == 0L && again.exceptAll(lpa).count() == 0L)
  }
}
