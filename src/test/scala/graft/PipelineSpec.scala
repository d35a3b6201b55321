package graft

import graft.operators.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline drill: the full ingest → training-set flow
  * composed from the library's own operators, with the conservation
  * invariants a production run depends on asserted at every stage —
  * novelty gate → quality clean → near-dup canonical selection →
  * temperature mix → split assignment → sequence packing. Each operator
  * is oracle- or spec-gated on its own; this drill gates the
  * COMPOSITION: stages only ever narrow the doc set, partitions stay
  * exhaustive and disjoint, and the whole chain is deterministic
  * end to end (the same training set on any run, any cluster — the
  * property that makes a 100 TB rebuild reproducible).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def pipeline(): (Set[Long], Set[Long], Set[Long], Map[String, Long], Long) = {
    val corpus = graft.sources.Tables.documents(spark, TestSpark.sf0001)

    // 1. Ingest: a re-crawl batch of 100 mirrors (old bytes, new ids)
    //    and 50 genuinely new docs (salted text). Only the new survive.
    val mirrors = corpus.filter(col("doc_id") % 5 === 0).limit(100)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val fresh = corpus.filter(col("doc_id") % 10 === 3).limit(50)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" zq"), col("doc_id").cast("string")).as("text"))
    val novel = Dedup.bloomNovelDocs(mirrors.unionByName(fresh), corpus)
    val novelIds = ids(novel)
    assert(novelIds == ids(fresh), "novelty gate must pass exactly the fresh docs")

    // working set: corpus + accepted batch (metadata carried over)
    val accepted = fresh.join(novel.select("doc_id"), "doc_id")
      .join(corpus.select((col("doc_id") + 20000).as("doc_id"),
        col("lang"), col("source"), col("n_chars")), "doc_id")
    val working = corpus.unionByName(accepted).localCheckpoint()

    // 2. Quality clean: strictly narrowing
    val clean = TextAnalysis.cleanCorpus(working)
    val cleanIds = ids(clean)
    assert(cleanIds.subsetOf(ids(working)))

    // 3. Near-dup canonical selection over the cleaned set: one survivor
    //    per cluster, non-clustered docs untouched
    val cleanDocs = working.join(clean.select("doc_id"), "doc_id")
    val cl = Dedup.clusters(Dedup.minhashLshPairs(cleanDocs, 3, 6, 2, 0.6))
    val clustered = ids(cl)
    val drop = ids(cl.filter(col("doc_id") =!= col("keep_id")))
    val kept = cleanDocs.join(cl.filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id"), Seq("doc_id"), "left_anti").localCheckpoint()
    val keptIds = ids(kept)
    assert(keptIds == cleanIds -- drop)
    assert((clustered -- drop).subsetOf(keptIds), "each cluster keeps its representative")

    // 4. Temperature mix to 150 docs
    val mixed = Curation.mixByTemperature(kept, 0.7, 150)
    val mixedIds = ids(mixed)
    assert(mixedIds.subsetOf(keptIds))
    assert(mixedIds.size <= 150)

    // 5. Split assignment: exhaustive + disjoint over the mixed set
    val mixedDocs = kept.join(mixed.select("doc_id"), "doc_id")
    val splits = Curation.assignSplits(mixedDocs,
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val bySplit = splits.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == mixedIds.size, "splits must partition the mix")

    // 6. Pack the train split into token-budget sequences: chunks
    //    partition the split, budget respected
    val train = mixedDocs.join(
      splits.filter(col("split") === "train").select("doc_id"), "doc_id")
    val packed = Curation.packSequences(train, 200L)
    val packedDocs = packed.agg(sum("n_docs")).head().getLong(0)
    assert(packedDocs == bySplit.getOrElse("train", 0L),
      "packing must place every train doc exactly once")

    // 7. Shard the packed stream (4 sequences per shard): shards
    //    partition the sequences, every doc lands in exactly one shard,
    //    and the manifest's content sums reconcile with the pack
    val counts = graft.operators.TextAnalysis.tokenCounts(train)
      .select(col("doc_id"), col("alnum_tokens").as("n_tok"))
    val asg = Curation.shardAssignmentsFrom(counts, 200L, 4L)
    assert(asg.count() == packedDocs, "sharding must keep every packed doc")
    assert(asg.filter(col("shard_id") =!= expr("seq_id div 4")).count() == 0)
    val manifest = Curation.shardManifestFrom(counts, 200L, 4L).collect()
    assert(manifest.map(_.getLong(2)).sum == packedDocs,
      "manifest docs must sum to the packed docs")
    assert(manifest.map(_.getLong(1)).sum ==
      packed.count(), "manifest sequences must sum to the pack's chunks")
    assert(manifest.forall(_.getLong(4) == 800L), "loader budget column fixed")

    (novelIds, cleanIds, mixedIds, bySplit, packedDocs)
  }

  test("crawl head: WARC blobs -> framing parse -> canonical-URL dedup -> " +
    "extract -> clean composes and is deterministic") {
    import graft.operators.TextExtract
    import graft.sources.Warc
    val corpus = graft.sources.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
    def head(): (Set[Long], Set[Long]) = {
      val pages = TextExtract.wrapped(corpus)
      val parsed = Warc.parse(Warc.records(pages))
      assert(parsed.filter(!col("ok")).count() == 0,
        "every planted record must frame-parse ok")
      val winners = Warc.dedupLatest(parsed)
      val wIds = ids(winners)
      assert(wIds.subsetOf(ids(corpus)), "winners are fetches of real pages")
      assert(wIds.size < 500, "re-fetch groups must actually dedup")
      val ex = TextExtract.extract(pages.join(winners.select("doc_id"), "doc_id"))
      assert(ex.count() == wIds.size, "extraction is total over winners")
      val clean = TextAnalysis.cleanCorpus(ex)
      val cIds = ids(clean)
      assert(cIds.subsetOf(wIds), "the gate only narrows")
      assert(cIds.nonEmpty)
      (wIds, cIds)
    }
    assert(head() == head(), "the crawl head must be run-to-run deterministic")
  }

  test("ingest -> clean -> dedup -> mix -> split -> pack: invariants hold and the chain is deterministic") {
    val a = pipeline()
    val b = pipeline()
    assert(a == b, "the end-to-end chain must be run-to-run deterministic")
    val (novelIds, cleanIds, mixedIds, bySplit, _) = a
    assert(novelIds.size == 50)
    assert(cleanIds.nonEmpty && mixedIds.nonEmpty && bySplit.nonEmpty)
  }
}
