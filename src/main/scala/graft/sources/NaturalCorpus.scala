package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The committed NATURAL-LANGUAGE dedup fixture (round 13 — SURVEY §2.9:
  * every dedup/selectivity measurement previously rode the synthetic
  * zipf corpus, whose 31-token grammar says nothing about how the
  * J≈0.8 thresholds behave on real English).
  *
  * `fixtures/natural_docs.parquet` holds 40 original English documents
  * (prose written for this fixture — no external source, no license
  * concern; generator committed as tools/make_natural_fixture.py) with
  * the duplicate structure a crawl actually shows, all planted
  * deterministically: 4 exact mirrors (J = 1.0), a light-mutation copy
  * (measured J = 0.829 — just above the 0.8 bar), boilerplate-wrapped
  * variants and a full-quote embedding (J ≈ 0.67-0.69 — correctly BELOW
  * symmetric Jaccard's bar but near-total directed containment, the
  * case the containment tier exists for), a heavy-mutation copy
  * (J = 0.52), and unrelated shorts sharing only stopwords (max
  * cross-pair J < 0.2 — the false-positive bar).
  *
  * Both engines read the IDENTICAL committed bytes: Spark through
  * [[docs]], DuckDB through [[docsCte]] — a CTE named `documents` that
  * shadows the sfDir view in any standard oracle chain it is prepended
  * to, so the natural queries reuse the shared shingle/LSH/winnow CTEs
  * verbatim.
  */
object NaturalCorpus {

  /** Committed-fixture path, resolved from the process working directory
    * (sbt and both driver mains run at the repo root) and overridable via
    * -Dgraft.fixtures.dir for checkouts rooted elsewhere — hardcoding the
    * build box's absolute root pinned every other checkout to its layout
    * (closing-review finding).
    */
  val Path: String = {
    val dir = sys.props.getOrElse("graft.fixtures.dir",
      new java.io.File("fixtures").getAbsolutePath)
    new java.io.File(dir, "natural_docs.parquet").getAbsolutePath
  }

  def docs(s: SparkSession): DataFrame = s.read.parquet(Path)

  /** Shadowing CTE: re-points `documents` at the fixture. */
  val docsCte: String =
    s"documents AS (SELECT doc_id, source, text FROM '$Path')"

  /** The CORPUS-SCALE natural fixture (round 15):
    * `fixtures/natural_corpus.parquet`, 2,500 docs built by
    * deterministic contiguous-word-window recombination of the same
    * original prose (generator committed as tools/make_natural_corpus
    * .py), with planted classes recoverable by doc_id FORMULA —
    * originals 1..1750, mirrors 1751..1950 (of 1..200), boilerplate
    * wraps 1951..2150 (of 201..400), light mutations 2151..2300 (of
    * 401..550, J ≥ 0.8), heavy mutations 2301..2400 (of 551..650,
    * J ≤ 0.5), quote embeddings 2401..2500 (of 651..750) — underneath
    * ~19k ORGANIC fragment-overlap pairs (measured max accidental
    * J = 0.416). Same shadowing discipline as the 40-doc fixture.
    */
  val CorpusPath: String = {
    val dir = sys.props.getOrElse("graft.fixtures.dir",
      new java.io.File("fixtures").getAbsolutePath)
    new java.io.File(dir, "natural_corpus.parquet").getAbsolutePath
  }

  def corpus(s: SparkSession): DataFrame = s.read.parquet(CorpusPath)

  val corpusCte: String =
    s"documents AS (SELECT doc_id, source, text FROM '$CorpusPath')"

  /** Planted ground truth by doc_id formula: (partner original, class)
    * of a derived doc, None for originals.
    */
  def plantedPartner(docId: Long): Option[(Long, String)] =
    if (docId <= 1750) None
    else if (docId <= 1950) Some((docId - 1750, "mirror"))
    else if (docId <= 2150) Some((docId - 1950 + 200, "boilerplate"))
    else if (docId <= 2300) Some((docId - 2150 + 400, "light"))
    else if (docId <= 2400) Some((docId - 2300 + 550, "heavy"))
    else Some((docId - 2400 + 650, "quote"))
}
