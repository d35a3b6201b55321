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
}
