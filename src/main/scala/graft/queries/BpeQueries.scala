package graft.queries

import graft.GraftQuery
import graft.operators.Bpe
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** BPE tokenizer training/encoding under the value-identical gate: the
  * oracle unrolls the merge rounds as CTEs (the graph_pagerank template,
  * for strings — see Bpe.scala on why literal space-delimited replace is
  * engine-exact). CTEs are MATERIALIZED: each round references the
  * previous symbol table twice (pair counts + merge) and the argmax twice
  * (pattern + replacement), so inlining would re-evaluate the chain
  * exponentially; materialization keeps the oracle linear in rounds.
  */
object BpeQueries {

  val NumMerges = 8

  /** tok / w0 plus (p_k, c_k, m_k, w_k) per round — the DuckDB twin of
    * Bpe.train's round k: pair extraction (constant range + length guard
    * instead of zip_with; 256 bounds symbols-per-word, far above any
    * fixture word), exact integer pair counts, argmax by (cnt desc, pair
    * asc), literal replace.
    */
  def chainCtes(n: Int): String = {
    val head =
      """tok AS MATERIALIZED (
        |  SELECT doc_id, w AS word
        |  FROM documents, unnest(regexp_split_to_array(lower(text), '\s+')) t(w)
        |  WHERE length(w) > 0 AND NOT regexp_matches(w, '^[0-9]+$')),
        |w0 AS MATERIALIZED (
        |  SELECT word, count(*) AS freq, regexp_replace(word, '(.)', ' \1 ', 'g') AS sym
        |  FROM tok GROUP BY word)""".stripMargin
    val rounds = (1 to n).map { k =>
      s"""p$k AS (
         |  SELECT a.arr[g.i] || ' ' || a.arr[g.i+1] AS pair, w.freq
         |  FROM w${k - 1} w, LATERAL (SELECT string_split(trim(w.sym), '  ') AS arr) a, range(1, 256) g(i)
         |  WHERE g.i + 1 <= len(a.arr)),
         |c$k AS (SELECT pair, sum(freq) AS cnt FROM p$k GROUP BY pair),
         |m$k AS MATERIALIZED (SELECT pair, cnt FROM c$k ORDER BY cnt DESC, pair LIMIT 1),
         |w$k AS MATERIALIZED (SELECT word, freq,
         |  replace(sym, ' ' || replace((SELECT pair FROM m$k), ' ', '  ') || ' ',
         |    ' ' || replace((SELECT pair FROM m$k), ' ', '') || ' ') AS sym FROM w${k - 1})""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  def all: Seq[GraftQuery] = Seq(

    // The trained merge table itself — the tokenizer artifact. 8 rounds
    // of (argmax over corpus pair counts, merge) hash-matched end to end.
    GraftQuery("bpe_merges",
      (s, d) => {
        import s.implicits._
        Bpe.train(Tables.documents(s, d), NumMerges)
          .map(m => (m.step, m.pair, m.cnt))
          .toDF("step", "pair", "cnt").orderBy("step")
      },
      Some {
        val unions = (1 to NumMerges)
          .map(k => s"SELECT $k AS step, pair, CAST(cnt AS BIGINT) AS cnt FROM m$k")
          .mkString(" UNION ALL ")
        s"""WITH ${chainCtes(NumMerges)}
           |SELECT * FROM ($unions) ORDER BY step""".stripMargin
      }),

    // The batched trainer at batch=1 against the SAME unrolled-CTE
    // oracle: every round's single pick must be the classic global
    // argmax, so the scale-path trainer (one driver round-trip per
    // `batch` merges — see Bpe.trainBatched) stays pinned to classic
    // BPE semantics under the driver's gate, not just the local spec.
    GraftQuery("bpe_merges_batched",
      (s, d) => {
        import s.implicits._
        Bpe.trainBatched(Tables.documents(s, d), NumMerges, batch = 1)
          .map(m => (m.step, m.pair, m.cnt))
          .toDF("step", "pair", "cnt").orderBy("step")
      },
      Some {
        val unions = (1 to NumMerges)
          .map(k => s"SELECT $k AS step, pair, CAST(cnt AS BIGINT) AS cnt FROM m$k")
          .mkString(" UNION ALL ")
        s"""WITH ${chainCtes(NumMerges)}
           |SELECT * FROM ($unions) ORDER BY step""".stripMargin
      }),

    // Final subword vocabulary with corpus frequencies — what the trained
    // tokenizer's id table ships as.
    GraftQuery("bpe_vocab",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = Bpe.train(docs, NumMerges)
        Bpe.symbolVocab(Bpe.wordTypes(docs), merges).orderBy("symbol")
      },
      Some(
        s"""WITH ${chainCtes(NumMerges)},
           |s AS (SELECT t.s AS symbol, w.freq FROM w$NumMerges w, unnest(string_split(trim(w.sym), '  ')) t(s))
           |SELECT symbol, CAST(sum(freq) AS BIGINT) AS n_tokens
           |FROM s GROUP BY symbol ORDER BY symbol""".stripMargin)),

    // Per-document token budget under the trained tokenizer — the number
    // an LLM data pipeline actually plans against (mixing quotas, packing
    // frames, epoch sizing all consume it).
    GraftQuery("bpe_token_count",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = Bpe.train(docs, NumMerges)
        Bpe.docTokenCounts(docs, merges).orderBy("doc_id")
      },
      Some(
        s"""WITH ${chainCtes(NumMerges)},
           |nsym AS (SELECT word, len(string_split(trim(sym), '  ')) AS n_sym FROM w$NumMerges),
           |dwc AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word)
           |SELECT d.doc_id, CAST(sum(tf * n_sym) AS BIGINT) AS bpe_tokens
           |FROM dwc d JOIN nsym USING (word) GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin))
  )
}
