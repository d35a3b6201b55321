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

  /** Production-depth merge count for the persisted deep tier: crosses
    * Bpe.ChunkMerges (64), so the multi-chunk applyMerges path (chunked
    * replace chains with a mid-chain lineage cut) runs under the hash
    * gate, not just in specs.
    */
  val DeepMerges = 80

  /** The trained tokenizer as a PERSISTED SETUP ARTIFACT (round-14
    * verdict #1): the merge ledger (step, pair, cnt) is a pure function
    * of the corpus, trained ONCE per SF dir through the same
    * fingerprint-gated cache every other shared intermediate uses, and
    * every downstream query (vocab, token counts, encode, fertility,
    * packing) READS it — the real train-once/encode-many deployment
    * shape. Before this, five queries each re-ran the trainer inline
    * (~8 s of redundant driver-round-trip loops per bench; unrunnable at
    * a 32k-merge production vocabulary).
    */
  def persistedMerges(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Persisted(s, d, "bpemodel", "documents.parquet", s"_m${NumMerges}b1") {
      import s.implicits._
      Bpe.trainBatched(Tables.documents(s, d), NumMerges, batch = 1)
        .map(m => (m.step, m.pair, m.cnt)).toDF("step", "pair", "cnt")
    }

  /** Deep tier of the same artifact: DeepMerges merges via the BATCHED
    * trainer (batch = 64 — a handful of driver round-trips, the
    * production cadence), persisted once per corpus. Feeds
    * bpe_merges_deep / bpe_encode_deep.
    */
  def persistedMergesDeep(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Persisted(s, d, "bpemodel", "documents.parquet", s"_m${DeepMerges}b64") {
      import s.implicits._
      Bpe.trainBatched(Tables.documents(s, d), DeepMerges, batch = 64)
        .map(m => (m.step, m.pair, m.cnt)).toDF("step", "pair", "cnt")
    }

  /** The ledger as the driver-side Seq the encode/apply APIs take. The
    * collect is the tokenizer MODEL — |ledger| = numMerges rows by
    * construction (each merge is one row), metadata-scale at any corpus
    * size: the same bounded-collect contract as the k-means centroid
    * table.
    */
  private def ledgerMerges(df: org.apache.spark.sql.DataFrame): Seq[Bpe.Merge] =
    df.orderBy("step").collect()
      .map(r => Bpe.Merge(r.getInt(0), r.getString(1), r.getLong(2))).toSeq

  def trainedMerges(s: org.apache.spark.sql.SparkSession, d: String): Seq[Bpe.Merge] =
    ledgerMerges(persistedMerges(s, d))

  def trainedMergesDeep(s: org.apache.spark.sql.SparkSession, d: String): Seq[Bpe.Merge] =
    ledgerMerges(persistedMergesDeep(s, d))

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

  /** DuckDB twin of Bpe.trainBatched for numMerges ≤ batch: `n` unrolled
    * rounds over the symbol table bw{r}, each with a pair recount
    * (cr{r}), a rank cutoff at 4× the remaining budget (cand{r}), a
    * greedy conflict-free walk (sel{r} — linear recursion over rank
    * order), the accepted picks (pick{r}), the cumulative merge ledger
    * (allp{r}), and the picks applied in order (apl{r} recursion →
    * bw{r}). A round whose remaining budget is zero selects nothing and
    * passes bw through unchanged, so the unroll is exact for ANY fill
    * pattern from one-per-round to all-in-round-1.
    */
  def batchedChainSql(n: Int, batch: Int = 64): String =
    s"""WITH RECURSIVE ${batchedChainCtes(n, batch)}
       |SELECT CAST(row_number() OVER (ORDER BY rnd, ord) AS INT) AS step,
       |       pair, CAST(cnt AS BIGINT) AS cnt
       |FROM allp$n ORDER BY step""".stripMargin

  /** The CTE chain of [[batchedChainSql]] without the final SELECT, for
    * oracles that consume the trained SYMBOL TABLE (bw$n) rather than the
    * ledger — the deep-encode twin. Generalized to n > batch (round 15):
    * per-round budget is want = least(batch, rem) — both the rank cutoff
    * (4·want over-fetch) and the greedy accept cap — exactly
    * Bpe.trainBatched's `math.min(batch, numMerges - done)`; and each
    * round's recount scans nothing once the budget is spent (the
    * `rem > 0` guard), so unrolling n worst-case rounds costs only the
    * rounds the trainer actually ran.
    */
  def batchedChainCtes(n: Int, batch: Int = 64): String = {
    val accept = s"s.picks < least($batch, (SELECT rem FROM remR)) AND len(list_intersect(" +
      "string_split(s.used, ' '), [string_split(c.pair, ' ')[1], " +
      "string_split(c.pair, ' ')[2], replace(c.pair, ' ', '')])) = 0"
    val rounds = (1 to n).map { r =>
      val acc = accept.replace("remR", s"rem$r")
      s"""rem$r AS (SELECT $n - (SELECT count(*) FROM allp${r - 1}) AS rem),
         |cr$r AS MATERIALIZED (
         |  SELECT pair, sum(freq) AS cnt FROM (
         |    SELECT a.arr[g.i] || ' ' || a.arr[g.i+1] AS pair, w.freq
         |    FROM bw${r - 1} w, LATERAL (SELECT string_split(trim(w.sym), '  ') AS arr) a, range(1, 256) g(i)
         |    WHERE g.i + 1 <= len(a.arr) AND (SELECT rem FROM rem$r) > 0) GROUP BY pair),
         |cand$r AS MATERIALIZED (
         |  SELECT pair, cnt, rn FROM (
         |    SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rn FROM cr$r)
         |  WHERE rn <= 4 * least($batch, (SELECT rem FROM rem$r))),
         |sel$r AS (
         |  SELECT 0 AS rn, '' AS used, 0 AS picks, false AS take
         |  UNION ALL
         |  SELECT c.rn,
         |    CASE WHEN $acc THEN s.used || ' ' || c.pair || ' ' || replace(c.pair, ' ', '') ELSE s.used END,
         |    s.picks + CASE WHEN $acc THEN 1 ELSE 0 END,
         |    $acc
         |  FROM sel$r s JOIN cand$r c ON c.rn = s.rn + 1),
         |pick$r AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY s.rn) AS ord, c.pair, c.cnt
         |  FROM sel$r s JOIN cand$r c ON c.rn = s.rn WHERE s.take),
         |allp$r AS MATERIALIZED (
         |  SELECT rnd, ord, pair, cnt FROM allp${r - 1}
         |  UNION ALL SELECT $r AS rnd, ord, pair, cnt FROM pick$r),
         |apl$r AS (
         |  SELECT word, freq, sym, 0 AS j FROM bw${r - 1}
         |  UNION ALL
         |  SELECT a.word, a.freq,
         |    replace(a.sym, ' ' || replace(p.pair, ' ', '  ') || ' ',
         |      ' ' || replace(p.pair, ' ', '') || ' ') AS sym,
         |    a.j + 1
         |  FROM apl$r a JOIN pick$r p ON p.ord = a.j + 1),
         |bw$r AS MATERIALIZED (
         |  SELECT word, freq, sym FROM apl$r WHERE j = (SELECT count(*) FROM pick$r))""".stripMargin
    }
    s"""${chainCtes(0)},
       |bw0 AS (SELECT word, freq, sym FROM w0),
       |allp0 AS (SELECT 0 AS rnd, CAST(0 AS BIGINT) AS ord, '' AS pair,
       |          CAST(0 AS HUGEINT) AS cnt WHERE 1 = 0),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  def all: Seq[GraftQuery] = Seq(

    // The trained merge table itself — the tokenizer artifact. 8 rounds
    // of (argmax over corpus pair counts, merge) hash-matched end to end.
    // Since round 15 this READS the persisted ledger (train-once), so the
    // gate covers the artifact every downstream query consumes — a stale
    // or wrongly-built cache entry hash-fails here. (The trainer itself
    // stays separately pinned by bpe_merges_batched/_batch64, which run
    // it inline.)
    GraftQuery("bpe_merges",
      (s, d) => persistedMerges(s, d).orderBy("step"),
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

    // The batched trainer at batch>1 — the PRODUCTION path's ACTUAL
    // semantics, hash-gated (new in round 11; previously only batch=1
    // carried an oracle). The oracle replays the whole multi-round
    // algorithm generically — it does NOT assume the first round fills
    // (at sf0.01 it genuinely doesn't: 7 conflict-free picks in the top
    // 32, then a recount round for the 8th). Per unrolled round r (worst
    // case numMerges rounds; a round with zero remaining budget is a
    // structural no-op): recount pairs from the current symbol table,
    // rank by (cnt desc, pair asc) cut at 4·remaining, walk the ranked
    // list as a linear RECURSIVE CTE carrying the used-symbol set as a
    // space-delimited string (greedy accept iff the pair's two symbols
    // and its merged symbol are all unused), then apply the round's
    // picks IN PICK ORDER with a second recursion over the word table.
    // So the conflict rule, the over-fetch cutoff, the under-fill
    // recount, and the cross-round budget arithmetic all sit under the
    // driver's hash gate.
    GraftQuery("bpe_merges_batch64",
      (s, d) => {
        import s.implicits._
        Bpe.trainBatched(Tables.documents(s, d), NumMerges, batch = 64)
          .map(m => (m.step, m.pair, m.cnt))
          .toDF("step", "pair", "cnt").orderBy("step")
      },
      Some(batchedChainSql(NumMerges))),

    // Final subword vocabulary with corpus frequencies — what the trained
    // tokenizer's id table ships as.
    GraftQuery("bpe_vocab",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = trainedMerges(s, d)
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
        val docs = graft.operators.Spread(Tables.documents(s, d))
        val merges = trainedMerges(s, d)
        Bpe.docTokenCounts(docs, merges).orderBy("doc_id")
      },
      Some(
        s"""WITH ${chainCtes(NumMerges)},
           |nsym AS (SELECT word, len(string_split(trim(sym), '  ')) AS n_sym FROM w$NumMerges),
           |dwc AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word)
           |SELECT d.doc_id, CAST(sum(tf * n_sym) AS BIGINT) AS bpe_tokens
           |FROM dwc d JOIN nsym USING (word) GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)),

    // ENCODE — the tokenizer loop closed: text in, model-ready subword-id
    // sequences out. Ids are dense row-numbers over the final vocabulary
    // in symbol order (binary collation, engine-exact); each doc's id
    // stream reassembles in token order. The oracle replays the merge
    // chain, mints the same id table, and string_aggs in the same
    // positions — a wrong merge, id collision, or order bug all
    // hash-fail on the full concatenated stream.
    GraftQuery("bpe_encode",
      (s, d) => {
        val docs = graft.operators.Spread(Tables.documents(s, d))
        val merges = trainedMerges(s, d)
        Bpe.encode(docs, merges).orderBy("doc_id")
      },
      Some(
        s"""WITH ${chainCtes(NumMerges)},
           |syms AS (SELECT word, string_split(trim(sym), '  ') AS syms FROM w$NumMerges),
           |vocab AS (
           |  SELECT symbol, CAST(row_number() OVER (ORDER BY symbol) AS INT) AS id
           |  FROM (SELECT DISTINCT t.s AS symbol FROM syms, unnest(syms.syms) t(s))),
           |wsym AS (
           |  SELECT s.word, t.i, s.syms[t.i] AS symbol, len(s.syms) AS n_sym
           |  FROM syms s, unnest(range(1, len(s.syms) + 1)) t(i)),
           |wids AS (
           |  SELECT w.word, string_agg(CAST(v.id AS VARCHAR), ' ' ORDER BY w.i) AS ids,
           |    CAST(max(w.n_sym) AS BIGINT) AS n_sym
           |  FROM wsym w JOIN vocab v ON v.symbol = w.symbol GROUP BY w.word),
           |tokp AS (
           |  SELECT doc_id, t.i AS pos, arr[t.i] AS word
           |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS arr FROM documents) d,
           |    unnest(range(1, len(arr) + 1)) t(i)
           |  WHERE length(arr[t.i]) > 0 AND NOT regexp_matches(arr[t.i], '^[0-9]+$$'))
           |SELECT k.doc_id, string_agg(w.ids, ' ' ORDER BY k.pos) AS ids,
           |  CAST(sum(w.n_sym) AS BIGINT) AS n_bpe_tokens
           |FROM tokp k JOIN wids w USING (word)
           |GROUP BY k.doc_id ORDER BY doc_id""".stripMargin)),

    // Tokenizer fertility by source — subword tokens per whitespace word,
    // the per-slice compression diagnostic (a fragmenting source pays
    // more budget per word; the mixing planner reads this next to
    // text_mix_tokens). Doc-count-sized joins only; ratio stab(6)'d.
    GraftQuery("bpe_fertility",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = trainedMerges(s, d)
        Bpe.sourceFertility(docs, merges).orderBy("source")
      },
      Some(
        s"""WITH ${chainCtes(NumMerges)},
           |nsym AS (SELECT word, len(string_split(trim(sym), '  ')) AS n_sym FROM w$NumMerges),
           |dwc AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
           |perdoc AS (
           |  SELECT d.doc_id, sum(tf * n_sym) AS bpe
           |  FROM dwc d JOIN nsym USING (word) GROUP BY d.doc_id),
           |wrd AS (SELECT doc_id, count(*) AS n_words FROM tok GROUP BY doc_id)
           |SELECT d.source, CAST(sum(w.n_words) AS BIGINT) AS n_words,
           |  CAST(sum(p.bpe) AS BIGINT) AS n_bpe_tokens,
           |  ${graft.functions.Stable.stabSql(
                 "CAST(sum(p.bpe) AS DOUBLE) / CAST(sum(w.n_words) AS DOUBLE)", 6)} AS fertility
           |FROM documents d JOIN wrd w USING (doc_id) JOIN perdoc p USING (doc_id)
           |GROUP BY d.source ORDER BY source""".stripMargin)),

    // Sequence packing by the TRAINED tokenizer's budget — what the data
    // loader actually consumes (text_pack's whitespace counts are a
    // planning proxy; training frames are cut in bpe tokens). Same
    // distributed 16-bucket prefix sum; counts come from the merge chain
    // both gates already pin.
    GraftQuery("bpe_pack",
      (s, d) => {
        val docs = graft.operators.Spread(Tables.documents(s, d))
        val merges = trainedMerges(s, d)
        // ONE tokenize+encode pass (round 19): the packer reads its counts
        // table on TWO branches (bucket offsets + the probe side) and the
        // exchange between them is not reused across the differing
        // projections — uncheckpointed, the expensive merge-chain count
        // ran twice (profiled 67 CPU-s vs bpe_encode's 27). The
        // mixByTokens localCheckpoint discipline halves it.
        graft.operators.Curation.packSequencesFrom(
          Bpe.docTokenCounts(docs, merges)
            .select(col("doc_id"), col("bpe_tokens").as("n_tok"))
            .localCheckpoint(), 500L)
          .orderBy("seq_id")
      },
      Some(
        s"""WITH ${chainCtes(NumMerges)},
           |nsym AS (SELECT word, len(string_split(trim(sym), '  ')) AS n_sym FROM w$NumMerges),
           |dwc AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
           |t AS (
           |  SELECT d.doc_id, CAST(sum(tf * n_sym) AS BIGINT) AS n_tok,
           |    md5(CAST(d.doc_id AS VARCHAR)) AS h
           |  FROM dwc d JOIN nsym USING (word) GROUP BY d.doc_id),
           |c AS (
           |  SELECT doc_id, n_tok,
           |    COALESCE(sum(n_tok) OVER (ORDER BY h, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
           |  FROM t)
           |SELECT CAST(start // 500 AS BIGINT) AS seq_id,
           |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
           |FROM c GROUP BY 1 ORDER BY seq_id""".stripMargin)),

    // PRODUCTION-DEPTH merge ledger (round 15): DeepMerges = 80 merges
    // trained by the batched trainer at its production batch (64) and
    // served from the persisted artifact. 80 > batch exercises the
    // multi-round budget arithmetic (round 1 wants 64, round 2 wants the
    // remainder) that every ≤64-merge gate structurally couldn't, and
    // 80 > ChunkMerges means downstream applyMerges runs its multi-chunk
    // path. The oracle unrolls 80 worst-case rounds, each a no-op once
    // the budget is spent (rem-guard in batchedChainCtes).
    GraftQuery("bpe_merges_deep",
      (s, d) => persistedMergesDeep(s, d).orderBy("step"),
      Some(batchedChainSql(DeepMerges, batch = 64))),

    // ENCODE at production depth — the registered train-once/encode-many
    // shape: the 80-merge persisted ledger applied to the corpus, ids
    // minted over the deep vocabulary. Crosses the ChunkMerges boundary,
    // so the chunked replace chain (with its mid-chain lineage cut) is
    // hash-gated end to end; the oracle replays the batched chain to the
    // final symbol table bw80 and re-derives every doc's full id stream.
    GraftQuery("bpe_encode_deep",
      (s, d) => Bpe.encode(graft.operators.Spread(Tables.documents(s, d)), trainedMergesDeep(s, d))
        .orderBy("doc_id"),
      Some(
        s"""WITH RECURSIVE ${batchedChainCtes(DeepMerges, batch = 64)},
           |syms AS (SELECT word, string_split(trim(sym), '  ') AS syms FROM bw$DeepMerges),
           |vocab AS (
           |  SELECT symbol, CAST(row_number() OVER (ORDER BY symbol) AS INT) AS id
           |  FROM (SELECT DISTINCT t.s AS symbol FROM syms, unnest(syms.syms) t(s))),
           |wsym AS (
           |  SELECT s.word, t.i, s.syms[t.i] AS symbol, len(s.syms) AS n_sym
           |  FROM syms s, unnest(range(1, len(s.syms) + 1)) t(i)),
           |wids AS (
           |  SELECT w.word, string_agg(CAST(v.id AS VARCHAR), ' ' ORDER BY w.i) AS ids,
           |    CAST(max(w.n_sym) AS BIGINT) AS n_sym
           |  FROM wsym w JOIN vocab v ON v.symbol = w.symbol GROUP BY w.word),
           |tokp AS (
           |  SELECT doc_id, t.i AS pos, arr[t.i] AS word
           |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS arr FROM documents) d,
           |    unnest(range(1, len(arr) + 1)) t(i)
           |  WHERE length(arr[t.i]) > 0 AND NOT regexp_matches(arr[t.i], '^[0-9]+$$'))
           |SELECT k.doc_id, string_agg(w.ids, ' ' ORDER BY k.pos) AS ids,
           |  CAST(sum(w.n_sym) AS BIGINT) AS n_bpe_tokens
           |FROM tokp k JOIN wids w USING (word)
           |GROUP BY k.doc_id ORDER BY doc_id""".stripMargin)),

    // ENCODE with BYTE-FALLBACK over a foreign-token corpus — the
    // deployment case the plain encode can't serve: a frozen model meets
    // out-of-alphabet text (CJK/accented words planted per doc by md5
    // slice), OOV symbols expand to UTF-8 byte-piece ids above the
    // closed vocabulary instead of dropping the word. The oracle
    // re-applies the trained merge ledger to the FOREIGN word types
    // (fw0..fw8), mints the same base-corpus id table, and byte-expands
    // with the identical hex(encode(·)) pair walk — a dropped word, a
    // wrong byte id, or an id-base drift all hash-fail.
    GraftQuery("bpe_encode_bytes",
      (s, d) => {
        val bf = graft.operators.ByteFallback
        val base = Tables.documents(s, d)
        val merges = trainedMerges(s, d)
        val docsF = bf.planted(graft.operators.Spread(base.select("doc_id", "text")))
        val symIds = Bpe.symbolIds(Bpe.wordTypes(base), merges)
        bf.encodeFrom(docsF,
          Bpe.wordIdsFromFixedBytes(bf.wordTypes(docsF), merges, symIds),
          "n_sym", "n_bpe_tokens")
          .orderBy("doc_id")
      },
      Some {
        val fApply = (1 to NumMerges).map { k =>
          s"""fw$k AS MATERIALIZED (SELECT word, freq,
             |  replace(sym, ' ' || replace((SELECT pair FROM m$k), ' ', '  ') || ' ',
             |    ' ' || replace((SELECT pair FROM m$k), ' ', '') || ' ') AS sym FROM fw${k - 1})""".stripMargin
        }.mkString(",\n")
        s"""WITH ${chainCtes(NumMerges)},
           |syms AS (SELECT word, string_split(trim(sym), '  ') AS syms FROM w$NumMerges),
           |vocab AS (
           |  SELECT symbol, CAST(row_number() OVER (ORDER BY symbol) AS INT) AS id
           |  FROM (SELECT DISTINCT t.s AS symbol FROM syms, unnest(syms.syms) t(s))),
           |b0 AS (SELECT CAST(max(id) AS BIGINT) AS b0 FROM vocab),
           |fdocs AS (${graft.operators.ByteFallback.plantedSql("documents")}),
           |ftok AS MATERIALIZED (
           |  SELECT doc_id, w AS word
           |  FROM fdocs, unnest(regexp_split_to_array(
           |    ${graft.functions.TextOps.normalizeUnicodeSql("text")}, '\\s+')) t(w)
           |  WHERE length(w) > 0 AND NOT regexp_matches(w, '^[0-9]+$$')),
           |fw0 AS MATERIALIZED (
           |  SELECT word, count(*) AS freq, regexp_replace(word, '(.)', ' \\1 ', 'g') AS sym
           |  FROM ftok GROUP BY word),
           |$fApply,
           |fsyms AS (SELECT word, string_split(trim(sym), '  ') AS syms FROM fw$NumMerges),
           |fwsym AS (
           |  SELECT s.word, t.i, s.syms[t.i] AS symbol
           |  FROM fsyms s, unnest(range(1, len(s.syms) + 1)) t(i)),
           |sid AS (
           |  SELECT w.word, w.i,
           |    coalesce(CAST(v.id AS VARCHAR),
           |      ${graft.operators.ByteFallback.byteIdsSql("w.symbol", "b.b0")}) AS ids,
           |    CASE WHEN v.id IS NULL
           |      THEN CAST(${graft.operators.ByteFallback.nBytesSql("w.symbol")} AS BIGINT)
           |      ELSE 1 END AS np
           |  FROM fwsym w CROSS JOIN b0 b LEFT JOIN vocab v ON v.symbol = w.symbol),
           |wids AS (
           |  SELECT word, string_agg(ids, ' ' ORDER BY i) AS ids,
           |    CAST(sum(np) AS BIGINT) AS n_sym
           |  FROM sid GROUP BY word),
           |ftokp AS (
           |  SELECT doc_id, t.i AS pos, arr[t.i] AS word
           |  FROM (SELECT doc_id, regexp_split_to_array(
           |    ${graft.functions.TextOps.normalizeUnicodeSql("text")}, '\\s+') AS arr FROM fdocs) d,
           |    unnest(range(1, len(arr) + 1)) t(i)
           |  WHERE length(arr[t.i]) > 0 AND NOT regexp_matches(arr[t.i], '^[0-9]+$$'))
           |SELECT k.doc_id, string_agg(w.ids, ' ' ORDER BY k.pos) AS ids,
           |  CAST(sum(w.n_sym) AS BIGINT) AS n_bpe_tokens
           |FROM ftokp k JOIN wids w USING (word)
           |GROUP BY k.doc_id ORDER BY doc_id""".stripMargin
      })
  )
}
