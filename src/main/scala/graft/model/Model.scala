package graft.model

/** Typed row models for the engine's module boundaries (SURVEY.md §1.4:
  * "typed columns end-to-end; Dataset[T] where type safety helps").
  * DataFrames stay the internal currency (Catalyst optimizes untyped
  * column expressions best); these encoders type the *edges* — what a
  * library consumer binds to.
  */
case class Document(doc_id: Long, text: String, lang: String,
                    source: String, n_chars: Long)

case class VocabEntry(word: String, df: Long, word_id: Long)

case class Posting(doc_id: Long, word_id: Long, tf: Long)

case class SearchHit(doc_id: Long, score: Double, source: String, lang: String)

case class CorpusDoc(id: Long, url: String, title: String, text: String)
