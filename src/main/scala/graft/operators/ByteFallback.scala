package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-fallback for fixed-model tokenizer encode — the SentencePiece
  * `byte_fallback` contract: the closed vocabulary is extended with 256
  * byte pieces `<0xNN>` (ids b0+1..b0+256 above the model's max regular
  * id), and any symbol/char the frozen model cannot represent encodes as
  * its UTF-8 bytes instead of dropping the word whole. Before this, both
  * families' fixed-model encodes silently dropped any word containing an
  * out-of-alphabet character — on a real multilingual corpus that is DATA
  * LOSS; with fallback the encode is total and decode round-trips.
  *
  * Engine shape: the expansion is a row-local native expression — UTF-8
  * bytes via hex(encode(sym)) split into pairs with regexp_extract_all,
  * each mapped to b0+1+byte — identical in Spark and DuckDB, so the gate
  * hashes the full id streams. The b0 base rides a broadcast 1-row
  * max-id table (no driver collect on the data path).
  *
  * Fixture: the driver corpus is pure ASCII, so out-of-alphabet words are
  * PLANTED from md5 slices of doc_id (`planted` / `plantedSql` — the Pii
  * discipline): ~30 % of docs get one foreign token appended, drawn from
  * a fixed set (CJK, accented Latin, and since round 18 NON-BMP letters —
  * CJK Extension B and Gothic, 4-byte UTF-8) that mixes in-alphabet ASCII
  * letters with out-of-alphabet chars, so PARTIAL fallback inside one
  * word is exercised (known symbols still merge/segment; unknown chars
  * byte-expand). Non-BMP is safe because the word DPs index positions by
  * CODEPOINT (Ulm.cpOffsets — round 18), matching SQL substr/length
  * semantics; a non-BMP char rides the fallback edge as ONE char and
  * expands to its 4 UTF-8 bytes. (The plants must be \p{L}/\p{N}: the
  * Unicode-keeping normalizer strips symbols, so an emoji — \p{So} —
  * would never reach the model.)
  */
object ByteFallback {

  /** The planted foreign tokens — incl. non-BMP letters (see scaladoc). */
  val Tokens: Seq[String] = Seq("日本", "héllo", "naïve", "中文词", "schön",
    "𠀀猫", "x𐍈y")

  private def slice(h: Column, pos: Int, len: Int): Column =
    conv(substring(h, pos, len), 16, 10).cast("long")

  /** Append a foreign token to ~30 % of docs (h = md5('byf:'||doc_id);
    * slice 1-2 presence < 3 of 10, slice 3-2 picks the token).
    */
  def planted(docs: DataFrame): DataFrame = {
    val h = md5(concat(lit("byf:"), col("doc_id").cast("string")))
    val tok = Tokens.zipWithIndex.foldLeft(lit(""): Column) {
      case (acc, (t, i)) =>
        when(slice(h, 3, 2) % Tokens.size === i, lit(" " + t)).otherwise(acc)
    }
    val block = when(slice(h, 1, 2) % 10 < 3, tok).otherwise(lit(""))
    docs.select(col("doc_id"), concat(col("text"), block).as("text"))
  }

  /** DuckDB twin of `planted` over table `src`. */
  def plantedSql(src: String): String = {
    def sl(pos: Int, len: Int) =
      s"CAST(CONCAT('0x', substr(md5('byf:' || CAST(doc_id AS VARCHAR)), $pos, $len)) AS BIGINT)"
    val tok = Tokens.zipWithIndex.map { case (t, i) =>
      s"WHEN ${sl(3, 2)} % ${Tokens.size} = $i THEN ' $t'"
    }.mkString(" ")
    s"SELECT doc_id, text || CASE WHEN ${sl(1, 2)} % 10 < 3 THEN" +
      s" (CASE $tok ELSE '' END) ELSE '' END AS text FROM $src"
  }

  /** Space-joined byte-piece ids of a piece's UTF-8 bytes: b0+1+byte per
    * byte, in byte order. `b0` is the model's max regular id (a 1-row
    * broadcast column).
    */
  def byteIds(piece: Column, b0: Column): Column =
    array_join(transform(
      regexp_extract_all(hex(encode(piece, "UTF-8")), lit("(..)"), lit(1)),
      p => (b0 + lit(1L) + conv(p, 16, 10).cast("long")).cast("string")), " ")

  /** DuckDB twin of `byteIds` over expressions `piece` / `b0`. */
  def byteIdsSql(piece: String, b0: String): String =
    s"array_to_string(list_transform(regexp_extract_all(hex(encode($piece)), '(..)', 1)," +
      s" p -> CAST($b0 + 1 + CAST(CONCAT('0x', p) AS BIGINT) AS VARCHAR)), ' ')"

  /** UTF-8 byte count of a piece (the fallback's piece count). */
  def nBytes(piece: Column): Column = length(encode(piece, "UTF-8")).cast("long")

  def nBytesSql(piece: String): String = s"octet_length(encode($piece))"

  // ---- Unicode-keeping tokenize tier --------------------------------------
  // The standard pipeline tokenizes through TextOps.normalize, which strips
  // every non-[a-z0-9] char (reference parity) — a foreign word would never
  // reach the model at all. The byte-fallback tier tokenizes through
  // normalizeUnicode instead, so out-of-alphabet WORDS survive to the
  // encode and the fallback actually has something to do.

  /** (doc_id, pos, word) tokens under the Unicode-keeping normalizer. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(graft.functions.TextOps.splitWords(
          graft.functions.TextOps.normalizeUnicode(col("text")))).as(Seq("pos", "word")))
      .filter(graft.functions.TextOps.isKeptToken(col("word")))

  /** (word, freq, sym) word types under the Unicode-keeping normalizer —
    * the Bpe.wordTypes shape (chars space-wrapped for the merge chain).
    */
  def wordTypes(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("sym", regexp_replace(col("word"), "(.)", " $1 "))

  /** Bpe/Ulm.encodeFrom against the Unicode-keeping tokenize: (doc_id,
    * ids, <outCount>) with `inCount` the wids table's per-word piece
    * count column (n_sym for BPE, n_pieces for ULM).
    */
  def encodeFrom(docs: DataFrame, wids: DataFrame,
                 inCount: String, outCount: String): DataFrame =
    tokens(docs).join(broadcast(wids), "word")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("ids")))),
          x => x("ids")), " ").as("ids"),
        sum(col(inCount)).as(outCount))

  /** The byte-piece half of the extended decode vocabulary:
    * (piece `<0xNN>`, id b0+1+n) — for decode round-trips and vocab dumps.
    */
  def bytePieces(spark: org.apache.spark.sql.SparkSession, b0: Long): DataFrame = {
    import spark.implicits._
    (0 until 256).map(n => (f"<0x$n%02X>", b0 + 1 + n)).toDF("piece", "id")
  }
}
