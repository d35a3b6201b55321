package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw-markup text extraction — the FIRST stage of a real training-data
  * pipeline. A crawled corpus starts at HTML, not clean text: before any
  * dedup/quality/tokenize stage runs, boilerplate (navigation, headers,
  * footers, link farms) must be stripped and the content blocks kept — the
  * jusText / C4 recipe: segment the page into blocks at block-level tags,
  * score each block by its visible-text length and LINK DENSITY (share of
  * visible chars that sit inside anchors), keep the low-link-density
  * content paragraphs, and join them back into a document.
  *
  * Engine shape: the whole stage is a ROW-LOCAL projection — one
  * `regexp_replace` plants a  sentinel before every block-level tag,
  * `split` turns the page into a block array, and higher-order `filter` /
  * `transform` + `array_join` rebuild the document — native Catalyst
  * expressions end to end, zero exchanges, zero UDFs. At 100 TB this is the
  * ideal operator class: embarrassingly parallel, scan-bound, no state.
  * (A lookahead split would be simpler but RE2 — DuckDB's engine — has no
  * lookahead; the sentinel trick keeps BOTH engines on one pattern.)
  *
  * Determinism/gate shape: the driver's documents are already clean text,
  * so the fixture WRAPS each doc in a deterministic HTML page keyed on md5
  * slices of doc_id (the Pii.planted trick), and both engines re-derive the
  * identical page (`wrapped` / `wrappedSql`). The wrapper plants every
  * hazard the extractor must survive: a nav link farm, header/footer
  * boilerplate, a link-heavy promo paragraph (tag <p> — only the DENSITY
  * rule can drop it), an inline anchor INSIDE content (must be kept and
  * tag-stripped), entity-escaped text (must unescape), an UNCLOSED-tag
  * malformed population, and an empty-content population. The keep rule is
  * integer-only (3·link_chars ≤ text_chars — density ≤ 1/3) so the gate
  * has no float surface.
  *
  * Slice layout (h = md5('ext:'||doc_id), hex positions 1-based):
  * 1-2 nav links 2+(%4) · 3-4 promo present (<4 of 10) · 5-6 promo number
  * (%100) · 7-8 para1 words k=5+(%10) · 9-10 inline anchor in para1
  * (<3 of 10) · 11-12 para2 italic (<5 of 10) · 13-14 entity edges
  * (named =7, numeric =3) ·
  * 15-16 malformed unclosed tags (=9) · 17-18 empty content (=8) ·
  * 19-20 inline script after the header (<2 of 10) and inline style
  * before the footer (=5) — code/CSS payloads that must drop whole.
  */
object TextExtract {

  /** Block-level tags that OPEN a new block in the walk. Inline tags
    * (<a>, <b>, <i>) deliberately absent — they stay inside their block.
    * script/style are block OPENERS so their PAYLOAD lands in a
    * non-content block and drops whole (round 17 — code and CSS must
    * never leak into training text; the keep rule only admits <p>).
    */
  val BlockTags = "p|nav|header|footer|h1|title|script|style"

  /** Identical Java-regex / RE2 semantics: literal alternation + \b. */
  val BlockRe: String = s"<($BlockTags)\\b"
  val TagRe: String = "^<([a-z0-9]+)"
  val StripRe: String = "<[^>]*>"
  val LinkRe: String = "<a[^>]*>([^<]*)</a>"

  /** Keep rule constants: visible chars ≥ MinChars, link density ≤ 1/Den. */
  val MinChars = 2
  val Den = 3

  private val Sent = "\u0001"

  private def slice(h: Column, pos: Int, len: Int): Column =
    conv(substring(h, pos, len), 16, 10).cast("long")

  // ---- planted fixture: the deterministic HTML wrapper ------------------

  /** Wrap (doc_id, text) rows into (doc_id, html) pages per the slice
    * layout above. Pure concat/when projection — row-local.
    */
  def wrapped(docs: DataFrame): DataFrame = {
    val h = md5(concat(lit("ext:"), col("doc_id").cast("string")))
    val nl = lit(2) + slice(h, 1, 2) % 4
    def navLink(k: Int) = s"""<a href="/p$k">go $k</a>"""
    val navLinks = concat(
      lit(navLink(0) + " " + navLink(1)),
      when(nl > 2, lit(" " + navLink(2))).otherwise(lit("")),
      when(nl > 3, lit(" " + navLink(3))).otherwise(lit("")),
      when(nl > 4, lit(" " + navLink(4))).otherwise(lit("")))
    val malformed = slice(h, 15, 2) % 10 === 9
    val nav = concat(lit("<nav>"), navLinks,
      when(malformed, lit("")).otherwise(lit("</nav>")))
    val header = concat(lit("<header><h1>page "),
      (col("doc_id") % 1000).cast("string"), lit("</h1></header>"))
    val promo = when(slice(h, 3, 2) % 10 < 4, concat(
      lit("""<p class="promo"><a href="/buy">buy now</a> <a href="/win">win """),
      (slice(h, 5, 2) % 100).cast("string"), lit("</a></p>"))).otherwise(lit(""))
    val words = split(col("text"), " ")
    val k = (lit(5) + slice(h, 7, 2) % 10).cast("int")
    val para1 = array_join(org.apache.spark.sql.functions.slice(
      words, lit(1), k), " ")
    val para2 = array_join(org.apache.spark.sql.functions.slice(
      words, k + 1, lit(1000000)), " ")
    val inline = slice(h, 9, 2) % 10 < 3
    val rest1 = array_join(org.apache.spark.sql.functions.slice(
      words, lit(2), k - 1), " ")
    val para1Html = when(inline, concat(lit("""<a href="/w">"""),
      element_at(words, 1), lit("</a> "), rest1)).otherwise(para1)
    val italic = slice(h, 11, 2) % 10 < 5
    val entity = slice(h, 13, 2) % 10 === 7
    val entityNum = slice(h, 13, 2) % 10 === 3
    val para2Html = concat(
      when(italic, concat(lit("<i>"), para2, lit("</i>"))).otherwise(para2),
      when(entity, lit(" x &lt; y &amp; z")).otherwise(lit("")),
      when(entityNum, lit(" q &#60; r &#38; s &quot;t&#39;")).otherwise(lit("")))
    val emptyC = slice(h, 17, 2) % 10 === 8
    val content = when(emptyC, lit("<p></p>")).otherwise(concat(
      lit("<p>"), para1Html, lit("</p><p>"), para2Html, lit("</p>")))
    val script = when(slice(h, 19, 2) % 10 < 2, concat(
      lit("""<script>var t = """), (col("doc_id") % 97).cast("string"),
      lit("; track(t);</script>"))).otherwise(lit(""))
    val style = when(slice(h, 19, 2) % 10 === 5,
      lit("""<style>.promo div span { color: red; }</style>""")).otherwise(lit(""))
    val footer = when(malformed,
      lit("""<footer>copyright <a href="/about">about"""))
      .otherwise(concat(lit("<footer>copyright site "),
        (col("doc_id") % 50).cast("string"),
        lit(""" <a href="/about">about</a> <a href="/terms">terms</a></footer></body></html>""")))
    val html = concat(
      lit("<html><head><title>site "), (col("doc_id") % 50).cast("string"),
      lit("</title></head><body>"), nav, header, script, promo, content,
      style, footer)
    docs.select(col("doc_id"), html.as("html"))
  }

  /** DuckDB twin of `wrapped` as a CTE body over `src` — same slice
    * layout, hex promoted via the repo's CONCAT('0x',...) BIGINT cast.
    * One line per segment; no line starts in `||` (stripMargin safety).
    */
  def wrappedSql(src: String): String = {
    def sl(pos: Int, len: Int) =
      s"CAST(CONCAT('0x', substr(md5('ext:' || CAST(doc_id AS VARCHAR)), $pos, $len)) AS BIGINT)"
    def navLink(k: Int) = s"""<a href="/p$k">go $k</a>"""
    val navLinks = s"'${navLink(0)} ${navLink(1)}' ||" +
      s" CASE WHEN 2 + ${sl(1, 2)} % 4 > 2 THEN ' ${navLink(2)}' ELSE '' END ||" +
      s" CASE WHEN 2 + ${sl(1, 2)} % 4 > 3 THEN ' ${navLink(3)}' ELSE '' END ||" +
      s" CASE WHEN 2 + ${sl(1, 2)} % 4 > 4 THEN ' ${navLink(4)}' ELSE '' END"
    val malformed = s"${sl(15, 2)} % 10 = 9"
    val nav = s"'<nav>' || $navLinks || CASE WHEN $malformed THEN '' ELSE '</nav>' END"
    val header = s"'<header><h1>page ' || CAST(doc_id % 1000 AS VARCHAR) || '</h1></header>'"
    val promo = s"CASE WHEN ${sl(3, 2)} % 10 < 4 THEN" +
      s" '<p class=\"promo\"><a href=\"/buy\">buy now</a> <a href=\"/win\">win ' ||" +
      s" CAST(${sl(5, 2)} % 100 AS VARCHAR) || '</a></p>' ELSE '' END"
    val words = "string_split(text, ' ')"
    val k = s"CAST(5 + ${sl(7, 2)} % 10 AS INT)"
    val para1 = s"array_to_string(list_slice($words, 1, $k), ' ')"
    val para2 = s"coalesce(array_to_string(list_slice($words, $k + 1, 1000000), ' '), '')"
    // NB list_slice takes an END INDEX where Spark's slice takes a LENGTH:
    // Spark slice(words, 2, k-1) = elements 2..k  ->  list_slice(words, 2, k)
    val rest1 = s"coalesce(array_to_string(list_slice($words, 2, $k), ' '), '')"
    val para1Html = s"CASE WHEN ${sl(9, 2)} % 10 < 3 THEN" +
      s" '<a href=\"/w\">' || $words[1] || '</a> ' || $rest1 ELSE $para1 END"
    val para2Html = s"(CASE WHEN ${sl(11, 2)} % 10 < 5 THEN '<i>' || $para2 || '</i>' ELSE $para2 END)" +
      s" || (CASE WHEN ${sl(13, 2)} % 10 = 7 THEN ' x &lt; y &amp; z' ELSE '' END)" +
      s" || (CASE WHEN ${sl(13, 2)} % 10 = 3 THEN ' q &#60; r &#38; s &quot;t&#39;' ELSE '' END)"
    val content = s"CASE WHEN ${sl(17, 2)} % 10 = 8 THEN '<p></p>' ELSE" +
      s" '<p>' || $para1Html || '</p><p>' || $para2Html || '</p>' END"
    val script = s"CASE WHEN ${sl(19, 2)} % 10 < 2 THEN" +
      s" '<script>var t = ' || CAST(doc_id % 97 AS VARCHAR) || '; track(t);</script>' ELSE '' END"
    val style = s"CASE WHEN ${sl(19, 2)} % 10 = 5 THEN" +
      s" '<style>.promo div span { color: red; }</style>' ELSE '' END"
    val footer = s"CASE WHEN $malformed THEN '<footer>copyright <a href=\"/about\">about' ELSE" +
      s" '<footer>copyright site ' || CAST(doc_id % 50 AS VARCHAR) ||" +
      s" ' <a href=\"/about\">about</a> <a href=\"/terms\">terms</a></footer></body></html>' END"
    s"SELECT doc_id, '<html><head><title>site ' || CAST(doc_id % 50 AS VARCHAR) ||" +
      s" '</title></head><body>' || $nav || $header || $script || $promo || $content ||" +
      s" $style || $footer AS html FROM $src"
  }

  // ---- the extractor (Spark side) ---------------------------------------

  /** Entity table, applied in this fixed order (ampersand-producing
    * entities LAST so their output can't be re-interpreted) — the order
    * is part of the contract, mirrored in SQL. Named core + the numeric
    * forms of the same characters (round 17).
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&#60;" -> "<", "&#62;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"", "&#39;" -> "'",
    "&amp;" -> "&", "&#38;" -> "&")

  private def unescape(c: Column): Column =
    Entities.foldLeft(c) { case (x, (e, v)) => replace(x, lit(e), lit(v)) }

  private def blocksArr(html: Column): Column =
    split(regexp_replace(html, BlockRe, Sent + "<$1"), Sent)

  private def tagOf(b: Column): Column = regexp_extract(b, TagRe, 1)

  /** Visible text of a block: tags stripped, entities unescaped, trimmed. */
  def txtOf(b: Column): Column =
    trim(unescape(regexp_replace(b, StripRe, "")))

  /** Chars inside anchors (link density numerator). */
  def linkTxt(b: Column): Column =
    coalesce(array_join(regexp_extract_all(b, lit(LinkRe), lit(1)), ""), lit(""))

  /** jusText/C4-flavored keep rule: a content-tag block with enough
    * visible text and ≤ 1/3 of it inside anchors. Integer-only.
    */
  def keepBlock(b: Column): Column =
    tagOf(b) === "p" && length(txtOf(b)) >= MinChars &&
      lit(Den) * length(linkTxt(b)) <= length(txtOf(b))

  /** (doc_id, text): the extracted document — kept blocks' visible text
    * joined with \n. One row-local projection.
    */
  def extract(pages: DataFrame): DataFrame = {
    val kept = org.apache.spark.sql.functions.filter(
      blocksArr(col("html")), b => keepBlock(b))
    pages.select(col("doc_id"),
      array_join(transform(kept, b => txtOf(b)), "\n").as("text"))
  }

  /** Per-block audit view: (doc_id, pos 1-based, tag, n_chars,
    * n_link_chars, kept) — what a curation engineer eyeballs when tuning
    * the keep rule. posexplode is a row-local generate, still no shuffle.
    */
  def blocks(pages: DataFrame): DataFrame =
    pages.select(col("doc_id"),
      posexplode(blocksArr(col("html"))).as(Seq("pos0", "blk")))
      .select(col("doc_id"),
        (col("pos0") + 1).cast("long").as("pos"),
        tagOf(col("blk")).as("tag"),
        length(txtOf(col("blk"))).cast("long").as("n_chars"),
        length(linkTxt(col("blk"))).cast("long").as("n_link_chars"),
        keepBlock(col("blk")).as("kept"))

  /** Corpus extraction card: docs, blocks, kept blocks, html-in vs
    * text-out chars, empty-extraction docs. Per-doc numbers are computed
    * row-locally; the ONLY exchange is the final single-row aggregate.
    */
  def stats(pages: DataFrame): DataFrame = {
    val arr = blocksArr(col("html"))
    val kept = org.apache.spark.sql.functions.filter(arr, b => keepBlock(b))
    val extracted = array_join(transform(kept, b => txtOf(b)), "\n")
    pages.select(
      size(arr).cast("long").as("nb"),
      size(kept).cast("long").as("nk"),
      length(col("html")).cast("long").as("ci"),
      length(extracted).cast("long").as("co"),
      when(extracted === "", 1L).otherwise(0L).as("emp"))
      .agg(count(lit(1)).as("n_docs"), sum("nb").as("n_blocks"),
        sum("nk").as("n_kept"), sum("ci").as("chars_html"),
        sum("co").as("chars_out"), sum("emp").as("docs_empty"))
  }

  // ---- the extractor (DuckDB twins) --------------------------------------

  /** DuckDB block array over a column named `html`. */
  def blocksSql: String =
    s"string_split(regexp_replace(html, '$BlockRe', chr(1) || '<\\1', 'g'), chr(1))"

  def txtSql(b: String): String = {
    val un = Entities.foldLeft(s"regexp_replace($b, '$StripRe', '', 'g')") {
      case (x, (e, v)) => s"replace($x, '$e', '${v.replace("'", "''")}')"
    }
    s"trim($un)"
  }

  def linkSql(b: String): String =
    s"length(coalesce(array_to_string(regexp_extract_all($b, '$LinkRe', 1), ''), ''))"

  def keepSql(b: String): String =
    s"regexp_extract($b, '$TagRe', 1) = 'p' AND length(${txtSql(b)}) >= $MinChars" +
      s" AND $Den * ${linkSql(b)} <= length(${txtSql(b)})"

  /** DuckDB extracted-text expression over a column named `html`. */
  def extractSql: String =
    s"coalesce(array_to_string(list_transform(list_filter($blocksSql," +
      s" b -> ${keepSql("b")}), b -> ${txtSql("b")}), chr(10)), '')"
}
