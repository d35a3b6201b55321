package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC-style crawl-record ingest — the stage BEFORE raw-markup
  * extraction. A real training-data pipeline does not start at an `html`
  * column: it starts at crawl archives (WARC: framed records with a
  * version line, named headers, and a Content-Length-delimited payload),
  * canonicalizes the target URLs, and deduplicates AT THE CRAWL LEVEL
  * (keep the latest fetch per canonical URL) before any content stage
  * runs. All three steps here are row-local string walks / one hash
  * aggregate — native expressions in both engines, no UDFs.
  *
  * Record framing is parsed the way a WARC reader must: the header block
  * ends at the first CRLFCRLF, `Content-Length` gives the payload size,
  * and the NEXT record starts after payload + CRLFCRLF — a delimiter
  * split cannot work because payloads may contain "WARC/1.0" (the
  * fixture PLANTS exactly that decoy in record 1's body). The walk is a
  * fixed 2-record unroll per blob (record 1 = a synthetic `metadata`
  * record with the decoy payload, record 2 = the `response` carrying the
  * wrapped HTML page), which exercises the length-based traversal while
  * staying a pure projection; `parseStream` generalizes to ARBITRARY
  * record counts per blob with a linear native fold (see its scaladoc).
  * Payload slicing is char-based in both engines with an `ok` flag
  * asserting `Content-Length == payload bytes` — the fixture pages are
  * ASCII (entities, not raw codepoints), so chars == octets; a violation
  * flips `ok` loudly instead of silently corrupting. (The FILE layer —
  * splitting one multi-GB WARC object into blob rows at record
  * boundaries — is the remaining gap; see SURVEY §2.9.)
  *
  * URL canonicalization (the crawl-dedup key): lowercase scheme + host,
  * strip the scheme's default port (:80 / :443), strip the fragment,
  * percent-normalize per RFC 3986 §6.2.2.2 (decode unreserved %XX,
  * uppercase the rest), remove dot segments per §5.2.4 (also collapsing
  * duplicate and trailing slashes; root '/' stays), and drop tracking
  * query params (utm_* prefix, fbclid/gclid) while PRESERVING the order
  * of the rest. Scheme is NOT folded across http/https — they are
  * different resources.
  *
  * Crawl-level dedup: keep the LATEST fetch per canonical URL —
  * `max(struct(wdate, doc_id))` so the aggregate is partial-aggregable
  * (map-side combine collapses each partition to one candidate per URL;
  * no window over the full fetch log). WARC-Dates are ISO-8601 strings,
  * so lexicographic max == chronological max; doc_id breaks exact-time
  * ties deterministically.
  *
  * Fixture (driver docs carry no crawl metadata, so it is planted from
  * md5 slices and re-derived identically in SQL): fetch GROUPS are
  * doc_id DIV 3 — three fetches of the same logical page, each with an
  * independent URL VARIANT (plain / uppercase scheme+host / explicit :80
  * / #fragment / ?utm_source only / trailing slash / mixed real+tracking
  * params / https:443+fragment / query-directly-after-host with no path
  * slash — the https and host-adjacent-query variants canonicalize to
  * DIFFERENT urls, deliberately). Slice layout (h = md5('warc:'||doc_id)):
  * 1-2 month · 3-4 day · 5-6 hour · 7-8 minute · 9-10 second ·
  * 13-14 variant (%9).
  */
object Warc {

  val TrackingPrefix = "utm_"
  val TrackingExact: Seq[String] = Seq("fbclid", "gclid")

  private val CrLf = "\r\n"
  private val HdrEnd = "\r\n\r\n"

  private def slice(h: Column, pos: Int, len: Int): Column =
    conv(substring(h, pos, len), 16, 10).cast("long")

  private def pad2(c: Column): Column = lpad(c.cast("string"), 2, "0")

  // ---- planted fixture: deterministic WARC blobs -------------------------

  private def hOf: Column = md5(concat(lit("warc:"), col("doc_id").cast("string")))

  private def gid: Column = expr("doc_id DIV 3")

  private def site: Column = (gid % 50).cast("string")

  private def hostOf: Column = concat(lit("www.site"), site, lit(".example"))

  /** ISO-8601 WARC-Date — built by integer arithmetic (no calendar /
    * timezone surface; lexicographic order == chronological order).
    */
  def dateOf(h: Column): Column = concat(
    lit("2014-"), pad2(lit(1) + slice(h, 1, 2) % 12),
    lit("-"), pad2(lit(1) + slice(h, 3, 2) % 28),
    lit("T"), pad2(slice(h, 5, 2) % 24),
    lit(":"), pad2(slice(h, 7, 2) % 60),
    lit(":"), pad2(slice(h, 9, 2) % 60), lit("Z"))

  /** The fetch URL: one of 9 variants of the group's canonical page. */
  def urlOf(h: Column): Column = {
    val path = concat(lit("/d/"), gid.cast("string"))
    val v = slice(h, 13, 2) % 9
    when(v === 0, concat(lit("http://"), hostOf, path))
      .when(v === 1, concat(upper(concat(lit("HTTP://"), hostOf)), path))
      .when(v === 2, concat(lit("http://"), hostOf, lit(":80"), path))
      .when(v === 3, concat(lit("http://"), hostOf, path, lit("#section2")))
      .when(v === 4, concat(lit("http://"), hostOf, path, lit("?utm_source=feed")))
      .when(v === 5, concat(lit("http://"), hostOf, path, lit("/")))
      .when(v === 6, concat(lit("http://"), hostOf, path,
        lit("?id=7&utm_campaign=x&b=2")))
      .when(v === 7, concat(lit("https://"), hostOf, lit(":443"), path, lit("#top")))
      // query directly after the host, no path slash at all — the real-web
      // shape that breaks naive split-at-'/' host parsing
      .otherwise(concat(lit("http://"), hostOf, lit("?p="), gid.cast("string"),
        lit("&fbclid=x")))
  }

  private def record(wtype: Column, url: Column, wdate: Column,
      recId: Column, payload: Column): Column = concat(
    lit("WARC/1.0" + CrLf),
    lit("WARC-Type: "), wtype, lit(CrLf),
    lit("WARC-Target-URI: "), url, lit(CrLf),
    lit("WARC-Date: "), wdate, lit(CrLf),
    lit("WARC-Record-ID: <urn:md5:"), recId, lit(">" + CrLf),
    lit("Content-Type: text/html" + CrLf),
    lit("Content-Length: "), octet_length(payload).cast("string"), lit(HdrEnd),
    payload, lit(HdrEnd))

  /** (doc_id, url): the planted fetch URLs, standalone (for the
    * canonicalization gate).
    */
  def urls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), urlOf(hOf).as("url"))

  /** (doc_id, blob): a 2-record WARC blob per page — record 1 a synthetic
    * metadata record whose payload CONTAINS the decoy line "WARC/1.0"
    * (delimiter splits die; the Content-Length walk survives), record 2
    * the response with the wrapped HTML. Input: (doc_id, html).
    */
  def records(pages: DataFrame): DataFrame = {
    val h = hOf
    val decoy = concat(lit("# robots "), (col("doc_id") % 7).cast("string"),
      lit("\nWARC/1.0 decoy line\nallow: /"))
    val r1 = record(lit("metadata"),
      concat(lit("http://"), hostOf, lit("/robots.txt")),
      dateOf(h), md5(concat(lit("w1:"), col("doc_id").cast("string"))), decoy)
    val r2 = record(lit("response"), urlOf(h), dateOf(h),
      md5(concat(lit("w2:"), col("doc_id").cast("string"))), col("html"))
    pages.select(col("doc_id"), concat(r1, r2).as("blob"))
  }

  // ---- planted STREAM fixture: variable-record WARC blobs -----------------

  private def hbOf: Column =
    md5(concat(lit("warcs:"), col("doc_id").cast("string")))

  private def hsOf(i: Column): Column = md5(concat(
    lit("warcs:"), col("doc_id").cast("string"), lit(":"), i.cast("string")))

  /** (doc_id, blob): a VARIABLE-record WARC blob — 1..5 records keyed on
    * md5 slices (n = 1 + slice(1-2) % 5 of the per-doc hash), each record
    * with its own type (metadata 1-in-4), URL (6 variants: plain,
    * fragment, tracking-param, dot-segment path, percent-encoded path,
    * percent-encoded query), ISO date, and payload; roughly half the
    * payloads plant the
    * "WARC/1.0" decoy line and a variable x-pad, so neither a delimiter
    * split nor any fixed unroll can parse the stream. One `transform`
    * over `sequence` + `array_join` in both engines. Input: (doc_id).
    */
  def streamRecords(docs: DataFrame): DataFrame = {
    val nRec = lit(1L) + slice(hbOf, 1, 2) % 5
    val recs = transform(sequence(lit(0L), nRec - 1), i => {
      val hs = hsOf(i)
      val wtype = when(slice(hs, 3, 1) % 4 === 0, lit("metadata"))
        .otherwise(lit("response"))
      val v = slice(hs, 13, 2) % 6
      val gidS = expr("doc_id DIV 2").cast("string")
      // v3/v4 spell the same resource as v0 via a dot segment / an
      // unreserved percent-encoding (%73 = 's') — only RFC 3986
      // normalization makes them collide in the dedup; v5's %41/%3a
      // normalize to A/%3A in the kept query
      val pathPart = when(v === 3, concat(lit("/x/../s/"), gidS))
        .when(v === 4, concat(lit("/%73/"), gidS))
        .otherwise(concat(lit("/s/"), gidS))
      val suffix = when(v === 1, lit("#f"))
        .when(v === 2, lit("?utm_source=s&q=1"))
        .when(v === 5, lit("?q=%41%3a"))
        .otherwise(lit(""))
      val url = concat(lit("http://www.site"),
        ((col("doc_id") + i) % 50).cast("string"), lit(".example"),
        pathPart, suffix)
      val decoy = when(slice(hs, 15, 1) % 2 === 0,
        lit("\nWARC/1.0 decoy\n")).otherwise(lit(""))
      val payload = concat(lit("seg "), i.cast("string"), lit(" of "),
        col("doc_id").cast("string"), decoy,
        call_function("repeat", lit("x"), (slice(hs, 16, 1) % 13).cast("int")))
      record(wtype, url, dateOf(hs), md5(concat(
        lit("ws:"), col("doc_id").cast("string"), lit(":"), i.cast("string"))),
        payload)
    })
    docs.select(col("doc_id"), array_join(recs, "").as("blob"))
  }

  /** DuckDB twin of `streamRecords` over a CTE `src` with (doc_id). */
  def streamRecordsSql(src: String): String = {
    def sl(pos: Int, len: Int): String =
      s"CAST(CONCAT('0x', substr(md5('warcs:' || CAST(doc_id AS VARCHAR)" +
        s" || ':' || CAST(i AS VARCHAR)), $pos, $len)) AS BIGINT)"
    def p2(x: String) = s"lpad(CAST(($x) AS VARCHAR), 2, '0')"
    val wdate = s"'2014-' || ${p2(s"1 + ${sl(1, 2)} % 12")} || '-' || ${p2(s"1 + ${sl(3, 2)} % 28")}" +
      s" || 'T' || ${p2(s"${sl(5, 2)} % 24")} || ':' || ${p2(s"${sl(7, 2)} % 60")}" +
      s" || ':' || ${p2(s"${sl(9, 2)} % 60")} || 'Z'"
    val crlf = "chr(13) || chr(10)"
    val hdrEnd = s"$crlf || $crlf"
    val wtype = s"CASE WHEN ${sl(3, 1)} % 4 = 0 THEN 'metadata' ELSE 'response' END"
    val v = s"${sl(13, 2)} % 6"
    val gidS = "CAST(doc_id // 2 AS VARCHAR)"
    val pathPart = s"CASE WHEN $v = 3 THEN '/x/../s/' || $gidS" +
      s" WHEN $v = 4 THEN '/%73/' || $gidS ELSE '/s/' || $gidS END"
    val suffix = s"CASE WHEN $v = 1 THEN '#f'" +
      s" WHEN $v = 2 THEN '?utm_source=s&q=1'" +
      s" WHEN $v = 5 THEN '?q=%41%3a' ELSE '' END"
    val url = s"'http://www.site' || CAST((doc_id + i) % 50 AS VARCHAR) ||" +
      s" '.example' || ($pathPart) || ($suffix)"
    val decoy = s"CASE WHEN ${sl(15, 1)} % 2 = 0" +
      s" THEN chr(10) || 'WARC/1.0 decoy' || chr(10) ELSE '' END"
    val payload = s"'seg ' || CAST(i AS VARCHAR) || ' of ' ||" +
      s" CAST(doc_id AS VARCHAR) || $decoy ||" +
      s" repeat('x', CAST(${sl(16, 1)} % 13 AS INT))"
    val rec =
      s"'WARC/1.0' || $crlf || 'WARC-Type: ' || ($wtype) || $crlf ||" +
        s" 'WARC-Target-URI: ' || ($url) || $crlf || 'WARC-Date: ' || ($wdate) || $crlf ||" +
        s" 'WARC-Record-ID: <urn:md5:' || md5('ws:' || CAST(doc_id AS VARCHAR)" +
        s" || ':' || CAST(i AS VARCHAR)) || '>' || $crlf ||" +
        s" 'Content-Type: text/html' || $crlf ||" +
        s" 'Content-Length: ' || CAST(strlen($payload) AS VARCHAR) || $hdrEnd ||" +
        s" ($payload) || $hdrEnd"
    val nRec = "1 + CAST(CONCAT('0x', substr(md5('warcs:' ||" +
      " CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) % 5"
    s"SELECT doc_id, array_to_string(list_transform(" +
      s"range(0, CAST(($nRec) AS BIGINT)), i -> $rec), '') AS blob FROM $src"
  }

  private def slSql(pos: Int, len: Int): String =
    s"CAST(CONCAT('0x', substr(md5('warc:' || CAST(doc_id AS VARCHAR)), $pos, $len)) AS BIGINT)"

  private val hostSql = "'www.site' || CAST((doc_id // 3) % 50 AS VARCHAR) || '.example'"

  /** DuckDB twin of `urlOf` (over a doc_id column). */
  def urlSql: String = {
    val host = hostSql
    val path = s"'/d/' || CAST(doc_id // 3 AS VARCHAR)"
    val v = s"${slSql(13, 2)} % 9"
    s"CASE WHEN $v = 0 THEN 'http://' || $host || $path" +
      s" WHEN $v = 1 THEN upper('HTTP://' || $host) || $path" +
      s" WHEN $v = 2 THEN 'http://' || $host || ':80' || $path" +
      s" WHEN $v = 3 THEN 'http://' || $host || $path || '#section2'" +
      s" WHEN $v = 4 THEN 'http://' || $host || $path || '?utm_source=feed'" +
      s" WHEN $v = 5 THEN 'http://' || $host || $path || '/'" +
      s" WHEN $v = 6 THEN 'http://' || $host || $path || '?id=7&utm_campaign=x&b=2'" +
      s" WHEN $v = 7 THEN 'https://' || $host || ':443' || $path || '#top'" +
      s" ELSE 'http://' || $host || '?p=' || CAST(doc_id // 3 AS VARCHAR) || '&fbclid=x' END"
  }

  /** DuckDB twin of `records` over a CTE `src` with (doc_id, html). */
  def recordsSql(src: String): String = {
    def sl(pos: Int, len: Int) = slSql(pos, len)
    def p2(x: String) = s"lpad(CAST(($x) AS VARCHAR), 2, '0')"
    val wdate = s"'2014-' || ${p2(s"1 + ${sl(1, 2)} % 12")} || '-' || ${p2(s"1 + ${sl(3, 2)} % 28")}" +
      s" || 'T' || ${p2(s"${sl(5, 2)} % 24")} || ':' || ${p2(s"${sl(7, 2)} % 60")}" +
      s" || ':' || ${p2(s"${sl(9, 2)} % 60")} || 'Z'"
    val host = hostSql
    val url = urlSql
    val crlf = "chr(13) || chr(10)"
    val hdrEnd = s"$crlf || $crlf"
    def rec(wtype: String, u: String, idPfx: String, payload: String) =
      s"'WARC/1.0' || $crlf || 'WARC-Type: $wtype' || $crlf ||" +
        s" 'WARC-Target-URI: ' || $u || $crlf || 'WARC-Date: ' || $wdate || $crlf ||" +
        s" 'WARC-Record-ID: <urn:md5:' || md5('$idPfx:' || CAST(doc_id AS VARCHAR)) || '>' || $crlf ||" +
        s" 'Content-Type: text/html' || $crlf ||" +
        s" 'Content-Length: ' || CAST(strlen($payload) AS VARCHAR) || $hdrEnd ||" +
        s" ($payload) || $hdrEnd"
    val decoy = s"'# robots ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||" +
      s" 'WARC/1.0 decoy line' || chr(10) || 'allow: /'"
    s"SELECT doc_id, ${rec("metadata", s"'http://' || $host || '/robots.txt'", "w1", decoy)} ||" +
      s" ${rec("response", url, "w2", "html")} AS blob FROM $src"
  }

  // ---- the parser (Spark side) -------------------------------------------

  /** Parse ONE record starting at the head of `r`: (wtype, url, wdate,
    * clen, body_chars, ok, payload, next_off). `ok` requires the version
    * line, a parseable Content-Length, and payload bytes == Content-Length.
    */
  private def parseRec(r: Column): Column = {
    val hdrPos = locate(HdrEnd, r) // 1-based; 0 = not found
    val hdrs = r.substr(lit(1), hdrPos - 1)
    val clen = regexp_extract(hdrs, "Content-Length: ([0-9]+)", 1)
      .cast("long")
    val payload = r.substr(hdrPos + 4, coalesce(clen, lit(0L)).cast("int"))
    val ok = hdrPos > 0 && substring(r, 1, 10) === ("WARC/1.0" + CrLf) &&
      clen.isNotNull && octet_length(payload).cast("long") === clen
    struct(
      regexp_extract(hdrs, "WARC-Type: ([^\\r\\n]+)", 1).as("wtype"),
      regexp_extract(hdrs, "WARC-Target-URI: ([^\\r\\n]+)", 1).as("url"),
      regexp_extract(hdrs, "WARC-Date: ([^\\r\\n]+)", 1).as("wdate"),
      coalesce(clen, lit(-1L)).as("clen"),
      length(payload).cast("long").as("body_chars"),
      coalesce(ok, lit(false)).as("ok"),
      payload.as("payload"),
      (hdrPos + 4 + coalesce(clen, lit(0L)) + 4).cast("int").as("next_off"))
  }

  /** (doc_id, rec, wtype, url, wdate, clen, body_chars, ok, payload):
    * the fixed 2-record Content-Length framing walk over (doc_id, blob).
    * Row-local: one struct per record, posexplode, no shuffle.
    */
  def parse(blobs: DataFrame): DataFrame = {
    val r1 = parseRec(col("blob"))
    val r2 = parseRec(col("blob").substr(r1.getField("next_off"),
      lit(Int.MaxValue)))
    blobs
      .select(col("doc_id"), posexplode(array(r1, r2)).as(Seq("rec0", "r")))
      .select(col("doc_id"), (col("rec0") + 1).cast("long").as("rec"),
        col("r").getField("wtype").as("wtype"),
        col("r").getField("url").as("url"),
        col("r").getField("wdate").as("wdate"),
        col("r").getField("clen").as("clen"),
        col("r").getField("body_chars").as("body_chars"),
        col("r").getField("ok").as("ok"),
        col("r").getField("payload").as("payload"))
  }

  // ---- the STREAM parser (arbitrary record count per blob) ---------------

  private val VersionLine = "WARC/1.0" + CrLf

  /** Absolute 1-based record-start offsets of a multi-record blob: a
    * LINEAR native fold — no UDF, no driver, no fixed unroll. The
    * iteration bound is the count of "WARC/1.0" occurrences in the blob
    * (each record's version line contributes exactly one; payload decoys
    * only ADD spare iterations, never remove one), and each step advances
    * the frontier by the Content-Length frame — `locate` with a dynamic
    * start position, so no tail copies on the advance path. Once the
    * frontier's next position is not a version line the fold is a no-op
    * for the remaining iterations. The final filter keeps only true
    * record heads (a blob not starting with a version line yields zero
    * offsets, the contractual empty parse).
    */
  private def streamOffsets(blob: Column): Column = {
    val folded = aggregate(
      sequence(lit(1L), greatest(
        size(regexp_extract_all(blob, lit("WARC/1\\.0"), lit(0))).cast("long"),
        lit(1L))),
      array(lit(1L)),
      (acc, _) => {
        val cur = element_at(acc, -1)
        val hdrAbs = call_function("locate", lit(HdrEnd), blob,
          cur.cast("int")).cast("long")
        val hdrs = blob.substr(cur.cast("int"), (hdrAbs - cur).cast("int"))
        val clen = regexp_extract(hdrs, "Content-Length: ([0-9]+)", 1)
          .cast("long")
        val nxt = hdrAbs + 4 + clen + 4
        when(hdrAbs > 0 && clen.isNotNull &&
            blob.substr(nxt.cast("int"), lit(10)) === VersionLine,
          concat(acc, array(nxt))).otherwise(acc)
      })
    filter(folded, o =>
      blob.substr(o.cast("int"), lit(10)) === VersionLine)
  }

  /** (doc_id, rec, wtype, url, wdate, clen, body_chars, ok, payload): the
    * ARBITRARY-record-count framing walk — same per-record fields as
    * `parse`, record starts discovered by the linear offsets fold instead
    * of the fixed 2-record unroll. Row-local: fold + posexplode, no
    * shuffle, no UDF. This is the real-WARC shape; `parse` remains the
    * minimal fixed-frame teaching form.
    */
  def parseStream(blobs: DataFrame): DataFrame =
    blobs
      .select(col("doc_id"), col("blob"),
        posexplode(streamOffsets(col("blob"))).as(Seq("rec0", "off")))
      .select(col("doc_id"), (col("rec0") + 1).cast("long").as("rec"),
        parseRec(col("blob").substr(col("off").cast("int"),
          lit(Int.MaxValue))).as("r"))
      .select(col("doc_id"), col("rec"),
        col("r").getField("wtype").as("wtype"),
        col("r").getField("url").as("url"),
        col("r").getField("wdate").as("wdate"),
        col("r").getField("clen").as("clen"),
        col("r").getField("body_chars").as("body_chars"),
        col("r").getField("ok").as("ok"),
        col("r").getField("payload").as("payload"))

  // ---- the parser (DuckDB twin) --------------------------------------------

  /** DuckDB record parse over expr `r`, as a struct literal. */
  private def parseRecSql(r: String): String = {
    val hdrEnd = "chr(13) || chr(10) || chr(13) || chr(10)"
    val hdrPos = s"strpos($r, $hdrEnd)"
    val hdrs = s"substr($r, 1, $hdrPos - 1)"
    val clen = s"TRY_CAST(regexp_extract($hdrs, 'Content-Length: ([0-9]+)', 1) AS BIGINT)"
    val payload = s"substr($r, $hdrPos + 4, CAST(coalesce($clen, 0) AS INT))"
    val ok = s"($hdrPos > 0 AND substr($r, 1, 10) = 'WARC/1.0' || chr(13) || chr(10)" +
      s" AND $clen IS NOT NULL AND CAST(strlen($payload) AS BIGINT) = $clen)"
    s"{'wtype': regexp_extract($hdrs, 'WARC-Type: ([^\\r\\n]+)', 1)," +
      s" 'url': regexp_extract($hdrs, 'WARC-Target-URI: ([^\\r\\n]+)', 1)," +
      s" 'wdate': regexp_extract($hdrs, 'WARC-Date: ([^\\r\\n]+)', 1)," +
      s" 'clen': coalesce($clen, -1)," +
      s" 'body_chars': CAST(length($payload) AS BIGINT)," +
      s" 'ok': coalesce($ok, FALSE)," +
      s" 'payload': $payload," +
      s" 'next_off': $hdrPos + 4 + coalesce($clen, 0) + 4}"
  }

  /** DuckDB twin of `parse` as a full SELECT over a CTE `src` (doc_id,
    * blob) — bind record structs once, unnest the 2-element list.
    */
  def parseSql(src: String): String =
    s"""SELECT doc_id, CAST(u['rec'] AS BIGINT) AS rec,
       |  u['r']['wtype'] AS wtype, u['r']['url'] AS url,
       |  u['r']['wdate'] AS wdate, CAST(u['r']['clen'] AS BIGINT) AS clen,
       |  CAST(u['r']['body_chars'] AS BIGINT) AS body_chars,
       |  u['r']['ok'] AS ok, u['r']['payload'] AS payload
       |FROM (
       |  SELECT doc_id, unnest(list_transform([r1,
       |      ${parseRecSql(s"substr(blob, CAST(r1['next_off'] AS INT))")}],
       |    (r, i) -> {'rec': i, 'r': r})) AS u
       |  FROM (SELECT doc_id, blob, ${parseRecSql("blob")} AS r1 FROM $src))""".stripMargin

  /** DuckDB twin of `parseStream`: a RECURSIVE walk CTE over a CTE `sb`
    * (doc_id, blob) — the caller's WITH must carry the RECURSIVE keyword.
    * Each level advances by the same Content-Length frame as the Spark
    * fold and recurses only while the next position is a version line
    * with a parseable length (the exact fold-append condition).
    */
  def walkCteSql: String = {
    val r = parseRecSql("substr(b.blob, CAST(w.off AS INT))")
    val vline = "'WARC/1.0' || chr(13) || chr(10)"
    s"""walk(doc_id, rec, off) AS (
       |  SELECT doc_id, CAST(1 AS BIGINT), CAST(1 AS BIGINT) FROM sb
       |  UNION ALL
       |  SELECT t.doc_id, t.rec + 1, t.nxt FROM (
       |    SELECT w.doc_id, w.rec, b.blob,
       |      CAST(($r)['clen'] AS BIGINT) AS clen,
       |      w.off + CAST(($r)['next_off'] AS BIGINT) - 1 AS nxt
       |    FROM walk w JOIN sb b USING (doc_id)) t
       |  WHERE t.clen >= 0 AND substr(t.blob, CAST(t.nxt AS INT), 10) = $vline)""".stripMargin
  }

  /** The stream-parse SELECT over CTEs `sb` + `walk` (from
    * [[walkCteSql]]): same columns as `parseSql`.
    */
  def parseStreamSql: String = {
    val vline = "'WARC/1.0' || chr(13) || chr(10)"
    s"""SELECT doc_id, rec,
       |  r['wtype'] AS wtype, r['url'] AS url, r['wdate'] AS wdate,
       |  CAST(r['clen'] AS BIGINT) AS clen,
       |  CAST(r['body_chars'] AS BIGINT) AS body_chars,
       |  r['ok'] AS ok, r['payload'] AS payload
       |FROM (
       |  SELECT w.doc_id, w.rec,
       |    ${parseRecSql("substr(b.blob, CAST(w.off AS INT))")} AS r
       |  FROM walk w JOIN sb b USING (doc_id)
       |  WHERE substr(b.blob, CAST(w.off AS INT), 10) = $vline)""".stripMargin
  }

  // ---- URL canonicalization ------------------------------------------------

  /** RFC 3986 §6.2.2.2: decode %XX triplets of UNRESERVED characters
    * (ALPHA / DIGIT / '-' '.' '_' '~') and uppercase the hex of the
    * rest — the same-URI-different-bytes class ("%7Ea" vs "~a", "%3a"
    * vs "%3A"). Sentinel + indexed transform (neither engine has
    * replace-with-callback); decoding never produces a delimiter
    * (delimiters are all reserved), so this is safe AFTER the
    * path/query split.
    */
  private def pctNorm(s: Column): Column = {
    val toks = split(regexp_replace(s, "%([0-9a-fA-F]{2})", "\u0001$1"),
      "\u0001")
    array_join(transform(toks, (t, i) => {
      val hex = substring(t, 1, 2)
      val c = conv(hex, 16, 10).cast("int")
      val rest = t.substr(lit(3), lit(Int.MaxValue))
      val unreserved = (c >= 48 && c <= 57) || (c >= 65 && c <= 90) ||
        (c >= 97 && c <= 122) || c.isin(45, 46, 95, 126)
      when(i === 0, t).otherwise( // i is 0-based in Spark (1-based in DuckDB)
        when(unreserved, concat(call_function("chr", c), rest))
          .otherwise(concat(lit("%"), upper(hex), rest)))
    }), "")
  }

  /** RFC 3986 §5.2.4 dot-segment removal as a string fold over '/'-split
    * segments: '.' and '' are no-ops (so '//' collapses and trailing
    * slashes resolve in the same pass), '..' pops (clamped at root),
    * anything else appends. The absolute path's leading '' segment
    * doubles as the fold's empty init in both engines.
    */
  private def dotFold(path: Column): Column = {
    val folded = aggregate(split(path, "/"), lit(""),
      (acc, seg) =>
        when(seg === "" || seg === ".", acc)
          .when(seg === "..", regexp_replace(acc, "/[^/]*$", ""))
          .otherwise(concat(acc, lit("/"), seg)))
    when(folded === "", lit("/")).otherwise(folded)
  }

  /** Canonical form: lowercase scheme+host, strip default port, strip
    * fragment, percent-normalize (decode unreserved %XX, uppercase the
    * rest), remove dot segments + collapse duplicate/trailing slashes
    * (root '/' stays), drop tracking params (order of the rest
    * preserved). Row-local.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = substring_index(u, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest0 = noFrag.substr(locate("://", noFrag) + 3, lit(Int.MaxValue))
    // a query can directly follow the host ("http://h.example?x=1") —
    // normalize to ".../?x=1" so the split-at-'/' host cut is safe
    val rest = regexp_replace(rest0, "^([^/?]*)\\?", "$1/?")
    val hostPort = lower(substring_index(rest, "/", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQ0 = rest.substr(length(hostPort) + 1, lit(Int.MaxValue))
    val pathQ = when(pathQ0 === "", lit("/")).otherwise(pathQ0)
    val qPos = locate("?", pathQ)
    val path = when(qPos > 0, pathQ.substr(lit(1), qPos - 1)).otherwise(pathQ)
    // percent-normalize AFTER the split (decoding unreserved chars never
    // produces a delimiter), BEFORE param filtering (so "%75tm_source"
    // can't smuggle a tracking param past the name match)
    val query = pctNorm(when(qPos > 0, pathQ.substr(qPos + 1, lit(Int.MaxValue)))
      .otherwise(lit("")))
    val kept = filter(split(query, "&"), p => {
      val name = substring_index(p, "=", 1)
      length(p) > 0 && !name.startsWith(TrackingPrefix) &&
        !name.isin(TrackingExact: _*)
    })
    val q2 = array_join(kept, "&")
    // the dot-segment fold also collapses '//' and resolves the trailing
    // slash (root stays '/'), subsuming the old trailing-slash rule
    val path2 = dotFold(pctNorm(path))
    concat(scheme, lit("://"), host, path2,
      when(q2 =!= "", concat(lit("?"), q2)).otherwise(lit("")))
  }

  /** DuckDB twin of `canonicalUrl` over expr `u`. */
  def canonicalSql(u: String): String = {
    val noFrag = s"CASE WHEN strpos($u, '#') > 0 THEN substr($u, 1, strpos($u, '#') - 1) ELSE $u END"
    val nf = noFrag // bound inline; the oracle CTEs bind the column once
    val scheme = s"lower(string_split($nf, '://')[1])"
    val rest = s"regexp_replace(substr($nf, strpos($nf, '://') + 3), '^([^/?]*)\\?', '\\1/?')"
    val hostPort = s"lower(string_split($rest, '/')[1])"
    val host = s"CASE WHEN $scheme = 'http' THEN regexp_replace($hostPort, ':80$$', '')" +
      s" WHEN $scheme = 'https' THEN regexp_replace($hostPort, ':443$$', '') ELSE $hostPort END"
    val pathQ = s"CASE WHEN substr($rest, length($hostPort) + 1) = '' THEN '/'" +
      s" ELSE substr($rest, length($hostPort) + 1) END"
    val path = s"CASE WHEN strpos($pathQ, '?') > 0 THEN substr($pathQ, 1, strpos($pathQ, '?') - 1) ELSE $pathQ END"
    val query = pctNormSql(
      s"CASE WHEN strpos($pathQ, '?') > 0 THEN substr($pathQ, strpos($pathQ, '?') + 1) ELSE '' END")
    val trackList = TrackingExact.map(t => s"'$t'").mkString(", ")
    val kept = s"list_filter(string_split($query, '&'), p -> length(p) > 0" +
      s" AND substr(string_split(p, '=')[1], 1, ${TrackingPrefix.length}) <> '$TrackingPrefix'" +
      s" AND string_split(p, '=')[1] NOT IN ($trackList))"
    val q2 = s"coalesce(array_to_string($kept, '&'), '')"
    val path2 = dotFoldSql(pctNormSql(path))
    s"$scheme || '://' || $host || $path2 ||" +
      s" CASE WHEN ($q2) <> '' THEN '?' || ($q2) ELSE '' END"
  }

  /** DuckDB twin of `pctNorm` — note the indexed list_transform lambda
    * is 1-BASED here (0-based in Spark).
    */
  private def pctNormSql(s: String): String = {
    val c = "CAST(CONCAT('0x', substr(t, 1, 2)) AS INT)"
    s"array_to_string(list_transform(string_split(" +
      s"regexp_replace($s, '%([0-9a-fA-F]{2})', chr(1) || '\\1', 'g'), chr(1))," +
      s" (t, i) -> CASE WHEN i = 1 THEN t ELSE" +
      s" CASE WHEN ($c BETWEEN 48 AND 57) OR ($c BETWEEN 65 AND 90)" +
      s" OR ($c BETWEEN 97 AND 122) OR $c IN (45, 46, 95, 126)" +
      s" THEN chr($c) || substr(t, 3)" +
      s" ELSE '%' || upper(substr(t, 1, 2)) || substr(t, 3) END END), '')"
  }

  /** DuckDB twin of `dotFold`: list_reduce's first element — the
    * absolute path's leading '' segment — doubles as the empty init.
    */
  private def dotFoldSql(p: String): String = {
    val folded = s"list_reduce(string_split($p, '/'), (a, s) ->" +
      s" CASE WHEN s = '' OR s = '.' THEN a" +
      s" WHEN s = '..' THEN regexp_replace(a, '/[^/]*$$', '')" +
      s" ELSE a || '/' || s END)"
    s"CASE WHEN $folded = '' THEN '/' ELSE $folded END"
  }

  // ---- crawl-level dedup -----------------------------------------------

  /** Keep the LATEST fetch per canonical URL over parsed `response`
    * records: (url, doc_id, wdate). ONE partial-aggregable aggregate —
    * lexicographic ISO dates, doc_id tie-break — never a window over
    * the full fetch log. String/struct max has no mutable buffer, so
    * Spark plans a SortAggregate pair; that is the right trade here:
    * the partial phase sorts only NARROW rows (url, date, id — the
    * payloads were projected away), collapses each partition to one
    * candidate per URL before the exchange, and avoids the
    * agg+join+agg double pass an argmax-by-numeric-key would need.
    * Plan-locked: no Window, no Join, exactly the partial/final pair.
    *
    * STREAMING-LEGAL as-is: applied to an unbounded frame the same agg
    * runs in update/complete mode with one narrow struct per url as
    * state, and because max is COMMUTATIVE the winners are
    * arrival-order-INDEPENDENT — no in-order caveat, unlike the
    * first-wins dedup twins (StreamingSpec pins equality with the
    * batch result under reverse-order cross-batch arrival).
    */
  def dedupLatest(parsed: DataFrame): DataFrame =
    parsed.filter(col("wtype") === "response" && col("ok"))
      .select(canonicalUrl(col("url")).as("url"), col("wdate"), col("doc_id"))
      .groupBy("url")
      .agg(max(struct(col("wdate"), col("doc_id"))).as("w"))
      .select(col("url"), col("w").getField("doc_id").as("doc_id"),
        col("w").getField("wdate").as("wdate"))
}
