package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the curation stage every training-data
  * pipeline runs before anything else touches raw text (emails, phone
  * numbers, IP addresses, SSN-shaped ids scrubbed to typed placeholders).
  *
  * Engine shape: everything here is a ROW-LOCAL projection — Spark's
  * codegen'd `regexp_extract_all` / `regexp_replace` over the text column,
  * zero shuffles until the caller aggregates. At 100 TB this is the ideal
  * operator class: embarrassingly parallel, no state, scan-bound; the only
  * exchange in `stats` is the final single-row aggregate.
  *
  * Determinism/gate shape: the driver's synthetic documents contain no PII
  * (31-word vocabulary, no digits), so the fixture PLANTS a contact block
  * per doc, keyed on md5 slices of doc_id — the ZipfCorpus trick — with a
  * 25 % clean control group and independent per-type presence draws. Both
  * engines re-derive the identical corpus (`planted` / `plantedSql`), so
  * detection counts and redacted text hash-match exactly. Patterns are
  * single-sourced below and interpolated into BOTH engines; they restrict
  * to `[0-9]`/literal classes + `\b` (identical semantics in Java regex
  * and RE2 — no `\d`/`\w` dialect nuance on the gate path).
  *
  * Relation to `text_pii_scrub` (TextAnalysis.scrubPii): that query is the
  * one-pass generic scrubber (broad free-form phone shape, email, any
  * IPv4). This family is the TYPED tier a curation pipeline audits with:
  * per-class counts, per-class placeholders, an SSN-shaped id class, a
  * clean control slice, and the corpus roll-up — complementary surfaces,
  * both gated.
  */
object Pii {

  /** Detection patterns: type name -> (regex, redaction placeholder).
    * Order matters for redaction and is fixed by this Seq (email first —
    * its char class overlaps digit runs; the dash-shaped patterns are
    * mutually exclusive by construction: a phone's 3-digit middle group
    * can never parse as an id's 2-digit one, and `\b` never fires inside
    * a digit run).
    */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", """[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}""", "<EMAIL>"),
    ("phone", """\b555-[0-9]{3}-[0-9]{4}\b""", "<PHONE>"),
    ("ip", """\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b""", "<IP>"),
    ("id", """\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b""", "<ID>"))

  // ---- planted fixture -----------------------------------------------

  private def slice(h: Column, pos: Int, len: Int): Column =
    conv(substring(h, pos, len), 16, 10).cast("long")

  /** Append the deterministic contact block to (doc_id, text) rows.
    * h1 layout (hex positions): 1-2 clean gate (%4==0 -> no block),
    * 3-4 email presence (<6 of 10), 5-9 user (%1e5), 10 domain (%7),
    * 11-12 phone presence (<5), 13-15/16-19 phone digits,
    * 20-21 ip presence (<3), 22-23/24-25/26-27 octets (%256);
    * h2 (salt "pii2:"): 1-2 id presence (<2), 3-5/6-7/8-11 id digits.
    */
  def planted(docs: DataFrame): DataFrame = {
    val h1 = md5(concat(lit("pii:"), col("doc_id").cast("string")))
    val h2 = md5(concat(lit("pii2:"), col("doc_id").cast("string")))
    val email = when(slice(h1, 3, 2) % 10 < 6, concat(
      lit(" email user"), (slice(h1, 5, 5) % 100000).cast("string"),
      lit("@mail"), (slice(h1, 10, 1) % 7).cast("string"),
      lit(".example.com"))).otherwise(lit(""))
    val phone = when(slice(h1, 11, 2) % 10 < 5, concat(
      lit(" phone 555-"), lpad((slice(h1, 13, 3) % 1000).cast("string"), 3, "0"),
      lit("-"), lpad((slice(h1, 16, 4) % 10000).cast("string"), 4, "0")))
      .otherwise(lit(""))
    val ip = when(slice(h1, 20, 2) % 10 < 3, concat(
      lit(" ip 10."), (slice(h1, 22, 2) % 256).cast("string"),
      lit("."), (slice(h1, 24, 2) % 256).cast("string"),
      lit("."), (slice(h1, 26, 2) % 256).cast("string"))).otherwise(lit(""))
    val ssn = when(slice(h2, 1, 2) % 10 < 2, concat(
      lit(" id "), lpad((slice(h2, 3, 3) % 1000).cast("string"), 3, "0"),
      lit("-"), lpad((slice(h2, 6, 2) % 100).cast("string"), 2, "0"),
      lit("-"), lpad((slice(h2, 8, 4) % 10000).cast("string"), 4, "0")))
      .otherwise(lit(""))
    val block = when(slice(h1, 1, 2) % 4 === 0, lit(""))
      .otherwise(concat(lit(" contact"), email, phone, ip, ssn))
    docs.select(col("doc_id"), concat(col("text"), block).as("text"))
  }

  /** DuckDB twin of `planted` as a CTE body over table `src` — the same
    * slice layout, hex promoted via the repo's CONCAT('0x',...) BIGINT
    * cast (HUGEINT can't parse hex literals directly). Emitted as ONE
    * line per segment with no line ever starting in `||`: this string is
    * interpolated into callers' stripMargin blocks, which would eat the
    * first pipe of a leading `||`.
    */
  def plantedSql(src: String): String = {
    def sl(h: String, pos: Int, len: Int) =
      s"CAST(CONCAT('0x', substr($h, $pos, $len)) AS BIGINT)"
    val h1 = "md5('pii:' || CAST(doc_id AS VARCHAR))"
    val h2 = "md5('pii2:' || CAST(doc_id AS VARCHAR))"
    val email = s"CASE WHEN ${sl(h1, 3, 2)} % 10 < 6 THEN" +
      s" ' email user' || CAST(${sl(h1, 5, 5)} % 100000 AS VARCHAR) ||" +
      s" '@mail' || CAST(${sl(h1, 10, 1)} % 7 AS VARCHAR) ||" +
      s" '.example.com' ELSE '' END"
    val phone = s"CASE WHEN ${sl(h1, 11, 2)} % 10 < 5 THEN" +
      s" ' phone 555-' || lpad(CAST(${sl(h1, 13, 3)} % 1000 AS VARCHAR), 3, '0') ||" +
      s" '-' || lpad(CAST(${sl(h1, 16, 4)} % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    val ip = s"CASE WHEN ${sl(h1, 20, 2)} % 10 < 3 THEN" +
      s" ' ip 10.' || CAST(${sl(h1, 22, 2)} % 256 AS VARCHAR) ||" +
      s" '.' || CAST(${sl(h1, 24, 2)} % 256 AS VARCHAR) ||" +
      s" '.' || CAST(${sl(h1, 26, 2)} % 256 AS VARCHAR) ELSE '' END"
    val ssn = s"CASE WHEN ${sl(h2, 1, 2)} % 10 < 2 THEN" +
      s" ' id ' || lpad(CAST(${sl(h2, 3, 3)} % 1000 AS VARCHAR), 3, '0') ||" +
      s" '-' || lpad(CAST(${sl(h2, 6, 2)} % 100 AS VARCHAR), 2, '0') ||" +
      s" '-' || lpad(CAST(${sl(h2, 8, 4)} % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    s"SELECT doc_id, text || CASE WHEN ${sl(h1, 1, 2)} % 4 = 0 THEN '' ELSE" +
      s" ' contact' || $email || $phone || $ip || $ssn END AS text FROM $src"
  }

  // ---- operators -------------------------------------------------------

  /** Per-doc per-type match counts + an any-PII flag. Row-local; counts
    * cast to long (Spark `size` is int32 — the dtype-strict gate needs
    * int64 on both sides).
    */
  def detect(docs: DataFrame): DataFrame = {
    val counts = Patterns.map { case (name, re, _) =>
      size(regexp_extract_all(col("text"), lit(re), lit(0)))
        .cast("long").as(s"n_$name")
    }
    val any = Patterns.map { case (name, _, _) => col(s"n_$name") > 0 }
      .reduce(_ || _)
    docs.select(col("doc_id") +: counts: _*)
      .withColumn("has_pii", any)
  }

  /** Redact every match to its typed placeholder, in `Patterns` order.
    * One nested codegen'd regexp_replace chain — still a row-local scan.
    */
  def redact(docs: DataFrame): DataFrame = {
    val scrubbed = Patterns.foldLeft(col("text")) {
      case (c, (_, re, repl)) => regexp_replace(c, re, repl)
    }
    docs.select(col("doc_id"), scrubbed.as("text"))
  }

  /** Corpus-level audit: one row of per-type totals + affected-doc count.
    * The only exchange in the family (single-row hash aggregate).
    */
  def stats(docs: DataFrame): DataFrame = {
    val d = detect(docs)
    val sums = Patterns.map { case (name, _, _) =>
      sum(col(s"n_$name")).as(s"n_$name")
    }
    val head +: tail = sums :+
      sum(when(col("has_pii"), 1L).otherwise(0L)).as("docs_with_pii") :+
      count(lit(1)).as("n_docs")
    d.agg(head, tail: _*)
  }
}
