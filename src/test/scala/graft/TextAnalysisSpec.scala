package graft

import graft.operators.{Sessionize, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat and the hat", "en", "s", 1L),
      (2L, "42 7 cat", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("tokenStats: counts, uniques, avg length, ttr") {
    import spark.implicits._
    val r = TextAnalysis.tokenStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // doc1: 5 tokens, 4 unique (the×2), avg len (3+3+3+3+3)/5=3, ttr .8
    assert(r.head == ((1L, 5L, 4L, 3.0, 0.8)))
    // doc2: all-digit words dropped → 1 token "cat"
    assert(r(1) == ((2L, 1L, 1L, 3.0, 1.0)))
  }

  test("qualityScore: composite in [0,1], stopword ratio correct") {
    import spark.implicits._
    val r = TextAnalysis.qualityScore(docs).orderBy("doc_id").collect()
    val d1 = r.head
    assert(d1.getAs[Double]("stopword_ratio") == 0.6) // the,and,the of 5
    val q = d1.getAs[Double]("quality")
    assert(q > 0 && q <= 1.0)
  }

  test("langId: stopword-heavy docs tagged en") {
    import spark.implicits._
    val r = TextAnalysis.langId(docs).orderBy("doc_id").collect()
    assert(r.head.getAs[String]("lang_pred") == "en")
    assert(r(1).getAs[String]("lang_pred") == "und") // "cat" only, no stopwords
  }

  test("fingerprint: stable across runs, differs across docs") {
    import spark.implicits._
    val a = TextAnalysis.fingerprint(docs).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    val b = TextAnalysis.fingerprint(docs).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(a == b)
    // 60-bit keys: non-negative, and (near-certainly) distinct across docs
    assert(a.forall(_._2 >= 0L))
    assert(a.map(_._2).distinct.size > a.size / 2)
  }

  test("bigramNll: add-one smoothed LM, hand-computed values") {
    import spark.implicits._
    // corpus: "a a a" → (a,a)×2; "a b" → (a,b)×1
    // cb: (a,a)=2, (a,b)=1; cf: a=3; V = |{a,b}| = 2
    // P(a|a) = 3/5 → -ln = 0.510826 (stab6); P(b|a) = 2/5 → 0.916291
    val d = Seq(
      (1L, "a a a", "en", "s", 5L),
      (2L, "a b", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.TextAnalysis.bigramNll(d)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 2L, 0.510826), (2L, 1L, 0.916291)))
  }

  test("scrubPii: typed placeholders, ordering, pass-through") {
    import spark.implicits._
    val cases = Seq(
      (1L, "mail me at jane.doe+x@sub.example.org today"),
      (2L, "server 192.168.001.255 then call +44 (0) 207-946 0958 now"),
      (3L, "no pii here at all"),
      (4L, "a@b.io and 10.0.0.1 and 555-010-9999"))
    val got = graft.operators.TextAnalysis.scrubPii(org.apache.spark.sql.functions.col("t"))
    val out = cases.toDF("id", "t").select($"id", got.as("s"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail me at <EMAIL> today")
    assert(out(2L) == "server <IP> then call <PHONE> now")
    assert(out(3L) == "no pii here at all")
    assert(out(4L) == "<EMAIL> and <IP> and <PHONE>")
  }

  test("sessionize: 30-min gap splits sessions, counts correct") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val events = Seq(
      (1L, ts(0), 7L, "a", 1.0, "{}"),
      (2L, ts(10), 7L, "a", 1.0, "{}"),
      (3L, ts(50), 7L, "a", 1.0, "{}"),   // 40-min gap → new session
      (4L, ts(55), 7L, "a", 1.0, "{}"),
      (5L, ts(0), 8L, "b", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = Sessionize.sessions(events, 30).orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(s == Seq((7L, 1L, 2L), (7L, 2L, 2L), (8L, 1L, 1L)))
  }

  test("qualityTopP: smallest tie-closed superset of the top ⌊p·n⌋") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf001)
    val n = docs.count()
    val k = math.floor(0.2 * n + 1e-9).toLong
    val kept = TextAnalysis.qualityTopP(docs, 0.2)
      .as[(Long, Long)].collect()
    val qstar = kept.map(_._2).min
    val scores = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"),
        floor(col("quality") * 1000000.0 + 0.5).cast("long"))
      .as[(Long, Long)].collect()
    // at least k kept; strictly-above-threshold alone is NOT enough
    // (threshold maximality) and the keep set is exactly the ≥ q* class
    // (tie closure — no per-doc tiebreak inside the boundary score)
    assert(kept.length >= k)
    assert(scores.count(_._2 > qstar) < k)
    assert(kept.map(_._1).toSet == scores.filter(_._2 >= qstar).map(_._1).toSet)
  }

  test("duplicateSpans: cross-doc and within-doc repeats, first-occurrence keep") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter for updates and more content here"
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),              // 10-token boiler at pos 3
      (2L, s"delta $boiler epsilon zeta"),            // same boiler at pos 2
      (3L, "one two three four five six seven eight one two three four five six seven eight"), // self-repeat at pos 1 and 9
      (4L, "totally unique words nine ten eleven twelve thirteen fourteen")
    ).toDF("doc_id", "text")
    val spans = TextAnalysis.duplicateSpans(docs, 8)
      .as[(Long, Long, String, Boolean)].collect().toSeq

    // the 10-token boiler yields three 8-gram starts per doc; every one
    // is duplicated across docs 1/2, and doc 1 (lower doc_id) keeps all
    val d1 = spans.filter(_._1 == 1L)
    val d2 = spans.filter(_._1 == 2L)
    assert(d1.map(_._2).sorted == Seq(3L, 4L, 5L) && d1.forall(_._4))
    assert(d2.map(_._2).sorted == Seq(2L, 3L, 4L) && d2.forall(!_._4))
    // within-doc repeat: pos 1 (first) kept, pos 9 dropped
    val d3 = spans.filter(_._1 == 3L).sortBy(_._2)
    assert(d3.map(t => (t._2, t._4)) == Seq((1L, true), (9L, false)))
    // unique doc emits nothing
    assert(!spans.exists(_._1 == 4L))
    // every duplicated gram has exactly one keeper
    spans.groupBy(_._3).foreach { case (_, occ) =>
      assert(occ.count(_._4) == 1)
    }

    // the cut step: doc 2's spans at pos 2/3/4 cover tokens 2..11 → only
    // its own words survive; doc 3 loses the second repeat; docs with no
    // drops pass through with their normalized text and n_dropped = 0
    val cut = TextAnalysis.cutSpans(docs, TextAnalysis.duplicateSpans(docs, 8), 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(cut.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val byId = cut.map(t => t._1 -> t).toMap
    assert(byId(2L)._2 == "delta epsilon zeta" && byId(2L)._4 == 10L)
    assert(byId(3L)._2 == "one two three four five six seven eight" && byId(3L)._4 == 8L)
    assert(byId(1L)._4 == 0L && byId(1L)._2.startsWith("alpha beta subscribe"))
    assert(byId(4L)._4 == 0L && byId(4L)._3 == 9L)
  }

  test("chunks: window starts, short-doc single chunk, tail coverage") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" "), "en", "s", 1L), // n=10: one chunk
      (2L, (1 to 25).map(i => s"w$i").mkString(" "), "en", "s", 1L)  // n=25, w=8 s=5
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val c = TextAnalysis.chunks(d, 8, 5)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(t => (t._1, t._2))
    // doc 1 fits (10 <= ... no: 10 > 8 → nc = 1 + ceil(2/5) = 2)
    val d1 = c.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(0L, 5L))
    assert(d1.map(_._4).toSeq == Seq(8L, 5L))
    assert(d1(1)._5 == "w6 w7 w8 w9 w10")
    // doc 2: nc = 1 + ceil(17/5) = 5; starts 0,5,10,15,20; last short (5)
    val d2 = c.filter(_._1 == 2L)
    assert(d2.map(_._3).toSeq == Seq(0L, 5L, 10L, 15L, 20L))
    assert(d2.map(_._4).toSeq == Seq(8L, 8L, 8L, 8L, 5L))
    assert(d2.head._5 == "w1 w2 w3 w4 w5 w6 w7 w8")
    // coverage: every token index appears in some chunk
    val covered = d2.flatMap(t => t._3 until (t._3 + t._4)).toSet
    assert(covered == (0L until 25L).toSet)
  }

  test("chunks: window invariants across (width, stride) shapes incl. edges") {
    import spark.implicits._
    // doc lengths straddling every boundary: n < width, n = width,
    // n = width+1, n on/off stride multiples, n = 1
    val lens = Seq(1, 2, 7, 8, 9, 12, 13, 15, 16, 17, 40)
    val d = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(j => s"t$j").mkString(" "), "en", "s", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    for ((w, s) <- Seq((8, 8), (8, 5), (8, 1), (1, 1), (16, 7))) {
      val out = TextAnalysis.chunks(d, w, s)
        .as[(Long, Long, Long, Long, String)].collect().groupBy(_._1)
      for ((i, n) <- lens.indices.map(i => (i.toLong, lens(i)))) {
        val ch = out(i).sortBy(_._2)
        val expected = if (n <= w) 1 else 1 + (n - w + s - 1) / s
        assert(ch.length == expected, s"n=$n w=$w s=$s count")
        // starts are 0, s, 2s, ...; every chunk non-empty; full coverage;
        // all but the last chunk are full-width
        assert(ch.map(_._3).toSeq == (0 until expected).map(_.toLong * s))
        assert(ch.forall(_._4 >= 1))
        assert(ch.init.forall(_._4 == w.toLong), s"n=$n w=$w s=$s short mid-chunk")
        assert(ch.flatMap(t => t._3 until (t._3 + t._4)).toSet == (0L until n.toLong).toSet,
          s"n=$n w=$w s=$s coverage")
        // chunk text matches its slice of the token stream
        assert(ch.last._5 == ((ch.last._3 + 1) to n.toLong).map(j => s"t$j").mkString(" "))
      }
    }
  }

  test("chunks: consecutive windows overlap by width - stride tokens") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf0001)
    val c = TextAnalysis.chunks(docs, 64, 48)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).values
    c.foreach { ch =>
      val sorted = ch.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._3 == 48L)
          assert(a._3 + a._4 > b._3, "gap between consecutive chunks")
        case _ => ()
      }
      // last chunk reaches the end exactly when any earlier chunk is full
      val last = sorted.last
      assert(last._4 >= 1L)
    }
  }

  test("winnowing: shared-run guarantee, selection density, rightmost tie-break") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // two docs sharing a 6-token run (w+n-1 = 6 at the defaults) MUST
    // share ≥ 1 fingerprint — the winnowing guarantee
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      1L -> s"one two $run three four five six seven",
      2L -> s"red orange yellow $run green blue purple",
      3L -> "completely different words with no overlap here at all ok")
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowing(docs)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((fp(1L) & fp(2L)).nonEmpty, "shared 6-token run must share a fingerprint")
    assert((fp(1L) & fp(3L)).isEmpty && (fp(2L) & fp(3L)).isEmpty)
    // density ~2/(w+1): far fewer fingerprints than grams, more than 1
    val nGrams1 = 13 - 2 // 13 tokens → 11 trigrams
    assert(fp(1L).size > 1 && fp(1L).size < nGrams1)
    // rightmost tie-break: a doc of ONE repeated token has every gram
    // hash equal; each window's min ties and must pick the rightmost,
    // but the distinct fingerprint SET collapses to exactly that hash
    val rep = TextAnalysis.winnowing(Seq(4L -> ("w " * 10).trim).toDF("doc_id", "text"))
      .as[(Long, Long)].collect()
    assert(rep.length == 1)
    // a doc shorter than one complete window (< 6 tokens) yields nothing
    assert(TextAnalysis.winnowing(Seq(5L -> "a b c d e").toDF("doc_id", "text"))
      .count() == 0)
  }

  test("winnowing: differential against a plain-Scala reference on a " +
    "tie-heavy random corpus") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // tiny vocabulary → many equal gram hashes → the rightmost tie-break
    // and window overlap logic get exercised constantly
    val rnd = new scala.util.Random(12021)
    val vocab = Vector("a", "b", "c", "dd")
    val docs = (0L until 200L).map { id =>
      val n = rnd.nextInt(25) // 0..24 tokens, incl. below-window sizes
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    def md5hk(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    def ref(text: String): Set[Long] = {
      val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (t.length < 6) Set.empty
      else {
        val hks = (0 to t.length - 3).map(i => md5hk(s"${t(i)} ${t(i + 1)} ${t(i + 2)}"))
        (0 to hks.length - 4).map { p =>
          // min hash in the window; ties to the RIGHTMOST position
          (p to p + 3).map(i => (hks(i), -i)).min._1
        }.toSet
      }
    }
    val got = TextAnalysis.winnowing(docs.toDF("doc_id", "text"))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, text) =>
      val want = ref(text)
      assert(got.getOrElse(id, Set.empty[Long]) == want, s"doc $id diverged")
    }
  }

  test("user paths: deterministic total order and tie-break") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // user 1: a,b,c; user 2: a,b,c (same path); user 3: z alone — and
    // user 1's first two events share a timestamp, ordered by event_id
    val ev = Seq(
      (10L, ts(0), 1L, "b"), (9L, ts(0), 1L, "a"), (11L, ts(5), 1L, "c"),
      (20L, ts(1), 2L, "a"), (21L, ts(2), 2L, "b"), (22L, ts(3), 2L, "c"),
      (30L, ts(1), 3L, "z"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.operators.Paths.userPaths(ev)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b>c", 2L), ("z", 1L)))
  }

  test("bigramNllKn: KN scores the diverse continuation above the one-context boilerplate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 'spam' follows ONLY 'buy' (many times); 'the' follows many
    // different words (few times each). Under add-one, P(spam|buy) is
    // huge; under KN the continuation term demotes it. Compare the NLL
    // of a doc that is pure "buy spam" repetitions against one that uses
    // 'the' in a FRESH context — KN must penalize the boilerplate doc
    // RELATIVE to add-one more than the diverse doc.
    val corpus = Seq(
      (1L, ("buy spam " * 20).trim, "en", "s", 0),
      (2L, "a the b the c the d the e the", "en", "s", 0),
      (3L, "f the g the h the i the j the", "en", "s", 0),
      (4L, "k the l the m the n the o the", "en", "s", 0)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kn = graft.operators.TextAnalysis.bigramNllKn(corpus)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val add1 = graft.operators.TextAnalysis.bigramNll(corpus)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    // all finite and positive
    assert((kn.values ++ add1.values).forall(v => v > 0 && !v.isNaN && !v.isInfinite))
    // KN's relative penalty on the boilerplate doc exceeds add-one's:
    // nll_kn(boiler) − nll_kn(diverse) > nll_add1(boiler) − nll_add1(diverse)
    val knGap = kn(1L) - kn(2L)
    val addGap = add1(1L) - add1(2L)
    assert(knGap > addGap,
      s"KN gap $knGap should exceed add-one gap $addGap — continuation counts not biting")
  }

  test("bigramNllKn: conditional probabilities sum to 1 over the vocabulary") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b a c a b d c a d", "en", "s", 0)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // re-derive the model pieces by hand and check Σ_w2 P_KN(w2|'a') = 1
    // including the continuation mass for unseen pairs
    val b = graft.operators.TextAnalysis.bigramStream(corpus)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    val cb = b.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val cf = b.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n1f = cb.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n1p = cb.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val nbig = cb.size.toDouble
    val vocab = (b.map(_._1) ++ b.map(_._2)).distinct
    val d = 0.75
    val total = vocab.map { w2 =>
      math.max(cb.getOrElse(("a", w2), 0.0) - d, 0.0) / cf("a") +
        ((d * n1f("a")) / cf("a")) * (n1p.getOrElse(w2, 0.0) / nbig)
    }.sum
    // sums to 1 up to the predecessor-type normalization (Σ n1p = nbig)
    assert(math.abs(total - 1.0) < 1e-12, s"KN mass $total")
  }
}
