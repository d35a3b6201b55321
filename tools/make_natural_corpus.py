#!/usr/bin/env python3
"""Generate fixtures/natural_corpus.parquet — the CORPUS-SCALE natural
language dedup fixture (round 15; SURVEY §2.9: the 40-doc fixture
validated the thresholds linguistically, but corpus-scale selectivity
still extrapolated from the synthetic zipf family).

2,500 documents derived DETERMINISTICALLY (md5-indexed choices — no RNG
state) by contiguous-word-WINDOW recombination of the same original
prose the 40-doc fixture uses (tools/make_natural_fixture.py; no
external source, no license concern). Window reuse preserves natural
word/stopword/df statistics while scaling the corpus 60x, and — like a
real crawl — it produces ORGANIC partial-overlap pairs (docs sharing
fragments, measured max J = 0.416, ~19k pairs above 0.4 estimated
overlap) underneath the PLANTED classes:

  doc_id     1..1750  originals: 5-8 windows of 14-25 words
          1751..1950  exact mirrors of originals 1..200
          1951..2150  boilerplate wraps of originals 201..400 (header +
                      unchanged body + footer: high containment, J<0.8)
          2151..2300  light mutations of originals 401..550 (one or two
                      word substitutions, J >= 0.8 — above the bar)
          2301..2400  heavy mutations of originals 551..650 (every 6th
                      word replaced, 0.05 <= J <= 0.5 — below the bar)
          2401..2500  quote embeddings of originals 651..750 (commentary
                      sentences around the full original: the asymmetric
                      containment case)

Planted ground truth is a doc_id FORMULA (partner = doc_id - offset), so
specs recover it without side tables. The generator ASSERTS the class
invariants before writing:
  - every high-overlap original pair sits at exact J < 0.7 (measured
    max 0.416 — no accidental pair near the 0.8 bar),
  - mirror J = 1; light-mutation J >= 0.8; heavy 0.05 <= J <= 0.5;
    boilerplate/quote J < 0.8 with containment of the base >= 0.85.

Run once; the parquet is committed. Both engines read the identical
bytes (NaturalCorpus.corpus / corpusCte).
"""
import hashlib
import itertools

import pandas as pd

from make_natural_fixture import BASES, UNRELATED, clean

N_ORIG = 1750
N_MIRROR, N_BOILER, N_LIGHT, N_HEAVY, N_QUOTE = 200, 200, 150, 100, 100

SUBS = ["meanwhile", "perhaps", "otherwise", "likewise", "thereafter"]

# Corpus-scale site chrome: long docs need proportionally more chrome to
# keep the boilerplate class below the symmetric-J bar (the realistic
# case — aggregator pages carry navigation, related-article teasers and
# legal footers that dwarf the 40-doc fixture's one-line header).
HEADER2 = ("welcome to our site home news archive sport weather letters "
           "contact subscribe to the weekly newsletter for updates . "
           "trending this week the harvest fair photo gallery the new "
           "bypass consultation and the restored organ fund . from our "
           "partners local deals on garden tools winter fuel and family "
           "days out . you are reading the free edition sign in to save "
           "articles for later .")
FOOTER2 = ("more from this section yesterday's roundup the month in "
           "pictures and readers letters . related articles appear below "
           "the comment form which closes after thirty days . all rights "
           "reserved . terms of use privacy policy cookie settings "
           "accessibility statement copyright two thousand twenty four . "
           "registered office number street and the old printing house .")
COMMENT_PRE = [
    "readers of last month's issue will recognise the subject at once "
    "and several wrote to ask for the full text rather than the extract "
    "we ran beside the photographs .",
    "the following account is reprinted with the author's permission "
    "and with the original spelling kept as it stood in the notebook .",
    "we received many letters about this piece and reprint it in full "
    "together with the date and place of first publication for the "
    "record .",
]
COMMENT_POST = [
    "the editors welcome corrections and additions for the next issue "
    "and ask that contributors give page references where they can .",
    "a longer version will appear in the annual volume this winter "
    "alongside the maps and the surveyor's correspondence .",
    "further material on the topic is held in the society's archive "
    "which opens to visitors on the first saturday of each month .",
]


def h(tag, i, n):
    """Deterministic index in [0, n): md5 of a namespaced key."""
    return int(hashlib.md5(f"nc:{tag}:{i}".encode()).hexdigest()[:12], 16) % n


def shingles(text, n=3):
    t = text.split()
    return {tuple(t[i:i + n]) for i in range(len(t) - n + 1)}


def jac(a, b):
    sa, sb = shingles(a), shingles(b)
    return len(sa & sb) / len(sa | sb)


def containment(base, wrapped):
    sa, sb = shingles(base), shingles(wrapped)
    return len(sa & sb) / len(sa)


def main():
    words = []
    for t in BASES + UNRELATED:
        words.extend(clean(t).split())
    nw = len(words)
    print(f"word pool: {nw}")

    sources = ["siteA", "siteB", "siteC", "blogs", "forum"]

    # Originals are k contiguous word WINDOWS from the base prose —
    # fragment-level reuse, the granularity real crawl recombination
    # shows. Two random windows heavily align with probability ~1e-2 and
    # a J>=0.8 accident needs ~5 of 6 windows aligned (~1e-10 per pair;
    # NaturalCorpusSpec additionally asserts the realized J>=0.8 pair set
    # equals exactly the planted classes).
    originals = []
    spans = []
    for i in range(1, N_ORIG + 1):
        k = 5 + h("len", i, 4)  # 5..8 windows
        parts = []
        sp = []
        for j in range(k):
            ln = 14 + h(f"wl{j}", i, 12)        # 14..25 words
            a = h(f"ws{j}", i, nw - ln)
            parts.append(" ".join(words[a:a + ln]))
            sp.append((a, a + ln))
        originals.append(" ".join(parts))
        spans.append(sp)

    # invariant 1: no doc pair has more than half of its word positions
    # covered by ALIGNED window overlaps (interval intersections) — the
    # precondition for an accidental J >= 0.8
    def overlap(si, sj):
        tot = 0
        for a1, b1 in si:
            for a2, b2 in sj:
                tot += max(0, min(b1, b2) - max(a1, a2))
        return tot
    # interval overlap OVER-counts (multi-alignment, self-overlapping
    # windows), so use it as a candidate filter and exact-shingle-J the
    # candidates: every original pair above 0.4 estimated overlap must
    # sit well below the 0.8 bar
    lens = [sum(b - a for a, b in sp) for sp in spans]
    cand = [(i, j) for i, j in itertools.combinations(range(N_ORIG), 2)
            if overlap(spans[i], spans[j]) / min(lens[i], lens[j]) >= 0.4]
    worst = max((jac(originals[i], originals[j]) for i, j in cand),
                default=0.0)
    print(f"{len(cand)} high-overlap original pairs, max exact J = {worst:.3f}")
    assert worst < 0.7, f"accidental near-dup risk: J={worst}"

    rows = []

    def add(source, text):
        rows.append({"doc_id": len(rows) + 1, "source": source, "text": text})

    for i, t in enumerate(originals, start=1):
        add(sources[h("src", i, len(sources))], t)
    for i in range(1, N_MIRROR + 1):  # mirrors of originals 1..200
        base = originals[i - 1]
        add("mirror", base)
        assert jac(base, base) == 1.0
    for i in range(1, N_BOILER + 1):  # boilerplate wraps of 201..400
        base = originals[200 + i - 1]
        t = clean(f"{HEADER2} {base} {FOOTER2}")
        add("aggregator", t)
        assert jac(base, t) < 0.8 and containment(base, t) >= 0.85, i
    for i in range(1, N_LIGHT + 1):  # light mutations of 401..550
        base = originals[400 + i - 1]
        w = base.split()
        # substitute two well-separated words (one for short docs) with a
        # fixed filler; positions and filler are md5-derived
        n_sub = 2 if len(w) >= 60 else 1
        for s in range(n_sub):
            pos = 5 + h(f"mpos{s}", i, 10) + s * (len(w) // 2)
            w[pos] = SUBS[h(f"mw{s}", i, len(SUBS))]
        t = " ".join(w)
        add("blogs", t)
        assert jac(base, t) >= 0.8, (i, jac(base, t))
    for i in range(1, N_HEAVY + 1):  # heavy mutations of 551..650
        base = originals[550 + i - 1]
        w = base.split()
        for p in range(3, len(w), 6):
            w[p] = SUBS[h(f"hw{p}", i, len(SUBS))]
        t = " ".join(w)
        add("blogs", t)
        assert 0.05 <= jac(base, t) <= 0.5, (i, jac(base, t))
    for i in range(1, N_QUOTE + 1):  # quote embeddings of 651..750
        base = originals[650 + i - 1]
        t = clean(COMMENT_PRE[h("qp", i, 3)] + " " +
                  COMMENT_PRE[h("qp2", i, 3)] + " " + base + " " +
                  COMMENT_POST[h("qq", i, 3)] + " " +
                  COMMENT_POST[h("qq2", i, 3)])
        add("siteB", t)
        assert jac(base, t) < 0.8 and containment(base, t) >= 0.85, i

    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["doc_id"] = df["doc_id"].astype("int64")
    assert len(df) == 2500
    df.to_parquet("fixtures/natural_corpus.parquet", index=False)
    print(df.groupby("source").size())
    print(f"{len(df)} docs written, "
          f"{df.text.str.split().str.len().sum()} words")


if __name__ == "__main__":
    main()
