"""Deterministic synthetic Common-Crawl-style pages corpus.

Schema per ``BASELINE.json`` ``input_hint``:

    url string, warc_ts timestamp, html binary, text string, lang string

Generation is **distributed and coordinate-free**: each row's content is
a pure function of ``(seed, row_id)`` plus segment arithmetic, so the
corpus is byte-identical regardless of partitioning, executor count, or
scale factor — the property the scaling benchmark and the resume tests
both rely on. No external data.

The id space is split into planted segments that exercise every tier of
the pipeline (mirroring the reference's test matrix, see FIXTURES.md):

* ``exact``  — groups of 3 byte-identical texts (≈ finder_test.go:86-116)
* ``mid``    — trios of 24 KiB texts: two identical + one with a single
  char flipped at offset 9216, i.e. inside the region the quick digest
  does NOT sample (≈ hasher_test.go:280-316): equal quick digest,
  different full digest
* ``near``   — clusters of 4 paraphrased docs with controlled shingle
  Jaccard (tail-replacement: keep fraction ``1-f`` of tokens, J ≈
  (1-f)/(1+f)), targets cycling {0.95, 0.9, 0.8, 0.5}
* ``hot``    — boilerplate-heavy docs sharing one big template + a tiny
  unique suffix (the LSH hot-bucket / skew exercise)
* ``short``  — docs with < shingle_k words (SimHash fallback path)
* ``lcs``    — pairs sharing a long common substring (~300 tokens)
  inside otherwise-different text (suffix-array path; shingle J ≈ 0.3,
  below the MinHash threshold on purpose)
* ``uniq``   — unique filler docs
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

LANGS = ["en", "de", "es", "fr", "it"]

#: per-language stopwords embedded into generated text so the
#: language-ID heuristic has a real signal to find.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "que", "de", "los", "una", "por", "con"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "it": ["il", "la", "che", "di", "non", "una", "per", "sono"],
}

#: deterministic content vocabulary (no external data)
VOCAB = [f"w{i:03d}" for i in range(512)]

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

# planted near-dup Jaccard targets, cycled per cluster
NEAR_TARGETS = [0.95, 0.9, 0.8, 0.5]
NEAR_CLUSTER = 4
EXACT_GROUP = 3
DOC_TOKENS = 400
LCS_SHARED_TOKENS = 300
LCS_WRAP_TOKENS = 200
MID_LEN = 24_576          # ≥ 16384 so the quick digest samples prefix+suffix
MID_FLIP_OFFSET = 9_216   # inside (8192, len-8192) — unsampled region


@dataclass(frozen=True)
class CorpusLayout:
    """Segment boundaries over the id space, derived from n_docs only."""

    n_docs: int
    n_exact_groups: int
    n_mid_trios: int
    n_near_clusters: int
    n_hot: int
    n_short: int
    n_lcs_pairs: int

    @classmethod
    def plan(cls, n_docs: int) -> "CorpusLayout":
        n_exact_groups = max(n_docs // (EXACT_GROUP * 10), 1)
        n_mid_trios = max(n_docs // 600, 1)
        n_near_clusters = max(n_docs // (NEAR_CLUSTER * 5), 1)
        n_hot = max(n_docs // 20, 2)
        n_short = max(n_docs // 20, 1)
        n_lcs_pairs = max(n_docs // 80, 1)
        used = (
            n_exact_groups * EXACT_GROUP + n_mid_trios * 3
            + n_near_clusters * NEAR_CLUSTER + n_hot + n_short + n_lcs_pairs * 2
        )
        while used > max(n_docs - 1, 1) and n_near_clusters > 1:
            n_near_clusters -= 1
            used -= NEAR_CLUSTER
        return cls(n_docs, n_exact_groups, n_mid_trios, n_near_clusters,
                   n_hot, n_short, n_lcs_pairs)

    # cumulative boundaries
    @property
    def b_exact(self) -> int:
        return self.n_exact_groups * EXACT_GROUP

    @property
    def b_mid(self) -> int:
        return self.b_exact + self.n_mid_trios * 3

    @property
    def b_near(self) -> int:
        return self.b_mid + self.n_near_clusters * NEAR_CLUSTER

    @property
    def b_hot(self) -> int:
        return self.b_near + self.n_hot

    @property
    def b_short(self) -> int:
        return self.b_hot + self.n_short

    @property
    def b_lcs(self) -> int:
        return self.b_short + self.n_lcs_pairs * 2


def _rng(seed: int, *parts: object) -> np.random.RandomState:
    """Deterministic per-key RNG: pure function of (seed, parts)."""
    h = np.uint64(1469598103934665603)
    for b in repr((seed, parts)).encode():
        h = np.uint64((int(h) ^ b) * 1099511628211 % (1 << 64))
    return np.random.RandomState(int(h) % (2**32 - 1))


def _tokens(rng: np.random.RandomState, n: int, lang: str) -> list[str]:
    """n tokens from the vocab with lang stopwords sprinkled every 7th slot."""
    idx = rng.randint(0, len(VOCAB), size=n)
    stop = LANG_STOPWORDS[lang]
    out = [VOCAB[i] for i in idx]
    for j in range(0, n, 7):
        out[j] = stop[int(idx[j]) % len(stop)]
    return out


def _lang_for(base_id: int) -> str:
    return LANGS[base_id % len(LANGS)]


def _base_text(seed: int, segment: str, base_id: int, n_tok: int, lang: str) -> list[str]:
    return _tokens(_rng(seed, segment, base_id), n_tok, lang)


def _paraphrase(base: list[str], seed: int, cluster: int, member: int,
                target_j: float, lang: str) -> list[str]:
    """Tail-replacement paraphrase: keep fraction (1-f), J ≈ (1-f)/(1+f)."""
    f = (1.0 - target_j) / (1.0 + target_j)
    keep = len(base) - int(round(f * len(base)))
    tail = _tokens(_rng(seed, "near-tail", cluster, member), len(base) - keep, lang)
    return base[:keep] + tail


def _row_for_id(i: int, seed: int, lo: CorpusLayout) -> tuple[str, str, str, str]:
    """(segment, url, text, lang) for row id ``i`` — pure function."""
    if i < lo.b_exact:
        g, m = divmod(i, EXACT_GROUP)
        lang = _lang_for(g)
        text = " ".join(_base_text(seed, "exact", g, DOC_TOKENS, lang))
        return "exact", f"https://{lang}.example.org/exact/{g:08d}/{m}", text, lang
    if i < lo.b_mid:
        j = i - lo.b_exact
        t, m = divmod(j, 3)
        lang = _lang_for(t)
        toks = _base_text(seed, "mid", t, 64, lang)
        s = (" ".join(toks) + " ") * (MID_LEN // (len(" ".join(toks)) + 1) + 1)
        s = s[:MID_LEN]
        if m == 2:  # flip one char in the unsampled middle region
            c = s[MID_FLIP_OFFSET]
            s = s[:MID_FLIP_OFFSET] + ("X" if c != "X" else "Y") + s[MID_FLIP_OFFSET + 1:]
        return "mid", f"https://{lang}.example.org/mid/{t:08d}/{m}", s, lang
    if i < lo.b_near:
        j = i - lo.b_mid
        c, m = divmod(j, NEAR_CLUSTER)
        lang = _lang_for(c)
        target = NEAR_TARGETS[c % len(NEAR_TARGETS)]
        base = _base_text(seed, "near", c, DOC_TOKENS, lang)
        toks = base if m == 0 else _paraphrase(base, seed, c, m, target, lang)
        return "near", f"https://{lang}.example.org/near/{c:08d}/{m}", " ".join(toks), lang
    if i < lo.b_hot:
        j = i - lo.b_near
        lang = "en"
        template = _base_text(seed, "hot-template", 0, 300, lang)
        uniq = _tokens(_rng(seed, "hot-uniq", j), 5, lang)
        return "hot", f"https://{lang}.example.org/hot/{j:08d}", " ".join(template + uniq), lang
    if i < lo.b_short:
        j = i - lo.b_hot
        lang = _lang_for(j)
        toks = _tokens(_rng(seed, "short", j), 3, lang)
        return "short", f"https://{lang}.example.org/short/{j:08d}", " ".join(toks), lang
    if i < lo.b_lcs:
        j = i - lo.b_short
        p, m = divmod(j, 2)
        lang = _lang_for(p)
        shared = _base_text(seed, "lcs-shared", p, LCS_SHARED_TOKENS, lang)
        pre = _tokens(_rng(seed, "lcs-pre", p, m), LCS_WRAP_TOKENS, lang)
        post = _tokens(_rng(seed, "lcs-post", p, m), LCS_WRAP_TOKENS, lang)
        return "lcs", f"https://{lang}.example.org/lcs/{p:08d}/{m}", " ".join(pre + shared + post), lang
    lang = _lang_for(i)
    toks = _base_text(seed, "uniq", i, DOC_TOKENS, lang)
    return "uniq", f"https://{lang}.example.org/uniq/{i:08d}", " ".join(toks), lang


def synth_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                num_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table (url, warc_ts, html, text, lang)."""
    lo = CorpusLayout.plan(n_docs)
    parts = num_partitions or max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                _, url, text, lang = _row_for_id(int(i), seed, lo)
                rows.append((
                    url,
                    _EPOCH + timedelta(seconds=int(i)),
                    b"<html><body>" + text.encode("utf-8") + b"</body></html>",
                    text,
                    lang,
                ))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(gen, PAGES_SCHEMA)


def planted_pairs(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Ground-truth pair table for recall accounting (driver-side, small).

    Columns: url_a, url_b, kind, jaccard_target. Exact/mid pairs have
    target 1.0 (byte-identical); near pairs carry their cluster target.
    The ``mid`` flipped member and hot/lcs/short segments are NOT listed
    as dup pairs (mid-flip is an explicit negative; hot is the skew
    exercise; lcs is sub-document overlap, not doc-level near-dup).
    """
    lo = CorpusLayout.plan(n_docs)
    rows = []

    def url(i: int) -> str:
        return _row_for_id(i, seed, lo)[1]

    for g in range(lo.n_exact_groups):
        ids = [g * EXACT_GROUP + m for m in range(EXACT_GROUP)]
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                rows.append((url(ids[x]), url(ids[y]), "exact", 1.0))
    for t in range(lo.n_mid_trios):
        a, b = lo.b_exact + t * 3, lo.b_exact + t * 3 + 1
        rows.append((url(a), url(b), "mid", 1.0))
    for c in range(lo.n_near_clusters):
        target = NEAR_TARGETS[c % len(NEAR_TARGETS)]
        ids = [lo.b_mid + c * NEAR_CLUSTER + m for m in range(NEAR_CLUSTER)]
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                rows.append((url(ids[x]), url(ids[y]), "near", target))
    return pd.DataFrame(rows, columns=["url_a", "url_b", "kind", "jaccard_target"])
