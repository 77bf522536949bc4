"""Suffix-array substring dedup — long-common-substring detection.

North-rule operator: find document pairs sharing a long verbatim
substring even when their overall shingle Jaccard is far below the
near-dup threshold (syndication, quoted blocks, boilerplate spans).

Two stages, both distribution-friendly:

1. **Candidates** — winnowed rolling-hash fingerprints
   (:mod:`doppel_spark.functions.fingerprint`); docs sharing a
   fingerprint value are candidates. Same groupBy-bucket → pair
   explosion machinery as LSH (skew cap included) — never O(n²).
2. **Verification** — exact longest-common-substring length per
   candidate pair via a generalized suffix array over
   ``text_a ⊕ sep ⊕ text_b``: prefix-doubling construction
   (O(n log² n), fully vectorized numpy lexsort), Kasai LCP, max LCP
   between adjacent suffixes originating in different documents.
   Runs as a vectorized pandas UDF over pair rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from doppel_spark.functions.fingerprint import fingerprint_udf
from doppel_spark.operators.lsh import pairs_from_buckets
from doppel_spark.operators.stage import StageMaterializer


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (numpy lexsort), O(n log² n)."""
    n = len(s)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    k = 1
    idx = np.arange(n)
    while True:
        second = np.where(idx + k < n, rank[np.minimum(idx + k, n - 1)] + 1, 0)
        order = np.lexsort((second, rank))
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (rank[order][1:] != rank[order][:-1]) | (
            second[order][1:] != second[order][:-1]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed)
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai's algorithm: lcp[i] = LCP(sa[i], sa[i-1]); lcp[0] = 0."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: str, b: str) -> int:
    """Exact LCS length via generalized suffix array of a ⊕ 0x110000 ⊕ b."""
    if not a or not b:
        return 0
    xa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    xb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    sep = np.int64(0x110000)  # above any Unicode code point
    s = np.concatenate([xa, [sep], xb])
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    origin = sa < len(xa)  # suffix starts in a?
    cross = origin[1:] != origin[:-1]
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())


def lcs_len_udf():
    """pandas UDF: (text_a, text_b) → longest common substring length."""

    @F.pandas_udf(T.LongType())
    def lcs(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [longest_common_substring_len(x or "", y or "") for x, y in zip(a, b)],
            dtype="int64",
        )

    return lcs


def fingerprint_candidates(
    docs: DataFrame, id_col: str = "url", text_col: str = "text",
    k: int = 64, window: int = 64, bucket_cap: int = 256,
    mat: StageMaterializer | None = None,
) -> DataFrame:
    """Pairs sharing ≥1 winnowed fingerprint (url_a < url_b).

    The winnowing UDF's output is cut BEFORE the bucket machinery:
    bucket membership alone evaluates its input twice (stats + join
    back), and without the cut the UDF re-ran per evaluation — the
    round-2 bench's 3× ``substring_pairs`` regression.
    """
    if mat is None:
        mat = StageMaterializer.for_input(docs.select(id_col, text_col),
                                          prefix="suffix")
    fp = fingerprint_udf(k, window)
    fps = mat.cut(
        docs.select(F.col(id_col), fp(F.col(text_col)).alias("fps")), "fps")
    exploded = fps.select(F.col(id_col), F.explode("fps").alias("fp"))
    return pairs_from_buckets(exploded, ["fp"], id_col=id_col,
                              bucket_cap=bucket_cap, mat=mat)


def substring_dup_pairs(
    docs: DataFrame, id_col: str = "url", text_col: str = "text",
    min_len: int = 256, k: int = 64, window: int = 64, bucket_cap: int = 256,
) -> DataFrame:
    """Pairs of docs sharing a verbatim substring of ≥ ``min_len`` chars.

    Output: (url_a, url_b, lcs_len long). Complete for min_len ≥
    window + k − 1 (the winnowing guarantee); candidates below that
    floor may be missed by design.
    """
    mat = StageMaterializer.for_input(docs.select(id_col, text_col),
                                      prefix="suffix")
    pairs = mat.cut(
        fingerprint_candidates(docs, id_col, text_col, k, window, bucket_cap,
                               mat=mat), "cand_pairs")
    # prune the text table to pair participants FIRST (cheap id
    # semi-join), so the two text joins below shuffle only texts that
    # actually appear in a candidate pair — at web scale candidates are
    # a sliver of the corpus and the full text column must never move
    participants = (
        pairs.select(F.col("url_a").alias(id_col))
        .union(pairs.select(F.col("url_b").alias(id_col)))
        .distinct()
    )
    needed = docs.select(F.col(id_col), F.col(text_col)) \
        .join(participants, id_col, "left_semi")
    a = needed.select(F.col(id_col).alias("url_a"), F.col(text_col).alias("text_a"))
    b = needed.select(F.col(id_col).alias("url_b"), F.col(text_col).alias("text_b"))
    lcs = lcs_len_udf()
    return (
        pairs.join(a, "url_a").join(b, "url_b")
        .withColumn("lcs_len", lcs(F.col("text_a"), F.col("text_b")))
        .filter(F.col("lcs_len") >= min_len)
        .select("url_a", "url_b", "lcs_len")
    )
