"""Document fingerprinting — winnowed rolling-hash k-gram fingerprints.

The scale path to *sub-document* duplication (long shared substrings in
otherwise-different pages): docs sharing any winnowed fingerprint are
substring-dup candidates, discoverable with the same groupBy/pair
machinery as LSH bands — no pairwise scan.

Winnowing guarantee (Schleimer, Wilkerson & Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003): selecting the
minimum k-gram hash of every sliding window of w consecutive k-grams
detects every common substring of length ≥ w + k − 1. With the default
k=64, w=64 any shared run of ≥127 characters yields a shared
fingerprint value in both documents.

Vectorized: char k-gram hashes are a polynomial rolling hash computed
as a sliding-window dot product in uint64 (wraparound arithmetic);
window minima via numpy stride tricks. Python touches each document
once per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE = np.uint64(1099511628211)  # FNV prime — odd ⇒ full-period mod 2^64


def _kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hashes of all k-grams of a byte array."""
    n = len(data)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        weights = np.empty(k, dtype=np.uint64)
        w = np.uint64(1)
        for i in range(k - 1, -1, -1):
            weights[i] = w
            w = w * _BASE
        sw = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
        return (sw * weights[None, :]).sum(axis=1, dtype=np.uint64)


def winnow(hashes: np.ndarray, window: int) -> np.ndarray:
    """Unique window-minimum fingerprints (robust-winnowing, value-based)."""
    if len(hashes) == 0:
        return hashes
    if len(hashes) <= window:
        return np.unique(hashes.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
    return np.unique(mins)


def fingerprint_udf(k: int = 64, window: int = 64):
    """pandas UDF: text → array<long> winnowed fingerprints.

    Guarantees a shared value for any common substring ≥ window + k − 1
    characters. Docs shorter than k get a single whole-text fingerprint.
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fingerprints(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            h = _kgram_hashes(data, k)
            if len(h) == 0:  # short doc: one fingerprint over everything
                h = _kgram_hashes(np.pad(data, (0, k - len(data))), k)
            fp = winnow(h, window)
            out.append((fp >> np.uint64(1)).astype(np.int64))  # non-negative long
        return pd.Series(out)

    return fingerprints
