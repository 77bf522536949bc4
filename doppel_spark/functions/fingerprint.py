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
_BASE_INV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hashes of all k-grams of a byte array.

    h_i = Σ_{m<k} d[i+m] · B^(k−1−m) (mod 2⁶⁴), computed in O(n) via a
    prefix sum in the inverse-power basis: with S[t] = Σ_{u<t} d[u]·B⁻ᵘ,
    h_i = (S[i+k] − S[i]) · B^(k−1+i) — B is odd so B⁻¹ exists mod 2⁶⁴
    and the modular identity is exact. Values are bit-identical to the
    direct windowed sum (asserted in tests); the former sliding-window
    formulation materialized an (n, k) uint64 matrix — 8k bytes of
    memory traffic per input byte, the dominant cost of the fingerprint
    stage at k = 64 (guide §1.2: per-task work, after the plan shape).
    """
    n = len(data)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        ipw = np.empty(n, dtype=np.uint64)
        ipw[0] = 1
        np.cumprod(np.full(n - 1, _BASE_INV, dtype=np.uint64), out=ipw[1:])
        s = np.empty(n + 1, dtype=np.uint64)
        s[0] = 0
        np.cumsum(data.astype(np.uint64) * ipw, out=s[1:])
        m = n - k + 1
        pw = np.empty(m, dtype=np.uint64)
        pw[0] = _BASE ** np.uint64(k - 1)
        if m > 1:
            np.cumprod(np.full(m - 1, _BASE, dtype=np.uint64), out=pw[1:])
            np.multiply(pw[1:], pw[0], out=pw[1:])
        return (s[k:] - s[:m]) * pw


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
