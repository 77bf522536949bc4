"""MinHash signatures over word shingles — vectorized pandas/Arrow UDF.

North-rule extension (no reference counterpart): generalizes the
reference's cheap-signal-first design (quick hash before full hash,
/root/reference/internal/finder/finder.go:68-106) to near-duplicates —
the MinHash signature is the cheap signal, LSH banding the candidate
key, Jaccard verification the expensive confirmation.

Math: token hashes come from pandas' SipHash-based ``hash_array``
(vectorized C, full 64-bit range, deterministic for a fixed pandas
version); a shingle's hash is a rolling polynomial over its k token
hashes (sliding-window dot product, no string materialization); and
signature[j] = min over shingles s of (c_j · h(s) mod 2⁶⁴) with c_j a
random odd 64-bit constant — an invertible multiplicative map, i.e. a
pseudorandom permutation of the key space per signature position.

Two pitfalls this design dodges, deliberately:

* the textbook (a·h + b) mod p family with *bounded* a and h wraps mod
  p only a handful of times, making it piecewise order-preserving in h
  — all "permutations" then correlate with plain min(h) and the
  agreement estimator is badly biased (observed est ≈ 0.63 for true
  J = 0.80). With full-range 64-bit h, an odd multiplier wraps ~2⁶³
  times — a genuinely scrambled order.
* a wide (num_perm × n_shingles) intermediate streamed through RAM
  makes the kernel memory-bandwidth-bound and destroys multi-core
  scaling (measured 1.7× from 8→32 procs on this host). The perm
  dimension is therefore processed in L2-resident chunks with a single
  multiply per element.

Python touches each *document* once per batch; all inner math is numpy
uint64 with natural wraparound.

Short docs (< k tokens) shingle as their raw token set; empty docs get
the single empty-string shingle — every doc has a valid signature, so
the SimHash fallback is a recall supplement, not a crutch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 avalanche finalizer (public-domain constant set)."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def perm_constants(num_perm: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation odd 32-bit multipliers.

    The permutation family runs in the 32-bit ring: an odd multiplier
    is invertible mod 2³², so each constant is a pseudorandom
    permutation of the 32-bit key space — the same construction as the
    64-bit variant, at half the memory traffic through the multiply/min
    kernel (the kernel is DRAM-bandwidth-bound under many workers, so
    the width is the scaling knob). Cross-doc agreement gains a false-
    match probability of 2⁻³² per position — invisible next to the
    1/√num_perm estimator noise.
    """
    with np.errstate(over="ignore"):
        c = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64)
                       + np.uint64(seed) * _GOLDEN)
        return ((c >> np.uint64(32)).astype(np.uint32)
                | np.uint32(1))  # odd ⇒ invertible mod 2^32


#: rolling-polynomial weights for combining k token hashes into one
#: shingle hash (odd base ⇒ full period mod 2^64)
_POLY_BASE = np.uint64(0x9E3779B97F4A7C15)

#: perm-chunk size: 32 perms × ~1k shingles × 8 B ≈ 256 KiB — L2-resident
_PERM_CHUNK = 32


def shingle_set(text: str, k: int) -> list[str]:
    """k-word shingles as strings (audit/test path; the signature UDF
    works on hashes directly). < k tokens → token set; empty → ['']."""
    toks = text.split()
    if len(toks) >= k:
        return list({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})
    if toks:
        return list(set(toks))
    return [""]


#: byte-polynomial base for token hashing (odd ⇒ invertible mod 2^64)
_TOKEN_BASE = np.uint64(1099511628211)
_TOKEN_BASE_INV = np.uint64(pow(1099511628211, -1, 1 << 64))

#: ASCII whitespace byte values (the fast tokenizer splits on these;
#: exotic Unicode whitespace is not a separator on this path)
_WS_BYTES = (9, 10, 11, 12, 13, 32)
_TOK_LUT = np.ones(256, dtype=bool)
_TOK_LUT[list(_WS_BYTES)] = False


def token_hashes(text: str) -> np.ndarray:
    """64-bit hashes of the whitespace tokens of ``text`` — zero Python
    string objects.

    The UTF-8 bytes are hashed once with a prefix polynomial
    P[i] = Σ_{j<i} (b[j]+1)·B^j (mod 2⁶⁴); a token spanning [s, e) then
    hashes to (P[e] − P[s]) · B⁻ˢ — equal byte spans ⇒ equal hashes —
    and a splitmix64 avalanche spreads the result over the full 64-bit
    space. Everything is vectorized over the byte array: cost is O(len)
    numpy ops per document, independent of token count.
    """
    data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    n = data.size
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    is_tok = _TOK_LUT[data]
    prev = np.empty(n, dtype=bool)
    prev[0] = False
    prev[1:] = is_tok[:-1]
    nxt = np.empty(n, dtype=bool)
    nxt[-1] = False
    nxt[:-1] = is_tok[1:]
    starts = np.nonzero(is_tok & ~prev)[0]
    if starts.size == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.nonzero(is_tok & ~nxt)[0] + 1
    with np.errstate(over="ignore"):
        pw = np.empty(n + 1, dtype=np.uint64)
        pw[0] = 1
        np.cumprod(np.full(n, _TOKEN_BASE, dtype=np.uint64), out=pw[1:])
        ipw = np.empty(n + 1, dtype=np.uint64)
        ipw[0] = 1
        np.cumprod(np.full(n, _TOKEN_BASE_INV, dtype=np.uint64), out=ipw[1:])
        pre = np.empty(n + 1, dtype=np.uint64)
        pre[0] = 0
        np.cumsum((data.astype(np.uint64) + np.uint64(1)) * pw[:n], out=pre[1:])
        return splitmix64((pre[ends] - pre[starts]) * ipw[starts])


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique 64-bit shingle hashes of a document, string-free.

    Each k-gram combines its token hashes with a rolling polynomial
    (sliding-window dot product in uint64). Equal shingles ⇒ equal
    hashes by construction.
    """
    th = token_hashes(text)
    if th.size == 0:
        return np.zeros(1, dtype=np.uint64)
    if th.size < k:
        return np.unique(th)
    with np.errstate(over="ignore"):
        weights = _POLY_BASE ** np.arange(k, dtype=np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(th, k)
        return np.unique((windows * weights[None, :]).sum(axis=1, dtype=np.uint64))


def band_hashes(sig_matrix: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n, num_perm) signatures → (n, bands) band-bucket hashes.

    Vectorized splitmix64 fold over each band's signature slice, salted
    by the band index so cross-band buckets never merge. Equal band
    slices ⇒ equal hashes — the only property LSH banding needs; the
    hash values themselves are engine-internal.

    This runs in numpy INSIDE the signature UDF (one fold per Arrow
    batch) instead of as a Catalyst ``transform``+``slice``+``xxhash64``
    higher-order expression: HOF eval is interpreted (not codegen) and
    its per-row slice allocations contend hard under many executor
    threads — measured 1.9× wall regression from local[8] → local[32]
    on that expression alone, flat scaling for the numpy path.
    """
    n = len(sig_matrix)
    resh = sig_matrix.astype(np.uint64).reshape(n, bands, rows_per_band)
    acc = np.broadcast_to(
        splitmix64(np.arange(1, bands + 1, dtype=np.uint64))[None, :], (n, bands)
    ).copy()
    with np.errstate(over="ignore"):
        for j in range(rows_per_band):
            acc = splitmix64(acc ^ resh[:, :, j])
    return (acc >> np.uint64(1)).astype(np.int64)


def minhash_sig_bands_udf(num_perm: int = 128, k: int = 5, seed: int = 42,
                          bands: int = 32):
    """pandas UDF: text → struct(signature array<int>, bands array<long>).

    One shingle pass computes BOTH the MinHash signature and its LSH
    band-bucket hashes; downstream banding is then a plain (codegen'd)
    ``explode`` of the bands column — no interpreted HOF in the hot path.

    Signatures are 32-bit end to end (see :func:`perm_constants`):
    half the bytes through the multiply/min kernel, the Arrow return
    batches, the signature scratch table, and the verification joins —
    all of which are memory-bandwidth-bound before they are CPU-bound.
    """
    consts = perm_constants(num_perm, seed)
    r = num_perm // bands

    @F.pandas_udf(T.StructType([
        T.StructField("signature", T.ArrayType(T.IntegerType())),
        T.StructField("bands", T.ArrayType(T.LongType())),
    ]))
    def sig_bands(texts: pd.Series) -> pd.DataFrame:
        n = len(texts)
        sigs = np.empty((n, num_perm), dtype=np.int32)
        sig = np.empty(num_perm, dtype=np.uint32)
        buf = np.empty((_PERM_CHUNK, 4096), dtype=np.uint32)
        with np.errstate(over="ignore"):
            for row, t in enumerate(texts):
                h = (shingle_hashes(t, k) >> np.uint64(32)).astype(np.uint32)
                m = h.size
                if m > buf.shape[1]:
                    buf = np.empty((_PERM_CHUNK, m), dtype=np.uint32)
                for i in range(0, num_perm, _PERM_CHUNK):
                    c = consts[i : i + _PERM_CHUNK]
                    np.multiply(c[:, None], h[None, :], out=buf[: len(c), :m])
                    sig[i : i + len(c)] = buf[: len(c), :m].min(axis=1)
                sigs[row] = sig.astype(np.int32)
        bh = band_hashes(sigs, bands, r) if n else np.empty((0, bands), np.int64)
        return pd.DataFrame({"signature": list(sigs), "bands": list(bh)})

    return sig_bands


def minhash_signature_udf(num_perm: int = 128, k: int = 5, seed: int = 42):
    """pandas UDF: text → array<int> signature of length ``num_perm``
    (32-bit permutation family, identical values to the combined
    signature+bands UDF)."""
    consts = perm_constants(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def minhash(texts: pd.Series) -> pd.Series:
        out = []
        sig = np.empty(num_perm, dtype=np.uint32)
        buf = np.empty((_PERM_CHUNK, 4096), dtype=np.uint32)  # reused, L2-resident
        with np.errstate(over="ignore"):
            for t in texts:
                h = (shingle_hashes(t, k) >> np.uint64(32)).astype(np.uint32)
                m = h.size
                if m > buf.shape[1]:
                    buf = np.empty((_PERM_CHUNK, m), dtype=np.uint32)
                for i in range(0, num_perm, _PERM_CHUNK):
                    c = consts[i : i + _PERM_CHUNK]  # final chunk may be short
                    np.multiply(c[:, None], h[None, :], out=buf[: len(c), :m])
                    sig[i : i + len(c)] = buf[: len(c), :m].min(axis=1)
                out.append(sig.astype(np.int32))
        return pd.Series(out)

    return minhash


def signature_agreement(sig_a: Column, sig_b: Column, num_perm: int) -> Column:
    """Estimated Jaccard = fraction of agreeing signature positions.

    Pure Catalyst (``zip_with`` + ``aggregate``): verification of LSH
    candidate pairs never leaves the JVM.
    """
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return agree.cast("double") / F.lit(float(num_perm))


def exact_jaccard_udf(k: int = 5):
    """pandas UDF: (text_a, text_b) → true shingle Jaccard (for audits/tests)."""

    @F.pandas_udf(T.DoubleType())
    def jac(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a))
        for i, (x, y) in enumerate(zip(a, b)):
            sa, sb = set(shingle_set(x or "", k)), set(shingle_set(y or "", k))
            u = len(sa | sb)
            out[i] = (len(sa & sb) / u) if u else 1.0
        return pd.Series(out)

    return jac
