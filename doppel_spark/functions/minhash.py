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

Python touches each Arrow *batch* a constant number of times — zero
per-document Python (:func:`_batch_sig_matrix`); all inner math is
numpy uint64 with natural wraparound. :func:`token_hashes` /
:func:`shingle_hashes` remain as the per-document semantic spec the
batch kernel is asserted against in tests.

Short docs (< k tokens) shingle as their raw token set; empty docs get
the single empty-string shingle — every doc has a valid signature, so
the SimHash fallback is a recall supplement, not a crutch.
"""

from __future__ import annotations

import re

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



#: the ASCII-whitespace class EVERY tokenization path splits on — the
#: same six byte values as the kernel's ``_WS_BYTES`` LUT. Python's
#: ``str.split()`` (Unicode-aware) would additionally split on NBSP /
#: ideographic / thin spaces and silently diverge from the byte-level
#: kernel on such corpora; pinning the spec to the kernel's class closes
#: that fork (ADVICE r3 / verdict r4 task 4 — parity asserted in tests
#: on non-ASCII-whitespace text).
_WS_RE = re.compile("[\t\n\x0b\x0c\r ]+")


def ascii_ws_tokens(text: str) -> list[str]:
    """Tokens of ``text`` under the engine-wide ASCII-whitespace split
    (identical results to the kernel's byte LUT on any input)."""
    return [t for t in _WS_RE.split(text) if t]


def shingle_set(text: str, k: int) -> list[str]:
    """k-word shingles as strings (audit/test path; the signature UDF
    works on hashes directly). < k tokens → token set; empty → ['']."""
    toks = ascii_ws_tokens(text)
    if len(toks) >= k:
        return list({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})
    if toks:
        return list(set(toks))
    return [""]


#: byte-polynomial base for token hashing (odd ⇒ invertible mod 2^64)
_TOKEN_BASE = np.uint64(1099511628211)
_TOKEN_BASE_INV = np.uint64(pow(1099511628211, -1, 1 << 64))

#: ASCII whitespace byte values — the engine-wide separator class
#: (matches ``_WS_RE`` above; exotic Unicode whitespace is a token byte
#: everywhere, including the DuckDB oracles, which use the same explicit
#: class)
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


class _BufPool:
    """Per-worker buffer pool for the batch signature kernel.

    Spark's slow path here is not compute — it is memory management:
    numpy frees multi-MB buffers back to the OS (malloc → mmap →
    munmap), so every Arrow batch re-faults its working set, and on a
    hypervisor-shared host whose fresh-page faults can run ~20 MB/s
    (the measured slow co-tenant mode) that dominates the kernel by
    10×. Buffers here are allocated once per worker process and grown
    geometrically; steady state performs zero large allocations per
    batch. (``get_spark`` additionally raises the glibc mmap threshold
    for the allocations numpy makes on its own — boolean temps, fancy-
    indexing results — see session.py.)
    """

    def __init__(self) -> None:
        self.b: dict[str, np.ndarray] = {}

    def get(self, name: str, n: int, dtype) -> np.ndarray:
        a = self.b.get(name)
        if a is None or a.size < n or a.dtype != np.dtype(dtype):
            cap = max(n, int((a.size if a is not None else 0) * 1.5))
            a = np.empty(cap, dtype=dtype)
            self.b[name] = a
        return a[:n]


def _as_string_array(texts):
    """pandas Series OR pyarrow Array → a null-free ``pa.StringArray``.

    The pyarrow branch is the ``mapInArrow`` fast path: Spark's Arrow
    batch is used AS IS — no per-row Python string materialization (the
    pandas conversion allocates a PyUnicode per document, which round-4
    profiling showed dominates the signature stage's worker time).
    """
    import pyarrow as pa

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        arr = texts
        if pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.string())
        if arr.null_count:
            arr = pa.compute.fill_null(arr, "")
        return arr
    return pa.array(texts.fillna(""), type=pa.string())


def _batch_sig_matrix(texts, pool: _BufPool, consts: np.ndarray,
                      num_perm: int, k: int,
                      seg_shingles: int = 1 << 16,
                      perm_chunk: int = 8) -> np.ndarray:
    """(n_docs, num_perm) int32 signature matrix for a whole Arrow batch
    — value-identical to the per-doc spec (min over
    ``shingle_hashes(text, k) >> 32`` of ``const * h`` mod 2³²; asserted
    against it in tests) with ZERO per-document Python.

    The whole batch is processed as one byte array (pyarrow exposes the
    UTF-8 buffer + offsets): token spans come from one boolean pass with
    forced breaks at document boundaries; token hashes from one prefix
    polynomial over the batch (the span hash (P[e]−P[s])·B⁻ˢ is
    position-independent, so values equal the per-doc ones); shingle
    window hashes from k shifted multiply-adds, masked where a window
    crosses documents. Duplicate shingles are NOT deduplicated — min()
    is idempotent under duplicates, so ``np.unique``'s sort would be
    pure overhead. The multiply/min kernel then runs per L2-resident
    segment of whole documents (``seg_shingles``) × perm chunk:
    per-document numpy-call overhead (the old path's floor, ~25 calls
    per doc — 160–210 µs/doc on ~1.5 KB docs) amortizes to ~1 call per
    hundred documents. Measured: 3.0× on 1.5 KB crawl-shaped docs,
    4.6× on ~300-char docs, identical outputs.
    """
    n_docs = len(texts)
    if n_docs == 0:
        return np.empty((0, num_perm), dtype=np.int32)
    arr = _as_string_array(texts)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n_docs + 1]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    # A sliced array's offsets start at the slice's first data byte, not
    # at 0 — rebase both views so every span index below is relative to
    # the slice (ADVICE r4: without this, bytes of sliced-off rows became
    # phantom tokens and shifted every start/end index).
    base = int(offs[0])
    if base:
        offs = offs - base
    N = int(offs[-1])
    d = data[base : base + N]
    with np.errstate(over="ignore"):
        # token spans: whitespace split with forced breaks at doc edges
        is_tok = pool.get("is_tok", N, bool)
        np.take(_TOK_LUT, d, out=is_tok)
        prv = pool.get("prv", N, bool)
        if N:
            prv[0] = False
            prv[1:] = is_tok[:-1]
            prv[offs[:-1][offs[:-1] < N]] = False
        nxt = pool.get("nxt", N, bool)
        if N:
            nxt[-1] = False
            nxt[:-1] = is_tok[1:]
            last = offs[1:] - 1
            nxt[last[last >= 0]] = False
        np.logical_not(prv, out=prv)
        np.logical_and(is_tok, prv, out=prv)
        starts = np.nonzero(prv)[0]
        np.logical_not(nxt, out=nxt)
        np.logical_and(is_tok, nxt, out=nxt)
        ends = np.nonzero(nxt)[0] + 1
        # token hashes: one data-dependent prefix sum; the position
        # power tables are data-independent → computed once per worker
        full_pw = pool.b.get("pw")
        if full_pw is None or full_pw.size < N + 1:
            cap = max(N + 1, int((full_pw.size if full_pw is not None
                                  else 0) * 1.5))
            base = np.full(cap - 1, _TOKEN_BASE, dtype=np.uint64)
            full_pw = np.empty(cap, dtype=np.uint64)
            full_pw[0] = 1
            np.cumprod(base, out=full_pw[1:])
            base[:] = _TOKEN_BASE_INV
            full_ipw = np.empty(cap, dtype=np.uint64)
            full_ipw[0] = 1
            np.cumprod(base, out=full_ipw[1:])
            pool.b["pw"], pool.b["ipw"] = full_pw, full_ipw
        pw, ipw = pool.b["pw"], pool.b["ipw"]
        pre = pool.get("pre", N + 1, np.uint64)
        pre[0] = 0
        t64 = pool.get("t64", N, np.uint64)
        np.add(d, np.uint64(1), out=t64, casting="unsafe")
        np.multiply(t64, pw[:N], out=t64)
        np.cumsum(t64, out=pre[1:])
        nt = starts.size
        th = pool.get("th", nt, np.uint64)
        np.subtract(pre[ends], pre[starts], out=th)
        np.multiply(th, ipw[starts], out=th)
        # splitmix64 avalanche, in place
        zz = pool.get("zz", nt, np.uint64)
        np.add(th, _GOLDEN, out=th)
        np.right_shift(th, np.uint64(30), out=zz)
        np.bitwise_xor(th, zz, out=th)
        np.multiply(th, np.uint64(0xBF58476D1CE4E5B9), out=th)
        np.right_shift(th, np.uint64(27), out=zz)
        np.bitwise_xor(th, zz, out=th)
        np.multiply(th, np.uint64(0x94D049BB133111EB), out=th)
        np.right_shift(th, np.uint64(31), out=zz)
        np.bitwise_xor(th, zz, out=th)
        tok_doc = pool.get("tok_doc", nt, np.int64)
        tok_doc[:] = np.searchsorted(offs[1:], starts, side="right")
        tok_counts = pool.get("tok_counts", n_docs, np.int64)
        tok_counts[:] = 0
        np.add.at(tok_counts, tok_doc, 1)
        # shingle stream: window hashes (k shifted multiply-adds) where
        # the window stays inside one doc; short docs use raw token
        # hashes (set semantics — min ignores duplicates); empty docs
        # the single 0 hash (== shingle_hashes("") semantics)
        nw = max(nt - k + 1, 0)
        wh = pool.get("wh", nw, np.uint64)
        okm = pool.get("okm", nw, bool)
        if nw:
            wh[:] = th[:nw]  # j = 0 term: base**0 == 1
            for j in range(1, k):
                np.multiply(th[j : nw + j], _POLY_BASE ** np.uint64(j),
                            out=zz[:nw])
                np.add(wh, zz[:nw], out=wh)
            np.equal(tok_doc[:nw], tok_doc[k - 1 :], out=okm)
        shortm = pool.get("shortm", nt, bool)
        np.less(tok_counts[tok_doc], k, out=shortm)
        n_ok = int(okm.sum()) if nw else 0
        n_short = int(shortm.sum())
        emptym = tok_counts == 0
        n_empty = int(emptym.sum())
        S = n_ok + n_short + n_empty
        # docs-major assembly: all three streams are already doc-ordered,
        # one stable argsort on doc ids merges them
        sh = pool.get("sh", S, np.uint64)
        sd = pool.get("sd", S, np.int64)
        if nw:
            sh[:n_ok] = wh[okm]
            sd[:n_ok] = tok_doc[:nw][okm]
        sh[n_ok : n_ok + n_short] = th[shortm]
        sd[n_ok : n_ok + n_short] = tok_doc[shortm]
        if n_empty:
            sh[n_ok + n_short :] = 0
            sd[n_ok + n_short :] = np.nonzero(emptym)[0]
        order = np.argsort(sd, kind="stable")
        np.right_shift(sh, np.uint64(32), out=sh)
        h32 = pool.get("h32", S, np.uint32)
        h32[:] = sh[order]
        counts = pool.get("counts", n_docs, np.int64)
        counts[:] = 0
        np.add.at(counts, sd, 1)
        seg_starts = pool.get("segst", n_docs, np.int64)
        seg_starts[0] = 0
        np.cumsum(counts[:-1], out=seg_starts[1:])
        # multiply/min kernel over L2-resident whole-doc segments
        sigs = np.empty((n_docs, num_perm), dtype=np.int32)
        doc_lo = 0
        maxm = 0
        segs = []
        while doc_lo < n_docs:
            doc_hi = doc_lo
            lo_off = int(seg_starts[doc_lo])
            while doc_hi < n_docs and (
                (int(seg_starts[doc_hi]) + int(counts[doc_hi])) - lo_off
                <= seg_shingles or doc_hi == doc_lo
            ):
                doc_hi += 1
            hi_off = int(seg_starts[doc_hi]) if doc_hi < n_docs else S
            segs.append((doc_lo, doc_hi, lo_off, hi_off))
            maxm = max(maxm, hi_off - lo_off)
            doc_lo = doc_hi
        vals = pool.get("vals", perm_chunk * maxm, np.uint32) \
            .reshape(perm_chunk, -1)
        for doc_lo, doc_hi, lo_off, hi_off in segs:
            hseg = h32[lo_off:hi_off]
            m = hseg.size
            rstarts = seg_starts[doc_lo:doc_hi] - lo_off
            for i in range(0, num_perm, perm_chunk):
                c = consts[i : i + perm_chunk]
                np.multiply(c[:, None], hseg[None, :], out=vals[: len(c), :m])
                sigs[doc_lo:doc_hi, i : i + len(c)] = np.minimum.reduceat(
                    vals[: len(c), :m], rstarts, axis=1).T
    return sigs


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


#: packed-signature layout: ``num_perm`` little-endian int32 values per
#: row (4·num_perm bytes), row-major — the ONE representation every
#: producer emits and every consumer (JVM agreement, audits, tests)
#: reads. Chosen over ``array<int>`` because the Arrow return path of
#: the signature stage was the measured bottleneck at 3.6M docs
#: (BENCH/NOTES_r4.md): a binary cell crosses the worker pipe, the JVM's
#: Arrow→UnsafeRow conversion, the sigs scratch table, and the verify
#: join as ONE contiguous span instead of 128 typed elements.
SIG_BYTES_PER_PERM = 4


def unpack_signature(buf: bytes | bytearray) -> np.ndarray:
    """Packed signature cell → int32 vector (audit/test path)."""
    return np.frombuffer(bytes(buf), dtype="<i4")


def _packed_sig_arrow(sigs: np.ndarray, num_perm: int):
    """(n, num_perm) int32 matrix → pyarrow ``binary`` column, O(1)
    allocations per batch (offsets from one arange; the data buffer IS
    the kernel's output, zero-copy)."""
    import pyarrow as pa

    n = len(sigs)
    w = num_perm * SIG_BYTES_PER_PERM
    offs = pa.array(np.arange(0, (n + 1) * w, w, dtype=np.int32))
    return pa.Array.from_buffers(
        pa.binary(), n, [None, offs.buffers()[1],
                         pa.py_buffer(np.ascontiguousarray(sigs))])


def sig_bands_arrow_columns(texts, pool: _BufPool, consts: np.ndarray,
                            num_perm: int, k: int, bands: int):
    """texts (pa.Array or pd.Series) → (signature ``binary`` packed
    int32-LE, band_hashes ``list<int64>``) pyarrow columns.

    The return path is O(1) Python objects per BATCH: the signature
    column is the kernel's contiguous numpy output reinterpreted as one
    Arrow binary buffer, the band column its numpy output + arange
    offsets — no per-row Python objects, which the pandas-UDF return
    path pays for every document. Values are identical to
    :func:`minhash_sig_bands_udf` (same kernel, same packing).
    """
    import pyarrow as pa

    sigs = _batch_sig_matrix(texts, pool, consts, num_perm, k)
    n = len(sigs)
    bh = (band_hashes(sigs, bands, num_perm // bands) if n
          else np.empty((0, bands), np.int64))
    band_col = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * bands, bands, dtype=np.int32)),
        pa.array(bh.reshape(-1)))
    return _packed_sig_arrow(sigs, num_perm), band_col


def minhash_sig_bands_udf(num_perm: int = 128, k: int = 5, seed: int = 42,
                          bands: int = 32):
    """pandas UDF: text → struct(signature binary, bands array<long>).

    One shingle pass computes BOTH the MinHash signature and its LSH
    band-bucket hashes; downstream banding is then a plain (codegen'd)
    ``explode`` of the bands column — no interpreted HOF in the hot path.

    Signatures are 32-bit, binary-packed end to end (see
    :data:`SIG_BYTES_PER_PERM` and :func:`perm_constants`): half the
    bytes through the multiply/min kernel, and ONE contiguous cell —
    not 128 typed elements — through the Arrow return batches, the
    signature scratch table, and the verification joins, all of which
    are memory-bandwidth-bound before they are CPU-bound. The return
    here still pays one Python bytes object per document; the
    ``mapInArrow`` stage (lsh.signature_stage) is the zero-per-row
    transport the flagship uses.
    """
    consts = perm_constants(num_perm, seed)
    r = num_perm // bands
    w = num_perm * SIG_BYTES_PER_PERM
    pool = _BufPool()  # per-worker after cloudpickle deserialization

    @F.pandas_udf(T.StructType([
        T.StructField("signature", T.BinaryType()),
        T.StructField("bands", T.ArrayType(T.LongType())),
    ]))
    def sig_bands(texts: pd.Series) -> pd.DataFrame:
        sigs = _batch_sig_matrix(texts, pool, consts, num_perm, k)
        bh = (band_hashes(sigs, bands, r) if len(sigs)
              else np.empty((0, bands), np.int64))
        flat = np.ascontiguousarray(sigs).tobytes()
        return pd.DataFrame({
            "signature": [flat[i * w:(i + 1) * w] for i in range(len(sigs))],
            "bands": list(bh)})

    return sig_bands


def minhash_signature_udf(num_perm: int = 128, k: int = 5, seed: int = 42):
    """pandas UDF: text → binary signature of ``num_perm`` packed
    int32-LE values (identical packing to the combined
    signature+bands UDF)."""
    consts = perm_constants(num_perm, seed)
    w = num_perm * SIG_BYTES_PER_PERM
    pool = _BufPool()  # per-worker after cloudpickle deserialization

    @F.pandas_udf(T.BinaryType())
    def minhash(texts: pd.Series) -> pd.Series:
        sigs = _batch_sig_matrix(texts, pool, consts, num_perm, k)
        flat = np.ascontiguousarray(sigs).tobytes()
        return pd.Series([flat[i * w:(i + 1) * w] for i in range(len(sigs))])

    return minhash


def signature_agreement(sig_a: Column, sig_b: Column, num_perm: int) -> Column:
    """Estimated Jaccard = fraction of agreeing signature positions,
    over binary-packed signatures (4-byte little-endian cells).

    Pure Catalyst: per-position 4-byte ``substr`` + binary equality,
    emitted as a FLAT balanced sum of ``num_perm`` CASE terms rather
    than a higher-order ``aggregate`` over a position sequence — the
    HOF form is interpreted (lambda expressions take no part in
    whole-stage codegen) and was the dominant per-pair cost of the
    verify stage (r6: the flagship's ``pairs`` cut dropped ~3× after
    this rewrite). Same bytes compared, same integer sum, same final
    division — value-identical. Verification of LSH candidate pairs
    never leaves the JVM, and the pair join that feeds it moves one
    ~512-byte cell per side instead of a 128-element array.
    """
    four = F.lit(SIG_BYTES_PER_PERM)
    terms = [
        F.when(
            sig_a.substr(F.lit(j * SIG_BYTES_PER_PERM + 1), four)
            == sig_b.substr(F.lit(j * SIG_BYTES_PER_PERM + 1), four),
            1).otherwise(0)
        for j in range(num_perm)
    ]
    while len(terms) > 1:  # balanced tree: depth log2(num_perm), not num_perm
        terms = [terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
                 for i in range(0, len(terms), 2)]
    return terms[0].cast("double") / F.lit(float(num_perm))


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
