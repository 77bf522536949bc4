"""SimHash 64-bit fingerprints + Hamming-pigeonhole candidate keys.

North-rule extension: the fallback near-dup signal for docs where
word-shingle MinHash is weak (short docs, heavy token reuse). A doc's
SimHash is the sign-vector of the weighted sum of its token hashes'
bit-vectors; near-dup docs differ in few bits.

Candidate generation uses the standard pigeonhole trick: split the 64
bits into ``hamming_t + 1`` blocks — two fingerprints within Hamming
distance t must agree **exactly** on at least one block, so grouping by
(block_id, block_value) finds all candidates with equi-join machinery
(same shape as LSH banding; no pairwise scan). Verification is
``bit_count(a ^ b) <= t`` — a single JVM expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIMHASH_BITS = 64


def simhash_udf(ngram: int = 1):
    """pandas UDF: text → int64 SimHash over token (or token-n-gram) features.

    Vectorized per doc: token hashes via pandas SipHash (C), bit matrix
    via numpy unpack, weighted by token frequency.
    """

    @F.pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        bit_idx = np.arange(SIMHASH_BITS, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if ngram > 1 and len(toks) >= ngram:
                toks = [" ".join(toks[j : j + ngram]) for j in range(len(toks) - ngram + 1)]
            if not toks:
                out[i] = 0
                continue
            feats, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            h = pd.util.hash_array(feats)  # (n_feat,) uint64
            bits = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
            v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)  # weighted ±1 sums
            fp = np.uint64(0)
            for j in range(SIMHASH_BITS):
                if v[j] > 0:
                    fp |= np.uint64(1) << np.uint64(j)
            out[i] = fp.astype(np.int64).item() if hasattr(fp, "astype") else int(fp)
        return pd.Series(out)

    return simhash


def simhash_block_keys(fp: Column, hamming_t: int = 3) -> Column:
    """array of (hamming_t+1) block keys; equal fp block ⇒ same key.

    Each element packs (block_id << 56) | block_bits so a single long
    column can be exploded and grouped on directly.
    """
    n_blocks = hamming_t + 1
    width = SIMHASH_BITS // n_blocks
    keys = []
    for blk in range(n_blocks):
        shift = blk * width
        w = width if blk < n_blocks - 1 else SIMHASH_BITS - shift
        mask = F.lit((1 << w) - 1)
        block_bits = F.shiftrightunsigned(fp, shift).bitwiseAND(mask)
        keys.append(block_bits.bitwiseOR(F.lit(blk << 56)))
    return F.array(*keys)


def hamming_distance(a: Column, b: Column) -> Column:
    """bit_count(a XOR b) — one JVM expression."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame, id_col: str = "url", fp_col: str = "simhash",
    hamming_t: int = 3, bucket_cap: int = 256,
) -> DataFrame:
    """All pairs within Hamming distance t, via pigeonhole block grouping.

    Output: (url_a, url_b, hamming int). Exhaustive for distance ≤ t
    (pigeonhole guarantee). Buckets larger than ``bucket_cap`` fall back
    to star pairing around the smallest member (connectivity preserved,
    O(n) pairs) — the same skew guard as the LSH tier.
    """
    from doppel_spark.operators.lsh import pairs_from_buckets  # shared shape
    from doppel_spark.operators.stage import StageMaterializer

    # Cut the fingerprint table first: the caller's ``df`` usually
    # carries the SimHash UDF in its lineage, and everything below
    # (block-key explosion → bucket membership → verify joins) would
    # otherwise re-run that UDF once per evaluation path.
    mat = StageMaterializer.for_input(df, prefix="simhash")
    fps = mat.cut(df.select(F.col(id_col), F.col(fp_col)), "fps")
    exploded = fps.select(
        F.col(id_col), F.col(fp_col),
        F.explode(simhash_block_keys(F.col(fp_col), hamming_t)).alias("block_key"),
    )
    pairs = pairs_from_buckets(exploded, key_cols=["block_key"], id_col=id_col,
                               bucket_cap=bucket_cap, mat=mat)
    a = fps.select(F.col(id_col).alias("url_a"), F.col(fp_col).alias("fp_a"))
    b = fps.select(F.col(id_col).alias("url_b"), F.col(fp_col).alias("fp_b"))
    return (
        pairs.join(a, "url_a").join(b, "url_b")
        .withColumn("hamming", hamming_distance(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= hamming_t)
        .select("url_a", "url_b", "hamming")
    )
