"""Heavy-hitters sketch — bounded-memory frequent-item detection.

The 100 TB question "which tokens / lines / hosts dominate this
corpus?" is a top-frequency query whose exact groupBy answer costs a
shuffle proportional to the DISTINCT-key count (billions of tokens,
trillions of lines). The classic sketch answer is **Misra–Gries**
(Misra & Gries 1982; mergeable-summaries formulation Agarwal et al.,
PODS 2012 — both public): a size-``k`` counter summary per partition,
merged by counter addition + the subtract-(k+1)-th-largest cap, with
the guarantee that every item of true frequency > n/k SURVIVES and no
counter overestimates.

Spark-first shape, three stages:

1. **Per-partition summaries** (``mapInPandas``): each Arrow batch is
   counted vectorized (``value_counts``) and folded into the running
   size-``k`` summary — the sequential-per-item textbook loop never
   runs; per task the state is O(k). Each partition emits ≤ k counter
   rows + one count row (its row total, under the NULL key).
2. **Candidate consolidation**: the summaries frame is tiny
   (≤ (k+1) × partitions rows), one groupBy(key) away from the global
   candidate set. The MG merge guarantee makes this set a SUPERSET of
   the true heavy hitters — undercount is bounded by Σᵢ nᵢ/(k+1) <
   n/k, so a true > n/k item cannot reach zero.
3. **Exact recount** of candidates only: broadcast semi-join prunes
   the stream to candidate rows, an exact groupBy counts them, and the
   strict integer threshold ``count · k > n`` keeps exactly the TRUE
   heavy hitters — so the operator's OUTPUT is exact and
   deterministic (DuckDB oracle: ``HAVING count(*) * k > total``,
   query ``heavy_hitters_planted``) while the intermediate state is
   sketch-bounded. The second pass moves only candidate rows
   (≤ k·P distinct keys) through the shuffle, never the vocabulary.

Reference tie: doppel's size-then-hash funnel prunes with a cheap
signal before the expensive pass (/root/reference/internal/finder/
finder.go:47-96); the sketch is that funnel for frequency — a bounded
summary decides WHO gets exactly counted.
"""

from __future__ import annotations

import heapq
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: summaries-frame schema: counter rows (key, cnt) + one per-partition
#: row-count row under key NULL (feeds the global n for the threshold)
_SUMMARY_SCHEMA = "key string, cnt long"


def _mg_fold(counter: dict, add: dict, k: int) -> dict:
    """Fold ``add`` (exact batch counts) into a size-``k`` MG summary.

    Counter addition, then — when over k entries — subtract the
    (k+1)-th largest value from every counter and drop the ≤ 0 ones:
    the mergeable-summaries cap, which removes ≥ 1 entry, undercounts
    every survivor equally, and never overcounts anything.
    """
    for key, c in add.items():
        counter[key] = counter.get(key, 0) + int(c)
    if len(counter) > k:
        kth = heapq.nlargest(k + 1, counter.values())[-1]
        counter = {x: c - kth for x, c in counter.items() if c > kth}
    return counter


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 1000,
) -> DataFrame:
    """Items of ``key_col`` with true frequency STRICTLY above n/k.

    Returns ``(key, n_exact)`` — exact counts, exactly the true
    heavy-hitter set (see module docstring; the sketch bounds memory
    and shuffle, the recount pass restores exactness). NULL keys are
    ignored (they are the summary's row-count channel). ``k`` trades
    summary size for threshold resolution: state is O(k) per task and
    the candidate set ≤ k × partitions.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keyed = df.select(F.col(key_col).cast("string").alias("key")) \
        .filter(F.col("key").isNotNull())

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counter: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            counter = _mg_fold(counter, pdf["key"].value_counts().to_dict(), k)
        if n_rows:
            yield pd.DataFrame(
                {"key": list(counter) + [None],
                 "cnt": [int(c) for c in counter.values()] + [n_rows]})

    summaries = keyed.mapInPandas(summarize, _SUMMARY_SCHEMA)
    # tiny frame: <= (k+1) rows per partition. Candidates = merged
    # counter keys; n = the NULL-key channel's sum.
    merged = summaries.groupBy("key").agg(F.sum("cnt").alias("cnt"))
    candidates = merged.filter(F.col("key").isNotNull()).select("key")
    total = merged.filter(F.col("key").isNull()) \
        .select(F.col("cnt").alias("_n"))

    exact = (
        keyed.join(F.broadcast(candidates), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    # strict integer threshold: n_exact * k > n — exact in any engine
    return (
        exact.join(F.broadcast(total), F.lit(True))
        .filter(F.col("n_exact") * F.lit(k) > F.col("_n"))
        .select("key", "n_exact")
    )
