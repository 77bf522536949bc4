"""Streaming incremental NEAR-dup — stateful LSH over arriving pages.

The batch pipeline (operators/neardup.py) is the global source of
truth; this is its ingest-time complement, one tier above
``incremental_exact_dedup_stream``: as crawl segments arrive, each new
page's MinHash signature is banded and checked against the signatures
already seen in its LSH buckets, emitting verified near-dup pairs
(new doc × any earlier doc sharing a band) without re-running the
batch job. The reference has no streaming surface (doppel is a
one-shot scan, /root/reference/internal/scanner/scanner.go:32-107);
this generalizes its "cheap signal first, expensive confirmation
second" two-stage shape (size → quick hash → full hash,
/root/reference/internal/finder/finder.go:47-143) to a stateful
stream: band collision is the cheap signal, packed-signature agreement
the confirmation — both inside one stateful operator so only TRUE
pairs ever leave the stage.

Shape (all pre-state stages are stateless and streaming-safe):

    signature_stage (mapInArrow, zero per-doc Python)
      → band_keys explode               (id, band_hash) 16-byte rows
      → groupBy(band_hash)
      → applyInPandasWithState          state = bucket's seen members

Per-bucket state is ``(ids, packed int32-LE signatures, skipped)``.
Agreement is verified IN the stateful step (one vectorized numpy
compare of the new signature against the bucket matrix), so the output
stream carries only confirmed pairs. A pair sharing multiple bands is
emitted once per band — consumers dedupe by (url_a, url_b), exactly as
the batch tier's ``pairs_from_membership`` does with ``distinct()``;
pairs are emitted canonically ordered (url_a < url_b) so the output
SET is independent of arrival order within a micro-batch.

State bounding (the 10¹²-doc story): per-bucket membership is capped
(``state_cap``, the batch ``bucket_cap`` star-cap analog) — members
past the cap are compared against the stored prefix but NOT appended,
and are counted in the bucket's ``skipped`` tally so the cap is never
silent. Optionally a processing-time TTL evicts buckets idle longer
than ``ttl``; production deployments bound state by TTL + cap, and the
periodic batch job remains authoritative for anything evicted.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from doppel_spark.config import NearDupConfig
from doppel_spark.operators.lsh import signature_stage

#: output schema of the stateful step: verified pair + agreement count.
PAIR_SCHEMA = T.StructType([
    T.StructField("url_a", T.StringType()),
    T.StructField("url_b", T.StringType()),
    T.StructField("agree", T.LongType()),
])

#: per-bucket state: parallel arrays of member ids / packed signatures,
#: plus the count of members dropped by the cap (no silent caps).
STATE_SCHEMA = T.StructType([
    T.StructField("ids", T.ArrayType(T.StringType())),
    T.StructField("sigs", T.ArrayType(T.BinaryType())),
    T.StructField("skipped", T.LongType()),
])


def _pair_emitter(num_perm: int, min_agree: int, state_cap: int, ttl_ms: int):
    """Build the applyInPandasWithState function (closure over config).

    The compare is one ``(members, num_perm) == (num_perm,)`` numpy
    broadcast per arriving doc — vectorized over the bucket, zero
    per-signature Python. Members arriving in the same micro-batch see
    every member processed before them (the local arrays grow as the
    batch is consumed), so same-batch pairs are not missed.
    """

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL eviction: bucket idle longer than ttl — drop its
            # members (the batch tier remains authoritative).
            state.remove()
            return
        if state.exists:
            ids, sigs, skipped = state.get
            ids = list(ids)
            sigs = [bytes(s) for s in sigs]
            skipped = int(skipped)
        else:
            ids, sigs, skipped = [], [], 0

        def fold() -> np.ndarray | None:
            if not sigs:
                return None
            return (np.frombuffer(b"".join(sigs), dtype="<i4")
                    .reshape(len(sigs), num_perm))

        # `mat` holds the first n_mat members folded into one matrix;
        # members appended since the last fold sit in `pend` and are
        # compared as a small vstack. Folding per-append would be
        # O(members²) bytes per batch; this is O(members · num_perm)
        # amortized with a ≤64-row pending block.
        mat = fold()
        n_mat = len(sigs)
        pend: list[np.ndarray] = []
        out_a: list[str] = []
        out_b: list[str] = []
        out_n: list[int] = []

        def emit(other_idx: int, url: str, agree: int) -> None:
            other = ids[other_idx]
            if other == url:
                # a refetch of the same url is an exact-dup event for
                # the digest tier, not a near-dup PAIR — the batch tier
                # can never produce (u, u) (strict url_a < url_b,
                # lsh.py:180) and neither may the stream
                return
            a, b = sorted((other, url))
            out_a.append(a)
            out_b.append(b)
            out_n.append(agree)

        for pdf in pdfs:
            for url, sig in zip(pdf["url"], pdf["signature"]):
                sig = bytes(sig)
                vec = np.frombuffer(sig, dtype="<i4")
                if mat is not None and n_mat:
                    agree = (mat == vec).sum(axis=1)
                    for j in np.nonzero(agree >= min_agree)[0]:
                        emit(int(j), url, int(agree[j]))
                if pend:
                    agree = (np.vstack(pend) == vec).sum(axis=1)
                    for j in np.nonzero(agree >= min_agree)[0]:
                        emit(n_mat + int(j), url, int(agree[j]))
                if len(ids) < state_cap:
                    ids.append(url)
                    sigs.append(sig)
                    pend.append(vec)
                    if len(pend) >= 64:
                        mat = fold()
                        n_mat = len(sigs)
                        pend = []
                else:
                    skipped += 1

        state.update((ids, sigs, skipped))
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        if out_a:
            yield pd.DataFrame({"url_a": out_a, "url_b": out_b,
                                "agree": out_n})

    return fn


def incremental_neardup_stream(
    stream: DataFrame,
    cfg: NearDupConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    state_cap: int = 64,
    ttl: str | None = None,
) -> DataFrame:
    """streaming pages → streaming verified near-dup pairs.

    Input: a streaming DataFrame with at least (id_col, text_col).
    Output (update mode): ``(url_a, url_b, agree)`` — agree is the
    number of matching signature positions (≥ ``min_agree`` =
    ceil((threshold − margin) · num_perm), the batch verify bar). A
    pair sharing b bands appears up to b times; dedupe downstream by
    (url_a, url_b).

    ``ttl``: optional processing-time bucket TTL like ``"1 hour"``;
    None keeps buckets forever (contract/tests — bounded inputs).
    """
    cfg = cfg or NearDupConfig()
    min_agree = math.ceil(
        (cfg.jaccard_threshold - cfg.verify_margin) * cfg.num_perm)
    ttl_ms = 0
    if ttl is not None:
        # reuse Spark's interval parser via a literal cast at plan
        # time would need a session; accept "<n> <unit>" directly.
        n, unit = ttl.split()
        unit_ms = {"second": 1000, "seconds": 1000,
                   "minute": 60_000, "minutes": 60_000,
                   "hour": 3_600_000, "hours": 3_600_000}[unit]
        ttl_ms = int(n) * unit_ms

    sigs = signature_stage(
        stream.select(F.col(id_col).alias("url"), F.col(text_col)),
        cfg, id_col="url", text_col=text_col)
    # Unlike the batch tier's 16-byte (id, band_hash) rows, the
    # exploded row carries the packed signature (512 B at 128 perms):
    # the stateful verify needs it, and a stream-stream re-join to
    # fetch it later would cost a watermarked join state far larger
    # than the extra shuffle width here.
    exploded = sigs.select(
        "url", "signature", F.explode("band_hashes").alias("band_hash"))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms > 0
               else GroupStateTimeout.NoTimeout)
    return (
        exploded.groupBy("band_hash")
        .applyInPandasWithState(
            _pair_emitter(cfg.num_perm, min_agree, state_cap, ttl_ms),
            outputStructType=PAIR_SCHEMA,
            stateStructType=STATE_SCHEMA,
            # append, not update: a pair is emitted exactly once — at
            # the later member's arrival — and never revised, so rows
            # are final on emission (this also admits file sinks,
            # which reject update mode).
            outputMode="append",
            timeoutConf=timeout,
        )
    )
