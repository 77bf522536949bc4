"""Incremental (streaming) exact dedup over arriving page batches.

The reference — and the north rule — are batch; this module is the
*incremental ingest* complement: as new crawl segments land, emit only
pages whose content digest hasn't been seen inside the watermark
horizon. Built on Structured Streaming's ``dropDuplicatesWithinWatermark``
so state is bounded: a digest seen longer ago than the watermark can
re-emit (at 10¹² docs, unbounded digest state is not an option — the
batch pipeline remains the source of truth for global dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from doppel_spark.functions.digests import full_digest


def incremental_exact_dedup_stream(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """streaming DataFrame → first-seen rows per content digest.

    Input must be a streaming DataFrame (``spark.readStream``). Output
    keeps the input schema + ``digest``.
    """
    return (
        stream.withColumn("digest", full_digest(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )
