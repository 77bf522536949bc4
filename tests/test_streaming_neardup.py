"""Stateful streaming near-dup (streaming/neardup_stream.py).

Planted construction reused from the batch planted-cluster queries:
a group's members are the SAME 12-token base repeated m = 2/3/4 times
— identical shingle sets ⇒ identical signatures ⇒ identical band
hashes ⇒ every in-group pair verified at agreement = num_perm, while
disjoint-stem singletons must never pair (see
__spark_entry__._q_minhash_clusters_planted for the math)."""

from __future__ import annotations

import hashlib
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from doppel_spark.config import NearDupConfig
from doppel_spark.streaming.neardup_stream import incremental_neardup_stream

pytestmark = pytest.mark.usefixtures("spark")


def _planted_rows(groups: int, singletons: int):
    rows = []
    for g in range(groups):
        stem = hashlib.md5(f"g{g}".encode()).hexdigest()
        base = " ".join(f"{stem}t{i}" for i in range(12))
        for m in (2, 3, 4):
            rows.append((f"mh:{g:02d}:{m}", (base + " ") * m))
    for s in range(singletons):
        stem = hashlib.md5(f"s{s}".encode()).hexdigest()
        rows.append((f"s:{s:02d}",
                     " ".join(f"{stem}u{i}" for i in range(12))))
    return rows


def _run_stream(spark, batches, tmp, cfg=None, **kw):
    """Write each batch as one parquet file, stream with
    maxFilesPerTrigger=1 so state must carry across micro-batches."""
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "url string, text string") \
            .coalesce(1).write.parquet(f"{tmp}/in/b{i}")
    stream = (spark.readStream.schema("url string, text string")
              .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in/*"))
    pairs = incremental_neardup_stream(stream, cfg or NearDupConfig(), **kw)
    name = f"ndp_{abs(hash(tmp)) % 10 ** 8}"
    q = (pairs.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", f"{tmp}/ck").start())
    q.awaitTermination(600)
    return spark.table(name)


def test_cross_batch_pairs_and_singletons(spark):
    """Members split across micro-batches still pair (state carries);
    singletons never appear; agreement is exactly num_perm."""
    rows = _planted_rows(3, 2)
    b0 = [r for r in rows if not r[0].endswith(":4")]
    b1 = [r for r in rows if r[0].endswith(":4")]
    tmp = tempfile.mkdtemp(prefix="ndstream_")
    try:
        out = _run_stream(spark, [b0, b1], tmp)
        got = {(a, b) for a, b in
               out.select("url_a", "url_b").distinct().collect()}
        want = {(f"mh:{g:02d}:{x}", f"mh:{g:02d}:{y}")
                for g in range(3) for x, y in ((2, 3), (2, 4), (3, 4))}
        assert got == want
        # identical shingle sets ⇒ full agreement on every emission
        assert out.filter(F.col("agree") != 128).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_state_cap_prunes_and_counts(spark):
    """state_cap=1: only the first member per bucket is stored, so a
    3-member group yields pairs against the first member only (2 pairs,
    not 3) — the cap prunes, it never crashes or silently re-adds."""
    rows = _planted_rows(1, 0)
    tmp = tempfile.mkdtemp(prefix="ndstream_")
    try:
        out = _run_stream(spark, [rows], tmp, state_cap=1)
        got = {(a, b) for a, b in
               out.select("url_a", "url_b").distinct().collect()}
        # arrival order within the single batch is plan-deterministic
        # (one input file, one partition): 2 then 3 then 4 ⇒ the stored
        # member is mh:00:2.
        assert got == {("mh:00:2", "mh:00:3"), ("mh:00:2", "mh:00:4")}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_pair_order_canonical(spark):
    """url_a < url_b on every output row regardless of arrival order."""
    rows = list(reversed(_planted_rows(2, 1)))
    tmp = tempfile.mkdtemp(prefix="ndstream_")
    try:
        out = _run_stream(spark, [rows], tmp)
        assert out.filter(F.col("url_a") >= F.col("url_b")).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_refetch_of_same_url_never_self_pairs(spark):
    """The same url arriving twice (a refetch) shares every band with
    itself — but (u, u) is not a pair: the batch tier's strict
    url_a < url_b can never produce it, and neither may the stream."""
    rows = _planted_rows(1, 0)  # one group: mh:00:2 / :3 / :4
    refetch = [rows[0]]  # mh:00:2 arrives again in a later batch
    tmp = tempfile.mkdtemp(prefix="doppel_ndp_")
    try:
        got = _run_stream(spark, [rows, refetch], tmp)
        pairs = {(r["url_a"], r["url_b"]) for r in got.collect()}
        assert all(a != b for a, b in pairs)
        # the true in-group pairs are still all there
        assert pairs == {("mh:00:2", "mh:00:3"), ("mh:00:2", "mh:00:4"),
                         ("mh:00:3", "mh:00:4")}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_state_survives_query_restart(spark):
    """The production crash story: run the query over batch 0, STOP it,
    then start a FRESH query on the same checkpoint over newly-arrived
    files — members seen before the restart must pair with members
    arriving after it (bucket state restored from the state store, not
    rebuilt from reprocessed input)."""
    rows = _planted_rows(2, 1)
    b0 = [r for r in rows if not r[0].endswith(":4")]
    b1 = [r for r in rows if r[0].endswith(":4")]
    tmp = tempfile.mkdtemp(prefix="ndstream_restart_")
    try:
        from doppel_spark.config import NearDupConfig

        cfg = NearDupConfig()

        def start():
            # file sink, not memory: only fault-tolerant sinks support
            # checkpoint recovery (exactly the production shape)
            stream = (spark.readStream.schema("url string, text string")
                      .option("maxFilesPerTrigger", 1)
                      .parquet(f"{tmp}/in/*"))
            pairs = incremental_neardup_stream(stream, cfg)
            return (pairs.writeStream.format("parquet")
                    .option("path", f"{tmp}/out")
                    .outputMode("append").trigger(availableNow=True)
                    .option("checkpointLocation", f"{tmp}/ck").start())

        spark.createDataFrame(b0, "url string, text string") \
            .coalesce(1).write.parquet(f"{tmp}/in/b0")
        q0 = start()
        q0.awaitTermination(600)  # availableNow: drains b0, then stops

        spark.createDataFrame(b1, "url string, text string") \
            .coalesce(1).write.parquet(f"{tmp}/in/b1")
        q1 = start()
        q1.awaitTermination(600)

        got = {(a, b) for a, b in spark.read.parquet(f"{tmp}/out")
               .select("url_a", "url_b").distinct().collect()}
        # run 1 emits each group's (2,3); run 2's :4 member pairs with
        # BOTH pre-restart members — only possible if their signatures
        # were restored from the state store across the restart
        want = {(f"mh:{g:02d}:{x}", f"mh:{g:02d}:{y}")
                for g in range(2) for x, y in ((2, 3), (2, 4), (3, 4))}
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
