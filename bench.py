"""Benchmark harness — one JSON line per run (driver contract).

Times the headline queries from ``__spark_entry__`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, plus the flagship near-dup pipeline over
a deterministic synthetic pages corpus (the target workload shape —
sf-dir document tables are too small to exercise the shuffle paths).

Noise protocol (round-4 verdict task 1): the host shows bimodal
co-tenant noise up to 2× (BENCH/BASELINE.md), so a single-shot number
cannot distinguish a regression from a slow host window. Every query
runs ``$SPARK_GRAFT_BENCH_REPEATS`` (default 3) times, **interleaved**
(sweep all queries, then sweep again — so a noise mode hits all queries
of a sweep equally instead of one query's only sample); the headline
``queries`` map reports per-query best-of, and ALL raw times are
disclosed in ``queries_raw``. Between sweeps the Spark cache is cleared
and the flagship's materializer is released — Spark's cache manager
matches identical analyzed plans, so without this, repeats 2+ would
measure cache hits, not the engine. Flagship pair/cluster counts are
asserted identical across repeats (determinism canary).

Each query executes fully via the noop sink (no collect, no driver
materialization). Output:

    {"metric": "...", "value": <sum of per-query bests>, "unit": "sec",
     "queries": {...}, "queries_raw": {...}, "sf": ...,
     "docs_per_sec": ..., ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from doppel_spark.session import get_spark  # noqa: E402

#: benched subset of queries(): the representative operators; the rest
#: are covered by the correctness gate and share these code paths.
HEADLINE = [
    "exact_dup_members",
    "exact_dup_members_planted",
    "exact_dup_report",
    "dedup_keep_first",
    "token_stats",
    "quality_scores",
    "lang_id",
    "ann_topk",
    "orders_by_segment",
    "lineitem_pricing",
    "minhash_lsh_clusters",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "emb_neardup_lsh",
    "doc_fingerprints",
    "substring_pairs",
    "line_dedup_docs",
    "decontamination_report",
    # round-5 additions (BENCH/NOTES_r5.md "headline set history"):
    # the set grew 18 → 24, so compare BENCH_r05 to earlier rounds
    # per-query, not by the `value` total.
    "url_canonical_dups",
    "incremental_new_docs",
    "host_link_edges",
    "pii_redaction",
    "packed_sequences",
    "gopher_filter",
    # late round-5 additions (set now 26): the two new data ops with
    # non-trivial plans — normalization is a udf canary-class pass,
    # compaction is layout-not-compute; both stay correctness-only.
    "paragraph_dedup_docs",
    "boilerplate_lines",
]

FLAGSHIP_DOCS = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_DOCS", "20000"))
REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))


def _execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def host_probe() -> dict:
    """Spark-free snapshot of the host's two noise axes, ~2 s total.

    This box's co-tenant slow mode is **per-task-dispatch / process-
    spawn latency**, not CPU throughput (BENCH/NOTES_r5.md): a probe
    pair taken before and after the sweeps lets a reader tell "engine
    regressed" from "host was in the slow mode" without re-running
    anything. ``cpu_sec`` = fixed integer busy loop (flat across modes);
    ``spawn_sec`` = 3 × fork/exec of a no-op interpreter (inflates
    10–40× in the slow mode, the same axis that taxes Spark task
    dispatch and Python-worker startup).
    """
    t0 = time.time()
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 1_000_003 + i) & 0xFFFFFFFFFFFF
    cpu = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        subprocess.run([sys.executable, "-c", "pass"], check=True,
                       capture_output=True)
    spawn = time.time() - t0
    return {"cpu_sec": round(cpu, 3), "spawn_sec": round(spawn, 3),
            "acc": acc}


def flagship_neardup(spark, n_docs: int) -> dict:
    """Near-dup clustering over the synthetic pages corpus, timed.

    The corpus parquet is generated once per size (partition count fixed
    so the input bytes are identical across parallelism levels). The
    run's materialized stages are released afterwards so a repeat
    measures a fresh pipeline, not the previous run's caches.
    """
    from doppel_spark.config import NearDupConfig
    from doppel_spark.corpus import synth_pages
    from doppel_spark.operators.neardup import near_dup_pipeline

    path = str(Path(__file__).resolve().parent / ".bench" / f"pages_{n_docs}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_pages(spark, n_docs, num_partitions=64).write.mode("overwrite").parquet(path)

    pages = spark.read.parquet(path)
    t0 = time.time()
    res = near_dup_pipeline(pages, NearDupConfig())
    n_pairs = res.pairs.count()
    n_clusters = res.clusters.select("cluster_rep").distinct().count()
    dt = time.time() - t0
    res.cleanup()  # outside the timed region; enables honest repeats
    return {"sec": round(dt, 3), "docs": n_docs, "pairs": n_pairs,
            "clusters": n_clusters, "docs_per_sec": round(n_docs / dt, 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    probe_before = host_probe()
    spark = get_spark(app_name="doppel_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = entrymod.queries()

    # warmup: touch inputs so first-query timing isn't file-listing noise
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    raw: dict[str, list[float]] = {n: [] for n in HEADLINE}
    raw["flagship_neardup"] = []
    flag_best: dict | None = None
    flag_outputs = set()
    for _rep in range(REPEATS):
        for name in HEADLINE:
            t0 = time.time()
            _execute(qs[name](spark, sf_dir))
            raw[name].append(round(time.time() - t0, 3))
        flag = flagship_neardup(spark, FLAGSHIP_DOCS)
        raw["flagship_neardup"].append(flag["sec"])
        flag_outputs.add((flag["pairs"], flag["clusters"]))
        if flag_best is None or flag["sec"] < flag_best["sec"]:
            flag_best = flag
        # identical analyzed plans re-hit Spark's cache manager across
        # sweeps — drop everything so repeat N measures the engine
        spark.catalog.clearCache()
    assert len(flag_outputs) == 1, f"flagship nondeterminism: {flag_outputs}"

    timings = {name: min(ts) for name, ts in raw.items()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "doppel_spark headline queries + flagship near-dup wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_raw": raw,
        "repeats": REPEATS,
        "policy": "interleaved sweeps, per-query best-of, all raws disclosed",
        "sf": sf,
        "cpus": cpus,
        "sf_docs": n_docs,
        "flagship": {**flag_best, "raw_sec": raw["flagship_neardup"]},
        "docs_per_sec": flag_best["docs_per_sec"],
        # host-mode snapshot (see host_probe): spawn_sec >> ~0.1 means
        # the co-tenant slow mode was active and walls here overstate
        # engine cost — read queries_raw best-of, not single samples
        "host_probe": {"before": probe_before, "after": host_probe()},
    }))


if __name__ == "__main__":
    main()
