"""Interleaved fresh-JVM A/B: exact cross-snapshot anti-join vs the
broadcast-Bloom prefilter, in the regime the bloom exists for.

Scenario: a mostly-new crawl — ``incoming`` = the full synthetic pages
corpus, ``seen`` = the ~10% subset with ``pmod(xxhash64(url), 10) = 0``
(so ~90% of incoming content is genuinely new and pays the exact
path's anti-join shuffle only to match nothing). Broadcast joins are
DISABLED in both sides' sessions (``autoBroadcastJoinThreshold=-1``):
at the target scale the seen digest set is ~10¹² rows and never
broadcasts, while at probe scale it would — leaving AQE's broadcast on
would make the exact side unrepresentatively cheap and the comparison
dishonest in the bloom's favor... on the wrong axis (the bloom's win
is the shrunk anti-join LEFT side, not the join strategy).

Both sides end in ``count()`` of the surviving-id set and the blob
records the count — the sides must agree exactly (the operator's
contract), so a speed win can never hide a correctness drift.

Same protocol as ab_sig_transport.py: fresh JVM per rep, sides
alternate within each rep so a host-mode flip taxes both equally, a
Spark-free host probe brackets every sample.

Usage: python BENCH/probes/ab_bloom_prefilter.py [n_docs] [cpus] [reps]
Appends samples to .bench/ab_bloom_<docs>_<cpus>.json.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

SNIPPET = '''
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from doppel_spark.session import get_spark

cpus = {cpus}
spark = get_spark(app_name="ab_bloom", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(3 * cpus, 3),
                  extra_conf={{"spark.sql.autoBroadcastJoinThreshold": "-1"}})
pages = spark.read.parquet({corpus!r}).select("url", "text")
seen = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0)
incoming = pages

t0 = time.time()
if {side!r} == "bloom":
    from doppel_spark.operators.bloom import cross_snapshot_new_bloom
    out = cross_snapshot_new_bloom(incoming, seen, id_col="url",
                                   text_col="text", fpr=0.01)
else:
    from doppel_spark.operators.dedup import cross_snapshot_new
    out = cross_snapshot_new(incoming, seen, id_col="url", text_col="text")
n_new = out.select("url").count()
dt = time.time() - t0
print("RESULT " + json.dumps(dict(sec=round(dt, 3), n_new=n_new)))
'''


def host_probe() -> dict:
    import math
    t0 = time.time()
    x = 0.0
    for i in range(2_000_000):
        x += math.sin(i)
    cpu = time.time() - t0
    t0 = time.time()
    subprocess.run([sys.executable, "-c", "pass"], capture_output=True)
    spawn = time.time() - t0
    return {"cpu_sec": round(cpu, 3), "spawn_sec": round(spawn, 3)}


def ensure_corpus(corpus: str) -> None:
    if (Path(corpus) / "_SUCCESS").exists():
        return
    code = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
        "from doppel_spark.session import get_spark\n"
        "from doppel_spark.corpus import synth_pages\n"
        f"spark = get_spark(app_name='gen', master='local[{CPUS}]')\n"
        f"synth_pages(spark, {N}, num_partitions=64).write"
        f".mode('overwrite').parquet({corpus!r})\n")
    subprocess.run([sys.executable, "-c", code], check=True, timeout=3600)


def main() -> None:
    corpus = str(REPO / ".bench" / f"pages_{N}.parquet")
    ensure_corpus(corpus)
    blob = REPO / ".bench" / f"ab_bloom_{N}_{CPUS}.json"
    samples: list[dict] = (
        json.loads(blob.read_text())["samples"] if blob.exists() else [])

    for rep in range(REPS):
        for side in ("exact", "bloom"):
            probe = host_probe()
            code = SNIPPET.format(repo=str(REPO), cpus=CPUS,
                                  corpus=corpus, side=side)
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=7200)
            got = None
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    got = json.loads(line[len("RESULT "):])
            sample = {"side": side, "rep": rep, "probe": probe,
                      "result": got,
                      "err": None if got else out.stderr[-2000:]}
            samples.append(sample)
            blob.write_text(json.dumps(
                {"n_docs": N, "cpus": CPUS, "samples": samples}, indent=1))
            print(json.dumps(sample), flush=True)


if __name__ == "__main__":
    main()
