"""Interleaved fresh-JVM A/B of the MinHash signature-stage transport.

Settles BENCH/NOTES_r5.md's open item: is the packed-``binary``
signature column measurably faster through the ``mapInArrow`` stage
than the round-4 ``list<int32>`` layout, or was the observed ~15% gap
host noise?  Both sides run the SAME kernel
(``minhash._batch_sig_matrix`` + ``band_hashes``) over the SAME corpus
bytes with the SAME ``mapInArrow`` entry; the ONLY difference is how
the signature column is assembled for the Arrow return batch:

* ``binary`` — the shipped ``lsh.signature_stage``: the kernel's
  (n, num_perm) int32 output reinterpreted as one Arrow binary buffer
  (``minhash._packed_sig_arrow``, zero-copy, O(1) allocations/batch).
* ``list``  — the round-4 layout: the same matrix as
  ``list<int32>`` via ``ListArray.from_arrays`` (also O(1)
  allocations/batch — this isolates the *byte layout / element-typing*
  cost in Spark's Arrow reader and the downstream row width, NOT
  per-row Python, which neither side pays).

Each rep is a fresh JVM (subprocess) so no JIT/cache state leaks
across sides; sides alternate so a host-mode flip hits both equally;
a Spark-free host probe brackets every rep (cpu busy-loop + process
spawn — this box's slow mode is dispatch/spawn latency,
BENCH/NOTES_r5.md). The stage executes via the noop sink. Value
identity of the two layouts is covered by unit tests (same kernel,
same bytes — tests/test_minhash_batch.py) and by the flagship's
cross-level pair/cluster identity assertions.

Usage: python BENCH/probes/ab_sig_transport.py [n_docs] [cpus] [reps]
Writes every sample to .bench/ab_sig_transport_<docs>_<cpus>.json.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3_600_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5

SNIPPET = '''
import json, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
from pyspark.sql import functions as F, types as T
from doppel_spark.session import get_spark
from doppel_spark.config import NearDupConfig
from doppel_spark.operators.lsh import signature_stage

cpus = {cpus}
spark = get_spark(app_name="ab_sig", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(3 * cpus, 3))
pages = spark.read.parquet({corpus!r}).select("url", "text")
cfg = NearDupConfig()

if {transport!r} == "binary":
    sig = signature_stage(pages, cfg)
else:
    # round-4 layout: identical kernel + mapInArrow entry, signature
    # returned as list<int32> instead of one packed binary cell.
    from doppel_spark.functions.minhash import (
        _BufPool, perm_constants, _batch_sig_matrix, band_hashes)
    consts = perm_constants(cfg.num_perm, cfg.seed)
    num_perm, k, bands = cfg.num_perm, cfg.shingle_k, cfg.bands
    out_schema = T.StructType([
        pages.schema["url"],
        T.StructField("signature", T.ArrayType(T.IntegerType())),
        T.StructField("band_hashes", T.ArrayType(T.LongType())),
    ])
    def gen(batches):
        import pyarrow as pa
        pool = _BufPool()
        for batch in batches:
            sigs = _batch_sig_matrix(batch.column(1), pool, consts,
                                     num_perm, k)
            n = len(sigs)
            bh = (band_hashes(sigs, bands, num_perm // bands) if n
                  else np.empty((0, bands), np.int64))
            sig_col = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * num_perm, num_perm,
                                   dtype=np.int32)),
                pa.array(np.ascontiguousarray(sigs).reshape(-1)))
            band_col = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * bands, bands,
                                   dtype=np.int32)),
                pa.array(bh.reshape(-1)))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), sig_col, band_col],
                names=["url", "signature", "band_hashes"])
    sig = pages.mapInArrow(gen, out_schema)

t0 = time.time()
sig.write.format("noop").mode("overwrite").save()
dt = time.time() - t0
print("RESULT " + json.dumps(dict(sec=round(dt, 3))))
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


def main() -> None:
    corpus = str(REPO / ".bench" / f"pages_{N}.parquet")
    blob = REPO / ".bench" / f"ab_sig_transport_{N}_{CPUS}.json"
    samples: list[dict] = (
        json.loads(blob.read_text())["samples"] if blob.exists() else [])

    for rep in range(REPS):
        for transport in ("binary", "list"):
            probe = host_probe()
            code = SNIPPET.format(repo=str(REPO), cpus=CPUS,
                                  corpus=corpus, transport=transport)
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=7200)
            got = None
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    got = json.loads(line[len("RESULT "):])
            if got is None:
                print(f"rep{rep} {transport}: FAILED exit "
                      f"{out.returncode}\n{out.stderr[-2000:]}", flush=True)
                continue
            rec = dict(rep=rep, transport=transport, sec=got["sec"],
                       probe_before=probe, probe_after=host_probe(),
                       ts=round(time.time(), 1))
            samples.append(rec)
            blob.write_text(json.dumps(
                {"docs": N, "cpus": CPUS, "samples": samples}, indent=1))
            print(f"rep{rep} {transport}: {got['sec']}s "
                  f"probe {probe} -> {rec['probe_after']}", flush=True)

    by = {t: sorted(s["sec"] for s in samples if s["transport"] == t)
          for t in ("binary", "list")}
    print("SUMMARY " + json.dumps({
        "best": {t: (v[0] if v else None) for t, v in by.items()},
        "raws": by}), flush=True)


if __name__ == "__main__":
    main()
