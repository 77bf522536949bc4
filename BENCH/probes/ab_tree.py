"""Interleaved fresh-JVM A/B of two source trees on the same corpus.

Falsifies "the slow campaign walls are host mode" against "the r5 tree
regressed at scale": run the identical flagship job from HEAD and from
the round-4 end-of-round tree (.bench/r4tree), alternating, same
corpus, same level, fresh JVM each. Same-window samples carry the
comparison; pairs/clusters must match across trees.

Usage: python .bench/ab_tree.py [n_docs] [cpus] [reps]
"""
import json
import subprocess
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

SNIPPET = """
import json, sys, time
sys.path.insert(0, {tree!r})
from doppel_spark.session import get_spark
from doppel_spark.config import NearDupConfig
from doppel_spark.operators.neardup import near_dup_pipeline
cpus = {cpus}
spark = get_spark(app_name="ab_tree", master=f"local[{cpus}]",
                  shuffle_partitions=max(3 * cpus, 3))
pages = spark.read.parquet({corpus!r})
n_docs = pages.count()
t0 = time.time()
res = near_dup_pipeline(pages, NearDupConfig())
n_pairs = res.pairs.count()
n_clusters = res.clusters.select("cluster_rep").distinct().count()
dt = time.time() - t0
print("RESULT " + json.dumps(dict(sec=round(dt, 3), docs=n_docs,
      pairs=n_pairs, clusters=n_clusters)))
"""

TREES = {"head": "/root/repo", "r4": "/root/repo/.bench/r4tree"}
corpus = f"/root/repo/.bench/pages_{N}.parquet"

for rep in range(REPS):
    for name, tree in TREES.items():
        code = SNIPPET.format(tree=tree, cpus=CPUS, corpus=corpus)
        t0 = time.time()
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=7200)
        got = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                got = json.loads(line[len("RESULT "):])
        if got is None:
            print(f"rep{rep} {name}: FAILED exit {out.returncode}\n"
                  + out.stderr[-2000:], flush=True)
            continue
        print(f"rep{rep} {name}: {got['sec']}s pairs={got['pairs']} "
              f"clusters={got['clusters']} (wall {time.time()-t0:.0f}s)",
              flush=True)
