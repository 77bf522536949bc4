#!/bin/bash
# usage: probe_tree.sh <treepath> [n] [cpus]
TREE=$1; N=${2:-600000}; CPUS=${3:-4}
python - "$TREE" "$N" "$CPUS" <<'PY'
import json, subprocess, sys, time
tree, N, CPUS = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
code = f"""
import json, sys, time
sys.path.insert(0, {tree!r})
from doppel_spark.session import get_spark
from doppel_spark.config import NearDupConfig
from doppel_spark.operators.neardup import near_dup_pipeline
spark = get_spark(app_name="probe", master="local[{CPUS}]",
                  shuffle_partitions=max(3 * {CPUS}, 3))
pages = spark.read.parquet("/root/repo/.bench/pages_{N}.parquet")
n_docs = pages.count()
t0 = time.time()
res = near_dup_pipeline(pages, NearDupConfig())
n_pairs = res.pairs.count()
n_clusters = res.clusters.select("cluster_rep").distinct().count()
print("RESULT " + json.dumps(dict(sec=round(time.time()-t0,3),
      pairs=n_pairs, clusters=n_clusters)))
"""
out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=7200)
for line in out.stdout.splitlines():
    if line.startswith("RESULT "):
        print(tree.split('/')[-1], line)
        break
else:
    print(tree, "FAILED", out.returncode, out.stderr[-1500:])
PY
