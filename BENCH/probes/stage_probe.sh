#!/bin/bash
TREE=$1; N=${2:-600000}; CPUS=${3:-4}
DOPPEL_STAGE_TIMING=1 python - "$TREE" "$N" "$CPUS" <<'PY'
import json, subprocess, sys, time, os
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
t1 = time.time()
n_pairs = res.pairs.count()
t2 = time.time()
n_clusters = res.clusters.select("cluster_rep").distinct().count()
t3 = time.time()
print("PHASES " + json.dumps(dict(build_and_cuts=round(t1-t0,2),
      pairs_count=round(t2-t1,2), cc=round(t3-t2,2),
      total=round(t3-t0,3), pairs=n_pairs, clusters=n_clusters)))
"""
env = dict(os.environ, DOPPEL_STAGE_TIMING="1")
out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=7200, env=env)
for line in out.stdout.splitlines():
    if line.startswith(("STAGE", "PHASES")):
        print(tree.split('/')[-1], line, flush=True)
if "PHASES" not in out.stdout:
    print(tree, "FAILED", out.returncode, out.stderr[-1500:])
PY
