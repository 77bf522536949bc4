"""Round-6 optimization harness — per-query isolation (guide §1).

NOT the driver bench (bench.py is frozen): this file exists so the
optimization round can (a) time an arbitrary subset of ``queries()``
through the noop sink with job descriptions set, and (b) dump
``.explain("formatted")`` for before/after plan evidence under
``plans/r06/``.

Usage:
    python bench_extra.py time  [query ...]   # default: HEADLINE set
    python bench_extra.py plans <tag> [query ...]  # writes plans/r06/<q>_<tag>.txt

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_REPEATS (default 2).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from doppel_spark.session import get_spark  # noqa: E402


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(app_name="doppel_spark_bench_extra",
                     master=f"local[{cpus}]", shuffle_partitions=cpus)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = _spark()
    qs = entrymod.queries()

    if mode == "plans":
        tag = sys.argv[2]
        names = sys.argv[3:] or HEADLINE
        outdir = Path(__file__).resolve().parent / "plans" / "r06"
        outdir.mkdir(parents=True, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (outdir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            print("wrote", name)
        return

    names = sys.argv[2:] or HEADLINE
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    raw: dict[str, list[float]] = {n: [] for n in names}
    for _rep in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"r06:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            raw[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
    best = {n: min(ts) for n, ts in raw.items()}
    print(json.dumps({"queries": best, "raw": raw,
                      "total_best": round(sum(best.values()), 3),
                      "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
