"""The literal north-rule launch shape: ``spark-submit --py-files``.

The other job tests run ``python jobs/neardup_job.py`` with the repo on
``sys.path`` — that exercises the pipeline but not the deployment
mechanism. Here the job script is copied OUTSIDE the repo and launched
with the real ``spark-submit`` binary, so ``doppel_spark`` is
importable ONLY from the ``--py-files`` zip (zipimport on the driver,
file distribution to executor Python workers). This is the test that
caught ``ship_package`` crashing when the package itself lives inside
a zip (``shutil.make_archive`` on a zip-internal path).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    # build the zip exactly as the README documents
    zip_path = tmp_path / "doppel_spark.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", str(zip_path), "doppel_spark"],
        cwd=REPO, check=True,
    )
    # copy the entrypoint out of the repo: its own sys.path bootstrap
    # then points at tmp_path's parent, so the repo checkout cannot
    # satisfy the import — only the --py-files zip can
    script = tmp_path / "neardup_job.py"
    shutil.copy(REPO / "jobs" / "neardup_job.py", script)
    out = tmp_path / "out"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_GRAFT_DRIVER_MEM="8g")
    env.pop("PYTHONPATH", None)  # belt and braces: no repo leakage
    r = subprocess.run(
        [SPARK_SUBMIT, "--py-files", str(zip_path), str(script),
         "--synth-docs", "150", "--output", str(out), "--mode", "both"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    summary = json.loads((out / "report.json").read_text())
    assert summary["mode"] == "both"
    # prove the package really came from the zip, not a stray checkout
    assert ".zip" in summary["package_origin"], summary["package_origin"]
    assert (out / "groups" / "_SUCCESS").exists()
    assert (out / "clusters" / "_SUCCESS").exists()
    assert (out / "pairs" / "_SUCCESS").exists()
