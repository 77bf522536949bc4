"""Small-file compaction — table maintenance for the scratch/output tier.

Every long-running pipeline accretes small files: per-partition stage
outputs, incremental snapshot appends, boundary shards. At 100 TB the
cost is real — scan tasks per file, name-node/manifest pressure, and
parquet stats too fragmented for pruning. The production answer on
Iceberg is ``rewrite_data_files`` (bin-packing rewrite committed as one
snapshot); this module is that operation for the parquet stand-in the
rest of the repo uses (checkpoint.py's manifest protocol,
stage.py's scratch tables): read → ``repartition(ceil(bytes/target))``
→ write aside → swap.

Semantics: VALUES are preserved exactly (compaction is layout, not
content — the contract query ``compaction_roundtrip`` value-checks the
compacted table against a DuckDB read of the same construction); row
ORDER is not (tables are sets here, as in every dedup-tier consumer).
The swap is two renames (old → trash, new → path) — atomic per rename
on HDFS/local, but the window between them is not transactional:
concurrent readers belong to Iceberg, not the stand-in, exactly like
checkpoint.py's manifests.

Reference tie: no analogue — the reference is a one-shot scan over an
existing filesystem (/root/reference/internal/scanner/scanner.go); a
persistent-table engine has to own its storage hygiene.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

#: default rewrite target — the parquet sweet spot (SCALE_DESIGN.md)
DEFAULT_TARGET_BYTES = 256 << 20


def _local(path: str) -> str:
    for pre in ("file://", "file:"):
        if path.startswith(pre):
            return path[len(pre):]
    return path


def _list_parquet_parts(path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every data file under a LOCAL parquet dir."""
    out: list[tuple[str, int]] = []
    for dirpath, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") or (
                    n.startswith("part-") and not n.endswith(".crc")):
                p = os.path.join(dirpath, n)
                out.append((p, os.path.getsize(p)))
    return out


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    slack: float = 1.5,
) -> dict:
    """Bin-pack a parquet directory's data files toward ``target_bytes``.

    No-op (``rewritten=False``) when the table is already within
    ``slack`` × the ideal file count — compaction must be idempotent
    and cheap to call after every append. Returns
    ``{files_before, files_after, bytes, target_files, rewritten}``.

    Local/`file:` paths only (the environments this repo's parquet
    stand-in runs in); on Iceberg use ``rewrite_data_files``, which is
    this exact operation under a transactional commit.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    if "://" in path and not path.startswith("file:"):
        raise ValueError(
            "compact_parquet_dir handles local/file: paths; for remote "
            "tables use the catalog's rewrite (Iceberg rewrite_data_files)")
    local = _local(path)
    parts = _list_parquet_parts(local)
    if not parts:
        raise FileNotFoundError(f"no parquet data files under {path!r}")
    total = sum(b for _, b in parts)
    n_target = max(1, math.ceil(total / target_bytes))
    stats = {"files_before": len(parts), "bytes": total,
             "target_files": n_target}
    if len(parts) <= n_target * slack:
        return {**stats, "files_after": len(parts), "rewritten": False}

    tmp = local.rstrip("/") + ".compact_tmp"
    trash = local.rstrip("/") + ".compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    (spark.read.parquet(local)
     .repartition(n_target)
     .write.mode("overwrite").parquet(tmp))
    os.rename(local, trash)
    try:
        os.rename(tmp, local)
    except OSError:
        # restore the original table before propagating — a failed
        # swap must never leave the path empty
        os.rename(trash, local)
        raise
    shutil.rmtree(trash, ignore_errors=True)
    after = len(_list_parquet_parts(local))
    return {**stats, "files_after": after, "rewritten": True}
