"""Small-file compaction (operators/compact.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from doppel_spark.operators.compact import (  # noqa: E402
    _list_parquet_parts,
    compact_parquet_dir,
)


def _fragmented(spark, tmp_path, n_files=32, rows=800):
    path = str(tmp_path / "tbl")
    df = spark.range(rows).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("digest"))
    df.repartition(n_files).write.parquet(path)
    return path, df


def test_compact_reduces_files_and_preserves_values(spark, tmp_path):
    path, df = _fragmented(spark, tmp_path)
    before_df = spark.read.parquet(path)
    before_schema = before_df.schema
    before = sorted(r["digest"] for r in before_df.collect())
    stats = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert stats["rewritten"] is True
    assert stats["files_before"] >= 32
    assert stats["files_after"] <= 2
    after_df = spark.read.parquet(path)
    after = sorted(r["digest"] for r in after_df.collect())
    assert after == before  # layout changed, values byte-identical
    assert after_df.schema == before_schema
    # no leftover swap dirs
    assert not (tmp_path / "tbl.compact_tmp").exists()
    assert not (tmp_path / "tbl.compact_old").exists()


def test_compact_is_idempotent_noop_when_packed(spark, tmp_path):
    path, _ = _fragmented(spark, tmp_path)
    first = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert first["rewritten"] is True
    second = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert second["rewritten"] is False
    assert second["files_after"] == first["files_after"]


def test_compact_rejects_remote_and_empty(spark, tmp_path):
    with pytest.raises(ValueError, match="rewrite_data_files"):
        compact_parquet_dir(spark, "s3a://bucket/tbl")
    with pytest.raises(FileNotFoundError):
        compact_parquet_dir(spark, str(tmp_path / "missing"))
    with pytest.raises(ValueError, match="target_bytes"):
        compact_parquet_dir(spark, str(tmp_path), target_bytes=0)


def test_part_listing_skips_metadata(tmp_path):
    d = tmp_path / "t"
    d.mkdir()
    (d / "part-00000-x.snappy.parquet").write_bytes(b"x" * 10)
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".part-00000-x.snappy.parquet.crc").write_bytes(b"y")
    parts = _list_parquet_parts(str(d))
    assert [Path(p).name for p, _ in parts] == ["part-00000-x.snappy.parquet"]
