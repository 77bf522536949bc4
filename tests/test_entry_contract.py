"""Driver-contract conformance: every queries() entry runs; every oracle
matches row-count + column names + order-insensitive values at sf0.01."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            return round(v, 9)
        return v

    return sorted(tuple(norm(r[i]) for i in idx) for r in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["total_docs"] == 500


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    assert len(spark_rows) >= 0  # runs

    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        return  # rows-only op by design
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(duck_cols) == sorted(spark_cols), f"{name}: column names differ"
    assert len(duck_rows) == len(spark_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")
    assert _canon(spark_rows, spark_cols) == _canon(duck_rows, duck_cols), (
        f"{name}: values differ")


def test_every_query_has_oracle_or_reason():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles.issubset(qs)
    rows_only = qs - oracles
    # only hash-function-defined / approximate ops may omit the oracle
    assert rows_only <= {"minhash_lsh_clusters", "simhash_fingerprints",
                         "simhash_near_pairs", "substring_pairs",
                         "doc_fingerprints", "ann_topk_lsh", "ann_topk_ivf",
                         "emb_neardup_lsh"}
