"""Heavy-hitters sketch (operators/sketch.py): MG guarantees + the
exact-output contract."""

from __future__ import annotations

import random
import sys
from collections import Counter
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from doppel_spark.operators.sketch import _mg_fold, heavy_hitters  # noqa: E402


def test_mg_fold_never_overcounts_and_bounds_size():
    rng = random.Random(3)
    stream = [f"w{rng.randint(0, 200)}" for _ in range(5000)]
    stream += ["hot"] * 400 + ["warm"] * 300
    rng.shuffle(stream)
    true = Counter(stream)
    counter: dict = {}
    for i in range(0, len(stream), 97):  # arbitrary batch cuts
        counter = _mg_fold(counter, Counter(stream[i:i + 97]), k=20)
    assert len(counter) <= 20
    n = len(stream)
    for key, c in counter.items():
        assert c <= true[key]                # never overcounts
        assert c >= true[key] - n // 20 - 1  # undercount bounded by n/k
    # guarantee: items with true freq > n/k survive
    for key, t in true.items():
        if t > n / 20:
            assert key in counter, key


def test_heavy_hitters_exact_set_and_counts(spark):
    """Output = exactly the strict > n/k items, with EXACT counts,
    independent of partitioning."""
    rng = random.Random(9)
    rows = [(f"w{rng.randint(0, 500)}",) for _ in range(20_000)]
    rows += [("dominant",)] * 900 + [("second",)] * 500
    rng.shuffle(rows)
    true = Counter(r[0] for r in rows)
    n, k = len(rows), 40  # threshold n/k = 535
    want = {x: c for x, c in true.items() if c * k > n}
    assert want == {"dominant": 900}  # 'second' sits below the bar

    for parts in (3, 17):
        df = spark.createDataFrame(rows, "key string").repartition(parts)
        got = {r["key"]: r["n_exact"]
               for r in heavy_hitters(df, "key", k=k).collect()}
        assert got == want, parts


def test_heavy_hitters_null_keys_ignored_and_k_validated(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], "key string")
    got = {r["key"]: r["n_exact"]
           for r in heavy_hitters(df, "key", k=2).collect()}
    assert got == {"a": 2}  # 2*2 > 3; b: 1*2 !> 3; NULLs never counted
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "key", k=0)


def test_heavy_hitters_plan_shape(spark):
    """Candidates + total join in as broadcasts; the only Python is the
    Arrow-batched summary stage (never row-at-a-time)."""
    from doppel_spark.plans.inspect import assert_no_row_python

    df = spark.createDataFrame([("a",), ("b",)], "key string")
    hh = heavy_hitters(df, "key", k=5)
    assert_no_row_python(hh)
    plan = hh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total join
