"""Quick/full digest contract tests.

Re-expresses the reference's hasher test matrix
(/root/reference/internal/scanner/hasher_test.go) over text columns:
size tiers of the piecewise quick digest, and the critical
"quick digest is a pruning key, not an equality proof" semantics.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from doppel_spark.functions.digests import (
    QUICK_FULL_THRESHOLD,
    QUICK_SAMPLE,
    full_digest,
    quick_digest,
)


def _quick(spark, texts: list[str]) -> list[int]:
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r[0] for r in df.select(quick_digest("text")).collect()]


def _xxh(spark, s: str) -> int:
    return spark.createDataFrame([(s,)], "t string").select(F.xxhash64("t")).collect()[0][0]


def test_empty_text_digest_zero(spark):
    # hasher.go:47-49 — size <= 0 → digest 0
    assert _quick(spark, [""]) == [0]


def test_small_text_hashes_prefix_only(spark):
    # < 16384 chars → one-shot over first 8192 (hasher.go:71-75)
    small = "abc" * 100
    assert _quick(spark, [small]) == [_xxh(spark, small)]


def test_8_to_16k_tier_samples_first_8k_only(spark):
    # the 8 KiB-buffer subtlety: 8192 < len < 16384 hashes ONLY the
    # first 8192 chars (hasher.go:12 + finder.go:165 + hasher.go:71-75)
    base = ("z" * QUICK_SAMPLE) + ("q" * 4000)  # len 12192
    variant = ("z" * QUICK_SAMPLE) + ("r" * 4000)  # differs after 8192
    d = _quick(spark, [base, variant])
    assert d[0] == d[1] == _xxh(spark, "z" * QUICK_SAMPLE)


def test_exactly_8k(spark):
    s = "x" * QUICK_SAMPLE
    assert _quick(spark, [s]) == [_xxh(spark, s)]


def test_large_text_samples_prefix_and_suffix(spark):
    # >= 16384 → first 8192 ‖ last 8192 (hasher.go:77-90)
    n = QUICK_FULL_THRESHOLD + 8000  # 24384
    s = "".join(chr(97 + (i % 26)) for i in range(n))
    expect = _xxh(spark, s[:QUICK_SAMPLE] + s[-QUICK_SAMPLE:])
    assert _quick(spark, [s]) == [expect]


def test_middle_flip_collides_on_quick_but_not_full(spark):
    # hasher_test.go:264-316 — the load-bearing semantics: a flip at
    # offset 9216 (inside the unsampled middle of a 24 KiB doc) keeps
    # the quick digest equal but changes the full digest.
    n = 24_576
    s = "".join(chr(97 + (i % 26)) for i in range(n))
    flipped = s[:9216] + ("X" if s[9216] != "X" else "Y") + s[9217:]
    q = _quick(spark, [s, s, flipped])
    assert q[0] == q[1] == q[2]
    df = spark.createDataFrame([(s,), (flipped,)], "text string")
    full = [r[0] for r in df.select(full_digest("text")).collect()]
    assert full[0] != full[1]


def test_full_digest_matches_python_sha256(spark):
    s = "hello web scale"
    df = spark.createDataFrame([(s,)], "text string")
    got = df.select(full_digest("text")).collect()[0][0]
    assert got == hashlib.sha256(s.encode()).hexdigest()


def test_null_text_digest_zero(spark):
    # NULL text takes the same 0 sentinel as empty (never xxhash64(NULL))
    df = spark.createDataFrame([(None,), ("",), ("abc",)], "text string")
    got = [r[0] for r in df.select(quick_digest("text")).collect()]
    assert got[0] == 0 and got[1] == 0 and got[2] != 0
