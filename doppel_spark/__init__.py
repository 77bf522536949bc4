"""doppel_spark — a PySpark-native web-scale near-duplicate detection engine.

A from-scratch reimplementation of the *capabilities* of dr8co/doppel
(a concurrent Go duplicate-file finder) as an idiomatic Spark DataFrame
pipeline over Common-Crawl-style page tables, extended — per the project
north rule — from exact-dup grouping to near-dup clustering
(MinHash/LSH, SimHash, suffix-array substring) with DataFrame
connected components, skew-aware salted aggregation, and per-stage
checkpoint/resume.

Design principles (Spark-first, NOT a port):

* Exact-dup tier is 100% built-in Catalyst expressions
  (``length``/``substring``/``xxhash64``/``sha2``) — zero Python rows.
* Near-dup math (MinHash, SimHash, suffix arrays) runs in vectorized
  pandas/Arrow UDFs over numpy — zero per-row Python objects crossing
  the boundary one at a time.
* Cheap-signal-before-expensive-confirmation staging mirrors the
  reference's size→quick-hash→full-hash funnel
  (/root/reference/internal/finder/finder.go:44-146) and generalizes it
  to length→MinHash/LSH→Jaccard-verify→suffix-array.
"""

__version__ = "0.1.0"

from doppel_spark.session import get_spark  # noqa: F401
