"""Similarity search over embedding columns (`array<float>`).

Two tiers, mirroring the engine's cheap-signal-first doctrine:

* **Brute-force cosine top-k** — the exactness baseline. The (small)
  query set is broadcast; each partition of the big side computes
  cosine against every query with JVM-side ``zip_with``/``aggregate``
  arithmetic (no Python), then a per-query window keeps top-k. Cost is
  one pass over the corpus per batch of queries — the right plan when
  queries ≪ corpus, which is the ANN-probe shape.
* **Sign-LSH (random hyperplane) bucketed ANN** — the scale path: a
  deterministic set of hyperplanes maps every vector to a bit-sign
  bucket key; probing searches only buckets within small Hamming
  distance of the query's key. Recall/latency traded via n_planes and
  probe radius. Hyperplanes are generated from the seed, broadcast as
  literal arrays — no fit/state.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns (JVM-side)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id.

    Output: (query_id, neighbor_id, rank) — rank 1..k by descending
    cosine, ties broken by neighbor_id (fully deterministic).
    """
    base = emb.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("vec"))
    queries = (
        base.filter(F.col("neighbor_id").isin(query_ids))
        .select(F.col("neighbor_id").alias("query_id"), F.col("vec").alias("qvec"))
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("vec"), F.col("qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def sign_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Pack sign(vec · plane_i) bits into one long bucket key (JVM-side)."""
    key = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << i).cast("long")).otherwise(0)
        key = key + bit
    return key


def lsh_ann_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10, n_planes: int = 12,
    probe_hamming: int = 1, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only sign-LSH buckets within
    ``probe_hamming`` of each query's bucket. Same output schema as
    :func:`brute_force_topk`; recall < 1 by design."""
    dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    base = emb.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("vec"))
    base = base.withColumn("bucket", sign_bucket(F.col("vec"), planes))
    queries = (
        base.filter(F.col("neighbor_id").isin(query_ids))
        .select(F.col("neighbor_id").alias("query_id"),
                F.col("vec").alias("qvec"), F.col("bucket").alias("qbucket"))
    )
    joined = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket")))
                <= probe_hamming)
        .withColumn("sim", cosine(F.col("vec"), F.col("qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 12, probe_hamming: int = 2, seed: int = 42,
    brute_force: bool = False,
) -> DataFrame:
    """Pairs of vectors with cosine ≥ threshold (id_a < id_b, sim).

    ``brute_force=True`` compares all pairs (oracle/test scale only);
    default blocks by sign-LSH bucket and compares within-or-near
    buckets — near-identical vectors agree on almost all hyperplane
    signs, so bucket blocking keeps recall high at a fraction of the
    O(n²) cost.
    """
    base = emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("vec"))
    if brute_force:
        a = base.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
        b = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        dim = len(emb.select(vec_col).first()[0])
        planes = hyperplanes(dim, n_planes, seed)
        bucketed = base.withColumn("bucket", sign_bucket(F.col("vec"), planes))
        a = bucketed.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                            F.col("bucket").alias("bucket_a"))
        b = bucketed.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                            F.col("bucket").alias("bucket_b"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b")).filter(
            F.bit_count(F.col("bucket_a").bitwiseXOR(F.col("bucket_b")))
            <= probe_hamming
        )
    return (
        pairs.withColumn("sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )
