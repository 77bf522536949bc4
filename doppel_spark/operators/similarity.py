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


def ivf_centroids(emb: DataFrame, n_centroids: int, seed: int = 42,
                  vec_col: str = "embedding", sample_cap: int = 50_000,
                  iters: int = 5) -> np.ndarray:
    """Deterministic IVF coarse quantizer: mini k-means on a seeded sample.

    The sample is tiny relative to the corpus (``sample_cap`` rows via
    a deterministic hash-ordered take), Lloyd iterations run in numpy on
    the driver, and the resulting centroid matrix is broadcast as plan
    literals — no ML-library dependency, no fit state to manage.
    """
    from pyspark.sql import functions as F2

    sample = (
        emb.select(_as_double(vec_col).alias("vec"),
                   F2.xxhash64(F2.col(vec_col).cast("string")).alias("_h"))
        .orderBy("_h").limit(sample_cap).select("vec").toPandas()
    )
    x = np.array(sample["vec"].tolist(), dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Add ``ivf_cell`` = argmax-dot-product centroid id (pure Catalyst).

    The centroid matrix rides into the plan as literal arrays; the
    argmax is a fold over per-centroid dot products — JVM-side, no UDF.
    """
    vec = _as_double(vec_col)
    best_id, best_dot = F.lit(0), F.lit(float("-inf"))
    for i, c in enumerate(centroids):
        plane = F.array(*[F.lit(float(v)) for v in c])
        d = dot(vec, plane)
        better = d > best_dot
        best_id = F.when(better, F.lit(i)).otherwise(best_id)
        best_dot = F.when(better, d).otherwise(best_dot)
    return emb.withColumn("ivf_cell", best_id.cast("int"))


def ivf_ann_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10, n_centroids: int = 16,
    n_probe: int = 2, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: search only the ``n_probe`` cells nearest to each
    query. Same output schema as :func:`brute_force_topk`."""
    cent = ivf_centroids(emb, n_centroids, seed, vec_col)
    assigned = ivf_assign(emb, cent, vec_col).select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("vec"),
        "ivf_cell")
    qrows = assigned.filter(F.col("neighbor_id").isin(query_ids)) \
        .select(F.col("neighbor_id").alias("query_id"), F.col("vec").alias("qvec")) \
        .toPandas()
    # driver-side probe-cell selection per query (queries are few)
    probes = []
    for r in qrows.itertuples():
        q = np.array(r.qvec)
        q = q / max(np.linalg.norm(q), 1e-12)
        order = (cent @ q).argsort()[::-1][:n_probe]
        for cell in order:
            probes.append((int(r.query_id), int(cell)))
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, ivf_cell int")
    queries = assigned.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"), F.col("vec").alias("qvec"))
    cand = (
        assigned.join(F.broadcast(probe_df), "ivf_cell")
        .join(F.broadcast(queries), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("vec"), F.col("qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
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
