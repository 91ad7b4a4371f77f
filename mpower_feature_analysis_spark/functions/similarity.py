"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk_bruteforce` — exact baseline: broadcast the (small)
  query set against the corpus, fold the dot product with JVM array exprs
  (``aggregate``/``zip_with``), rank per query. The corpus side streams —
  no shuffle of the big table at all when queries broadcast.
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane signs
  (SimHash-for-vectors) bucket the corpus; queries probe only their own
  bucket (plus optional multi-probe flips), turning O(Q·N) into
  O(Q·N/2^bits) with an equi-join the optimizer can shuffle-partition.

Hyperplanes are derived from xxhash64(seed, dim) — deterministic without
RNG state, reproducible across runs/engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, cos_sim, rank); self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            dot(F.col("qv"), F.col("cv")) / (norm(F.col("qv")) * norm(F.col("cv"))),
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_sign_bits(vec: Column, bits: int, dims: int) -> Column:
    """LSH bucket id: sign pattern of ``bits`` pseudo-random hyperplanes.

    Hyperplane b, dim d weight = (xxhash64(b*7919+d) % 1000003)/1000003 - 0.5
    — deterministic, centered; computed as a JVM fold per bit.
    """
    bucket = F.lit(0).cast("long")
    for b in range(bits):
        weights = F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.lit(b * 7919 + d)), F.lit(1_000_003)).cast("double")
                    / F.lit(1_000_003.0)
                    - F.lit(0.5)
                )
                for d in range(dims)
            ]
        )
        proj = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << b).cast("long")).otherwise(0)
    return bucket


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    dims: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking within the query's LSH bucket.

    Recall/cost dial = ``bits``. Candidates that share no bucket are missed
    (ANN semantics); tests measure recall vs the brute-force oracle.
    """
    if dims is None:
        dims = len(embeddings.select(vec_col).first()[0])
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("bucket", _hyperplane_sign_bits(F.col("cv"), bits, dims))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("bucket", _hyperplane_sign_bits(F.col("qv"), bits, dims))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            dot(F.col("qv"), F.col("cv")) / (norm(F.col("qv")) * norm(F.col("cv"))),
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
