"""Similarity search over embedding columns (SURVEY.md §2.2).

Two paths:

- **Brute-force cosine top-k** — the exact baseline: score every vector
  against the (broadcast) query with native array expressions
  (``zip_with`` + ``aggregate``: JVM-side, codegen'd, no Python in the
  loop), then ``TakeOrderedAndProject`` for the top-k. Linear scan; at
  100 TB this is the verify path or the per-bucket scorer, not the fleet
  scan.
- **LSH (random hyperplane) bucketed top-k** — the scale path: each
  vector gets a ``nbits``-bit signature (sign of dot with seeded random
  hyperplanes); the query probes only buckets within a small Hamming
  radius of its own signature, turning the scan into a partition-prunable
  equality filter. Hyperplanes are generated from a fixed seed and
  inlined as literal arrays (no driver state at run time).

Element arithmetic is done in float64 (explicit cast) so results are
reproducible and match external oracles bit-for-bit on the same fold
order.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    return dot(da, db) / (norm(da) * norm(db))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector is inlined as an array literal — effectively a
    broadcast of a single row; the scan is one codegen'd map + top-k.
    Output: (id, sim) ordered desc with id tiebreak.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q)
    return (
        embeddings.select(F.col(id_col), F.round(sim, 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    q_id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force k-NN join: for every query row, the k nearest corpus
    rows by cosine. Broadcast the (small) query side; rank per query with
    a window — the corpus side streams through one shuffle on query id.
    Output: (q_id, vec_id, sim, rank)."""
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec")
        )
    )
    scored = embeddings.crossJoin(q).select(
        "q_id",
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, nbits: int, *, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-Gaussian hyperplanes (fixed seed → the same
    signature family on every run/cluster)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(nbits):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Sign-bit signature as a long (nbits <= 63)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(_as_double(vec), p) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseXOR(F.shiftleft(bit, i))
    return sig


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    nbits: int = 8,
    tables: int = 4,
    hamming_radius: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors that collide with the
    query in at least one of ``tables`` independent LSH tables (signature
    within ``hamming_radius``).

    Multi-table is the standard recall lever: per-table collision
    probability at angle θ is P(Hamming(sig) ≤ r) with bit-agree
    probability (1 - θ/π); ``tables`` independent tables turn p into
    1-(1-p)^L. At scale each table's signature is a stored/bucketed
    column, so probes become partition pruning; here signatures are
    computed inline. On data with *no* true near neighbors (random
    gaussians) any sublinear ANN has low top-k recall by nature — the
    guarantee is for genuinely close vectors.
    """
    dim = len(query_vec)
    cond = None
    for t in range(tables):
        planes = random_hyperplanes(dim, nbits, seed=seed + t)
        # query signature computed driver-side (tiny, pure python)
        qsig = 0
        for i, plane in enumerate(planes):
            d = sum(float(a) * b for a, b in zip(query_vec, plane))
            qsig |= (1 if d > 0 else 0) << i
        sig = lsh_signature(F.col(vec_col), planes)
        hit = F.bit_count(sig.bitwiseXOR(F.lit(qsig))) <= hamming_radius
        cond = hit if cond is None else cond | hit
    candidates = embeddings.where(cond)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        candidates.select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
