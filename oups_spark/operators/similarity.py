"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k for a query set — the
  correctness baseline. The query set is broadcast; each executor
  scans its slice of the corpus once (the classic "small Q × huge N"
  shape; at 100 TB the corpus side stays partitioned and the join is
  a broadcast-nested-loop with a per-row top-k aggregation, no
  shuffle of the corpus).
- ``embedding_neardup_pairs``: pairs above a cosine threshold within
  a blocking key (label / cluster id) — equality join, no cross
  product.
- ``lsh_cosine_topk``: the scale path — random-hyperplane signs
  bucket the corpus; search touches only the query's bucket (and
  optionally neighboring buckets by Hamming distance 1).

All dot products run as JVM array expressions (``zip_with`` +
``aggregate``) on doubles — no Python in the loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).

    Output: (query_id, neighbor_id, rank, cosine_sim).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim", 6).alias("cosine_sim"),
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate vector pairs above a cosine threshold, blocked
    on ``block_col`` so the join stays an equality join.

    The block key has low cardinality, so the expensive dot products
    are NOT evaluated inside the block join (≤ #blocks partitions):
    bare id-pairs are built first, repartitioned wide, and the
    vectors attached by id joins."""
    ids = df.select(F.col(block_col), F.col(id_col))
    pairs = (
        ids.select(F.col(block_col), F.col(id_col).alias("id_a"))
        .join(ids.select(F.col(block_col), F.col(id_col).alias("id_b")), on=block_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .repartition(df.sparkSession.sparkContext.defaultParallelism * 2, "id_a", "id_b")
    )
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    return (
        pairs.join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("cosine_sim"))
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(v · plane_i).
    Planes are plan literals (seeded driver-side), so bucketing is
    deterministic and shuffle-free."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH, OR-construction:
    ``n_tables`` independent plane sets each bucket the corpus into
    2^n_planes cells; a candidate is any vector sharing a bucket with
    the query in ANY table (union + distinct), then exact-ranked.

    Search fraction ≈ n_tables / 2^n_planes of the corpus; recall
    rises with n_tables (the standard LSH recall/cost dial). Buckets
    are plan literals — no fitting step, fully deterministic.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    cand_frames = []
    for _t in range(n_tables):
        planes = rng.normal(size=(n_planes, dim)).tolist()
        ct = c.withColumn("bucket", hyperplane_bucket(F.col("cv"), planes))
        qt = q.withColumn("bucket", hyperplane_bucket(F.col("qv"), planes))
        cand_frames.append(
            ct.join(F.broadcast(qt), on="bucket").select(
                "query_id", "neighbor_id"
            )
        )
    cands = cand_frames[0]
    for f in cand_frames[1:]:
        cands = cands.unionByName(f)
    cands = cands.filter(F.col("neighbor_id") != F.col("query_id")).distinct()
    scored = (
        cands.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("cosine_sim"))
    )
