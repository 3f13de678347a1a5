"""Retrieval / corpus-assembly queries added in round 4 (continued):
overlapping document chunking, BM25 top-k retrieval, reproducible
global shuffle, per-source quota curation (single-window and
skew-safe two-phase forms), and hashing-trick text featurization.

Same contract as ``llm_ops``: every oracle is generated from the
SAME Python constants as the Spark plan (chunk width/stride, BM25
terms and k1/b, shuffle seed, quota size), so results match
value-for-value.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oups_spark.operators.pack import deterministic_shuffle
from oups_spark.operators.retrieval import (
    bm25_oracle_sql,
    bm25_topk,
    doc_chunks,
    rerank_oracle_sql,
    rerank_topk,
)
from oups_spark.queries import register
from oups_spark.queries.quality_ops import kmeans_unrolled_sql
from oups_spark.tables import load

_TOK = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '')"
)

_CHUNK_W, _CHUNK_S = 32, 24


@register(
    "doc_chunk_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents)
    SELECT doc_id,
           i::INT AS chunk_id,
           len(tok[i*{_CHUNK_S}+1 : i*{_CHUNK_S}+{_CHUNK_W}])::INT
               AS n_chunk_tokens,
           array_to_string(tok[i*{_CHUNK_S}+1 : i*{_CHUNK_S}+{_CHUNK_W}], ' ')
               AS chunk_text
    FROM t, LATERAL unnest(range(0, CAST(ceil(len(tok) / {_CHUNK_S}.0) AS BIGINT))) AS u(i)
    WHERE len(tok) > 0
    ORDER BY doc_id, chunk_id
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width overlapping token chunks (width 32, stride 24) —
    the unit of work for embedding indexes and packed training
    sequences. Map-side posexplode fan-out; no shuffle, text never
    near the driver."""
    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    return doc_chunks(
        docs, id_col="doc_id", width=_CHUNK_W, stride=_CHUNK_S
    ).orderBy("doc_id", "chunk_id")


_BM25_TERMS = ["vector", "merge", "window"]
_BM25_K = 25


_RERANK_CAND, _RERANK_K = 50, 10
_RERANK_PHRASE = "vector merge"


@register(
    "crossencoder_rerank_topk",
    oracle=rerank_oracle_sql(
        table="documents",
        id_col="doc_id",
        tok_sql=_TOK,
        terms=_BM25_TERMS,
        candidates=_RERANK_CAND,
        k=_RERANK_K,
        phrase=_RERANK_PHRASE,
    ),
)
def crossencoder_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval cascade: BM25 recall (top-50 candidates,
    one corpus scan + broadcast stats) then a precision rerank over
    the candidate set only — candidate payloads re-fetched via a
    BROADCAST join, scored by a deterministic cross-feature proxy
    (term coverage, exact-phrase hit, first-match position, BM25
    prior). The production swap-in is a cross-encoder model behind
    ``mapInPandas`` with the identical plan shape; the proxy keeps
    the query oracle-checkable. Stage-2 cost is O(candidates), never
    O(corpus)."""
    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    return rerank_topk(
        docs,
        id_col="doc_id",
        terms=_BM25_TERMS,
        candidates=_RERANK_CAND,
        k=_RERANK_K,
        phrase=_RERANK_PHRASE,
    )


@register(
    "bm25_topk",
    oracle=bm25_oracle_sql(
        table="documents",
        id_col="doc_id",
        tok_sql=_TOK,
        terms=_BM25_TERMS,
        k=_BM25_K,
    ),
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval for a fixed term set: per-doc tf/dl stay
    map-side, the corpus stats (N, avgdl, df) are ONE broadcast row,
    the cut is a TakeOrderedAndProject — one corpus scan total."""
    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    return bm25_topk(
        docs, id_col="doc_id", terms=_BM25_TERMS, k=_BM25_K
    )


_SEED = "seed42"
_N_SHARDS = 8
_SHUF_HASH = (
    f"CAST(('0x' || substr(md5('{_SEED}:' || doc_id), 1, 8)) AS BIGINT)"
)


@register(
    "deterministic_shuffle",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY {_SHUF_HASH}, doc_id) - 1 AS pos
      FROM documents
    )
    SELECT doc_id, pos, CAST(pos % {_N_SHARDS} AS INT) AS shard
    FROM p ORDER BY pos
    """,
)
def deterministic_shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global training-order shuffle: md5(seed:id) total
    order -> global position (two-phase range-bucket prefix sum, no
    single-partition window) -> round-robin shard. Identical
    permutation in any engine and any rerun."""
    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id")
    )
    return deterministic_shuffle(
        docs, id_col="doc_id", seed=_SEED, n_shards=_N_SHARDS
    ).select("doc_id", "pos", "shard").orderBy("pos")


_QUOTA = 5


@register(
    "source_quota_topk",
    oracle=f"""
    SELECT doc_id, source, n_chars, rk FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents)
    WHERE rk <= {_QUOTA}
    ORDER BY source, rk
    """,
)
def source_quota_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota curation (the per-domain cap every web-scale
    corpus applies): keep the top {quota} documents of each source by
    length, deterministic tiebreak on doc_id. One keyed shuffle on
    source; at 100 TB the source cardinality (domains) is huge so the
    shuffle is well spread — a single mega-source would need the
    two-phase per-partition top-k variant (documented in SCALE.md).
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _QUOTA)
        .orderBy("source", "rk")
    )


_FDIM = 32
_MD5B = "CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)"


@register(
    "text_feature_vectors",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    b AS (SELECT doc_id,
                 list_transform(tok, x -> {_MD5B} % {_FDIM}) AS bk
          FROM t),
    h AS (SELECT doc_id,
                 list_transform(range(0, {_FDIM}),
                   d -> CAST(len(list_filter(bk, v -> v = d)) AS DOUBLE)) AS hv
          FROM b),
    n AS (SELECT doc_id, hv,
                 sqrt(list_sum(list_transform(hv, x -> x * x))) AS nrm
          FROM h),
    f AS (SELECT doc_id,
            CASE WHEN nrm > 0 THEN
              list_transform(hv,
                x -> CAST(floor(round(x / nrm, 6) * 1000000 + 0.5) AS BIGINT))
            ELSE list_transform(hv, x -> 0::BIGINT) END AS iv
          FROM n)
    SELECT doc_id,
           len(list_filter(iv, x -> x != 0)) AS nnz,
           md5(array_to_string(iv, ',')) AS f_md5
    FROM f ORDER BY doc_id
    """,
)
def text_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization of every document into a dense
    {dim}-d unit vector — the model-free bridge from text into the
    vector operators (and the plumbing twin of a mapInPandas
    encoder). One map-side pass, no shuffle; the vector is
    value-checked via md5 of its 1e-6-scaled integer form (exact
    cross-engine, same device as embedding_quantize)."""
    from oups_spark.operators.retrieval import hashed_feature_vectors

    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    feats = hashed_feature_vectors(docs, id_col="doc_id", dim=_FDIM)
    ints = F.transform(
        F.col("features"),
        lambda x: F.floor(x * 1e6 + F.lit(0.5)).cast("long"),
    )
    return (
        feats.select(
            "doc_id",
            F.size(F.filter(ints, lambda x: x != 0)).alias("nnz"),
            F.md5(
                F.array_join(
                    F.transform(ints, lambda x: x.cast("string")), ","
                )
            ).alias("f_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "source_quota_twophase",
    oracle=f"""
    SELECT doc_id, source, n_chars, rk FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents)
    WHERE rk <= {_QUOTA}
    ORDER BY source, rk
    """,
)
def source_quota_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME per-source quota as ``source_quota_topk``, computed
    by the skew-safe two-phase operator (``grouped_topk``): local
    per-partition top-k bounds shuffle output at k rows per group
    per partition — the form that survives one mega-source holding
    most of a 100 TB corpus. Checked against the identical oracle as
    the single-window form: same result, different shuffle volume.
    """
    from oups_spark.operators.pack import grouped_topk

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return (
        grouped_topk(
            docs,
            group_col="source",
            order_col="n_chars",
            id_col="doc_id",
            k=_QUOTA,
        )
        .select("doc_id", "source", "n_chars", "rk")
        .orderBy("source", "rk")
    )


_P_MIN_TOK, _P_MAX_DUP = 10, 0.6
_P_SEED, _P_SHARDS, _P_BUDGET = "pipe1", 4, 2000
_P_HASH = (
    f"CAST(('0x' || substr(md5('{_P_SEED}:' || doc_id), 1, 8)) AS BIGINT)"
)


@register(
    "corpus_pipeline_end2end",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    q AS (
      SELECT doc_id,
             len(tok) AS n_tokens,
             CASE WHEN len(tok) > 0
                  THEN (len(tok) - len(list_distinct(tok))) / len(tok)::DOUBLE
                  ELSE 0 END AS dup_frac,
             md5(array_to_string(list_sort(list_distinct(tok)), ' ')) AS fp
      FROM t
      WHERE len(tok) >= {_P_MIN_TOK}
    ),
    d AS (
      SELECT doc_id, n_tokens FROM (
        SELECT doc_id, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM q WHERE dup_frac <= {_P_MAX_DUP})
      WHERE rn = 1
    ),
    s AS (
      SELECT doc_id, n_tokens,
             ROW_NUMBER() OVER (ORDER BY {_P_HASH}, doc_id) - 1 AS pos
      FROM d
    )
    SELECT doc_id, n_tokens, pos,
           CAST(pos % {_P_SHARDS} AS INT) AS shard,
           CAST(floor(coalesce(sum(n_tokens) OVER (
               ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / {_P_BUDGET}) AS BIGINT) AS pack_id
    FROM s ORDER BY pos
    """,
)
def corpus_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data assembly line END TO END, four operators
    composed in one plan: (1) quality gate (min length, max
    duplicate-token fraction — map-side), (2) exact dedup on the
    bag-of-words fingerprint (keep lowest id), (3) reproducible
    global shuffle into training order, (4) contiguous token-budget
    packing IN THAT ORDER — exactly how shuffled training sequences
    are laid out. Every stage is the already-oracle-checked operator;
    this query checks their COMPOSITION value-for-value against the
    same four stages in SQL. Scale shape: one corpus scan, one dedup
    shuffle on the fingerprint, then the two-phase prefix-sum
    machinery of shuffle+pack (driver state = bucket counts only)."""
    from oups_spark.operators.pack import pack_token_budget
    from oups_spark.operators.text import once_per_row, tokens

    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    # one fused tokenize pass feeds length, dup-fraction and
    # fingerprint (Generate barrier, see once_per_row)
    t = once_per_row(docs, {"__tok": tokens(F.col("text"))})
    n = F.size(F.col("__tok"))
    nd = F.size(F.array_distinct(F.col("__tok")))
    q = t.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.when(n > 0, (n - nd).cast("double") / n)
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.col("__tok"))))
        ).alias("fp"),
    ).filter(n >= _P_MIN_TOK)
    w = Window.partitionBy("fp").orderBy("doc_id")
    # materialize the two narrow intermediates ONCE: the composition
    # runs THREE driver actions (shuffle's bucket-count collect,
    # pack's bucket-sum collect, the final result), and without the
    # checkpoints each re-executes the tokenize + dedup-window
    # upstream — 3 corpus scans instead of 1 (profiled: 6 of the
    # query's ~0.5 s jobs were that recompute). Both checkpoints
    # carry only (doc_id, n_tokens[, pos, shard]) — bytes per row,
    # distributed blocks, scale-safe.
    d = (
        q.filter(F.col("dup_frac") <= _P_MAX_DUP)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "n_tokens")
        .localCheckpoint(eager=True)
    )
    s = deterministic_shuffle(
        d, id_col="doc_id", seed=_P_SEED, n_shards=_P_SHARDS
    ).localCheckpoint(eager=True)
    packed = pack_token_budget(
        s, id_col="pos", token_col="n_tokens", budget=_P_BUDGET
    )
    return packed.select(
        "doc_id", "n_tokens", "pos", "shard", "pack_id"
    ).orderBy("pos")


_TC_K, _TC_ITERS, _TC_SEED = 6, 2, 7


# Featurization twin (hashing-trick histogram, L2-normalized) as the
# vector CTE feeding the pure-SQL unrolled k-means oracle. The
# histogram counts are exact small integers, so the norm + divide are
# bit-identical to Spark's fold; nothing driver-side is replayed.
_TC_VEC_CTE = f"""
    t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    b AS (SELECT doc_id,
                 list_transform(tok, x -> {_MD5B} % {_FDIM}) AS bk
          FROM t),
    h AS (SELECT doc_id,
                 list_transform(range(0, {_FDIM}),
                   d -> CAST(len(list_filter(bk, v -> v = d)) AS DOUBLE)) AS hv
          FROM b),
    v AS (SELECT doc_id AS id,
                 CASE WHEN sqrt(list_sum(list_transform(hv, x -> x*x))) > 0
                      THEN list_transform(hv,
                        x -> x / sqrt(list_sum(list_transform(hv, y -> y*y))))
                      ELSE hv END AS e
          FROM h)"""


@register(
    "topic_clusters",
    oracle=kmeans_unrolled_sql(
        _TC_VEC_CTE,
        out_id="doc_id",
        k=_TC_K,
        iters=_TC_ITERS,
        seed=_TC_SEED,
    ),
)
def topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text clustering END TO END with zero model dependencies:
    hashing-trick featurization (map-side, no UDF) feeding the
    distributed Lloyd's k-means — the document-clustering /
    topic-bucketing pass a curation pipeline runs to balance topical
    coverage. The oracle recomputes BOTH stages in pure SQL
    (featurization CTE + ``kmeans_unrolled_sql``) and checks every
    document's final cluster. Scale shape: featurization rides the
    corpus scan ONCE (k-means localCheckpoints its input); each
    k-means iteration is one bounded hash agg."""
    from oups_spark.operators.retrieval import hashed_feature_vectors
    from oups_spark.operators.similarity import kmeans_lloyd

    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    feats = hashed_feature_vectors(
        docs, id_col="doc_id", dim=_FDIM, round_to=None
    )
    return (
        kmeans_lloyd(
            feats,
            id_col="doc_id",
            vec_col="features",
            k=_TC_K,
            iters=_TC_ITERS,
            seed=_TC_SEED,
            center_decimals=6,
        )
        .select("doc_id", "cluster")
        .orderBy("doc_id")
    )
