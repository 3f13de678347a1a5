"""Text-retrieval operators: overlapping document chunking and BM25
scoring/top-k.

Reference parity: none — beyond-reference LLM-pipeline layer (the
reference has no text operators). Both operators are the standard
pre-training / RAG building blocks:

- ``doc_chunks`` splits each document into fixed-width token windows
  with a stride (overlap = width - stride), the unit of work for
  embedding indexes and context-window packing. Pure map-side
  1-to-many fan-out (``posexplode`` of a per-row computed array) —
  the chunker never shuffles and payload text never nears the driver,
  so it scales linearly with corpus size.
- ``bm25_topk`` scores documents against a FIXED, small set of query
  terms with Okapi BM25. Per-document term frequencies and length are
  map-side array expressions; the corpus statistics BM25 needs
  (N, avgdl, per-term document frequencies) reduce to ONE tiny row
  (one partial-agg shuffle of ~16 bytes x terms per partition),
  which re-enters the plan as a broadcast. The final top-k is a
  TakeOrderedAndProject, not a global sort — at 100 TB the full
  pipeline is one corpus scan + one scalar-sized shuffle.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oups_spark.operators.text import tokens


def doc_chunks(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    width: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into token windows ``[i*stride,
    i*stride + width)`` for every ``i >= 0`` with ``i*stride <
    n_tokens`` (so the last window may be short; empty documents
    yield no chunks).

    Output: ``(id_col, chunk_id, n_chunk_tokens, chunk_text)`` —
    chunk ids are 0-based per document.

    DuckDB twin: ``tok[i*stride+1 : i*stride+width]`` over
    ``range(0, ceil(len(tok)/stride))`` (1-based inclusive list
    slicing matches Spark's ``slice(tok, start, length)``).
    """
    if width <= 0 or stride <= 0:
        raise ValueError(f"width/stride must be positive, got {width}/{stride}")
    tok = tokens(F.col(text_col))
    n = F.size(tok)
    n_chunks = F.ceil(n / F.lit(float(stride))).cast("int")
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    base = df.select(
        F.col(id_col), F.posexplode(starts).alias("chunk_id", "__start"), tok.alias("__tok")
    )
    ck = F.slice(F.col("__tok"), F.col("__start") + 1, width)
    return base.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(ck).alias("n_chunk_tokens"),
        F.array_join(ck, " ").alias("chunk_text"),
    )


def bm25_topk(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k over a fixed query-term set.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b +
    b * dl/avgdl)), idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Deterministic output order: score DESC, then ``id_col`` ASC;
    scores rounded to 6 decimals BEFORE ranking so cross-engine
    float noise cannot flip the cut.

    Scale shape: per-document tf/dl are array expressions inside the
    scan stage; (N, avgdl, df_t...) is one partial-aggregated row
    broadcast back into the plan; top-k is take-ordered. No UDFs.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    tok = tokens(F.col(text_col))

    def _tf(term: str):
        # NB: a two-parameter lambda would be read by F.filter as
        # (element, index) — close over the term instead
        return F.size(F.filter(tok, lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col),
        F.size(tok).alias("__dl"),
        *[_tf(t).alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__N"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__N") - F.col(f"__df_{i}") + 0.5)
            / (F.col(f"__df_{i}") + 0.5)
        )
        norm = tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
        part = idf * tf * (k1 + 1.0) / norm
        score = part if score is None else score + part
    out = j.select(
        F.col(id_col),
        F.col("__dl").cast("long").alias("doc_len"),
        F.round(score, 6).alias("bm25"),
    )
    return (
        out.filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )


def bm25_oracle_sql(
    *,
    table: str,
    id_col: str,
    tok_sql: str,
    terms: list[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk`, generated from the SAME
    constants so results match value-for-value."""
    tf_exprs = ", ".join(
        f"len(list_filter(tok, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    parts = " + ".join(
        f"ln(1 + (s.N - s.df_{i} + 0.5)/(s.df_{i} + 0.5)) * tf_{i} * {k1 + 1.0!r}"
        f" / (tf_{i} + {k1!r} * (1 - {b!r} + {b!r} * dl / s.avgdl))"
        for i in range(len(terms))
    )
    return f"""
    WITH t AS (SELECT {id_col}, {tok_sql} AS tok FROM {table}),
    d AS (SELECT {id_col}, len(tok)::DOUBLE AS dl, {tf_exprs} FROM t),
    s AS (SELECT count(*)::DOUBLE AS N, avg(dl) AS avgdl, {df_exprs} FROM d)
    SELECT {id_col}, dl::BIGINT AS doc_len, round({parts}, 6) AS bm25
    FROM d, s
    WHERE round({parts}, 6) > 0
    ORDER BY bm25 DESC, {id_col} LIMIT {k}
    """


def rerank_topk(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    terms: list[str],
    candidates: int = 50,
    k: int = 10,
    phrase: str | None = None,
    w_bm25: float = 0.1,
    w_coverage: float = 2.0,
    w_phrase: float = 1.5,
    w_position: float = 1.0,
) -> DataFrame:
    """Two-stage retrieval: BM25 candidate generation then a rerank
    pass over the (small) candidate set — the classic recall-then-
    precision cascade. Stage 1 is :func:`bm25_topk` (one corpus scan,
    broadcast stats, take-ordered cut to ``candidates`` rows); stage 2
    re-fetches candidate payloads by id via a BROADCAST semi-join
    (candidates are tiny by construction, the corpus is not) and
    scores them with a deterministic feature combination:

      rerank = w_bm25·bm25 + w_coverage·(terms present / |terms|)
             + w_phrase·[phrase in text] + w_position·1/first_pos

    In production the stage-2 scorer is a cross-encoder model over
    ``mapInPandas`` with exactly this plumbing (broadcast-join the
    candidate ids, batch the texts through the model, take-ordered
    cut); the arithmetic proxy keeps the query oracle-checkable while
    exercising the identical plan shape. Every feature is an integer
    count or a single IEEE division, so DuckDB matches bit-for-bit.
    """
    cand = bm25_topk(
        docs, id_col=id_col, text_col=text_col, terms=terms, k=candidates
    ).select(id_col, "bm25")
    joined = docs.select(id_col, text_col).join(
        F.broadcast(cand), on=id_col, how="inner"
    )
    tok = tokens(F.col(text_col))
    n_terms = float(len(terms))
    coverage = (
        sum(F.array_contains(tok, t).cast("int") for t in terms).cast(
            "double"
        )
        / F.lit(n_terms)
    )
    first_pos = F.array_position(tok, terms[0])  # 0 when absent
    pos_bonus = F.when(
        first_pos > 0, F.lit(1.0) / first_pos.cast("double")
    ).otherwise(F.lit(0.0))
    phrase_hit = (
        F.lower(F.col(text_col)).contains(phrase.lower()).cast("int")
        if phrase
        else F.lit(0)
    )
    score = F.round(
        F.lit(w_bm25) * F.col("bm25")
        + F.lit(w_coverage) * coverage
        + F.lit(w_phrase) * phrase_hit.cast("double")
        + F.lit(w_position) * pos_bonus,
        6,
    )
    out = joined.select(
        F.col(id_col),
        F.col("bm25"),
        F.round(coverage, 6).alias("coverage"),
        phrase_hit.alias("phrase_hit"),
        F.round(pos_bonus, 6).alias("pos_bonus"),
        score.alias("rerank"),
    )
    return out.orderBy(F.col("rerank").desc(), F.col(id_col)).limit(k)


def rerank_oracle_sql(
    *,
    table: str,
    id_col: str,
    tok_sql: str,
    terms: list[str],
    candidates: int,
    k: int,
    phrase: str | None,
    w_bm25: float = 0.1,
    w_coverage: float = 2.0,
    w_phrase: float = 1.5,
    w_position: float = 1.0,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`rerank_topk`, generated from the SAME
    constants; the stage-1 CTE is the bm25 oracle verbatim."""
    bm25_sql = bm25_oracle_sql(
        table=table, id_col=id_col, tok_sql=tok_sql, terms=terms,
        k=candidates, k1=k1, b=b,
    )
    n_terms = float(len(terms))
    cov = " + ".join(
        f"list_contains(tok, '{t}')::INT" for t in terms
    )
    ph = (
        f"contains(lower(text), '{phrase.lower()}')::INT"
        if phrase
        else "0"
    )
    return f"""
    WITH cand AS ({bm25_sql}),
    feat AS (
      SELECT c.{id_col}, c.bm25, d.text, {tok_sql} AS tok
      FROM cand c JOIN {table} d USING ({id_col})
    ),
    scored AS (
      SELECT {id_col}, bm25,
             ({cov})::DOUBLE / {n_terms!r} AS coverage,
             {ph} AS phrase_hit,
             CASE WHEN coalesce(list_position(tok, '{terms[0]}'), 0) > 0
                  THEN 1.0 / coalesce(list_position(tok, '{terms[0]}'), 0)
                  ELSE 0.0 END AS pos_bonus
      FROM feat
    )
    SELECT {id_col}, bm25,
           round(coverage, 6) AS coverage,
           phrase_hit,
           round(pos_bonus, 6) AS pos_bonus,
           round({w_bm25!r} * bm25 + {w_coverage!r} * coverage
                 + {w_phrase!r} * phrase_hit::DOUBLE
                 + {w_position!r} * pos_bonus, 6) AS rerank
    FROM scored
    ORDER BY rerank DESC, {id_col} LIMIT {k}
    """


def hashed_feature_vectors(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    dim: int = 32,
    round_to: int | None = 6,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic text -> vector featurization by the hashing
    trick: every token is hashed into one of ``dim`` buckets
    (``md5_int % dim`` — engine-portable), the vector is the
    L2-normalized bucket-count histogram. The cheap, model-free
    bridge from a text corpus into the vector operators (cosine
    top-k, ANN, k-means, embedding near-dup) when no trained encoder
    is in the loop — and the plumbing twin of one (swap the
    expression for a ``mapInPandas`` encoder batch, schema and
    partitioning unchanged).

    Fully map-side: one tokenize + one hash pass, then an
    ``aggregate`` fold that rebuilds the dim-array per token —
    O(dim x n_tok) arithmetic, but dim is a small constant and the
    whole fold stays inside whole-stage codegen; no shuffle, no UDF,
    no Python. Empty documents yield the zero vector. ``keep`` names
    extra input columns to carry through (e.g. a label for classifier
    training) — a passthrough projection, NOT a post-hoc self-join.
    """
    from oups_spark.operators.text import md5_int, tokens

    tok = tokens(F.col(text_col))
    zeros = F.array_repeat(F.lit(0.0), dim)
    # one pass: fold tokens into the histogram by incrementing the
    # hashed bucket of each token
    hist = F.aggregate(
        F.transform(tok, lambda t: F.pmod(md5_int(t), F.lit(dim)).cast("int")),
        zeros,
        lambda acc, b: F.transform(
            acc,
            lambda v, i: F.when(i == b, v + F.lit(1.0)).otherwise(v),
        ),
    )
    base = df.select(
        F.col(id_col), *[F.col(c) for c in keep], hist.alias("__h")
    )
    norm = F.sqrt(
        F.aggregate(F.col("__h"), F.lit(0.0), lambda a, x: a + x * x)
    )
    if round_to is None:
        unit = F.transform(F.col("__h"), lambda x: x / norm)
    else:
        unit = F.transform(
            F.col("__h"), lambda x: F.round(x / norm, round_to)
        )
    vec = F.when(norm > 0, unit).otherwise(F.col("__h"))
    return base.select(
        F.col(id_col), *[F.col(c) for c in keep], vec.alias("features")
    )


def hashed_feature_vectors_np(texts, *, dim: int = 32):
    """Sequential numpy twin of :func:`hashed_feature_vectors`
    (round_to=None): same tokenizer (lowercased whitespace split),
    same md5 bucket hash, float64 normalization. Used by oracle
    generators that must replay the featurization driver-side."""
    import hashlib

    import numpy as np

    out = np.zeros((len(texts), dim), dtype=np.float64)
    for r, text in enumerate(texts):
        toks = [t for t in (text or "").strip().lower().split() if t]
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
            out[r, b] += 1.0
        # left-to-right accumulation mirrors the Spark fold exactly
        acc = 0.0
        for v in out[r]:
            acc += v * v
        n = acc ** 0.5
        if n > 0:
            out[r] = out[r] / n
    return out
