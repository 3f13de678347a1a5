"""Data-selection queries (round 5): DSIR-style importance
resampling over hashed n-gram models and SemDeDup-style semantic
dedup inside k-means clusters — the two selection passes a
training-corpus assembly runs between quality filtering and packing.

Same contract as the other query modules: the oracle SQL is built
from the SAME Python constants as the Spark plan, and — like the
round-5 k-means oracles — recomputes everything in pure SQL (no
driver-side replay, no repo imports inside the SQL).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oups_spark.operators.pack import (
    priority_sample,
    priority_sample_by,
    priority_sample_oracle_sql,
)
from oups_spark.operators.selection import (
    dsir_importance_weights,
    gumbel_topk_sample,
    semdedup_prune,
)
from oups_spark.queries import register
from oups_spark.queries.quality_ops import kmeans_unrolled_sql
from oups_spark.tables import load

_TOK = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '')"
)
_MD5B = "CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)"

_DSIR_B = 1024
_DSIR_TARGET = ("src0", "src1")  # the "looks like what we want" corpus
_DSIR_K, _DSIR_SEED = 100, "dsir"

# shared CTE chain: hashed-ngram featurization -> per-bucket two-model
# counts -> add-one log-likelihood-ratio model -> per-doc log-weight
_tgt_sql = "source IN ({})".format(
    ", ".join(f"'{s}'" for s in _DSIR_TARGET)
)
_DSIR_CTE = f"""
    t AS (SELECT doc_id, {_tgt_sql} AS tgt, {_TOK} AS tok FROM documents),
    g AS (SELECT doc_id, tgt,
                 list_concat(tok, list_transform(range(1, len(tok)),
                     i -> tok[i] || ' ' || tok[i+1])) AS grams
          FROM t),
    e AS (SELECT doc_id, tgt, CAST({_MD5B} % {_DSIR_B} AS INT) AS b
          FROM (SELECT doc_id, tgt, unnest(grams) AS x FROM g)),
    c AS (SELECT b,
                 sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
                 sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
          FROM e GROUP BY b),
    tot AS (SELECT sum(ct) AS Tt, sum(cr) AS Tr FROM c),
    m AS (SELECT b, ln((ct + 1.0) / (Tt + {_DSIR_B}.0))
                    - ln((cr + 1.0) / (Tr + {_DSIR_B}.0)) AS llr
          FROM c, tot),
    s AS (SELECT doc_id, count(*) AS n_grams,
                 round(sum(llr), 6) AS log_weight
          FROM e JOIN m USING (b) GROUP BY doc_id),
    w AS (SELECT g.doc_id,
                 coalesce(s.n_grams, 0)::BIGINT AS n_grams,
                 coalesce(s.log_weight, 0.0) AS log_weight
          FROM g LEFT JOIN s ON g.doc_id = s.doc_id)"""


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH {_DSIR_CTE}
    SELECT doc_id, n_grams, log_weight FROM w ORDER BY doc_id
    """,
)
def dsir_importance_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): score every document
    by ``log p_target - log p_raw`` under bag-of-hashed-ngrams models
    trained on a target slice (here: two sources standing in for the
    'high-quality reference corpus') vs the rest. The model is a
    FIXED 1024-bucket table whatever the corpus size — one explode +
    hash agg trains both distributions, then a broadcast map-side
    join scores; the corpus never shuffles."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return dsir_importance_weights(
        docs,
        id_col="doc_id",
        is_target=F.col("source").isin(*_DSIR_TARGET),
        n_buckets=_DSIR_B,
    ).orderBy("doc_id")


@register(
    "dsir_gumbel_topk",
    oracle=f"""
    WITH {_DSIR_CTE}
    SELECT doc_id, log_weight,
           round(log_weight + -ln(-ln(
             (CAST(('0x' || substr(md5('{_DSIR_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
             / 4294967298.0)), 6) AS gumbel_key
    FROM w
    ORDER BY gumbel_key DESC, doc_id LIMIT {_DSIR_K}
    """,
)
def dsir_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR selection step: sample k documents WITHOUT replacement
    with probability proportional to exp(log_weight) via the
    Gumbel-top-k trick — deterministic noise from ``md5(seed:id)``
    (reproducible across runs, engines and partitionings), one
    bounded TakeOrdered job, no normalization pass and no full
    sort."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w = dsir_importance_weights(
        docs,
        id_col="doc_id",
        is_target=F.col("source").isin(*_DSIR_TARGET),
        n_buckets=_DSIR_B,
    )
    return gumbel_topk_sample(
        w, id_col="doc_id", weight_col="log_weight", k=_DSIR_K, seed=_DSIR_SEED
    ).select("doc_id", "log_weight", "gumbel_key")


_SD_K, _SD_ITERS, _SD_SEED, _SD_THR = 16, 2, 11, 0.45

# normalize-first cosine, matching the Spark plan op-for-op (unit
# vectors computed per row with the same fold order, zero vectors
# mapped to the zero unit, then one dot fold per pair)
_SD_UNIT = (
    "CASE WHEN sqrt(list_sum(list_transform(e, x -> x * x))) > 0"
    " THEN list_transform(e,"
    "   x -> x / sqrt(list_sum(list_transform(e, y -> y * y))))"
    " ELSE list_transform(e, x -> x * 0.0) END"
)
_SD_COS = (
    "round(list_sum(list_transform(range(1, len(va.u) + 1),"
    " i -> va.u[i] * vb.u[i])), 6)"
)


@register(
    "semdedup_prune",
    oracle=kmeans_unrolled_sql(
        "v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings)",
        out_id="vec_id",
        k=_SD_K,
        iters=_SD_ITERS,
        seed=_SD_SEED,
        suffix_sql=f""", vn AS (
      SELECT id, {_SD_UNIT} AS u FROM v),
    dup AS (
      SELECT DISTINCT a.vec_id AS vid
      FROM assign a JOIN assign b
        ON a.cluster = b.cluster AND a.vec_id > b.vec_id
      JOIN vn va ON va.id = a.vec_id
      JOIN vn vb ON vb.id = b.vec_id
      WHERE {_SD_COS} >= {_SD_THR})
    SELECT assign.vec_id, assign.cluster, dup.vid IS NULL AS keep
    FROM assign LEFT JOIN dup ON assign.vec_id = dup.vid
    ORDER BY vec_id
    """,
    ),
)
def semdedup_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    prune semantic near-duplicates WITHIN each cluster (cosine above
    threshold keeps the lowest id). The only pairwise work is
    cluster-local — the self-join key is the cluster id, so
    comparison volume is sum of cluster sizes squared, bounded by
    choosing k; nothing all-pairs. The oracle recomputes clustering
    (unrolled SQL Lloyd) AND the within-cluster pruning in DuckDB.
    Threshold tuned to the synthetic table's cosine range (max ~0.51
    — real embedding spaces would sit at ~0.95+)."""
    emb = (
        load(spark, sf_dir, "embeddings", spread=True)
        .select("vec_id", "embedding")
    )
    return semdedup_prune(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        k=_SD_K,
        iters=_SD_ITERS,
        seed=_SD_SEED,
        threshold=_SD_THR,
    ).orderBy("vec_id")


_SPAN_W = 8


@register(
    "duplicate_span_removal",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    seg AS (SELECT doc_id, i,
                   array_to_string(tok[i*{_SPAN_W}+1 : i*{_SPAN_W}+{_SPAN_W}], ' ') AS s
            FROM t, LATERAL unnest(range(0,
                   CAST(ceil(len(tok) / {_SPAN_W}.0) AS BIGINT))) AS u(i)
            WHERE len(tok) > 0),
    c AS (SELECT s, count(DISTINCT doc_id) AS nd FROM seg GROUP BY s),
    r AS (SELECT doc_id,
                 count(*) AS n_segments,
                 count(*) FILTER (nd > 1) AS n_removed,
                 coalesce(string_agg(s, ' ' ORDER BY i) FILTER (nd = 1), '')
                     AS clean_text
          FROM seg JOIN c USING (s) GROUP BY doc_id)
    SELECT t.doc_id AS doc_id,
           coalesce(r.n_segments, 0)::BIGINT AS n_segments,
           coalesce(r.n_removed, 0)::BIGINT AS n_removed,
           coalesce(r.clean_text, '') AS clean_text
    FROM t LEFT JOIN r ON t.doc_id = r.doc_id
    ORDER BY t.doc_id
    """,
)
def duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-span removal with reassembly (Lee et al. 2022
    / C4-style): non-overlapping 8-token segments whose text appears
    in more than one document are deleted from ALL documents and the
    survivors re-concatenated in order — boilerplate stripping as one
    explode + fp hash agg + shuffled join back + per-doc rebuild.
    The count table scales with distinct segments, so it is joined
    (uniform fp key), never broadcast."""
    from oups_spark.operators.selection import remove_duplicate_spans

    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    return remove_duplicate_spans(
        docs, id_col="doc_id", width=_SPAN_W
    ).orderBy("doc_id")


_MIX_ALPHA, _MIX_TOTAL, _MIX_SEED = 0.5, 200, "mix1"


@register(
    "temperature_source_mix",
    oracle=f"""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    z AS (SELECT sum(n ** {_MIX_ALPHA}) AS z FROM c),
    r AS (SELECT source,
                 round(least(1.0, {_MIX_TOTAL} * (n ** {_MIX_ALPHA}) / z / n) * 1e9) / 1e9
                     AS keep_rate
          FROM c, z)
    SELECT d.doc_id, d.source, r.keep_rate
    FROM documents d JOIN r USING (source)
    WHERE CAST(('0x' || substr(md5('{_MIX_SEED}:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          / 4294967296.0 < r.keep_rate
    ORDER BY doc_id
    """,
)
def temperature_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-controlled source mixing (T5/LLaMA multinomial
    recipe, alpha=0.5 upweights small sources): deterministic per-row
    hash sampling at per-source rates proportional to n^alpha,
    normalized to an expected total. One #sources-row hash agg,
    rates broadcast back, map-side filter — the corpus never
    shuffles and the sample is reproducible across engines."""
    from oups_spark.operators.selection import temperature_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        temperature_sample(
            docs,
            id_col="doc_id",
            by="source",
            alpha=_MIX_ALPHA,
            target_total=_MIX_TOTAL,
            seed=_MIX_SEED,
        )
        .select("doc_id", "source", "keep_rate")
        .orderBy("doc_id")
    )


_SEQ_BUDGET, _SEQ_VOCAB = 2048, 32768
# the exact engine-portable BPE-ish pre-tokenizer pattern, quoted for
# SQL (shared constant with the Spark plan via operators.text)
from oups_spark.operators.text import BPE_PATTERN as _BPE_PATTERN  # noqa: E402

_BPE_SQL = _BPE_PATTERN.replace("'", "''")


@register(
    "packed_training_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang,
                      regexp_extract_all(text, '{_BPE_SQL}') AS tok
               FROM documents),
    i AS (SELECT doc_id, lang,
                 list_transform(tok, x -> CAST({_MD5B} % {_SEQ_VOCAB} AS INT)) AS ids,
                 len(tok) AS n_tok
          FROM t),
    c AS (SELECT doc_id, lang, ids, n_tok,
                 coalesce(sum(n_tok) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS off
          FROM i)
    SELECT lang,
           CAST(off // {_SEQ_BUDGET} AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           md5(array_to_string(flatten(list(ids ORDER BY doc_id)), ' '))
               AS token_digest,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids_csv
    FROM c GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def packed_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully MATERIALIZED training sequences: per (lang, pack) the
    concatenated md5-vocab token-id stream and its document boundary
    map — the last-mile operator that turns the curated corpus into
    what a trainer reads. The query projects the id stream and
    boundary map to md5/csv digests so the oracle compares the exact
    token layout value-for-value without shipping raw arrays through
    the hash compare. One tokenize pass (Generate-barriered), the
    two-phase prefix-sum pack assignment, and ONE shuffle on the
    uniform pack key carrying each document's ids exactly once."""
    from oups_spark.operators.pack import pack_sequences

    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "lang", "text")
    )
    seq = pack_sequences(
        docs,
        id_col="doc_id",
        by="lang",
        budget=_SEQ_BUDGET,
        vocab_size=_SEQ_VOCAB,
    )
    return seq.select(
        "lang",
        "pack_id",
        "n_docs",
        "n_tokens",
        F.md5(F.concat_ws(" ", F.col("token_ids"))).alias("token_digest"),
        F.concat_ws(",", F.col("doc_ids")).alias("doc_ids_csv"),
    ).orderBy("lang", "pack_id")


_WSAMPLE_K, _WSAMPLE_SEED = 100, "wsample-r8"


@register(
    "weighted_sample_wor",
    oracle=priority_sample_oracle_sql(
        table="documents",
        id_col="doc_id",
        weight_col="n_chars",
        k=_WSAMPLE_K,
        seed=_WSAMPLE_SEED,
        select_cols="doc_id, source, n_chars",
    ),
)
def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (priority
    sampling, Duffield–Lund–Thorup JACM 2007): draw 100 documents
    with probability proportional to size (n_chars), reproducibly —
    the sampling primitive for data-mixing ablations where a rerun
    (or another engine) must draw the identical subset. Map-side
    hash + one exact IEEE division per row, TakeOrdered cut: the
    corpus never shuffles and no RNG state exists anywhere."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return priority_sample(
        docs,
        id_col="doc_id",
        weight_col="n_chars",
        k=_WSAMPLE_K,
        seed=_WSAMPLE_SEED,
    )


_WSB_K, _WSB_SEED = 10, "wsample-by-r8"
_WSB_H = (
    f"CAST(('0x' || substr(md5('{_WSB_SEED}:' || CAST(doc_id AS VARCHAR))"
    f", 1, 8)) AS BIGINT)"
)


@register(
    "weighted_sample_by_source",
    oracle=f"""
    WITH p AS (
      SELECT source, doc_id, n_chars,
             round(n_chars::DOUBLE * 4294967296.0
                   / ({_WSB_H} + 1)::DOUBLE, 6) AS priority
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, n_chars, priority,
             row_number() OVER (PARTITION BY source
                                ORDER BY priority DESC, doc_id) AS rk
      FROM p
    )
    SELECT source, doc_id, n_chars, priority, rk::INT AS rk
    FROM r WHERE rk <= {_WSB_K}
    ORDER BY source, rk
    """,
)
def weighted_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain balanced weighted sampling: 10 documents WITHOUT
    replacement per source, probability proportional to size — the
    stratified counterpart of ``weighted_sample_wor`` for mixes
    where one mega-source must not crowd out the tail. The cut is
    the skew-safe two-phase grouped top-k (local per-partition
    top-k bounds the hot group's shuffle at k rows per partition),
    oracle-stated as the equivalent single window."""
    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    out = priority_sample_by(
        docs,
        id_col="doc_id",
        weight_col="n_chars",
        by="source",
        k_per_group=_WSB_K,
        seed=_WSB_SEED,
    )
    # the skew-safe cut keeps only (group, priority, id); re-attach
    # the weight by id — the sampled side is k x #groups rows, so it
    # broadcasts
    picked = docs.join(
        F.broadcast(out.select("doc_id", "priority", "rk")), on="doc_id"
    )
    return picked.select(
        "source", "doc_id", "n_chars", "priority",
        F.col("rk").cast("int").alias("rk"),
    ).orderBy("source", "rk")
