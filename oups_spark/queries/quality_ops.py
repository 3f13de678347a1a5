"""Data-quality / curation queries added in round 4: repetition
signals, benchmark decontamination, PII scrub, embedding
quantization, per-label centroids, and semi-structured JSON
extraction.

Same contract as ``llm_ops``: every oracle is generated from the
SAME Python constants as the Spark plan (regex patterns, shingle
width, quantization formula), so results match value-for-value.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oups_spark.operators.dedup import decontamination_overlap
from oups_spark.operators.similarity import label_centroids, quantize_int8
from oups_spark.operators.text import (
    PII_ORDER,
    PII_PATTERNS,
    pii_scan_df,
    repetition_stats_df,
)
from oups_spark.queries import register
from oups_spark.tables import load

_TOK = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '')"
)
_SH3 = (
    "list_distinct(list_transform(range(1, greatest(len(tok)-1, 1)), "
    "i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]))"
)


@register(
    "repetition_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    tm AS (
      SELECT doc_id, max(c) AS mt FROM (
        SELECT doc_id, x, count(*) AS c
        FROM (SELECT doc_id, unnest(tok) AS x FROM t) GROUP BY doc_id, x)
      GROUP BY doc_id
    ),
    g AS (SELECT doc_id,
                 list_transform(range(1, greatest(len(tok), 1)),
                                i -> tok[i] || ' ' || tok[i+1]) AS g2
          FROM t),
    gm AS (
      SELECT doc_id, max(c) AS mg, sum(c) AS ng FROM (
        SELECT doc_id, x, count(*) AS c
        FROM (SELECT doc_id, unnest(g2) AS x FROM g) GROUP BY doc_id, x)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.tok)::BIGINT AS n_tokens,
           round(CASE WHEN len(t.tok) > 0
                 THEN (len(t.tok) - len(list_distinct(t.tok))) / len(t.tok)::DOUBLE
                 ELSE 0 END, 6) AS dup_token_frac,
           round(CASE WHEN len(t.tok) > 0
                 THEN coalesce(tm.mt, 0) / len(t.tok)::DOUBLE
                 ELSE 0 END, 6) AS top_token_frac,
           round(CASE WHEN coalesce(gm.ng, 0) > 0
                 THEN gm.mg / gm.ng::DOUBLE
                 ELSE 0 END, 6) AS top_bigram_frac
    FROM t LEFT JOIN tm USING (doc_id) LEFT JOIN gm USING (doc_id)
    ORDER BY doc_id
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (duplicate-token
    fraction, most-frequent token / 2-gram fractions), computed
    map-side via sorted-array run lengths — the oracle's
    unnest+groupBy formulation would shuffle every token at scale;
    the Spark plan never leaves the scan stage."""
    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    return repetition_stats_df(docs, "doc_id").orderBy("doc_id")


@register(
    "decontamination_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOK} AS tok FROM documents),
    s AS (SELECT doc_id, source, {_SH3} AS sh FROM t),
    bg AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE source = 'src0'),
    tg AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE source != 'src0')
    SELECT tg.doc_id,
           count(*) AS n_grams,
           sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_contaminated,
           round(sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 6) AS contam_frac
    FROM tg LEFT JOIN bg ON tg.g = bg.g
    GROUP BY tg.doc_id ORDER BY tg.doc_id
    """,
)
def decontamination_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document (sources !=
    'src0'), the fraction of its distinct 3-gram shingles occurring
    anywhere in the benchmark corpus (source 'src0'). The benchmark
    shingle set is broadcast; the training corpus is never
    self-joined or content-shuffled."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return decontamination_overlap(train, bench, "doc_id", "text").orderBy(
        "doc_id"
    )


# Synthetic PII-bearing rows unioned with the corpus in BOTH engines
# (the test corpus itself contains no PII, which would make the scan
# vacuous): same literals, ids above any real doc_id.
PII_PROBE_ROWS: tuple[tuple[int, str], ...] = (
    (10_000_000, "reach me at jane.doe@example.com or 555-867-5309 today"),
    (10_000_001, "server 192.168.0.1 pinged 10.0.0.254; mail root@host.org"),
    (10_000_002, "no pii here, just ordinary words and 123 numbers"),
    (10_000_003, "dial 415 555 2671 or fax 020.7946.0958 at the office"),
    (10_000_004, "x@y.io, 10.1.2.3, and 999-123-4567 all on one line"),
)


def _pii_oracle_sql() -> str:
    values = ",\n      ".join(
        "({}::BIGINT, '{}')".format(i, t.replace("'", "''"))
        for i, t in PII_PROBE_ROWS
    )
    counts = ",\n           ".join(
        f"len(regexp_extract_all(text, '{PII_PATTERNS[fam]}')) AS n_{fam}"
        for fam in PII_ORDER
    )
    red = "text"
    for fam in PII_ORDER:
        red = (
            f"regexp_replace({red}, '{PII_PATTERNS[fam]}', "
            f"'<{fam.upper()}>', 'g')"
        )
    return f"""
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT * FROM (VALUES {values}) AS probes(doc_id, text)
    )
    SELECT doc_id,
           {counts},
           md5({red}) AS redacted_md5
    FROM base ORDER BY doc_id
    """


@register("pii_scan", oracle=_pii_oracle_sql())
def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus plus a fixed probe
    set (the synthetic corpus carries no PII of its own): per-row
    match counts for email / phone / IPv4 patterns and the md5 of the
    fully-redacted text. Pure JVM regex, zero shuffle."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    probes = spark.createDataFrame(
        list(PII_PROBE_ROWS), "doc_id bigint, text string"
    )
    return pii_scan_df(docs.unionByName(probes), "doc_id").orderBy("doc_id")


@register(
    "embedding_quantize",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127 AS scale
          FROM v),
    q AS (SELECT vec_id, v, scale,
                 CASE WHEN scale > 0 THEN
                   list_transform(v, x -> CAST(least(greatest(
                     floor(x / scale + 0.5), -127), 127) AS BIGINT))
                 ELSE list_transform(v, x -> 0::BIGINT) END AS q
          FROM s)
    SELECT vec_id,
           round(scale, 6) AS scale,
           round(CASE WHEN len(v) > 0 THEN
                 list_sum(list_transform(range(1, len(v)+1),
                   i -> (v[i] - q[i]*scale) * (v[i] - q[i]*scale))) / len(v)
                 ELSE 0 END, 6) AS mse,
           md5(array_to_string(q, ',')) AS q_md5
    FROM q ORDER BY vec_id
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column with
    reconstruction-error reporting — map-side array expressions, the
    quantized vector value-checked via md5 of its joined form."""
    emb = load(spark, sf_dir, "embeddings")
    return quantize_int8(emb, "vec_id").orderBy("vec_id")


@register(
    "label_centroids",
    oracle="""
    WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
    u AS (SELECT label, unnest(range(1, len(e)+1)) AS i, unnest(e) AS val
          FROM v)
    SELECT label, (i-1)::INT AS dim, count(*) AS n_vecs,
           round(avg(val), 6) AS centroid
    FROM u GROUP BY label, i ORDER BY label, dim
    """,
)
def label_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension):
    posexplode + one hash agg with map-side partial combine — the
    canonical distributed centroid (shuffle volume independent of
    corpus size)."""
    emb = load(spark, sf_dir, "embeddings")
    return label_centroids(emb).orderBy("label", "dim")


@register(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           sum(k)::BIGINT AS sum_k,
           round(avg(k), 6) AS avg_k,
           max(k) AS max_k
    FROM (SELECT event_type,
                 json_extract_string(props, '$.k')::BIGINT AS k
          FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the semi-structured ``props`` JSON column:
    ``get_json_object`` path extraction (JVM-side, no UDF) feeding a
    grouped aggregate."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "duplicated_windows",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(length(text) - 30, 1), 16),
               i -> md5(substr(text, i, 32))))) AS fp
      FROM documents
    )
    SELECT fp, count(DISTINCT doc_id) AS n_docs
    FROM w GROUP BY fp HAVING count(DISTINCT doc_id) > 1
    ORDER BY fp
    """,
)
def duplicated_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-granular duplicate detection via character-window
    fingerprints (width 32, stride 16) — the batch form of
    rolling-hash document fingerprinting, and the primitive behind
    exact-substring training-data dedup: fingerprints shared by more
    than one document mark copied spans. One uniform-key shuffle of
    (fp, doc_id) rows; within-document repeats are deduplicated
    map-side before the explode."""
    from oups_spark.operators.text import window_fingerprints

    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    wf = window_fingerprints(docs, "doc_id", "text", width=32, stride=16)
    return (
        wf.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .orderBy("fp")
    )


def kmeans_unrolled_sql(
    vec_cte: str,
    *,
    out_id: str,
    k: int,
    iters: int,
    seed: int,
    decimals: int = 6,
    suffix_sql: str | None = None,
) -> str:
    """Pure-SQL unrolled Lloyd's k-means: a fully INDEPENDENT DuckDB
    oracle — no repo code executes; the SQL itself recomputes the
    init (k ids with the lowest ``(md5_int32(f'{seed}:{id}'), id)``),
    every iteration's argmin assignment (squared-L2, ties to the
    lowest cluster) and rounded centroid update, and the final
    assignment. ``vec_cte`` must be CTE text (without the leading
    WITH) whose last CTE is ``v(id, e DOUBLE[])``.

    Cross-engine determinism: the engine rounds each averaged
    centroid cell via ``round(avg * 10^d) / 10^d`` per iteration
    (``kmeans_lloyd(center_decimals=d)``); the identical formula here
    yields bit-identical centroids, so trajectories cannot diverge
    from summation-order ulps in the averages — the flakiness an
    emit-literals numpy replay suffered from. Distances use the same
    left-to-right dim-order float64 fold both engines evaluate.

    ``suffix_sql`` composes downstream SQL over the clustering: when
    given, the final assignment becomes a CTE ``assign({out_id},
    cluster)`` (the vectors stay visible as ``v(id, e)``) and
    ``suffix_sql`` — either additional ``, name AS (...)`` CTEs
    followed by a SELECT, or a bare SELECT — completes the statement.
    """
    fac = 10**decimals
    # squared L2 between v.e and candidate centroid p.c, summed in
    # dim order — the same fold order as kmeans_assign's aggregate
    d2 = (
        "list_sum(list_transform(range(1, len(v.e) + 1), "
        "i -> (v.e[i] - p.c[i]) * (v.e[i] - p.c[i])))"
    )
    parts = [
        vec_cte,
        f"""
    c0 AS (
      SELECT CAST(rn - 1 AS INT) AS cl, e AS c FROM (
        SELECT e, row_number() OVER (
            ORDER BY CAST(('0x' || substr(md5('{seed}:' || CAST(id AS VARCHAR)), 1, 8)) AS BIGINT),
                     id) AS rn
        FROM v) WHERE rn <= {k})""",
    ]
    for n in range(1, iters + 1):
        parts.append(f"""
    a{n} AS (
      SELECT id, e, cl FROM (
        SELECT v.id, v.e, p.cl,
               row_number() OVER (PARTITION BY v.id ORDER BY {d2}, p.cl) AS rn
        FROM v CROSS JOIN c{n - 1} p) WHERE rn = 1),
    u{n} AS (
      SELECT cl, i, round(avg(e[i]) * {fac}) / {fac} AS m
      FROM a{n}, LATERAL unnest(range(1, len(e) + 1)) AS r(i)
      GROUP BY cl, i),
    c{n} AS (
      SELECT p.cl, coalesce(g.c, p.c) AS c
      FROM c{n - 1} p LEFT JOIN (
        SELECT cl, list(m ORDER BY i) AS c FROM u{n} GROUP BY cl) g
      USING (cl))""")
    final_assign = f"""
    SELECT id AS {out_id}, cl AS cluster FROM (
      SELECT v.id, p.cl,
             row_number() OVER (PARTITION BY v.id ORDER BY {d2}, p.cl) AS rn
      FROM v CROSS JOIN c{iters} p) WHERE rn = 1"""
    if suffix_sql is None:
        return (
            "WITH " + ",".join(parts) + final_assign + f"\n    ORDER BY {out_id}\n    "
        )
    parts.append(f"\n    assign AS ({final_assign})")
    return "WITH " + ",".join(parts) + "\n    " + suffix_sql


@register(
    "kmeans_clusters",
    oracle=kmeans_unrolled_sql(
        "v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings)",
        out_id="vec_id",
        k=8,
        iters=3,
        seed=42,
    ),
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 3 iterations) over the full
    embedding table — the canonical iterative algorithm on Spark:
    per iteration, a map-side literal-centroid assignment plus ONE
    partial-combined hash agg whose shuffle is O(k x dim x
    partitions) and whose driver state is k x dim cells; the corpus
    itself is scanned once (localCheckpoint), never re-shuffled. The
    oracle recomputes init + every iteration + final assignment in
    pure SQL (``kmeans_unrolled_sql``) — nothing driver-side is
    trusted; per-iteration centroid rounding keeps the two engines'
    trajectories bit-identical."""
    from oups_spark.operators.similarity import kmeans_lloyd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return (
        kmeans_lloyd(emb, k=8, iters=3, seed=42, center_decimals=6)
        .select("vec_id", "cluster")
        .orderBy("vec_id")
    )


# shared bigram-LM scoring chain ending in nll(doc_id, n_bigrams,
# avg_nll) — reused by lm_quality_score and ccnet_quality_buckets so
# the scoring definition cannot diverge between oracles
_LM_CTE = f"""
    WITH t AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    u AS (SELECT unnest(tok) AS w1 FROM t),
    uni AS (SELECT w1, count(*) AS cu FROM u GROUP BY w1),
    v AS (SELECT count(*) AS V FROM uni),
    bg AS (SELECT doc_id, tok[i] || ' ' || tok[i+1] AS bg, tok[i] AS w1
           FROM t, LATERAL unnest(range(1, len(tok))) AS r(i)
           WHERE len(tok) >= 2),
    big AS (SELECT bg, count(*) AS cb FROM bg GROUP BY bg),
    nll AS (SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(-ln((cb + 1) / (cu + V))), 6) AS avg_nll
            FROM bg JOIN big USING (bg) JOIN uni USING (w1), v
            GROUP BY doc_id)"""


@register(
    "lm_quality_score",
    oracle=_LM_CTE
    + """
    SELECT doc_id, n_bigrams, avg_nll FROM nll ORDER BY doc_id
    """,
)
def lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM negative log-likelihood per document —
    the cheap perplexity-style quality filter (atypical word
    transitions => high score). Count tables shuffle at vocabulary
    size (map-side partial combine). The scoring joins are NOT
    broadcast-pinned: the bigram vocabulary grows with the corpus, so
    AQE broadcasts the count tables while they measure small and
    falls back to shuffled hash joins on the uniform token keys at
    scale (see ``bigram_nll_df``)."""
    from oups_spark.operators.text import bigram_nll_df

    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    return bigram_nll_df(docs, "doc_id").orderBy("doc_id")


@register(
    "ccnet_quality_buckets",
    oracle=_LM_CTE
    + """,
    cuts AS (SELECT round(quantile_cont(avg_nll, 1.0/3) * 1000000) / 1000000 AS c1,
                    round(quantile_cont(avg_nll, 2.0/3) * 1000000) / 1000000 AS c2
             FROM nll)
    SELECT doc_id, avg_nll,
           CASE WHEN avg_nll <= c1 THEN 'head'
                WHEN avg_nll <= c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM nll, cuts ORDER BY doc_id
    """,
)
def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: split the corpus into
    head / middle / tail terciles of the self-trained bigram-LM score
    (lower NLL = more 'in-distribution' = head) — the classic
    quality-tiering step before mixing or filtering. The tercile cuts
    are ONE tiny aggregate broadcast back; bucketing itself is
    map-side. Cuts are pinned via ``round(q * 1e6) / 1e6`` so both
    engines compare against the bit-identical thresholds (scores are
    already 6dp-rounded). At 100 TB swap the exact ``percentile`` for
    ``approx_percentile`` — the cut shifts by the sketch error and
    only boundary documents move buckets."""
    from oups_spark.operators.text import bigram_nll_df

    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
    )
    nll = bigram_nll_df(docs, "doc_id")
    pin = lambda c: F.round(c * 1e6) / 1e6  # noqa: E731
    cuts = nll.agg(
        pin(F.percentile(F.col("avg_nll"), F.lit(1.0 / 3))).alias("c1"),
        pin(F.percentile(F.col("avg_nll"), F.lit(2.0 / 3))).alias("c2"),
    )
    return (
        nll.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "avg_nll",
            F.when(F.col("avg_nll") <= F.col("c1"), F.lit("head"))
            .when(F.col("avg_nll") <= F.col("c2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- #
# Quality classifier: full-batch logistic regression (GPT-3 /      #
# CCNet wiki-vs-crawl filter shape), trained distributed, oracle   #
# replays init + every epoch + scoring in pure SQL.                #
# ---------------------------------------------------------------- #

_QC_DIM = 32
_QC_LR = 0.5  # exactly binary-representable: lr * g is one IEEE multiply
_QC_EPOCHS = 3
_QC_MD5B = "CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)"

# featurization twin of hashed_feature_vectors(round_to=None) with the
# binary label riding along; last CTE is vx(doc_id, y DOUBLE,
# xa DOUBLE[dim+1]) — the bias-augmented unit vector
_QC_VEC_CTE = f"""
    t AS (SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                 {_TOK} AS tok
          FROM documents),
    b AS (SELECT doc_id, y,
                 list_transform(tok, x -> {_QC_MD5B} % {_QC_DIM}) AS bk
          FROM t),
    h AS (SELECT doc_id, y,
                 list_transform(range(0, {_QC_DIM}),
                   d -> CAST(len(list_filter(bk, v -> v = d)) AS DOUBLE)) AS hv
          FROM b),
    vx AS (SELECT doc_id, CAST(y AS DOUBLE) AS y,
                  list_append(
                    CASE WHEN sqrt(list_sum(list_transform(hv, x -> x*x))) > 0
                         THEN list_transform(hv,
                           x -> x / sqrt(list_sum(list_transform(hv, z -> z*z))))
                         ELSE hv END,
                    1.0::DOUBLE) AS xa
           FROM h)"""


def logreg_unrolled_sql() -> str:
    """Pure-SQL unrolled full-batch logistic regression — a fully
    INDEPENDENT DuckDB oracle (no repo code executes): w0 = zeros,
    then per epoch the rounded residual ``r = round(sigmoid(w·xa) -
    y, 6)``, the per-dimension gradient as the order-independent
    integer-grid sum ``sum(round(r·xa[i]·1e6)) / (1e6·n)``, and the
    rounded update ``round((w_i - lr·g_i)·1e6)/1e6`` — the exact
    IEEE sequence ``logreg_train_gd`` evaluates (Spark's scale-0
    ``F.round`` and DuckDB's ``round`` are both half-away-from-zero;
    dots fold in index order in both engines). Final SELECT scores
    every document with the trained weights."""
    fac = 10**6
    dimp1 = _QC_DIM + 1

    def dot(wcol: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dimp1 + 1}), "
            f"i -> xa[i] * {wcol}[i]))"
        )

    parts = [
        _QC_VEC_CTE,
        f"""
    w0 AS (SELECT list_transform(range(0, {dimp1}), i -> 0.0::DOUBLE) AS w)""",
    ]
    for n in range(1, _QC_EPOCHS + 1):
        parts.append(f"""
    r{n} AS (SELECT doc_id, y, xa,
                    round((1.0/(1.0 + exp(-({dot('w')}))) - y) * {fac}) / {fac} AS r
             FROM vx, w{n - 1}),
    g{n} AS (SELECT i,
                    sum(round(r * xa[i] * {fac})) / ({fac} * count(*)) AS g
             FROM r{n}, LATERAL unnest(range(1, {dimp1 + 1})) AS u(i)
             GROUP BY i),
    w{n} AS (SELECT list(round((p.w[g.i] - {_QC_LR!r}::DOUBLE * g.g) * {fac}) / {fac}
                         ORDER BY g.i) AS w
             FROM g{n} g, w{n - 1} p)""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT doc_id, CAST(y AS INT) AS label,
           round((1.0/(1.0 + exp(-({dot('w')})))) * {fac}) / {fac} AS score
    FROM vx, w{_QC_EPOCHS} ORDER BY doc_id
    """
    )


@register("quality_classifier_scores", oracle=logreg_unrolled_sql())
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-deploy a quality classifier END TO END with zero
    model dependencies: hashing-trick featurization feeds full-batch
    logistic regression (``logreg_train_gd``) labeled wiki-vs-crawl
    style (here: ``lang = 'en'`` as the reference domain), then every
    document is scored map-side with the trained literal weights —
    the linear quality-filter pass of GPT-3/CCNet-style curation.
    Scale shape: the featurized corpus persists ONCE; each epoch is
    one map-side residual pass plus ONE partial-combined hash agg
    whose shuffle is (dim+1) x n_partitions cells; scoring is pure
    map-side (zero shuffle). Driver state = dim+1 floats. The oracle
    (``logreg_unrolled_sql``) replays featurization, all epochs, and
    scoring in pure SQL and checks every document's score."""
    from oups_spark.operators.classifier import logreg_score, logreg_train_gd
    from oups_spark.operators.retrieval import hashed_feature_vectors

    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text", "lang")
    )
    labeled = hashed_feature_vectors(
        docs.withColumn("label", (F.col("lang") == "en").cast("int")),
        id_col="doc_id",
        dim=_QC_DIM,
        round_to=None,
        keep=("label",),
    )
    w = logreg_train_gd(
        labeled,
        vec_col="features",
        label_col="label",
        lr=_QC_LR,
        epochs=_QC_EPOCHS,
        decimals=6,
        dim=_QC_DIM,
    )
    return (
        logreg_score(labeled, w, vec_col="features", out_col="score")
        .select("doc_id", "label", "score")
        .orderBy("doc_id")
    )


def _hll_oracle() -> str:
    from oups_spark.operators.sketch import hll_oracle_sql

    return hll_oracle_sql(
        "SELECT source, unnest(list_filter("
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != ''))"
        " AS tok FROM documents",
        "tok",
        ["source"],
        p=8,
    )


@register("hll_distinct_tokens", oracle=_hll_oracle())
def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct vocabulary per source via a portable
    HyperLogLog sketch (md5-derived registers, exactly replayable in
    DuckDB — see ``operators/sketch.py``). The scale path for
    "distinct tokens/urls per slice" on 100 TB: the shuffle after the
    map-side register fold carries at most 256 rows per source instead
    of every distinct token, and register tables from separate ingest
    batches merge by elementwise max without rescanning."""
    from oups_spark.operators.sketch import hll_distinct
    from oups_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    return hll_distinct(toks, "tok", ["source"], p=8).orderBy("source")


def _countmin_oracle() -> str:
    from oups_spark.operators.sketch import countmin_oracle_sql

    return countmin_oracle_sql(
        "SELECT unnest(list_filter("
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != ''))"
        " AS tok FROM documents",
        "tok",
        top_k=25,
    )


@register("countmin_heavy_hitters", oracle=_countmin_oracle())
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 corpus tokens by Count-Min estimated frequency — the
    frequency-sketch twin of ``hll_distinct_tokens``. The register
    table (4×1024 exact integer counters) is what scales: mergeable
    by elementwise sum across ingest batches, broadcastable for
    point-frequency lookups, and the shuffle after the map-side
    partial sum is bounded by depth×width rows regardless of corpus
    size. Ties at the cut break on token, so the result is total-
    ordered and hash-exact against the DuckDB replay."""
    from oups_spark.operators.sketch import (
        countmin_estimate,
        countmin_register_table,
    )
    from oups_spark.operators.text import tokens

    # one-row-group fixture file -> one scan task; the tokenize+md5
    # register pass feeds two consumers (register build + estimate
    # probe) and measured 1.5s single-task — spread it (A/B: -0.6s
    # wall; the per-task expression-setup CPU this adds amortizes at
    # real scale, where scans arrive multi-partition and this
    # repartition is a no-op cost-wise)
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    regs = countmin_register_table(toks, "tok")
    est = countmin_estimate(regs, toks, "tok")
    return est.orderBy(F.desc("cm_count"), "tok").limit(25)


def _histq_oracle() -> str:
    from oups_spark.operators.sketch import histogram_quantile_oracle_sql

    return histogram_quantile_oracle_sql(
        "SELECT event_type, value FROM events",
        "value",
        [0.5, 0.9, 0.99],
        ["event_type"],
    )


@register("histogram_quantiles_by_type", oracle=_histq_oracle())
def histogram_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event value per type from a
    fixed-grid histogram sketch — the sortless, mergeable complement
    to the exact ``value_percentiles_by_type``: two bounded aggs, a
    shuffle of ≤128 rows per type, bucket counts summable across
    batches. Error ≤ one bucket width; hash-exact vs the DuckDB
    replay of the same grid."""
    from oups_spark.operators.sketch import histogram_quantiles

    events = load(spark, sf_dir, "events")
    return histogram_quantiles(
        events, "value", [0.5, 0.9, 0.99], ["event_type"]
    ).orderBy("event_type", "q")


def _bloom_oracle() -> str:
    from oups_spark.operators.sketch import bloom_oracle_cte

    chain = bloom_oracle_cte(
        f"""SELECT DISTINCT unnest(sh) AS it FROM (
              SELECT {_SH3} AS sh FROM (
                SELECT {_TOK} AS tok FROM documents WHERE source = 'src0'))""",
        f"""SELECT doc_id, unnest(sh) AS it FROM (
              SELECT doc_id, {_SH3} AS sh FROM (
                SELECT doc_id, {_TOK} AS tok FROM documents
                WHERE source != 'src0'))""",
    )
    return f"""
    WITH {chain},
    tg AS (SELECT doc_id, it FROM bf_probe),
    hits AS (
      SELECT tg.doc_id, count(*) AS n_grams,
             sum(CASE WHEN b.bloom_hit THEN 1 ELSE 0 END)::BIGINT
               AS n_bloom_hits
      FROM tg JOIN bloomed b USING (it) GROUP BY tg.doc_id)
    SELECT doc_id, n_grams, n_bloom_hits,
           round(n_bloom_hits / n_grams::DOUBLE, 6) AS hit_frac
    FROM hits ORDER BY doc_id
    """


@register("bloom_decontamination", oracle=_bloom_oracle())
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a Bloom filter — the scale
    path next to the exact ``decontamination_overlap`` join: the
    benchmark's shingle set compresses to ≤2048 BIGINT words
    (mergeable across benchmark shards by elementwise OR), the corpus
    probes it MAP-SIDE via broadcast instead of shuffling every
    shingle, and no false negatives means nothing contaminated slips
    through; the bounded false-positive rate only ever over-flags.
    Deterministic (md5 bit placement), so hash-exact vs the replay."""
    from oups_spark.operators.sketch import bloom_probe, bloom_word_table
    from oups_spark.operators.text import shingles, tokens

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        shingles(tokens(F.col("text")), 3).alias("sh"),
    )
    # explode_nonnull on both branches: keeps the inferred size(sh)
    # filter (which inlines the whole shingle pipeline, 2x eval/row)
    # out of the scan — rationale on the helper. Shingles are
    # concat_ws output, never null per element.
    from oups_spark.operators.text import explode_nonnull

    bench = explode_nonnull(
        t.filter(F.col("source") == "src0"), "sh", "g"
    ).distinct()
    words = bloom_word_table(bench, "g")
    tg = explode_nonnull(
        t.filter(F.col("source") != "src0"), "sh", "g", keep=["doc_id"]
    )
    probed = bloom_probe(words, tg, "g", ["doc_id"])
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_bloom_hits",
            F.round(
                F.col("n_bloom_hits") / F.col("n_grams").cast("double"), 6
            ).alias("hit_frac"),
        )
        .orderBy("doc_id")
    )


def _hll_overlap_oracle() -> str:
    from oups_spark.operators.sketch import hll_overlap_oracle_sql

    return hll_overlap_oracle_sql(
        "SELECT source, unnest(list_filter("
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != ''))"
        " AS tok FROM documents",
        "tok",
        "source",
        p=8,
    )


@register("hll_source_overlap", oracle=_hll_overlap_oracle())
def hll_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources estimated from the
    HLL register table ALONE (union = elementwise max, intersection
    by inclusion–exclusion) — the sketch-algebra payoff: a G×G source
    similarity matrix whose cost is G²·256 register rows, with the
    corpus scanned once no matter how many pairs are compared."""
    from oups_spark.operators.sketch import (
        hll_pairwise_overlap,
        hll_register_table,
    )
    from oups_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    regs = hll_register_table(toks, "tok", ["source"], p=8)
    return hll_pairwise_overlap(regs, "source", p=8).orderBy(
        "group_a", "group_b"
    )


_GOPHER_SQL_TOK = _TOK  # shared tokenizer twin


def _gopher_oracle_sql() -> str:
    from oups_spark.operators.text import (
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDLEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDLEN,
        GOPHER_MIN_WORDS,
        STOPWORDS,
    )

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH t AS (
      SELECT doc_id, text, {_GOPHER_SQL_TOK} AS tok FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(tok) AS n,
             coalesce(list_sum(list_transform(tok, x -> len(x))), 0)
               AS sumlen,
             len(list_filter(tok, x -> regexp_matches(x, '[a-z]')))
               AS nalpha,
             len(list_intersect(list_distinct(tok), [{stop_list}]))
               AS nstop,
             len(regexp_extract_all(text, '#|\\.\\.\\.')) AS nsym
      FROM t
    ),
    s AS (
      SELECT doc_id, n, nstop,
             round(sumlen / greatest(n, 1)::DOUBLE, 6) AS mwl,
             round(nalpha / greatest(n, 1)::DOUBLE, 6) AS alpha,
             round(nsym / greatest(n, 1)::DOUBLE, 6) AS symr
      FROM m
    )
    SELECT doc_id,
           n::BIGINT AS n_words,
           mwl AS mean_word_len,
           alpha AS alpha_frac,
           nstop::INT AS n_stopwords,
           symr AS symbol_ratio,
           (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS})
             AS pass_words,
           (mwl >= {GOPHER_MIN_WORDLEN!r} AND mwl <= {GOPHER_MAX_WORDLEN!r})
             AS pass_wordlen,
           (alpha >= {GOPHER_MIN_ALPHA_FRAC!r}) AS pass_alpha,
           (nstop >= {GOPHER_MIN_STOPWORDS}) AS pass_stopwords,
           (symr <= {GOPHER_MAX_SYMBOL_RATIO!r}) AS pass_symbols,
           ((n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS})
            AND (mwl >= {GOPHER_MIN_WORDLEN!r} AND mwl <= {GOPHER_MAX_WORDLEN!r})
            AND (alpha >= {GOPHER_MIN_ALPHA_FRAC!r})
            AND (nstop >= {GOPHER_MIN_STOPWORDS})
            AND (symr <= {GOPHER_MAX_SYMBOL_RATIO!r})) AS keep
    FROM s ORDER BY doc_id
    """


@register("gopher_quality_rules", oracle=_gopher_oracle_sql())
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based corpus filter (Rae et al. 2021 App. A): the
    length/lexical rules as per-document flags plus the conjunctive
    keep decision — the standard first curation pass before dedup and
    model-based selection. Fully map-side (one tokenize behind a
    Generate barrier, no shuffle, no UDF); at 100 TB this runs inside
    the scan stage and the keep flag predicate-pushes into downstream
    reads when materialized as a partition or file-level column."""
    from oups_spark.operators.text import gopher_quality_flags_df

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return gopher_quality_flags_df(docs, "doc_id").orderBy("doc_id")


@register(
    "domain_url_stats",
    oracle="""
    WITH per AS (
      SELECT source,
             count(*) AS n_docs,
             sum(n_chars) AS total_chars,
             round(avg(n_chars), 6) AS avg_chars,
             count(DISTINCT md5(text)) AS n_distinct_texts
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_docs)::DOUBLE AS corpus_docs FROM per)
    SELECT source,
           n_docs::BIGINT AS n_docs,
           total_chars::BIGINT AS total_chars,
           avg_chars,
           n_distinct_texts::BIGINT AS n_distinct_texts,
           round(1.0 - n_distinct_texts / n_docs::DOUBLE, 6) AS dup_rate,
           round(n_docs / corpus_docs, 6) AS corpus_share
    FROM per, tot ORDER BY source
    """,
)
def domain_url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain (source) corpus profile: volume, average document
    size, exact-duplicate rate (distinct md5 digests vs rows), and
    corpus share — the aggregate a crawl-curation pass uses to decide
    per-domain caps (RefinedWeb-style). One hash-partitioned agg over
    #domains keys; the corpus total is a single broadcast row joined
    back map-side. Text itself never shuffles: the md5 digest (16
    bytes) stands in for it in the distinct count; at 100 TB swap
    count_distinct for approx_count_distinct if exactness can yield."""
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("double").alias("corpus_docs")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            "total_chars",
            "avg_chars",
            F.col("n_distinct_texts").cast("long").alias("n_distinct_texts"),
            F.round(
                1.0
                - F.col("n_distinct_texts").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
            F.round(
                F.col("n_docs").cast("double") / F.col("corpus_docs"), 6
            ).alias("corpus_share"),
        )
        .orderBy("source")
    )
