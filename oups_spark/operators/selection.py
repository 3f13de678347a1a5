"""Data-selection operators for training-corpus assembly:
importance resampling (DSIR-style) and semantic dedup (SemDeDup-style).

Both are pure-DataFrame plans (no UDFs) designed around bounded
shuffles: the importance model is a FIXED-width hashed n-gram table
(B buckets regardless of corpus size — genuinely broadcastable, unlike
a raw vocabulary), and semantic dedup only ever compares vectors that
share a k-means cluster, never all pairs.

References (public papers; no reference-repo counterpart — these are
beyond-reference additions for the LLM-data layer):
- Xie et al. 2023, "Data Selection for Language Models via Importance
  Resampling" (DSIR): hashed n-gram bag-of-words importance weights
  between a target and a raw distribution, Gumbel-noise top-k.
- Abbas et al. 2023, "SemDeDup": cluster embeddings, drop
  near-duplicates within each cluster, keep one representative.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from oups_spark.operators.text import bigrams, md5_int, tokens


def _hashed_ngram_buckets(text_col, n_buckets: int):
    """Unigrams + word-bigrams hashed into ``n_buckets`` (md5 % B,
    engine-portable) — DSIR's hashed n-gram featurization. Returns an
    array column of bucket ids WITH multiplicity."""
    tok = tokens(text_col)
    grams = F.concat(tok, bigrams(tok))
    return F.transform(
        grams, lambda g: F.pmod(md5_int(g), F.lit(n_buckets)).cast("int")
    )


def dsir_importance_weights(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    is_target,
    n_buckets: int = 1024,
    decimals: int = 6,
) -> DataFrame:
    """Per-document importance log-weight ``log p_target(x) -
    log p_raw(x)`` under bag-of-hashed-ngrams unigram models — the
    DSIR recipe for selecting raw data that "looks like" a target
    corpus.

    ``is_target`` is a boolean Column marking the target rows inside
    ``df`` (e.g. ``F.col("source") == "wiki"``); every row gets a
    weight, scored against models trained on the two partitions of
    the SAME input (one corpus scan for training, one for scoring).

    Shape at 100 TB: the model is exactly ``n_buckets`` rows whatever
    the corpus size (the point of hashing the n-grams), trained by
    one explode + hash agg with map-side partial combine, then
    BROADCAST to a map-side scoring join — the corpus itself never
    shuffles. Add-one smoothing keeps unseen buckets finite.

    Output: ``id_col``, ``n_grams`` (gram count), ``log_weight``
    (rounded to ``decimals``; 0.0 for gram-less docs).
    """
    base = df.select(
        F.col(id_col),
        is_target.alias("__tgt"),
        _hashed_ngram_buckets(F.col(text_col), n_buckets).alias("__bk"),
    )
    # the plan references the featurization THREE times (model counts,
    # scoring join probe, and the gram-less left join's id spine);
    # without materializing it the tokenize + ngram-hash fold — the
    # expensive part of the whole operator — re-runs per reference.
    # Eager localCheckpoint rather than DataFrame.persist: the caller
    # never gets a handle to unpersist, and a persist here would leak
    # a CacheManager entry per invocation for the life of the session;
    # checkpoint blocks are ContextCleaner-reclaimed once the result
    # goes out of scope (tradeoff: truncated lineage, so an executor
    # loss mid-run recomputes from the checkpoint replicas or fails
    # rather than replaying lineage).
    base = base.localCheckpoint(eager=True)
    ex = base.select(id_col, "__tgt", F.explode("__bk").alias("b"))
    # one hash agg trains BOTH models: per-bucket target/raw counts
    counts = ex.groupBy("b").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("__tgt"), 1).otherwise(0)).alias("cr"),
    )
    tot = counts.agg(
        F.sum("ct").alias("Tt"), F.sum("cr").alias("Tr")
    )
    # log p_target(b) - log p_raw(b), add-one smoothed over B buckets
    model = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + 1.0) / (F.col("Tt") + float(n_buckets)))
            - F.log((F.col("cr") + 1.0) / (F.col("Tr") + float(n_buckets)))
        ).alias("llr"),
    )
    scored = (
        ex.join(F.broadcast(model), on="b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("llr"), decimals).alias("log_weight"),
        )
    )
    # gram-less documents (empty text) carry weight 0, not a dropout
    return (
        base.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def gumbel_topk_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "dsir",
    decimals: int = 6,
) -> DataFrame:
    """Deterministic Gumbel top-k: sampling k rows WITHOUT replacement
    with probability proportional to ``exp(weight)`` is equivalent to
    taking the top k of ``weight + Gumbel noise`` (the Gumbel-max
    trick DSIR uses to avoid a normalization pass). The noise is
    derived from ``md5(seed:id)`` — deterministic, engine-portable,
    and free of any global RNG state, so the sample is reproducible
    across runs, engines and partitionings.

    One bounded TakeOrdered job: no full sort, no collect.
    Output adds ``gumbel_key`` (the perturbed weight) and is the k
    selected rows ordered by it descending.
    """
    # u in (0, 1): 32-bit md5 prefix scaled into the open interval
    u = (md5_int(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))) + 1.0) / (
        2.0**32 + 2.0
    )
    g = -F.log(-F.log(u))
    key = F.round(F.col(weight_col) + g, decimals)
    return (
        df.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k)
    )


def semdedup_prune(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    iters: int = 2,
    seed: int = 42,
    threshold: float = 0.97,
    decimals: int = 6,
) -> DataFrame:
    """SemDeDup: cluster the embedding space with k-means, then inside
    each cluster mark semantic near-duplicates (cosine similarity
    above ``threshold``) and keep one representative per duplicate
    group — the lowest-id member of each "I duplicate someone"
    relation, matching the paper's keep-one-per-pair pruning.

    Scale shape: the ONLY pairwise work happens within a cluster —
    the self-join key is the cluster id, so the comparison volume is
    sum over clusters of |c|^2, controlled by choosing k so clusters
    stay bounded. The default ``k=None`` ENFORCES the paper's
    ``k ~ sqrt(n)`` with one cheap count, keeping comparison volume
    ~``n * sqrt(n)`` without caller tuning — a fixed k silently goes
    quadratic at 100 TB, so scale-safety is the default rather than a
    docstring footnote; pass an explicit k to pin it (oracle-checked
    queries do, for deterministic trajectories). At 100 TB the
    cluster id doubles as the partition key and each cluster's block
    fits one task. Nothing all-pairs, nothing collected.

    Output: ``id_col``, ``cluster``, ``keep`` (false = pruned as a
    semantic duplicate of an earlier-id member of the same cluster).
    """
    import math

    from oups_spark.operators.similarity import kmeans_lloyd

    if k is None:
        k = max(1, math.ceil(math.sqrt(vectors.count())))

    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    # normalize ONCE per vector (O(n) folds): the per-pair cosine then
    # collapses to a single dot fold instead of dot + two norms — 3x
    # less O(pairs) array-fold work, the hot loop of this operator.
    # Zero vectors map to the zero unit (cosine 0, never a duplicate)
    # rather than NaN, which Spark/DuckDB comparison semantics would
    # otherwise treat as GREATER than the threshold.
    unit = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(
        F.transform(v, lambda x: x * 0.0)
    )
    assigned = kmeans_lloyd(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        iters=iters,
        seed=seed,
        center_decimals=decimals,
    ).select(F.col(id_col), F.col("cluster"), unit.alias("__u"))
    cos = F.aggregate(
        F.zip_with(F.col("a.__u"), F.col("b.__u"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    dup_of_earlier = (
        a.join(
            b,
            on=[
                F.col("a.cluster") == F.col("b.cluster"),
                F.col(f"a.{id_col}") > F.col(f"b.{id_col}"),
            ],
        )
        .filter(F.round(cos, decimals) >= threshold)
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(
            dup_of_earlier.withColumn("__dup", F.lit(True)),
            on=id_col,
            how="left",
        )
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    width: int = 8,
) -> DataFrame:
    """Exact duplicate-SPAN removal with text reassembly — the
    C4/RefinedWeb-style pass that deletes boilerplate shared across
    documents (Lee et al. 2022's exact substring dedup, at
    non-overlapping ``width``-token segment granularity): a segment
    whose text appears in MORE than one document is dropped from all
    of them; the surviving segments are re-concatenated in order.

    Shuffle shape at 100 TB: segments explode to ~n_tok/width rows,
    counted by an md5 fingerprint hash agg (map-side combined); the
    count table grows with distinct segments so it is NOT broadcast —
    the join back is a shuffled hash join on the uniform fp key, then
    one groupBy(id) rebuilds each document (collect_list + array_sort
    driver-free, bounded by the document's own segment count).

    Output: ``id_col``, ``n_segments``, ``n_removed``, ``clean_text``
    (empty string for token-less documents).
    """
    tok = tokens(F.col(text_col))
    n_seg = F.ceil(F.size(tok) / F.lit(float(width))).cast("int")
    seg_structs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.struct(
            i.alias("i"),
            F.concat_ws(
                " ", F.slice(tok, i * width + 1, width)
            ).alias("s"),
        ),
    )
    # token-less docs: sequence(0, -1) DESCENDS in Spark ([0, -1]),
    # so null the array out instead — explode drops it, and the final
    # left join restores the doc with zero counts.
    # explode_nonnull: keeps the inferred size(__segs) filter (which
    # would re-evaluate the whole tokenize/segment pipeline below the
    # repartition, on the single-task pre-shuffle side) out of the
    # scan — rationale on the helper; plan shape pinned by
    # test_remove_duplicate_spans_no_filter_below_repartition.
    from oups_spark.operators.text import explode_nonnull

    seg_structs = F.when(n_seg > 0, seg_structs)
    base = df.select(F.col(id_col), seg_structs.alias("__segs"))
    segs = explode_nonnull(base, "__segs", "g", keep=[id_col]).select(
        id_col,
        F.col("g.i").alias("i"),
        F.col("g.s").alias("s"),
        F.md5(F.col("g.s")).alias("fp"),
    )
    # distinct-doc count per fingerprint via a WINDOW over fp rather
    # than groupBy + join-back: the exploded segment table shuffles
    # ONCE (the join-back formulation exchanged it a second time and
    # hashed it against the count table). Distinct count inside the
    # window is the sorted-run trick: order by id, flag first
    # occurrence, sum flags over the whole partition.
    w_ord = Window.partitionBy("fp").orderBy(F.col(id_col))
    w_all = Window.partitionBy("fp")
    first_occ = (
        F.col(id_col) != F.lag(F.col(id_col)).over(w_ord)
    ).cast("long")
    new_flag = F.coalesce(first_occ, F.lit(1))
    joined = segs.withColumn(
        "nd", F.sum(new_flag).over(w_all)
    )
    dup = F.col("nd") > 1
    rebuilt = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(dup.cast("long")).alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(~dup, F.struct("i", "s")))
                ),
                lambda x: x["s"],
            ),
        ).alias("clean_text"),
    )
    return (
        df.select(id_col)
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def temperature_sample(
    df: DataFrame,
    *,
    id_col: str,
    by: str,
    alpha: float,
    target_total: int,
    seed: str = "mix",
    decimals: int = 9,
) -> DataFrame:
    """Temperature-controlled source mixing (the T5/LLaMA multinomial
    recipe): source ``s`` is sampled with probability proportional to
    ``n_s^alpha`` — ``alpha < 1`` upweights small sources, ``alpha=1``
    is natural proportions. Realized as deterministic per-row hash
    sampling: source ``s`` keeps each row with rate ``min(1,
    target_total * p_s / n_s)`` where ``p_s = n_s^alpha / sum
    n^alpha``, so expected output is ``target_total`` rows mixed at
    the tempered proportions, reproducible across runs, engines and
    partitionings (``md5(seed:id)`` threshold, no RNG state).

    One bounded hash agg (per-source counts, #sources rows), rates
    broadcast back, map-side filter — the corpus never shuffles.
    Keep-rate rounded via ``round(q * 10^d) / 10^d`` so an engine
    replaying the same formula reaches the bit-identical threshold.

    Output: the sampled rows with ``keep_rate`` attached.
    """
    counts = df.groupBy(by).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(alpha))).alias("__z")
    )
    factor = F.lit(float(10**decimals))
    q = F.least(
        F.lit(1.0),
        F.lit(float(target_total))
        * F.pow(F.col("__n").cast("double"), F.lit(alpha))
        / F.col("__z")
        / F.col("__n").cast("double"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        by, (F.round(q * factor) / factor).alias("keep_rate")
    )
    u = (
        md5_int(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
        / F.lit(2.0**32)
    )
    return (
        df.join(F.broadcast(rates), on=by)
        .filter(u < F.col("keep_rate"))
    )
