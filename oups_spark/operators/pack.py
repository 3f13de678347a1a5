"""Training-corpus assembly operators: token-budget sequence packing
and deterministic stratified sampling.

Reference parity: none — beyond-reference LLM-pipeline layer (the
reference has no corpus operators at all).

``pack_token_budget`` assigns documents to fixed token-budget packs
by CONTIGUOUS FILL: documents are laid out in (by, id) order, the
running token offset is computed, and a document belongs to pack
``floor(offset / budget)`` — the concat-then-chunk layout used to
build training sequences. The running offset never goes through a
single-partition window: ids are range-bucketed, per-bucket token
sums come back to the driver (one tiny row per bucket), and each
bucket's rows window only within their bucket plus a driver-computed
offset — the same two-phase global-prefix-sum shape as
``add_row_count_bins``.

``stratified_sample`` keeps each group's rows at a per-group rate
using a cross-engine-deterministic md5 hash of the id — the
reproducible down-sampling used for domain mixing (rebalancing
sources/languages to a target mixture). No RNG state, identical
selection in any engine that can compute md5.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from oups_spark.operators.segment import bucketize
from oups_spark.operators.text import md5_int


def pack_token_budget(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    budget: int,
    by: list[str] | str | None = None,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
    n_buckets: int = 128,
) -> DataFrame:
    """Assign each row a pack id and its token offset within the
    (by-group's) concatenated stream.

    pack_id = floor(running_offset / budget) with running_offset =
    sum of ``token_col`` over all earlier rows in (``by``, ``id_col``)
    order — so a document straddling a boundary belongs to the pack
    where it starts, and every pack holds ~``budget`` tokens.
    """
    if isinstance(by, str):
        by = [by]
    by = by or []
    id_dtype = dict(df.dtypes)[id_col]
    if not (
        id_dtype.startswith("timestamp")
        or id_dtype in ("tinyint", "smallint", "int", "bigint", "date")
    ):
        # bucketize range-buckets via a long cast; a non-numeric id
        # would silently collapse to one bucket (single-partition
        # window) or drop null-bucket rows — refuse instead
        raise ValueError(
            f"pack_token_budget needs a numeric/timestamp id_col for "
            f"range bucketing, got {id_col!r}: {id_dtype}"
        )
    num = bucketize(df, id_col, n_buckets=n_buckets)
    sums = (
        num.groupBy(*by, "__bucket")
        .agg(F.sum(token_col).alias("__tok"))
        .collect()
    )
    # a NULL id has no place in the (by, id) layout order: it lands
    # in a NULL __bucket (visible here for free — no extra scan),
    # where the driver-side sorted() would raise TypeError and the
    # non-null-safe __bucket join would silently drop the rows —
    # refuse instead (same posture as the dtype guard above)
    if any(r["__bucket"] is None for r in sums):
        raise ValueError(
            f"pack_token_budget: {id_col!r} contains NULLs; drop or "
            f"impute them before packing"
        )
    # offsets are PER GROUP: only the bucket order within one group
    # matters, so group keys never need to be comparable (NULL-keyed
    # groups are fine)
    per_key: dict[tuple, dict] = {}
    for r in sums:
        key = tuple(r[c] for c in by)
        per_key.setdefault(key, {})[r["__bucket"]] = r["__tok"] or 0
    offsets: dict[tuple, int] = {}
    for key, buckets in per_key.items():
        acc = 0
        for b in sorted(buckets):
            offsets[(*key, b)] = acc
            acc += buckets[b]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(*k,) + (v,) for k, v in offsets.items()],
        num.select(*by, "__bucket").schema.add("__base", "long"),
    )
    w = (
        Window.partitionBy(*by, "__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = F.coalesce(F.sum(token_col).over(w), F.lit(0)) + F.col("__base")
    off_b = F.broadcast(off_df)
    # null-SAFE key equality: a NULL group key is a real group
    cond = [num["__bucket"] == off_b["__bucket"]]
    cond.extend(num[c].eqNullSafe(off_b[c]) for c in by)
    joined = num.join(off_b, on=cond).select(
        *[num[c] for c in num.columns], off_b["__base"]
    )
    return (
        joined.withColumn(offset_col, run.cast("long"))
        .withColumn(
            pack_col, F.floor(F.col(offset_col) / F.lit(budget)).cast("long")
        )
        .drop("__bucket", "__base")
    )


def deterministic_shuffle(
    df: DataFrame,
    *,
    id_col: str,
    seed: str,
    n_shards: int = 8,
    pos_col: str = "pos",
    shard_col: str = "shard",
    n_buckets: int = 128,
) -> DataFrame:
    """Reproducible global shuffle for training-data ordering: every
    row gets a global position under the total order ``(md5(seed:id),
    id)`` and a round-robin shard ``pos % n_shards`` (shard sizes
    differ by at most 1 — the balanced split training loaders want).

    No RNG state: the permutation is a pure function of (seed, id),
    so any engine — and any rerun — produces the identical order.
    The global position uses the same two-phase range-bucket prefix
    sum as :func:`pack_token_budget`: hash values are range-bucketed,
    per-bucket counts come back to the driver (one tiny row per
    bucket), and rows window only within their bucket. The md5 key is
    uniform by construction, so buckets are balanced even when ids
    are skewed — there is never a single-partition window.
    """
    from oups_spark.operators.segment import _offset_lookup

    h = md5_int(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    num = bucketize(df.withColumn("__h", h), "__h", n_buckets=n_buckets)
    counts = {
        r["__bucket"]: r["c"]
        for r in num.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    w = Window.partitionBy("__bucket").orderBy("__h", id_col)
    pos = _offset_lookup(offsets).cast("long") + F.row_number().over(w) - 1
    return (
        num.withColumn(pos_col, pos)
        .withColumn(shard_col, (F.col(pos_col) % n_shards).cast("int"))
        .drop("__h", "__bucket")
    )


def stratified_sample(
    df: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    denom: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum down-sampling: a row survives iff
    ``md5_int(id) % denom < rate * denom`` for its stratum's rate.
    Map-side filter, zero shuffle, bit-identical across engines and
    runs (the md5 arithmetic is shared with the DuckDB oracles)."""
    rate_expr = None
    for s, r in rates.items():
        cond = F.col(strata_col) == F.lit(s)
        rate_expr = (
            F.when(cond, F.lit(float(r)))
            if rate_expr is None
            else rate_expr.when(cond, F.lit(float(r)))
        )
    rate_expr = (
        rate_expr.otherwise(F.lit(float(default_rate)))
        if rate_expr is not None
        else F.lit(float(default_rate))
    )
    bucket = F.pmod(md5_int(F.col(id_col).cast("string")), F.lit(denom))
    return df.filter(bucket < rate_expr * denom)


def priority_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str,
    priority_col: str = "priority",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``k``
    rows by priority sampling (Duffield–Lund–Thorup, "Priority
    sampling for estimation of arbitrary subset sums", JACM 2007):
    each row gets priority ``w / u`` with ``u ~ U(0,1]``, and the k
    highest-priority rows form the sample — heavier rows are
    proportionally more likely to be drawn, no row twice.

    ``u`` is the engine-portable md5 hash (``(md5_int(seed:id)+1) /
    2^32``), so the "randomness" is a pure function of (seed, id):
    reruns, retries, and the DuckDB oracle all draw the identical
    sample. The priority is computed as ``w * 2^32 / (h+1)`` — the
    numerator is integer-exact in a double (w·2³² < 2⁵³ for any
    weight < 2²⁰) and a single IEEE division is correctly rounded,
    so the value is bit-identical across engines; no transcendental
    (ln/pow) whose last-ulp could differ between libms.

    Scale shape: the hash and division are map-side expressions; the
    cut is one TakeOrderedAndProject (no global sort, no shuffle of
    the corpus). Ties are broken by ``id_col`` ascending.
    """
    h = md5_int(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    pr = (
        F.col(weight_col).cast("double")
        * F.lit(4294967296.0)
        / (h + F.lit(1)).cast("double")
    )
    out = df.withColumn(priority_col, F.round(pr, 6))
    return out.orderBy(F.col(priority_col).desc(), F.col(id_col)).limit(k)


def priority_sample_oracle_sql(
    *,
    table: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str,
    select_cols: str,
    priority_col: str = "priority",
) -> str:
    """DuckDB twin of :func:`priority_sample`, generated from the
    same constants (seed, k, weight) so the drawn sample matches
    row-for-row."""
    h = (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR))"
        f", 1, 8)) AS BIGINT)"
    )
    return f"""
    SELECT {select_cols},
           round({weight_col}::DOUBLE * 4294967296.0
                 / ({h} + 1)::DOUBLE, 6) AS {priority_col}
    FROM {table}
    ORDER BY {priority_col} DESC, {id_col} LIMIT {k}
    """


def priority_sample_by(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    by: str,
    k_per_group: int,
    seed: str,
    priority_col: str = "priority",
) -> DataFrame:
    """Per-stratum :func:`priority_sample`: draw ``k_per_group``
    rows WITHOUT replacement inside every ``by`` group, probability
    proportional to weight — the balanced-per-domain sampler a
    mixing pipeline runs where a single global cut would let one
    mega-source crowd out the tail. Same engine-portable priority
    arithmetic; the cut is :func:`grouped_topk` (skew-safe two-phase
    per-group top-k), so a mega-group's rows never all travel."""
    h = md5_int(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    pr = (
        F.col(weight_col).cast("double")
        * F.lit(4294967296.0)
        / (h + F.lit(1)).cast("double")
    )
    out = df.withColumn(priority_col, F.round(pr, 6))
    return grouped_topk(
        out,
        group_col=by,
        order_col=priority_col,
        id_col=id_col,
        k=k_per_group,
        ascending=False,
    )


def grouped_topk(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int,
    ascending: bool = False,
    rank_col: str = "rk",
) -> DataFrame:
    """Skew-safe per-group top-k: the fallback for a plain
    ``row_number`` window when one group dwarfs the rest (a
    mega-domain in per-domain quotas). Two phases:

    1. LOCAL top-k per (input partition, group) via ``mapInPandas``
       folding across the partition's Arrow batches — memory and
       shuffle output are bounded at k rows per group per partition,
       so the hot group's billions of rows never travel;
    2. the exact ``row_number`` window over the reduced set (at most
       k x n_partitions rows per group).

    Deterministic: ordering is ``(order_col, id_col)`` with the id
    ascending tiebreak in both phases. NULL order values sort LAST in
    both directions — pandas ``na_position='last'`` in phase 1 must
    agree with the window spec in phase 2, and Spark's bare ``asc()``
    would put nulls FIRST (rows phase 1 already dropped from its
    local top-k), so the window pins ``asc_nulls_last`` /
    ``desc_nulls_last`` explicitly. Result is IDENTICAL to a
    single-window form using the same nulls-last spec (fuzz-asserted
    in tests) — only the shuffle volume changes.
    """
    import pandas as pd

    out_schema = df.select(group_col, order_col, id_col).schema

    def local_topk(it):
        acc: dict = {}
        for pdf in it:
            for g, grp in pdf.groupby(group_col, sort=False, dropna=False):
                cur = pd.concat([acc[g], grp]) if g in acc else grp
                acc[g] = cur.sort_values(
                    [order_col, id_col],
                    ascending=[ascending, True],
                    na_position="last",
                ).head(k)
        if acc:
            yield pd.concat(acc.values())[
                [group_col, order_col, id_col]
            ]

    reduced = df.select(group_col, order_col, id_col).mapInPandas(
        local_topk, out_schema
    )
    order = (
        F.col(order_col).asc_nulls_last()
        if ascending
        else F.col(order_col).desc_nulls_last()
    )
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col))
    return (
        reduced.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    by: str | None = None,
    budget: int = 2048,
    vocab_size: int = 32768,
) -> DataFrame:
    """MATERIALIZE packed training sequences — the last-mile operator
    that turns a curated corpus into the rows a trainer reads: per
    (``by``, pack) one concatenated token-id stream plus the document
    boundary map.

    Tokenization is the BPE-ish pre-tokenizer with an md5-hash
    vocabulary (``md5(token) % vocab_size`` — the engine-portable
    stand-in for a trained BPE vocab; swap the transform for a
    broadcast vocab join or a pandas-UDF encoder without touching the
    packing). Pack assignment is :func:`pack_token_budget`'s two-phase
    prefix sum; a document belongs to the pack where it STARTS, so
    sequences can run past ``budget`` at the tail — the trainer's
    slicer decides truncation/carry, the layout is its input.

    Shuffle shape at 100 TB: tokenize+hash ride the corpus scan
    (Generate-barriered so the regex runs once per row); the ONE
    shuffle is the groupBy(pack) carrying each document's id array
    exactly once — the unavoidable materialization shuffle of writing
    training shards, on the uniform pack key.

    Output: ``by?``, ``pack_id``, ``n_docs``, ``n_tokens``,
    ``token_ids`` (array<int>, concatenated in layout order),
    ``doc_ids`` (array, same order — the boundary map together with
    each doc's token count).
    """
    from oups_spark.operators.text import BPE_PATTERN, md5_int, once_per_row

    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    ids = F.transform(
        toks, lambda t: F.pmod(md5_int(t), F.lit(vocab_size)).cast("int")
    )
    keep = ([by] if by else []) + [id_col]
    base = once_per_row(df.select(*keep, text_col), {"__ids": ids}).select(
        *keep, "__ids", F.size("__ids").alias("__n")
    )
    packed = pack_token_budget(
        base, id_col=id_col, token_col="__n", budget=budget, by=by
    )
    layout = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("pack_offset").alias("o"),
                F.col(id_col).alias("d"),
                F.col("__ids").alias("t"),
            )
        )
    )
    return (
        packed.groupBy(*([by] if by else []), "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("long").alias("n_tokens"),
            layout.alias("__lay"),
        )
        .select(
            *([by] if by else []),
            "pack_id",
            "n_docs",
            "n_tokens",
            F.flatten(F.transform(F.col("__lay"), lambda x: x["t"])).alias(
                "token_ids"
            ),
            F.transform(F.col("__lay"), lambda x: x["d"]).alias("doc_ids"),
        )
    )
