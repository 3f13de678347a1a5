"""Mergeable distinct-count sketches (HyperLogLog) as pure Catalyst
expressions.

At 100 TB "how many distinct tokens / urls / docs per source" cannot
afford ``count(distinct x)``: the exact plan shuffles every distinct
value. A HyperLogLog register table is the classic fix — each scan
partition folds its rows into ``m`` one-byte registers (map-side
``max``), the shuffle moves at most ``m`` rows per group, and register
tables from independent slices merge by elementwise max (so sketches
can be persisted per ingest batch and unioned later without rescanning
history).

Spark ships an opaque HLL (``approx_count_distinct``) but its sketch
is not portable across engines, which matters here twice: the driver
hash-compares results against DuckDB, and a production lakehouse wants
sketch bytes that any engine can merge. This implementation therefore
derives everything from ``md5`` — available and bit-identical in Spark
and DuckDB — and keeps all arithmetic either integral or dyadic
(``sum(2^-M_j)`` over ``m ≤ 4096`` registers with ``rho ≤ 25`` needs
< 38 mantissa bits, so the fold is EXACT in a double regardless of
summation order — cross-engine hash-stable without rounding tricks).

Hash layout per item: ``h = int(md5(item)[:8], 16)`` (32 bits);
register ``j = h % m``; remainder ``w = h // m`` (``32 - p`` bits);
``rho = (32 - p) - bitlen(w) + 1`` leading-zero rank (``w = 0`` →
``rho = 32 - p + 1``). Estimator is Flajolet et al. 2007: raw
``alpha_m * m^2 / S`` with the small-range linear-counting correction
``m * ln(m / V)`` when ``E <= 2.5 m`` and empty registers remain.

Reference semantics anchor: the reference engine has no sketch layer
(oups/store scans are exact); this module is part of the
beyond-reference LLM-pipeline surface, next to the dedup/selection
operators.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    return 0.673


def hll_rho(item: Column, p: int) -> tuple[Column, Column]:
    """(register j, rank rho) for one item under precision ``p``.

    JVM-only: md5 → conv(hex→dec) → integer div/mod → bin-length.
    ``conv`` returns a string; the cast back to long is exact for
    32-bit inputs. DuckDB twin of the hash:
    ``CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)`` and of the
    bit length: ``length(format('{:b}', w))``.
    """
    m = 1 << p
    wbits = 32 - p
    h = F.conv(F.substring(F.md5(item), 1, 8), 16, 10).cast("long")
    j = (h % m).cast("int")
    w = (h / m).cast("long")  # floor div: h >= 0
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return j, rho.cast("int")


def hll_register_table(
    df: DataFrame,
    item: Column | str,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """Fold items into an HLL register table: one row per
    ``(*group_cols, register j)`` with the max rank ``M_j``.

    This is the mergeable, persistable form — the shuffle after the
    map-side partial ``max`` carries at most ``m`` rows per group no
    matter how many items the scan saw, and two register tables for
    the same groups merge with ``union → groupBy → max(M)``.
    """
    group_cols = list(group_cols or [])
    j, rho = hll_rho(F.col(item) if isinstance(item, str) else item, p)
    return (
        df.select(*group_cols, j.alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("M"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 8,
    decimals: int = 4,
) -> DataFrame:
    """Distinct-count estimate per group from a register table.

    ``S = sum(2^-M_j) + V`` (each of the ``V`` never-hit registers
    contributes ``2^0 = 1``); raw estimate ``alpha_m m^2 / S``;
    linear counting ``m ln(m / V)`` when ``E <= 2.5 m`` and
    ``V > 0``. All terms of ``S`` are dyadic rationals with denominator
    ``2^(33-p)`` and the sum stays under ``2^p``, so ``S`` is exact in
    a double in ANY summation order — the only libm call is the
    small-range ``ln``, and both engines round the final estimate to
    ``decimals``.
    """
    group_cols = list(group_cols or [])
    m = 1 << p
    # 2^-M via an integer shift, not pow(): exact by construction on
    # both engines (M <= 33 - p fits an int shift).
    folded = registers.groupBy(*group_cols).agg(
        F.sum(F.lit(1.0) / F.expr("shiftleft(1, M)")).alias("s_used"),
        F.count(F.lit(1)).alias("n_used"),
    )
    v = F.lit(m) - F.col("n_used")
    s = F.col("s_used") + v.cast("double")
    raw = F.lit(_alpha(m) * m * m) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return folded.select(
        *group_cols, F.round(est, decimals).alias("approx_distinct")
    )


def hll_distinct(
    df: DataFrame,
    item: Column | str,
    group_cols: list[str] | None = None,
    p: int = 8,
    decimals: int = 4,
) -> DataFrame:
    """One-shot grouped approximate distinct count (register fold +
    estimate). Standard error ≈ ``1.04 / sqrt(2^p)`` (p=8 → 6.5%)."""
    return hll_estimate(
        hll_register_table(df, item, group_cols, p),
        group_cols,
        p,
        decimals,
    )


def hll_oracle_sql(
    source_cte: str,
    item_expr: str,
    group_cols: list[str],
    p: int = 8,
    decimals: int = 4,
) -> str:
    """DuckDB replay of :func:`hll_distinct` over ``source_cte``
    (a CTE body named ``items`` exposing ``item_expr`` and the group
    columns). Bit-for-bit the same sketch: same md5 slice, same
    register split, same exact dyadic fold, same estimator branches.
    """
    m = 1 << p
    wbits = 32 - p
    alpha = _alpha(m)
    gsel = ", ".join(group_cols)
    gpre = gsel + ", " if gsel else ""
    return f"""
    WITH items AS ({source_cte}),
    hashed AS (
      SELECT {gpre}
             CAST(('0x' || substr(md5({item_expr}), 1, 8)) AS BIGINT) AS h
      FROM items),
    regs AS (
      SELECT {gpre} CAST(h % {m} AS INT) AS j,
             max(CASE WHEN h // {m} = 0 THEN {wbits + 1}
                 ELSE {wbits + 1} - length(format('{{:b}}', h // {m}))
                 END) AS M
      FROM hashed GROUP BY {gpre} j),
    folded AS (
      SELECT {gpre} sum(1.0 / (1 << M)) AS s_used, count(*) AS n_used
      FROM regs GROUP BY {gsel if gsel else "()"}),
    est AS (
      SELECT {gpre}
             CASE WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m})
                       / (s_used + ({m} - n_used)) <= {2.5 * m}
                       AND {m} - n_used > 0
                  THEN CAST({m} AS DOUBLE)
                       * ln(CAST({m} AS DOUBLE) / ({m} - n_used))
                  ELSE (CAST({alpha!r} AS DOUBLE) * {m} * {m})
                       / (s_used + ({m} - n_used))
             END AS e
      FROM folded)
    SELECT {gpre} round(e, {decimals}) AS approx_distinct FROM est
    ORDER BY {gsel if gsel else "1"}
    """
