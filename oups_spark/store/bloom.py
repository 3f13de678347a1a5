"""Per-file Bloom filters for equality-predicate data skipping.

Min/max footer stats (``FileEntry.cols``) prune range predicates but
are useless for point lookups on columns that are CLUSTERED but not
ordered — the classic lakehouse case (user_id lookups in a
time-ordered event table: each user's rows land in a few files, but
every file's [min, max] spans the whole id space). Delta and Iceberg
solve this with per-file Bloom filter indexes; parquet has built-in
column bloom filters. This module is the manifest-level equivalent
for the ordered store: an opt-in ``bloom_cols=[...]`` at write time
attaches a small bitset per (new file, column) to the manifest entry,
and ``read(filters=...)`` skips files whose bloom PROVES the probed
value absent — before a single scan task is planned.

Design constraints:
- The hash must be computable identically JVM-side (building the
  filter over the written data with one bounded Spark job) and
  driver-side (testing a value during manifest pruning). Spark's
  ``F.hash`` (murmur3) has no cheap Python twin, so positions derive
  from md5 — available as ``F.md5`` and ``hashlib.md5`` with
  identical output: position_i = int(md5(f"{v}:{i}")[:8 hex], 16) % m.
- Only int/long/string columns are accepted: their Spark
  cast-to-string equals Python ``str()``, making the two sides
  bit-compatible. Floats/timestamps have no such guarantee and are
  range-predicate territory anyway.
- Size: m bits (default 8192 = 1 KiB/file/column packed, ~1.4 KiB
  base64 in the manifest JSON), k hashes (default 3). At the default
  2.5k-row files that is m/n ≈ 3 bits/distinct-value — ~8% false
  positives, each costing only a wasted scan of one file. At 100 TB /
  100k files the index adds ~140 MB to a manifest destined for a
  parquet/Delta-log upgrade anyway; the probe itself stays a
  driver-side bit test per (file, value).

False positives keep a file (harmless); false negatives cannot occur
— absence of a bloom (old files, rewritten-by-compact files, stats
fallback) degrades to "cannot skip", mirroring ``FileEntry.cols``.
"""

from __future__ import annotations

import base64
import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_M = 8192  # bits per filter
DEFAULT_K = 3  # hash probes per value

_BLOOMABLE = ("tinyint", "smallint", "int", "bigint", "string")


def bloom_positions_py(value, m: int, k: int) -> list[int]:
    """The k bit positions of ``value`` — driver-side twin of
    :func:`_positions_col` (same md5 arithmetic, byte for byte)."""
    return [
        int(
            hashlib.md5(f"{value}:{i}".encode()).hexdigest()[:8], 16
        ) % m
        for i in range(k)
    ]


def _positions_col(col: Column, m: int, k: int) -> Column:
    """Array of the k bit positions of a column value (JVM-side)."""
    s = col.cast("string")
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(s, F.lit(f":{i}"))), 1, 8),
                16,
                10,
            ).cast("long")
            % m
            for i in range(k)
        ]
    )


def _pack(positions: set[int], m: int) -> str:
    bits = bytearray(m // 8)
    for p in positions:
        bits[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(bits)).decode()


def bloom_might_contain(bloom: dict, value) -> bool:
    """Probe one value against a ``{"m", "k", "b64"}`` filter dict.
    True = possibly present (scan the file); False = PROVEN absent."""
    bits = base64.b64decode(bloom["b64"])
    for p in bloom_positions_py(value, bloom["m"], bloom["k"]):
        if not bits[p >> 3] & (1 << (p & 7)):
            return False
    return True


def build_file_blooms(
    spark,
    file_paths: list[str],
    schema,
    bloom_cols: list[str],
    *,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> dict[str, dict[str, dict]]:
    """One bounded Spark job over the JUST-WRITTEN files: per
    (file, column) the distinct set bit positions, collected to the
    driver and packed into bitsets.

    Returns ``{file_basename: {col: {"m", "k", "b64"}}}``. The
    collect is bounded by ``files x cols x m`` positions (not by row
    count): distinct-aggregated before it crosses the driver line.
    Cost is one extra pass over the NEW batch only — opt-in write
    amplification, never a table scan.
    """
    by_name = {f.name: f for f in schema.fields}
    for c in bloom_cols:
        if c not in by_name:
            raise ValueError(f"bloom column {c!r} not in dataset schema")
        t = by_name[c].dataType.simpleString()
        if t not in _BLOOMABLE:
            raise ValueError(
                f"bloom column {c!r} has type {t}; only int/long/string "
                "columns probe bit-identically across JVM and driver"
            )
    df = spark.read.schema(schema).parquet(*file_paths)
    rows = (
        df.select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("__f"),
            *[
                _positions_col(F.col(c), m, k).alias(f"__p_{i}")
                for i, c in enumerate(bloom_cols)
            ],
        )
        .groupBy("__f")
        .agg(
            *[
                F.array_distinct(
                    F.flatten(F.collect_set(F.col(f"__p_{i}")))
                ).alias(f"__s_{i}")
                for i in range(len(bloom_cols))
            ]
        )
        .collect()
    )
    out: dict[str, dict[str, dict]] = {}
    for r in rows:
        import urllib.parse

        fname = urllib.parse.unquote(r["__f"])
        out[fname] = {
            c: {
                "m": m,
                "k": k,
                # None positions come from NULL values (md5(NULL) is
                # NULL -> conv NULL -> None inside the array): a NULL
                # never matches an equality probe, so it sets no bits
                "b64": _pack(
                    {int(p) for p in r[f"__s_{i}"] if p is not None}, m
                ),
            }
            for i, c in enumerate(bloom_cols)
        }
    return out


def blooms_disprove_term(
    blooms: dict | None, col: str, op: str, value
) -> bool:
    """Can the file's bloom index PROVE this DNF term unsatisfiable?
    Only equality shapes are bloom-provable: ``==``/``=`` (value
    absent) and ``in`` (every candidate absent)."""
    if not blooms:
        return False
    b = blooms.get(col)
    if b is None:
        return False
    try:
        if op in ("==", "="):
            return not bloom_might_contain(b, value)
        if op == "in":
            return all(not bloom_might_contain(b, v) for v in value)
    except Exception:  # noqa: BLE001 — unprobeable value -> keep file
        return False
    return False
