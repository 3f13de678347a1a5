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


def _distinct_positions_df(df: DataFrame, bloom_cols: list[str], m: int, k: int) -> DataFrame:
    """``(__f, __ci, __ps)`` — per (file, column-index) the distinct
    set bit positions, as an array of ints.

    The positions are EXPLODED to scalar ints before the distinct
    aggregation, so per-group executor agg state is bounded by m
    (8192) integers — never by the column's distinct-value count. (A
    ``collect_set`` over whole k-element position *arrays* would
    buffer one array per distinct value: millions of small arrays per
    group at reference-default 6.3M-row files on a high-cardinality
    column.) NULL values hash to NULL positions (md5(NULL) is NULL)
    and are filtered out — a NULL never matches an equality probe, so
    it sets no bits.
    """
    def _tag(ci: int):
        # single-arg lambda: a two-arg one would receive the ARRAY
        # index as its second parameter and shadow the column index
        return lambda p: F.struct(F.lit(ci).alias("ci"), p.alias("pos"))

    pos_structs = F.flatten(
        F.array(
            *[
                F.transform(_positions_col(F.col(c), m, k), _tag(i))
                for i, c in enumerate(bloom_cols)
            ]
        )
    )
    return (
        df.select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("__f"),
            F.explode(pos_structs).alias("__cp"),
        )
        .select(
            "__f",
            F.col("__cp.ci").alias("__ci"),
            F.col("__cp.pos").alias("__pos"),
        )
        .where(F.col("__pos").isNotNull())
        .groupBy("__f", "__ci")
        .agg(F.collect_set("__pos").alias("__ps"))
    )


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

    Returns ``{file_basename: {col: {"m", "k", "t", "b64"}}}`` where
    ``t`` tags the indexed column's family (``"i"`` int, ``"s"``
    string) so probe-side type coercion can be validated. Both the
    executor agg state and the collect are bounded by
    ``files x cols x m`` positions (not by row count or distinct-value
    count — see :func:`_distinct_positions_df`). Cost is one extra
    pass over the NEW batch only — opt-in write amplification, never
    a table scan.
    """
    import os.path
    import urllib.parse

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
    col_tag = {
        c: ("s" if by_name[c].dataType.simpleString() == "string" else "i")
        for c in bloom_cols
    }
    df = spark.read.schema(schema).parquet(*file_paths)
    rows = _distinct_positions_df(df, bloom_cols, m, k).collect()
    # every written file gets a bloom per column, even when a column
    # is all-NULL in that file (no surviving positions -> all-zero
    # bitset, which correctly proves every equality probe absent)
    positions: dict[str, list[set[int]]] = {
        os.path.basename(p): [set() for _ in bloom_cols] for p in file_paths
    }
    for r in rows:
        fname = urllib.parse.unquote(r["__f"])
        positions[fname][r["__ci"]].update(int(p) for p in r["__ps"])
    return {
        fname: {
            c: {"m": m, "k": k, "t": col_tag[c], "b64": _pack(ps[i], m)}
            for i, c in enumerate(bloom_cols)
        }
        for fname, ps in positions.items()
    }


def _normalize_probe(value, col_type: str | None) -> str | None:
    """Canonicalize a probe value to the string the write side hashed,
    or None when the bloom cannot SAFELY disprove the probe.

    The filter path (``dnf_filter``) compares with SQL coercion, so a
    long column probed with ``7.0`` or ``True`` matches rows holding
    7 — but the write side hashed ``"7"``. Hashing ``str(7.0)`` =
    ``"7.0:0"`` would "prove" absence and wrongly prune the file (a
    false negative, violating the module contract). Coerce
    bool/integral-float/int-string probes of int-family columns
    through ``int()``; string columns accept only str probes (an int
    probe makes SQL cast the COLUMN, under which ``'07' == 7`` — no
    canonical string exists). Untagged blooms (pre-``t`` manifests)
    accept only non-bool int and str probes, mirroring the write-side
    ``_BLOOMABLE`` gate.
    """
    if isinstance(value, bool):
        value = int(value)
    if col_type == "s":
        return value if isinstance(value, str) else None
    if col_type == "i":
        if isinstance(value, int):
            return str(value)
        if isinstance(value, float) and value.is_integer():
            return str(int(value))
        if isinstance(value, str):
            try:
                return str(int(value))
            except ValueError:
                return None
        return None
    # legacy untagged bloom: exact int / str probes only
    if isinstance(value, (int, str)):
        return str(value)
    return None


def blooms_disprove_term(
    blooms: dict | None, col: str, op: str, value
) -> bool:
    """Can the file's bloom index PROVE this DNF term unsatisfiable?
    Only equality shapes are bloom-provable: ``==``/``=`` (value
    absent) and ``in`` (every candidate absent). Probe values are
    normalized to the write-side hash encoding first; a value that
    cannot be safely normalized keeps the file (no false negatives).
    """
    if not blooms:
        return False
    b = blooms.get(col)
    if b is None:
        return False
    try:
        if op in ("==", "="):
            nv = _normalize_probe(value, b.get("t"))
            return nv is not None and not bloom_might_contain(b, nv)
        if op == "in":
            nvs = [_normalize_probe(v, b.get("t")) for v in value]
            return all(
                nv is not None and not bloom_might_contain(b, nv)
                for nv in nvs
            )
    except Exception:  # noqa: BLE001 — unprobeable value -> keep file
        return False
    return False
