"""Timestamp flooring/ceiling robust to fixed and non-fixed periods.

Re-expresses the semantics of the reference's ``floor_ts`` /
``ceil_ts`` (reference: ``oups/date_utils.py:13-62``) on Spark
columns: fixed frequencies (``s``/``min``/``h`` and multiples) floor
by epoch arithmetic; non-fixed ones (``D``, ``W``, ``MS``/month,
``YS``/year) use ``date_trunc``.

Period strings accept a pandas-ish subset: ``<n><unit>`` with unit in
``s, min, h, D, W, MS, M, YS, Y`` (n only for fixed units and D).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

_FIXED_SECONDS = {"s": 1, "sec": 1, "min": 60, "m": 60, "h": 3600}
_PERIOD_RE = re.compile(r"^(\d*)\s*([A-Za-z]+)$")


def unix_us(col: Column) -> Column:
    """Epoch microseconds, tolerant of TIMESTAMP_NTZ inputs (parquet
    isAdjustedToUTC=false columns): NTZ is interpreted as UTC wall
    clock via cast, matching DuckDB's treatment of the same files."""
    return F.unix_micros(col.cast("timestamp"))


def _parse(freq: str) -> tuple[int, str]:
    m = _PERIOD_RE.match(freq.strip())
    if not m:
        raise ValueError(f"unparseable period: {freq!r}")
    n = int(m.group(1)) if m.group(1) else 1
    unit = m.group(2)
    return n, unit


def period_duration(freq: str) -> float:
    """Approximate period length in seconds — exact for fixed freqs,
    a 30/365-day approximation for months/years.  ONLY for sizing
    heuristics (file targets, buffer budgets); every grid/label
    computation must use :func:`floor_ts` / :func:`next_edge` /
    :func:`step_interval_sql`, which are calendar-exact."""
    n, unit = _parse(freq)
    if unit in _FIXED_SECONDS:
        return n * _FIXED_SECONDS[unit]
    approx = {"D": 86400, "W": 7 * 86400, "MS": 30 * 86400, "M": 30 * 86400,
              "YS": 365 * 86400, "Y": 365 * 86400}
    if unit in approx:
        return n * approx[unit]
    raise ValueError(f"unsupported period unit: {unit!r}")


def floor_ts_scalar(ts, freq: str):
    """Driver-side (pandas) twin of :func:`floor_ts` for manifest
    arithmetic — same epoch anchoring for fixed freqs, same calendar
    anchoring for D/W/MS/YS."""
    import pandas as pd

    n, unit = _parse(freq)
    t = pd.Timestamp(ts)
    if unit in _FIXED_SECONDS:
        return t.floor(f"{n * _FIXED_SECONDS[unit]}s")
    if unit == "D":
        return t.floor(f"{n}D")
    if unit == "W":
        # ISO week starting Monday, matching Spark's date_trunc('week')
        return (t - pd.Timedelta(days=int(t.weekday()))).normalize()
    if unit in ("MS", "M"):
        return t.to_period("M").start_time
    if unit in ("YS", "Y"):
        return t.to_period("Y").start_time
    raise ValueError(f"unsupported period unit: {unit!r}")


def is_fixed_freq(freq: str) -> bool:
    """True when every period of ``freq`` has the same physical
    duration (UTC, no DST): s/min/h multiples, D, W.  Months and
    years are calendar periods — arithmetic on them must go through
    ``add_months``, never a seconds constant."""
    _n, unit = _parse(freq)
    return unit in _FIXED_SECONDS or unit in ("D", "W")


def step_interval_sql(freq: str) -> str:
    """SQL interval literal advancing one ``freq`` period — the step
    for ``F.sequence`` calendar generation, calendar-exact for
    month/year units."""
    n, unit = _parse(freq)
    if unit in _FIXED_SECONDS:
        return f"INTERVAL {n * _FIXED_SECONDS[unit] * 1_000_000} MICROSECOND"
    if unit == "D":
        return f"INTERVAL {n * 86400 * 1_000_000} MICROSECOND"
    if unit == "W":
        return f"INTERVAL {n * 7 * 86400 * 1_000_000} MICROSECOND"
    if unit in ("MS", "M"):
        return f"INTERVAL '{n}' MONTH"
    if unit in ("YS", "Y"):
        return f"INTERVAL '{n * 12}' MONTH"
    raise ValueError(f"unsupported period unit: {unit!r}")


def floor_ts(col: Column, freq: str) -> Column:
    """Floor a timestamp column to the period grid (epoch-anchored for
    fixed frequencies, calendar-anchored for D/W/MS/YS)."""
    n, unit = _parse(freq)
    if unit in _FIXED_SECONDS:
        micros = n * _FIXED_SECONDS[unit] * 1_000_000
        # integer modulo (not double division) — exact at any epoch
        t = unix_us(col)
        return F.timestamp_micros(t - t % micros)
    if unit == "D":
        if n == 1:
            return F.date_trunc("day", col)
        micros = n * 86400 * 1_000_000
        t = unix_us(col)
        return F.timestamp_micros(t - t % micros)
    if unit == "W":
        return F.date_trunc("week", col)
    if unit in ("MS", "M", "YS", "Y"):
        if n != 1:
            raise ValueError(
                f"multi-period month/year frequencies are not supported: {freq!r}"
            )
        return F.date_trunc("month" if unit in ("MS", "M") else "year", col)
    raise ValueError(f"unsupported period unit: {unit!r}")


def ceil_ts(col: Column, freq: str) -> Column:
    """Ceiling: the next grid point strictly above unless already on
    the grid (on-grid values are returned unchanged, matching the
    reference's ceil semantics, ``oups/date_utils.py:38-62``)."""
    floored = floor_ts(col, freq)
    return F.when(floored == col, col).otherwise(next_edge(floored, freq))


def next_edge(on_grid: Column, freq: str) -> Column:
    """The grid point one ``freq`` period after an on-grid timestamp —
    calendar-exact for month/year units (``add_months``), epoch
    arithmetic for fixed ones."""
    n, unit = _parse(freq)
    if unit in _FIXED_SECONDS:
        secs = n * _FIXED_SECONDS[unit]
        return F.timestamp_micros(unix_us(on_grid) + secs * 1_000_000)
    if unit == "D":
        return F.timestamp_micros(unix_us(on_grid) + n * 86400 * 1_000_000)
    if unit == "W":
        return F.timestamp_micros(unix_us(on_grid) + n * 7 * 86400 * 1_000_000)
    if unit in ("MS", "M"):
        return F.to_timestamp(F.add_months(on_grid.cast("date"), n))
    if unit in ("YS", "Y"):
        return F.to_timestamp(F.add_months(on_grid.cast("date"), n * 12))
    raise ValueError(f"unsupported period unit: {unit!r}")


_next_edge = next_edge  # backward-compat alias
