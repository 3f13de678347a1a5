"""Queries exercising the ordered-store semantics (filled in as the
store layer lands): ordered merge writes, keep-last dedup, range
reads, segment aggregation, snapshots, AggStream restart."""

from __future__ import annotations
