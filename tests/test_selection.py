"""Data-selection operators (round 5): DSIR importance weights +
Gumbel top-k sampling, and SemDeDup cluster-local semantic dedup.

Oracle strategy mirrors the registry: sequential pandas/python twins
for the unit tests here; the registered queries carry full pure-SQL
DuckDB oracles (see ``queries/selection_ops.py``)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pyspark.sql.functions as F
import pytest


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _grams(text: str) -> list[str]:
    tok = [t for t in (text or "").strip().lower().split() if t]
    return tok + [f"{a} {b}" for a, b in zip(tok, tok[1:])]


def test_dsir_importance_weights_matches_sequential(spark):
    from oups_spark.operators.selection import dsir_importance_weights

    rows = [
        (0, True, "the quick brown fox jumps"),
        (1, True, "the quick red fox"),
        (2, False, "lorem ipsum dolor sit amet"),
        (3, False, "the quick brown dog sleeps"),
        (4, False, ""),
        (5, False, "zzz qqq"),
    ]
    B = 64
    df = spark.createDataFrame(rows, "id long, tgt boolean, text string")
    got = {
        r["id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_importance_weights(
            df, id_col="id", is_target=F.col("tgt"), n_buckets=B
        ).collect()
    }

    # sequential twin
    buckets = {i: [_md5_32(g) % B for g in _grams(t)] for i, _, t in rows}
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for i, tgt, _ in rows:
        for b in buckets[i]:
            (ct if tgt else cr)[b] = (ct if tgt else cr).get(b, 0) + 1
    Tt, Tr = sum(ct.values()), sum(cr.values())
    for i, _, _ in rows:
        bs = buckets[i]
        want = sum(
            math.log((ct.get(b, 0) + 1.0) / (Tt + B))
            - math.log((cr.get(b, 0) + 1.0) / (Tr + B))
            for b in bs
        )
        n, lw = got[i]
        assert n == len(bs)
        assert lw == pytest.approx(round(want, 6), abs=2e-6)
    assert got[4] == (0, 0.0)  # empty doc: weight 0, not dropped


def test_gumbel_topk_deterministic_and_weight_monotone(spark):
    from oups_spark.operators.selection import gumbel_topk_sample

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(200)], "id long, w double"
    )
    a = gumbel_topk_sample(df, id_col="id", weight_col="w", k=20, seed="s1")
    b = gumbel_topk_sample(df, id_col="id", weight_col="w", k=20, seed="s1")
    ra = [(r["id"], r["gumbel_key"]) for r in a.collect()]
    rb = [(r["id"], r["gumbel_key"]) for r in b.collect()]
    assert ra == rb  # fully deterministic, including order
    # key really is weight + gumbel(md5(seed:id))
    for i, key in ra:
        u = (_md5_32(f"s1:{i}") + 1.0) / (2.0**32 + 2.0)
        g = -math.log(-math.log(u))
        assert key == pytest.approx(round(float(i % 7) + g, 6), abs=2e-6)
    # different seed -> different sample (w.h.p.)
    c = gumbel_topk_sample(df, id_col="id", weight_col="w", k=20, seed="s2")
    assert {r["id"] for r in c.collect()} != {i for i, _ in ra}


def test_semdedup_prunes_within_cluster_only(spark):
    from oups_spark.operators.selection import semdedup_prune

    # two tight bundles of near-identical vectors + isolated points;
    # k=2 separates the bundles, dedup keeps each bundle's lowest id
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]

    def jitter(v, eps):
        return [x + eps for x in v]

    rows = [
        (0, base_a),
        (1, jitter(base_a, 0.001)),
        (2, jitter(base_a, 0.002)),
        (10, base_b),
        (11, jitter(base_b, 0.001)),
        (20, [0.5, 0.5, 0.70710678, 0.0]),  # isolated: 45 deg off both
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semdedup_prune(
            df, id_col="vec_id", k=2, iters=2, seed=3, threshold=0.999
        ).collect()
    }
    assert len(out) == 6
    # lowest id of each bundle kept, the rest pruned
    assert out[0][1] is True
    assert out[1][1] is False
    assert out[2][1] is False
    assert out[10][1] is True
    assert out[11][1] is False
    # the isolated vector is never a duplicate of anything
    assert out[20][1] is True
    # bundle members share their cluster
    assert out[0][0] == out[1][0] == out[2][0]
    assert out[10][0] == out[11][0]


def test_selection_queries_registered_with_oracles():
    """The three selection queries are registered with pure-SQL
    oracles (value-level compare runs in test_queries_oracle.py's
    parametrized sweep, same as every other registered query)."""
    from oups_spark.queries import REGISTRY, load_all_query_modules

    load_all_query_modules()
    for name in ("dsir_importance_weights", "dsir_gumbel_topk", "semdedup_prune"):
        q = REGISTRY[name]
        assert q.oracle is not None
        assert "oups_spark" not in q.oracle  # fully independent SQL


def test_remove_duplicate_spans_sequential_twin(spark):
    from oups_spark.operators.selection import remove_duplicate_spans

    W = 3
    rows = [
        (0, "a b c x y z"),          # 'a b c' shared with doc 1
        (1, "a b c q r s"),
        (2, "u v w"),                # unique
        (3, ""),                     # empty
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["n_segments"], r["n_removed"], r["clean_text"])
        for r in remove_duplicate_spans(
            df, id_col="id", width=W
        ).collect()
    }
    assert got[0] == (2, 1, "x y z")
    assert got[1] == (2, 1, "q r s")
    assert got[2] == (1, 0, "u v w")
    assert got[3] == (0, 0, "")


def test_remove_duplicate_spans_no_filter_below_repartition(spark):
    """Plan-shape tripwire: the tokenize/segment pipeline must run
    AFTER the repartition. A non-outer explode lets Catalyst infer
    `size(__segs) > 0` and sink the full segment expression below the
    exchange into the (single-task) scan stage; the outer-explode +
    isNotNull(g) form keeps the scan filter-free."""
    import re

    from oups_spark.operators.selection import remove_duplicate_spans

    df = (
        spark.createDataFrame([(0, "a b c"), (1, "")], "id long, text string")
        .repartition(4)
    )
    plan = remove_duplicate_spans(df, id_col="id", width=2)._jdf.queryExecution(
    ).optimizedPlan().toString()
    # Only filters BELOW the repartition matter (the sunk inferred
    # filter is the regression); a legitimate explicit size()-based
    # filter above the exchange must not trip this. The inferred
    # pattern is a size() test over the segment expression / its
    # __segs alias.
    below = plan.split("Repartition", 1)[-1]
    for cond in re.findall(r"Filter (.+)", below):
        assert "size(" not in cond, (
            f"segment filter sank below repartition: {cond[:200]}"
        )


def test_temperature_sample_rates_and_determinism(spark):
    import hashlib

    from oups_spark.operators.selection import temperature_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = temperature_sample(
        df, id_col="id", by="src", alpha=0.5, target_total=100, seed="t"
    )
    got = {(r["id"], r["src"], r["keep_rate"]) for r in out.collect()}
    # sequential twin
    import math

    n = {"big": 900, "small": 100}
    z = sum(v**0.5 for v in n.values())
    rates = {
        s: round(min(1.0, 100 * (v**0.5) / z / v) * 1e9) / 1e9
        for s, v in n.items()
    }
    # alpha=0.5 upweights the small source: its keep rate is higher
    assert rates["small"] > rates["big"]
    want = set()
    for i, s in rows:
        u = int(hashlib.md5(f"t:{i}".encode()).hexdigest()[:8], 16) / 2.0**32
        if u < rates[s]:
            want.add((i, s, rates[s]))
    assert got == want
    # deterministic across invocations
    again = {(r["id"], r["src"], r["keep_rate"]) for r in out.collect()}
    assert got == again


def test_semdedup_default_k_scales_with_sqrt_n(spark, monkeypatch):
    """k=None (the default) must choose k ~ ceil(sqrt(n)) so the
    cluster-local pair volume stays ~n*sqrt(n) at any corpus size —
    the scale-safe behavior is the default, not a docstring note."""
    import oups_spark.operators.selection as sel

    captured = {}
    real = sel.semdedup_prune.__globals__  # noqa: F841 — keep linters calm

    def fake_kmeans(df, **kw):
        captured["k"] = kw["k"]
        raise RuntimeError("stop after k choice")

    import oups_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "kmeans_lloyd", fake_kmeans)
    for n, want in [(9, 3), (100, 10), (1000, 32)]:
        df = spark.range(n).selectExpr(
            "id AS vec_id", "array(cast(id as double)) AS embedding"
        )
        try:
            sel.semdedup_prune(df)
        except RuntimeError:
            pass
        assert captured["k"] == want, (n, captured["k"], want)


def test_kmeans_driver_train_equals_distributed(spark):
    """kmeans_lloyd's driver-train fast path (numpy twin + exact
    HALF_UP round) must land every vector in the same final cluster
    as the distributed loop (driver_train_threshold=0 forces it)."""
    import random

    from oups_spark.operators.similarity import kmeans_lloyd

    rng = random.Random(3)
    rows = [
        (i, [round(rng.gauss(c, 1.0), 3) for _ in range(6)])
        for i, c in ((i, float(i % 5)) for i in range(300))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    fast = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_lloyd(
            df, k=5, iters=3, seed=42, center_decimals=6
        ).collect()
    }
    dist = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_lloyd(
            df,
            k=5,
            iters=3,
            seed=42,
            center_decimals=6,
            driver_train_threshold=0,
        ).collect()
    }
    assert fast == dist
