"""Unit tests for the retrieval operators (doc chunking, BM25) and
the deterministic global shuffle."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from oups_spark.operators.pack import deterministic_shuffle
from oups_spark.operators.retrieval import bm25_topk, doc_chunks


def test_doc_chunks_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens
            (2, "x y"),             # 2 tokens, single short chunk
            (3, ""),                # empty -> no chunks
            (4, None),              # null  -> no chunks
        ],
        "doc_id long, text string",
    )
    out = (
        doc_chunks(df, id_col="doc_id", width=4, stride=3)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    got = [(r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk_text) for r in out]
    # doc 1: starts 0,3,6 -> [a b c d], [d e f g], [g]
    assert got == [
        (1, 0, 4, "a b c d"),
        (1, 1, 4, "d e f g"),
        (1, 2, 1, "g"),
        (2, 0, 2, "x y"),
    ]


def test_doc_chunks_cover_every_token(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(i))) for i in range(1, 30)],
        "doc_id long, text string",
    )
    chunks = doc_chunks(df, id_col="doc_id", width=8, stride=5)
    # stride <= width => every token appears in at least one chunk
    back = (
        chunks.select(
            "doc_id", F.explode(F.split("chunk_text", " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert {r["doc_id"]: r["count"] for r in back} == {
        i: i for i in range(1, 30)
    }


def test_bm25_matches_reference_formula(spark):
    texts = {
        10: "apple banana apple",
        11: "banana cherry",
        12: "apple apple apple apple",
        13: "durian elderberry fig",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = {
        r.doc_id: r.bm25
        for r in bm25_topk(
            df, id_col="doc_id", terms=["apple", "cherry"], k=10
        ).collect()
    }
    # independent reference computation
    toks = {k: v.split() for k, v in texts.items()}
    N = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / N
    k1, b = 1.2, 0.75

    def idf(term):
        dfq = sum(1 for t in toks.values() if term in t)
        return math.log(1 + (N - dfq + 0.5) / (dfq + 0.5))

    for doc_id, t in toks.items():
        score = 0.0
        for term in ("apple", "cherry"):
            tf = t.count(term)
            score += (
                idf(term)
                * tf
                * (k1 + 1)
                / (tf + k1 * (1 - b + b * len(t) / avgdl))
            )
        if round(score, 6) > 0:
            assert abs(out[doc_id] - score) < 1e-5
        else:
            assert doc_id not in out


def test_deterministic_shuffle_is_a_permutation(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(257)], "doc_id long"
    )
    out = deterministic_shuffle(
        df, id_col="doc_id", seed="s1", n_shards=4, n_buckets=16
    )
    rows = out.collect()
    assert sorted(r.pos for r in rows) == list(range(257))
    by_shard = {}
    for r in rows:
        assert r.shard == r.pos % 4
        by_shard[r.shard] = by_shard.get(r.shard, 0) + 1
    assert max(by_shard.values()) - min(by_shard.values()) <= 1
    # reproducible: second run = identical permutation
    again = {
        r.doc_id: r.pos
        for r in deterministic_shuffle(
            df, id_col="doc_id", seed="s1", n_shards=4, n_buckets=16
        ).collect()
    }
    assert again == {r.doc_id: r.pos for r in rows}
    # different seed = different permutation
    other = {
        r.doc_id: r.pos
        for r in deterministic_shuffle(
            df, id_col="doc_id", seed="s2", n_shards=4, n_buckets=16
        ).collect()
    }
    assert other != again
