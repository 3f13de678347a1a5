"""Round-4 quality/curation operator tests: repetition signals,
decontamination overlap, PII scan/redaction, int8 quantization,
label centroids."""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F

from oups_spark.operators.dedup import decontamination_overlap
from oups_spark.operators.similarity import label_centroids, quantize_int8
from oups_spark.operators.text import (
    max_multiplicity,
    pii_scan_df,
    repetition_stats_df,
    tokens,
)


def test_max_multiplicity_edges(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"text": ["a b a b a", "x", "", "z z z z", "p q r"]}
        )
    )
    got = df.select(
        max_multiplicity(tokens(F.col("text"))).alias("m")
    ).toPandas()
    assert list(got["m"]) == [3, 1, 0, 4, 1]


def test_repetition_stats_known_values(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "spam spam spam spam",  # 4 tokens, 1 distinct
                    "a b c d",  # no repetition
                    "",  # empty
                ],
            }
        )
    )
    got = (
        repetition_stats_df(df, "doc_id")
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "n_tokens"] == 4
    assert got.loc[1, "dup_token_frac"] == 0.75
    assert got.loc[1, "top_token_frac"] == 1.0
    # bigrams of "spam spam spam spam": 3 × "spam spam"
    assert got.loc[1, "top_bigram_frac"] == 1.0
    assert got.loc[2, "dup_token_frac"] == 0.0
    assert got.loc[2, "top_token_frac"] == 0.25
    assert round(got.loc[2, "top_bigram_frac"], 6) == round(1 / 3, 6)
    assert got.loc[3, "n_tokens"] == 0
    assert got.loc[3, "dup_token_frac"] == 0.0
    assert got.loc[3, "top_bigram_frac"] == 0.0


def test_decontamination_overlap_synthetic(spark):
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": ["alpha beta gamma delta"]})
    )
    train = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta",  # fully contaminated
                    "zeta eta theta iota",  # clean
                    "alpha beta gamma nine",  # 1 of 2 shingles hit
                ],
            }
        )
    )
    got = (
        decontamination_overlap(train, bench, "doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "contam_frac"] == 1.0
    assert got.loc[2, "contam_frac"] == 0.0
    assert got.loc[3, "n_grams"] == 2
    assert got.loc[3, "n_contaminated"] == 1
    # a doc with < n tokens yields no shingles and drops out
    short = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["two words"]})
    )
    assert decontamination_overlap(short, bench, "doc_id", "text").count() == 0


def test_pii_scan_counts_and_redaction(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "mail a.b@c.org and x@y.io now",
                    "call 555-867-5309 or 415 555 2671",
                    "host 10.0.0.1 and dotted phone 999.123.4567",
                    "nothing sensitive here",
                ],
            }
        )
    )
    got = pii_scan_df(df, "doc_id").orderBy("doc_id").toPandas().set_index("doc_id")
    assert got.loc[1, "n_email"] == 2
    assert got.loc[2, "n_phone"] == 2
    # the dotted phone is counted as a phone, and redaction order
    # (email -> phone -> ipv4) consumes it before the ipv4 pattern
    assert got.loc[3, "n_phone"] == 1
    assert got.loc[3, "n_ipv4"] == 1
    assert got.loc[4, ["n_email", "n_phone", "n_ipv4"]].sum() == 0
    # redacted text of row 4 is unchanged -> md5 of the original
    import hashlib

    assert (
        got.loc[4, "redacted_md5"]
        == hashlib.md5(b"nothing sensitive here").hexdigest()
    )


def test_quantize_int8_roundtrip_bound(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [1, 2],
                "v": [[1.0, -0.5, 0.25, 0.0], [0.0, 0.0, 0.0, 0.0]],
            }
        )
    )
    got = (
        quantize_int8(df, "vec_id", "v").orderBy("vec_id").toPandas().set_index("vec_id")
    )
    # per-component error is bounded by scale/2 -> mse <= (scale/2)^2
    scale = got.loc[1, "scale"]
    assert scale == round(1.0 / 127, 6)
    assert got.loc[1, "mse"] <= (1.0 / 127 / 2) ** 2 + 1e-12
    # zero vector: scale 0, q all zeros, zero error
    assert got.loc[2, "scale"] == 0.0
    assert got.loc[2, "mse"] == 0.0
    import hashlib

    assert got.loc[2, "q_md5"] == hashlib.md5(b"0,0,0,0").hexdigest()


def test_label_centroids_exact(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "label": [0, 0, 1],
                "embedding": [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
            }
        )
    )
    got = (
        label_centroids(df)
        .orderBy("label", "dim")
        .toPandas()
        .set_index(["label", "dim"])
    )
    assert got.loc[(0, 0), "centroid"] == 2.0
    assert got.loc[(0, 1), "centroid"] == 3.0
    assert got.loc[(0, 0), "n_vecs"] == 2
    assert got.loc[(1, 0), "centroid"] == 5.0
    assert math.isclose(got.loc[(1, 1), "centroid"], 6.0)


def test_window_fingerprints_shared_spans(spark):
    from oups_spark.operators.text import window_fingerprints

    shared = "X" * 16 + "Y" * 16  # one full 32-char window, aligned
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    shared + "A" * 16,
                    shared + "B" * 16,
                    "short",  # < width -> no fingerprints
                    "z" * 64,  # unrelated
                ],
            }
        )
    )
    wf = window_fingerprints(df, "doc_id", "text", width=32, stride=16)
    got = wf.toPandas()
    assert set(got[got.duplicated("fp", keep=False)]["doc_id"]) == {1, 2}
    assert 3 not in set(got["doc_id"])
    # doc 4 contributes windows but shares none: all-'z' windows are
    # identical WITHIN the doc and deduped to one fingerprint
    assert (got["doc_id"] == 4).sum() == 1
