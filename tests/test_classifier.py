"""Distributed logistic-regression quality classifier tests:
training learns a separable toy problem, scoring matches the exact
sigmoid, the trajectory is run-to-run deterministic, and the
hashing-featurizer's ``keep=`` passthrough carries labels without a
join."""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F

from oups_spark.operators.classifier import logreg_score, logreg_train_gd
from oups_spark.operators.retrieval import hashed_feature_vectors


def _toy(spark):
    # linearly separable on dim 0: positives have x0 ~ 1, negatives ~ 0
    rows = [
        ([1.0, 0.1], 1),
        ([0.9, 0.2], 1),
        ([1.1, 0.0], 1),
        ([0.8, 0.3], 1),
        ([0.0, 0.1], 0),
        ([0.1, 0.2], 0),
        ([0.2, 0.0], 0),
        ([0.0, 0.3], 0),
    ]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "features": [r[0] for r in rows],
                "label": [r[1] for r in rows],
            }
        )
    )


def test_logreg_learns_separable(spark):
    df = _toy(spark)
    w = logreg_train_gd(df, lr=0.5, epochs=8, materialize=None)
    assert len(w) == 3  # dim + bias
    # the separating dimension must carry positive weight
    assert w[0] > 0.1
    scored = logreg_score(df, w).toPandas()
    pos = scored[scored.label == 1].score
    neg = scored[scored.label == 0].score
    assert pos.min() > neg.max()


def test_logreg_score_exact_sigmoid(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"features": [[2.0, -1.0]], "label": [1]})
    )
    w = [0.5, 0.25, -0.125]  # bias last
    got = logreg_score(df, w).toPandas().score[0]
    z = 2.0 * 0.5 + (-1.0) * 0.25 + (-0.125)
    want = round(1.0 / (1.0 + math.exp(-z)) * 1e6) / 1e6
    assert abs(got - want) <= 1e-6


def test_logreg_trajectory_deterministic(spark):
    df = _toy(spark).repartition(4)
    w1 = logreg_train_gd(df, lr=0.5, epochs=4, materialize=None)
    w2 = logreg_train_gd(df, lr=0.5, epochs=4, materialize=None)
    assert w1 == w2  # bit-identical: rounded updates pin the trajectory


def test_logreg_rejects_bad_materialize(spark):
    import pytest

    with pytest.raises(ValueError):
        logreg_train_gd(_toy(spark), materialize="checkpoint2")


def test_hashed_features_keep_passthrough(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["hello world", ""],
                "label": [1, 0],
            }
        )
    )
    got = (
        hashed_feature_vectors(
            df, id_col="doc_id", dim=8, round_to=None, keep=("label",)
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(got.columns) == ["doc_id", "label", "features"]
    assert list(got.label) == [1, 0]
    # empty doc -> zero vector, preserved through keep
    assert all(v == 0.0 for v in got.features[1])
    # non-empty doc -> unit vector
    nrm = sum(v * v for v in got.features[0]) ** 0.5
    assert abs(nrm - 1.0) < 1e-9


def test_logreg_matches_numpy_twin(spark):
    from oups_spark.operators.classifier import logreg_train_np

    df = _toy(spark).repartition(3)
    w_spark = logreg_train_gd(df, lr=0.5, epochs=5, materialize=None)
    rows = _toy(spark).toPandas()
    w_np = logreg_train_np(
        list(rows.features), list(rows.label), lr=0.5, epochs=5
    )
    assert w_spark == w_np


def test_logreg_twin_property(spark):
    """Random small datasets: the distributed trajectory equals the
    sequential twin bit-for-bit (rounded updates pin it)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from oups_spark.operators.classifier import logreg_train_np

    floats = st.floats(
        min_value=-4, max_value=4, allow_nan=False, width=32
    )
    data = st.lists(
        st.tuples(st.tuples(floats, floats, floats), st.integers(0, 1)),
        min_size=1,
        max_size=10,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=data)
    def check(rows):
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "features": [list(r[0]) for r in rows],
                "label": [r[1] for r in rows],
            }
        )
        df = spark.createDataFrame(pdf).repartition(2)
        w_spark = logreg_train_gd(
            df, lr=0.25, epochs=3, dim=3, materialize=None
        )
        w_np = logreg_train_np(
            [list(r[0]) for r in rows],
            [r[1] for r in rows],
            lr=0.25,
            epochs=3,
        )
        assert w_spark == w_np

    check()
