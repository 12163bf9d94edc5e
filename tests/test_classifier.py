"""Relational logistic regression tests: exact parity with an
independent numpy implementation, separability sanity, and edge
cases. Cross-engine parity is oracle-checked by q_quality_model in
tests/test_entry_oracle.py."""

from __future__ import annotations

import math

import numpy as np
import pytest

pytestmark = pytest.mark.spark


def _np_train(X, y, iters, lr=1.0):
    X = np.asarray(X, dtype=float)
    Xb = np.hstack([X, np.ones((len(X), 1))])
    w = np.zeros(Xb.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w = w + lr * Xb.T @ (y - p) / len(X)
    return w


def _fit(spark, rows, dim, iters):
    from htmlparser2_spark.operators.classifier import logreg_train

    df = spark.createDataFrame(
        rows, "label int, features array<double>"
    )
    return df, logreg_train(df, dim=dim, iters=iters)


def test_matches_numpy_exactly(spark):
    rows = [
        (1, [1.0, 0.2]), (1, [0.9, 0.1]), (1, [0.7, 0.3]),
        (0, [0.1, 0.9]), (0, [0.2, 1.0]), (0, [0.0, 0.8]),
    ]
    _, w = _fit(spark, rows, dim=2, iters=4)
    want = _np_train([r[1] for r in rows], np.array([r[0] for r in rows]),
                     iters=4)
    assert w == pytest.approx(list(want), rel=1e-12)


def test_scores_separate_classes(spark):
    from htmlparser2_spark.operators.classifier import logreg_score

    rows = [
        (1, [1.0, 0.0]), (1, [0.9, 0.1]),
        (0, [0.0, 1.0]), (0, [0.1, 0.9]),
    ]
    df, w = _fit(spark, rows, dim=2, iters=20)
    scored = {tuple(r["features"]): r["score"]
              for r in logreg_score(df, w).collect()}
    assert scored[(1.0, 0.0)] > 0.5 > scored[(0.0, 1.0)]
    # bias + weights finite, sigmoid in range
    assert all(0.0 < s < 1.0 for s in scored.values())
    assert all(math.isfinite(x) for x in w)


def test_zero_iters_and_empty_frame(spark):
    from htmlparser2_spark.operators.classifier import logreg_train

    df = spark.createDataFrame(
        [(1, [0.5])], "label int, features array<double>"
    )
    assert logreg_train(df, dim=1, iters=0) == [0.0, 0.0]
    empty = df.filter("label = 2")
    with pytest.raises(ValueError):
        logreg_train(empty, dim=1, iters=1)


def test_train_validates_nulls_and_dims(spark):
    from htmlparser2_spark.operators.classifier import logreg_train

    bad_label = spark.createDataFrame(
        [(1, [0.5, 0.5]), (None, [0.1, 0.2])],
        "label int, features array<double>",
    )
    with pytest.raises(ValueError, match="NULL label"):
        logreg_train(bad_label, dim=2, iters=1)
    bad_dim = spark.createDataFrame(
        [(1, [0.5, 0.5]), (0, [0.1])], "label int, features array<double>"
    )
    with pytest.raises(ValueError, match="length != 2"):
        logreg_train(bad_dim, dim=2, iters=1)
