"""Relational logistic-regression classifier (model-based quality
filtering without an ML runtime).

Completes the quality-filter ladder — rules (operators/quality.py),
LM perplexity (operators/lm_score.py), and now a trained model — the
fastText-style supervised filter of the published pipelines (CCNet /
RefinedWeb quality classifiers), re-expressed as plain DataFrame
arithmetic over the deterministic hashed-embedding features
(functions/embeddings.py):

* **Training** is full-batch gradient descent with a fixed iteration
  count and learning rate: each round is ONE map-side-combined
  aggregation over the corpus (per-doc gradient = residual x
  features, dim+1 sums), with only the (dim+1)-float weight vector
  collected to the driver — the same tiny-state-per-round shape as
  PageRank's power iterations and IVF's Lloyd rounds. No MLlib, no
  Python in the hot path.
* **Scoring** is a pure Project: sigmoid(w . x + b) per row.
* Fixed iterations + deterministic features make the whole fit
  exactly replayable: the DuckDB oracle unrolls the identical
  gradient rounds as CTEs (libm `exp` differences between engines
  are ~1 ulp; summed over a corpus they stay far below the rounding
  guard on the compared scores).

At 10^12 docs, full-batch GD means iters x one-scan-per-round; train
on a hash_sample'd slice (the standard practice — quality classifiers
are fit on thousands, applied to trillions) and score the full corpus
with the closed weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_train", "logreg_score"]


def _dot_plus_bias(features_col: Column, weights: list[float]) -> Column:
    dim = len(weights) - 1
    wlit = F.array(*[F.lit(float(x)) for x in weights[:dim]])
    dot = F.aggregate(
        F.zip_with(features_col, wlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot + F.lit(float(weights[dim]))


def logreg_train(
    df: DataFrame,
    *,
    dim: int,
    label_col: str = "label",
    features_col: str = "features",
    iters: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Fit weights (dim coefficients + trailing bias) by ``iters``
    rounds of full-batch gradient ascent on the log-likelihood.

    ``label_col`` must be 0/1 (numeric). Returns plain Python floats
    so the closed model ships to any scorer (including SQL engines).

    Inputs are validated up front (one extra count on the — sampled,
    small — training frame): a NULL label/features row would silently
    shrink every SUM while still counting in n (a half-strength
    gradient, the worst kind of wrong), and a features array of the
    wrong length would NULL the whole fit via zip_with padding.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    y = F.col(label_col).cast("double")
    n_bad = df.filter(
        y.isNull()
        | F.col(features_col).isNull()
        | (F.size(features_col) != dim)
    ).count()
    if n_bad:
        raise ValueError(
            f"{n_bad} rows have NULL label/features or features of "
            f"length != {dim}"
        )
    w = [0.0] * (dim + 1)
    for _ in range(iters):
        p = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-_dot_plus_bias(F.col(features_col), w))
        )
        g = df.select(
            (y - p).alias("r"), F.col(features_col).alias("f")
        ).select(
            F.concat(
                F.transform(F.col("f"), lambda x: F.col("r") * x),
                F.array(F.col("r")),
            ).alias("g")
        )
        sums = g.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at(F.col("g"), i + 1)).alias(f"s{i}")
                for i in range(dim + 1)
            ],
        ).collect()[0]
        n = sums["n"]
        if n == 0:
            raise ValueError("empty training frame")
        w = [
            w[i] + lr * sums[f"s{i}"] / n
            for i in range(dim + 1)
        ]
    return w


def logreg_score(
    df: DataFrame,
    weights: list[float],
    *,
    features_col: str = "features",
    score_col: str = "score",
) -> DataFrame:
    """Attach sigmoid(w . features + bias) as ``score_col``.

    Corpus-scale scoring stays validation-free (a count here would
    scan the full corpus): a features array whose length doesn't
    match ``len(weights) - 1`` produces a NULL score for that row
    (zip_with pads with NULLs), and NULL features score NULL —
    train-side validation catches the systematic mismatch case."""
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-_dot_plus_bias(F.col(features_col), weights))
    )
    return df.withColumn(score_col, p)
