"""Explicit skew-handling utilities (salting) for hot-key aggregations.

Url-hash partitioning keeps the *parse* stage balanced (unique keys),
but host-level aggregations over a Common-Crawl-style corpus hit heavy
hitters (40% of the synthetic corpus lives on host0 by design). The
classic fix: two-stage salted aggregation — shuffle on (key, salt) so a
hot key spreads over ``n_salts`` reducers, then combine the partials.
AQE's skew handling covers joins; this covers groupBy paths explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_count"]


def salted_agg(
    df: DataFrame,
    key,
    aggs: dict[str, tuple],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation with salting.

    ``aggs`` maps output column -> ("sum"|"count"|"min"|"max", input col
    or None). Stage 1 groups by (key, random salt) computing partials;
    stage 2 re-aggregates partials by key. Both stages are map-side
    combined by Catalyst; the hot key's stage-1 work spreads over
    ``n_salts`` reducers.
    """
    key_col = key if isinstance(key, Column) else F.col(key)
    salt = F.pmod(F.xxhash64(F.rand(seed=42)), F.lit(n_salts))
    stage1_aggs = []
    stage2_aggs = []
    for out, (kind, col) in aggs.items():
        partial = f"__p_{out}"
        if kind == "count":
            stage1_aggs.append(F.count(F.lit(1)).alias(partial))
            stage2_aggs.append(F.sum(partial).alias(out))
        elif kind == "sum":
            stage1_aggs.append(F.sum(col).alias(partial))
            stage2_aggs.append(F.sum(partial).alias(out))
        elif kind == "min":
            stage1_aggs.append(F.min(col).alias(partial))
            stage2_aggs.append(F.min(partial).alias(out))
        elif kind == "max":
            stage1_aggs.append(F.max(col).alias(partial))
            stage2_aggs.append(F.max(partial).alias(out))
        else:
            raise ValueError(f"unsupported agg kind: {kind}")
    stage1 = df.groupBy(key_col.alias("__key"), salt.alias("__salt")).agg(
        *stage1_aggs
    )
    return (
        stage1.groupBy("__key")
        .agg(*stage2_aggs)
        .withColumnRenamed("__key", key if isinstance(key, str) else "key")
    )


def salted_count(df: DataFrame, key, *, n_salts: int = 16) -> DataFrame:
    """Salted count-by-key: (key, n)."""
    return salted_agg(df, key, {"n": ("count", None)}, n_salts=n_salts)
