"""Shared lazy stage-funnel builder for the composed plans
(curate_job, crawl_job)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_funnel"]


def build_funnel(
    stages: list[tuple[str, DataFrame]], count_col: str
) -> DataFrame:
    """(stage_idx, stage, ``count_col``) with one row per stage.

    Global aggregations (not groupBy on a literal), so an empty stage
    still reports 0; the union stays lazy — one action on the funnel
    computes every stage count."""
    return reduce(
        DataFrame.unionByName,
        [
            df.agg(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.count(F.lit(1)).alias(count_col),
            )
            for i, (name, df) in enumerate(stages)
        ],
    )
