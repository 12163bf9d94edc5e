"""Crawl-frontier admission plan.

The crawl-side composition that feeds every downstream extraction run:
candidate URLs (outlinks, sitemaps, feeds) -> canonical form -> dedup
-> robots admission -> link-rank prioritized, per-host-budgeted
frontier. Stage order follows the cost gradient: canonicalization and
dedup are map+one-shuffle and shrink the set before the robots join;
the rank join and budget window run last on the smallest set.

1. **canonical** — :func:`~htmlparser2_spark.functions.urls.
   canonicalize_url` then distinct (first canonical form is the key;
   ``#fragment`` / case / default-port variants collapse).
2. **admitted** — :func:`~htmlparser2_spark.operators.robots.
   evaluate_robots` under the crawl agent; hosts without rules pass.
3. **frontier** — host rank from fixed-iteration
   :func:`~htmlparser2_spark.operators.linkgraph.pagerank` over the
   supplied host edge list (rank 0.0 for unranked hosts), then a
   per-host ``row_number`` budget (URL-ordered, deterministic under
   reruns) caps any one host's share of the crawl batch — the
   frontier-politeness analog of the skew salting used in the
   aggregation paths. With ``delays``/``window_sec``, robots
   Crawl-delay directives tighten the cap to
   ``floor(window_sec / delay)`` per host. Whenever a finite cap
   exists, a salted partial top-k pre-filter bounds the exact
   window's input (``salt_buckets * cap`` rows per host), so a hot
   host can never serialize its full candidate set onto one task;
   only the budget-less call (no ``per_host_budget``, no ``delays``)
   retains the plain per-host window, where full ordering is
   genuinely required.

Returns ``(frontier, funnel)``: frontier rows are (url, host,
host_rank, host_pos); the funnel is the (stage_idx, stage, n_urls)
survivor table, built lazily like
:func:`~htmlparser2_spark.plans.curate_job.run_curation`'s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.urls import canonicalize_url, url_host
from ..operators.linkgraph import pagerank
from ..operators.robots import evaluate_robots
from .funnel import build_funnel, lazy_checkpointer

__all__ = ["run_frontier"]


def run_frontier(
    candidates: DataFrame,
    rules: DataFrame,
    edges: DataFrame,
    *,
    agent: str,
    per_host_budget: int | None = None,
    delays: DataFrame | None = None,
    window_sec: float | None = None,
    rank_iters: int = 3,
    url_col: str = "url",
    checkpoint_stages: bool = True,
    salt_buckets: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """See module docstring. ``rules`` is a
    :func:`~htmlparser2_spark.operators.robots.parse_robots` table;
    ``edges`` a (src, dst, weight) host edge list.

    ``delays`` (a :func:`~htmlparser2_spark.operators.robots.
    crawl_delays` table) + ``window_sec`` turn Crawl-delay directives
    into a per-host batch cap of ``floor(window_sec / delay)`` fetches
    — politeness as a budget, composable with ``per_host_budget`` (the
    smaller wins). Exact-agent delays (lowercased match) shadow the
    ``*`` group's; a host whose only directive is unparseable (NULL
    delay) falls back to ``per_host_budget`` alone; a delay longer
    than the window caps the host at 0 URLs (deferred past this
    batch). The resolved table is one row per host — broadcast."""
    maybe_ckpt = lazy_checkpointer(checkpoint_stages)
    stages: list[tuple[str, DataFrame]] = [("ingest", candidates)]

    canon = maybe_ckpt(
        candidates.select(
            canonicalize_url(F.col(url_col)).alias("url")
        ).distinct()
    )
    stages.append(("canonical", canon))

    admitted = maybe_ckpt(
        evaluate_robots(canon, rules, agent)
        .filter(F.col("allowed"))
        .select("url")
    )
    stages.append(("admitted", admitted))

    ranks = pagerank(edges, iters=rank_iters)
    pri = (
        admitted.withColumn("host", url_host(F.col("url")))
        .join(ranks.withColumnRenamed("rank", "host_rank"), "host", "left")
        .select(
            "url",
            "host",
            F.coalesce(F.round("host_rank", 6), F.lit(0.0)).alias(
                "host_rank"
            ),
        )
    )
    # Resolve the per-host limit BEFORE any window so the salted
    # pre-filter below can use it row-wise.
    budget = (
        F.lit(per_host_budget).cast("long")
        if per_host_budget is not None
        else F.lit(None).cast("long")
    )
    if delays is not None:
        if window_sec is None:
            raise ValueError("window_sec is required when delays is given")
        al = agent.lower()
        resolved = (
            delays.filter(F.col("agent").isin(al, "*"))
            .groupBy("host")
            .agg(
                F.coalesce(
                    F.min(F.when(F.col("agent") == al, F.col("delay_sec"))),
                    F.min(F.when(F.col("agent") == "*", F.col("delay_sec"))),
                ).alias("_delay_sec")
            )
        )
        cap = F.floor(F.lit(float(window_sec)) / F.col("_delay_sec"))
        # least() skips NULLs: no directive / unparseable delay -> the
        # plain budget; no budget -> the cap alone.
        frontier = (
            pri.join(F.broadcast(resolved), "host", "left")
            .withColumn("_lim", F.least(budget, cap))
            .drop("_delay_sec")
        )
    else:
        frontier = pri.withColumn("_lim", budget)

    if per_host_budget is not None or delays is not None:
        # Hot-host bound: a naive per-host row_number sorts each
        # host's ENTIRE candidate set in one task — a crawl-scale hot
        # host (10^8+ outlink candidates) serializes onto one
        # executor. Since only `_lim` rows per host can survive, run a
        # salted partial top-k first (the same exchange-shrinking
        # shape as the arrow ANN engine, similarity.py): within each
        # (host, salt) bucket keep the `_lim` smallest urls, which is
        # a superset of the host's true top-`_lim` (the global i-th
        # smallest is at worst i-th in its own bucket). The final
        # exact window then sorts <= salt_buckets * _lim rows per
        # host instead of the full candidate set; the largest sort
        # task is max(host_size / salt_buckets, salt_buckets * _lim).
        # Hosts with a NULL limit (no budget and no parseable delay)
        # pass through the pre-filter untouched — with no cap the
        # full per-host ordering is genuinely required.
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
        w_pre = Window.partitionBy(F.col("host"), salt).orderBy("url")
        frontier = (
            frontier.withColumn("_pre_pos", F.row_number().over(w_pre))
            .filter(
                F.col("_lim").isNull()
                | (F.col("_pre_pos") <= F.col("_lim"))
            )
            .drop("_pre_pos")
        )

    w = Window.partitionBy("host").orderBy("url")
    frontier = (
        frontier.withColumn("host_pos", F.row_number().over(w))
        .filter(
            F.col("_lim").isNull() | (F.col("host_pos") <= F.col("_lim"))
        )
        .drop("_lim")
        .select("url", "host", "host_rank", "host_pos")
    )
    frontier = maybe_ckpt(frontier)
    stages.append(("frontier", frontier))

    return frontier, build_funnel(stages, "n_urls")
