"""Link-graph construction and fixed-iteration PageRank over hosts.

Web-scale curation pipelines rank hosts by link structure (Common
Crawl publishes exactly this: a host-level graph plus centrality
ranks used as crawl/quality priors). The reference parser gives us
the anchors (``<a href>`` nodes in the DOM adjacency table); this
module turns them into a weighted host->host edge list and runs the
power iteration as plain DataFrame joins.

Scale design (10^12 docs => ~10^8 hosts, ~10^10 host edges):

* Edge building is one groupBy shuffle keyed on (src, dst) with
  map-side combine; anchors never leave the executors unaggregated.
* Each PageRank iteration is one join (edges x ranks on ``src``) and
  one groupBy(``dst``) — both shuffle on host keys. The rank vector
  (2 cols x n_hosts) is orders of magnitude smaller than the edge
  list, so AQE broadcasts it below the threshold; above it the join
  is sort-merge on the same key the previous iteration shuffled on.
* Iterative DataFrame plans grow per iteration; the per-iteration
  eager ``localCheckpoint`` of the (tiny) rank vector truncates
  lineage so 20+ iterations don't build a 20-join megaplan (driver
  OOM / planner blowup at scale) and each iteration runs exactly once.
* Dangling mass (hosts with no outlinks) is redistributed uniformly
  each iteration — the standard correction; skipping it deflates
  total mass and is the classic subtle PageRank bug. The dangling
  sum is a scalar aggregate collected per iteration (one tiny job).

The arithmetic is deliberately plain double sums so a SQL engine can
replay it exactly (the DuckDB oracle unrolls the same iterations as
CTEs; see ``__spark_entry__.oracle_sql()['q_host_rank']``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import url_host, url_scheme

__all__ = ["host_edges", "pagerank"]


def host_edges(
    links: DataFrame,
    *,
    src_url: str = "url",
    dst_url: str = "href",
    drop_self_loops: bool = True,
) -> DataFrame:
    """Weighted host->host edges from a (page url, link href) table.

    ``weight`` counts the anchors between the host pair. Host keys
    come from :func:`~htmlparser2_spark.functions.urls.url_host`
    (lowercased, port/userinfo stripped) so case/port variants of one
    host collapse to one graph node. Href resolution follows crawler
    attribution rules:

    * absolute http(s) -> its own host;
    * protocol-relative ``//host/...`` -> that host;
    * other schemes (``mailto:``, ``javascript:``, ``ftp:``...) ->
      no edge;
    * scheme-less (relative) -> the source host;
    * NULL href, or an unparseable source/target host -> no edge
      (a NULL graph node would silently leak rank mass: joins on the
      NULL key never match, breaking the ranks-sum-to-1 invariant).

    One shuffle, map-side combined.
    """
    href = F.col(dst_url)
    src = url_host(F.col(src_url))
    dst = (
        F.when(
            href.startswith("//"),
            url_host(F.concat(F.lit("http:"), href)),
        )
        .when(url_scheme(href).isin("http", "https"), url_host(href))
        .when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:"), F.lit(None))
        .otherwise(src)
    )
    edges = links.filter(href.isNotNull()).select(
        src.alias("src"), dst.alias("dst")
    )
    edges = edges.filter(
        F.col("dst").isNotNull() & (F.col("dst") != "") & (F.col("src") != "")
    )
    if drop_self_loops:
        edges = edges.filter(F.col("src") != F.col("dst"))
    return edges.groupBy("src", "dst").agg(F.count("*").alias("weight"))


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
    rank_col: str = "rank",
) -> DataFrame:
    """Fixed-iteration weighted PageRank over an (src, dst, weight)
    edge list. Returns (host, ``rank_col``); ranks sum to 1.

    Fixed iteration count (not convergence-tested) keeps the job
    deterministic and restartable: a resumed run re-executes the same
    DAG. Each iteration's rank vector is eagerly localCheckpointed —
    it is tiny (2 cols x n_hosts) and the checkpoint both truncates
    the iterative lineage (no N-join megaplan for the planner) and
    guarantees every iteration executes exactly once: the dangling
    collect, the next iteration's join, and the caller's final action
    all read the materialized vector instead of replaying history
    (the O(iters^2) recompute trap of a purely lazy loop).

    Non-positive edge weights are dropped up front: a source whose
    weights sum to zero has no meaningful transition distribution and
    would otherwise divide by zero under ANSI mode.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    edges = edges.filter(F.col("weight") > 0).select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    )
    # nodes/trans/dangling are re-read every iteration — persist them
    # so the loop doesn't re-run the edge scan + distinct per round
    # (MEMORY_AND_DISK: spills rather than recomputes at scale).
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .persist()
    )
    # Out-weight per source, pre-divided into per-edge transition
    # probabilities once (not per iteration).
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    trans = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("p")
    )
    trans.persist()
    dangling = nodes.join(
        out_w.select(F.col("src").alias("host")), "host", "left_anti"
    ).persist()
    n = nodes.count()
    if n == 0:
        for df in (trans, nodes, dangling):
            df.unpersist()
        return nodes.select("host", F.lit(0.0).alias(rank_col))
    base = (1.0 - damping) / n
    ranks = nodes.select("host", F.lit(1.0 / n).alias("r"))
    if iters == 0:
        ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iters):
        dangling_mass = (
            dangling.join(ranks, "host")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            trans.join(ranks.withColumnRenamed("host", "src"), "src")
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.col("p") * F.col("r")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .select(
                "host",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0))
                       + F.lit(dangling_mass / n))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    for df in (trans, nodes, dangling):
        df.unpersist()
    return ranks.select("host", F.col("r").alias(rank_col))
