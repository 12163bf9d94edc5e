"""Deterministic corpus sampling and shard-packing operators.

Training-data pipelines sample by *decision function*, not by RNG:
whether a document is kept must depend only on the document (so reruns,
retries, different partitionings, and growing corpora never flip
membership — ``df.sample()`` guarantees none of these). Every operator
here keys its decision on a hash of a stable id:

* :func:`hash_sample`        — deterministic Bernoulli-style fraction
  (map-only, no shuffle)
* :func:`stratified_sample`  — per-stratum fractions, e.g. language
  rebalancing (map-only, no shuffle)
* :func:`quota_sample`       — exactly min(n, count) rows per stratum,
  chosen by hash order (one shuffle on the stratum key)
* :func:`token_budget_shards`— pack documents into ~fixed-token
  training shards inside hashed packing groups (each group sorts
  independently, so no global sort at any corpus size)

The default hash is ``xxhash64`` (JVM-side, fastest). Each operator
accepts ``hash_expr`` to override it; the oracle queries in
``__spark_entry__.py`` pass an md5-hex-prefix hash that DuckDB can
compute bit-identically, so the decision arithmetic itself is
hash-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_sample",
    "stratified_sample",
    "quota_sample",
    "token_budget_shards",
    "shard_manifest",
    "temperature_sample",
    "portable_hash",
]

# Decision space: h mod _M compared against fraction * _M. 1e6 keeps
# fraction resolution at 1e-6 while staying far from long overflow.
_M = 1_000_000


def portable_hash(key: Column) -> Column:
    """60-bit hash computable bit-identically in Spark and DuckDB
    (first 15 hex chars of md5 of the key's string form). Slower than
    xxhash64 — used where cross-engine reproducibility matters more
    than speed (oracle checks, cross-system handoffs)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("long")


def _h(df_key: Column, hash_expr: Column | None) -> Column:
    h = F.xxhash64(df_key) if hash_expr is None else hash_expr
    return F.pmod(h, F.lit(_M))


def _threshold(fraction: float) -> int:
    # round, not truncate: 0.29 * 1e6 is 289999.99999999994 in floats,
    # and int() would shave the boundary key (and disagree with a SQL
    # engine's rounding of the same literal).
    return int(round(fraction * _M))


def hash_sample(
    df: DataFrame,
    fraction: float,
    *,
    key_col: str = "doc_id",
    hash_expr: Column | None = None,
) -> DataFrame:
    """Keep rows with ``hash(key) mod 1e6 < fraction * 1e6``.

    Map-only: the filter is a pure predicate over the scan, so it
    pushes ahead of downstream shuffles and costs one hash per row at
    any corpus size. Membership is a function of the key alone.
    """
    return df.filter(_h(F.col(key_col), hash_expr) < _threshold(fraction))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    hash_expr: Column | None = None,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic fractions (language rebalancing: keep
    e.g. 10% of the dominant language, 100% of the rare ones).

    Strata absent from ``fractions`` get ``default_fraction`` (0.0 =
    dropped — explicit beats silent pass-through for quota curation).
    Map-only like :func:`hash_sample`; the per-stratum threshold is a
    literal map lookup, no join.
    """
    thresholds = F.create_map(
        *[
            lit
            for k, v in fractions.items()
            for lit in (F.lit(k), F.lit(_threshold(v)))
        ]
    )
    thr = F.coalesce(
        thresholds[F.col(strata_col)], F.lit(_threshold(default_fraction))
    )
    return df.filter(_h(F.col(key_col), hash_expr) < thr)


def quota_sample(
    df: DataFrame,
    n_per_stratum: int,
    *,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    hash_expr: Column | None = None,
) -> DataFrame:
    """Exactly ``min(n_per_stratum, stratum size)`` rows per stratum,
    deterministically chosen by hash order (ties broken by key).

    One shuffle on the stratum key; skew is bounded by the largest
    stratum — for web corpora that is the dominant language, so at
    extreme scale pre-filter it with :func:`stratified_sample` to an
    over-quota fraction first, then take the exact quota here.
    """
    w = Window.partitionBy(strata_col).orderBy(
        _h(F.col(key_col), hash_expr).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__quota_rn", F.row_number().over(w))
        .filter(F.col("__quota_rn") <= n_per_stratum)
        .drop("__quota_rn")
    )


def temperature_sample(
    df: DataFrame,
    alpha: float,
    target_frac: float,
    *,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    hash_expr: Column | None = None,
) -> DataFrame:
    """mC4/XLM-R temperature rebalancing: resample strata so the
    output follows ``q_l ∝ p_l^alpha`` (``p_l`` = stratum share of the
    corpus; ``alpha < 1`` flattens toward rare strata, 1 = natural,
    0 = uniform) at a total budget of ``target_frac · N`` expected
    rows. Unlike :func:`stratified_sample` the rates are LEARNED from
    the corpus, and rare strata can be UPSAMPLED: each row gets
    ``n_copies = floor(r_l) + Bernoulli(frac(r_l))`` deterministic
    copies (expected copies exactly ``r_l = target_frac·N·q_l/n_l``)
    and is exploded to one output row per copy with a 1-based ``copy``
    index — the standard epoch-repeat representation.

    Scale shape: one stratum-keyed aggregate whose output is
    #strata rows, the per-stratum normalizer reduced over THAT tiny
    table (never the corpus), rates broadcast-joined back (null-safe,
    so a NULL stratum is a stratum, not silently dropped), then a
    map-only copy-count explode. The corpus is never re-shuffled and
    never collected.

    Determinism: the Bernoulli on the fractional part hashes
    ``(key, "copy")`` — deliberately DECORRELATED from the bare
    ``hash(key)`` the other samplers threshold on. Reusing that hash
    would skew copy counts after composition: rows surviving
    ``hash_sample(f)`` all have ``h < f·1e6``, so a same-hash
    Bernoulli at threshold ``t`` would fire with probability
    ``min(t/f, 1)`` instead of ``t``. A caller overriding
    ``hash_expr`` must pass an expression similarly independent of
    any upstream sampler's draw (the gate query salts the portable
    hash with a ``'#copy'`` suffix).
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0: {alpha}")
    if target_frac <= 0:
        raise ValueError(f"target_frac must be positive: {target_frac}")
    counts = df.groupBy(F.col(strata_col).alias("__stratum")).agg(
        F.count(F.lit(1)).alias("__n_l")
    )
    tot = counts.agg(
        F.sum("__n_l").alias("__n"),
        F.sum(
            F.pow(F.col("__n_l").cast("double"), F.lit(float(alpha)))
        ).alias("__z_num"),
    )
    # q_l = p_l^a / sum(p_l^a) = n_l^a / sum(n_l^a): the N^a factor
    # cancels, so the normalizer is computed on raw counts — fewer
    # float ops for the oracle to mirror.
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "__stratum",
        (
            F.lit(float(target_frac))
            * F.col("__n")
            * (
                F.pow(F.col("__n_l").cast("double"), F.lit(float(alpha)))
                / F.col("__z_num")
            )
            / F.col("__n_l")
        ).alias("__rate"),
    )
    joined = df.join(
        F.broadcast(rates),
        F.col(strata_col).eqNullSafe(F.col("__stratum")),
    ).drop("__stratum")
    frac_thr = F.round((F.col("__rate") - F.floor(F.col("__rate"))) * _M)
    copy_hash = (
        F.xxhash64(F.col(key_col), F.lit("copy"))
        if hash_expr is None
        else hash_expr
    )
    n_copies = F.floor(F.col("__rate")).cast("long") + F.when(
        F.pmod(copy_hash, F.lit(_M)) < frac_thr, F.lit(1)
    ).otherwise(F.lit(0))
    # sequence(1, 0) counts DOWN in Spark ([1, 0]) — zero copies must
    # be an explicit empty array or dropped rows would yield 2 rows.
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    return joined.withColumn("copy", F.explode(copies)).drop("__rate")


def token_budget_shards(
    df: DataFrame,
    *,
    tokens_col: str = "n_tokens",
    shard_tokens: int = 1_000_000,
    n_groups: int = 1024,
    key_col: str = "doc_id",
    hash_expr: Column | None = None,
) -> DataFrame:
    """Assign each document to a training shard of ~``shard_tokens``
    tokens: ``(grp, shard)`` where ``grp = hash(key) mod n_groups`` and
    ``shard`` is the running-token-total bucket within the group
    (ordered by key; a document starting at offset t lands in shard
    ``floor(t / shard_tokens)``).

    Scale shape: there is NO global sort — each of the ``n_groups``
    packing groups sorts independently (one shuffle on ``grp``), so a
    100 TB corpus packs as 1024 parallel ~100 GB window scans; size
    ``n_groups`` so a group's rows fit an executor's spill budget.
    Shard fill is approximate at group boundaries (a doc straddling
    the budget stays in the shard it started in — standard doc-level
    packing; token-level splitting is a tokenizer concern, not a
    corpus-layout one).
    """
    grp = F.pmod(
        F.xxhash64(F.col(key_col)) if hash_expr is None else hash_expr,
        F.lit(n_groups),
    )
    out = df.withColumn("grp", grp)
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return out.withColumn(
        "shard", F.floor(start / F.lit(shard_tokens)).cast("long")
    )


def shard_manifest(
    shards: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(grp, shard, n_docs, n_tokens, first_id, last_id, digest): the
    per-shard manifest a dataset card / reproducibility audit wants —
    consume :func:`token_budget_shards` output. ``digest`` is
    order-INDEPENDENT (md5 over the sorted list of per-doc
    ``md5(id:tokens)`` entries), so two runs that packed identical
    membership produce identical manifests regardless of row order,
    and any membership or token-count drift changes it.

    Scale shape: ONE (grp, shard)-keyed aggregate. The collect_list
    state is bounded by documents-per-shard — ``shard_tokens``
    divided by the smallest document, a packing-level constant, not a
    corpus-level one — and every other aggregate is map-side
    combinable. No window, no driver state.
    """
    doc_entry = F.md5(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.col(tokens_col).cast("string"),
        )
    )
    return shards.groupBy("grp", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).alias("n_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list(doc_entry)), "")
        ).alias("digest"),
    )
