"""Deduplication operators for large-scale text corpora.

All operators are pure DataFrame compositions (JVM-side, shuffle-aware):

* :func:`exact_dedup`          — hash-groupBy exact duplicate groups
* :func:`word_shingles`        — word n-gram shingling (built-in
  ``split``/``transform``/``sequence``; no UDF)
* :func:`ngram_jaccard_pairs`  — exact Jaccard over shingle sets via
  explode + self-join (the verify stage of MinHash pipelines)
* :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash + LSH
  banding: signature = min over shingle hashes under ``n_perm``
  universal-hash permutations; candidate pairs from band-bucket joins
* :func:`simhash64`            — 64-bit SimHash fingerprint per doc
* :func:`embedding_dup_pairs`  — near-dup pairs by embedding cosine

Scale notes: every self-join keys on a hash (shingle hash, band hash,
bucket), so skew is bounded by real duplicate clusters; MinHash bands
turn the quadratic pair space into per-bucket joins. ``groupBy`` paths
get map-side partial aggregation from Catalyst for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "word_shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "embedding_dup_pairs",
    "duplicate_clusters",
]

# 31-bit Mersenne prime: (a*h + b) stays under 2^62, no long overflow
_MERSENNE = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (text_hash, n_copies, keep_id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def word_shingles(df: DataFrame, *, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) pairs of word n-grams, distinct per document."""
    toks = F.split(F.col(text_col), " ")
    # Guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty array instead.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + off) for off in range(n)]
        ),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingle).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above ``threshold``.

    explode -> self-join on the 64-bit shingle hash (an 8-byte shuffle
    key instead of the 20-40B shingle string; xxhash64 collisions are
    negligible at corpus scale) -> per-pair intersection counts ->
    Jaccard from set sizes. Returns (id_a, id_b, jaccard) with id_a <
    id_b and jaccard rounded to 4 decimals.
    """
    sh = (
        word_shingles(df, n=n, text_col=text_col, id_col=id_col)
        .select("id", F.xxhash64("shingle").alias("sh"))
        .cache()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.withColumnsRenamed({"id": "id_a"})
    b = sh.withColumnsRenamed({"id": "id_b"})
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _perm_params(n_perm: int, seed: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(n_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    *,
    n: int = 3,
    n_perm: int = 32,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signatures: (id, sig array<long> of length n_perm).

    Base shingle hash is xxhash64 (JVM); permutations are universal
    hashes ``(a*h + b) mod M61`` folded with ``min`` per document —
    one shuffle (the groupBy), map-side combined.
    """
    sh = word_shingles(df, n=n, text_col=text_col, id_col=id_col)
    h = F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE))
    params = _perm_params(n_perm, seed)
    mins = [
        F.min(F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = df.select(F.col(id_col).alias("id")).join(
        sh.groupBy("id").agg(*mins), "id", "left"
    )
    return sig.select(
        "id", F.array(*[f"m{i}" for i in range(n_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    n: int = 3,
    n_perm: int = 32,
    bands: int = 8,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one identical band.

    Signature is split into ``bands`` bands of ``n_perm // bands`` rows;
    banding keys are hashed and self-joined, so candidate generation is
    linear in bucket sizes, never quadratic in corpus size.
    """
    rows_per_band = n_perm // bands
    sig = minhash_signatures(
        df, n=n, n_perm=n_perm, seed=seed, text_col=text_col, id_col=id_col
    )
    # Shingle-less documents have all-null signatures; without this
    # filter they'd share identical (hash-of-nulls) bands and form one
    # giant spurious candidate clique.
    sig = sig.filter(F.col("sig")[0].isNotNull())
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("id", F.explode(band_cols).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a = banded.withColumnsRenamed({"id": "id_a"})
    b = banded.withColumnsRenamed({"id": "id_b"})
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash64(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document: sign of the per-bit sum of token
    hash bits. Explode tokens -> posexplode bits is avoided; instead the
    64 per-bit sums are aggregate expressions over token hashes (one
    shuffle, map-side combined). Returns (id, simhash long)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    h = F.xxhash64("tok")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        sim = term if sim is None else sim.bitwiseOR(term)
    return agg.select("id", sim.alias("simhash"))


def embedding_dup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    dim: int = 64,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, bucketed by
    random-hyperplane LSH so the pair space stays sub-quadratic."""
    from .similarity import _cosine, hyperplane_lsh_buckets

    b = hyperplane_lsh_buckets(
        df, dim=dim, n_bits=n_bits, seed=seed, id_col=id_col, vec_col=vec_col
    )
    left = b.withColumnsRenamed({id_col: "id_a", vec_col: "va"})
    right = b.withColumnsRenamed({id_col: "id_b", vec_col: "vb"})
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            _cosine(
                F.transform(F.col("va"), lambda x: x.cast("double")),
                F.transform(F.col("vb"), lambda x: x.cast("double")),
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )


def duplicate_clusters(
    pairs: DataFrame,
    *,
    max_iter: int = 20,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Connected components over near-dup pairs: (id, cluster_id).

    The canonical step after pair generation in a dedup pipeline
    (keep one representative per component). Implemented as iterative
    min-label propagation in pure DataFrame ops — the standard
    large-scale connected-components shape (each round: one join on the
    symmetrized edge list + one min-aggregate, both map-side combined;
    no driver-side graph). Converges in O(component diameter) rounds;
    near-dup clusters are dense/shallow, so a handful of rounds
    suffices and ``max_iter`` is a diameter cap, checked with one
    cheap count per round (early exit on fixpoint). cluster_id is the
    minimum member id — deterministic across partitionings.

    Only ids that appear in ``pairs`` are returned; singletons carry no
    dedup decision and would bloat the output at corpus scale.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    labels = labels.localCheckpoint(eager=True)
    # max_iter bounds the label-update rounds; one extra round is
    # allowed so a diameter-max_iter component can still verify its
    # fixpoint (the convergence check needs a round that changes
    # nothing) instead of raising spuriously at the boundary.
    for _ in range(max_iter + 1):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nb_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nb_min", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        # Truncate lineage each round: iterative self-joins otherwise
        # stack plans exponentially (the classic iterative-algorithm
        # pitfall on Spark).
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Exhausting max_iter without a fixpoint means some component's
        # diameter exceeds the cap: silently returning would split one
        # real duplicate cluster into several cluster_ids and dedup
        # would keep extra copies — fail loudly instead.
        raise RuntimeError(
            f"duplicate_clusters did not converge within max_iter={max_iter} "
            "rounds; a component has larger diameter — raise max_iter"
        )
    return labels
