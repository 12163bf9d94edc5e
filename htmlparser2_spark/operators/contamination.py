"""Benchmark decontamination: find training documents that leak
evaluation data.

Standard practice before training on web text: any document sharing
enough word n-grams (conventionally 8-grams or longer) with a held-out
benchmark is flagged or dropped. The asymmetry drives the plan: the
benchmark side is tiny (thousands of items) while the corpus is the
100-TB side, so the benchmark's shingle table is **broadcast** — the
corpus is scanned exactly once, shuffles only the (rare) matching
shingles, and no corpus self-join exists anywhere.

* :func:`contamination_hits` — (doc_id, bench_id, n_shared) per
  contaminated (document, benchmark item) pair
* :func:`decontaminate`      — corpus minus contaminated docs (anti-join)

When even the benchmark shingle table is too big to broadcast as
exact 64-bit hashes (a full eval-suite union at 100 TB scale can run
to billions of 8-grams), the Bloom variant compresses it to a fixed
``m_bits``-bit filter — ~32 KB at the default 2^18 — with one-sided
error (never misses a true hit; false-positives at the standard
``(1 - e^{-kn/m})^k`` rate, which only over-drops):

* :func:`bloom_build`              — the filter itself, as ONE row
  ``(bloom array<long>)`` built relationally (no driver-side state)
* :func:`bloom_contamination_hits` — per-doc Bloom-flagged shingle
  counts; the corpus side is **map-only**: one scan, zero shuffle,
  one broadcast of the single filter row
* :func:`decontaminate_bloom`      — corpus minus flagged docs,
  again without any corpus-side join or shuffle
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _shingle_array
from .sampling import portable_hash

__all__ = [
    "contamination_hits",
    "decontaminate",
    "bloom_build",
    "bloom_contamination_hits",
    "decontaminate_bloom",
]


def _shingle_hashes(
    df: DataFrame, *, n: int, text_col: str, id_col: str, out_id: str
) -> DataFrame:
    """(out_id, sh) rows of distinct 64-bit n-gram hashes per row.
    Distinctness is in-row (``array_distinct``) — no exchange."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.array_distinct(
                F.transform(
                    _shingle_array(text_col, n), lambda s: F.xxhash64(s)
                )
            )
        ).alias("sh"),
    )


def contamination_hits(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """(doc_id, bench_id, n_shared) for every document sharing at least
    ``min_hits`` distinct word ``n``-grams with a benchmark item.

    The benchmark shingle table is broadcast (pinned in
    tests/test_plans.py), so cost is one corpus scan + a hash probe
    per corpus shingle; only matches reach the final groupBy.
    """
    doc_sh = _shingle_hashes(
        docs, n=n, text_col=text_col, id_col=id_col, out_id="doc_id"
    )
    bench_sh = _shingle_hashes(
        bench, n=n, text_col=bench_text_col, id_col=bench_id_col,
        out_id="bench_id",
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """The corpus minus every document :func:`contamination_hits`
    flags (left anti-join on the id — keeps all original columns)."""
    hits = contamination_hits(
        docs,
        bench,
        n=n,
        min_hits=min_hits,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        bench_id_col=bench_id_col,
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return docs.join(hits, id_col, "left_anti")


def _probe_hash(shingle: Column, i: int, hash_fn: str) -> Column:
    """64-bit hash of probe ``i`` for one shingle. ``xxhash64`` (JVM,
    fast) for production; ``portable`` (md5-prefix, DuckDB-replayable
    — see :func:`~htmlparser2_spark.operators.sampling.portable_hash`)
    where an oracle must rebuild the identical filter."""
    salted = F.concat(shingle, F.lit(f"#{i}"))
    if hash_fn == "xxhash64":
        return F.xxhash64(salted)
    if hash_fn == "portable":
        return portable_hash(salted)
    raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64|portable)")


def _bit_masks():
    """1 << j for j in 0..63 as *signed* 64-bit literals (bit 63 is
    the sign bit); indexed by element_at because Spark's shiftleft
    only takes a literal shift amount, not a column. Built lazily —
    a module-level Column would make importing this module (and
    plans/curate_job.py) crash before a SparkContext exists, which is
    the normal import order for a spark-submit driver."""
    return F.array(
        *[
            F.lit((1 << j) - (1 << 64) if j == 63 else (1 << j)).cast(
                "long"
            )
            for j in range(64)
        ]
    )


def _bloom_probes(
    shingle: Column, *, m_bits: int, k: int, hash_fn: str
) -> Column:
    """``array<struct<w:int, mask:long>>`` of the ``k`` (word-index,
    bit-mask) probes for one shingle. Computing word+mask here keeps
    the membership lambda to an ``element_at`` + bitwise AND. The raw
    hash enters through a ``transform`` lambda variable so it is
    evaluated ONCE per probe — higher-order lambdas are interpreted
    (no codegen subexpression elimination), and word + mask would
    otherwise each recompute the md5 on the corpus hot path."""
    hashes = F.array(
        *[_probe_hash(shingle, i, hash_fn) for i in range(k)]
    )
    masks = _bit_masks()

    def to_probe(h: Column) -> Column:
        pos = F.pmod(h, F.lit(m_bits)).cast("int")
        return F.struct(
            F.floor(pos / 64).cast("int").alias("w"),
            F.element_at(masks, F.pmod(pos, F.lit(64)) + 1).alias(
                "mask"
            ),
        )

    return F.transform(hashes, to_probe)


def bloom_build(
    bench: DataFrame,
    *,
    n: int = 8,
    m_bits: int = 1 << 18,
    k: int = 4,
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """ONE-row DataFrame ``(bloom array<long>)`` of ``m_bits // 64``
    words: the Bloom filter over every distinct word ``n``-gram in the
    benchmark, ``k`` probes per shingle.

    Built relationally end-to-end — positions are exploded and
    deduplicated (a shuffle bounded by ``min(k * shingles, m_bits)``
    rows of one int each), OR-folded into at most ``m_bits / 64``
    words, then densified against a ``range(n_words)`` frame so absent
    words materialize as 0 and an empty benchmark still yields a full
    all-zero filter. Nothing ever lands on the driver, and the result
    caches/persists like any DataFrame, so one build can screen any
    number of corpus scans.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    pos = (
        bench.select(
            F.explode(F.array_distinct(_shingle_array(text_col, n))).alias(
                "shingle"
            )
        )
        .select(
            F.explode(
                _bloom_probes(
                    F.col("shingle"), m_bits=m_bits, k=k, hash_fn=hash_fn
                )
            ).alias("p")
        )
        .select(F.col("p.w").alias("w"), F.col("p.mask").alias("mask"))
        .distinct()
    )
    words = pos.groupBy("w").agg(F.bit_or("mask").alias("bits"))
    dense = (
        bench.sparkSession.range(n_words)
        .select(F.col("id").cast("int").alias("w"))
        .join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda s: s["bits"],
        ).alias("bloom")
    )


# Internal name for the broadcast filter column so a corpus that
# already carries a "bloom" column neither collides in the crossJoin
# nor gets silently dropped afterwards.
_BLOOM_COL = "_bloom_filter_words"


def _bloom_screen(
    docs: DataFrame,
    bench: DataFrame | None,
    bloom: DataFrame | None,
    *,
    n: int,
    m_bits: int,
    k: int,
    text_col: str,
    bench_text_col: str,
    hash_fn: str,
):
    """Shared probe-test core for the two Bloom consumers: returns
    ``(docs x filter row, n_shingles col, n_flagged col)``. One
    definition so the membership test cannot drift between the
    hits report and the decontamination filter."""
    if (bench is None) == (bloom is None):
        raise ValueError("pass exactly one of bench= or bloom=")
    if bloom is None:
        bloom = bloom_build(
            bench, n=n, m_bits=m_bits, k=k, text_col=bench_text_col,
            hash_fn=hash_fn,
        )
    filt = bloom.select(F.col("bloom").alias(_BLOOM_COL))
    shingles = F.array_distinct(_shingle_array(text_col, n))

    def hit(s: Column) -> Column:
        return F.forall(
            _bloom_probes(s, m_bits=m_bits, k=k, hash_fn=hash_fn),
            lambda p: F.element_at(F.col(_BLOOM_COL), p["w"] + 1)
            .bitwiseAND(p["mask"])
            != 0,
        )

    joined = docs.crossJoin(F.broadcast(filt))
    return joined, F.size(shingles), F.size(F.filter(shingles, hit))


def bloom_contamination_hits(
    docs: DataFrame,
    bench: DataFrame | None = None,
    *,
    bloom: DataFrame | None = None,
    n: int = 8,
    m_bits: int = 1 << 18,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, n_shingles, n_flagged, contaminated) — per-document
    count of distinct shingles whose ``k`` Bloom probes are all set.

    The corpus side is **map-only**: the single filter row is
    broadcast-cross-joined (one ~``m_bits/8``-byte row against every
    partition), and the per-shingle test is an in-row ``forall`` of
    ``element_at`` + bitwise AND — no corpus shuffle, no corpus join
    key, nothing proportional to the benchmark in the plan. Pass a
    pre-built ``bloom`` (from :func:`bloom_build`, persisted) to amortize
    the build across runs; ``m_bits``/``k``/``hash_fn`` must then match
    the build. ``contaminated`` means at least one flagged shingle; a
    doc shorter than ``n`` tokens has no shingles and never flags.
    """
    joined, n_shingles, n_flagged = _bloom_screen(
        docs, bench, bloom, n=n, m_bits=m_bits, k=k, text_col=text_col,
        bench_text_col=bench_text_col, hash_fn=hash_fn,
    )
    return joined.select(
        F.col(id_col).alias("doc_id"),
        n_shingles.alias("n_shingles"),
        n_flagged.alias("n_flagged"),
    ).withColumn("contaminated", F.col("n_flagged") > 0)


def decontaminate_bloom(
    docs: DataFrame,
    bench: DataFrame | None = None,
    *,
    bloom: DataFrame | None = None,
    n: int = 8,
    min_hits: int = 1,
    m_bits: int = 1 << 18,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The corpus minus every document with ``>= min_hits``
    Bloom-flagged shingles — a (slight, one-sided) superset of what
    exact :func:`decontaminate` drops. Map-only on the corpus: the
    flag is computed in-row against the broadcast filter and filtered
    immediately, with no anti-join."""
    joined, _, n_flagged = _bloom_screen(
        docs, bench, bloom, n=n, m_bits=m_bits, k=k, text_col=text_col,
        bench_text_col=bench_text_col, hash_fn=hash_fn,
    )
    return joined.filter(n_flagged < min_hits).drop(_BLOOM_COL)
