"""Bigram LM quality-score tests: exact hand-computed MLE
probabilities, OOV floor, pruning semantics, and degenerate docs.
Corpus-level parity with DuckDB is covered by q_lm_score in
tests/test_entry_oracle.py."""

from __future__ import annotations

import math

import pytest

pytestmark = pytest.mark.spark


def _dfs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mle_probabilities_exact(spark):
    from htmlparser2_spark.operators.lm_score import train_bigram_lm

    # Bigrams: "a b" x2, "b a" x1, "a c" x1 -> contexts: a:3, b:1.
    corpus = _dfs(spark, [(1, "a b a b"), (2, "a c")])
    lm = {r["bigram"]: r["logp"] for r in train_bigram_lm(corpus).collect()}
    assert lm["a b"] == pytest.approx(math.log(2 / 3))
    assert lm["b a"] == pytest.approx(math.log(1 / 1))
    assert lm["a c"] == pytest.approx(math.log(1 / 3))
    assert set(lm) == {"a b", "b a", "a c"}


def test_scores_and_oov(spark):
    from htmlparser2_spark.operators.lm_score import (
        DEFAULT_OOV_LOGP,
        lm_doc_scores,
        train_bigram_lm,
    )

    corpus = _dfs(spark, [(1, "a b a b"), (2, "a c")])
    lm = train_bigram_lm(corpus)
    docs = _dfs(spark, [(10, "a b"), (11, "x y"), (12, "a b z q")])
    got = {r["id"]: r for r in lm_doc_scores(docs, lm).collect()}
    assert got[10]["avg_logp"] == pytest.approx(math.log(2 / 3))
    assert got[10]["ppl"] == pytest.approx(3 / 2)
    # Every bigram OOV -> the floor.
    assert got[11]["avg_logp"] == pytest.approx(DEFAULT_OOV_LOGP)
    # Mixed: ("a b", "b z", "z q") -> (log(2/3) + 2*floor) / 3.
    want = (math.log(2 / 3) + 2 * DEFAULT_OOV_LOGP) / 3
    assert got[12]["avg_logp"] == pytest.approx(want)
    assert got[12]["n_bigrams"] == 3


def test_case_fold_and_empty_docs(spark):
    from htmlparser2_spark.operators.lm_score import (
        lm_doc_scores,
        train_bigram_lm,
    )

    corpus = _dfs(spark, [(1, "A b a B"), (2, "a c")])
    lm = train_bigram_lm(corpus)
    docs = _dfs(spark, [(10, "a  B"), (11, ""), (12, "solo")])
    got = {r["id"]: r for r in lm_doc_scores(docs, lm).collect()}
    # Double space collapses via empty-token filter; case folds.
    assert got[10]["avg_logp"] == pytest.approx(math.log(2 / 3))
    for bigramless in (11, 12):
        assert got[bigramless]["n_bigrams"] == 0
        assert got[bigramless]["avg_logp"] is None
        assert got[bigramless]["ppl"] is None


def test_backoff_three_branches_exact(spark):
    """Stupid backoff hand-computed: seen bigram -> MLE conditional,
    unseen bigram with a seen continuation -> ln(0.4) + ln P(w2),
    unseen continuation -> the OOV floor."""
    from htmlparser2_spark.operators.lm_score import (
        DEFAULT_OOV_LOGP,
        backoff_doc_scores,
        train_bigram_lm,
        train_unigram_lm,
    )

    # Training tokens: a b a b a c -> unigrams a:3, b:2, c:1 (T=6).
    corpus = _dfs(spark, [(1, "a b a b"), (2, "a c")])
    bi, uni = train_bigram_lm(corpus), train_unigram_lm(corpus)
    docs = _dfs(spark, [(10, "a b"), (11, "c a"), (12, "a z"), (13, "x y")])
    got = {
        r["id"]: r for r in backoff_doc_scores(docs, bi, uni).collect()
    }
    assert got[10]["avg_logp"] == pytest.approx(math.log(2 / 3))
    # "c a" never trained, but 'a' is a seen continuation.
    assert got[11]["avg_logp"] == pytest.approx(
        math.log(0.4) + math.log(3 / 6)
    )
    # 'z' unseen entirely -> floor; 'x y' -> floor too.
    assert got[12]["avg_logp"] == pytest.approx(DEFAULT_OOV_LOGP)
    assert got[13]["avg_logp"] == pytest.approx(DEFAULT_OOV_LOGP)
    # Rare-but-plausible ranks above gibberish — the point of backoff.
    assert got[11]["avg_logp"] > got[12]["avg_logp"]


def test_unigram_lm_and_backoff_degenerates(spark):
    from htmlparser2_spark.operators.lm_score import (
        backoff_doc_scores,
        train_bigram_lm,
        train_unigram_lm,
    )

    corpus = _dfs(spark, [(1, "a b a b"), (2, "a c")])
    uni = {
        r["token"]: r["logp_uni"]
        for r in train_unigram_lm(corpus).collect()
    }
    assert uni["a"] == pytest.approx(math.log(3 / 6))
    assert uni["c"] == pytest.approx(math.log(1 / 6))
    bi = train_bigram_lm(corpus)
    docs = _dfs(spark, [(11, ""), (12, "solo")])
    got = {
        r["id"]: r
        for r in backoff_doc_scores(docs, bi, train_unigram_lm(corpus)).collect()
    }
    for bigramless in (11, 12):
        assert got[bigramless]["n_bigrams"] == 0
        assert got[bigramless]["avg_logp"] is None


def test_min_count_prunes_after_context_totals(spark):
    from htmlparser2_spark.operators.lm_score import train_bigram_lm

    corpus = _dfs(spark, [(1, "a b a b a c")])
    lm = {
        r["bigram"]: r["logp"]
        for r in train_bigram_lm(corpus, min_count=2).collect()
    }
    # "a c" (count 1) pruned; "a b" keeps denominator 3 (not 2):
    # pruning changes coverage, not surviving estimates.
    assert set(lm) == {"a b", "b a"}
    assert lm["a b"] == pytest.approx(math.log(2 / 3))


def test_perplexity_buckets_per_lang_and_null_tail(spark):
    from pyspark.sql import functions as F

    from htmlparser2_spark.operators.lm_score import perplexity_buckets

    scored = spark.createDataFrame(
        [
            # lang 'en': six scored docs, descending score order by id.
            (1, "en", -1.0), (2, "en", -2.0), (3, "en", -3.0),
            (4, "en", -4.0), (5, "en", -5.0), (6, "en", -6.0),
            # lang 'de': two docs + one unscorable (NULL -> tail).
            (7, "de", -1.5), (8, "de", -2.5), (9, "de", None),
        ],
        "id long, lang string, avg_logp double",
    )
    rows = {
        r["id"]: r
        for r in perplexity_buckets(scored, part_col="lang").collect()
    }
    assert [rows[i]["bucket_label"] for i in range(1, 7)] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]
    assert rows[7]["bucket_label"] == "head"
    assert rows[8]["bucket_label"] == "middle"
    assert rows[9]["bucket_label"] == "tail"  # unscorable -> tail

    # NULL-majority partition: unscorable docs must NEVER spill into
    # head/middle, however many there are (they are forced to the
    # last bucket, outside the ntile slots).
    nulls = spark.createDataFrame(
        [(1, "fr", -1.0)] + [(i, "fr", None) for i in range(2, 8)],
        "id long, lang string, avg_logp double",
    )
    n = {r["id"]: r["bucket_label"] for r in
         perplexity_buckets(nulls, part_col="lang").collect()}
    assert n[1] == "head"
    assert all(n[i] == "tail" for i in range(2, 8))

    # Rounded-score tie broken by id: equal scores at 4dp bucket in
    # id order, deterministically.
    ties = spark.createDataFrame(
        [(i, "en", -1.0 + i * 1e-9) for i in range(1, 7)],
        "id long, lang string, avg_logp double",
    )
    t = {r["id"]: r["bucket"] for r in
         perplexity_buckets(ties, part_col="lang").collect()}
    assert t == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3}

    # Non-3 bucket counts get generic labels.
    two = perplexity_buckets(scored, part_col="lang", n_buckets=2)
    assert set(r["bucket_label"] for r in two.collect()) == {"b1", "b2"}


def _cutoff_scored(spark):
    return spark.createDataFrame(
        [
            (1, "en", -1.0), (2, "en", -2.0), (3, "en", -3.0),
            (4, "en", -4.0), (5, "en", -5.0), (6, "en", -6.0),
            (7, "de", -1.5), (8, "de", -2.5), (9, "de", None),
        ],
        "id long, lang string, avg_logp double",
    )


def test_bucket_cutoffs_exact_values(spark):
    from htmlparser2_spark.operators.lm_score import (
        perplexity_bucket_cutoffs,
    )

    cuts = {
        r["lang"]: r["cutoffs"]
        for r in perplexity_bucket_cutoffs(
            _cutoff_scored(spark), part_col="lang"
        ).collect()
    }
    # en sorted asc [-6..-1]: q(2/3) at rank 10/3 -> -3 + 1/3,
    # q(1/3) at rank 5/3 -> -5 + 2/3 (linear interpolation, the
    # quantile_cont definition the oracle replays).
    assert cuts["en"][0] == pytest.approx(-3 + 1 / 3)
    assert cuts["en"][1] == pytest.approx(-5 + 2 / 3)
    # de over two values: q(p) = lo + p*(hi-lo); NULL row ignored.
    assert cuts["de"][0] == pytest.approx(-2.5 + 2 / 3)
    assert cuts["de"][1] == pytest.approx(-2.5 + 1 / 3)


def test_buckets_by_cutoff_semantics(spark):
    from htmlparser2_spark.operators.lm_score import (
        perplexity_buckets_by_cutoff,
    )

    rows = {
        r["id"]: r
        for r in perplexity_buckets_by_cutoff(
            _cutoff_scored(spark), part_col="lang"
        ).collect()
    }
    # en matches the ntile cut on this tie-free set.
    assert [rows[i]["bucket_label"] for i in range(1, 7)] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]
    # de: threshold semantics — -1.5 clears both cutoffs (head),
    # -2.5 falls below both (tail): cutoff buckets are not
    # equal-count on tiny groups, by design.
    assert rows[7]["bucket_label"] == "head"
    assert rows[8]["bucket_label"] == "tail"
    # Unscorable -> forced last bucket, like the ntile path.
    assert rows[9]["bucket_label"] == "tail"
    assert rows[9]["bucket"] == 3

    # All-NULL language: no cutoff row exists; scored rows are absent
    # by construction but NULL rows must still land in the tail.
    nulls = spark.createDataFrame(
        [(1, "fr", None), (2, "fr", None)],
        "id long, lang string, avg_logp double",
    )
    n = perplexity_buckets_by_cutoff(nulls, part_col="lang").collect()
    assert all(r["bucket_label"] == "tail" for r in n)

    # Heavy ties AT the cutoff all land on the better side.
    ties = spark.createDataFrame(
        [(i, "en", -1.0) for i in range(1, 7)],
        "id long, lang string, avg_logp double",
    )
    t = perplexity_buckets_by_cutoff(ties, part_col="lang").collect()
    assert all(r["bucket_label"] == "head" for r in t)


def test_buckets_by_cutoff_plan_has_no_window_or_sort(spark):
    """The scale contract: no Window and no sort anywhere in the
    physical plan (the r3 verdict's scale-killer was one ntile sort
    task per language — English at 100 TB is one partition). Cutoffs
    must come from a hash aggregate and be broadcast back."""
    from htmlparser2_spark.operators.lm_score import (
        perplexity_buckets_by_cutoff,
    )

    df = perplexity_buckets_by_cutoff(
        _cutoff_scored(spark), part_col="lang"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Sort " not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan


def test_buckets_by_cutoff_approx_path(spark):
    """percentile_approx engages via ``accuracy`` (the 100-TB path).
    Unlike exact `percentile` it returns OBSERVED values (no
    interpolation), so tiny-group boundaries can shift by one element
    — assert the invariants that matter instead: buckets in range,
    monotone in score within each language, NULL forced to tail."""
    from htmlparser2_spark.operators.lm_score import (
        perplexity_buckets_by_cutoff,
    )

    rows = perplexity_buckets_by_cutoff(
        _cutoff_scored(spark), part_col="lang", accuracy=10000
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert all(1 <= r["bucket"] <= 3 for r in rows)
    assert by_id[9]["bucket_label"] == "tail"  # NULL -> last bucket
    for lang in ("en", "de"):
        scored = sorted(
            (r for r in rows if r["lang"] == lang and r["avg_logp"]
             is not None),
            key=lambda r: -r["avg_logp"],
        )
        buckets = [r["bucket"] for r in scored]
        assert buckets == sorted(buckets), buckets  # monotone
    # en spans head and tail even under discrete cutoffs.
    en = [by_id[i]["bucket"] for i in range(1, 7)]
    assert en[0] == 1 and en[-1] == 3
