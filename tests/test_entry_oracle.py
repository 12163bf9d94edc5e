"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and compare to ``oracle_sql()``
via DuckDB — row count, column names, and order-insensitive values."""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(value):
    if value is not None and value != value:  # NaN/NaT
        return "nan"
    if isinstance(value, float):
        return round(value, 4)
    if isinstance(value, bytes):
        return value.hex()
    return value


def _canon(pdf):
    """Mirror the driver's pandas canonicalization: lowercase columns,
    round floats, then ``sort_values`` over EVERY column. Crucially this
    CRASHES on list/array-valued cells exactly like the driver's gate
    does (round 2 aborted at q_hash_embed with ``unhashable type:
    'list'`` while the old tuple-sort replica sailed through)."""
    pdf = pdf.copy()
    pdf.columns = [str(c).lower() for c in pdf.columns]
    for c in pdf.columns:
        if getattr(pdf[c].dtype, "kind", "") == "f":
            pdf[c] = pdf[c].round(4)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _rows(pdf):
    return [
        tuple(_norm(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def _dtype_kinds(pdf):
    """Per-column numpy dtype KIND, with unsigned folded into signed.

    The driver's canonicalized hash is dtype-sensitive: round 4's only
    red row (q_cdx_index) was an oracle whose un-cast window ``SUM``
    came back HUGEINT → pandas float64 while Spark emitted bigint, so
    ``748.0`` hashed differently from ``748`` even though the tuple
    compare below said equal. Asserting integer-vs-float KIND parity
    per column makes this replica reproduce the driver's sensitivity
    (the exact width — int32 vs int64 — does not change the
    canonicalized values, so kinds, not full dtypes)."""
    return {
        c: {"u": "i"}.get(pdf[c].dtype.kind, pdf[c].dtype.kind)
        for c in pdf.columns
    }


def _compare(name, spark, ddb):
    import __spark_entry__ as entry_mod
    from pyspark.sql.types import ArrayType, MapType, StructType

    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = q(spark, SF_DIR)
    complex_cols = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: non-scalar output columns {complex_cols} — the driver's "
        "pandas canonicalizer cannot sort these; emit scalars"
    )
    spark_cols = [c.lower() for c in sdf.columns]
    ora = ddb.sql(sql)
    oracle_cols = [c.lower() for c in ora.columns]
    assert spark_cols == oracle_cols, f"{name}: columns {spark_cols} != {oracle_cols}"
    spdf, opdf = _canon(sdf.toPandas()), _canon(ora.df())
    skinds, okinds = _dtype_kinds(spdf), _dtype_kinds(opdf)
    assert skinds == okinds, (
        f"{name}: pandas dtype-KIND mismatch (driver hash is "
        f"dtype-sensitive — un-cast HUGEINT/DECIMAL oracle column?): "
        f"spark={skinds} oracle={okinds}"
    )
    srows = _rows(spdf)
    orows = _rows(opdf)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    mismatches = [
        (a, b) for a, b in zip(srows, orows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def all_query_names():
    import __spark_entry__ as entry_mod

    return [n for n in entry_mod.queries() if n in entry_mod.oracle_sql()]


@pytest.mark.spark
@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(name, spark, ddb):
    _compare(name, spark, ddb)


@pytest.mark.spark
def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # Byte-identical invariant: every document matches its golden text.
    assert all(r["n_docs"] == r["n_match"] for r in rows)


def test_gate_window_covers_all_queries():
    """The driver's correctness gate checks exactly the FIRST 50 dict
    entries of ``queries()`` (every CORRECTNESS_r*.json is precisely the
    then-first-50 keys). Two invariants, both window-exempt (a query in
    the current window is about to be re-gated):

    1. COVERAGE — a below-cap query must hold a GREEN driver row from
       some past round (rows_match + schema_match + hash_match, no
       err). Key-presence alone is not enough: round 4's q_cdx_index
       had a row, but a red one (round-3 verdict: 28 queries had no
       row at all).
    2. STALENESS — a below-cap query's LATEST green row must be less
       than 4 rounds old relative to the upcoming gate round
       (= max existing round + 1). With 106 queries and a 50-row
       window, a full refresh cycle needs 3 rounds (ceil(106/50)), so
       ages 1-3 are the sustainable steady state and age >= 4 means a
       rotation was skipped. Round-5 note: this is red for the six
       r1-only rows (and q_lm_score's r2 row is at the age-3 boundary,
       rotated anyway per the round-4 verdict) unless they sit inside
       the round-5 window — which is exactly the forcing function."""
    import glob
    import json

    import __spark_entry__ as entry_mod

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_green: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        rounds.append(rnd)
        with open(path) as fh:
            for name, row in json.load(fh).items():
                green = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match", True)
                    and not row.get("err")
                )
                if green:
                    latest_green[name] = max(latest_green.get(name, 0), rnd)
    next_round = max(rounds) + 1 if rounds else 1
    keys = list(entry_mod.queries())
    window = set(keys[:50])
    below = [k for k in keys if k not in window]
    uncovered = [k for k in below if k not in latest_green]
    assert not uncovered, (
        f"{len(uncovered)} queries sit below the driver's 50-row gate cap "
        f"with no GREEN CORRECTNESS_r*.json row in any round: {uncovered} "
        "— rotate them into the first 50 positions of queries()"
    )
    stale = {
        k: latest_green[k]
        for k in below
        if next_round - latest_green[k] >= 4
    }
    assert not stale, (
        f"{len(stale)} below-cap queries have let their latest green "
        f"driver row age >= 4 rounds (next gate round = r{next_round}): "
        f"{stale} — rotate them into the first 50 positions of queries()"
    )


def test_dtype_kind_guard_catches_uncast_hugeint():
    """The round-4 failure class, pinned: an oracle whose window SUM
    is left un-cast comes back HUGEINT → pandas float64, while the
    Spark side is int64. The kind-parity guard must see 'f' vs 'i'
    even though the VALUES compare equal (748.0 == 748)."""
    import pandas as pd

    con = duckdb.connect()
    uncast = con.sql(
        "SELECT SUM(x) OVER (ORDER BY x) - x AS off "
        "FROM (SELECT CAST(range AS BIGINT) AS x FROM range(3))"
    ).df()
    cast = con.sql(
        "SELECT CAST(SUM(x) OVER (ORDER BY x) - x AS BIGINT) AS off "
        "FROM (SELECT CAST(range AS BIGINT) AS x FROM range(3))"
    ).df()
    sparkish = pd.DataFrame({"off": pd.array([0, 0, 1], dtype="int64")})
    assert _dtype_kinds(_canon(uncast)) == {"off": "f"}
    assert _dtype_kinds(_canon(cast)) == {"off": "i"}
    assert _dtype_kinds(_canon(sparkish)) != _dtype_kinds(_canon(uncast))
    assert _dtype_kinds(_canon(sparkish)) == _dtype_kinds(_canon(cast))
    # And the value-level rows would NOT have caught it:
    assert _rows(_canon(uncast)) == _rows(_canon(sparkish))


def test_query_oracle_key_parity():
    """Every queries() entry must have an oracle_sql() twin and vice
    versa — an orphan on either side silently skips the driver's
    correctness gate for that query."""
    import __spark_entry__ as entry_mod

    q, o = set(entry_mod.queries()), set(entry_mod.oracle_sql())
    assert q == o, (q - o, o - q)
