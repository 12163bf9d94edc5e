"""Snapshot-table incremental scans + extraction integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def test_snapshot_incremental_extract(spark, tmp_path):
    from htmlparser2_spark.plans.extract_job import parse_pages
    from htmlparser2_spark.sources.pages import build_pages
    from htmlparser2_spark.sources.snapshots import SnapshotTable

    table = SnapshotTable(str(tmp_path / "pages_table"))
    pages = build_pages(spark, SF)

    s1 = table.append(pages.filter(F.length("url") % 2 == 0))
    assert table.current_snapshot_id() == s1 == 1

    # Process everything up to s1.
    batch1 = table.incremental_scan(spark, from_id=None, to_id=s1)
    n1 = parse_pages(batch1).agg(F.sum("golden_match")).collect()[0][0]

    # Nothing new -> idle path.
    assert table.incremental_scan(spark, from_id=s1) is None

    # New crawl batch lands; process only the delta.
    s2 = table.append(pages.filter(F.length("url") % 2 == 1))
    delta = table.incremental_scan(spark, from_id=s1, to_id=s2)
    n2 = parse_pages(delta).agg(F.sum("golden_match")).collect()[0][0]
    assert n1 + n2 == 500

    # Full scan as-of s2 sees everything; as-of s1 sees only batch 1.
    assert table.scan(spark).count() == 500
    assert table.scan(spark, as_of=s1).count() == n1


def test_snapshot_log_shape(spark, tmp_path):
    from htmlparser2_spark.sources.snapshots import SnapshotTable

    table = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(10).select(F.col("id"))
    table.append(df)
    table.append(df)
    snaps = table.snapshots()
    assert [s["id"] for s in snaps] == [1, 2]
    assert all(s["n_files"] >= 1 for s in snaps)
