"""Snapshot diff (operators/snapshot.py) semantics."""

import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.snapshot import (
    diff_summary,
    row_digest,
    snapshot_diff,
)


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "web", 100),   # unchanged
            (2, "web", 200),   # changed payload
            (3, "book", 300),  # removed
            (5, None, 500),    # unchanged, NULL payload column
        ],
        "doc_id bigint, source string, n_chars bigint",
    )
    new = spark.createDataFrame(
        [
            (1, "web", 100),
            (2, "web", 999),
            (4, "code", 400),  # added
            (5, None, 500),
        ],
        "doc_id bigint, source string, n_chars bigint",
    )
    return old, new


def test_diff_classification(spark, snaps):
    old, new = snaps
    rows = {
        r["doc_id"]: r["change_type"]
        for r in snapshot_diff(old, new, ["doc_id"], ["source", "n_chars"]).collect()
    }
    assert rows == {2: "changed", 3: "removed", 4: "added"}


def test_diff_drops_unchanged_including_null_payload(spark, snaps):
    old, new = snaps
    ids = [
        r["doc_id"]
        for r in snapshot_diff(old, new, ["doc_id"], ["source", "n_chars"]).collect()
    ]
    assert 1 not in ids and 5 not in ids


def test_digest_distinguishes_null_position(spark):
    """('a', NULL) must not collide with (NULL, 'a') — the concat_ws
    NULL-skip pitfall the coalesce sentinel exists for."""
    df = spark.createDataFrame(
        [("a", None), (None, "a")], "c1 string, c2 string"
    )
    digs = [r[0] for r in df.select(row_digest(["c1", "c2"])).collect()]
    assert digs[0] != digs[1]


def test_diff_summary_counts(spark, snaps):
    old, new = snaps
    d = snapshot_diff(old, new, ["doc_id"], ["source", "n_chars"])
    got = {r["change_type"]: r["n_keys"] for r in diff_summary(d).collect()}
    assert got == {"added": 1, "removed": 1, "changed": 1}


def test_diff_is_payload_width_independent(spark, snaps):
    """The diff plan projects key+digest BEFORE the join: no payload
    column name survives into the join's input projections."""
    old, new = snaps
    plan = snapshot_diff(
        old, new, ["doc_id"], ["source", "n_chars"]
    )._jdf.queryExecution().optimizedPlan().toString()
    # the join node's children are Aggregates/Projects on md5 digests;
    # source/n_chars appear only under the digest expression, never as
    # free output columns of the join
    join_line = [ln for ln in plan.splitlines() if "Join" in ln][0]
    assert "source" not in join_line and "n_chars" not in join_line
