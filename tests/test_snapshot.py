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


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_diff_matches_bruteforce_random(spark, seed):
    """Randomized snapshots vs a dict-based reference diff: same
    classification for every key, including NULL payloads."""
    import random

    rng = random.Random(seed)
    def snap():
        return {
            k: (
                rng.choice(["web", "book", None]),
                rng.choice([10, 20, None]),
            )
            for k in rng.sample(range(40), rng.randint(5, 35))
        }

    old_d, new_d = snap(), snap()
    want = {}
    for k in set(old_d) | set(new_d):
        if k not in new_d:
            want[k] = "removed"
        elif k not in old_d:
            want[k] = "added"
        elif old_d[k] != new_d[k]:
            want[k] = "changed"

    def to_df(d):
        return spark.createDataFrame(
            [(k, s, n) for k, (s, n) in d.items()],
            "doc_id bigint, source string, n_chars bigint",
        )

    got = {
        r["doc_id"]: r["change_type"]
        for r in snapshot_diff(
            to_df(old_d), to_df(new_d), ["doc_id"], ["source", "n_chars"]
        ).collect()
    }
    assert got == want
