"""Snapshot diff — change-data capture between two corpus versions.

A recurring job in a training-data pipeline is "crawl N vs crawl N-1:
what was added, what disappeared, what changed?" — the input to
incremental dedup (q81), deletion propagation (q90) and re-embedding
queues. The reference engine has no snapshot machinery (its unit is a
single training matrix, `ReliefFRanking.fit` consumes one DataFrame);
this operator is part of the pipeline surface the port adds around the
selector, like dedup and contamination.

Design (Spark-first):

* ONE full outer join on the key columns. Both sides are pre-projected
  to (keys, row_hash) — the comparison never ships payload columns,
  only a fixed-width digest, so a 100-column 100 TB snapshot diffs at
  the shuffle cost of its key + 32-byte hash projection.
* The row hash is md5 over a ``concat_ws`` of the compared columns
  (deterministic, portable — DuckDB spells the same expression
  verbatim, which is what makes the q116 oracle possible). Callers
  pick the compared columns; volatile ones (fetch timestamps) stay
  out.
* Unchanged rows are dropped BEFORE any downstream consumer, so the
  diff's output size is proportional to the churn, not the corpus.

At scale: the join shuffles both snapshots on the key — unavoidable
for an exact diff — but if snapshots are stored bucketed by key
(sources/write_bucketed, as q81's store is), both sides arrive
co-partitioned and the exchange disappears entirely; the diff becomes
a zip of co-located buckets. AQE handles residual skew (hot keys can't
exist if keys are unique, which snapshot keys are).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change_type values emitted by snapshot_diff
ADDED, REMOVED, CHANGED = "added", "removed", "changed"


def row_digest(cols: Sequence[str]) -> F.Column:
    """md5 digest of the compared columns, null-safe and portable.

    ``concat_ws`` skips NULLs, which would make ('a', NULL) collide
    with (NULL, 'a'); coalescing each column to a sentinel first keeps
    the digest injective on the separator-free domain. DuckDB spells
    the identical expression: ``md5(concat_ws('|', coalesce(CAST(c AS
    VARCHAR), chr(1)), ...))``.
    """
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols
    ]
    return F.md5(F.concat_ws("|", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str],
) -> DataFrame:
    """Diff two snapshots by key: one row per added / removed /
    changed key, with both sides' digests. Unchanged keys are
    filtered out before the result is consumed.

    Returns columns: keys..., change_type, old_digest, new_digest.
    """
    keys, compare = list(keys), list(compare)
    o = old.select(*keys, row_digest(compare).alias("old_digest"))
    n = new.select(*keys, row_digest(compare).alias("new_digest"))
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit(ADDED))
        .when(F.col("new_digest").isNull(), F.lit(REMOVED))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit(CHANGED))
    )  # NULL for unchanged -> dropped by the filter below
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type", "old_digest", "new_digest")
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Churn report: count per change_type (the operational metric a
    pipeline alerts on — a crawl that 'changed' 40% of its keys is a
    parser regression, not news)."""
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
