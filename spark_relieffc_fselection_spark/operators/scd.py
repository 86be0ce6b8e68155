"""Slowly-changing-dimension (type 2) history build.

Training-data pipelines version their metadata dimensions (source
catalogs, license states, domain quality tiers) the same way a
warehouse versions a customer dimension: every change closes the old
row with a ``valid_to`` stamp and opens a new current row. This
builds the SCD2 delta between two snapshot versions, the write-side
companion of :mod:`..operators.snapshot` (which only reports the
diff).

Design (Spark-first):

* ONE full outer join on the keys. Each side pre-projects to keys +
  compared payload + an md5 row digest (``snapshot.row_digest`` — the
  same digest the diff operator and its DuckDB oracle use, so the two
  operators can never disagree about what "changed" means).
* Each joined row then emits 0-2 history rows via an inline
  ``array``-of-struct + ``array_compact`` + ``explode`` — the old
  version (closed out when changed/removed) and the new version
  (opened when added/changed). A union-of-two-selects over the same
  join would run the join twice (ReuseExchange dedupes only the
  exchanges, not the join); the explode emits both rows in a single
  pass.
* Output size is old-side rows + churn, and the only wide exchange is
  the keyed join — which disappears entirely when both snapshots are
  stored bucketed by key (sources/write_bucketed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.snapshot import row_digest


def scd2_delta(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str],
    *,
    v_old: int,
    v_new: int,
) -> DataFrame:
    """SCD2 history rows for the transition ``v_old`` -> ``v_new``.

    Returns one row per (key, version) with the payload columns of
    that version plus ``valid_from`` (int), ``valid_to`` (int, null
    while current) and ``is_current``:

    * unchanged key  -> 1 row: old payload, [v_old, null), current
    * changed key    -> 2 rows: old payload [v_old, v_new) closed +
      new payload [v_new, null) current
    * removed key    -> 1 row: old payload [v_old, v_new) closed
    * added key      -> 1 row: new payload [v_new, null) current
    """
    cols = [*keys, *compare]
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in cols],
        row_digest(compare).alias("_o_dig"),
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in cols],
        row_digest(compare).alias("_n_dig"),
    )
    cond = [o[f"_o_{k}"].eqNullSafe(n[f"_n_{k}"]) for k in keys]
    j = o.join(n, cond, "full_outer")

    in_old = F.col("_o_dig").isNotNull()
    in_new = F.col("_n_dig").isNotNull()
    changed = in_old & in_new & (F.col("_o_dig") != F.col("_n_dig"))

    def version_row(side: str, valid_from: int, valid_to: F.Column):
        return F.struct(
            *[F.col(f"_{side}_{c}").alias(c) for c in cols],
            F.lit(valid_from).alias("valid_from"),
            valid_to.alias("valid_to"),
        )

    old_row = F.when(
        in_old,
        version_row(
            "o",
            v_old,
            F.when(changed | ~in_new, F.lit(v_new)).cast("int"),
        ),
    )
    new_row = F.when(
        changed | (in_new & ~in_old),
        version_row("n", v_new, F.lit(None).cast("int")),
    )
    return (
        j.select(
            F.explode(F.array_compact(F.array(old_row, new_row))).alias("_r")
        )
        .select("_r.*")
        .withColumn("is_current", F.col("valid_to").isNull())
    )
