"""Data-quality operators: constraint audits, winsorization, skew
profiling, incremental aggregate maintenance.

A 100 TB training-data pipeline runs these continuously: every ingest
batch gets a constraint audit (Deequ-style) before it may join the
corpus, metrics get robust-clipped before they feed reward models,
hot join keys get profiled before they melt a shuffle, and the
corpus-level aggregates that drive mixture weights are maintained
incrementally — the history is never rescanned.

All pure Catalyst; the audit folds every row-local constraint into a
single scan pass.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(38,18)"


# ------------------------------------------------------------ constraints
@dataclass(frozen=True)
class Constraint:
    """One audit rule. ``kind`` in {not_null, range, accepted, unique,
    ref}; row-local kinds (not_null/range/accepted) share one scan."""

    kind: str
    name: str
    col: str = ""
    cols: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    ref: DataFrame | None = field(default=None, compare=False)
    ref_col: str = ""


def not_null(col: str) -> Constraint:
    return Constraint("not_null", f"not_null({col})", col=col)


def in_range(col: str, lo: float | None, hi: float | None) -> Constraint:
    return Constraint("range", f"range({col})", col=col, lo=lo, hi=hi)


def accepted(col: str, values: Sequence) -> Constraint:
    return Constraint(
        "accepted", f"accepted({col})", col=col, values=tuple(values)
    )


def unique(*cols: str) -> Constraint:
    return Constraint(
        "unique", f"unique({','.join(cols)})", cols=tuple(cols)
    )


def ref_integrity(col: str, ref: DataFrame, ref_col: str) -> Constraint:
    return Constraint(
        "ref", f"ref({col})", col=col, ref=ref, ref_col=ref_col
    )


def constraint_report(df: DataFrame, constraints: Sequence[Constraint]) -> DataFrame:
    """Violation counts per constraint: ``(rule, violations)``.

    Pass structure (the scale contract):

    * ALL row-local constraints (not_null, range, accepted) fold into
      ONE scan as conditional sums — k rules cost one pass, not k.
    * Each ``unique`` rule is one groupBy on its key set counting
      rows in groups of size > 1.
    * Each ``ref`` rule is one anti join against the (deduplicated)
      reference keys — broadcast when the dimension is small, which
      is the usual case for referential targets.

    Results union into one tiny report frame.
    """
    row_local = [c for c in constraints if c.kind in ("not_null", "range", "accepted")]
    parts: list[DataFrame] = []

    if row_local:
        aggs = []
        for c in row_local:
            if c.kind == "not_null":
                bad = F.col(c.col).isNull()
            elif c.kind == "range":
                bad = F.lit(False)
                if c.lo is not None:
                    bad = bad | (F.col(c.col) < c.lo)
                if c.hi is not None:
                    bad = bad | (F.col(c.col) > c.hi)
                bad = bad | F.col(c.col).isNull()
            else:  # accepted
                bad = ~F.col(c.col).isin(*c.values) | F.col(c.col).isNull()
            aggs.append(
                F.sum(F.when(bad, 1).otherwise(0)).alias(c.name)
            )
        one = df.agg(*aggs)
        stack = ", ".join(
            f"'{c.name}', `{c.name}`" for c in row_local
        )
        parts.append(
            one.selectExpr(
                f"stack({len(row_local)}, {stack}) as (rule, violations)"
            )
        )

    for c in constraints:
        if c.kind == "unique":
            dup = (
                df.groupBy(*c.cols)
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(
                    F.coalesce(F.sum("_n"), F.lit(0)).alias("violations")
                )
                .select(F.lit(c.name).alias("rule"), "violations")
            )
            parts.append(dup)
        elif c.kind == "ref":
            assert c.ref is not None
            missing = (
                df.select(F.col(c.col).alias("_k"))
                .filter(F.col("_k").isNotNull())
                .join(
                    F.broadcast(
                        c.ref.select(
                            F.col(c.ref_col).alias("_k")
                        ).distinct()
                    ),
                    "_k",
                    "left_anti",
                )
                .agg(F.count("*").alias("violations"))
                .select(F.lit(c.name).alias("rule"), "violations")
            )
            parts.append(missing)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------------------- winsorize
def winsorize(
    df: DataFrame,
    group: str,
    value: str,
    *,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    exact: bool = True,
) -> DataFrame:
    """Clip ``value`` to the per-group [p_lo, p_hi] percentiles.

    The standard robust pre-scaling step before a metric feeds a
    model: outliers saturate at the group's own tail quantiles
    instead of being dropped (dropping biases counts) or kept (heavy
    tails dominate sums). One percentile aggregation per group
    (exact for oracle parity; ``exact=False`` for the mergeable
    approx sketch at scale) broadcast back — the fact table never
    re-shuffles. Adds ``{value}_clipped``; all other columns pass
    through.
    """
    pct = "percentile" if exact else "approx_percentile"
    bounds = df.groupBy(group).agg(
        F.expr(f"{pct}({value}, {p_lo!r})").alias("_lo"),
        F.expr(f"{pct}({value}, {p_hi!r})").alias("_hi"),
    )
    return (
        df.join(F.broadcast(bounds), group)
        .withColumn(
            f"{value}_clipped",
            F.least(F.greatest(F.col(value), F.col("_lo")), F.col("_hi")),
        )
        .drop("_lo", "_hi")
    )


# ---------------------------------------------------------- skew profile
def skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Heaviest join keys with their load share — the detector that
    decides between a plain, AQE-skew-split, or salted (q115) join.

    One groupBy on the key, then a bounded ``limit(top_n)`` — which
    Catalyst plans as TakeOrderedAndProject (distributed per-partition
    top-n, merged on the driver), NEVER a single-partition window
    sort of the full key histogram (the histogram has one row per
    distinct key: billions at 100 TB). The rank window runs only over
    the ``top_n`` survivors; the share divides by a broadcast 1-row
    total. Returns ``(key, n_rows, share, rank)`` for the top_n keys.

    The histogram feeds TWO consumers (the grand total and the top-n)
    — un-materialized, each would re-run the fact scan + groupBy
    (aliased subtrees never unify; the round-5 dupe-subtree sweep
    flagged exactly this). localCheckpoint materializes it once:
    distinct-key rows at ~16 B each beat a second full fact pass at
    any scale.
    """
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count("*").alias("n_rows")
    ).localCheckpoint()
    total = counts.agg(F.sum("n_rows").alias("_total"))
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_n)
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            "rank",
        )
    )


# ----------------------------------------------- incremental aggregates
def merge_aggregates(
    stored: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    *,
    count_col: str = "n_rows",
    sum_cols: Sequence[str] = (),
) -> DataFrame:
    """Maintain a keyed (count, sums) aggregate incrementally.

    ``stored`` is yesterday's aggregate (one row per key with
    ``count_col`` and decimal ``sum_cols``); ``delta`` is the same
    aggregate computed over just the new batch. The merge is a union
    + one re-aggregation over rows proportional to |stored keys| +
    |delta keys| — the history fact table is NEVER rescanned, which
    is the entire point at 100 TB: the daily cost is the delta scan
    plus an aggregate-sized shuffle. Counts add; decimal sums add
    exactly (no float drift across days, so a year of increments
    equals the full recompute bit-for-bit — the q130 oracle).
    """
    merged = stored.select(
        *keys, count_col, *sum_cols
    ).unionByName(delta.select(*keys, count_col, *sum_cols))
    return merged.groupBy(*keys).agg(
        F.sum(count_col).alias(count_col),
        *[
            F.sum(F.col(c).cast(DEC)).cast(DEC).alias(c)
            for c in sum_cols
        ],
    )


def keyed_partial_agg(
    df: DataFrame,
    keys: Sequence[str],
    *,
    count_col: str = "n_rows",
    sum_specs: dict[str, str] | None = None,
) -> DataFrame:
    """The partial-state shape ``merge_aggregates`` consumes: one row
    per key with a count and exact decimal sums (``sum_specs`` maps
    output name -> source column)."""
    sum_specs = sum_specs or {}
    return df.groupBy(*keys).agg(
        F.count("*").alias(count_col),
        *[
            F.sum(F.col(src).cast(DEC)).cast(DEC).alias(name)
            for name, src in sum_specs.items()
        ],
    )


# ------------------------------------------------------------- KS drift
def ks_statistic(
    df: DataFrame,
    value: str,
    old_pred,
    new_pred,
    *,
    n_buckets: int = 64,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the rows
    matching ``old_pred`` and ``new_pred``: max |ECDF_old - ECDF_new|
    over the observed values of ``value``. The distribution-shape
    companion of the binned PSI (q134): PSI localizes WHERE mass
    moved, KS gives the sup-norm distance a drift alarm thresholds on.

    Scale shape: the ECDFs need cumulative counts in value order — a
    naive global ``Window.orderBy(value)`` funnels every distinct
    value through ONE partition. Instead the same two-level prefix sum
    as budget_select_by_score (textstats.py): (1) one groupBy collapses
    the data to distinct-value rows carrying (n_old, n_new); (2) rows
    bucket by approx-quantile value edges (routing only — any edge set
    yields identical cumulative counts); (3) the per-bucket totals
    (n_buckets rows) collect to the driver, whose prefix sums become
    broadcast offsets; (4) the cumulative window runs PARTITIONED by
    bucket. No single-partition pass ever sees more than one bucket.

    Returns one row: ``(ks_stat, n_old, n_new)``, ks rounded 6.
    """
    hist = (
        df.select(
            F.col(value).alias("_v"),
            F.when(old_pred, 1).otherwise(0).alias("_o"),
            F.when(new_pred, 1).otherwise(0).alias("_n"),
        )
        .filter((F.col("_o") == 1) | (F.col("_n") == 1))
        .groupBy("_v")
        .agg(F.sum("_o").alias("n_old"), F.sum("_n").alias("n_new"))
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    edge_rows = (
        df.filter(old_pred | new_pred)
        .agg(
            F.expr(
                f"percentile_approx({value}, "
                f"array({','.join(repr(p) for p in probs)}), 1000)"
            )
        )
        .first()[0]
        if probs
        else []
    )
    edges = sorted({float(e) for e in (edge_rows or []) if e is not None})
    edges_lit = (
        F.array(*[F.lit(e) for e in edges])
        if edges
        else F.array().cast("array<double>")
    )
    # localCheckpoint: the bucketed histogram feeds two actions (the
    # per-bucket totals collect, then the windowed scan) — without it
    # the caller's subtree would execute twice.
    bucketed = hist.withColumn(
        "_bkt", F.size(F.filter(edges_lit, lambda e: F.col("_v") > e))
    ).localCheckpoint()
    totals = {
        r["_bkt"]: (r["o"], r["n"])
        for r in bucketed.groupBy("_bkt")
        .agg(F.sum("n_old").alias("o"), F.sum("n_new").alias("n"))
        .collect()
    }
    tot_o = sum(o for o, _ in totals.values())
    tot_n_chk = sum(n for _, n in totals.values())
    if tot_o == 0 or tot_n_chk == 0:
        raise ValueError(
            "ks_statistic: a side matched zero rows "
            f"(n_old={tot_o}, n_new={tot_n_chk}) — an ECDF over an "
            "empty sample is undefined; check the predicates"
        )
    tot_n = sum(n for _, n in totals.values())
    off_rows, co, cn = [], 0, 0
    for b in sorted(totals):
        off_rows.append((b, co, cn))
        o, n = totals[b]
        co += o
        cn += n
    offsets = F.broadcast(
        df.sparkSession.createDataFrame(
            off_rows, "_bkt int, _off_o bigint, _off_n bigint"
        )
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf_o = (F.col("_off_o") + F.sum("n_old").over(w)) / F.lit(float(tot_o))
    ecdf_n = (F.col("_off_n") + F.sum("n_new").over(w)) / F.lit(float(tot_n))
    return (
        bucketed.join(offsets, "_bkt")
        .select(F.abs(ecdf_o - ecdf_n).alias("_d"))
        .agg(
            F.round(F.max("_d"), 6).alias("ks_stat"),
            F.lit(int(tot_o)).alias("n_old"),
            F.lit(int(tot_n)).alias("n_new"),
        )
    )


# ------------------------------------------------------- layout planning
def compaction_plan(
    df: DataFrame,
    group: str,
    bytes_col: str,
    *,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction plan: per ``group`` (the partition
    column of a table layout), how many fragments exist, how many
    target-sized files they should compact into, and the merge
    factor. THE operational disease of a 100 TB lakehouse is a
    partition holding 50k 2 MB files — every scan pays 50k task
    setups; the fix is periodic compaction to ``target_bytes`` files,
    and this report is its planning query (one groupBy; output is
    partition-cardinality-sized).
    """
    total = F.sum(F.col(bytes_col).cast("bigint")).alias("total_bytes")
    return (
        df.groupBy(F.col(group).alias("grp"))
        .agg(F.count("*").alias("n_fragments"), total)
        .select(
            "grp",
            "n_fragments",
            "total_bytes",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("total_bytes") / F.lit(float(target_bytes))),
            ).alias("target_files"),
        )
        .withColumn(
            "merge_factor",
            F.round(F.col("n_fragments") / F.col("target_files"), 6),
        )
    )


def join_size_estimate(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
) -> DataFrame:
    """Pre-shuffle join cardinality estimate: exact output row count
    of ``left JOIN right`` on the key, from the two per-key count
    histograms — sum over shared keys of n_left * n_right — plus the
    worst single key's contribution (the skew term that decides
    between plain / AQE-split / salted execution) and the shared-key
    count.

    Run this BEFORE a candidate-pair blow-up (near-dup blocking keys,
    self-joins on user_id): two keyed groupBys + one histogram-sized
    join + a 1-row aggregate — histogram rows are one per distinct
    key, so the estimate costs two scans and never materializes the
    join. The SELF-join case (same frame, same key — the near-dup
    blocking-key question) collapses to ONE scan: sum(n*n) off a
    single histogram, no join (aliased subtrees are never unified by
    ReuseExchange — SCALE.md round 5 — so the generic path would scan
    the corpus twice). Returns
    ``(est_rows, n_shared_keys, max_key_rows)``.
    """
    same = left is right
    if not same and left_key == right_key:
        # Catalyst's canonicalized-plan equality catches two distinct
        # DataFrame objects over the same relation (the common way
        # callers accidentally take the double-scan path).
        try:
            same = bool(
                left._jdf.queryExecution()
                .analyzed()
                .sameResult(right._jdf.queryExecution().analyzed())
            )
        except Exception:
            same = False
    if same and left_key == right_key:
        h = left.groupBy(F.col(left_key).alias("_k")).agg(
            F.count("*").alias("_nl")
        )
        sq = F.col("_nl") * F.col("_nl")
        return h.agg(
            F.sum(sq).alias("est_rows"),
            F.count("*").alias("n_shared_keys"),
            F.max(sq).alias("max_key_rows"),
        )
    hl = left.groupBy(F.col(left_key).alias("_k")).agg(
        F.count("*").alias("_nl")
    )
    hr = right.groupBy(F.col(right_key).alias("_k")).agg(
        F.count("*").alias("_nr")
    )
    prod = F.col("_nl") * F.col("_nr")
    return (
        hl.join(hr, "_k")
        .agg(
            F.sum(prod).alias("est_rows"),
            F.count("*").alias("n_shared_keys"),
            F.max(prod).alias("max_key_rows"),
        )
    )


def psi_report(old_hist: DataFrame, new_hist: DataFrame) -> DataFrame:
    """Per-bin population-stability-index terms from two histograms
    ``(bin, n_old)`` / ``(bin, n_new)``: Laplace-smoothed shares over
    the union of observed bins, ``(p - q) * ln(p / q)`` per bin (sum =
    the PSI drift score; the per-bin rows localize WHERE the
    distribution moved). Bin-cardinality-sized full outer join + a
    broadcast 1-row totals frame — nothing fact-sized shuffles here;
    the fact scans happen where the histograms were aggregated (batch
    groupBy in q134, per-micro-batch streaming agg in q140).
    """
    j = old_hist.join(new_hist, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    s = j.agg(
        F.sum("n_old").alias("tot_o"),
        F.sum("n_new").alias("tot_n"),
        F.count("*").alias("nb"),
    )
    p = (F.col("n_old") + 1) / (F.col("tot_o") + F.col("nb"))
    q = (F.col("n_new") + 1) / (F.col("tot_n") + F.col("nb"))
    return j.crossJoin(F.broadcast(s)).select(
        "bin",
        "n_old",
        "n_new",
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


# --------------------------------------------------------- privacy audit
def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    *,
    k: int,
    sensitive=None,
    l: int | None = None,
) -> DataFrame:
    """Re-identification risk audit before a table leaves the
    pipeline: every quasi-identifier combination whose group is
    smaller than ``k`` (k-anonymity) or whose sensitive attribute
    takes fewer than ``l`` distinct values (l-diversity — a large
    group is still leaky if everyone in it shares the secret).

    One groupBy on the QI columns with a conditional distinct count —
    group cardinality is the QI-domain size, so the report is
    dimension-sized at any fact scale. Returns only the violating
    groups: ``(qi..., n_rows, n_sensitive, k_risk, l_risk)``.
    ``sensitive`` is any Column expression; ``l`` requires it.
    """
    if l is not None and sensitive is None:
        raise ValueError("l-diversity requires a sensitive column")
    aggs = [F.count("*").alias("n_rows")]
    if sensitive is not None:
        aggs.append(F.countDistinct(sensitive).alias("n_sensitive"))
    g = df.groupBy(*qi_cols).agg(*aggs)
    k_risk = F.col("n_rows") < k
    out = g.withColumn("k_risk", k_risk)
    if l is not None:
        out = out.withColumn("l_risk", F.col("n_sensitive") < l)
        return out.filter(k_risk | F.col("l_risk"))
    return out.filter(k_risk)


# ------------------------------------------------------- rollup cascade
def time_rollup(
    df: DataFrame,
    ts_col: str,
    bucket_s: int,
    keys: Sequence[str],
    value: str,
    *,
    from_rollup: bool = False,
) -> DataFrame:
    """One level of a hypertable-style continuous-aggregate cascade:
    ``(bucket_s-aligned epoch, keys..., n_rows, sum_value, min_value,
    max_value)``.

    ``from_rollup=False`` aggregates raw rows (the only fact-sized
    pass). ``from_rollup=True`` re-aggregates a FINER rollup's output
    — count/decimal-sum/min/max are mergeable, so day-from-hour equals
    day-from-raw bit-for-bit (the q147 oracle), and the daily job's
    input is 3600x smaller than the fact table. Non-mergeable reads
    (avg) derive at query time as sum/count. The bucket column is an
    epoch-second BIGINT so alignment is pure integer math.
    """
    if from_rollup:
        b = (F.col("bucket_s") - (F.col("bucket_s") % bucket_s)).alias(
            "bucket_s"
        )
        src = df.select(
            b, *keys, "n_rows", "sum_value", "min_value", "max_value"
        )
        return src.groupBy("bucket_s", *keys).agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_value").cast(DEC).alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    b = (
        F.unix_timestamp(ts_col)
        - (F.unix_timestamp(ts_col) % bucket_s)
    ).alias("bucket_s")
    return df.select(b, *keys, value).groupBy("bucket_s", *keys).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(value).cast(DEC)).cast(DEC).alias("sum_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )
