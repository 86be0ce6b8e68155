"""Data-quality queries: constraint audit, winsorization, skew
profiling, incremental aggregate maintenance (q127-q130).

The continuous-operation surface of the pipeline: what runs on every
ingest batch (audit), before every metric export (winsorize), before
every big join (skew profile), and nightly over corpus aggregates
(incremental maintenance). All in `operators/quality.py`, all
DuckDB-oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.queries import register
from spark_relieffc_fselection_spark.queries.trainprep_q import (
    _SNAP_DELTA,
    _SNAP_NEW,
    _SNAP_OLD,
)
from spark_relieffc_fselection_spark.sources import load_table

DEC = "decimal(38,18)"

#: q127 audit rules over `orders` (numbers chosen so the report has
#: both zero and non-zero rows: 'P' status and >300k prices exist).
AUDIT_PRICE_HI = 300000.0
AUDIT_STATUSES = ("O", "F")

#: q130 incremental cutoff: history < CUTOFF <= delta.
INC_CUTOFF = "2024-01-15 00:00:00"


@register(
    "q127_constraint_audit",
    oracle=f"""
    SELECT 'not_null(o_custkey)' AS rule,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'range(o_totalprice)',
           CAST(SUM(CASE WHEN o_totalprice < 0
                         OR o_totalprice > {AUDIT_PRICE_HI}
                         OR o_totalprice IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'accepted(o_orderstatus)',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN {AUDIT_STATUSES!r}
                         OR o_orderstatus IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(COALESCE((SELECT SUM(n) FROM (
             SELECT COUNT(*) AS n FROM orders
             GROUP BY o_orderkey HAVING COUNT(*) > 1)), 0) AS BIGINT)
    UNION ALL
    SELECT 'ref(o_custkey)',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE o_custkey IS NOT NULL AND NOT EXISTS (
              SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    """,
    doc="Deequ-style constraint audit over an ingest batch "
        "(operators/quality.constraint_report): ALL row-local rules "
        "(not_null / range / accepted-values) fold into ONE scan of "
        "conditional sums; uniqueness is one keyed groupBy; "
        "referential integrity is one broadcast anti join against the "
        "deduplicated dimension keys. k rules never cost k passes. "
        "The report mixes zero rows (key integrity holds) with "
        "non-zero rows ('P' statuses, >300k prices) so both outcomes "
        "are exercised.",
)
def q127_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators import quality as Q

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return Q.constraint_report(
        orders,
        [
            Q.not_null("o_custkey"),
            Q.in_range("o_totalprice", 0.0, AUDIT_PRICE_HI),
            Q.accepted("o_orderstatus", AUDIT_STATUSES),
            Q.unique("o_orderkey"),
            Q.ref_integrity("o_custkey", customer, "c_custkey"),
        ],
    )


@register(
    "q128_winsorize",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont("value", 0.05) AS lo,
             quantile_cont("value", 0.95) AS hi
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           ROUND(e."value", 6) AS value,
           ROUND(LEAST(GREATEST(e."value", b.lo), b.hi), 6)
             AS value_clipped
    FROM events e JOIN b USING (event_type)
    """,
    doc="Per-group winsorization at [p05, p95] "
        "(operators/quality.winsorize): metrics saturate at their "
        "group's own tail quantiles instead of being dropped (biases "
        "counts) or kept (tails dominate sums). Exact percentile for "
        "DuckDB quantile_cont parity; exact=False swaps in the "
        "mergeable approx sketch at 100 TB. Bounds broadcast back — "
        "the fact table never re-shuffles.",
)
def q128_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import winsorize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    out = winsorize(ev, "event_type", "value", p_lo=0.05, p_hi=0.95)
    return out.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round("value_clipped", 6).alias("value_clipped"),
    )


@register(
    "q129_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT l_suppkey AS key, COUNT(*) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(n_rows) AS total FROM counts)
    SELECT key, n_rows,
           ROUND(n_rows / (SELECT total FROM tot), 6) AS share,
           rank
    FROM (
      SELECT key, n_rows,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, key ASC) AS rank
      FROM counts
    ) WHERE rank <= 10
    """,
    doc="Join-key skew profile (operators/quality.skew_profile): "
        "top-10 heaviest keys with load share — the detector that "
        "picks plain vs AQE-skew-split vs salted (q115) join. One "
        "keyed groupBy + bounded rank + broadcast 1-row total; never "
        "a global sort of the full key histogram.",
)
def q129_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import skew_profile

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    return skew_profile(li, "l_suppkey", top_n=10)


@register(
    "q130_incremental_agg",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST("value" AS DECIMAL(38,18))) AS DOUBLE), 6)
             AS sum_value
    FROM events GROUP BY 1
    """,
    doc="Incremental aggregate maintenance "
        "(operators/quality.merge_aggregates): yesterday's stored "
        "(count, decimal-sum) state + the new batch's partial state "
        "merge by union + one aggregate-sized re-aggregation — the "
        "history fact table is NEVER rescanned. Decimal sums add "
        "exactly, so a chain of daily increments equals the full "
        "recompute bit-for-bit — which is precisely what this oracle "
        "checks (Spark runs store+delta merge; DuckDB recomputes from "
        f"scratch). Simulated split at {INC_CUTOFF}.",
)
def q130_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import (
        keyed_partial_agg,
        merge_aggregates,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    cutoff = F.lit(INC_CUTOFF).cast("timestamp")
    stored = keyed_partial_agg(
        ev.filter(F.col("ts") < cutoff),
        ["user_id"],
        sum_specs={"sum_value": "value"},
    )
    delta = keyed_partial_agg(
        ev.filter(F.col("ts") >= cutoff),
        ["user_id"],
        sum_specs={"sum_value": "value"},
    )
    merged = merge_aggregates(
        stored, delta, ["user_id"], sum_cols=["sum_value"]
    )
    return merged.select(
        "user_id",
        "n_rows",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
    )


@register(
    "q131_streaming_incremental_agg",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST("value" AS DECIMAL(38,18))) AS DOUBLE), 6)
             AS sum_value
    FROM events GROUP BY 1
    """,
    doc="The production form of q130: the DELTA side arrives as a "
        "stream (file-source micro-batches), aggregates to per-key "
        "(count, decimal-sum) partial state in complete mode, and the "
        "drained sink merges with the stored historical aggregate via "
        "the same merge_aggregates — history never rescanned, decimal "
        "sums exact across the stream/batch boundary, so streamed "
        "increments == full recompute bit-for-bit (this oracle). "
        "Stream-side filter keeps only post-cutoff events; the "
        "watermark-free complete-mode agg is correct because the sink "
        "drains availableNow.",
)
def q131_streaming_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import (
        keyed_partial_agg,
        merge_aggregates,
    )
    from spark_relieffc_fselection_spark.queries.events_q import (
        _SINK_SEQ,
        _staged_events_dir,
        _stream_conf,
    )
    from spark_relieffc_fselection_spark.streaming.windows import (
        read_events_stream,
        run_to_memory_sink,
    )

    cutoff = F.lit(INC_CUTOFF).cast("timestamp")
    stream = read_events_stream(spark, _staged_events_dir(spark, sf_dir))
    delta_stream = (
        stream.filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("value").cast(DEC)).cast(DEC).alias("sum_value"),
        )
    )
    _SINK_SEQ[0] += 1
    with _stream_conf(spark):
        delta = run_to_memory_sink(
            delta_stream,
            f"q131_sink_{_SINK_SEQ[0]}",
            output_mode="complete",
        )

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    stored = keyed_partial_agg(
        ev.filter(F.col("ts") < cutoff),
        ["user_id"],
        sum_specs={"sum_value": "value"},
    )
    merged = merge_aggregates(stored, delta, ["user_id"], sum_cols=["sum_value"])
    return merged.select(
        "user_id",
        "n_rows",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
    )


#: q137 compaction target (bytes, n_chars as the size proxy).
COMPACT_TARGET = 250_000


@register(
    "q136_ks_drift",
    oracle=f"""
    WITH o AS (
      SELECT n_chars AS v FROM documents
      WHERE {_SNAP_OLD}
    ),
    n AS (
      SELECT n_chars + {_SNAP_DELTA} AS v FROM documents
      WHERE {_SNAP_NEW}
    ),
    u AS (
      SELECT v, 1 AS o_, 0 AS n_ FROM o
      UNION ALL SELECT v, 0, 1 FROM n
    ),
    h AS (SELECT v, SUM(o_) AS no, SUM(n_) AS nn FROM u GROUP BY 1),
    t AS (
      SELECT CAST(SUM(no) AS BIGINT) AS tot_o,
             CAST(SUM(nn) AS BIGINT) AS tot_n
      FROM h
    ),
    c AS (
      SELECT v, SUM(no) OVER (ORDER BY v) AS co,
             SUM(nn) OVER (ORDER BY v) AS cn
      FROM h
    )
    SELECT ROUND(MAX(ABS(co / (SELECT tot_o FROM t)
                         - cn / (SELECT tot_n FROM t))), 6) AS ks_stat,
           (SELECT tot_o FROM t) AS n_old,
           (SELECT tot_n FROM t) AS n_new
    FROM c
    """,
    doc="Two-sample Kolmogorov-Smirnov drift between crawl N-1 and "
        "crawl N n_chars distributions (q116's snapshot simulation) — "
        "the sup-norm companion of q134's binned PSI: KS is the "
        "distance a drift alarm thresholds on, PSI localizes where "
        "the mass moved. operators/quality.ks_statistic computes the "
        "ECDFs with a two-level bucketed prefix sum (distinct-value "
        "histogram -> approx-quantile buckets -> driver prefix "
        "offsets -> per-bucket cumulative windows): NO global "
        "single-partition window ever sees the full value domain, "
        "unlike the oracle's flat SUM() OVER (ORDER BY v).",
)
def q136_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import ks_statistic
    from spark_relieffc_fselection_spark.queries.trainprep_q import (
        _SNAP_DELTA,
        _SNAP_NEW,
        _SNAP_OLD,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    old = docs.filter(F.expr(_SNAP_OLD)).select(
        F.col("n_chars").alias("v"), F.lit("o").alias("side")
    )
    new = docs.filter(F.expr(_SNAP_NEW)).select(
        F.expr(f"n_chars + {_SNAP_DELTA}").alias("v"),
        F.lit("n").alias("side"),
    )
    u = old.unionByName(new)
    return ks_statistic(
        u, "v", F.col("side") == "o", F.col("side") == "n"
    )


@register(
    "q137_compaction_plan",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_fragments,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
           GREATEST(1, CAST(CEIL(SUM(n_chars) / {COMPACT_TARGET}.0)
                            AS BIGINT)) AS target_files,
           ROUND(COUNT(*) / GREATEST(1, CAST(CEIL(SUM(n_chars)
                 / {COMPACT_TARGET}.0) AS BIGINT)), 6) AS merge_factor
    FROM documents GROUP BY 1
    """,
    doc="Small-files compaction plan per source partition "
        "(operators/quality.compaction_plan): fragment count, total "
        "bytes (n_chars as the size proxy — the real deployment reads "
        "file-listing metadata), target file count at a "
        f"{COMPACT_TARGET}-byte target, merge factor. THE operational "
        "disease of a 100 TB lakehouse is a partition of 50k tiny "
        "files paying 50k task setups per scan; this one-groupBy "
        "report (output = partition-cardinality-sized) is the "
        "planning query its periodic compactor runs.",
)
def q137_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import (
        compaction_plan,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    out = compaction_plan(
        docs, "source", "n_chars", target_bytes=COMPACT_TARGET
    )
    return out.withColumnRenamed("grp", "source")


@register(
    "q138_join_cardinality",
    oracle="""
    WITH h AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1)
    SELECT CAST(SUM(n * n) AS BIGINT) AS est_rows,
           CAST(COUNT(*) AS BIGINT) AS n_shared_keys,
           CAST(MAX(n * n) AS BIGINT) AS max_key_rows
    FROM h
    """,
    doc="Pre-shuffle join-cardinality estimate for the events "
        "user_id self-join (the candidate-pair blow-up question every "
        "blocking-key dedup asks before it runs): exact output rows "
        "sum(n*n), shared-key count, and the worst key's n*n — the "
        "skew term that picks plain vs AQE-split vs salted (q115). "
        "operators/quality.join_size_estimate self-join path: ONE "
        "corpus scan + a 1-row aggregate (the generic two-table path "
        "would alias the same subtree twice and Spark would scan "
        "twice — SCALE.md); plan-pinned to a single FileScan.",
)
def q138_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import (
        join_size_estimate,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    return join_size_estimate(ev, "user_id", ev, "user_id")


#: q140 shares q134's histogram bin width.
PSI_BIN_W = 500


@register(
    "q140_streaming_psi_drift",
    oracle=f"""
    WITH o AS (
      SELECT n_chars // {PSI_BIN_W} AS bin, COUNT(*) AS n_old
      FROM documents WHERE {_SNAP_OLD} GROUP BY 1
    ),
    n AS (
      SELECT (n_chars + {_SNAP_DELTA}) // {PSI_BIN_W} AS bin,
             COUNT(*) AS n_new
      FROM documents WHERE {_SNAP_NEW} GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(o.bin, n.bin) AS bin,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      FROM o FULL OUTER JOIN n ON o.bin = n.bin
    ),
    s AS (
      SELECT CAST(SUM(n_old) AS BIGINT) AS tot_o,
             CAST(SUM(n_new) AS BIGINT) AS tot_n,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM j
    )
    SELECT bin, CAST(n_old AS BIGINT) AS n_old,
           CAST(n_new AS BIGINT) AS n_new,
           ROUND(((n_old + 1) / (tot_o + nb) - (n_new + 1) / (tot_n + nb))
                 * ln(((n_old + 1) / (tot_o + nb))
                      / ((n_new + 1) / (tot_n + nb))), 6) AS psi_term
    FROM j CROSS JOIN s
    """,
    doc="The production form of q134: the NEW-crawl side arrives as a "
        "Structured-Streaming file stream; each micro-batch folds into "
        "a bin-cardinality-sized complete-mode histogram (the only "
        "streaming state — never row-level), the availableNow sink "
        "drains it, and the same operators/quality.psi_report compares "
        "it against the batch reference histogram of crawl N-1. "
        "Event-order-independent by construction (histogram adds "
        "commute), so stream == batch and q134's oracle applies "
        "verbatim — the drift monitor a 100 TB ingest runs "
        "continuously without ever rescanning the reference.",
)
def q140_streaming_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import psi_report
    from spark_relieffc_fselection_spark.queries.events_q import (
        _SINK_SEQ,
        _staged_table_dir,
        _stream_conf,
    )
    from spark_relieffc_fselection_spark.streaming.windows import (
        read_parquet_stream,
        run_to_memory_sink,
    )

    stream = read_parquet_stream(
        spark, _staged_table_dir(spark, sf_dir, "documents")
    )
    new_hist_stream = (
        stream.filter(F.expr(_SNAP_NEW))
        .select(
            F.expr(f"(n_chars + {_SNAP_DELTA}) div {PSI_BIN_W}").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n_new"))
    )
    _SINK_SEQ[0] += 1
    with _stream_conf(spark):
        new_hist = run_to_memory_sink(
            new_hist_stream,
            f"q140_sink_{_SINK_SEQ[0]}",
            output_mode="complete",
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    old_hist = (
        docs.filter(F.expr(_SNAP_OLD))
        .select(F.expr(f"n_chars div {PSI_BIN_W}").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_old"))
    )
    return psi_report(old_hist, new_hist)


#: q141 anonymity thresholds.
K_ANON, L_DIV = 10, 2


@register(
    "q141_k_anonymity",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sensitive,
           COUNT(*) < {K_ANON} AS k_risk,
           COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
             < {L_DIV} AS l_risk
    FROM customer GROUP BY 1, 2
    HAVING COUNT(*) < {K_ANON}
        OR COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
             < {L_DIV}
    """,
    doc="Privacy audit before a table leaves the pipeline "
        "(operators/quality.k_anonymity_report): quasi-identifier "
        "combos (nation x market segment) smaller than k=10 rows "
        "(k-anonymity) or where the sensitive attribute (account in "
        "debt) takes < 2 distinct values (l-diversity — a large group "
        "is still leaky if everyone in it shares the secret). One "
        "groupBy on the QI columns + a conditional distinct count; "
        "the report is QI-domain-sized at any fact scale.",
)
def q141_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import (
        k_anonymity_report,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    return k_anonymity_report(
        cust,
        ["c_nationkey", "c_mktsegment"],
        k=K_ANON,
        sensitive=F.when(F.col("c_acctbal") < 0, 1).otherwise(0),
        l=L_DIV,
    )


_EVOLVED: dict[tuple[str, str], str] = {}
import atexit as _atexit
import threading as _threading

_EVOLVED_LOCK = _threading.Lock()
_EVOLVED_DIRS: list[str] = []


@_atexit.register
def _cleanup_evolved_dirs() -> None:
    import shutil

    with _EVOLVED_LOCK:
        for d in _EVOLVED_DIRS:
            shutil.rmtree(d, ignore_errors=True)
        _EVOLVED_DIRS.clear()


def _evolved_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage a two-epoch parquet directory once per (session, sf):
    epoch-0 rows (even doc_id) written WITHOUT the lang column —
    the column arrives in epoch 1 (odd doc_id). Lock-guarded."""
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    with _EVOLVED_LOCK:
        if key not in _EVOLVED:
            base = tempfile.mkdtemp(prefix="q146_evolved_")
            _EVOLVED_DIRS.append(base)
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "n_chars", "lang"
            )
            docs.filter(F.col("doc_id") % 2 == 0).drop("lang").write.parquet(
                f"{base}/epoch=0"
            )
            docs.filter(F.col("doc_id") % 2 == 1).write.parquet(
                f"{base}/epoch=1"
            )
            _EVOLVED[key] = base
    return _EVOLVED[key]


@register(
    "q146_schema_evolution",
    oracle="""
    WITH merged AS (
      SELECT doc_id, n_chars, NULL AS lang FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, n_chars, lang FROM documents WHERE doc_id % 2 = 1
    )
    SELECT COALESCE(lang, '<pre-schema>') AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM merged GROUP BY 1
    """,
    doc="Schema-evolution read (sources/read_parquet_merged): a "
        "two-epoch directory where the lang column only exists in "
        "epoch 1; mergeSchema unions the footers so epoch-0 rows "
        "surface lang as NULL instead of failing the scan — the "
        "add-a-column ingest upgrade every long-lived 100 TB table "
        "goes through. The aggregate buckets the pre-schema rows "
        "under '<pre-schema>' to prove NULL-surfacing (not row loss); "
        "the oracle simulates the same two epochs with a NULL-typed "
        "union.",
)
def q146_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.sources import read_parquet_merged

    merged = read_parquet_merged(spark, _evolved_dir(spark, sf_dir))
    return (
        merged.groupBy(
            F.coalesce(F.col("lang"), F.lit("<pre-schema>")).alias("lang")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@register(
    "q147_rollup_cascade",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket_s,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST("value" AS DECIMAL(38,18))) AS DOUBLE), 6)
             AS sum_value,
           MIN("value") AS min_value,
           MAX("value") AS max_value,
           ROUND(CAST(SUM(CAST("value" AS DECIMAL(38,18))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc="Hypertable-style continuous-aggregate cascade "
        "(operators/quality.time_rollup): the DAILY rollup is computed "
        "FROM THE HOURLY rollup, not from the fact table — "
        "count/decimal-sum/min/max are mergeable, so the cascade "
        "equals the from-raw aggregate bit-for-bit, which is exactly "
        "what this oracle checks (DuckDB aggregates raw events; Spark "
        "runs raw->hour->day). At 100 TB the daily job reads a "
        "3600x-smaller input, and each level maintains incrementally "
        "with q130's merge_aggregates. avg derives at read time as "
        "sum/count (non-mergeable aggregates are never stored).",
)
def q147_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.quality import time_rollup

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts"
    )
    hourly = time_rollup(ev, "ts", 3600, ["event_type"], "value")
    daily = time_rollup(
        hourly, "ts", 86400, ["event_type"], "value", from_rollup=True
    )
    return daily.select(
        "bucket_s",
        "event_type",
        "n_rows",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        "min_value",
        "max_value",
        F.round(
            (F.col("sum_value").cast("double") / F.col("n_rows")), 6
        ).alias("avg_value"),
    )


#: q148 KMV sketch size.
KMV_K = 64
_U = ("(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 4, 6))::BIGINT"
      " + 0.5) / 16777216.0")


@register(
    "q148_kmv_distinct",
    oracle=f"""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    pu AS (SELECT event_type, {_U} AS u FROM pairs),
    sk AS (
      SELECT event_type, u,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn
      FROM pu
    ),
    skk AS (SELECT event_type, u FROM sk WHERE rn <= {KMV_K}),
    pte AS (
      SELECT event_type, COUNT(*) AS n, MAX(u) AS theta
      FROM skk GROUP BY 1
    ),
    ptx AS (SELECT event_type, COUNT(*) AS ex FROM pairs GROUP BY 1),
    allsk AS (
      SELECT u FROM (SELECT DISTINCT u FROM skk) ORDER BY u LIMIT {KMV_K}
    ),
    alle AS (SELECT COUNT(*) AS n, MAX(u) AS theta FROM allsk),
    allx AS (SELECT COUNT(DISTINCT user_id) AS ex FROM events)
    SELECT event_type AS scope,
           ROUND(CASE WHEN n < {KMV_K} THEN CAST(n AS DOUBLE)
                      ELSE {KMV_K - 1}.0 / theta END, 6) AS est_distinct,
           CAST(ex AS BIGINT) AS exact_distinct
    FROM pte JOIN ptx USING (event_type)
    UNION ALL
    SELECT 'ALL',
           ROUND(CASE WHEN n < {KMV_K} THEN CAST(n AS DOUBLE)
                      ELSE {KMV_K - 1}.0 / theta END, 6),
           CAST(ex AS BIGINT)
    FROM alle CROSS JOIN allx
    """,
    doc="K-minimum-values distinct sketch per event type + a merged "
        "ALL estimate (operators/textstats.kmv_sketch/_merge/"
        "_estimate): unlike approx_count_distinct's opaque in-flight "
        "HLL (q51), the KMV sketch is DATA — k stored rows per scope "
        "that union with tomorrow's sketch and re-estimate without "
        "rescanning history; the ALL row is computed FROM the "
        "per-type sketches (bottom-k of a union of bottom-ks == "
        "bottom-k of the union), proving merge == rebuild. Uniforms "
        "are the repo's portable md5 hash, so estimates are "
        "deterministic and engine-exact (no approximation oracle gap "
        "— the oracle reproduces the estimate bit-for-bit). One "
        "distinct exchange + localCheckpoint feeds sketches and "
        "exact counts without re-scanning.",
)
def q148_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.sampling import (
        hash_uniform,
    )

    ev = load_table(spark, sf_dir, "events")
    pairs = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn("u", hash_uniform(F.col("user_id")))
        .localCheckpoint()
    )
    w = Window.partitionBy("event_type").orderBy("u")
    skk = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "u")
        .localCheckpoint()
    )
    est = F.when(
        F.col("n") < KMV_K, F.col("n").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) / F.col("theta"))
    per_type = (
        skk.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("u").alias("theta"))
        .join(
            pairs.groupBy("event_type").agg(F.count("*").alias("ex")),
            "event_type",
        )
        .select(
            F.col("event_type").alias("scope"),
            F.round(est, 6).alias("est_distinct"),
            F.col("ex").cast("bigint").alias("exact_distinct"),
        )
    )
    all_sk = skk.select("u").distinct().orderBy("u").limit(KMV_K)
    all_row = (
        all_sk.agg(F.count("*").alias("n"), F.max("u").alias("theta"))
        .crossJoin(
            pairs.agg(
                F.countDistinct("user_id").cast("bigint").alias("ex")
            )
        )
        .select(
            F.lit("ALL").alias("scope"),
            F.round(est, 6).alias("est_distinct"),
            F.col("ex").alias("exact_distinct"),
        )
    )
    return per_type.unionByName(all_row)


@register(
    "q154_streaming_upsert_state",
    oracle="""
    SELECT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS last_ts_s,
           event_id AS last_event_id,
           ROUND("value", 6) AS last_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Streaming latest-state materialization (the compacted-topic "
        "upsert view): the post-cutoff event stream folds to per-key "
        "latest-(ts, event_id) state with a partial-aggregatable "
        "max_by in complete mode, drained via availableNow, then "
        "merges with the STORED pre-cutoff latest state by the same "
        "(ts, event_id) ordering — the stored side is never rescanned "
        "and streamed-then-merged equals one batch pass over all "
        "events bit-for-bit (this oracle). The per-key state is one "
        "struct regardless of event volume — the O(keys) streaming "
        "state bound that makes the upsert view viable at 100 TB/day "
        "ingest; ties break by event_id, mirroring q132's asof "
        "discipline.",
)
def q154_streaming_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.queries.events_q import (
        _SINK_SEQ,
        _staged_events_dir,
        _stream_conf,
    )
    from spark_relieffc_fselection_spark.streaming.windows import (
        read_events_stream,
        run_to_memory_sink,
    )

    cutoff = F.lit(INC_CUTOFF).cast("timestamp")
    pick = F.max_by(
        F.struct(
            F.unix_timestamp("ts").alias("ts_s"),
            F.col("event_id").alias("eid"),
            F.col("value").alias("v"),
        ),
        F.struct(F.col("ts"), F.col("event_id")),
    ).alias("best")

    stream = read_events_stream(spark, _staged_events_dir(spark, sf_dir))
    delta_stream = (
        stream.filter(F.col("ts") >= cutoff).groupBy("user_id").agg(pick)
    )
    _SINK_SEQ[0] += 1
    with _stream_conf(spark):
        delta = run_to_memory_sink(
            delta_stream,
            f"q154_sink_{_SINK_SEQ[0]}",
            output_mode="complete",
        )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    stored = ev.filter(F.col("ts") < cutoff).groupBy("user_id").agg(pick)
    j = stored.withColumnRenamed("best", "b_old").join(
        delta.withColumnRenamed("best", "b_new"), "user_id", "full_outer"
    )
    best = F.when(
        F.col("b_new").isNull(), F.col("b_old")
    ).when(
        F.col("b_old").isNull(), F.col("b_new")
    ).when(
        # struct comparison is lexicographic on (ts_s, eid) — the
        # merge applies the SAME ordering the two sides used
        F.struct(F.col("b_new.ts_s"), F.col("b_new.eid"))
        > F.struct(F.col("b_old.ts_s"), F.col("b_old.eid")),
        F.col("b_new"),
    ).otherwise(F.col("b_old"))
    return j.select(
        "user_id",
        best.getField("ts_s").alias("last_ts_s"),
        best.getField("eid").alias("last_event_id"),
        F.round(best.getField("v"), 6).alias("last_value"),
    )
