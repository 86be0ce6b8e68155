"""Warehouse analytics queries: SCD2, hierarchy closure, cohorts,
funnels, skyline, robust outliers, BM25 retrieval, interval merge.

These extend the pipeline surface with the classic warehouse shapes a
training-data platform runs on the same tables (SURVEY.md §2
north-star extensions): dimension versioning for metadata catalogs,
recursive rollups SQL spells WITH RECURSIVE, user-journey analysis
over ``events``, Pareto source selection, robust event hygiene, and
sparse lexical retrieval to pair with the ANN operators.

Same cross-engine determinism conventions as the rest of the
registry: decimal-cast double sums, ROUND(x, 6) on float outputs,
total tiebreaks on every ranking, epoch-second window starts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.queries import register
from spark_relieffc_fselection_spark.sources import load_table

# q119 reuses q116's deterministic snapshot simulation (same crawl
# N-1 / crawl N filters and parser delta) so diff and history build
# can never disagree about what changed.
from spark_relieffc_fselection_spark.queries.trainprep_q import (
    _DIGEST_SQL,
    _SNAP_DELTA,
    _SNAP_NEW,
    _SNAP_OLD,
)

DEC = "decimal(38,18)"

#: BM25 query terms for q125 — mid-frequency corpus vocabulary.
BM25_TERMS = ("spark", "merge", "window")
BM25_K = 20

FUNNEL_STAGES = ("signup", "view", "purchase")


@register(
    "q119_scd2_history",
    oracle=f"""
    WITH o AS (
      SELECT doc_id, source, n_chars,
             {_DIGEST_SQL.format(n='n_chars')} AS dig
      FROM documents WHERE {_SNAP_OLD}
    ),
    n AS (
      SELECT doc_id, source,
             n_chars + {_SNAP_DELTA} AS n_chars,
             {_DIGEST_SQL.format(n=f'n_chars + {_SNAP_DELTA}')} AS dig
      FROM documents WHERE {_SNAP_NEW}
    ),
    j AS (
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             o.source AS o_source, o.n_chars AS o_n, o.dig AS o_dig,
             n.source AS n_source, n.n_chars AS n_n, n.dig AS n_dig
      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    )
    SELECT doc_id, o_source AS source, o_n AS n_chars,
           1 AS valid_from,
           CASE WHEN n_dig IS NULL OR o_dig != n_dig THEN 2 END AS valid_to,
           (n_dig IS NOT NULL AND o_dig = n_dig) AS is_current
    FROM j WHERE o_dig IS NOT NULL
    UNION ALL
    SELECT doc_id, n_source, n_n, 2, NULL, TRUE
    FROM j WHERE n_dig IS NOT NULL AND (o_dig IS NULL OR o_dig != n_dig)
    """,
    doc="SCD type-2 dimension history between two snapshot versions "
        "(operators/scd.py): one full outer join on the key, 0-2 "
        "history rows per key emitted in a single pass via inline "
        "array+explode (a union-of-selects would run the join twice). "
        "Write-side companion of q116's snapshot diff — shares its "
        "row-digest definition. Scale: output = old rows + churn; the "
        "keyed join is the only wide exchange and vanishes for "
        "key-bucketed snapshot storage.",
)
def q119_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.scd import scd2_delta

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    old = docs.filter(F.expr(_SNAP_OLD))
    new = docs.filter(F.expr(_SNAP_NEW)).withColumn(
        "n_chars", F.col("n_chars") + F.expr(_SNAP_DELTA)
    )
    return scd2_delta(
        old, new, keys=["doc_id"], compare=["source", "n_chars"],
        v_old=1, v_new=2,
    )


@register(
    "q120_hierarchy_closure",
    oracle="""
    WITH RECURSIVE climb AS (
      SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
      FROM customer
      UNION ALL
      SELECT node, cur // 10, depth + 1 FROM climb WHERE cur >= 10
    )
    SELECT node AS c_custkey, cur AS root_key, CAST(depth AS INT) AS depth
    FROM climb WHERE cur < 10
    """,
    doc="Transitive closure to root over a synthetic decimal-digit "
        "hierarchy (parent = c_custkey div 10, roots = keys < 10) by "
        "pointer doubling (operators/graph.py): ceil(log2 depth) "
        "self-joins of the (node, ancestor, depth) map instead of "
        "depth sequential hops, localCheckpoint per round keeping the "
        "plan O(1). Spark 4 executes WITH RECURSIVE natively (q155 "
        "pins that surface) but its plan is one join per LEVEL — "
        "pointer doubling stays the scale path: a depth-20 hierarchy "
        "at 10^10 nodes closes in 5 rounds.",
)
def q120_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.graph import closure_to_root

    cust = load_table(spark, sf_dir, "customer")
    nodes = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") < 10, F.lit(None).cast("bigint"))
        .otherwise(F.expr("c_custkey div 10"))
        .alias("parent"),
    )
    out = closure_to_root(nodes, "c_custkey", "parent")
    return out.select(
        F.col("node").alias("c_custkey"),
        F.col("root").alias("root_key"),
        F.col("depth").cast("int").alias("depth"),
    )


@register(
    "q121_cohort_retention",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id AS u,
             CAST(floor(epoch(ts) / 604800) * 604800 AS BIGINT) AS b
      FROM events
    ),
    firstb AS (SELECT u, MIN(b) AS cohort FROM active GROUP BY u)
    SELECT cohort AS cohort_week_s,
           CAST((b - cohort) / 604800 AS INT) AS week_offset,
           COUNT(*) AS n_users
    FROM active JOIN firstb USING (u)
    GROUP BY 1, 2
    """,
    doc="Weekly cohort retention matrix over event time "
        "(operators/analytics.cohort_retention): cohort = bucket of "
        "first activity, cell = users active k buckets later. Two "
        "user-keyed aggregations + one co-partitioned join; buckets as "
        "epoch seconds. Scale: everything hashes on user_id, the "
        "retention matrix itself is weeks^2-sized.",
)
def q121_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.analytics import (
        cohort_retention,
    )

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts")


@register(
    "q122_event_funnel",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > s1.t GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > s2.t GROUP BY 1
    )
    SELECT 1 AS stage_idx, '{FUNNEL_STAGES[0]}' AS stage,
           (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, '{FUNNEL_STAGES[1]}', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, '{FUNNEL_STAGES[2]}', (SELECT COUNT(*) FROM s3)
    """,
    doc="Strictly-ordered first-touch funnel signup -> view -> "
        "purchase (operators/analytics.funnel_counts): stage k's "
        "reachers had a stage-k event strictly after their first "
        "stage-(k-1) time. One chained user-keyed aggregate per stage; "
        "the chain stays co-partitioned on user_id after the first "
        "exchange.",
)
def q122_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.analytics import (
        funnel_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, "user_id", "event_type", "ts", FUNNEL_STAGES)


@register(
    "q123_skyline",
    oracle="""
    WITH pts AS (
      SELECT o_custkey AS c_custkey,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,18)))
                        AS DOUBLE) / COUNT(*), 6) AS avg_price,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT p.c_custkey, p.avg_price, p.n_orders FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.avg_price >= p.avg_price AND q.n_orders >= p.n_orders
        AND (q.avg_price > p.avg_price OR q.n_orders > p.n_orders)
    )
    """,
    doc="Pareto front (skyline) of customers maximizing average order "
        "price and order count — anti-correlated axes, so the front "
        "is a real trade-off curve (operators/analytics.skyline_2d). "
        "The 2-D "
        "front is a running-max window, not an all-pairs dominance "
        "join: collapse to per-x max-y candidates, locally prune "
        "inside range partitions, then one global pass over the "
        "surviving ~front-sized set. The oracle states the dominance "
        "definition directly (NOT EXISTS), pinning the window "
        "formulation's semantics.",
)
def q123_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.analytics import skyline_2d

    orders = load_table(spark, sf_dir, "orders")
    pts = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_price"),
        F.count("*").alias("n_orders"),
    )
    return skyline_2d(pts, "avg_price", "n_orders").select(
        "c_custkey", "avg_price", "n_orders"
    )


@register(
    "q124_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median("value") AS m FROM events GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type, median(abs(e."value" - med.m)) AS d
      FROM events e JOIN med USING (event_type) GROUP BY 1
    )
    SELECT e.event_id, e.event_type, ROUND(e."value", 6) AS value,
           CASE WHEN mad.d > 0
                THEN ROUND((e."value" - med.m) / (1.4826 * mad.d), 6)
           END AS rscore
    FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
    WHERE abs(e."value" - med.m) > 3 * 1.4826 * mad.d
    """,
    doc="Robust per-event-type outlier detection via median + MAD "
        "(operators/analytics.mad_outliers): mean/stddev rules break "
        "exactly when outliers exist; |value - med| > 3 * 1.4826 * MAD "
        "is the robust standard. Exact percentile for oracle parity "
        "with DuckDB median; exact=False swaps in the mergeable "
        "approx_percentile sketch for 100 TB groups. Group stats "
        "broadcast back — the fact table never shuffles for the join.",
)
def q124_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.analytics import (
        mad_outliers,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    out = mad_outliers(ev, "event_type", "value", n_sigma=3.0)
    return out.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        "rscore",
    )


@register(
    "q125_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, t AS term
      FROM documents,
           LATERAL (SELECT unnest(regexp_split_to_array(lower(text),
                                                        '[^a-z]+')) AS t) u
      WHERE t != ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN {BM25_TERMS!r} GROUP BY 1, 2
    ),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             CAST(ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                  * ((tf.tf * (1.2 + 1.0))
                     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)))
                  AS DECIMAL(38,18)) AS s
      FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id, ROUND(CAST(SUM(s) AS DOUBLE), 6) AS score
      FROM scored GROUP BY 1
    )
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
      FROM agg
    ) WHERE rank <= {BM25_K}
    """,
    doc="BM25 top-20 sparse retrieval (operators/retrieval.bm25_topk), "
        "the lexical pairing of the ANN queries: portable "
        "lower+[^a-z]+ tokenization, corpus stats as a 1-row "
        "cross-joined DataFrame (no driver collect), df(term) "
        "broadcast, per-term scores decimal-summed, rank window with "
        "doc_id tiebreak. Scale: only query-term tokens shuffle; "
        "map-side combine collapses the (doc, term) aggregate.",
)
def q125_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, BM25_K)


@register(
    "q126_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 600 AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pe
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS island
      FROM marked
    )
    SELECT user_id, MIN(s) AS start_s, MAX(e) AS end_s,
           COUNT(*) AS n_merged
    FROM isl GROUP BY user_id, island
    """,
    doc="Merge overlapping activity intervals per user (each event "
        "opens a 10-minute window) via gaps-and-islands "
        "(operators/analytics.merge_intervals): one partitionBy-user "
        "window sort, running-max end, island ids by running count of "
        "gap opens — the O(n^2) self-join overlap formulation never "
        "materializes. Epoch-second bounds for cross-engine parity.",
)
def q126_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.analytics import (
        merge_intervals,
    )

    ev = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp("ts").alias("s")
    iv = ev.select(
        "user_id", s, (F.unix_timestamp("ts") + 600).alias("e")
    )
    merged = merge_intervals(iv, "user_id", "s", "e")
    return merged.select(
        "user_id",
        F.col("s").alias("start_s"),
        F.col("e").alias("end_s"),
        "n_merged",
    )


#: q132 attribution lookback: clicks older than this never get credit.
ATTR_WINDOW_S = 7 * 24 * 3600


@register(
    "q132_last_touch_attribution",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    m AS (
      SELECT p.event_id AS purchase_id, p.user_id,
             CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_s,
             c2.event_id AS cand_id,
             CAST(floor(epoch(p.ts)) AS BIGINT)
               - CAST(floor(epoch(c2.ts)) AS BIGINT) AS cand_delta
      FROM p LEFT JOIN LATERAL (
        SELECT c.event_id, c.ts FROM c
        WHERE c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
      ) c2 ON TRUE
    )
    SELECT purchase_id, user_id, purchase_s,
           CASE WHEN cand_delta <= {ATTR_WINDOW_S} THEN cand_id END
             AS click_id,
           CASE WHEN cand_delta <= {ATTR_WINDOW_S} THEN cand_delta END
             AS delta_s
    FROM m
    """,
    doc="Last-touch attribution: each purchase credits the user's most "
        "recent click at-or-before it within a 7-day lookback — the "
        "self-table application of operators/temporal.asof_join "
        "(union + one per-user window pass, no per-row correlated "
        "lookup; ties at equal ts break by greatest event_id, exactly "
        "the oracle's ORDER BY ts DESC, event_id DESC LIMIT 1). "
        "Out-of-window matches null out AFTER the join — the as-of "
        "pass itself needs no window parameter.",
)
def q132_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    m = asof_join(
        p, c, on=["user_id"], ts_col="ts",
        right_cols=("event_id",), tiebreak_col="event_id",
    )
    delta = F.unix_timestamp("ts") - F.unix_timestamp("ts_asof")
    in_window = F.col("ts_asof").isNotNull() & (delta <= ATTR_WINDOW_S)
    return m.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_timestamp("ts").alias("purchase_s"),
        F.when(in_window, F.col("event_id_asof")).alias("click_id"),
        F.when(in_window, delta).alias("delta_s"),
    )


@register(
    "q133_calendar_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,18)))
                        AS DOUBLE), 6) AS rev
      FROM orders GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS d
      FROM bounds
    ),
    pris AS (SELECT DISTINCT o_orderpriority FROM daily),
    grid AS (SELECT d, o_orderpriority FROM spine CROSS JOIN pris)
    SELECT STRFTIME(g.d, '%Y-%m-%d') AS d, g.o_orderpriority,
           COALESCE(daily.n, 0) AS n_orders,
           LAST_VALUE(daily.rev IGNORE NULLS) OVER (
             PARTITION BY g.o_orderpriority ORDER BY g.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS rev_filled
    FROM grid g
    LEFT JOIN daily
      ON g.d = daily.d AND g.o_orderpriority = daily.o_orderpriority
    """,
    doc="Calendar spine + gap fill: daily revenue per order priority "
        "with missing days materialized (n_orders=0) and revenue "
        "carried forward (last_value IGNORE NULLS per priority). The "
        "fact table is scanned ONCE (the daily aggregate); the "
        "aggregate is calendar-sized at ANY fact scale, so it is "
        "localized and the spine/grid/fill stages run driver-sized "
        "with zero further fact scans — the dupe-subtree trap (three "
        "aliased references to the daily agg) never touches the "
        "corpus.",
)
def q133_calendar_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.queries import localize

    orders = load_table(spark, sf_dir, "orders")
    daily = localize(
        orders.select(
            F.to_date("o_orderdate").alias("d"),
            "o_orderpriority",
            "o_totalprice",
        )
        .groupBy("d", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 6
            ).alias("rev"),
        )
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    pris = daily.select("o_orderpriority").distinct()
    grid = spine.crossJoin(pris)
    j = grid.join(daily, ["d", "o_orderpriority"], "left")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "o_orderpriority",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        F.last("rev", ignorenulls=True).over(w).alias("rev_filled"),
    )


#: q134 histogram bin width over documents.n_chars.
PSI_BIN_W = 500


@register(
    "q134_psi_drift",
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
    doc="Population-stability-index drift report between crawl N-1 and "
        "crawl N (q116's snapshot simulation): fixed-width n_chars "
        "histograms, Laplace-smoothed shares over the union of "
        "observed bins, per-bin PSI terms (sum = the drift score; "
        "per-bin rows localize WHERE the distribution moved). Two "
        "histogram aggregates + a bin-sized full outer join + a "
        "broadcast 1-row totals frame — nothing fact-sized shuffles "
        "twice. The monitoring companion of q88's embedding drift for "
        "the scalar-feature side.",
)
def q134_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    old = (
        docs.filter(F.expr(_SNAP_OLD))
        .select(F.expr(f"n_chars div {PSI_BIN_W}").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_old"))
    )
    new = (
        docs.filter(F.expr(_SNAP_NEW))
        .select(
            F.expr(f"(n_chars + {_SNAP_DELTA}) div {PSI_BIN_W}").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n_new"))
    )
    from spark_relieffc_fselection_spark.operators.quality import psi_report

    return psi_report(old, new)


@register(
    "q135_rolling_features",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG("value") OVER w, 6) AS roll_avg,
           ROUND(STDDEV_SAMP("value") OVER w, 6) AS roll_std
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    doc="Trailing-5-event rolling mean/stddev of value per user "
        "(operators/analytics.rolling_stats) — the basic time-series "
        "feature-engineering shape before a metric feeds a model. One "
        "shuffle on user_id + a per-user sort; the ROWS frame keeps "
        "per-row state O(n). The (ts, event_id) order is total, so "
        "both engines see identical frames; sample stddev matches "
        "DuckDB STDDEV_SAMP (NULL on 1-row frames).",
)
def q135_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.analytics import (
        rolling_stats,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    out = rolling_stats(ev, "user_id", ["ts", "event_id"], "value", n=5)
    return out.select(
        "event_id",
        "user_id",
        F.round("value_roll_avg", 6).alias("roll_avg"),
        F.round("value_roll_std", 6).alias("roll_std"),
    )


#: q139 bucket count — both sides must match for co-location.
N_BUCKETS = 8

_BUCKETED: dict[tuple[str, str], tuple[str, str]] = {}
import atexit as _atexit
import threading as _threading

_BUCKETED_LOCK = _threading.Lock()
_BUCKETED_DIRS: list[str] = []


@_atexit.register
def _cleanup_bucketed_dirs() -> None:
    import shutil

    with _BUCKETED_LOCK:
        for d in _BUCKETED_DIRS:
            shutil.rmtree(d, ignore_errors=True)
        _BUCKETED_DIRS.clear()


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage orders + customer as co-bucketed catalog tables once per
    (session, sf) — lock-guarded so concurrent query runners can't
    race the write (the q50 staging discipline)."""
    import re
    import tempfile

    from spark_relieffc_fselection_spark.sources import write_bucketed

    key = (spark.sparkContext.applicationId, sf_dir)
    with _BUCKETED_LOCK:
        if key not in _BUCKETED:
            sfx = re.sub(r"\W", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
            ot, ct = f"q139_orders_{sfx}", f"q139_customer_{sfx}"
            base = tempfile.mkdtemp(prefix="q139_bucketed_")
            _BUCKETED_DIRS.append(base)
            write_bucketed(
                load_table(spark, sf_dir, "orders").select(
                    "o_custkey", "o_totalprice"
                ),
                ot,
                ["o_custkey"],
                N_BUCKETS,
                sort_cols=["o_custkey"],
                path=f"{base}/orders",
            )
            write_bucketed(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_mktsegment"
                ),
                ct,
                ["c_custkey"],
                N_BUCKETS,
                sort_cols=["c_custkey"],
                path=f"{base}/customer",
            )
            _BUCKETED[key] = (ot, ct)
    return _BUCKETED[key]


@register(
    "q139_bucketed_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,18)))
                      AS DOUBLE), 6) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
    doc="Co-located join off bucketed storage "
        "(sources/write_bucketed): orders and customer staged ONCE as "
        "catalog tables bucketed 8-ways on the join key, then joined "
        "with a merge hint — both scans already satisfy the join's "
        "hash distribution, so the plan has ZERO exchange on either "
        "join input (plan-pinned; the only shuffle left is the final "
        "segment aggregate). The 100 TB payoff: a nightly fact-to-"
        "fact join pays its shuffle once at write time instead of on "
        "every run; this is the brief's 'bucketing for co-located "
        "joins' realized end-to-end. Oracle is the plain join — "
        "bucketing must be invisible to results.",
)
def q139_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ot, ct = _bucketed_tables(spark, sf_dir)
    o, c = spark.table(ot), spark.table(ct)
    j = o.hint("merge").join(c, o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 6
        ).alias("sum_price"),
    )


#: q142 synthetic authority graph over customer keys: parent edge
#: (digit hierarchy, roots self-loop) + sibling edge (rotate last
#: digit). Deterministic, expressible identically in both engines.
PR_ITERS = 5
_PR_EDGES_SQL = """
  SELECT c_custkey AS src,
         CASE WHEN c_custkey >= 10 THEN c_custkey // 10
              ELSE c_custkey END AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey AS src,
         c_custkey - (c_custkey % 10) + ((c_custkey % 10) + 1) % 10 AS dst
  FROM customer
"""


def _pr_oracle(iters: int) -> str:
    tele = "(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT cnt FROM nn)"
    ctes = [
        f"nodes AS (SELECT c_custkey AS node FROM customer)",
        f"nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM nodes)",
        f"edges AS ({_PR_EDGES_SQL})",
        "deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY 1)",
        "r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT cnt FROM nn)"
        " AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT n.node,
             {tele} + CAST(0.85 AS DOUBLE) * CAST(COALESCE(
               SUM(CAST(r.rank / d.outdeg AS DECIMAL(38,18))),
               0) AS DOUBLE) AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN r{i - 1} r ON r.node = e.src
      LEFT JOIN deg d ON d.node = e.src
      GROUP BY n.node
    )"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
    SELECT node, ROUND(rank * (SELECT cnt FROM nn), 6) AS rank_norm
    FROM r{iters}"""
    )


@register(
    "q142_pagerank",
    oracle=_pr_oracle(PR_ITERS),
    doc="Fixed-iteration PageRank over a deterministic synthetic "
        "authority graph on customer keys (digit-hierarchy parent "
        "edges + rotate-last-digit sibling edges) — the source-"
        "authority quality prior a crawl-curation pipeline scores "
        "domains with (operators/graph.pagerank). Each power step is "
        "one edges-to-ranks equi-join + a DECIMAL(38,18) contribution "
        "sum + a nodes left join; out-degrees are computed once and "
        "localCheckpointed, and the node-sized rank frame is "
        "localCheckpointed per round so the plan stays O(1) across "
        "iterations (the closure_to_root discipline). The oracle "
        "unrolls the 5 iterations as CTEs; decimal-summed double "
        "contributions make the power steps bit-identical across "
        "engines, so the hash matches at full precision before the "
        "final mean-normalized rounding.",
)
def q142_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.graph import pagerank

    cust = load_table(spark, sf_dir, "customer")
    nodes = cust.select(F.col("c_custkey").alias("node"))
    parent = cust.select(
        F.col("c_custkey").alias("src"),
        F.when(F.col("c_custkey") >= 10, F.expr("c_custkey div 10"))
        .otherwise(F.col("c_custkey"))
        .alias("dst"),
    )
    sibling = cust.select(
        F.col("c_custkey").alias("src"),
        F.expr(
            "c_custkey - (c_custkey % 10) + ((c_custkey % 10) + 1) % 10"
        ).alias("dst"),
    )
    n = nodes.count()
    ranks = pagerank(
        parent.unionByName(sibling), nodes, n_iter=PR_ITERS, damping=0.85
    )
    return ranks.select(
        "node", F.round(F.col("rank") * F.lit(float(n)), 6).alias("rank_norm")
    )


#: q144 hybrid retrieval: RRF constant, candidate pool per ranker,
#: fused result size, semantic query vector id.
RRF_K = 60
HY_POOL = 50
HY_TOPK = 20
HY_QVEC = 0

# Shared SQL fragments (embeddings normalization + cosine) from the
# ANN family so both rankers' oracle chains stay literally identical
# to their standalone queries (q24/q125 with a deeper pool).
from spark_relieffc_fselection_spark.queries.simsearch_q import (
    _COSINE,
    _INST,
)


@register(
    "q144_hybrid_rrf",
    oracle=f"""
    WITH {_INST},
    sem AS (
      SELECT doc_id, r_sem FROM (
        SELECT a.id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY {_COSINE} DESC, a.id ASC)
                 AS r_sem
        FROM normed a CROSS JOIN
             (SELECT v, nrm FROM normed WHERE id = {HY_QVEC}) b
        WHERE a.id <> {HY_QVEC}
      ) WHERE r_sem <= {HY_POOL}
    ),
    toks AS (
      SELECT doc_id, t AS term
      FROM documents,
           LATERAL (SELECT unnest(regexp_split_to_array(lower(text),
                                                        '[^a-z]+')) AS t) u
      WHERE t != ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN {BM25_TERMS!r} GROUP BY 1, 2
    ),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             CAST(ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                  * ((tf.tf * (1.2 + 1.0))
                     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)))
                  AS DECIMAL(38,18)) AS s
      FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id, ROUND(CAST(SUM(s) AS DOUBLE), 6) AS score
      FROM scored GROUP BY 1
    ),
    lex AS (
      SELECT doc_id, r_lex FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS r_lex
        FROM agg
      ) WHERE r_lex <= {HY_POOL}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + lex.r_lex), 0)
             + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + sem.r_sem), 0)
               AS rrf
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id, ROUND(rrf, 6) AS rrf, rank FROM (
      SELECT doc_id, rrf,
             ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank
      FROM fused
    ) WHERE rank <= {HY_TOPK}
    """,
    doc="Hybrid retrieval: BM25 lexical top-50 and brute-force cosine "
        "semantic top-50 fused by reciprocal-rank fusion "
        "(rrf = sum 1/(60+rank)) into a final top-20 — the standard "
        "two-tower serving shape (keyword recall + embedding recall, "
        "rank-fused so neither score scale dominates). Pure "
        "composition of the q125 and q24 operators + one "
        "pool-sized full outer join; at scale each ranker swaps to "
        "its indexed form (BM25 stats cache, IVF-PQ probes) with the "
        "fusion unchanged. Ranks are integers, so the fused scores "
        "are bit-identical across engines.",
)
def q144_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.retrieval import bm25_topk
    from spark_relieffc_fselection_spark.operators.simsearch import (
        brute_force_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, BM25_TERMS, HY_POOL).select(
        "doc_id", F.col("rank").alias("r_lex")
    )
    sem = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == HY_QVEC), k=HY_POOL
    ).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("r_sem")
    )
    one = F.lit(1.0)
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(one / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(one / (F.lit(RRF_K) + F.col("r_sem")), F.lit(0.0))
        ).alias("rrf"),
    )
    top = fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(HY_TOPK)
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", F.round("rrf", 6).alias("rrf"), "rank"
    )


@register(
    "q149_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT prev_type, SUM(n) AS tn FROM t GROUP BY 1)
    SELECT t.prev_type, t.next_type, t.n,
           ROUND(t.n / tot.tn, 6) AS p
    FROM t JOIN tot USING (prev_type)
    """,
    doc="First-order event-transition matrix (the Markov structure "
        "under the q122 funnel): per-user LAG over the total "
        "(ts, event_id) order pairs each event with its predecessor — "
        "ONE window pass, no self-join of the event stream (the naive "
        "consecutive-pairs equi-join shuffles the fact twice and "
        "fans out on ties). Transition counts then normalize per "
        "source state via a states^2-sized join. At any fact scale "
        "the wide work is the one user-keyed window sort; the matrix "
        "itself is |event_types|^2 rows.",
)
def q149_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.queries import localize

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    # localize: the counts matrix feeds BOTH the per-state totals and
    # the output join — un-materialized, each consumer would re-run
    # the fact-sized window (the q129 dupe-subtree trap); the matrix
    # is |event_types|^2 rows, driver-sized at any fact scale.
    t = localize(
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = t.groupBy("prev_type").agg(F.sum("n").alias("tn"))
    return t.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("tn"), 6).alias("p"),
    )


@register(
    "q150_merge_upsert",
    oracle="""
    WITH base AS (
      SELECT doc_id, n_chars FROM documents WHERE doc_id % 4 <> 3
    ),
    ch AS (
      SELECT doc_id, 1 AS version,
             CASE WHEN doc_id % 5 = 0 THEN 'delete' ELSE 'upsert' END AS op,
             n_chars + 7 AS nc
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, 2 AS version, 'upsert' AS op, n_chars + 11 AS nc
      FROM documents WHERE doc_id % 6 = 0
    ),
    latest AS (
      SELECT doc_id, op, nc FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY version DESC) AS rn
        FROM ch
      ) WHERE rn = 1
    ),
    m AS (
      SELECT COALESCE(b.doc_id, l.doc_id) AS doc_id,
             b.n_chars AS old_nc, b.doc_id IS NOT NULL AS in_base,
             l.op, l.nc
      FROM base b FULL OUTER JOIN latest l ON b.doc_id = l.doc_id
    )
    SELECT doc_id,
           CASE WHEN op IS NULL THEN 'keep'
                WHEN in_base THEN 'update'
                ELSE 'insert' END AS action,
           CASE WHEN op = 'upsert' THEN nc ELSE old_nc END AS n_chars
    FROM m
    WHERE op IS NULL OR op <> 'delete'
    """,
    doc="MERGE INTO semantics (the lakehouse upsert): a versioned CDC "
        "change feed (upserts + deletes, latest version per key wins) "
        "applied to a base snapshot in ONE key-partitioned full outer "
        "join. The change feed compacts to latest-per-key with a "
        "partial-aggregatable max_by BEFORE the join (map-side, no "
        "window over the feed), so the wide side shuffles once and the "
        "merge emits keep/update/insert rows and drops deletes. At "
        "100 TB the base side is partition-pruned to only the "
        "partitions the feed touches (files without matching keys "
        "never rewrite) — this query is the row-level semantics that "
        "partition-level pruning wraps.",
)
def q150_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 3).select("doc_id", "n_chars")
    ch1 = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.lit(1).alias("version"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        (F.col("n_chars") + 7).alias("nc"),
    )
    ch2 = docs.filter(F.col("doc_id") % 6 == 0).select(
        "doc_id",
        F.lit(2).alias("version"),
        F.lit("upsert").alias("op"),
        (F.col("n_chars") + 11).alias("nc"),
    )
    latest = (
        ch1.unionByName(ch2)
        .groupBy("doc_id")
        .agg(F.max_by(F.struct("op", "nc"), F.col("version")).alias("best"))
        .select("doc_id", F.col("best.op").alias("op"), F.col("best.nc").alias("nc"))
    )
    m = base.withColumn("in_base", F.lit(True)).join(
        latest, "doc_id", "full_outer"
    )
    return m.filter(F.col("op").isNull() | (F.col("op") != "delete")).select(
        "doc_id",
        F.when(F.col("op").isNull(), F.lit("keep"))
        .when(F.col("in_base").isNotNull(), F.lit("update"))
        .otherwise(F.lit("insert"))
        .alias("action"),
        F.when(F.col("op") == "upsert", F.col("nc"))
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )


@register(
    "q155_recursive_cte",
    oracle="""
    WITH RECURSIVE climb AS (
      SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
      FROM customer
      UNION ALL
      SELECT node, cur // 10, depth + 1 FROM climb WHERE cur >= 10
    )
    SELECT cur AS root_key,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(depth) AS INT) AS max_depth
    FROM climb WHERE cur < 10 GROUP BY cur
    """,
    doc="Native WITH RECURSIVE (Spark 4 executes recursive CTEs) over "
        "q120's synthetic decimal-digit hierarchy: every node climbs "
        "to its root, rolled up per root. The SQL-compatibility "
        "surface a reference user migrating warehouse queries expects "
        "verbatim — while q120's pointer-doubling operator remains "
        "the SCALE path for deep hierarchies: the recursive plan runs "
        "one sequential join per LEVEL (depth ~6 here, depth-d "
        "lineage at depth d), pointer doubling closes in ceil(log2 d) "
        "self-joins. Same rows either way; this entry pins the "
        "engine's native-recursion correctness against DuckDB's.",
)
def q155_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return spark.sql(
        """
        WITH RECURSIVE climb AS (
          SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
          FROM {cust}
          UNION ALL
          SELECT node, cur div 10, depth + 1 FROM climb WHERE cur >= 10
        )
        SELECT cur AS root_key,
               COUNT(*) AS n_nodes,
               CAST(MAX(depth) AS INT) AS max_depth
        FROM climb WHERE cur < 10 GROUP BY cur
        """,
        cust=cust,
    )
