"""Event-time windowing queries over ``events`` with DuckDB oracles.

These are the *batch* forms of the streaming operators in
``streaming/windows.py`` — same window semantics (Structured Streaming
windows are defined on event time, so batch and stream agree; the
stream-batch parity test in tests/test_streaming.py pins that).

Window starts are output as epoch seconds (bigint): portable across
engines with no timezone formatting drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.queries import register
from spark_relieffc_fselection_spark.sources import load_table

DEC = "decimal(38,18)"
SESSION_GAP_MIN = 30


def _dsum6(c: str) -> F.Column:
    return F.round(F.sum(F.col(c).cast(DEC)).cast("double"), 6)


@register(
    "q32_tumbling_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
           event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,18))) AS DOUBLE), 6) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1h event-time window aggregation (streaming form: "
        "readStream + watermark in streaming/windows.py)",
)
def q32_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _dsum6("value").alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q33_sliding_window",
    oracle="""
    WITH exploded AS (
      SELECT CAST(floor(epoch(ts) / 1800) * 1800 - off AS BIGINT) AS window_start_s,
             value
      FROM events, LATERAL (SELECT unnest([0, 1800]) AS off) o
    )
    SELECT window_start_s, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,18))) AS DOUBLE), 6) AS sum_value
    FROM exploded GROUP BY 1
    """,
    doc="Sliding window (1h length, 30min slide): every event lands in "
        "exactly two windows; the oracle derives both starts arithmetically",
)
def q33_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), _dsum6("value").alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q34_session_window",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                          >= {SESSION_GAP_MIN * 60}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,18))) AS DOUBLE), 6) AS sum_value
    FROM sessions GROUP BY user_id, session_no
    """,
    doc="Session windows ({gap}min gap): the engine uses the native "
        "session_window operator; the oracle re-derives sessions via "
        "lag-gap cumulative sums — semantics must agree".format(gap=SESSION_GAP_MIN),
)
def q34_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            _dsum6("value").alias("sum_value"),
            F.min("ts").alias("first_ts"),
        )
        .select(
            "user_id",
            F.unix_timestamp("first_ts").alias("session_start_s"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q35_json_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,18))) AS DOUBLE), 6) AS sum_value
    FROM events GROUP BY 1
    """,
    doc="Semi-structured props: JSON field extraction + bucket aggregation "
        "(get_json_object / json_extract parity)",
)
def q35_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_bucket", F.get_json_object("props", "$.k").cast("int") % 10
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n_events"), _dsum6("value").alias("sum_value"))
    )
