"""Stream-batch parity: the streaming operators must produce the same
results as the batch event queries on the same input file."""

import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.sources import load_table
from spark_relieffc_fselection_spark.streaming import (
    read_events_stream,
    run_to_memory_sink,
    stateful_user_totals,
    streaming_session_agg,
    streaming_tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark, tmp_path_factory):
    # file-stream sources require a directory; stage the file into one
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    return read_events_stream(spark, str(d))


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF, "events").cache()


def test_streaming_tumbling_matches_batch(spark, events_stream, events_batch):
    got = run_to_memory_sink(
        streaming_tumbling_counts(events_stream), "tumbling_t", "complete"
    )
    expected = (
        events_batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "event_type", "n_events", "sum_value",
        )
    )
    g = {tuple(r[:2]): (r[2], r[3]) for r in got.collect()}
    e = {tuple(r[:2]): (r[2], r[3]) for r in expected.collect()}
    assert set(g) == set(e)
    for k in e:
        assert g[k][0] == e[k][0]
        assert abs(g[k][1] - e[k][1]) < 1e-6


def test_streaming_sessions_match_batch(spark, events_stream, events_batch):
    got = run_to_memory_sink(
        streaming_session_agg(events_stream), "sessions_t", "complete"
    )
    expected = (
        events_batch.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.round(F.sum(F.col("value").cast("decimal(38,18)")).cast("double"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp("first_ts").alias("session_start_s"),
            "n_events",
            "sum_value",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_streaming_dedup_drops_injected_repeats(spark, events_batch, tmp_path_factory):
    import shutil

    from spark_relieffc_fselection_spark.streaming import read_events_stream, streaming_dedup

    # stage the same file twice -> every event arrives in two
    # micro-batches; dedup-within-watermark must emit each id once
    d = tmp_path_factory.mktemp("dup_stream")
    shutil.copy(f"{SF}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF}/events.parquet", d / "b.parquet")
    stream = read_events_stream(spark, str(d))
    got = run_to_memory_sink(streaming_dedup(stream, watermark="365 days"), "dedup_t", "append")
    assert got.count() == events_batch.count()
    assert got.select("event_id").distinct().count() == events_batch.count()


def test_stateful_user_totals(spark, events_stream, events_batch):
    got = run_to_memory_sink(
        stateful_user_totals(events_stream), "totals_t", "update"
    )
    expected = events_batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    g = {r["user_id"]: (r["n_events"], r["total_value"]) for r in got.collect()}
    e = {r["user_id"]: (r["n_events"], r["total_value"]) for r in expected.collect()}
    assert set(g) == set(e)
    for k in e:
        assert g[k][0] == e[k][0]
        assert abs(g[k][1] - e[k][1]) < 1e-4


def test_streaming_outer_join_emits_unconverted_views(spark):
    """q89's outer rows are the point: views with no click within the
    interval must appear with the -1 sentinel, and every converted row
    must satisfy the interval bound."""
    from spark_relieffc_fselection_spark.queries.events_q import (
        q89_streaming_outer_join,
    )

    rows = q89_streaming_outer_join(spark, "/root/testdata/sf0.001").collect()
    assert rows
    unconverted = [r for r in rows if not r["converted"]]
    converted = [r for r in rows if r["converted"]]
    assert unconverted, "outer side never fired"
    assert all(r["click_id"] == -1 and r["click_ts_s"] == -1 for r in unconverted)
    assert all(
        0 <= r["click_ts_s"] - r["view_ts_s"] <= 600 for r in converted
    )
