"""Bucketed co-located joins and salted skew joins.

The 100 TB story for repeated fact-to-fact joins (SCALE.md): bucket
both tables on the join key at write time, and every later join on
that key is exchange-free — the scan itself satisfies the join's
distribution requirement. These tests pin that the engine actually
gets that plan, not just that results match.
"""

import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.functions.partitioning import salted_join

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.withColumn("l_orderkey", F.col("o_orderkey"))
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("orders_bucketed")
    )
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    # force a sort-merge join so the test exercises the bucketed
    # distribution, not a broadcast
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(li_t).join(spark.table(ord_t), "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same rows as the plain join
        plain = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
                    "l_orderkey", F.col("o_orderkey")
                ),
                "l_orderkey",
            )
        )
        assert j.count() == plain.count()
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_matches_plain(spark):
    # one pathologically hot key (80% of rows) + a long tail
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 5 < 4, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    got = salted_join(big, small, on=["k"], salt=8)
    plain = big.join(small, "k")
    assert got.count() == plain.count()
    assert (
        got.groupBy().agg(F.sum("payload"), F.sum("dim")).collect()
        == plain.groupBy().agg(F.sum("payload"), F.sum("dim")).collect()
    )


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    small = spark.createDataFrame([(1, 10.0)], "k long, dim double")
    rows = {r["k"]: r["dim"] for r in salted_join(big, small, ["k"], salt=4, how="left").collect()}
    assert rows == {1: 10.0, 99: None}


def test_salted_join_rejects_right_join(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, ["id"], how="full")


# --- Z-order (Morton) layout key ------------------------------------------

def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton16_matches_bitwise_reference(spark):
    from spark_relieffc_fselection_spark.functions.partitioning import morton16

    pts = [(i * 7919 % 65536, i * 104729 % 65536) for i in range(64)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = [
        r["z"]
        for r in df.select(morton16(F.col("x"), F.col("y")).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    want = [_morton_ref(x, y) for x, y in sorted(pts)]
    assert got == want


def test_morton16_sql_twin_matches(spark):
    """The DuckDB-destined SQL string, evaluated by Spark SQL, equals
    the Column builder — the generated twins can't drift."""
    from spark_relieffc_fselection_spark.functions.partitioning import (
        morton16,
        morton16_sql,
    )

    df = spark.createDataFrame(
        [(i * 31 % 65536, i * 577 % 65536) for i in range(32)], "x bigint, y bigint"
    )
    both = df.select(
        morton16(F.col("x"), F.col("y")).alias("a"),
        F.expr(morton16_sql("x", "y")).alias("b"),
    )
    assert both.filter(F.col("a") != F.col("b")).count() == 0


def test_zorder_cells_bound_both_dims(spark):
    """q118's pruning guarantee: a z-cell at shift 12 spans at most a
    64x64 rectangle — min/max file stats stay tight on BOTH dims."""
    from spark_relieffc_fselection_spark.queries.extras_q import q118_zorder_layout

    rows = q118_zorder_layout(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["x_max"] - r["x_min"] <= 63
        assert r["y_max"] - r["y_min"] <= 63
