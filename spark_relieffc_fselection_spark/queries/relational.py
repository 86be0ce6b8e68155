"""Relational operator queries (SURVEY §2.1-§2.7) over the testdata
star schema, each paired with a DuckDB oracle.

Each query exercises one inventory row and is written so Catalyst gets
the optimization the reference hand-rolled: filters sit next to scans
(pushdown), small dimensions are broadcast, top-k is orderBy+limit
(TakeOrderedAndProject), partial aggregation replaces map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.queries import register
from spark_relieffc_fselection_spark.sources import load_table

DEC = "decimal(38,18)"


def dsum(c) -> F.Column:
    """Order-insensitive cross-engine sum: exact decimal accumulation."""
    return F.sum(F.col(c).cast(DEC))


def r6(c) -> F.Column:
    """Round-then-cast for DECIMAL aggregates: rounding happens in
    EXACT decimal arithmetic (HALF_UP, identical in DuckDB), and only
    the already-rounded value converts to double — at 1e9 magnitudes a
    6dp round of the post-cast double needs ~16 significant digits
    from a 15.95-digit type, so a 1-ulp conversion difference between
    engines can straddle a .5e-6 boundary (observed: q02 sf0.1
    sum_base_price). Decimal-first rounding removes the boundary."""
    return F.round(c, 6).cast("double")


# --- S4 + P1/P2: pruned parquet scan, filter + projection ------------------

@register(
    "q01_pruned_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           ROUND(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE), 6) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount > 0.05
    """,
    doc="SURVEY P1/P2/S4: projection+filter pushed to the parquet scan",
)
def q01_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            r6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


# --- A1-A3: grouped aggregation (TPC-H Q1 shape) ----------------------------

@register(
    "q02_groupby_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,18))), 6) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,18))), 6) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,18))), 6) AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="SURVEY A1-A3: partial+final hash aggregation (the RELIEF-core shape)",
)
def q02_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-01")
        .withColumn("disc_price", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r6(dsum("l_quantity")).alias("sum_qty"),
            r6(dsum("l_extendedprice")).alias("sum_base_price"),
            r6(dsum("disc_price")).alias("sum_disc_price"),
            F.round(dsum("l_discount").cast("double") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- J3/J4 + A3: multi-way broadcast join + aggregation ---------------------

@register(
    "q03_join_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,18))), 6) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
    doc="SURVEY J3 (equi joins) — dims broadcast, fact never re-shuffled",
)
def q03_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .withColumn("rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(r6(dsum("rev")).alias("revenue"), F.count("*").alias("n_lineitems"))
    )


# --- T1/J2: per-group top-k via window rank ---------------------------------

@register(
    "q04_window_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 6) AS total_price, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    """,
    doc="SURVEY T1/J2: bounded top-k heap == rank-over-window",
)
def q04_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("total_price"),
            "rnk",
        )
    )


# --- T2/T3: global deterministic top-N --------------------------------------

@register(
    "q05_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 6) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
    doc="SURVEY T2/T3: takeOrdered == TakeOrderedAndProject",
)
def q05_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(100)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 6).alias("price"))
    )


# --- U1 + distinct: set operations ------------------------------------------

@register(
    "q06_union_distinct",
    oracle="""
    SELECT nationkey, kind FROM (
      SELECT DISTINCT c_nationkey AS nationkey, 'customer' AS kind FROM customer
      UNION ALL
      SELECT DISTINCT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    )
    """,
    doc="SURVEY U1: unionByName + distinct",
)
def q06_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.select(F.col("c_nationkey").alias("nationkey")).distinct().withColumn(
        "kind", F.lit("customer")
    )
    b = supp.select(F.col("s_nationkey").alias("nationkey")).distinct().withColumn(
        "kind", F.lit("supplier")
    )
    return a.unionByName(b)


# --- P7: semi join -----------------------------------------------------------

@register(
    "q07_semijoin",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    doc="SURVEY P7: feature-set membership == broadcast semi join",
)
def q07_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


# --- U2: anti join ------------------------------------------------------------

@register(
    "q08_antijoin",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 6) AS acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    doc="SURVEY U2: set-membership exclusion == anti join",
)
def q08_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", F.round("c_acctbal", 6).alias("acctbal")
    )


# --- A8 + F5: global min/max + min-max normalization -------------------------

@register(
    "q09_minmax_norm",
    oracle="""
    WITH stats AS (SELECT MIN(s_acctbal) mn, MAX(s_acctbal) mx FROM supplier)
    SELECT s_suppkey,
           ROUND(CASE WHEN mx = mn THEN 0.0 ELSE (s_acctbal - mn) / (mx - mn) END, 6) AS norm_acctbal
    FROM supplier, stats
    """,
    doc="SURVEY A8/F5: the reference's relevance normalization (fit :310-312)",
)
def q09_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    stats = supp.agg(
        F.min("s_acctbal").alias("mn"), F.max("s_acctbal").alias("mx")
    )
    return supp.crossJoin(F.broadcast(stats)).select(
        "s_suppkey",
        F.round(
            F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
                (F.col("s_acctbal") - F.col("mn")) / (F.col("mx") - F.col("mn"))
            ),
            6,
        ).alias("norm_acctbal"),
    )


# --- A2: class priors ----------------------------------------------------------

@register(
    "q10_label_priors",
    oracle="""
    SELECT CAST(label AS DOUBLE) AS label,
           COUNT(*) AS cnt,
           ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM embeddings) AS DOUBLE), 6) AS prior
    FROM embeddings GROUP BY label
    """,
    doc="SURVEY A2: countByValue -> groupBy count / N (fit :217-220)",
)
def q10_label_priors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    return (
        emb.groupBy(F.col("label").cast("double").alias("label"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("prior", F.round(F.col("cnt") / F.lit(float(n)), 6))
    )


# --- P4-analogue: deterministic sample ----------------------------------------

@register(
    "q11_mod_sample_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,18))), 6) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderkey % 97 < 13
    GROUP BY o_orderpriority
    """,
    doc="SURVEY P4: Bernoulli sample is engine-seeded; the oracle-checkable "
        "equivalent is a deterministic modulo predicate (df.sample itself is "
        "exercised in the estimator tests)",
)
def q11_mod_sample_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") % 97 < 13)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            r6(dsum("o_totalprice")).alias("sum_price"),
        )
    )


# --- A10/F4: MI-style entropy transform ----------------------------------------

@register(
    "q12_mutual_information",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM lineitem),
    joint AS (
      SELECT l_returnflag AS a, l_linestatus AS b, COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    ma AS (SELECT a, CAST(SUM(c) AS DOUBLE) AS ca FROM joint GROUP BY a),
    mb AS (SELECT b, CAST(SUM(c) AS DOUBLE) AS cb FROM joint GROUP BY b)
    SELECT joint.a AS flag, joint.b AS status,
           ROUND((joint.c / n.total) * log2((joint.c / n.total) / ((ma.ca / n.total) * (mb.cb / n.total))), 6) AS mi_term
    FROM joint, n
    JOIN ma ON joint.a = ma.a
    JOIN mb ON joint.b = mb.b
    """,
    doc="SURVEY A10/F4: jprob*log2(jprob/(pa*pb)) — the redundancy MI transform "
        "(computeRedudancy, ReliefFRSelector.scala:645-661) over categorical pairs",
)
def q12_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    joint = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_linestatus").alias("status")
    ).agg(F.count("*").alias("c"))
    ma = joint.groupBy("flag").agg(F.sum("c").cast("double").alias("ca"))
    mb = joint.groupBy("status").agg(F.sum("c").cast("double").alias("cb"))
    t = float(total)
    return (
        joint.join(F.broadcast(ma), "flag")
        .join(F.broadcast(mb), "status")
        .select(
            "flag",
            "status",
            F.round(
                (F.col("c") / t)
                * F.log2((F.col("c") / t) / ((F.col("ca") / t) * (F.col("cb") / t))),
                6,
            ).alias("mi_term"),
        )
    )
