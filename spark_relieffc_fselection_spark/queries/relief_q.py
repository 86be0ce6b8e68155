"""RELIEF-F core queries (SURVEY §2.3 J1/J2, §2.4 A2-A6/A10, §2.5 T1/T3)
over the ``embeddings`` table, each with a full DuckDB oracle.

These are the oracle-checkable single-pass forms of the engine's
operators: deterministic (no sampling — sampling itself is
engine-seeded and exercised in estimator tests), ties broken by id,
decimal accumulation for every float sum.

The oracle SQL re-derives the same dataflow relationally:
cross join -> distance fold -> rank window -> unnest long form ->
class-bin aggregation -> prior-weighted collapse. That SQL *is* the
semantic spec of the engine's RELIEF pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.knn import knn_join
from spark_relieffc_fselection_spark.operators.relief import (
    explode_pairs,
    feature_bin_stats,
    joint_counts_from_pairs,
    pair_table,
    per_feature_stats,
    relevance_weights,
)
from spark_relieffc_fselection_spark.queries import localize, register
from spark_relieffc_fselection_spark.sources import load_table

KNN_K = 10          # q13 neighbors per query
RELIEF_K = 30       # q14-q17: 3 neighbors x 10 classes
# Deterministic 1-in-4 query sample for the relief pipeline — the
# reference's own default estimationRatio is 0.25 (ReliefFRSelector.
# scala:104-112); sampling the query side is THE algorithmic scaling
# knob, and the modulo form keeps it oracle-reproducible.
RELIEF_QPRED = "q.id % 4 = 0"
JOINT_TOP = list(range(8))  # q17's fixed 'topFeatures' scope

# Shared oracle CTE: instances + exact-k nearest neighbors by
# (distance, neighbor_id). Mirrors knn_join(strategy='sql').
_INST = """
inst AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS f, CAST(label AS DOUBLE) AS lbl
  FROM embeddings
)
"""

def _knn_cte(k: int, queries_pred: str = "TRUE") -> str:
    return f"""
{_INST},
cand AS (
  SELECT q.id AS query_id, q.lbl AS q_label, x.id AS neighbor_id, x.lbl AS n_label,
         sqrt(list_sum(list_transform(generate_series(1, len(q.f)),
                                      i -> (q.f[i] - x.f[i]) * (q.f[i] - x.f[i])))) AS dist
  FROM inst q JOIN inst x ON q.id <> x.id
  WHERE {queries_pred}
),
knn AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rnk
    FROM cand
  ) WHERE rnk <= {k}
)
"""


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
        F.col("label").cast("double").alias("label"),
    )


_PIPE_CACHE: dict[tuple[str, str], dict] = {}


def _pipe(spark: SparkSession, sf_dir: str) -> dict:
    # numpy kernel: ~4x faster than the SQL expression at sf0.1 and rank-
    # identical (tests/test_knn.py pins cross-strategy agreement); only
    # ranks feed downstream, not raw distances, so oracle parity holds.
    # q14-q17 all share the kNN -> pair-explode -> collision prefix, so
    # memoize the cached DataFrames per (session, sf_dir) — pure
    # memoization, results unchanged.
    # applicationId, not id(spark): CPython reuses object addresses, so
    # a fresh session could otherwise hit a cache entry bound to a
    # stopped SparkContext.
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PIPE_CACHE:
        from spark_relieffc_fselection_spark.functions.timing import (
            stage_timer,
        )

        _mark = stage_timer("pipe")

        inst = _embeddings(spark, sf_dir)
        # One job yields priors, total count AND dim (dim from any
        # collected feature row) — vs three separate actions.
        label_rows = (
            inst.groupBy("label")
            .agg(F.count("*").alias("n"), F.first("features").alias("fx"))
            .collect()
        )
        n_total = sum(r["n"] for r in label_rows)
        dim = len(label_rows[0]["fx"])
        priors = {float(r["label"]): r["n"] / n_total for r in label_rows}
        _mark("priors+dim")
        # estimationRatio analogue: deterministic 1-in-4 query sample
        # (must mirror RELIEF_QPRED in the oracles)
        queries = inst.filter(F.col("id") % 4 == 0)
        neigh = knn_join(
            inst, queries, RELIEF_K, strategy="numpy", num_instances=n_total
        )
        # Cache the COMPACT pair table (the exploded long form is nFeat
        # times bigger — never cached, re-derived per consumer in one
        # in-core pass). NOT materialized eagerly: the per-feature job
        # below is its first and only consumer before the joint job, so
        # the cache fills as a side effect of useful work.
        # Repartition by the pair key before caching: AQE coalesces the
        # small join output to very few partitions, and every cached
        # consumer (explode passes) would inherit that near-serial
        # layout. The shuffle moves only the compact pair rows.
        par = spark.sparkContext.defaultParallelism
        pairs = (
            pair_table(queries, neigh, instances=inst)
            .repartition(par, "query_id", "neighbor_id")
            .cache()
        )
        lp = explode_pairs(pairs)
        # TWO passes over the exploded long form total: one fused
        # bin-stats aggregation (relevance sums + marginal votes +
        # collision counts in a single scan — feature_bin_stats,
        # collapsed per-feature by per_feature_stats in the SAME job),
        # one collision explode feeding the joint combos. Both query
        # results are TINY (64..~1000 rows): compute and cache them
        # now, then release the big pair cache — a leaked
        # multi-hundred-MB cache per sf_dir otherwise piles GC
        # pressure onto every later query in the session.
        bins = feature_bin_stats(lp, continuous=True, lower_distance_threshold=0.8)
        # localize, not cache: the memoized results live for the whole
        # session, and every retained cache entry slows later queries'
        # cache lookups by its (huge) plan size. LocalRelations don't.
        perfeat = localize(per_feature_stats(bins, priors))
        _mark("perfeat")
        # joint stats straight from the cached compact pair table — the
        # generic joint_counts would explode to long rows only to
        # collect_list them back per pair (decimal-identical result,
        # see joint_counts_from_pairs)
        joint = localize(
            joint_counts_from_pairs(
                pairs, JOINT_TOP, continuous=True,
                lower_distance_threshold=0.8, num_features=dim,
            )
        )
        _mark("joint")
        # classCounter total (ReliefFRSelector.scala:469-470): the
        # number of (query, neighbor) pairs — q72b's MI normalizer.
        # One in-core action over the already-materialized cache.
        n_pairs = pairs.count()
        pairs.unpersist()
        _PIPE_CACHE[key] = {
            "perfeat": perfeat, "joint": joint, "n_pairs": n_pairs,
        }
    return _PIPE_CACHE[key]


# --- J1/J2/T1: the broadcast kNN join ---------------------------------------

@register(
    "q13_knn_join",
    oracle=f"""
    WITH {_knn_cte(KNN_K, queries_pred="q.id % 10 = 0")}
    SELECT query_id, neighbor_id, rnk AS rank, ROUND(dist, 6) AS distance
    FROM knn
    """,
    doc="SURVEY J1/J2/T1: brute-force kNN == crossJoin + window rank "
        "(approxNNByPartition, ReliefFRSelector.scala:334-369)",
)
def q13_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    inst = _embeddings(spark, sf_dir)
    queries = inst.filter(F.col("id") % 10 == 0)
    return knn_join(inst, queries, KNN_K, strategy="sql").select(
        "query_id", "neighbor_id", "rank", F.round("distance", 6).alias("distance")
    )


#: knn_join(strategy='lsh') bucket family (_candidates_lsh defaults)
KNN_LSH_BITS, KNN_LSH_TABLES = 4, 8

_KNN_LSH_BUCKET_BITS = " + ".join(
    f"(CASE WHEN f[t.tbl * {KNN_LSH_BITS} + {i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
    for i in range(KNN_LSH_BITS)
)


@register(
    "q73_knn_lsh_recall",
    oracle=f"""
    WITH {_knn_cte(KNN_K, queries_pred="q.id % 10 = 0")},
    bucketed AS (
      SELECT id, t.tbl AS tbl, {_KNN_LSH_BUCKET_BITS} AS bucket
      FROM inst,
           LATERAL (SELECT unnest(generate_series(0, {KNN_LSH_TABLES - 1})) AS tbl) t
    ),
    cands AS (
      SELECT DISTINCT b.id AS query_id, a.id AS neighbor_id
      FROM bucketed a JOIN bucketed b ON a.tbl = b.tbl AND a.bucket = b.bucket
      WHERE a.id <> b.id AND b.id % 10 = 0
    ),
    lsh_pairs AS (
      SELECT c.query_id, c.neighbor_id,
             sqrt(list_sum(list_transform(generate_series(1, len(q.f)),
                  i -> (q.f[i] - x.f[i]) * (q.f[i] - x.f[i])))) AS dist
      FROM cands c JOIN inst q ON q.id = c.query_id JOIN inst x ON x.id = c.neighbor_id
    ),
    lsh_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dist, neighbor_id) AS rnk
        FROM lsh_pairs
      ) WHERE rnk <= {KNN_K}
    )
    SELECT k.query_id,
           CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(l.neighbor_id) / CAST({KNN_K} AS DOUBLE), 6) AS recall
    FROM knn k
    LEFT JOIN lsh_topk l
      ON k.query_id = l.query_id AND k.neighbor_id = l.neighbor_id
    GROUP BY k.query_id
    """,
    doc="Recall@k of the kNN LSH tier (knn_join strategy='lsh', the "
        "SURVEY §7.3 sub-linear scale path) against the exact broadcast "
        "kNN — same accuracy/throughput metric as q49 but for the "
        "Euclidean RELIEF neighborhood; deterministic sign-LSH buckets "
        "make it exactly oracle-checkable.",
)
def q73_knn_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    inst = _embeddings(spark, sf_dir)
    queries = inst.filter(F.col("id") % 10 == 0)
    exact = knn_join(inst, queries, KNN_K, strategy="sql").select(
        "query_id", "neighbor_id"
    )
    lsh = knn_join(
        inst,
        queries,
        KNN_K,
        strategy="lsh",
        lsh_bits=KNN_LSH_BITS,
        lsh_tables=KNN_LSH_TABLES,
    ).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(KNN_K)), 6
            ).alias("recall"),
        )
    )


@register(
    "q157_knn_lsh_multiprobe_recall",
    oracle=f"""
    WITH {_knn_cte(KNN_K, queries_pred="q.id % 10 = 0")},
    bucketed AS (
      SELECT id, t.tbl AS tbl, {_KNN_LSH_BUCKET_BITS} AS bucket
      FROM inst,
           LATERAL (SELECT unnest(generate_series(0, {KNN_LSH_TABLES - 1})) AS tbl) t
    ),
    qprobes AS (
      SELECT id, tbl,
             CASE WHEN v.j = 0 THEN bucket
                  ELSE xor(bucket, CAST(1 << (v.j - 1) AS BIGINT)) END AS bucket
      FROM bucketed,
           LATERAL (SELECT unnest(generate_series(0, {KNN_LSH_BITS})) AS j) v
      WHERE id % 10 = 0
    ),
    cands AS (
      SELECT DISTINCT b.id AS query_id, a.id AS neighbor_id
      FROM bucketed a JOIN qprobes b ON a.tbl = b.tbl AND a.bucket = b.bucket
      WHERE a.id <> b.id
    ),
    lsh_pairs AS (
      SELECT c.query_id, c.neighbor_id,
             sqrt(list_sum(list_transform(generate_series(1, len(q.f)),
                  i -> (q.f[i] - x.f[i]) * (q.f[i] - x.f[i])))) AS dist
      FROM cands c JOIN inst q ON q.id = c.query_id JOIN inst x ON x.id = c.neighbor_id
    ),
    lsh_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dist, neighbor_id) AS rnk
        FROM lsh_pairs
      ) WHERE rnk <= {KNN_K}
    )
    SELECT k.query_id,
           CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(l.neighbor_id) / CAST({KNN_K} AS DOUBLE), 6) AS recall
    FROM knn k
    LEFT JOIN lsh_topk l
      ON k.query_id = l.query_id AND k.neighbor_id = l.neighbor_id
    GROUP BY k.query_id
    """,
    doc="Recall@k of the MULTIPROBE kNN LSH tier: q73's single-probe "
        "candidate generation plus Hamming-1 probe expansion on the "
        "query (broadcast) side — the remedy that restored the RELIEF "
        "fit escalation tier's planted-signal property (KAIS kNN "
        "recall 0.964/0.729 -> 1.000). Oracle replays the probe set "
        "with xor() bucket flips; deterministic sign buckets keep the "
        "approximate path exactly checkable.",
)
def q157_knn_lsh_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    inst = _embeddings(spark, sf_dir)
    queries = inst.filter(F.col("id") % 10 == 0)
    exact = knn_join(inst, queries, KNN_K, strategy="sql").select(
        "query_id", "neighbor_id"
    )
    lsh = knn_join(
        inst,
        queries,
        KNN_K,
        strategy="lsh",
        lsh_bits=KNN_LSH_BITS,
        lsh_tables=KNN_LSH_TABLES,
        lsh_multiprobe=True,
    ).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(KNN_K)), 6
            ).alias("recall"),
        )
    )


#: q160: the radius-2 probe mask set (bucket itself, every 1-bit flip,
#: every 2-bit flip) — generated from the same formula as the engine's
#: _candidates_lsh mask list, so the oracle replays the identical
#: probe expansion via xor().
_H2_MASKS = (
    [0]
    + [1 << i for i in range(KNN_LSH_BITS)]
    + [
        (1 << i) | (1 << j)
        for i in range(KNN_LSH_BITS)
        for j in range(i + 1, KNN_LSH_BITS)
    ]
)


@register(
    "q160_knn_lsh_hamming2_recall",
    oracle=f"""
    WITH {_knn_cte(KNN_K, queries_pred="q.id % 10 = 0")},
    bucketed AS (
      SELECT id, t.tbl AS tbl, {_KNN_LSH_BUCKET_BITS} AS bucket
      FROM inst,
           LATERAL (SELECT unnest(generate_series(0, {KNN_LSH_TABLES - 1})) AS tbl) t
    ),
    qprobes AS (
      SELECT id, tbl, xor(bucket, CAST(v.m AS BIGINT)) AS bucket
      FROM bucketed,
           LATERAL (SELECT unnest({_H2_MASKS}) AS m) v
      WHERE id % 10 = 0
    ),
    cands AS (
      SELECT DISTINCT b.id AS query_id, a.id AS neighbor_id
      FROM bucketed a JOIN qprobes b ON a.tbl = b.tbl AND a.bucket = b.bucket
      WHERE a.id <> b.id
    ),
    lsh_pairs AS (
      SELECT c.query_id, c.neighbor_id,
             sqrt(list_sum(list_transform(generate_series(1, len(q.f)),
                  i -> (q.f[i] - x.f[i]) * (q.f[i] - x.f[i])))) AS dist
      FROM cands c JOIN inst q ON q.id = c.query_id JOIN inst x ON x.id = c.neighbor_id
    ),
    lsh_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dist, neighbor_id) AS rnk
        FROM lsh_pairs
      ) WHERE rnk <= {KNN_K}
    )
    SELECT k.query_id,
           CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(l.neighbor_id) / CAST({KNN_K} AS DOUBLE), 6) AS recall
    FROM knn k
    LEFT JOIN lsh_topk l
      ON k.query_id = l.query_id AND k.neighbor_id = l.neighbor_id
    GROUP BY k.query_id
    """,
    doc="Recall@k of the RADIUS-2 multiprobe kNN LSH tier "
        "(knn_join lsh_probe_radius=2, VERDICT r8 #3's escalation "
        "knob): q157's Hamming-1 probe set extended with every 2-bit "
        "bucket flip — the cheapest recall escalation when Hamming-1 "
        "is not enough, still query(broadcast)-side only (x(1 + b + "
        "b(b-1)/2) probe rows, zero extra scan work; candidates only "
        "grow, so recall is monotone in the radius). Oracle replays "
        "the exact mask set via xor() bucket flips.",
)
def q160_knn_lsh_hamming2_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    inst = _embeddings(spark, sf_dir)
    queries = inst.filter(F.col("id") % 10 == 0)
    exact = knn_join(inst, queries, KNN_K, strategy="sql").select(
        "query_id", "neighbor_id"
    )
    lsh = knn_join(
        inst,
        queries,
        KNN_K,
        strategy="lsh",
        lsh_bits=KNN_LSH_BITS,
        lsh_tables=KNN_LSH_TABLES,
        lsh_multiprobe=True,
        lsh_probe_radius=2,
    ).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(KNN_K)), 6
            ).alias("recall"),
        )
    )


# --- A2-A4: RELIEF relevance -------------------------------------------------

_RELIEF_ORACLE = f"""
WITH {_knn_cte(RELIEF_K, RELIEF_QPRED)},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM inst),
priors AS (SELECT lbl, COUNT(*) / total AS prior FROM inst, nn GROUP BY lbl, total),
pairs AS (
  SELECT k.query_id, k.neighbor_id, k.n_label, (k.n_label = k.q_label) AS same_class,
         q.f AS qf, x.f AS nf
  FROM knn k JOIN inst q ON k.query_id = q.id JOIN inst x ON k.neighbor_id = x.id
),
longf AS (
  SELECT u.i - 1 AS feature_idx, n_label, same_class, abs(qf[u.i] - nf[u.i]) AS fdist,
         query_id, neighbor_id
  FROM pairs, LATERAL (SELECT unnest(generate_series(1, len(qf))) AS i) u
),
bins AS (
  SELECT feature_idx, n_label, same_class,
         SUM(CAST(fdist AS DECIMAL(38,18))) AS bin_sum, COUNT(*) AS bin_cnt
  FROM longf GROUP BY 1, 2, 3
),
contrib AS (
  SELECT feature_idx,
         (CASE WHEN same_class THEN -1.0 ELSE 1.0 END) * prior
           * CAST(bin_sum AS DOUBLE) / bin_cnt AS contrib
  FROM bins JOIN priors ON bins.n_label = priors.lbl
),
relevance AS (
  SELECT feature_idx,
         CAST(SUM(CAST(contrib AS DECIMAL(38,18))) AS DOUBLE) AS relevance
  FROM contrib GROUP BY feature_idx
)
"""


@register(
    "q14_relief_relevance",
    oracle=_RELIEF_ORACLE
    + "SELECT feature_idx, ROUND(relevance, 6) AS relevance FROM relevance",
    doc="SURVEY A2-A4: the RELIEF core — per-feature class-bin distance sums "
        "collapsed with class priors (ReliefFRSelector.scala:402-475, 605-629)",
)
def q14_relief_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _pipe(spark, sf_dir)["perfeat"]
    return w.select("feature_idx", F.round("relevance", 6).alias("relevance"))


# --- T3: deterministic ranked top-N -------------------------------------------

@register(
    "q15_relief_topk",
    oracle=_RELIEF_ORACLE
    + f"""
    SELECT feature_idx, ROUND(relevance, 6) AS relevance,
           ROW_NUMBER() OVER (ORDER BY relevance DESC, feature_idx ASC) AS rank
    FROM relevance
    ORDER BY rank LIMIT 10
    """,
    doc="SURVEY T3: takeOrdered by (-relevance, feature_idx) "
        "(ReliefFRSelector.scala:688-690)",
)
def q15_relief_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _pipe(spark, sf_dir)["perfeat"]
    ranked = w.orderBy(F.desc("relevance"), F.asc("feature_idx")).limit(10)
    return ranked.select(
        "feature_idx",
        F.round("relevance", 6).alias("relevance"),
        F.row_number()
        .over(Window.orderBy(F.desc("relevance"), F.asc("feature_idx")))
        .alias("rank"),
    )


_COLLISION_CTE = f"""
longf2 AS (
  SELECT k.query_id, k.neighbor_id, u.i - 1 AS feature_idx,
         abs(q.f[u.i] - x.f[u.i]) AS fdist
  FROM knn k JOIN inst q ON k.query_id = q.id JOIN inst x ON k.neighbor_id = x.id,
       LATERAL (SELECT unnest(generate_series(1, len(q.f))) AS i) u
),
coll AS (
  SELECT query_id, neighbor_id, feature_idx,
         1.0 - LEAST(6.0, fdist) / 6.0 AS vote
  FROM longf2 WHERE fdist <= 1.2
)
"""


# --- A5/P6/F3: marginal collision counts --------------------------------------

@register(
    "q16_collision_marginal",
    oracle=f"""
    WITH {_knn_cte(RELIEF_K, RELIEF_QPRED)},
    {_COLLISION_CTE}
    SELECT feature_idx,
           ROUND(CAST(SUM(CAST(vote AS DECIMAL(38,18))) AS DOUBLE), 6) AS marginal,
           COUNT(*) AS n_collisions
    FROM coll GROUP BY feature_idx
    """,
    doc="SURVEY A5/P6/F3: collision votes 1-min(6,d)/6 under the deterministic "
        "threshold 6*(1-lowerDistanceThreshold)=1.2 (ReliefFRSelector.scala:417,431; "
        "threshold de-randomized per SURVEY §8.3)",
)
def q16_collision_marginal(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pipe(spark, sf_dir)["perfeat"]
    return p.select(
        "feature_idx", F.round("marginal", 6).alias("marginal"), "n_collisions"
    )


# --- A6: joint (pairwise) collision counts — the redundancy COO ----------------

@register(
    "q17_collision_joint",
    oracle=f"""
    WITH {_knn_cte(RELIEF_K, RELIEF_QPRED)},
    {_COLLISION_CTE},
    paired AS (
      SELECT a.feature_idx AS f1, b.feature_idx AS f2, (a.vote + b.vote) / 2.0 AS jv
      FROM coll a JOIN coll b
        ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
      WHERE a.feature_idx <> b.feature_idx
        AND a.feature_idx < {len(JOINT_TOP)}
    ),
    both_dir AS (
      SELECT f1, f2, jv FROM paired
      UNION ALL
      SELECT f2 AS f1, f1 AS f2, jv FROM paired
    )
    SELECT f1, f2,
           ROUND(CAST(SUM(CAST(jv AS DECIMAL(38,18))) AS DOUBLE), 6) AS joint
    FROM both_dir GROUP BY f1, f2
    """,
    doc="SURVEY A6: symmetric joint co-occurrence COO restricted to a "
        "topFeatures scope (ReliefFRSelector.scala:449-457; current-pair votes "
        "per SURVEY §8.4)",
)
def q17_collision_joint(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _pipe(spark, sf_dir)["joint"]
    return j.select("f1", "f2", F.round("joint", 6).alias("joint"))


# --- T5/A10: the greedy redundancy selection, oracle-gated ---------------------

GREEDY_K = 5  # unrolled greedy picks (each pick is one CTE pair below)


def _greedy_step_sql(step: int) -> str:
    """One unrolled greedy round (VERDICT r5 #3, the q142 fixed-k
    iteration trick): ``s{n}`` is the arg-max pick over the previous
    state's scores, ``st{n}`` the state after charging the pick's
    redundancy row onto every still-valid feature it touches — the
    exact recurrence of ``greedy_select`` (operators/relief.py:615,
    mirroring FeatureScore.update/score, ReliefFRSelector.scala:
    741-760): a per-feature update COUNTER (not a global round count),
    score = rel - acc/upd only once a feature has been charged, ties
    to the lowest feature index.
    """
    prev = "rel0" if step == 1 else f"st{step - 1}"
    # AS MATERIALIZED throughout: each st references its predecessor
    # ~3x (the pick's scalar subquery twice + the state join); inlined,
    # DuckDB would re-evaluate the whole upstream kNN chain ~3^k times
    # (measured: ~113s at sf0.001 inlined vs ~2s materialized).
    acc = (
        "COALESCE(c.redundancy, 0.0)"
        if step == 1
        else "t.acc + COALESCE(c.redundancy, 0.0)"
    )
    upd = (
        "CASE WHEN c.f2 IS NULL THEN 0 ELSE 1 END"
        if step == 1
        else "t.upd + (CASE WHEN c.f2 IS NULL THEN 0 ELSE 1 END)"
    )
    score = (
        "t.rel"
        if step == 1
        else "(CASE WHEN t.upd > 0 THEN t.rel - t.acc / t.upd ELSE t.rel END)"
    )
    return f"""
s{step} AS MATERIALIZED (
  SELECT t.feature_idx FROM {prev} t
  ORDER BY {score} DESC, t.feature_idx ASC LIMIT 1
),
st{step} AS MATERIALIZED (
  SELECT t.feature_idx, t.rel, {acc} AS acc, {upd} AS upd
  FROM {prev} t
  LEFT JOIN red c ON c.f1 = (SELECT feature_idx FROM s{step})
                 AND c.f2 = t.feature_idx
  WHERE t.feature_idx <> (SELECT feature_idx FROM s{step})
)"""


@register(
    "q72b_relief_greedy_topk",
    oracle=f"""
    WITH {_knn_cte(RELIEF_K, RELIEF_QPRED)},
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM inst),
    priors AS (SELECT lbl, COUNT(*) / total AS prior FROM inst, nn GROUP BY lbl, total),
    pairs AS (
      SELECT k.query_id, k.neighbor_id, k.n_label, (k.n_label = k.q_label) AS same_class,
             q.f AS qf, x.f AS nf
      FROM knn k JOIN inst q ON k.query_id = q.id JOIN inst x ON k.neighbor_id = x.id
    ),
    longf AS (
      SELECT u.i - 1 AS feature_idx, n_label, same_class, abs(qf[u.i] - nf[u.i]) AS fdist
      FROM pairs, LATERAL (SELECT unnest(generate_series(1, len(qf))) AS i) u
    ),
    binsums AS (
      SELECT feature_idx, n_label, same_class,
             SUM(CAST(fdist AS DECIMAL(38,18))) AS bin_sum, COUNT(*) AS bin_cnt
      FROM longf GROUP BY 1, 2, 3
    ),
    contrib AS (
      SELECT feature_idx,
             (CASE WHEN same_class THEN -1.0 ELSE 1.0 END) * prior
               * CAST(bin_sum AS DOUBLE) / bin_cnt AS contrib
      FROM binsums JOIN priors ON binsums.n_label = priors.lbl
    ),
    relevance AS (
      SELECT feature_idx,
             CAST(SUM(CAST(contrib AS DECIMAL(38,18))) AS DOUBLE) AS relevance
      FROM contrib GROUP BY feature_idx
    ),
    extrema AS (SELECT MIN(relevance) AS mn, MAX(relevance) AS mx FROM relevance),
    rel0 AS MATERIALIZED (
      SELECT feature_idx,
             CASE WHEN mx > mn THEN (relevance - mn) / (mx - mn) ELSE 0.0 END AS rel
      FROM relevance, extrema
    ),
    npairs AS (SELECT CAST(COUNT(*) AS DOUBLE) AS np FROM knn),
    {_COLLISION_CTE.lstrip().rstrip()},
    marg AS (
      SELECT feature_idx,
             CAST(SUM(CAST(vote AS DECIMAL(38,18))) AS DOUBLE) AS marginal
      FROM coll GROUP BY feature_idx
    ),
    jpaired AS (
      SELECT a.feature_idx AS f1, b.feature_idx AS f2, (a.vote + b.vote) / 2.0 AS jv
      FROM coll a JOIN coll b
        ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
      WHERE a.feature_idx <> b.feature_idx
        AND a.feature_idx < {len(JOINT_TOP)}
    ),
    jboth AS (
      SELECT f1, f2, jv FROM jpaired
      UNION ALL
      SELECT f2 AS f1, f1 AS f2, jv FROM jpaired
    ),
    joint AS (
      SELECT f1, f2, CAST(SUM(CAST(jv AS DECIMAL(38,18))) AS DOUBLE) AS joint
      FROM jboth GROUP BY f1, f2
    ),
    red_raw AS (
      SELECT j.f1, j.f2,
             CASE WHEN m1.marginal * m2.marginal = 0.0 THEN 0.0
                  ELSE (j.joint / np)
                       * log2((j.joint / np)
                              / ((m1.marginal / np) * (m2.marginal / np)))
             END AS rr
      FROM joint j, npairs
      JOIN marg m1 ON j.f1 = m1.feature_idx
      JOIN marg m2 ON j.f2 = m2.feature_idx
    ),
    rex AS (SELECT MIN(rr) AS mn2, MAX(rr) AS mx2 FROM red_raw),
    red AS MATERIALIZED (
      SELECT f1, f2,
             CASE WHEN mx2 = mn2 THEN 0.0
                  ELSE (rr - mn2) / (mx2 - mn2) END AS redundancy
      FROM red_raw, rex
    ),
    {",".join(_greedy_step_sql(i) for i in range(1, GREEDY_K + 1))},
    picks AS (
      {" UNION ALL ".join(f"SELECT {i} AS rank, feature_idx FROM s{i}" for i in range(1, GREEDY_K + 1))}
    )
    SELECT p.rank, p.feature_idx, ROUND(r.rel, 6) AS relevance
    FROM picks p JOIN rel0 r USING (feature_idx)
    ORDER BY p.rank
    """,
    doc="SURVEY T5 + A10, oracle-gated (VERDICT r5 #3): the greedy "
        "relevance-vs-redundancy selection — min-maxed RELIEF relevance, "
        "MI-transformed + min-maxed redundancy COO (computeRedudancy, "
        "ReliefFRSelector.scala:645-676), then selectFeatures' "
        "sequential arg-max (:685-732) with the per-feature update "
        "counter (:757-760) — unrolled to a fixed GREEDY_K picks so the "
        "whole dataflow, greedy loop included, is ONE DuckDB SQL. "
        "Exercises the real operators (mi_redundancy + greedy_select) "
        "on the q14-q17 pipeline frames; q72's remaining rows-only gap "
        "is now just the engine-seeded multi-batch loop.",
)
def q72b_relief_greedy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from spark_relieffc_fselection_spark.operators.relief import (
        greedy_select,
        mi_redundancy,
    )

    p = _pipe(spark, sf_dir)
    perfeat, joint, n_pairs = p["perfeat"], p["joint"], p["n_pairs"]
    rows = perfeat.collect()  # nFeat rows — driver-sized by construction
    n_feat = 1 + max(r["feature_idx"] for r in rows)
    rel = np.zeros(n_feat)
    for r in rows:
        rel[int(r["feature_idx"])] = float(r["relevance"])
    mn, mx = float(rel.min()), float(rel.max())
    rel = (rel - mn) / (mx - mn) if mx > mn else np.zeros(n_feat)
    red_df = mi_redundancy(
        joint,
        perfeat.select("feature_idx", "marginal"),
        float(n_pairs),
        float(n_pairs),
    )
    coo = {
        (int(r["f1"]), int(r["f2"])): float(r["redundancy"])
        for r in red_df.collect()
    }
    sel = greedy_select(rel, coo, GREEDY_K)
    out = [(i + 1, int(f), round(float(rel[f]), 6)) for i, f in enumerate(sel)]
    return spark.createDataFrame(out, "rank int, feature_idx int, relevance double")


SPARSE_ABS_MIN = 0.15  # deterministic sparsifier threshold on |coord|
SPARSE_K = 30
SPARSE_QUERY_MOD = 10  # deterministic 1-in-10 query sample (estimationRatio analogue)


@register(
    "q44_sparse_relief_relevance",
    oracle=f"""
    WITH {_INST},
    long AS (
      SELECT id, u.i - 1 AS feature_idx, f[u.i] AS value
      FROM inst, LATERAL (SELECT unnest(generate_series(1, len(f))) AS i) u
      WHERE abs(f[u.i]) > {SPARSE_ABS_MIN}
    ),
    sq AS (
      SELECT id, CAST(SUM(CAST(value * value AS DECIMAL(38,18))) AS DOUBLE) AS sq_norm
      FROM long GROUP BY id
    ),
    norms AS (
      SELECT i.id, i.lbl, COALESCE(sq.sq_norm, 0.0) AS sq_norm
      FROM inst i LEFT JOIN sq USING (id)
    ),
    dots AS (
      SELECT a.id AS query_id, b.id AS neighbor_id,
             CAST(SUM(CAST(a.value * b.value AS DECIMAL(38,18))) AS DOUBLE) AS dot
      FROM long a JOIN long b ON a.feature_idx = b.feature_idx
      WHERE a.id % {SPARSE_QUERY_MOD} = 0
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT nq.id AS query_id, nq.lbl AS q_label,
             nn.id AS neighbor_id, nn.lbl AS n_label,
             sqrt(greatest(nq.sq_norm + nn.sq_norm - 2.0 * COALESCE(d.dot, 0.0), 0.0)) AS dist
      FROM norms nq JOIN norms nn ON nq.id <> nn.id
      LEFT JOIN dots d ON d.query_id = nq.id AND d.neighbor_id = nn.id
      WHERE nq.id % {SPARSE_QUERY_MOD} = 0
    ),
    knn AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rnk
        FROM grid
      ) WHERE rnk <= {SPARSE_K}
    ),
    pairs AS (
      SELECT query_id, neighbor_id, n_label, (q_label = n_label) AS same_class FROM knn
    ),
    qside AS (
      SELECT p.query_id, p.neighbor_id, l.feature_idx, l.value AS q_val
      FROM pairs p JOIN long l ON l.id = p.query_id
    ),
    nside AS (
      SELECT p.query_id, p.neighbor_id, l.feature_idx, l.value AS n_val
      FROM pairs p JOIN long l ON l.id = p.neighbor_id
    ),
    merged AS (
      SELECT COALESCE(q.query_id, n.query_id) AS query_id,
             COALESCE(q.neighbor_id, n.neighbor_id) AS neighbor_id,
             COALESCE(q.feature_idx, n.feature_idx) AS feature_idx,
             abs(COALESCE(q.q_val, 0.0) - COALESCE(n.n_val, 0.0)) AS fdist
      FROM qside q FULL JOIN nside n
        ON q.query_id = n.query_id AND q.neighbor_id = n.neighbor_id
       AND q.feature_idx = n.feature_idx
    ),
    lp AS (
      SELECT m.feature_idx, m.fdist, p.n_label, p.same_class
      FROM merged m JOIN pairs p USING (query_id, neighbor_id)
    ),
    pair_counts AS (
      SELECT n_label, same_class, COUNT(*) AS bin_cnt FROM pairs GROUP BY 1, 2
    ),
    priors AS (
      SELECT lbl AS n_label,
             COUNT(*) / CAST((SELECT COUNT(*) FROM inst) AS DOUBLE) AS prior
      FROM inst GROUP BY lbl
    ),
    bin_sums AS (
      SELECT feature_idx, n_label, same_class,
             SUM(CAST(fdist AS DECIMAL(38,18))) AS bin_sum
      FROM lp GROUP BY 1, 2, 3
    ),
    contrib AS (
      SELECT feature_idx,
             (CASE WHEN same_class THEN -1.0 ELSE 1.0 END) * prior
               * CAST(bin_sum AS DOUBLE) / bin_cnt AS c
      FROM bin_sums
      JOIN pair_counts USING (n_label, same_class)
      JOIN priors USING (n_label)
    )
    SELECT feature_idx,
           ROUND(CAST(SUM(CAST(c AS DECIMAL(38,18))) AS DOUBLE), 6) AS relevance
    FROM contrib GROUP BY feature_idx
    """,
    doc="Sparse-path RELIEF relevance end-to-end (relief_sparse.py: "
        "inverted-index kNN via decimal-exact norm expansion, full-outer "
        "union-of-active pair explode, shared bin collapse — "
        "ReliefFRSelector.scala:483-602 semantics with corrected feature "
        "indexing per SURVEY §8.1). Sparsifier keeps |x| > 1 — "
        "deterministic, so the whole dataflow is SQL-oracle-able.",
)
def q44_sparse_relief_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.relief_sparse import (
        _pair_bin_counts,
        sparse_knn_join,
        sparse_pair_feature_table,
        to_long_form,
    )

    inst = _embeddings(spark, sf_dir)
    sparse = inst.select(
        "id",
        F.transform(
            "features",
            lambda x: F.when(F.abs(x) > SPARSE_ABS_MIN, x).otherwise(F.lit(0.0)),
        ).alias("features"),
        "label",
    )
    long_df, labels = to_long_form(sparse)
    long_df, labels = long_df.cache(), labels.cache()
    query_ids = labels.select("id").filter(F.col("id") % SPARSE_QUERY_MOD == 0)
    # ONE job for the priors (sum of label counts == total); it fills
    # the LABELS cache. The long cache needs its own materialization:
    # the priors job never touches long_df, and the kNN job consumes it
    # from four concurrent subplans (dots' both sides, norms, probe) —
    # racing consumers each recompute unfilled cached partitions, so
    # without this the sparsify+explode ran 4x (caught by the
    # duplicate-subtree plan scan).
    label_rows = labels.groupBy("label").agg(F.count("*").alias("n")).collect()
    long_df.count()
    n_inst = sum(r["n"] for r in label_rows)
    priors = {float(r["label"]): r["n"] / n_inst for r in label_rows}
    # Cache + materialize the tiny neighbor table: it feeds the pair
    # explode THREE times (q-side, n-side, final label join) plus the
    # pair-count aggregation — uncached, the whole inverted-index kNN
    # subplan (grid cross-join + rank window) would re-execute per
    # consumer.
    # probe=False: the |x| > 0.15 sparsifier leaves ~25% density, so
    # the bottom-norm probe would escalate; go straight to the grid.
    neigh = sparse_knn_join(
        long_df, labels, query_ids, SPARSE_K, num_corpus=n_inst, probe=False
    ).cache()
    neigh.count()
    lp = sparse_pair_feature_table(long_df, labels, neigh)
    pair_counts = _pair_bin_counts(neigh, labels)
    w = relevance_weights(lp, priors, pair_counts=pair_counts)
    out = localize(
        w.select("feature_idx", F.round("relevance", 6).alias("relevance"))
    )
    neigh.unpersist()
    long_df.unpersist()
    labels.unpersist()
    return out


# --- Discretization front end (ml/discretizer.py) ---------------------------

DISC_BINS = 4

#: q105: MDLP recursion depth checked by the oracle. The engine's
#: level-synchronous loop is SQL-expressible by UNROLLING one CTE
#: block per level; depth 2 (up to 3 cuts/feature) exercises the full
#: criterion — candidate midpoints, entropy gain, the MDL accept test,
#: AND the interval re-assignment between levels — while keeping the
#: oracle a single readable statement. Unbounded depth is pytest-pinned
#: against an independent recursive numpy reference
#: (tests/test_discretizer.py::test_mdlp_matches_numpy_reference).
MDLP_ORACLE_DEPTH = 2


#: q105's six constructed class labels (the label formula below yields
#: exactly 0..5); the oracle pivots them to columns so the entropy-term
#: chains add in the same fixed ascending-label order as the engine's
#: row-level expressions — bit-identical doubles without decimal.
_MDLP_K = 6


def _mdlp_chain(term_fmt: str) -> str:
    """Fixed left-to-right chain over the pivoted class columns.
    ``term_fmt`` uses ``{j}`` for the class index."""
    return " + ".join(term_fmt.format(j=j) for j in range(_MDLP_K))


def _mdlp_level_sql(lvl: int) -> str:
    """cand/sc/ev/pick CTE block for one MDLP level, reading w{lvl}
    (one row per (feature, iv, val), integer window sums w{j}/t{j} per
    class — exact regardless of order).

    Float-op ORDER mirrors ml/discretizer.fit_mdlp_edges exactly: the
    entropy-term chains add in ascending label order (absent classes
    contribute +0.0, which never perturbs an IEEE partial sum), and
    gain = ent - a*ent1 - b*ent2 left-to-right; thresh adds delta as
    one parenthesized term. Accept decisions can only diverge on
    sub-ulp log2 boundary ties."""
    wterm = ("CASE WHEN w{j} > 0 THEN CAST(w{j} AS DOUBLE) * "
             "log2(CAST(w{j} AS DOUBLE)) ELSE 0.0 END")
    tterm = ("CASE WHEN t{j} > 0 THEN CAST(t{j} AS DOUBLE) * "
             "log2(CAST(t{j} AS DOUBLE)) ELSE 0.0 END")
    rterm = ("CASE WHEN t{j} - w{j} > 0 THEN CAST(t{j} - w{j} AS DOUBLE) * "
             "log2(CAST(t{j} - w{j} AS DOUBLE)) ELSE 0.0 END")
    return f"""
cand{lvl} AS (
  SELECT feature, iv, val,
         CAST({_mdlp_chain("w{j}")} AS BIGINT) AS n1,
         CAST({_mdlp_chain("t{j}")} AS BIGINT) AS n,
         {_mdlp_chain(wterm)} AS s1,
         {_mdlp_chain(tterm)} AS s,
         {_mdlp_chain(rterm)} AS s2,
         CAST({_mdlp_chain("(CASE WHEN w{j} > 0 THEN 1 ELSE 0 END)")} AS BIGINT) AS k1,
         CAST({_mdlp_chain("(CASE WHEN t{j} > 0 THEN 1 ELSE 0 END)")} AS BIGINT) AS k,
         CAST({_mdlp_chain("(CASE WHEN t{j} - w{j} > 0 THEN 1 ELSE 0 END)")} AS BIGINT) AS k2
  FROM w{lvl}
),
sc{lvl} AS (
  SELECT feature, iv,
         (val + LEAD(val) OVER (PARTITION BY feature, iv ORDER BY val)) / 2 AS cut,
         n, n1, s, s1, s2, k, k1, k2
  FROM cand{lvl}
),
ev{lvl} AS (
  SELECT feature, iv, cut,
         ent - (n1d / nd) * ent1 - (n2d / nd) * ent2 AS gain,
         (log2(nd - 1.0)
          + (log2(pow(3.0, kd) - 2.0)
             - (kd * ent - k1d * ent1 - k2d * ent2))) / nd AS thresh
  FROM (
    SELECT feature, iv, cut,
           CAST(n AS DOUBLE) AS nd, CAST(n1 AS DOUBLE) AS n1d,
           CAST(n - n1 AS DOUBLE) AS n2d,
           CAST(k AS DOUBLE) AS kd, CAST(k1 AS DOUBLE) AS k1d,
           CAST(k2 AS DOUBLE) AS k2d,
           log2(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE) AS ent,
           log2(CAST(n1 AS DOUBLE)) - s1 / CAST(n1 AS DOUBLE) AS ent1,
           log2(CAST(n - n1 AS DOUBLE)) - s2 / CAST(n - n1 AS DOUBLE) AS ent2
    FROM sc{lvl} WHERE cut IS NOT NULL AND n1 > 0 AND n > n1
  )
),
pick{lvl} AS (
  SELECT feature, iv, cut FROM (
    SELECT feature, iv, cut, gain, thresh,
           ROW_NUMBER() OVER (PARTITION BY feature, iv
                              ORDER BY gain DESC, cut ASC) AS rn
    FROM ev{lvl}
  ) WHERE rn = 1 AND gain > thresh
)"""


#: q105 label: constructed from the embedding itself (identically in
#: both engines) because every label column in the synthetic testdata
#: is independent of every feature — real data has supervision, this
#: corpus doesn't, and a 0-row oracle would gate nothing. The 6-class
#: tier (two thresholds on feature 0, one on feature 8) makes feature
#: 0 need TWO cuts (level-2 recursion accepts) and feature 8 one,
#: while the other 62 features exercise the MDL rejection path.
_MDLP_INST = """
inst AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS f,
         CAST(CAST(CAST(embedding AS DOUBLE[])[1] > -0.1 AS INT)
              + CAST(CAST(embedding AS DOUBLE[])[1] > 0.1 AS INT)
              + 3 * CAST(CAST(embedding AS DOUBLE[])[9] > 0 AS INT)
              AS DOUBLE) AS lbl
  FROM embeddings
)
"""

_MDLP_ORACLE = f"""
WITH {_MDLP_INST},
long AS (
  SELECT u.i - 1 AS feature, f[u.i] AS val, lbl
  FROM inst, LATERAL (SELECT unnest(generate_series(1, len(f))) AS i) u
),
grid AS (
  SELECT feature, val,
         {", ".join(f"SUM(CASE WHEN lbl = {j}.0 THEN 1 ELSE 0 END) AS c{j}" for j in range(_MDLP_K))}
  FROM long GROUP BY feature, val
),
w1 AS (
  SELECT feature, 0 AS iv, val,
         {", ".join(f"SUM(c{j}) OVER (PARTITION BY feature ORDER BY val) AS w{j}" for j in range(_MDLP_K))},
         {", ".join(f"SUM(c{j}) OVER (PARTITION BY feature) AS t{j}" for j in range(_MDLP_K))}
  FROM grid
),
{_mdlp_level_sql(1)},
a2 AS (
  SELECT g.*,
         CASE WHEN p.cut IS NOT NULL AND g.val > p.cut THEN 1 ELSE 0 END AS iv
  FROM grid g LEFT JOIN pick1 p ON p.feature = g.feature
),
w2 AS (
  SELECT feature, iv, val,
         {", ".join(f"SUM(c{j}) OVER (PARTITION BY feature, iv ORDER BY val) AS w{j}" for j in range(_MDLP_K))},
         {", ".join(f"SUM(c{j}) OVER (PARTITION BY feature, iv) AS t{j}" for j in range(_MDLP_K))}
  FROM a2
),
{_mdlp_level_sql(2)},
allcuts AS (
  SELECT feature, cut FROM pick1
  UNION ALL
  SELECT feature, cut FROM pick2
)
SELECT feature,
       ROW_NUMBER() OVER (PARTITION BY feature ORDER BY cut) AS cut_rank,
       ROUND(cut, 6) AS cut
FROM allcuts
"""


@register(
    "q105_mdlp_discretize",
    oracle=_MDLP_ORACLE,
    doc="Fayyad-Irani MDLP discretization (ml/discretizer.fit_mdlp_edges "
        "— the reference's contracted spark-MDLP-discretization front "
        "end, pom.xml:30-35) at depth 2 over the embeddings features: "
        "supervised entropy-gain cuts accepted by the MDL criterion. "
        "The oracle unrolls the level-synchronous recursion as one CTE "
        "block per level. Scale: one (feature, value, label) histogram "
        "shuffle, then every level is windows + a tiny aggregate over "
        "the compacted grid; accepted cuts per level are O(features x "
        "intervals) rows.",
)
def q105_mdlp_discretize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.ml.discretizer import fit_mdlp_edges

    f = F.col("features")
    inst = _embeddings(spark, sf_dir).withColumn(
        "label",
        (
            (F.element_at(f, 1) > -0.1).cast("int")
            + (F.element_at(f, 1) > 0.1).cast("int")
            + 3 * (F.element_at(f, 9) > 0).cast("int")
        ).cast("double"),
    )
    # The oracle models the UNCAPPED recursion; the in-operator grid
    # cap (tested in test_discretizer) must therefore not fire here —
    # if the data ever grows past the cap, fail with a diagnostic
    # instead of hash-diverging silently.
    cap_report: dict[int, int] = {}
    edges = fit_mdlp_edges(
        inst, features_col="features", label_col="label",
        max_depth=MDLP_ORACLE_DEPTH, cap_report=cap_report,
    )
    if cap_report:
        raise ValueError(
            "q105's oracle models the uncapped MDLP recursion but the "
            f"grid cap fired for features {sorted(cap_report)} — raise "
            "max_candidates here or re-derive the oracle with the cap"
        )
    rows = [
        (f, i + 1, round(float(c), 6))
        for f, fc in enumerate(edges)
        for i, c in enumerate(fc)
    ]
    return spark.createDataFrame(rows, "feature int, cut_rank int, cut double")


@register(
    "q93_quantile_discretize",
    oracle=f"""
    WITH {_INST},
    long AS (
      SELECT id, u.i - 1 AS feature, f[u.i] AS val
      FROM inst,
           LATERAL (SELECT unnest(generate_series(1, len(f))) AS i) u
    ),
    edges AS (
      SELECT feature,
             list_sort(list_distinct(
               quantile_cont(val, [0.25, 0.5, 0.75]))) AS es
      FROM long GROUP BY feature
    )
    SELECT l.feature,
           CAST(len(list_filter(e.es, x -> l.val > x)) AS INT) AS bin,
           COUNT(*) AS n_values
    FROM long l JOIN edges e USING (feature)
    GROUP BY l.feature, bin
    """,
    doc="Quantile discretization audit: fit per-feature exact quartile "
        "edges (ml/discretizer.fit_quantile_edges — the engine's "
        "stand-in for the reference's spark-MDLP-discretization "
        "companion, pom.xml:30-35), bin every value with the pure-"
        "Catalyst literal-edge transform, report per-(feature, bin) "
        "population. Scale: the fit shuffles one percentile sketch per "
        "feature (approx method at 100 TB), the transform is per-row "
        "array arithmetic with zero shuffle.",
)
def q93_quantile_discretize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.ml.discretizer import (
        apply_bin_edges,
        fit_quantile_edges,
    )

    inst = _embeddings(spark, sf_dir)
    edges = fit_quantile_edges(
        inst, num_bins=DISC_BINS, features_col="features", method="exact"
    )
    binned = apply_bin_edges(inst, edges, features_col="features")
    return (
        binned.select(F.posexplode("features").alias("feature", "bin"))
        .groupBy("feature", F.col("bin").cast("int").alias("bin"))
        .agg(F.count("*").alias("n_values"))
    )


# --- q72c: the FULL batched fit under one oracle (hash batching) --------------

Q72C_NEIGH = 3
Q72C_TOP = 5            # = GREEDY_K picks; lower_feat = max(5, 3*5) = 15
Q72C_LOWER_FEAT = 15


def _q72c_batch_cte(b: int) -> str:
    """One fit batch (id % 2 = b): within-batch kNN -> pair bins ->
    raw relevance, collision votes, marginal mass, pair count. Mirrors
    fit_relief's per-batch dataflow (operators/relief.py:756-841)
    with the batching='hash' split."""
    return f"""
b{b}_inst AS MATERIALIZED (SELECT id, f, lbl FROM sinst WHERE id % 2 = {b}),
b{b}_knn AS MATERIALIZED (
  SELECT query_id, q_label, neighbor_id, n_label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY dist, neighbor_id) AS rnk
    FROM (
      SELECT q.id AS query_id, q.lbl AS q_label,
             x.id AS neighbor_id, x.lbl AS n_label,
             sqrt(list_sum(list_transform(generate_series(1, len(q.f)),
                  i -> (q.f[i] - x.f[i]) * (q.f[i] - x.f[i])))) AS dist
      FROM b{b}_inst q JOIN b{b}_inst x ON q.id <> x.id
    )
  ) WHERE rnk <= {Q72C_NEIGH} * (SELECT COUNT(DISTINCT lbl) FROM inst)
),
b{b}_longf AS (
  SELECT k.n_label, (k.n_label = k.q_label) AS same_class,
         u.i - 1 AS feature_idx, abs(q.f[u.i] - x.f[u.i]) AS fdist,
         k.query_id, k.neighbor_id
  FROM b{b}_knn k JOIN b{b}_inst q ON k.query_id = q.id
                  JOIN b{b}_inst x ON k.neighbor_id = x.id,
       LATERAL (SELECT unnest(generate_series(1, len(q.f))) AS i) u
),
b{b}_paircnt AS (
  SELECT n_label, (n_label = q_label) AS same_class, COUNT(*) AS bin_cnt
  FROM b{b}_knn GROUP BY 1, 2
),
b{b}_bins AS MATERIALIZED (
  SELECT feature_idx, n_label, same_class,
         SUM(CAST(fdist AS DECIMAL(38,18))) AS bin_sum
  FROM b{b}_longf GROUP BY 1, 2, 3
),
b{b}_w AS MATERIALIZED (
  SELECT feature_idx,
         CAST(SUM(CAST((CASE WHEN same_class THEN -1.0 ELSE 1.0 END) * prior
              * CAST(bin_sum AS DOUBLE) / bin_cnt AS DECIMAL(38,18)))
              AS DOUBLE) AS relevance
  FROM b{b}_bins
  JOIN b{b}_paircnt USING (n_label, same_class)
  JOIN priors ON b{b}_bins.n_label = priors.lbl
  GROUP BY feature_idx
),
b{b}_coll AS MATERIALIZED (
  SELECT query_id, neighbor_id, feature_idx,
         1.0 - LEAST(6.0, fdist) / 6.0 AS vote
  FROM b{b}_longf WHERE fdist <= 1.2
),
b{b}_marg AS (
  SELECT feature_idx,
         CAST(SUM(CAST(vote AS DECIMAL(38,18))) AS DOUBLE) AS marginal
  FROM b{b}_coll GROUP BY feature_idx
),
b{b}_np AS (SELECT CAST(COUNT(*) AS DOUBLE) AS np FROM b{b}_knn)"""


#: q72c instance pre-filter: a deterministic 1-in-4 slice (ids = 0,1
#: mod 8) that keeps BOTH parities so the id%2 hash split below yields
#: two non-empty batches; sizes the fit like q72's 0.25 sample.
Q72C_PRED = "vec_id % 8 < 2"


#: Shared by q72c (dense batched fit) and q158 (sparse batched fit):
#: on the zero-free embeddings table the sparse long form is total, so
#: both fits are bit-for-bit the same dataflow (pinned by
#: tests/test_relief_sparse.py::test_sparse_batched_fit_matches_dense_
#: hash_batched) and one oracle gates both engines' loops.
#: q158 instance pre-filter: a 1-in-8 slice, SAME dataflow as q72c on
#: a smaller set — the sparse plan's per-pair explode and inverted-
#: index joins are the engine's most expensive shapes on DENSE data
#: (their worst case: every pair shares every feature), so the
#: correctness gate runs on a quarter of q72c's pairs.
Q158_PRED = "vec_id % 16 < 2"

#: jointTotal discount factor, parameterized per fit config (ADVICE
#: r8): the engine computes jointTotal = totalPairs * (1 -
#: estimationRatio * batchPerc) (operators/relief.py, mirroring
#: computeRedudancy, ReliefFRSelector.scala:641-642). With 2 hash
#: batches batchPerc = 0.5, so q72c/q158 (ratio 1.0) discount by 0.5
#: while q72d (ratio 0.5) discounts by 1 - 0.25 = 0.75. The oracle
#: must replay the ratio-dependent value: the 1.5x jprob scale is a
#: NON-affine change to the MI transform, so a hard-coded 0.5 would
#: gate q72d only coincidentally (greedy picks happening to agree).
_JT_FULL = "0.5"    # estimationRatio = 1.0, 2 batches
_JT_SAMPLED = "0.75"  # estimationRatio = 0.5, 2 batches

_Q72C_ORACLE = f"""
    WITH inst AS MATERIALIZED (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS f,
             CAST(label AS DOUBLE) AS lbl
      FROM embeddings WHERE __PRED__
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM inst),
    priors AS (SELECT lbl, COUNT(*) / total AS prior FROM inst, nn
               GROUP BY lbl, total),
    sinst AS MATERIALIZED (SELECT id, f, lbl FROM inst WHERE __SAMPLE__),
    {_q72c_batch_cte(0)},
    {_q72c_batch_cte(1)},
    top15 AS MATERIALIZED (
      SELECT feature_idx FROM b0_w
      ORDER BY relevance DESC, feature_idx ASC LIMIT {Q72C_LOWER_FEAT}
    ),
    b1_jp AS (
      SELECT a.feature_idx AS f1, b.feature_idx AS f2,
             (a.vote + b.vote) / 2.0 AS jv
      FROM b1_coll a JOIN b1_coll b
        ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
      WHERE a.feature_idx <> b.feature_idx
        AND a.feature_idx IN (SELECT feature_idx FROM top15)
    ),
    joint AS MATERIALIZED (
      SELECT f1, f2,
             CAST(SUM(CAST(jv AS DECIMAL(38,18))) AS DOUBLE) AS joint
      FROM (SELECT f1, f2, jv FROM b1_jp
            UNION ALL SELECT f2 AS f1, f1 AS f2, jv FROM b1_jp)
      GROUP BY f1, f2
    ),
    marg AS MATERIALIZED (
      SELECT COALESCE(a.feature_idx, b.feature_idx) AS feature_idx,
             COALESCE(a.marginal, 0.0) + COALESCE(b.marginal, 0.0) AS marginal
      FROM b0_marg a FULL JOIN b1_marg b USING (feature_idx)
    ),
    ntot AS (SELECT (SELECT np FROM b0_np) + (SELECT np FROM b1_np) AS np),
    red_raw AS (
      SELECT j.f1, j.f2,
             CASE WHEN m1.marginal * m2.marginal = 0.0 THEN 0.0
                  ELSE (j.joint / (np * __JT__))
                       * log2((j.joint / (np * __JT__))
                              / ((m1.marginal / np) * (m2.marginal / np)))
             END AS rr
      FROM joint j, ntot
      JOIN marg m1 ON j.f1 = m1.feature_idx
      JOIN marg m2 ON j.f2 = m2.feature_idx
    ),
    rex AS (SELECT MIN(rr) AS mn2, MAX(rr) AS mx2 FROM red_raw),
    red AS MATERIALIZED (
      SELECT f1, f2,
             CASE WHEN mx2 = mn2 THEN 0.0
                  ELSE (rr - mn2) / (mx2 - mn2) END AS redundancy
      FROM red_raw, rex
    ),
    relsum AS (
      SELECT COALESCE(a.feature_idx, b.feature_idx) AS feature_idx,
             COALESCE(a.relevance, 0.0) + COALESCE(b.relevance, 0.0) AS raw
      FROM b0_w a FULL JOIN b1_w b USING (feature_idx)
    ),
    extrema AS (SELECT MIN(raw) AS mn, MAX(raw) AS mx FROM relsum),
    rel0 AS MATERIALIZED (
      SELECT feature_idx,
             CASE WHEN mx > mn THEN (raw - mn) / (mx - mn) ELSE 0.0 END AS rel
      FROM relsum, extrema
    ),
    {",".join(_greedy_step_sql(i) for i in range(1, Q72C_TOP + 1))},
    picks AS (
      {" UNION ALL ".join(f"SELECT {i} AS rank, feature_idx FROM s{i}" for i in range(1, Q72C_TOP + 1))}
    ),
    stdr AS (
      SELECT feature_idx, rel,
             ROW_NUMBER() OVER (ORDER BY rel DESC, feature_idx ASC) AS rank
      FROM rel0 ORDER BY rank LIMIT {Q72C_TOP}
    )
    SELECT r.rank, r.feature_idx AS std_feature,
           ROUND(r.rel, 6) AS std_relevance,
           p.feature_idx AS redundancy_feature,
           ROUND(g.rel, 6) AS redundancy_relevance
    FROM stdr r JOIN picks p USING (rank)
    JOIN rel0 g ON g.feature_idx = p.feature_idx
    ORDER BY r.rank
    """


@register(
    "q72c_relief_fit_hash_batched",
    oracle=_Q72C_ORACLE.replace("__PRED__", Q72C_PRED)
    .replace("__SAMPLE__", "TRUE")
    .replace("__JT__", _JT_FULL),
    doc="THE FLAGSHIP, fully oracle-gated: the complete batched fit — "
        "deterministic hash split into 2 batches, per-batch within-"
        "batch kNN + class-bin relevance + collision stats, batch 0's "
        "raw-relevance top-15 steering batch 1's joint-stat scope "
        "(the topFeatures feedback loop, ReliefFRSelector.scala:"
        "279-283), cross-batch union-reduce, global min-max, MI "
        "redundancy with the jointTotal batch-share discount (:641), "
        "and the greedy selection unrolled to 5 picks — ONE DuckDB "
        "statement end-to-end. batching='hash' replaces only the "
        "engine-seeded randomSplit with id%%n (same disjoint-cover "
        "role, reproducible); with this, q72's rows-only remainder is "
        "purely the seeded-sampling mode itself, whose dataflow is "
        "bit-identical to this one.",
)
def q72c_relief_fit_hash_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.relief import fit_relief

    inst = _embeddings(spark, sf_dir).filter(
        F.expr(Q72C_PRED.replace("vec_id", "id"))
    )
    res = fit_relief(
        inst,
        num_top_features=Q72C_TOP,
        num_neighbors=Q72C_NEIGH,
        estimation_ratio=1.0,     # no seeded sampling
        batch_size=0.5,           # exactly 2 batches
        redundancy_removal=True,
        discrete_data=False,
        seed=42,
        knn_strategy="numpy",
        batching="hash",          # deterministic split -> oracle-able
    )
    if res.n_batches != 2:
        # the oracle hard-codes the id%2 split; the broadcast-memory
        # guard raises n_batches past 2 only above ~8M instances at 64
        # features — fail loudly there instead of hash-diverging
        raise ValueError(
            f"q72c oracle models exactly 2 hash batches, fit used "
            f"{res.n_batches} (broadcast guard?)"
        )
    rows = [
        (
            i + 1,
            int(s),
            round(float(res.relevance[s]), 6),
            int(r),
            round(float(res.relevance[r]), 6),
        )
        for i, (s, r) in enumerate(
            zip(res.std_selection, res.redundancy_selection)
        )
    ]
    return spark.createDataFrame(
        rows,
        "rank int, std_feature int, std_relevance double, "
        "redundancy_feature int, redundancy_relevance double",
    )


@register(
    "q158_sparse_fit_hash_batched",
    oracle=_Q72C_ORACLE.replace("__PRED__", Q158_PRED)
    .replace("__SAMPLE__", "TRUE")
    .replace("__JT__", _JT_FULL),
    doc="The SPARSE batched fit under the SAME oracle as q72c: the "
        "q72c instance slice converted to long/COO form, then "
        "fit_relief_sparse(batch_size=0.5) — per-batch inverted-index "
        "kNN, sparse pair explode, topFeatures feedback, union-reduce, "
        "jointTotal discount (ReliefFRSelector.scala:273-283, 641). "
        "The embeddings table has zero exact-zero coordinates at every "
        "SF, so the long form is total and the sparse loop is bit-for-"
        "bit the dense batched dataflow (parity also pinned in "
        "test_relief_sparse) — one DuckDB statement gates both. "
        "Scale: the sparse loop's kNN cost is O(shared nonzeros), "
        "never O(Q x N x d) — the kddb regime (30M features) the "
        "reference claims (README.md:11).",
)
def q158_sparse_fit_hash_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.relief_sparse import (
        fit_relief_sparse,
        to_long_form,
    )

    inst = _embeddings(spark, sf_dir).filter(
        F.expr(Q158_PRED.replace("vec_id", "id"))
    )
    long_df, labels = to_long_form(inst)
    n_feat = len(inst.select("features").first()["features"])
    res = fit_relief_sparse(
        long_df,
        labels,
        n_features=n_feat,
        num_top_features=Q72C_TOP,
        num_neighbors=Q72C_NEIGH,
        redundancy_removal=True,
        discrete_data=False,
        batch_size=0.5,  # exactly the oracle's id%2 split
    )
    if res.n_batches != 2:
        raise ValueError(
            f"q158 oracle models exactly 2 hash batches, fit used {res.n_batches}"
        )
    rows = [
        (
            i + 1,
            int(s),
            round(float(res.relevance[s]), 6),
            int(r),
            round(float(res.relevance[r]), 6),
        )
        for i, (s, r) in enumerate(
            zip(res.std_selection, res.redundancy_selection)
        )
    ]
    return spark.createDataFrame(
        rows,
        "rank int, std_feature int, std_relevance double, "
        "redundancy_feature int, redundancy_relevance double",
    )


#: q72d: the SAMPLED fit under the full oracle. Portable md5-uniform
#: draw (operators/sampling.hash_uniform — 24 md5 bits offset by 0.5);
#: the DuckDB spelling below is the one documented on hash_uniform.
Q72D_RATIO = 0.5
_Q72D_SAMPLE_SQL = (
    "(('0x' || substr(md5(CAST(id AS VARCHAR)), 4, 6))::BIGINT + 0.5)"
    f" / 16777216.0 < {Q72D_RATIO}"
)


@register(
    "q72d_relief_fit_hash_sampled",
    oracle=_Q72C_ORACLE.replace("__PRED__", Q72C_PRED)
    .replace("__SAMPLE__", _Q72D_SAMPLE_SQL)
    .replace("__JT__", _JT_SAMPLED),
    doc="The SAMPLED batched fit under the full oracle — the one fit "
        "mode q72 could only rows-only check, made hash-checkable by "
        "swapping the engine-seeded Bernoulli for the portable "
        "md5-uniform draw (sampling='hash', same uniform law, "
        "re-run-stable and engine-independent): estimationRatio=0.5 "
        "sample -> 2 hash batches -> full feedback loop -> MI -> "
        "greedy, ONE DuckDB statement end-to-end. Priors and k come "
        "from the PRE-sampling instance set, exactly the reference's "
        "order (ReliefFRSelector.scala:217-223). With this, every fit "
        "mode's dataflow is hash-gated: unsampled single-batch (q72a), "
        "greedy (q72b), batched (q72c), sparse batched (q158), sampled "
        "batched (here) — q72's residue is solely the engine-seeded "
        "draw sequence itself.",
)
def q72d_relief_fit_hash_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.relief import fit_relief

    inst = _embeddings(spark, sf_dir).filter(
        F.expr(Q72C_PRED.replace("vec_id", "id"))
    )
    res = fit_relief(
        inst,
        num_top_features=Q72C_TOP,
        num_neighbors=Q72C_NEIGH,
        estimation_ratio=Q72D_RATIO,
        sampling="hash",          # portable draw -> oracle-able
        batch_size=0.5,           # exactly 2 batches
        redundancy_removal=True,
        discrete_data=False,
        seed=42,                  # inert in hash mode (documented)
        knn_strategy="numpy",
        batching="hash",
    )
    if res.n_batches != 2:
        raise ValueError(
            f"q72d oracle models exactly 2 hash batches, fit used {res.n_batches}"
        )
    rows = [
        (
            i + 1,
            int(s),
            round(float(res.relevance[s]), 6),
            int(r),
            round(float(res.relevance[r]), 6),
        )
        for i, (s, r) in enumerate(
            zip(res.std_selection, res.redundancy_selection)
        )
    ]
    return spark.createDataFrame(
        rows,
        "rank int, std_feature int, std_relevance double, "
        "redundancy_feature int, redundancy_relevance double",
    )


# --- q161: the COO-finalize sparse fit (kddb-width driver path) ---------------

#: q161 stretches the q158 dataflow across a DECLARED width past the
#: COO threshold: every active feature f is re-indexed to f * STRIDE,
#: so the fit runs with n_features = 64 * STRIDE = 524,288 (> 2^18)
#: and the driver finalize takes the SparseRelevance/COO path
#: (normalize_relevance_coo + std_ranking_coo + greedy_select_coo —
#: the kddb-regime code VERDICT r8 #7 demanded). Semantics differ from
#: q158 in exactly one way the oracle must replay: absent features
#: exist now, carrying raw relevance 0.0 — the min-max extrema include
#: that 0.0, and ONE absent representative (index 1, the smallest
#: absent id; active ids are multiples of STRIDE) joins the ranking
#: and greedy candidate sets at the shared normalized-zero value. The
#: engine raises loudly if a selection ever includes an absent feature
#: other than that representative (two absents in a top-5 would need a
#: second rep the oracle does not model).
Q161_STRIDE = 8192
Q161_PRED = "vec_id % 64 < 2"

_Q161_ORACLE = (
    _Q72C_ORACLE.replace("__PRED__", Q161_PRED)
    .replace("__SAMPLE__", "TRUE")
    .replace("__JT__", _JT_FULL)
    .replace(
        "u.i - 1 AS feature_idx",
        f"(u.i - 1) * {Q161_STRIDE} AS feature_idx",
    )
    .replace(
        """extrema AS (SELECT MIN(raw) AS mn, MAX(raw) AS mx FROM relsum),
    rel0 AS MATERIALIZED (
      SELECT feature_idx,
             CASE WHEN mx > mn THEN (raw - mn) / (mx - mn) ELSE 0.0 END AS rel
      FROM relsum, extrema
    ),""",
        """extrema AS (SELECT MIN(raw) AS mn, MAX(raw) AS mx
                FROM (SELECT raw FROM relsum UNION ALL SELECT 0.0)),
    rel0 AS MATERIALIZED (
      SELECT feature_idx,
             CASE WHEN mx > mn THEN (raw - mn) / (mx - mn) ELSE 0.0 END AS rel
      FROM relsum, extrema
      UNION ALL
      SELECT 1 AS feature_idx,
             CASE WHEN mx > mn THEN (0.0 - mn) / (mx - mn) ELSE 0.0 END AS rel
      FROM extrema
    ),""",
    )
)


@register(
    "q161_sparse_fit_coo_width",
    oracle=_Q161_ORACLE,
    doc="The COO-finalize sparse fit under the q72c-family oracle: the "
        "q158 dataflow with every feature re-indexed f -> f*8192 and a "
        "declared width of 524,288 (> the 2^18 COO threshold), so the "
        "driver finalize runs normalize_relevance_coo / std_ranking_coo "
        "/ greedy_select_coo on O(active) dicts — the kddb-width path "
        "(30M features, README.md:11) hash-gated end-to-end, absent-"
        "feature normalization included (the min-max now spans the "
        "implicit raw-0.0 of never-active features; the oracle carries "
        "one absent-representative row at the shared normalized-zero "
        "value, and the engine fails loudly if a selection would need "
        "a second one).",
)
def q161_sparse_fit_coo_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.relief import SparseRelevance
    from spark_relieffc_fselection_spark.operators.relief_sparse import (
        fit_relief_sparse,
        to_long_form,
    )

    inst = _embeddings(spark, sf_dir).filter(
        F.expr(Q161_PRED.replace("vec_id", "id"))
    )
    long_df, labels = to_long_form(inst)
    long_df = long_df.withColumn(
        "feature_idx", F.col("feature_idx") * Q161_STRIDE
    )
    n_feat_active = len(inst.select("features").first()["features"])
    res = fit_relief_sparse(
        long_df,
        labels,
        n_features=n_feat_active * Q161_STRIDE,
        num_top_features=Q72C_TOP,
        num_neighbors=Q72C_NEIGH,
        redundancy_removal=True,
        discrete_data=False,
        batch_size=0.5,  # exactly the oracle's id%2 split
        # nominal density here is 1/8192 but every pair shares every
        # ACTIVE feature — tell the loop to skip the no-overlap probe
        # (it would escalate m for nothing and fall back to the grid),
        # saving ~6 driver round-trips per batch. Exactness unchanged:
        # probe and grid produce the same candidate set.
        knn_probe=False,
    )
    if res.n_batches != 2:
        raise ValueError(
            f"q161 oracle models exactly 2 hash batches, fit used {res.n_batches}"
        )
    if not isinstance(res.relevance, SparseRelevance):
        raise ValueError(
            "q161 exists to gate the COO finalize — the fit returned a "
            "dense relevance, so the width threshold was not crossed"
        )
    for sel in (res.std_selection, res.redundancy_selection):
        bad = [f for f in sel if f % Q161_STRIDE != 0 and f != 1]
        if bad:
            raise ValueError(
                f"selection includes absent features {bad} beyond the "
                "single representative (index 1) the oracle models"
            )
    rows = [
        (
            i + 1,
            int(s),
            round(float(res.relevance[s]), 6),
            int(r),
            round(float(res.relevance[r]), 6),
        )
        for i, (s, r) in enumerate(
            zip(res.std_selection, res.redundancy_selection)
        )
    ]
    return spark.createDataFrame(
        rows,
        "rank int, std_feature int, std_relevance double, "
        "redundancy_feature int, redundancy_relevance double",
    )
