"""Similarity-search queries over ``embeddings`` with DuckDB oracles.

All three ANN tiers are deterministic by construction (no RNG), so even
the *approximate* variants have exact oracles: the oracle re-derives
the same buckets / inverted lists and must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.simsearch import (
    brute_force_topk,
    ivf_topk,
    kmeans_lloyd_step,
    lsh_bucketed_topk,
    lsh_near_duplicates,
    random_projection,
    semantic_dedup,
)
from spark_relieffc_fselection_spark.queries import register
from spark_relieffc_fselection_spark.sources import load_table

TOPK = 10
LSH_BITS, LSH_TABLES = 4, 4
IVF_STRIDE, IVF_PROBE = 50, 4
NEARDUP_COS = 0.35  # corpus max pairwise cosine is ~0.51; 0.35 = ~99.9th pct
NEARDUP_BITS, NEARDUP_TABLES = 4, 8  # near-dup LSH pre-bucket (operator default)


def _bucketed_sql(n_bits: int, n_tables: int) -> str:
    """DuckDB CTE body re-deriving sign-LSH table buckets over `normed`."""
    bits = " + ".join(
        f"(CASE WHEN v[t.tbl * {n_bits} + {i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    return (
        f"SELECT id, t.tbl AS tbl, {bits} AS bucket FROM normed, "
        f"LATERAL (SELECT unnest(generate_series(0, {n_tables - 1})) AS tbl) t"
    )
def QUERY_PRED_SPARK():
    # deferred: building a Column requires an active SparkContext,
    # and queries() may be enumerated before any session exists
    return F.col("vec_id") % 25 == 0

QUERY_PRED_SQL = "id % 25 = 0"

_INST = """
inst AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
normed AS (
  SELECT id, v,
         sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i]))) AS nrm
  FROM inst
)
"""

_COSINE = """
CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
     ELSE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i]*b.v[i]))
          / (a.nrm * b.nrm) END
"""


@register(
    "q24_ann_bruteforce",
    oracle=f"""
    WITH {_INST},
    pairs AS (
      SELECT b.id AS query_id, a.id AS neighbor_id, {_COSINE} AS cosine
      FROM normed a JOIN normed b ON a.id <> b.id
      WHERE b.{QUERY_PRED_SQL}
    )
    SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM pairs
    ) WHERE rank <= {TOPK}
    """,
    doc="Exact cosine top-k: broadcast crossJoin + window rank — the ANN "
        "correctness baseline (same shape as the RELIEF kNN core)",
)
def q24_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = brute_force_topk(emb, emb.filter(QUERY_PRED_SPARK()), k=TOPK)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


@register(
    "q25_ann_lsh",
    oracle=f"""
    WITH {_INST},
    bucketed AS (
      SELECT id, t.tbl AS tbl,
             {' + '.join(f'(CASE WHEN v[t.tbl * {LSH_BITS} + {i + 1}] > 0 THEN {1 << i} ELSE 0 END)' for i in range(LSH_BITS))} AS bucket
      FROM normed, LATERAL (SELECT unnest(generate_series(0, {LSH_TABLES - 1})) AS tbl) t
    ),
    cands AS (
      SELECT DISTINCT b.id AS query_id, a.id AS neighbor_id
      FROM bucketed a JOIN bucketed b ON a.tbl = b.tbl AND a.bucket = b.bucket
      WHERE a.id <> b.id AND b.{QUERY_PRED_SQL}
    ),
    pairs AS (
      SELECT c.query_id, c.neighbor_id, {_COSINE} AS cosine
      FROM cands c
      JOIN normed a ON a.id = c.neighbor_id
      JOIN normed b ON b.id = c.query_id
    )
    SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM pairs
    ) WHERE rank <= {TOPK}
    """,
    doc="Multi-table sign-LSH ANN: union of same-bucket candidates over "
        "disjoint coordinate groups, exact cosine rank within candidates",
)
def q25_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = lsh_bucketed_topk(
        emb, emb.filter(QUERY_PRED_SPARK()), k=TOPK, n_bits=LSH_BITS, n_tables=LSH_TABLES
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


@register(
    "q26_ann_ivf",
    oracle=f"""
    WITH {_INST},
    centroids AS (
      SELECT id AS centroid_id, v AS cv, nrm AS cnrm FROM normed
      WHERE id % {IVF_STRIDE} = 0
    ),
    assign AS (
      SELECT id AS vid, list_id FROM (
        SELECT a.id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY
                 (CASE WHEN a.nrm * c.cnrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i]*c.cv[i]))
                            / (a.nrm * c.cnrm) END) DESC, c.centroid_id ASC) AS rn
        FROM normed a, centroids c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT id AS query_id, list_id FROM (
        SELECT q.id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (PARTITION BY q.id ORDER BY
                 (CASE WHEN q.nrm * c.cnrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i]*c.cv[i]))
                            / (q.nrm * c.cnrm) END) DESC, c.centroid_id ASC) AS rn
        FROM normed q, centroids c
        WHERE q.{QUERY_PRED_SQL}
      ) WHERE rn <= {IVF_PROBE}
    ),
    pairs AS (
      SELECT b.id AS query_id, a.id AS neighbor_id, {_COSINE} AS cosine
      FROM normed a
      JOIN assign ON assign.vid = a.id
      JOIN probes ON probes.list_id = assign.list_id
      JOIN normed b ON b.id = probes.query_id AND a.id <> b.id
    )
    SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM pairs
    ) WHERE rank <= {TOPK}
    """,
    doc="IVF ANN: deterministic stride centroids, nearest-centroid inverted "
        "lists, n_probe nearest lists scanned per query — the 100TB scan-"
        "reduction path (lists bucketed/co-partitioned at scale)",
)
def q26_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(
        emb,
        emb.filter(QUERY_PRED_SPARK()),
        k=TOPK,
        centroid_stride=IVF_STRIDE,
        n_probe=IVF_PROBE,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


@register(
    "q27_embedding_neardup",
    oracle=f"""
    WITH {_INST},
    bucketed AS ({_bucketed_sql(NEARDUP_BITS, NEARDUP_TABLES)}),
    cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bucketed a JOIN bucketed b ON a.tbl = b.tbl AND a.bucket = b.bucket
      WHERE a.id < b.id
    ),
    pairs AS (
      SELECT c.id_a, c.id_b, {_COSINE} AS cosine
      FROM cands c
      JOIN normed a ON a.id = c.id_a
      JOIN normed b ON b.id = c.id_b
    )
    SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
    FROM pairs WHERE cosine >= {NEARDUP_COS}
    """,
    doc="Embedding-cosine near-duplicate pairs via deterministic sign-LSH "
        "pre-buckets + exact in-bucket verify — the 100 TB shape (bucketed "
        "self-join, nothing collected or broadcast). Brute-force exact "
        "all-pairs remains available as all_pairs_cosine(strategy="
        "'numpy'|'sql') for bounded corpora.",
)
def q27_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_near_duplicates(
        load_table(spark, sf_dir, "embeddings"),
        threshold=NEARDUP_COS,
        n_bits=NEARDUP_BITS,
        n_tables=NEARDUP_TABLES,
    )


SEMDEDUP_COS = 0.30
SEMDEDUP_STRIDE = IVF_STRIDE


@register(
    "q106_semantic_dedup",
    oracle=f"""
    WITH {_INST},
    centroids AS (
      SELECT id AS centroid_id, v AS cv, nrm AS cnrm FROM normed
      WHERE id % {SEMDEDUP_STRIDE} = 0
    ),
    assign AS (
      SELECT id AS vid, list_id FROM (
        SELECT a.id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY
                 (CASE WHEN a.nrm * c.cnrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i]*c.cv[i]))
                            / (a.nrm * c.cnrm) END) DESC, c.centroid_id ASC) AS rn
        FROM normed a, centroids c
      ) WHERE rn = 1
    ),
    m AS (
      SELECT n.id, n.v, n.nrm, a2.list_id
      FROM normed n JOIN assign a2 ON a2.vid = n.id
    ),
    edges AS (
      SELECT a.list_id, a.id AS id_a, b.id AS id_b, {_COSINE} AS cosine
      FROM m a JOIN m b ON a.list_id = b.list_id AND a.id < b.id
    )
    SELECT id_b AS vec_id,
           MIN(list_id) AS list_id,
           MIN(id_a) AS dup_of,
           ROUND(MAX(cosine), 6) AS max_cos
    FROM edges WHERE cosine >= {SEMDEDUP_COS}
    GROUP BY id_b
    """,
    doc="SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup — "
        "nearest-centroid assignment (deterministic stride centroids, "
        "broadcast), within-cluster cosine pairs only (equi-join keyed "
        "by list_id, never all-pairs), drop rows duplicating a lower-id "
        "cluster member. operators/simsearch.semantic_dedup; cluster "
        "count grows with the corpus so per-cluster pair work stays "
        "bounded, degenerate clusters capped+observed.",
)
def q106_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"),
        threshold=SEMDEDUP_COS,
        centroid_stride=SEMDEDUP_STRIDE,
    )


@register(
    "q49_ann_recall",
    oracle=f"""
    WITH {_INST},
    exact_pairs AS (
      SELECT b.id AS query_id, a.id AS neighbor_id, {_COSINE} AS cosine
      FROM normed a JOIN normed b ON a.id <> b.id
      WHERE b.{QUERY_PRED_SQL}
    ),
    exact_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM exact_pairs
      ) WHERE rank <= {TOPK}
    ),
    bucketed AS (
      SELECT id, t.tbl AS tbl,
             {' + '.join(f'(CASE WHEN v[t.tbl * {LSH_BITS} + {i + 1}] > 0 THEN {1 << i} ELSE 0 END)' for i in range(LSH_BITS))} AS bucket
      FROM normed, LATERAL (SELECT unnest(generate_series(0, {LSH_TABLES - 1})) AS tbl) t
    ),
    cands AS (
      SELECT DISTINCT b.id AS query_id, a.id AS neighbor_id
      FROM bucketed a JOIN bucketed b ON a.tbl = b.tbl AND a.bucket = b.bucket
      WHERE a.id <> b.id AND b.{QUERY_PRED_SQL}
    ),
    lsh_pairs AS (
      SELECT c.query_id, c.neighbor_id, {_COSINE} AS cosine
      FROM cands c
      JOIN normed a ON a.id = c.neighbor_id
      JOIN normed b ON b.id = c.query_id
    ),
    lsh_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM lsh_pairs
      ) WHERE rank <= {TOPK}
    )
    SELECT e.query_id,
           CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(l.neighbor_id) / CAST({TOPK} AS DOUBLE), 6) AS recall
    FROM exact_topk e
    LEFT JOIN lsh_topk l
      ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
    GROUP BY e.query_id
    """,
    doc="ANN quality evaluation: per-query recall@k of the LSH tier "
        "against the exact brute-force top-k — the standard accuracy/"
        "throughput tradeoff metric, composed from the two ANN operators "
        "and fully deterministic (hence exactly oracle-checkable).",
)
def q49_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(QUERY_PRED_SPARK())
    exact = brute_force_topk(emb, queries, k=TOPK).select("query_id", "neighbor_id")
    lsh = lsh_bucketed_topk(
        emb, queries, k=TOPK, n_bits=LSH_BITS, n_tables=LSH_TABLES
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        exact.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(TOPK)), 6
            ).alias("recall"),
        )
    )


@register(
    "q74_kmeans_step",
    oracle=f"""
    WITH {_INST},
    centroids AS (
      SELECT id AS centroid_id, v AS cv, nrm AS cnrm FROM normed
      WHERE id % {IVF_STRIDE} = 0
    ),
    assign AS (
      SELECT id AS vid, list_id FROM (
        SELECT a.id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY
                 (CASE WHEN a.nrm * c.cnrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i]*c.cv[i]))
                            / (a.nrm * c.cnrm) END) DESC, c.centroid_id ASC) AS rn
        FROM normed a, centroids c
      ) WHERE rn = 1
    ),
    long AS (
      SELECT assign.list_id, u.i - 1 AS dim, n.v[u.i] AS x
      FROM normed n JOIN assign ON assign.vid = n.id,
           LATERAL (SELECT unnest(generate_series(1, len(n.v))) AS i) u
    )
    SELECT list_id, dim,
           ROUND(CAST(SUM(CAST(x AS DECIMAL(38,18))) / COUNT(*) AS DOUBLE), 6)
             AS value,
           COUNT(*) AS n_members
    FROM long GROUP BY list_id, dim
    """,
    doc="One distributed Lloyd (k-means) iteration over the embedding "
        "corpus — the training step behind a real IVF index: broadcast "
        "centroid assignment, then a partial+final mean per (list, dim) "
        "with decimal accumulation. Iterative clustering as repeated "
        "calls of the same two-job plan.",
)
def q74_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_lloyd_step(
        load_table(spark, sf_dir, "embeddings"), centroid_stride=IVF_STRIDE
    )


RP_OUT_DIM = 16


@register(
    "q78_random_projection",
    oracle=f"""
    SELECT vec_id AS id, j.j AS out_dim_idx,
           ROUND(list_sum(list_transform(generate_series(1, len(v)),
                 i -> v[i] * (1.0 - 2.0 * (((i-1)*1009 + j.j*9176 + ((i-1)*j.j) % 7) % 2)))), 6)
             AS value
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         LATERAL (SELECT unnest(generate_series(0, {RP_OUT_DIM - 1})) AS j) j
    """,
    doc="Deterministic Johnson-Lindenstrauss sign projection 64 -> 16 "
        "dims: the dimensionality-reduction front end for ANN/clustering "
        "(distance-preserving, shrinks every downstream kernel 4x). The "
        "+-1 matrix is arithmetic in (i, j) — no RNG, no driver matrix, "
        "zero shuffle, exactly oracle-reproducible.",
)
def q78_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return random_projection(
        load_table(spark, sf_dir, "embeddings"), out_dim=RP_OUT_DIM
    )


@register(
    "q65_embedding_quantization",
    oracle="""
    WITH long AS (
      SELECT vec_id, u.i - 1 AS dim, CAST(embedding[u.i] AS DOUBLE) AS x
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u
    ),
    scales AS (
      SELECT dim, greatest(MAX(abs(x)), 1e-12) / 127.0 AS scale
      FROM long GROUP BY dim
    ),
    quant AS (
      SELECT vec_id,
             least(greatest(round(x / scale), -127.0), 127.0) * scale - x AS err
      FROM long JOIN scales USING (dim)
    )
    SELECT vec_id,
           ROUND(SUM(err * err) / COUNT(*), 9) AS mse,
           ROUND(MAX(abs(err)), 9) AS max_abs_err
    FROM quant GROUP BY vec_id
    """,
    doc="Embedding compression: symmetric per-dimension int8 scalar "
        "quantization (scale = max|x|/127, clamp to [-127, 127]) with "
        "per-vector round-trip MSE and max error — the memory/recall "
        "tradeoff metric for quantized vector search. Per-dim scales are "
        "a 64-row aggregate broadcast back as literals; the error pass "
        "is one map-side zip_with, no second shuffle.",
)
def q65_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    scale_rows = (
        emb.select(F.posexplode("x").alias("dim", "v"))
        .groupBy("dim")
        .agg((F.greatest(F.max(F.abs("v")), F.lit(1e-12)) / 127.0).alias("scale"))
        .collect()
    )
    scales = [0.0] * len(scale_rows)
    for r in scale_rows:
        scales[int(r["dim"])] = float(r["scale"])
    scale_arr = F.array(*[F.lit(s) for s in scales])
    err = F.zip_with(
        "x",
        scale_arr,
        lambda x, s: F.least(F.greatest(F.round(x / s, 0), F.lit(-127.0)), F.lit(127.0))
        * s
        - x,
    )
    n = F.size("x")
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e) / n, 9
        ).alias("mse"),
        F.round(
            F.aggregate(err, F.lit(0.0), lambda acc, e: F.greatest(acc, F.abs(e))), 9
        ).alias("max_abs_err"),
    )


# --- embedding drift monitor (q88) ---------------------------------------------


@register(
    "q88_embedding_drift",
    oracle=f"""
    WITH {_INST},
    centroids AS (
      SELECT id AS centroid_id, v AS cv, nrm AS cnrm FROM normed
      WHERE id % {IVF_STRIDE} = 0
    ),
    assign AS (
      SELECT id AS vid, list_id FROM (
        SELECT a.id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY
                 (CASE WHEN a.nrm * c.cnrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i]*c.cv[i]))
                            / (a.nrm * c.cnrm) END) DESC, c.centroid_id ASC) AS rn
        FROM normed a, centroids c
      ) WHERE rn = 1
    ),
    cohort AS (
      SELECT vid, list_id,
             (('0x' || substr(md5(CAST(vid AS VARCHAR)), 3, 4))::BIGINT % 2) = 0
               AS is_ref
      FROM assign
    ),
    shares AS (
      SELECT list_id,
             SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_new
      FROM cohort GROUP BY list_id
    ),
    tot AS (
      SELECT CAST(SUM(n_ref) AS DOUBLE) AS t_ref,
             CAST(SUM(n_new) AS DOUBLE) AS t_new
      FROM shares
    )
    SELECT list_id,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_new AS BIGINT) AS n_new,
           ROUND(n_ref / tot.t_ref, 6) AS share_ref,
           ROUND(n_new / tot.t_new, 6) AS share_new,
           ROUND(ABS(n_ref / tot.t_ref - n_new / tot.t_new), 6) AS drift
    FROM shares, tot
    """,
    doc="Embedding distribution-drift monitor: the corpus splits into a "
        "deterministic 'reference' and 'new' cohort (hash of vec_id — "
        "standing in for yesterday-vs-today batches), every vector is "
        "assigned to its IVF list, and each list reports its share in "
        "both cohorts plus the absolute share gap — the per-region "
        "signal behind embedding-model / data drift alarms (sum of "
        "drift/2 = total variation distance). Rides the exact IVF "
        "assignment machinery of q26: one broadcast of stride "
        "centroids, one corpus pass, then list-cardinality arithmetic.",
)
def q88_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.simsearch import ivf_assignments

    emb = load_table(spark, sf_dir, "embeddings")
    _, assign = ivf_assignments(emb, IVF_STRIDE)
    is_ref = (
        F.conv(
            F.substring(F.md5(F.col("vid").cast("string")), 3, 4), 16, 10
        ).cast("bigint")
        % 2
        == 0
    )
    shares = (
        assign.select("vid", "list_id", is_ref.alias("is_ref"))
        .groupBy("list_id")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_new"),
        )
    )
    tot = shares.agg(
        F.sum("n_ref").cast("double").alias("t_ref"),
        F.sum("n_new").cast("double").alias("t_new"),
    )
    return shares.crossJoin(F.broadcast(tot)).select(
        "list_id",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_new").cast("bigint").alias("n_new"),
        F.round(F.col("n_ref") / F.col("t_ref"), 6).alias("share_ref"),
        F.round(F.col("n_new") / F.col("t_new"), 6).alias("share_new"),
        F.round(
            F.abs(F.col("n_ref") / F.col("t_ref") - F.col("n_new") / F.col("t_new")),
            6,
        ).alias("drift"),
    )


PQ_M, PQ_SUB, PQ_NCENT, PQ_STRIDE = 4, 16, 8, 50


@register(
    "q99_pq_ann",
    oracle=f"""
    WITH {_INST},
    subq AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS j),
    cents AS (
      SELECT j, id AS cid,
             v[j * {PQ_SUB} + 1 : (j + 1) * {PQ_SUB}] AS cvec
      FROM inst, subq
      WHERE id % {PQ_STRIDE} = 0 AND id < {PQ_STRIDE * PQ_NCENT}
    ),
    dists AS (
      SELECT i.id, c.j, c.cid, c.cvec,
             list_sum(list_transform(generate_series(1, {PQ_SUB}),
               t -> (i.v[c.j * {PQ_SUB} + t] - c.cvec[t])
                    * (i.v[c.j * {PQ_SUB} + t] - c.cvec[t]))) AS d
      FROM inst i CROSS JOIN cents c
    ),
    codes AS (
      SELECT id, j, cvec FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id, j
                                     ORDER BY d ASC, cid ASC) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    recon AS (
      SELECT id, flatten(list(cvec ORDER BY j)) AS rv
      FROM codes GROUP BY id
    ),
    adc AS (
      SELECT q.id AS query_id, x.id AS neighbor_id,
             list_sum(list_transform(generate_series(1, {PQ_M * PQ_SUB}),
               t -> (q.v[t] - x.rv[t]) * (q.v[t] - x.rv[t]))) AS adc_dist
      FROM recon x JOIN inst q ON q.{QUERY_PRED_SQL} AND q.id <> x.id
    )
    SELECT query_id, neighbor_id, ROUND(adc_dist, 6) AS adc_dist, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
      FROM adc
    ) WHERE rank <= {TOPK}
    """,
    doc="Product-quantization ANN (asymmetric distance): vectors split "
        "into 4 subspaces, each encoded as the index of its nearest "
        "deterministic stride-codebook entry, queries scored against the "
        "reconstructions. The compressed tier for corpora whose float "
        "vectors don't fit the cluster: the corpus payload shrinks d "
        "floats -> m codes (16-64x) after ONE encoding pass, and both "
        "encode and score are pure Catalyst array expressions over "
        "literal codebooks — zero joins, zero Python. Exactly oracle-"
        "able because the codebooks are RNG-free, like the IVF tier.",
)
def q99_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.simsearch import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # 'lut' is the production scorer (m lookups/pair; measured 1.8x
    # faster warmed at sf0.1 — the fold cost it removes grows with d);
    # it differs from the oracle's element-order recon fold only in
    # float association (equivalence pinned in test_simsearch), and the
    # 6-decimal round absorbs the last-ulp delta.
    out = pq_topk(
        emb,
        emb.filter(QUERY_PRED_SPARK()),
        k=TOPK,
        n_subspaces=PQ_M,
        n_centroids=PQ_NCENT,
        centroid_stride=PQ_STRIDE,
        strategy="lut",
    )
    return out.select(
        "query_id", "neighbor_id", F.round("adc_dist", 6).alias("adc_dist"), "rank"
    )


@register(
    "q102_ivfpq_ann",
    oracle=f"""
    WITH {_INST},
    icents AS (
      SELECT id AS centroid_id, v AS cv, nrm AS cnrm FROM normed
      WHERE id % {IVF_STRIDE} = 0
    ),
    assign AS (
      SELECT id AS vid, list_id FROM (
        SELECT a.id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY
                 (CASE WHEN a.nrm * c.cnrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i]*c.cv[i]))
                            / (a.nrm * c.cnrm) END) DESC, c.centroid_id ASC) AS rn
        FROM normed a, icents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT id AS query_id, list_id FROM (
        SELECT q.id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (PARTITION BY q.id ORDER BY
                 (CASE WHEN q.nrm * c.cnrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i]*c.cv[i]))
                            / (q.nrm * c.cnrm) END) DESC, c.centroid_id ASC) AS rn
        FROM normed q, icents c
        WHERE q.{QUERY_PRED_SQL}
      ) WHERE rn <= {IVF_PROBE}
    ),
    subq AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS j),
    pqcents AS (
      SELECT j, id AS cid,
             v[j * {PQ_SUB} + 1 : (j + 1) * {PQ_SUB}] AS cvec
      FROM inst, subq
      WHERE id % {PQ_STRIDE} = 0 AND id < {PQ_STRIDE * PQ_NCENT}
    ),
    pqdists AS (
      SELECT i.id, c.j, c.cid, c.cvec,
             list_sum(list_transform(generate_series(1, {PQ_SUB}),
               t -> (i.v[c.j * {PQ_SUB} + t] - c.cvec[t])
                    * (i.v[c.j * {PQ_SUB} + t] - c.cvec[t]))) AS d
      FROM inst i CROSS JOIN pqcents c
    ),
    codes AS (
      SELECT id, j, cvec FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id, j
                                     ORDER BY d ASC, cid ASC) AS rn
        FROM pqdists
      ) WHERE rn = 1
    ),
    recon AS (
      SELECT id, flatten(list(cvec ORDER BY j)) AS rv
      FROM codes GROUP BY id
    ),
    adc AS (
      SELECT p.query_id, x.id AS neighbor_id,
             list_sum(list_transform(generate_series(1, {PQ_M * PQ_SUB}),
               t -> (q.v[t] - x.rv[t]) * (q.v[t] - x.rv[t]))) AS adc_dist
      FROM recon x
      JOIN assign ON assign.vid = x.id
      JOIN probes p ON p.list_id = assign.list_id
      JOIN inst q ON q.id = p.query_id AND x.id <> q.id
    )
    SELECT query_id, neighbor_id, ROUND(adc_dist, 6) AS adc_dist, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
      FROM adc
    ) WHERE rank <= {TOPK}
    """,
    doc="IVF-PQ composed ANN (the FAISS-IVFPQ production shape): IVF "
        "probing bounds WHICH rows each query scores (n_probe inverted "
        "lists, partition-prunable at scale) while PQ bounds WHAT is "
        "scored (m codes + reconstruction instead of d floats). One "
        "corpus pass computes assignment and codes together; both "
        "reductions compose multiplicatively, which is why this is the "
        "default shape for billion-vector serving. Deterministic "
        "centroids/codebooks keep it exactly oracle-able.",
)
def q102_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.simsearch import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivfpq_topk(
        emb,
        emb.filter(QUERY_PRED_SPARK()),
        k=TOPK,
        n_probe=IVF_PROBE,
        ivf_stride=IVF_STRIDE,
        n_subspaces=PQ_M,
        n_centroids=PQ_NCENT,
        pq_stride=PQ_STRIDE,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("adc_dist", 6).alias("adc_dist"), "rank"
    )


@register(
    "q104_streaming_list_drift",
    oracle=f"""
    WITH {_INST},
    icents AS (
      SELECT id AS centroid_id, v AS cv, nrm AS cnrm FROM normed
      WHERE id % {IVF_STRIDE} = 0
    ),
    assign AS (
      SELECT id AS vid, list_id FROM (
        SELECT a.id, c.centroid_id AS list_id,
               ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY
                 (CASE WHEN a.nrm * c.cnrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i]*c.cv[i]))
                            / (a.nrm * c.cnrm) END) DESC, c.centroid_id ASC) AS rn
        FROM normed a, icents c
      ) WHERE rn = 1
    )
    SELECT list_id, COUNT(*) AS n_vectors FROM assign GROUP BY list_id
    """,
    doc="STREAMING inverted-list occupancy: incoming embeddings are "
        "assigned to their nearest IVF centroid per micro-batch and the "
        "per-list counts accumulate in complete mode — the realtime "
        "drift trigger for index rebuilds (batch counterpart: q88). "
        "Assignment is the per-row literal-centroid expression (no "
        "window, no join — the ONLY shapes streaming allows here), "
        "bit-identical to the batch crossJoin argmax, so the batch "
        "assignment SQL is the oracle verbatim. At scale this rides "
        "any vector firehose: stateless map + one streaming aggregate "
        "whose state is n_lists rows.",
)
def q104_streaming_list_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.simsearch import (
        centroid_assign,
        ivf_assignments,
    )
    from spark_relieffc_fselection_spark.queries.events_q import (
        _SINK_SEQ,
        _staged_table_dir,
        _stream_conf,
    )
    from spark_relieffc_fselection_spark.streaming.windows import (
        read_parquet_stream,
        run_to_memory_sink,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, _ = ivf_assignments(emb, IVF_STRIDE)
    cent_rows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    stream = read_parquet_stream(
        spark, _staged_table_dir(spark, sf_dir, "embeddings")
    )
    # Arrow assignment kernel (VERDICT r4 #5): dimension-ordered fold
    # -> cosines bit-identical to the literal expression tier, ~10x
    # less per-row cost than the interpreted lambda chain; stateless,
    # so it composes with the streaming aggregate unchanged.
    assigned = centroid_assign(
        stream.select(F.col("embedding").cast("array<double>").alias("vec")),
        cent_rows,
        strategy="arrow",
    )
    agg = assigned.groupBy("list_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    _SINK_SEQ[0] += 1
    with _stream_conf(spark):
        return run_to_memory_sink(
            agg, f"q104_sink_{_SINK_SEQ[0]}", output_mode="complete"
        )


@register(
    "q145_gram_matrix",
    oracle="""
    WITH v AS (
      SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cells AS (
      SELECT a.i, b.j, CAST(v[a.i + 1] * v[b.j + 1] AS DECIMAL(38,18))
               AS c
      FROM v,
           LATERAL (SELECT unnest(generate_series(0, len(v) - 1)) AS i) a,
           LATERAL (SELECT unnest(generate_series(0, len(v) - 1)) AS j) b
      WHERE b.j >= a.i
    )
    SELECT i, j, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS g
    FROM cells GROUP BY 1, 2
    """,
    doc="Upper-triangle Gram matrix over the embedding corpus "
        "(operators/simsearch.gram_sums) — with the mean vector, the "
        "complete sufficient statistic of PCA, and the ONLY "
        "corpus-sized pass the decomposition needs (pca_project does "
        "the d x d eigendecomposition on the driver and transforms "
        "with literal-array dot products — the RELIEF-fit pattern: "
        "distributed sufficient stats, driver-sized spectral step). "
        "Double posexplode to (i, j, vi*vj) cells + one keyed "
        "aggregation; map-side combine collapses every partition to "
        "d(d+1)/2 = 2080 partial rows at d=64 regardless of corpus "
        "size. Decimal sums for cross-engine exactness.",
)
def q145_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.simsearch import gram_sums

    emb = load_table(spark, sf_dir, "embeddings")
    out = gram_sums(emb)
    return out.select(
        "i", "j", F.round(F.col("g").cast("double"), 6).alias("g")
    )


@register(
    "q159_ann_lsh_multiprobe_recall",
    oracle=f"""
    WITH {_INST},
    exact_pairs AS (
      SELECT b.id AS query_id, a.id AS neighbor_id, {_COSINE} AS cosine
      FROM normed a JOIN normed b ON a.id <> b.id
      WHERE b.{QUERY_PRED_SQL}
    ),
    exact_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM exact_pairs
      ) WHERE rank <= {TOPK}
    ),
    bucketed AS (
      SELECT id, t.tbl AS tbl,
             {' + '.join(f'(CASE WHEN v[t.tbl * {LSH_BITS} + {i + 1}] > 0 THEN {1 << i} ELSE 0 END)' for i in range(LSH_BITS))} AS bucket
      FROM normed, LATERAL (SELECT unnest(generate_series(0, {LSH_TABLES - 1})) AS tbl) t
    ),
    qprobes AS (
      SELECT id, tbl,
             CASE WHEN p.j = 0 THEN bucket
                  ELSE xor(bucket, CAST(1 << (p.j - 1) AS BIGINT)) END AS bucket
      FROM bucketed,
           LATERAL (SELECT unnest(generate_series(0, {LSH_BITS})) AS j) p
      WHERE {QUERY_PRED_SQL}
    ),
    cands AS (
      SELECT DISTINCT b.id AS query_id, a.id AS neighbor_id
      FROM bucketed a JOIN qprobes b ON a.tbl = b.tbl AND a.bucket = b.bucket
      WHERE a.id <> b.id
    ),
    lsh_pairs AS (
      SELECT c.query_id, c.neighbor_id, {_COSINE} AS cosine
      FROM cands c
      JOIN normed a ON a.id = c.neighbor_id
      JOIN normed b ON b.id = c.query_id
    ),
    lsh_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM lsh_pairs
      ) WHERE rank <= {TOPK}
    )
    SELECT e.query_id,
           CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(l.neighbor_id) / CAST({TOPK} AS DOUBLE), 6) AS recall
    FROM exact_topk e
    LEFT JOIN lsh_topk l
      ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
    GROUP BY e.query_id
    """,
    doc="Recall@k of the MULTIPROBE ANN tier (lsh_bucketed_topk with "
        "Hamming-1 probe expansion on the broadcast side) against the "
        "exact brute-force top-k — q49's metric for the probe-expanded "
        "candidate generator, the same remedy that restored the RELIEF "
        "fit tier's planted-signal property (q157). Candidate sets "
        "strictly contain q49's, so per-query recall is monotonically "
        ">= single-probe at ~(1+n_bits)x broadcast rows and unchanged "
        "corpus-side cost. Oracle replays the probe set with xor() "
        "bucket flips.",
)
def q159_ann_lsh_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(QUERY_PRED_SPARK())
    exact = brute_force_topk(emb, queries, k=TOPK).select("query_id", "neighbor_id")
    lsh = lsh_bucketed_topk(
        emb, queries, k=TOPK, n_bits=LSH_BITS, n_tables=LSH_TABLES,
        multiprobe=True,
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        exact.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(TOPK)), 6
            ).alias("recall"),
        )
    )


#: q167 late-interaction shape: consecutive embedding rows group into
#: multi-vector "documents" (TPD token vectors each); every QMOD-th
#: document's token set is a query.
MAXSIM_TPD = 8
MAXSIM_QMOD = 25
MAXSIM_K = 5


@register(
    "q167_maxsim_rerank",
    oracle=f"""
    WITH tok AS (
      SELECT CAST(vec_id // {MAXSIM_TPD} AS BIGINT) AS doc_id,
             CAST(vec_id % {MAXSIM_TPD} AS INT) AS tok_idx,
             CAST(embedding AS DOUBLE[]) AS vec
      FROM embeddings
    ),
    docs AS (
      SELECT doc_id, list(vec ORDER BY tok_idx) AS d_toks FROM tok GROUP BY doc_id
    ),
    qtok AS (SELECT doc_id AS query_id, tok_idx, vec FROM tok
             WHERE doc_id % {MAXSIM_QMOD} = 0),
    per_token AS (
      SELECT q.query_id, d.doc_id,
             list_max(list_transform(d.d_toks, dt ->
               list_sum(list_transform(generate_series(1, len(q.vec)),
                                       i -> q.vec[i] * dt[i])))) AS max_dot
      FROM qtok q JOIN docs d ON d.doc_id <> q.query_id
    ),
    scores AS (
      SELECT query_id, doc_id,
             CAST(ROUND(SUM(CAST(max_dot AS DECIMAL(38,18))), 6) AS DOUBLE)
               AS score
      FROM per_token GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rank
      FROM scores
    ) WHERE rank <= {MAXSIM_K}
    """,
    doc="Late-interaction (ColBERT-style MaxSim) reranking: documents "
        "are MULTI-VECTOR (consecutive embedding rows as token "
        "vectors), score(q, d) = sum over query tokens of max over doc "
        "tokens of the dot product — the multi-aspect relevance model "
        "single-vector cosine misses. Scale: doc tokens assemble "
        "map-side into one deterministic array per doc (sort_array), "
        "query tokens broadcast row-wise, the max-dot is a whole-stage-"
        "codegen HOF (no token-pair explosion), the per-pair score is "
        "a decimal sum (shuffle-order-independent), and the top-k "
        "window is bounded per query. Composes with a BM25/ANN first "
        "stage by feeding a candidate-set doc_tokens frame.",
)
def q167_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.retrieval import maxsim_rerank
    from spark_relieffc_fselection_spark.queries import localize

    emb = load_table(spark, sf_dir, "embeddings")
    tok = emb.select(
        # integer division, NOT double division: vec_id/8 through a
        # DOUBLE truncates past 2^53 while the oracle's // is exact
        # at any id magnitude (ADVICE r9)
        F.expr(f"vec_id div {MAXSIM_TPD}").cast("long").alias("doc_id"),
        (F.col("vec_id") % MAXSIM_TPD).cast("int").alias("tok_idx"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    # query tokens are the bounded side (QMOD-th docs): localize so the
    # corpus parquet is scanned ONCE (the doc-token assembly), not once
    # per join arm
    queries = localize(tok.filter(F.col("doc_id") % MAXSIM_QMOD == 0))
    return maxsim_rerank(tok, queries, k=MAXSIM_K)


MAXSIM_STAGE1_C = 10


@register(
    "q168_two_stage_retrieval",
    oracle=f"""
    WITH tok AS (
      SELECT CAST(vec_id // {MAXSIM_TPD} AS BIGINT) AS doc_id,
             CAST(vec_id % {MAXSIM_TPD} AS INT) AS tok_idx,
             CAST(embedding AS DOUBLE[]) AS vec
      FROM embeddings
    ),
    docs AS (
      SELECT doc_id, list(vec ORDER BY tok_idx) AS d_toks FROM tok GROUP BY doc_id
    ),
    cents AS (
      SELECT doc_id, d_toks,
             list_transform(generate_series(1, len(d_toks[1])), i ->
               list_sum(list_transform(d_toks, t -> t[i])) / len(d_toks)) AS c
      FROM docs
    ),
    qc AS (SELECT doc_id AS query_id, c AS q_c FROM cents
           WHERE doc_id % {MAXSIM_QMOD} = 0),
    -- stage-1 ranks on the RAW fold-left dot (bit-identical across
    -- engines), deliberately NOT rounded: a dyadic-rational dot can
    -- land exactly on a .5e-6 boundary where 6dp double rounding is
    -- engine-dependent (the q110 lesson)
    s1 AS (
      SELECT q.query_id, d.doc_id,
             list_sum(list_transform(generate_series(1, len(q.q_c)),
                                     i -> q.q_c[i] * d.c[i])) AS s1
      FROM qc q JOIN cents d ON d.doc_id <> q.query_id
    ),
    cand AS (
      SELECT query_id, doc_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY s1 DESC, doc_id) AS r1
        FROM s1
      ) WHERE r1 <= {MAXSIM_STAGE1_C}
    ),
    qtok AS (SELECT doc_id AS query_id, tok_idx, vec FROM tok
             WHERE doc_id % {MAXSIM_QMOD} = 0),
    per_token AS (
      SELECT c.query_id, c.doc_id,
             list_max(list_transform(d.d_toks, dt ->
               list_sum(list_transform(generate_series(1, len(q.vec)),
                                       i -> q.vec[i] * dt[i])))) AS max_dot
      FROM cand c
      JOIN docs d ON d.doc_id = c.doc_id
      JOIN qtok q ON q.query_id = c.query_id
    ),
    scores AS (
      SELECT query_id, doc_id,
             CAST(ROUND(SUM(CAST(max_dot AS DECIMAL(38,18))), 6) AS DOUBLE)
               AS score
      FROM per_token GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rank
      FROM scores
    ) WHERE rank <= {MAXSIM_K}
    """,
    doc="The production two-stage retrieval shape end-to-end: a cheap "
        "single-vector first stage (per-doc centroid dot product, "
        "top-C per query — swap in ANN buckets at real scale, the "
        "plan composes unchanged) feeds the expensive late-interaction "
        "MaxSim, which scores ONLY the candidate pairs. Scale: stage 1 "
        "is one corpus pass over centroids with broadcast query "
        "centroids and a bounded top-C window; stage 2's work is "
        "O(queries x C x token-pairs), corpus-INDEPENDENT — the whole "
        "point of staging. Centroids and dots share the deterministic "
        "sorted fold order, per-pair scores are decimal sums.",
)
def q168_two_stage_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.retrieval import two_stage_maxsim
    from spark_relieffc_fselection_spark.queries import localize

    emb = load_table(spark, sf_dir, "embeddings")
    tok = emb.select(
        # integer division, NOT double division: vec_id/8 through a
        # DOUBLE truncates past 2^53 while the oracle's // is exact
        # at any id magnitude (ADVICE r9)
        F.expr(f"vec_id div {MAXSIM_TPD}").cast("long").alias("doc_id"),
        (F.col("vec_id") % MAXSIM_TPD).cast("int").alias("tok_idx"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    queries = localize(tok.filter(F.col("doc_id") % MAXSIM_QMOD == 0))
    return two_stage_maxsim(tok, queries, first_stage_c=MAXSIM_STAGE1_C, k=MAXSIM_K)
