"""Dedup queries over ``documents`` with full DuckDB oracles.

The oracle SQL mirrors each pipeline step-for-step (normalize ->
shingle -> hash -> index/bucket -> verify); the portable md5-prefix
hash makes signatures bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.dedup import (
    doc_shingle_hashes,
    exact_duplicate_groups,
    jaccard_similar_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    simhash_near_duplicates,
    simhash_signatures,
)
from spark_relieffc_fselection_spark.queries import register
from spark_relieffc_fselection_spark.sources import load_table

# The whole dedup family (q19 jaccard, q20 minhash sigs, q21 LSH) sits
# on one (doc_id, shingle_hash) table. Memoize ONE cached copy per
# (session, sf_dir) — same pattern as relief_q._PIPE_CACHE — so the
# explode+md5+distinct pass runs once per corpus, not once per query
# consumer (it feeds up to 4 sides per pipeline and ReuseExchange does
# not unify differently-projected reuses).
_SHINGLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SHINGLE_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        sh = doc_shingle_hashes(docs).cache()
        # Materialize NOW: an unmaterialized cache under a multi-consumer
        # plan is computed by every concurrent downstream stage (they
        # race to fill it), so the first query would pay the shingle
        # build up to 3x. One explicit job fills it exactly once.
        sh.count()
        _SHINGLE_CACHE[key] = sh
    return _SHINGLE_CACHE[key]

# Shared SQL fragments ---------------------------------------------------------

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_H64 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

_SHINGLES_CTE = f"""
toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, sh
  FROM toks, LATERAL (
    SELECT unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  ) u
),
shingle_hashes AS (
  SELECT DISTINCT doc_id, {_H64.format(x='sh')} AS shh FROM shingles
)
"""

JACCARD_THRESHOLD = 0.8
MINHASH_K, MINHASH_BANDS = 16, 8
SIMHASH_BITS, SIMHASH_BANDS, SIMHASH_MAXHAM = 60, 4, 3


# --- exact dedup ---------------------------------------------------------------

@register(
    "q18_dedup_exact",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, {_H64.format(x=_NORM)} AS content_hash FROM documents
    )
    SELECT content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
    FROM hashed GROUP BY content_hash
    """,
    doc="Exact dedup: hash-groupBy on normalized text; one narrow shuffle "
        "of (hash) regardless of corpus size",
)
def q18_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from spark_relieffc_fselection_spark.functions.text import md5_hash64, normalize_text

    return (
        docs.select(
            "doc_id", md5_hash64(normalize_text(F.col("text"))).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


# --- n-gram Jaccard ------------------------------------------------------------

@register(
    "q19_dedup_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingle_hashes GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM shingle_hashes a JOIN shingle_hashes b ON a.shh = b.shh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.id_a = sa.doc_id
    JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= {JACCARD_THRESHOLD}
    """,
    doc="Near-dup by 3-gram Jaccard via inverted-index self-join — "
        "candidates bounded by shared shingles, never all pairs",
)
def q19_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_similar_pairs(
        docs,
        threshold=JACCARD_THRESHOLD,
        df_cap=None,
        shingle_hashes=_shingles(spark, sf_dir),
    )


# --- MinHash signatures ----------------------------------------------------------

from spark_relieffc_fselection_spark.operators.dedup import minhash_family_expr

_FAMILY = minhash_family_expr("shh", div="//")  # DuckDB integer division

_SIGS_CTE = f"""
hv AS (
  SELECT doc_id, k, {_FAMILY} AS hv
  FROM shingle_hashes, LATERAL (SELECT unnest(generate_series(0, {MINHASH_K - 1})) AS k) u
),
sigs AS (SELECT doc_id, k, MIN(hv) AS minhash FROM hv GROUP BY doc_id, k)
"""


@register(
    "q20_minhash_signatures",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_SIGS_CTE}
    SELECT doc_id, k, minhash FROM sigs
    """,
    doc="MinHash signature matrix: one md5 per shingle + arithmetic "
        "universal family (overflow-safe mod 2^31-1 in both engines)",
)
def q20_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(
        docs, num_hashes=MINHASH_K, shingle_hashes=_shingles(spark, sf_dir)
    )


# --- MinHash + LSH near-dups -----------------------------------------------------

@register(
    "q21_minhash_lsh_neardup",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_SIGS_CTE},
    banded AS (
      SELECT doc_id, CAST(k / {MINHASH_K // MINHASH_BANDS} AS INT) AS band,
             {_H64.format(x="string_agg(minhash::VARCHAR, ',' ORDER BY k)")} AS bucket
      FROM sigs GROUP BY doc_id, band
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingle_hashes GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS inter
      FROM cands c
      JOIN shingle_hashes a ON a.doc_id = c.id_a
      JOIN shingle_hashes b ON b.doc_id = c.id_b AND b.shh = a.shh
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.id_a = sa.doc_id
    JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= {JACCARD_THRESHOLD}
    """,
    doc="MinHash banded LSH -> bucket candidates -> exact-Jaccard verify; "
        "only bucket-mates pay the verification join",
)
def q21_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        docs,
        threshold=JACCARD_THRESHOLD,
        num_hashes=MINHASH_K,
        bands=MINHASH_BANDS,
        shingle_hashes=_shingles(spark, sf_dir),
    )


# --- Edit-distance verified near-dups ---------------------------------------------

EDITDIST_REL, EDITDIST_PREFIX = 0.2, 256


@register(
    "q108_editdist_neardup",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_SIGS_CTE},
    banded AS (
      SELECT doc_id, CAST(k / {MINHASH_K // MINHASH_BANDS} AS INT) AS band,
             {_H64.format(x="string_agg(minhash::VARCHAR, ',' ORDER BY k)")} AS bucket
      FROM sigs GROUP BY doc_id, band
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    pref AS (
      SELECT doc_id, substr({_NORM}, 1, {EDITDIST_PREFIX}) AS p
      FROM documents
    ),
    v AS (
      SELECT c.id_a, c.id_b, levenshtein(a.p, b.p) AS lev,
             GREATEST(length(a.p), length(b.p), 1) AS mx
      FROM cands c
      JOIN pref a ON a.doc_id = c.id_a
      JOIN pref b ON b.doc_id = c.id_b
    )
    SELECT id_a, id_b, CAST(lev AS BIGINT) AS lev,
           ROUND(1.0 - lev / CAST(mx AS DOUBLE), 6) AS sim
    FROM v WHERE lev <= {EDITDIST_REL} * mx
    """,
    doc="Edit-distance-verified near-dup: MinHash-band LSH candidates "
        "(same buckets as q21), exact bounded-Levenshtein verify on "
        "256-char normalized prefixes — the edit-metric verifier "
        "catches char-level mutations set-based Jaccard under-scores. "
        "operators/dedup.editdist_near_duplicates; candidates bucketed "
        "+ capped, verify joins carry only (id, prefix), Spark's "
        "threshold DP early-exits non-accepting pairs. (DuckDB "
        "levenshtein counts bytes, Spark chars — equal on this "
        "all-ASCII corpus; engine-side semantics are char-correct.)",
)
def q108_editdist_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.dedup import (
        editdist_near_duplicates,
    )

    docs = load_table(spark, sf_dir, "documents")
    return editdist_near_duplicates(
        docs,
        max_rel_dist=EDITDIST_REL,
        num_hashes=MINHASH_K,
        bands=MINHASH_BANDS,
        prefix_chars=EDITDIST_PREFIX,
        shingle_hashes=_shingles(spark, sf_dir),
    )


# --- SimHash ---------------------------------------------------------------------

_SIMHASH_CTE = f"""
toks2 AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok FROM documents)
  WHERE tok <> ''
),
tokhash AS (SELECT doc_id, {_H64.format(x="tok")} AS hv FROM toks2),
bitvotes AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS votes
  FROM tokhash, LATERAL (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS j) u
  GROUP BY doc_id, j
),
simhashes AS (
  -- CAST: DuckDB SUM yields HUGEINT, which pandas would round through
  -- float64 and corrupt the low bits.
  SELECT doc_id,
         CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
  FROM bitvotes GROUP BY doc_id
)
"""


@register(
    "q22_simhash_signatures",
    oracle=f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM simhashes",
    doc="SimHash fingerprints: bitwise majority over token hashes",
)
def q22_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_signatures(docs, bits=SIMHASH_BITS)


@register(
    "q23_simhash_neardup",
    oracle=f"""
    WITH {_SIMHASH_CTE},
    banded AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * {SIMHASH_BITS // SIMHASH_BANDS}))
               & {(1 << (SIMHASH_BITS // SIMHASH_BANDS)) - 1} AS band_val
      FROM simhashes, LATERAL (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS band) u
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
    FROM cands WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_MAXHAM}
    """,
    doc="SimHash near-dups: pigeonhole banding (hamming<=bands-1 implies "
        "an equal band) -> per-band join -> hamming verify",
)
def q23_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(
        docs, max_hamming=SIMHASH_MAXHAM, bits=SIMHASH_BITS, bands=SIMHASH_BANDS
    )


# --- connected-components dedup clustering -------------------------------------

_JACCARD_PAIRS_CTE = f"""
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingle_hashes GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM shingle_hashes a JOIN shingle_hashes b ON a.shh = b.shh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON inter.id_a = sa.doc_id
  JOIN sizes sb ON inter.id_b = sb.doc_id
  WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= {JACCARD_THRESHOLD}
)
"""


#: q54 and q84 both need the connected-component labels over the
#: jaccard near-dup pairs; build them once per (session, sf_dir). The
#: label table is tiny (one row per clustered doc) and returned as a
#: LocalRelation-backed DataFrame via localize-like collect in the
#: operator's finalize='local' path, so holding it costs nothing.
_CLUSTER_CACHE: dict[tuple[str, str], DataFrame] = {}


def _clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CLUSTER_CACHE:
        from spark_relieffc_fselection_spark.operators.dedup import (
            connected_components,
        )

        docs = load_table(spark, sf_dir, "documents")
        pairs = jaccard_similar_pairs(
            docs,
            threshold=JACCARD_THRESHOLD,
            df_cap=None,
            shingle_hashes=_shingles(spark, sf_dir),
        ).select("id_a", "id_b")
        _CLUSTER_CACHE[key] = connected_components(pairs, finalize="local")
    return _CLUSTER_CACHE[key]


@register(
    "q54_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_JACCARD_PAIRS_CTE},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM prs
      UNION
      SELECT id_b AS a, id_a AS b FROM prs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    lab AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM lab
    """,
    doc="Dedup CLUSTERING: connected components (min-label propagation) "
        "over the Jaccard near-dup pairs — each group gets a canonical "
        "member (cluster_id = min reachable doc_id). The oracle computes "
        "the same closure with a recursive CTE.",
)
def q54_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cc = _clusters(spark, sf_dir)
    return cc.withColumn(
        "cluster_size", F.count("*").over(Window.partitionBy("cluster_id"))
    )


# --- incremental (cross-batch) dedup -------------------------------------------

#: deterministic batch membership: ~20% of docs form the "new crawl".
#: Hash-based (md5 of doc_id), NOT doc_id modulo: the synthetic corpus
#: assigns source = doc_id mod 20, so a modulo split would collapse the
#: batch onto 4 sources; the hash split is independent of every column.
INCR_MOD, INCR_NEW = 10, 8  # hash bucket >= 8 -> new batch
_INCR_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 2, 5))::BIGINT % {m})"


@register(
    "q81_incremental_dedup",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, source, {_H64.format(x=_NORM)} AS h,
             {_INCR_BUCKET.format(m=INCR_MOD)} AS bk
      FROM documents
    ),
    existing AS (SELECT DISTINCT h FROM hashed WHERE bk < {INCR_NEW}),
    batch AS (SELECT * FROM hashed WHERE bk >= {INCR_NEW}),
    first_in_batch AS (SELECT h, MIN(doc_id) AS first_id FROM batch GROUP BY h),
    labeled AS (
      SELECT b.source,
             CASE WHEN e.h IS NOT NULL THEN 'dup_of_existing'
                  WHEN b.doc_id <> f.first_id THEN 'dup_in_batch'
                  ELSE 'new_unique' END AS status
      FROM batch b
      LEFT JOIN existing e ON b.h = e.h
      JOIN first_in_batch f ON b.h = f.h
    )
    SELECT source, status, COUNT(*) AS n_docs
    FROM labeled GROUP BY source, status
    """,
    doc="INCREMENTAL dedup — the daily-crawl shape: a new batch of "
        "documents is deduped against the fingerprint store of the "
        "already-ingested corpus (dup_of_existing), then within itself "
        "(dup_in_batch, min-doc_id canonical), and only new_unique rows "
        "ship onward. At 100 TB the fingerprint store is a "
        "bucketed-by-hash table, so the anti-join is co-partitioned "
        "with NO shuffle of the store; the batch side (small) shuffles "
        "once. Here: one hash per row, one distinct over the store "
        "side, one left join + within-batch min.",
)
def q81_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.functions.text import (
        md5_hash64,
        normalize_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 2, 5), 16, 10
        ).cast("bigint")
        % INCR_MOD
    )
    hashed = docs.select(
        "doc_id",
        "source",
        md5_hash64(normalize_text(F.col("text"))).alias("h"),
        bucket.alias("bk"),
    )
    is_new = F.col("bk") >= INCR_NEW
    existing = (
        hashed.filter(~is_new).select("h").distinct().withColumn("seen", F.lit(1))
    )
    batch = hashed.filter(is_new)
    first = batch.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    labeled = (
        batch.join(existing, "h", "left")
        .join(first, "h")
        .select(
            "source",
            F.when(F.col("seen").isNotNull(), "dup_of_existing")
            .when(F.col("doc_id") != F.col("first_id"), "dup_in_batch")
            .otherwise("new_unique")
            .alias("status"),
        )
    )
    return labeled.groupBy("source", "status").agg(F.count("*").alias("n_docs"))


# --- canonical selection (q84) -------------------------------------------------


@register(
    "q84_canonical_selection",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_JACCARD_PAIRS_CTE},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM prs
      UNION
      SELECT id_b AS a, id_a AS b FROM prs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    lab AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
    ),
    all_lab AS (
      SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id, d.n_chars
      FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id ASC) = 1
             AS is_canonical
    FROM all_lab
    """,
    doc="Canonical selection — the KEEP decision that finishes every "
        "dedup pass: each near-dup cluster (q54's connected components; "
        "singletons are their own cluster) keeps exactly one member, the "
        "longest document with min-doc_id tiebreak, and the rest are "
        "marked for drop. Per-doc verdicts, so downstream is one filter. "
        "Scale: the window partitions by cluster_id — clusters are "
        "near-dup groups, inherently small, so no skewed partition; the "
        "left join against the cluster labels is the only corpus-sized "
        "shuffle.",
)
def q84_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cc = _clusters(spark, sf_dir)
    all_lab = (
        docs.select("doc_id", "n_chars")
        .join(cc.select("doc_id", "cluster_id"), "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    w = Window.partitionBy("cluster_id")
    rk = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return all_lab.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.row_number().over(rk) == 1).alias("is_canonical"),
    )


# --- Exact-substring (k-token run) dedup (Lee et al. 2022) -------------------

KGRAM_K = 15

#: The two substring queries share one (doc_id, pos, gram_hash,
#: n_tokens) table — memoized per (session, sf_dir) like _SHINGLE_CACHE
#: so the tokenize+gram scan runs once per corpus.
_KGRAM_CACHE: dict[tuple[str, str], DataFrame] = {}


def _kgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.dedup import (
        kgram_position_hashes,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _KGRAM_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        g = kgram_position_hashes(docs, KGRAM_K).cache()
        g.count()
        _KGRAM_CACHE[key] = g
    return _KGRAM_CACHE[key]


_KGRAMS_CTE = f"""
ktoks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
),
kgrams AS (
  SELECT doc_id, u.i AS pos, len(t) AS n_tokens,
         {_H64.format(x=f"array_to_string(list_slice(t, u.i, u.i + {KGRAM_K - 1}), ' ')")} AS gh
  FROM ktoks,
       LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - {KGRAM_K - 1}, 0))) AS i) u
)
"""


@register(
    "q94_substring_dedup",
    oracle=f"""
    WITH {_KGRAMS_CTE},
    capped AS (
      SELECT gh FROM kgrams GROUP BY gh HAVING COUNT(DISTINCT doc_id) <= 1000
    ),
    dg AS (SELECT doc_id, pos, gh FROM kgrams WHERE gh IN (SELECT gh FROM capped))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(DISTINCT a.gh) AS n_shared_grams,
           MIN(a.pos) AS a_start, MAX(a.pos) + {KGRAM_K - 1} AS a_end,
           MIN(b.pos) AS b_start, MAX(b.pos) + {KGRAM_K - 1} AS b_end
    FROM dg a JOIN dg b ON a.gh = b.gh AND a.doc_id < b.doc_id
    GROUP BY id_a, id_b
    """,
    doc="Exact-substring dedup (Lee et al. 2022): doc pairs sharing a "
        f"run of >= {KGRAM_K} consecutive tokens, with the shared "
        "material's position bounds in each doc. Positional run "
        "sharing catches long verbatim quotes that set-based Jaccard "
        "dilutes away. ONE zero-shuffle corpus scan emits rolling gram "
        "hashes (per-row transform over the token array); the "
        "inverted-index join is bounded by the boilerplate df-cap.",
)
def q94_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.dedup import (
        shared_kgram_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return shared_kgram_pairs(
        docs, k=KGRAM_K, gram_hashes=_kgrams(spark, sf_dir)
    )


@register(
    "q95_substring_contamination",
    oracle=f"""
    WITH {_KGRAMS_CTE},
    freq AS (
      SELECT gh FROM kgrams GROUP BY gh
      HAVING COUNT(DISTINCT doc_id) > 1 AND COUNT(DISTINCT doc_id) <= 1000
    ),
    cov AS (
      SELECT g.doc_id, g.n_tokens, v.p
      FROM kgrams g,
           LATERAL (SELECT unnest(generate_series(g.pos, g.pos + {KGRAM_K - 1})) AS p) v
      WHERE g.gh IN (SELECT gh FROM freq)
    )
    SELECT doc_id, ANY_VALUE(n_tokens) AS n_tokens,
           COUNT(DISTINCT p) AS n_covered,
           ROUND(COUNT(DISTINCT p) / CAST(ANY_VALUE(n_tokens) AS DOUBLE), 6)
             AS coverage
    FROM cov GROUP BY doc_id
    """,
    doc="Per-doc contaminated-span fraction: how much of each document "
        f"is covered by >= {KGRAM_K}-token runs shared with ANY other "
        "doc — the Lee et al. metric that drives span-level (not "
        "doc-level) dedup decisions. Shared grams from one groupBy on "
        "the memoized gram table; covered positions union'd exactly by "
        "exploding [pos, pos+k-1] per shared gram (bounded by doc "
        "length, never corpus-sized).",
)
def q95_substring_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.dedup import (
        substring_contamination,
    )

    docs = load_table(spark, sf_dir, "documents")
    return substring_contamination(
        docs, k=KGRAM_K, gram_hashes=_kgrams(spark, sf_dir)
    )


# --- Content-defined chunking (q98) -------------------------------------------

CDC_DIV = 16
CDC_G = 3


@register(
    "q98_cdc_chunking",
    oracle=f"""
    WITH ctoks AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
    ),
    bnd AS (
      SELECT doc_id, t,
             list_filter(
               list_transform(
                 generate_series(1, greatest(len(t) - {CDC_G - 1}, 0)),
                 i -> CASE WHEN {_H64.format(x=f"array_to_string(list_slice(t, i, i + {CDC_G - 1}), ' ')")}
                             % {CDC_DIV} = 0
                      THEN i END),
               x -> x IS NOT NULL) AS bp
      FROM ctoks
    ),
    chunks AS (
      SELECT doc_id, t, u.k AS chunk_idx,
             CASE WHEN u.k = 0 THEN 1 ELSE bp[u.k] + 1 END AS start_pos,
             CASE WHEN u.k = len(bp) THEN len(t) ELSE bp[u.k + 1] END AS end_pos
      FROM bnd, LATERAL (SELECT unnest(generate_series(0, len(bp))) AS k) u
    )
    SELECT doc_id, chunk_idx, start_pos,
           end_pos - start_pos + 1 AS n_chunk_tokens,
           {_H64.format(x="array_to_string(list_slice(t, start_pos, end_pos), ' ')")} AS chunk_hash
    FROM chunks WHERE end_pos >= start_pos
    """,
    doc="Content-defined chunking (Rabin/CDC as in LBFS and every dedup "
        "store since): chunk boundaries fall where the rolling "
        f"{CDC_G}-token hash is 0 mod {CDC_DIV}, so boundaries follow "
        "the CONTENT — inserting a sentence re-keys only the chunks it "
        "touches, while fixed-size chunking (q91) re-keys everything "
        "after the edit. Chunk hashes feed chunk-level exact dedup "
        "across shifted/edited near-duplicates. Entirely per-row "
        "Catalyst array math (one token split per row, let-bound "
        "boundary array), zero shuffle.",
)
def q98_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.dedup import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    return cdc_chunks(docs, divisor=CDC_DIV, gram=CDC_G)


# --- Bloom-filter dedup (approximate anti-join) --------------------------------

BLOOM_M, BLOOM_K = 1 << 16, 3


@register(
    "q109_bloom_dedup",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, source, {_NORM} AS norm,
             {_INCR_BUCKET.format(m=INCR_MOD)} AS bk
      FROM documents
    ),
    pos AS (
      SELECT ('0x' || substr(md5(norm || '#' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
             % {BLOOM_M} AS pos
      FROM hashed CROSS JOIN range({BLOOM_K}) t(i)
      WHERE bk < {INCR_NEW}
    ),
    words AS (
      SELECT pos // 63 AS word_idx,
             bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS word
      FROM pos GROUP BY 1
    ),
    batchpos AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(norm || '#' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
             % {BLOOM_M} AS pos
      FROM hashed CROSS JOIN range({BLOOM_K}) t(i)
      WHERE bk >= {INCR_NEW}
    ),
    probed AS (
      SELECT doc_id, ANY_VALUE(source) AS source,
             bool_and(w.word IS NOT NULL AND
                      (w.word & (1::BIGINT << CAST(b.pos % 63 AS INT))) <> 0)
               AS maybe
      FROM batchpos b LEFT JOIN words w ON b.pos // 63 = w.word_idx
      GROUP BY doc_id
    )
    SELECT source,
           CASE WHEN maybe THEN 'maybe_dup' ELSE 'new' END AS bloom_status,
           COUNT(*) AS n_docs
    FROM probed GROUP BY 1, 2
    """,
    doc="BLOOM-FILTER dedup — the q81 daily-crawl shape with the exact "
        "store join replaced by an approximate-membership probe: the "
        f"store's normalized content hashes into a {BLOOM_M}-bit / "
        f"{BLOOM_K}-hash Bloom filter (~1040 63-bit bitmap words via map-side "
        "bit_or — the store never shuffles its strings, no distinct "
        "needed since OR is idempotent), and the new batch probes it "
        "through k BROADCAST joins (map-only; the batch never shuffles "
        "either). 'new' is exact (no false negatives); 'maybe_dup' "
        "includes the filter's deterministic false positives, which "
        "the oracle reproduces bit-for-bit. At 100 TB this is how a "
        "batch pre-screens against a multi-TB fingerprint store — only "
        "the maybe_dup minority pays the exact verify join.",
)
def q109_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.functions.text import normalize_text
    from spark_relieffc_fselection_spark.operators.dedup import (
        bloom_filter_probe,
        bloom_filter_words,
    )

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 2, 5), 16, 10
        ).cast("bigint")
        % INCR_MOD
    )
    hashed = docs.select(
        "doc_id",
        "source",
        normalize_text(F.col("text")).alias("norm"),
        bucket.alias("bk"),
    )
    from spark_relieffc_fselection_spark.queries import localize

    # One build job; the probe references the filter k times and
    # ReuseExchange will NOT unify the aliased subtrees — localizing
    # the driver-sized word table (<= m/63 rows) keeps the store
    # scanned exactly once.
    words = localize(
        bloom_filter_words(
            hashed.filter(F.col("bk") < INCR_NEW), "norm", BLOOM_M, BLOOM_K
        )
    )
    probed = bloom_filter_probe(
        hashed.filter(F.col("bk") >= INCR_NEW), words, "norm", BLOOM_M, BLOOM_K
    )
    return probed.groupBy(
        "source",
        F.when(F.col("bloom_maybe"), "maybe_dup")
        .otherwise("new")
        .alias("bloom_status"),
    ).agg(F.count("*").alias("n_docs"))


# --- cross-source overlap matrix (q113) ----------------------------------------


@register(
    "q113_source_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT source, string_split({_NORM}, ' ') AS t FROM documents
    ),
    hashed AS (
      SELECT DISTINCT source AS src, {_H64.format(x='sh')} AS h
      FROM toks, LATERAL (
        SELECT unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      ) u
    ),
    sizes AS (SELECT src, COUNT(*) AS n FROM hashed GROUP BY src),
    shared AS (
      SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS n_shared
      FROM hashed a JOIN hashed b ON a.h = b.h AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b, s.n_shared,
           na.n AS n_a, nb.n AS n_b,
           ROUND(s.n_shared / CAST(least(na.n, nb.n) AS DOUBLE), 6)
             AS overlap_coef
    FROM shared s
    JOIN sizes na ON s.source_a = na.src
    JOIN sizes nb ON s.source_b = nb.src
    """,
    doc="CROSS-SOURCE overlap matrix — the leakage report every corpus "
        "refresh needs (how much of snapshot N+1 is snapshot N? how "
        "much of source X mirrors Y?): pairwise shared "
        "3-gram shingle hashes per source pair with the "
        "Szymkiewicz-Simpson overlap coefficient. Inverted self-join "
        "on the 60-bit hash whose per-key fan-out is bounded by the "
        "SOURCE count (the join input is the distinct (source, hash) "
        "projection), output <= |sources|^2/2 rows; the corpus "
        "shuffles once (~16 B/doc after map-side distinct).",
)
def q113_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.dedup import (
        source_overlap_matrix,
    )

    docs = load_table(spark, sf_dir, "documents")
    return source_overlap_matrix(
        docs, granularity="shingle", shingle_hashes=_shingles(spark, sf_dir)
    )


# --- cluster-aware train/val/test split (q114) ---------------------------------

SPLIT_MOD, SPLIT_TRAIN, SPLIT_VAL = 10, 8, 9  # <8 train, 8 val, 9 test


@register(
    "q114_cluster_aware_split",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_JACCARD_PAIRS_CTE},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM prs
      UNION
      SELECT id_b AS a, id_a AS b FROM prs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    lab AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
    ),
    assigned AS (
      SELECT d.doc_id, d.source,
             COALESCE(l.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    ),
    split AS (
      SELECT source, cluster_id,
             CASE WHEN (('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 2, 5))::BIGINT
                        % {SPLIT_MOD}) < {SPLIT_TRAIN} THEN 'train'
                  WHEN (('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 2, 5))::BIGINT
                        % {SPLIT_MOD}) = {SPLIT_TRAIN} THEN 'val'
                  ELSE 'test' END AS split
      FROM assigned
    )
    SELECT split, source, COUNT(*) AS n_docs,
           COUNT(DISTINCT cluster_id) AS n_clusters
    FROM split GROUP BY 1, 2
    """,
    doc="CLUSTER-AWARE train/val/test split — the evaluation-leakage "
        "guard (C4/Pile-style): near-duplicate documents must land in "
        "the SAME split or test metrics are contaminated, so the split "
        "key is the dedup CLUSTER id (q54's connected components; "
        "singletons key on their own doc_id), hashed into "
        f"{SPLIT_TRAIN}/1/1 train/val/test buckets. By construction no "
        "cluster straddles splits (unit-tested); the driver hashes the "
        "per-(split, source) doc and cluster counts. Scale: one "
        "broadcast-sized cluster table joined to the corpus + one "
        "aggregate — the CC cost is q54's, shared via the family "
        "cache.",
)
def q114_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cc = _clusters(spark, sf_dir).select("doc_id", "cluster_id")
    labeled = docs.select("doc_id", "source").join(
        F.broadcast(cc), "doc_id", "left"
    )
    cluster = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    bucket = (
        F.conv(
            F.substring(F.md5(cluster.cast("string")), 2, 5), 16, 10
        ).cast("bigint")
        % SPLIT_MOD
    )
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket == SPLIT_TRAIN, "val")
        .otherwise("test")
    )
    return (
        labeled.select(
            split.alias("split"),
            "source",
            cluster.alias("cluster_key"),
        )
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("cluster_key").alias("n_clusters"),
        )
    )
