"""Deduplication operators for LLM training-data pipelines.

Five dedup families, all DataFrame-first (BASELINE.json north-star;
the reference has no dedup — these share the engine's join/agg/top-k
core, SURVEY §7.4):

  * exact           — hash-groupBy on normalized content
  * ngram-Jaccard   — shingle-set overlap via exploded self-join
  * MinHash + LSH   — banded signature bucketing, verified candidates
  * SimHash         — bitwise majority fingerprint, banded hamming
  * embedding cosine— near-dup by vector similarity (see simsearch)

Scale design: every pipeline is shuffle-bounded by *candidate pairs*,
never all pairs. Exact dedup shuffles one hash per doc; Jaccard joins
on shingle (inverted index — skew-prone on stop-shingles, so shingles
above a doc-frequency cap are dropped like any sane inverted index);
MinHash/SimHash bucket first and verify only within buckets. At 100 TB
none of these materializes O(n^2) anything.

All hashes are the portable md5-prefix integer so every pipeline has a
full DuckDB oracle.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.functions.partitioning import ensure_parallelism
from spark_relieffc_fselection_spark.functions.text import (
    md5_hash64,
    normalize_text,
    tokens,
    word_shingles,
)

#: Shingles appearing in more than this many docs are dropped from the
#: Jaccard inverted index (stop-shingle skew guard).
DEFAULT_DF_CAP = 1000

#: LSH/SimHash buckets with more members than this are dropped before
#: pair generation. A degenerate hot bucket (e.g. millions of byte-
#: identical docs landing in one (band, bucket)) would otherwise
#: generate its O(n^2) pairs inside a single task. Docs in a dropped
#: bucket can still pair through their OTHER bands; byte-identical
#: corpora belong to exact_duplicate_groups first anyway.
DEFAULT_MAX_BUCKET_MEMBERS = 10_000

#: Monotonic suffix so each capped-bucket observe() metric name is
#: unique within a query plan (Spark rejects duplicate observation
#: names in one plan, e.g. a pipeline composing MinHash + SimHash).
#: itertools.count is GIL-atomic, so concurrent query runners (the
#: same hazard events_q guards with _STAGED_LOCK) can never mint the
#: same suffix twice (ADVICE r4).
_obs_counter = itertools.count(1)


def _capped_buckets(
    grouped: DataFrame,
    arr_col: str,
    max_members: int,
    observation=None,
) -> DataFrame:
    """Filter bucket rows whose member array exceeds ``max_members``,
    attaching an ``observe()`` metric (``dropped_buckets`` /
    ``dropped_members``) so drops are visible in the Spark UI and
    QueryExecution listeners at zero extra-job cost. Pass a
    ``pyspark.sql.Observation`` to read the counters programmatically
    after an action (tests, drop-rate monitors); the default is a
    uniquely-named fire-and-forget metric.

    The collect_list buffer itself is still O(bucket) in memory — the
    cap bounds the quadratic pair blow-up, while upstream guards
    (df_cap stop-shingles, exact-dedup-first) bound the linear buffer.
    """
    too_big = F.size(arr_col) > max_members
    target = (
        observation
        if observation is not None
        else f"bucket_cap_{next(_obs_counter)}"
    )
    return grouped.observe(
        target,
        F.sum(F.when(too_big, 1).otherwise(0)).alias("dropped_buckets"),
        F.sum(F.when(too_big, F.size(arr_col)).otherwise(0)).alias(
            "dropped_members"
        ),
    ).filter(~too_big)


def exact_duplicate_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of exact duplicates (on normalized text).

    Returns (content_hash, n_dups, canonical_id) for groups with >1 doc;
    canonical = lowest id. One narrow hash + one groupBy shuffle.
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            md5_hash64(normalize_text(F.col(text_col))).alias("content_hash"),
        )
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_dups") > 1)
    )


def doc_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (doc_id, shingle) long table — the inverted-index input."""
    docs = ensure_parallelism(docs)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("shingle"),
        )
        .distinct()
    )


def doc_shingle_hashes(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (doc_id, sh) with sh = 60-bit shingle hash.

    Joining the inverted index on int64 keys instead of strings cuts
    shuffle bytes and comparison cost substantially; the oracle hashes
    identically, so any (vanishingly rare) hash collision affects both
    engines the same way.
    """
    docs = ensure_parallelism(docs)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("shingle"),
        )
        .select("doc_id", md5_hash64(F.col("shingle")).alias("sh"))
        .distinct()
    )


def jaccard_similar_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int | None = DEFAULT_DF_CAP,
    shingle_hashes: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard >= threshold.

    Inverted-index join: docs sharing >=1 shingle become candidates;
    |A ∩ B| = count of shared shingles, |A ∪ B| = |A| + |B| - inter.
    Returns (id_a, id_b, jaccard) with id_a < id_b. ``df_cap=None``
    disables the stop-shingle guard (and skips its extra pass).

    ``shingle_hashes``: prebuilt (doc_id, sh) table (ideally cached by
    the caller — the query layer shares ONE cached table across the
    whole dedup family). When absent we cache locally: the table feeds
    sizes + both join sides, and ReuseExchange does NOT dedupe them
    (the sides carry different projections), so without a cache the
    explode+hash+distinct runs three times (measured 5x slower sf0.1).
    """
    if shingle_hashes is not None:
        sh = shingle_hashes
    else:
        sh = doc_shingle_hashes(docs, n, text_col, id_col).cache()
        sh.count()  # fill once — concurrent consumer stages race otherwise
    if df_cap is not None:
        df_counts = sh.groupBy("sh").agg(F.count("*").alias("df"))
        sh = sh.join(df_counts.filter(F.col("df") <= df_cap), "sh").select(
            "doc_id", "sh"
        )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "sh")
    b = sh.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


#: Modulus of the arithmetic minhash family (Mersenne prime 2^31-1):
#: all intermediate products stay under 2^63, so the identical integer
#: expression runs overflow-free (ANSI-safe) in Spark AND DuckDB.
MINHASH_M = (1 << 31) - 1

def minhash_family_expr(hash_col: str, k_col: str = "k", div: str = "DIV") -> str:
    """h_k(h) = (a1(k)*(h % M) + a2(k)*(h div M) + b(k)) mod M — a
    universal-ish family keyed by k, derived arithmetically so only ONE
    md5 per shingle is ever computed. All products stay under 2^63
    (ANSI-safe). ``div`` is the integer-division keyword: ``DIV`` for
    Spark SQL, ``//`` for DuckDB — the expression is otherwise
    identical, which is what keeps the oracle bit-compatible.
    """
    M = MINHASH_M
    return (
        f"(((2654435761 * ({k_col} + 1)) % {M}) * ({hash_col} % {M}) "
        f"+ ((40503 * ({k_col} + 7)) % {M}) * ({hash_col} {div} {M}) "
        f"+ (97 * ({k_col} + 13)) % {M}) % {M}"
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_hashes: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, k, minhash) — k in 0..num_hashes-1.

    One md5 per distinct shingle (the base 60-bit hash), then the k
    family members derived arithmetically (MINHASH_FAMILY_SQL) — ~16x
    fewer hash computations than an md5-per-(k, shingle) family. Docs
    with no shingles get no signature rows.
    """
    if shingle_hashes is None:
        shingle_hashes = doc_shingle_hashes(docs, n, text_col, id_col)
    return minhash_signatures_from_hashes(shingle_hashes, num_hashes)


def minhash_signatures_from_hashes(sh: DataFrame, num_hashes: int) -> DataFrame:
    """Signature matrix from a prebuilt (doc_id, sh) hash table."""
    ks = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("k")
    family = F.expr(minhash_family_expr("sh"))
    return (
        sh.select("doc_id", "sh", ks)
        .select("doc_id", "k", family.alias("hv"))
        .groupBy("doc_id", "k")
        .agg(F.min("hv").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int,
    rows_per_band: int,
    max_bucket_members: int = DEFAULT_MAX_BUCKET_MEMBERS,
    observation=None,
) -> DataFrame:
    """Banded LSH: docs sharing any full band of their signature.

    bucket = hash of the band's ordered minhash values; candidates are
    pairs within a bucket. Output (id_a, id_b) distinct, id_a < id_b.
    The shuffle is per-(band, bucket) — never all-pairs; buckets above
    ``max_bucket_members`` are dropped (observed, see _capped_buckets)
    rather than exploding O(n^2) pairs in one task.
    """
    banded = (
        signatures.withColumn("band", (F.col("k") / rows_per_band).cast("int"))
        .filter(F.col("band") < bands)
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("k"), F.col("minhash")))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("band_key")
        )
        .select("doc_id", "band", md5_hash64(F.col("band_key")).alias("bucket"))
    )
    # Within-bucket pairs via ONE grouped pass, not a self-join: a
    # self-join would embed the un-cached signature pipeline twice in
    # the plan and Spark executes both branches. The member list per
    # bucket is the linear object (the pair set is quadratic in either
    # plan shape); upstream df_cap / stop-shingle guards keep buckets
    # bounded. Repartition before the explode: the grouped rows are
    # tiny in bytes and AQE would coalesce them onto a few cores,
    # serializing the pair generation.
    par = signatures.sparkSession.sparkContext.defaultParallelism
    buckets = _capped_buckets(
        banded.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1),
        "ids",
        max_bucket_members,
        observation,
    ).repartition(par, "band", "bucket")
    return (
        buckets.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_hashes: DataFrame | None = None,
    max_bucket_members: int = DEFAULT_MAX_BUCKET_MEMBERS,
    observation=None,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: bucket -> candidates -> verify
    with true Jaccard (only candidates pay the verification join).

    One shingle-hash table feeds signatures, sizes, and both sides of
    the verification join — four consumers with distinct projections,
    which ReuseExchange does not unify; pass a caller-cached
    ``shingle_hashes`` (preferred) or we cache locally.
    """
    rows_per_band = num_hashes // bands
    if shingle_hashes is not None:
        sh = shingle_hashes
    else:
        sh = doc_shingle_hashes(docs, n, text_col, id_col).cache()
        sh.count()  # fill once — concurrent consumer stages race otherwise

    sigs = minhash_signatures_from_hashes(sh, num_hashes)
    cands = lsh_candidate_pairs(
        sigs, bands, rows_per_band, max_bucket_members, observation
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        cands.join(sh.select(F.col("doc_id").alias("id_a"), "sh"), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def editdist_near_duplicates(
    docs: DataFrame,
    max_rel_dist: float = 0.2,
    num_hashes: int = 16,
    bands: int = 8,
    prefix_chars: int = 256,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_hashes: DataFrame | None = None,
    max_bucket_members: int = DEFAULT_MAX_BUCKET_MEMBERS,
    observation=None,
) -> DataFrame:
    """Edit-distance-verified near-dup: MinHash-band LSH candidates,
    exact Levenshtein verify — the two-stage shape of ExactSubstr-style
    fuzzy dedup where the verifier must be an EDIT metric (catches
    token-order rewrites that set-based Jaccard scores as similar and
    char-level mutations it scores as distant).

    Verification runs on the first ``prefix_chars`` characters of the
    normalized text (documented truncation: Levenshtein is O(L^2) per
    pair, so an uncapped verify on book-length outliers would own the
    stage; 256 normalized chars discriminates near-dups at crawl doc
    granularity). The DP early-exits via Spark's bounded
    ``levenshtein(l, r, threshold)`` — any pair whose true distance
    exceeds the largest possible accepting distance returns -1 without
    filling the DP table.

    Scale: candidates come from :func:`lsh_candidate_pairs` (bucketed,
    capped, never all-pairs); the verify joins only (id, prefix) pairs
    — 2 x ``prefix_chars`` bytes per candidate — and is embarrassingly
    parallel.

    Keeps pairs with ``lev <= max_rel_dist * max(len_a, len_b)``.
    Returns (id_a, id_b, lev, sim), sim = 1 - lev/max_len rounded to 6.
    Oracle note: DuckDB's ``levenshtein`` counts BYTES while Spark
    counts CHARACTERS — identical on ASCII corpora (the testdata is
    all-ASCII; non-ASCII corpora still dedup correctly engine-side,
    only the cross-engine oracle needs byte==char).
    """
    rows_per_band = num_hashes // bands
    if shingle_hashes is not None:
        sh = shingle_hashes
    else:
        sh = doc_shingle_hashes(docs, n, text_col, id_col).cache()
        sh.count()  # fill once — concurrent consumer stages race otherwise
    sigs = minhash_signatures_from_hashes(sh, num_hashes)
    cands = lsh_candidate_pairs(
        sigs, bands, rows_per_band, max_bucket_members, observation
    )
    pref = docs.select(
        F.col(id_col),
        F.substring(normalize_text(F.col(text_col)), 1, prefix_chars).alias(
            "p"
        ),
    )
    # largest distance any pair can accept is max_rel_dist*prefix_chars;
    # +1 so the bounded DP never clips an accepting pair
    dp_bound = int(max_rel_dist * prefix_chars) + 1
    return (
        cands.join(
            pref.select(F.col(id_col).alias("id_a"), F.col("p").alias("pa")),
            "id_a",
        )
        .join(
            pref.select(F.col(id_col).alias("id_b"), F.col("p").alias("pb")),
            "id_b",
        )
        .withColumn(
            "lev",
            # equality short-circuit: exact-dup cliques (the dominant
            # candidate class when upstream exact dedup hasn't run yet)
            # verify with an O(L) comparison instead of the O(L*t) DP
            F.when(F.col("pa") == F.col("pb"), F.lit(0))
            .otherwise(F.levenshtein("pa", "pb", dp_bound))
            .cast("bigint"),
        )
        .withColumn(
            "mx", F.greatest(F.length("pa"), F.length("pb"), F.lit(1))
        )
        .filter(
            (F.col("lev") >= 0)
            & (F.col("lev") <= F.lit(max_rel_dist) * F.col("mx"))
        )
        .select(
            "id_a",
            "id_b",
            "lev",
            F.round(
                F.lit(1.0) - F.col("lev") / F.col("mx").cast("double"), 6
            ).alias("sim"),
        )
    )


def simhash_signatures(
    docs: DataFrame,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, simhash) — bitwise majority over token hashes.

    bit j of simhash = 1 iff sum over tokens of (+1 if token-hash bit j
    else -1) > 0. Distinct tokens weighted once (set semantics, keeps
    the SQL oracle simple and the operator deterministic).
    """
    tok = (
        ensure_parallelism(docs).select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
        .select("doc_id", md5_hash64(F.col("tok")).alias("hv"))
    )
    # Explode to (doc, bit) vote rows + two groupBys. Looks like it
    # shuffles n_tokens x bits rows, but partial aggregation combines
    # map-side, so the exchange carries <= docs x bits tiny rows per
    # partition regardless of token volume. The tempting alternative —
    # `bits` conditional SUM aggregates in one groupBy — was measured
    # 2x SLOWER at sf0.1 (1.8s vs 0.96s): 60 wide per-row aggregate
    # updates lose to the narrow codegen'd explode pipeline.
    j = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    bit_votes = (
        tok.select("doc_id", "hv", j)
        .select(
            "doc_id",
            "j",
            # shiftright/shiftleft builtins take a literal shift only;
            # column-valued shifts need the SQL expression form.
            F.when(F.expr("shiftright(hv, j) & 1") == 1, 1).otherwise(-1).alias("vote"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("vote").alias("votes"))
    )
    return bit_votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("votes") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0)
        ).alias("simhash")
    )


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_members: int = DEFAULT_MAX_BUCKET_MEMBERS,
    observation=None,
) -> DataFrame:
    """SimHash near-dups: band the fingerprint (pigeonhole: hamming <=
    bands-1 implies an equal band), join per band, verify hamming.
    Buckets above ``max_bucket_members`` are dropped (observed) rather
    than exploding O(n^2) pairs in one task — see _capped_buckets."""
    sigs = simhash_signatures(docs, bits, text_col, id_col)
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, band * {band_bits}) & {mask}"),
    )
    # Within-bucket pairs via ONE grouped pass, not a self-join: a
    # self-join would embed the un-cached signature computation
    # (tokenize -> distinct -> per-bit votes, the pipeline's expensive
    # part) twice in the plan and Spark executes both branches. Same
    # shape as lsh_candidate_pairs; member lists are the linear object,
    # pairs are quadratic under either plan.
    par = docs.sparkSession.sparkContext.defaultParallelism
    buckets = _capped_buckets(
        banded.groupBy("band", "band_val")
        .agg(
            F.collect_list(F.struct(F.col("doc_id"), F.col("simhash"))).alias("ms")
        )
        .filter(F.size("ms") > 1),
        "ms",
        max_bucket_members,
        observation,
    ).repartition(par, "band", "band_val")
    cands = (
        buckets.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


#: Edge-count threshold under which connected_components(strategy=
#: "auto") collects the graph and runs driver-side union-find: a
#: near-dup graph this small costs more in per-round shuffle latency
#: than in data volume (4+ rounds x join+agg+count vs one collect).
_CC_LOCAL_MAX_EDGES = 2_000_000


def bidirectional_edges(
    edges: DataFrame, src_col: str = "id_a", dst_col: str = "id_b"
) -> DataFrame:
    """Undirected edge list -> distinct ``(a, b)`` adjacency with both
    orientations, self-loops dropped — in ONE pass over the edge rows.

    A self-union (``fwd.unionByName(rev)``) would embed the caller's
    edge subplan TWICE in the physical plan, and Spark executes both
    branches — callers hand in un-cached candidate pipelines (LSH
    bucket join + exact verify), so that shape runs the whole near-dup
    discovery twice. Exploding the two orientations from each edge row
    keeps the expensive subtree unique (pinned by tests/test_plans.py).
    """
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
                    ),
                    F.struct(
                        F.col(dst_col).alias("a"), F.col(src_col).alias("b")
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _cc_two_phase_star(adj: DataFrame, max_iter: int) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) —
    converges in O(log diameter) rounds vs label propagation's
    O(diameter), the escape hatch for chain-shaped near-dup graphs.

    ``adj`` is the symmetric distinct (a, b) adjacency. Each round:

      * large-star: every node u connects its LARGER neighbors to
        m = min(neighborhood(u) + {u}) — one groupBy-min + one join.
      * small-star: on the resulting larger->smaller directed edges,
        every node u connects its smaller neighbors AND itself to the
        minimum of that set — same join shape.

    Both phases emit via a single explode (never a self-union, which
    would execute the upstream subtree twice — same rationale as
    bidirectional_edges). Fixpoint reached when the edge multiset
    checksum (count + sum of xxhash64) repeats; at fixpoint each
    component is a star rooted at its minimum id.

    Each round ends in ``localCheckpoint`` — TRUE lineage truncation,
    not cache: the round body references its input four times (mins +
    join, twice per phase), so the LOGICAL plan quadruples per round
    and hits exponential planning cost by round ~8 even though every
    physical round reads the previous round's materialized data. A
    cache only shortcuts execution; checkpointing is what keeps the
    plan O(1) across iterations (the standard iterative-graph pattern;
    executor loss mid-loop costs a rerun, not correctness).
    Returns ``(labels, star_final)``: the (doc_id, cluster_id) result
    (roots included) and the checkpointed star table backing it.
    """
    # Seed: orient symmetric adjacency larger -> smaller.
    star = adj.filter(F.col("a") > F.col("b")).localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        # large-star needs full neighborhoods: re-symmetrize via
        # explode (one pass over the cached directed edges).
        sym = bidirectional_edges(star, "a", "b")
        mins = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        large = (
            sym.filter(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star on the directed output (b < a by construction):
        # every node links its smaller neighbors and itself to the min.
        smins = large.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            large.join(smins, "a")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("b").alias("x"), F.col("m").alias("y")),
                        F.struct(F.col("a").alias("x"), F.col("m").alias("y")),
                    )
                ).alias("e")
            )
            .select(F.col("e.x").alias("a"), F.col("e.y").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()  # eager: materializes AND truncates lineage
        )
        # decimal sum: long xxhash64 values overflow bigint SUM under
        # ANSI mode; decimal(38,0) absorbs any edge count.
        sig = small.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        star = small  # prior round's checkpoint RDD is GC-reclaimed
        if sig == prev_sig:
            break
        prev_sig = sig
    # Fixpoint: stars rooted at component minima. groupBy-min guards
    # the (max_iter exhausted before fixpoint) case.
    members = star.groupBy("a").agg(F.min("b").alias("cluster_id"))
    roots = (
        star.select(F.col("b").alias("a"))
        .distinct()
        .join(star.select("a").distinct(), "a", "left_anti")
        .withColumn("cluster_id", F.col("a"))
    )
    out = members.unionByName(roots).select(
        F.col("a").alias("doc_id"), "cluster_id"
    )
    # star is a checkpoint, not a cache entry — it frees itself when
    # the DataFrame is garbage collected; returned so callers can pin
    # its lifetime while ``out`` is being consumed.
    return out, star


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    finalize: str = "distributed",
    strategy: str = "auto",
) -> DataFrame:
    """Connected components over an undirected pair table — the dedup
    CLUSTERING step: near-dup pairs (from Jaccard / MinHash-LSH /
    SimHash) become groups, each with a canonical member (min id).

    Returns ``(doc_id, cluster_id)`` for every node that appears in at
    least one edge; ``cluster_id`` is the minimum id reachable from the
    node (so the canonical doc has ``doc_id == cluster_id``).

    Algorithm: min-label propagation. Every node starts labeled with its
    own id; each round, a node's label becomes ``min(own, neighbors')``.
    Converges in O(graph diameter) rounds — near-dup graphs are
    clique-ish and shallow, so 3-5 rounds is typical. Each round is one
    shuffle-join (labels ⋈ edges, both partitioned by the join key) plus
    one groupBy-min; AQE handles the skew of a giant component's hub.

    Scale notes (100 TB): label propagation's round count is the
    diameter, not log(diameter) — for pathological chain-shaped graphs
    use ``strategy="star"`` (large-star/small-star, Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14), which
    contracts toward component minima in O(log d) rounds with the same
    join-shaped dataflow (_cc_two_phase_star). Each round here
    localCheckpoints its label table — true lineage truncation, so
    BOTH the physical work and the logical plan stay O(1) per round
    (a cache alone leaves the logical plan doubling every round). The
    convergence check is a cheap count() on labels that changed this
    round.

    ``finalize='local'`` collapses the result to a LocalRelation and
    unpersists every iteration cache — for DRIVER-SIZED cluster tables
    only (near-dup graphs are tiny relative to the corpus); the default
    keeps the final label table distributed and cached.

    ``strategy``: "distributed" = always the propagation loop;
    "local" = collect edges and union-find on the driver (exact same
    result, one job instead of per-round shuffles); "star" =
    large-star/small-star (_cc_two_phase_star) — O(log diameter)
    rounds, the right loop for chain-shaped graphs whose diameter
    exceeds any sane max_iter; "auto" (default) = local when the edge
    count is driver-sized, distributed otherwise — the same small-side
    cutover logic a broadcast join uses, applied to the iteration
    structure.
    """
    adj = bidirectional_edges(edges, src_col, dst_col).cache()

    if strategy == "star":
        adj.count()
        out, _star = _cc_two_phase_star(adj, max_iter)
        adj.unpersist()
        if finalize == "local":
            rows = out.collect()
            del _star  # checkpoint RDD reclaimed once unreferenced
            return edges.sparkSession.createDataFrame(rows, schema=out.schema)
        return out

    if strategy != "distributed":
        n_edges = adj.count()  # also materializes the cache
        if strategy == "local" or n_edges <= _CC_LOCAL_MAX_EDGES:
            pairs = adj.collect()
            adj.unpersist()
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for r in pairs:
                a, b = int(r["a"]), int(r["b"])
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by MIN id so the root IS the cluster id
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            rows = [(n, find(n)) for n in sorted(parent)]
            return edges.sparkSession.createDataFrame(
                rows, "doc_id long, cluster_id long"
            )

    # localCheckpoint, not cache, per round: the round body references
    # ``labels`` twice (neighbor-min join + the left join), so under a
    # cache the LOGICAL plan would still double every round —
    # exponential planning cost past ~15 rounds even though each
    # physical round reads materialized data. Checkpointing truncates
    # lineage, keeping the plan O(1) across iterations (same fix as
    # _cc_two_phase_star; prior rounds' checkpoint RDDs are reclaimed
    # when unreferenced).
    labels = (
        adj.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nbr_min = (
            adj.join(labels, adj.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
        ).localCheckpoint()
        n_changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.select("node", "label")
        if n_changed == 0:
            break
    adj.unpersist()
    out = labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
    if finalize == "local":
        rows = out.collect()
        return edges.sparkSession.createDataFrame(rows, schema=out.schema)
    return out


# --- Exact-substring (k-token run) dedup --------------------------------------
#
# Positional run sharing (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better"): two docs are substring-dups if
# they share a run of >= k consecutive tokens — a stricter, position-
# aware signal than set-based shingle Jaccard (a doc quoting one long
# passage shares a run without sharing most of its shingle set).

#: k-grams appearing in more than this many docs are dropped from the
#: substring index (boilerplate guard, same rule as DEFAULT_DF_CAP).
DEFAULT_KGRAM_DF_CAP = 1000


def kgram_position_hashes(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos, gram_hash, n_tokens): every k-token gram of the
    normalized text, hashed; ``pos`` is the 1-based start position.

    Pure per-row Catalyst (token split + ``transform`` over a position
    sequence + posexplode) — the corpus is scanned once with ZERO
    shuffle; docs shorter than k tokens emit nothing.
    """
    # Materialize the token array as a COLUMN before the lambda: the
    # per-position slice would otherwise re-evaluate the regex+split
    # expression for every gram (O(n^2) regex work per doc — same trap
    # word_shingles documents; measured ~15x on the emission stage).
    tk = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    )
    t, n = F.col("t"), F.size(F.col("t"))
    # sequence(1, stop) DESCENDS when stop < 1 (emitting index 0), so
    # docs shorter than k tokens take the explicit empty branch.
    starts = F.when(
        n >= k, F.sequence(F.lit(1), n - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts,
        lambda i: md5_hash64(F.concat_ws(" ", F.slice(t, i, k))),
    )
    return tk.select(
        "doc_id",
        n.alias("n_tokens"),
        F.posexplode(grams).alias("off", "gram_hash"),
    ).select("doc_id", (F.col("off") + 1).alias("pos"), "gram_hash", "n_tokens")


def shared_kgram_pairs(
    docs: DataFrame,
    k: int = 20,
    df_cap: int = DEFAULT_KGRAM_DF_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_hashes: DataFrame | None = None,
) -> DataFrame:
    """Doc pairs sharing at least one exact k-token run:
    (id_a, id_b, n_shared_grams, a_start, a_end, b_start, b_end)
    where [start, end] bound the shared material's token positions in
    each doc (end = last gram start + k - 1).

    Inverted index on int64 gram hashes — the join's fan-out is
    sum(df^2) per gram, bounded by ``df_cap`` (grams above the cap are
    boilerplate: headers, licenses, templates — exactly what you do
    NOT want to dedup on). Pass a cached ``gram_hashes``
    (kgram_position_hashes output) to share the corpus scan with
    substring_contamination.
    """
    if gram_hashes is not None:
        g = gram_hashes
    else:
        # cache locally: the table feeds both join sides (different
        # projections, ReuseExchange won't unify) plus the df guard —
        # uncached, the tokenize+gram scan would run three times.
        g = kgram_position_hashes(docs, k, text_col, id_col).cache()
        g.count()
    dg = g.select("doc_id", "pos", "gram_hash")
    if df_cap is not None:
        freq = (
            dg.groupBy("gram_hash")
            .agg(F.countDistinct("doc_id").alias("df"))
            .filter(F.col("df") <= df_cap)
        )
        dg = dg.join(freq.select("gram_hash"), "gram_hash")
    a = dg.select(
        F.col("doc_id").alias("id_a"),
        F.col("pos").alias("pos_a"),
        "gram_hash",
    )
    b = dg.select(
        F.col("doc_id").alias("id_b"),
        F.col("pos").alias("pos_b"),
        "gram_hash",
    )
    return (
        a.join(b, "gram_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.countDistinct("gram_hash").alias("n_shared_grams"),
            F.min("pos_a").alias("a_start"),
            (F.max("pos_a") + (k - 1)).alias("a_end"),
            F.min("pos_b").alias("b_start"),
            (F.max("pos_b") + (k - 1)).alias("b_end"),
        )
    )


def substring_contamination(
    docs: DataFrame,
    k: int = 20,
    df_cap: int = DEFAULT_KGRAM_DF_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_hashes: DataFrame | None = None,
) -> DataFrame:
    """Per-doc fraction of tokens covered by k-token runs shared with
    ANY other doc — the Lee et al. dedup metric driving span removal:
    (doc_id, n_tokens, n_covered, coverage).

    Shared grams come from one groupBy on the gram index (count > 1,
    df_cap bounded); each shared gram start covers positions
    [pos, pos+k-1], union'd exactly by exploding the position range
    and counting distinct covered positions per doc (positions per doc
    are bounded by doc length, never corpus-sized).
    """
    if gram_hashes is not None:
        g = gram_hashes
    else:
        g = kgram_position_hashes(docs, k, text_col, id_col).cache()
        g.count()
    freq = (
        g.groupBy("gram_hash")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(
            (F.col("df") > 1)
            & ((F.col("df") <= df_cap) if df_cap is not None else F.lit(True))
        )
    )
    covered = (
        g.join(freq.select("gram_hash"), "gram_hash")
        .select(
            "doc_id",
            "n_tokens",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("cov_pos"),
        )
        .groupBy("doc_id")
        .agg(
            F.any_value("n_tokens").alias("n_tokens"),
            F.countDistinct("cov_pos").alias("n_covered"),
        )
    )
    return covered.select(
        "doc_id",
        "n_tokens",
        "n_covered",
        F.round(F.col("n_covered") / F.col("n_tokens"), 6).alias("coverage"),
    )


# --- Content-defined chunking (CDC) --------------------------------------------

#: 1-in-this-many gram positions becomes a chunk boundary (expected
#: chunk length in tokens); power of two like every CDC divisor.
DEFAULT_CDC_DIVISOR = 16
#: gram width for the boundary rolling hash
CDC_GRAM = 3


def cdc_chunks(
    docs: DataFrame,
    divisor: int = DEFAULT_CDC_DIVISOR,
    gram: int = CDC_GRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking: split each document where the rolling
    ``gram``-token hash ≡ 0 (mod ``divisor``) — boundaries follow the
    CONTENT, so inserting a sentence shifts at most the chunks it
    touches while every other chunk keeps its hash (the property that
    makes chunk-level dedup robust to edits, unlike fixed-size
    chunking where one insertion re-keys every later chunk; Rabin/CDC
    as in LBFS and every dedup store since).

    Returns ``(doc_id, chunk_idx, start_pos, n_chunk_tokens,
    chunk_hash)`` — one row per chunk, ``chunk_hash`` over the
    space-joined chunk tokens. Everything is per-row Catalyst array
    math (token split evaluated ONCE per row — see word_shingles on
    lambda capture): boundary flags -> running boundary count per
    position (transform over an index sequence reading a let-bound
    flags array) -> segment grouping, zero shuffle before any
    downstream aggregation.
    """
    tk = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    )
    t = F.col("t")
    n = F.size(t)
    # boundary AFTER position p (1-based) iff hash of gram starting at
    # p ≡ 0 mod divisor; docs shorter than gram have no boundaries.
    starts = F.when(
        n >= gram, F.sequence(F.lit(1), n - (gram - 1))
    ).otherwise(F.array().cast("array<int>"))
    bpos = F.filter(
        F.transform(
            starts,
            lambda i: F.struct(
                i.alias("p"),
                (
                    F.pmod(md5_hash64(F.concat_ws(" ", F.slice(t, i, gram))), divisor)
                    == 0
                ).alias("b"),
            ),
        ),
        lambda s: s["b"],
    )
    # segment id per token position = count of boundaries at positions
    # < pos (boundary at p ends the chunk containing p). Let-bind the
    # (tiny) boundary-position array, then one pass over positions.
    seg = F.transform(
        F.sequence(F.lit(1), n),
        lambda p: F.size(F.filter(F.col("_bp"), lambda b: b < p)),
    )
    with_seg = tk.withColumn(
        "_bp", F.transform(bpos, lambda s: s["p"])
    ).withColumn("_seg", seg)
    # chunk rows: for each distinct segment id, slice its token span.
    # Segment ids are 0..n_boundaries (consecutive), so chunks =
    # transform over 0..size(_bp): start = (boundary[k-1]) + 1,
    # end = boundary[k] (or n for the tail chunk).
    nb = F.size(F.col("_bp"))
    chunks = F.transform(
        F.sequence(F.lit(0), nb),
        lambda k: F.struct(
            k.alias("chunk_idx"),
            F.when(k == 0, F.lit(1))
            .otherwise(F.element_at(F.col("_bp"), k) + 1)
            .alias("start"),
            F.when(k == nb, n)
            .otherwise(F.element_at(F.col("_bp"), k + F.lit(1)))
            .alias("end"),
        ),
    )
    return (
        with_seg.withColumn("_c", F.explode(chunks))
        .filter(F.col("_c.end") >= F.col("_c.start"))  # drop empty tail
        .select(
            "doc_id",
            F.col("_c.chunk_idx").alias("chunk_idx"),
            F.col("_c.start").alias("start_pos"),
            (F.col("_c.end") - F.col("_c.start") + 1).alias("n_chunk_tokens"),
            md5_hash64(
                F.concat_ws(
                    " ",
                    F.slice(t, F.col("_c.start"), F.col("_c.end") - F.col("_c.start") + 1),
                )
            ).alias("chunk_hash"),
        )
    )


# --- Bloom-filter membership (approximate anti-join) --------------------------

#: Default Bloom geometry for the query surface: 2^16 bits / 3 hashes
#: keeps the filter at ~1040 bitmap words (sf-test-sized). Production
#: sizing: m ≈ -n·ln(p)/ln(2)^2 bits for target fp rate p; the build
#: output is m/64 rows regardless of corpus size.
DEFAULT_BLOOM_BITS = 1 << 16
DEFAULT_BLOOM_HASHES = 3


def _bloom_positions(key, m_bits: int, k_hashes: int):
    """k independent bit positions for ``key``: the portable md5-prefix
    hash of ``key || '#i'`` mod m. DuckDB equivalent per i:
    ``('0x' || substr(md5(key || '#' || i), 1, 15))::BIGINT % m``."""
    return [
        md5_hash64(F.concat(key, F.lit(f"#{i}"))) % m_bits
        for i in range(k_hashes)
    ]


def bloom_filter_words(
    df: DataFrame,
    key_col: str = "key",
    m_bits: int = DEFAULT_BLOOM_BITS,
    k_hashes: int = DEFAULT_BLOOM_HASHES,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as ``(word_idx, word)``
    bitmap words — ``word`` is the bit_or of ``1 << (pos % 63)`` for
    every key hashing into word ``word_idx = pos // 63`` (63 usable bits
    per word — bit 63 stays clear so no engine hits signed-shift
    overflow).

    Scale shape: the store side NEVER shuffles its strings — each row
    emits k (word_idx, bit) int pairs and partial ``bit_or`` collapses
    them map-side to at most m/63 rows per task before the single tiny
    exchange. No ``distinct`` is needed: bit positions are idempotent
    under OR, so duplicate keys cost nothing. The result (m/64 rows,
    e.g. 16 MB of words for a 1-billion-key filter at 1% fp) is
    broadcastable, which is what lets a daily batch be probed against
    a multi-TB fingerprint store with zero shuffle on either side.
    """
    pos_arr = F.array(*_bloom_positions(F.col(key_col), m_bits, k_hashes))
    return (
        ensure_parallelism(df)
        .select(F.explode(pos_arr).alias("pos"))
        .groupBy(F.floor(F.col("pos") / 63).alias("word_idx"))
        .agg(
            F.bit_or(F.expr("shiftleft(1L, cast(pos % 63 as int))")).alias(
                "word"
            )
        )
    )


def bloom_filter_probe(
    batch: DataFrame,
    words: DataFrame,
    key_col: str = "key",
    m_bits: int = DEFAULT_BLOOM_BITS,
    k_hashes: int = DEFAULT_BLOOM_HASHES,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Probe ``batch[key_col]`` against a Bloom filter built by
    :func:`bloom_filter_words`; adds boolean ``out_col`` — true iff all
    k bits are set (key is *possibly* in the store; false positives at
    the configured rate, never false negatives).

    The probe is k chained BROADCAST left joins on ``word_idx`` — the
    batch is never shuffled and the filter (m/63 rows) ships once per
    executor, so probing is a map-only stage. A missing word (no store
    key hashed into it) joins null and counts as bit-not-set.

    MATERIALIZE ``words`` BEFORE PROBING: the plan references it k
    times under different aliases, and Spark's ReuseExchange only
    dedupes *identical* subtrees — an unmaterialized build would
    re-scan the store once per hash. Use ``queries.localize`` for
    driver-sized filters (the common case: m/63 rows), or
    ``.persist()`` / a parquet round-trip for multi-GB filters.
    """
    positions = _bloom_positions(F.col(key_col), m_bits, k_hashes)
    out = batch
    maybe = F.lit(True)
    for i, p in enumerate(positions):
        pcol, icol, wcol = f"_bpos_{i}", f"_bidx_{i}", f"_bword_{i}"
        out = out.withColumn(pcol, p)
        w_i = words.select(
            F.col("word_idx").alias(icol), F.col("word").alias(wcol)
        )
        out = out.join(
            F.broadcast(w_i),
            F.floor(F.col(pcol) / 63) == F.col(icol),
            "left",
        )
        bit = F.expr(f"shiftleft(1L, cast({pcol} % 63 as int))")
        maybe = maybe & F.coalesce(
            F.col(wcol).bitwiseAND(bit) == bit, F.lit(False)
        )
    drop = [
        c
        for i in range(k_hashes)
        for c in (f"_bpos_{i}", f"_bidx_{i}", f"_bword_{i}")
    ]
    return out.withColumn(out_col, maybe).drop(*drop)


# --- cross-source overlap matrix ----------------------------------------------


def source_overlap_matrix(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    granularity: str = "doc",
    shingle_n: int = 3,
    shingle_hashes: DataFrame | None = None,
) -> DataFrame:
    """Pairwise content overlap between sources/snapshots:
    ``(source_a, source_b, n_shared, n_a, n_b, overlap_coef)`` for
    every source pair sharing at least one content hash,
    ``overlap_coef = n_shared / min(n_a, n_b)`` (Szymkiewicz-Simpson).

    ``granularity='doc'`` hashes whole normalized documents (exact
    mirror detection); ``granularity='shingle'`` hashes ``shingle_n``-
    gram shingles (phrase-level overlap — catches quotation/boilerplate
    sharing and template reuse that whole-doc hashing misses).

    The leakage report every corpus refresh needs (how much of
    snapshot N+1 is snapshot N? how much of source X is mirrored in
    Y?). Scale shape: an inverted self-join on the 60-bit content
    hash — per-hash join fan-out is bounded by the number of SOURCES
    carrying it (tiny, vs. the number of DOCS), because the join
    input is the DISTINCT (source, hash) projection; output is at
    most |sources|^2/2 rows. The corpus shuffles once to build that
    projection (~16 B/doc, or B/shingle, after map-side distinct).
    """
    if granularity == "doc":
        hashed = (
            ensure_parallelism(docs)
            .select(
                F.col(group_col).alias("src"),
                md5_hash64(normalize_text(F.col(text_col))).alias("h"),
            )
            .distinct()
        )
    elif granularity == "shingle":
        if shingle_hashes is not None:
            # reuse the family's cached (doc_id, sh) table: the
            # doc->group map is corpus-rows-but-narrow, so it
            # broadcasts and the only shuffle is the (src, h) distinct
            src_map = docs.select(
                F.col(id_col).alias("doc_id"), F.col(group_col).alias("src")
            )
            hashed = (
                shingle_hashes.join(F.broadcast(src_map), "doc_id")
                .select("src", F.col("sh").alias("h"))
                .distinct()
            )
        else:
            hashed = (
                ensure_parallelism(docs)
                .select(
                    F.col(group_col).alias("src"),
                    F.explode(
                        word_shingles(tokens(F.col(text_col)), shingle_n)
                    ).alias("shingle"),
                )
                .select("src", md5_hash64(F.col("shingle")).alias("h"))
                .distinct()
            )
    else:
        raise ValueError(f"granularity must be 'doc' or 'shingle', got {granularity!r}")
    sizes = hashed.groupBy("src").agg(F.count("*").alias("n"))
    a = hashed.select(F.col("src").alias("source_a"), "h")
    b = hashed.select(F.col("src").alias("source_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.select(F.col("src").alias("source_a"), F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("src").alias("source_b"), F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared") / F.least(F.col("n_a"), F.col("n_b")),
                6,
            ).alias("overlap_coef"),
        )
    )
