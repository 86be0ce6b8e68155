"""Text analysis operators for training-data pipelines.

North-star family (BASELINE.json): language identification, quality
scoring, token counting, document fingerprinting. All pure Catalyst
expressions (no UDFs) composed from cross-engine-portable primitives,
so every operator carries a full DuckDB oracle.

Scale: each operator is a narrow per-row map over ``documents`` (plus
one small broadcast join for stopword profiles) — embarrassingly
parallel, no shuffle except final aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.functions.partitioning import ensure_parallelism
from spark_relieffc_fselection_spark.functions.text import (
    md5_hash64,
    normalize_text,
    tokens,
)

#: Minimal stopword profiles for the 5 corpus languages. Intentionally
#: small + disjoint-ish: the operator is a heuristic scorer, not a
#: trained model (same contract as fasttext-style lang-id fallbacks).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por", "para", "está"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "est", "une", "dans", "pour", "avec", "sur", "pas"),
}

PUNCT_CLASS = r"[.,!?;:'\"()\-]"


#: PII patterns (RE2/Java-portable subset: no backrefs/lookaround, so
#: the same pattern strings run in Spark, DuckDB, and most scrubbers).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_scrub(
    docs: DataFrame,
    patterns: dict[str, str] | None = None,
    replacement: str = "[PII]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PII/compliance scrub: per-document match counts per pattern
    class plus the scrubbed text (every match replaced, applied in
    deterministic ``patterns`` key order so engines agree byte-for-
    byte). Pure per-row regexp expressions — zero shuffle, whole-stage
    codegen, the standard pre-tokenizer compliance pass at any scale.

    Output: (doc_id, n_<class>..., scrubbed_text, scrubbed_chars).
    """
    patterns = patterns if patterns is not None else PII_PATTERNS
    cols = [F.col(id_col).alias("doc_id")]
    scrubbed = F.col(text_col)
    for name, pat in patterns.items():
        cols.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias(
                f"n_{name}"
            )
        )
        scrubbed = F.regexp_replace(scrubbed, pat, replacement)
    return docs.select(
        *cols,
        scrubbed.alias("scrubbed_text"),
        F.length(scrubbed).alias("scrubbed_chars"),
    )


def token_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting: whitespace tokens, regex word tokens, chars, and
    a BPE-ish subword estimate (~4 chars/token, the common planning
    heuristic)."""
    norm = normalize_text(F.col(text_col))
    toks = tokens(F.col(text_col))
    n_words = F.when(norm == "", 0).otherwise(F.size(toks))
    n_chars = F.length(norm)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words_ws"),
        F.size(F.regexp_extract_all(norm, F.lit(r"[a-z0-9]+"), 0)).alias("n_words_re"),
        F.greatest(
            F.ceil(n_chars / F.lit(4.0)).cast("bigint"), n_words.cast("bigint")
        ).alias("n_tokens_bpe_est"),
    )


def quality_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features + composite score in [0, 1].

    Features mirror the usual LLM-corpus filters: document length,
    mean word length, stopword ratio, punctuation density, digit
    density. The composite is a fixed, documented weighting — the
    point is a deterministic, portable scoring pipeline.
    """
    spark = docs.sparkSession
    sw = F.broadcast(
        spark.createDataFrame([(w,) for w in STOPWORDS["en"]], "tok string")
    )
    norm = normalize_text(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(norm).alias("n_chars"),
        F.when(norm == "", 0).otherwise(F.size(tokens(F.col(text_col)))).alias("n_words"),
        (
            F.length(norm) - F.length(F.regexp_replace(norm, PUNCT_CLASS, ""))
        ).alias("n_punct"),
        (
            F.length(norm) - F.length(F.regexp_replace(norm, r"[0-9]", ""))
        ).alias("n_digits"),
    )
    tok_tbl = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    sw_counts = (
        tok_tbl.join(sw, "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_stopwords"))
    )
    feats = base.join(sw_counts, "doc_id", "left").na.fill({"n_stopwords": 0})
    n_words_safe = F.greatest(F.col("n_words"), F.lit(1))
    n_chars_safe = F.greatest(F.col("n_chars"), F.lit(1))
    return feats.select(
        "doc_id",
        "n_chars",
        "n_words",
        F.round(F.col("n_chars") / n_words_safe, 6).alias("mean_word_len"),
        F.round(F.col("n_stopwords") / n_words_safe, 6).alias("stopword_ratio"),
        F.round(F.col("n_punct") / n_chars_safe, 6).alias("punct_ratio"),
        F.round(F.col("n_digits") / n_chars_safe, 6).alias("digit_ratio"),
        # Composite: reward length (saturating at 200 words) and
        # stopword presence; penalize punct/digit noise.
        F.round(
            F.least(F.col("n_words") / F.lit(200.0), F.lit(1.0)) * 0.4
            + F.least(F.col("n_stopwords") / n_words_safe * 5.0, F.lit(1.0)) * 0.3
            + (1.0 - F.least(F.col("n_punct") / n_chars_safe * 10.0, F.lit(1.0))) * 0.15
            + (1.0 - F.least(F.col("n_digits") / n_chars_safe * 10.0, F.lit(1.0))) * 0.15,
            6,
        ).alias("quality_score"),
    )


def language_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: CJK character detection + stopword-profile
    voting; 'und' (undetermined) when nothing matches.

    Returns (doc_id, pred_lang, lang_score) where lang_score is the
    matched-stopword share of tokens (0 for zh/und). Ties break
    alphabetically on language code — fully deterministic.
    """
    spark = docs.sparkSession
    profile = F.broadcast(
        spark.createDataFrame(
            [(lang, w) for lang, ws in STOPWORDS.items() for w in ws],
            "lang string, tok string",
        )
    )
    norm_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        normalize_text(F.col(text_col)).alias("norm"),
        tokens(F.col(text_col)).alias("toks"),
    )
    tok_tbl = norm_docs.select("doc_id", F.explode("toks").alias("tok"))
    votes = (
        tok_tbl.join(profile, "tok")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("hits"))
    )
    best = (
        votes.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("lang"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("sw_lang"), "hits")
    )
    n_words = F.when(F.col("norm") == "", 0).otherwise(F.size(F.col("toks")))
    return (
        norm_docs.join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.regexp_count(F.col("norm"), F.lit(r"[一-鿿]")) > 0, F.lit("zh")
            )
            .when(F.col("sw_lang").isNotNull(), F.col("sw_lang"))
            .otherwise(F.lit("und"))
            .alias("pred_lang"),
            F.round(
                F.coalesce(F.col("hits"), F.lit(0))
                / F.greatest(n_words, F.lit(1)).cast("double"),
                6,
            ).alias("lang_score"),
        )
    )


def fingerprints(
    docs: DataFrame,
    ngram_chars: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document fingerprinting: whole-content hash + winnowing-style
    minimal char-n-gram hash (the rolling-hash fingerprint family,
    computed as min over all char-n-gram hashes — robust to local
    edits: one edit disturbs only n of the grams)."""
    d = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        normalize_text(F.col(text_col)).alias("norm"),
    )
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.length("norm") - (ngram_chars - 1)),
        lambda i: md5_hash64(F.substr(F.col("norm"), i, F.lit(ngram_chars))),
    )
    return d.select(
        "doc_id",
        md5_hash64(F.col("norm")).alias("content_fp"),
        F.when(
            F.length("norm") < ngram_chars, md5_hash64(F.col("norm"))
        ).otherwise(F.array_min(gram_hashes)).alias("min_gram_fp"),
    )


def budget_select_by_score(
    scored: DataFrame,
    budget: int,
    score_col: str = "score",
    weight_col: str = "n_toks",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Keep rows in descending (score, then ascending id) order while
    the running sum of ``weight_col`` stays within ``budget`` — the
    token-budgeted corpus-selection primitive ("take the best docs
    until N tokens"), EXACTLY equal to a global-sort cumsum filter but
    with no global sort:

      1. bucket rows by approximate score quantiles (per-row bucket =
         count of edges below the score; value-based, so equal scores
         share a bucket and bucket order is consistent with score
         order);
      2. one tiny aggregation -> per-bucket weight sums (n_buckets
         rows, collected);
      3. the driver's cumsum over that histogram finds the boundary
         bucket: better buckets are kept whole, worse dropped whole;
      4. only the boundary bucket (budget-epsilon sized by
         construction) pays a running-sum window against the residual
         budget.

    The quantile edges are internal routing only — any edge set yields
    the same kept rows — so the approximate sketch never affects the
    result. Rows keep their input columns.
    """
    s, wcol = F.col(score_col), F.col(weight_col)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    if probs:
        edge_rows = scored.agg(
            F.expr(
                f"percentile_approx({score_col}, "
                f"array({','.join(repr(p) for p in probs)}), 1000)"
            )
        ).first()[0]
    else:  # n_buckets=1: single bucket, the window does all the work
        edge_rows = []
    edges = sorted({float(e) for e in (edge_rows or []) if e is not None})
    edges_lit = F.array(*[F.lit(e) for e in edges]) if edges else F.array().cast("array<double>")
    # localCheckpoint: the result is built from TWO branches of this
    # frame (whole buckets + boundary window), so an un-materialized
    # plan would execute the caller's scoring subtree twice per
    # action, while a cache() would leave a live entry taxing every
    # later query's cache lookup. The checkpoint is distributed (the
    # kept set is corpus-sized at a 30% budget — never driver-sized),
    # lineage-free, and reclaimed when the returned frame is dropped.
    bucketed = scored.withColumn(
        "_bkt", F.size(F.filter(edges_lit, lambda e: s > e))
    ).localCheckpoint()
    hist = {
        r["_bkt"]: r["w"]
        for r in bucketed.groupBy("_bkt").agg(F.sum(wcol).alias("w")).collect()
    }
    remaining = budget
    keep_whole, boundary = [], None
    for b in sorted(hist, reverse=True):  # high bucket = high scores
        if hist[b] <= remaining:
            keep_whole.append(b)
            remaining -= hist[b]
        else:
            boundary = b
            break
    out_cols = [c for c in scored.columns]
    whole = bucketed.filter(F.col("_bkt").isin(keep_whole)) if keep_whole else None
    if boundary is not None:
        w = (
            Window.partitionBy("_bkt")
            .orderBy(F.desc(score_col), F.asc(id_col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        edge_kept = (
            bucketed.filter(F.col("_bkt") == boundary)
            .withColumn("_cum", F.sum(wcol).over(w))
            .filter(F.col("_cum") <= remaining)
        )
        whole = edge_kept if whole is None else whole.unionByName(
            edge_kept, allowMissingColumns=True
        )
    if whole is None:
        return scored.limit(0)
    return whole.select(*out_cols)


# --- hashing-trick linear classifier (fastText-style quality filter) ----------


def hashing_trick_weights(
    spark, n_features: int = 1024, seed_tag: str = "w"
) -> DataFrame:
    """Deterministic stand-in for a published linear-model weight
    vector: ``(fidx, w)`` with w in [-1, 1] derived from the portable
    md5 hash of ``'{seed_tag}#fidx'``. In production this frame is the
    model artifact loaded from storage; it is vocabulary-free (the
    hashing trick fixes its size at ``n_features`` rows) and therefore
    always broadcastable.
    """
    milli = (
        md5_hash64(F.concat(F.lit(f"{seed_tag}#"), F.col("id").cast("string")))
        % 2001
        - 1000
    )
    return spark.range(n_features).select(
        F.col("id").alias("fidx"),
        (milli / 1000.0).alias("w"),
        # integer milli-units: the scoring path works in EXACT integer
        # arithmetic end-to-end (see hashed_linear_scores), so a logit
        # landing exactly on a .5e-6 boundary rounds the same way in
        # every engine
        milli.cast("long").alias("w_milli"),
    )


def hashed_linear_scores(
    docs: DataFrame,
    weights: DataFrame,
    n_features: int = 1024,
    bias: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear text-classifier INFERENCE via the hashing trick (the
    fastText-style quality-filter shape every LLM corpus pipeline
    runs): token -> feature index ``md5 % n_features`` -> broadcast
    join against the weight vector -> per-doc mean contribution.

    Returns ``(doc_id, n_toks, logit, quality_label)`` with
    ``logit = bias + sum(w)/n_toks`` and label ``keep`` iff
    ``logit >= 0``.

    Scale shape: ONE corpus shuffle (the per-doc sum, partial-
    aggregated map-side); the weight join is a BROADCAST of
    ``n_features`` rows — there is no per-(doc, feature) intermediate
    at all, because sum(tf_j * w_j) == sum over tokens of w(token),
    so the tf table is never materialized.

    EXACT integer arithmetic end-to-end: every weight is k/1000, so
    the per-doc sum is an exact bigint of milli-units and the rounded
    logit is computed from the exact rational with an explicit
    HALF-AWAY-FROM-ZERO rule — logits landing exactly on a .5e-6
    boundary (a real sf0.001 doc does: 0.05 + s/96 = -1249/16000 =
    -0.0780625) round identically in every engine, which double
    rounding cannot promise (Spark's BigDecimal HALF_UP on the nearest
    double vs DuckDB's float rounding disagreed on that doc). The
    label reads the exact sign, no rounding at all.
    """
    bias_milli = round(bias * 1000)
    if abs(bias - bias_milli / 1000) > 1e-12:
        raise ValueError(
            f"bias must be a multiple of 0.001 (exact integer milli-unit "
            f"arithmetic), got {bias}"
        )
    tok = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    feat = tok.select(
        "doc_id", (md5_hash64(F.col("tok")) % n_features).alias("fidx")
    )
    # exact micro-units numerator: logit = (bias_milli*n + s_milli) /
    # (1000*n)  =>  x 1e6 = 1000*(bias_milli*n + s_milli) / n
    m = (F.lit(int(bias_milli)) * F.col("n_toks") + F.col("s_milli")) * F.lit(1000)
    logit_e6 = F.when(m >= 0, F.expr("(2*__m + n_toks) div (2*n_toks)")).otherwise(
        -F.expr("(2*(-__m) + n_toks) div (2*n_toks)")
    )
    return (
        feat.join(F.broadcast(weights), "fidx")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum(F.col("w_milli")).alias("s_milli"),
        )
        .withColumn("__m", m)
        .withColumn("__le6", logit_e6)
        .select(
            "doc_id",
            "n_toks",
            (F.col("__le6").cast("double") / F.lit(1000000.0)).alias("logit"),
            F.when(F.col("__m") >= 0, "keep").otherwise("drop").alias(
                "quality_label"
            ),
        )
    )


# --- count-min sketch (bounded-memory frequency estimation) -------------------


def countmin_sketch(
    tok: DataFrame,
    depth: int = 4,
    width: int = 1024,
    tok_col: str = "tok",
) -> DataFrame:
    """Count-min sketch over a token table: ``(row, col, c)`` cell
    counts, ``col = md5(tok || '#row') % width`` per sketch row.

    Scale shape: the ONLY shuffle carries (row, col) int pairs that
    partial aggregation collapses map-side to at most depth*width
    cells per task — corpus frequency estimation in fixed memory with
    no vocabulary-sized state anywhere (the exact groupBy-token
    alternative shuffles the full vocab). Cells are mergeable across
    corpora/days by cellwise addition, which is the reason production
    pipelines keep sketches, not vocab dumps.
    """
    cells = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        (
                            md5_hash64(
                                F.concat(F.col(tok_col), F.lit(f"#{r}"))
                            )
                            % width
                        ).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.row", "cell.col").agg(
        F.count("*").alias("c")
    )


def countmin_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 1024,
    tok_col: str = "tok",
) -> DataFrame:
    """Point-query the sketch for each probe token: est = min over
    rows of the hashed cell — upper-bounds the true count (classic CM
    guarantee: overestimate only, by at most eps*N w.h.p.).

    The sketch (<= depth*width rows) is BROADCAST; the probe side
    explodes to depth rows per token and never shuffles more than
    that before the per-token min."""
    probe_cells = probes.select(
        tok_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        (
                            md5_hash64(
                                F.concat(F.col(tok_col), F.lit(f"#{r}"))
                            )
                            % width
                        ).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(tok_col, "cell.row", "cell.col")
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(tok_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )


# ------------------------------------------------- KMV distinct sketch
def kmv_sketch(df: DataFrame, col: str, k: int) -> DataFrame:
    """K-minimum-values distinct-count sketch: the ``k`` smallest
    md5-derived uniforms over the DISTINCT values of ``col``, as a
    k-row frame ``(u)``.

    Unlike approx_count_distinct's opaque in-flight HLL (q51), the
    KMV sketch is DATA — k rows you can store next to a partition,
    union with tomorrow's sketch, and re-estimate without ever
    rescanning history (bottom-k of a union of bottom-ks equals
    bottom-k of the union: merge == rebuild exactly). The uniform is
    the repo's portable md5 hash (sampling.hash_uniform), so the
    estimate is deterministic across runs, engines, and
    partitionings — DuckDB reproduces it bit-for-bit. Plan shape:
    distinct (one keyed exchange) then TakeOrdered k — never a global
    sort.
    """
    from spark_relieffc_fselection_spark.operators.sampling import (
        hash_uniform,
    )

    return (
        df.select(F.col(col).alias("_v"))
        .distinct()
        .select(hash_uniform(F.col("_v")).alias("u"))
        .orderBy("u")
        .limit(k)
    )


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: ``(k-1) / u_(k)``
    with ``u_(k)`` the largest retained uniform; when the sketch holds
    fewer than k rows the domain was smaller than k and the row count
    IS the exact distinct count."""
    return sketch.agg(
        F.count("*").alias("_n"), F.max("u").alias("_theta")
    ).select(
        F.when(
            F.col("_n") < k, F.col("_n").cast("double")
        )
        .otherwise((F.lit(float(k - 1))) / F.col("_theta"))
        .alias("est_distinct")
    )


def kmv_merge(sketches: "list[DataFrame]", k: int) -> DataFrame:
    """Union per-partition sketches and re-take the bottom-k — the
    lossless KMV merge (associative, order-free)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("u").limit(k)
