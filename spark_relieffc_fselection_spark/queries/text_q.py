"""Text-analysis queries over ``documents`` with DuckDB oracles.

The oracle SQL re-derives each pipeline with DuckDB's regexp/string
functions; portability notes inline where the engines' function names
differ (regexp_extract_all vs regexp_count etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.textstats import (
    STOPWORDS,
    fingerprints,
    language_id,
    quality_scores,
    token_stats,
)
from spark_relieffc_fselection_spark.queries import register
from spark_relieffc_fselection_spark.sources import load_table

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_H64 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
FP_NGRAM = 8

_STOPWORD_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in STOPWORDS.items() for w in ws
)


@register(
    "q28_token_stats",
    oracle=f"""
    WITH normed AS (SELECT doc_id, {_NORM} AS norm FROM documents)
    SELECT doc_id,
           length(norm) AS n_chars,
           CASE WHEN norm = '' THEN 0 ELSE len(string_split(norm, ' ')) END AS n_words_ws,
           len(regexp_extract_all(norm, '[a-z0-9]+')) AS n_words_re,
           greatest(CAST(ceil(length(norm) / 4.0) AS BIGINT),
                    CAST(CASE WHEN norm = '' THEN 0 ELSE len(string_split(norm, ' ')) END AS BIGINT)) AS n_tokens_bpe_est
    FROM normed
    """,
    doc="Token counting: whitespace + regex word tokens + BPE-ish estimate",
)
def q28_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, sf_dir, "documents"))


#: q29's full oracle, shared with q117's per-source calibration (which
#: wraps it in a CTE) so the score definition cannot drift between the
#: two queries.
QUALITY_ORACLE_SQL = f"""
    WITH normed AS (SELECT doc_id, {_NORM} AS norm FROM documents),
    base AS (
      SELECT doc_id, norm,
             length(norm) AS n_chars,
             CASE WHEN norm = '' THEN 0 ELSE len(string_split(norm, ' ')) END AS n_words,
             length(norm) - length(regexp_replace(norm, '[.,!?;:''"()\\-]', '', 'g')) AS n_punct,
             length(norm) - length(regexp_replace(norm, '[0-9]', '', 'g')) AS n_digits
      FROM normed
    ),
    sw AS (
      SELECT doc_id, COUNT(*) AS n_stopwords
      FROM (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok FROM normed) t
      WHERE tok IN ({', '.join(repr(w) for w in STOPWORDS['en'])})
      GROUP BY doc_id
    )
    SELECT b.doc_id, n_chars, n_words,
           ROUND(n_chars / CAST(greatest(n_words, 1) AS DOUBLE), 6) AS mean_word_len,
           ROUND(COALESCE(n_stopwords, 0) / CAST(greatest(n_words, 1) AS DOUBLE), 6) AS stopword_ratio,
           ROUND(n_punct / CAST(greatest(n_chars, 1) AS DOUBLE), 6) AS punct_ratio,
           ROUND(n_digits / CAST(greatest(n_chars, 1) AS DOUBLE), 6) AS digit_ratio,
           ROUND(least(n_words / 200.0, 1.0) * 0.4
                 + least(COALESCE(n_stopwords, 0) / CAST(greatest(n_words, 1) AS DOUBLE) * 5.0, 1.0) * 0.3
                 + (1.0 - least(n_punct / CAST(greatest(n_chars, 1) AS DOUBLE) * 10.0, 1.0)) * 0.15
                 + (1.0 - least(n_digits / CAST(greatest(n_chars, 1) AS DOUBLE) * 10.0, 1.0)) * 0.15,
                 6) AS quality_score
    FROM base b LEFT JOIN sw ON b.doc_id = sw.doc_id
    """


@register(
    "q29_quality_scores",
    oracle=QUALITY_ORACLE_SQL,
    doc="Heuristic quality features + composite score (LLM-corpus filter "
        "family: length, stopword ratio, punct/digit density)",
)
def q29_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(load_table(spark, sf_dir, "documents"))


@register(
    "q30_language_id",
    oracle=f"""
    WITH normed AS (
      SELECT doc_id, {_NORM} AS norm FROM documents
    ),
    toks AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok FROM normed),
    profile(lang, tok) AS (VALUES {_STOPWORD_VALUES}),
    votes AS (
      SELECT doc_id, lang, COUNT(*) AS hits
      FROM toks JOIN profile USING (tok) GROUP BY doc_id, lang
    ),
    best AS (
      SELECT doc_id, lang AS sw_lang, hits FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY hits DESC, lang ASC) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT n.doc_id,
           CASE WHEN regexp_matches(n.norm, '[一-鿿]') THEN 'zh'
                WHEN b.sw_lang IS NOT NULL THEN b.sw_lang
                ELSE 'und' END AS pred_lang,
           ROUND(COALESCE(b.hits, 0) / CAST(greatest(
             CASE WHEN n.norm = '' THEN 0 ELSE len(string_split(n.norm, ' ')) END, 1) AS DOUBLE), 6) AS lang_score
    FROM normed n LEFT JOIN best b ON n.doc_id = b.doc_id
    """,
    doc="Heuristic language ID: CJK char detection + stopword-profile "
        "voting with deterministic tiebreak",
)
def q30_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents"))


@register(
    "q31_fingerprints",
    oracle=f"""
    WITH normed AS (SELECT doc_id, {_NORM} AS norm FROM documents)
    SELECT doc_id,
           {_H64.format(x='norm')} AS content_fp,
           CASE WHEN length(norm) < {FP_NGRAM} THEN {_H64.format(x='norm')}
                ELSE (
                  SELECT MIN({_H64.format(x=f'substr(norm, i, {FP_NGRAM})')})
                  FROM unnest(generate_series(1, length(norm) - {FP_NGRAM - 1})) AS t(i)
                ) END AS min_gram_fp
    FROM normed
    """,
    doc="Document fingerprinting: whole-content hash + winnowing-style "
        "min char-8-gram hash",
)
def q31_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(load_table(spark, sf_dir, "documents"), ngram_chars=FP_NGRAM)


#: token-count histogram bucket width
LEN_BUCKET = 16


@register(
    "q76_length_histogram",
    oracle=f"""
    WITH normed AS (SELECT doc_id, {_NORM} AS norm FROM documents),
    lens AS (
      SELECT doc_id, len(string_split(norm, ' ')) AS n_toks FROM normed
    )
    SELECT CAST(floor(n_toks / {LEN_BUCKET}.0) AS BIGINT) AS len_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           MIN(n_toks) AS min_toks, MAX(n_toks) AS max_toks
    FROM lens GROUP BY 1
    """,
    doc="Document-length histogram (token-count buckets of width 16): "
        "the corpus-shape profile every packing/curriculum decision "
        "reads. One per-row expression + one partial+final aggregation "
        "over at most a few hundred buckets — scale-free.",
)
def q76_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_toks")
    )
    return (
        lens.groupBy(
            F.floor(F.col("n_toks") / float(LEN_BUCKET)).cast("bigint").alias("len_bucket")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.min("n_toks").alias("min_toks"),
            F.max("n_toks").alias("max_toks"),
        )
    )


@register(
    "q55_tfidf_topterms",
    oracle=f"""
    WITH normed AS (SELECT doc_id, {_NORM} AS norm FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM normed),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf_cnt FROM toks GROUP BY 1, 2),
    doclen AS (SELECT doc_id, COUNT(*) AS doc_len FROM toks GROUP BY 1),
    df AS (SELECT term, COUNT(*) AS df_cnt FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND((tf_cnt / CAST(doc_len AS DOUBLE))
                   * (ln((n_docs + 1.0) / (df_cnt + 1.0)) + 1.0), 6) AS tfidf
      FROM tf JOIN doclen USING (doc_id) JOIN df USING (term), n
    )
    SELECT doc_id, term, tfidf, rnk AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
    doc="TF-IDF top-3 terms per document (smoothed idf = ln((N+1)/(df+1))+1). "
        "Rank on the ROUNDED score with a term tiebreak so cross-engine "
        "1-ulp ln() differences cannot flip ranks. Corpus keyword "
        "extraction — the CountVectorizer/IDF family as pure DataFrame "
        "aggregation (no fitted vocabulary).",
)
def q55_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_relieffc_fselection_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    n_docs = float(docs.count())
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # ONE tokenize pass: doc length and document frequency are windows
    # over the compact (doc_id, term, tf_cnt) table — deriving them as
    # separate aggregates of the un-cached token explode would embed
    # (and execute) the tokenize subplan three times. doc_len =
    # sum(tf_cnt) per doc; df_cnt = rows per term (tf has exactly one
    # row per document containing the term).
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf_cnt"))
    doc_len = F.sum("tf_cnt").over(Window.partitionBy("doc_id"))
    df_cnt = F.count("*").over(Window.partitionBy("term"))
    scored = tf.select(
        "doc_id",
        "term",
        F.round(
            (F.col("tf_cnt") / doc_len.cast("double"))
            * (F.log((F.lit(n_docs) + 1.0) / (df_cnt + 1.0)) + 1.0),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


# --- PII scrub (q83) -----------------------------------------------------------
#
# The synthetic corpus contains no PII, so the scrub is exercised on
# text with DETERMINISTIC synthetic PII injected in-flight (derived
# from doc_id alone — both engines inject byte-identical suffixes).
# This keeps the operator oracle-gated end-to-end: counts AND the
# scrubbed text are value-hashed.

_PII_INJECT_SQL = """
  text
  || CASE WHEN doc_id % 3 = 0
          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
          WHEN doc_id % 3 = 1
          THEN ' see https://example.org/p/' || CAST(doc_id AS VARCHAR)
          ELSE '' END
  || CASE WHEN doc_id % 7 = 0
          THEN ' ip 10.0.' || CAST(doc_id % 200 AS VARCHAR)
               || '.' || CAST(doc_id % 250 AS VARCHAR)
          ELSE '' END
  || CASE WHEN doc_id % 11 = 0
          THEN ' call +1 555 000 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE '' END
"""


@register(
    "q83_pii_scrub",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id, {_PII_INJECT_SQL} AS text FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
           len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_url,
           len(regexp_extract_all(text,
               '\\+?[0-9][0-9()\\- ]{{7,}}[0-9]')) AS n_phone,
           len(regexp_extract_all(text,
               '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) AS n_ipv4,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[PII]', 'g'),
                 'https?://[^\\s]+', '[PII]', 'g'),
               '\\+?[0-9][0-9()\\- ]{{7,}}[0-9]', '[PII]', 'g'),
             '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b',
             '[PII]', 'g') AS scrubbed_text,
           length(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[PII]', 'g'),
                 'https?://[^\\s]+', '[PII]', 'g'),
               '\\+?[0-9][0-9()\\- ]{{7,}}[0-9]', '[PII]', 'g'),
             '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b',
             '[PII]', 'g')) AS scrubbed_chars
    FROM injected
    """,
    doc="PII/compliance scrub (operators.textstats.pii_scrub) made "
        "oracle-gated: deterministic synthetic emails/urls/ips/phones "
        "are appended in-flight (doc_id arithmetic, byte-identical in "
        "both engines), then per-class match counts and the fully "
        "scrubbed text are hash-compared. Pure per-row Catalyst regexps "
        "in pattern-key order — zero shuffle, the standard "
        "pre-tokenizer compliance pass at any scale.",
)
def q83_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.textstats import pii_scrub

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    suffix_email_url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" contact user"), did, F.lit("@example.com")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit(" see https://example.org/p/"), did),
        )
        .otherwise(F.lit(""))
    )
    suffix_ip = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 250).cast("string"),
        ),
    ).otherwise(F.lit(""))
    suffix_phone = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.lit(" call +1 555 000 "),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), suffix_email_url, suffix_ip, suffix_phone
        ).alias("text"),
    )
    return pii_scrub(injected)


# --- linear quality classifier (q110) ------------------------------------------

CLF_D, CLF_BIAS = 1024, 0.05


@register(
    "q110_linear_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok FROM documents
    ),
    feat AS (
      SELECT doc_id, {_H64.format(x='tok')} % {CLF_D} AS fidx FROM toks
    ),
    w AS (
      SELECT i AS fidx,
             ((('0x' || substr(md5('w#' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
               % 2001) - 1000) AS w_milli
      FROM range({CLF_D}) t(i)
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
             CAST(SUM(w.w_milli) AS BIGINT) AS s_milli
      FROM feat JOIN w USING (fidx)
      GROUP BY doc_id
    ),
    -- exact integer HALF-AWAY-FROM-ZERO at 6dp: m = micro-units
    -- numerator, denominator n_toks; a logit exactly on a .5e-6
    -- boundary (doc 374 at sf0.001: -1249/16000) rounds identically
    -- in both engines this way, which double ROUND cannot promise
    ex AS (
      SELECT doc_id, n_toks,
             ({round(CLF_BIAS * 1000)} * n_toks + s_milli) * 1000 AS m
      FROM agg
    )
    SELECT doc_id, n_toks,
           CAST(CASE WHEN m >= 0
                     THEN (2*m + n_toks) // (2*n_toks)
                     ELSE -((2*(-m) + n_toks) // (2*n_toks)) END AS DOUBLE)
             / 1000000.0 AS logit,
           CASE WHEN m >= 0 THEN 'keep' ELSE 'drop' END AS quality_label
    FROM ex
    """,
    doc="Linear text-classifier INFERENCE via the hashing trick — the "
        "fastText-style quality-filter stage (CCNet/RefinedWeb/FineWeb "
        "all run one): token -> md5 % 1024 feature index -> broadcast "
        f"weight join -> per-doc mean contribution + bias {CLF_BIAS}, "
        "label = sign(logit). The weight frame stands in for the "
        "published model artifact (hash-derived here so both engines "
        "materialize it bit-identically). ONE corpus shuffle: "
        "sum(tf_j*w_j) == sum over tokens of w(token), so no "
        "(doc, feature) tf table exists; weights accumulate as exact "
        "integer milli-units and the 6dp logit rounds the exact "
        "rational half-away-from-zero in BOTH engines — even a logit "
        "landing exactly on a .5e-6 boundary (doc 374 at sf0.001) is "
        "bit-deterministic, with zero libm calls.",
)
def q110_linear_quality_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.textstats import (
        hashed_linear_scores,
        hashing_trick_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    weights = hashing_trick_weights(spark, CLF_D)
    return hashed_linear_scores(docs, weights, CLF_D, CLF_BIAS)


# --- count-min sketch frequency estimation (q112) ------------------------------

CM_D, CM_W, CM_TOP = 4, 1024, 20


@register(
    "q112_countmin_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS tok FROM documents
    ),
    exact AS (SELECT tok, COUNT(*) AS true_count FROM toks GROUP BY tok),
    top AS (
      SELECT tok, true_count FROM exact
      ORDER BY true_count DESC, tok ASC LIMIT {CM_TOP}
    ),
    cells AS (
      SELECT r.i AS row,
             ('0x' || substr(md5(tok || '#' || CAST(r.i AS VARCHAR)), 1, 15))::BIGINT
             % {CM_W} AS col
      FROM toks CROSS JOIN range({CM_D}) r(i)
    ),
    sketch AS (SELECT row, col, COUNT(*) AS c FROM cells GROUP BY 1, 2)
    SELECT t.tok, t.true_count,
           MIN(COALESCE(s.c, 0)) AS est_count
    FROM top t CROSS JOIN range({CM_D}) r(i)
    LEFT JOIN sketch s
      ON s.row = r.i
     AND s.col = ('0x' || substr(md5(t.tok || '#' || CAST(r.i AS VARCHAR)), 1, 15))::BIGINT
                 % {CM_W}
    GROUP BY t.tok, t.true_count
    """,
    doc=f"COUNT-MIN sketch frequency estimation: a {CM_D}x{CM_W} cell "
        "sketch of the token stream (the bounded-memory alternative to "
        "a vocabulary-sized groupBy — the only shuffle carries (row, "
        "col) int pairs that partial aggregation collapses to at most "
        "d*w cells per task), point-queried for the exact top-"
        f"{CM_TOP} tokens so the oracle checks the classic guarantee "
        "cell-for-cell: est >= true, overestimate bounded by "
        "colliding mass. Sketches merge by cellwise addition, which "
        "is why production pipelines ship sketches, not vocab dumps, "
        "across days/sources.",
)
def q112_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.functions.text import tokens
    from spark_relieffc_fselection_spark.operators.textstats import (
        countmin_estimate,
        countmin_sketch,
    )

    from spark_relieffc_fselection_spark.queries import localize

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    exact = tok.groupBy("tok").agg(F.count("*").alias("true_count"))
    # localize the 20-row probe list: it feeds BOTH the output join and
    # the estimate side, and ReuseExchange would not unify the two
    # aliased copies of the explode+groupBy+top-k subtree
    top = localize(
        exact.orderBy(F.desc("true_count"), F.asc("tok")).limit(CM_TOP)
    )
    sketch = countmin_sketch(tok, CM_D, CM_W)
    est = countmin_estimate(top.select("tok"), sketch, CM_D, CM_W)
    return est.join(F.broadcast(top), "tok").select(
        "tok", "true_count", "est_count"
    )


#: q152: vocabulary head size for the Zipf rank-frequency fit.
ZIPF_TOP = 500


@register(
    "q152_zipf_fit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS term FROM documents
    ),
    counts AS (
      SELECT term, COUNT(*) AS cnt FROM toks
      WHERE term <> '' GROUP BY term
    ),
    head AS (
      SELECT term, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rnk
      FROM counts
      ORDER BY cnt DESC, term ASC LIMIT {ZIPF_TOP}
    ),
    pts AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y FROM head),
    sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM sums
    """,
    doc="Zipf rank-frequency fit: token counts -> top-ZIPF_TOP head "
        "(bounded top-k = TakeOrderedAndProject, never a global sort "
        "of the vocabulary) -> OLS slope/intercept in log-log space, "
        "decimal-summed so shuffle order can't move the fit. The "
        "corpus-health one-liner: a healthy natural-language crawl "
        "sits near slope -1; template/boilerplate floods flatten the "
        "head and machine-generated spam steepens it. One tokenize "
        "shuffle; everything after the head is 500 rows.",
)
def q152_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("term")).filter(
        F.col("term") != ""
    )
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    head = (
        counts.orderBy(F.desc("cnt"), F.asc("term"))
        .limit(ZIPF_TOP)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("term"))
            ),
        )
    )
    x = F.log(F.col("rnk").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    DEC = "decimal(38,18)"
    sums = head.select(x.alias("x"), y.alias("y")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


#: q153: merge candidates reported per BPE round.
BPE_TOP = 5


@register(
    "q153_bpe_merge_step",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w, COUNT(*) AS wc FROM words
      WHERE length(w) >= 2 GROUP BY w
    ),
    p1 AS (
      SELECT substr(w, i.i, 2) AS pair, SUM(wc) AS wcnt
      FROM vocab, LATERAL (
        SELECT unnest(generate_series(1, length(w) - 1)) AS i
      ) i
      GROUP BY 1
    ),
    top1 AS (
      SELECT pair FROM p1 ORDER BY wcnt DESC, pair ASC LIMIT 1
    ),
    vocab2 AS (
      SELECT replace(w, (SELECT pair FROM top1), chr(1)) AS w, wc
      FROM vocab
    ),
    p2 AS (
      SELECT substr(w, i.i, 2) AS pair, SUM(wc) AS wcnt
      FROM vocab2, LATERAL (
        SELECT unnest(generate_series(1, length(w) - 1)) AS i
      ) i
      WHERE length(w) >= 2
      GROUP BY 1
    ),
    ranked AS (
      SELECT 1 AS round, pair, wcnt,
             ROW_NUMBER() OVER (ORDER BY wcnt DESC, pair ASC) AS rank
      FROM (SELECT * FROM p1 ORDER BY wcnt DESC, pair ASC LIMIT {BPE_TOP})
      UNION ALL
      SELECT 2 AS round, pair, wcnt,
             ROW_NUMBER() OVER (ORDER BY wcnt DESC, pair ASC) AS rank
      FROM (SELECT * FROM p2 ORDER BY wcnt DESC, pair ASC LIMIT {BPE_TOP})
    )
    SELECT round, rank, replace(pair, chr(1), '*') AS pair,
           CAST(wcnt AS BIGINT) AS wcnt
    FROM ranked
    """,
    doc="BPE tokenizer induction, two merge rounds unrolled: adjacent "
        "symbol-pair counts weighted by word frequency pick merge #1; "
        "the merge applies to the vocabulary (left-to-right "
        "non-overlapping replace, identical in both engines) and round "
        "2 recounts over the merged symbols ('*' renders the new "
        "symbol). THE scale property of BPE training: pair counting "
        "runs over the DISTINCT-WORD vocabulary weighted by counts, "
        "never the corpus — one corpus tokenize shuffle builds the "
        "vocab, then every merge round is vocab-sized (and the vocab "
        "itself is Zipf-bounded far below corpus size at 100 TB). "
        "Both rounds' candidate lists are bounded top-k.",
)
def q153_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.functions.text import tokens
    from spark_relieffc_fselection_spark.queries import localize

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens("text")).alias("w")).filter(
        F.length("w") >= 2
    )
    # vocab is Zipf-bounded (distinct words) — localize so both merge
    # rounds read a LocalRelation instead of re-running the corpus
    # tokenize (the q129 dupe-subtree rule: two consumers => localize)
    vocab = localize(words.groupBy("w").agg(F.count("*").alias("wc")))

    from spark_relieffc_fselection_spark.operators.bpe import (
        pair_counts as pairs,
    )

    p1 = pairs(vocab)
    top1 = p1.orderBy(F.desc("wcnt"), F.asc("pair")).limit(1).collect()
    merge1 = top1[0]["pair"] if top1 else ""
    # literal (non-regex) replace, left-to-right non-overlapping —
    # identical semantics to the oracle's replace()
    vocab2 = vocab.select(
        (
            F.replace(F.col("w"), F.lit(merge1), F.lit("\x01"))
            if merge1
            else F.col("w")
        ).alias("w"),
        "wc",
    ).filter(F.length("w") >= 2)
    p2 = pairs(vocab2)

    def head(p, rnd):
        h = p.orderBy(F.desc("wcnt"), F.asc("pair")).limit(BPE_TOP)
        return h.select(
            F.lit(rnd).alias("round"),
            F.row_number()
            .over(Window.orderBy(F.desc("wcnt"), F.asc("pair")))
            .alias("rank"),
            F.translate("pair", "\x01", "*").alias("pair"),
            F.col("wcnt").cast("bigint").alias("wcnt"),
        )

    return head(p1, 1).unionByName(head(p2, 2))


#: q156: learned BPE merge rounds / top encoded tokens reported.
BPE_ENC_MERGES = 6
BPE_ENC_TOP = 20


def _placeholder_cp(m: int) -> int:
    """DuckDB chr() codepoint for merge ``m`` — derived from the
    engine's merge_placeholder so the generated oracles track the
    two-tier PUA alphabet by construction (a hardcoded 0xE000+m would
    silently diverge past merge 6399)."""
    from spark_relieffc_fselection_spark.operators.bpe import (
        merge_placeholder,
    )

    return ord(merge_placeholder(m))


def _bpe_train_cte_parts(n_merges: int, vocab_cap: int | None) -> list[str]:
    """The shared training half of the generated BPE oracles (pure
    code motion out of ``_bpe_encode_oracle`` — the emitted SQL is
    character-identical): corpus histogram, optional capped vocab0,
    then M data-dependent merge rounds (pair count -> top-1 ->
    literal replace)."""
    parts = [
        "WITH words AS (",
        f"  SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents",
        "),",
        "fullvocab AS (",
        "  SELECT w, COUNT(*) AS wc FROM words WHERE length(w) >= 1 GROUP BY w",
        "),",
    ]
    if vocab_cap is None:
        parts.append("vocab0 AS (SELECT w, wc FROM fullvocab),")
    else:
        parts.append(
            f"vocab0 AS (SELECT w, wc FROM fullvocab "
            f"ORDER BY wc DESC, w ASC LIMIT {vocab_cap}),"
        )
    for m in range(1, n_merges + 1):
        parts += [
            f"p{m} AS (",
            f"  SELECT substr(w, i.i, 2) AS pair, SUM(wc) AS wcnt",
            f"  FROM vocab{m - 1}, LATERAL (",
            "    SELECT unnest(generate_series(1, length(w) - 1)) AS i",
            "  ) i WHERE length(w) >= 2 GROUP BY 1",
            "),",
            f"t{m} AS MATERIALIZED "
            f"(SELECT pair FROM p{m} ORDER BY wcnt DESC, pair ASC LIMIT 1),",
            f"vocab{m} AS MATERIALIZED (",
            # coalesce: an exhausted pair supply (tiny corpus) must be an
            # identity replace, not a NULL-poisoned vocabulary;
            # the chr codepoint is derived FROM merge_placeholder, so
            # the oracle tracks the two-tier alphabet by construction
            f"  SELECT replace(w, coalesce((SELECT pair FROM t{m}), chr(0)),"
            f" chr({_placeholder_cp(m)})) AS w, wc FROM vocab{m - 1}",
            "),",
        ]
    return parts


def _bpe_encode_oracle(
    n_merges: int = BPE_ENC_MERGES,
    vocab_cap: int | None = None,
    top: int = BPE_ENC_TOP,
) -> str:
    """Mechanically generated CTE chain shared by q156 and q170: M
    data-dependent merge rounds (pair count -> top-1 -> literal
    replace, exactly q153's proven primitive) followed by the ENCODE
    half — explode the merged vocabulary into single symbols, expand
    placeholders back to surface strings (reverse merge order), and
    count token frequency over the corpus via the word counts.

    ``vocab_cap`` replays learn_bpe's capped-histogram architecture
    (the top-N (wc DESC, w ASC) words train the merges; the FULL
    vocabulary is then encoded with them). Merge-round CTEs are
    MATERIALIZED: at ~100 rounds an inlined chain re-evaluates
    vocab{m-1} once per reference (vocab{m} + t{m}) — exponential
    blowup, the DuckDB twin of the Catalyst lineage blowup the Spark
    trainer hit."""
    parts = _bpe_train_cte_parts(n_merges, vocab_cap)
    if vocab_cap is None:
        parts.append(f"applied AS (SELECT w, wc FROM vocab{n_merges}),")
    else:
        # encode the FULL vocabulary with the capped-trained merges:
        # one nested replace chain in merge order (linear size)
        chain = "w"
        for m in range(1, n_merges + 1):
            chain = (
                f"replace({chain}, coalesce((SELECT pair FROM t{m}),"
                f" chr(0)), chr({_placeholder_cp(m)}))"
            )
        parts.append(f"applied AS (SELECT {chain} AS w, wc FROM fullvocab),")
    render = "sym"
    for m in range(n_merges, 0, -1):
        render = (
            f"replace({render}, chr({_placeholder_cp(m)}),"
            f" coalesce((SELECT pair FROM t{m}), chr(0)))"
        )
    parts += [
        "syms AS (",
        "  SELECT substr(w, i.i, 1) AS sym, wc",
        "  FROM applied, LATERAL (",
        "    SELECT unnest(generate_series(1, length(w))) AS i",
        "  ) i",
        "),",
        f"rendered AS (SELECT {render} AS token, wc FROM syms),",
        "agg AS (",
        "  SELECT token, CAST(SUM(wc) AS BIGINT) AS cnt",
        "  FROM rendered GROUP BY token",
        "),",
        f"top AS (SELECT * FROM agg ORDER BY cnt DESC, token ASC LIMIT {top})",
        "SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank,",
        "       token, cnt",
        "FROM top",
    ]
    return "\n".join(parts)


@register(
    "q156_bpe_encode",
    oracle=_bpe_encode_oracle(),
    doc="BPE ENCODE — the apply half of tokenizer training (q153 "
        "induces merges; this tokenizes with them): learn "
        f"{BPE_ENC_MERGES} merges over the word-count vocabulary, "
        "apply the full merge chain to every DISTINCT word (literal "
        "left-to-right replace, one placeholder symbol per merge), "
        "explode the merged words into symbols, expand the "
        "placeholders back to surface strings, and report the corpus' "
        f"top-{BPE_ENC_TOP} tokens by frequency. Scale: every merge "
        "round AND the encode itself are vocab-sized (the corpus is "
        "touched once, for the word histogram — the Zipf-bounded "
        "distinct-word set carries frequencies through the whole "
        "chain), so tokenizing 100 TB costs one tokenize shuffle plus "
        "work proportional to the vocabulary, never corpus x merges.",
)
def q156_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.bpe import (
        bpe_apply,
        bpe_render,
        learn_bpe_merges,
    )
    # One corpus shuffle builds the family's memoized vocab; the M
    # merge rounds and the encode all read a LocalRelation (q129
    # dupe-subtree rule: many consumers => localize once).
    vocab = _bpe_vocab(spark, sf_dir)
    # If the pair supply runs dry the operator stops early — the
    # oracle's coalesce turns the remaining rounds into identity
    # replaces, so both engines agree.
    merges = learn_bpe_merges(vocab, BPE_ENC_MERGES)
    v = bpe_apply(vocab, merges)

    syms = v.select(
        F.explode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("sym"),
        "wc",
    )
    # Count by the RENDERED token: distinct symbols could in principle
    # render identically, and the oracle groups by the surface string.
    return (
        syms.select(bpe_render("sym", merges).alias("token"), "wc")
        .groupBy("token")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(BPE_ENC_TOP)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("token")))
            .alias("rank"),
            "token",
            "cnt",
        )
    )


#: q162: unigram-LM Viterbi segmentation bounds.
UNI_MAX_WORD = 16   # words longer than this are excluded (both engines)
UNI_MAX_PIECE = 4   # candidate pieces = substrings up to this length
UNI_TOP = 20
#: Candidate piece-table cap (VERDICT r9 #3): multi-char candidates
#: are bounded top-N by (c DESC, piece ASC); the base alphabet is
#: exempt so every word stays segmentable. DELIBERATELY tiny at the
#: driver's sf0.01 gate (the raw multi-char candidate table there is
#: ~50x larger) so the oracle exercises the CAPPED path — the knob
#: that keeps the broadcast piece dict bounded when Heaps' law puts
#: distinct words at 1e9 on a 100 TB corpus. 120 drops ~40% of the
#: ~204 raw multi-char candidates at sf0.01, so the boundary (and its
#: (c DESC, piece ASC) tie rule) is genuinely load-bearing there.
UNI_PIECE_CAP = 120

#: Per-sf memo of the unigram family's shared base (VERDICT r10 #2):
#: the word-count vocabulary and the CAPPED candidate piece table are
#: IDENTICAL across q162-q166 at a given sf (same corpus filter, same
#: cap params), but each gate was re-paying the corpus histogram plus
#: the cap's explode + bounded top-N sort — a fixture-scale constant
#: x5. Stored as ROWS (plain Python data), not DataFrames: a memoized
#: LocalRelation would pin a stopped SparkSession across test
#: sessions; rebuilding a LocalRelation from a few hundred rows per
#: call costs ~ms. bench.py builds the first entry as a named
#: shared-setup line so no single gate absorbs the family cost.
_UNIGRAM_BASE_MEMO: dict[str, tuple[list, list]] = {}

#: Same pattern for the BPE family's shared vocab (length >= 1 word
#: histogram — q156/q170/q172 build the identical frame; q153's
#: length >= 2 variant is cheap enough to stay inline).
_BPE_VOCAB_MEMO: dict[str, list] = {}


def _bpe_vocab(spark: SparkSession, sf_dir: str):
    """The (w, wc) word histogram over documents with length >= 1 —
    the shared input of q156/q170/q172, memoized as rows per sf (the
    _unigram_base pattern: value-identical to each gate's previous
    inline computation, so the memo changes cost, never answers)."""
    from spark_relieffc_fselection_spark.functions.text import tokens
    from spark_relieffc_fselection_spark.queries import localize

    if sf_dir not in _BPE_VOCAB_MEMO:
        docs = load_table(spark, sf_dir, "documents")
        words = docs.select(F.explode(tokens("text")).alias("w")).filter(
            F.length("w") >= 1
        )
        vocab = localize(words.groupBy("w").agg(F.count("*").alias("wc")))
        _BPE_VOCAB_MEMO[sf_dir] = [
            (r["w"], int(r["wc"])) for r in vocab.collect()
        ]
    rows = _BPE_VOCAB_MEMO[sf_dir]
    vocab = spark.createDataFrame(rows, "w string, wc long")
    vocab._localized_row_count = len(rows)
    return vocab


def _unigram_base(spark: SparkSession, sf_dir: str):
    """(vocab, pieces) as LocalRelations: the corpus word histogram
    (length 1..UNI_MAX_WORD) and the capped candidate piece table —
    the shared inputs of every q162-q166 gate. Values are identical
    to each gate's previous inline computation (verified hash-stable
    at every SF), so the memo changes cost, never answers."""
    from spark_relieffc_fselection_spark.functions.text import tokens
    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        piece_table,
    )
    from spark_relieffc_fselection_spark.queries import localize

    if sf_dir not in _UNIGRAM_BASE_MEMO:
        docs = load_table(spark, sf_dir, "documents")
        words = docs.select(F.explode(tokens("text")).alias("w")).filter(
            (F.length("w") >= 1) & (F.length("w") <= UNI_MAX_WORD)
        )
        vocab = localize(words.groupBy("w").agg(F.count("*").alias("wc")))
        pieces = piece_table(
            vocab, max_piece_len=UNI_MAX_PIECE, max_pieces=UNI_PIECE_CAP
        )
        _UNIGRAM_BASE_MEMO[sf_dir] = (
            [(r["w"], int(r["wc"])) for r in vocab.collect()],
            [(r["piece"], int(r["c"]), float(r["lp"])) for r in pieces.collect()],
        )
    vrows, prows = _UNIGRAM_BASE_MEMO[sf_dir]
    vocab = spark.createDataFrame(vrows, "w string, wc long")
    vocab._localized_row_count = len(vrows)
    pieces = spark.createDataFrame(prows, "piece string, c long, lp double")
    pieces._localized_row_count = len(prows)
    return vocab, pieces


def _unigram_seed_prefix() -> list[str]:
    """The seed half of the generated oracle: corpus words -> capped
    candidate piece table (CTEs toks/vocab/rawp/keep/tot/pieces) —
    shared by the arg-max chains AND the perturbed (subword-
    regularization) chain, which replaces only the DP half."""
    P, W = UNI_MAX_PIECE, UNI_MAX_WORD
    parts = [
        "WITH toks AS (",
        f"  SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents",
        "),",
        "vocab AS (SELECT w, COUNT(*) AS wc FROM toks",
        f"          WHERE length(w) BETWEEN 1 AND {W} GROUP BY w),",
        "rawp AS (",
        "  SELECT substr(w, u.i, l.l) AS piece, SUM(wc) AS c",
        f"  FROM vocab, LATERAL (SELECT unnest(generate_series(1, {P})) AS l) l,",
        "       LATERAL (SELECT unnest(generate_series(1, length(w) - l.l + 1)) AS i) u",
        "  GROUP BY 1",
        "),",
        # the piece-table cap (VERDICT r9 #3): base alphabet exempt,
        # multi-char candidates bounded top-N by (c DESC, piece ASC) —
        # mirrors operators/unigram_lm.py piece_table(max_pieces=...),
        # and lp renormalizes over the SURVIVORS in both engines
        "keep AS (",
        "  SELECT piece, c FROM rawp WHERE length(piece) = 1",
        "  UNION ALL",
        "  SELECT piece, c FROM (",
        "    SELECT piece, c FROM rawp WHERE length(piece) >= 2",
        f"    ORDER BY c DESC, piece ASC LIMIT {UNI_PIECE_CAP}) capped",
        "),",
        "tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM keep),",
        "pieces AS MATERIALIZED (SELECT piece, ROUND(log2(c / t), 6) AS lp FROM keep, tot),",
    ]
    return parts


def _unigram_dp_prefix() -> list[str]:
    """Shared generated-oracle prefix replaying the Viterbi DP exactly
    (the q156 generated-oracle technique): piece scores are
    ROUND(log2(share), 6) — identical doubles across engines — and one
    CTE per word position takes the (s DESC, np ASC, l ASC) arg-max
    over the same candidates in the same operand order, so the scores
    are bit-identical and the arg-max (hence the chosen PATH — the
    tie order is total) cannot diverge. Each d{i} also records the
    chosen last-piece length l{i}, which the q163 tail walks back."""
    return _unigram_seed_prefix() + _dp_argmax_chain("d", "vocab", "pieces")


def _dp_argmax_chain(
    prefix: str, src: str, pieces_cte: str, extra=None
) -> list[str]:
    """CTE chain ``{prefix}0..{prefix}W`` replaying the arg-max Viterbi
    DP over ``src`` (w, wc) against the scores in ``pieces_cte`` —
    parameterized so q166's second E-step can re-run the identical
    recurrence against the RE-ESTIMATED piece table. ``extra(i, l)``
    appends a per-candidate SQL term (the hash-Gumbel
    subword-regularization perturbation, q175) — added AFTER the
    COALESCE exactly like the engine adds perturb() after the piece
    score, so operand order (hence doubles) match."""
    P, W = UNI_MAX_PIECE, UNI_MAX_WORD
    parts = [
        f"{prefix}0 AS (SELECT w, wc, CAST(0.0 AS DOUBLE) AS s0, "
        f"0 AS np0, 0 AS l0 FROM {src}),"
    ]
    for i in range(1, W + 1):
        cands = " UNION ALL ".join(
            f"SELECT d.s{i - l} + COALESCE((SELECT lp FROM {pieces_cte} p WHERE "
            f"p.piece = substr(d.w, {i - l + 1}, {l})), -1000000000.0)"
            + (f" + {extra(i, l)}" if extra is not None else "")
            + " AS s, "
            f"d.np{i - l} + 1 AS np, {l} AS l"
            for l in range(1, min(P, i) + 1)
        )
        parts.append(
            f"{prefix}{i} AS MATERIALIZED (SELECT d.*, b.s AS s{i}, b.np AS np{i}, "
            f"b.l AS l{i} "
            f"FROM {prefix}{i - 1} d, LATERAL (SELECT s, np, l FROM ({cands}) "
            f"ORDER BY s DESC, np ASC, l ASC LIMIT 1) b),"
        )
    return parts


def _unigram_viterbi_oracle() -> str:
    W, K = UNI_MAX_WORD, UNI_TOP
    final_s = (
        "CASE length(w) "
        + " ".join(f"WHEN {i} THEN s{i}" for i in range(1, W + 1))
        + " END"
    )
    final_np = (
        "CASE length(w) "
        + " ".join(f"WHEN {i} THEN np{i}" for i in range(1, W + 1))
        + " END"
    )
    parts = _unigram_dp_prefix() + [
        f"top AS (SELECT w, wc, {final_s} AS bs, {final_np} AS np FROM d{W}",
        f"        ORDER BY wc DESC, w ASC LIMIT {K})",
        "SELECT ROW_NUMBER() OVER (ORDER BY wc DESC, w ASC) AS rank,",
        "       w AS word, wc, ROUND(bs, 6) AS best_lp, np AS n_pieces",
        "FROM top",
    ]
    return "\n".join(parts)


def _mstep_walk(dp_prefix: str, out: str) -> list[str]:
    """Generated M-step walk over an arg-max DP chain named
    ``{dp_prefix}0..{dp_prefix}W``: walk the recorded l{i} arg-max
    lengths back from length(w), cutting one piece per step (a word
    of length W has at most W pieces, so W unrolled steps cover every
    path), then recount piece mass weighted by word frequency into
    ``{out}agg`` — the EM M-step counts. Parameterized on the DP
    chain and an output-name prefix so q169's second EM iteration can
    walk the re-segmented chain alongside the first."""
    W = UNI_MAX_WORD
    l_at_pos = (
        "CASE x.pos{j} "
        + " ".join(f"WHEN {i} THEN x.l{i}" for i in range(1, W + 1))
        + " ELSE 0 END"
    )
    parts = [
        f"{out}w0 AS (SELECT w, wc, "
        + ", ".join(f"l{i}" for i in range(1, W + 1))
        + f", length(w) AS pos0 FROM {dp_prefix}{W}),"
    ]
    for j in range(1, W + 1):
        sel_l = l_at_pos.format(j=j - 1)
        parts.append(
            f"{out}w{j} AS (SELECT x.*, "
            f"CASE WHEN x.pos{j - 1} > 0 THEN "
            f"substr(x.w, x.pos{j - 1} - c.l + 1, c.l) END AS p{j}, "
            f"CASE WHEN x.pos{j - 1} > 0 THEN x.pos{j - 1} - c.l ELSE 0 END AS pos{j} "
            f"FROM {out}w{j - 1} x, LATERAL (SELECT ({sel_l}) AS l) c),"
        )
    used = " UNION ALL ".join(
        f"SELECT p{j} AS piece, wc FROM {out}w{W} WHERE p{j} IS NOT NULL"
        for j in range(1, W + 1)
    )
    parts += [
        f"{out}used AS ({used}),",
        f"{out}agg AS (SELECT piece, CAST(SUM(wc) AS BIGINT) AS uses "
        f"FROM {out}used GROUP BY piece),",
    ]
    return parts


def _unigram_mstep_chain() -> list[str]:
    """Round-1 prefix + M-step walk into ``agg`` (q163/q165/q166)."""
    # the round-1 walk uses the unprefixed legacy names (w0..wW,
    # used, agg), which is exactly _mstep_walk's empty out-prefix
    return _unigram_dp_prefix() + _mstep_walk("d", "")


def _unigram_mstep_oracle() -> str:
    K = UNI_TOP
    parts = _unigram_mstep_chain() + [
        f"top AS (SELECT * FROM agg ORDER BY uses DESC, piece ASC LIMIT {K})",
        "SELECT ROW_NUMBER() OVER (ORDER BY uses DESC, piece ASC) AS rank,",
        "       piece, uses",
        "FROM top",
    ]
    return "\n".join(parts)


@register(
    "q162_unigram_viterbi",
    oracle=_unigram_viterbi_oracle(),
    doc="Unigram-LM (SentencePiece-style) Viterbi segmentation — the "
        "DP counterpart of BPE in the tokenizer-training family "
        "(Kudo 2018 E-step shape): candidate pieces = corpus-weighted "
        "substrings of the distinct-word vocabulary, piece score = "
        "rounded log2 share of total piece mass, then per-word best "
        "segmentation s[i] = max_l s[i-l] + lp(w[i-l:i]) with "
        "fewer-pieces/shorter-last tie-breaks; reports the top words' "
        "best score and piece count. Scale: the corpus is touched once "
        "(word histogram); piece counting and the DP are vocab-sized "
        "(Zipf-bounded at 100 TB), the DP an Arrow-batched mapInPandas "
        "with the piece dict broadcast. The score rounding makes the "
        "cross-engine DP bit-identical (see the oracle generator).",
)
def q162_unigram_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        viterbi_segment,
    )

    vocab, pieces = _unigram_base(spark, sf_dir)
    seg = viterbi_segment(vocab, pieces, max_piece_len=UNI_MAX_PIECE)
    top = seg.orderBy(F.desc("wc"), F.asc("w")).limit(UNI_TOP)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("wc"), F.asc("w")))
        .alias("rank"),
        F.col("w").alias("word"),
        "wc",
        F.round("best_lp", 6).alias("best_lp"),
        "n_pieces",
    )


@register(
    "q163_unigram_mstep_counts",
    oracle=_unigram_mstep_oracle(),
    doc="Unigram-LM EM M-step: backtrack each word's Viterbi-best "
        "segmentation (q162's DP — the tie order is total, so the "
        "chosen path is deterministic and oracle-replayable) and "
        "recount piece mass weighted by word frequency — the expected "
        "counts SentencePiece feeds into the next piece-probability "
        "estimate. Scale: corpus touched once (word histogram); the "
        "DP + backtrack are vocab-sized mapInPandas; the recount is a "
        "pieces-sized groupBy with map-side partial aggregation. The "
        "oracle walks the recorded per-position arg-max lengths with "
        "one unrolled CTE per step.",
)
def q163_unigram_mstep_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        viterbi_piece_counts,
    )

    vocab, pieces = _unigram_base(spark, sf_dir)
    counts = viterbi_piece_counts(vocab, pieces, max_piece_len=UNI_MAX_PIECE)
    top = counts.orderBy(F.desc("uses"), F.asc("piece")).limit(UNI_TOP)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("uses"), F.asc("piece")))
        .alias("rank"),
        "piece",
        F.col("uses").cast("bigint").alias("uses"),
    )


def _unigram_corpus_oracle() -> str:
    """q164 tail: per-word piece counts from the DP (the final-position
    CASE), joined back to the CORPUS tokens by word — the vocab-join
    pattern that tokenizes 100 TB without re-running the DP per
    occurrence."""
    W = UNI_MAX_WORD
    final_np = (
        "CASE length(w) "
        + " ".join(f"WHEN {i} THEN np{i}" for i in range(1, W + 1))
        + " END"
    )
    parts = _unigram_dp_prefix() + [
        f"perword AS (SELECT w, {final_np} AS np FROM d{W}),",
        "dtoks AS (",
        f"  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w FROM documents",
        "),",
        f"scoped AS (SELECT doc_id, w FROM dtoks WHERE length(w) BETWEEN 1 AND {W})",
        "SELECT s.doc_id,",
        "       COUNT(*) AS n_words,",
        "       CAST(SUM(p.np) AS BIGINT) AS n_pieces,",
        "       ROUND(SUM(p.np) / CAST(COUNT(*) AS DOUBLE), 6) AS pieces_per_word",
        "FROM scoped s JOIN perword p USING (w)",
        "GROUP BY s.doc_id",
    ]
    return "\n".join(parts)


@register(
    "q164_unigram_tokenize_corpus",
    oracle=_unigram_corpus_oracle(),
    doc="Corpus tokenization under the learned unigram LM — the "
        "serving half of q162/q163: the per-word Viterbi piece counts "
        "(vocab-sized, computed once) join back to the corpus tokens "
        "by WORD, yielding per-document piece counts and "
        "pieces-per-word (the compression-rate signal quality "
        "pipelines threshold on). Scale: this is THE pattern that "
        "makes tokenizer application 100 TB-safe — the DP never runs "
        "per occurrence; the corpus-sized side only joins against a "
        "broadcast vocab-sized table and partially aggregates "
        "map-side.",
)
def q164_unigram_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.functions.text import tokens
    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        viterbi_segment,
    )

    docs = load_table(spark, sf_dir, "documents")
    dtoks = docs.select("doc_id", F.explode(tokens("text")).alias("w")).filter(
        (F.length("w") >= 1) & (F.length("w") <= UNI_MAX_WORD)
    )
    vocab, pieces = _unigram_base(spark, sf_dir)
    perword = viterbi_segment(vocab, pieces, max_piece_len=UNI_MAX_PIECE).select(
        "w", "n_pieces"
    )
    return (
        dtoks.join(F.broadcast(perword), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.round(
                F.sum("n_pieces") / F.count("*").cast("double"), 6
            ).alias("pieces_per_word"),
        )
    )


#: q165: prune-loss candidates — top-N M-step pieces of length >= 2
#: (the base alphabet is never pruned, SentencePiece-style, so every
#: word stays feasible under any single removal).
UNI_PRUNE_CAND = 12


def _unigram_prune_oracle() -> str:
    """q165 tail: for each prune candidate (top M-step pieces, len>=2)
    re-run the DP with that piece masked over every word CONTAINING it
    — score-only, so each masked step is a GREATEST over the same
    candidates (no arg-max lateral needed; tie-breaks only choose the
    PATH, never the max). Words whose best path avoids the candidate
    contribute exactly 0 (their optimal path survives the removal and
    the masked max recomputes the same double), which is why the
    engine may skip them and the oracle may include them: the sums
    agree term-for-term. Loss terms are bit-identical doubles
    (rounded piece scores, fixed DP operand order) summed as
    decimal(38,18), so the per-piece total is order-independent."""
    P, W, NC = UNI_MAX_PIECE, UNI_MAX_WORD, UNI_PRUNE_CAND
    final_bs = (
        "CASE length(w) "
        + " ".join(f"WHEN {i} THEN s{i}" for i in range(1, W + 1))
        + " END"
    )
    parts = _unigram_mstep_chain() + [
        f"cand AS (SELECT piece, uses FROM agg WHERE length(piece) >= 2 "
        f"ORDER BY uses DESC, piece ASC LIMIT {NC}),",
        f"best AS (SELECT w, wc, {final_bs} AS bs FROM d{W}),",
        "m0 AS (SELECT b.w, b.wc, b.bs, c.piece AS mask, "
        "CAST(0.0 AS DOUBLE) AS ms0 "
        "FROM best b JOIN cand c ON instr(b.w, c.piece) > 0),",
    ]
    for i in range(1, W + 1):
        exprs = ", ".join(
            f"m.ms{i - l} + COALESCE((SELECT lp FROM pieces p WHERE "
            f"p.piece = substr(m.w, {i - l + 1}, {l}) "
            f"AND p.piece <> m.mask), -1000000000.0)"
            for l in range(1, min(P, i) + 1)
        )
        greatest = exprs if i == 1 else f"GREATEST({exprs})"
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT m.*, {greatest} AS ms{i} "
            f"FROM m{i - 1} m),"
        )
    final_ms = (
        "CASE length(w) "
        + " ".join(f"WHEN {i} THEN ms{i}" for i in range(1, W + 1))
        + " END"
    )
    parts += [
        f"msf AS (SELECT mask, wc, bs, {final_ms} AS ms FROM m{W}),",
        # decimal-FIRST rounding (ADVICE r9): round the exact decimal
        # sum, then cast to double — mirrors operators/unigram_lm.py
        "lossagg AS (SELECT mask AS piece, "
        "CAST(ROUND(SUM(CAST(wc * (bs - ms) AS DECIMAL(38,18))), 6) AS DOUBLE) "
        "AS loss FROM msf GROUP BY mask)",
        "SELECT ROW_NUMBER() OVER (ORDER BY l.loss ASC, c.piece ASC) AS rank,",
        "       c.piece, c.uses, l.loss",
        "FROM cand c JOIN lossagg l ON l.piece = c.piece",
    ]
    return "\n".join(parts)


@register(
    "q165_unigram_prune_loss",
    oracle=_unigram_prune_oracle(),
    doc="Unigram-LM EM prune step — completes the SentencePiece loop "
        "(q162 E-step, q163 M-step recount, q165 vocabulary "
        "refinement): for the top M-step pieces (length >= 2; the "
        "base alphabet is never pruned) compute the corpus "
        "log-likelihood LOSS of removing the piece — sum over words "
        "of wc x (best_lp - best_lp_without_piece) — and rank "
        "least-loss-first, the prune order. Scale: vocab-sized like "
        "the other EM steps; per word one unmasked DP plus a masked "
        "re-run ONLY for candidates on its best path (other words "
        "contribute exactly 0); cross-word sums are decimal, so the "
        "total is shuffle-order-independent and cross-engine exact.",
)
def q165_unigram_prune_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        prune_loss,
        viterbi_piece_counts,
    )
    from spark_relieffc_fselection_spark.queries import localize

    vocab, pieces = _unigram_base(spark, sf_dir)
    uses = viterbi_piece_counts(vocab, pieces, max_piece_len=UNI_MAX_PIECE)
    # candidate list is NC rows — driver-sized by construction (the
    # BPE-argmax precedent: one tiny collect to parameterize the next
    # vocab-sized job)
    cand = (
        uses.filter(F.length("piece") >= 2)
        .orderBy(F.desc("uses"), F.asc("piece"))
        .limit(UNI_PRUNE_CAND)
        .collect()
    )
    candidates = [r["piece"] for r in cand]
    loss = prune_loss(vocab, pieces, candidates, max_piece_len=UNI_MAX_PIECE)
    cand_df = localize(
        spark.createDataFrame(
            [(r["piece"], int(r["uses"])) for r in cand],
            "piece string, uses bigint",
        )
    )
    # NC-row side: hint it broadcast so the join never shuffles the
    # loss aggregate, with or without AQE
    joined = loss.join(F.broadcast(cand_df), "piece")
    return joined.select(
        F.row_number()
        .over(Window.orderBy(F.asc("loss"), F.asc("piece")))
        .alias("rank"),
        "piece",
        "uses",
        "loss",
    )


def _unigram_em_iteration_oracle() -> str:
    """q166 tail: the SECOND EM iteration end-to-end — re-estimate
    piece scores from the M-step's expected counts (the same
    ROUND(log2(share), 6) contract as round 1, so the re-estimated
    doubles are bit-identical across engines) and re-run the identical
    arg-max DP chain against the new table. Per word the output pairs
    round-1 and round-2 likelihood/piece-count. Hard EM's monotonicity
    is CORPUS-level only — the wc-weighted SUM of best scores never
    decreases (Gibbs for the ML re-estimate + every old path's pieces
    survive into the new support; pinned by the EM-monotonicity
    property test). Individual words CAN lose likelihood when the
    re-estimate shifts mass toward pieces other words use (e.g. a rare
    word whose pieces barely appear on any best path)."""
    W, K = UNI_MAX_WORD, UNI_TOP

    def final(col: str) -> str:
        return (
            "CASE length(w) "
            + " ".join(f"WHEN {i} THEN {col}{i}" for i in range(1, W + 1))
            + " END"
        )

    parts = _unigram_mstep_chain() + [
        "t2 AS (SELECT CAST(SUM(uses) AS DOUBLE) AS t FROM agg),",
        "pieces2 AS MATERIALIZED (SELECT piece, ROUND(log2(uses / t), 6) "
        "AS lp FROM agg, t2),",
    ]
    parts += _dp_argmax_chain("e", "vocab", "pieces2")
    parts += [
        f"r1 AS (SELECT w, wc, {final('s')} AS lp1, "
        f"{final('np')} AS np1 FROM d{W}),",
        f"r2 AS (SELECT w, {final('s')} AS lp2, "
        f"{final('np')} AS np2 FROM e{W}),",
        "paired AS (SELECT r1.w, r1.wc, r1.lp1, r1.np1, r2.lp2, r2.np2",
        "           FROM r1 JOIN r2 ON r1.w = r2.w),",
        f"top AS (SELECT * FROM paired ORDER BY wc DESC, w ASC LIMIT {K})",
        "SELECT ROW_NUMBER() OVER (ORDER BY wc DESC, w ASC) AS rank,",
        "       w AS word, wc,",
        "       ROUND(lp1, 6) AS lp_round1, np1 AS np_round1,",
        "       ROUND(lp2, 6) AS lp_round2, np2 AS np_round2",
        "FROM top",
    ]
    return "\n".join(parts)


@register(
    "q166_unigram_em_iteration",
    oracle=_unigram_em_iteration_oracle(),
    doc="A full unigram-LM EM iteration end-to-end: segment under the "
        "substring-count scores (round-1 E-step), recount piece mass "
        "along the best paths (M-step), re-estimate scores from the "
        "expected counts, and RE-SEGMENT under the new table (round-2 "
        "E-step) — per word the paired round-1/round-2 likelihood and "
        "piece counts. Hard EM guarantees the wc-weighted CORPUS "
        "likelihood never decreases (property-tested); individual "
        "words can lose. Scale: the corpus is still touched exactly "
        "once (the word histogram); all four EM stages are vocab- or "
        "pieces-sized, so iterating the loop costs corpus-zero.",
)
def q166_unigram_em_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        reestimate_piece_table,
        viterbi_segment,
    )
    from spark_relieffc_fselection_spark.queries import localize

    vocab, pieces = _unigram_base(spark, sf_dir)
    # ONE round-1 DP pass serves both the E-step summary and the
    # M-step recount: emit the chosen path alongside the summary,
    # localize (vocab-sized), and derive uses by explode + weighted
    # sum over the LOCAL relation — no second DP job, no re-run per
    # consumer
    seg = localize(
        viterbi_segment(
            vocab, pieces, max_piece_len=UNI_MAX_PIECE, emit_pieces=True
        )
    )
    seg1 = seg.select(
        "w", "wc", F.col("best_lp").alias("lp1"), F.col("n_pieces").alias("np1")
    )
    uses = (
        seg.select(F.explode("pieces").alias("piece"), "wc")
        .groupBy("piece")
        .agg(F.sum("wc").alias("uses"))
    )
    pieces2 = reestimate_piece_table(uses)
    seg2 = viterbi_segment(vocab, pieces2, max_piece_len=UNI_MAX_PIECE).select(
        "w", F.col("best_lp").alias("lp2"), F.col("n_pieces").alias("np2")
    )
    top = (
        seg1.join(seg2, "w")
        .orderBy(F.desc("wc"), F.asc("w"))
        .limit(UNI_TOP)
    )
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("wc"), F.asc("w")))
        .alias("rank"),
        F.col("w").alias("word"),
        "wc",
        F.round("lp1", 6).alias("lp_round1"),
        F.col("np1").alias("np_round1"),
        F.round("lp2", 6).alias("lp_round2"),
        F.col("np2").alias("np_round2"),
    )


#: q169: the COMPOSED unigram trainer (VERDICT r9 #4) — EM iterations
#: then prune-by-loss down to a target vocabulary. The target forces
#: real pruning at every SF: the post-EM multi-char support on the
#: fixture corpus is ~28 against a 40 - 24 = 16 multi-char budget,
#: so the loss ranking (and its loss DESC, piece ASC tie rule) is
#: load-bearing in the gate.
UNI_TRAIN_TARGET = 40
UNI_TRAIN_ITERS = 2


def _train_oracle(
    n_iters: int,
    prune_rounds: int = 1,
    shrink: float | None = None,
    target: int = UNI_TRAIN_TARGET,
) -> str:
    """Replays train_unigram(n_iters, prune_rounds, shrink_factor)
    end-to-end — parameterized over the EM iteration count (ADVICE
    r10: the earlier generator hardcoded 2 iterations and would have
    silently desynced from UNI_TRAIN_ITERS) AND the round-11 shrink
    schedule (VERDICT r10 #3). Per prune round: ``n_iters`` fused E+M
    passes (the first under the round's entry table — the capped seed
    for round 0, the floored survivor renorm afterwards; later passes
    under plain re-estimates), then a masked-GREATEST prune-loss
    probe (q165's machinery) and a bounded keep by (loss DESC, piece
    ASC). Non-final rounds keep max(keep_k, floor(n * shrink)); the
    final round keeps exactly keep_k. Between rounds, survivors
    re-estimate with the alphabet re-included under the
    GREATEST(uses, 1) floor (the final-output formula applied
    mid-loop — totality: pruning removes on-path pieces, so the
    floored alphabet is what keeps every word segmentable).

    Control flow is data-INDEPENDENT — fixed round and pass counts; a
    round whose candidate count is already at-or-below its threshold
    keeps everything through the same LIMIT — so this static CTE
    chain replays the engine loop exactly at every SF, binding or
    not. ``shrink`` must be dyadic (0.75, 0.5): the floor threshold
    is computed in double math in BOTH engines, and a non-dyadic
    literal's double-vs-decimal product can floor differently on
    exact-integer boundaries."""
    P, W = UNI_MAX_PIECE, UNI_MAX_WORD
    if prune_rounds > 1 and shrink is None:
        raise ValueError("iterative prune oracle needs a shrink factor")

    def final_case(col: str) -> str:
        return (
            "CASE length(w) "
            + " ".join(f"WHEN {i} THEN {col}{i}" for i in range(1, W + 1))
            + " END"
        )

    parts = _unigram_dp_prefix()
    parts.append("alpha AS (SELECT piece FROM keep WHERE length(piece) = 1),")
    keepk = f"GREATEST({target} - (SELECT COUNT(*) FROM alpha), 0)"
    chain = "d"      # E chain of the most recent pass
    tbl = "pieces"   # score table that pass ran under
    agg = "agg"      # M-step aggregate of the most recent pass
    k = 0            # global pass counter
    for s in range(prune_rounds):
        for i in range(n_iters):
            if k == 0:
                chain, tbl = "d", "pieces"  # emitted by the prefix
            else:
                if i == 0:
                    tbl = f"piecesr{s}"  # floored renorm, emitted below
                else:
                    parts += [
                        f"tr{k} AS (SELECT CAST(SUM(uses) AS DOUBLE) "
                        f"AS t FROM {agg}),",
                        f"piecesq{k} AS MATERIALIZED (SELECT piece, "
                        f"ROUND(log2(uses / t), 6) AS lp "
                        f"FROM {agg}, tr{k}),",
                    ]
                    tbl = f"piecesq{k}"
                # trailing underscore keeps names unambiguous at any
                # depth: prefix e1 + position 10 would otherwise
                # collide with prefix e11 + position 0 once the
                # schedule reaches 11 total EM passes
                chain = f"e{k}_"
                parts += _dp_argmax_chain(chain, "vocab", tbl)
            out = "" if k == 0 else f"u{k}"
            parts += _mstep_walk(chain, out)
            agg = f"{out}agg"
            k += 1
        # prune round s: loss probe under the last pass's table
        kexpr = (
            keepk
            if s == prune_rounds - 1
            else f"GREATEST({keepk}, CAST(FLOOR((SELECT COUNT(*) FROM "
            f"cnd{s}) * CAST({shrink} AS DOUBLE)) AS INT))"
        )
        parts += [
            f"cnd{s} AS (SELECT piece, uses FROM {agg} "
            f"WHERE length(piece) >= 2),",
            f"bst{s} AS (SELECT w, wc, {final_case('s')} AS bs "
            f"FROM {chain}{W}),",
            f"pm{s}_0 AS (SELECT b.w, b.wc, b.bs, c.piece AS mask, "
            f"CAST(0.0 AS DOUBLE) AS ms0 "
            f"FROM bst{s} b JOIN cnd{s} c ON instr(b.w, c.piece) > 0),",
        ]
        for i in range(1, W + 1):
            exprs = ", ".join(
                f"m.ms{i - l} + COALESCE((SELECT lp FROM {tbl} p WHERE "
                f"p.piece = substr(m.w, {i - l + 1}, {l}) "
                f"AND p.piece <> m.mask), -1000000000.0)"
                for l in range(1, min(P, i) + 1)
            )
            greatest = exprs if i == 1 else f"GREATEST({exprs})"
            parts.append(
                f"pm{s}_{i} AS MATERIALIZED (SELECT m.*, {greatest} "
                f"AS ms{i} FROM pm{s}_{i - 1} m),"
            )
        parts += [
            f"msf{s} AS (SELECT mask, wc, bs, {final_case('ms')} AS ms "
            f"FROM pm{s}_{W}),",
            # decimal-FIRST rounding (ADVICE r9), as in q165
            f"lss{s} AS (SELECT mask AS piece, "
            "CAST(ROUND(SUM(CAST(wc * (bs - ms) AS DECIMAL(38,18))), 6) "
            f"AS DOUBLE) AS loss FROM msf{s} GROUP BY mask),",
            f"keepr{s + 1} AS (SELECT piece, uses FROM ("
            f"SELECT c.piece, c.uses, ROW_NUMBER() OVER "
            f"(ORDER BY l.loss DESC, c.piece ASC) AS rn "
            f"FROM cnd{s} c JOIN lss{s} l ON l.piece = c.piece) "
            f"WHERE rn <= ({kexpr})),",
        ]
        if s < prune_rounds - 1:
            # floored survivor renorm: the next round's entry table
            parts += [
                f"surv{s + 1} AS (SELECT piece, uses FROM keepr{s + 1}",
                "  UNION ALL",
                f"  SELECT a.piece, COALESCE(g.uses, 0) AS uses "
                f"FROM alpha a LEFT JOIN {agg} g ON g.piece = a.piece),",
                f"tsv{s + 1} AS (SELECT CAST(SUM(GREATEST(uses, 1)) "
                f"AS DOUBLE) AS t FROM surv{s + 1}),",
                f"piecesr{s + 1} AS MATERIALIZED (SELECT piece, "
                f"ROUND(log2(GREATEST(uses, 1) / t), 6) AS lp "
                f"FROM surv{s + 1}, tsv{s + 1}),",
            ]
    parts += [
        f"surv AS (SELECT piece, uses FROM keepr{prune_rounds}",
        "  UNION ALL",
        f"  SELECT a.piece, COALESCE(g.uses, 0) AS uses "
        f"FROM alpha a LEFT JOIN {agg} g ON g.piece = a.piece),",
        "tots AS (SELECT CAST(SUM(GREATEST(uses, 1)) AS DOUBLE) AS t "
        "FROM surv)",
        "SELECT ROW_NUMBER() OVER (ORDER BY uses DESC, piece ASC) AS rank,",
        "       piece, CAST(uses AS BIGINT) AS uses,",
        "       ROUND(log2(GREATEST(uses, 1) / t), 6) AS lp",
        "FROM surv, tots",
    ]
    return "\n".join(parts)


@register(
    "q169_unigram_train",
    oracle=_train_oracle(UNI_TRAIN_ITERS),
    doc="The COMPOSED unigram-LM trainer (the loop q162-q166 supply "
        "primitives for): seed a CAPPED candidate table, run "
        f"{UNI_TRAIN_ITERS} hard-EM iterations (each ONE fused E+M "
        "Arrow DP pass + re-estimate), then prune by corpus-"
        "likelihood loss down to a "
        f"{UNI_TRAIN_TARGET}-piece vocabulary — alphabet never "
        "pruned, highest-loss (most useful) multi-char pieces kept, "
        "final scores renormalized over the survivors with a "
        "GREATEST(uses,1) floor so required alphabet stays scoreable "
        "(SentencePiece's required_chars). Scale: the corpus is "
        "touched once (word histogram); every EM iteration is one "
        "vocab-sized DP pass whose driver state is the CAPPED piece "
        "table (VERDICT r9 #3's knob) — iterating to a 32k-piece "
        "production vocab costs n_iters corpus-zero passes.",
)
def q169_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        train_unigram,
    )

    # the memoized family base IS this gate's histogram and seed
    # (same corpus filter, same cap) — the trainer warm-starts from it
    vocab, pieces = _unigram_base(spark, sf_dir)
    res = train_unigram(
        vocab,
        vocab_target=UNI_TRAIN_TARGET,
        n_iters=UNI_TRAIN_ITERS,
        max_piece_len=UNI_MAX_PIECE,
        seed_pieces=pieces,
    )
    return res.pieces.select(
        F.row_number()
        .over(Window.orderBy(F.desc("uses"), F.asc("piece")))
        .alias("rank"),
        "piece",
        F.col("uses").cast("bigint").alias("uses"),
        "lp",
    )


#: q171: the iterative-prune trainer (VERDICT r10 #3 — SentencePiece's
#: shrink loop). At the gate SF the post-EM multi-char support is ~28
#: against the same 16-piece multi-char budget as q169, so round 1
#: prunes to max(16, floor(28 * 0.75)) = 21 (BINDING) and, after the
#: inter-round re-EM, round 2 prunes to the 16-piece target (BINDING
#: again) — both rounds' loss rankings are load-bearing under the
#: hash, and the round-2 ranking runs against FRESH likelihoods, the
#: exact staleness the schedule exists to avoid.
UNI_TRAIN_PRUNE_ROUNDS = 2
UNI_TRAIN_SHRINK = 0.75


@register(
    "q171_unigram_train_iterprune",
    oracle=_train_oracle(
        UNI_TRAIN_ITERS, UNI_TRAIN_PRUNE_ROUNDS, UNI_TRAIN_SHRINK
    ),
    doc="The unigram trainer under SentencePiece's ITERATIVE shrink "
        f"schedule: {UNI_TRAIN_PRUNE_ROUNDS} prune rounds, each "
        f"{UNI_TRAIN_ITERS} fused-E+M hard-EM passes then a prune to "
        f"max(target_budget, floor(candidates * {UNI_TRAIN_SHRINK})), "
        "the final round straight to the target — vs q169's "
        "single-shot prune, each round's loss ranking runs against "
        "RE-ESTIMATED likelihoods, which matters whenever the seed "
        "sits far above the target (single-shot over-trusts stale "
        "losses). Between rounds the survivors renormalize with the "
        "alphabet re-included under the GREATEST(uses,1) floor, so "
        "segmentation totality survives every prune. Scale: the "
        "corpus is still touched exactly once (the memoized word "
        "histogram); iterating multiplies only the vocab-sized "
        "DP-pass count by prune_rounds — corpus-zero, the same "
        "schedule SentencePiece runs to a 32k vocab.",
)
def q171_unigram_train_iterprune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        train_unigram,
    )

    vocab, pieces = _unigram_base(spark, sf_dir)
    res = train_unigram(
        vocab,
        vocab_target=UNI_TRAIN_TARGET,
        n_iters=UNI_TRAIN_ITERS,
        max_piece_len=UNI_MAX_PIECE,
        seed_pieces=pieces,
        prune_rounds=UNI_TRAIN_PRUNE_ROUNDS,
        shrink_factor=UNI_TRAIN_SHRINK,
    )
    return res.pieces.select(
        F.row_number()
        .over(Window.orderBy(F.desc("uses"), F.asc("piece")))
        .alias("rank"),
        "piece",
        F.col("uses").cast("bigint").alias("uses"),
        "lp",
    )


#: q170: the COMPOSED BPE trainer (VERDICT r9 #4) at a merge depth
#: that crosses the retired 31-slot C0 ceiling three times over. The
#: fixture corpus' pair supply exhausts around merge ~90, so the
#: exhaustion path (engine break vs oracle identity-replace rounds)
#: is itself under the hash gate at every SF.
BPE_TRAIN_MERGES = 100
BPE_TRAIN_VOCAB_CAP = 24
BPE_TRAIN_TOP = 30


@register(
    "q170_bpe_train",
    oracle=_bpe_encode_oracle(
        n_merges=BPE_TRAIN_MERGES,
        vocab_cap=BPE_TRAIN_VOCAB_CAP,
        top=BPE_TRAIN_TOP,
    ),
    doc=f"The COMPOSED BPE trainer: learn {BPE_TRAIN_MERGES} merges "
        "against the CAPPED word histogram (top "
        f"{BPE_TRAIN_VOCAB_CAP} words by (wc DESC, w ASC) — the "
        "SentencePiece/HF architecture: one corpus shuffle builds "
        "the histogram, one bounded collect brings it to the "
        "driver, the merge loop runs locally with NO per-merge "
        "cluster round-trip), then ENCODE the FULL vocabulary with "
        "the trained chain and report the corpus' top tokens. The "
        "per-round (wcnt DESC, pair ASC) argmax, the left-to-right "
        "literal replace, and the pair-supply-exhaustion behavior "
        "are all pinned against the oracle's sequential CTE replay. "
        "Scale: training cost is merges x capped-histogram — "
        "corpus-independent; the one corpus-sized stage (the word "
        "histogram) is a single partial-aggregated shuffle.",
)
def q170_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.bpe import (
        bpe_apply,
        bpe_render,
        learn_bpe,
    )
    vocab = _bpe_vocab(spark, sf_dir)
    merges = learn_bpe(
        vocab,
        n_merges=BPE_TRAIN_MERGES,
        max_vocab_words=BPE_TRAIN_VOCAB_CAP,
    )
    v = bpe_apply(vocab, merges)
    syms = v.select(
        F.explode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("sym"),
        "wc",
    )
    return (
        syms.select(bpe_render("sym", merges).alias("token"), "wc")
        .groupBy("token")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(BPE_TRAIN_TOP)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("token")))
            .alias("rank"),
            "token",
            "cnt",
        )
    )


#: q172/q173 (VERDICT r10 #7): the tokenizer ARTIFACT round trip under
#: the hash gate — each gate trains, persists the tokenizer to
#: parquet, loads it back through the validating loader, and encodes
#: with the LOADED artifact. The oracle replays the straight-through
#: computation, so hash equality proves persistence is lossless
#: end-to-end (a corrupted ordinal, a dropped piece, or a
#: different-alphabet artifact would diverge the values), not just
#: test-asserted. Params deliberately differ from q170/q156 so the
#: gates carry independent evidence.
BPE_ART_MERGES = 60
BPE_ART_VOCAB_CAP = 20
BPE_ART_TOP = 25

#: Per-(gate, sf) artifact dirs — mkdtemp like q139/q146 (unique per
#: process, so concurrent runners can't race), memoized so every rep
#: targets one stable path. Each invocation still TRAINS and RE-WRITES
#: the artifact by design: the round trip (write -> validated load ->
#: encode) IS the gated behavior, so its cost belongs in the
#: per-query number.
_ARTIFACT_DIRS: dict[str, str] = {}


def _cleanup_artifact_dirs() -> None:
    # atexit, not per-invocation (ADVICE r11): each gate rep re-uses
    # its dir by design, so removal belongs to process end — without
    # this, long driver sessions leak one tmp tree per (gate, sf).
    import shutil

    for d in _ARTIFACT_DIRS.values():
        shutil.rmtree(d, ignore_errors=True)
    _ARTIFACT_DIRS.clear()


def _artifact_dir(key: str) -> str:
    import atexit
    import tempfile

    if key not in _ARTIFACT_DIRS:
        if not _ARTIFACT_DIRS:
            atexit.register(_cleanup_artifact_dirs)
        _ARTIFACT_DIRS[key] = tempfile.mkdtemp(prefix=f"{key}_")
    return _ARTIFACT_DIRS[key]


@register(
    "q172_bpe_artifact_encode",
    oracle=_bpe_encode_oracle(
        n_merges=BPE_ART_MERGES,
        vocab_cap=BPE_ART_VOCAB_CAP,
        top=BPE_ART_TOP,
    ),
    doc=f"BPE artifact round trip: train {BPE_ART_MERGES} merges over "
        f"the capped histogram (top {BPE_ART_VOCAB_CAP} words), "
        "persist the chain with save_merges (parquet, explicit merge "
        "ordinals — order is the load-bearing contract), load it back "
        "through load_merges' ordinal/alphabet validation, and encode "
        "the FULL vocabulary with the LOADED chain. The oracle replays "
        "the straight-through train+encode, so the hash pins the "
        "persistence layer itself: any ordinal shuffle, alphabet "
        "drift, or row loss in the artifact diverges the token "
        "counts. Scale: the artifact is merges-sized (<= ceiling "
        "rows); one tiny write + one tiny validated read on top of "
        "q170's corpus-independent training cost.",
)
def q172_bpe_artifact_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathlib import Path

    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.bpe import (
        bpe_apply,
        bpe_render,
        learn_bpe,
        load_merges,
        save_merges,
    )

    vocab = _bpe_vocab(spark, sf_dir)
    merges = learn_bpe(
        vocab, n_merges=BPE_ART_MERGES, max_vocab_words=BPE_ART_VOCAB_CAP
    )
    path = f"{_artifact_dir('q172_' + Path(sf_dir).name)}/merges"
    save_merges(spark, merges, path)
    loaded = load_merges(spark, path)
    v = bpe_apply(vocab, loaded)
    syms = v.select(
        F.explode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("sym"),
        "wc",
    )
    return (
        syms.select(bpe_render("sym", loaded).alias("token"), "wc")
        .groupBy("token")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(BPE_ART_TOP)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("token")))
            .alias("rank"),
            "token",
            "cnt",
        )
    )


@register(
    "q173_unigram_artifact_tokenize",
    oracle=_unigram_corpus_oracle(),
    doc="Unigram piece-table artifact round trip (q164's serving "
        "shape): the capped piece table persists with save_piece_table "
        "(parquet), loads back through load_piece_table's segmentation-"
        "TOTALITY validation (every multi-char piece's characters must "
        "be alphabet-covered), and the corpus tokenizes under the "
        "LOADED table — per-document piece counts joined by word, the "
        "100 TB-safe pattern. The oracle replays the straight-through "
        "q164 computation, so the hash pins the artifact layer: a "
        "dropped piece or a perturbed lp would shift best paths and "
        "diverge the per-doc counts. Scale: the artifact is "
        "pieces-sized (seed-capped); one tiny write + validated read "
        "on top of q164's one-corpus-pass cost.",
)
def q173_unigram_artifact_tokenize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pathlib import Path

    from spark_relieffc_fselection_spark.functions.text import tokens
    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        load_piece_table,
        save_piece_table,
        viterbi_segment,
    )

    docs = load_table(spark, sf_dir, "documents")
    dtoks = docs.select("doc_id", F.explode(tokens("text")).alias("w")).filter(
        (F.length("w") >= 1) & (F.length("w") <= UNI_MAX_WORD)
    )
    vocab, pieces = _unigram_base(spark, sf_dir)
    path = f"{_artifact_dir('q173_' + Path(sf_dir).name)}/pieces"
    save_piece_table(pieces, path)
    loaded = load_piece_table(spark, path)
    perword = viterbi_segment(
        vocab, loaded, max_piece_len=UNI_MAX_PIECE
    ).select("w", "n_pieces")
    return (
        dtoks.join(F.broadcast(perword), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.round(
                F.sum("n_pieces") / F.count("*").cast("double"), 6
            ).alias("pieces_per_word"),
        )
    )


#: q174: the CEILING-FREE id-space BPE path (the tier design note,
#: built out): train in symbol-id space (no placeholder alphabet, so
#: no 137,465-merge ceiling and no C0/PUA input rejection), encode
#: with the production rank-based algorithm, render ids back to
#: surface tokens. Params differ from q170/q172 so the three trainer
#: gates carry independent evidence; the oracle is the same generated
#: string-path replay — below the ceiling on an ASCII corpus the two
#: representations are sequence-identical (property-pinned), so the
#: hash pins the id path end-to-end: trainer, rank encoder, and
#: renderer.
BPE_IDS_MERGES = 80
BPE_IDS_VOCAB_CAP = 22
BPE_IDS_TOP = 28


@register(
    "q174_bpe_ids_train",
    oracle=_bpe_encode_oracle(
        n_merges=BPE_IDS_MERGES,
        vocab_cap=BPE_IDS_VOCAB_CAP,
        top=BPE_IDS_TOP,
    ),
    doc=f"BPE over ARRAYS OF SYMBOL IDS: train {BPE_IDS_MERGES} merges "
        f"(capped histogram, top {BPE_IDS_VOCAB_CAP} words) in id "
        "space — merge m allocates integer id 0x110000+m, above every "
        "Unicode code point, so the representation has NO merge "
        "ceiling (vs the string path's 137,465 private-use slots) and "
        "accepts ANY input text (merge ids cannot alias characters, "
        "so the C0/PUA guard has nothing to guard). Encode runs the "
        "production rank-based algorithm (lowest-rank adjacent pair "
        "first) in one Arrow pass with the merges-sized ranks dict "
        "broadcast — chain-length-independent, which is what makes a "
        "137k+ vocabulary servable. The oracle replays the STRING "
        "path: below the ceiling the two representations produce "
        "identical sequences (property-pinned parity), so the hash "
        "gates trainer, encoder, and renderer at once. Scale: one "
        "corpus shuffle (the memoized histogram); training is "
        "merges x capped-histogram, corpus-independent; vocabulary "
        "encode is vocab-sized; corpus tokenization joins back by "
        "word (the q156/q164 pattern).",
)
def q174_bpe_ids_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.bpe_ids import (
        bpe_ids_encode,
        learn_bpe_ids,
        render_id,
    )

    vocab = _bpe_vocab(spark, sf_dir)
    merges = learn_bpe_ids(
        vocab, n_merges=BPE_IDS_MERGES, max_vocab_words=BPE_IDS_VOCAB_CAP
    )
    encoded = bpe_ids_encode(vocab, merges)
    # the distinct-token space is bounded by construction
    # (|alphabet| + n_merges, ~200 rows here), so collecting the WHOLE
    # aggregate is exact and driver-trivial — an id-ordered bounded
    # top-N would mis-handle count ties (id order != surface order)
    counts = (
        encoded.select(F.explode("token_ids").alias("tid"), "wc")
        .groupBy("tid")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
        .collect()
    )
    expand = {nid: pair for nid, pair in merges}
    memo: dict[int, str] = {}
    # DISTINCT ids can share a surface — (X,c) and (a,Y) both render
    # "abc" when X=(a,b) merged in some words and Y=(b,c) in others —
    # and the oracle (like the string path) aggregates by SURFACE, so
    # re-sum after rendering, then rank by (cnt DESC, token ASC)
    agg: dict[str, int] = {}
    for r in counts:
        tok = render_id(int(r["tid"]), expand, memo)
        agg[tok] = agg.get(tok, 0) + int(r["cnt"])
    top = sorted(agg.items(), key=lambda t: (-t[1], t[0]))[:BPE_IDS_TOP]
    return spark.createDataFrame(
        [(i + 1, tok, cnt) for i, (tok, cnt) in enumerate(top)],
        "rank int, token string, cnt bigint",
    )


#: q175: SUBWORD REGULARIZATION (Kudo 2018 §3) — the sampled-
#: segmentation piece counts, i.e. the augmentation-epoch twin of
#: q163's argmax M-step. Sampling is hash-Gumbel perturb-and-MAP
#: (operators/unigram_lm.sampled_segment): deterministic given
#: (seed, alpha), which is what makes a SAMPLING operator
#: hash-gateable — the q57/q80 principle applied to segmentation.
UNI_SR_ALPHA = 1.0
UNI_SR_SEED = "sr0"


def _gumbel_term(i: int, l: int) -> str:
    """The per-candidate perturbation in DuckDB spelling: u = the
    repo's portable md5 uniform keyed (seed, word, position, length);
    term = ROUND(-LN(-LN(u)) / alpha, 6) — matching the engine's
    round(-log(-log(u)) / alpha, 6) on the identical u."""
    u = (
        f"(CAST(('0x' || substr(md5('{UNI_SR_SEED}|' || d.w || "
        f"'|{i}|{l}'), 4, 6)) AS BIGINT) + 0.5) / 16777216.0"
    )
    return f"ROUND(-LN(-LN({u})) / {UNI_SR_ALPHA}, 6)"


def _sampled_tokens_oracle() -> str:
    K = UNI_TOP
    parts = _unigram_seed_prefix()
    parts += _dp_argmax_chain("d", "vocab", "pieces", extra=_gumbel_term)
    parts += _mstep_walk("d", "")
    parts += [
        f"top AS (SELECT * FROM agg ORDER BY uses DESC, piece ASC LIMIT {K})",
        "SELECT ROW_NUMBER() OVER (ORDER BY uses DESC, piece ASC) AS rank,",
        "       piece, uses",
        "FROM top",
    ]
    return "\n".join(parts)


@register(
    "q175_unigram_sampled_tokens",
    oracle=_sampled_tokens_oracle(),
    doc="Subword regularization (Kudo 2018): piece usage counts under "
        "a SAMPLED segmentation — the data-augmentation mode where "
        "each training epoch tokenizes under a different segmentation "
        "drawn from the model, which regularizes the downstream LM. "
        "Sampling is hash-Gumbel perturb-and-MAP: every DP candidate "
        "gains ROUND(-ln(-ln(u))/alpha, 6) with u the portable md5 "
        "uniform keyed (seed, word, position, length), and the "
        "perturbed arg-max is a softmax-ish draw — fully "
        "deterministic given (seed, alpha), so the sampled paths are "
        "identical across engines and the M-step counts sit under the "
        "value hash (the q57/q80 hash-sampling principle applied to "
        "segmentation). Scale: identical to the argmax E-step — one "
        "vocab-sized Arrow DP pass per epoch seed, corpus-zero.",
)
def q175_unigram_sampled_tokens(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.unigram_lm import (
        sampled_segment,
    )

    vocab, pieces = _unigram_base(spark, sf_dir)
    seg = sampled_segment(
        vocab,
        pieces,
        alpha=UNI_SR_ALPHA,
        seed=UNI_SR_SEED,
        max_piece_len=UNI_MAX_PIECE,
        emit_pieces=True,
    )
    uses = (
        seg.select(F.explode("pieces").alias("piece"), "wc")
        .groupBy("piece")
        .agg(F.sum("wc").cast("bigint").alias("uses"))
    )
    top = uses.orderBy(F.desc("uses"), F.asc("piece")).limit(UNI_TOP)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("uses"), F.asc("piece")))
        .alias("rank"),
        "piece",
        F.col("uses").cast("bigint").alias("uses"),
    )


#: q176 (VERDICT r11 #2): the ID-SPACE path's artifact layer + byte-
#: level mode under ONE hash gate — q172 gave the STRING path's
#: persistence the oracle treatment; the ids path is now the
#: production-scale trainer (the 210k-merge smoke, SCALE.md round 11)
#: and its artifacts deserve the same. Train in byte-level id space,
#: persist with save_merges_ids, load back through load_merges_ids'
#: ordinal + id-allocation-law validation, and encode the FULL
#: vocabulary with the LOADED chain. The corpus is pure ASCII at
#: every SF (verified: zero non-ASCII words in the normalized token
#: stream at sf0.001/0.01/0.1), so UTF-8 byte ids == code-point ids
#: == the string path's symbols, and the SAME generated string-path
#: oracle replays the whole computation — one gate pins persistence,
#: the allocation-law validator, AND the byte mode at once (a
#: corrupt ordinal, a foreign id, or a byte/char split divergence
#: would each shift the token counts). Params differ from
#: q156/q170/q172/q174 so the trainer gates stay independent
#: evidence.
BPE_IDB_MERGES = 70
BPE_IDB_VOCAB_CAP = 24
BPE_IDB_TOP = 26


@register(
    "q176_bpe_ids_artifact_bytelevel",
    oracle=_bpe_encode_oracle(
        n_merges=BPE_IDB_MERGES,
        vocab_cap=BPE_IDB_VOCAB_CAP,
        top=BPE_IDB_TOP,
    ),
    doc=f"Id-space BPE artifact round trip in BYTE-LEVEL mode: train "
        f"{BPE_IDB_MERGES} merges over UTF-8 byte ids (capped "
        f"histogram, top {BPE_IDB_VOCAB_CAP} words), persist the "
        "chain with save_merges_ids (parquet, explicit ordinals + "
        "new_id = 0x110000+m allocation law), load it back through "
        "load_merges_ids' ordinal/allocation-law validation, encode "
        "the full vocabulary with the LOADED chain (rank-based, "
        "chain-length-independent), render byte ids back to surface "
        "tokens. The oracle replays the string path — on this ASCII "
        "corpus byte ids equal code points, so the hash pins the "
        "ids-path artifact layer, the validator, and byte-level mode "
        "against independent arithmetic. Scale: artifact is "
        "merges-sized; one tiny write + validated read on top of the "
        "corpus-independent training cost (the q172 story on the "
        "ceiling-free path).",
)
def q176_bpe_ids_artifact_bytelevel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pathlib import Path

    from spark_relieffc_fselection_spark.operators.bpe_ids import (
        bpe_ids_encode,
        learn_bpe_ids,
        load_merges_ids,
        render_id_bytes,
        save_merges_ids,
    )

    vocab = _bpe_vocab(spark, sf_dir)
    merges = learn_bpe_ids(
        vocab,
        n_merges=BPE_IDB_MERGES,
        max_vocab_words=BPE_IDB_VOCAB_CAP,
        byte_level=True,
    )
    path = f"{_artifact_dir('q176_' + Path(sf_dir).name)}/merges_ids"
    save_merges_ids(spark, merges, path)
    loaded = load_merges_ids(spark, path)
    encoded = bpe_ids_encode(vocab, loaded, byte_level=True)
    # bounded by |byte alphabet| + n_merges (~200 rows) — exact and
    # driver-trivial, same rationale as q174's aggregate
    counts = (
        encoded.select(F.explode("token_ids").alias("tid"), "wc")
        .groupBy("tid")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
        .collect()
    )
    expand = {nid: pair for nid, pair in loaded}
    memo: dict[int, bytes] = {}
    # distinct ids can share a surface (q174's note) and a byte-level
    # token is bytes until rendered — re-aggregate by decoded surface
    agg: dict[str, int] = {}
    for r in counts:
        tok = render_id_bytes(int(r["tid"]), expand, memo).decode("utf-8")
        agg[tok] = agg.get(tok, 0) + int(r["cnt"])
    top = sorted(agg.items(), key=lambda t: (-t[1], t[0]))[:BPE_IDB_TOP]
    return spark.createDataFrame(
        [(i + 1, tok, cnt) for i, (tok, cnt) in enumerate(top)],
        "rank int, token string, cnt bigint",
    )


#: q177 (VERDICT r11 #3): WORD-level BPE-dropout under the hash gate —
#: the replayable string-path variant of Provilkov 2020 (site-level
#: dropout, property-pinned in tests, has no tractable SQL replay;
#: keying the drop decision on the ORIGINAL word makes the mask
#: computable up front, so a CTE chain can conditionally skip each
#: merge's replace per word). Params differ from every other BPE gate.
BPE_WD_MERGES = 40
BPE_WD_VOCAB_CAP = 16
BPE_WD_TOP = 24
BPE_WD_P = 0.25
BPE_WD_SEED = "wd0"


def _bpe_word_dropout_oracle(
    n_merges: int, vocab_cap: int, top: int, p: float, seed: str
) -> str:
    """Generated replay of train-then-dropout-encode: the shared
    training rounds (``_bpe_train_cte_parts``), then ONE nested
    replace chain over the full vocabulary where each merge's search
    pattern is conditional — chr(0) (unmatchable: C0 is
    trainer-rejected from every vocabulary) where the word's (seed,
    original word, merge ordinal) md5 uniform is < p, the trained
    pair otherwise — operand-for-operand the engine's
    ``bpe_apply_word_dropout``. The uniform is the portable
    hash_uniform spelling (q80/q175), exact in both engines, so the
    comparison against the p literal cannot diverge. The
    conditional-PATTERN form keeps the chain linear (each level
    references the accumulated expression once); a ``CASE WHEN
    dropped THEN prev ELSE replace(prev, ...)`` chain would inline
    prev twice per level — exponential, the blowup class the
    MATERIALIZED training rounds exist to avoid. Inside the chain,
    bare ``w`` in each CASE resolves to fullvocab's COLUMN (the
    original word), never the accumulated expression — exactly the
    engine's original-word keying."""
    parts = _bpe_train_cte_parts(n_merges, vocab_cap)
    chain = "w"
    for m in range(1, n_merges + 1):
        u = (
            f"(CAST(('0x' || substr(md5('{seed}|' || w || '|{m}'), "
            "4, 6)) AS BIGINT) + 0.5) / 16777216.0"
        )
        chain = (
            f"replace({chain}, CASE WHEN {u} < {p} THEN chr(0)"
            f" ELSE coalesce((SELECT pair FROM t{m}), chr(0)) END,"
            f" chr({_placeholder_cp(m)}))"
        )
    parts.append(f"applied AS (SELECT {chain} AS w, wc FROM fullvocab),")
    render = "sym"
    for m in range(n_merges, 0, -1):
        render = (
            f"replace({render}, chr({_placeholder_cp(m)}),"
            f" coalesce((SELECT pair FROM t{m}), chr(0)))"
        )
    parts += [
        "syms AS (",
        "  SELECT substr(w, i.i, 1) AS sym, wc",
        "  FROM applied, LATERAL (",
        "    SELECT unnest(generate_series(1, length(w))) AS i",
        "  ) i",
        "),",
        f"rendered AS (SELECT {render} AS token, wc FROM syms),",
        "agg AS (",
        "  SELECT token, CAST(SUM(wc) AS BIGINT) AS cnt",
        "  FROM rendered GROUP BY token",
        "),",
        f"top AS (SELECT * FROM agg ORDER BY cnt DESC, token ASC LIMIT {top})",
        "SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank,",
        "       token, cnt",
        "FROM top",
    ]
    return "\n".join(parts)


@register(
    "q177_bpe_word_dropout",
    oracle=_bpe_word_dropout_oracle(
        n_merges=BPE_WD_MERGES,
        vocab_cap=BPE_WD_VOCAB_CAP,
        top=BPE_WD_TOP,
        p=BPE_WD_P,
        seed=BPE_WD_SEED,
    ),
    doc=f"WORD-level BPE-dropout (Provilkov 2020 at merge "
        f"granularity): train {BPE_WD_MERGES} merges (capped "
        f"histogram, top {BPE_WD_VOCAB_CAP} words), then encode the "
        f"full vocabulary with each merge dropped per word at "
        f"p={BPE_WD_P} — the drop decision is the portable md5 "
        "uniform keyed by (seed, ORIGINAL word, merge ordinal), so "
        "the mask is order-independent, reproducible across engines "
        "and epochs (the q57/q80/q175 hash-sampling principle), and "
        "SQL-replayable — which site-level dropout is not; the "
        "site-level id-space twin agrees with this variant at p=0 "
        "and p=1 (property-pinned). Token counts over the corpus "
        "under the dropped segmentation. Scale: vocab-sized encode "
        "projection per epoch seed, corpus touched once for the "
        "histogram; production-depth serving belongs to the id path.",
)
def q177_bpe_word_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.bpe import (
        bpe_apply_word_dropout,
        bpe_render,
        learn_bpe,
    )

    vocab = _bpe_vocab(spark, sf_dir)
    merges = learn_bpe(
        vocab, n_merges=BPE_WD_MERGES, max_vocab_words=BPE_WD_VOCAB_CAP
    )
    v = bpe_apply_word_dropout(
        vocab, merges, p=BPE_WD_P, seed=BPE_WD_SEED
    )
    syms = v.select(
        F.explode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("sym"),
        "wc",
    )
    return (
        syms.select(bpe_render("sym", merges).alias("token"), "wc")
        .groupBy("token")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(BPE_WD_TOP)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("token")))
            .alias("rank"),
            "token",
            "cnt",
        )
    )


#: q178 (SCALE.md round-12 gate candidate #1, promoted this round):
#: the STRING->IDS serving bridge under its own hash gate. Round 12
#: built merge_ranks_from_string_chain so a string-trained chain can
#: be served through the rank-based, chain-length-independent id
#: encoder instead of the stacked one-replace-per-merge plan; until
#: now the bridge was pinned by parity properties (stacked-replace ==
#: bridged encode, tests) and by q156/q172 staying green. This gate
#: pins the bridged COMPOSITION end-to-end against independent
#: arithmetic: train on the STRING path (capped histogram), bridge to
#: id ranks, encode the full vocabulary with encode_word_ids, render
#: ids back to surfaces — all replayed by the SAME generated
#: string-path oracle, so a wrong ordinal mapping, a mis-resolved
#: placeholder-in-pair, or a rank/tie divergence in the id encoder
#: would each shift the token counts. Params differ from every other
#: BPE gate (q156 6/-/20, q170 100/24/30, q172 60/20/25, q174
#: 80/22/28, q176 70/24/26, q177 40/16/24) so the gates stay
#: independent evidence.
BPE_BRG_MERGES = 55
BPE_BRG_VOCAB_CAP = 18
BPE_BRG_TOP = 27


@register(
    "q178_bpe_bridged_serving",
    oracle=_bpe_encode_oracle(
        n_merges=BPE_BRG_MERGES,
        vocab_cap=BPE_BRG_VOCAB_CAP,
        top=BPE_BRG_TOP,
    ),
    doc=f"String->ids SERVING BRIDGE end-to-end: train "
        f"{BPE_BRG_MERGES} merges on the string path (capped "
        f"histogram, top {BPE_BRG_VOCAB_CAP} words), convert the "
        "placeholder chain to id ranks via the sub-U+E000 parity law "
        "(merge_ranks_from_string_chain), tokenize the FULL "
        "vocabulary with the rank-based id encoder, render token ids "
        "back to surface strings, and report the corpus' top-"
        f"{BPE_BRG_TOP} tokens. The oracle replays the string path, "
        "so the hash pins the bridge against independent arithmetic "
        "— the production pattern (string-trained artifact served "
        "chain-length-independently) is oracle-gated, not just "
        "property-tested. Scale: bridge cost is merges-sized, encode "
        "is one Arrow pass over the Zipf-bounded vocabulary with a "
        "merges-sized broadcast; the corpus is touched once for the "
        "histogram (the q156 story with production serving).",
)
def q178_bpe_bridged_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_relieffc_fselection_spark.operators.bpe import learn_bpe
    from spark_relieffc_fselection_spark.operators.bpe_ids import (
        bpe_ids_encode,
        merge_ranks_from_string_chain,
        render_id,
    )

    vocab = _bpe_vocab(spark, sf_dir)
    merges = learn_bpe(
        vocab, n_merges=BPE_BRG_MERGES, max_vocab_words=BPE_BRG_VOCAB_CAP
    )
    chain = merge_ranks_from_string_chain(merges)
    encoded = bpe_ids_encode(vocab, chain)
    # bounded by |alphabet| + n_merges (~200 rows) — exact and
    # driver-trivial, the q174 aggregate rationale
    counts = (
        encoded.select(F.explode("token_ids").alias("tid"), "wc")
        .groupBy("tid")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
        .collect()
    )
    expand = {nid: pair for nid, pair in chain}
    memo: dict[int, str] = {}
    # distinct ids can share a surface (q174's note) — re-aggregate by
    # rendered surface, then rank by (cnt DESC, token ASC)
    agg: dict[str, int] = {}
    for r in counts:
        tok = render_id(int(r["tid"]), expand, memo)
        agg[tok] = agg.get(tok, 0) + int(r["cnt"])
    top = sorted(agg.items(), key=lambda t: (-t[1], t[0]))[:BPE_BRG_TOP]
    return spark.createDataFrame(
        [(i + 1, tok, cnt) for i, (tok, cnt) in enumerate(top)],
        "rank int, token string, cnt bigint",
    )


#: q179 (SCALE.md round-12 gate candidate #2, promoted this round):
#: tokenize -> DETOKENIZE identity under the hash gate. Round 12
#: added bpe_ids_decode (the serving-side detokenizer); until now it
#: was test-covered only. This gate encodes the full vocabulary under
#: an id-space-trained chain, decodes every row back through the
#: Arrow decode pass, and reports per-word (token count, round-trip
#: verdict) for the top words — the oracle independently segments
#: each word with the replayed merge chain, counts its symbols, and
#: reverse-renders them, so a decode that dropped, reordered, or
#: mis-expanded ANY token id in the top words would flip a roundtrip
#: bit or shift a token count. Params distinct from every other BPE
#: gate (see q178's table).
BPE_RT_MERGES = 45
BPE_RT_VOCAB_CAP = 19
BPE_RT_TOP = 22


def _bpe_roundtrip_oracle(n_merges: int, vocab_cap: int, top: int) -> str:
    """Generated replay of encode-then-decode: the shared training
    rounds (``_bpe_train_cte_parts``), one nested replace chain
    applying the merges to the full vocabulary WITH the original word
    preserved, then per-word token count (= merged length: one symbol
    per token) and reverse-render (placeholders expanded back in
    reverse merge order) compared against the original. The engine
    must reproduce the verdict column by actually round-tripping
    through its decode path — the oracle's TRUE is independent
    arithmetic, not an assumption."""
    parts = _bpe_train_cte_parts(n_merges, vocab_cap)
    chain = "w"
    for m in range(1, n_merges + 1):
        chain = (
            f"replace({chain}, coalesce((SELECT pair FROM t{m}),"
            f" chr(0)), chr({_placeholder_cp(m)}))"
        )
    parts.append(
        f"applied AS (SELECT w AS word, wc, {chain} AS mw FROM fullvocab),"
    )
    render = "mw"
    for m in range(n_merges, 0, -1):
        render = (
            f"replace({render}, chr({_placeholder_cp(m)}),"
            f" coalesce((SELECT pair FROM t{m}), chr(0)))"
        )
    parts += [
        "back AS (",
        "  SELECT word, wc, CAST(length(mw) AS INTEGER) AS n_tokens,",
        f"         {render} AS rec",
        "  FROM applied",
        "),",
        "top AS (",
        "  SELECT word, wc, n_tokens, (rec = word) AS roundtrip",
        f"  FROM back ORDER BY wc DESC, word ASC LIMIT {top}",
        ")",
        "SELECT ROW_NUMBER() OVER (ORDER BY wc DESC, word ASC) AS rank,",
        "       word, wc, n_tokens, roundtrip",
        "FROM top",
    ]
    return "\n".join(parts)


@register(
    "q179_bpe_roundtrip_identity",
    oracle=_bpe_roundtrip_oracle(
        n_merges=BPE_RT_MERGES,
        vocab_cap=BPE_RT_VOCAB_CAP,
        top=BPE_RT_TOP,
    ),
    doc=f"Tokenize->detokenize IDENTITY: train {BPE_RT_MERGES} "
        f"id-space merges (capped histogram, top {BPE_RT_VOCAB_CAP} "
        "words), encode the FULL vocabulary, decode every row back "
        "through bpe_ids_decode (Arrow pass, merges-sized expand "
        "broadcast), and report per-word token count + round-trip "
        f"verdict for the top {BPE_RT_TOP} words by frequency. The "
        "oracle segments and reverse-renders each word with its own "
        "replay of the merge chain, so the identity law the decoder "
        "claims is pinned by independent arithmetic. Scale: decode "
        "joins distinct words back to the corpus by word (the encode "
        "pattern in reverse) — corpus size never enters the Arrow "
        "pass, and the round trip costs two vocab-sized passes.",
)
def q179_bpe_roundtrip_identity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from spark_relieffc_fselection_spark.operators.bpe_ids import (
        bpe_ids_decode,
        bpe_ids_encode,
        learn_bpe_ids,
    )

    vocab = _bpe_vocab(spark, sf_dir)
    merges = learn_bpe_ids(
        vocab, n_merges=BPE_RT_MERGES, max_vocab_words=BPE_RT_VOCAB_CAP
    )
    encoded = bpe_ids_encode(vocab, merges)
    decoded = bpe_ids_decode(encoded, merges)
    return (
        decoded.select(
            F.col("w").alias("word"),
            "wc",
            F.size("token_ids").alias("n_tokens"),
            (F.col("decoded") == F.col("w")).alias("roundtrip"),
        )
        .orderBy(F.desc("wc"), F.asc("word"))
        .limit(BPE_RT_TOP)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("wc"), F.asc("word")))
            .alias("rank"),
            "word",
            "wc",
            "n_tokens",
            "roundtrip",
        )
    )
